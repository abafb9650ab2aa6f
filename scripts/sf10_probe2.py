"""Second-decade probe, process-isolated runner (round 7).

`sf10_probe.py` runs every kernel inside ONE driver process; twice this
round its LSH sf1 leg wedged on a single straggler task that the SAME
kernel, run standalone, never shows (53-57 s healthy walls — see
SCALING.md round-7). Rather than debug a heisen-hang inside a
measurement harness, this runner executes each (kernel, sf) cell in a
FRESH subprocess: cold JVM, no cross-kernel session state, and a hang
is contained by a per-cell timeout instead of wedging the whole probe.
Interleaving (sf1 then sf10 per kernel, the SCALING.md contention
protocol) is preserved across cells.

Ground truths come from `sf10_probe.exact_topk_fast`'s npy cache
(computed once, reused by every cell).

Usage: python scripts/sf10_probe2.py [--timeout SECS] [cell ...]
  cells default to: lsh ivf pq ivfpq lsh_jl ivf_jl semdedup docs
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CELL_SRC = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from scripts.sf10_probe import SF1, SF10, exact_topk_fast
from udacity_capstone_data_engineering_spark import get_spark

kind, tag = {kind!r}, {tag!r}
sf_dir = SF1 if tag == "sf1" else SF10
# VERDICT r7 #5 watchdog: the round-7 wedge was ONE task parked >30 min
# at ~5% CPU inside the LSH scan kernel, only in a long-lived multi-
# kernel process. Beyond the per-cell subprocess timeout (which converts
# a wedge into a red cell instead of a lost probe), speculation re-
# launches any task whose wall exceeds 4x the stage median once 75% of
# the stage is done — exactly the single-straggler shape observed —
# and the task reaper force-kills tasks that ignore the resulting kill.
spark = get_spark(shuffle_partitions=32, extra_conf={{
    "spark.speculation": "true",
    "spark.speculation.multiplier": "4",
    "spark.speculation.quantile": "0.75",
    "spark.task.reaper.enabled": "true",
    "spark.task.reaper.killTimeout": "120s",
}})
spark.sparkContext.setLogLevel("ERROR")

if kind in ("lsh", "ivf", "pq", "ivfpq", "lsh_jl", "ivf_jl", "lsh_self"):
    from pyspark.sql import functions as F

    from scripts.sf10_probe import classify_regimes
    from udacity_capstone_data_engineering_spark.operators.ivf import ivf_topk
    from udacity_capstone_data_engineering_spark.operators.pq import ivfpq_topk, pq_topk
    from udacity_capstone_data_engineering_spark.operators.similarity import lsh_topk

    # Workload design (round 8): the self-workload (every vector
    # queries the corpus) is QUADRATIC in candidate volume for the
    # recall-targeted IVF/PQ kernels (each query scans ~3/4 of the
    # corpus / the full code table) — measured sf1 walls extrapolate
    # to ~100x at sf10, i.e. guaranteed timeouts that measure nothing.
    # The 100 TB-relevant exponent is CORPUS-side scaling at a FIXED
    # query batch: 20,000 queries at both scales (at sf1 that IS the
    # full self-workload, so sf1 numbers stay comparable with every
    # earlier round; at sf10 it's vec_id % 10 == 0 against the 10x
    # corpus). Recall is graded against the exact truth restricted to
    # the workload's query ids. The one self-workload sf10 cell kept
    # is 'lsh_self' — LSH total work grows ~n^1.5 (bucket ~ sqrt n),
    # the only kernel whose full self-dedup regime is tractable here.
    # JL variants (VERDICT r7 #1: the table covers +-JL): candidate
    # generation on the 16-d deterministic sign projection, exact
    # rerank in R^64 — the gated lsh_jl/ivf_jl catalog shape.
    fns = dict(
        lsh=lambda e, q: lsh_topk(
            e, "vec_id", "embedding", dim=64, k=5, queries=q),
        lsh_self=lambda e, q: lsh_topk(e, "vec_id", "embedding", dim=64, k=5),
        ivf=lambda e, q: ivf_topk(e, "vec_id", "embedding", k=5, queries=q),
        pq=lambda e, q: pq_topk(
            e, "vec_id", "embedding", dim=64, k=5, queries=q),
        ivfpq=lambda e, q: ivfpq_topk(
            e, "vec_id", "embedding", dim=64, k=5, queries=q),
        lsh_jl=lambda e, q: lsh_topk(
            e, "vec_id", "embedding", dim=64, k=5, project_dims=16,
            queries=q),
        ivf_jl=lambda e, q: ivf_topk(
            e, "vec_id", "embedding", k=5, project_dims=16, queries=q),
    )
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    n = emb.count()
    qmod = max(1, n // 20_000)
    qsub = None if qmod == 1 else emb.filter(F.col("vec_id") % qmod == 0)
    workload = "self" if (qmod == 1 or kind == "lsh_self") else f"20k-of-{{n}}"
    regime = classify_regimes(n).get(kind.split("_")[0], "?")
    t0 = time.monotonic()
    got = {{(r.query_id, r.neighbor_id)
           for r in fns[kind](emb, qsub).collect()}}
    wall = round(time.monotonic() - t0, 1)
    truth = exact_topk_fast(sf_dir)
    if workload != "self":
        truth = {{p for p in truth if p[0] % qmod == 0}}
    rec = round(len(truth & got) / len(truth), 4)
    print("CELL " + json.dumps(
        {{"cell": kind, "sf": tag, "sec": wall, "recall@5": rec,
          "n": n, "workload": workload, "regime": regime}}), flush=True)
elif kind == "semdedup":
    from udacity_capstone_data_engineering_spark.operators.semdedup import auto_k, semantic_dedup

    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    n = emb.count()
    t0 = time.monotonic()
    res = semantic_dedup(emb, "vec_id", "embedding", k=None)
    n_dup = res.filter("is_dup").count()
    wall = round(time.monotonic() - t0, 1)
    print("CELL " + json.dumps(
        {{"cell": "semdedup_autok", "sf": tag, "n": n, "k": auto_k(n),
          "n_dup": n_dup, "sec": wall}}), flush=True)
else:  # docs
    from udacity_capstone_data_engineering_spark.queries import queries

    qs = queries()
    for qname in ("exact_dedup_docs", "near_dup_collapsed",
                  "near_dup_minhash_lsh", "doc_fingerprints", "simhash_docs"):
        t0 = time.monotonic()
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print("CELL " + json.dumps(
            {{"cell": qname, "sf": tag,
              "sec": round(time.monotonic() - t0, 1)}}), flush=True)
spark.stop()
"""


def main() -> None:
    argv = list(sys.argv[1:])
    timeout = 1800
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = int(argv[i + 1])
        del argv[i : i + 2]
    cells = argv or [
        "lsh", "ivf", "pq", "ivfpq", "lsh_jl", "ivf_jl", "semdedup", "docs",
    ]
    results: list[dict] = []
    for kind in cells:
        for tag in ("sf1", "sf10"):  # interleaved per kernel
            src = _CELL_SRC.format(repo=REPO, kind=kind, tag=tag)
            # start_new_session + killpg (round 8): subprocess.run's
            # timeout kills only the DIRECT child. The cell python's
            # own children — the Spark JVM and its pyspark.daemon
            # workers — survive, keep the inherited stdout/stderr
            # pipes open (so communicate() blocks past the timeout:
            # the runner wedges on its own fence), and burn CPU into
            # every later cell's timing. Observed live on the first
            # sf10 LSH cell this round. The cell now runs in its own
            # process group and a timeout SIGKILLs the entire group.
            proc = subprocess.Popen(
                [sys.executable, "-c", src],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                start_new_session=True,
            )
            timed_out = False
            try:
                out, err = proc.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                timed_out = True
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                out, err = proc.communicate()
            cell_seen = False
            for line in out.splitlines():
                if line.startswith("CELL "):
                    rec = json.loads(line[5:])
                    results.append(rec)
                    cell_seen = True
                    print(json.dumps(rec), flush=True)
            # ADVICE r8: a cell that prints its CELL record and then
            # wedges during JVM shutdown must not ALSO get a timeout
            # error row — the duplicate (cell, sf) key corrupts the
            # exponent pairing. The error row is only for cells that
            # never reported.
            if timed_out and not cell_seen:
                results.append(
                    {"cell": kind, "sf": tag, "error": f"timeout {timeout}s"}
                )
                print(json.dumps(results[-1]), flush=True)
            elif proc.returncode != 0:
                results.append(
                    {"cell": kind, "sf": tag, "error": err[-400:]}
                )
                print(json.dumps(results[-1]), flush=True)
    # decade exponents for cells measured at both scales
    import math

    walls: dict[str, dict[str, float]] = {}
    for r in results:
        if "sec" in r:
            walls.setdefault(r["cell"], {})[r["sf"]] = r["sec"]
    for cell, w in walls.items():
        if "sf1" in w and "sf10" in w:
            exp = round(
                math.log10(max(w["sf10"], 1e-3) / max(w["sf1"], 1e-3)), 2
            )
            print(json.dumps({"cell": cell, "exp_sf1_to_sf10": exp}), flush=True)


if __name__ == "__main__":
    main()
