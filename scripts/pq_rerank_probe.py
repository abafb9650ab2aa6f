"""Measure the PQ exact-rerank budget → recall@5 curve (VERDICT r8
#5): the auto-sized n/20 cut measured recall 0.9992 at sf10 — an
order of magnitude of rerank wall spent past a 0.95 target. This
probe measures recall AND wall at smaller budgets so the
``target_recall``-driven sizing ships a MEASURED curve, the same
discipline as IVF's ``probe_fraction_for_recall``.

Runs the fixed-20k-query workload of the second-decade protocol
(SCALING.md r8) per (sf, divisor) cell, one Spark session per sf tag.

Usage: python scripts/pq_rerank_probe.py sf1|sf10 [--kernel pq|ivfpq] [div ...]
  divisors default to 50 100 200 (n/20 is the r8-measured baseline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.sf10_probe import SF1, SF10, exact_topk_fast  # noqa: E402
from udacity_capstone_data_engineering_spark import get_spark  # noqa: E402


def main() -> None:
    argv = list(sys.argv[1:])
    kernel = "pq"
    if "--kernel" in argv:
        i = argv.index("--kernel")
        kernel = argv[i + 1]
        del argv[i : i + 2]
    tag = argv[0]
    divs = [int(d) for d in argv[1:]] or [50, 100, 200]
    sf_dir = SF1 if tag == "sf1" else SF10

    from udacity_capstone_data_engineering_spark.operators.pq import (
        ivfpq_topk,
        pq_topk,
    )

    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    n = emb.count()
    qmod = max(1, n // 20_000)
    qsub = None if qmod == 1 else emb.filter(F.col("vec_id") % qmod == 0)
    truth = exact_topk_fast(sf_dir)
    if qmod > 1:
        truth = {p for p in truth if p[0] % qmod == 0}

    for div in divs:
        rerank = max(50, -(-n // div), 20 * 5)
        t0 = time.monotonic()
        if kernel == "pq":
            res = pq_topk(
                emb, "vec_id", "embedding", dim=64, k=5,
                rerank=rerank, queries=qsub,
            )
        else:
            res = ivfpq_topk(
                emb, "vec_id", "embedding", dim=64, k=5,
                rerank=rerank, queries=qsub,
            )
        got = {(r.query_id, r.neighbor_id) for r in res.collect()}
        wall = round(time.monotonic() - t0, 1)
        rec = round(len(truth & got) / len(truth), 4)
        print(
            "CELL "
            + json.dumps(
                {
                    "cell": f"{kernel}_div{div}",
                    "sf": tag,
                    "n": n,
                    "rerank": rerank,
                    "sec": wall,
                    "recall@5": rec,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
