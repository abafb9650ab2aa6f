"""Interleaved A/B wall-clock for one catalog query across two repo
checkouts (the house drift-vs-regression protocol from the round-3
close-out): run the SAME query alternately from checkout A and
checkout B in one process, N rounds each, and report medians.
Interleaving makes host-load drift hit both sides equally — a real
regression separates the medians, environment noise doesn't.

Usage:
    python scripts/ab_time_query.py QUERY_NAME PATH_A PATH_B [rounds] [sf_dir]

Each path must contain an importable `udacity_capstone_data_engineering_spark` package. The
two checkouts are imported into ISOLATED module namespaces (sys.modules
swapped around each import) so A's modules never shadow B's.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time


def load_catalog(repo_path: str):
    """Import `udacity_capstone_data_engineering_spark.queries` from repo_path into a private
    namespace and return its queries() dict."""
    saved_path = list(sys.path)
    saved_mods = {
        k: v
        for k, v in sys.modules.items()
        if k == "udacity_capstone_data_engineering_spark" or k.startswith("udacity_capstone_data_engineering_spark.")
    }
    for k in saved_mods:
        del sys.modules[k]
    sys.path.insert(0, repo_path)
    try:
        mod = importlib.import_module("udacity_capstone_data_engineering_spark.queries")
        qs = mod.queries()
    finally:
        sys.path[:] = saved_path
        for k in [
            k
            for k in sys.modules
            if k == "udacity_capstone_data_engineering_spark" or k.startswith("udacity_capstone_data_engineering_spark.")
        ]:
            del sys.modules[k]
        sys.modules.update(saved_mods)
    return qs


def main() -> None:
    qname = sys.argv[1]
    path_a, path_b = sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"

    qa = load_catalog(path_a)[qname]
    qb = load_catalog(path_b)[qname]

    sys.path.insert(0, path_b)
    from udacity_capstone_data_engineering_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm both once (scan cache, JIT) before any timed run.
    for fn in (qa, qb):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {"A": [], "B": []}
    for r in range(rounds):
        for tag, fn in (("A", qa), ("B", qb)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            walls[tag].append(dt)
            print(json.dumps({"round": r, tag: dt}), flush=True)
    med_a = statistics.median(walls["A"])
    med_b = statistics.median(walls["B"])
    print(
        json.dumps(
            {
                "query": qname,
                "median_A": med_a,
                "median_B": med_b,
                "ratio_B_over_A": round(med_b / med_a, 3),
                "walls": walls,
                "load1": round(os.getloadavg()[0], 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
