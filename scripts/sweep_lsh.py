"""Sweep the LSH tables x multiprobe cost/recall frontier (VERDICT r2 #1).

For each scale factor, computes brute-force ground truth once, then for
each (tables, multiprobe) combo measures recall@5 and warm wall-clock of
the full lsh_topk pipeline (bucket + candidate join + score + rank).
Prints one JSON line per combo. Relative timings in one warm JVM rank
the combos; the absolute cold number comes from bench.py.

Usage: python scripts/sweep_lsh.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from udacity_capstone_data_engineering_spark import get_spark
from udacity_capstone_data_engineering_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

# (tables, multiprobe, planes-override or None for auto)
COMBOS = [
    (16, 2, None),
    (16, 3, None),
    (16, 4, None),
    (16, 5, None),
    (12, 3, None),
    (12, 4, None),
    (12, 5, None),
    (8, 5, None),
    (16, 2, 5),
    (12, 2, 5),
    (12, 3, 5),
    (8, 3, 5),
    (8, 2, 5),
]


def main(sf_dirs):
    spark = get_spark(shuffle_partitions=32)
    for sf_dir in sf_dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        n = emb.count()
        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, "vec_id", "embedding", k=5).collect()
        }
        for tables, multiprobe, planes in COMBOS:
            times = []
            got = None
            for _ in range(2):
                t0 = time.monotonic()
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in lsh_topk(
                        emb,
                        "vec_id",
                        "embedding",
                        dim=64,
                        k=5,
                        planes=planes,
                        tables=tables,
                        multiprobe=multiprobe,
                    ).collect()
                }
                times.append(time.monotonic() - t0)
            recall = len(truth & got) / len(truth)
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "n": n,
                        "tables": tables,
                        "multiprobe": multiprobe,
                        "planes": planes,
                        "recall_at_5": round(recall, 4),
                        "warm_sec": round(min(times), 3),
                    }
                ),
                flush=True,
            )
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    main(dirs)
