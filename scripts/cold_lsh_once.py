"""One COLD embedding_lsh_topk run in a fresh process; prints JSON.

Usage: python scripts/cold_lsh_once.py <sf_dir> <tables> <multiprobe> [planes]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from udacity_capstone_data_engineering_spark import get_spark
from udacity_capstone_data_engineering_spark.operators.similarity import lsh_topk

sf_dir = sys.argv[1]
tables = int(sys.argv[2])
multiprobe = int(sys.argv[3])
planes = int(sys.argv[4]) if len(sys.argv) > 4 else None

spark = get_spark(shuffle_partitions=32)
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
t0 = time.monotonic()
n_rows = len(
    lsh_topk(
        emb, "vec_id", "embedding", dim=64, k=5,
        planes=planes, tables=tables, multiprobe=multiprobe,
    ).collect()
)
dt = time.monotonic() - t0
print(json.dumps({
    "tables": tables, "multiprobe": multiprobe, "planes": planes,
    "cold_sec": round(dt, 3), "rows": n_rows,
}))
spark.stop()
