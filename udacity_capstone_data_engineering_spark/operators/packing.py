"""Sequence packing: assemble documents into ~fixed-token-budget packs
(training-shard units).

The last mile of a training-data pipeline: tokenized documents are
concatenated into fixed-length model sequences, so the pipeline must
assign docs to packs whose token totals approach the budget. True
bin-packing is order-dependent and serial; the distributed-friendly
form used here is CONTIGUOUS packing inside hash buckets:

  1. hash-bucket docs (portable hash of the id — deterministic,
     repartition-invariant),
  2. order each bucket by id and take a running token total (one
     window per bucket — parallel across buckets, never a global sort),
  3. pack_id = (cumulative - n_tokens) // budget: a doc starts a new
     pack when the budget is crossed.

Packs can overflow by at most one document (the standard greedy
contiguous scheme — a doc is never split here; chunking long docs
first is ``doc_chunks_overlap``'s job). At 100 TB the bucket count is
the parallelism knob and each bucket's window is a single partition's
sort — no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import portable_hash64


def pack_contiguous(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    buckets: int = 8,
) -> DataFrame:
    """Assign each row a (bucket, pack_id) so consecutive rows (by id,
    within a hash bucket) share a pack until ``budget`` total weight is
    crossed. Returns the input ids with (weight, bucket, pack_id).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket = F.pmod(portable_hash64(F.col(id_col).cast("string")), F.lit(buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            bucket.cast("int").alias("bucket"),
        )
        .withColumn("__cum", F.sum("weight").over(w))
        .select(
            id_col,
            "weight",
            "bucket",
            F.floor((F.col("__cum") - F.col("weight")) / budget)
            .cast("int")
            .alias("pack_id"),
        )
    )
