"""Phase-11 query tier (round 6): the VERDICT r5 action items that add
catalog surface — the bucketed standing fingerprint index, the real
image codec path, and the materializing quality-gate pipeline.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry); house determinism rules apply.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import (
    portable_hash64,
)
from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.queries_phase10 import (
    _INGEST_MOD,
    _INGEST_ORACLE,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Dedup: incremental ingest against a BUCKETED standing index (r5 #2)
# ---------------------------------------------------------------------------


@_register("incremental_ingest_dedup_bucketed", _INGEST_ORACLE)
def incremental_ingest_dedup_bucketed(spark, sf_dir):
    """`incremental_ingest_dedup` with its 100 TB shape actually WIRED
    (VERDICT r5 #2): the standing fingerprint index is MATERIALIZED as
    a bucketed catalog table (bucketBy fingerprint, sorted within
    buckets), and the incoming batch joins against it with ZERO
    exchange on the index side — the index's bucket layout IS its
    partitioning, so the petabyte side of the join never shuffles and
    only the (small) incoming batch moves. Same verdict columns and
    the same oracle as the in-plan variant, so the materialize
    boundary is proven lossless; `tests/test_round6.py` pins the plan
    property (index scan `Bucketed: true`, no Exchange above it,
    strictly fewer exchanges than the unbucketed control). The merge
    hint pins SMJ so small-sf data doesn't degrade the demonstration
    to a broadcast."""
    from udacity_capstone_data_engineering_spark.sources.sinks import (
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", portable_hash64(F.col("text")).alias("fingerprint")
    )
    existing = (
        docs.filter(F.col("doc_id") % _INGEST_MOD != 0)
        .select("fingerprint")
        .distinct()
    )
    base = tempfile.mkdtemp(prefix="spark_fp_index_gate_")
    spark.sql("DROP TABLE IF EXISTS fp_index_gate")
    write_bucketed(
        existing,
        "fp_index_gate",
        ["fingerprint"],
        8,
        sort_by=["fingerprint"],
        path=f"{base}/fp_index",
    )
    index = spark.table("fp_index_gate").withColumn("__hit", F.lit(True))

    from pyspark.sql import Window

    w = (
        Window.partitionBy("fingerprint")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = docs.filter(F.col("doc_id") % _INGEST_MOD == 0).select(
        "doc_id",
        "fingerprint",
        (F.count(F.lit(1)).over(w) > 0).alias("dup_within_batch"),
    )
    return flagged.join(index.hint("merge"), "fingerprint", "left").select(
        "doc_id",
        F.coalesce(F.col("__hit"), F.lit(False)).alias("dup_of_existing"),
        "dup_within_batch",
        (
            ~F.coalesce(F.col("__hit"), F.lit(False))
            & ~F.col("dup_within_batch")
        ).alias("accept"),
    )
