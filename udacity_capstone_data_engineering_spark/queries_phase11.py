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


# ---------------------------------------------------------------------------
# Multimodal: REAL image decode (r5 #3 — the codec gap closed)
# ---------------------------------------------------------------------------

# Synthesized 8x4 PPM (P6) per document: 11-byte header + the first 96
# ASCII text bytes as row-major RGB pixels. doc_id % 7 == 0 payloads are
# truncated mid-body — the corrupt-decode branch, oracle-gated too.
_PPM_W, _PPM_H = 8, 4
_PPM_HDR = f"P6\n{_PPM_W} {_PPM_H}\n255\n"
_CORRUPT_MOD = 7
_CORRUPT_LEN = 50  # header (11) + 39 pixel bytes < 96 -> truncated body


def _ppm_payloads(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _PPM_W * _PPM_H * 3
    )
    base = F.concat(
        F.lit(_PPM_HDR), F.substring("text", 1, _PPM_W * _PPM_H * 3)
    )
    return docs.select(
        "doc_id",
        F.encode(
            F.when(
                F.col("doc_id") % _CORRUPT_MOD == 0,
                F.substring(base, 1, _CORRUPT_LEN),
            ).otherwise(base),
            "UTF-8",
        ).alias("payload"),
    )


@_register(
    "image_decode_stats",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE strlen(text) >= {_PPM_W * _PPM_H * 3}),
    sums AS (
      SELECT doc_id,
             CAST(sum(ascii(substring(text, CAST(3*p+1 AS INT), 1))) AS BIGINT) AS r_sum,
             CAST(sum(ascii(substring(text, CAST(3*p+2 AS INT), 1))) AS BIGINT) AS g_sum,
             CAST(sum(ascii(substring(text, CAST(3*p+3 AS INT), 1))) AS BIGINT) AS b_sum
      FROM d, range({_PPM_W * _PPM_H}) t(p) GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN 'corrupt' ELSE 'ok' END AS status,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN NULL ELSE {_PPM_W} END AS width,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN NULL ELSE {_PPM_H} END AS height,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN NULL ELSE s.r_sum END AS r_sum,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN NULL ELSE s.g_sum END AS g_sum,
           CASE WHEN d.doc_id % {_CORRUPT_MOD} = 0 THEN NULL ELSE s.b_sum END AS b_sum
    FROM d JOIN sums s USING (doc_id)
    """,
)
def image_decode_stats(spark, sf_dir):
    """REAL image decode under the value-hash gate (VERDICT r5 #3):
    each document's leading text bytes become an 8x4 binary PPM (P6)
    payload — header parse, dimension read, and pixel-plane statistics
    all run through the native pure-numpy decoder that replaced the
    r2–r5 NotImplementedError (``operators/multimodal.decode_image``).
    Channel sums are exact BIGINTs, so the oracle recomputes every
    pixel byte with substring+ascii. One payload in 7 is TRUNCATED
    mid-body: the decoder raises, the operator quarantines it as
    status='corrupt' with null stats — the oracle reproduces the
    quarantine verdicts, so the failure path is hash-gated, not just
    unit-tested. Scale shape: Arrow-batched mapInPandas with bounded
    per-worker payload batches, identical to the fake-feature tier."""
    from udacity_capstone_data_engineering_spark.operators.multimodal import (
        decode_image_stats,
    )

    return decode_image_stats(_ppm_payloads(spark, sf_dir), "payload", "doc_id")


@_register(
    "image_resize_decoded",
    f"""
    SELECT doc_id,
           CAST(r AS INTEGER) AS out_row,
           CAST(c AS INTEGER) AS out_col,
           CAST((ascii(substring(text, CAST(3*({_PPM_W}*2*r + 2*c)+1 AS INT), 1))
               + ascii(substring(text, CAST(3*({_PPM_W}*2*r + 2*c)+2 AS INT), 1))
               + ascii(substring(text, CAST(3*({_PPM_W}*2*r + 2*c)+3 AS INT), 1)))
               // 3 AS INTEGER) AS pixel
    FROM (SELECT doc_id, text FROM documents
          WHERE strlen(text) >= {_PPM_W * _PPM_H * 3}
            AND doc_id % {_CORRUPT_MOD} <> 0) d,
         range({_PPM_H // 2}) t1(r), range({_PPM_W // 2}) t2(c)
    """,
)
def image_resize_decoded(spark, sf_dir):
    """Decoded-image nearest-neighbor downsample: the same PPM corpus,
    decoded natively, collapsed to exact integer luma (r+g+b)//3, and
    2x-downsampled by strided selection — output dimensions come from
    the DECODED header, not caller metadata. Corrupt payloads (the
    1-in-7 truncations) contribute no rows, matching the quarantine
    contract; the oracle reproduces every kept pixel byte-exactly."""
    from udacity_capstone_data_engineering_spark.operators.multimodal import (
        resize_image_nearest,
    )

    return resize_image_nearest(_ppm_payloads(spark, sf_dir), "payload", "doc_id", factor=2)
