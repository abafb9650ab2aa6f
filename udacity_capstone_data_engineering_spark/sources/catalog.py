"""Test-data catalog: the driver's TPC-H-ish tables plus documents/embeddings.

Mirrors the reference's serving entry ``read_data`` (reference
``etl.py:316-334``: six ``spark.read.parquet`` calls returning DataFrames),
generalized to a path-parameterized catalog. Scans stay lazy; Catalyst
prunes columns/partitions from whatever the caller selects downstream.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one catalog table.

    ``events`` is written with nanosecond timestamps, which Spark's
    vectorized parquet reader rejects by default — read them as raw
    nanos-since-epoch longs (``nanosAsLong``); use
    :func:`event_timestamp` to get a (microsecond) TimestampType view.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(posixpath.join(sf_dir, f"{name}.parquet"))


def event_timestamp(col="ts"):
    """Nanos-since-epoch long → TimestampType (truncated to micros).

    Integer division, NOT ``(c / 1000).cast("long")``: double division
    of int64 nanos > 2^53 loses up to ~128 ns, enough to misbucket an
    event at a window boundary (ADVICE r1)."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    # Column input: no `div` operator on Column, so truncate exactly via
    # decimal arithmetic (c - c % 1000 is an exact multiple of 1000).
    c = col
    return F.timestamp_micros(
        ((c - c % 1000).cast("decimal(30,0)") / 1000).cast("long")
    )


def fan_out_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a too-narrow scan before a CPU-heavy per-row stage.

    A small input (one parquet file / one row group) scans as ONE task,
    which serializes any expensive map stage behind it (shingling, k-gram
    hashing, MinHash) no matter how many cores the cluster has — measured
    6x on winnowing at sf0.1. This repartitions ONLY when the scan has
    fewer partitions than the session's default parallelism; at real
    scale the scan already has >= cores partitions and this is a no-op,
    so the big-data path never pays the round-robin shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to the full catalog."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
