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

    ``events`` is written with NANOSECOND timestamps. How Spark's
    parquet reader surfaces those changed across versions (long with
    ``nanosAsLong`` on 3.x/4.0; native ``TIMESTAMP_NTZ`` truncated to
    micros on 4.1+), so the catalog normalizes ``ts`` to a session-tz
    ``TimestampType`` at microsecond precision here — every consumer
    sees ONE type regardless of the runtime. Truncation long→micros is
    integer division (double division of int64 nanos > 2^53 loses up
    to ~128 ns — enough to misbucket a window boundary, ADVICE r1).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = posixpath.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _read_events_parquet(spark, path)
    else:
        df = spark.read.parquet(path)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            norm = F.timestamp_micros(F.expr("`ts` div 1000"))
        else:
            # TIMESTAMP_NTZ (or already TIMESTAMP): wall-clock is the
            # UTC instant; queries pin session tz to UTC so this cast
            # is value-preserving.
            norm = F.col("ts").cast("timestamp")
        df = df.withColumn("ts", norm)
    return df


def _read_events_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read the nanosecond-timestamp events parquet on ANY pyspark.

    pyspark 4.1+ reads TIMESTAMP(NANOS) natively (as TIMESTAMP_NTZ
    truncated to micros); 3.x/4.0 readers refuse it at schema inference
    ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))") unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
    column surfaces as a raw nanos LongType that :func:`load_table`
    normalizes. The container's pyspark moved 4.0 -> 4.1.2 mid-build
    once already (ADVICE r2), so this probes by behavior, not version
    string: plain read first, and on the nanos schema error set the
    legacy conf and retry. The conf flip is read-path only and
    harmless on runtimes that never consult it.
    """
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # AnalysisException on 3.x/4.0 readers
        if "NANOS" not in str(exc) and "nanosAsLong" not in str(exc):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def event_timestamp(col="ts"):
    """Session-tz TimestampType view of an events timestamp column.

    :func:`load_table` already normalizes ``events.ts`` to a
    microsecond ``TimestampType``, so this is a value-preserving cast
    kept for call-site compatibility (and for columns sourced outside
    the catalog that arrive as ``TIMESTAMP_NTZ``)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


# Known row counts below this skip the fan-out entirely: the
# round-robin exchange plus ~cores near-empty Arrow batches cost more
# than running the kernel as one task at this size (measured on the
# 2k-row PQ encode collect at local[32]: 0.9 s fanned vs 0.4 s plain;
# a 16k-row single-task encode is still ~0.1 s). Scale-adaptive by
# construction — the decision derives from the input size, not from
# the core count, so cluster-sized hosts and the 8-core driver run see
# the same plan for the same data (guide §2, r12).
FAN_OUT_MIN_ROWS = 16_384


def fan_out_small_scan(
    df: DataFrame,
    min_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Widen a too-narrow scan before a CPU-heavy per-row stage.

    ``n_rows``: the caller's already-known row count (never computed
    here — no extra job). When provided and under ``FAN_OUT_MIN_ROWS``,
    the fan-out is skipped: a tiny relation's kernel finishes faster in
    one task than the repartition shuffle alone costs, and
    ``df.rdd.getNumPartitions()`` below is itself a non-trivial
    driver-side plan-to-RDD conversion this short-circuit avoids.

    A small input (one parquet file / one row group) scans as ONE task,
    which serializes any expensive map stage behind it (shingling, k-gram
    hashing, MinHash) no matter how many cores the cluster has — measured
    6x on winnowing at sf0.1. Repartitions when the scan has fewer
    partitions than the session's default parallelism, AND (ADVICE r8)
    when the plan reads a SINGLE file regardless of split count: one
    file with one row group splits into ~size/openCost bins of which
    only the bin holding the row-group offset carries rows, so a host
    with cores <= split count saw ``getNumPartitions() >= target`` and
    no-opt'ed straight into the N-1-empty+1-full task skew this helper
    exists to repair. Partition COUNT is cheap driver metadata; per-
    partition row counts are not, and a single file is the only layout
    whose count lies this way — multi-file scans distribute rows at
    file granularity. At real scale the scan reads many files with
    >= cores partitions and this is a no-op, so the big-data path
    never pays the round-robin shuffle (a lone file is never the
    100 TB shape).
    """
    if n_rows is not None and n_rows < FAN_OUT_MIN_ROWS:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    n_parts = df.rdd.getNumPartitions()
    single_file_splits = False
    if n_parts > 1:
        files = df.inputFiles()
        # ADVICE r9: only the single-file single-ROW-GROUP layout has
        # the N-1-empty skew — a large single file with many row groups
        # distributes rows across splits fine and must not pay a full
        # round-robin shuffle. The footer row-group count is cheap
        # driver-side metadata; if it can't be read (non-local scheme,
        # non-parquet) we keep the conservative repartition.
        if len(files) == 1:
            single_file_splits = _row_groups_in(files[0]) in (None, 1)
    if n_parts < target or single_file_splits:
        return df.repartition(target)
    return df


def _row_groups_in(uri: str) -> int | None:
    """Row-group count from a parquet footer, or ``None`` when the
    footer isn't locally readable (remote scheme, non-parquet)."""
    try:
        import pyarrow.parquet as pq

        path = uri
        if path.startswith("file:"):
            from urllib.parse import urlparse

            path = urlparse(path).path
        elif "://" in path:
            return None
        return pq.ParquetFile(path).metadata.num_row_groups
    except Exception:
        return None


def materialize_partitioned(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    dest_dir: str,
    partition_col: str = "event_date",
) -> str:
    """Rewrite a catalog table into a date-partitioned at-rest layout;
    returns the partitioned table's path.

    The flat driver parquet is the TEST shape; the 100-TB shape is
    hive-partitioned on the natural pruning key (the reference's own
    100× proposal — month-partitioning, notebook cell 45 — which it
    never implemented). For ``events`` the key is the event DATE
    derived from the normalized ``ts``: a date-ranged query then
    prunes partitions at PLANNING time (PartitionFilters) and a join
    against a filtered date dim prunes them at RUNTIME (dynamic
    partition pruning) — both asserted in ``tests/test_plans.py``.
    Other tables pass an existing column as ``partition_col``.
    """
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, name)
    if name == "events" and partition_col == "event_date":
        df = df.withColumn("event_date", F.to_date("ts"))
    out = posixpath.join(dest_dir, f"{name}_by_{partition_col}.parquet")
    df.write.mode("overwrite").partitionBy(partition_col).parquet(out)
    return out


def load_partitioned(
    spark: SparkSession, path: str, partition_col: str = "event_date"
) -> DataFrame:
    """Lazy scan of a :func:`materialize_partitioned` layout.

    The partition column comes back from directory names (hive-style
    discovery); filters on it never touch data files. Everything else
    reads exactly as :func:`load_table` produced it — ``events.ts`` was
    normalized BEFORE the partitioned write, so no re-normalization."""
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to the full catalog."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
