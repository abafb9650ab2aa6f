"""Sinks: parquet writer with overwrite + partitioning (SURVEY.md §2.1 S8).

The reference wrote every table as flat snappy parquet with
``mode('overwrite')`` (``etl.py:56,87,130,180,225,264``) and proposed
month-partitioning for 100x scale (notebook cell 45) without implementing
it. Here partitioning is first-class: at 100 TB the fact table MUST be
partitioned on its pruning key (date/month) so downstream scans prune
partitions instead of listing the world. Also fixes the reference's
Windows-only ``"\\table.parquet"`` path joins (``etl.py:180,225,264``)
by using posix joins everywhere.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    base_path: str,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> str:
    """Write ``df`` as parquet under ``base_path/name``; returns the path."""
    path = posixpath.join(base_path, name)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
    path: str | None = None,
) -> str:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    The co-location lever the reference never reached for: two tables
    bucketed on their join key with the SAME bucket count join with NO
    exchange on either side — at 100 TB that deletes the dominant cost
    of every recurring fact-to-fact join (both full-table shuffles).
    Pick ``num_buckets`` so one bucket of the larger table fits an
    executor core's memory budget; pair with ``sort_by`` on the join
    key so the sort-merge join also skips its per-task sort.
    """
    writer = (
        df.write.mode(mode).format(file_format).bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        # External table: data lands at ``path`` instead of the session
        # warehouse dir (which defaults to the driver CWD in local mode).
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return table


def write_files(
    df: DataFrame,
    base_path: str,
    name: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Format-generic file sink (parquet / orc / json / csv).

    JSON and CSV are interchange formats only — no column pruning, no
    predicate pushdown, ~5-10x the bytes of parquet at 100 TB; keep
    them at the pipeline edge and store intermediates columnar.
    """
    path = posixpath.join(base_path, name)
    writer = df.write.mode(mode).format(file_format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return path


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[str, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` each. Returns ``(path, n_files_after)``.

    The operational fix for the lake-killer at scale: streaming and
    per-batch writers leave thousands of KB-sized files, and every
    downstream scan then pays one task + one open per file. Sizing
    reads the directory's actual on-disk bytes (no data scan) and
    `coalesce`s — NOT `repartition` — so the rewrite is shuffle-free:
    each output task concatenates whole input splits. Row order within
    the directory is not preserved (it never was meaningful in a lake
    table). The rewrite goes through a temp sibling + swap, and the
    swap uses the Hadoop FileSystem API, not local file calls — so the
    same code compacts an s3a:// or hdfs:// directory (on S3, rename
    is a copy, and true readers-see-atomic swaps need a table format;
    this is the plain-directory best effort)."""
    import math
    import uuid

    from pyspark.sql import SparkSession

    assert isinstance(spark, SparkSession)
    hadoop_path = spark._jvm.org.apache.hadoop.fs.Path
    jvm_path = hadoop_path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    token = uuid.uuid4().hex[:8]
    tmp = hadoop_path(f"{path}__compact_{token}")
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(
        tmp.toString()
    )
    # Swap via backup (ADVICE r2): rename the original aside FIRST —
    # never delete it before the compacted tmp is in place — so a crash
    # at any point leaves either the original or the compacted data
    # reachable, and a failed swap rolls the original back.
    backup = hadoop_path(f"{path}__old_{token}")
    if not fs.rename(jvm_path, backup):
        fs.delete(tmp, True)
        raise IOError(f"compaction swap failed: rename {path} -> {backup}")
    if not fs.rename(tmp, jvm_path):
        fs.rename(backup, jvm_path)
        fs.delete(tmp, True)
        raise IOError(f"compaction swap failed: rename {tmp} -> {path}")
    fs.delete(backup, True)
    return path, n_files


def write_parquet_sorted(
    df: DataFrame,
    base_path: str,
    name: str,
    sort_cols: list[str],
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Parquet write with rows sorted WITHIN each output file.

    `sortWithinPartitions`, never a global `orderBy`: a global sort
    would add a range-exchange over the whole dataset purely for
    layout. Per-file ordering is what actually pays at read time —
    parquet keeps min/max statistics per row group, so a scan with a
    predicate on the sort column skips whole row groups (the poor
    man's clustering; `zorder_by` generalizes it to 2+ dimensions).
    Typical use: sort event/fact files by timestamp so time-range
    queries read a fraction of each file.
    """
    path = posixpath.join(base_path, name)
    writer = df.sortWithinPartitions(*sort_cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path
