"""SparkSession factory with scale-ready defaults.

Replaces the reference's session factory (``etl.py:20-31``) which set
``spark.jars.packages`` twice (the second ``.config`` overwrote the first)
and relied on implicit defaults. Here the defaults are chosen for large
clusters and merely *bounded* for local runs:

  - AQE on (runtime shuffle-partition coalescing, skew-join splitting).
  - Arrow on (vectorized pandas-UDF transfer for the few Python ops).
  - Session timezone pinned to UTC for deterministic date/timestamp math.
  - ``spark.sql.shuffle.partitions`` set from the env/cpu count locally;
    on a real cluster AQE re-coalesces, so a generous initial value is
    safe at 100 TB while not over-sharding a laptop run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "udacity_capstone_data_engineering_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession.Builder:
    """Return a configured builder; caller may further customize."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder


def get_spark(**kwargs) -> SparkSession:
    """Create or reuse the engine SparkSession."""
    return session_builder(**kwargs).getOrCreate()
