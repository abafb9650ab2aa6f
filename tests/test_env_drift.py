"""Environment-drift canary (VERDICT r2 #8).

The container's pyspark moved 4.0 -> 4.1.2 mid-round-2 and silently
changed how the nanosecond-timestamp ``events.parquet`` surfaces (raw
nanos LongType under ``nanosAsLong`` vs native TIMESTAMP_NTZ truncated
to micros). The catalog normalizes both shapes to one microsecond
``TimestampType`` (``sources/catalog.py``); these tests pin that
invariant against WHATEVER pyspark is installed, cross-checked against
DuckDB's independent read of the same parquet bytes. Run these first
when anything looks off after an image rebuild.
"""

from __future__ import annotations

import posixpath

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from udacity_capstone_data_engineering_spark.sources.catalog import load_table


class TestEventsTimestampInvariant:
    def test_ts_is_session_tz_timestamp(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        assert isinstance(ev.schema["ts"].dataType, TimestampType), (
            "catalog must surface events.ts as TimestampType on "
            f"pyspark {spark.version}"
        )

    def test_ts_micros_match_duckdb(self, spark, sf_dir):
        """Min/max/count of the normalized ts agree with DuckDB's
        independent nanos->micros read of the same file. Catches both
        failure modes seen across the 4.0->4.1 drift: a reader that
        refuses TIMESTAMP(NANOS) outright, and a normalization that
        divides instead of truncating (off-by-<=128ns on int64 nanos
        above 2^53)."""
        import os

        path = posixpath.join(sf_dir, "events.parquet")
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        oracle = duckdb.sql(
            "SELECT count(*) AS n,"
            "       epoch_us(min(ts)) AS min_us,"
            "       epoch_us(max(ts)) AS max_us "
            f"FROM read_parquet('{pattern}')"
        ).fetchone()
        got = (
            load_table(spark, sf_dir, "events")
            .agg(
                F.count("*").alias("n"),
                F.unix_micros(F.min("ts")).alias("min_us"),
                F.unix_micros(F.max("ts")).alias("max_us"),
            )
            .first()
        )
        assert (got["n"], got["min_us"], got["max_us"]) == oracle

    def test_legacy_reader_retry_path_is_wired(self, spark, sf_dir):
        """The <4.1 fallback (_read_events_parquet) must re-raise
        unrelated errors untouched and only set the legacy conf on the
        nanos schema error."""
        from udacity_capstone_data_engineering_spark.sources.catalog import (
            _read_events_parquet,
        )

        with pytest.raises(Exception) as exc_info:
            _read_events_parquet(spark, "/nonexistent/__nope__.parquet")
        assert "NANOS" not in str(exc_info.value)
