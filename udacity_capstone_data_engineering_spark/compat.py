"""Drop-in compatibility surface for reference users.

The reference exposes (``etl.py``, ``qhi.py``):

  - ``create_spark_session()``                       (etl.py:20-31)
  - ``run_pipeline(spark, output_path)``             (etl.py:281-314)
  - ``read_data(spark, output_path)``                (etl.py:316-334)
  - ``cast_totype(df, cols, type)``                  (qhi.py:3-17)
  - ``data_exists(df, table_name)``                  (qhi.py:20-37)
  - ``check_integrity(fact, dims...)``               (qhi.py:39-91)

This module keeps those call shapes — except ``run_pipeline``, which
now takes the four input DataFrames explicitly instead of reading
hard-coded paths (the engine separates reading from transforming, so a
reference call site must add the four ``read_*`` results) — so a user
of the reference can switch imports and run the same workflow, with
the reference's defects corrected (documented per function): sane paths instead of the broken
``s3a//`` relative-dir and Windows backslash joins (etl.py:302,180),
fill-9-not-0 (etl.py:170-171), a temperature join that actually
matches (etl.py:212,218), no Python date UDF (etl.py:255-257), and a
``check_integrity`` whose return value means what its docstring says
(qhi.py:91 ANDed the FAILURE flags).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from udacity_capstone_data_engineering_spark import qc
from udacity_capstone_data_engineering_spark.operators.projections import cast_columns
from udacity_capstone_data_engineering_spark.plans.star_schema import build_star_schema
from udacity_capstone_data_engineering_spark.session import get_spark

TABLE_NAMES = (
    "immigration_fact",
    "i94mode_dim",
    "i94visa_dim",
    "demographics_dim",
    "country_dim",
    "i94date_dim",
)


def create_spark_session(**kwargs) -> SparkSession:
    """Reference ``create_spark_session`` (etl.py:20-31). The reference
    set ``spark.jars.packages`` twice so its second config silently
    overwrote the first; here configuration goes through one builder."""
    return get_spark(**kwargs)


def run_pipeline(
    spark: SparkSession,
    immigration_df: DataFrame,
    demographics_df: DataFrame,
    temperature_df: DataFrame,
    country_df: DataFrame,
    output_path: str,
) -> dict[str, DataFrame]:
    """Reference ``run_pipeline`` (etl.py:281-314): build + materialize
    the 6-table star schema. Inputs are DataFrames (the reference mixed
    reading and transforming; the engine separates them so any source —
    parquet, CSV, SAS-converted — plugs in)."""
    return build_star_schema(
        spark, immigration_df, demographics_df, temperature_df, country_df, output_path
    )


def read_data(spark: SparkSession, output_path: str) -> dict[str, DataFrame]:
    """Reference ``read_data`` (etl.py:316-334): re-open the six
    materialized tables (posix joins — the reference's ``"\\table"``
    concatenation only worked on Windows)."""
    return {
        name: spark.read.parquet(posixpath.join(output_path, name))
        for name in TABLE_NAMES
    }


def cast_totype(df: DataFrame, cols: list[str], totype: str) -> DataFrame:
    """Reference ``qhi.cast_totype`` (qhi.py:3-17), as ONE select
    instead of a withColumn loop (O(n) nested plans)."""
    return cast_columns(df, {c: totype for c in cols})


def data_exists(df: DataFrame, table_name: str) -> bool:
    """Reference ``qhi.data_exists`` (qhi.py:20-37): True iff the table
    materialized non-empty."""
    return qc.assert_nonempty(df, table_name).passed


def check_integrity(
    fact: DataFrame,
    mode_dim: DataFrame,
    visa_dim: DataFrame,
    demographics_dim: DataFrame,
    country_dim: DataFrame,
) -> bool:
    """Reference ``qhi.check_integrity`` (qhi.py:39-91) with corrected
    semantics: True iff EVERY foreign key fully resolves (left-anti
    count == 0). The reference passed on any-overlap per key and its
    combined return was inverted (True iff every check failed)."""
    checks = [
        qc.fk_check(fact, "i94mode", mode_dim, "i94mode", "mode"),
        qc.fk_check(fact, "i94visa", visa_dim, "vid", "visa"),
        qc.fk_check(fact, "i94addr", demographics_dim, "State Code", "addr"),
        qc.fk_check(fact, "i94res", country_dim, "Code", "res"),
    ]
    return qc.run_suite(checks)
