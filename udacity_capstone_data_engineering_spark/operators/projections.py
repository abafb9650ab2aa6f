"""Projection-family operators (SURVEY.md §2.2 P1-P9).

All multi-column rewrites are expressed as ONE ``select`` instead of the
reference's chained ``withColumn`` loops (``qhi.py:15-17`` — O(n) nested
plan objects; measurably slower analysis on wide tables and harmful at
100-TB plan sizes where analysis time multiplies across thousands of
tasks' worth of plan shipping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def project(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Select + rename: ``{output_name: input_column_or_sql_expr}`` (P1).

    Values are SQL expression strings, so renames, casts and computed
    columns all flow through one code path and stay JVM-side.
    """
    return df.select(*(F.expr(expr).alias(name) for name, expr in mapping.items()))


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Drop columns (P2; reference drops its >60%-null columns,
    ``etl.py:163-168``). Catalyst folds this into scan-level pruning."""
    return df.drop(*cols)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Multi-column cast in one select (P4; replaces ``qhi.cast_totype``'s
    withColumn loop, reference ``qhi.py:3-17``)."""
    return df.select(
        *(
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        )
    )


def fill_nulls(df: DataFrame, values: dict[str, object]) -> DataFrame:
    """Per-column null fill (P7; reference ``etl.py:171``).

    The reference's comment says "replace nulls with 9 (Not reported)"
    but fills 0 — a key absent from its own dim. This engine takes the
    mapping explicitly so the intended sentinel is spelled at the call
    site.
    """
    return df.na.fill(values)


def dedup_by_key(
    df: DataFrame, keys: list[str], order_by: list, keep: str = "first"
) -> DataFrame:
    """Deterministic dropDuplicates (P9; reference ``etl.py:158,254``).

    Spark's ``dropDuplicates(subset)`` keeps an ARBITRARY row per key —
    fine for the reference's no-op usage, but nondeterministic results
    don't survive an oracle hash or a re-run at scale. We keep the first
    row under an explicit total order via a ranking window.

    Scale note: this is one shuffle on ``keys`` (same cost as
    dropDuplicates) and the window is evaluated streaming per key group;
    skewed keys are handled by AQE skew-join-style splitting of the
    sort-based window since the rank predicate prunes early.
    """
    ordering = [c.desc() if keep == "last" else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
