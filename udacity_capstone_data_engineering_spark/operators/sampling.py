"""Deterministic sampling and dataset splitting.

Training-data curation needs splits and samples that are (a) stable
across runs and engines — re-running the pipeline must not move a
document from train to test — and (b) a pure function of the record
key, so the assignment survives repartitioning, cluster resizing, and
incremental appends. Spark's ``df.sample``/``randomSplit`` are neither
(partition-RNG based). Both ops here derive the decision from the
engine-portable 60-bit md5 hash (``functions/hashing.py``), so a DuckDB
oracle — or any other engine — reproduces the exact assignment.

Scale shape: narrow, shuffle-free map over the key column; whole-stage
codegen end-to-end (md5 + conv + pmod are all JVM builtins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import portable_hash64

BUCKETS = 10_000  # split granularity: 0.01% resolution


def _bucket(key: Column | str, seed: int) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash64(c.cast("string"), seed=seed) % BUCKETS


def hash_split(
    df: DataFrame,
    key: Column | str,
    fractions: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash-bucketing its key.

    ``fractions`` maps split name → fraction, in order, summing to 1
    (e.g. ``{"train": 0.8, "valid": 0.1, "test": 0.1}``). Assignment is
    by cumulative threshold over ``hash(key) % 10000``.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = _bucket(key, seed)
    expr, cum = None, 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def hash_split_case_sql(key_expr: str, fractions: dict[str, float], seed: int = 0) -> str:
    """DuckDB spelling of :func:`hash_split`'s assignment expression."""
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64_sql,
    )

    bucket = f"({portable_hash64_sql(f'CAST({key_expr} AS VARCHAR)', seed)} % {BUCKETS})"
    names = list(fractions)
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {bucket} < {int(round(cum * BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash — the
    repeatable alternative to ``df.sample`` for data diets and debug
    subsets; the same key is kept at every scale factor."""
    return df.filter(_bucket(key, seed) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: a different keep-fraction per
    stratum value (the `sampleBy` shape, but hash-derived so the kept
    set is stable across runs/engines/partitionings). Strata absent
    from ``fractions`` keep ``default_fraction``. Shuffle-free: the
    per-row threshold is a CASE over the stratum column."""
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0,1], got {frac}")
    thresh = None
    for stratum, frac in fractions.items():
        t = F.lit(int(round(frac * BUCKETS)))
        cond = F.col(strata_col) == stratum
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(int(round(default_fraction * BUCKETS)))
    return df.filter(_bucket(key, seed) < thresh)


def stratified_sample_where_sql(
    key_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    seed: int = 0,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB spelling of :func:`stratified_sample`'s filter predicate."""
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64_sql,
    )

    bucket = f"({portable_hash64_sql(f'CAST({key_expr} AS VARCHAR)', seed)} % {BUCKETS})"
    parts = [
        f"WHEN {strata_expr} = '{s}' THEN {int(round(f * BUCKETS))}"
        for s, f in fractions.items()
    ]
    case = (
        "CASE " + " ".join(parts) + f" ELSE {int(round(default_fraction * BUCKETS))} END"
    )
    return f"{bucket} < {case}"
