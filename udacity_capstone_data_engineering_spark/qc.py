"""Data-quality operators (SURVEY.md §2.9 Q1-Q4) — the reference's
distinctive surface, with its two semantic bugs fixed:

  - ``qhi.check_integrity`` (reference ``qhi.py:39-91``) passed when
    *some* fact keys overlapped the dim and its combined return value
    ANDed the FAILURE flags (inverted vs. its docstring). Here an FK
    check is a LEFT ANTI join: zero unmatched keys ⇔ pass.
  - ``qhi.data_exists`` (``qhi.py:20-37``) printed pass/fail; here all
    checks return structured results usable in pipelines and tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.joins import fk_orphans
from udacity_capstone_data_engineering_spark.operators.setops import duplicate_witness


@dataclass(frozen=True)
class QCResult:
    name: str
    passed: bool
    detail: str


def assert_nonempty(df: DataFrame, name: str = "table") -> QCResult:
    """Q1: table materialized with >0 rows."""
    n = df.count()
    return QCResult(f"nonempty:{name}", n > 0, f"{n} rows")


def fk_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str = "fk"
) -> QCResult:
    """Q2 (corrected): every non-null fact key exists in the dim."""
    violations = fk_orphans(fact, fact_key, dim, dim_key).count()
    return QCResult(
        f"fk:{name}:{fact_key}->{dim_key}", violations == 0, f"{violations} orphan keys"
    )


def profile_nulls(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Q3: per-column null ratio, one aggregate pass (delegates to the
    operator so pipelines and QC share one implementation)."""
    from udacity_capstone_data_engineering_spark.operators.aggregates import null_profile

    return null_profile(df, cols)


def duplicate_rows(df: DataFrame, cols: list[str], name: str = "dups") -> QCResult:
    """Q4: no duplicate projections onto ``cols`` (exceptAll witness,
    the reference's notebook cell 17 idiom made deterministic)."""
    n = duplicate_witness(df, cols).count()
    return QCResult(f"dups:{name}", n == 0, f"{n} duplicate rows")


def check_expectations(
    df: DataFrame, rules: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Declarative row-level expectations (the expectations-framework
    shape): each rule is (name, boolean Column that should hold for
    every row). Returns one row per rule: (rule, violations, n_rows).

    ONE aggregate pass over the table no matter how many rules —
    violations are conditional counts, combined map-side — so adding a
    rule costs an expression, not a scan. NULL rule results count as
    violations (three-valued logic: an unknown is not a pass).
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(cond.cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in rules
    ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    names = [name for name, _ in rules]
    stacked = wide.select(
        F.expr(
            "stack({}, {}) as (rule, violations)".format(
                len(names),
                ", ".join(f"'{n}', `{n}`" for n in names),
            )
        ),
        F.col("__n").alias("n_rows"),
    )
    return stacked.select("rule", "violations", "n_rows")


def run_suite(checks: list[QCResult]) -> bool:
    """All checks must pass (the reference ANDed failure flags —
    ``qhi.py:91`` — returning True iff everything FAILED)."""
    return all(c.passed for c in checks)


def observed(df: DataFrame, name: str, metrics: dict[str, "F.Column"]):
    """Attach free QC telemetry to a DataFrame via ``df.observe``.

    Returns ``(df_with_observation, observation)``; after ANY action on
    the returned frame, ``observation.get`` yields the metric values —
    computed inline by the SAME job, with zero extra scans or shuffles.
    This is how a 100-TB pipeline records row counts, null counts, and
    domain violations per stage without doubling its I/O: a separate
    ``df.count()`` / profile pass would re-read the stage input.
    Metrics must be aggregate expressions (count/sum/min/max over the
    rows the action actually processed).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    exprs = [col.alias(alias) for alias, col in metrics.items()]
    return df.observe(obs, *exprs), obs
