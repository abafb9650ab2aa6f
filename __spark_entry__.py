"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``udacity_capstone_data_engineering_spark/``;
this module only wires the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)
# Export for python WORKERS too: a sys.path edit fixes only the driver;
# a SparkSession created AFTER this import launches its JVM (and the
# worker daemon) with this env, so workers can unpickle UDF closures
# that reference package functions even from a non-repo CWD. Sessions
# created before the import are covered by the addPyFile fallback in
# session.ensure_worker_imports (called per query).
if _ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _ROOT + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _ROOT
    )

from udacity_capstone_data_engineering_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fact ⋈ dims → per-nation order stats) on sf0.001."""
    return _catalog.flagship_nation_order_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return _catalog.oracle_sql()
