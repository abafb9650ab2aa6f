"""Operator catalog: projections, joins, aggregates, windows, set ops,
dedup, and similarity search — each expressed as plain DataFrame
transformations so Catalyst owns optimization.
"""

from udacity_capstone_data_engineering_spark.operators.projections import (
    cast_columns,
    dedup_by_key,
    drop_columns,
    fill_nulls,
    project,
)
from udacity_capstone_data_engineering_spark.operators.joins import (
    equi_join,
    fk_orphans,
)
from udacity_capstone_data_engineering_spark.operators.aggregates import (
    group_agg,
    null_profile,
)

__all__ = [
    "cast_columns",
    "dedup_by_key",
    "drop_columns",
    "fill_nulls",
    "project",
    "equi_join",
    "fk_orphans",
    "group_agg",
    "null_profile",
]
