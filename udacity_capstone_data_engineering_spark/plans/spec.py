"""Declarative pipeline specs: a plain-dict (JSON/YAML-shaped) pipeline
description compiled onto the operator catalog.

This is the engine's "no custom IR" stance made concrete (SURVEY.md §3:
user intent → DataFrame expressions → Catalyst; nothing in between):
a spec is data, the compiler below maps each step to a catalog
operator, and the result is ordinary lazy DataFrames scheduled by the
Pipeline DAG — so specs get predicate pushdown, broadcast joins and
AQE for free.

Spec shape::

    {
      "stages": [
        {"name": "orders", "source": "orders"},            # catalog table
        {"name": "big", "input": "orders",                 # derived stage
         "steps": [
            {"op": "filter", "expr": "o_totalprice > 100000"},
            {"op": "select", "mapping": {"custkey": "o_custkey",
                                         "price": "o_totalprice"}},
         ]},
        {"name": "mart", "input": "big", "materialize": true,
         "partition_by": ["segment"],
         "steps": [
            {"op": "join", "right": "customers", "on": "custkey = c_custkey",
             "how": "inner", "broadcast": true},
            {"op": "group_agg", "keys": ["c_mktsegment"],
             "aggs": {"n": "count(1)"}},
         ]},
      ]
    }

Steps: filter · select · drop · cast · fillna · dedup · join ·
group_agg · window_topk · sql (free-form expression escape hatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.aggregates import group_agg
from udacity_capstone_data_engineering_spark.operators.joins import equi_join
from udacity_capstone_data_engineering_spark.operators.projections import (
    cast_columns,
    dedup_by_key,
    drop_columns,
    fill_nulls,
    project,
)
from udacity_capstone_data_engineering_spark.operators.windows import top_k_per_group
from udacity_capstone_data_engineering_spark.plans.pipeline import Pipeline, Stage
from udacity_capstone_data_engineering_spark.sources.catalog import load_table


def _apply_step(df: DataFrame, step: dict, resolved: dict[str, DataFrame]) -> DataFrame:
    op = step["op"]
    if op == "filter":
        return df.filter(step["expr"])
    if op == "select":
        return project(df, step["mapping"])
    if op == "drop":
        return drop_columns(df, step["cols"])
    if op == "cast":
        return cast_columns(df, step["casts"])
    if op == "fillna":
        return fill_nulls(df, step["values"])
    if op == "dedup":
        return dedup_by_key(
            df,
            step["keys"],
            [F.expr(e) for e in step["order_by"]],
            keep=step.get("keep", "first"),
        )
    if op == "join":
        right = resolved[step["right"]]
        return equi_join(
            df,
            right,
            F.expr(step["on"]),
            how=step.get("how", "inner"),
            broadcast_right=step.get("broadcast", False),
        )
    if op == "group_agg":
        return group_agg(df, step["keys"], step["aggs"])
    if op == "window_topk":
        return top_k_per_group(
            df, step["keys"], [F.expr(e) for e in step["order_by"]], step["k"]
        )
    if op == "sql":
        return df.selectExpr(*step["exprs"])
    raise ValueError(f"unknown spec op {op!r}")


def compile_spec(
    spark: SparkSession,
    spec: dict,
    sf_dir: str | None = None,
    workdir: str | None = None,
) -> Pipeline:
    """Compile a spec dict into a runnable Pipeline. ``source`` stages
    read catalog tables from ``sf_dir``; join steps may reference any
    earlier stage by name."""
    pl = Pipeline(spark, workdir=workdir)
    for st in spec["stages"]:
        name = st["name"]
        if "source" in st:
            if sf_dir is None:
                raise ValueError(f"stage {name!r} needs sf_dir for source load")
            table = st["source"]

            def src_fn(_table=table):
                return load_table(spark, sf_dir, _table)

            pl.add(Stage(name, src_fn, [],
                         st.get("materialize", False), st.get("partition_by")))
            continue

        inputs = [st["input"]]
        # join steps pull additional stage inputs
        joins = [s["right"] for s in st.get("steps", []) if s["op"] == "join"]
        inputs += joins
        steps = st.get("steps", [])

        def fn(*dfs, _steps=steps, _inputs=tuple(inputs)):
            resolved = dict(zip(_inputs, dfs))
            df = dfs[0]
            for s in _steps:
                df = _apply_step(df, s, resolved)
            return df

        pl.add(Stage(name, fn, inputs,
                     st.get("materialize", False), st.get("partition_by")))
    return pl
