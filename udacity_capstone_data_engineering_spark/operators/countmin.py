"""Count-min sketch: bounded-memory frequency summaries.

Companion to the Misra-Gries heavy-hitter summary
(`operators/heavy_hitters.py`): MG answers "which keys are frequent",
CMS answers point frequency queries for ANY key with additive error
<= e*N (e = exp(1)/width... canonically; here the simple 1/width bound
per row, min over `depth` independent rows) and NEVER underestimates.
The sketch is a (depth x width) counter grid — mergeable by cell-wise
sum, so partial sketches from any partitioning/stream combine exactly.

Determinism: bucket = portable 60-bit md5 hash of ``"{row}:{key}"``
modulo width (`functions/hashing.py` — engine-portable), so the full
sketch is bit-reproducible in DuckDB and carries a full value-hash
oracle, unlike the usual seeded-murmur sketches.

Scale shape: the ONLY key-cardinality-sized shuffle is the exact
per-key partial count (map-side combined); the distinct-key relation
is then mapped to `depth` cells each and re-aggregated onto the
(depth x width)-bounded grid — a second shuffle of at most
depth*width groups. Raw keys never fan out ``depth``-fold; only the
already-reduced distinct-key rows do. At 100 TB the grid is a few KB
per executor regardless of vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

DEPTH = 4
WIDTH = 256


def cms_bucket(key: Column, row: int, width: int = WIDTH) -> Column:
    """Deterministic CMS bucket of ``key`` for sketch row ``row``."""
    return (portable_hash64(key, seed=row) % width).cast("int")


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build the (depth x width) sketch over ``df[key_col]``.

    Returns the non-zero cells as (sketch_row, sketch_col, cnt) —
    at most depth*width rows however large the input.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    # Phase 1: exact per-key partials — the one data-sized shuffle,
    # keyed by the 60-bit key hash (raw strings stay map-side).
    per_key = (
        df.select(F.col(key_col).alias("__k"), w.alias("__w"))
        .groupBy(portable_hash64(F.col("__k")).alias("kh"), F.col("__k"))
        .agg(F.sum("__w").alias("c"))
    )
    # Phase 2: fan the DISTINCT keys out to their depth cells and
    # reduce onto the bounded grid.
    cells = per_key.select(
        F.posexplode(
            F.array(*[cms_bucket(F.col("__k"), r, width) for r in range(depth)])
        ).alias("sketch_row", "sketch_col"),
        F.col("c"),
    )
    return (
        cells.groupBy("sketch_row", "sketch_col")
        .agg(F.sum("c").alias("cnt"))
        .select("sketch_row", "sketch_col", F.col("cnt").cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]``: min over the
    sketch rows of the addressed counters (0 when a cell is absent).
    The sketch is grid-bounded, so it broadcasts."""
    probes = keys.select(F.col(key_col).alias("key")).distinct()
    probes = probes.select(
        "key",
        F.posexplode(
            F.array(*[cms_bucket(F.col("key"), r, width) for r in range(depth)])
        ).alias("sketch_row", "sketch_col"),
    )
    joined = probes.join(
        F.broadcast(sketch), ["sketch_row", "sketch_col"], "left"
    ).select("key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cell"))
    return joined.groupBy("key").agg(F.min("cell").alias("estimate"))


def countmin_stream(
    rows: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Streaming count-min: the same grid as :func:`countmin_sketch`,
    maintained as a PLAIN streaming aggregation — because CMS cells
    merge by sum, no custom stateful processor is needed (contrast the
    streaming Misra-Gries, whose compress step needs
    ``applyInPandasWithState``). State is exactly the (depth x width)
    grid however many distinct keys the stream carries — the bounded
    stand-in for an unbounded streaming count-distinct aggregation.

    The batch operator's two-phase distinct-key trick needs a full
    pass, so the stream pays the depth-fold fan-out per occurrence —
    the price of unbounded input. Update-mode emissions are the
    changed cells per micro-batch; cnt is monotone per cell, so the
    latest value per (sketch_row, sketch_col) is the current sketch.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    keyed = rows.filter(F.col(key_col).isNotNull()).select(
        F.posexplode(
            F.array(
                *[cms_bucket(F.col(key_col), r, width) for r in range(depth)]
            )
        ).alias("sketch_row", "sketch_col"),
        w.alias("__w"),
    )
    return keyed.groupBy("sketch_row", "sketch_col").agg(
        F.sum("__w").cast("bigint").alias("cnt")
    )


def countmin_sketch_oracle_sql(
    key_expr_from: str, depth: int = DEPTH, width: int = WIDTH
) -> str:
    """DuckDB spelling: ``key_expr_from`` is a SQL fragment yielding
    (k, w) rows, e.g. a token unnest with weight 1."""
    rows = " UNION ALL ".join(
        f"SELECT {r} AS sketch_row, "
        f"CAST({portable_hash64_sql('k', seed=r)} % {width} AS INTEGER) "
        f"AS sketch_col, c FROM per_key"
        for r in range(depth)
    )
    return f"""
    WITH src AS ({key_expr_from}),
    per_key AS (SELECT k, CAST(sum(w) AS BIGINT) AS c FROM src GROUP BY k),
    cells AS ({rows})
    SELECT sketch_row, sketch_col, CAST(sum(c) AS BIGINT) AS cnt
    FROM cells GROUP BY sketch_row, sketch_col
    """
