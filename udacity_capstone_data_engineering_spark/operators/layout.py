"""Z-order clustered writes: multi-dimensional data-skipping layout.

The partitioned catalog (``sources/catalog.py``) prunes on ONE
directory key; bucketing (``sources/sinks.py``) co-locates ONE join
key.  The third at-rest lever a 100 TB fact table needs is
multi-dimensional clustering: when scans filter on several columns
(``ts`` AND ``value``; ``customer`` AND ``date``), sorting by any one
column leaves the others scattered across every file, so parquet
row-group min/max statistics skip nothing for them.  Interleaving the
bits of equi-depth bucket ids (a Z-order / Morton curve) gives every
file a compact hyper-rectangle in ALL clustered dimensions at once —
the same layout lever Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``,
built here from plain DataFrame ops:

  1. Per-column equi-depth bucket ids from approx-quantile fences
     (equi-depth, not equi-width, so skewed columns still spread over
     the full 2^bits range).  All fences come from ONE lazy 1-row
     aggregate broadcast-cross-joined back — same structural-agreement
     pattern as ``operators/ranking.py`` (no job at plan time; one
     BroadcastExchange reused by every consumer).
  2. A JVM-side bit-interleave of the bucket ids
     (``functions/zorder.morton_interleave`` — the same curve
     convention as the raw oracle-twinned ``morton_code`` tier; pure
     expression tree, whole-stage codegen, no UDF).
  3. ``repartitionByRange`` on the z-key (contiguous curve segments
     per output file) + ``sortWithinPartitions`` (contiguous segments
     per ROW GROUP within each file), then a plain parquet write.

Scale notes: the only wide exchange is the range partition the
rewrite needs anyway; fences are a 1-row aggregate.  Readers need no
special support — pushed range predicates on the clustered columns
skip row groups through ordinary parquet statistics filtering
(asserted file-level in ``tests/test_layout.py``).

Two tiers share one curve: ``functions/zorder.py`` holds the raw 2-D
``morton_code`` expression over caller-quantized ints (oracle-twinned
via ``zorder_layout_keys``); this module is the MANAGED write path —
N columns, arbitrary orderable types, skew-robust equi-depth
quantile bucketing, and the range-partitioned sorted write — built on
the same ``morton_interleave``.

Reference parity: the reference stopped at flat snappy parquet
(etl.py:56,87,130,180,225,264); this is the engine's extension tier,
alongside date partitioning (notebook cell 45 proposal) and
bucketing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.zorder import (
    morton_interleave,
)
from udacity_capstone_data_engineering_spark.operators.ranking import (
    _key_as_double,
)
from udacity_capstone_data_engineering_spark.sources.sinks import (
    write_parquet,
)

Z_COL = "__z_key"


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    rel_err: float = 0.01,
    out_col: str = Z_COL,
) -> DataFrame:
    """Append a Morton z-key over ``cols`` (2-4 recommended).

    Buckets are equi-depth: fences at quantiles 1/2^bits .. (2^bits-1)/
    2^bits of each column's monotone double image (dates/timestamps via
    epoch micros — ``ranking._key_as_double``).  NULLs take bucket 0,
    matching nulls-first range placement.  All per-column fence arrays
    come from one lazy 1-row aggregate so plan construction runs no
    jobs."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    n_b = 1 << bits
    probs = F.array(*[F.lit(i / n_b) for i in range(1, n_b)])
    acc = F.lit(max(100, int(round(1.0 / rel_err))))
    fence_aliases = [f"__z_f{j}" for j in range(len(cols))]
    fence_row = df.agg(
        *[
            F.percentile_approx(
                _key_as_double(df, F.col(c)), probs, acc
            ).alias(a)
            for c, a in zip(cols, fence_aliases)
        ]
    )
    buckets = []
    for c, a in zip(cols, fence_aliases):
        kd = _key_as_double(df, F.col(c))
        arr = F.col(a)
        buckets.append(
            F.when(kd.isNull(), F.lit(0))
            .otherwise(
                F.coalesce(
                    F.size(F.filter(arr, lambda f: f < kd)), F.lit(0)
                )
            )
            .cast("long")
        )
    return (
        df.crossJoin(F.broadcast(fence_row))
        .withColumn(out_col, morton_interleave(buckets, bits))
        .drop(*fence_aliases)
    )


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    base_path: str,
    name: str,
    bits: int = 8,
    n_files: int | None = None,
    max_records_per_file: int | None = None,
) -> str:
    """Rewrite ``df`` z-ordered on ``cols`` as parquet under
    ``base_path/name``; returns the path.

    ``repartitionByRange`` on the z-key gives each output file a
    contiguous curve segment (compact per-file hyper-rectangles →
    file-level skipping); ``sortWithinPartitions`` orders rows inside
    each file so every parquet ROW GROUP is a sub-segment (row-group-
    level skipping via ordinary statistics pushdown).  The z-key is
    dropped before the write — the layout, not the column, is the
    product.  Size ``n_files`` so one file ≈ one row group budget at
    the target scale."""
    keyed = with_zorder_key(df, cols, bits=bits)
    parts = (
        keyed.repartitionByRange(n_files, F.col(Z_COL))
        if n_files
        else keyed.repartitionByRange(F.col(Z_COL))
    )
    ordered = parts.sortWithinPartitions(Z_COL).drop(Z_COL)
    return write_parquet(
        df=ordered,
        base_path=base_path,
        name=name,
        max_records_per_file=max_records_per_file,
    )
