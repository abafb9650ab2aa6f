"""Misra-Gries heavy hitters: bounded-memory frequent items.

``groupBy(key).count()`` is the exact heavy-hitter plan and scales
fine — until the KEY is ultra-high-cardinality (user ids, URLs,
n-grams at 100 TB), where the shuffle materializes one row per
distinct key: fine for counts, ruinous when the downstream question
is only "which few keys exceed phi of the traffic".  The
Misra-Gries summary answers that with k counters per partition and a
provable bound, the mergeable-summaries way (Agarwal et al., PODS'12):

  1. PARTIAL — ``mapInPandas`` keeps at most ``k`` weighted counters
     per partition (Arrow batches; pandas ``value_counts`` per batch,
     then a compress step that subtracts the (k+1)-th largest weight
     from every counter and drops the non-positive).  Each partition
     emits <= k (item, est) rows plus one marker row carrying its
     total decrement weight.
  2. MERGE — itemwise SUM of the partial estimates (a <= P*k-row
     relation, map-side combined) and the global decrement total D.
     Standard argument: every compress destroys >= m*(k+1) weight and
     only n weight exists, so summed over all partitions
     **D <= n/(k+1)**, independent of the partition count.
  3. BOUNDS — for every item, est <= true <= est + D.  Any item with
     true count > D is guaranteed present; reporting items with
     est > phi*n therefore never misses an item with
     true > phi*n + D.

When every partition stays under k distinct keys, no compress ever
fires, D = 0, and the summary IS the exact count table — the regime
the oracle-paired catalog query pins (hash vs ``GROUP BY`` +
``HAVING``).  The adversarial regime (tiny k, zipf data, forced
compressions) is covered by the property tests, which assert the
guarantee and the bounds against exact counts.

Scale shape: one narrow-column scan, Python crossed once per
partition over Arrow batches with O(k) state, a <= P*k-row merge
aggregate, one broadcast of the 1-row (n, D) totals.  No data-sized
shuffle on the high-cardinality key — that is the point.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUPPORTED = (T.LongType, T.IntegerType, T.ShortType, T.StringType)


def mg_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: <= k (item, est) rows per
    partition plus one null-item marker row with that partition's
    total decrement weight."""
    if k < 1:
        raise ValueError("k must be >= 1")
    field = df.schema[col]
    if not isinstance(field.dataType, _SUPPORTED):
        raise TypeError(
            f"misra-gries over {field.dataType}; cast to long/string first"
        )
    out_schema = T.StructType(
        [
            T.StructField("item", field.dataType, True),
            T.StructField("est", T.LongType(), False),
            T.StructField("dec", T.LongType(), False),
            T.StructField("npart", T.LongType(), False),
        ]
    )
    narrow = df.select(F.col(col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        dec_total = 0
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for item, w in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(w)
            if len(counters) > k:
                # subtract the (k+1)-th largest weight from everyone;
                # >= k+1 counters lose m each => >= m*(k+1) weight gone
                m = sorted(counters.values(), reverse=True)[k]
                dec_total += m
                counters = {
                    i: c - m for i, c in counters.items() if c - m > 0
                }
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "est": list(counters.values()) + [0],
                "dec": [0] * len(counters) + [dec_total],
                # compress destroys >= m*(k+1) but <= full counter
                # weights; only the exact per-partition row count n_p
                # gives an exact global n, so the marker carries it
                "npart": [0] * len(counters) + [n_part],
            }
        )
        yield out

    return narrow.mapInPandas(summarize, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    phi: float = 0.01,
) -> DataFrame:
    """Items whose estimated frequency exceeds ``phi`` of non-null
    rows, with deterministic-given-partitioning bounds:

    - ``est_count``   — lower bound (sum of partial estimates)
    - ``max_count``   — upper bound ``est + D`` (D = global decrement
      weight, <= n/(k+1))
    - ``n_total``     — non-null row count

    Guaranteed complete for every item with true count >
    ``phi*n + D``; with k sized so each partition holds <= k distinct
    keys, D = 0 and the output is exactly ``GROUP BY .. HAVING
    count > phi*n``."""
    # Both the itemwise merge and the (n, D) totals read the partials;
    # persisting the <=P*k-row summary keeps the one-pass promise (the
    # same shared-aggregate pattern as tpch_q11's per_part persist).
    partials = mg_partials(df, col, k).persist()
    merged = (
        partials.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est_count"))
    )
    totals = partials.agg(
        F.sum("npart").alias("n_total"),
        F.sum("dec").alias("d_total"),
    )
    return (
        merged.crossJoin(F.broadcast(totals))
        .filter(
            F.col("est_count")
            > F.col("n_total").cast("double") * F.lit(float(phi))
        )
        .select(
            "item",
            "est_count",
            (F.col("est_count") + F.col("d_total")).alias("max_count"),
            "n_total",
        )
    )
