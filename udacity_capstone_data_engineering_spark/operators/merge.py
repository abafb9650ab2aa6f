"""Upsert / merge: latest-wins key reconciliation.

The incremental-load operation the reference's monthly-batch design
implies but never implements (its pipeline is full-overwrite only,
``etl.py:56,87,130,180,225,264``): fold a batch of updates into a base
table, keeping exactly one row per key — the one with the highest
precedence (version/timestamp/source rank).

Scale shape: UNION ALL then ONE shuffle on the key for the window —
the same cost as the dedup it generalizes, and strictly cheaper than
the naive anti-join + union (two shuffles of the base). With the base
bucketed on the key (``sources.sinks.write_bucketed``) the shuffle
drops to re-bucketing only the (small) update batch. This is the
engine-level equivalent of MERGE INTO ... WHEN MATCHED UPDATE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest_wins(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    precedence: list[str],
) -> DataFrame:
    """One row per key from ``base ∪ updates``: highest ``precedence``
    wins (compared column-by-column, descending). ``precedence`` must
    totally order rows within a key for a deterministic result — e.g.
    (version, source_rank)."""
    merged = base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in precedence]
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
