"""Streaming joins and streaming deduplication.

Extension tier (the reference is batch-only — SURVEY.md §2.8): the two
stream-shaped operators every event pipeline needs beyond windowed
aggregation.

Stream-static join: enrich a stream against a slowly-changing dimension.
Spark re-plans the static side per micro-batch, so a broadcast hint
keeps the stream side shuffle-free — at 100 TB/day of events the stream
must never shuffle for an enrichment lookup.

Streaming dedup: ``dropDuplicatesWithinWatermark`` bounds the dedup
state by event-time — without the watermark bound, exactly-once dedup
state grows forever. Keys seen within the watermark horizon are
dropped as duplicates; state for expired horizons is reclaimed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join. The dimension is broadcast by
    default: the streaming side keeps its partitioning (no shuffle per
    micro-batch), and dim updates are picked up on re-read since the
    static plan re-resolves each batch for file sources."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark_delay: str,
) -> DataFrame:
    """Watermark-bounded streaming deduplication: drop rows whose key
    was already seen within the watermark horizon. State size is
    O(distinct keys per horizon), not O(stream history)."""
    wm = stream.withWatermark(event_time_col, watermark_delay)
    return wm.dropDuplicatesWithinWatermark(keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_watermark: str,
    right_watermark: str,
    lookback: str = "1 minute",
    lookahead: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM join on a shared key within an event-time interval:
    right rows within ``[left_time - lookback, left_time + lookahead]``.

    Both sides must be watermarked — the watermarks plus the time-range
    condition are what let Spark BOUND the join state: each side buffers
    only rows younger than (watermark + interval), instead of the whole
    stream history. Without the range condition a stream-stream join is
    rejected for non-inner types and state grows forever for inner.

    Scale shape: both streams shuffle once on the key (co-partitioned
    state store); state per key is O(rows within the interval horizon).
    """
    lw = left.withWatermark(left_time, left_watermark)
    rw = right.withWatermark(right_time, right_watermark).withColumnRenamed(
        key, f"{key}_r"
    )
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (rw[right_time] >= lw[left_time] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {lookahead}"))
    )
    return lw.join(rw, cond, how)
