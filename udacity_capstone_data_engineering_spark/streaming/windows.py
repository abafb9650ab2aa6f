"""Time-window aggregations over event streams.

``F.window`` works identically on a batch DataFrame and a streaming one,
so these operators serve both modes: in batch they are oracle-checkable
(DuckDB ``date_trunc``-equivalent); in streaming the same call composes
with ``withWatermark`` for late-data handling. The reference has no
streaming surface at all (SURVEY.md §2.8) — this is the engine's
extension tier, built the idiomatic Structured-Streaming way.

Scale note: windowed aggregation shuffles on (window, keys); partial
aggregation happens map-side first, so 100 TB of raw events reduces to
|windows|x|keys| rows before the shuffle. Sliding windows multiply each
row into ceil(window/slide) panes — keep slide >= window/4 at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping windows of ``duration``; batch or streaming."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"event_count": "count(1)"}
    win = F.window(F.col(ts_col), duration)
    grouped = df.groupBy(win, *(keys or []))
    out = grouped.agg(*(F.expr(e).alias(n) for n, e in aggs.items()))
    return out.select(
        F.col("window.start").alias("window_start"),
        *(keys or []),
        *aggs.keys(),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: length ``duration`` advancing by ``slide``."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"event_count": "count(1)"}
    win = F.window(F.col(ts_col), duration, slide)
    grouped = df.groupBy(win, *(keys or []))
    out = grouped.agg(*(F.expr(e).alias(n) for n, e in aggs.items()))
    return out.select(
        F.col("window.start").alias("window_start"),
        *(keys or []),
        *aggs.keys(),
    )
