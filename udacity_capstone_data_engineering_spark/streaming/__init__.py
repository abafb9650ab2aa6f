"""Streaming tier: time-window aggregations usable in batch AND
Structured Streaming (the reference is batch-only; SURVEY.md §2.8)."""

from udacity_capstone_data_engineering_spark.streaming.sinks import stream_to_files
from udacity_capstone_data_engineering_spark.streaming.windows import (
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = ["tumbling_window_agg", "sliding_window_agg", "stream_to_files"]
