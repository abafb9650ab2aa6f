"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's answer to "operators Spark lacks" in streaming form
(SURVEY.md §2.8 extension): per-key session tracking with explicit
state — the pattern behind sessionization, funnel detection, and
rate-limiting over unbounded streams. Batch-mode sessionization exists
as a window query (``events_sessionize``); this is the true streaming
formulation with state and timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_ts long, n_events long, n_sessions long"


def _session_fn(gap_ns: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, n_events, n_sessions = state.get
        else:
            last_ts, n_events, n_sessions = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pdf["ts"].tolist()):
                if last_ts is None or ts - last_ts > gap_ns:
                    n_sessions += 1
                last_ts = ts
                n_events += 1
        state.update((last_ts, n_events, n_sessions))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return update


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Streaming sessionization: per-user event/session counters kept in
    explicit state across micro-batches. ``ts_col`` is nanos-since-epoch
    (the events table's native representation).

    State is O(1) per user (3 longs); the shuffle is the groupBy on
    user_id — the same key a production stream would already be
    partitioned by.
    """
    gap_ns = gap_minutes * 60 * 1_000_000_000
    return (
        events.selectExpr("user_id", f"{ts_col} as ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ns),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
