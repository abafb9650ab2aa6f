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
from pyspark.sql import functions as F
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


def _twspandas_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` ships its driver-side
    worker over a protobuf channel — the ``protobuf`` Python package
    must be importable or the streaming runner crashes at init
    (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE /
    ImportError google.protobuf.descriptor)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_stream(events: DataFrame, key_col: str = "user_id",
                          value_col: str = "value") -> DataFrame:
    """Per-key running (count, sum) via Spark 4's ``StatefulProcessor``
    API (``transformWithStateInPandas``) — the successor to
    ``applyInPandasWithState`` with named state variables, TTL, and
    timers. Explicit plugin point: requires the ``protobuf`` Python
    package (not bundled in this container) AND the RocksDB state store
    provider; when absent, fails with the exact dependency to add
    instead of a crashed-worker stack. The working in-container
    equivalent is :func:`sessionize_stream` (applyInPandasWithState).
    """
    if not _twspandas_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' Python "
            "package (pip install protobuf) and "
            "spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider; use sessionize_stream "
            "(applyInPandasWithState) where protobuf is unavailable"
        )
    from pyspark.sql.streaming import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total": [total]}
            )

        def close(self):
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=f"{key_col} long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: key-space-sharded Misra-Gries state (round 5)
# ---------------------------------------------------------------------------

HH_OUT_SCHEMA = (
    "shard int, item string, est_count long, dec_total long, n_shard long"
)
HH_STATE_SCHEMA = (
    "items array<string>, counts array<long>, dec long, n long"
)


def _hh_fn(k: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, dec, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, dec, n = {}, 0, 0
        for pdf in pdfs:
            n += len(pdf)
            for item, w in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(w)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                dec += m
                counters = {
                    i: c - m for i, c in counters.items() if c - m > 0
                }
        state.update(
            (list(counters.keys()), list(counters.values()), dec, n)
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "item": list(counters.keys()),
                "est_count": list(counters.values()),
                "dec_total": [dec] * len(counters),
                "n_shard": [n] * len(counters),
            }
        )

    return update


def heavy_hitters_stream(
    rows: DataFrame, col: str = "item", k: int = 64, n_shards: int = 8
) -> DataFrame:
    """Streaming Misra-Gries: per-SHARD k-counter summaries kept in
    ``applyInPandasWithState`` across micro-batches.

    The batch operator (``operators/heavy_hitters.py``) shards by
    PARTITION and merges with a bounded decrement total; a stream has
    no stable partitioning, so this formulation shards the KEY SPACE
    instead: ``xxhash64(item) % n_shards`` routes every occurrence of
    an item to exactly one shard, making shard summaries disjoint —
    no cross-shard merge and no merge error. Per shard the classical
    bounds hold per micro-batch-prefix: est <= true <= est + dec with
    dec <= n_shard/(k+1); an item is a global phi-heavy hitter only
    if est + dec > phi * sum(n_shard) over its own shard's summary.

    Scale shape: state is O(k) per shard (two arrays + two longs),
    the shuffle is on the shard id — n_shards bounds parallelism AND
    state size regardless of key cardinality; k * n_shards counters
    stand in for a distinct-key-sized streaming aggregation. Emits
    the full shard summary each batch (update mode): downstream
    consumers take the latest row per (shard, item) — ``n_shard`` is
    monotone per shard, so "latest" is selectable without a batch id.
    """
    keyed = rows.filter(F.col(col).isNotNull()).select(
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(col).cast("string").alias("item"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _hh_fn(k),
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
