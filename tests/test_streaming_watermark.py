"""Watermark semantics across checkpointed restarts: late data beyond
the watermark must NOT revise finalized windows; state must survive a
stop/start (the recovery behavior a production stream depends on).

Sink is foreachBatch (the memory sink cannot recover from a
checkpoint); append mode emits only finalized windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.streaming.windows import (
    tumbling_window_agg,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, ts_s string, value double").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    ).write.mode("append").parquet(str(path))


def _run_stream(spark, src, ckpt):
    schema = "event_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = tumbling_window_agg(
        stream,
        "ts",
        "1 hour",
        aggs={"event_count": "count(1)", "total_value": "sum(value)"},
        watermark="30 minutes",
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (str(r.window_start), r.event_count, r.total_value)
            for r in batch_df.collect()
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")  # append emits only FINALIZED windows
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_late_data_beyond_watermark_dropped(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"

    # Run 1: events in hours 10 and 12. Watermark advances to 11:30,
    # finalizing the 10:00 window.
    _write_batch(
        spark,
        src,
        [(1, "2024-01-01 10:05:00", 1.0), (2, "2024-01-01 12:00:00", 2.0)],
    )
    run1 = _run_stream(spark, src, ckpt)
    assert run1 == [("2024-01-01 10:00:00", 1, 1.0)]

    # Run 2 (same checkpoint — state recovered): one LATE event for the
    # already-finalized 10:00 window and one at 14:00 that finalizes 12:00.
    _write_batch(
        spark,
        src,
        [(3, "2024-01-01 10:10:00", 100.0), (4, "2024-01-01 14:00:00", 4.0)],
    )
    run2 = _run_stream(spark, src, ckpt)
    # The 12:00 window finalizes WITHOUT any contribution from the late
    # 10:10 event (dropped by the watermark); 10:00 is never re-emitted.
    assert run2 == [("2024-01-01 12:00:00", 1, 2.0)]


def test_streaming_session_window_merges_and_finalizes(spark, tmp_path):
    """The SAME F.session_window aggregation used by the batch query
    (`events_session_window_native`) must run on a watermarked stream:
    events within the gap merge into one session; append mode emits a
    session only once the watermark passes its close."""
    src = tmp_path / "sess_src"
    ckpt = tmp_path / "sess_ckpt"
    src.mkdir()

    def write(rows):
        spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).write.mode("append").parquet(str(src))

    # user 1: two events 10 min apart (one session), then one event
    # 2 hours later (second session); a later batch advances the
    # watermark far past both sessions so append finalizes them.
    write([(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
           (1, "2024-01-01 12:30:00")])
    write([(1, "2024-01-02 09:00:00"), (2, "2024-01-02 09:00:01")])

    schema = "user_id long, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("s"), "n_events")
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (r.user_id, str(r.s), r.n_events) for r in batch_df.collect()
        )

    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(120)
    finalized = sorted(t for t in emitted)
    # both of user 1's 2024-01-01 sessions are final (watermark at
    # 2024-01-02); the 2024-01-02 events are not yet finalized.
    assert (1, "2024-01-01 10:00:00", 2) in finalized
    assert (1, "2024-01-01 12:30:00", 1) in finalized
    assert all(not s.startswith("2024-01-02") for _, s, _ in finalized)
