"""Stream-static enrichment join and watermark-bounded streaming dedup
run through real readStream/writeStream — batch-equivalent results."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.streaming.joins import (
    dedup_stream,
    enrich_stream,
)


def test_stream_static_enrichment(spark, tmp_path):
    src = tmp_path / "events_src"
    events = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 4.0)],
        "event_id long, user_id long, value double",
    )
    events.write.parquet(str(src))
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id long, tier string"
    )

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    enriched = enrich_stream(stream, dim, "user_id", how="left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.tier for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    assert got == {1: "gold", 2: "silver", 3: None}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dedup_src"
    rows = spark.createDataFrame(
        [
            (100, "2024-01-01 00:00:10", 1.0),
            (100, "2024-01-01 00:00:40", 2.0),  # dup key within horizon
            (200, "2024-01-01 00:01:00", 3.0),
        ],
        "k long, ts_s string, v double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    rows.write.parquet(str(src))

    stream = spark.readStream.schema(rows.schema).parquet(str(src))
    deduped = dedup_stream(stream, ["k"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in spark.sql("SELECT * FROM dedup_test").collect())
    assert got == [100, 200]
