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


def test_stream_stream_interval_join(spark, tmp_path):
    from udacity_capstone_data_engineering_spark.streaming.joins import (
        interval_join_streams,
    )

    lsrc, rsrc = tmp_path / "purch", tmp_path / "views"
    purchases = spark.createDataFrame(
        [(1, "2024-01-01 00:02:00"), (2, "2024-01-01 00:10:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("p_ts"))
    views = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:30"),  # 30s before purchase -> match
            (1, "2024-01-01 00:05:00"),  # after purchase -> no match
            (2, "2024-01-01 00:08:00"),  # 120s before -> outside lookback
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("v_ts"))
    purchases.write.parquet(str(lsrc))
    views.write.parquet(str(rsrc))

    ls = spark.readStream.schema(purchases.schema).parquet(str(lsrc))
    rs = spark.readStream.schema(views.schema).parquet(str(rsrc))
    joined = interval_join_streams(
        ls, rs, "user_id", "p_ts", "v_ts",
        left_watermark="10 minutes", right_watermark="10 minutes",
        lookback="1 minute", lookahead="0 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_interval")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, v_ts FROM ss_interval").collect()
    assert [(r.user_id, str(r.v_ts)) for r in rows] == [
        (1, "2024-01-01 00:01:30")
    ]


def test_stream_upsert_foreachbatch(spark, tmp_path):
    from udacity_capstone_data_engineering_spark.streaming.sinks import (
        stream_upsert_to_parquet,
    )

    src = tmp_path / "updates"
    base_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # Two files -> maxFilesPerTrigger=1 forces two sequential merges.
    spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "k long, version long, payload string"
    ).write.parquet(str(src))
    spark.createDataFrame(
        [(1, 2, "a2"), (3, 1, "c")], "k long, version long, payload string"
    ).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("k long, version long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_upsert_to_parquet(
        stream, base_path, ckpt, keys=["k"], precedence=["version"]
    )
    q.awaitTermination(180)
    got = {
        (r.k, r.version, r.payload)
        for r in spark.read.parquet(base_path).collect()
    }
    assert got == {(1, 2, "a2"), (2, 1, "b"), (3, 1, "c")}


def test_stream_stream_interval_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter stream-stream interval join: a left row with no right
    match within the interval must STILL be emitted (right columns
    null) — but only after the watermark passes its join window, since
    a match could otherwise still arrive. This is the semantics that
    makes outer stream joins usable for 'action without response'
    funnels (e.g. views that never converted)."""
    from pyspark.sql import functions as F

    from udacity_capstone_data_engineering_spark.streaming.joins import (
        interval_join_streams,
    )

    lsrc = tmp_path / "lo_left"
    rsrc = tmp_path / "lo_right"
    ck = tmp_path / "lo_ck"
    for d in (lsrc, rsrc):
        d.mkdir()

    def write(dst, rows, schema):
        spark.createDataFrame(rows, schema).select(
            F.col("k").alias("user_id"),
            F.col("ts_s").cast("timestamp").alias("ts"),
            "tag",
        ).write.mode("append").parquet(str(dst))

    schema = "k long, ts_s string, tag string"
    # left: two views; only the first has a purchase within 10 minutes.
    write(lsrc, [(1, "2024-01-01 10:00:00", "v1"),
                 (1, "2024-01-01 11:00:00", "v2")], schema)
    write(rsrc, [(1, "2024-01-01 10:05:00", "p1")], schema)
    # watermark pusher rows, far in the future, for both sides
    write(lsrc, [(9, "2024-01-02 12:00:00", "wm")], schema)
    write(rsrc, [(9, "2024-01-02 12:00:00", "wm")], schema)

    left = spark.readStream.schema("user_id long, ts timestamp, tag string").parquet(
        str(lsrc)
    ).withColumnRenamed("tag", "view_tag")
    right = spark.readStream.schema(
        "user_id long, ts timestamp, tag string"
    ).parquet(str(rsrc)).selectExpr(
        "user_id", "ts AS r_ts", "tag AS purchase_tag"
    )
    joined = interval_join_streams(
        left, right,
        key="user_id",
        left_time="ts", right_time="r_ts",
        left_watermark="5 minutes", right_watermark="5 minutes",
        lookback="0 minutes", lookahead="10 minutes",
        how="leftOuter",
    )
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        emitted.extend(
            (r.user_id, r.view_tag, r.purchase_tag) for r in batch_df.collect()
        )

    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(180)
    got = {(u, v): p for u, v, p in emitted}
    assert got.get((1, "v1")) == "p1"        # matched within interval
    assert (1, "v2") in got and got[(1, "v2")] is None  # unmatched, null right
