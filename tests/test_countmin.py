"""Count-min sketch guarantees (`operators/countmin.py`): one-sided
error, the additive bound, and exact mergeability of partial sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.text import tokens
from udacity_capstone_data_engineering_spark.operators.countmin import (
    WIDTH,
    countmin_estimate,
    countmin_sketch,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table


def _token_stream(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("token")
    )


def test_cms_one_sided_and_bounded(spark, sf_dir):
    toks = _token_stream(spark, sf_dir).persist()
    sketch = countmin_sketch(toks, "token").persist()
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    est = countmin_estimate(sketch, toks.select("token"), "token")
    joined = exact.join(est, exact.token == est.key).select(
        "token", "exact", "estimate"
    )
    rows = joined.collect()
    n_total = toks.count()
    toks.unpersist()
    sketch.unpersist()
    assert rows, "no tokens"
    # CMS never underestimates...
    assert all(r["estimate"] >= r["exact"] for r in rows)
    # ...and the min-row error stays within a few widths of the
    # e*N bound (deterministic data + deterministic hashes).
    bound = 4 * n_total / WIDTH
    worst = max(r["estimate"] - r["exact"] for r in rows)
    assert worst <= bound, (worst, bound)


def test_cms_merge_is_cellwise_sum(spark, sf_dir):
    toks = _token_stream(spark, sf_dir)
    # split deterministically by token hash parity.
    left = toks.where(F.abs(F.hash("token")) % 2 == 0)
    right = toks.where(F.abs(F.hash("token")) % 2 == 1)
    whole = countmin_sketch(toks, "token")
    merged = (
        countmin_sketch(left, "token")
        .unionByName(countmin_sketch(right, "token"))
        .groupBy("sketch_row", "sketch_col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r[0], r[1]): r[2] for r in whole.collect()}
    m = {(r[0], r[1]): r[2] for r in merged.collect()}
    assert w == m


def test_cms_stream_converges_to_batch(spark, tmp_path):
    """Cross-batch streaming CMS: final cells (latest per cell —
    counts are monotone) must equal the batch sketch over the full
    stream, and state stays grid-bounded."""
    from udacity_capstone_data_engineering_spark.operators.countmin import (
        DEPTH,
        countmin_stream,
    )

    b1 = [("hot",)] * 20 + [(f"c{i}",) for i in range(10)]
    b2 = [("hot",)] * 15 + [("warm",)] * 5 + [(f"d{i}",) for i in range(10)]
    src = tmp_path / "cms_src"
    spark.createDataFrame(b1, "k string").coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    spark.createDataFrame(b2, "k string").coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        countmin_stream(stream, "k")
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cms_stream_test").collect()
    assert rows
    latest: dict = {}
    for r in rows:
        key = (r.sketch_row, r.sketch_col)
        latest[key] = max(latest[key], r.cnt) if key in latest else r.cnt
    whole = spark.createDataFrame(b1 + b2, "k string")
    want = {
        (r.sketch_row, r.sketch_col): r.cnt
        for r in countmin_sketch(whole, "k").collect()
    }
    assert latest == want
    # multiple batches actually ran: some cell reported twice
    from collections import Counter

    seen = Counter((r.sketch_row, r.sketch_col) for r in rows)
    assert any(v > 1 for v in seen.values())
    assert len(latest) <= DEPTH * 256


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("x", 3), ("x", 2), ("y", 1)], "k string, w int"
    )
    sketch = countmin_sketch(df, "k", weight_col="w")
    est = {
        r["key"]: r["estimate"]
        for r in countmin_estimate(
            sketch, df.select("k"), "k"
        ).collect()
    }
    assert est["x"] >= 5 and est["y"] >= 1
    # width 256 with 2 keys: collisions essentially impossible -> exact
    assert est["x"] == 5 and est["y"] == 1
