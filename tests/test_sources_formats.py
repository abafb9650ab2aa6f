"""JSON/ORC readers, format-generic sink, and the streaming file sink."""

from __future__ import annotations

import os

from udacity_capstone_data_engineering_spark.sources import (
    load_table,
    read_json,
    read_orc,
    write_files,
)
from udacity_capstone_data_engineering_spark.streaming import stream_to_files


def _sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = write_files(df, str(tmp_path), "orders_json", file_format="json")
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double"
    )
    back = read_json(spark, path, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_json_without_schema_infers(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = write_files(df, str(tmp_path), "orders_json2", file_format="json")
    back = read_json(spark, path)
    assert back.count() == 200
    assert set(back.columns) == set(df.columns)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = write_files(df, str(tmp_path), "orders_orc", file_format="orc")
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_streaming_file_sink_exactly_once(spark, sf_dir, tmp_path):
    """Drain a file source twice via availableNow: the second run must
    write nothing new (checkpoint remembers consumed input)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = _sample(spark, sf_dir)
    df.write.parquet(src)

    sdf = spark.readStream.schema(df.schema).parquet(src)
    q = stream_to_files(sdf, out, ckpt, available_now=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first == 200

    q2 = stream_to_files(
        spark.readStream.schema(df.schema).parquet(src),
        out,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == first
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))


def test_streaming_file_sink_partitioned(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    df = _sample(spark, sf_dir)
    df.write.parquet(src)
    q = stream_to_files(
        spark.readStream.schema(df.schema).parquet(src),
        out,
        str(tmp_path / "ckpt"),
        partition_by=["o_orderstatus"],
        available_now=True,
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 200
    statuses = {r[0] for r in df.select("o_orderstatus").distinct().collect()}
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("o_orderstatus=")
    }
    assert dirs == statuses
