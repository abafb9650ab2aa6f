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


def test_object_store_conf_builder_wiring():
    """S9: a storage-options dict must land as fs.s3a.* confs on the
    builder (no real S3 needed — inspect the builder's option map)."""
    from udacity_capstone_data_engineering_spark.session import (
        object_store_conf,
        session_builder,
    )

    opts = dict(
        access_key="AK",
        secret_key="SK",
        session_token="TK",
        endpoint="http://minio:9000",
        region="us-east-1",
        path_style_access=True,
    )
    conf = object_store_conf(**opts)
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert conf["spark.hadoop.fs.s3a.session.token"] == "TK"
    assert (
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "us-east-1"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"

    builder = session_builder(storage_options=opts)
    opts_map = builder._options
    for k, v in conf.items():
        assert opts_map.get(k) == v, k


def test_object_store_conf_anonymous_and_default_chain():
    from udacity_capstone_data_engineering_spark.session import object_store_conf

    anon = object_store_conf(anonymous=True)
    assert (
        anon["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
    )
    # no creds anywhere -> leave the provider chain to Hadoop defaults
    import os as _os

    saved = {
        k: _os.environ.pop(k, None)
        for k in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY", "AWS_SESSION_TOKEN")
    }
    try:
        chain = object_store_conf()
        assert "spark.hadoop.fs.s3a.access.key" not in chain
        assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in chain
    finally:
        for k, v in saved.items():
            if v is not None:
                _os.environ[k] = v


def test_read_sas_plugin_error_path(spark, tmp_path):
    """S6: without the spark-sas7bdat jar the reader must fail with the
    exact package coordinates, not a generic datasource error."""
    import pytest

    from udacity_capstone_data_engineering_spark.sources.readers import (
        SAS_PACKAGE,
        read_sas,
    )

    p = tmp_path / "x.sas7bdat"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ImportError, match="spark-sas7bdat"):
        try:
            read_sas(spark, str(p))
        except ImportError as e:
            assert SAS_PACKAGE in str(e)
            raise


def test_read_text_lines_and_whole_file(spark, tmp_path):
    from udacity_capstone_data_engineering_spark.sources.readers import read_text

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line1\nline2\n")
    (d / "b.txt").write_text("doc two\n")
    lines = read_text(spark, str(d))
    assert lines.columns == ["value"]
    assert lines.count() == 3
    docs = read_text(spark, str(d), whole_file=True)
    assert docs.count() == 2
    texts = {r.value for r in docs.collect()}
    assert "line1\nline2\n" in texts


def test_read_binary_files_glob_and_content(spark, tmp_path):
    from udacity_capstone_data_engineering_spark.sources.readers import (
        read_binary_files,
    )

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "img0.fake").write_bytes(b"\x00\x01\x02")
    (d / "img1.fake").write_bytes(b"\x03\x04")
    (d / "skip.other").write_bytes(b"zz")
    df = read_binary_files(spark, str(d), glob="*.fake")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert bytes(by_name["img0.fake"].content) == b"\x00\x01\x02"
    assert by_name["img1.fake"].length == 2


def test_binary_files_feed_multimodal_features(spark, tmp_path):
    """binaryFile source output plugs straight into the multimodal
    feature extractor (the real ingestion path for image corpora)."""
    from udacity_capstone_data_engineering_spark.operators.multimodal import (
        extract_features,
    )
    from udacity_capstone_data_engineering_spark.sources.readers import (
        read_binary_files,
    )
    from pyspark.sql import functions as F

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        (d / f"doc{i}.bin").write_bytes(bytes([i]) * (i + 4))
    src = read_binary_files(spark, str(d), glob="*.bin").select(
        F.crc32(F.col("path")).alias("doc_id"), F.col("content").alias("payload")
    )
    out = extract_features(src, "payload", "doc_id")
    assert out.count() == 3


def test_csv_corrupt_record_quarantine(spark, tmp_path):
    """Malformed CSV rows must land intact in the corrupt column while
    good rows parse; counting them is the ingestion QC signal."""
    from pyspark.sql import functions as F

    from udacity_capstone_data_engineering_spark.sources.readers import (
        read_csv_with_corrupt_capture,
    )

    p = tmp_path / "dirty.csv"
    p.write_text("id,qty\n1,10\n2,not_a_number\n3,30\n")
    df = read_csv_with_corrupt_capture(
        spark, str(p), "id int, qty int"
    ).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.first()["_corrupt_record"] == "2,not_a_number"
    assert {r.id for r in good.collect()} == {1, 3}


class TestPythonDataSource:
    """Spark 4 Python DataSource API: schema, options, partition
    planning, and cross-parallelism determinism."""

    def test_synthetic_docs_reads_and_partitions(self, spark):
        from udacity_capstone_data_engineering_spark.sources import pydatasource

        pydatasource.register(spark)
        df = (
            spark.read.format("synthetic_docs")
            .option("n", 200)
            .option("seed", 7)
            .option("numPartitions", 4)
            .load()
        )
        assert df.columns == ["doc_id", "text", "lang", "n_chars"]
        assert df.count() == 200
        assert df.rdd.getNumPartitions() == 4

    def test_synthetic_docs_deterministic_across_parallelism(self, spark):
        from pyspark.sql import functions as F

        from udacity_capstone_data_engineering_spark.sources import pydatasource

        pydatasource.register(spark)

        def digest(parts):
            df = (
                spark.read.format("synthetic_docs")
                .option("n", 300)
                .option("seed", 11)
                .option("numPartitions", parts)
                .load()
            )
            return df.agg(
                F.sum(F.crc32(F.concat_ws("|", "doc_id", "text", "lang")))
            ).first()[0]

        assert digest(2) == digest(16)
