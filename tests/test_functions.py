"""Scalar function library: dates, hashing, text, vectors — edge cases."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.dates import (
    date_to_sas_days,
    sas_date_to_date,
)
from udacity_capstone_data_engineering_spark.functions.hashing import portable_hash64
from udacity_capstone_data_engineering_spark.functions.text import (
    lang_id,
    punct_ratio,
    quality_score,
    token_count,
    word_shingles,
)
from udacity_capstone_data_engineering_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)


def test_sas_epoch_zero_day_not_null(spark):
    """The reference UDF mapped day-offset 0 → NULL (etl.py:255-257,
    `if x else None`); the engine keeps 1960-01-01."""
    df = spark.createDataFrame([(0,), (20545,), (None,)], "d int")
    out = df.select(sas_date_to_date("d").alias("dt")).collect()
    assert str(out[0].dt) == "1960-01-01"
    assert str(out[1].dt) == "2016-04-01"
    assert out[2].dt is None


def test_sas_roundtrip(spark):
    df = spark.createDataFrame([("2024-06-15",)], "s string").select(
        F.to_date("s").alias("d")
    )
    out = df.select(sas_date_to_date(date_to_sas_days("d")).alias("rt")).first()
    assert str(out.rt) == "2024-06-15"


def test_portable_hash_matches_python_md5(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    got = df.select(portable_hash64("s").alias("h")).first().h
    want = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert got == want


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text string"
    )
    assert [r[0] for r in df.select(token_count("text")).collect()] == [3, 0, 0, 1]


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b c",), ("a b c d e f",)], "text string")
    out = [r[0] for r in df.select(word_shingles("text", 5)).collect()]
    assert out[0] == []
    assert out[1] == ["a b c d e", "b c d e f"]


def test_punct_and_quality(spark):
    df = spark.createDataFrame([("ab!?",), ("clean text here",)], "text string")
    rows = df.select(
        punct_ratio("text").alias("p"), quality_score("text").alias("q")
    ).collect()
    assert rows[0].p == 0.5
    assert rows[1].p == 0.0
    assert 0 < rows[1].q <= 1


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in the yard",),
            ("el perro y la casa de los gatos en la calle",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(lang_id("text")).collect()]
    assert out == ["en", "es", "und"]


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
    ).collect()
    assert rows[0].d == 0.0 and rows[0].c == 0.0
    assert math.isclose(rows[1].n, math.sqrt(5))
    assert math.isclose(rows[1].c, 1.0)
