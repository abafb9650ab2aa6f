"""Inverted-index operator tests (`operators/inverted_index.py`):
the two-level min-K tournament must equal the naive K-smallest
postings on skewed data, for any salt count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.inverted_index import (
    inverted_index,
)


def _skewed_occurrences(spark):
    # 'the' hits 200 docs (stopword hub, some docs twice); rare tokens
    # hit a handful; one token shares docs with 'the'.
    rows = [("the", d) for d in range(200)]
    rows += [("the", d) for d in range(0, 200, 3)]  # repeat occurrences
    rows += [("zebra", d) for d in (7, 3, 11)]
    rows += [("apple", d) for d in (150, 2, 199, 5, 5)]
    rows += [("solo", 42)]
    return spark.createDataFrame(rows, "token string, doc_id bigint")


def _expected(rows, k=8):
    from collections import defaultdict

    cf = defaultdict(int)
    docs = defaultdict(set)
    for t, d in rows:
        cf[t] += 1
        docs[t].add(d)
    return {
        t: (len(docs[t]), cf[t], tuple(sorted(docs[t])[:k])) for t in cf
    }


@pytest.mark.parametrize("salts", [1, 4, 16])
def test_min_k_tournament_equals_naive(spark, salts):
    occ = _skewed_occurrences(spark)
    rows = [(r["token"], r["doc_id"]) for r in occ.collect()]
    want = _expected(rows)
    got = {
        r["token"]: (r["df"], r["cf"], tuple(r["postings"]))
        for r in inverted_index(occ, "token", "doc_id", salts=salts).collect()
    }
    assert got == want


def test_postings_cap_and_order(spark):
    occ = _skewed_occurrences(spark)
    out = {
        r["token"]: r["postings"]
        for r in inverted_index(occ, "token", "doc_id", k=4).collect()
    }
    assert out["the"] == [0, 1, 2, 3]
    assert out["apple"] == [2, 5, 150, 199]
    assert out["solo"] == [42]
    for p in out.values():
        assert p == sorted(p) and len(p) <= 4
