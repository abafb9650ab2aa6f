"""Misra-Gries heavy hitters (operators/heavy_hitters.py).

The oracle-paired catalog row (``token_heavy_hitters_mg``) pins the
exact regime (k above the distinct count, D = 0).  These tests pin
the regime the sketch exists for: k far below the distinct count,
compressions firing, and the classical guarantees still holding
against exact counts:

  - soundness of the bounds: est <= true <= est + D for every
    reported item
  - D <= n/(k+1)
  - guaranteed recall: every item with true count > phi*n + D is
    reported
  - the exact-regime degeneration (D = 0, est == true)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.heavy_hitters import (
    heavy_hitters,
    mg_partials,
)


def _zipf_df(spark, head=600, n_keys=2_000, parts=8):
    """Deterministic zipf-ish skew: key j gets max(1, head/j) rows —
    every one of ``n_keys`` keys appears, the head keys dominate —
    shuffled so every partition sees the whole key range."""
    rows = []
    for j in range(1, n_keys + 1):
        rows.extend([(f"k{j:05d}",)] * max(1, int(head / j)))
    # deterministic shuffle: sort by md5 of (key, position)
    import hashlib

    rows = [
        r
        for _, r in sorted(
            (hashlib.md5(f"{r[0]}:{i}".encode()).hexdigest(), r)
            for i, r in enumerate(rows)
        )
    ]
    return spark.createDataFrame(rows, "item string").repartition(parts)


def _exact_counts(df):
    return {
        r["item"]: r["c"]
        for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()
    }


def test_bounds_sound_under_compression(spark):
    df = _zipf_df(spark)
    k, phi = 64, 0.005
    exact = _exact_counts(df)
    n = sum(exact.values())
    got = {
        r["item"]: r for r in heavy_hitters(df, "item", k=k, phi=phi).collect()
    }
    assert got, "skewed data must surface heavy hitters"
    d_total = None
    for item, r in got.items():
        assert r["n_total"] == n
        d = r["max_count"] - r["est_count"]
        d_total = d if d_total is None else d_total
        assert d == d_total  # one global D for every row
        true = exact[item]
        assert r["est_count"] <= true <= r["max_count"], (item, dict(r))
    assert d_total > 0, "k=64 over 2000 keys must force compressions"
    assert d_total <= n // (k + 1) + 1
    # guaranteed recall past phi*n + D
    for item, true in exact.items():
        if true > phi * n + d_total:
            assert item in got, (item, true)


def test_exact_regime_degenerates_to_group_by(spark):
    df = _zipf_df(spark, head=300, n_keys=100)
    exact = _exact_counts(df)
    n = sum(exact.values())
    phi = 0.01
    got = heavy_hitters(df, "item", k=1_000, phi=phi).collect()
    want = {i: c for i, c in exact.items() if c > phi * n}
    assert {r["item"]: r["est_count"] for r in got} == want
    for r in got:
        assert r["max_count"] == r["est_count"]  # D == 0


def test_partials_bounded_and_marker_accounting(spark):
    df = _zipf_df(spark, parts=4)
    k = 32
    rows = mg_partials(df, "item", k).collect()
    markers = [r for r in rows if r["item"] is None]
    items = [r for r in rows if r["item"] is not None]
    assert len(markers) == 4  # one per partition
    assert sum(r["npart"] for r in markers) == df.count()
    per_part_items = len(items) / 4.0
    assert per_part_items <= k
    assert all(r["est"] > 0 for r in items)


def test_nulls_ignored_and_type_gate(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "item string"
    )
    got = heavy_hitters(df, "item", k=10, phi=0.4).collect()
    assert {r["item"]: r["est_count"] for r in got} == {"a": 2}
    assert got[0]["n_total"] == 3  # null excluded
    bad = spark.createDataFrame([(1.5,)], "item double")
    with pytest.raises(TypeError, match="misra-gries"):
        heavy_hitters(bad, "item", k=10)


# ---------------------------------------------------------------------------
# Integer PageRank (operators/clusters.pagerank_fixed) — shares this
# module's theme: exact arithmetic making approximate-algorithm classes
# hash-gateable.
# ---------------------------------------------------------------------------


def _pagerank_python(edges, iters, scale):
    """Pure-Python replay of the integer recurrence."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    pr = {n: scale for n in deg}
    base = (3 * scale) // 20
    for _ in range(iters):
        s_in = defaultdict(int)
        for s, d in edges:
            s_in[d] += pr[s] // deg[s]
        pr = {n: base + (17 * s_in.get(n, 0)) // 20 for n in deg}
    return pr


def test_pagerank_fixed_matches_python_replay(spark):
    from udacity_capstone_data_engineering_spark.operators.clusters import (
        pagerank_fixed,
    )

    # star (hub 1) + a 3-cycle + a chord, symmetrized
    und = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    got = {
        r["node"]: r["pr_mass"]
        for r in pagerank_fixed(df, iterations=4, mass_scale=10**12).collect()
    }
    want = _pagerank_python(edges, 4, 10**12)
    assert got == want
    # hub dominates every leaf
    assert got[1] == max(got.values())
    # repartition-invariance (bit-equal, not approximately)
    got2 = {
        r["node"]: r["pr_mass"]
        for r in pagerank_fixed(
            df.repartition(2), iterations=4, mass_scale=10**12
        ).collect()
    }
    assert got2 == got
