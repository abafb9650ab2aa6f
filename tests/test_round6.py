"""Round-6 battery: SemDeDup auto-k (VERDICT r5 #1) — formula parity,
collapse-valve equivalence, recall vs the global brute force and the
pinned-k anchor, and the hot-cluster skew bound."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.kmeans import (
    _quantize,
    kmeans_int,
)
from udacity_capstone_data_engineering_spark.operators.semdedup import (
    EPS,
    K,
    TARGET_CLUSTER,
    auto_k,
    auto_k_sql,
    semantic_dedup,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table


def test_auto_k_formula_and_sql_parity():
    """The Python formula and its DuckDB twin agree on every regime:
    below the floor, at boundaries, and far above."""
    assert auto_k(0) == 1  # degenerate guard: k <= n
    assert auto_k(3) == 3
    assert auto_k(10) == K
    assert auto_k(64 * K) == K
    assert auto_k(64 * K + 1) == K + 1
    assert auto_k(500) == 8
    assert auto_k(2000) == 32
    assert auto_k(3_200_000) == 50_000  # the published LAION shape
    con = duckdb.connect()
    for n in (1, 3, 255, 256, 257, 500, 2000, 1_000_000):
        got = con.execute(
            auto_k_sql(f"(SELECT unnest(range({n})) AS x)")
        ).fetchone()[0]
        # the SQL twin omits the k<=n cap (the served corpora are
        # always >> K); compare on the shared regime
        assert got == max(K, -(-n // TARGET_CLUSTER))
        if n >= K:
            assert got == auto_k(n)


def test_semantic_dedup_collapse_equivalence(spark, sf_dir):
    """The exact-collapse valve is semantics-preserving: identical
    output with and without it, on data salted with exact twins so the
    collapse actually fires (the proof is in the module docstring;
    this is its executable check)."""
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", "embedding")
    )
    twins = vecs.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    salted = vecs.unionByName(twins)
    rows = lambda collapse: sorted(
        (r["vec_id"], r["cluster"], r["is_dup"])
        for r in semantic_dedup(
            salted, "vec_id", "embedding", k=None, collapse=collapse
        ).collect()
    )
    assert rows(True) == rows(False)


def _global_eps_dups(qv: dict[int, list[int]]) -> set[int]:
    ids = sorted(qv)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if b in out:
                continue
            if sum((x - y) * (x - y) for x, y in zip(qv[a], qv[b])) <= EPS:
                out.add(b)
    return out


def test_semantic_dedup_autok_recall(spark, sf_dir):
    """Auto-k vs the two anchors on the driver corpus:
    - PRECISION is exactly 1 against the global brute-force eps dup
      set (within-cluster pairs are a subset of all pairs — flagging
      is sound by construction);
    - RECALL >= 0.78 vs global brute force and >= 0.70 vs the
      pinned-k=4 anchor (measured 0.80 / 0.78+ on the driver data —
      more clusters split more eps-neighborhoods, the documented
      SemDeDup tradeoff bought for linear candidate volume)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    qv = {
        r["vid"]: list(r["qv"])
        for r in _quantize(vecs, "vec_id", "embedding", 1024).collect()
    }
    glob = _global_eps_dups(qv)
    flagged = {
        k: {
            r["vec_id"]
            for r in semantic_dedup(vecs, "vec_id", "embedding", k=k).collect()
            if r["is_dup"]
        }
        for k in (None, 4)
    }
    auto, pinned = flagged[None], flagged[4]
    assert auto <= glob  # precision 1.0
    assert pinned <= glob
    assert len(auto & glob) / len(glob) >= 0.78
    assert len(auto & pinned) / len(pinned) >= 0.70


def test_semantic_dedup_hot_cluster_pair_bound(spark):
    """The skew fixture the r5 verdict asked for: a corpus that is 96%
    exact twins of one vector. k-means necessarily piles the twins
    into ONE cluster (auto-k cannot split identical points), so the
    UNCOLLAPSED pair stage would emit ~480^2/2 candidates in a single
    task. The collapse valve bounds the pair-stage input to DISTINCT
    quantized vectors: every cluster's pair side carries at most 21
    rows here, so the per-task candidate volume is <= 21*20/2 — and
    the flags are still exactly right."""
    import random

    rng = random.Random(13)
    hot = [(i, [1.0] * 8) for i in range(480)]
    cold = [
        (1000 + i, [rng.uniform(-30, 30) for _ in range(8)]) for i in range(20)
    ]
    df = spark.createDataFrame(
        hot + cold, "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, "vec_id", "embedding", k=None)
    flags = {r["vec_id"]: r["is_dup"] for r in out.collect()}
    assert flags[0] is False  # min-id twin is the keeper
    assert all(flags[i] for i in range(1, 480))  # every other twin pruned

    # The bound itself: reps per cluster after the collapse.
    assign = kmeans_int(df, "vec_id", "embedding", k=auto_k(500)).select(
        F.col("vec_id").alias("vid"), "cluster"
    )
    q = _quantize(df, "vec_id", "embedding", 1024)
    reps_per_cluster = (
        assign.join(q, "vid")
        .groupBy("cluster", "qv")
        .agg(F.min("vid"))
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert max(r["count"] for r in reps_per_cluster) <= 21


def test_bucketed_fp_index_no_exchange(spark, sf_dir):
    """VERDICT r5 #2: the standing fingerprint index side of the
    incremental-ingest join must read its bucket layout as its
    partitioning — `Bucketed: true` in the scan and no Exchange above
    it. The relative check nails it: the SAME join against an
    unbucketed copy of the index must plan strictly MORE exchanges
    (the extra one being the index-side shuffle this layout deletes)."""
    from udacity_capstone_data_engineering_spark.queries import queries

    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = queries()["incremental_ingest_dedup_bucketed"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        n_bucketed = plan.count("Exchange")

        # Control: identical join, index side NOT bucketed.
        control = queries()["incremental_ingest_dedup"](spark, sf_dir)
        cplan = control._jdf.queryExecution().executedPlan().toString()
        n_control = cplan.count("Exchange")
        assert n_bucketed < n_control, (n_bucketed, n_control)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_bucketed_fp_index_matches_inplan_variant(spark, sf_dir):
    """The materialize boundary is lossless: bucketed-index verdicts
    equal the in-plan variant row for row."""
    from udacity_capstone_data_engineering_spark.queries import queries

    rows = lambda name: sorted(
        tuple(r) for r in queries()[name](spark, sf_dir).collect()
    )
    assert rows("incremental_ingest_dedup_bucketed") == rows(
        "incremental_ingest_dedup"
    )


def test_semantic_dedup_autok_pair_join_cluster_keyed(spark, sf_dir):
    """The auto-k row keeps the SemDeDup scale property: the pair
    stage is an equi-join on the cluster id, never a cartesian."""
    from udacity_capstone_data_engineering_spark.queries import queries

    df = queries()["semantic_dedup_autok"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
