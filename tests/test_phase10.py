"""Phase-10 tier tests: bigram LM scoring, PSI drift, semantic dedup,
JSONL roundtrip — value properties plus the plan shapes each operator
claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark import queries as catalog
from udacity_capstone_data_engineering_spark.operators.semdedup import (
    EPS,
    semantic_dedup,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table

QUERIES = catalog.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_replay_one_doc(spark, sf_dir):
    """Replay the model in plain Python for one document: same bigram
    count and score (to the final rounding)."""
    out = {
        r["doc_id"]: r
        for r in QUERIES["bigram_lm_quality"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    toks = {r["doc_id"]: r["text"].lower().split() for r in docs}
    cb: dict = {}
    cu: dict = {}
    vocab = set()
    for arr in toks.values():
        vocab.update(arr)
        for a, b in zip(arr, arr[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    v = len(vocab)
    target = min(toks)
    arr = toks[target]
    slp = 0
    for a, b in zip(arr, arr[1:]):
        lp = math.log((cb[(a, b)] + 1) / (cu[a] + v))
        # decimal(18,9) integer units; float repr round matches the
        # engines' double->decimal(…,9) conversion
        slp += int(round(lp, 9) * 1e9 + (0.5 if lp >= 0 else -0.5))
    nb = len(arr) - 1
    # exact fixed-point mean, half-away-from-zero (operator contract)
    den = nb * 1000
    t = 2 * slp + (den if slp >= 0 else -den)
    q = (t - (((t % (2 * den)) + 2 * den) % (2 * den))) // (2 * den)
    got = out[target]
    assert got["n_bigrams"] == nb
    assert got["avg_logp"] == q / 1e6


def test_bigram_lm_covers_every_doc(spark, sf_dir):
    out = QUERIES["bigram_lm_quality"](spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    # scores are log-probabilities: strictly negative where defined
    assert out.filter(F.col("avg_logp") >= 0).count() == 0


def test_bigram_lm_plan_no_cartesian_single_token_pass(spark, sf_dir):
    """The token-stream-sized relation is reduced to per-doc bigram
    counts before any join: no cartesian, and the only BNLJ is the
    1-row vocabulary broadcast."""
    plan = _plan(QUERIES["bigram_lm_quality"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def test_psi_nonnegative_and_split_counts(spark, sf_dir):
    """PSI is a symmetrized KL: >= 0 always; per-key period counts sum
    to the table count."""
    rows = QUERIES["psi_event_drift"](spark, sf_dir).collect()
    assert rows, "no event types"
    assert all(r["psi"] >= 0 for r in rows)
    total = sum(r["n_a"] + r["n_b"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_psi_identical_periods_zero(spark):
    """Same distribution in both periods -> PSI exactly 0 after
    rounding (p == q in every bucket, smoothed or not)."""
    from udacity_capstone_data_engineering_spark.operators.drift import psi_report

    rows = [
        (f"u{i}", ts, float(v))
        for i in range(3)
        for ts, v in [
            ("2024-01-02 00:00:00", 10.0),
            ("2024-01-20 00:00:00", 10.0),
            ("2024-01-03 00:00:00", 90.0),
            ("2024-01-21 00:00:00", 90.0),
        ]
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, value double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = psi_report(df, "k", "ts", "value", "2024-01-16 00:00:00", 25.0, 10)
    assert all(r["psi"] == 0.0 for r in out.collect())


def test_psi_single_wide_shuffle(spark, sf_dir):
    """The event stream is touched by exactly ONE counting aggregation;
    every later exchange operates on the keys x periods x buckets grid.
    Proxy assertion: no exchange in the plan partitions on anything
    containing the raw value column."""
    plan = _plan(QUERIES["psi_event_drift"](spark, sf_dir))
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        keys = frag.split(")")[0]
        assert "value#" not in keys, keys


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_flags_match_brute_force(spark, sf_dir):
    """Replay the keep rule in plain Python from the operator's own
    cluster assignment + exact quantized distances."""
    from udacity_capstone_data_engineering_spark.operators.kmeans import (
        _quantize,
        kmeans_int,
    )

    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 20 == 0
    )
    out = {
        r["vec_id"]: (r["cluster"], r["is_dup"])
        for r in semantic_dedup(vecs, "vec_id", "embedding").collect()
    }
    clusters = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_int(vecs, "vec_id", "embedding").collect()
    }
    qv = {r["vid"]: list(r["qv"]) for r in _quantize(vecs, "vec_id", "embedding", 1024).collect()}
    for vid, (cluster, flag) in out.items():
        assert cluster == clusters[vid]
        want = any(
            other < vid
            and clusters[other] == cluster
            and sum((a - b) * (a - b) for a, b in zip(qv[other], qv[vid])) <= EPS
            for other in qv
        )
        assert flag == want, vid


def test_semantic_dedup_injected_twin_is_flagged(spark):
    """A vector duplicated under a new larger id must be flagged; the
    original (smaller id) must be kept."""
    import random

    rng = random.Random(7)
    base = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)
    ]
    twin = (100, list(base[3][1]))
    df = spark.createDataFrame(
        base + [twin], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r["is_dup"] for r in
           semantic_dedup(df, "vec_id", "embedding", k=2).collect()}
    assert out[100] is True
    assert out[3] is False


def test_semantic_dedup_pair_join_is_cluster_keyed(spark, sf_dir):
    """The pair stage must be an equi-join keyed on the cluster id —
    never a cartesian (the SemDeDup scale property)."""
    plan = _plan(QUERIES["semantic_dedup_eps"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "cluster" in plan.split("SortMergeJoin")[-1][:200] or (
        "cluster" in plan
    )


# ---------------------------------------------------------------------------
# JSONL roundtrip
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_identity(spark, sf_dir):
    got = sorted(
        tuple(r) for r in QUERIES["jsonl_roundtrip_docs"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    assert got == want
