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


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def test_kcore_matches_python_peeling(spark, sf_dir):
    """Replay simultaneous-removal peeling in plain Python over the
    same support->=2 edge list."""
    from collections import defaultdict

    rows = QUERIES["copurchase_kcore"](spark, sf_dir).collect()
    got = {r["part"]: r["core_deg"] for r in rows}

    li = load_table(spark, sf_dir, "lineitem")
    items = {(r["l_orderkey"], r["l_partkey"]) for r in
             li.select("l_orderkey", "l_partkey").distinct().collect()}
    per_order = defaultdict(list)
    for ok, pk in items:
        per_order[ok].append(pk)
    pair_count = defaultdict(int)
    for parts in per_order.values():
        parts = sorted(parts)
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                pair_count[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), c in pair_count.items():
        if c >= 2:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(10):
        low = [v for v, nb in adj.items() if len(nb) < 3]
        for v in low:
            for u in list(adj[v]):
                adj[u].discard(v)
            del adj[v]
        for v in [v for v, nb in adj.items() if not nb]:
            del adj[v]
    want = {v: len(nb) for v, nb in adj.items()}
    assert got == want


def test_kcore_extra_round_is_idempotent(spark, sf_dir):
    """One more peel past the registered depth changes nothing — the
    registered output IS the 3-core at this sf."""
    from udacity_capstone_data_engineering_spark.operators.kcore import (
        kcore_fixed,
    )
    from udacity_capstone_data_engineering_spark.queries_phase10 import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    sym = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).union(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    at = sorted(map(tuple, kcore_fixed(sym, _KCORE_K, _KCORE_ROUNDS).collect()))
    plus = sorted(
        map(tuple, kcore_fixed(sym, _KCORE_K, _KCORE_ROUNDS + 1).collect())
    )
    assert at == plus


# ---------------------------------------------------------------------------
# token entropy
# ---------------------------------------------------------------------------


def test_entropy_replay_one_doc(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["doc_token_entropy"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    target = min(r["doc_id"] for r in docs)
    text = next(r["text"] for r in docs if r["doc_id"] == target)
    toks = text.lower().split()
    n = len(toks)
    from collections import Counter

    units = 0
    for m in Counter(toks).values():
        p = m / n
        units += int(round(p * math.log(p), 9) * 1e9 - 0.5 if p * math.log(p) < 0
                     else round(p * math.log(p), 9) * 1e9 + 0.5)
    t = 2 * units + (1000 if units >= 0 else -1000)
    q = (t - (((t % 2000) + 2000) % 2000)) // 2000
    got = out[target]
    assert got["n_tokens"] == n
    assert got["entropy"] == -q / 1e6


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(n_tokens) for every doc (uniform maximizes)."""
    rows = QUERIES["doc_token_entropy"](spark, sf_dir).collect()
    assert rows
    # tolerance: the 1e-6 output grid plus n x 0.5e-9 quantization slack
    for r in rows:
        assert -1e-5 <= r["entropy"] <= math.log(r["n_tokens"]) + 1e-5


def test_entropy_uniform_vs_repetitive(spark):
    from udacity_capstone_data_engineering_spark.queries_phase10 import (
        doc_token_entropy,  # noqa: F401  (import parity)
    )
    # build two docs inline through the same operator path
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a a a a a a a a")],
        "doc_id long, text string",
    )
    from udacity_capstone_data_engineering_spark.functions.text import tokens

    tf = (
        df.select(
            F.col("doc_id").alias("doc"),
            F.explode(tokens(F.lower(F.col("text")))).alias("t"),
        )
        .groupBy("doc", "t")
        .count()
    )
    rows = tf.groupBy("doc").count().collect()
    assert {r["doc"]: r["count"] for r in rows} == {1: 8, 2: 1}


# ---------------------------------------------------------------------------
# weighted sample
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_sized(spark, sf_dir):
    a = sorted(map(tuple, QUERIES["weighted_sample_docs"](spark, sf_dir).collect()))
    b = sorted(
        map(
            tuple,
            QUERIES["weighted_sample_docs"](spark, sf_dir)
            .repartition(7)
            .collect(),
        )
    )
    assert a == b
    assert len(a) == min(
        100, load_table(spark, sf_dir, "documents").count()
    )


def test_weighted_sample_biases_toward_long_docs(spark, sf_dir):
    """Length-proportional sampling: mean n_chars of the sample should
    exceed the corpus mean (weights are n_chars)."""
    sample = QUERIES["weighted_sample_docs"](spark, sf_dir).agg(
        F.avg("n_chars")
    ).collect()[0][0]
    corpus = (
        load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample > corpus


# ---------------------------------------------------------------------------
# ORC roundtrip
# ---------------------------------------------------------------------------


def test_orc_roundtrip_identity(spark, sf_dir):
    got = sorted(
        tuple(r) for r in QUERIES["orc_roundtrip_orders"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in load_table(spark, sf_dir, "orders").collect()
    )
    assert got == want


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """Top-N must be TakeOrderedAndProject; the only window runs on
    the N survivors (bounded by construction), never the corpus."""
    plan = _plan(QUERIES["weighted_sample_docs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_kcore_plan_edge_list_semi_joins(spark, sf_dir):
    """One peel round must filter edges with TWO LEFT-SEMI joins and
    no cartesian. (The registered query's final plan hides the rounds
    behind per-round localCheckpoints, so the round is inspected
    directly.)"""
    from udacity_capstone_data_engineering_spark.operators.kcore import (
        _peel_once,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    plan = _plan(_peel_once(li, 3))
    assert "CartesianProduct" not in plan
    assert plan.count("LeftSemi") >= 2


# ---------------------------------------------------------------------------
# incremental ingest dedup
# ---------------------------------------------------------------------------


def test_incremental_ingest_flags_injected_dups(spark):
    """Ids 0/10/20 are incoming (id%10==0). 20 duplicates an existing
    doc; 10 and 0 duplicate each other within the batch (0 wins by
    id); 30 is fresh."""
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64,
    )
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [
            (1, "existing text one"),
            (2, "existing text two"),
            (20, "existing text two"),   # incoming, dup of existing
            (0, "batch twin"),           # incoming, kept (smallest id)
            (10, "batch twin"),          # incoming, dup within batch
            (30, "fresh text"),          # incoming, accept
        ],
        "doc_id long, text string",
    )
    docs = df.select("doc_id", portable_hash64(F.col("text")).alias("fingerprint"))
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    existing = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select("fingerprint").distinct().withColumn("__hit", F.lit(True))
    )
    w = (
        Window.partitionBy("fingerprint").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = incoming.select(
        "doc_id", "fingerprint",
        (F.count(F.lit(1)).over(w) > 0).alias("dup_within_batch"),
    )
    out = {
        r["doc_id"]: (r["dup_of_existing"], r["dup_within_batch"], r["accept"])
        for r in flagged.join(existing, "fingerprint", "left").select(
            "doc_id",
            F.coalesce(F.col("__hit"), F.lit(False)).alias("dup_of_existing"),
            "dup_within_batch",
            (~F.coalesce(F.col("__hit"), F.lit(False))
             & ~F.col("dup_within_batch")).alias("accept"),
        ).collect()
    }
    assert out[20] == (True, False, False)
    assert out[0] == (False, False, True)
    assert out[10] == (False, True, False)
    assert out[30] == (False, False, True)


def test_incremental_ingest_covers_batch(spark, sf_dir):
    out = QUERIES["incremental_ingest_dedup"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_incoming = docs.filter(F.col("doc_id") % 10 == 0).count()
    assert out.count() == n_incoming
    # verdicts are consistent: accept == neither dup flag
    bad = out.filter(
        F.col("accept")
        != (~F.col("dup_of_existing") & ~F.col("dup_within_batch"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# streaming drift monitor
# ---------------------------------------------------------------------------


def test_drift_stream_matches_batch_psi(spark, tmp_path):
    """Stream the period-b events file-by-file; the latest-per-cell
    histogram joined with the static period-a reference through
    psi_from_counts must equal the BATCH psi_report over the union."""
    from udacity_capstone_data_engineering_spark.operators.drift import (
        drift_counts_stream,
        psi_from_counts,
        psi_report,
        value_bucket,
    )

    ref_rows = [("click", 10.0)] * 30 + [("click", 60.0)] * 10 + [
        ("view", 30.0)
    ] * 20
    live1 = [("click", 10.0)] * 10 + [("click", 240.0)] * 10
    live2 = [("click", 60.0)] * 5 + [("view", 30.0)] * 5 + [("view", 90.0)] * 5
    src = tmp_path / "drift_src"
    spark.createDataFrame(live1, "k string, value double").coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    spark.createDataFrame(live2, "k string, value double").coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )
    stream = (
        spark.readStream.schema("k string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        drift_counts_stream(stream, "k", "value", 25.0, 10)
        .writeStream.format("memory")
        .queryName("drift_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM drift_stream_test").collect()
    assert emitted
    latest: dict = {}
    for r in emitted:
        key = (r.k, r.bucket)
        latest[key] = max(latest.get(key, 0), r.c)  # counts monotone
    live_counts = spark.createDataFrame(
        [(k, "b", b, c) for (k, b), c in latest.items()],
        "k string, period string, bucket int, c long",
    )
    ref = spark.createDataFrame(ref_rows, "k string, value double")
    ref_counts = ref.select(
        "k", F.lit("a").alias("period"),
        value_bucket(F.col("value"), 25.0, 10).alias("bucket"),
    ).groupBy("k", "period", "bucket").agg(F.count(F.lit(1)).alias("c"))
    got = sorted(
        map(tuple, psi_from_counts(ref_counts.union(live_counts), 10).collect())
    )
    # batch equivalent over the union with an explicit period column
    batch = spark.createDataFrame(
        [(k, "2024-01-01 00:00:00", v) for k, v in ref_rows]
        + [(k, "2024-01-20 00:00:00", v) for k, v in live1 + live2],
        "k string, ts string, value double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    want = sorted(
        map(
            tuple,
            psi_report(batch, "k", "ts", "value",
                       "2024-01-16 00:00:00", 25.0, 10).collect(),
        )
    )
    assert got == want
    # a real drift signal: 'click' gained a far bucket -> psi > 0
    psi_by_key = {t[0]: t[3] for t in got}
    assert psi_by_key["click"] > 0.1


# ---------------------------------------------------------------------------
# correlation matrix
# ---------------------------------------------------------------------------


def test_corr_matrix_equals_numpy(spark, sf_dir):
    import numpy as np

    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    qv = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1024 + 0.5
    )
    want = np.corrcoef(qv, rowvar=False)
    got = QUERIES["embedding_corr_matrix"](spark, sf_dir).collect()
    d = qv.shape[1]
    assert len(got) == d * (d - 1) // 2
    for r in got:
        assert abs(r["corr"] - want[r["i"] - 1, r["j"] - 1]) < 1e-5, (r["i"], r["j"])
        assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# full quality gate
# ---------------------------------------------------------------------------


def test_full_quality_gate_flags_injected_docs(spark, tmp_path):
    """A fluent doc passes every branch; a one-token-repeated doc
    fails entropy (H = 0) and repetition; an 8-word doc fails the
    Gopher word-count rule. The composite keep is the conjunction."""
    import random

    rng = random.Random(3)
    stop = ["the", "and", "of", "to", "is", "that"]
    words = [f"w{i}xyz"[: rng.randint(3, 8)] for i in range(300)]
    fluent = " ".join(
        (stop[i % len(stop)] if i % 7 == 0 else words[rng.randint(0, 299)])
        for i in range(80)
    )
    rows = [
        (1, fluent),
        (2, " ".join(["spam"] * 80)),
        (3, "too short to pass the gate"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    )
    d = tmp_path / "gate_sf"
    df.write.parquet(str(d / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in QUERIES["full_quality_gate"](spark, str(d)).collect()
    }
    assert out[1]["keep"] is True, out[1]
    assert out[2]["entropy_ok"] is False
    assert out[2]["repetition_keep"] is False
    assert out[2]["keep"] is False
    assert out[3]["gopher_keep"] is False
    assert out[3]["keep"] is False


def test_full_quality_gate_consistent_with_branches(spark, sf_dir):
    out = QUERIES["full_quality_gate"](spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != (
            F.col("gopher_keep")
            & F.col("repetition_keep")
            & F.col("lm_ok")
            & F.col("entropy_ok")
        )
    ).count()
    assert bad == 0
    assert out.count() == load_table(spark, sf_dir, "documents").count()


# ---------------------------------------------------------------------------
# item similarity + c-TF-IDF
# ---------------------------------------------------------------------------


def test_item_similarity_matches_python(spark, sf_dir):
    """Replay Jaccard-top-5 in plain Python over the same baskets."""
    from collections import defaultdict

    got = defaultdict(list)
    for r in QUERIES["item_similarity_jaccard"](spark, sf_dir).collect():
        got[r["part"]].append((r["other"], r["jaccard"]))

    li = load_table(spark, sf_dir, "lineitem")
    items = {(r["l_orderkey"], r["l_partkey"]) for r in
             li.select("l_orderkey", "l_partkey").distinct().collect()}
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[pk].add(ok)
    co = defaultdict(int)
    per_order = defaultdict(list)
    for ok, pk in items:
        per_order[ok].append(pk)
    for parts in per_order.values():
        parts = sorted(parts)
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                co[(a, b)] += 1
    neigh = defaultdict(list)
    for (a, b), c in co.items():
        den = len(baskets[a]) + len(baskets[b]) - c
        num = c * 10**9
        half = den * 1000
        t = 2 * num + half
        q = (t - (((t % (2 * half)) + 2 * half) % (2 * half))) // (2 * half)
        j = q / 1e6
        neigh[a].append((b, j))
        neigh[b].append((a, j))
    for part, pairs in got.items():
        want = sorted(neigh[part], key=lambda x: (-x[1], x[0]))[:5]
        assert sorted(pairs, key=lambda x: (-x[1], x[0])) == want, part


def test_item_similarity_plan_group_limit(spark, sf_dir):
    plan = _plan(QUERIES["item_similarity_jaccard"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ctfidf_shape_and_ranking(spark, sf_dir):
    rows = QUERIES["cluster_top_terms_ctfidf"](spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cluster, rs in by_cluster.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # scores are positive and non-increasing with rank
        ordered = sorted(rs, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["score"] >= b["score"]
        assert all(r["score"] > 0 for r in rs)
