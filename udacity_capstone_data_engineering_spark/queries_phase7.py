"""Phase-7 query tier (round 3): the remaining corpus-prep stages a
large-scale training pipeline runs between "clean corpus" and
"training shards" — benchmark decontamination, sub-document
containment detection, token-budget sequence packing, and blocklist
auditing. All JVM-side builtins; every query oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.text import (
    tokens,
    word_shingles,
)
from udacity_capstone_data_engineering_spark.queries import (
    _SHINGLES_SQL,
    _TOKENS_SQL,
    _register,
)
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap against a held-out set
# ---------------------------------------------------------------------------


@_register(
    "decontam_ngram_overlap",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shset FROM documents),
    bg AS (SELECT DISTINCT unnest(shset) AS g FROM sh WHERE doc_id % 100 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 100 <> 0),
    hits AS (
        SELECT doc_id, count(*) AS n_overlap
        FROM (SELECT doc_id, unnest(shset) AS g FROM corpus)
        JOIN bg USING (g)
        GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(len(c.shset) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           coalesce(h.n_overlap, 0) >= 0.2 * greatest(len(c.shset), 1)
               AS contaminated
    FROM corpus c LEFT JOIN hits h USING (doc_id)
    """,
)
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: for every corpus document, the
    fraction of its distinct word 5-grams that appear ANYWHERE in the
    held-out benchmark set (here: every 100th doc stands in for the
    eval benchmark), with the standard flag at ≥20% overlap. This is
    the n-gram-overlap decontamination used for LLM training corpora
    (eval answers leaking into training data inflate benchmarks).

    Scale shape: the benchmark side reduces to a DISTINCT gram set
    (tiny vs the corpus — benchmarks are fixed-size while corpora
    grow), the corpus side explodes grams and equi-joins on the gram
    — one shuffle keyed by gram, per-doc counts re-aggregate on
    doc_id. No pairwise comparison anywhere: cost is corpus-linear
    regardless of benchmark pairing, unlike a doc×doc approach."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.array_distinct(word_shingles("text", k=5)).alias("shset"),
    )
    bench_grams = (
        sh.filter(F.col("doc_id") % 100 == 0)
        .select(F.explode("shset").alias("g"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 100 != 0)
    hits = (
        corpus.select("doc_id", F.explode("shset").alias("g"))
        .join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    out = corpus.join(hits, "doc_id", "left").na.fill({"n_overlap": 0})
    n_grams = F.size("shset").cast("long")
    return out.select(
        "doc_id",
        n_grams.alias("n_grams"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        (
            F.col("n_overlap")
            >= 0.2 * F.greatest(n_grams, F.lit(1).cast("long"))
        ).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Sub-document containment (the direction Jaccard misses)
# ---------------------------------------------------------------------------


_SHINGLES2_SQL = (
    "list_distinct([array_to_string("
    "(regexp_split_to_array(trim(text), '\\s+'))[i:i+1], ' ')"
    " for i in range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 1, 0) + 1)])"
)


@_register(
    "containment_pairs",
    f"""
    WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    sh AS (SELECT doc_id, {_SHINGLES2_SQL} AS shset FROM sub)
    SELECT id_a, id_b, containment FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.shset, b.shset))
                     / greatest(len(a.shset), 1), 6) AS containment
        FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
    WHERE containment >= 0.25
    """,
)
def containment_pairs(spark, sf_dir):
    """Directional containment pairs |A∩B|/|A| ≥ 0.25 over word-bigram
    sets — sub-document duplication that symmetric Jaccard
    structurally under-scores (a short quote fully inside a long
    article scores containment 1.0 but Jaccard ≈ 0). Engine side runs
    the prefix-filtered ``containment_join`` (probe prefixes × full
    build index, no cross join — `operators/jaccard.py`); the oracle
    is the naive quadratic definition on a deterministic 1-in-5
    document subset (bounded so the oracle itself stays tractable at
    the sf0.1 replay)."""
    from udacity_capstone_data_engineering_spark.operators.jaccard import (
        containment_join,
    )

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    )
    return containment_join(docs, "text", "doc_id", threshold=0.25, shingle_k=2)


# ---------------------------------------------------------------------------
# Token-budget sequence packing (training-shard assembly)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 500
_PACK_BUCKETS = 8


@_register(
    "pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               len({_TOKENS_SQL}) AS weight,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {_PACK_BUCKETS} AS bucket
        FROM documents)
    SELECT doc_id,
           CAST(weight AS BIGINT) AS weight,
           CAST(bucket AS INTEGER) AS bucket,
           CAST((SUM(weight) OVER (PARTITION BY bucket ORDER BY doc_id)
                 - weight) // {_PACK_BUDGET} AS INTEGER) AS pack_id
    FROM t
    """,
)
def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing: assign documents to ~500-token
    packs (training-shard units) via contiguous packing inside
    portable-hash buckets (`operators/packing.py`). Deterministic and
    repartition-invariant — bucket from the portable 60-bit hash,
    ordering by doc_id within bucket — so the same corpus always
    yields the same shards on any cluster layout. Each bucket's window
    is a single partition's sort; no global ordering anywhere."""
    from udacity_capstone_data_engineering_spark.operators.packing import (
        pack_contiguous,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    return pack_contiguous(
        docs, "doc_id", "n_tokens", budget=_PACK_BUDGET, buckets=_PACK_BUCKETS
    )


# ---------------------------------------------------------------------------
# Blocklist audit (quality filtering with measured drops)
# ---------------------------------------------------------------------------

_BLOCKLIST = ("slow", "error")


@_register(
    "blocklist_audit",
    f"""
    SELECT doc_id,
           CAST(len(list_filter({_TOKENS_SQL},
                                t -> t IN {_BLOCKLIST!r})) AS BIGINT)
               AS n_hits,
           len(list_filter({_TOKENS_SQL}, t -> t IN {_BLOCKLIST!r})) = 0
               AS clean
    FROM documents
    """,
)
def blocklist_audit(spark, sf_dir):
    """Blocklist audit: per-document count of blocklisted tokens and a
    keep/drop flag. The 'no silent caps' rule applied to content
    filtering — a pipeline that drops documents must MEASURE what it
    dropped, so the filter emits audit counts rather than silently
    subsetting. One map-side pass, builtin higher-order filter, no
    shuffle; the downstream keep-filter is `clean = true`."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))  # oracle's _TOKENS_SQL lowers too
    hits = F.size(
        F.filter(
            toks,
            lambda t: t.isin(*_BLOCKLIST),
        )
    )
    return docs.select(
        "doc_id",
        hits.cast("long").alias("n_hits"),
        (hits == 0).alias("clean"),
    )
