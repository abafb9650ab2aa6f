"""Phase-9 query tier (round 5e): within-doc repetition filters,
count-min sketch, inverted-index build, exact-integer k-means.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry). House determinism rules apply:
portable md5-derived hashing for oracle-reproducible hashes, integer
arithmetic wherever an iterative fixpoint must hash-match the oracle,
ROUND only after exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.text import tokens
from udacity_capstone_data_engineering_spark.operators.countmin import (
    countmin_sketch,
    countmin_sketch_oracle_sql,
)
from udacity_capstone_data_engineering_spark.operators.inverted_index import (
    inverted_index,
    inverted_index_oracle_sql,
)
from udacity_capstone_data_engineering_spark.operators.kmeans import (
    kmeans_int,
    kmeans_int_oracle_sql,
)
from udacity_capstone_data_engineering_spark.operators.repetition import (
    repetition_flags,
    repetition_flags_oracle_sql,
)
from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Text quality: Gopher repetition filters
# ---------------------------------------------------------------------------


@_register("doc_repetition_flags", repetition_flags_oracle_sql("documents"))
def doc_repetition_flags(spark, sf_dir):
    """Gopher repetition-rule flags (duplicate-line fraction/chars, top
    2-gram char fraction, duplicated 3-gram char fraction) with the
    combined keep decision — the second half of the standard LLM-corpus
    quality gate (format rules live in ``gopher_quality_flags``).
    Explode->groupBy branches shuffle only (doc_id, 60-bit hash) pairs;
    all aggregation doc-keyed (``operators/repetition.py``)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return repetition_flags(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Sketches: count-min over the corpus vocabulary
# ---------------------------------------------------------------------------

_CMS_TOKENS_SRC = (
    "SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
    "t -> t <> '')) AS k, 1 AS w FROM documents"
)


@_register("token_countmin_sketch", countmin_sketch_oracle_sql(_CMS_TOKENS_SRC))
def token_countmin_sketch(spark, sf_dir):
    """Count-min sketch of the corpus token frequencies: a (4 x 256)
    counter grid answering point-frequency queries for any token with
    one-sided additive error — the mergeable frequency summary that
    complements Misra-Gries heavy hitters. Engine-portable seeded
    hashing makes the grid bit-reproducible, so the sketch itself is
    the hash-gated result (``operators/countmin.py``)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("token")
    )
    return countmin_sketch(toks, "token")


# ---------------------------------------------------------------------------
# Retrieval: inverted-index build
# ---------------------------------------------------------------------------

_INDEX_OCC_SQL = (
    "SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
    "t -> t <> '')) AS tok, doc_id AS doc FROM documents"
)


@_register("inverted_index_postings", inverted_index_oracle_sql(_INDEX_OCC_SQL))
def inverted_index_postings(spark, sf_dir):
    """Inverted index over the corpus: per token, document frequency,
    collection frequency, and the posting list of the 8 smallest doc
    ids — built with hash-keyed shuffles and a two-level min-K
    tournament so no stopword ever owns a corpus-sized partition
    (``operators/inverted_index.py``)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    occ = docs.select(
        F.col("doc_id"),
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("token"),
    )
    return inverted_index(occ, "token", "doc_id")


# ---------------------------------------------------------------------------
# Iterative ML: exact-integer k-means over embeddings
# ---------------------------------------------------------------------------


@_register("embedding_kmeans_int", kmeans_int_oracle_sql())
def embedding_kmeans_int(spark, sf_dir):
    """Fixed-iteration Lloyd k-means over the embedding corpus in
    EXACT BIGINT arithmetic (quantize -> assign -> floor-div update),
    so the iterative fixpoint is bit-equal across engines and the
    clustering carries a full value-hash oracle — the second
    application of the PageRank pattern, extended from graph ranking
    to iterative ML (``operators/kmeans.py``). Assignment is map-only
    against broadcast literal centroids; the update is one k x d
    tree-aggregated collect per round (the MLlib layout)."""
    vecs = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return kmeans_int(vecs, "vec_id", "embedding")


# ---------------------------------------------------------------------------
# Retrieval: BM25 ranking for a data-derived term workload
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = 8
_BM25_TOPN = 50

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'), t -> t <> ''))
               AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    terms AS (
      SELECT token, df FROM (
        SELECT token, df,
               row_number() OVER (ORDER BY df, token) AS rn FROM df)
      WHERE rn <= {_BM25_TERMS}),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(*) FROM toks) AS total_toks),
    contrib AS (
      SELECT tf.doc_id,
        CAST(ROUND(
          ln(1 + (n_docs - t.df + 0.5) / (t.df + 0.5))
          * tf.tf * ({_BM25_K1} + 1)
          / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
             + {_BM25_B} * dl.dl
               / (CAST(total_toks AS DOUBLE) / n_docs))),
          9) AS DECIMAL(18, 9)) AS c
      FROM tf JOIN terms t USING (token)
      JOIN doclen dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats),
    scored AS (
      SELECT doc_id, ROUND(CAST(sum(c) AS DOUBLE), 6) AS score,
             count(*) AS n_matched
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, score, n_matched
    FROM scored ORDER BY score DESC, doc_id LIMIT {_BM25_TOPN}
"""


@_register("bm25_topk_docs", _BM25_SQL)
def bm25_topk_docs(spark, sf_dir):
    """BM25 ranking over the corpus for a DATA-DERIVED term workload
    (the 8 rarest tokens — the discriminative end of the vocabulary):
    idf * tf-saturation * length normalization, per-term contributions
    quantized to DECIMAL(18,9) before the per-doc sum (house rule: the
    sum must be order-independent for the hash gate; one final double
    round). Scale shape: tf/df/doclen are the inverted-index
    aggregates; the term set and corpus stats are vocabulary-sized
    TakeOrdered / scalar aggs entering as broadcasts; top-50 under a
    (score, doc_id) total order is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(tokens(F.lower(F.col("text"))), lambda t: t != "")
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    terms = df.orderBy("df", "token").limit(_BM25_TERMS)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("total_toks"))
    )
    k1, b = _BM25_K1, _BM25_B
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs")
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    contrib = tf.join(F.broadcast(terms), "token").join(doclen, "doc_id").crossJoin(
        F.broadcast(stats)
    ).select(
        "doc_id",
        F.round(idf * F.col("tf") * (k1 + 1) / denom, 9)
        .cast("decimal(18,9)")
        .alias("c"),
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c").cast("double"), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(_BM25_TOPN)


# ---------------------------------------------------------------------------
# Linear algebra: integer gram matrix of the embedding corpus (PCA prep)
# ---------------------------------------------------------------------------

_GRAM_SCALE = 1024

_GRAM_SQL = f"""
    WITH q AS (
      SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5)
                           AS BIGINT)) AS qv
      FROM embeddings),
    cells AS (
      SELECT u.i AS i, u.j AS j, u.p AS p FROM (
        SELECT unnest(flatten(list_transform(range(1, len(qv) + 1),
                   i -> list_transform(range(i, len(qv) + 1),
                       j -> {{'i': i, 'j': j, 'p': qv[i] * qv[j]}})))) AS u
        FROM q))
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
           CAST(sum(p) AS BIGINT) AS g
    FROM cells GROUP BY 1, 2
"""


@_register("embedding_gram_matrix", _GRAM_SQL)
def embedding_gram_matrix(spark, sf_dir):
    """Upper-triangle gram matrix G[i,j] = sum over vectors of
    qv[i]*qv[j] on the floor-rounded integer quantization — the
    PCA/whitening precursor (covariance = G/n - mean outer product,
    driver-side arithmetic on this d^2-sized output). Exact BIGINT
    products make the reduction order-independent, so the matrix
    itself is hash-gated. Scale shape: the d(d+1)/2 products per
    vector are built by nested builtin HOFs and exploded MAP-ONLY —
    no self-join — then one aggregation onto d^2-bounded cells with
    map-side combine; shuffle bytes are partitions x 2080 cells
    regardless of corpus size."""
    vecs = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    d = F.size("qv")
    q = vecs.select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * _GRAM_SCALE + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("qv")
    )
    pairs = q.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), d),
                    lambda i: F.transform(
                        F.sequence(i, d),
                        lambda j: F.struct(
                            i.cast("int").alias("i"),
                            j.cast("int").alias("j"),
                            (
                                F.element_at("qv", i) * F.element_at("qv", j)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("u")
    )
    return pairs.select("u.i", "u.j", "u.p").groupBy("i", "j").agg(
        F.sum("p").alias("g")
    )
