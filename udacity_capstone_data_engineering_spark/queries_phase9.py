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
