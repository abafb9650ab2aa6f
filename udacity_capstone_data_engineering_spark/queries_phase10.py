"""Phase-10 query tier (round 5f): language-model quality scoring,
distribution-drift monitoring, semantic dedup, and the JSONL edge of
the format matrix.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry). House determinism rules apply:
round-9 DECIMAL quantization before any order-sensitive sum of a
transcendental, exact integer arithmetic through every iterative or
thresholded comparison, ROUND only after exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_capstone_data_engineering_spark.operators.drift import (
    psi_oracle_sql,
    psi_report,
)
from udacity_capstone_data_engineering_spark.operators.ngram_lm import (
    bigram_lm_oracle_sql,
    bigram_lm_scores,
)
from udacity_capstone_data_engineering_spark.operators.semdedup import (
    SAMPLE_MOD,
    semantic_dedup,
    semantic_dedup_oracle_sql,
)
from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Text quality: corpus bigram LM scoring (the perplexity filter)
# ---------------------------------------------------------------------------


@_register("bigram_lm_quality", bigram_lm_oracle_sql("documents"))
def bigram_lm_quality(spark, sf_dir):
    """CCNet-style LM quality scoring: train an add-one bigram LM on
    the corpus itself, score every document by mean token
    log-probability — the filter that ranks mojibake/boilerplate-soup
    documents below fluent ones. Per-gram log-probs are round-9
    DECIMAL before the per-doc sum so the score is hash-gated; model
    tables are gram-keyed aggregates of the already-reduced per-doc
    bigram counts; the vocabulary size is the documented 1-row
    broadcast (``operators/ngram_lm.py``)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return bigram_lm_scores(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Monitoring: PSI drift between event periods
# ---------------------------------------------------------------------------

_PSI_PIVOT = "2024-01-16 00:00:00"
_PSI_WIDTH = 25.0
_PSI_BUCKETS = 10


@_register(
    "psi_event_drift",
    psi_oracle_sql(
        "events", "event_type", "ts", "value", _PSI_PIVOT, _PSI_WIDTH, _PSI_BUCKETS
    ),
)
def psi_event_drift(spark, sf_dir):
    """Population Stability Index of the event value distribution per
    event type, first half of the month vs second — the continuous
    drift monitor a production pipeline alerts on (0.1 = drifting,
    0.25 = major shift). One counting pass over the stream with
    map-side partial aggregation; everything after is arithmetic on a
    keys x 2 x 10 grid (``operators/drift.py``)."""
    events = load_table(spark, sf_dir, "events")
    return psi_report(
        events, "event_type", "ts", "value", _PSI_PIVOT, _PSI_WIDTH, _PSI_BUCKETS
    )


# ---------------------------------------------------------------------------
# Dedup: semantic (embedding-space) near-duplicate pruning
# ---------------------------------------------------------------------------


@_register(
    "semantic_dedup_eps",
    semantic_dedup_oracle_sql(
        f"(SELECT * FROM embeddings WHERE vec_id % {SAMPLE_MOD} = 0)"
    ),
)
def semantic_dedup_eps(spark, sf_dir):
    """SemDeDup (arXiv 2303.09540) dedup-rate audit on a deterministic
    1-in-20 id sample: integer-Lloyd clusters, within-cluster exact
    integer eps-ball pairs, keep the minimum id per neighborhood. The
    pair stage joins ON CLUSTER — candidate volume is
    sum-of-cluster-sizes-squared, never corpus-squared; at production
    scale k rises with n to hold cluster sizes bounded
    (``operators/semdedup.py``)."""
    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % SAMPLE_MOD == 0
    )
    return semantic_dedup(fan_out_small_scan(vecs), "vec_id", "embedding")


# ---------------------------------------------------------------------------
# Sources/sinks: JSONL edge of the format matrix
# ---------------------------------------------------------------------------


@_register(
    "jsonl_roundtrip_docs",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def jsonl_roundtrip_docs(spark, sf_dir):
    """JSON-lines sink + source under the oracle gate: write the
    corpus as JSONL (the interchange format every crawl/annotation
    vendor actually ships), read it back with an EXPLICIT schema — at
    100 TB schema inference is a full extra pass, and a sampled
    inference can silently widen or narrow types between batches.
    The oracle is the identity projection on the source table, so a
    sink that mangles a row, drops a field, or re-types a column
    hash-mismatches. JSONL stays at the pipeline edge; intermediates
    stay columnar (``sources/sinks.write_files``)."""
    import tempfile

    from udacity_capstone_data_engineering_spark.sources.sinks import write_files

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="spark_jsonl_gate_")
    path = write_files(docs, base, "documents_jsonl", file_format="json")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.read.schema(schema).json(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
