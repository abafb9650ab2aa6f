"""Phase-6 query tier (round 2): corpus-preparation operators for an
LLM training-data pipeline — PII-style redaction, overlapping document
chunking, cross-document span-duplication measurement, and global
token heavy hitters.

These four cover the pipeline stages between "raw corpus" and
"training shards" that earlier tiers didn't: scrubbing (regex
redaction with audit counts), chunk materialization (the unit actually
fed to a tokenizer, with overlap for context continuity), corpus-level
contamination measurement (what fraction of a document is boilerplate
shared with other documents — the span-level signal behind suffix-
array dedup), and vocabulary profiling. All JVM-side builtins — no
Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.text import (
    tokens,
    word_shingles,
)
from udacity_capstone_data_engineering_spark.queries import (
    _SHINGLES_SQL,
    _register,
)
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Scrubbing: regex redaction with audit counts
# ---------------------------------------------------------------------------

_DIGIT_RUN = "[0-9]{2,}"


@_register(
    "pii_redact_props",
    f"""
    SELECT event_id,
           regexp_replace(props, '{_DIGIT_RUN}', '#', 'g') AS redacted,
           CAST(len(regexp_extract_all(props, '{_DIGIT_RUN}')) AS INTEGER)
               AS n_redactions
    FROM events
    """,
)
def pii_redact_props(spark, sf_dir):
    """PII-style scrubbing: redact digit runs (≥2 digits — the stand-in
    for account/phone/id numbers in this synthetic corpus) and keep an
    audit count of redactions per record. Real pipelines swap the
    pattern for email/phone/SSN alternations; the operator shape —
    one pass, `regexp_replace` + `regexp_extract_all` count, all
    JVM-side — is identical. The pattern avoids constructs where Java
    regex (Spark) and RE2 (oracle) diverge (no lookaround, no
    backrefs). Purely row-local: no shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", _DIGIT_RUN, "#").alias("redacted"),
        F.size(F.regexp_extract_all("props", F.lit(_DIGIT_RUN), 0))
        .alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# Chunking: overlapping fixed-width windows (tokenizer feed units)
# ---------------------------------------------------------------------------

_CHUNK = 100
_STRIDE = 80


@_register(
    "doc_chunks_overlap",
    f"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           md5(substring(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK}))
               AS chunk_md5,
           length(substring(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK}))
               AS chunk_len
    FROM (SELECT doc_id, text,
                 unnest(range(0, (length(text) - 1) // {_STRIDE} + 1)) AS i
          FROM documents)
    """,
)
def doc_chunks_overlap(spark, sf_dir):
    """Overlapping document chunking: {_CHUNK}-char windows every
    {_STRIDE} chars (20-char overlap carries context across chunk
    boundaries — the standard trick so a tokenizer never sees a
    sentence cut with no left context). `sequence` + `posexplode`
    materializes chunk offsets JVM-side; the tail chunk is naturally
    shorter (`substring` truncates). Emits content hashes + lengths,
    not the chunk text, so the exchange after this (if any) carries
    ~40 bytes/chunk instead of the text. Row-local: chunking never
    shuffles; at 100 TB this runs entirely map-side on the scan."""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = (F.length("text") - 1).cast("long") / F.lit(_STRIDE)
    chunked = docs.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(F.lit(0), F.floor(n_chunks).cast("int"))
        ).alias("chunk_idx", "_i"),
    )
    chunk = F.col("text").substr(
        F.col("chunk_idx") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.md5(chunk).alias("chunk_md5"),
        F.length(chunk).alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Contamination: cross-document span duplication per document
# ---------------------------------------------------------------------------


@_register(
    "duplicated_span_ratio",
    f"""
    WITH dg AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS gram FROM documents),
    gf AS (SELECT gram, COUNT(*) AS n_docs FROM dg GROUP BY gram)
    SELECT doc_id, COUNT(*) AS n_grams,
           ROUND(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
               AS dup_ratio
    FROM dg JOIN gf USING (gram)
    GROUP BY doc_id
    """,
)
def duplicated_span_ratio(spark, sf_dir):
    """Span-level duplication measure: for each document, the fraction
    of its distinct word 5-grams that appear in at least one OTHER
    document — the per-document contamination signal that substring
    dedup (suffix-array / exact-span methods) thresholds on. Two
    shuffles, both on the gram: the document-frequency aggregate
    (map-side partial count first, so hot boilerplate grams combine
    before the exchange) and the join back to per-doc rows. The join
    carries (doc_id, gram-hash-sized strings); at 100 TB, gram
    df-counting is the canonical skewed-key aggregate — partial
    aggregation absorbs the skew that a raw groupBy would
    concentrate. Docs shorter than 5 tokens have no grams and no row
    (cannot be span-duplicated)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    dg = docs.select(
        "doc_id", F.explode(word_shingles("text", 5)).alias("gram")
    )
    gf = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dg.join(gf, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary profile: global token heavy hitters
# ---------------------------------------------------------------------------


@_register(
    "token_heavy_hitters",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def token_heavy_hitters(spark, sf_dir):
    """Global token heavy hitters: top 50 tokens by corpus frequency.
    Explode → two-phase count → `TakeOrderedAndProject`: partial
    map-side counts collapse each partition's token multiset before
    the shuffle (the exchange carries one row per distinct token per
    partition, not one per occurrence), and the top-k never sorts the
    full vocabulary globally — each partition offers its local top
    candidates. Tie-broken by token so the LIMIT is deterministic."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )
