"""Phase-14 query tier (round 8): substring-level exact dedup — the
duplicate-SPAN regime of Lee et al. (ACL 2022), "Deduplicating
Training Data Makes Language Models Better". Doc-level exact/near
dedup (phases 1-3) decides keep-or-drop per DOCUMENT; production
training pipelines additionally excise duplicated PASSAGES from
otherwise-unique documents (the paper's 50-token-window regime; the
reference repo has no dedup tier at all, so this extends the
commissioned LLM-pipeline surface, not reference parity).

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry); house determinism rules apply
(portable md5-derived hashes, BIGINT positions, exact integer
arithmetic at result edges).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

_SPAN_W = 8  # tokens per duplicated window (the paper uses 50 BPE
# tokens at web scale; 8 word tokens keeps the sf0.01 fixture's
# planted ~5% near-dups and ~0.2% exact dups detectable)

# The oracle is the same plan in DuckDB spelling: window-hash every
# w-gram, keep grams seen in >= 2 distinct docs, merge the surviving
# positions per doc with one lag + cumulative-sum islands pass.
_SPANS_SQL = rf"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    g0 AS (SELECT doc_id,
                  CASE WHEN len(t) < {_SPAN_W} THEN CAST([] AS BIGINT[])
                       ELSE list_transform(range(1, len(t) - {_SPAN_W} + 2),
                            i -> CAST('0x' || substr(md5(array_to_string(
                                   t[CAST(i AS INT):CAST(i + {_SPAN_W - 1} AS INT)],
                                   ' ')), 1, 15) AS BIGINT))
                  END AS ghs
           FROM toks),
    g AS (SELECT doc_id,
                 CAST(generate_subscripts(ghs, 1) - 1 AS BIGINT) AS pos,
                 unnest(ghs) AS gh
          FROM g0),
    d AS (SELECT gh FROM g GROUP BY gh
          HAVING count(DISTINCT doc_id) >= 2),
    p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gh)),
    i AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id ORDER BY pos) > {_SPAN_W}
                      THEN 1 ELSE 0 END AS brk
          FROM p),
    s AS (SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM i)
    SELECT doc_id, MIN(pos) AS span_start,
           MAX(pos) + {_SPAN_W - 1} AS span_end,
           MAX(pos) - MIN(pos) + {_SPAN_W} AS span_tokens,
           COUNT(*) AS n_dup_grams
    FROM s GROUP BY doc_id, island
"""


@_register("duplicate_token_spans", _SPANS_SQL)
def duplicate_token_spans_q(spark, sf_dir):
    """Maximal per-document spans of consecutive tokens whose every
    8-token window also appears in another document — substring-level
    exact dedup (``operators/dedup.duplicate_token_spans``). Linear
    scale shape: map-only window hashing, one map-side-combined
    groupBy on the gram hash, a hash-keyed join back (dup-gram set is
    small and AQE-broadcastable), one per-doc window for the island
    merge. The DuckDB oracle going green proves position math, island
    merging, and the cross-doc condition end to end."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        duplicate_token_spans,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return duplicate_token_spans(docs, "text", "doc_id", w=_SPAN_W)


@_register(
    "dup_span_doc_ratio",
    rf"""
    WITH spans AS ({_SPANS_SQL}),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_spans,
                       SUM(span_tokens) AS dup_tokens
                FROM spans GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           p.n_spans, p.dup_tokens
    FROM documents d JOIN per_doc p USING (doc_id)
    WHERE 2 * p.dup_tokens >= len(string_split(d.text, ' '))
    """,
)
def dup_span_doc_ratio(spark, sf_dir):
    """The actionable filter signal on top of the span detector: for
    every document where duplicated spans cover >= 50% of its tokens,
    the span count, duplicated-token total, and exact token counts —
    the "mostly-boilerplate" drop list a quality gate consumes
    (coverage ratio = dup_tokens / n_tokens, derivable exactly). The
    result set carries INTEGERS ONLY and the >= 50% cut is the integer
    inequality 2*dup_tokens >= n_tokens (ADVICE r8: a rounded-double
    column at the result edge risked Spark's BigDecimal half-up vs
    DuckDB's binary-double half-away diverging on an exact 1e-6
    boundary — a departure from the house exact-integer-edges rule).
    One extra groupBy + a broadcastable join against the (small)
    flagged set; the token denominator is recomputed from the source
    text so the cut is exact, not estimated."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        duplicate_token_spans,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    spans = duplicate_token_spans(docs, "text", "doc_id", w=_SPAN_W)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    return (
        docs.select("doc_id", n_tok.alias("n_tokens"))
        .join(per_doc, "doc_id")
        .filter(2 * F.col("dup_tokens") >= F.col("n_tokens"))
        .select("doc_id", "n_tokens", "n_spans", "dup_tokens")
    )
