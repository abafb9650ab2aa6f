"""Within-document repetition filters (Gopher, Rae et al. 2021 §A1.1).

The reference pipeline's quality surface stops at null/dup QC
(`qhi.py:3-91`); this operator family extends it with the repetition
rules every LLM data pipeline applies before training: documents whose
text is dominated by repeated lines or repeated word n-grams are
boilerplate/spam and get filtered. Complements
``functions/text.py:gopher_quality_flags`` (the *format* rules) with
the *repetition* rules.

Exact definitions (the oracle mirrors them verbatim):

- Lines are ``split(text, '\\n')``, trimmed, empties dropped. A line is
  *duplicated* when its trimmed form occurs >= 2 times in the doc;
  ``dup_line_frac`` counts ALL occurrences of duplicated lines over
  total lines, ``dup_line_char_frac`` their characters over total line
  characters.
- Word n-grams are adjacent whitespace-token runs joined by a single
  space. ``top_2gram_char_frac`` is (occurrences x word-chars) of the
  most character-covering 2-gram over total word characters;
  ``dup_3gram_char_frac`` sums (occurrences x word-chars) over all
  3-grams occurring >= 2 times (overlaps overcount, so the ratio is
  capped at 1 — documented Gopher-style approximation).
- Flags use the canonical thresholds (dup lines 30%, dup line chars
  20%, top 2-gram 20%, dup 3-gram 18%) compared by integer
  cross-multiplication — no float threshold edges.

Scale shape: one narrow scan binds token/line arrays, then three
explode->groupBy branches whose shuffle keys are (doc_id,
portable-60-bit hash) — raw line/gram STRINGS never cross the wire
(house shuffle-byte rule, `functions/hashing.py`). All aggregation is
doc-keyed with map-side partial combine; the final assembly is three
doc_id equi-joins of already-reduced (one row per doc) relations. No
UDFs anywhere — the whole plan is builtin codegen. Linear in corpus
size, no all-pairs anything, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)
from udacity_capstone_data_engineering_spark.functions.text import tokens

# Canonical Gopher thresholds as exact rationals (numerator, denominator).
DUP_LINE_MAX = (3, 10)        # <= 30% of lines duplicated
DUP_LINE_CHAR_MAX = (1, 5)    # <= 20% of line chars in duplicated lines
TOP_2GRAM_CHAR_MAX = (1, 5)   # <= 20% of word chars in the top 2-gram
DUP_3GRAM_CHAR_MAX = (9, 50)  # <= 18% of word chars in duplicated 3-grams


def _word_grams(toks, k: int):
    """Adjacent word k-grams of a BOUND token array, space-joined."""
    n = F.size(toks) - F.lit(k - 1)
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
        )
    )


def repetition_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition statistics + keep flags (see module doc).

    Returns one row per input row with exact integer-derived fractions
    (rounded to 6 places for display; the flags are computed on the
    integers) and the combined ``keep``.
    """
    did = F.col(id_col)
    t = F.col(text_col)
    base = df.select(
        did,
        F.filter(
            F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("__lines"),
        F.filter(tokens(t), lambda w: w != "").alias("__toks"),
    )
    base = base.select(
        did,
        "__lines",
        "__toks",
        F.coalesce(
            F.aggregate(
                "__toks", F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
            ),
            F.lit(0).cast("bigint"),
        ).alias("word_chars"),
    )

    # Branch 1: line duplication. Shuffle key = (doc_id, 60-bit line hash).
    lines = base.select(did, F.explode("__lines").alias("__line")).select(
        did,
        portable_hash64(F.col("__line")).alias("lh"),
        F.length("__line").cast("bigint").alias("llen"),
    )
    line_groups = lines.groupBy(id_col, "lh", "llen").agg(F.count("*").alias("c"))
    dup_c = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
    line_stats = line_groups.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.col("c") * F.col("llen")).alias("line_chars"),
        F.sum(dup_c).alias("dup_lines"),
        F.sum(dup_c * F.col("llen")).alias("dup_line_chars"),
    )

    def gram_branch(k: int):
        g = base.select(did, F.explode(_word_grams(F.col("__toks"), k)).alias("__g"))
        return g.select(
            did,
            portable_hash64(F.col("__g")).alias("gh"),
            # word chars in the gram = its length minus the k-1 joiners
            (F.length("__g") - F.lit(k - 1)).cast("bigint").alias("glen"),
        ).groupBy(id_col, "gh", "glen").agg(F.count("*").alias("c"))

    top2 = gram_branch(2).groupBy(id_col).agg(
        F.max(F.col("c") * F.col("glen")).alias("top_2gram_chars")
    )
    dup3 = gram_branch(3).groupBy(id_col).agg(
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * F.col("glen")).otherwise(F.lit(0))
        ).alias("dup_3gram_chars")
    )

    out = (
        base.select(did, "word_chars")
        .join(line_stats, id_col, "left")
        .join(top2, id_col, "left")
        .join(dup3, id_col, "left")
    )
    n_lines = F.coalesce(F.col("n_lines"), F.lit(0))
    line_chars = F.coalesce(F.col("line_chars"), F.lit(0))
    dup_lines = F.coalesce(F.col("dup_lines"), F.lit(0))
    dup_line_chars = F.coalesce(F.col("dup_line_chars"), F.lit(0))
    top2c = F.coalesce(F.col("top_2gram_chars"), F.lit(0))
    dup3c = F.coalesce(F.col("dup_3gram_chars"), F.lit(0))
    wc = F.greatest(F.col("word_chars"), F.lit(1))
    nl = F.greatest(n_lines, F.lit(1))
    lc = F.greatest(line_chars, F.lit(1))

    def frac(num, den):
        return F.round(num / den, 6)

    ok_dup_lines = dup_lines * DUP_LINE_MAX[1] <= nl * DUP_LINE_MAX[0]
    ok_dup_line_chars = (
        dup_line_chars * DUP_LINE_CHAR_MAX[1] <= lc * DUP_LINE_CHAR_MAX[0]
    )
    ok_top_2gram = top2c * TOP_2GRAM_CHAR_MAX[1] <= wc * TOP_2GRAM_CHAR_MAX[0]
    ok_dup_3gram = dup3c * DUP_3GRAM_CHAR_MAX[1] <= wc * DUP_3GRAM_CHAR_MAX[0]
    return out.select(
        did,
        n_lines.alias("n_lines"),
        frac(dup_lines, nl).alias("dup_line_frac"),
        frac(dup_line_chars, lc).alias("dup_line_char_frac"),
        frac(top2c, wc).alias("top_2gram_char_frac"),
        F.least(frac(dup3c, wc), F.lit(1.0)).alias("dup_3gram_char_frac"),
        ok_dup_lines.alias("ok_dup_lines"),
        ok_dup_line_chars.alias("ok_dup_line_chars"),
        ok_top_2gram.alias("ok_top_2gram"),
        ok_dup_3gram.alias("ok_dup_3gram"),
        (ok_dup_lines & ok_dup_line_chars & ok_top_2gram & ok_dup_3gram).alias(
            "keep"
        ),
    )


def repetition_flags_oracle_sql(table: str = "documents") -> str:
    """DuckDB spelling of :func:`repetition_flags` over ``table``
    (doc_id/text columns), mirroring every definition exactly —
    including the (doc_id, hash, len) grouping so even a (never
    observed) 60-bit collision would agree across engines."""
    lh = portable_hash64_sql("line")
    gh2 = portable_hash64_sql("g")
    gh3 = portable_hash64_sql("g")
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)), l -> l <> '') AS lines,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w <> '') AS toks
      FROM {table}),
    wchars AS (
      SELECT doc_id,
             CAST(coalesce(list_aggregate(list_transform(toks, w -> len(w)),
                                          'sum'), 0) AS BIGINT) AS word_chars
      FROM base),
    lx AS (SELECT doc_id, unnest(lines) AS line FROM base),
    lg AS (
      SELECT doc_id, {lh} AS lh, CAST(len(line) AS BIGINT) AS llen,
             count(*) AS c
      FROM lx GROUP BY 1, 2, 3),
    lstats AS (
      SELECT doc_id, sum(c) AS n_lines, sum(c * llen) AS line_chars,
             sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_lines,
             sum(CASE WHEN c >= 2 THEN c * llen ELSE 0 END) AS dup_line_chars
      FROM lg GROUP BY doc_id),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS g
      FROM base),
    g2g AS (
      SELECT doc_id, {gh2} AS gh, CAST(len(g) - 1 AS BIGINT) AS glen,
             count(*) AS c
      FROM g2 GROUP BY 1, 2, 3),
    top2 AS (SELECT doc_id, max(c * glen) AS top_2gram_chars FROM g2g
             GROUP BY doc_id),
    g3 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
      FROM base),
    g3g AS (
      SELECT doc_id, {gh3} AS gh, CAST(len(g) - 2 AS BIGINT) AS glen,
             count(*) AS c
      FROM g3 GROUP BY 1, 2, 3),
    dup3 AS (
      SELECT doc_id,
             sum(CASE WHEN c >= 2 THEN c * glen ELSE 0 END) AS dup_3gram_chars
      FROM g3g GROUP BY doc_id),
    j AS (
      SELECT w.doc_id, w.word_chars,
             coalesce(l.n_lines, 0) AS n_lines,
             coalesce(l.line_chars, 0) AS line_chars,
             coalesce(l.dup_lines, 0) AS dup_lines,
             coalesce(l.dup_line_chars, 0) AS dup_line_chars,
             coalesce(t.top_2gram_chars, 0) AS top2c,
             coalesce(d.dup_3gram_chars, 0) AS dup3c,
             greatest(w.word_chars, 1) AS wc,
             greatest(coalesce(l.n_lines, 0), 1) AS nl,
             greatest(coalesce(l.line_chars, 0), 1) AS lc
      FROM wchars w
      LEFT JOIN lstats l USING (doc_id)
      LEFT JOIN top2 t USING (doc_id)
      LEFT JOIN dup3 d USING (doc_id))
    SELECT doc_id, n_lines,
      ROUND(CAST(dup_lines AS DOUBLE) / nl, 6) AS dup_line_frac,
      ROUND(CAST(dup_line_chars AS DOUBLE) / lc, 6) AS dup_line_char_frac,
      ROUND(CAST(top2c AS DOUBLE) / wc, 6) AS top_2gram_char_frac,
      least(ROUND(CAST(dup3c AS DOUBLE) / wc, 6), 1.0) AS dup_3gram_char_frac,
      (dup_lines * {DUP_LINE_MAX[1]} <= nl * {DUP_LINE_MAX[0]}) AS ok_dup_lines,
      (dup_line_chars * {DUP_LINE_CHAR_MAX[1]} <= lc * {DUP_LINE_CHAR_MAX[0]})
        AS ok_dup_line_chars,
      (top2c * {TOP_2GRAM_CHAR_MAX[1]} <= wc * {TOP_2GRAM_CHAR_MAX[0]})
        AS ok_top_2gram,
      (dup3c * {DUP_3GRAM_CHAR_MAX[1]} <= wc * {DUP_3GRAM_CHAR_MAX[0]})
        AS ok_dup_3gram,
      ((dup_lines * {DUP_LINE_MAX[1]} <= nl * {DUP_LINE_MAX[0]})
       AND (dup_line_chars * {DUP_LINE_CHAR_MAX[1]} <= lc * {DUP_LINE_CHAR_MAX[0]})
       AND (top2c * {TOP_2GRAM_CHAR_MAX[1]} <= wc * {TOP_2GRAM_CHAR_MAX[0]})
       AND (dup3c * {DUP_3GRAM_CHAR_MAX[1]} <= wc * {DUP_3GRAM_CHAR_MAX[0]}))
        AS keep
    FROM j
    """
