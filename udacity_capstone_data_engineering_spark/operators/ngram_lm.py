"""Corpus bigram language model scoring: the CCNet-style perplexity
quality filter, as pure relational algebra.

The standard LLM-corpus quality gate the repo did not yet have: train
an n-gram LM on the corpus itself and score every document by its
average token log-probability — documents whose token sequences are
unlike the corpus (mojibake, boilerplate soup, wrong language) score
low and get filtered. CCNet does this with a KenLM 5-gram; the
relational core is identical at any order, so this ships the bigram
instance with add-one (Laplace) smoothing:

    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V)

with V the corpus unigram vocabulary size and c(w1,·) the total
bigram occurrences starting with w1. Doc score = mean log P over the
doc's bigram positions.

Determinism contract (house rules): each distinct (w1, w2) pair's
log-probability is rounded to 9 decimals, quantized to exact BIGINT
1e-9 units, and multiplied by the doc's exact occurrence count BEFORE
the per-doc sum — order-independent integer arithmetic, hash-gated
against the DuckDB oracle (the `bm25_topk_docs` ln/DECIMAL
precedent). The final mean is ALSO exact: ROUND(sum/nb, 6) on
doubles is engine-divergent when the quotient lands within an ulp of
a x.xxxxxx5 tie (measured: 3 of 5000 docs at sf0.1 flipped between
Spark HALF_UP and DuckDB), so the average is rounded to 6 decimals
in pure integer arithmetic — half-away-from-zero via the same
pmod floor-division spell the integer k-means oracle uses — and only
the final exact 1e-6-grid value is converted to double.

Scale shape (the 100 TB story):
- bigram occurrences are reduced to per-doc (doc, w1, w2, m) counts
  map-side before any join — the join input is distinct-bigram-sized
  per doc, not token-stream-sized;
- the model tables c(w1,w2) and c(w1,·) are grouped aggregates of
  that same relation (shuffles keyed on the gram, partial combine);
- V is a 1-row scalar aggregate entering via broadcast (the
  documented BNLJ-over-one-row pattern);
- everything downstream is hash equi-joins on gram keys + one
  doc-keyed aggregation. No UDFs, no driver loops, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from udacity_capstone_data_engineering_spark.functions.fixedpoint import (
    exact_round_div,
    exact_round_div_sql,
)
from udacity_capstone_data_engineering_spark.functions.text import tokens

LOGP_DECIMALS = 9
SCORE_DECIMALS = 6


def bigram_lm_scores(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document average bigram log-probability under the corpus
    add-one bigram LM. Returns ``(id_col, n_bigrams, avg_logp)`` for
    every document; docs with < 2 tokens carry ``n_bigrams = 0`` and a
    NULL score (nothing to score, still visible to the quality gate).
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != "").alias("arr"),
    )
    # per-doc bigram multiplicities: the ONLY token-stream-sized stage,
    # and it is a map+groupBy reduced before every join below
    occ = (
        toks.select(
            "doc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("arr") - 1),
                    lambda i: F.struct(
                        F.element_at("arr", i).alias("w1"),
                        F.element_at("arr", i + 1).alias("w2"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc", "g.w1", "g.w2")
        .groupBy("doc", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    cb = occ.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = toks.select(F.explode("arr").alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    # exact BIGINT 1e-9 units per distinct gram (round-9 -> decimal ->
    # integer; the decimal hop pins the double-to-9-decimals conversion
    # to the engines' shared behavior)
    logp_units = (
        F.round(
            F.log((F.col("cb") + 1) / (F.col("cu") + F.col("v"))), LOGP_DECIMALS
        )
        .cast(f"decimal(18,{LOGP_DECIMALS})")
        * F.lit(10**LOGP_DECIMALS)
    ).cast("long")
    scored = (
        occ.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc", "m", (logp_units * F.col("m")).alias("lp"))
        .groupBy("doc")
        .agg(F.sum("m").alias("nb"), F.sum("lp").alias("slp"))
    )
    # exact fixed-point mean at 6 decimals, half-away-from-zero
    # (functions/fixedpoint.py — the divide-then-round hazard fix)
    q = exact_round_div(
        F.col("slp"), F.col("nb"), LOGP_DECIMALS - SCORE_DECIMALS
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("doc"), "left")
        .select(
            id_col,
            F.coalesce(F.col("nb"), F.lit(0)).alias("n_bigrams"),
            (q.cast("double") / F.lit(float(10**SCORE_DECIMALS))).alias(
                "avg_logp"
            ),
        )
    )


def bigram_lm_oracle_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """The same model in DuckDB SQL (natural log both sides; round-9
    DECIMAL quantization before the order-sensitive sum)."""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc,
             list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'),
                         t -> t <> '') AS arr
      FROM {table}),
    occ AS (
      SELECT doc, g['w1'] AS w1, g['w2'] AS w2, count(*) AS m FROM (
        SELECT doc,
               unnest(list_transform(range(1, len(arr)),
                   i -> {{'w1': arr[i], 'w2': arr[i + 1]}})) AS g
        FROM toks)
      GROUP BY 1, 2, 3),
    cb AS (SELECT w1, w2, sum(m) AS cb FROM occ GROUP BY 1, 2),
    cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT t) AS v FROM (
        SELECT unnest(arr) AS t FROM toks)),
    scored AS (
      SELECT occ.doc, sum(occ.m) AS nb,
             sum(CAST(CAST(CAST(ROUND(
                     ln((cb.cb + 1) / CAST(cu.cu + vocab.v AS DOUBLE)),
                     {LOGP_DECIMALS}) AS DECIMAL(18,{LOGP_DECIMALS}))
                   AS DECIMAL(28,{LOGP_DECIMALS}))
                 * {10**LOGP_DECIMALS} AS BIGINT)
                 * occ.m) AS slp
      FROM occ JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vocab
      GROUP BY 1)
    SELECT d.{id_col},
           CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams,
           CAST({exact_round_div_sql("s.slp", "s.nb",
                                     LOGP_DECIMALS - SCORE_DECIMALS)}
                AS DOUBLE) / {float(10**SCORE_DECIMALS)} AS avg_logp
    FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.doc
    """
