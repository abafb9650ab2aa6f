"""Inverted-index construction: token -> (df, cf, posting list).

The retrieval-side complement of the corpus operators: TF-IDF
(`token_tfidf`) scores documents, the decontamination join probes
n-grams — this builds the actual index structure a search/RAG stack
serves from: per token, document frequency, collection frequency, and
the posting list of document ids.

Scale shape:
- Shuffle keys are the portable 60-bit token hash, never the token
  string (`functions/hashing.py` house rule); the display string is
  recovered as ``min(token)`` per hash (identical under the no-
  collision regime BOTH engines share, so even a collision agrees
  with the oracle).
- df/cf are plain map-side-combined aggregates.
- Posting lists are capped at the K SMALLEST doc ids (deterministic,
  and what a real impact-ordered index keeps per block). The naive
  spelling — collect_set per token — holds a stopword's entire
  corpus-sized posting set in one aggregation buffer; instead the
  min-K runs as a TWO-LEVEL tournament: row_number within
  (token, doc_id % SALTS) keeps K per salt shard (bounding any
  single sort partition to 1/SALTS of the hottest token), then a
  final row_number over the surviving <= SALTS*K rows per token.
  Same pattern as the distributed ranking operator
  (`operators/ranking.py`) — no corpus-sized single partition
  anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

POSTINGS_K = 8
SALTS = 16


def inverted_index(
    df: DataFrame,
    token_col: str,
    doc_col: str,
    k: int = POSTINGS_K,
    salts: int = SALTS,
) -> DataFrame:
    """Build the index from an exploded (token, doc_id) occurrence
    stream (duplicates = multiple occurrences; cf counts them all,
    df/postings de-duplicate)."""
    occ = df.select(
        portable_hash64(F.col(token_col)).alias("th"),
        F.col(token_col).alias("tok"),
        F.col(doc_col).alias("doc"),
    )
    stats = occ.groupBy("th").agg(
        F.min("tok").alias("token"),
        F.count("*").alias("cf"),
        F.count_distinct("doc").alias("df"),
    )
    pairs = occ.select("th", "doc").distinct()
    w1 = Window.partitionBy("th", F.col("doc") % salts).orderBy("doc")
    w2 = Window.partitionBy("th").orderBy("doc")
    topk = (
        pairs.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") <= k)
    )
    postings = topk.groupBy("th").agg(
        F.array_sort(F.collect_list("doc")).alias("postings")
    )
    return (
        stats.join(postings, "th")
        .select("token", "df", "cf", "postings")
    )


def inverted_index_oracle_sql(
    occurrences_sql: str, k: int = POSTINGS_K
) -> str:
    """DuckDB spelling over an ``occurrences_sql`` yielding (tok, doc)
    rows. The two-level tournament is equivalent to the K smallest
    distinct doc ids, which is what the oracle takes directly."""
    th = portable_hash64_sql("tok")
    return f"""
    WITH occ AS ({occurrences_sql}),
    h AS (SELECT {th} AS th, tok, doc FROM occ),
    stats AS (
      SELECT th, min(tok) AS token, count(*) AS cf,
             count(DISTINCT doc) AS df
      FROM h GROUP BY th),
    posts AS (
      SELECT th, list_sort(list(DISTINCT doc))[1:{k}] AS postings
      FROM h GROUP BY th)
    SELECT token, df, cf, postings
    FROM stats JOIN posts USING (th)
    """
