"""Phase-4 query tier (round 2, continued): SimHash Hamming-banded
near-dup pairs, multi-join TPC-H classics (Q3 / Q5 shapes), and an
approx-percentile error-bound report.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry). House determinism rules apply:
decimal-cast sums for money aggregation, unique tiebreakers under every
LIMIT/rank, portable md5-derived hashing for oracle-reproducible hashes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.dedup import (
    simhash,
    simhash_near_dup_pairs,
)
from udacity_capstone_data_engineering_spark.queries import (
    _dec_sum_sql,
    _register,
    _simhash_sql,
)
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Dedup: SimHash near-dup pairs (Hamming-banded bucket join)
# ---------------------------------------------------------------------------


@_register(
    "simhash_near_dup_pairs",
    f"""
    WITH sig AS ({_simhash_sql()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_near_dup_pairs_docs(spark, sf_dir):
    """SimHash near-dup PAIRS, not just signatures: band the 32-bit
    signature into 4 disjoint 8-bit slices, bucket-join on
    (band, slice), verify with ``bit_count(xor)``. By pigeonhole, any
    pair at Hamming distance <= 3 agrees exactly on some slice, so the
    banded join is guaranteed-complete and the all-pairs oracle is an
    exact match — unlike MinHash-LSH, whose banding is probabilistic.
    One shuffle on the band key; pairs enumerated JVM-side in-bucket
    (``operators/dedup.py:simhash_near_dup_pairs``)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    sigs = simhash(docs, "text", "doc_id", bits=32)
    return simhash_near_dup_pairs(
        sigs, "doc_id", bits=32, bands=4, max_hamming=3
    )


# ---------------------------------------------------------------------------
# Relational: TPC-H Q3 / Q5 shapes (multi-join showcase)
# ---------------------------------------------------------------------------

_Q3_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))"
    " AS DOUBLE)"
)


def _disc_revenue():
    """Exact decimal discounted revenue (order-independent sum)."""
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    ).cast("double")


@_register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {_Q3_REVENUE_SQL} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈
    orders ⋈ lineitem, discounted-revenue group-agg, top 10. The date
    and segment filters push into all three parquet scans. Join
    strategy at 100 TB: customer and orders both SCALE with the data,
    so neither is hint-broadcast — orders⋈customer shuffles on custkey,
    then meets lineitem in a shuffle on the orderkey; the group-agg
    keys lead with l_orderkey, the same key the join just partitioned
    by, so no third exchange. At test SF, AQE converts both joins to
    broadcast on its own — that decision belongs to the runtime, not a
    hint that would OOM at scale. Final top-10 is
    TakeOrderedAndProject, never a global sort; tiebreak l_orderkey
    keeps the LIMIT deterministic."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = li.join(
        orders.join(cust, orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_disc_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@_register(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name, {_Q3_REVENUE_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): six-table join where the
    customer and the supplier must share a nation inside one region,
    revenue per nation for one order year. Join strategy for 100 TB:
    region (5 rows) and nation (25 rows) are FIXED-size — broadcast
    them explicitly into supplier, which stays distributed (supplier
    and customer both scale with the data, so no hint there). The two
    fact tables (orders filtered to one year, lineitem) meet in a
    shuffle on the orderkey; customer and the region-filtered supplier
    attach via key joins that AQE turns into broadcasts at small SF and
    leaves as shuffles at scale. The c_nationkey = s_nationkey equality
    rides on the supplier join condition, so mismatched-nation rows die
    in the join, not in a post-filter."""
    year_lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    year_hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= year_lo) & (F.col("o_orderdate") < year_hi))
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Dimension chain: region -> nation -> supplier (all broadcast).
    local_supp = supp.join(
        F.broadcast(
            nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        ),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    fact = orders.join(li, orders.o_orderkey == li.l_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    joined = fact.join(
        local_supp,
        (fact.l_suppkey == local_supp.s_suppkey)
        & (fact.c_nationkey == local_supp.s_nationkey),
    )
    return joined.groupBy("n_name").agg(_disc_revenue().alias("revenue"))


# ---------------------------------------------------------------------------
# Approximate aggregation: percentile sketch with error-bound report
# ---------------------------------------------------------------------------


@_register(
    "approx_quantile_report",
    """
    SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound
    FROM (VALUES (0.5), (0.9), (0.99)) t(q)
    """,
)
def approx_quantile_report(spark, sf_dir):
    """``approx_percentile`` (Greenwald-Khanna sketch — mergeable, one
    pass, no global sort) with its error bound CHECKED in-engine, under
    the hash gate like ``ann_recall_report``: for each q, the sketch's
    answer must sit within rank q*n ± n/accuracy (+1 for ties). The
    oracle's constant TRUE rows are a real check — a sketch regression
    flips the row and the gate goes red. The exact-rank verify is a
    count-below-value aggregate, not a sort."""
    acc = 10_000
    qs = [0.5, 0.9, 0.99]
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    sk = li.agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array({','.join(map(str, qs))}), {acc})"
        ).alias("vals"),
        F.count(F.lit(1)).alias("n"),
    )
    per_q = sk.select(
        F.posexplode("vals").alias("i", "val"), "n"
    ).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("i") + 1).alias("q"),
        "val",
        "n",
    )
    # rank(val) in the full column, via a broadcast of the 3 picked values.
    ranks = li.join(F.broadcast(per_q)).groupBy("q", "val", "n").agg(
        F.sum(F.when(F.col("l_extendedprice") < F.col("val"), 1).otherwise(0)).alias(
            "below"
        ),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("val"), 1).otherwise(0)).alias(
            "at_or_below"
        ),
    )
    tol = F.col("n") / F.lit(acc) + F.lit(1)
    target = F.col("q") * F.col("n")
    ok = (F.col("below") - tol <= target) & (target <= F.col("at_or_below") + tol)
    return ranks.select(F.col("q").cast("double").alias("q"), ok.alias("within_bound"))


# ---------------------------------------------------------------------------
# Text quality: Gopher-style document filter rules
# ---------------------------------------------------------------------------

_EN_STOPWORDS_SQL = "'" + "','".join(
    ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]
) + "'"

_GOPHER_SQL = f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
        len(toks) AS n_words,
        list_aggregate(list_transform(toks, w -> len(w)), 'sum') AS sum_len,
        len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
        (len(text) - len(replace(text, '#', '')))
          + CAST(floor((len(text) - len(replace(text, '...', ''))) / 3) AS BIGINT)
          AS symbols,
        len(list_filter(toks, w -> list_contains([{_EN_STOPWORDS_SQL}], lower(w))))
          AS stop_hits,
        len(lines) AS n_lines,
        len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))
          AS bullet_lines,
        len(list_filter(lines, l -> l LIKE '%...')) AS ellipsis_lines
      FROM t)
    SELECT doc_id, n_words,
      ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) AS mean_word_len,
      (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
      (ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) >= 3
       AND ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) <= 10) AS ok_mean_word_len,
      (CAST(symbols AS DOUBLE) / n_words <= 0.1) AS ok_symbol_ratio,
      (CAST(alpha_words AS DOUBLE) / n_words >= 0.8) AS ok_alpha_words,
      (stop_hits >= 2) AS ok_stopwords,
      (CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9
       AND CAST(ellipsis_lines AS DOUBLE) / n_lines <= 0.3) AS ok_line_format,
      ((n_words >= 50 AND n_words <= 100000)
       AND (ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) >= 3
            AND ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) <= 10)
       AND (CAST(symbols AS DOUBLE) / n_words <= 0.1)
       AND (CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
       AND (stop_hits >= 2)
       AND (CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9
            AND CAST(ellipsis_lines AS DOUBLE) / n_lines <= 0.3)) AS keep
    FROM m
"""


@_register("gopher_quality_flags", _GOPHER_SQL)
def gopher_quality_flags_docs(spark, sf_dir):
    """Gopher-rule document quality flags (word count, mean word
    length, symbol ratio, alpha fraction, stopword floor, line format)
    with the combined keep decision — the standard first-pass filter of
    an LLM data pipeline, as a map-only codegen stage
    (``functions/text.py:gopher_quality_flags``)."""
    from udacity_capstone_data_engineering_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return gopher_quality_flags(docs, "text", "doc_id")
