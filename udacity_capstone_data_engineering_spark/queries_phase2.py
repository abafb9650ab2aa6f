"""Phase-2 query tier: scalar-function coverage, SQL-entry operators,
temporal joins (as-of / range), statistics, TF-IDF, sketches.

Same contract as ``queries.py`` (which imports this module at the end
so everything lands in one registry). Determinism notes:
  - stddev/corr are computed from exact decimal moments, NOT the
    engines' streaming one-pass implementations (order-sensitive);
  - ln/exp results are rounded to 6 — libm ulp differences are real;
  - as-of join uses the union+window trick (one shuffle, no range
    explosion) — the standard scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.queries import (
    _TOKENS_SQL,
    _dec_avg_sql,
    _dec_sum_sql,
    _register,
)
from udacity_capstone_data_engineering_spark.operators.joins import equi_join
from udacity_capstone_data_engineering_spark.operators.windows import top_k_per_group
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)


@_register(
    "string_functions",
    """
    SELECT p_partkey,
           concat(p_brand, ':', p_type) AS brand_type,
           upper(substring(p_name, 1, 8)) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           strpos(p_type, 'BRUSHED') AS brushed_at,
           reverse(p_brand) AS brand_rev,
           trim(concat('  ', p_brand, '  ')) AS brand_trimmed
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    """Scalar string-function coverage (F-tier: the reference only used
    upper/lower, ``etl.py:212,218``)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_type", "BRUSHED").alias("brushed_at"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trimmed"
        ),
    )


@_register(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(floor(sqrt(l_extendedprice)) AS BIGINT) AS price_sqrt_floor,
           ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
           CAST(pow(l_quantity, 2) AS DOUBLE) AS qty_sq,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def math_functions(spark, sf_dir):
    """Scalar math coverage; ln rounded (libm ulp divergence across
    engines is real)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.sqrt("l_extendedprice")).alias("price_sqrt_floor"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@_register(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS INTEGER)) AS BIGINT) AS k_total,
           MIN(CAST(props ->> '$.k' AS INTEGER)) AS k_min,
           MAX(CAST(props ->> '$.k' AS INTEGER)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark, sf_dir):
    """Semi-structured column handling: JSON property extraction with
    builtin ``get_json_object`` (JVM-side), aggregated per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("k_total"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@_register(
    "grouping_sets_sql",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {_dec_sum_sql('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_sql(spark, sf_dir):
    """GROUPING SETS through the engine's SQL entry point (spark.sql) —
    the reference never used spark.sql; the engine treats SQL text as a
    first-class query surface (its cell-30 flagship was SQL text)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@_register(
    "deterministic_stats",
    """
    SELECT l_returnflag,
           n,
           ROUND(sqrt((sum_x2 - sum_x * sum_x / n_d) / (n_d - 1)), 6) AS price_stddev,
           ROUND((sum_xy - sum_x * sum_y / n_d)
                 / sqrt((sum_x2 - sum_x * sum_x / n_d)
                        * (sum_y2 - sum_y * sum_y / n_d)), 6) AS price_qty_corr
    FROM (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) AS n_d,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_y,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_x2,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_y2,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_xy
        FROM lineitem GROUP BY l_returnflag)
    """,
)
def deterministic_stats(spark, sf_dir):
    """stddev + correlation from exact decimal moments. The engines'
    built-in stddev/corr are streaming one-pass algorithms whose result
    depends on accumulation order — unusable for bit-stable results
    across partitionings; exact moments are order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    y = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("n_d"),
        F.sum(x).cast("double").alias("sum_x"),
        F.sum(y).cast("double").alias("sum_y"),
        F.sum(x * x).cast("double").alias("sum_x2"),
        F.sum(y * y).cast("double").alias("sum_y2"),
        F.sum(x * y).cast("double").alias("sum_xy"),
    )
    nd, sx, sy, sx2, sy2, sxy = (
        F.col("n_d"), F.col("sum_x"), F.col("sum_y"),
        F.col("sum_x2"), F.col("sum_y2"), F.col("sum_xy"),
    )
    nm1 = F.nullif(nd - 1, F.lit(0.0))  # 1-row group → NULL, not ANSI /0 raise
    var_x = (sx2 - sx * sx / nd) / nm1
    denom = F.nullif(F.sqrt((sx2 - sx * sx / nd) * (sy2 - sy * sy / nd)), F.lit(0.0))
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt(var_x), 6).alias("price_stddev"),
        F.round((sxy - sx * sy / nd) / denom, 6).alias("price_qty_corr"),
    )


@_register(
    "median_price_per_segment",
    """
    SELECT c_mktsegment,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def median_price_per_segment(spark, sf_dir):
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both use the (n-1)p linear-interpolation
    definition). At 100 TB swap to approx_percentile and drop the
    oracle to tolerance checks."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


@_register(
    "asof_join_purchase_view",
    """
    SELECT event_id, user_id, ts, prev_view_ts
    FROM (
        SELECT event_id, user_id, ts, is_purchase,
               MAX(CASE WHEN NOT is_purchase THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_view_ts
        FROM (
            SELECT event_id, user_id, epoch_us(ts) AS ts,
                   event_type = 'purchase' AS is_purchase
            FROM events WHERE event_type IN ('view', 'purchase')))
    WHERE is_purchase
    """,
)
def asof_join_purchase_view(spark, sf_dir):
    """AS-OF join (operator Spark lacks natively): each purchase matched
    to the user's most recent strictly-preceding view.

    Implemented with the union+window formulation — both streams in one
    partition-by-user sort, running MAX of view timestamps over the
    preceding frame — ONE shuffle, no range self-join, no row
    explosion. This is the 100-TB-safe shape for as-of semantics.
    Comparisons are exact integer micros (``unix_micros``), matching
    the oracle's ``epoch_us``."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.max(
        F.when(~F.col("is_purchase"), F.col("ts"))
    ).over(w)
    return (
        tagged.withColumn("prev_view_ts", prev_view)
        .filter("is_purchase")
        .select("event_id", "user_id", "ts", "prev_view_ts")
    )


@_register(
    "range_join_events_60s",
    """
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
    """,
)
def range_join_events_60s(spark, sf_dir):
    """Range (interval) join: same-user event pairs within 60 seconds.

    Spark has no native band join; the scalable formulation buckets
    time into window-width epochs and probes each row into its own and
    the NEXT bucket, turning the range join into an equi join on
    (user, bucket) + residual filter. Candidate count stays linear in
    events per (user, minute) instead of quadratic per user."""
    window_us = 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts"),
    )
    bucket = F.expr(f"ts DIV {window_us}")
    probes = ev.select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    build = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
        bucket.alias("bucket"),
    )
    return (
        probes.join(
            build,
            (probes.user_id == build.user_b) & (probes.bucket == build.bucket),
        )
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + window_us)
        )
        .select("id_a", "id_b", "user_id")
        .distinct()
    )


@_register(
    "token_tfidf",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
)
def token_tfidf(spark, sf_dir):
    """TF-IDF per (document, token): explode → two aggregations → join.
    Scale shape: tf aggregation is map-side-combinable; df is a
    distinct-agg over (token, doc) pairs; the final join broadcasts the
    vocabulary-sized df table."""
    # No fan_out_small_scan here: the explode's downstream aggregations
    # re-shuffle anyway, and the extra round-robin exchange is consumed
    # by BOTH the tf and df branches plus the scalar count — measured
    # 3.3x slower than letting the one-partition scan feed the shuffle.
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar: vocabulary-level constant
    return tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )


@_register("approx_distinct_users", None)  # sketch → rows-only check
def approx_distinct_users(spark, sf_dir):
    """HyperLogLog++ distinct-user sketch per event type, with the exact
    count alongside. Approximate ⇒ no hash oracle; the error bound is
    unit-tested per group at |approx−exact|/exact ≤ 3·rsd
    (``tests/test_round5_misc.py::test_approx_distinct_users_error_bound``).
    At 100 TB the sketch is mergeable across partitions (one pass, no
    distinct shuffle of raw user ids)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@_register(
    "exact_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def exact_distinct_users(spark, sf_dir):
    """Exact twin of ``approx_distinct_users`` so the distinct-count
    family has a hash-checked green row beside the structurally
    no-oracle HLL sketch (VERDICT r1 next-round #4). Spark plans this
    as expand + two-phase partial aggregation — the exact-distinct
    pattern that holds at scale without a raw-id shuffle per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@_register(
    "salted_skew_agg",
    f"""
    SELECT l_returnflag,
           {_dec_sum_sql('l_quantity', 'total_qty')},
           COUNT(*) AS n,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation for skewed group keys (l_returnflag
    has only 3 values — exactly the shape that concentrates reducers at
    100 TB). Results are provably identical to the plain groupBy, which
    is what the oracle checks; only the shuffle placement changes."""
    from udacity_capstone_data_engineering_spark.operators.skew import salted_group_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_group_agg(
        li,
        ["l_returnflag"],
        {
            "total_qty_dec": ("sum", "cast(l_quantity as decimal(18,2))"),
            "n": ("count", "1"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("total_qty_dec").cast("double").alias("total_qty"),
        "n",
        "max_price",
    )


@_register("embedding_ivf_topk", None)  # approximate → rows-only check
def embedding_ivf_topk(spark, sf_dir):
    """IVF ANN: k-means cells (deterministic seed) + nprobe search —
    the cluster-structure-exploiting scale path alongside hyperplane
    LSH. Approximate ⇒ recall asserted in tests, not hash equality."""
    from udacity_capstone_data_engineering_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, "vec_id", "embedding", k=5, nprobe=8)


@_register(
    "embedding_norms",
    """
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    """Vector-column scalar coverage: per-row L2 norm + dimensionality,
    all builtin higher-order functions."""
    from udacity_capstone_data_engineering_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("l2"),
        F.size("embedding").alias("dim"),
    )


@_register(
    "window_rank_family",
    """
    SELECT o_custkey, o_orderkey,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_family(spark, sf_dir):
    """The full ranking-window family: dense_rank, percent_rank, ntile,
    first_value/last_value with explicit frames (last_value needs the
    unbounded-following frame — default frames stop at current row)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@_register(
    "date_functions",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                AS INTEGER) AS days_to_2002
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    """Date-function coverage beyond the reference's parts extraction:
    truncation, quarter, month arithmetic (clamping semantics match
    across engines), last_day, datediff."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.trunc(d, "month").alias("order_month"),
        F.quarter(d).alias("q"),
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
    )


@_register(
    "null_semantics",
    """
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'error'), 'fallback') AS coalesced,
           NULLIF(event_type, 'error') IS DISTINCT FROM 'view' AS not_view,
           CASE WHEN NULLIF(event_type, 'error') IS NULL
                THEN 'was_error' ELSE 'ok' END AS null_branch
    FROM events
    """,
)
def null_semantics(spark, sf_dir):
    """NULL-handling semantics: coalesce/nullif/IS DISTINCT FROM — the
    three-valued-logic corners that silently corrupt cleaning pipelines
    when mishandled (the reference's QC inverted a boolean, §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    nulled = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        F.coalesce(nulled, F.lit("fallback")).alias("coalesced"),
        (~nulled.eqNullSafe(F.lit("view"))).alias("not_view"),
        F.when(nulled.isNull(), "was_error").otherwise("ok").alias("null_branch"),
    )


@_register(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark, sf_dir):
    """Pivot: order counts per priority × status, statuses as columns.
    Explicit value list — at scale an unlisted pivot triggers an extra
    distinct pass over the key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@_register(
    "unpivot_part_measures",
    """
    SELECT p_partkey, measure, value FROM (
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value
        FROM part)
    """,
)
def unpivot_part_measures(spark, sf_dir):
    """Unpivot (melt): wide measure columns → long (key, measure, value)
    rows — the normalization step feeding generic metric pipelines."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "measure", "value")


@_register(
    "regexp_operations",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_re,
           props LIKE '{"k"%' AS starts_like,
           regexp_matches(props, '[0-9]{2,}') AS has_2digits
    FROM events
    """,
)
def regexp_operations(spark, sf_dir):
    """Regex coverage: capture-group extraction, LIKE, rlike."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k_re"),
        F.col("props").like('{"k"%').alias("starts_like"),
        F.col("props").rlike("[0-9]{2,}").alias("has_2digits"),
    )


@_register(
    "nations_per_region_csv",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def nations_per_region_csv(spark, sf_dir):
    """collect_list → sort → join aggregation (string_agg semantics).
    Sorting before joining makes the collected order deterministic —
    collect_list order is partitioning-dependent otherwise."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = equi_join(nation, region, nation.n_regionkey == region.r_regionkey,
                  broadcast_right=True)
    return j.groupBy("r_name").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@_register(
    "revenue_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS bucket_min,
           MAX(o_totalprice) AS bucket_max
    FROM orders
    GROUP BY 1
    """,
)
def revenue_histogram(spark, sf_dir):
    """Histogram binning: fixed-width buckets as a computed group key —
    the one-pass distributed histogram shape (group on floor(x/w))."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("bucket_min"),
        F.max("o_totalprice").alias("bucket_max"),
    )


@_register(
    "monthly_revenue_rollup",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           {_dec_sum_sql('o_totalprice', 'revenue')},
           COUNT(DISTINCT o_custkey) AS active_customers
    FROM orders
    GROUP BY 1
    """,
)
def monthly_revenue_rollup(spark, sf_dir):
    """Time-series rollup (continuous-aggregate shape): monthly order
    counts, exact revenue, distinct actives. At 100 TB this is the
    materialized summary the fact table's month partitioning feeds
    (write_parquet partition_by + Pipeline materialize boundaries)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.countDistinct("o_custkey").alias("active_customers"),
    )


@_register(
    "embedding_dup_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))),
                 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])))) >= 0.4
    """,
)
def embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, EXACT tier: threshold
    self-join with bit-stable builtin vector math (left-to-right double
    accumulation == the oracle's). The LSH/IVF paths are the scale
    tier; this is their correctness baseline and the semantic dedup
    companion to shingle-Jaccard near-dup."""
    from udacity_capstone_data_engineering_spark.functions.vectors import (
        cosine_similarity,
    )
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        BROADCAST_SCORE_MAX_BYTES,
        _exact_cosine_kernel_pairs,
        _threshold_pairs_kernel,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # r11 perf (guide §2.3): the threshold kernel emits ONLY passing
    # ordered pairs from one Arrow scan — the n² pair stream and its
    # per-pair Arrow crossing are gone. The filter compares the same
    # UNROUNDED left-to-right double the pair kernel computed, so the
    # emitted set is exactly the filtered set (degenerate corpora fall
    # back to the r7 pair-kernel / expression plans below, whose NULL
    # semantics they need).
    fast = _threshold_pairs_kernel(emb, "vec_id", "embedding", 0.4)
    if fast is not None:
        return fast.select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.round("cosine_raw", 6).alias("cosine"),
        )
    # r7 perf, bit-identical floats: under the broadcast cap the pairs
    # score through the exact-accumulation Arrow kernel (left-to-right
    # dim loop == the JVM fold == the oracle's list_dot_product; the
    # threshold compares the UNROUNDED double, as the oracle does).
    head = emb.select(F.size("embedding").alias("d")).head()
    dim = int(head["d"]) if head is not None else 0
    n = emb.count()
    if dim > 0 and n * dim * 8 <= BROADCAST_SCORE_MAX_BYTES:
        scored = _exact_cosine_kernel_pairs(
            emb, "vec_id", "embedding", dim, ordered=True
        )
        return scored.filter(F.col("cosine_raw") >= 0.4).select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.round("cosine_raw", 6).alias("cosine"),
        )
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= 0.4)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


@_register(
    "upsert_orders_latest",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS total, 1 AS src
      FROM orders
    ), upd AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS total, 2 AS src
      FROM orders WHERE o_orderkey % 100 = 0
    ), merged AS (
      SELECT * FROM base UNION ALL SELECT * FROM upd
    )
    SELECT o_orderkey, o_orderstatus, total, src FROM merged
    QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) = 1
    """,
)
def upsert_orders_latest(spark, sf_dir):
    """Latest-wins upsert (MERGE INTO analogue): a simulated update
    batch (every 100th order flipped to status X) folded into the base
    with one key-shuffle; source rank is the precedence column."""
    from udacity_capstone_data_engineering_spark.operators.merge import (
        upsert_latest_wins,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("total"),
        F.lit(1).alias("src"),
    )
    upd = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            F.col("o_totalprice").cast("double").alias("total"),
            F.lit(2).alias("src"),
        )
    )
    return upsert_latest_wins(base, upd, ["o_orderkey"], ["src"])


def _split_fracs():
    return {"train": 0.8, "valid": 0.1, "test": 0.1}


def _split_oracle_sql():
    from udacity_capstone_data_engineering_spark.operators.sampling import (
        hash_split_case_sql,
    )

    case = hash_split_case_sql("doc_id", _split_fracs(), seed=7)
    return f"""
    SELECT doc_id, lang, {case} AS split FROM documents
    """


@_register("train_valid_test_split", _split_oracle_sql())
def train_valid_test_split(spark, sf_dir):
    """Deterministic 80/10/10 split by key hash: assignment is a pure
    function of doc_id, so it survives repartitioning, reruns, engine
    migration, and incremental appends (``operators/sampling.py``)."""
    from udacity_capstone_data_engineering_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(
        docs.select("doc_id", "lang"), "doc_id", _split_fracs(), seed=7
    )


@_register(
    "cap_docs_per_source_lang",
    """
    SELECT doc_id, source, lang, rnk FROM (
      SELECT doc_id, source, lang,
             row_number() OVER (PARTITION BY source, lang ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 5
    """,
)
def cap_docs_per_source_lang(spark, sf_dir):
    """Per-group document cap — 'at most N docs per (source, lang),
    longest first' — the curation diet that bounds any one domain's
    contribution to a training mix. One shuffle; the rank predicate is
    pushed into the shuffle as WindowGroupLimit."""
    docs = load_table(spark, sf_dir, "documents")
    return top_k_per_group(
        docs.select("doc_id", "source", "lang", "n_chars"),
        ["source", "lang"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        5,
    ).select("doc_id", "source", "lang", "rnk")


@_register(
    "normalized_docs",
    r"""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def normalized_docs(spark, sf_dir):
    """Canonical text normalization (lowercase, collapse whitespace,
    trim) — the step before any fingerprint/shingle so trivially-
    different bytes dedup together."""
    from udacity_capstone_data_engineering_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text("text").alias("norm_text"))


@_register(
    "source_mixing_weights",
    """
    SELECT source, n_docs,
           ROUND(sqrt(n_docs) / SUM(sqrt(n_docs)) OVER (), 6) AS weight
    FROM (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    """,
)
def source_mixing_weights(spark, sf_dir):
    """Training-mix weighting: per-source sampling weight proportional
    to n^0.5 — the standard temperature-style upweighting of small
    sources against head domains. Aggregate first (|sources| rows),
    then one single-partition window over that tiny result."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = Window.partitionBy()
    return counts.select(
        "source",
        "n_docs",
        F.round(
            F.sqrt(F.col("n_docs")) / F.sum(F.sqrt(F.col("n_docs"))).over(total), 6
        ).alias("weight"),
    )


@_register(
    "doc_length_trim",
    """
    WITH q AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN q ON d.lang = q.lang
    WHERE d.n_chars BETWEEN q.lo AND q.hi
    """,
)
def doc_length_trim(spark, sf_dir):
    """Quantile-based outlier trim: keep docs within their language's
    [p05, p95] length band — the curation filter that drops truncated
    fragments and runaway concatenations. The per-lang bounds table is
    |langs| rows → broadcast; the big side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.join(F.broadcast(q), "lang")
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "lang", "n_chars")
    )


@_register(
    "array_functions",
    f"""
    WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           list_contains(toks, 'the') AS has_the,
           toks[1:3] AS first3,
           list_aggregate(toks, 'max') AS max_token
    FROM t
    """,
)
def array_functions(spark, sf_dir):
    """Array/list scalar coverage: size, distinct, contains, slice, max
    — all JVM builtins over one bound token column (the HOF no-CSE rule:
    project the split ONCE, then reuse it)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique"),
        F.array_contains("toks", "the").alias("has_the"),
        F.slice("toks", 1, 3).alias("first3"),
        F.array_max("toks").alias("max_token"),
    )


@_register(
    "nations_per_region_array",
    """
    SELECT r.r_name, list_sort(array_agg(n.n_name)) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def nations_per_region_array(spark, sf_dir):
    """collect_list into a sorted array column (typed sibling of the
    string_agg query): collect order is nondeterministic under
    parallelism, so ``sort_array`` is mandatory for a stable result."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    )
    return joined.groupBy("r_name").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations")
    )


@_register(
    "sink_roundtrip_partitioned",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {_dec_sum_sql('o_totalprice', 'total_price')}
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderstatus
    """,
)
def sink_roundtrip_partitioned(spark, sf_dir):
    """S8 (parquet sink + partitionBy) under the oracle gate, end to
    end: write orders partitioned by o_orderstatus to a scratch dir,
    read the sink back, filter on the PARTITION column, aggregate. The
    oracle runs the same aggregate on the source table, so a sink that
    dropped/duplicated rows or mangled partition values hash-mismatches.
    The partition-column filter prunes directories at planning time
    (PartitionFilters — asserted in tests/test_plans.py), which is the
    property that makes partitioned layouts pay off at 100 TB."""
    import tempfile

    from udacity_capstone_data_engineering_spark.sources.sinks import write_parquet

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="spark_sink_gate_")
    path = write_parquet(
        orders, base, "orders_by_status", partition_by=["o_orderstatus"]
    )
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") != "P")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@_register(
    "ann_recall_report",
    """
    SELECT 'lsh' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivf' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'pq' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivfpq' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivf_auto' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivfpq_auto' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'lsh_jl' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivf_jl' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    UNION ALL
    SELECT 'ivfpq_standing' AS method,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    """,
)
def ann_recall_report(spark, sf_dir):
    """Recall of all four approximate ANN paths (LSH, IVF, PQ, IVF-PQ)
    vs the in-engine brute-force baseline, under the hash gate (VERDICT r1
    next-round #8): emits (method, n_pairs, recall_ok) with
    recall_ok = recall@5 >= 0.8 for the pinned-knob rows, plus two
    FULLY-AUTO rows (ivf_auto, ivfpq_auto) gated at the >= 0.9 the
    recall-targeted auto-sizing promises (VERDICT r3 #3).
    Everything is deterministic (md5 hyperplanes, seeded centroids), so
    the oracle's TRUE rows are a real check: if either path's recall
    ever drops below 0.8, the row flips false and the gate goes red.
    n_pairs doubles as a structural check that brute force yields
    exactly 5 neighbors per vector. Measured recall@5 on the test
    embeddings: LSH ~0.89 (16 tables), IVF ~0.96 (16 cells, nprobe 12).
    Intersections are computed with joins — sets never leave the JVM."""
    from udacity_capstone_data_engineering_spark.operators.ivf import ivf_topk
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # Build/serve split (VERDICT r10 #3): the exact truths are
    # PERSISTED session artifacts (``ann_exact_truth_build`` — the
    # build row pays the quadratic cost once per bench session; this
    # gate serves from parquet, build-if-absent outside the bench).
    # Truths are (id, id) integer pairs, so the round trip is
    # loss-free and every recall verdict is unchanged.
    from udacity_capstone_data_engineering_spark.queries_phase16 import (
        load_ann_exact_truth,
    )

    exact, exact_jl = load_ann_exact_truth(spark, sf_dir)

    def method_row(name, approx, bound=0.8):
        hits = exact.join(
            approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        ).agg(F.count(F.lit(1)).alias("hits"))
        tot = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        return hits.crossJoin(tot).select(
            F.lit(name).alias("method"),
            "n_pairs",
            (F.col("hits") / F.col("n_pairs") >= F.lit(bound)).alias("recall_ok"),
        )

    from udacity_capstone_data_engineering_spark.operators.pq import (
        ivfpq_topk,
        pq_topk,
    )

    lsh = lsh_topk(emb, "vec_id", "embedding", dim=64, k=5)
    ivf = ivf_topk(emb, "vec_id", "embedding", k=5, n_centroids=16, nprobe=12)
    pq = pq_topk(emb, "vec_id", "embedding", dim=64, k=5)
    ivfpq = ivfpq_topk(
        emb, "vec_id", "embedding", dim=64, k=5, n_centroids=16, nprobe=12
    )
    # AUTO-KNOB rows (VERDICT r3 #3): what a naive caller gets with
    # every knob defaulted — gated at the 0.9 the recall-targeted
    # auto-sizing promises (the old cells/4 default measured ~0.66
    # and would flip these rows false).
    ivf_auto = ivf_topk(emb, "vec_id", "embedding", k=5)
    ivfpq_auto = ivfpq_topk(emb, "vec_id", "embedding", dim=64, k=5)
    # JL-projected rows (VERDICT r6 #7): gate the COMPOSITION — each
    # kernel running on 16 JL dims must approximate EXACT search in
    # those same 16 dims at >= 0.9, the property the project_dims=
    # hook actually adds. The end-to-end question (does 16-dim
    # candidate generation + exact rerank retain the 64-dim top-5?)
    # is measured, not gated, because this corpus is the JL worst
    # case by construction: embeddings are isotropic-random, so
    # top-5 margins are O(1/sqrt(dim)) near-ties that NO 4x
    # projection preserves (measured capture of the 64-dim top-5
    # within the projected top-50: 0.48 @ 16d, 0.64 @ 32d, 0.72 @
    # 48d — sf0.01 sweep, SCALING.md r7). On real embedding corpora
    # (low-dim manifold structure) the same hook is the standard
    # cheap-candidates shape; here the gate pins what is provable.
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        jl_project,
    )

    proj = jl_project(emb, "vec_id", "embedding", 16).localCheckpoint(
        eager=True
    )

    def jl_row(name, approx, bound=0.9):
        hits = exact_jl.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        ).agg(F.count(F.lit(1)).alias("hits"))
        tot = exact_jl.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        return hits.crossJoin(tot).select(
            F.lit(name).alias("method"),
            "n_pairs",
            (F.col("hits") / F.col("n_pairs") >= F.lit(bound)).alias(
                "recall_ok"
            ),
        )

    lsh_jl = lsh_topk(proj, "vec_id", "embedding", dim=16, k=5)
    ivf_jl = ivf_topk(proj, "vec_id", "embedding", k=5)
    # ivfpq_standing (VERDICT r9 #7): the serve-from-artifact path in
    # the SAME hash-gated report everyone already watches, so index
    # staleness or an artifact-format regression flips a red row here,
    # not just in ann_standing_serve. Build-if-absent against the
    # shared per-session artifact (bench runs ann_index_build first,
    # so in the bench this is serve-only cost).
    import os as _os

    from udacity_capstone_data_engineering_spark.operators.ann_index import (
        ann_topk_against_index,
        build_ann_index,
    )
    from udacity_capstone_data_engineering_spark.queries_phase12 import (
        artifact_base,
    )

    standing_base = artifact_base(spark, sf_dir, "ann_index")
    if not _os.path.exists(_os.path.join(standing_base, "meta")):
        build_ann_index(
            emb, "vec_id", "embedding", 64, standing_base, m=8, ksub=256
        )
    ivfpq_standing = ann_topk_against_index(
        emb, "vec_id", "embedding", standing_base, k=5
    )
    return (
        method_row("lsh", lsh)
        .unionAll(method_row("ivf", ivf))
        .unionAll(method_row("pq", pq))
        .unionAll(method_row("ivfpq", ivfpq))
        .unionAll(method_row("ivf_auto", ivf_auto, bound=0.9))
        .unionAll(method_row("ivfpq_auto", ivfpq_auto, bound=0.9))
        .unionAll(jl_row("lsh_jl", lsh_jl))
        .unionAll(jl_row("ivf_jl", ivf_jl))
        .unionAll(method_row("ivfpq_standing", ivfpq_standing, bound=0.9))
    )
