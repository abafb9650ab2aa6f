"""Phase-3 query tier (round 2): exact set-similarity join, winnowing
fingerprints, BPE-style pre-tokenization, multimodal frame-sample /
resize plumbing, bucketed co-located joins, embedding centroids, and
stratified sampling.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry). Determinism notes follow the
established house rules: portable md5-derived hashing for anything an
oracle must reproduce, decimal-cast sums for cross-row float
aggregation, ROUND(..., 6) at result edges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.queries import (
    NEAR_DUP_THRESHOLD,
    _SHINGLES_SQL,
    _dec_sum_sql,
    _register,
)
from udacity_capstone_data_engineering_spark.sources.catalog import (
    event_timestamp,
    fan_out_small_scan,
    load_table,
)

# ---------------------------------------------------------------------------
# Dedup: exact n-gram Jaccard similarity join (prefix-filtered)
# ---------------------------------------------------------------------------

_HASHSET_SQL = (
    "list_distinct(list_transform(shset,"
    " s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)))"
)


@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shset FROM documents),
    hs AS (SELECT doc_id, {_HASHSET_SQL} AS hset FROM sh),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.hset, b.hset)) AS inter,
                  len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset)) AS uni
           FROM hs a JOIN hs b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / greatest(uni, 1), 6) AS jaccard
    FROM pr
    WHERE ROUND(CAST(inter AS DOUBLE) / greatest(uni, 1), 6)
          >= {NEAR_DUP_THRESHOLD}
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """EXACT n-gram Jaccard near-dup pairs via prefix filtering
    (``operators/jaccard.py``) — the guaranteed-complete counterpart to
    ``near_dup_minhash_lsh`` (which can only miss pairs, never invent
    them). The oracle is the naive all-pairs join, so this row going
    green proves the prefix filter generates a candidate superset (no
    false negatives) AND the verify pass is exact. Scale shape: one
    self-equi-join on prefix shingle hashes instead of a corpus cross
    join."""
    from udacity_capstone_data_engineering_spark.operators.jaccard import (
        jaccard_similarity_join,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return jaccard_similarity_join(
        docs, "text", "doc_id", threshold=NEAR_DUP_THRESHOLD, shingle_k=5
    )


# ---------------------------------------------------------------------------
# Dedup: winnowing (rolling-hash) fingerprints
# ---------------------------------------------------------------------------


@_register(
    "winnow_fingerprints_docs",
    r"""
    WITH nt AS (SELECT doc_id,
                       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN strlen(t) - 7 < 1 THEN CAST([] AS BIGINT[])
                      ELSE list_transform(range(1, strlen(t) - 7 + 1),
                            i -> CAST('0x' || substr(
                                   md5(substring(t, CAST(i AS INT), 8)),
                                   1, 15) AS BIGINT))
                 END AS gh
          FROM nt),
    w AS (SELECT doc_id,
                 CASE WHEN len(gh) - 3 < 1 THEN CAST([] AS BIGINT[])
                      ELSE list_distinct(list_transform(
                             range(1, len(gh) - 3 + 1),
                             j -> list_min(gh[CAST(j AS INT):CAST(j + 3 AS INT)])))
                 END AS fps
          FROM g)
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
)
def winnow_fingerprints_docs(spark, sf_dir):
    """Winnowing fingerprints (rolling k-gram hash + per-window minimum,
    the MOSS algorithm) over normalized document text — the
    partial-overlap detector that exact fingerprints and shingle
    Jaccard both miss. Map-only per-row stage; the exploded (doc, fp)
    rows feed the same groupBy-fingerprint machinery as exact dedup."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return winnow_fingerprints(docs, "text", "doc_id", k=8, window=4)


# ---------------------------------------------------------------------------
# Text: BPE-style pre-tokenization statistics
# ---------------------------------------------------------------------------


@_register(
    "bpe_pretoken_stats",
    r"""
    SELECT event_id,
           CAST(len(regexp_extract_all(props,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER)
               AS n_pretokens,
           CAST(len(regexp_extract_all(props, ' ?[A-Za-z]+')) AS INTEGER)
               AS n_word_runs,
           CAST(len(regexp_extract_all(props, ' ?[0-9]+')) AS INTEGER)
               AS n_digit_runs
    FROM events
    """,
)
def bpe_pretoken_stats(spark, sf_dir):
    """BPE-ish token counting (``functions/text.py:bpe_pretokens``) on
    punctuation-rich text (the events JSON props): the pre-merge
    segmentation a byte-pair tokenizer applies, which approximates LLM
    token budgets far better than whitespace counts on code/JSON. The
    pattern avoids lookaheads so Java regex (Spark) and RE2 (oracle)
    agree. All JVM-side regexp builtins."""
    from udacity_capstone_data_engineering_spark.functions.text import bpe_pretokens

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.size(bpe_pretokens("props")).alias("n_pretokens"),
        F.size(F.regexp_extract_all("props", F.lit(r" ?[A-Za-z]+"), 0)).alias(
            "n_word_runs"
        ),
        F.size(F.regexp_extract_all("props", F.lit(r" ?[0-9]+"), 0)).alias(
            "n_digit_runs"
        ),
    )


# ---------------------------------------------------------------------------
# Multimodal: frame sampling + nearest-neighbor resize (mapInPandas)
# ---------------------------------------------------------------------------


@_register(
    "multimodal_frame_sample",
    # Payloads are UTF-8 bytes of ASCII text, so the oracle reproduces
    # the byte slicing with string substring + md5 exactly.
    """
    WITH f AS (SELECT doc_id, strlen(text) // 16 AS nf, text FROM documents),
    idx AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS i FROM f)
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           md5(substring(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_md5
    FROM idx
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling over opaque binary payloads
    (``operators/multimodal.py:sample_frames``): slice each payload
    into 16-byte frames, keep every 4th, emit content hashes — via
    Arrow-batched ``mapInPandas`` with bounded per-worker batches. The
    oracle recomputes every kept frame's hash, so the gate checks the
    full decode-free plumbing (offsets, batch boundaries, partial-frame
    truncation) bit-exactly."""
    from udacity_capstone_data_engineering_spark.operators.multimodal import (
        sample_frames,
    )

    # No fan_out_small_scan: the per-row work here is light, and at
    # small sf the per-partition Python-worker spinup + shuffle cost
    # more than the parallelism gains (measured 0.32s -> 0.54s). A real
    # payload corpus arrives in many files and parallelizes at the scan.
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(payloads, "payload", "doc_id", frame_bytes=16, every=4)


@_register(
    "multimodal_resize_nearest",
    """
    SELECT doc_id,
           CAST(r AS INTEGER) AS out_row,
           CAST(c AS INTEGER) AS out_col,
           ascii(substring(text, CAST(r * 32 + c * 2 + 1 AS INT), 1)) AS pixel
    FROM (SELECT doc_id, text FROM documents WHERE strlen(text) >= 256) d,
         range(8) t1(r), range(8) t2(c)
    """,
)
def multimodal_resize_nearest(spark, sf_dir):
    """Image resize plumbing (``operators/multimodal.py:resize_nearest``):
    treat the first 256 payload bytes as a 16x16 row-major grayscale
    image and downsample 2x by nearest neighbor — vectorized numpy
    strided slicing inside Arrow batches; payloads too short for a full
    image produce no rows. Output pixel (r,c) = input byte at
    (2r, 2c), which the oracle reproduces with substring+ascii on the
    ASCII source text."""
    from udacity_capstone_data_engineering_spark.operators.multimodal import (
        resize_nearest,
    )

    # See multimodal_frame_sample for why this scan is not fanned out.
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return resize_nearest(
        payloads, "payload", "doc_id", width=16, height=16, factor=2
    )


# ---------------------------------------------------------------------------
# Co-located bucketed join (S8/S9 scale lever)
# ---------------------------------------------------------------------------


@_register(
    "bucketed_join_coloc",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n_items,
           {_dec_sum_sql('l_extendedprice', 'revenue')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def bucketed_join_coloc(spark, sf_dir):
    """Bucketed co-located join under the oracle gate: write lineitem
    and orders bucketed 8 ways on the join key (sorted within buckets),
    read both back from the catalog, and sort-merge-join WITHOUT a
    shuffle on either side (asserted in tests/test_plans.py — zero
    Exchange under the join). This is the recurring-join layout that
    deletes both full-table shuffles at 100 TB; the oracle aggregate
    over the source tables proves the bucketed write+read is lossless.
    The merge hint pins SMJ so the demonstration doesn't degrade to a
    broadcast at small sf."""
    import tempfile

    from udacity_capstone_data_engineering_spark.sources.sinks import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    base = tempfile.mkdtemp(prefix="spark_bucket_gate_")
    spark.sql("DROP TABLE IF EXISTS bucketed_orders_gate")
    spark.sql("DROP TABLE IF EXISTS bucketed_lineitem_gate")
    write_bucketed(
        orders, "bucketed_orders_gate", ["o_orderkey"], 8,
        sort_by=["o_orderkey"], path=f"{base}/orders",
    )
    write_bucketed(
        lineitem, "bucketed_lineitem_gate", ["l_orderkey"], 8,
        sort_by=["l_orderkey"], path=f"{base}/lineitem",
    )
    o = spark.table("bucketed_orders_gate")
    li = spark.table("bucketed_lineitem_gate")
    j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Embeddings: per-label centroids (array-column aggregation)
# ---------------------------------------------------------------------------


@_register(
    "label_centroids",
    """
    SELECT label, CAST(i AS INTEGER) AS idx,
           ROUND(CAST(SUM(CAST(ROUND(CAST(embedding[CAST(i + 1 AS INT)]
                                          AS DOUBLE), 9)
                               AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid,
           COUNT(*) AS n_vecs
    FROM embeddings, range(64) t(i)
    GROUP BY label, i
    """,
)
def label_centroids(spark, sf_dir):
    """Per-label embedding centroids: posexplode the vector column and
    aggregate per (label, dimension). Cross-row float sums are order-
    dependent, so elements are rounded then summed as decimals (exact,
    order-independent) before the final double mean — the recipe that
    keeps a 1000-executor result hash-identical to any oracle. Shuffle
    carries |labels| x dim partial aggregates, not vectors (map-side
    combine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("idx", "v"),
    )
    return e.groupBy("label", "idx").agg(
        F.round(
            F.sum(F.round(F.col("v"), 9).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# Sampling: stratified deterministic sample
# ---------------------------------------------------------------------------

_STRATA_FRACTIONS = {"en": 0.5, "es": 0.25, "fr": 0.1}


def _stratified_oracle_sql():
    from udacity_capstone_data_engineering_spark.operators.sampling import (
        stratified_sample_where_sql,
    )

    pred = stratified_sample_where_sql(
        "doc_id", "lang", _STRATA_FRACTIONS, seed=11, default_fraction=0.05
    )
    return f"SELECT doc_id, lang, source FROM documents WHERE {pred}"


@_register("stratified_sample_docs", _stratified_oracle_sql())
def stratified_sample_docs(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep fractions
    (en 50%, es 25%, fr 10%, others 5%) decided by the portable key
    hash — the `sampleBy` shape made reproducible across runs, engines,
    and repartitioning (``operators/sampling.py:stratified_sample``).
    Shuffle-free: the threshold is a CASE over the stratum column."""
    from udacity_capstone_data_engineering_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang", "source"),
        "doc_id",
        "lang",
        _STRATA_FRACTIONS,
        seed=11,
        default_fraction=0.05,
    )


# ---------------------------------------------------------------------------
# SQL entry: correlated subqueries (Catalyst decorrelation)
# ---------------------------------------------------------------------------


@_register(
    "correlated_subqueries",
    """
    SELECT c_custkey, c_mktsegment,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000) AS has_big_order
    FROM customer c
    """,
)
def correlated_subqueries(spark, sf_dir):
    """Correlated scalar + EXISTS subqueries through the SQL entry.
    Catalyst decorrelates both into joins (scalar COUNT becomes a
    left-joined aggregate, EXISTS a left-semi probe) — the rewrite that
    makes per-row-looking SQL run as two set-based joins instead of
    |customer| nested scans at 100 TB."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_cs")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT COUNT(*) FROM orders_cs o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               EXISTS(SELECT 1 FROM orders_cs o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000) AS has_big_order
        FROM cust_cs c
        """
    )


# ---------------------------------------------------------------------------
# Time-series gap fill + forward fill
# ---------------------------------------------------------------------------


@_register(
    "events_gap_fill",
    """
    WITH agg AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events WHERE user_id < 10 GROUP BY 1, 2
    ), b AS (
      SELECT user_id, min(h) AS mn, max(h) AS mx FROM agg GROUP BY 1
    ), hours AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM b
    )
    SELECT hours.user_id, hours.h,
           agg.v AS raw_v,
           last_value(agg.v IGNORE NULLS)
               OVER (PARTITION BY hours.user_id ORDER BY hours.h) AS filled_v
    FROM hours LEFT JOIN agg
      ON hours.user_id = agg.user_id AND hours.h = agg.h
    """,
)
def events_gap_fill(spark, sf_dir):
    """Time-series gap fill (the hypertable/continuous-aggregate shape):
    per-user hourly sums, a dense hour spine generated per user with
    ``sequence`` (no calendar table, no cross join), left-join the
    sparse aggregates onto the spine, then forward-fill gaps with
    ``last(..., ignorenulls)`` over an unbounded-preceding frame. Two
    shuffles total (the agg and the spine join share the user_id key;
    the window reuses the join's partitioning)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_utc", event_timestamp("ts")
    )
    agg = (
        ev.filter(F.col("user_id") < 10)
        .groupBy(
            "user_id", F.date_trunc("hour", "ts_utc").alias("h")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    )
    spine = (
        agg.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    from pyspark.sql import Window

    joined = spine.join(agg, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "h",
        F.col("v").alias("raw_v"),
        F.last("v", ignorenulls=True).over(w).alias("filled_v"),
    )


# ---------------------------------------------------------------------------
# Data layout: Z-order (Morton) keys
# ---------------------------------------------------------------------------


def _zorder_oracle_sql():
    from udacity_capstone_data_engineering_spark.functions.zorder import (
        morton_code_sql,
    )

    z = morton_code_sql("p_size", "p_partkey % 256", bits=8)
    return f"SELECT p_partkey, p_size, {z} AS zval FROM part"


@_register("zorder_layout_keys", _zorder_oracle_sql())
def zorder_layout_keys(spark, sf_dir):
    """Z-order (Morton) layout keys (``functions/zorder.py``): bit-
    interleave two quantized dimensions so sorting by the code before a
    partitioned write gives every output file a compact 2-D rectangle —
    2-D range predicates then prune files from parquet footer stats
    alone (measured in tests/test_round2_operators.py::TestZOrder:
    z-sorted layout overlaps strictly fewer files than a 1-D sort for
    the same box query). Pure JVM bit arithmetic."""
    from udacity_capstone_data_engineering_spark.functions.zorder import morton_code

    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_size",
        morton_code(F.col("p_size"), F.col("p_partkey") % 256, bits=8).alias(
            "zval"
        ),
    )


# ---------------------------------------------------------------------------
# Warehouse: SCD Type-2 dimension builder
# ---------------------------------------------------------------------------


@_register(
    "scd2_customer_status",
    """
    WITH v AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS eff_date, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                                ORDER BY o_orderkey DESC) AS rn
      FROM orders
    ), d AS (SELECT o_custkey, eff_date, o_orderstatus FROM v WHERE rn = 1)
    SELECT o_custkey, o_orderstatus AS status, eff_date AS valid_from,
           lead(eff_date) OVER (PARTITION BY o_custkey ORDER BY eff_date)
               AS valid_to,
           lead(eff_date) OVER (PARTITION BY o_custkey ORDER BY eff_date)
               IS NULL AS is_current
    FROM d
    """,
)
def scd2_customer_status(spark, sf_dir):
    """Slowly-changing-dimension Type 2 builder: collapse a change
    stream (latest change per key per day wins) into validity intervals
    with ``lead`` — [valid_from, valid_to) rows plus an is_current
    flag. This is the star-schema dimension-maintenance operator the
    reference's monthly-batch design implies but never wrote
    (notebook cell 45 proposes monthly refresh). One shuffle on the
    dimension key; both windows share its partitioning."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    wd = Window.partitionBy("o_custkey", day).orderBy(F.col("o_orderkey").desc())
    latest = (
        orders.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            day.alias("eff_date"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    wk = Window.partitionBy("o_custkey").orderBy("eff_date")
    nxt = F.lead("eff_date").over(wk)
    return latest.select(
        "o_custkey",
        "status",
        F.col("eff_date").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# QC: declarative expectations
# ---------------------------------------------------------------------------


@_register(
    "qc_expectations_orders",
    """
    SELECT rule, violations, (SELECT COUNT(*) FROM orders) AS n_rows FROM (
      SELECT 'totalprice_positive' AS rule,
             COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE))
                 AS violations FROM orders
      UNION ALL
      SELECT 'status_in_domain',
             COUNT(*) FILTER (WHERE NOT COALESCE(
                 o_orderstatus IN ('F', 'O', 'P'), FALSE)) FROM orders
      UNION ALL
      SELECT 'orderdate_not_null',
             COUNT(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
      UNION ALL
      SELECT 'priority_has_rank_prefix',
             COUNT(*) FILTER (WHERE NOT COALESCE(
                 o_orderpriority SIMILAR TO '[0-9]-.*', FALSE)) FROM orders
    )
    """,
)
def qc_expectations_orders(spark, sf_dir):
    """Declarative expectations (``qc.check_expectations``): named
    row-level constraints → (rule, violations, n_rows), ALL rules in a
    single aggregate pass (adding a rule costs an expression, not a
    scan). NULL predicate results count as violations — three-valued
    logic means unknown is not a pass; the reference's QC tier (§2.9)
    had exactly this class of inversion bug."""
    from udacity_capstone_data_engineering_spark.qc import check_expectations

    orders = load_table(spark, sf_dir, "orders")
    return check_expectations(
        orders,
        [
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("status_in_domain", F.col("o_orderstatus").isin("F", "O", "P")),
            ("orderdate_not_null", F.col("o_orderdate").isNotNull()),
            (
                "priority_has_rank_prefix",
                F.col("o_orderpriority").rlike("^[0-9]-"),
            ),
        ],
    )


# ---------------------------------------------------------------------------
# Scalar coverage: bitwise ops + conditional aggregates
# ---------------------------------------------------------------------------


@_register(
    "bitwise_functions",
    """
    SELECT p_partkey,
           p_partkey & 255 AS low_byte,
           p_partkey | 4096 AS with_flag,
           xor(p_partkey, 255) AS flipped,
           CAST(bit_count(p_partkey) AS INTEGER) AS popcount,
           p_partkey << 2 AS shl2,
           p_partkey >> 3 AS shr3
    FROM part
    """,
)
def bitwise_functions(spark, sf_dir):
    """Bitwise scalar coverage: and/or/xor/popcount/shifts — the ops
    behind bucket masks, bloom hashing, and the Z-order keys."""
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return part.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(255)).alias("flipped"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@_register(
    "conditional_aggregates",
    f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           bool_or(o_orderstatus = 'P') AS any_pending,
           bool_and(o_totalprice > 0) AS all_positive,
           {_dec_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END",
                         "finished_revenue")}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def conditional_aggregates(spark, sf_dir):
    """Conditional aggregation family: filtered counts, bool_or/
    bool_and, conditional sums — one pass, map-side combinable (the
    pattern the reference's cell-12 null profile pioneered, §2.4 A4)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.expr("bool_or(o_orderstatus = 'P')").alias("any_pending"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
            .otherwise(0)
            .cast("decimal(18,2)")
        )
        .cast("double")
        .alias("finished_revenue"),
    )


# ---------------------------------------------------------------------------
# Scalar coverage: higher-order array functions
# ---------------------------------------------------------------------------


@_register(
    "higher_order_functions",
    r"""
    WITH t AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> strlen(x) > 4)) AS INTEGER)
               AS n_long_tokens,
           CAST(list_sum(list_transform(toks, x -> strlen(x))) AS BIGINT)
               AS total_token_chars,
           list_bool_or(list_transform(toks, x -> x = 'the')) AS has_the,
           upper(toks[1]) AS first_upper
    FROM t
    """,
)
def higher_order_functions(spark, sf_dir):
    """Higher-order array functions as first-class query surface:
    filter / transform / aggregate / exists over a BOUND token column
    (the HOF no-CSE rule: project the split once). These are the
    building blocks the dedup/fingerprint tier composes; this query
    pins their scalar semantics against the oracle directly."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    toks = F.col("toks")
    return t.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
        F.exists(toks, lambda x: x == F.lit("the")).alias("has_the"),
        F.upper(F.element_at(toks, 1)).alias("first_upper"),
    )
