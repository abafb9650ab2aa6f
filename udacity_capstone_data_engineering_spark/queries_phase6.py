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
          FROM documents
          WHERE length(text) > 0)
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
    shuffles; at 100 TB this runs entirely map-side on the scan.

    Empty documents emit NO chunks: an unclamped
    ``sequence(0, floor((len-1)/stride))`` becomes ``sequence(0, -1)``
    — which Spark evaluates as the DESCENDING array ``[0, -1]`` (two
    phantom chunks), while the oracle's ``range(0, 0)`` is empty
    (ADVICE r2). Filter zero-length text up front and clamp the upper
    bound to 0 so both sides agree on any corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks = (F.length("text") - 1).cast("long") / F.lit(_STRIDE)
    chunked = docs.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.floor(n_chunks).cast("int"), F.lit(0)),
            )
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
    # Hash the gram to int64 before the count/join shuffles — strings
    # stay inside the scan stage, only 8B keys cross the wire; the
    # string-keyed oracle doubles as the collision check.
    dg = docs.select(
        "doc_id", F.explode(word_shingles("text", 5)).alias("gram")
    ).select("doc_id", F.xxhash64("gram").alias("h"))
    gf = dg.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dg.join(gf, "h")
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


# ---------------------------------------------------------------------------
# Fuzzy matching: SymSpell deletion-neighborhood join (edit distance <= 1)
# ---------------------------------------------------------------------------


@_register(
    "fuzzy_name_pairs",
    """
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
)
def fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy string join via SymSpell deletion neighborhoods: all
    distinct part-name pairs within edit distance 1, WITHOUT an
    all-pairs comparison. Guaranteed complete for distance ≤ 1:
    d(a,b) ≤ 1 implies the 1-deletion neighborhoods of a and b (each
    string plus every single-character deletion of it) intersect — a
    substitution pair shares the variant deleting the differing
    position, an insert/delete pair contains one string in the other's
    deletion set. So the candidate set is an EQUI-join on the variant
    key: O(L) variants per name, one shuffle on the variant string,
    then exact `levenshtein` verifies candidates (false candidates at
    larger distances die here; the builtin is JVM-side). The oracle is
    the quadratic all-pairs join — tractable on the 64 distinct names
    at test SF, which is exactly why the engine side must NOT use it:
    at 100 TB the deletion join scales with names × L, the oracle with
    names². Spark and DuckDB both implement classic Levenshtein."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    variants = names.select(
        "p_name",
        F.explode(
            F.array_union(
                F.array(F.col("p_name")),
                F.expr(
                    "transform(sequence(1, length(p_name)), i -> "
                    "concat(substring(p_name, 1, i-1), "
                    "substring(p_name, i+1, length(p_name))))"
                ),
            )
        ).alias("variant"),
    )
    a = variants.select(
        F.col("p_name").alias("name_a"), F.col("variant").alias("va")
    )
    b = variants.select(
        F.col("p_name").alias("name_b"), F.col("variant").alias("vb")
    )
    cands = (
        a.join(b, (a.va == b.vb) & (a.name_a < b.name_b))
        .select("name_a", "name_b")
        .distinct()
    )
    return cands.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= 1)


# ---------------------------------------------------------------------------
# Map column functions: build -> aggregate -> explode roundtrip
# ---------------------------------------------------------------------------


@_register(
    "map_functions",
    """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    """,
)
def map_functions(spark, sf_dir):
    """Map-typed column coverage: per-user event-type counts packed
    into a `map<string,bigint>` (`map_from_entries` over a sorted
    `collect_list` of structs — sorting first makes the entry order
    deterministic, collect_list alone is partitioning-dependent) and
    exploded back to rows. Semantically the identity over a plain
    two-key GROUP BY — which is the point: the oracle proves the map
    build/explode roundtrip loses and corrupts nothing. Map columns
    never transit a shuffle here wider than the packed per-user row —
    the shape used for feature maps and per-entity metric bags."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return packed.select(
        "user_id", F.explode("m").alias("event_type", "n")
    )


# ---------------------------------------------------------------------------
# VariantType: Spark 4 semi-structured column path
# ---------------------------------------------------------------------------


@_register(
    "variant_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS k_total,
           MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def variant_extract_props(spark, sf_dir):
    """Semi-structured ingestion via Spark 4's VARIANT type:
    `parse_json` builds the binary variant encoding once, then typed
    `variant_get` paths extract fields — versus `get_json_object`,
    which re-parses the JSON text PER EXTRACTION. With one extracted
    field they tie; real ingestion pulls many fields per record, where
    variant parses once and walks the binary encoding per path — the
    reason lakehouse JSON columns are moving to variant. The variant
    column itself stays internal (binary encoding is engine-specific);
    the query emits typed scalars, mirroring `json_extract_props` so
    the two formulations cross-check through the same oracle."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("k_total"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


# ---------------------------------------------------------------------------
# Native session windows (F.session_window) vs the manual formulation
# ---------------------------------------------------------------------------


@_register(
    "events_session_window_native",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def events_session_window_native(spark, sf_dir):
    """Native session windows: `F.session_window(ts, gap)` merges
    events closer than the gap into one window per key — the SAME
    aggregation works unchanged on a stream with a watermark (where
    the manual lag/cumsum formulation cannot: LAG over an unbounded
    stream is not incrementalizable, which is exactly why the native
    operator exists). Boundary semantics pinned by the oracle: a
    session window is [first_ts, last_ts + gap), so an event arriving
    EXACTLY gap after the last starts a new session (oracle flags
    `>= INTERVAL`, not `>`). One shuffle on user_id; Spark merges
    windows via sort-within-partition, no state explosion."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery with per-row LIMIT
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT r_name, t.n_name, t.n_cust
    FROM region, LATERAL (
        SELECT n_name, COUNT(c_custkey) AS n_cust
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY n_cust DESC, n_name
        LIMIT 2
    ) t
"""


@_register("lateral_topn_per_region", _LATERAL_SQL)
def lateral_topn_per_region(spark, sf_dir):
    """Correlated LATERAL subquery with a per-outer-row LIMIT: the two
    most customer-heavy nations per region, written as SQL a reference
    user would port verbatim (both engines run the IDENTICAL statement
    — the oracle string is the Spark query). Catalyst decorrelates the
    lateral into a ranked join, so despite the per-row phrasing there
    is no per-region re-execution: at scale this is the same shape as
    the window top-k operator (`top_k_per_group`), reached from the
    SQL surface. Deterministic via the (count DESC, name) tiebreak."""
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Error-safe expressions: try_* family (NULL, not job-kill, on bad input)
# ---------------------------------------------------------------------------


@_register(
    "safe_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_extendedprice / l_discount, 6) END
               AS price_per_disc,
           TRY_CAST(l_returnflag AS INTEGER) AS rf_int
    FROM lineitem
    """,
)
def safe_arithmetic(spark, sf_dir):
    """Error-safe expression family: `try_divide` (NULL on zero
    divisor — 2941 rows here — instead of Inf or an ANSI job kill) and
    `try_to_number` (NULL on malformed input instead of failing the
    task; `TRY_CAST` on the oracle side).
    On a 100-TB corpus a handful of dirty rows WILL exist in every
    batch; the try_* forms turn them into NULLs a downstream QC rule
    counts (`qc.expectations`), rather than killing a 1000-executor
    job at 99%. Row-local, no shuffle; the oracle spells out the exact
    NULL semantics so both engines must agree on every edge row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 6)
        .alias("price_per_disc"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int")
        .alias("rf_int"),
    )


# ---------------------------------------------------------------------------
# Time-based RANGE window frame (interval preceding, not row-count)
# ---------------------------------------------------------------------------


@_register(
    "rolling_7day_order_revenue",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d
    FROM orders
    """,
)
def rolling_7day_order_revenue(spark, sf_dir):
    """Time-based rolling aggregate: per-customer revenue over a
    trailing 7-DAY interval — a RANGE frame over the timestamp, not a
    ROWS frame (`window_rolling_sum` covers that): the frame holds
    however many orders fall in the window, and peer rows (equal
    timestamps) enter together on BOTH engines by RANGE semantics, so
    no tiebreaker is needed for determinism. One shuffle on o_custkey;
    the frame evaluates with a sliding sum over the sorted partition
    (decimal-exact, order-independent). SQL surface on the Spark side
    too — interval RANGE frames aren't expressible through the
    DataFrame `rangeBetween(long)` API."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rev_7d
        FROM orders
    """)


# ---------------------------------------------------------------------------
# IQR outlier bounds (the distribution-trim step of data cleaning)
# ---------------------------------------------------------------------------


@_register(
    "iqr_outlier_bounds",
    """
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type)
    SELECT e.event_type,
           ROUND(q1 - 1.5 * (q3 - q1), 6) AS lo,
           ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi,
           CAST(COUNT(*) FILTER (
               WHERE value < q1 - 1.5 * (q3 - q1)
                  OR value > q3 + 1.5 * (q3 - q1)) AS BIGINT) AS n_outliers,
           COUNT(*) AS n_rows
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type, q1, q3
    """,
)
def iqr_outlier_bounds(spark, sf_dir):
    """IQR outlier detection (Tukey fences): per-group exact quartiles,
    then count of rows outside [q1 - 1.5·IQR, q3 + 1.5·IQR] — the
    standard distribution-trim step before training-data aggregation.
    Exact `percentile` matches DuckDB's `quantile_cont` definition
    ((n-1)p interpolation, proven by `median_price_per_segment`). Two
    passes over events, both shuffling only (group, quantile-state):
    at 100 TB swap `percentile` for `approx_percentile` (mergeable
    sketch, documented error) and keep the same fences. The quartile
    result is groups-sized, so the second pass joins it broadcast."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    joined = ev.join(F.broadcast(q), "event_type")
    return joined.groupBy("event_type", "q1", "q3").agg(
        F.round(F.min(lo), 6).alias("lo"),
        F.round(F.max(hi), 6).alias("hi"),
        F.sum(
            F.when((F.col("value") < lo) | (F.col("value") > hi), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
        F.count(F.lit(1)).alias("n_rows"),
    ).drop("q1", "q3")


# ---------------------------------------------------------------------------
# Flagship composition: the end-to-end corpus-preparation pipeline
# ---------------------------------------------------------------------------

_QUALITY_SQL = (
    "ROUND(least(length(text) / 500.0, 1.0)"
    " * (1.0 - ROUND(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"
    " / greatest(length(text), 1), 6)), 6)"
)


def _corpus_prep_oracle() -> str:
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64_sql,
    )
    from udacity_capstone_data_engineering_spark.operators.sampling import (
        hash_split_case_sql,
    )

    split_case = hash_split_case_sql(
        "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=7
    )
    return f"""
    WITH qualified AS (
        SELECT doc_id, lang, text
        FROM documents
        WHERE {_QUALITY_SQL} >= 0.5),
    deduped AS (
        SELECT doc_id, lang, text
        FROM (SELECT doc_id, lang, text,
                     ROW_NUMBER() OVER (
                         PARTITION BY {portable_hash64_sql('text')}
                         ORDER BY doc_id) AS rn
              FROM qualified)
        WHERE rn = 1),
    assigned AS (
        SELECT lang, {split_case} AS split,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM deduped)
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned
    GROUP BY split, lang
    """


@_register("corpus_prep_pipeline", _corpus_prep_oracle())
def corpus_prep_pipeline(spark, sf_dir):
    """The end-to-end corpus-preparation pipeline as ONE declarative
    plan — the engine's north-star composition, each stage an operator
    proven separately under the gate:

      1. quality gate  (`quality_score` ≥ 0.5 — length/punctuation
         heuristic, JVM exprs)                     [`doc_quality`]
      2. exact dedup   (min doc_id per 60-bit portable content
         fingerprint, tiebroken window)       [`exact_dedup_docs`]
      3. deterministic split (80/10/10 by key-hash bucket — survives
         repartitioning and reruns)      [`train_valid_test_split`]
      4. shard manifest (docs + token budget per split × lang)

    Composing them in one DataFrame keeps Catalyst in charge
    end-to-end: the quality filter runs inside the scan stage, the
    dedup window and the final aggregate are the only two shuffles
    (split assignment is a pure map), and nothing materializes between
    stages. At 100 TB this whole pipeline is two exchanges over the
    filtered corpus — there is no per-stage write-out unless a
    `Pipeline` materialize boundary is asked for."""
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64,
    )
    from udacity_capstone_data_engineering_spark.functions.text import (
        quality_score,
        token_count,
    )
    from udacity_capstone_data_engineering_spark.operators.sampling import hash_split
    from pyspark.sql import Window

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    qualified = docs.filter(quality_score("text") >= 0.5).select(
        "doc_id", "lang", "text"
    )
    w = Window.partitionBy(portable_hash64("text")).orderBy("doc_id")
    deduped = (
        qualified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assigned = hash_split(
        deduped, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=7
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# explode_outer: row preservation through empty arrays
# ---------------------------------------------------------------------------


@_register(
    "explode_outer_semantics",
    """
    SELECT event_id,
           unnest(CASE WHEN len(runs) = 0 THEN [NULL] ELSE runs END)
               AS digit_run
    FROM (SELECT event_id, regexp_extract_all(props, '[0-9]{2,}') AS runs
          FROM events)
    """,
)
def explode_outer_semantics(spark, sf_dir):
    """`explode_outer` semantics pinned: a record whose extracted array
    is EMPTY must survive as one row with a NULL element — plain
    `explode` silently drops it, the classic row-loss bug in
    feature-extraction pipelines (records with no matches vanish from
    the output and from every downstream count). The oracle emulates
    outer-explode by substituting a [NULL] list for empty arrays,
    so both engines must agree on exactly which records have no
    2-digit runs. Row-local aside from nothing — no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    runs = ev.select(
        "event_id",
        F.regexp_extract_all("props", F.lit("[0-9]{2,}"), 0).alias("runs"),
    )
    return runs.select(
        "event_id", F.explode_outer("runs").alias("digit_run")
    )


# ---------------------------------------------------------------------------
# Full outer join: snapshot reconciliation
# ---------------------------------------------------------------------------


@_register(
    "full_outer_reconciliation",
    """
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'only_finished'
                WHEN b.o_orderkey IS NULL THEN 'only_urgent'
                ELSE 'both' END AS match_status,
           COUNT(*) AS n_orders
    FROM (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') a
    FULL OUTER JOIN
         (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') b
      ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def full_outer_reconciliation(spark, sf_dir):
    """FULL OUTER join — the reconciliation shape (diffing two
    snapshots / CDC feeds, where rows exist on either side alone):
    urgent orders vs finished orders, classified into both /
    left-only / right-only with counts. The last join type in the
    catalog (inner/left/semi/anti/cross are covered elsewhere). A
    full outer CANNOT broadcast either side (both sides' unmatched
    rows must surface), so it plans as a shuffle join on the key at
    any scale — exactly one exchange per side here, then the classify
    + count aggregate rides the same partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("a_key")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("b_key")
    )
    j = a.join(b, a.a_key == b.b_key, "full_outer")
    status = (
        F.when(F.col("a_key").isNull(), "only_finished")
        .when(F.col("b_key").isNull(), "only_urgent")
        .otherwise("both")
    )
    return j.groupBy(status.alias("match_status")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Native ordered string aggregation (Spark 4 listagg WITHIN GROUP)
# ---------------------------------------------------------------------------

_LISTAGG_SQL = """
    SELECT r_name,
           listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
"""


@_register(
    "listagg_nations",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def listagg_nations(spark, sf_dir):
    """Spark 4's native `listagg` with `WITHIN GROUP (ORDER BY …)` —
    the ANSI ordered string aggregation. `nations_per_region_csv`
    builds the same result by hand (collect_list → sort_array →
    array_join, required before 4.0 because collect order is
    partitioning-dependent); the WITHIN GROUP clause makes the
    ordering part of the AGGREGATE's contract instead. Both paths
    stay under the gate so the native function is proven equivalent
    to the manual composition."""
    for t in ("nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LISTAGG_SQL)


# ---------------------------------------------------------------------------
# Boilerplate-robust near-dup: exact-collapse valve before MinHash-LSH
# ---------------------------------------------------------------------------

from udacity_capstone_data_engineering_spark.queries import _NEAR_DUP_CTES  # noqa: E402

_COLLAPSED_CTES = (
    "reps AS (SELECT min(doc_id) AS doc_id, text, COUNT(*) AS group_size\n"
    "             FROM documents GROUP BY text),\n    "
    + _NEAR_DUP_CTES.replace("FROM documents", "FROM reps")
)


@_register(
    "near_dup_collapsed",
    f"""
    WITH {_COLLAPSED_CTES}
    SELECT id_a, id_b, jaccard,
           CAST(ga.group_size AS BIGINT) AS copies_a,
           CAST(gb.group_size AS BIGINT) AS copies_b
    FROM jp
    JOIN reps ga ON ga.doc_id = id_a
    JOIN reps gb ON gb.doc_id = id_b
    """,
)
def near_dup_collapsed(spark, sf_dir):
    """Boilerplate-robust near-dup detection (VERDICT r2 #6): collapse
    byte-identical documents to one representative (exact fingerprint
    groupBy — one cheap shuffle), THEN MinHash-LSH near-dup over the
    representatives, carrying each side's exact-copy count.

    The skew valve for real web corpora: a template shared by 20% of
    documents otherwise lands its entire copy-set in the same LSH
    bucket in every band, and in-bucket pair enumeration goes
    QUADRATIC in the copy count — compute skew inside one explode that
    AQE cannot split (it splits shuffle partitions, not a single
    task's generator). Collapsed, the near-dup tier sees one rep per
    template; the copies_a/copies_b counts let cluster reassembly
    recover full membership without enumerating intra-template pairs
    (tests/test_round3_fixes.py measures the candidate count dropping
    from >=C(100,2) to <500 on a 20%-template corpus)."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        near_dup_pairs_collapsed,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return near_dup_pairs_collapsed(
        docs, "text", "doc_id", threshold=0.0
    ).select(
        "id_a",
        "id_b",
        "jaccard",
        F.col("copies_a").cast("long").alias("copies_a"),
        F.col("copies_b").cast("long").alias("copies_b"),
    )


# ---------------------------------------------------------------------------
# Partitioned-at-rest catalog layout (VERDICT r2 #7)
# ---------------------------------------------------------------------------


@_register(
    "partitioned_catalog_roundtrip",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
    GROUP BY event_type
    """,
)
def partitioned_catalog_roundtrip(spark, sf_dir):
    """The catalog's date-partitioned at-rest layout under the oracle
    gate, end to end: rewrite events hive-partitioned on event_date
    (``materialize_partitioned`` — the reference's own 100x proposal,
    notebook cell 45, implemented), read it back through the catalog,
    filter a DATE RANGE on the partition column, aggregate. The oracle
    runs the same week's aggregate on the flat source, so a layout
    that dropped/duplicated rows or mis-derived partition values
    hash-mismatches. The range predicate prunes partition directories
    at planning time and a dim-side filter prunes them at runtime via
    DPP — both asserted on this same layout in
    ``tests/test_plans.py::test_partitioned_catalog_layout_prunes_and_dpp``."""
    import tempfile

    from udacity_capstone_data_engineering_spark.sources.catalog import (
        load_partitioned,
        materialize_partitioned,
    )

    base = tempfile.mkdtemp(prefix="spark_part_catalog_")
    path = materialize_partitioned(spark, sf_dir, "events", base)
    ev = load_partitioned(spark, path).filter(
        F.col("event_date").between("2024-01-05", "2024-01-11")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Z-order clustered at-rest layout (round 5; operators/layout.py)
# ---------------------------------------------------------------------------


@_register(
    "zorder_layout_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-15 00:00:00'
      AND value BETWEEN 100 AND 200
    GROUP BY event_type
    """,
)
def zorder_layout_roundtrip(spark, sf_dir):
    """Z-order clustered rewrite under the oracle gate, end to end:
    rewrite events Morton-clustered on (ts, value) — the two columns
    analytical scans range-filter TOGETHER, which no single sort order
    can serve — read the clustered copy back, apply the two-sided
    range predicate, aggregate. The oracle runs the same predicate on
    the flat source, so a layout that dropped, duplicated, or mangled
    rows (e.g. a non-bijective z-key projection or a lossy timestamp
    round-trip) hash-mismatches. The layout itself is what makes the
    scan cheap at 100 TB: every output file holds a contiguous curve
    segment (compact per-file ts x value hyper-rectangle), rows inside
    are z-sorted, so parquet row-group min/max statistics skip
    non-matching groups on BOTH dimensions — clustering quality and
    actual file-skipping are asserted in ``tests/test_layout.py``."""
    import tempfile

    from udacity_capstone_data_engineering_spark.operators.layout import (
        write_zordered,
    )

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="spark_zorder_")
    path = write_zordered(
        ev, ["ts", "value"], base, "events_z", bits=8, n_files=8
    )
    back = spark.read.parquet(path)
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        back.filter(
            (F.col("ts") >= lo)
            & (F.col("ts") < hi)
            & F.col("value").between(100, 200)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_value"),
        )
    )
