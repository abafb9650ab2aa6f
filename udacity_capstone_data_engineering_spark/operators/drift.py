"""Population Stability Index: distribution-drift monitoring between
two periods of an event stream.

The operator a production data pipeline runs continuously: bucket a
metric into a fixed grid, compare the bucket distribution of the
current period against a reference period, and alert when

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

crosses a threshold (industry folklore: 0.1 = drifting, 0.25 = major
shift). Laplace smoothing (+1/2 per bucket) keeps empty buckets from
producing infinities and makes PSI defined on any split.

Determinism contract: p and q are ratios of exact integer counts;
each bucket's contribution is rounded to 9 decimals and cast
DECIMAL(18,9) before the per-key sum (order-independent), one final
ROUND(double, 6) — the same ln/DECIMAL discipline as the bigram LM
and BM25, so the report is fully hash-gated against DuckDB.

Scale shape: ONE shuffle over the event stream — the
(key, period, bucket) count with map-side partial aggregation (the
output is |keys| x 2 x nbuckets rows, trivially small); the full
bucket grid is rebuilt from the distinct keys so zero-count buckets
still contribute their smoothed mass; totals join back broadcast.
PSI over 100 TB of events costs exactly one pass + one tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CONTRIB_DECIMALS = 9
PSI_DECIMALS = 6
SMOOTH_NUM = 0.5  # Laplace: (c + 1/2) / (n + nbuckets/2)


def psi_report(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    pivot_ts: str,
    bucket_width: float,
    n_buckets: int,
) -> DataFrame:
    """PSI per ``key_col`` between rows before ``pivot_ts`` (reference
    period a) and rows at/after it (comparison period b), bucketing
    ``value_col`` into ``n_buckets`` fixed-width bins (the last bin is
    open-ended). Returns ``(key, n_a, n_b, psi)``."""
    binned = events.select(
        F.col(key_col).alias("k"),
        F.when(F.col(ts_col) < F.lit(pivot_ts).cast("timestamp"), "a")
        .otherwise("b")
        .alias("period"),
        value_bucket(F.col(value_col), bucket_width, n_buckets).alias(
            "bucket"
        ),
    )
    counts = binned.groupBy("k", "period", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = psi_from_counts(counts, n_buckets)
    return out.select(F.col("k").alias(key_col), "n_a", "n_b", "psi")


def value_bucket(value: Column, bucket_width: float, n_buckets: int) -> Column:
    """Fixed-width bin index with an open-ended last bin."""
    return (
        F.least(F.lit(n_buckets - 1), F.floor(value / F.lit(bucket_width)))
        .cast("int")
    )


def psi_from_counts(counts: DataFrame, n_buckets: int) -> DataFrame:
    """PSI per key from a ``(k, period['a'|'b'], bucket, c)`` count
    relation — the reusable core shared by the batch report and the
    streaming monitor (whose counts arrive as latest-per-cell
    emissions). Returns ``(k, n_a, n_b, psi)``."""
    top = n_buckets - 1
    totals = counts.groupBy("k").pivot("period", ["a", "b"]).sum("c")
    totals = totals.select(
        "k",
        F.coalesce(F.col("a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("n_b"),
    )
    grid = counts.select("k").distinct().select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(top))).alias("bucket")
    )
    ca = counts.filter(F.col("period") == "a").select(
        "k", "bucket", F.col("c").alias("ca")
    )
    cb = counts.filter(F.col("period") == "b").select(
        "k", "bucket", F.col("c").alias("cb")
    )
    denom_pad = SMOOTH_NUM * n_buckets
    joined = (
        grid.join(ca, ["k", "bucket"], "left")
        .join(cb, ["k", "bucket"], "left")
        .join(F.broadcast(totals), "k")
        .select(
            "k",
            "n_a",
            "n_b",
            (
                (F.coalesce(F.col("ca"), F.lit(0)) + SMOOTH_NUM)
                / (F.col("n_a") + denom_pad)
            ).alias("p"),
            (
                (F.coalesce(F.col("cb"), F.lit(0)) + SMOOTH_NUM)
                / (F.col("n_b") + denom_pad)
            ).alias("q"),
        )
    )
    contrib = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")),
        CONTRIB_DECIMALS,
    ).cast(f"decimal(18,{CONTRIB_DECIMALS})")
    return (
        joined.select("k", "n_a", "n_b", contrib.alias("w"))
        .groupBy("k", "n_a", "n_b")
        .agg(F.round(F.sum("w").cast("double"), PSI_DECIMALS).alias("psi"))
    )


def drift_counts_stream(
    rows: DataFrame,
    key_col: str,
    value_col: str,
    bucket_width: float,
    n_buckets: int,
) -> DataFrame:
    """Streaming side of the drift monitor: maintain the live
    ``(k, bucket) -> count`` histogram of an event stream as a PLAIN
    streaming aggregation (counts merge by sum — the count-min
    precedent; no custom state processor). State is
    |keys| x n_buckets cells regardless of stream length; update-mode
    emissions are changed cells, counts monotone per cell, so
    latest-per-cell is the current histogram. The consumer joins the
    latest cells against a static REFERENCE histogram and computes
    PSI with :func:`psi_from_counts` per micro-batch or on demand —
    the standard continuous-monitoring deployment (train-time
    reference vs live traffic)."""
    return (
        rows.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("k"),
            value_bucket(F.col(value_col), bucket_width, n_buckets).alias(
                "bucket"
            ),
        )
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def psi_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    pivot_ts: str,
    bucket_width: float,
    n_buckets: int,
) -> str:
    top = n_buckets - 1
    pad = SMOOTH_NUM * n_buckets
    return f"""
    WITH binned AS (
      SELECT {key_col} AS k,
             CASE WHEN {ts_col} < TIMESTAMP '{pivot_ts}' THEN 'a'
                  ELSE 'b' END AS period,
             CAST(least({top}, floor({value_col} / {bucket_width}))
                  AS INTEGER) AS bucket
      FROM {table}),
    counts AS (
      SELECT k, period, bucket, count(*) AS c
      FROM binned GROUP BY 1, 2, 3),
    totals AS (
      SELECT k,
             CAST(COALESCE(sum(c) FILTER (period = 'a'), 0) AS BIGINT) AS n_a,
             CAST(COALESCE(sum(c) FILTER (period = 'b'), 0) AS BIGINT) AS n_b
      FROM counts GROUP BY 1),
    grid AS (
      SELECT k, CAST(unnest(range(0, {n_buckets})) AS INTEGER) AS bucket
      FROM (SELECT DISTINCT k FROM counts)),
    pq AS (
      SELECT g.k, t.n_a, t.n_b,
             (COALESCE(ca.c, 0) + {SMOOTH_NUM}) / (t.n_a + {pad}) AS p,
             (COALESCE(cb.c, 0) + {SMOOTH_NUM}) / (t.n_b + {pad}) AS q
      FROM grid g
      LEFT JOIN counts ca
        ON ca.k = g.k AND ca.bucket = g.bucket AND ca.period = 'a'
      LEFT JOIN counts cb
        ON cb.k = g.k AND cb.bucket = g.bucket AND cb.period = 'b'
      JOIN totals t ON t.k = g.k)
    SELECT k AS {key_col}, n_a, n_b,
           ROUND(CAST(sum(CAST(ROUND((p - q) * ln(p / q),
                                     {CONTRIB_DECIMALS})
                               AS DECIMAL(18,{CONTRIB_DECIMALS})))
                      AS DOUBLE), {PSI_DECIMALS}) AS psi
    FROM pq GROUP BY 1, 2, 3
    """
