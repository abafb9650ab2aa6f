"""Distributed global ranking / prefix sums (VERDICT r3 next-round #1).

An unpartitioned window — ``Window.orderBy(...)`` with no partition
spec — compiles to ``Exchange SinglePartition`` + a ONE-TASK sort:
correct, but a single reducer sorting a data-sized relation, the plan
that dies first at 100 TB.  This module provides the two-level plan
every distributed engine uses instead (range partition + local scan +
carried offsets), producing BIT-IDENTICAL results to the single
window, which is how the four analytics call sites
(``rfm_customer_segments``, ``customer_spend_gini``,
``parts_abc_pareto``, ``concurrent_sessions_peak``) keep their oracle
hashes unchanged while losing the single-reducer sort:

  1. BUCKET — assign each row a range-bucket id from approx-quantile
     fences of the (double-cast) order key.  The fences are computed
     LAZILY IN-PLAN (a 1-row ``percentile_approx`` aggregate
     broadcast-cross-joined to the input), so building the DataFrame
     runs no Spark jobs — plan inspection stays free — and AQE's
     exchange reuse shares the input's shuffle between the fence
     aggregate and the main branch within the one action.  Boundary
     placement does not affect results — only which bucket does the
     local work.
     Branch agreement is STRUCTURAL: within any single action the
     fence aggregate materializes as ONE BroadcastExchange that both
     downstream consumers reference through ``ReusedExchange``
     (verified by ``test_fence_broadcast_computed_once``), and a
     recomputed task re-fetches the same immutable broadcast value —
     so every plan branch sees identical fences even under executor
     loss, without any persist.  Across separate actions the
     approx-percentile merge order may yield slightly different
     fences, which is harmless: boundary placement never affects
     results, only which bucket does the local work.
  2. LOCAL — one hash shuffle on the bucket id; a per-bucket window
     computes the local row_number / running sum over ~|rows|/B rows
     per task.
  3. OFFSET — a per-bucket (count, sum) aggregate (B rows, map-side
     combined) is prefix-summed with a window over the BUCKET-COUNT-
     sized relation (the one intentionally tiny unpartitioned window
     left in the plan) and broadcast-joined back:
     global = local + offset-of-preceding-buckets.

Exactness: ranks are integer adds; running sums stay in the exact
type of ``sum(value)`` (DECIMAL for money columns — the house
decimal-sum discipline), so global = local + offset is exact and
order-independent.  Callers must supply a TOTAL order (key +
tiebreakers), same as they already did for the single window.

Nulls in the order key are not range-bucketable; callers here never
produce them (keys are groupBy outputs).  They are routed to the
first bucket under ASC (``asc`` = nulls first) and PAST the last
fence under DESC (``desc`` = nulls last), matching Spark's default
null ordering in both directions; tie order among multiple null keys
is only as total as the tiebreak columns make it — same contract as
the single window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BKT = "__gr_bkt"


def _as_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _key_as_double(df: DataFrame, key: Column) -> Column:
    """Monotone double image of the order key, used ONLY for bucket
    assignment (windows still order by the original column, so any
    precision collapse in the cast merely co-buckets the collapsed
    values — harmless).  Dates/timestamps go through their integer
    epoch forms (exact below 2^53 micros); decimals/ints cast
    directly (monotone by IEEE rounding)."""
    dt = df.select(key.alias("__gr_probe")).schema[0].dataType
    if isinstance(dt, T.DateType):
        return F.unix_date(key).cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(key).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # session tz is pinned UTC by the query wrapper; the cast is
        # monotone under any fixed tz, which is all bucketing needs
        return F.unix_micros(key.cast("timestamp")).cast("double")
    if isinstance(dt, T.NumericType):
        return key.cast("double")
    raise TypeError(f"unsupported global-rank key type: {dt}")


def _n_buckets_default(df: DataFrame) -> int:
    try:
        p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        p = 32
    return max(2, min(p, 1024))


def ranked_prefix(
    df: DataFrame,
    key,
    tiebreaks: Sequence = (),
    descending: bool = False,
    value=None,
    rn_col: str | None = None,
    cum_col: str | None = None,
    count_col: str | None = None,
    total_col: str | None = None,
    n_buckets: int | None = None,
    rel_err: float = 0.01,
) -> DataFrame:
    """Append globally-ordered rank / prefix-sum columns without a
    data-sized single-partition window.

    Ordering is (key ASC|DESC, *tiebreaks ASC) — the caller's usual
    total order.  Requested outputs:

    - ``rn_col``   — global row_number (LONG; 1-based)
    - ``cum_col``  — global running sum of ``value`` (inclusive frame,
      exact in ``sum(value)``'s type)
    - ``count_col`` — total row count (same on every row)
    - ``total_col`` — grand total of ``value`` (same on every row)

    ``value`` is required for ``cum_col``/``total_col``.
    """
    key = _as_col(key)
    ties = [_as_col(t) for t in tiebreaks]
    want_sum = cum_col is not None or total_col is not None
    if want_sum and value is None:
        raise ValueError("cum_col/total_col require a value column")
    value = _as_col(value) if value is not None else None
    if n_buckets is None:
        n_buckets = _n_buckets_default(df)

    kd = _key_as_double(df, key)
    if descending:
        kd = -kd

    # --- 1. bucket fences (lazy 1-row aggregate, broadcast back) ---
    if n_buckets > 1:
        probs = F.array(
            *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
        )
        acc = F.lit(max(100, int(round(1.0 / rel_err))))
        fence_row = df.agg(
            F.percentile_approx(kd, probs, acc).alias("__gr_fences")
        )
        arr = F.col("__gr_fences")
        # number of fences strictly below the key == 0-based bucket id;
        # equal key values always share a bucket (total-order safe).
        # Null keys: Spark's asc = nulls FIRST (bucket 0), desc =
        # nulls LAST (past every fence — size(arr)); the local window
        # below orders with the same defaults, so global placement
        # matches the single unpartitioned window.  coalesce guards
        # the all-null-key corner where percentile returns NULL.
        null_bkt = (
            F.coalesce(F.size(arr), F.lit(0)) if descending else F.lit(0)
        )
        bucket = F.when(kd.isNull(), null_bkt).otherwise(
            F.coalesce(
                F.size(F.filter(arr, lambda f: f < kd)), F.lit(0)
            )
        )
        bucketed = (
            df.crossJoin(F.broadcast(fence_row))
            .withColumn(_BKT, bucket)
            .drop("__gr_fences")
        )
    else:
        bucketed = df.withColumn(_BKT, F.lit(0))

    # --- 2. local window within each bucket ---
    order_cols = [key.desc() if descending else key.asc(), *ties]
    w_local = Window.partitionBy(_BKT).orderBy(*order_cols)
    locals_: list[Column] = []
    if rn_col is not None:
        locals_.append(F.row_number().over(w_local).alias("__gr_lrn"))
    if cum_col is not None:
        locals_.append(
            F.sum(value)
            .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__gr_lcum")
        )
    with_local = bucketed.select("*", *locals_) if locals_ else bucketed

    # --- 3. per-bucket offsets (B rows; tiny unpartitioned window) ---
    aggs = [F.count(F.lit(1)).alias("__gr_cnt")]
    if want_sum:
        aggs.append(F.sum(value).alias("__gr_vsum"))
    per_bucket = bucketed.groupBy(_BKT).agg(*aggs)
    w_off = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [F.col(_BKT)]
    if rn_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__gr_cnt").over(w_off), F.lit(0)).alias(
                "__gr_rn_off"
            )
        )
    if count_col is not None:
        off_cols.append(F.sum("__gr_cnt").over(w_all).alias("__gr_n"))
    if cum_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__gr_vsum").over(w_off), F.lit(0)).alias(
                "__gr_cum_off"
            )
        )
    if total_col is not None:
        off_cols.append(F.sum("__gr_vsum").over(w_all).alias("__gr_tot"))
    offsets = per_bucket.select(*off_cols)

    joined = with_local.join(F.broadcast(offsets), _BKT)
    out_cols = [F.col(c) for c in df.columns]
    if rn_col is not None:
        out_cols.append(
            (F.col("__gr_lrn").cast("long") + F.col("__gr_rn_off")).alias(
                rn_col
            )
        )
    if cum_col is not None:
        out_cols.append(
            (F.col("__gr_lcum") + F.col("__gr_cum_off")).alias(cum_col)
        )
    if count_col is not None:
        out_cols.append(F.col("__gr_n").alias(count_col))
    if total_col is not None:
        out_cols.append(F.col("__gr_tot").alias(total_col))
    return joined.select(*out_cols)


def global_ntile(
    df: DataFrame,
    key,
    tiebreaks: Sequence = (),
    n_tiles: int = 5,
    out_col: str = "ntile",
    descending: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY key, *tiebreaks)`` without the
    single-partition window, reproducing Spark/ANSI ntile semantics
    exactly from the distributed global row_number: with q = n DIV b
    and r = n MOD b, the first r tiles hold q+1 rows.  Output column
    is INT like the builtin.  Integer arithmetic is done in doubles
    under floor(), exact for counts below 2^53 (comfortably past any
    row count a BIGINT table can hold meaningful ranks for)."""
    tmp = ranked_prefix(
        df,
        key,
        tiebreaks,
        descending=descending,
        rn_col="__gr_rn",
        count_col="__gr_cnt_all",
        n_buckets=n_buckets,
    )
    rn = F.col("__gr_rn")
    n = F.col("__gr_cnt_all")
    q = F.floor(n / n_tiles)
    r = n % n_tiles
    big = q + F.lit(1)
    cut = big * r
    tile = F.when(
        rn <= cut, F.floor((rn - 1) / big) + F.lit(1)
    ).otherwise(
        r + F.floor((rn - cut - 1) / F.greatest(q, F.lit(1))) + F.lit(1)
    )
    return tmp.select(
        *[F.col(c) for c in df.columns], tile.cast("int").alias(out_col)
    )
