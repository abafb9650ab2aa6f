"""Similarity search over embedding columns (``array<float>``).

Two paths:
  - ``brute_force_topk``: exact cosine top-k via a blocked self-join —
    the correctness baseline, quadratic, fine at test scale and as the
    recall oracle for the approximate path.
  - ``lsh_topk``: random-hyperplane LSH — deterministic, engine-portable
    hyperplanes derived from md5 (no RNG state to ship); candidates are
    generated only WITHIN sign-pattern buckets, so the join cost scales
    with bucket sizes, not corpus². This is the 100-TB path: bucket
    keys shuffle once, and multi-probe (bit-flip) widening trades
    recall for cost without re-bucketing.

All vector math is builtin higher-order functions in DOUBLE with
left-to-right accumulation (bit-stable across engines; see
``functions/vectors.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.vectors import cosine_similarity


def _pairwise_cosine(
    emb: DataFrame, id_col: str, vec_col: str, queries: DataFrame | None = None
) -> DataFrame:
    """(query id, candidate id, cosine) for all pairs, excluding self."""
    q = (queries or emb).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    return joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )


def brute_force_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine (ties → lower id first)."""
    scored = _pairwise_cosine(emb, id_col, vec_col, queries)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1, 1],
    derived from md5 so any engine can reproduce them."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"t:{table}:p:{plane}:d:{d}".encode()).hexdigest()[:15], 16)
        out.append(h / float(2**59) - 1.0)
    return out


def lsh_bucket_keys(
    emb: DataFrame, vec_col: str, dim: int, planes: int = 4, tables: int = 16
) -> DataFrame:
    """Append (table, bucket) LSH keys, one row per table: bucket bit p
    = sign(v · hyperplane_{table,p}). Multi-table is the standard
    recall lever for random-hyperplane LSH: each extra table is an
    independent chance for true neighbors to collide.

    All dot products for one table row are computed in one pass; the
    explode multiplies rows by ``tables`` (cheap: ids + small ints)."""
    entries = []
    for t in range(tables):
        key = F.lit(0).cast("bigint")
        for p in range(planes):
            hp = F.array(*[F.lit(x) for x in _hyperplane(dim, t, p)])
            d = F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"), hp, lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            key = key + F.when(d > 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0))
        entries.append(F.struct(F.lit(t).alias("table"), key.alias("bucket")))
    return emb.select(
        "*", F.explode(F.array(*entries)).alias("tb")
    ).select(*emb.columns, "tb.table", "tb.bucket")


def lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int | None = None,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k: candidates = pairs sharing any table's bucket
    (deduplicated), then exact cosine ranking of candidates only.

    Scale shape: one shuffle on (table, bucket); candidate count is
    sum of per-bucket sizes², tunable via planes (bucket granularity)
    × tables (recall). ``planes=None`` auto-sizes granularity to the
    corpus — planes ≈ log2(n / 32) keeps expected bucket size ~32, so
    candidate generation stays near-linear as n grows instead of
    quadratic (fixed planes degenerate at scale). Recall is validated
    against ``brute_force_topk`` in tests (approx operators get recall
    thresholds, not hash equality — SURVEY.md §7 risk register).
    """
    if planes is None:
        import math

        n = emb.count()  # parquet metadata count: cheap relative to the join
        planes = max(4, math.ceil(math.log2(max(n, 64) / 32)))
    b = lsh_bucket_keys(emb, vec_col, dim, planes, tables)
    left = b.select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"), "table", "bucket"
    )
    cand = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # Normalize each vector ONCE (|corpus| norms), so per-pair scoring
    # is a single dot product instead of dot + two norms — the pair set
    # is orders of magnitude larger than the corpus.
    from udacity_capstone_data_engineering_spark.functions.vectors import dot, l2_norm

    unit = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).select(
        F.col(id_col),
        F.col("__v"),
        l2_norm(F.col("__v")).alias("__n"),  # bound: computed once per row
    ).select(
        F.col(id_col),
        # zero-norm → NULL unit vector (ANSI /0 raises); NULL uv yields
        # NULL cosine, ranked last — degenerate vectors never crash the job.
        F.when(
            F.col("__n") > 0,
            F.transform(F.col("__v"), lambda x: x / F.col("__n")),
        ).alias("uv"),
    )
    scored = (
        cand.join(
            unit.select(F.col(id_col).alias("query_id"), F.col("uv").alias("qv")),
            "query_id",
        )
        .join(
            unit.select(F.col(id_col).alias("neighbor_id"), F.col("uv").alias("cv")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
