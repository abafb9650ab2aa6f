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


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1, 1],
    derived from md5 so any engine can reproduce them."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane:{plane}:{d}".encode()).hexdigest()[:15], 16)
        out.append(h / float(2**59) - 1.0)
    return out


def lsh_bucket_keys(
    emb: DataFrame, vec_col: str, dim: int, planes: int = 8
) -> DataFrame:
    """Append an integer LSH bucket key: bit p = sign(v · hyperplane_p)."""
    key = F.lit(0).cast("bigint")
    for p in range(planes):
        hp = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), hp, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key + F.when(d > 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0))
    return emb.withColumn("bucket", key)


def lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: cosine ranking restricted to same-bucket pairs.

    Recall is validated against ``brute_force_topk`` in tests (approx
    operators get recall thresholds, not hash equality — SURVEY.md §7
    risk register).
    """
    b = lsh_bucket_keys(emb, vec_col, dim, planes)
    left = b.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    joined = left.join(right, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
