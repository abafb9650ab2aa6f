"""SemDeDup: semantic deduplication of an embedding corpus via
within-cluster epsilon-ball pruning (Abbas et al. 2023, arXiv
2303.09540).

The missing member of the dedup family: exact dedup catches byte
twins, MinHash/SimHash catch lexical near-twins — semantic dedup
catches REWORDED duplicates whose embeddings land close together.
The published recipe: k-means-cluster the embedding corpus, compare
pairs only WITHIN a cluster, and drop all but one representative of
every near-duplicate neighborhood. Clustering is what makes it
tractable: candidate pairs are sum-of-cluster-sizes-squared, not
corpus-squared, and k grows with the corpus to hold cluster sizes
bounded.

This implementation composes two operators the repo already trusts:
- clusters come from the EXACT-INTEGER Lloyd k-means
  (``operators/kmeans.py``), so the partition is bit-equal across
  engines and the whole result — cluster ids included — stays under
  the full value-hash oracle gate (no other SemDeDup oracle story
  survives float k-means);
- closeness is exact integer squared L2 on the same floor-rounded
  quantization, thresholded at ``eps`` (on unit-normalized embeddings
  squared L2 is monotone in cosine, so an eps-ball IS a cosine
  threshold up to the quantization grid).

Keep rule (deterministic): a vector is a duplicate iff some
SMALLER-id vector lies within eps in the same cluster — the id-order
greedy the exact-dedup tier already uses; every neighborhood keeps
its minimum-id member, and chained near-dups (a~b, b~c, a!~c) prune
to their component representative transitively.

Scale blueprint at 100 TB: raise k so E[cluster] stays bounded
(SemDeDup used 50k clusters for LAION); the pair stage is an
equi-join ON CLUSTER — Spark shuffles both sides by cluster id and
never materializes a corpus square. The demo query pins k=4 (the
oracle unrolls per-k) and audits a deterministic 1-in-20 id sample,
which is also the honest production shape for dedup-RATE estimation
before committing to the full prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from udacity_capstone_data_engineering_spark.operators.kmeans import (
    ITERATIONS,
    K,
    SCALE,
    _quantize,
    kmeans_int,
    kmeans_oracle_blocks,
)

EPS = 1_600_000  # quantized (scale=1024) squared L2; ~5% dup rate on testdata
SAMPLE_MOD = 20  # deterministic 1-in-20 id sample for the audit query


def semantic_dedup(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = K,
    iterations: int = ITERATIONS,
    scale: int = SCALE,
    eps: int = EPS,
) -> DataFrame:
    """Cluster ``vecs`` with integer Lloyd, then flag every vector
    that has a smaller-id within-cluster neighbor at integer squared
    L2 <= eps. Returns ``(id_col, cluster, is_dup)`` over all input
    vectors."""
    assign = kmeans_int(vecs, id_col, vec_col, k, iterations, scale).select(
        F.col(id_col).alias("vid"), "cluster"
    )
    q = _quantize(vecs, id_col, vec_col, scale)
    a = assign.join(q, "vid").select("vid", "cluster", "qv")
    dist = F.aggregate(
        F.zip_with(F.col("x.qv"), F.col("y.qv"), lambda p, r: (p - r) * (p - r)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dups = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .filter(dist <= F.lit(eps))
        .select(F.col("y.vid").alias("vid"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return assign.join(dups, "vid", "left").select(
        F.col("vid").alias(id_col),
        "cluster",
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
    )


def semantic_dedup_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = K,
    iterations: int = ITERATIONS,
    scale: int = SCALE,
    eps: int = EPS,
) -> str:
    """Extends the unrolled k-means WITH chain: within-cluster pairs,
    exact integer distance via the dimension-exploded relation, then
    the smaller-id-neighbor flag."""
    blocks, final = kmeans_oracle_blocks(
        table, id_col, vec_col, k, iterations, scale
    )
    blocks = blocks + [
        f"""pairs AS (
      SELECT a.vid AS ia, b.vid AS ib
      FROM {final} a JOIN {final} b
        ON a.cluster = b.cluster AND a.vid < b.vid),
    close_pairs AS (
      SELECT p.ia, p.ib
      FROM pairs p
      JOIN vdim va ON va.vid = p.ia
      JOIN vdim vb ON vb.vid = p.ib AND vb.dim = va.dim
      GROUP BY p.ia, p.ib
      HAVING sum((va.val - vb.val) * (va.val - vb.val)) <= {eps}),
    dups AS (SELECT DISTINCT ib FROM close_pairs)"""
    ]
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"""
    SELECT a.vid AS {id_col}, a.cluster,
           (d.ib IS NOT NULL) AS is_dup
    FROM {final} a LEFT JOIN dups d ON a.vid = d.ib
    """
    )
