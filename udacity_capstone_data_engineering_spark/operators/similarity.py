"""Similarity search over embedding columns (``array<float>``).

Two paths:
  - ``brute_force_topk``: exact cosine top-k via a blocked self-join —
    the correctness baseline, quadratic, fine at test scale and as the
    recall oracle for the approximate path.
  - ``lsh_topk``: multi-table random-hyperplane LSH — deterministic
    hyperplanes derived from md5 (no RNG state to ship); candidates are
    generated only WITHIN sign-pattern buckets, so the join cost scales
    with bucket sizes, not corpus². Bucketing and candidate scoring are
    Arrow-batched numpy matmuls (declared Python boundaries — measured
    4-5× faster than interpreted higher-order functions here); the
    shuffled data is ids only.

``brute_force_topk`` (the oracle-paired op) keeps builtin zip_with/
aggregate vector math in DOUBLE with left-to-right accumulation —
bit-stable across engines (see ``functions/vectors.py``). The approx
paths trade that portability for throughput; they are verified by
recall, not hash equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.vectors import cosine_similarity

# Live kernel broadcasts, content-keyed (ADVICE r7: each anchor query
# used to leave an up-to-256MiB broadcast pinned on the executors for
# the life of the session; a 201-query catalog run accretes them).
# Reuse within a session for identical corpora; evicted entries are
# unpersist(blocking=False)-ed — safe even if a stale plan still
# references one, since Spark re-ships an unpersisted broadcast from
# the driver on next use.
_KERNEL_BC: "dict[tuple, object]" = {}
_KERNEL_BC_MAX = 3


def _cached_broadcast(spark, key, build):
    """Content-keyed LRU of live TorrentBroadcasts (shared by every
    Arrow scan kernel — exact-cosine, LSH bucket index, IVF inverted
    file, PQ code table). Shipping the index through an explicit
    broadcast instead of UDF-closure capture matters twice over (r9):
    a closure is re-serialized to the python worker PER TASK — the 4×
    finer kernel partitions of the straggler fix turned that into
    ~128 × 200 MB of deserialization at sf10 (measured DOUBLING the
    sf1 lsh_self wall) — while a broadcast value is fetched once per
    worker process and cached. Evicted entries are
    unpersist(blocking=False)-ed — safe even if a stale plan still
    references one, since Spark re-ships an unpersisted broadcast
    from the driver on next use."""
    bc = _KERNEL_BC.get(key)
    if bc is None:
        bc = spark.sparkContext.broadcast(build())
        _KERNEL_BC[key] = bc
        while len(_KERNEL_BC) > _KERNEL_BC_MAX:
            old = _KERNEL_BC.pop(next(iter(_KERNEL_BC)))
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass  # already cleaned by context shutdown
    return bc


def _kernel_broadcast(spark, index: dict, mat, sumsq):
    import hashlib

    key = (
        "cosine",
        id(spark.sparkContext),
        mat.shape,
        hashlib.sha1(mat.tobytes()).hexdigest(),
        hashlib.sha1(repr(sorted(index)).encode()).hexdigest(),
    )
    return _cached_broadcast(spark, key, lambda: (index, mat, sumsq))


def _exact_cosine_kernel_pairs(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, ordered: bool = False
) -> DataFrame:
    """All-pairs exact cosine via a BROADCAST raw-vector matrix and an
    Arrow kernel whose accumulation is LEFT-TO-RIGHT over dims
    (``acc = acc + q[:, i] * c[:, i]``) — each IEEE double op is
    correctly rounded in the SAME order as the JVM ``aggregate`` fold
    and DuckDB's ``list_dot_product``, so the result is BIT-IDENTICAL
    to the expression path (pinned by
    test_pairwise_cosine_fast_path_bit_equal and the committed
    manifest digests), unlike ``einsum``'s SIMD/pairwise order. The n²
    join carries only id pairs; vectors live once per executor.

    This is the exact-anchor twin of ``_score_pairs``' serving kernel:
    that one is approximate-friendly (einsum over unit vectors), this
    one is oracle-grade. ~20x over the interpreted n² expression plan
    (the three exact anchors were the most expensive catalog rows).

    Degenerate inputs never crash (ADVICE r7): NULL or
    ragged-dimension vectors are excluded from the broadcast matrix and
    their pairs score NULL cosine — the same contract the expression
    path honors via null-propagating folds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    rows = (
        emb.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .collect()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64).reshape(
        len(rows), dim
    )
    sumsq = np.zeros(len(ids))
    for i in range(dim):  # left-to-right, matching the JVM fold
        sumsq = sumsq + mat[:, i] * mat[:, i]
    index = {int(v): p for p, v in enumerate(ids)}
    bc = _kernel_broadcast(spark, index, mat, sumsq)

    def score(qs, cs):
        idx, m, sq = bc.value
        if m.shape[0] == 0:  # nothing valid to score against
            return pd.Series(pd.array([pd.NA] * len(qs), dtype="Float64"))
        qi_f, ci_f = qs.map(idx), cs.map(idx)
        # ids excluded above (NULL / ragged vectors) are absent from the
        # index: their pairs get NULL cosine, like the expression path.
        known = qi_f.notna().to_numpy() & ci_f.notna().to_numpy()
        qi = qi_f.fillna(0).to_numpy(dtype=np.int64)
        ci = ci_f.fillna(0).to_numpy(dtype=np.int64)
        acc = np.zeros(len(qs))
        qm, cm = m[qi], m[ci]
        for i in range(m.shape[1]):  # left-to-right per pair
            acc = acc + qm[:, i] * cm[:, i]
        denom = np.sqrt(sq[qi]) * np.sqrt(sq[ci])
        ok = known & (denom > 0)
        out = np.zeros(len(qs))
        out[ok] = acc[ok] / denom[ok]
        res = pd.array(out, dtype="Float64")
        res[~ok] = pd.NA  # zero-norm/excluded -> SQL NULL
        return pd.Series(res)

    udf = pandas_udf(score, "double")
    ids_df = emb.select(F.col(id_col))
    pairs = ids_df.select(F.col(id_col).alias("query_id")).crossJoin(
        ids_df.select(F.col(id_col).alias("neighbor_id"))
    )
    pairs = pairs.filter(
        F.col("query_id") < F.col("neighbor_id")
        if ordered
        else F.col("query_id") != F.col("neighbor_id")
    )
    # UNROUNDED — callers that threshold must compare the raw double
    # (the oracle filters before rounding); display rounding is theirs.
    return pairs.select(
        "query_id",
        "neighbor_id",
        udf(F.col("query_id"), F.col("neighbor_id")).alias("cosine_raw"),
    )


def _pairwise_cosine(
    emb: DataFrame, id_col: str, vec_col: str, queries: DataFrame | None = None
) -> DataFrame:
    """(query id, candidate id, cosine) for all pairs, excluding self.

    r7 perf, bit-identical floats: under the broadcast byte cap the
    self-join anchors route through the exact-accumulation Arrow
    kernel (see ``_exact_cosine_kernel_pairs``); beyond it — or when a
    separate ``queries`` relation is supplied, whose vectors need not
    live in ``emb`` — the expression plan runs with per-side squared
    norms projected ONCE per row (n folds, not n²) and the per-pair
    dot as the unrolled scalar expression."""
    from udacity_capstone_data_engineering_spark.functions.vectors import (
        cosine_similarity_presq,
        dot,
        dot_unrolled,
    )

    head = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .head()
    )
    dim = int(head["d"]) if head is not None and head["d"] is not None else 0
    if queries is None and dim > 0:
        # gate on what will actually be broadcast: valid-vector rows only
        n = emb.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
        ).count()
        if n * dim * 8 <= BROADCAST_SCORE_MAX_BYTES:
            return _exact_cosine_kernel_pairs(
                emb, id_col, vec_col, dim
            ).select(
                "query_id",
                "neighbor_id",
                F.round("cosine_raw", 6).alias("cosine"),
            )
    q = (queries or emb).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        dot(vec_col, vec_col).alias("__qsq"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        dot(vec_col, vec_col).alias("__csq"),
    )
    joined = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    # dot_unrolled is only valid when `dim` covers BOTH arrays; a vector
    # LONGER than the probed dim would get its tail silently dropped
    # (ADVICE r7). Guard per pair: conforming rows take the codegen
    # unrolled sum, anything else (ragged, NULL — size(NULL) is NULL so
    # the condition routes to otherwise) falls back to the zip_with
    # fold, whose null padding yields NULL exactly as before.
    dotp = (
        F.when(
            (F.size("qv") == dim) & (F.size("cv") == dim),
            dot_unrolled("qv", "cv", dim),
        ).otherwise(dot("qv", "cv"))
        if dim > 0
        else dot("qv", "cv")
    )
    return joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity_presq(dotp, F.col("__qsq"), F.col("__csq")), 6
        ).alias("cosine"),
    )


# Safety margin for the top-k kernel's candidate cut (see
# _topk_margin_candidates): ranking happens on round(cosine, 6), and
# |round(x) - x| <= 5e-7, so a candidate can out-rank the k-th raw
# score by at most 1e-6 after rounding. 2e-6 doubles that bound so a
# float comparison at the boundary can never exclude a true top-k row.
_TOPK_ROUND_MARGIN = 2e-6


def _strict_kernel_matrix(emb: DataFrame, id_col: str, vec_col: str):
    """Collect ``(ids, mat, sumsq)`` for the self-pair fast kernels —
    or None when ANY row is degenerate (NULL / ragged / non-finite /
    zero-norm vectors, duplicate or non-long ids) or the corpus is
    over ``BROADCAST_SCORE_MAX_BYTES``: those shapes carry NULL-cosine
    semantics only the n² pair plan implements, so callers fall back.
    ``sumsq`` accumulates left-to-right per dimension, matching the
    JVM fold bit-for-bit."""
    import numpy as np
    from pyspark.sql.types import LongType

    if not isinstance(emb.schema[id_col].dataType, LongType):
        return None
    head = emb.select(F.size(F.col(vec_col)).alias("d")).head()
    if head is None or head["d"] is None:
        return None
    dim = int(head["d"])
    if dim <= 0:
        return None
    max_rows = BROADCAST_SCORE_MAX_BYTES // (8 * dim)
    pdf = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .limit(max_rows + 1)
        .toPandas()
    )
    n = len(pdf)
    if n == 0 or n > max_rows:
        return None
    vecs = pdf.iloc[:, 1]
    if vecs.isna().any() or pdf[id_col].isna().any():
        return None
    lens = vecs.map(len).to_numpy()
    if (lens != dim).any():
        return None
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    if len(np.unique(ids)) != n:
        return None
    mat = np.vstack(vecs.to_numpy()).astype(np.float64)
    if not np.isfinite(mat).all():
        return None
    sumsq = np.zeros(n)
    for i in range(dim):  # left-to-right, matching the JVM fold
        sumsq = sumsq + mat[:, i] * mat[:, i]
    if (sumsq <= 0).any():  # zero-norm rows score NULL in the slow path
        return None
    return ids, mat, sumsq


def _topk_margin_candidates(
    emb: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame | None:
    """Self-top-k fast path (r11, guide §2.3/§4.2): emit only the
    ~n·k candidate pairs that can possibly survive the rounded-cosine
    ranking, instead of materializing all n² pairs through the Arrow
    scorer and shuffling them into the window.

    The per-pair kernel (``_exact_cosine_kernel_pairs``) is already
    broadcast-based, but the PAIR STREAM it scores is n² rows: at the
    2 000-vector gate corpus that is 4M rows crossing Arrow both ways
    plus a 4M-row exchange for the rank window — measured 12.3 s for
    ``embedding_cosine_topk`` (r10 bench), ~1 s of which is arithmetic.
    Here each query row scores against the SAME broadcast matrix with
    the SAME left-to-right dim accumulation (bit-identical doubles, see
    below) and locally cuts to the candidates with raw cosine within
    ``_TOPK_ROUND_MARGIN`` of the k-th largest.  Downstream rounding +
    window ranking is unchanged, so the final rows are provably the
    rows the n² plan produces:

      ranking is by round(raw, 6) DESC with |round(x)-x| <= 5e-7, so
      any candidate that beats the k-th by rounded order satisfies
      raw >= raw_k - 1e-6, where raw_k is the k-th largest raw score —
      every such row is kept (margin 2e-6), ties included.

    Returns the slim (query_id, neighbor_id, cosine_raw) relation, or
    None when the corpus is not eligible — over the broadcast byte
    cap, fewer than k+1 rows, or ANY degenerate row (NULL / ragged /
    non-finite / zero-norm vectors, duplicate ids), in which case the
    caller falls back to the n² pair plan whose NULL-cosine semantics
    the degenerate rows need."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    got = _strict_kernel_matrix(emb, id_col, vec_col)
    if got is None:
        return None
    ids, mat, sumsq = got
    n = len(ids)
    if n <= k:  # fewer than k neighbors: NULL-padding is the n² plan's
        return None
    index = {int(v): p for p, v in enumerate(ids)}
    bc = _kernel_broadcast(spark, index, mat, sumsq)

    def gen(batches):
        idx, m, sq = bc.value
        nn, d = m.shape
        inv = np.empty(nn, dtype=np.int64)
        for vid, pos in idx.items():
            inv[pos] = vid
        roots = np.sqrt(sq)
        # <=64 MB of double score scratch per block regardless of n
        block = max(8, (8 << 20) // max(nn, 1))
        for pdf_in in batches:
            qids = pdf_in["query_id"].to_numpy(dtype=np.int64)
            for s in range(0, len(qids), block):
                qb = qids[s : s + block]
                qi = np.fromiter(
                    (idx[int(v)] for v in qb), dtype=np.int64, count=len(qb)
                )
                qm = m[qi]
                acc = np.zeros((len(qb), nn))
                for i in range(d):  # left-to-right per pair, as the
                    # pair kernel's fold — bit-identical accumulation
                    acc = acc + qm[:, i][:, None] * m[:, i][None, :]
                denom = roots[qi][:, None] * roots[None, :]
                scores = acc / denom
                scores[np.arange(len(qb)), qi] = -np.inf  # exclude self
                kth = np.partition(scores, nn - k, axis=1)[:, nn - k]
                keep = scores >= (kth - _TOPK_ROUND_MARGIN)[:, None]
                rows, cols = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "query_id": qb[rows],
                        "neighbor_id": inv[cols],
                        "cosine_raw": scores[rows, cols],
                    }
                )

    from udacity_capstone_data_engineering_spark.sources.catalog import (
        fan_out_small_scan,
    )

    qsrc = fan_out_small_scan(
        emb.select(F.col(id_col).alias("query_id"))
    )
    return qsrc.mapInPandas(
        gen, schema="query_id long, neighbor_id long, cosine_raw double"
    )


def _threshold_pairs_kernel(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame | None:
    """Ordered self-pairs (id_a < id_b) with RAW cosine >= threshold,
    computed inside one Arrow scan against the broadcast matrix — the
    exact-tier near-dup shape (``embedding_dup_pairs``). The n² plan
    filters on the UNROUNDED kernel double, and this kernel reproduces
    that double bit-for-bit (same left-to-right accumulation, same
    sqrt/divide), so emitting only passing pairs is exactly the
    filter — no margin lemma needed. Pairs with a degenerate side
    score NULL in the n² plan and NULL fails the >= filter, so those
    rows were never emitted there either; still, degenerate corpora
    fall back (None) so both plans stay row-identical everywhere.
    Returns (query_id, neighbor_id, cosine_raw) or None if ineligible."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    got = _strict_kernel_matrix(emb, id_col, vec_col)
    if got is None:
        return None
    ids, mat, sumsq = got
    index = {int(v): p for p, v in enumerate(ids)}
    bc = _kernel_broadcast(spark, index, mat, sumsq)

    def gen(batches):
        idx, m, sq = bc.value
        nn, d = m.shape
        inv = np.empty(nn, dtype=np.int64)
        for vid, pos in idx.items():
            inv[pos] = vid
        roots = np.sqrt(sq)
        block = max(8, (8 << 20) // max(nn, 1))
        for pdf_in in batches:
            qids = pdf_in["query_id"].to_numpy(dtype=np.int64)
            for s in range(0, len(qids), block):
                qb = qids[s : s + block]
                qi = np.fromiter(
                    (idx[int(v)] for v in qb), dtype=np.int64, count=len(qb)
                )
                qm = m[qi]
                acc = np.zeros((len(qb), nn))
                for i in range(d):  # left-to-right per pair
                    acc = acc + qm[:, i][:, None] * m[:, i][None, :]
                scores = acc / (roots[qi][:, None] * roots[None, :])
                keep = (scores >= threshold) & (
                    qb[:, None] < inv[None, :]  # ordered pairs only
                )
                rows, cols = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "query_id": qb[rows],
                        "neighbor_id": inv[cols],
                        "cosine_raw": scores[rows, cols],
                    }
                )

    from udacity_capstone_data_engineering_spark.sources.catalog import (
        fan_out_small_scan,
    )

    qsrc = fan_out_small_scan(emb.select(F.col(id_col).alias("query_id")))
    return qsrc.mapInPandas(
        gen, schema="query_id long, neighbor_id long, cosine_raw double"
    )


def brute_force_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine (ties → lower id first)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    if queries is None:
        fast = _topk_margin_candidates(emb, id_col, vec_col, k)
        if fast is not None:
            return (
                fast.select(
                    "query_id",
                    "neighbor_id",
                    F.round("cosine_raw", 6).alias("cosine"),
                )
                .withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k)
                .select("query_id", "neighbor_id", "cosine", "rnk")
            )
    scored = _pairwise_cosine(emb, id_col, vec_col, queries)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


JL_SCALE = 1024  # same quantization grid as embedding_random_projection


def _jl_sign_matrix(in_dim: int, out_dims: int) -> list[list[int]]:
    """Deterministic Achlioptas ±1 sign matrix: sign(i, j) =
    1 - 2*(h60(f"{i}_{j}") % 2), the SAME portable-md5 formula the
    `embedding_random_projection` catalog query hash-gates — so the
    projection used for ANN preprocessing is the one the oracle
    already verifies bit-for-bit."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        [1 - 2 * (h60(f"{i}_{j}") % 2) for i in range(in_dim)]
        for j in range(out_dims)
    ]


def jl_project(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    out_dims: int,
    dim: int | None = None,
    scale: int = JL_SCALE,
) -> DataFrame:
    """Map-only Johnson-Lindenstrauss projection (VERDICT r6 #7 — the
    r6 standalone demo composed into the ANN tier): quantize to the
    integer grid, multiply by the LITERAL ±1 sign matrix (out_dims x
    dim ints embedded in the plan — no sign-matrix join, no shuffle,
    no runtime hashing), emit ``array<double>`` of the exact integer
    sums. Cosine on the projected vectors approximates cosine on the
    originals with the JL (1±eps) distance guarantee; determinism is
    exact (integer sums are order-free). At 100 TB this is scan-bound
    preprocessing: per-row flops drop every downstream index build by
    dim/out_dims (64→16 = 4x)."""
    if dim is None:
        head = emb.select(F.size(F.col(vec_col)).alias("d")).head()
        dim = int(head["d"]) if head is not None else 0
    # One parsed SQL literal, not out_dims*dim F.lit() calls: the
    # 16x64 sign matrix cost ~2.5 s of driver wall in py4j round-trips
    # (r11, guide §1.2 driver-side; values and INT element type are
    # identical).
    signs = F.expr(
        "CAST(array("
        + ",".join(
            "array(" + ",".join(str(int(s)) for s in row) + ")"
            for row in _jl_sign_matrix(dim, out_dims)
        )
        + ") AS ARRAY<ARRAY<INT>>)"
    )
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    proj = F.transform(
        signs,
        lambda row: F.aggregate(
            F.zip_with(qv, row, lambda a, s: a * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double"),
    )
    return emb.select(F.col(id_col), proj.alias(vec_col))


MANIFOLD_LATENT = 8  # intrinsic dimension of the structured fixture
MANIFOLD_GRID = 1000  # latent coordinates live on a +-1 integer grid


def manifold_embeddings(
    ids: DataFrame,
    id_col: str,
    out_dim: int = 64,
    latent: int = MANIFOLD_LATENT,
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic LOW-INTRINSIC-DIMENSION embedding corpus
    (VERDICT r7 #7): each id gets a ``latent``-dim coordinate
    z_j = (h60(id || '_' || j) % (2*grid+1) - grid) / grid  in [-1, 1]
    (the house portable-md5 hash — no RNG state, any engine can
    reproduce it), embedded into ``out_dim`` dims by a FIXED
    md5-derived literal mixing matrix. The corpus therefore lies
    exactly on an ``latent``-dimensional linear manifold inside
    R^out_dim — the structure real text/image embeddings have and the
    isotropic test corpus (JL's worst case by construction) lacks.
    This is the fixture the ``project_dims=`` JL hook exists for:
    distances here are governed by ``latent`` effective dimensions, so
    a 4x projection preserves neighbor margins instead of destroying
    O(1/sqrt(dim)) near-ties. Map-only expression plan (8 md5 calls +
    a literal out_dim x latent multiply-add per row), scan-bound at
    any scale."""
    from udacity_capstone_data_engineering_spark.functions.hashing import (
        portable_hash64,
    )

    mod = 2 * MANIFOLD_GRID + 1

    def h60(s: str) -> int:
        import hashlib

        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    mix = [
        [
            (h60(f"mix_{i}_{j}") % mod - MANIFOLD_GRID) / MANIFOLD_GRID
            for j in range(latent)
        ]
        for i in range(out_dim)
    ]
    z = [
        (
            (
                portable_hash64(
                    F.concat(F.col(id_col).cast("string"), F.lit(f"_{j}"))
                )
                % mod
                - MANIFOLD_GRID
            ).cast("double")
            / MANIFOLD_GRID
        ).alias(f"__z{j}")
        for j in range(latent)
    ]
    # r11 (guide §1.2 driver-side): the old mixing build issued
    # out_dim*latent*3 ≈ 1500 py4j Column calls (~2.5 s of driver wall
    # per call — the bulk of jl_manifold_capture's jobs-vs-wall gap).
    # The latent coordinates are BOUND columns (each referenced
    # out_dim times, so CollapseProject cannot re-inline the md5
    # hashes), and the mixing matrix enters as ONE parsed expression.
    # Term order and association are unchanged:
    # ((0.0 + m_i0*z0) + m_i1*z1) + ... with D-suffixed double
    # literals that parse to the identical IEEE doubles repr() emits.
    bound = ids.select(F.col(id_col), *z)
    out = F.expr(
        "array("
        + ",".join(
            _sum_terms_sql(
                [f"({mix[i][j]!r}D * __z{j})" for j in range(latent)]
            )
            for i in range(out_dim)
        )
        + ")"
    )
    return bound.select(F.col(id_col), out.alias(vec_col))


def _sum_terms_sql(terms: list[str]) -> str:
    """Left-associated ``((0.0 + t0) + t1) + ...`` — the exact fold
    Python's ``sum(..., F.lit(0.0))`` built, as a SQL string."""
    acc = "0.0D"
    for t in terms:
        acc = f"({acc} + {t})"
    return acc


def _exact_rerank_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    cand: DataFrame,
    k: int,
) -> DataFrame:
    """Exact-cosine rerank of candidate (query_id, neighbor_id) pairs
    in the ORIGINAL vector space — brute_force_topk's scoring and tie
    rule, restricted to the candidate set."""
    scored = _score_pairs(emb, id_col, vec_col, cand.select("query_id", "neighbor_id"))
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


def _lsh_key_fn(dim: int, planes: int, tables: int, probes: int):
    """The pure numpy probe-key machinery shared by the DataFrame
    bucketing UDF and the in-UDF scan kernel, so both paths produce
    BYTE-IDENTICAL key sequences for the same raw vectors.  Returns
    ``(fn, n_probes)`` where ``fn(x)`` maps a (batch × dim) RAW float
    matrix to (batch × tables·(n_probes+1)) int64 keys laid out
    [t0r0, t0r1, …, t1r0, …] (just (batch × tables) when n_probes is
    0).  Keys must be computed from RAW vectors (as the bucketing UDF
    always has): signs and margin ORDER are scale-invariant, but
    dividing by the norm can collapse near-tied margins differently
    in the last ulp."""
    import itertools

    import numpy as np

    hmat = np.array(
        [
            _hyperplane(dim, t, p)
            for t in range(tables)
            for p in range(planes)
        ],
        dtype=np.float64,
    ).T  # (dim, tables*planes)
    weights = (2 ** np.arange(planes, dtype=np.int64))[None, None, :]
    if planes >= 3:
        universe = max(3, -(-planes // 2))  # ceil(planes/2)
        subsets = [
            s
            for r in range(1, universe + 1)
            for s in itertools.combinations(range(universe), r)
        ]
        n_probes = min(probes, len(subsets))
    else:
        subsets = []
        n_probes = min(probes, planes)

    def fn(x):
        proj = (x @ hmat).reshape(len(x), tables, planes)
        bits = proj > 0
        keys = (bits * weights).sum(axis=2, dtype=np.int64)
        if not n_probes:
            return keys
        margins = np.abs(proj)
        order = np.argsort(margins, axis=2)
        if planes < 3:
            out = np.empty((len(x), tables * (n_probes + 1)), dtype=np.int64)
            out[:, :: n_probes + 1] = keys
            for r in range(n_probes):
                out[:, r + 1 :: n_probes + 1] = keys ^ (
                    np.int64(1) << order[:, :, r]
                )
            return out
        n_univ = max(p for s in subsets for p in s) + 1
        low = order[:, :, :n_univ]
        mlow = np.take_along_axis(margins, low, axis=2)
        scores = np.stack(
            [mlow[:, :, list(s)].sum(axis=2) for s in subsets], axis=2
        )
        masks = np.zeros(scores.shape, dtype=np.int64)
        for si, s in enumerate(subsets):
            for pos in s:
                masks[:, :, si] |= np.int64(1) << low[:, :, pos]
        rank = np.argsort(scores, axis=2, kind="stable")[:, :, :n_probes]
        probe_keys = keys[:, :, None] ^ np.take_along_axis(masks, rank, axis=2)
        out = np.concatenate([keys[:, :, None], probe_keys], axis=2)
        return out.reshape(len(x), -1)

    return fn, n_probes


def lsh_bucket_keys(
    emb: DataFrame,
    vec_col: str,
    dim: int,
    planes: int = 4,
    tables: int = 16,
    probes: int = 0,
) -> DataFrame:
    """Append (table, probe_rank, bucket) LSH keys: bucket bit p =
    sign(v · hyperplane_{table,p}). Multi-table is the standard recall
    lever for random-hyperplane LSH: each extra table is an
    independent chance for true neighbors to collide.

    ``probes > 0`` adds QUERY-DIRECTED multiprobe keys (Lv et al.):
    per table, also the ``probes`` buckets reached by the
    margin-ordered PERTURBATION SEQUENCE — the non-empty subsets of
    the table's three lowest-|margin| sign bits, ranked per row by the
    summed margin of the flipped bits (the likelihood a true neighbor
    lands exactly there). probe_rank 0 is the exact key; ranks
    1..probes walk the sequence. Multi-bit subsets matter once planes
    auto-grow with the corpus: with 6+ planes a boundary miss
    increasingly flips TWO bits, and single-bit probing plateaus
    (measured recall 0.93 at 16 tables × 2 single-bit probes on 2000
    vectors, vs 0.97+ from the same probe count drawn from the ranked
    subset sequence). Directed probing stays the cost sweet spot vs
    more tables: each probe adds probe-side rows only, while a table
    adds build-side rows AND an independent hash family.

    All tables×planes projections are ONE Arrow-batched matmul against
    the (dim × tables·planes) hyperplane matrix — the measured
    pandas-UDF sweet spot (compute ≫ transfer; interpreted per-plane
    ``aggregate`` costs tables×planes×dim lambda evaluations per row).
    Sign bits, margins, subset scores, and flips all stay numpy-side;
    the explode multiplies rows by tables×(probes+1) (cheap: ids +
    small ints)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Perturbation universe note (lives in _lsh_key_fn): non-empty
    # subsets of the U lowest-margin bits, U = max(3, ceil(planes/2))
    # — U must GROW with key width or the probe sequence saturates
    # (measured recall 0.96 → 0.61 from 2k to 20k vectors, r3).
    keyfn, n_probes = _lsh_key_fn(dim, planes, tables, probes)

    def buckets(v):
        x = np.vstack(v.to_numpy())  # (batch, dim)
        return pd.Series(list(keyfn(x)))

    # optimizer fence (r9): the downstream posexplode makes
    # InferFiltersFromGenerate infer `size(__keys) > 0` and push it —
    # with the whole bucketing UDF inside — below any upstream
    # exchange, re-running the full keying a second time on the raw
    # scan layout (see _lsh_scan_candidates_udf for the measured
    # diagnosis). asNondeterministic pins one evaluation, in place.
    udf = pandas_udf(buckets, "array<long>").asNondeterministic()
    keyed = emb.select("*", udf(F.col(vec_col).cast("array<double>")).alias("__keys"))
    stride = n_probes + 1
    exploded = keyed.select(
        *emb.columns, F.posexplode("__keys").alias("__idx", "bucket")
    )
    return exploded.select(
        *emb.columns,
        (F.col("__idx") / stride).cast("int").alias("table"),
        (F.col("__idx") % stride).alias("probe_rank"),
        "bucket",
    )


# Above this many MATRIX BYTES (n_vectors × dim × 8), fall back to
# join-based pair scoring instead of broadcasting the normalized vector
# matrix to every worker. Sized in measured bytes, not vector count,
# because driver/executor heap cost scales with dim too (VERDICT r1
# "What's wrong" #3). 256 MiB keeps the driver-side numpy copy + the
# torrent broadcast comfortably inside an 8g driver; tune per cluster.
BROADCAST_SCORE_MAX_BYTES = 256 * 1024 * 1024


def _unit_vectors(emb, id_col: str, vec_col: str):
    """(id, uv) with uv the L2-normalized double vector; zero-norm →
    NULL uv (ANSI /0 raises), which yields NULL cosine ranked last —
    degenerate vectors never crash the job.

    r11 (guide §4.2/§4.4): the normalize runs as an Arrow kernel
    instead of the interpreted ``aggregate``+``transform`` fold, and —
    because every caller filters ``uv IS NOT NULL`` right above this
    projection — the old expression plan ALSO paid the §4.4 pushdown
    tax: Catalyst pushed ``isnotnull(<whole normalize expression>)``
    below the projection, evaluating the l2 fold twice per row (the
    r11 filter audit flagged a 925-char HOF condition in every ANN
    plan). ``mapInArrow`` is an optimizer-opaque boundary, so the
    filter stays above and the normalize runs once. Every consumer is
    a declared-Arrow ANN path (encode/assign kernels, ADC scans,
    ``_score_pairs``).

    BIT-IDENTICAL doubles to the JVM expression: sumsq accumulates
    LEFT-TO-RIGHT per dimension exactly like the ``aggregate`` fold;
    ``np.sqrt`` and the per-element divide are the same
    correctly-rounded IEEE ops. Degenerate semantics replicated
    exactly (pinned by ``test_unit_vectors_kernel_bit_equal``):
    NULL vector / any NULL element / zero norm → NULL uv; a NaN norm
    passes the ``when(__n > 0)`` gate (Spark orders NaN greater than
    every number) so NaN/±inf elements propagate NaN into uv — the
    output is built with explicit pyarrow buffers because the pandas
    return path would silently rewrite those NaN elements to nulls."""
    import numpy as np
    import pyarrow as pa

    def normalize(batches):
        for rb in batches:
            ids = rb.column(0)
            vecs = rb.column(1)
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            n_rows = len(vecs)
            out_vals: list = [None] * n_rows
            live: list = []
            offs = vecs.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offs)
            if (
                vecs.null_count == 0
                and vecs.values.null_count == 0
                and n_rows > 0
                and lens.min(initial=1) == lens.max(initial=1) != 0
            ):
                # Fixed-dim, no-null batch (the real corpus shape):
                # one zero-copy reshape, no per-cell accessor churn.
                flat_in = vecs.values.to_numpy(zero_copy_only=False)
                live = [
                    (p, row)
                    for p, row in enumerate(
                        np.asarray(flat_in, dtype=np.float64).reshape(
                            n_rows, int(lens[0])
                        )
                    )
                ]
            else:
                for p in range(n_rows):
                    cell = vecs[p]
                    if not cell.is_valid:
                        continue
                    a = cell.values.to_numpy(zero_copy_only=False)
                    if cell.values.null_count or a.shape[0] == 0:
                        # NULL element → NULL fold → NULL uv; empty →
                        # norm 0 → NULL uv, as the expression path
                        continue
                    live.append((p, np.asarray(a, dtype=np.float64)))
            by_len: dict[int, list] = {}
            for p, a in live:
                by_len.setdefault(a.shape[0], []).append((p, a))
            for d, rows in by_len.items():
                x = np.vstack([a for _, a in rows])
                acc = np.zeros(len(rows))
                for i in range(d):  # left-to-right, matching the JVM fold
                    acc = acc + x[:, i] * x[:, i]
                n = np.sqrt(acc)
                # when(__n > 0): Spark compares NaN greater than any
                # number, so NaN norms PASS and propagate NaN elements.
                ok = (n > 0) | np.isnan(n)
                u = x / np.where(ok, n, 1.0)[:, None]
                for r in np.nonzero(ok)[0]:
                    out_vals[rows[int(r)][0]] = u[int(r)]
            # Explicit ListArray build: values buffer keeps true NaNs
            # (pandas' from_pandas path would null them out).
            offsets = np.zeros(n_rows + 1, dtype=np.int32)
            for p in range(n_rows):
                offsets[p + 1] = offsets[p] + (
                    len(out_vals[p]) if out_vals[p] is not None else 0
                )
            flat = (
                np.concatenate([v for v in out_vals if v is not None])
                if offsets[-1]
                else np.zeros(0, dtype=np.float64)
            )
            mask = pa.array([v is None for v in out_vals], type=pa.bool_())
            uv = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, type=pa.float64()),
                mask=mask,
            )
            yield pa.RecordBatch.from_arrays([ids, uv], ["__id", "uv"])

    id_type = emb.schema[id_col].dataType.simpleString()
    return (
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        )
        .mapInArrow(normalize, f"__id {id_type}, uv array<double>")
        .select(F.col("__id").alias(id_col), "uv")
    )


def _collect_unit_matrix(emb, id_col: str, vec_col: str, dim: int):
    """Collect (ids, L2-normalized matrix) to the driver iff the corpus
    fits ``BROADCAST_SCORE_MAX_BYTES``; returns ``(ids, mat)`` or None.

    One Arrow job replaces three (count + dim-probe + full collect):
    the byte cap is enforced with a LIMIT of cap/(8·dim)+1 rows — if
    the limited collect comes back full, the corpus is over the cap
    and the caller takes the join path (and pays a real count). At
    100 TB the limit stops the scan after the first partitions; the
    driver never sees more than the cap + one row. The RAW vectors are
    collected and normalized in one numpy pass — measured faster than
    evaluating the per-element ``transform`` normalization JVM-side
    just to re-collect the result. Zero-norm rows are dropped (they
    have no direction; scoring surfaces them as NULL cosine).
    """
    import numpy as np

    max_rows = BROADCAST_SCORE_MAX_BYTES // (8 * max(dim, 1))
    pdf = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .filter(F.col(vec_col).isNotNull())
        .limit(max_rows + 1)
        .toPandas()
    )
    if len(pdf) > max_rows:
        return None
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = (
        np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
        if len(pdf)
        else np.zeros((0, dim), dtype=np.float64)
    )
    norms = np.linalg.norm(mat, axis=1)
    keep = norms > 0
    mat = mat[keep] / norms[keep][:, None]
    return ids[keep], mat


# Above this many BUILD-SIDE BYTES (n_vectors × tables × ~24 b/row of
# id+table+bucket ints), stop broadcasting the exact-key side of the
# LSH candidate join and let it shuffle. Same philosophy as
# BROADCAST_SCORE_MAX_BYTES: measured bytes, not row counts.
BROADCAST_BUILD_MAX_BYTES = 64 * 1024 * 1024

# Estimated candidate MULTISET rows (n_queries × tables × (probes+1) ×
# mean bucket size) above which lsh_topk's in-UDF scan kernel beats the
# candidate join: the join materializes the multiset through a
# distinct shuffle, the kernel never leaves the Python worker.
# Measured crossover: join 3.7 s at ~12M rows (2k vectors) vs kernel
# 352 s → ~35 s at ~380M rows (20k). Same discipline as
# ivf._PAIR_JOIN_MAX_PAIRS.
LSH_JOIN_MAX_CANDIDATES = 32_000_000


def _collect_raw_matrix(emb, id_col, vec_col, dim):
    """Like :func:`_collect_unit_matrix` but returns
    ``(ids, raw, unit)`` sorted by id, KEEPING zero-norm rows (their
    unit row is zeroed): the scan kernel must compute bucket keys from
    the RAW vectors — exactly the bytes the bucketing UDF sees — and
    zero-norm rows are bucket members in the join path too.  ``None``
    past the byte cap."""
    import numpy as np

    max_rows = BROADCAST_SCORE_MAX_BYTES // (8 * max(dim, 1))
    pdf = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .filter(F.col(vec_col).isNotNull())
        .limit(max_rows + 1)
        .toPandas()
    )
    if len(pdf) > max_rows:
        return None
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    raw = (
        np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
        if len(pdf)
        else np.zeros((0, dim), dtype=np.float64)
    )
    order = np.argsort(ids, kind="stable")
    ids, raw = ids[order], raw[order]
    norms = np.linalg.norm(raw, axis=1, keepdims=True)
    safe = np.where(norms == 0, 1.0, norms)
    unit = raw / safe
    unit[norms[:, 0] == 0] = 0.0
    return ids, raw, unit


def _bucket_index(corpus_keys):
    """(table, exact key) → id-sorted positions dict from a corpus key
    matrix (n × tables int64) — shared by the broadcast scan kernel and
    the per-shard builds of the sharded grid kernel, so both regimes
    gather identical bucket membership for identical key matrices."""
    import numpy as np

    n_tables = corpus_keys.shape[1] if corpus_keys.ndim == 2 else 1
    index: dict[tuple[int, int], object] = {}
    for t in range(n_tables):
        kt = corpus_keys[:, t]
        order = np.argsort(kt, kind="stable")
        sk = kt[order]
        bounds = np.flatnonzero(np.diff(sk)) + 1
        for grp in np.split(order, bounds):
            if len(grp):
                index[(t, int(kt[grp[0]]))] = np.sort(grp)
    return index


# Query rows per block in the sharded LSH grid join — bounds the
# per-task pandas group (block × dim raw doubles); same figure as
# pq.ADC_QUERY_BLOCK_ROWS (kept separate to avoid a similarity→pq
# import cycle).
LSH_QUERY_BLOCK_ROWS = 4096


def _sharded_lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    planes: int,
    tables: int,
    multiprobe: int,
    queries: DataFrame | None,
    n: int,
    n_q: int,
    cap: int,
) -> DataFrame:
    """LSH top-k PAST the broadcast byte cap (VERDICT r10 #1): the
    cell-sharded grid pattern of ``pq._sharded_adc_candidates`` applied
    to bucket indexes, replacing the bucket-JOIN regime whose
    pair-scoring join shipped unit vectors through a
    tables·probes·bucket² candidate multiset and was MEASURED spilling
    >60 GB of shuffle to local-disk exhaustion at 2M vectors × 2k
    queries (SCALING.md third-decade probe, r10).

    Shape: the corpus is hash-sharded on id so each shard's raw matrix
    fits ``cap`` bytes; queries are hash-blocked
    (``LSH_QUERY_BLOCK_ROWS``); a cogrouped ``applyInPandas`` grid join
    scans each (query-block × shard) cell — build the SHARD's bucket
    index with the same ``_lsh_key_fn`` machinery as the broadcast
    kernel (raw vectors in, byte-identical keys out), probe, gather,
    score the gathered unit rows, emit the per-(query, shard)
    top-``k+8`` with exact row-wise-einsum cosines — and a query-keyed
    window merges shards to the final top-k. Because shards partition
    every bucket, the union of per-shard top-(k+8) sets contains the
    broadcast kernel's global top-(k+8), and the merge key
    (cosine desc, id asc) is the kernel path's — the forced-tiny-cap
    regime test pins row equality against it. Nothing corpus-sized is
    ever broadcast or carried through a join: the shuffled volume is
    corpus×n_blocks + queries×n_shards rows (the standard grid trade),
    and candidates leave each task already cut to k+8 per query.

    Zero-norm rows follow the kernel-path contract: as candidates they
    score −inf in selection and NULL cosine in the output; a zero-norm
    query gets NULL cosines throughout (ranked by id, NULLs last)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    take = k + 8
    corpus_keyfn, _ = _lsh_key_fn(dim, planes, tables, 0)
    probe_keyfn, n_probes = _lsh_key_fn(dim, planes, tables, multiprobe)
    n_blocks = max(1, -(-n_q // LSH_QUERY_BLOCK_ROWS))
    # the grid's task count is n_shards × n_blocks: a serving batch
    # (one query block) against a 4-shard corpus would otherwise run
    # on 4 of the cluster's cores. Shards may be FINER than the byte
    # cap requires — per-(query,row) work is shard-independent, total
    # bucket work is partitioned not replicated — so size the shard
    # count up to ~2 tasks/core; only per-task corpus keying and the
    # per-shard probe overhead grow, both sublinear in n_shards.
    par = max(1, spark.sparkContext.defaultParallelism)
    n_shards = max(
        2,
        -(-(n * dim * 8) // max(cap, 1)),
        min(-(-2 * par // n_blocks), 4 * par),
    )

    qsrc = (queries if queries is not None else emb).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).filter(F.col("qv").isNotNull())
    left = qsrc.crossJoin(
        F.broadcast(
            spark.range(n_shards).select(F.col("id").cast("int").alias("__shard"))
        )
    ).withColumn(
        "__qb", F.pmod(F.xxhash64("query_id"), F.lit(n_blocks)).cast("int")
    )
    right = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .withColumn(
            "__shard", F.pmod(F.xxhash64("id"), F.lit(n_shards)).cast("int")
        )
        .crossJoin(
            F.broadcast(
                spark.range(n_blocks).select(
                    F.col("id").cast("int").alias("__qb")
                )
            )
        )
    )

    def scan(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame(
                {
                    "query_id": pd.array([], dtype="int64"),
                    "neighbor_id": pd.array([], dtype="int64"),
                    "cosine": pd.array([], dtype="Float64"),
                }
            )
        rpdf = rpdf.sort_values("id")
        ids = rpdf["id"].to_numpy(dtype=np.int64)
        raw = np.vstack(rpdf["v"].to_numpy()).astype(np.float64)
        # the same normalization arithmetic as _collect_unit_matrix /
        # _collect_raw_matrix: elementwise x / ||x||, zero-norm rows
        # zeroed — identical operand values give bit-identical units
        norms = np.linalg.norm(raw, axis=1, keepdims=True)
        safe = np.where(norms == 0, 1.0, norms)
        unit = raw / safe
        zero_mask = norms[:, 0] == 0
        unit[zero_mask] = 0.0
        index = _bucket_index(corpus_keyfn(raw))
        x = np.vstack(lpdf["qv"].to_numpy()).astype(np.float64)
        qids = lpdf["query_id"].to_numpy(dtype=np.int64)
        qnorms = np.linalg.norm(x, axis=1, keepdims=True)
        xq = x / np.where(qnorms == 0, 1.0, qnorms)
        qzero = qnorms[:, 0] == 0
        pk = probe_keyfn(x).reshape(len(x), tables, n_probes + 1)
        out_q, out_i, out_c, out_na = [], [], [], []
        for qi in range(len(x)):
            parts = [
                arr
                for t in range(tables)
                for r in range(n_probes + 1)
                if (arr := index.get((t, int(pk[qi, t, r])))) is not None
            ]
            if not parts:
                continue
            pos = np.unique(np.concatenate(parts))
            s = unit[pos] @ xq[qi]
            s[zero_mask[pos]] = -np.inf
            top = np.argsort(-s, kind="stable")[: min(take, len(pos))]
            sel = pos[top]
            # exact emitted score: ROW-WISE einsum over the unit rows —
            # the same op/order as _score_pairs' broadcast kernel, so
            # the forced-cap regime test compares bit-identical doubles
            cos = np.einsum(
                "ij,ij->i",
                unit[sel],
                np.broadcast_to(xq[qi], (len(sel), unit.shape[1])),
            )
            out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
            out_i.append(ids[sel])
            out_c.append(cos)
            out_na.append(zero_mask[sel] | qzero[qi])
        if not out_q:
            return pd.DataFrame(
                {
                    "query_id": pd.array([], dtype="int64"),
                    "neighbor_id": pd.array([], dtype="int64"),
                    "cosine": pd.array([], dtype="Float64"),
                }
            )
        cvals = pd.array(np.concatenate(out_c), dtype="Float64")
        na = np.concatenate(out_na)
        if na.any():
            cvals[na] = pd.NA
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_i),
                "cosine": cvals,
            }
        )

    cand = (
        left.groupBy("__shard", "__qb")
        .cogroup(right.groupBy("__shard", "__qb"))
        .applyInPandas(scan, "query_id long, neighbor_id long, cosine double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _lsh_scan_candidates_udf(
    spark, corpus_keyfn, probe_keyfn, n_probes, ids, raw, unit, take
):
    """pandas_udf: RAW query vector → its top-``take`` candidate ids
    from the broadcast bucket index, scored exactly — the LSH analogue
    of ``ivf._ivf_scan_candidates_udf`` (r5: the candidate JOIN
    materialized a ~tables·probes·bucket² multiset through a distinct
    shuffle, measured 352 s at 20k vectors; this kernel gathers and
    scores inside the worker).

    The index maps (table, exact key) → positions into the id-sorted
    unit matrix; per query the probe keys come from the SAME
    ``_lsh_key_fn`` machinery as the bucketing UDF (raw vectors in,
    byte-identical key sequences out), gathered positions are
    deduplicated with one sort, and the exact cosine top-``take`` is
    emitted with (score desc, id asc) ties — zero-norm corpus rows
    score −inf, matching the join path's NULL-cosine-ranked-last."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # build the (table, key) → positions index from the corpus keys
    corpus_keys = corpus_keyfn(raw)  # (n, tables) — probes=0 machinery
    n_tables = corpus_keys.shape[1] if corpus_keys.ndim == 2 else 1

    def build():
        index = _bucket_index(corpus_keys)
        zero_mask = (unit == 0).all(axis=1)
        return index, ids, unit, zero_mask

    # index + matrices go to workers as ONE broadcast (fetched once
    # per worker, not re-deserialized per task — see _cached_broadcast)
    bc = _cached_broadcast(
        spark,
        (
            "lsh_scan",
            id(spark.sparkContext),
            unit.shape,
            n_tables,
            n_probes,
            hashlib.sha1(raw.tobytes()).hexdigest(),
            # the bucket index is a function of the hash FAMILY, not just
            # the corpus: same corpus + same table/probe counts with a
            # different plane count (or seed) must not reuse a stale
            # index keyed under the old family (ADVICE r9) — the corpus
            # key matrix captures the family's effect on the payload
            # exactly
            hashlib.sha1(corpus_keys.tobytes()).hexdigest(),
        ),
        build,
    )

    def scan(v):
        index, b_ids, b_unit, zero_mask = bc.value
        x = np.vstack(v.to_numpy())
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        xq = x / np.where(norms == 0, 1.0, norms)
        pk = probe_keyfn(x).reshape(len(x), n_tables, n_probes + 1)
        out = []
        for qi in range(len(x)):
            parts = [
                arr
                for t in range(n_tables)
                for r in range(n_probes + 1)
                if (arr := index.get((t, int(pk[qi, t, r])))) is not None
            ]
            if not parts:
                out.append(np.zeros(0, dtype=np.int64))
                continue
            pos = np.unique(np.concatenate(parts))
            s = b_unit[pos] @ xq[qi]
            s[zero_mask[pos]] = -np.inf
            top = np.argsort(-s, kind="stable")[: min(take, len(pos))]
            out.append(b_ids[pos[top]].astype(np.int64))
        return pd.Series(out)

    # .asNondeterministic() is an OPTIMIZER FENCE, not a semantics
    # change (the kernel is seeded/deterministic): without it,
    # InferFiltersFromGenerate infers `size(result) > 0` from the
    # downstream explode and pushes that filter — WITH the whole Arrow
    # UDF inside it — below the fan-out exchange, re-evaluating the
    # ENTIRE scan a second time on the raw one-full-split layout:
    # one serial full-corpus scan on one core (r9 diagnosis; this
    # duplicate evaluation, not density variance, was r8's measured
    # sf10 "straggler tail"). Nondeterministic expressions cannot be
    # duplicated or moved, so the kernel runs once, above the
    # exchange, at the fan-out's parallelism.
    return pandas_udf(scan, "array<long>").asNondeterministic()


def _score_pairs(
    emb,
    id_col: str,
    vec_col: str,
    cand,
    n: int | None = None,
    unit=None,
    unit_mat=None,
):
    """Cosine for candidate (query_id, neighbor_id) pairs.

    Fast path: broadcast the normalized vector matrix (corpus is small
    enough) and score id pairs with one numpy gather + row-wise dot per
    Arrow batch — the pairs DataFrame carries ONLY ids, so nothing wide
    is shuffled or Arrow-transferred per pair. This is how an ANN
    serving tier scores candidates (replicated vector store).

    Fallback (corpus too big to replicate): two equi-joins bringing the
    unit vectors to the pairs, scored with the builtin dot.

    ``unit``: optionally a precomputed ``(id, uv)`` DataFrame from
    :func:`_unit_vectors`, so callers that already normalized (IVF's
    probe stage) don't pay the normalization scan twice.

    ``unit_mat``: optionally the ALREADY-COLLECTED ``(ids, mat)`` pair
    (from :func:`_collect_unit_matrix`). Callers that collected it for
    their own sizing (LSH) pass it through, which skips the count +
    dim-probe + collect jobs entirely — on small inputs those fixed
    jobs, not the math, dominate wall time.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from udacity_capstone_data_engineering_spark.functions.vectors import dot

    spark = emb.sparkSession

    if unit is not None:
        unit = unit.select(F.col(id_col), F.col("uv"))
    else:
        unit = _unit_vectors(emb, id_col, vec_col)

    if unit_mat is None:
        if n is None:
            n = emb.count()
        # Cap in measured bytes: dim probed from one row (limit-1 scan).
        head = emb.select(F.size(F.col(vec_col)).alias("d")).head()
        dim = int(head["d"]) if head is not None else 0
        if n * dim * 8 <= BROADCAST_SCORE_MAX_BYTES:
            unit_mat = _collect_unit_matrix(emb, id_col, vec_col, dim)

    if unit_mat is not None:
        ids, mat = unit_mat
        index = {int(i): pos for pos, i in enumerate(ids)}
        bc = spark.sparkContext.broadcast((index, mat))

        def score(q, c):
            idx, m = bc.value
            qi = q.map(idx).to_numpy()
            ci = c.map(idx).to_numpy()
            ok = ~(pd.isna(qi) | pd.isna(ci))
            out = np.zeros(len(q))
            if ok.any():
                out[ok] = np.einsum(
                    "ij,ij->i", m[qi[ok].astype(int)], m[ci[ok].astype(int)]
                )
            # Ids absent from the index (zero-norm vectors) must score
            # NULL, not NaN: Spark orders NaN FIRST under desc(), which
            # would rank degenerate vectors as everyone's top neighbor;
            # NULL sorts last, matching brute_force_topk and the join
            # fallback (dot(NULL) → NULL). Nullable Float64 + pd.NA is
            # what Arrow maps to a true SQL NULL (ADVICE r1).
            res = pd.array(out, dtype="Float64")
            res[~ok] = pd.NA
            return pd.Series(res)

        udf = pandas_udf(score, "double")
        return cand.select(
            "query_id",
            "neighbor_id",
            F.round(udf(F.col("query_id"), F.col("neighbor_id")), 6).alias("cosine"),
        )

    return (
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


def auto_lsh_tables(n: int) -> int:
    """Scale-aware LSH table count (VERDICT r8 #1): the measured
    frontier points (10 @ <4096, 12 @ ≤20k) joined past 20k by the
    L ~ n^ρ growth law at the DECADE RATE THE r8 LADDER MEASURED —
    tables = ceil(12 · (n/20k)^0.22), which lands 200k vectors exactly
    on the 20-table / 0.9699-recall@5 rung (12 tables had silently
    decayed to 0.8787 there). Capped at 32 (~2M vectors); past that
    the recommended recall-targeted tier is IVF/IVF-PQ."""
    import math

    if n < 4096:
        return 10
    if n <= 20_000:
        return 12
    return min(32, math.ceil(12 * (n / 20_000) ** 0.22))


def lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int | None = None,
    tables: int | None = None,
    multiprobe: int | None = None,
    queries: DataFrame | None = None,
    project_dims: int | None = None,
    stage1_mult: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = pairs sharing any table's bucket
    (deduplicated), then exact cosine ranking of candidates only.

    ``project_dims`` (VERDICT r6 #7): run candidate generation on a
    JL random projection to that many dimensions (``jl_project`` —
    deterministic ±1 signs, map-only), with a DEEPER stage-1 cut
    (``max(k*stage1_mult, k+10)``) to absorb projection error, then
    exact-rerank the candidates in the ORIGINAL space. Index flops
    and hyperplane-matrix width drop by dim/project_dims; recall is
    restored by the rerank — the classic sketch-then-verify shape.

    Scale shape: one shuffle on (table, bucket); candidate count is
    sum of per-bucket sizes², tunable via planes (bucket granularity)
    × tables (recall). ``planes=None`` auto-sizes granularity to the
    corpus — planes ≈ log2(n / 32) keeps expected bucket size ~32, so
    candidate generation stays near-linear as n grows instead of
    quadratic (fixed planes degenerate at scale).

    THREE regimes, all row-identical (regime tests pin it): the
    candidate JOIN below the candidate-volume crossover, the broadcast
    scan kernel above it while the raw matrix fits
    ``BROADCAST_SCORE_MAX_BYTES``, and PAST that byte cap the
    cell-sharded grid kernel (``_sharded_lsh_topk`` — VERDICT r10 #1:
    the join regime past the cap was measured spilling >60 GB to disk
    exhaustion at 2M vectors, so it is no longer reachable there).

    ``multiprobe`` enables QUERY-DIRECTED multiprobe (Lv et al.): the
    probe side also checks, per table, the ``multiprobe`` next-likeliest
    buckets from the margin-ranked perturbation sequence (subsets of
    the 3 lowest-|margin| sign bits ordered by summed margin) — the
    recall lever that does NOT add tables. ``multiprobe=None``
    auto-sizes it to ``max(2, planes-2)``: probe depth must GROW with
    key width, because auto-sizing adds planes as n grows, which
    decays per-table exact-key collision odds — a FIXED probe count
    then decays recall exactly like r2's fixed-planes bug (measured
    0.995 → 0.93 recall@5 from 500 to 2000 vectors at 2 probes;
    planes-2 probes holds ≥0.95 at both, r3 sweep). Directed beats
    flip-everything: all-bit probing costs ×(planes+1) probe rows
    (measured 6× slower end-to-end) where the ranked low-margin
    subsets capture most boundary misses at ×(multiprobe+1). The
    build side keeps exact keys only, so no pair is double-generated
    across probe ranks. ``multiprobe=0`` restores exact-bucket
    probing. Recall is validated against ``brute_force_topk`` in
    tests AND in-gate via ``ann_recall_report`` (approx operators get
    recall thresholds, not hash equality — SURVEY.md §7 risk
    register).
    """
    if project_dims is not None:
        proj = jl_project(emb, id_col, vec_col, project_dims, dim=dim)
        proj_q = (
            jl_project(queries, id_col, vec_col, project_dims, dim=dim)
            if queries is not None
            else None
        )
        cand = lsh_topk(
            proj,
            id_col,
            vec_col,
            dim=project_dims,
            k=max(k * stage1_mult, k + 10),
            planes=planes,
            tables=tables,
            multiprobe=multiprobe,
            queries=proj_q,
        )
        return _exact_rerank_pairs(emb, id_col, vec_col, cand, k)
    # ONE sizing job on the happy path: try to collect the normalized
    # matrix under the byte cap (needed for broadcast scoring anyway);
    # its length is the vector count that drives auto-sizing. Only an
    # over-cap corpus pays a separate count.
    #
    # ``queries``: optional serving WORKLOAD (same id/vec columns, ids
    # a subset of the corpus). Only workload vectors probe — the
    # bucket index is still built over the full corpus, and all knob
    # auto-sizing stays a function of CORPUS size (recall depends on
    # the index, not on how many queries hit it). This is the stage-1
    # hook ``rerank_two_stage`` uses.
    unit_mat = _collect_unit_matrix(emb, id_col, vec_col, dim)
    n = len(unit_mat[0]) if unit_mat is not None else emb.count()
    if tables is None:
        # Table count must GROW with the corpus, because recall decays
        # with n at fixed tables (measured recall@5 at 12 tables:
        # 0.995 @ 500 → 0.985 @ 2k → 0.960 @ 20k → 0.8787 @ 200k)
        # while the ≥0.95 bar is constant — the same knob-coupling law
        # as planes/probes, applied to the last fixed knob. Measured
        # frontier: 10 tables holds 0.986 @ 500 and 0.970 @ 2k at ~80%
        # of the 12-table wall; 8 tables drops to 0.943 @ 2k (below
        # bar); 20k needs the full 12 (sf1 probe). Past 20k the count
        # follows the L ~ n^ρ growth law the r8 second-decade ladder
        # MEASURED (same sf10 cell, tables pinned, all else auto:
        # 12 → 0.8787, 16 → 0.9400 @ 1.31× wall, 20 → 0.9699 @ 1.49×):
        # ρ = log10(20/12) ≈ 0.22 is the decade rate that lands the
        # 200k corpus exactly on the measured 20-table ≥0.95 point
        # (VERDICT r8 #1 — the r8 default was left at 12 to keep
        # mid-round digests stable, silently serving 0.88 recall at
        # 200k). Capped at 32 (~2M vectors): past that corpus size the
        # recommended recall-targeted tier is IVF/IVF-PQ, whose
        # measured-curve knobs hold 0.996 at sf10 without growing the
        # hash-family count.
        tables = auto_lsh_tables(n)
    if planes is None:
        import math

        # Bucket target grows as ~1.4·sqrt(n), NOT a constant: planes =
        # ceil(log2(n/32)/2) + 2 ⇒ bucket ≈ sqrt(32n)/4. A constant
        # bucket target (r2's log2(n/32)) forces key width — and with
        # it per-table miss probability — up linearly in log n, and the
        # sf1 probe measured the result: recall 0.96 → 0.61 from 2k to
        # 20k vectors even with probe depth auto-scaling. Sqrt-growth
        # buckets keep per-query candidates at ~tables·probes·1.4·sqrt(n)
        # — the same n^1.5 total-work shape as IVF's sqrt(n) centroids —
        # and measured recall@5 ≥0.95 at every probed size (0.995 @
        # 500, 0.985 @ 2k, 0.96 @ 20k).
        planes = max(4, math.ceil(math.log2(max(n, 64) / 32) / 2) + 2)
    if multiprobe is None:
        # Probe depth must GROW with key width: wider keys decay
        # per-table exact-collision odds, and a fixed probe count then
        # decays recall exactly like r2's fixed-planes bug — and it
        # must grow FASTER once keys are wide (misses spread over more
        # bits). planes-2 up to 6 planes, planes-1 beyond, from the
        # margin-ranked subset sequence, measured recall@5 ≥0.95 at
        # every probed size (12 tables): 0.995 @ 500 vecs/4 planes,
        # 0.985 @ 2k/5 planes, 0.96 @ 20k/7 planes (sf1 probe).
        multiprobe = max(2, planes - 2) if planes <= 6 else planes - 1
    n_q = n if queries is None else queries.count()
    if unit_mat is None:
        # PAST the broadcast byte cap (VERDICT r10 #1): the bucket-JOIN
        # regime's pair-scoring join was MEASURED spilling >60 GB to
        # disk exhaustion at 2M vectors × 2k queries (SCALING.md r10
        # third-decade probe) — route to the cell-sharded grid kernel
        # instead, which never carries vectors through a join.
        return _sharded_lsh_topk(
            emb, id_col, vec_col, dim, k, planes, tables, multiprobe,
            queries, n=n, n_q=n_q, cap=BROADCAST_SCORE_MAX_BYTES,
        )
    # Regime choice (r5): above the candidate-volume crossover, gather
    # and score candidates INSIDE the worker from a broadcast bucket
    # index instead of materializing the tables·probes·bucket²
    # multiset through the join + distinct (measured 352 s at 20k
    # vectors on the join path). Mean per-table bucket size is
    # n / 2^planes; both regimes return identical rows
    # (test_lsh_regimes_identical).
    est_candidates = n_q * tables * (multiprobe + 1) * (n / (2 ** planes))
    if est_candidates > LSH_JOIN_MAX_CANDIDATES:
        rawm = _collect_raw_matrix(emb, id_col, vec_col, dim)
    else:
        rawm = None
    if rawm is not None:
        from udacity_capstone_data_engineering_spark.sources.catalog import (
            fan_out_small_scan,
        )

        ids_s, raw_m, unit_m = rawm
        corpus_keyfn, _ = _lsh_key_fn(dim, planes, tables, 0)
        probe_keyfn, npb = _lsh_key_fn(dim, planes, tables, multiprobe)
        cand_udf = _lsh_scan_candidates_udf(
            emb.sparkSession,
            corpus_keyfn,
            probe_keyfn,
            npb,
            ids_s,
            raw_m,
            unit_m,
            take=k + 8,
        )
        # FINER-than-cores query partitions (VERDICT r8 #6): per-query
        # scan cost varies with local cluster density (a query in the
        # densest gaussian gathers the biggest buckets), so cores-wide
        # partitions leave one task grinding ~2x the mean — the
        # measured +0.18 exponent (~20 straggler minutes on one core)
        # of the sf10 lsh_self cell. 4x-cores tasks cut the tail to
        # ~1/4 of a partition's work and let the scheduler smooth the
        # density variance. ADAPTIVE, not unconditional: each task
        # pays fixed scheduler/Arrow overhead (~0.3 s here), so 4x
        # tasks on a minute-scale cell is pure loss (measured +26 s on
        # the 60 s sf1 cell) — widen only when estimated candidate
        # volume says the scan stage is tens of core-minutes, where a
        # straggler tail dominates fixed overhead by orders.
        sc = emb.sparkSession.sparkContext
        fan = 4 if est_candidates > 16 * LSH_JOIN_MAX_CANDIDATES else 1
        qsrc = fan_out_small_scan(
            emb if queries is None else queries,
            min_partitions=fan * sc.defaultParallelism,
        )
        cand = (
            qsrc.select(
                F.col(id_col).alias("query_id"),
                cand_udf(F.col(vec_col).cast("array<double>")).alias("cs"),
            )
            .select("query_id", F.explode("cs").alias("neighbor_id"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        scored = _score_pairs(
            emb, id_col, vec_col, cand, n=n, unit_mat=unit_mat
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rnk")
        )

    if queries is None:
        # Persisted: the self-join reads the bucketed keys from BOTH
        # sides, and without the persist each side re-runs the scan +
        # bucket UDF. Rows are (id, table, rank, bucket) ints — tiny
        # vs the vectors. Widened BEFORE the persist (guide §2.5): a
        # one-file corpus caches as ONE partition, so the key UDF, the
        # broadcast build and every stage planned on the cache run as
        # a single task (measured 2.5 s one-task stage at sf0.1/32c).
        # At real scale the scan is already wide and this no-ops.
        from udacity_capstone_data_engineering_spark.sources.catalog import (
            fan_out_small_scan,
        )

        b = lsh_bucket_keys(
            fan_out_small_scan(emb), vec_col, dim, planes, tables,
            probes=multiprobe,
        ).select(F.col(id_col), "table", "probe_rank", "bucket").persist()
        left = b.select(
            F.col(id_col).alias("query_id"), "table", "bucket"
        )
        right = b.filter(F.col("probe_rank") == 0).select(
            F.col(id_col).alias("neighbor_id"), "table", "bucket"
        )
    else:
        # Workload serving: probe keys (with multiprobe) only for the
        # workload; the build side keys the whole corpus at exact rank
        # (probes=0 — cheaper than keying everything at full depth and
        # filtering). Each side is read once, so no persist.
        left = lsh_bucket_keys(
            queries, vec_col, dim, planes, tables, probes=multiprobe
        ).select(F.col(id_col).alias("query_id"), "table", "bucket")
        right = lsh_bucket_keys(
            emb, vec_col, dim, planes, tables, probes=0
        ).select(F.col(id_col).alias("neighbor_id"), "table", "bucket")
    if n * tables * 24 <= BROADCAST_BUILD_MAX_BYTES:
        # Exact-key side is ids+ints only; under the byte gate a
        # broadcast-hash join deletes BOTH shuffle exchanges of the
        # candidate join (the probe side then flows map-side into the
        # single query_id repartition below). Past the gate — a real
        # corpus — the join shuffles on (table, bucket) as designed.
        right = F.broadcast(right)
    # Candidate multiset: a pair appears once per (table × probe) it
    # collides in — up to tables·(probes+1)×. Deduplicate BEFORE
    # scoring with a plain distinct: the partial (map-side) aggregate
    # collapses most duplicates BEFORE the exchange, so the wire
    # carries ~distinct pairs, not the multiset. (Deferring dedup into
    # the ranking window was measured ~30% slower — the window then
    # sorts the whole multiset; pre-repartitioning by query_id was no
    # better: the Arrow scoring node doesn't propagate partitioning,
    # so the window re-exchanges anyway AND the multiset crosses the
    # wire unreduced.) Net plan under the byte gates: broadcast-hash
    # candidate join + two slim exchanges (distinct pairs, then scored
    # pairs for the window) — pinned in tests/test_plans.py.
    cand = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = _score_pairs(
        emb, id_col, vec_col, cand, n=n, unit_mat=unit_mat
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
