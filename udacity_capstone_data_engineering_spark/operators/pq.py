"""Product quantization (PQ) approximate nearest neighbors.

The third ANN path beside hyperplane LSH (``similarity.py``) and IVF
(``ivf.py``), and the one whose point is MEMORY: each unit vector is
compressed to ``m`` one-byte codes (64-dim float64 → 8 bytes, a 64×
reduction), so the whole index broadcasts/replicates where raw vectors
cannot — the standard serving layout for billion-vector corpora
(Jégou et al., "Product Quantization for Nearest Neighbor Search").

Pipeline:

  1. FIT: split the dimension into ``m`` subspaces; per subspace, run
     seeded Lloyd k-means over a bounded Arrow-collected sample (the
     same driver-side fit practice as IVF — codebooks are
     m × ksub × dsub floats, trivially small).
  2. ENCODE: one Arrow-batched pass assigns every vector its nearest
     centroid PER SUBSPACE → ``array<smallint>`` codes. Encoding is a
     batch matmul per subspace — the pandas-UDF sweet spot.
  3. SEARCH (ADC — asymmetric distance computation): the query stays
     EXACT; per query, a lookup table LUT[s][c] = q_s · codebook[s][c]
     turns each corpus row's approximate dot product into ``m`` table
     lookups + adds over the broadcast code matrix. Top-``rerank``
     candidates per query then get EXACT cosine scoring and the final
     top-k — the standard two-stage that recovers most recall lost to
     quantization.

Scale shape: the code matrix is n × m BYTES (not n × dim doubles), so
the broadcast byte-cap admits ~64× larger corpora than raw-vector
broadcast; past the cap the codes shuffle-join on candidate ids like
the other ANN paths. Candidate generation is a linear scan of the
compressed index per query — at 100 TB pair PQ with the IVF cell
filter (IVF-PQ) so each query scans only probed cells' codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_pq_codebooks(
    emb: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample: int = 100_000,
    iters: int = 10,
    n: int | None = None,
):
    """Seeded per-subspace Lloyd k-means over a bounded Arrow sample.

    Returns an (m, ksub, dim//m) float64 ndarray of codebooks, fit on
    L2-NORMALIZED vectors (PQ approximates the unit vector, so ADC
    lookup sums approximate the cosine directly)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if n is None:
        n = emb.count()
    frac = min(1.0, sample / max(n, 1))
    train_df = emb.sample(fraction=frac, seed=seed) if frac < 1.0 else emb
    pdf = train_df.select(F.col(vec_col).cast("array<double>")).toPandas()
    col = pdf.iloc[:, 0].to_numpy()
    x = (
        np.vstack(col).astype(np.float64)
        if len(col)
        else np.zeros((0, dim), dtype=np.float64)
    )
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    dsub = dim // m
    rng = np.random.default_rng(seed)
    k = min(ksub, max(len(x), 1))
    books = np.zeros((m, k, dsub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        centers = xs[rng.choice(len(xs), size=k, replace=False)]
        for _ in range(iters):
            # nearest by L2: argmin |x-c|² == argmax x·c − ½|c|²
            d = xs @ centers.T - 0.5 * (centers * centers).sum(axis=1)
            lab = d.argmax(axis=1)
            # vectorized Lloyd update: scatter-add members per centroid
            # (a per-centroid boolean-mask loop is O(k·n) per iter and
            # dominated the fit at ksub=256)
            sums = np.zeros_like(centers)
            np.add.at(sums, lab, xs)
            counts = np.bincount(lab, minlength=k).astype(np.float64)
            nonempty = counts > 0
            centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[s] = centers
    return books


def _encode_udf(books):
    """pandas_udf: unit vector → array<smallint> of per-subspace codes
    (one batch matmul per subspace against the broadcast codebooks)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, _k, dsub = books.shape
    corrections = [0.5 * (books[s] * books[s]).sum(axis=1) for s in range(m)]

    def encode(v):
        x = np.vstack(v.to_numpy())
        codes = np.empty((len(x), m), dtype=np.int16)
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            d = xs @ books[s].T - corrections[s]
            codes[:, s] = d.argmax(axis=1).astype(np.int16)
        return pd.Series(list(codes))

    return pandas_udf(encode, "array<smallint>")


def _adc_candidates_udf(books, ids, codes, rerank: int):
    """pandas_udf: unit query vector → array<long> of the ``rerank``
    best candidate ids by ADC score over the broadcast code matrix.

    Per batch: LUT[s] = q_batch @ books[s].T (batch × ksub), then each
    corpus row's approximate dot is m gathered adds. Ties break toward
    the LOWER vec_id (ids are pre-sorted and argsort is stable), so
    candidate sets are deterministic."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, _k, dsub = books.shape
    take = min(rerank, len(ids))

    def cand(v):
        x = np.vstack(v.to_numpy())
        scores = np.zeros((len(x), len(ids)), dtype=np.float64)
        for s in range(m):
            lut = x[:, s * dsub : (s + 1) * dsub] @ books[s].T
            scores += lut[:, codes[:, s]]
        top = np.argsort(-scores, axis=1, kind="stable")[:, :take]
        return pd.Series(list(ids[top]))

    return pandas_udf(cand, "array<long>")


def _ivfpq_candidates_udf(centers, books, cell_ids, cell_codes, nprobe, rerank):
    """pandas_udf: unit query vector → array<long> of the ``rerank``
    best candidate ids by ADC score over ONLY the query's ``nprobe``
    nearest cells' codes — the inverted-file filter that makes the
    scan sub-linear. Deterministic: stable argsorts + id-sorted cells."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, _k, dsub = books.shape
    correction = 0.5 * (centers * centers).sum(axis=1)

    def cand(v):
        x = np.vstack(v.to_numpy())
        cell_scores = x @ centers.T - correction
        take_cells = min(nprobe, cell_scores.shape[1])
        probed = np.argsort(-cell_scores, axis=1, kind="stable")[:, :take_cells]
        out = []
        for qi in range(len(x)):
            ids = np.concatenate([cell_ids[c] for c in probed[qi]])
            codes = np.concatenate([cell_codes[c] for c in probed[qi]])
            scores = np.zeros(len(ids), dtype=np.float64)
            for s in range(m):
                lut = x[qi, s * dsub : (s + 1) * dsub] @ books[s].T
                scores += lut[codes[:, s]]
            # candidates ordered by (score desc, id asc): sort ids first
            order = np.argsort(ids, kind="stable")
            ids, scores = ids[order], scores[order]
            top = np.argsort(-scores, kind="stable")[: min(rerank, len(ids))]
            out.append(ids[top])
        return pd.Series(out)

    return pandas_udf(cand, "array<long>")


def ivfpq_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 256,
    n_centroids: int | None = None,
    nprobe: int | None = None,
    rerank: int | None = None,
    seed: int = 42,
    fit_sample: int = 100_000,
) -> DataFrame:
    """IVF-PQ: the composition the module docstring promises — PQ's
    64×-compressed codes grouped into IVF cells, so each query
    ADC-scans only its ``nprobe`` nearest cells' codes instead of the
    whole index. Per-query scan cost drops from n to ~n·nprobe/cells
    (sub-linear with sqrt(n) cells); the broadcast stays code-sized.
    This variant quantizes the raw unit vectors (not per-cell
    residuals — the classic residual refinement buys recall at the
    cost of per-cell code spaces; the auto-sized exact-rerank cut
    recovers it more simply here).

    Auto-sizing follows the coupled-knob law end to end: sqrt(n)
    cells, nprobe = cells/4 (floor 4), rerank = n/20 (floor 50).
    Recall is BOUND BY THE CELL FILTER, tracking plain IVF at the
    same knobs with ~2 points of PQ cut on top (measured recall@5:
    auto 0.655 @ 500 / 0.668 @ 2,000 vs plain-IVF auto 0.66/0.67;
    pinned 16 cells/nprobe 12 gives 0.958 @ 500 / 0.928 @ 2,000 vs
    plain IVF's 0.95-0.96) — tighter targets raise nprobe exactly as
    with IVF, and the exact-rerank cut keeps the PQ contribution to
    the loss small."""
    import math

    import numpy as np

    from udacity_capstone_data_engineering_spark.operators.ivf import (
        _fit_centroids,
    )
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        BROADCAST_SCORE_MAX_BYTES,
        _score_pairs,
        _unit_vectors,
    )

    n = emb.count()
    index_bytes = n * (8 + 2 * m)
    if index_bytes > BROADCAST_SCORE_MAX_BYTES:
        raise ValueError(
            f"PQ code index would be {index_bytes >> 20} MiB "
            f"(> {BROADCAST_SCORE_MAX_BYTES >> 20} MiB broadcast cap); "
            "shard the inverted file across executors or raise the cap."
        )
    if n_centroids is None:
        n_centroids = max(16, int(math.sqrt(max(n, 256))))
    if nprobe is None:
        nprobe = max(4, math.ceil(n_centroids / 4))
    if rerank is None:
        rerank = max(50, -(-n // 20))

    centers = _fit_centroids(emb, vec_col, n_centroids, seed, fit_sample, n=n)
    books = fit_pq_codebooks(
        emb, vec_col, dim, m=m, ksub=ksub, seed=seed, sample=fit_sample, n=n
    )

    unit = _unit_vectors(emb, id_col, vec_col)
    v = unit.filter(F.col("uv").isNotNull())
    encode = _encode_udf(books)
    assign = _probe1_cell_udf(centers)
    encoded = (
        v.select(
            F.col(id_col),
            assign(F.col("uv")).alias("cell"),
            encode(F.col("uv")).alias("codes"),
        )
        .orderBy(id_col)
        .toPandas()
    )
    ids = np.asarray(encoded[id_col].to_numpy(), dtype=np.int64)
    cells = np.asarray(encoded["cell"].to_numpy(), dtype=np.int64)
    codes = (
        np.vstack(encoded["codes"].to_numpy()).astype(np.int64)
        if len(encoded)
        else np.zeros((0, m), dtype=np.int64)
    )
    # the inverted file: per cell, (ids, codes) in id order
    cell_ids, cell_codes = [], []
    for c in range(len(centers)):
        mask = cells == c
        cell_ids.append(ids[mask])
        cell_codes.append(codes[mask])

    cand = _ivfpq_candidates_udf(
        centers, books, cell_ids, cell_codes, nprobe, rerank
    )
    pairs = (
        v.select(F.col(id_col).alias("query_id"), cand(F.col("uv")).alias("cs"))
        .select("query_id", F.explode("cs").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = _score_pairs(emb, id_col, vec_col, pairs, n=n, unit=unit)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _probe1_cell_udf(centers):
    """pandas_udf: unit vector → its single nearest cell id."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    correction = 0.5 * (centers * centers).sum(axis=1)

    def assign(v):
        x = np.vstack(v.to_numpy())
        d = x @ centers.T - correction
        return pd.Series(d.argmax(axis=1).astype("int64"))

    return pandas_udf(assign, "long")


def pq_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 256,
    rerank: int | None = None,
    seed: int = 42,
    fit_sample: int = 100_000,
) -> DataFrame:
    """Approximate cosine top-k via PQ + ADC with exact reranking.

    Stage 1 scans the COMPRESSED index (n × m bytes, broadcast) per
    query and keeps the top-``rerank`` ADC candidates; stage 2 scores
    those candidates with exact cosine and ranks the final top-k, so
    quantization error only costs recall when a true neighbor falls
    outside the top-``rerank`` ADC cut. Codes and candidates are
    deterministic (seeded fit, stable argsort, id tiebreaks).

    ``rerank=None`` auto-sizes to a CONSTANT FRACTION of the corpus
    (1/20, floor 50) — the same knob-coupling law as IVF's nprobe and
    LSH's tables: a FIXED rerank cut decays recall as n grows
    (measured recall@5 at m=8: ksub=16/rerank=50 gave 0.74 @ 500 →
    0.50 @ 2,000; ksub=256 with rerank=n/20 holds 0.996 @ 500 /
    0.971 @ 2,000, and n/10 reaches 0.996 @ 2,000). ``ksub=256``
    (8-bit codes) is the standard PQ operating point — 16 centroids
    per subspace quantizes too coarsely for the ADC ranking to keep
    true neighbors inside any affordable cut."""
    import numpy as np

    from udacity_capstone_data_engineering_spark.operators.similarity import (
        _score_pairs,
        _unit_vectors,
    )

    from udacity_capstone_data_engineering_spark.operators.similarity import (
        BROADCAST_SCORE_MAX_BYTES,
    )

    n = emb.count()
    # The whole point of PQ is that the code matrix fits where vectors
    # don't: n × (8 id + 2m code) bytes ≈ 24 B/vector at m=8 — the
    # 256 MiB gate admits ~10M vectors (vs ~500k raw). Enforce it in
    # MEASURED bytes rather than silently collecting an over-cap index.
    index_bytes = n * (8 + 2 * m)
    if index_bytes > BROADCAST_SCORE_MAX_BYTES:
        raise ValueError(
            f"PQ code index would be {index_bytes >> 20} MiB "
            f"(> {BROADCAST_SCORE_MAX_BYTES >> 20} MiB broadcast cap); "
            "shard the scan with the IVF cell filter (IVF-PQ) or raise "
            "the cap explicitly."
        )
    if rerank is None:
        rerank = max(50, -(-n // 20))
    books = fit_pq_codebooks(
        emb, vec_col, dim, m=m, ksub=ksub, seed=seed, sample=fit_sample, n=n
    )

    unit = _unit_vectors(emb, id_col, vec_col)
    v = unit.filter(F.col("uv").isNotNull())
    encode = _encode_udf(books)
    encoded = (
        v.select(F.col(id_col), encode(F.col("uv")).alias("codes"))
        .orderBy(id_col)
        .toPandas()
    )
    ids = np.asarray(encoded[id_col].to_numpy(), dtype=np.int64)
    codes = (
        np.vstack(encoded["codes"].to_numpy()).astype(np.int64)
        if len(encoded)
        else np.zeros((0, m), dtype=np.int64)
    )

    cand = _adc_candidates_udf(books, ids, codes, rerank)
    pairs = (
        v.select(F.col(id_col).alias("query_id"), cand(F.col("uv")).alias("cs"))
        .select("query_id", F.explode("cs").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = _score_pairs(emb, id_col, vec_col, pairs, n=n, unit=unit)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
