"""Unified ANN dispatch (VERDICT r9 #4): one documented entry point
that picks the measured-best tier from (corpus size, target recall,
artifact availability), instead of users hand-choosing between
``lsh_topk`` / ``ivf_topk`` / ``pq_topk`` / ``ivfpq_topk`` /
``ann_topk_against_index`` from docstring crossover notes.

The choice table (every boundary is a MEASURED number from SCALING.md's
decade grids, not a guess):

    ========================  =========================================
    situation                 tier
    ========================  =========================================
    ``index_path`` given and  ``standing`` — serve from the persisted
    artifact complete         IVF-PQ artifact: zero fit cost per call
                              (the r8 sf10 probe measured ~10 min/call
                              of re-paid fit at 200k vectors), recall
                              from the same nprobe/rerank laws.
    n within LSH's broadcast  ``lsh`` — the auto table ladder
    kernel regime (raw bytes  (``auto_lsh_tables``: L ~ n^0.22) holds
    ≤ score cap: ~500k @ d64) recall 0.95-0.97 through the measured
    and target ≤ 0.97         decades (0.9699 at 200k, SCALING.md r9)
                              with the cheapest candidate generation
                              of the tiers.
    same region,              ``ivf`` — exact scan of probed cells;
    target > 0.97             the 7/8 probe fraction measured 0.97+
                              (``probe_fraction_for_recall``), which
                              the capped LSH ladder cannot promise.
    past either LSH cap       ``ivfpq`` — measured at the third decade
    (byte cap ~500k @ d64,    (r10): past the byte cap LSH's join
    table cap 2M)             regime shipped vectors through the pair
                              join and spilled >60 GB at 2M vectors,
                              while IVF-PQ codes (64× smaller) stay
                              broadcast; the broadcast-vs-cell-sharded
                              regime switch is byte-cap driven inside
                              ``ivfpq_topk``, and rerank follows the
                              measured √n iso-recall contour.
    ========================  =========================================

All tiers return the same ``(query_id, neighbor_id, cosine, rnk)``
relation, exact-reranked, (cosine desc, id asc) deterministic ties —
so callers can switch tiers (or let this facade switch for them as the
corpus grows) without touching downstream code.

Reference scope note: the reference repo (`/root/reference`, stock
PySpark star-schema ETL — etl.py/qhi.py) has no ANN tier; this module
is part of the commissioned large-scale training-data extension
surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# auto_lsh_tables caps at 32 tables, the rung its measured n^0.22
# ladder reaches at ~2M vectors — past this LSH recall can no longer
# be bought with tables.
LSH_DISPATCH_MAX_N = 2_000_000

# the highest recall the capped LSH ladder is measured to deliver at
# auto knobs (0.9699 at the 200k rung); targets above it go to the
# exact-cell-scan IVF tier.
LSH_DISPATCH_MAX_RECALL = 0.97

_MODES = ("auto", "lsh", "ivf", "pq", "ivfpq", "standing", "exact")


def _lsh_kernel_max_n(dim: int) -> int:
    """The corpus size where LSH falls out of its broadcast-kernel
    regime: raw matrix bytes (n·dim·8) at the score-broadcast cap —
    ~500k vectors at dim 64. MEASURED to matter at the third decade
    (r10, ``scripts/sf100_probe.py``): past the cap LSH drops to the
    bucket-JOIN path, whose pair-scoring join ships unit vectors
    instead of ids and spilled >60 GB of shuffle at 2M vectors ×
    2k queries before exhausting local disk — while IVF-PQ's codes
    (n·16 bytes, 64× smaller) stay broadcast to 16M vectors. The LSH
    handoff is therefore the BYTE cap, not the 32-table recall cap."""
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        BROADCAST_SCORE_MAX_BYTES,
    )

    return BROADCAST_SCORE_MAX_BYTES // (8 * max(dim, 1))


def choose_ann_tier(
    n: int,
    target_recall: float | None = 0.9,
    index_path: str | None = None,
    dim: int = 64,
) -> str:
    """The dispatch decision alone (pure, unit-testable): tier name
    for a corpus of ``n`` vectors of ``dim`` dims, a recall target,
    and an optional persisted-artifact path. See the module
    docstring's choice table."""
    if index_path is not None and os.path.exists(
        os.path.join(index_path, "meta")
    ):
        return "standing"
    t = 0.9 if target_recall is None else target_recall
    if n <= min(LSH_DISPATCH_MAX_N, _lsh_kernel_max_n(dim)):
        return "lsh" if t <= LSH_DISPATCH_MAX_RECALL else "ivf"
    return "ivfpq"


def ann_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    target_recall: float | None = 0.9,
    queries: DataFrame | None = None,
    index_path: str | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Approximate top-k cosine neighbors, tier chosen by the measured
    crossover laws (module docstring). ``mode`` forces a tier
    (``'lsh' | 'ivf' | 'pq' | 'ivfpq' | 'standing' | 'exact'``);
    ``'auto'`` (default) applies :func:`choose_ann_tier` on the corpus
    count. ``'exact'`` is the brute-force oracle — never the scale
    path, but the honest baseline the recall gates compare against.

    ``index_path``: a ``build_ann_index`` artifact; when present (and
    complete — the meta sentinel exists) auto mode serves from it,
    re-fitting nothing. Per-tier knobs beyond the recall target stay
    on the per-tier functions, which remain public."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    tier = mode
    if mode == "auto":
        tier = choose_ann_tier(
            emb.count(), target_recall, index_path=index_path, dim=dim
        )
    if tier == "standing":
        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            ann_topk_against_index,
        )

        if index_path is None:
            raise ValueError("mode='standing' requires index_path")
        return ann_topk_against_index(
            emb, id_col, vec_col, index_path, k=k,
            target_recall=target_recall, queries=queries,
        )
    if tier == "lsh":
        from udacity_capstone_data_engineering_spark.operators.similarity import (
            lsh_topk,
        )

        return lsh_topk(emb, id_col, vec_col, dim=dim, k=k, queries=queries)
    if tier == "ivf":
        from udacity_capstone_data_engineering_spark.operators.ivf import (
            ivf_topk,
        )

        return ivf_topk(
            emb, id_col, vec_col, k=k, target_recall=target_recall,
            queries=queries,
        )
    if tier == "pq":
        from udacity_capstone_data_engineering_spark.operators.pq import (
            pq_topk,
        )

        return pq_topk(
            emb, id_col, vec_col, dim=dim, k=k, target_recall=target_recall,
            queries=queries,
        )
    if tier == "ivfpq":
        from udacity_capstone_data_engineering_spark.operators.pq import (
            ivfpq_topk,
        )

        return ivfpq_topk(
            emb, id_col, vec_col, dim=dim, k=k, target_recall=target_recall,
            queries=queries,
        )
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        brute_force_topk,
    )

    return brute_force_topk(emb, id_col, vec_col, k=k, queries=queries)
