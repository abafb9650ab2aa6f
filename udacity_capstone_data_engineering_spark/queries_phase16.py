"""Phase-16 query tier (round 10): the unified ANN dispatch facade
(VERDICT r9 #4) under the oracle gate.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry); house determinism rules apply.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.sources.catalog import (
    fan_out_small_scan,
    load_table,
)

_DISPATCH_BOUND = 0.9  # recall@5 gate, same as the other auto rows


@_register(
    "ann_auto_dispatch",
    """
    SELECT 'lsh' AS tier,
           (SELECT COUNT(*) * 5 FROM embeddings) AS n_pairs,
           TRUE AS recall_ok
    """,
)
def ann_auto_dispatch(spark, sf_dir):
    """The unified ``ann_topk`` facade (VERDICT r9 #4) end to end in
    ``mode='auto'``: the dispatcher must (a) pick the tier the measured
    choice table says — at every gate scale the corpus is ≤ 2M vectors
    and the target 0.9 ≤ 0.97, so 'lsh' (the oracle hard-codes that
    expectation: a dispatch-law regression flips the tier column red) —
    and (b) deliver the promised recall: recall@5 ≥ 0.9 vs the
    brute-force truth, the same gate shape as ``ann_recall_report``.
    n_pairs doubles as the exactly-5-per-query structural check."""
    from udacity_capstone_data_engineering_spark.operators.ann import (
        ann_topk,
        choose_ann_tier,
    )
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    tier = choose_ann_tier(emb.count(), target_recall=0.9)
    approx = ann_topk(emb, "vec_id", "embedding", dim=64, k=5)
    exact = (
        brute_force_topk(emb, "vec_id", "embedding", k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    return hits.crossJoin(tot).select(
        F.lit(tier).alias("tier"),
        "n_pairs",
        (F.col("hits") / F.col("n_pairs") >= F.lit(_DISPATCH_BOUND)).alias(
            "recall_ok"
        ),
    )
