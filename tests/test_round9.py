"""Round-9 fixes: scale-aware LSH table auto-knob (VERDICT r8 #1),
the persisted standing ANN index (VERDICT r8 #2), and the
target-recall-driven PQ rerank budget (VERDICT r8 #5)."""

from __future__ import annotations

import pytest


class TestAutoLshTables:
    """The tables auto-knob must follow the MEASURED L ~ n^rho ladder
    (SCALING.md r8 second decade: 12 tables decayed to 0.8787 recall@5
    at 200k vectors; 16 -> 0.9400, 20 -> 0.9699), not stay capped at
    the sf1 operating point."""

    def test_measured_frontier_points(self):
        from udacity_capstone_data_engineering_spark.operators.similarity import (
            auto_lsh_tables,
        )

        assert auto_lsh_tables(500) == 10
        assert auto_lsh_tables(2_000) == 10
        assert auto_lsh_tables(4_096) == 12
        assert auto_lsh_tables(20_000) == 12
        # the r8 ladder's measured >=0.95 rung at the second decade
        assert auto_lsh_tables(200_000) == 20
        # capped where IVF/IVF-PQ take over as the recall-targeted tier
        assert auto_lsh_tables(2_000_000) == 32
        assert auto_lsh_tables(100_000_000) == 32

    def test_monotone_nondecreasing(self):
        from udacity_capstone_data_engineering_spark.operators.similarity import (
            auto_lsh_tables,
        )

        sizes = [1, 100, 4_095, 4_096, 19_999, 20_000, 20_001, 50_000,
                 100_000, 200_000, 500_000, 1_000_000, 5_000_000]
        vals = [auto_lsh_tables(n) for n in sizes]
        assert vals == sorted(vals), vals


class TestStandingAnnIndex:
    """VERDICT r8 #2: the persisted IVF-PQ standing index must serve
    results IDENTICAL to the in-line fit-per-call path (same seeded
    fits, same deterministic encode, same kernels) while re-fitting
    nothing on the serve path."""

    @pytest.fixture(scope="class")
    def built(self, spark, sf_dir, tmp_path_factory):
        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            build_ann_index,
        )
        from udacity_capstone_data_engineering_spark.sources.catalog import (
            load_table,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        path = str(tmp_path_factory.mktemp("annidx") / "idx")
        meta = build_ann_index(emb, "vec_id", "embedding", 64, path)
        return emb, path, meta

    def test_meta_roundtrip(self, spark, built):
        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            load_ann_index,
        )

        emb, path, meta = built
        centers, books, codes, got = load_ann_index(spark, path)
        assert got == meta
        assert centers.shape == (meta["n_centroids"], meta["dim"])
        assert books.shape == (
            meta["m"],
            meta["ksub"],
            meta["dim"] // meta["m"],
        )
        assert codes.count() == emb.filter("embedding is not null").count()

    def test_serve_equals_inline_selftopk(self, spark, built):
        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            ann_topk_against_index,
        )
        from udacity_capstone_data_engineering_spark.operators.pq import (
            ivfpq_topk,
        )

        emb, path, meta = built
        served = ann_topk_against_index(
            emb, "vec_id", "embedding", path, k=5
        ).collect()
        inline = ivfpq_topk(emb, "vec_id", "embedding", dim=64, k=5).collect()
        assert sorted(map(tuple, served)) == sorted(map(tuple, inline))

    def test_serve_equals_inline_batch_queries(self, spark, built):
        from pyspark.sql import functions as F

        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            ann_topk_against_index,
        )
        from udacity_capstone_data_engineering_spark.operators.pq import (
            ivfpq_topk,
        )

        emb, path, meta = built
        batch = emb.filter(F.col("vec_id") % 10 == 0)
        served = ann_topk_against_index(
            emb, "vec_id", "embedding", path, k=5, queries=batch
        ).collect()
        inline = ivfpq_topk(
            emb, "vec_id", "embedding", dim=64, k=5, queries=batch
        ).collect()
        assert sorted(map(tuple, served)) == sorted(map(tuple, inline))
        qids = {r.query_id for r in served}
        assert qids == {r.vec_id for r in batch.select("vec_id").collect()}

    def test_sharded_serve_equals_broadcast(self, spark, built):
        """Forcing a tiny broadcast cap routes the serve through the
        cell-sharded cogroup grid join; rows must be identical."""
        emb, path, meta = built
        from udacity_capstone_data_engineering_spark.operators.ann_index import (
            ann_topk_against_index,
        )

        wide = ann_topk_against_index(
            emb, "vec_id", "embedding", path, k=5
        ).collect()
        shard = ann_topk_against_index(
            emb, "vec_id", "embedding", path, k=5,
            max_broadcast_bytes=2048,
        ).collect()
        assert sorted(map(tuple, wide)) == sorted(map(tuple, shard))


class TestRerankBudget:
    """VERDICT r8 #5: the rerank cut follows the MEASURED rerank/sqrt(n)
    iso-recall contour (scripts/pq_rerank_probe.py, sf1+sf10), not the
    always-n/20 fraction that measured 0.9992 at sf10 — an order of
    magnitude of rerank pairs past a 0.95 target."""

    def test_legacy_and_above_curve_keep_n_over_20(self):
        from udacity_capstone_data_engineering_spark.operators.pq import (
            rerank_budget,
        )

        assert rerank_budget(200_000, 5, None) == 10_000
        assert rerank_budget(200_000, 5, 0.99) == 10_000
        assert rerank_budget(500, 5, None) == 100  # 20*k floor

    def test_sqrt_contour_rungs(self):
        import math

        from udacity_capstone_data_engineering_spark.operators.pq import (
            rerank_budget,
        )

        # the three measured rungs at the second decade (sqrt(200k)=447)
        assert rerank_budget(200_000, 5, 0.90) == math.ceil(2.83 * 447.21)
        assert rerank_budget(200_000, 5, 0.95) == math.ceil(4.5 * 447.21)
        assert rerank_budget(200_000, 5, 0.97) == math.ceil(7.1 * 447.21)
        # sqrt growth: one decade of corpus ~ sqrt(10)x the budget
        lo, hi = rerank_budget(20_000, 5, 0.95), rerank_budget(200_000, 5, 0.95)
        assert 3.0 < hi / lo < 3.3

    def test_floors_hold_small_and_deep_k(self):
        from udacity_capstone_data_engineering_spark.operators.pq import (
            rerank_budget,
        )

        assert rerank_budget(100, 5, 0.95) == 100     # 20*k floor
        assert rerank_budget(100, 1, 0.95) >= 50      # absolute floor
        assert rerank_budget(2_000, 20, 0.95) == 400  # deep-k floor
