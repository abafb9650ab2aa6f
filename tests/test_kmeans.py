"""Exact-integer k-means tests (`operators/kmeans.py`): pure-Python
recurrence replay, partitioning bit-invariance, and assignment
consistency — the same gate battery as `pagerank_fixed`."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.kmeans import (
    kmeans_int,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table


def _python_replay(rows, k, iterations, scale):
    """The recurrence in plain Python over (vid, [floats])."""
    import math

    q = {
        vid: [math.floor(float(x) * scale + 0.5) for x in vec]
        for vid, vec in rows
    }
    cents = [list(q[vid]) for vid in sorted(q)[:k]]

    def assign():
        out = {}
        for vid, qv in q.items():
            best = None
            for cid, cv in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(qv, cv))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[vid] = best
        return out

    for _ in range(iterations):
        a = assign()
        for cid in range(k):
            member = [q[vid] for vid, (_, c) in a.items() if c == cid]
            if not member:
                continue
            n = len(member)
            cents[cid] = [
                sum(m[i] for m in member) // n for i in range(len(cents[cid]))
            ]
    return {vid: (c, d) for vid, (d, c) in assign().items()}


def test_matches_python_recurrence(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    rows = [(r["vec_id"], list(r["embedding"])) for r in vecs.collect()]
    want = _python_replay(rows, k=4, iterations=3, scale=1024)
    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_int(vecs, "vec_id", "embedding").collect()
    }
    assert got == want


def test_partitioning_bit_invariance(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    a = kmeans_int(vecs, "vec_id", "embedding").collect()
    b = kmeans_int(vecs.repartition(17), "vec_id", "embedding").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_clusters_nontrivial_and_consistent(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    out = kmeans_int(vecs, "vec_id", "embedding")
    used = out.select("cluster").distinct().count()
    assert used >= 2
    assert out.where(F.col("dist_sq") < 0).count() == 0
    assert out.count() == vecs.count()


def test_kmeans_driver_regime_bit_equal(spark, sf_dir, monkeypatch):
    """r12: under the byte/work caps the whole Lloyd recurrence runs
    driver-side in numpy int64 (1 collect instead of 2+iterations job
    barriers). Exact integers make the regimes bit-equal — assignment
    rows AND final centroids — at both the literal-plan k (4) and the
    kernel k (32)."""
    from udacity_capstone_data_engineering_spark.operators import kmeans as km

    vecs = load_table(spark, sf_dir, "embeddings")
    for k in (4, 32):
        c_driver: list = []
        c_dist: list = []
        a = kmeans_int(
            vecs, "vec_id", "embedding", k=k, _cents_out=c_driver
        ).collect()
        monkeypatch.setattr(km, "KMEANS_DRIVER_MAX_BYTES", 0)
        b = kmeans_int(
            vecs, "vec_id", "embedding", k=k, _cents_out=c_dist
        ).collect()
        monkeypatch.undo()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert c_driver == c_dist
