"""Round-11 fixes: bounded cell-major ADC accumulation (ADVICE r10),
the sharded LSH scan kernel past the broadcast byte cap (VERDICT r10
#1), the measured PQ/IVF-PQ dispatch crossover (VERDICT r10 #2), and
the ann_topk(n=...) / index-completeness / staleness-fingerprint /
append-validation hardening items."""

from __future__ import annotations

import numpy as np
import pytest


def _toy_inverted_file(seed=7, dim=8, m=2, ksub=4, ncells=5, n=200):
    rng = np.random.default_rng(seed)
    books = rng.normal(size=(m, ksub, dim // m))
    centers = rng.normal(size=(ncells, dim))
    ids = np.arange(n, dtype=np.int64)
    cell_ids = [np.sort(ids[ids % ncells == c]) for c in range(ncells)]
    cell_codes = [
        rng.integers(0, ksub, size=(len(ci), m)).astype(np.uint8)
        for ci in cell_ids
    ]
    queries = rng.normal(size=(20, dim))
    return queries, centers, books, cell_ids, cell_codes


def test_cell_major_compaction_lossless():
    """compact_elems=1 (compaction after every chunk) must return the
    EXACT same per-query candidate id sequences as an unbounded
    accumulation — the compaction key is the final merge key, so
    dropping beaten partials mid-scan is lossless (ADVICE r10)."""
    from udacity_capstone_data_engineering_spark.operators.pq import (
        _cell_major_candidates,
    )

    q, centers, books, cell_ids, cell_codes = _toy_inverted_file()
    base = _cell_major_candidates(
        q, centers, books, cell_ids, cell_codes, nprobe=3, rerank=7,
        compact_elems=10**12,
    )
    tiny = _cell_major_candidates(
        q, centers, books, cell_ids, cell_codes, nprobe=3, rerank=7,
        compact_elems=1,
    )
    assert len(base) == len(tiny) == len(q)
    for b, t in zip(base, tiny):
        assert np.array_equal(b, t)


def test_cell_major_compaction_bounds_accumulation():
    """The compacted floor is nq·rerank: with compact_elems just above
    it, no intermediate partial list may exceed floor + one chunk's
    emission. Asserted by monkeypatching the compactor to record
    input sizes."""
    from udacity_capstone_data_engineering_spark.operators import pq

    q, centers, books, cell_ids, cell_codes = _toy_inverted_file()
    rerank = 7
    floor = len(q) * rerank
    seen = []
    real = pq._compact_candidate_partials

    def spy(qpos, cids, cscores, nq, rr):
        seen.append(len(qpos))
        return real(qpos, cids, cscores, nq, rr)

    pq._compact_candidate_partials, orig = spy, real
    try:
        pq._cell_major_candidates(
            q, centers, books, cell_ids, cell_codes, nprobe=3,
            rerank=rerank, compact_elems=floor,
        )
    finally:
        pq._compact_candidate_partials = orig
    assert seen, "compaction never ran"
    # worst pre-compaction size: the floor plus one cell-chunk emission
    # (nq queries × rerank each)
    assert max(seen) <= floor + floor


def test_compact_candidate_partials_matches_bruteforce():
    from udacity_capstone_data_engineering_spark.operators.pq import (
        _compact_candidate_partials,
    )

    rng = np.random.default_rng(3)
    nq, rerank = 6, 4
    qpos = rng.integers(0, nq, size=300).astype(np.int64)
    cids = rng.permutation(300).astype(np.int64)
    scores = np.round(rng.normal(size=300), 1)  # force score ties
    cq, ci, cs = _compact_candidate_partials(qpos, cids, scores, nq, rerank)
    for qi in range(nq):
        mask = qpos == qi
        rows = sorted(
            zip(-scores[mask], cids[mask])
        )[:rerank]
        got = ci[cq == qi]
        assert np.array_equal(got, np.array([r[1] for r in rows]))
        assert np.array_equal(
            cs[cq == qi], np.array([-r[0] for r in rows])
        )
