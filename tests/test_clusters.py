"""Connected components / dedup groups unit tests."""

from __future__ import annotations

import pytest

from udacity_capstone_data_engineering_spark.operators.clusters import (
    connected_components,
    dedup_groups,
)


def test_components_basic(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}


def test_components_chain_diameter(spark):
    # A long chain needs multiple propagation rounds.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(comps.values()) == {1}
    assert len(comps) == 12


def test_components_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iterations=2)


def test_dedup_groups_singletons(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4)], "id_a long, id_b long")
    rows = {r.doc_id: (r.component, r.is_representative)
            for r in dedup_groups(df, "doc_id", pairs).collect()}
    assert rows == {
        1: (1, True),
        2: (2, True),
        3: (3, True),
        4: (2, False),
        5: (5, True),
    }
