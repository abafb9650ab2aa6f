"""Partitioning-independence: the determinism rules (decimal sums,
tiebroken windows, sorted collects) must make results identical under
different shuffle layouts — the property that keeps a 32-partition
local run and a 20,000-partition cluster run hash-equal."""

from __future__ import annotations

import pytest

from udacity_capstone_data_engineering_spark import queries as catalog

QUERIES = catalog.queries()

REPRESENTATIVE = [
    "flagship_nation_order_stats",   # decimal sums + broadcast joins
    "pricing_summary",               # wide agg with decimal measures
    "dedup_orders_per_customer",     # tiebroken window dedup
    "near_dup_minhash_lsh",          # hash pipeline + bucket collects
    "nations_per_region_csv",        # sorted collect_list
    "salted_skew_agg",               # random salt must not leak into values
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_independent_of_shuffle_partitioning(spark, sf_dir, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()), key=str)
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()), key=str)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name}: results changed with shuffle partitioning"
