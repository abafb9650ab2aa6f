"""Z-order clustered layout (operators/layout.py).

Three properties matter: the rewrite is a bijection on rows (layout
changes, content doesn't), the z-key is pure JVM expression work, and
the layout actually clusters — per-file ranges narrow on BOTH
dimensions versus an unclustered write, so parquet min/max statistics
can skip files/row groups for two-sided predicates.
"""

from __future__ import annotations

import glob
import posixpath
import tempfile

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.operators.layout import (
    with_zorder_key,
    write_zordered,
)
from udacity_capstone_data_engineering_spark.sources.catalog import load_table


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_zorder_roundtrip_rows_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="zorder_rt_")
    path = write_zordered(ev, ["ts", "value"], base, "ev_z", n_files=4)
    back = spark.read.parquet(path)
    cols = sorted(ev.columns)
    assert back.columns != []  # schema survived
    assert sorted(back.columns) == cols  # no helper column leaked
    assert _rows(back, cols) == _rows(ev, cols)


def test_zorder_key_deterministic_and_jvm_only(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    keyed = with_zorder_key(ev, ["ts", "value"], bits=6)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "pythonUDF" not in plan
    a = keyed.agg(F.sum("__z_key"), F.max("__z_key")).collect()[0]
    b = keyed.agg(F.sum("__z_key"), F.max("__z_key")).collect()[0]
    assert tuple(a) == tuple(b)
    # 2 cols x 6 bits -> key fits in 12 bits
    assert a[1] < (1 << 12)


def test_zorder_nulls_route_to_bucket_zero(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 250.0), (4, None), (5, 499.0)],
        "id long, v double",
    )
    keyed = with_zorder_key(df, ["v", "id"], bits=4)
    got = {r["id"]: r["__z_key"] for r in keyed.collect()}
    assert len(got) == 5 and all(v is not None for v in got.values())
    # null v takes v-bucket 0: its interleaved key has no v-bits set,
    # so it can't exceed the key of the max non-null v row
    assert max(got[2], got[4]) <= got[5]


def _per_file_ranges(spark, path):
    df = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    rows = (
        df.groupBy("__f")
        .agg(
            F.min("ts").alias("ts_lo"),
            F.max("ts").alias("ts_hi"),
            F.min("value").alias("v_lo"),
            F.max("value").alias("v_hi"),
        )
        .collect()
    )
    return rows


def _mean_norm_width(rows, glo_ts, ghi_ts, glo_v, ghi_v):
    ts_span = (ghi_ts - glo_ts).total_seconds() or 1.0
    v_span = (ghi_v - glo_v) or 1.0
    widths = []
    for r in rows:
        widths.append(
            (
                (r["ts_hi"] - r["ts_lo"]).total_seconds() / ts_span
                + (r["v_hi"] - r["v_lo"]) / v_span
            )
            / 2.0
        )
    return sum(widths) / len(widths)


def test_zorder_narrows_per_file_ranges_and_skips(spark, sf_dir):
    """Clustering quality: the mean normalized per-file (ts, value)
    range width must be well under an unclustered round-robin write's
    (whose every file spans ~the full range on both dims), and a
    two-sided range predicate must leave some files entirely
    non-overlapping — the file-level image of the row-group skipping
    parquet statistics give readers for free."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(
        F.min("ts"), F.max("ts"), F.min("value"), F.max("value")
    ).collect()[0]
    base = tempfile.mkdtemp(prefix="zorder_q_")

    zpath = write_zordered(ev, ["ts", "value"], base, "z", n_files=8)
    ev.repartition(8).write.parquet(posixpath.join(base, "flat"))
    flat_path = posixpath.join(base, "flat")
    assert len(glob.glob(zpath + "/*.parquet")) >= 4

    zr = _per_file_ranges(spark, zpath)
    fr = _per_file_ranges(spark, flat_path)
    zw = _mean_norm_width(zr, g[0], g[1], g[2], g[3])
    fw = _mean_norm_width(fr, g[0], g[1], g[2], g[3])
    # round-robin files each span ~100% of both dims; 8 z-files over
    # an 8x8..256x256 grid of curve segments must at least halve it
    assert zw < 0.6 * fw, (zw, fw)

    # two-sided predicate box: central week x mid-value band
    import datetime as dt

    lo_ts = dt.datetime(2024, 1, 8)
    hi_ts = dt.datetime(2024, 1, 15)
    skipped = [
        r
        for r in zr
        if r["ts_hi"] < lo_ts
        or r["ts_lo"] >= hi_ts
        or r["v_hi"] < 100.0
        or r["v_lo"] > 200.0
    ]
    assert skipped, "no file's stats exclude the predicate box"
