"""The reference user's workflow, through the compat surface:
session → run_pipeline → read_data → data_exists/check_integrity —
the same call sequence as the reference notebook cells 32/33/42/43."""

from __future__ import annotations

from udacity_capstone_data_engineering_spark import compat
from tests.test_star_schema import _fixtures


def test_reference_workflow_end_to_end(spark, tmp_path):
    imm, demo, temp, country = _fixtures(spark)

    out = compat.run_pipeline(spark, imm, demo, temp, country, str(tmp_path))
    assert set(out) == set(compat.TABLE_NAMES)

    back = compat.read_data(spark, str(tmp_path))
    assert set(back) == set(compat.TABLE_NAMES)
    for name, df in back.items():
        # notebook cell 42's loop
        assert compat.data_exists(df, name), name

    # notebook cell 43 — with the corrected (non-inverted) semantics
    assert compat.check_integrity(
        back["immigration_fact"],
        back["i94mode_dim"],
        back["i94visa_dim"],
        back["demographics_dim"],
        back["country_dim"],
    )

    # cast_totype keeps the reference call shape
    casted = compat.cast_totype(back["immigration_fact"], ["i94bir"], "double")
    assert dict(casted.dtypes)["i94bir"] == "double"


def test_check_integrity_fails_on_orphans(spark, tmp_path):
    imm, demo, temp, country = _fixtures(spark)
    out = compat.run_pipeline(spark, imm, demo, temp, country, str(tmp_path / "w"))
    # Break a dim: drop the US row -> i94res=101 becomes an orphan.
    broken_country = out["country_dim"].filter("Code != 101")
    assert not compat.check_integrity(
        out["immigration_fact"],
        out["i94mode_dim"],
        out["i94visa_dim"],
        out["demographics_dim"],
        broken_country,
    )
