"""End-to-end reference-parity pipeline on fixture-shaped data
(FIXTURES.md schemas; values cover the reference's cleaning paths)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark import qc
from udacity_capstone_data_engineering_spark.plans.star_schema import build_star_schema


def _fixtures(spark):
    immigration = spark.createDataFrame(
        [
            # cicid yr mon cit res port arrdate mode addr depdate bir visa
            (1.0, 2016.0, 4.0, 101.0, 101.0, "NYC", 20545.0, 1.0, "NY", None, 35.0, 2.0,
             1.0, "f1", None, None, "G", "O", None, "M", 1981.0, "10292016", "F", None, "DL", 1.0, None, "B2"),
            (2.0, 2016.0, 4.0, 213.0, 213.0, "LOS", 20574.0, None, "CA", None, 40.0, 1.0,
             1.0, "f2", None, None, "G", "O", None, "M", 1976.0, "10292016", "M", None, "TK", 2.0, None, "B1"),
        ],
        "cicid double, i94yr double, i94mon double, i94cit double, i94res double,"
        "i94port string, arrdate double, i94mode double, i94addr string,"
        "depdate double, i94bir double, i94visa double, count double,"
        "dtadfile string, visapost string, occup string, entdepa string,"
        "entdepd string, entdepu string, matflag string, biryear double,"
        "dtaddto string, gender string, insnum string, airline string,"
        "admnum double, fltno string, visatype string",
    )
    demographics = spark.createDataFrame(
        [
            ("New York", "New York", "NY", 36.5, 4000000.0, 4500000.0, 8500000.0, "White"),
            ("New York", "New York", "NY", 36.5, 4000000.0, 4500000.0, 8500000.0, "Asian"),
            ("Los Angeles", "California", "CA", 35.0, 1900000.0, 2000000.0, 3900000.0, "White"),
        ],
        "City string, State string, `State Code` string, `Median Age` double,"
        "`Male Population` double, `Female Population` double,"
        "`Total Population` double, Race string",
    )
    temperature = spark.createDataFrame(
        [
            ("1900-01-01", "10.5", "0.1", "New York", "United States"),
            ("1900-02-01", "12.5", "0.1", "New York", "united states"),
            ("1900-01-01", "20.0", "0.2", "Sydney", "Australia"),
        ],
        "dt string, AverageTemperature string,"
        "AverageTemperatureUncertainty string, City string, Country string",
    )
    country = spark.createDataFrame(
        [("101", "UNITED STATES"), ("213", "Australia"), ("999", "Atlantis")],
        "Code string, I94CTRY string",
    )
    return immigration, demographics, temperature, country


def test_star_schema_end_to_end(spark, tmp_path):
    imm, demo, temp, country = _fixtures(spark)
    out = build_star_schema(spark, imm, demo, temp, country, str(tmp_path))

    fact = out["immigration_fact"]
    # null mode filled with 9 (the dim's real "Not reported" key — the
    # reference filled 0, which its own dim does not contain).
    assert {r.i94mode for r in fact.select("i94mode").collect()} == {1, 9}
    assert qc.fk_check(fact, "i94mode", out["i94mode_dim"], "i94mode").passed
    assert qc.fk_check(fact, "i94visa", out["i94visa_dim"], "vid").passed
    assert qc.fk_check(fact, "i94res", out["country_dim"], "Code").passed
    assert qc.fk_check(
        fact, "i94addr", out["demographics_dim"], "State Code"
    ).passed

    # case-normalized temperature join actually matches (the reference's
    # committed country table had 0/289 non-null temperatures).
    us = out["country_dim"].filter("Code = 101").first()
    assert us.avg_temperature == 11.5  # mean of the two case-variant rows
    atlantis = out["country_dim"].filter("Code = 999").first()
    assert atlantis.avg_temperature is None  # left join keeps unmatched

    # demographics grouped to one row per city
    assert out["demographics_dim"].count() == 2

    # calendar derived from true dates
    cal = {r.arrival_sasdate: r for r in out["i94date_dim"].collect()}
    assert str(cal[20545].arrival_date) == "2016-04-01"
    assert str(cal[20574].arrival_date) == "2016-04-30"
    assert cal[20545].year == 2016 and cal[20545].month == 4

    # fact is month-partitioned on disk (reference cell 45's proposal)
    assert (tmp_path / "immigration_fact" / "i94mon=4").exists()

    # every table lands non-empty (reference cell 42's data_exists loop)
    assert qc.run_suite([qc.assert_nonempty(df, k) for k, df in out.items()])
