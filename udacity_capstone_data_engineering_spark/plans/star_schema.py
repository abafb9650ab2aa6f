"""Reference-parity star-schema ETL, rebuilt on engine operators.

This is the reference pipeline (``etl.py:281-314``: six stage functions
building fact ``immigration`` + dims ``i94mode i94visa demographics
country i94date``) re-expressed as a declarative Pipeline DAG with the
reference's defects fixed:

  - null i94mode filled with 9 "Not reported" (the reference's comment
    said 9 but the code filled 0, a key absent from its own dim —
    ``etl.py:170-171``);
  - country⟕temperature join case-normalized on BOTH sides (the
    reference upper-cased one side and lower-cased the other, so the
    join never matched — ``etl.py:212,218``);
  - SAS day-offsets converted with JVM date arithmetic, not a Python
    UDF, and offset 0 keeps 1960-01-01 (``etl.py:255-257``);
  - calendar parts derived from a true DateType column;
  - fact written partitioned by arrival month (the reference's own
    100×-scale proposal, notebook cell 45, never implemented);
  - independent stages are declared as DAG nodes, not forced serial.

The in-memory dims reproduce the reference's literals
(``etl.py:48-53`` i94mode, ``etl.py:80-85`` i94visa).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from udacity_capstone_data_engineering_spark.functions.dates import sas_date_to_date
from udacity_capstone_data_engineering_spark.operators.projections import fill_nulls
from udacity_capstone_data_engineering_spark.plans.pipeline import Pipeline
from udacity_capstone_data_engineering_spark.sources.readers import table_from_rows

I94MODE_ROWS = [(1, "Air"), (2, "Sea"), (3, "Land"), (9, "Not reported")]
I94MODE_SCHEMA = StructType(
    [StructField("i94mode", IntegerType()), StructField("mode_name", StringType())]
)

I94VISA_ROWS = [(1, "Business"), (2, "Pleasure"), (3, "Student")]
I94VISA_SCHEMA = StructType(
    [StructField("vid", IntegerType()), StructField("visa_purpose", StringType())]
)

# Columns the reference drops: >60%-null (notebook cells 12-14) then
# unneeded operational fields (etl.py:163-168).
HIGH_NULL_COLS = ["visapost", "occup", "entdepu", "insnum", "fltno"]
# ref etl.py:167 — the reference drops admnum and KEEPS dtadfile;
# rounds 2-4 had the two swapped (caught by the r5 sampled fact-value
# parity test against the committed golden output)
UNNEEDED_COLS = ["count", "entdepa", "entdepd", "matflag", "dtaddto", "biryear", "admnum"]


def build_star_schema(
    spark: SparkSession,
    immigration_raw: DataFrame,
    demographics_raw: DataFrame,
    temperature_raw: DataFrame,
    country_lookup_raw: DataFrame,
    workdir: str,
) -> dict[str, DataFrame]:
    """Run the full star-schema build; returns the 6 output tables."""
    pl = Pipeline(spark, workdir=workdir)

    @pl.stage("i94mode_dim", materialize=True)
    def i94mode_dim():
        return table_from_rows(spark, I94MODE_ROWS, I94MODE_SCHEMA)

    @pl.stage("i94visa_dim", materialize=True)
    def i94visa_dim():
        return table_from_rows(spark, I94VISA_ROWS, I94VISA_SCHEMA)

    @pl.stage("demographics_dim", materialize=True)
    def demographics_dim():
        # Reference etl.py:102-131: group city rows (one per race) to
        # one row per (City, State, State Code); deterministic via max
        # instead of first (the measures are identical within a group).
        return demographics_raw.groupBy("City", "State", "State Code").agg(
            F.max("Median Age").alias("median_age"),
            F.max("Male Population").cast("int").alias("male_population"),
            F.max("Female Population").cast("int").alias("female_population"),
            F.max("Total Population").cast("int").alias("total_population"),
        )

    @pl.stage("country_dim", materialize=True)
    def country_dim():
        # Reference etl.py:194-230 — with the join made case-correct.
        temps = temperature_raw.groupBy(
            F.upper(F.col("Country")).alias("country_key")
        ).agg(F.avg(F.col("AverageTemperature").cast("double")).alias("avg_temperature"))
        lookup = country_lookup_raw.select(
            F.col("Code").cast("int").alias("Code"),
            F.upper(F.col("I94CTRY")).alias("I94CTRY"),
        )
        return lookup.join(
            F.broadcast(temps),
            lookup.I94CTRY == temps.country_key,
            "left",
        ).drop("country_key")

    @pl.stage("immigration_fact", materialize=True, partition_by=["i94mon"])
    def immigration_fact():
        # Reference etl.py:143-181: drop sparse + operational columns,
        # cast keys, fill unreported mode with ITS OWN dim key (9).
        df = immigration_raw.drop(*HIGH_NULL_COLS).drop(*UNNEEDED_COLS)
        df = df.select(
            *[
                F.col(c).cast("int").alias(c)
                if c in ("cicid", "i94yr", "i94mon", "i94cit", "i94res",
                         "i94mode", "i94visa", "i94bir", "arrdate", "depdate")
                else F.col(c)
                for c in df.columns
            ]
        )
        return fill_nulls(df, {"i94mode": 9})

    @pl.stage("i94date_dim", inputs=["immigration_fact"], materialize=True)
    def i94date_dim(fact):
        # Reference etl.py:243-266, JVM-side and from true dates.
        arr = fact.select(F.col("arrdate").alias("arrival_sasdate")).distinct()
        d = sas_date_to_date("arrival_sasdate")
        return arr.select(
            "arrival_sasdate",
            d.alias("arrival_date"),
            F.year(d).alias("year"),
            F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"),
            F.dayofweek(d).alias("dayofweek"),
            F.weekofyear(d).alias("weekofyear"),
        )

    return pl.run()
