"""Generic readers: parquet, CSV (all the reference's spellings), in-memory.

Covers SURVEY.md §2.1 S1-S7:
  - S1  parquet scan                      (reference ``etl.py:154`` etc.)
  - S2  CSV custom delimiter + header     (``etl.py:113``)
  - S3  CSV header-only all-string        (``etl.py:206``)
  - S4  CSV via format().options().load() (``etl.py:216``) — same engine path
  - S7  in-memory rows + explicit schema  (``etl.py:48-53, 80-85``)

Unlike the reference we prefer explicit schemas over ``inferSchema`` (an
extra full scan of the file and nondeterministic typing at scale), and we
never leave numerics as strings (reference read temperatures all-string
and leaned on implicit coercion inside ``avg``, ``etl.py:206-209``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan across snapshots whose schemas evolved (columns
    added over time): ``mergeSchema`` unions the footers' schemas and
    fills absent columns with NULL.

    Scale note: schema merging reads every file's FOOTER up front — on
    a 100 TB lake keep it off (the default) for stable-schema tables
    and reach for this reader only at true evolution boundaries, or
    persist the merged schema once and pass it explicitly thereafter.
    """
    return spark.read.option("mergeSchema", True).parquet(*paths)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV reader covering S2/S3/S4/S5 spellings with one code path."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines reader (one record per line; ``multiline=True`` for
    pretty-printed arrays).

    Prefer an explicit ``schema``: inference scans the whole input once
    before the real job, and on a 100 TB landing zone that doubles the
    read. JSONL (the default) splits by line so it parallelizes across
    executors; multiLine JSON gives one task per FILE — keep such files
    small or convert at the edge.
    """
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning guarantees as parquet."""
    return spark.read.orc(path)


# S6: the third-party SAS datasource the reference intended to load
# (``etl.py:28``; its second ``.config()`` call at ``etl.py:29``
# overwrote ``spark.jars.packages``, so it never actually loaded and
# the pipeline only ever read pre-converted parquet at ``etl.py:154``).
SAS_FORMAT = "com.github.saurfang.sas.spark"
SAS_PACKAGE = "saurfang:spark-sas7bdat:3.0.0-s_2.12"


def read_sas(spark: SparkSession, path: str) -> DataFrame:
    """SAS7BDAT scan — explicit plugin point (S6).

    The datasource jar is not bundled (and not installable in this
    container); when absent, fail with the exact coordinates to add
    rather than Spark's generic DATA_SOURCE_NOT_FOUND."""
    try:
        return spark.read.format(SAS_FORMAT).load(path)
    except Exception as e:
        if "DATA_SOURCE_NOT_FOUND" in str(e) or "Failed to find" in str(e):
            raise ImportError(
                "SAS7BDAT support requires the spark-sas7bdat datasource: "
                f'add .config("spark.jars.packages", "{SAS_PACKAGE}") to the '
                "session builder (exactly once — setting it twice overwrites, "
                "the reference's etl.py:28-29 bug)"
            ) from e
        raise


def table_from_rows(
    spark: SparkSession, rows: Iterable[tuple], schema: StructType | str
) -> DataFrame:
    """In-memory dimension table from literal rows + explicit schema (S7).

    Routed through ``session.local_df`` (r11): the default
    ``createDataFrame(list)`` spreads the pickled rows over every
    default-parallelism slot and each near-empty partition pays a
    Python-worker round-trip — a dimension table of a dozen rows does
    not need 32 Python partitions."""
    from udacity_capstone_data_engineering_spark.session import local_df

    return local_df(spark, list(rows), schema)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Plain-text reader.

    Default (``whole_file=False``): one row per LINE (``value string``)
    — splittable, so a large file still fans out across executors.
    ``whole_file=True``: one row per FILE — the document-ingestion
    shape (one doc per file); NOT splittable, so a corpus must arrive
    as many files for parallelism (it does — that's how crawls land).
    """
    return spark.read.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file reader — the multimodal ingestion path.

    Emits ``(path, modificationTime, length, content binary)`` — the
    exact input shape `operators/multimodal.py` consumes (opaque bytes
    + metadata). Each file is one row and one task unit; Spark caps
    per-task memory via ``spark.sql.files.maxPartitionBytes`` grouping
    small files together, so millions of small images batch into
    sane tasks. Push a ``pathGlobFilter`` instead of filtering on the
    path column after the scan: the glob prunes at file LISTING time,
    the filter only after bytes were read.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_csv_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    corrupt_col: str = "_corrupt_record",
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV ingestion that QUARANTINES malformed rows instead of
    silently nulling (PERMISSIVE default) or dropping (DROPMALFORMED)
    them: rows that fail the schema land intact in ``corrupt_col``,
    good rows parse normally. On a 100-TB landing zone this is the
    only auditable mode — the corrupt column feeds a quarantine sink
    and a QC count (`qc.expectations`), so bad upstream exports are
    MEASURED, not discovered weeks later as nulls. The schema must
    include the corrupt column (string, nullable) per Spark's
    contract; this helper appends it."""
    if isinstance(schema, str):
        full = f"{schema}, {corrupt_col} string"
    else:
        from pyspark.sql.types import StringType, StructField

        full = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
    return (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .csv(path)
    )
