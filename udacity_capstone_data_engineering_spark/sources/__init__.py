"""Sources & sinks: parquet/CSV/JSON/ORC/in-memory readers, file sinks."""

from udacity_capstone_data_engineering_spark.sources.catalog import TABLES, load_table, load_tables
from udacity_capstone_data_engineering_spark.sources.readers import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    table_from_rows,
)
from udacity_capstone_data_engineering_spark.sources.sinks import (
    write_bucketed,
    write_files,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "table_from_rows",
    "write_bucketed",
    "write_files",
    "write_parquet",
]
