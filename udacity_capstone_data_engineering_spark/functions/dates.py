"""Date functions (SURVEY.md §2.6 F2 / §2.7 U1).

The reference converted SAS epoch days (days since 1960-01-01) to ISO
strings with a row-at-a-time Python UDF (``etl.py:255-257``) — the only
Python-worker boundary in its whole pipeline — and extracted date parts
from those strings via implicit string→date coercion (``etl.py:258-262``).
Here both are pure JVM expressions: no serialization boundary, full
whole-stage codegen, and a real DateType column.

The reference UDF also mapped day-offset 0 to NULL (``if x else None``);
this implementation is null-safe and keeps 1960-01-01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date_to_date(days: Column | str) -> Column:
    """SAS day-offset (days since 1960-01-01) → DateType, JVM-side."""
    c = F.col(days) if isinstance(days, str) else days
    return F.date_add(F.to_date(F.lit(SAS_EPOCH)), c.cast("int"))


def date_to_sas_days(d: Column | str) -> Column:
    """Inverse: DateType → SAS day-offset."""
    c = F.col(d) if isinstance(d, str) else d
    return F.datediff(c, F.to_date(F.lit(SAS_EPOCH)))


def date_parts(df: DataFrame, date_col: str, prefix: str = "") -> DataFrame:
    """Append the reference's calendar-dim parts (``etl.py:258-262``):
    year, month, day, dayofweek (1=Sunday, Spark semantics), weekofyear
    (ISO) — all from a true date column in one select."""
    d = F.col(date_col)
    return df.select(
        "*",
        F.year(d).alias(f"{prefix}year"),
        F.month(d).alias(f"{prefix}month"),
        F.dayofmonth(d).alias(f"{prefix}day"),
        F.dayofweek(d).alias(f"{prefix}dayofweek"),
        F.weekofyear(d).alias(f"{prefix}weekofyear"),
    )
