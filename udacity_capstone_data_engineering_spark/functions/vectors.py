"""Vector functions over ``array<float>`` embedding columns.

Everything is built-in higher-order functions (``zip_with`` +
``aggregate``), evaluated inside whole-stage codegen — no Python UDFs,
no VectorUDT dependency. Arithmetic is forced to DOUBLE with strict
left-to-right accumulation so results are bit-identical to any engine
that sums element-wise in order (DuckDB's list_dot_product does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product in double, accumulated left-to-right."""
    prods = F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a| |b|)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
