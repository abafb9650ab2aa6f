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
    """cos(a, b) = a·b / (|a| |b|); NULL for zero-norm inputs (ANSI
    mode is Spark 4's default — an unguarded /0 RAISES, not inf)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def dot_vectorized(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched numpy dot product.

    Measured tradeoff (sf0.1, 1.5M candidate pairs of dim-64 vectors):
    the Arrow round-trip of nested list columns costs MORE than the
    interpreted builtin dot (29s vs 12s end-to-end) — per-pair scoring
    stays on ``dot``. This path wins only when the Python-side work is
    large relative to transfer (e.g. matrix ops against a broadcast
    matrix, long vectors, reused batches). NOT bit-portable across
    engines (SIMD/pairwise summation order) — use only where results
    feed a tolerance/recall check, never an exact oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dot(x, y):
        xa = np.vstack(x.to_numpy())
        ya = np.vstack(y.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", xa, ya))

    # Explicit form (not hints): module-level `from __future__ import
    # annotations` stringifies hints, breaking pyspark's inference.
    udf = pandas_udf(_dot, "double")
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return udf(ca, cb)
