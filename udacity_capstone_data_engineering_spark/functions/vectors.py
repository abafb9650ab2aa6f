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


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """``dot`` unrolled to ``dim`` scalar terms — BIT-IDENTICAL floats
    (r7 perf: the n² exact-cosine anchors).

    ``aggregate`` folds ``((0.0 + t0) + t1) + ...`` left-to-right; this
    builds the same association explicitly from scalar ``F.get``
    products, so every intermediate double is the same — but the whole
    expression stays inside whole-stage codegen instead of the
    INTERPRETED higher-order-function evaluator (measured ~15x per pair
    on the sf0.1 4M-pair cross join). NULL semantics match too:
    ``F.get`` past the end yields NULL (never an ANSI index error) and
    any NULL term nulls the sum, exactly like zip_with's null padding.

    Only valid when ``dim`` covers both arrays (longer tails would be
    silently dropped where ``dot`` would keep folding) — callers probe
    the corpus dim and fall back to ``dot`` when unknown.

    The element is fetched from the RAW array and cast scalar-wise
    (float->double widening is exact, so the product doubles are the
    same as casting the whole array first) — embedding the array cast
    under every ``F.get`` would re-cast the full array per term,
    O(dim²) per pair (the first cut of this function did exactly that
    and was SLOWER than the HOF fold it replaced)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    s = F.lit(0.0)
    for i in range(dim):
        s = s + F.get(ac, i).cast("double") * F.get(bc, i).cast("double")
    return s


def cosine_similarity_presq(
    dotp: Column, a_sumsq: Column, b_sumsq: Column
) -> Column:
    """``cosine_similarity`` with the per-side squared norms computed
    ONCE per row instead of once per pair (r7 perf): callers project
    ``dot(v, v)`` on each join side before the n² join, so the HOF
    norm fold runs n times, not n² times. ``sqrt(a_sumsq) *
    sqrt(b_sumsq)`` produces the identical doubles the inline
    ``l2_norm(a) * l2_norm(b)`` would."""
    denom = F.sqrt(a_sumsq) * F.sqrt(b_sumsq)
    return F.when(denom > 0, dotp / denom)


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
