"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a table by one column gives tight per-file min/max ranges on
that column only; range predicates on a second column then prune
nothing. Interleaving the bits of two (or more) normalized key columns
into one Morton code and sorting by THAT gives every file a small
rectangle in (x, y) space — so 2-D range predicates skip most files via
ordinary parquet min/max stats, with no engine support needed beyond
"sort before write". This is the layout trick behind Delta/Iceberg
Z-ORDER, expressed as a plain column expression.

Pure JVM bit arithmetic (shifts/masks inside whole-stage codegen), and
engine-portable: the oracle reproduces the code with the same shifts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(cols, bits: int) -> Column:
    """m-ary Morton interleave: bit ``i`` of column ``j`` lands at
    position ``i * m + j`` (column 0 = even bits in the 2-D case).
    Inputs must already be non-negative ``bits``-bit ints — callers
    mask/quantize first.  Shared by :func:`morton_code` (raw 2-D
    expression, oracle-twinned) and the managed clustered-write path
    (``operators/layout.py``), so both tiers produce one curve
    convention.  Pure expression tree: 2 * bits * m JVM ops."""
    m = len(cols)
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * m + j
                )
            )
    return z


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    2*bits-bit Z-value: result bit 2i = bit i of x, bit 2i+1 = bit i of
    y. Inputs are masked to ``bits`` (callers normalize/quantize real
    values into that range first)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    mask = (1 << bits) - 1
    cx = cx.bitwiseAND(F.lit(mask))
    cy = cy.bitwiseAND(F.lit(mask))
    return morton_interleave([cx, cy], bits)


def morton_code_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB spelling of :func:`morton_code`, for oracles."""
    mask = (1 << bits) - 1
    cx = f"(CAST({x_expr} AS BIGINT) & {mask})"
    cy = f"(CAST({y_expr} AS BIGINT) & {mask})"
    parts = []
    for i in range(bits):
        parts.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_by(df, x: Column | str, y: Column | str, bits: int = 16):
    """Return ``df`` globally sorted by the Morton code of (x, y) —
    write the result with ``maxRecordsPerFile`` and each output file
    covers a compact (x, y) rectangle, so 2-D range scans prune files
    from footer stats alone. One range-partitioned sort (sampled
    boundaries), the same cost as any global ORDER BY write."""
    return df.orderBy(morton_code(x, y, bits))
