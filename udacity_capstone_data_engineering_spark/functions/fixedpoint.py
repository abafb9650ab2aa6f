"""Exact fixed-point rounding of integer-unit ratios — the portable
replacement for ``ROUND(numerator / denominator, d)`` on doubles.

The hazard class (found by the dual-sf gate on the bigram LM, r5f):
when the numerator is a QUANTIZED integer-unit sum (multiples of
1e-9) and the denominator a small integer, the exact quotient lands
on a decimal rounding tie (``x.xxxxxx5``) with probability ~grid
ratio — 3 of 5000 documents at sf0.1 — and the two engines then
disagree: the tie is not representable in binary, so Spark's HALF_UP
on the double's decimal view and DuckDB's rounding of the binary
value flip a coin per tie. Irrational intermediates (sqrt, ln applied
AFTER the division) have measure-zero ties and are safe; exact
rational quotients are not.

The fix: never round the double. Round the RATIO in pure integer
arithmetic — half-away-from-zero via the same pmod floor-division
spell the integer k-means oracle uses — and convert only the final
grid value to double (exact for any value this engine emits).

    q = floor((2*num + sign(num)*den) / (2*den))     -- exact
    result = q / 10^out_decimals                     -- one exact op

Both sides of every oracle pair must use the same spell; the DuckDB
spelling is produced by :func:`exact_round_div_sql`.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def exact_round_div(num: Column, den: Column, out_decimals_drop: int) -> Column:
    """Round ``num / (den * 10^out_decimals_drop)`` to the integer
    grid, half-away-from-zero, entirely in BIGINT arithmetic.

    ``num`` is a BIGINT in fine units (e.g. 1e-9); ``den`` the BIGINT
    divisor; ``out_decimals_drop`` how many decimal digits of the fine
    unit the output grid drops (9-decimal units -> 6-decimal output =
    3). Returns the BIGINT quotient on the coarse grid; divide by the
    coarse scale (a power of ten, one exact double op) to emit."""
    half = den * F.lit(10**out_decimals_drop)
    d = F.lit(2) * half
    t = F.lit(2) * num + F.when(num >= 0, half).otherwise(-half)
    return ((t - ((t % d + d) % d)) / d).cast("long")


def exact_round_div_sql(num: str, den: str, out_decimals_drop: int) -> str:
    """DuckDB spelling of :func:`exact_round_div` (same pmod spell)."""
    scale = 10**out_decimals_drop
    d = f"(2 * ({den}) * {scale})"
    half = f"(({den}) * {scale})"
    t = f"(2 * ({num}) + CASE WHEN ({num}) >= 0 THEN {half} ELSE -{half} END)"
    return (
        f"CAST(({t} - ((({t} % {d}) + {d}) % {d})) / {d} AS BIGINT)"
    )
