"""Portable deterministic hashing.

Spark's builtin ``hash``/``xxhash64`` are Murmur3/xxHash with Spark-
specific seeds — not reproducible in other engines, which makes results
that embed hash values impossible to verify against an external oracle
(and unstable across engine migrations). All hash-bearing operators
(dedup fingerprints, MinHash, SimHash, LSH buckets) therefore use an
md5-derived 60-bit hash that any engine can reproduce:

    hash64(x) = int(md5(x)[:15], 16)          -- 60 bits, fits int64

Seeded variants prepend the seed: ``md5(seed || ':' || x)``, giving an
unbounded family of independent hash functions for MinHash permutations.

md5 is computed JVM-side by Spark's builtin (whole-stage codegen keeps
it vectorized); this is NOT a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 2^63: always a valid positive BIGINT


def portable_hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit engine-portable hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side spelling of :func:`portable_hash64`, for oracles."""
    inner = f"'{seed}:' || {expr}" if seed is not None else expr
    return f"CAST('0x' || substr(md5({inner}), 1, {HEX_CHARS}) AS BIGINT)"
