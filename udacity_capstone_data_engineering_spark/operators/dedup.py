"""Deduplication operators for LLM training-data pipelines.

Four tiers, all engine-portable (md5-derived hashes — see
``functions/hashing.py``) and all expressed as DataFrame ops:

  - exact:    fingerprint groupBy (one shuffle on a 60-bit key).
  - MinHash:  shingle → k seeded min-hashes → LSH banding → bucket
    self-join → Jaccard verify. The self-join happens only WITHIN
    buckets, never across the whole corpus: at 100 TB the candidate
    space collapses from O(n²) to O(sum of bucket² sizes).
  - SimHash:  token-hash bit-vote signature; near-dups share signatures
    (or differ in few bits).
  - n-gram Jaccard: exact pairwise verify, used standalone only at
    small scale / as the oracle for the approximate tiers.

No Python UDFs anywhere — shingling/hashing are builtin higher-order
functions, and the heavy lifting (groupBy/join) is left to Catalyst+AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.functions.hashing import portable_hash64
from udacity_capstone_data_engineering_spark.functions.text import char_shingles


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content fingerprint: one row per distinct content,
    with the (deterministic) minimal id as representative and the copy
    count. ``copies > 1`` rows are the duplicate groups."""
    return (
        df.select(portable_hash64(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-document MinHash signature: for seed i, min over shingles of
    hash64(i, shingle). Entirely per-row (no shuffle); signature is an
    array<bigint> column of length ``num_hashes``."""
    sh = char_shingles(text_col, k=shingle_k)

    def seeded(seed: int):
        # Single-arg lambda: a 2-arg lambda would make Spark pass the
        # array INDEX as the second argument.
        prefix = f"{seed}:"
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 15), 16, 10
        ).cast("bigint")

    mins = [
        F.array_min(F.transform(sh, seeded(i))) for i in range(num_hashes)
    ]
    return df.select(F.col(id_col), F.array(*mins).alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` equal slices,
    bucket documents by (band_index, slice-hash), and emit candidate
    pairs from shared buckets.

    Scale design: the only shuffle is the groupBy-shaped self-join on
    the band key; huge buckets (degenerate content) are the skew risk,
    handled by AQE skew-join splitting and by capping with
    ``spark.sql.autoBroadcastJoinThreshold``-independent hash join.
    """
    n = signatures.select(F.size("signature")).first()[0]
    rows_per_band = n // bands
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bkey")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bkey") == F.col(f"b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate (id_a, id_b) pairs.
    Joins the (small) pair list against per-doc shingle sets, then
    computes |∩| / |∪| with array builtins."""
    sh = df.select(
        F.col(id_col), char_shingles(text_col, k=shingle_k).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature via token-hash bit voting.

    Implemented the scale-friendly way: explode tokens, then ONE
    groupBy(id) with ``bits`` conditional sums — partial aggregation
    collapses each partition's tokens map-side, so the shuffle carries
    |docs| x ``bits`` integers, not raw tokens.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("tok"),
    )
    h = portable_hash64(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = bit if sig is None else sig + bit
    return voted.select(F.col(id_col), sig.alias("simhash"))
