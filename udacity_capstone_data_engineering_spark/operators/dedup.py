"""Deduplication operators for LLM training-data pipelines.

Four tiers, all engine-portable (md5-derived hashes — see
``functions/hashing.py``) and all expressed as DataFrame ops:

  - exact:    fingerprint groupBy (one shuffle on a 60-bit key).
  - MinHash:  word-shingle → k affine min-hashes → LSH banding → bucket
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
from udacity_capstone_data_engineering_spark.functions.text import (
    shingles_from_tokens,
    tokens,
    word_shingles,
)


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


def collapse_exact_duplicates(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """One representative row per distinct content: (id, text,
    group_size), representative = minimal id.

    This is the SKEW VALVE in front of the near-dup tier. A
    boilerplate-heavy corpus (real web data: templates, legal
    disclaimers, scraped nav chrome) puts every copy of a template
    into the SAME LSH bucket in EVERY band — in-bucket pair
    enumeration is then quadratic in the template's copy count (20%
    of a 1 B-doc corpus sharing one template = 4×10^16 pairs: game
    over, and AQE cannot split compute that a single bucket's explode
    generates). Byte-identical copies carry zero information for
    NEAR-dup detection, so collapse them first with one cheap
    fingerprint shuffle; the minhash/LSH tier then sees one
    representative per template and its bucket sizes reflect genuine
    near-duplicate structure. Pair counts drop from O(copies²) to
    O(reps²-within-bucket); exact-duplicate membership stays available
    via :func:`exact_duplicates` for cluster reassembly.
    """
    return (
        df.select(F.col(id_col), F.col(text_col))
        .groupBy(F.md5(F.col(text_col).cast("binary")).alias("__fp"))
        .agg(F.min(F.struct(id_col, text_col)).alias("__rep"), F.count(F.lit(1)).alias("group_size"))
        .select(
            F.col(f"__rep.{id_col}").alias(id_col),
            F.col(f"__rep.{text_col}").alias(text_col),
            "group_size",
        )
    )


def near_dup_pairs_collapsed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    bands: int = 4,
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Boilerplate-robust near-dup detection: exact-collapse →
    MinHash-LSH over representatives → Jaccard verify.

    Returns (id_a, id_b, jaccard, copies_a, copies_b): verified
    near-dup REPRESENTATIVE pairs with each side's exact-copy count —
    enough to reconstruct full duplicate clusters (each rep stands for
    its byte-identical group) without ever enumerating the quadratic
    intra-template pairs.
    """
    reps = collapse_exact_duplicates(df, text_col, id_col)
    sigs = minhash_signatures(reps, text_col, id_col, num_hashes=num_hashes, shingle_k=shingle_k)
    cands = lsh_candidate_pairs(sigs, id_col, bands=bands, num_hashes=num_hashes)
    verified = jaccard_pairs(reps, text_col, id_col, cands, shingle_k=shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    sizes = reps.select(F.col(id_col), F.col("group_size"))
    return (
        verified.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("group_size").alias("copies_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("group_size").alias("copies_b")),
            "id_b",
        )
        .select("id_a", "id_b", "jaccard", "copies_a", "copies_b")
    )


MERSENNE31 = 2_147_483_647  # 2^31 - 1: affine-hash modulus; products fit int64


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the affine MinHash family
    h_i(x) = (a_i * x + b_i) mod (2^31-1). Engine-portable: any SQL
    engine reproduces this with exact int64 arithmetic (a*x < 2^62)."""
    params = []
    for i in range(num_hashes):
        a = (1103515245 * (i + 1) + 12345) % MERSENNE31 or 1
        b = (2654435761 * i + 1013904223) % MERSENNE31
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-document MinHash signature. Each shingle is md5-hashed ONCE
    (the expensive part), reduced mod 2^31-1, then the ``num_hashes``
    permutations are cheap affine maps over that base — 16x less
    hashing than seeding md5 per permutation. Entirely per-row (no
    shuffle); signature is an array<bigint> of length ``num_hashes``."""
    # Bind tokens, then shingles, as real columns: each projection's
    # output is computed once per row; leaving them as nested
    # expressions re-runs the regex split per shingle position.
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    shingled = toked.select(
        F.col(id_col),
        shingles_from_tokens(F.col("__toks"), k=shingle_k).alias("__sh"),
    )
    bases = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % F.lit(MERSENNE31),
    )
    params = minhash_params(num_hashes)
    coeff_a = F.array(*[F.lit(a) for a, _ in params])
    coeff_b = F.array(*[F.lit(b) for _, b in params])
    # ONE traversal of the shingle array updating all k minima at once.
    # (k separate array_min(transform(bases, ...)) calls would re-evaluate
    # the md5 base expression k times — higher-order-function
    # subexpressions are not CSE'd by codegen.)
    init = F.array_repeat(F.lit(MERSENNE31).cast("bigint"), num_hashes)
    signature = F.aggregate(
        bases,
        init,
        lambda acc, x: F.zip_with(
            acc,
            F.zip_with(coeff_a, coeff_b, lambda a, b: (a * x + b) % F.lit(MERSENNE31)),
            lambda m, h: F.least(m, h),
        ),
    )
    # Docs with no shingles (< k tokens) must get NULL, not the sentinel
    # init vector — identical sentinel signatures would LSH-bucket all
    # short docs together.
    signature = F.when(F.size("__sh") > 0, signature)
    return shingled.select(F.col(id_col), signature.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
    num_hashes: int = 16,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` equal slices,
    bucket documents by (band_index, slice-hash), and emit candidate
    pairs from shared buckets.

    Scale design: ONE shuffle (groupBy band key), signatures computed
    in a single pass — no self-join, so the upstream signature lineage
    is never evaluated twice. Pairs are enumerated inside each bucket
    with array combinatorics; degenerate buckets (boilerplate content)
    are the skew risk — their pair count is quadratic in bucket size,
    which is inherent to LSH; AQE splits the skewed partitions.
    """
    if num_hashes % bands != 0:
        # 'No silent caps' rule: flooring rows_per_band would quietly
        # drop trailing hash slots and reduce recall with no signal.
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    # NULL signatures (short docs) are skipped via explode-of-NULL
    # (yields zero rows) rather than a .filter(isNotNull): Catalyst
    # pushes that filter below the signature projection and re-evaluates
    # the whole MinHash expression in the predicate — measured 6x slower.
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.when(F.col("signature").isNotNull(), F.array(
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
            ))
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bkey")
    buckets = (
        banded.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # All (i < j) pairs within a bucket, generated JVM-side.
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


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
    sh = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        F.col(id_col), shingles_from_tokens(F.col("__toks"), k=shingle_k).alias("sh")
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


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram of the
    normalized text, then keep the MINIMUM hash of each sliding window
    of ``window`` consecutive k-gram hashes. Guarantees every match of
    length >= k + window - 1 between two documents shares a fingerprint,
    while storing only ~2/(window+1) of the k-gram hashes.

    Output: (id, fp bigint) — one row per distinct selected fingerprint.
    Entirely per-row builtin higher-order functions (no shuffle, no
    UDF); at 100 TB this is a map-only stage whose output feeds the same
    fingerprint groupBy as exact dedup.
    """
    from udacity_capstone_data_engineering_spark.functions.text import normalize_text

    # Bind normalized text, then the k-gram hash array, as real columns:
    # HOF lambdas are not subexpression-eliminated, so nesting would
    # recompute normalize_text per gram and the gram hashes per window.
    normed = df.select(F.col(id_col), normalize_text(text_col).alias("__t"))
    n_grams = F.length("__t") - F.lit(k - 1)
    grams = F.when(n_grams < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: portable_hash64(F.col("__t").substr(i, F.lit(k))),
        )
    )
    hashed = normed.select(F.col(id_col), grams.alias("__gh"))
    n_windows = F.size("__gh") - F.lit(window - 1)
    fps = F.when(n_windows < 1, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(F.col("__gh"), j, window)),
            )
        )
    )
    return hashed.select(F.col(id_col), F.explode(fps).alias("fp"))


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


def gradient_sign_fingerprint(
    df: DataFrame,
    id_col: str,
    order_col: str,
    value_col: str,
    nbits: int,
) -> DataFrame:
    """Pack the GRADIENT SIGNS of a per-id ordered integer sequence
    into one BIGINT fingerprint: bit j (0-based, little-endian) is set
    iff ``value[j] < value[j+1]`` — the shared kernel of the audio
    envelope fingerprint and the video scene signature (VERDICT r7 #3),
    and the 1-D cousin of the image tier's dHash (gradient signs are
    invariant to uniform level shifts, which is what makes these NEAR-
    dup hashes rather than byte hashes).

    ``order_col`` must hold dense 0..n-1 integers per id and ``nbits``
    <= 63 (the fingerprint must fit a BIGINT); ids with fewer than
    ``nbits + 1`` sequence values simply contribute their defined bits.
    Pure integer comparisons, so results are value-hash-gateable, and
    pairs at Hamming distance <= bands-1 are found EXACTLY by
    ``simhash_near_dup_pairs`` over the output (pigeonhole).

    Scale shape: one window (lead) + one keyed sum — both partition by
    id, sequences per id are bounded (frames of one payload), so this
    is a map-heavy two-stage agg with no skew surface."""
    if nbits > 63:
        raise ValueError(f"nbits ({nbits}) must fit a BIGINT (<= 63)")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(order_col)
    nx = df.withColumn("__nxt", F.lead(value_col).over(w)).filter(
        F.col(order_col) < nbits
    )
    bit = F.when(
        F.col(value_col) < F.col("__nxt"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {order_col})"),
    ).otherwise(F.lit(0).cast("long"))
    return nx.groupBy(id_col).agg(
        F.sum(bit).cast("long").alias("fingerprint")
    )


def simhash_near_dup_pairs(
    signatures: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int | None = None,
) -> DataFrame:
    """Near-dup pairs from SimHash signatures via Hamming-banded
    bucketing: split each ``bits``-bit signature into ``bands`` disjoint
    bit slices, bucket ids by (band, slice value), and verify candidate
    pairs with ``bit_count(xor)``.

    Completeness guarantee (pigeonhole): a pair at Hamming distance
    <= bands - 1 differs in fewer bits than there are slices, so it
    must AGREE exactly on at least one slice and lands in a shared
    bucket. With ``max_hamming <= bands - 1`` (default: bands - 1) the
    result is therefore EXACT — every qualifying pair is found — which
    is why this operator carries a full hash oracle while MinHash-LSH
    (probabilistic banding) cannot.

    Scale design mirrors ``lsh_candidate_pairs``: ONE shuffle on the
    (band, slice) key, signatures carried into the buckets so the
    Hamming verify needs no second join, pairs enumerated JVM-side
    inside buckets. Bucket skew (a popular slice value) is quadratic in
    bucket size — inherent to banding; AQE splits the skewed partitions.
    """
    if bits % bands != 0:
        raise ValueError(f"bits ({bits}) must be divisible by bands ({bands})")
    if max_hamming is None:
        max_hamming = bands - 1
    if max_hamming > bands - 1:
        # 'No silent caps': past bands-1 the pigeonhole guarantee breaks
        # and the banded join silently misses pairs. Refuse rather than
        # degrade from exact to approximate without signal.
        raise ValueError(
            f"max_hamming ({max_hamming}) > bands - 1 ({bands - 1}) loses the "
            "completeness guarantee; raise bands instead"
        )
    bpb = bits // bands
    mask = (1 << bpb) - 1
    sig = F.col(sig_col).cast("bigint")
    banded = signatures.select(
        F.col(id_col),
        sig.alias("__sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(sig, b * bpb)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "__sig", "bb.band", "bb.bkey")
    buckets = (
        banded.groupBy("band", "bkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("__sig")))
            ).alias("ds")
        )
        .filter(F.size("ds") > 1)
    )
    # All (i < j) pairs within a bucket, enumerated JVM-side with the
    # signatures in hand — the Hamming check happens right here, before
    # the cross-band distinct, so non-pairs never reach the shuffle.
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.filter(
                        F.transform(
                            F.slice(F.col("ds"), i + 2, F.size("ds")),
                            lambda y: F.struct(
                                x["id"].alias("id_a"),
                                y["id"].alias("id_b"),
                                F.bit_count(
                                    x["__sig"].bitwiseXOR(y["__sig"])
                                ).cast("int").alias("hamming"),
                            ),
                        ),
                        lambda p: p["hamming"] <= max_hamming,
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b", "p.hamming").distinct()


def duplicate_token_spans(
    df: DataFrame, text_col: str, id_col: str, w: int = 8
) -> DataFrame:
    """Substring-level EXACT dedup: maximal per-document spans in
    which EVERY TOKEN is covered by at least one ``w``-token window
    that also appears verbatim in some OTHER document — the
    span-granular regime of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., ACL 2022), which doc-level
    exact/near dedup cannot express (a unique page quoting a
    duplicated paragraph keeps the page but should lose the
    paragraph). Note the guarantee is TOKEN coverage, not
    window-universality (ADVICE r8): merging two duplicated windows
    that merely touch (next start == prev start + w) produces a span
    whose intermediate windows straddling the seam need not
    themselves be duplicated — exactly the Lee-et-al merge semantics
    the oracle replays.

    Returns one row per (document, maximal duplicated span):
    ``(id_col, span_start, span_end, span_tokens, n_dup_grams)`` with
    token positions 0-based inclusive. Two duplicated windows merge
    into one span when they overlap or touch (next start <= prev start
    + w); since every window spans exactly ``w`` tokens, a single
    ``lag`` test is the full gaps-and-islands condition (span ends are
    monotone in starts — no running max needed).

    Cross-doc only by design: a window repeated solely WITHIN one
    document is repetition (``doc_repetition_flags``), not duplication,
    and flagging it here would double-count that tier.

    Scale shape (100 TB): tokenize + window-hash are map-only builtin
    higher-order functions (no Python); the duplicated-window set is
    one map-side-combined groupBy on the 60-bit portable gram hash;
    the join back is keyed on the same hash (the dup set is DISTINCT
    duplicated grams — small next to the corpus and AQE-broadcastable;
    each position row matches exactly one dup row, so a boilerplate
    gram repeated 10^6 times fans out only to its true positions,
    which ARE the output); the island merge is one shuffle on doc id.
    No all-pairs stage anywhere — cost is linear in corpus tokens plus
    output spans.
    """
    from pyspark.sql import Window

    gram_hash_sql = (
        f"transform(sequence(0, size(__tk) - {w}), i -> "
        f"cast(conv(substr(md5(concat_ws(' ', slice(__tk, i + 1, {w}))), "
        f"1, 15), 16, 10) as bigint))"
    )
    grams = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__tk"))
        # sequence(0, size-w) COUNTS DOWN when size < w (Spark defaults
        # to step -1 for start > stop) — filter short docs out first.
        .filter(F.size("__tk") >= w)
        .select(
            id_col,
            F.posexplode(F.expr(gram_hash_sql)).alias("pos", "gh"),
        )
        .select(id_col, F.col("pos").cast("bigint").alias("pos"), "gh")
    )
    dup_grams = (
        grams.groupBy("gh")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("gh")
    )
    dup_pos = grams.join(dup_grams, "gh").select(id_col, "pos")
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(wdoc) > w, 1).otherwise(0)
    islands = dup_pos.withColumn("__brk", brk).withColumn(
        "island",
        F.sum("__brk").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (w - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + w).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("island")
    )
