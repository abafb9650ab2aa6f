"""Phase-13 query tier (round 7): the audio and video legs of the
multimodal tier — REAL WAV/PCM16 decode and concatenated-PPM video
frame math under the value-hash gate, mirroring the round-6 image
codec (`queries_phase11`): synthesized payloads from document text
bytes, pure-numpy decoders behind Arrow-batched ``mapInPandas``,
quarantine branches (corrupt AND unsupported) that are themselves
hash-gated, and exact-integer statistics throughout.

Same contract as ``queries.py`` (imported at the end of that module so
everything lands in one registry); house determinism rules apply.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_capstone_data_engineering_spark.queries import _register
from udacity_capstone_data_engineering_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Multimodal: REAL audio decode (WAV / RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------

# Synthesized 64-sample mono 8 kHz WAV per document: a 44-byte canonical
# PCM header + the first 128 ASCII text bytes as little-endian int16
# samples (low byte first; the high byte is ASCII < 128, so every sample
# is non-negative and < 32768 — |s| = s, which the oracle exploits).
# Three payload populations, all oracle-gated:
#   doc_id % 5 == 0                      -> TRUNCATED data chunk (the
#                                           declared size exceeds the
#                                           bytes present) -> 'corrupt'
#   else doc_id % 11 == 3                -> format tag 3 (IEEE float)
#                                           -> 'unsupported' (needs a
#                                           real codec library)
#   otherwise                            -> valid PCM16 -> 'ok'
_WAV_N = 64  # samples per payload
_WAV_RATE = 8000
_WAV_FRAME = 16  # samples per analysis frame -> 4 frames/doc
_WAV_CORRUPT_MOD = 5
_WAV_UNSUP_MOD = 11
_WAV_UNSUP_RES = 3
_WAV_CORRUPT_BODY = 50  # bytes present in the truncated data chunk


def _wav_header(fmt_tag: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for the fixed payload shape
    (mono, 8 kHz, 16-bit, 128-byte data chunk). ``fmt_tag=1`` is
    integer PCM (decodable); ``fmt_tag=3`` is IEEE float (the
    unsupported-branch fixture)."""
    body_len = _WAV_N * 2
    return (
        b"RIFF"
        + (36 + body_len).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + fmt_tag.to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + _WAV_RATE.to_bytes(4, "little")
        + (_WAV_RATE * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + body_len.to_bytes(4, "little")
    )


def _wav_payloads(spark, sf_dir):
    # ASCII invariant, same as the image tier (ADVICE r6): Spark slices
    # characters then UTF-8-encodes while the decoder reads bytes, and
    # the DuckDB oracle slices bytes and reads code points — both sides
    # filter to char-length == byte-length so the populations agree
    # exactly (a non-ASCII fixture is excluded on both sides, never
    # silently divergent).
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") >= _WAV_N * 2)
        & (F.length("text") == F.octet_length("text"))
    )
    body = F.encode(F.substring("text", 1, _WAV_N * 2), "UTF-8")
    ok = F.concat(F.lit(_wav_header(1)), body)
    unsup = F.concat(F.lit(_wav_header(3)), body)
    corrupt = F.concat(
        F.lit(_wav_header(1)),
        F.encode(F.substring("text", 1, _WAV_CORRUPT_BODY), "UTF-8"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % _WAV_CORRUPT_MOD == 0, corrupt)
        .when(F.col("doc_id") % _WAV_UNSUP_MOD == _WAV_UNSUP_RES, unsup)
        .otherwise(ok)
        .alias("payload"),
    )


# Shared oracle scaffolding: the labeled population and the per-sample
# reconstruction (sample i = byte(2i+1) + 256*byte(2i+2), 0-based i).
_WAV_LAB_SQL = f"""
    d AS (SELECT doc_id, text FROM documents
          WHERE strlen(text) >= {_WAV_N * 2}
            AND length(text) = strlen(text)),
    lab AS (SELECT doc_id, text,
                   CASE WHEN doc_id % {_WAV_CORRUPT_MOD} = 0 THEN 'corrupt'
                        WHEN doc_id % {_WAV_UNSUP_MOD} = {_WAV_UNSUP_RES}
                             THEN 'unsupported'
                        ELSE 'ok' END AS status
            FROM d),
    smp AS (SELECT doc_id, i,
                   CAST(ascii(substring(text, CAST(2*i+1 AS INT), 1))
                      + 256*ascii(substring(text, CAST(2*i+2 AS INT), 1))
                        AS BIGINT) AS s
            FROM lab, range({_WAV_N}) t(i) WHERE status = 'ok')
"""


@_register(
    "audio_decode_stats",
    f"""
    WITH {_WAV_LAB_SQL},
    sums AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS sum_abs,
                    CAST(sum(s*s) AS BIGINT) AS sum_sq
             FROM smp GROUP BY doc_id)
    SELECT l.doc_id, l.status,
           CASE WHEN l.status = 'ok' THEN {_WAV_RATE} END AS sample_rate,
           CASE WHEN l.status = 'ok' THEN 1 END AS n_channels,
           CASE WHEN l.status = 'ok' THEN CAST({_WAV_N} AS BIGINT) END
               AS n_samples,
           u.sum_abs, u.sum_sq
    FROM lab l LEFT JOIN sums u USING (doc_id)
    """,
)
def audio_decode_stats(spark, sf_dir):
    """REAL audio decode under the value-hash gate (the audio leg the
    multimodal tier lacked; image landed in round 6): each document's
    leading text bytes become a mono 8 kHz WAV payload, decoded by the
    pure-numpy RIFF/PCM16 parser (``operators/audio.decode_wav``) —
    container walk, fmt/data extraction, little-endian int16 read. Sum
    of |samples| and sum of squares are exact BIGINTs, so the oracle
    recomputes every sample from the text bytes with substring+ascii
    (high byte ASCII < 128 -> samples non-negative -> |s| = s).

    BOTH failure branches are hash-gated, not just unit-tested: 1-in-5
    payloads truncate the data chunk mid-body (decoder raises
    ValueError -> status='corrupt') and the surviving doc_id % 11 == 3
    population carries format tag 3, IEEE-float PCM (raises
    NotImplementedError -> status='unsupported' — the slot where
    soundfile/ffmpeg plug in on a real cluster).

    Scale shape: Arrow-batched mapInPandas, bounded per-worker payload
    batches, map-only (zero shuffle); the reference has no audio path
    at all (its scope ends at tabular SAS/CSV ingest, etl.py:1-337)."""
    from udacity_capstone_data_engineering_spark.operators.audio import (
        decode_audio_stats,
    )

    return decode_audio_stats(_wav_payloads(spark, sf_dir), "payload", "doc_id")


@_register(
    "audio_frame_energy",
    f"""
    WITH {_WAV_LAB_SQL}
    SELECT doc_id, CAST(i // {_WAV_FRAME} AS INT) AS frame_idx,
           CAST(count(*) AS INT) AS n_in_frame,
           CAST(sum(s*s) AS BIGINT) AS energy
    FROM smp GROUP BY doc_id, i // {_WAV_FRAME}
    """,
)
def audio_frame_energy(spark, sf_dir):
    """Per-frame PCM energy (the VAD/segmentation primitive): the
    decoded sample stream cut into 16-sample frames, each emitting an
    exact BIGINT sum of squares. Corrupt/unsupported payloads
    contribute no rows (their quarantine verdicts live in
    ``audio_decode_stats``), matching the image-resize contract.

    Scale shape: decode + frame explosion is map-only; the per-frame
    aggregation happens inside the worker (numpy slice sums), so rows
    crossing Arrow are frames, never samples."""
    from udacity_capstone_data_engineering_spark.operators.audio import (
        audio_frame_energy as frame_energy,
    )

    return frame_energy(
        _wav_payloads(spark, sf_dir), "payload", "doc_id", frame=_WAV_FRAME
    )


@_register(
    "audio_silence_flags",
    f"""
    WITH {_WAV_LAB_SQL},
    fr AS (SELECT doc_id, CAST(i // {_WAV_FRAME} AS INT) AS frame_idx,
                  CAST(sum(s*s) AS BIGINT) AS energy
           FROM smp GROUP BY doc_id, i // {_WAV_FRAME})
    SELECT doc_id, frame_idx, energy,
           energy * (COUNT(*) OVER (PARTITION BY doc_id)) * 2
               < (SUM(energy) OVER (PARTITION BY doc_id)) AS silent
    FROM fr
    """,
)
def audio_silence_flags(spark, sf_dir):
    """Relative silence gate composed ON TOP of the frame-energy
    operator: a frame is silent iff its energy is below half the
    document's mean frame energy — written integer-exact as
    ``energy * n_frames * 2 < total_energy`` (no division anywhere,
    per the house divide-then-round rule), so the boolean is
    hash-gateable. This is the audio analogue of the text tier's
    quality gates: a cheap exact signal a 100 TB pipeline can filter
    on before any expensive model pass.

    Scale shape: one doc-keyed aggregation over frames joined back to
    the frame relation — the doc-id key is the natural partitioner and
    frames-per-doc is bounded by payload length."""
    from udacity_capstone_data_engineering_spark.operators.audio import (
        audio_frame_energy as frame_energy,
    )

    fe = frame_energy(
        _wav_payloads(spark, sf_dir), "payload", "doc_id", frame=_WAV_FRAME
    )
    tot = fe.groupBy("doc_id").agg(
        F.sum("energy").alias("__tot"),
        F.count(F.lit(1)).alias("__nf"),
    )
    return fe.join(tot, "doc_id").select(
        "doc_id",
        "frame_idx",
        "energy",
        (F.col("energy") * F.col("__nf") * 2 < F.col("__tot")).alias("silent"),
    )


# ---------------------------------------------------------------------------
# Multimodal: REAL video frame math (concatenated PPM P6 frames)
# ---------------------------------------------------------------------------

# Synthesized 4-frame 8x4 video per document: frame f's 96 pixel bytes
# are text chars [32f+1, 32f+96] (stride 32 < 96, so consecutive frames
# overlap 2/3 — a slowly-panning scene, realistic non-zero deltas).
# Populations, all oracle-gated:
#   doc_id % 6 == 0        -> last frame TRUNCATED mid-body -> 'corrupt'
#   else doc_id % 13 == 5  -> non-PPM container magic       -> 'unsupported'
#   otherwise              -> 4 valid frames                -> 'ok'
_VID_W, _VID_H = 8, 4
_VID_FRAMES = 4
_VID_STRIDE = 32
_VID_BODY = _VID_W * _VID_H * 3  # 96
_VID_NEED = _VID_STRIDE * (_VID_FRAMES - 1) + _VID_BODY  # 192
_VID_HDR = f"P6\n{_VID_W} {_VID_H}\n255\n"
_VID_CORRUPT_MOD = 6
_VID_UNSUP_MOD = 13
_VID_UNSUP_RES = 5
_VID_CORRUPT_BODY = 40  # bytes present in the truncated last frame


def _video_payloads(spark, sf_dir):
    # Same ASCII invariant as the image/audio tiers: both engines
    # filter to char-length == byte-length so the populations agree.
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") >= _VID_NEED)
        & (F.length("text") == F.octet_length("text"))
    )
    frames = [
        F.concat(
            F.lit(_VID_HDR),
            F.substring("text", _VID_STRIDE * f + 1, _VID_BODY),
        )
        for f in range(_VID_FRAMES)
    ]
    ok = F.encode(F.concat(*frames), "UTF-8")
    corrupt = F.encode(
        F.concat(
            *frames[:-1],
            F.lit(_VID_HDR),
            F.substring(
                "text",
                _VID_STRIDE * (_VID_FRAMES - 1) + 1,
                _VID_CORRUPT_BODY,
            ),
        ),
        "UTF-8",
    )
    unsup = F.concat(F.lit(b"MP4\x00"), F.encode(F.concat(*frames), "UTF-8"))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % _VID_CORRUPT_MOD == 0, corrupt)
        .when(F.col("doc_id") % _VID_UNSUP_MOD == _VID_UNSUP_RES, unsup)
        .otherwise(ok)
        .alias("payload"),
    )


# Shared oracle scaffolding: labeled population + per-(frame, pixel)
# exact luma (r+g+b)//3 from the text bytes.
_VID_LAB_SQL = f"""
    d AS (SELECT doc_id, text FROM documents
          WHERE strlen(text) >= {_VID_NEED}
            AND length(text) = strlen(text)),
    lab AS (SELECT doc_id, text,
                   CASE WHEN doc_id % {_VID_CORRUPT_MOD} = 0 THEN 'corrupt'
                        WHEN doc_id % {_VID_UNSUP_MOD} = {_VID_UNSUP_RES}
                             THEN 'unsupported'
                        ELSE 'ok' END AS status
            FROM d),
    lum AS (SELECT doc_id, f, p,
                   CAST((ascii(substring(text, CAST({_VID_STRIDE}*f+3*p+1 AS INT), 1))
                       + ascii(substring(text, CAST({_VID_STRIDE}*f+3*p+2 AS INT), 1))
                       + ascii(substring(text, CAST({_VID_STRIDE}*f+3*p+3 AS INT), 1)))
                        // 3 AS BIGINT) AS luma
            FROM lab, range({_VID_FRAMES}) tf(f), range({_VID_W * _VID_H}) tp(p)
            WHERE status = 'ok')
"""


@_register(
    "video_decode_stats",
    f"""
    WITH {_VID_LAB_SQL},
    sums AS (SELECT doc_id, CAST(sum(luma) AS BIGINT) AS luma_sum
             FROM lum GROUP BY doc_id)
    SELECT l.doc_id, l.status,
           CASE WHEN l.status = 'ok' THEN {_VID_FRAMES} END AS n_frames,
           CASE WHEN l.status = 'ok' THEN {_VID_W} END AS width,
           CASE WHEN l.status = 'ok' THEN {_VID_H} END AS height,
           u.luma_sum
    FROM lab l LEFT JOIN sums u USING (doc_id)
    """,
)
def video_decode_stats(spark, sf_dir):
    """REAL video decode under the value-hash gate (the third
    multimodal leg; image r6, audio r7): concatenated binary-PPM
    payloads walked frame-by-frame by the pure-numpy container parser
    (``operators/video.decode_video`` — header grammar, dimension
    consistency, byte-offset tracking), with the total exact-integer
    luma mass per document. Corrupt (last frame truncated mid-body,
    1-in-6) and unsupported (non-PPM container magic) branches are
    both hash-gated. Map-only Arrow mapInPandas, zero shuffle."""
    from udacity_capstone_data_engineering_spark.operators.video import video_decode_stats as vds

    return vds(_video_payloads(spark, sf_dir), "payload", "doc_id")


@_register(
    "video_frame_deltas",
    f"""
    WITH {_VID_LAB_SQL}
    SELECT a.doc_id, CAST(a.f AS INT) AS frame_idx,
           CAST(sum(abs(a.luma - b.luma)) AS BIGINT) AS delta
    FROM lum a JOIN lum b
      ON a.doc_id = b.doc_id AND a.p = b.p AND b.f = a.f - 1
    WHERE a.f >= 1
    GROUP BY a.doc_id, a.f
    """,
)
def video_frame_deltas(spark, sf_dir):
    """Per-transition motion energy over decoded frames: exact BIGINT
    sum of absolute per-pixel luma differences for each consecutive
    frame pair — the scene-cut/keyframe primitive. Quarantined
    payloads contribute no rows (verdicts in ``video_decode_stats``);
    the oracle recomputes every pixel byte via substring+ascii and
    pairs frames with a (doc, pixel, f-1) self-join."""
    from udacity_capstone_data_engineering_spark.operators.video import video_frame_deltas as vfd

    return vfd(_video_payloads(spark, sf_dir), "payload", "doc_id")


@_register(
    "video_scene_cuts",
    f"""
    WITH {_VID_LAB_SQL},
    del AS (SELECT a.doc_id, CAST(a.f AS INT) AS frame_idx,
                   CAST(sum(abs(a.luma - b.luma)) AS BIGINT) AS delta
            FROM lum a JOIN lum b
              ON a.doc_id = b.doc_id AND a.p = b.p AND b.f = a.f - 1
            WHERE a.f >= 1
            GROUP BY a.doc_id, a.f)
    SELECT doc_id, frame_idx, delta,
           2 * delta * (COUNT(*) OVER (PARTITION BY doc_id))
               > 3 * (SUM(delta) OVER (PARTITION BY doc_id)) AS is_cut
    FROM del
    """,
)
def video_scene_cuts(spark, sf_dir):
    """Relative scene-cut gate composed ON TOP of the frame-delta
    operator: a transition is a cut iff its motion energy exceeds 1.5x
    the document's mean transition energy — written integer-exact as
    ``2 * delta * n_transitions > 3 * total_delta`` (no division, per
    the house divide-then-round rule). The video analogue of the audio
    tier's relative silence gate; the shot-boundary primitive a video
    curation pipeline filters on before any model pass."""
    from udacity_capstone_data_engineering_spark.operators.video import video_frame_deltas as vfd

    fe = vfd(_video_payloads(spark, sf_dir), "payload", "doc_id")
    tot = fe.groupBy("doc_id").agg(
        F.sum("delta").alias("__tot"),
        F.count(F.lit(1)).alias("__nt"),
    )
    return fe.join(tot, "doc_id").select(
        "doc_id",
        "frame_idx",
        "delta",
        (F.col("delta") * F.col("__nt") * 2 > F.col("__tot") * 3).alias(
            "is_cut"
        ),
    )


# ---------------------------------------------------------------------------
# Audio/video NEAR-DUP tiers (round 8, VERDICT r7 #3): perceptual
# fingerprints through the SAME banding machinery as the image dHash —
# gradient signs of an exact-integer envelope (audio) / scene profile
# (video), packed into a BIGINT, paired by the pigeonhole-exact
# Hamming-banded join (`simhash_near_dup_pairs`).
# ---------------------------------------------------------------------------

_AFP_WIN = 4  # samples per envelope window -> 16 windows over 64 samples
_AFP_NBITS = _WAV_N // _AFP_WIN - 1  # 15 gradient bits
_FP_BANDS = 3  # 3 bands x 5 bits; max_hamming=2 < bands -> EXACT pairs

# Envelope fingerprint CTEs on top of the labeled-sample scaffolding:
# per-window energy (sum s^2 — gain-monotone, so gradient SIGNS are
# invariant to uniform gain), lead() gradient, little-endian bit pack.
_AFP_SQL = f"""
    win AS (SELECT doc_id, CAST(i // {_AFP_WIN} AS INT) AS w,
                   CAST(sum(s*s) AS BIGINT) AS e
            FROM smp GROUP BY doc_id, i // {_AFP_WIN}),
    nx AS (SELECT doc_id, w, e,
                  lead(e) OVER (PARTITION BY doc_id ORDER BY w) AS ne
           FROM win),
    afp AS (SELECT doc_id,
                   CAST(sum(CASE WHEN e < ne
                                 THEN (CAST(1 AS BIGINT) << w)
                                 ELSE 0 END) AS BIGINT) AS fingerprint
            FROM nx WHERE w < {_AFP_NBITS} GROUP BY doc_id)"""


def _audio_fingerprints(spark, sf_dir):
    from udacity_capstone_data_engineering_spark.operators.audio import (
        audio_frame_energy as frame_energy,
    )
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        gradient_sign_fingerprint,
    )

    fe = frame_energy(
        _wav_payloads(spark, sf_dir), "payload", "doc_id", frame=_AFP_WIN
    )
    return gradient_sign_fingerprint(
        fe, "doc_id", "frame_idx", "energy", _AFP_NBITS
    )


@_register(
    "audio_envelope_fingerprint",
    f"""
    WITH {_WAV_LAB_SQL},
    {_AFP_SQL}
    SELECT doc_id, CAST({_AFP_NBITS} AS INT) AS nbits, fingerprint
    FROM afp
    """,
)
def audio_envelope_fingerprint(spark, sf_dir):
    """Perceptual audio fingerprint (VERDICT r7 #3 — the audio leg of
    the near-dup family; images got dHash in r7): the decoded PCM
    stream cut into 4-sample windows, each window's exact BIGINT energy
    computed worker-side (`audio_frame_energy` — the EXISTING frame
    machinery, just at envelope resolution), then the 15 window-to-
    window gradient signs packed little-endian into one BIGINT
    (`dedup.gradient_sign_fingerprint`, the Haitsma-Kalker energy-
    difference recipe in exact integers). Gradient signs survive
    uniform gain changes, which is what makes this a NEAR-dup hash.
    The oracle recomputes every sample, window sum, and bit from the
    raw text bytes — full value-hash gate. Corrupt/unsupported payloads
    contribute no rows (quarantine verdicts live in
    ``audio_decode_stats``)."""
    fp = _audio_fingerprints(spark, sf_dir)
    return fp.select(
        "doc_id", F.lit(_AFP_NBITS).cast("int").alias("nbits"), "fingerprint"
    )


@_register(
    "audio_near_dup_pairs",
    f"""
    WITH {_WAV_LAB_SQL},
    {_AFP_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
               AS hamming
    FROM afp a JOIN afp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {_FP_BANDS - 1}
    """,
)
def audio_near_dup_pairs(spark, sf_dir):
    """Audio near-dup detection (VERDICT r7 #3): envelope fingerprints
    paired by the SHARED Hamming-banded machinery
    (`simhash_near_dup_pairs` — 3 disjoint 5-bit bands, candidates only
    within shared buckets, never all-pairs). With max_hamming = 2 <
    bands the pigeonhole makes banding LOSSLESS, so the banded operator
    equals the oracle's all-pairs predicate exactly — the same
    completeness argument the SimHash tier carries, now over audio.
    Scale: one shuffle on (band, slice), per-bucket pair enumeration
    JVM-side; bucket skew bounded by envelope diversity + AQE."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    fp = _audio_fingerprints(spark, sf_dir)
    return simhash_near_dup_pairs(
        fp,
        "doc_id",
        sig_col="fingerprint",
        bits=_AFP_NBITS,
        bands=_FP_BANDS,
    )


_VFP_NBITS = _VID_FRAMES * _VID_H - 1  # 15 gradient bits over 16 row sums

# Scene-profile fingerprint CTEs: per-(frame, row) luma mass, flattened
# f-major to j = f*H + r, lead() gradient, little-endian bit pack.
_VFP_SQL = f"""
    rs AS (SELECT doc_id, CAST(f * {_VID_H} + r AS INT) AS j, rl FROM (
             SELECT doc_id, f, p // {_VID_W} AS r,
                    CAST(sum(luma) AS BIGINT) AS rl
             FROM lum GROUP BY doc_id, f, p // {_VID_W})),
    nx AS (SELECT doc_id, j, rl,
                  lead(rl) OVER (PARTITION BY doc_id ORDER BY j) AS nrl
           FROM rs),
    vfp AS (SELECT doc_id,
                   CAST(sum(CASE WHEN rl < nrl
                                 THEN (CAST(1 AS BIGINT) << j)
                                 ELSE 0 END) AS BIGINT) AS fingerprint
            FROM nx WHERE j < {_VFP_NBITS} GROUP BY doc_id)"""


def _video_fingerprints(spark, sf_dir):
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        gradient_sign_fingerprint,
    )
    from udacity_capstone_data_engineering_spark.operators.video import (
        video_row_luma as vrl,
    )

    rows = vrl(_video_payloads(spark, sf_dir), "payload", "doc_id")
    seq = rows.select(
        "doc_id",
        (F.col("frame_idx") * _VID_H + F.col("row_idx")).cast("int").alias("j"),
        "row_luma",
    )
    return gradient_sign_fingerprint(seq, "doc_id", "j", "row_luma", _VFP_NBITS)


@_register(
    "video_row_luma",
    f"""
    WITH {_VID_LAB_SQL}
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(p // {_VID_W} AS INT) AS row_idx,
           CAST(sum(luma) AS BIGINT) AS row_luma
    FROM lum GROUP BY doc_id, f, p // {_VID_W}
    """,
)
def video_row_luma_q(spark, sf_dir):
    """Per-(frame, row) exact luma mass over decoded frames — the
    coarse spatio-temporal profile the scene fingerprint packs, exposed
    as its own gated row (rows crossing Arrow are frames x height per
    payload, never pixels). Oracle recomputes every pixel byte."""
    from udacity_capstone_data_engineering_spark.operators.video import (
        video_row_luma as vrl,
    )

    return vrl(_video_payloads(spark, sf_dir), "payload", "doc_id")


@_register(
    "video_scene_fingerprint",
    f"""
    WITH {_VID_LAB_SQL},
    {_VFP_SQL}
    SELECT doc_id, CAST({_VFP_NBITS} AS INT) AS nbits, fingerprint
    FROM vfp
    """,
)
def video_scene_fingerprint(spark, sf_dir):
    """Perceptual video fingerprint (VERDICT r7 #3 — the video leg):
    the 16 per-(frame, row) luma masses flattened frame-major into one
    sequence and their 15 gradient signs packed into a BIGINT via the
    SAME `gradient_sign_fingerprint` kernel as the audio tier — a
    scene signature that tracks how brightness mass moves across rows
    and frames, invariant to uniform brightness shifts (the dHash
    argument, extended through time). Full value-hash gate; quarantined
    payloads contribute no rows."""
    fp = _video_fingerprints(spark, sf_dir)
    return fp.select(
        "doc_id", F.lit(_VFP_NBITS).cast("int").alias("nbits"), "fingerprint"
    )


@_register(
    "video_near_dup_pairs",
    f"""
    WITH {_VID_LAB_SQL},
    {_VFP_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT)
               AS hamming
    FROM vfp a JOIN vfp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= {_FP_BANDS - 1}
    """,
)
def video_near_dup_pairs(spark, sf_dir):
    """Video near-dup detection (VERDICT r7 #3): scene fingerprints
    through the shared Hamming-banded pair machinery — 3 x 5-bit
    bands, max_hamming 2 < bands, so banding is pigeonhole-LOSSLESS
    and the operator equals the oracle's all-pairs predicate exactly.
    Completes the multimodal dedup story: text (MinHash/SimHash),
    image (dHash), audio (envelope), video (scene signature), all on
    one banding substrate."""
    from udacity_capstone_data_engineering_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    fp = _video_fingerprints(spark, sf_dir)
    return simhash_near_dup_pairs(
        fp,
        "doc_id",
        sig_col="fingerprint",
        bits=_VFP_NBITS,
        bands=_FP_BANDS,
    )
