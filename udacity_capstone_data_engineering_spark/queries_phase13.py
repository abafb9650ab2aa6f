"""Phase-13 query tier (round 7): the audio leg of the multimodal
tier — REAL WAV/PCM16 decode under the value-hash gate, mirroring the
round-6 image codec (`queries_phase11`): synthesized RIFF payloads from
document text bytes, a pure-numpy decoder behind Arrow-batched
``mapInPandas``, quarantine branches (corrupt AND unsupported) that are
themselves hash-gated, and exact-integer statistics throughout.

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
