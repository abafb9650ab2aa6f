"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through
row-at-a-time pickling. The actual codecs are NOT available in this
environment, so the decode step is stubbed (clearly marked), while the
Spark-side contract — schema, batch iteration, partition sizing — is
real and tested.

Scale notes: binary payloads dominate row size, so ``mapInPandas``
stages must be preceded by ``repartition`` sized for payload bytes
(``spark.sql.files.maxPartitionBytes`` governs the scan; the
``batch_size`` arg governs Arrow slice width so a 1000-executor job
never materializes more than batch_size payloads per worker at once).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "media_type string, width int, height int, n_bytes int"


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct the pipeline
    propagates instead of re-inspecting payloads."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(binary_col)).alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """STUB — image codecs are not installed in this container.
    On a real cluster, swap in PIL/opencv here; the surrounding
    ``mapInPandas`` plumbing is unchanged."""
    raise NotImplementedError("image codecs unavailable; use fake_features()")


def fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in feature extractor so the distributed
    plumbing is testable end-to-end: n floats derived from md5 bytes."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(n)]


def extract_features(
    df: DataFrame, binary_col: str, id_col: str, n_features: int = 4, batch_size: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Output: (id, features array<double>). Uses ``mapInPandas`` so each
    worker sees bounded pandas batches of payload bytes.
    """
    schema = f"{id_col} long, features array<double>"

    # The closure must be SELF-CONTAINED: referencing module-level
    # helpers pickles them by module path, and Python workers spawned
    # by an arbitrary driver CWD cannot import this package.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feats_of(payload: bytes) -> list[float]:
            h = hashlib.md5(payload).digest()
            return [h[i] / 255.0 for i in range(n_features)]

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                feats = [feats_of(bytes(p)) for p in chunk[binary_col]]
                yield pd.DataFrame({id_col: chunk[id_col].values, "features": feats})

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    frame_bytes: int = 16,
    every: int = 4,
    batch_size: int = 256,
) -> DataFrame:
    """Frame sampling over opaque video-ish payloads: treat the binary
    payload as a concatenation of fixed-size frames, keep every
    ``every``-th complete frame, and emit its content hash.

    Output: (id, frame_idx int, frame_md5 string) — one row per kept
    frame. Arrow-batched ``mapInPandas``; each worker materializes at
    most ``batch_size`` payloads at a time. On a real cluster the
    md5-of-slice becomes a codec call (decode + keyframe extraction);
    the slicing/batching contract is identical.
    """
    schema = f"{id_col} long, frame_idx int, frame_md5 string"

    # Self-contained closure: module-level helpers pickle by module
    # path, which Python workers can't import from an arbitrary CWD.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                ids, idxs, hashes = [], [], []
                for rid, payload in zip(chunk[id_col], chunk[binary_col]):
                    b = bytes(payload)
                    n_frames = len(b) // frame_bytes
                    for fi in range(0, n_frames, every):
                        frame = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                        ids.append(rid)
                        idxs.append(fi)
                        hashes.append(hashlib.md5(frame).hexdigest())
                yield pd.DataFrame(
                    {id_col: ids, "frame_idx": idxs, "frame_md5": hashes}
                )

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def resize_nearest(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int = 16,
    height: int = 16,
    factor: int = 2,
    batch_size: int = 256,
) -> DataFrame:
    """Nearest-neighbor image downsample over raw-grayscale payloads:
    the first ``width*height`` payload bytes are a row-major image;
    output pixel (r, c) = input pixel (r*factor, c*factor).

    Output: (id, out_row int, out_col int, pixel int) — rows only for
    payloads large enough to hold the full image. Vectorized numpy
    (reshape + strided slicing) inside Arrow batches; swapping the
    byte-decode for a real codec (PIL/cv2) changes one line, not the
    distributed shape.
    """
    if width % factor or height % factor:
        raise ValueError("width/height must be divisible by factor")
    schema = f"{id_col} long, out_row int, out_col int, pixel int"
    ow, oh = width // factor, height // factor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                ids, rows, cols, vals = [], [], [], []
                rr = np.arange(oh).repeat(ow)
                cc = np.tile(np.arange(ow), oh)
                for rid, payload in zip(chunk[id_col], chunk[binary_col]):
                    b = bytes(payload)
                    if len(b) < width * height:
                        continue
                    img = np.frombuffer(b[: width * height], dtype=np.uint8)
                    small = img.reshape(height, width)[::factor, ::factor]
                    ids.extend([rid] * (oh * ow))
                    rows.extend(rr)
                    cols.extend(cc)
                    vals.extend(small.ravel())
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids, dtype="int64"),
                        "out_row": pd.Series(rows, dtype="int32"),
                        "out_col": pd.Series(cols, dtype="int32"),
                        "pixel": pd.Series(vals, dtype="int32"),
                    }
                )

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)
