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
