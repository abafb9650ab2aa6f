"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-document generator.

Spark 4 lets a pure-Python class participate in the read path as a
first-class `format(...)` — schema declaration, option handling, and
PARTITION PLANNING (each partition reads in its own task, so a custom
source parallelizes like parquet does). This module uses it for the
thing a Python source is actually good for: generating load-test /
fixture corpora on demand, where the "I/O" is CPU-cheap generation and
no real bytes exist to scan. Real high-volume ingestion should stay on
JVM-native sources (parquet/ORC/binaryFile) — a Python source pays one
Python worker round-trip per batch.

Determinism: every row derives from md5(seed, doc_id) only, so the
same (n, seed) options produce byte-identical corpora at any
parallelism — the property fixtures need and `df.sample`-style
generation lacks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "key value table row scan filter join merge sort window stream "
    "batch vector hash group agg column part order line data"
).split()

SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"
_LANGS = ("en", "de", "fr", "zh")


def _doc(seed: int, doc_id: int) -> tuple[int, str, str, int]:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 8 + h[0] % 40
    words = []
    state = h
    while len(words) < n_words:
        for b in state:
            words.append(_WORDS[b % len(_WORDS)])
            if len(words) == n_words:
                break
        state = hashlib.md5(state).digest()
    text = " ".join(words)
    return doc_id, text, _LANGS[h[1] % len(_LANGS)], len(text)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.seed = int(options.get("seed", "42"))
        self.num_partitions = int(options.get("numpartitions", "8"))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))
        return [
            _Partition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Partition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(self.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs").option("n", ...)` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthetic_docs format."""
    spark.dataSource.register(SyntheticDocsDataSource)
