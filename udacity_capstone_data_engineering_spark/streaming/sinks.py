"""Streaming file sink: checkpointed exactly-once parquet output.

The production landing pattern for a 100 TB/day event firehose: a file
sink is exactly-once per epoch (the sink's transaction log under
``_spark_metadata`` records committed files; readers that go through
``spark.read`` see only committed epochs), and the checkpoint makes the
query resumable — kill it, restart it, no duplicates. ``available_now``
drains everything currently in the source then stops, which turns the
same query into an incremental batch job (the cadence the reference ran
monthly, minus the reprocessing: only NEW files are read each run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_files(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    file_format: str = "parquet",
    partition_by: list[str] | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Start a checkpointed append-mode file-sink query; returns the
    running :class:`StreamingQuery` (caller awaits/stops it).

    Scale notes: partition on the pruning key (date/hour) so downstream
    scans prune; size micro-batches via ``maxFilesPerTrigger`` on the
    SOURCE so each epoch's files are near the HDFS-block sweet spot —
    thousands of tiny files per epoch is the classic streaming-lake
    failure mode (compact periodically, or raise the trigger interval).
    """
    writer = (
        sdf.writeStream.format(file_format)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_upsert_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    precedence: list[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming MERGE: fold each micro-batch into a keyed parquet base
    table via ``foreachBatch`` + the batch latest-wins upsert
    (``operators/merge.py``) — the continuous form of incremental load.

    Exactly-once note: foreachBatch is at-least-once on retry, but the
    merge is IDEMPOTENT (same key + same precedence → same winner), so
    replays converge — the standard pattern when the sink has no
    transaction log. The base is re-read per batch; rewriting a table
    we just read requires cutting lineage first (``localCheckpoint``),
    or the overwrite would delete its own input mid-scan. At a real
    deployment the base would be a transactional table format and this
    becomes MERGE INTO; the operator shape (one shuffle on the key) is
    identical.
    """
    from pyspark.errors import AnalysisException

    from udacity_capstone_data_engineering_spark.operators.merge import (
        upsert_latest_wins,
    )

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            base = spark.read.parquet(path)
        except AnalysisException:
            base = None
        if base is None:
            # First batch: dedupe within the batch only (empty base).
            merged = upsert_latest_wins(
                batch.limit(0), batch, keys, precedence
            )
        else:
            merged = upsert_latest_wins(base, batch, keys, precedence)
        # Materialize BEFORE overwriting the directory being read.
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(path)

    writer = (
        sdf.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
