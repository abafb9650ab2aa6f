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
