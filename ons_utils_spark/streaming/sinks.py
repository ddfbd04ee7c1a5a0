"""Streaming sinks: checkpointed parquet append and foreachBatch.

Extension territory — the reference library never writes at all
(SURVEY.md §2.2 "sinks: none"). These complete the readStream →
transform → writeStream surface for the pipeline API. Every helper
requires an explicit checkpoint location: the write-ahead commit log
is what makes restart recovery exactly-once, and at the 100 TB design
point a sink without one silently degrades to at-least-once after any
executor/driver failure.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame as SparkDF

from ..generic import list_convert


def write_stream_parquet(
    df: SparkDF,
    path: str,
    checkpoint: str,
    partition_by: Union[str, Sequence[str], None] = None,
    available_now: bool = False,
    query_name: Optional[str] = None,
):
    """Start an append-mode parquet file sink.

    Exactly-once file output: the file sink records committed files in
    ``_spark_metadata`` keyed by the checkpointed batch id, so a batch
    replayed after failure overwrites rather than duplicates.
    ``available_now=True`` processes everything currently available in
    bounded micro-batches and then terminates — the backfill/catch-up
    trigger (use ``query.awaitTermination()`` after it).

    ``partition_by`` gives Hive-style directory partitioning, so the
    downstream batch reader gets partition pruning for free.
    """
    writer = (
        df.writeStream.format('parquet')
        .option('path', path)
        .option('checkpointLocation', checkpoint)
        .outputMode('append')
    )
    if partition_by:
        writer = writer.partitionBy(*list_convert(partition_by))
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_sink(
    df: SparkDF,
    fn: Callable[[SparkDF, int], None],
    checkpoint: str,
    output_mode: str = 'update',
    available_now: bool = False,
):
    """Start a ``foreachBatch`` sink running ``fn(batch_df, batch_id)``.

    The escape hatch for targets with no native streaming writer
    (JDBC, key-value upserts, partition overwrites): each micro-batch
    arrives as an ordinary batch DataFrame, so any batch writer works.
    Spark guarantees at-least-once invocation of ``fn``; pair the
    checkpointed ``batch_id`` with an idempotent/transactional write
    (e.g. overwrite-by-batch-id) to get exactly-once end-to-end.
    """
    writer = (
        df.writeStream.foreachBatch(fn)
        .option('checkpointLocation', checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
