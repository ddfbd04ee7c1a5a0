"""Streaming heavy-hitter monitoring via mergeable count-min sketches.

The streaming twin of ``operators.sketches``: every micro-batch lands
its own depth × width counter table (a few KB, regardless of batch
size), stamped with ``batch_id``.  Count-min sketches merge by plain
COUNTER ADDITION, so any window of history — last hour, last day, all
time — collapses to one tiny ``groupBy(j, bucket).sum(cnt)`` over the
sketch table, never re-touching the raw stream.  That is the thing a
raw ``groupBy(token).count()`` history cannot do at 100 TB: its state
grows with distinct keys, a sketch table grows only with batches.

Idempotent by construction: the history is partitioned by
``batch_id`` with dynamic partition overwrite, so Structured
Streaming's replay of a failed batch (same ``batch_id``) rewrites its
own partition instead of double-counting — same recovery contract as
``streaming.quality``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..operators.sketches import cms_build, cms_estimate

__all__ = ['monitor_heavy_hitters', 'merged_sketch',
           'estimate_from_history']


def monitor_heavy_hitters(
    stream_df: SparkDF,
    col: str,
    sketch_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
    available_now: bool = False,
    query_name: str = 'cms-monitor',
):
    """Start the monitor; returns the StreamingQuery.

    The sketch table at ``sketch_path`` gains ≤ depth × width rows
    per micro-batch: ``(j, bucket, cnt, batch_id)``.
    """
    def _process(batch_df: SparkDF, batch_id: int) -> None:
        sketch = cms_build(batch_df, col, depth, width).withColumn(
            'batch_id', F.lit(batch_id).cast('long'))
        (sketch.coalesce(1).write
         .mode('overwrite')
         .option('partitionOverwriteMode', 'dynamic')
         .partitionBy('batch_id')
         .parquet(sketch_path))

    writer = (
        stream_df.writeStream
        .foreachBatch(_process)
        .outputMode('update')
        .option('checkpointLocation', checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_sketch(
    spark,
    sketch_path: str,
    batch_ids=None,
) -> SparkDF:
    """Collapse (a window of) the sketch history into ONE sketch.

    CMS merge is counter addition, so this is a single tiny groupBy
    over ≤ batches × depth × width rows.  ``batch_ids`` (iterable)
    restricts to a window — e.g. the last N batches for a sliding
    heavy-hitter view; partition pruning on ``batch_id`` keeps the
    scan to exactly those directories.
    """
    hist = spark.read.parquet(sketch_path)
    if batch_ids is not None:
        hist = hist.filter(F.col('batch_id').isin(list(batch_ids)))
    return (
        hist.groupBy('j', 'bucket')
        .agg(F.sum('cnt').alias('cnt'))
    )


def estimate_from_history(
    spark,
    sketch_path: str,
    queries: SparkDF,
    col: str,
    depth: int = 4,
    width: int = 1024,
    batch_ids=None,
) -> SparkDF:
    """Point-estimate counts over (a window of) the whole stream.

    ``depth``/``width`` MUST match the monitor's — the bucket
    coordinates are derived from them.
    """
    return cms_estimate(
        merged_sketch(spark, sketch_path, batch_ids),
        queries, col, depth, width,
    )
