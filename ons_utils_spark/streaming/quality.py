"""Streaming data-quality monitoring: check suites per micro-batch.

Runs an ``operators.quality_checks`` suite against every micro-batch
of a stream and appends the tidy report (stamped with ``batch_id``
and processing time) to a parquet history — the continuously-updated
quality dashboard table.  Built on ``foreachBatch`` so each batch's
report is ONE aggregate pass over that batch (same single-scan
guarantee as the batch API), and the checkpointed batch id makes
replays idempotent per batch: a re-processed batch rewrites the same
``batch_id`` rows downstream consumers key on.
"""
from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..operators.quality_checks import Check, run_checks

__all__ = ['monitor_quality']


def _write_batch_report(report: SparkDF, report_path: str) -> None:
    """Idempotently land one micro-batch's report rows.

    The history table is partitioned by ``batch_id`` and written with
    dynamic partition overwrite, so a replayed batch (Structured
    Streaming re-invokes ``foreachBatch`` with the SAME ``batch_id``
    after a failure/restart) rewrites exactly its own partition
    instead of appending a duplicate copy of it.  Other batches'
    partitions are untouched.
    """
    (report.coalesce(1).write
     .mode('overwrite')
     .option('partitionOverwriteMode', 'dynamic')
     .partitionBy('batch_id')
     .parquet(report_path))


def monitor_quality(
    stream_df: SparkDF,
    checks: Sequence[Check],
    report_path: str,
    checkpoint: str,
    available_now: bool = False,
    query_name: str = 'quality-monitor',
):
    """Start the monitoring query; returns the StreamingQuery.

    The report table at ``report_path`` gains one row per check per
    micro-batch: ``(batch_id, check, column, n_rows, violations,
    observed, expected, passed)``.  Empty batches are recorded too
    (n_rows = 0 rows per check) — a silent stream is a signal, not
    an absence of one.
    """
    def _process(batch_df: SparkDF, batch_id: int) -> None:
        report = run_checks(batch_df, checks).withColumn(
            'batch_id', F.lit(batch_id).cast('long'))
        _write_batch_report(report, os.path.join(report_path))

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
