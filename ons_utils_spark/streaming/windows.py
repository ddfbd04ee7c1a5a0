"""Time-window aggregations (batch + Structured Streaming).

Extension territory — the reference has no streaming (SURVEY.md §2.2).
These helpers express tumbling/sliding/session windows with the same
code path for batch DataFrames and streaming DataFrames: ``F.window``
and ``F.session_window`` work on both; ``with_watermark`` is a no-op
on batch frames so pipelines can be tested in batch and deployed on
``readStream`` unchanged.

.. warning::
   Do not ``filter`` on ``session_start``/``session_end`` AFTER a
   session aggregation: Catalyst pushes group-key predicates below
   the aggregate, where they apply to PRE-MERGE per-event windows and
   silently change which sessions form. Materialize (collect/write)
   before filtering on session bounds. Tumbling/sliding windows don't
   have this hazard (their group keys are event-deterministic).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert


def with_watermark(
    df: SparkDF, ts_col: str, delay: str = '10 minutes'
) -> SparkDF:
    """Apply a watermark on streaming frames; pass batch frames through."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_window_agg(
    df: SparkDF,
    ts_col: str,
    duration: str,
    aggs: Sequence[SparkCol],
    groups: Union[str, Sequence[str], None] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Fixed, non-overlapping windows: one row per (window, groups).

    Output carries ``window_start``/``window_end`` timestamp columns.
    """
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration).alias('__w')]
    keys += [F.col(g) for g in list_convert(groups)] if groups else []
    out = df.groupBy(*keys).agg(*aggs)
    others = [c for c in out.columns if c != '__w']
    return out.select(
        F.col('__w.start').alias('window_start'),
        F.col('__w.end').alias('window_end'),
        *others,
    )


def sliding_window_agg(
    df: SparkDF,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[SparkCol],
    groups: Union[str, Sequence[str], None] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Overlapping windows of ``duration`` every ``slide``."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration, slide).alias('__w')]
    keys += [F.col(g) for g in list_convert(groups)] if groups else []
    out = df.groupBy(*keys).agg(*aggs)
    others = [c for c in out.columns if c != '__w']
    return out.select(
        F.col('__w.start').alias('window_start'),
        F.col('__w.end').alias('window_end'),
        *others,
    )


def session_window_agg(
    df: SparkDF,
    ts_col: str,
    gap: str,
    aggs: Sequence[SparkCol],
    groups: Union[str, Sequence[str], None] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Session windows: events within ``gap`` of each other merge.

    Uses native ``F.session_window`` (stateful in streaming; a merge
    aggregation in batch).
    """
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    keys = [F.session_window(ts_col, gap).alias('__w')]
    keys += [F.col(g) for g in list_convert(groups)] if groups else []
    out = df.groupBy(*keys).agg(*aggs)
    others = [c for c in out.columns if c != '__w']
    return out.select(
        F.col('__w.start').alias('session_start'),
        F.col('__w.end').alias('session_end'),
        *others,
    )


def read_event_stream(
    spark,
    path: str,
    schema: str,
    fmt: str = 'parquet',
    max_files_per_trigger: int = 10,
) -> SparkDF:
    """File-source stream reader (requires explicit schema)."""
    return (
        spark.readStream
        .format(fmt)
        .schema(schema)
        .option('maxFilesPerTrigger', max_files_per_trigger)
        .load(path)
    )


def streaming_dedup(
    df: SparkDF,
    keys: Union[str, Sequence[str]],
    ts_col: Optional[str] = None,
    within: Optional[str] = None,
) -> SparkDF:
    """Drop duplicate rows by key — bounded-state on streams.

    On a stream with ``ts_col``/``within`` given, uses
    ``dropDuplicatesWithinWatermark`` (Spark ≥3.5): duplicate arrivals
    within the watermark delay are suppressed and each key's state is
    EVICTED once the watermark passes it — state stays O(keys per
    delay window), not O(all keys ever seen), which is what makes
    exactly-once dedup viable on an unbounded 100 TB/day stream.
    Without ``within`` it falls back to plain ``dropDuplicates``
    (unbounded state on a stream — fine for batch, dangerous for
    long-running streams; prefer the watermarked form).
    """
    key_list = list_convert(keys)
    if df.isStreaming and within:
        if not ts_col:
            raise ValueError('ts_col is required when within is given')
        return df.withWatermark(ts_col, within) \
            .dropDuplicatesWithinWatermark(key_list)
    return df.dropDuplicates(key_list)
