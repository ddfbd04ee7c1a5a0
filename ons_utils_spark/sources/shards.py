"""Ordered training-shard sink.

Extension (no reference counterpart).  A training run consumes the
corpus in a fixed global order (:func:`~ons_utils_spark.operators.
sampling.global_order_index` or the deficit-round-robin key of
:func:`~ons_utils_spark.operators.sampling.interleaved_mixture_order`)
split into SIZE-BOUNDED shards: shard ``s`` holds positions
``[s*shard_size, (s+1)*shard_size)``, every shard is one parquet
partition directory whose rows are sorted by position, and a loader
can seek/resume by shard id without scanning anything else.

Spark-first shape: shard assignment is a projection
(``position // shard_size``); the data moves ONCE through a
``repartitionByRange`` on (shard, position) — range partitioning
keeps each shard's rows physically together AND globally ordered
across output tasks — followed by ``sortWithinPartitions`` (a
partition-local sort, no extra shuffle) and a partitioned parquet
write.  No single-task global sort at any size; parallelism is
bounded by the shard count, which scales with the corpus.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = ['with_shard_id', 'write_training_shards', 'shard_manifest',
           'read_training_shards']


def with_shard_id(
    df: SparkDF,
    shard_size: int,
    position_col: str = 'position',
    shard_col: str = 'shard',
) -> SparkDF:
    """Add the shard id ``position // shard_size`` (engine-replayable
    closed form — the DuckDB oracle recomputes it from the same
    positions)."""
    if shard_size <= 0:
        raise ValueError(f'shard_size must be positive, got {shard_size}')
    # integer division in the JVM (`div`), NOT `/` + cast: the float
    # path truncates exactly only while position fits double ulp
    # headroom (~2^53); `div` is exact for every bigint position
    return df.withColumn(
        shard_col,
        F.expr(f'`{position_col}` div {int(shard_size)}'))


def write_training_shards(
    df: SparkDF,
    path: str,
    shard_size: int,
    position_col: str = 'position',
    shard_col: str = 'shard',
    mode: str = 'overwrite',
    partitions: Optional[int] = None,
) -> None:
    """Write ``df`` as ordered, size-bounded training shards.

    ``df`` must already carry a dense global ``position_col`` (from
    :func:`global_order_index`).  Output layout:
    ``path/shard=<s>/part-*.parquet`` with rows sorted by position
    inside each shard — one shuffle total (the range repartition),
    then a partition-local sort the parquet writer streams through.

    ``partitions`` bounds the write parallelism (default: one task
    per shard up to the session's shuffle partitions — at 100 TB set
    it to the cluster's healthy task count; multiple small shards
    then share a task while staying separate directories).
    """
    sharded = with_shard_id(df, shard_size, position_col, shard_col)
    n_parts = partitions
    if n_parts is None:
        n_parts = sharded.sparkSession.conf.get(
            'spark.sql.shuffle.partitions')
    sharded = sharded.repartitionByRange(
        int(n_parts), shard_col, position_col)
    (sharded.sortWithinPartitions(shard_col, position_col)
        .write.mode(mode).partitionBy(shard_col).parquet(path))


def read_training_shards(
    spark,
    path: str,
    start_position: int = 0,
    shard_size: int = None,
    position_col: str = 'position',
    shard_col: str = 'shard',
) -> SparkDF:
    """Resume a training read from a global ``start_position`` cursor
    — the consumer the ordered shard sink exists for.

    ``shard_size`` is the value the layout was WRITTEN with (the
    producer's contract: shard ``s`` holds positions
    ``[s*shard_size, (s+1)*shard_size)``), so the resume point lives
    in shard ``start_position // shard_size`` and everything before
    it never leaves the catalog: the ``shard >=`` predicate is a
    PARTITION filter (directory pruning — skipped shards are not
    listed, opened, or scanned), and the ``position >=`` predicate
    prunes rows only inside the one boundary shard (pushed to the
    parquet row-group stats, which the partition-local sort made
    tight).  At 100 TB a mid-corpus resume therefore scans ~half the
    directories and reads ~one extra row group, not the corpus.

    Rows come back unordered across tasks (Spark contract); a train
    loop consumes shard directories in ``shard`` order and each
    part-file is already position-sorted by the writer.
    """
    if shard_size is None or shard_size <= 0:
        raise ValueError(
            'shard_size must be the positive value the layout was '
            f'written with, got {shard_size!r}')
    if start_position < 0:
        raise ValueError(
            f'start_position must be >= 0, got {start_position}')
    first_shard = start_position // shard_size
    return (
        spark.read.parquet(path)
        .filter(F.col(shard_col) >= F.lit(first_shard))
        .filter(F.col(position_col) >= F.lit(start_position))
    )


def shard_manifest(spark, path: str,
                   position_col: str = 'position',
                   shard_col: str = 'shard') -> SparkDF:
    """Read back a shard layout as ``(shard, n_rows, min_pos,
    max_pos)`` — the loader's seek/resume table, and the frame the
    correctness oracle replays (shard boundaries are a closed form
    of the positions)."""
    return (
        spark.read.parquet(path)
        .groupBy(shard_col)
        .agg(F.count(F.lit(1)).alias('n_rows'),
             F.min(position_col).alias('min_pos'),
             F.max(position_col).alias('max_pos'))
    )
