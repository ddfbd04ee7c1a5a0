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

import json
from typing import Optional

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = ['with_shard_id', 'write_training_shards', 'shard_manifest',
           'read_training_shards', 'read_layout_sidecar',
           'write_layout_sidecar', 'TABLE_LAYOUT_SIDECAR']

# Underscore-prefixed so Spark/Hadoop file listings treat it as a
# hidden file (like _SUCCESS) — invisible to spark.read.parquet(path).
_LAYOUT_SIDECAR = '_shard_layout.json'

#: Sidecar name used by the OTHER partitioned sinks (compaction,
#: optimize_write) — distinct from the shard sidecar so a compacted
#: table can never be misread as a training-shard layout.
TABLE_LAYOUT_SIDECAR = '_table_layout.json'

_INTEGRAL_TYPES = ('byte', 'short', 'integer', 'long')


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
    dtype = df.schema[position_col].dataType.typeName()
    if dtype not in _INTEGRAL_TYPES:
        raise TypeError(
            f'position column {position_col!r} must be integral '
            f'(shard ids are exact integer division), got {dtype}')
    # integer division in the JVM (`div`), NOT `/` + cast: the float
    # path truncates exactly only while position fits double ulp
    # headroom (~2^53); `div` is exact for every bigint position
    escaped = position_col.replace('`', '``')
    return df.withColumn(
        shard_col,
        F.expr(f'`{escaped}` div {int(shard_size)}'))


def _hadoop_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def write_layout_sidecar(spark, path: str, meta: dict,
                         name: str = _LAYOUT_SIDECAR) -> None:
    """Persist a writer's layout contract next to its files as ONE
    hidden file, through the Hadoop FS API so it works on any
    filesystem scheme (local/HDFS/object store) the write itself
    targeted.  The shard sink uses the default name; the other
    partitioned sinks (compaction, ``optimize_write``, a manual
    z-order/Hilbert write) record theirs under
    :data:`TABLE_LAYOUT_SIDECAR` — the durable answer to "what
    clustering can readers prune on?" that otherwise lives only in
    the writing job's code."""
    fs, p = _hadoop_path(spark, path.rstrip('/') + '/' + name)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(meta).encode('utf-8')))
    finally:
        out.close()


#: Backwards-compatible private alias (pre-r15 internal name).
_write_layout_sidecar = write_layout_sidecar


def read_layout_sidecar(spark, path: str,
                        name: str = _LAYOUT_SIDECAR) -> Optional[dict]:
    """The layout contract a sink persisted under ``name``, or
    ``None`` for a pre-sidecar layout."""
    fs, p = _hadoop_path(spark, path.rstrip('/') + '/' + name)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # the JVM helper RETURNS byte[] (py4j converts to Python
        # bytes); mutating a passed-in bytearray via readFully does
        # NOT copy back across the gateway
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream)
        return json.loads(bytes(data).decode('utf-8'))
    finally:
        stream.close()


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
    if mode == 'append':
        # An append must honor the layout contract already on disk:
        # silently rewriting the sidecar with a different shard_size
        # would leave previously-written shard directories violating
        # the recorded size with no way for read_training_shards'
        # mismatch guard to notice (r12 ADVICE).
        existing = read_layout_sidecar(df.sparkSession, path)
        if existing is not None:
            wanted = {'shard_size': int(shard_size),
                      'position_col': position_col,
                      'shard_col': shard_col}
            for key, val in wanted.items():
                if existing.get(key) != val:
                    raise ValueError(
                        f'append with {key}={val!r} does not match '
                        f'the layout at {path!r} (written with '
                        f'{existing.get(key)!r}, from its '
                        f'{_LAYOUT_SIDECAR}): appending under a '
                        'different layout contract would corrupt '
                        'the existing shards')
    sharded = with_shard_id(df, shard_size, position_col, shard_col)
    n_parts = partitions
    if n_parts is None:
        n_parts = sharded.sparkSession.conf.get(
            'spark.sql.shuffle.partitions')
    sharded = sharded.repartitionByRange(
        int(n_parts), shard_col, position_col)
    (sharded.sortWithinPartitions(shard_col, position_col)
        .write.mode(mode).partitionBy(shard_col).parquet(path))
    # Persist the layout contract so a resuming reader can't silently
    # prune live shards by passing a different shard_size.
    _write_layout_sidecar(df.sparkSession, path, {
        'shard_size': int(shard_size),
        'position_col': position_col,
        'shard_col': shard_col,
        'format_version': 1,
    })


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

    The writer persists its layout contract in a hidden sidecar
    (``_shard_layout.json``); when present it is AUTHORITATIVE —
    ``shard_size`` may then be omitted, and a mismatching value
    raises instead of silently pruning live shards (a larger
    ``start_position // shard_size`` would skip directories that
    still hold positions past the cursor).  Pre-sidecar layouts fall
    back to the documented caller contract.

    Rows come back unordered across tasks (Spark contract); a train
    loop consumes shard directories in ``shard`` order and each
    part-file is already position-sorted by the writer.
    """
    layout = read_layout_sidecar(spark, path)
    if layout is not None:
        written = int(layout['shard_size'])
        if shard_size is not None and int(shard_size) != written:
            raise ValueError(
                f'shard_size={shard_size} does not match the value '
                f'the layout at {path!r} was written with '
                f'({written}, from its _shard_layout.json): a '
                'mismatched divisor would prune shard directories '
                'that still contain positions past the cursor')
        shard_size = written
        for arg, key in ((position_col, 'position_col'),
                         (shard_col, 'shard_col')):
            if layout.get(key, arg) != arg:
                raise ValueError(
                    f'{key}={arg!r} does not match the layout at '
                    f'{path!r} (written with {layout[key]!r})')
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
