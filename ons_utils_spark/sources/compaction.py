"""Small-file compaction for parquet tables.

At 100 TB an appended table degrades into millions of tiny files —
file-listing dominates planning, each task opens a handful of
row-groups, and NameNode/object-store metadata becomes the real
bottleneck.  Compaction is the maintenance pass every ingest cadence
needs (the ``OPTIMIZE`` of lakehouse engines, re-expressed as plain
Spark):

* :func:`file_stats` — per-directory (= per partition for
  ``partitionBy`` layouts) file counts and byte totals, via the
  Hadoop ``FileSystem`` Spark itself lists with (driver-side: one
  listing, the same cost Spark pays at planning).
* :func:`compaction_plan` — per-directory output-file budget
  ``n_out = ceil(bytes / target_bytes)`` and a ``needs_compaction``
  flag (skip directories already at or under budget: rewriting them
  would churn bytes for nothing).
* :func:`compact_table` — the rewrite. Unpartitioned: one
  round-robin ``repartition(n_out)`` (or ``repartitionByRange`` over
  ``sort_by`` keys, which re-clusters the data so min-max row-group
  pruning survives the rewrite — pair with
  :mod:`sources.layout`'s Hilbert/Z-order keys for multi-column
  locality). Hive-partitioned: per-partition budgets from the plan,
  rows routed to ``pmod(xxhash64(slot_by), n_out)`` slots so each
  output directory gets ~``n_out`` target-sized files in one shuffle
  (best-effort: slot hash collisions can merge two slots into one
  larger file; targets are approximate by design).

Compaction rewrites DATA bytes; it never changes row content — both
:func:`compact_table` paths are pure repartition+write, verified by
row-count and content equality in tests.
"""
from __future__ import annotations

import math
import os
import re
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = [
    'compact_table',
    'compaction_plan',
    'file_stats',
]


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark._jsc.hadoopConfiguration())
    return fs, jpath


def _list_data_files(spark: SparkSession, path: str) -> List[tuple]:
    """[(relative_dir, file_name, bytes)] for every data file under
    ``path`` (recursive; skips ``_SUCCESS``/hidden files)."""
    fs, jpath = _hadoop_fs(spark, path)
    root = fs.getFileStatus(jpath).getPath().toString()
    out = []
    it = fs.listFiles(jpath, True)  # recursive remote iterator
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith('_') or name.startswith('.'):
            continue
        full = p.toString()
        rel = full[len(root):].lstrip('/')
        rel_dir = os.path.dirname(rel)
        out.append((rel_dir, name, int(st.getLen())))
    return out


def file_stats(spark: SparkSession, path: str) -> SparkDF:
    """``(dir, n_files, total_bytes, avg_bytes)`` per directory.

    ``dir`` is relative to ``path`` (``''`` for a flat table; the
    ``key=value`` partition path for Hive layouts). One driver-side
    listing — the same listing Spark performs to plan a scan of
    ``path``, so this adds no new scaling hazard; the result is
    returned as a DataFrame so plans/joins can consume it.
    """
    files = _list_data_files(spark, path)
    rows = {}
    for rel_dir, _name, size in files:
        n, total = rows.get(rel_dir, (0, 0))
        rows[rel_dir] = (n + 1, total + size)
    return spark.createDataFrame(
        [(d, n, t, t // max(n, 1)) for d, (n, t) in sorted(rows.items())],
        schema='dir string, n_files int, total_bytes bigint, '
               'avg_bytes bigint',
    )


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> SparkDF:
    """Per-directory rewrite budget.

    Adds ``n_out = ceil(total_bytes / target_bytes)`` and
    ``needs_compaction = n_files > n_out`` to :func:`file_stats`.
    A directory whose file count is already at or under its byte
    budget is left alone — rewriting it would pay a full read+write
    for zero metadata win.
    """
    if target_bytes <= 0:
        raise ValueError(f'target_bytes must be > 0, got {target_bytes}')
    return file_stats(spark, path).select(
        '*',
        F.greatest(
            F.lit(1),
            F.ceil(F.col('total_bytes') / F.lit(target_bytes))
            .cast('int'),
        ).alias('n_out'),
    ).withColumn(
        'needs_compaction', F.col('n_files') > F.col('n_out')
    )


_HIVE_NULL_DIR = '__HIVE_DEFAULT_PARTITION__'


def _unescape_hive(value: str) -> Optional[str]:
    """Invert Hive/Spark partition-path escaping.

    Spark writes NULL partition values as ``__HIVE_DEFAULT_PARTITION__``
    and percent-escapes special ASCII chars (``%xx``, one byte each —
    non-ASCII is written raw); see Spark's
    ``ExternalCatalogUtils.unescapePathName``.  Comparing the RAW dir
    string against data values silently misses every escaped/null
    partition, which collapses its file budget to 1 — i.e. one giant
    output file.
    """
    if value == _HIVE_NULL_DIR:
        return None
    return re.sub(r'%([0-9A-Fa-f]{2})',
                  lambda m: chr(int(m.group(1), 16)), value)


def _partition_values(rel_dir: str) -> Dict[str, Optional[str]]:
    """Decode ``k1=v1/k2=v2`` into a dict (Hive path encoding),
    unescaping values (``None`` for the null-partition dir)."""
    out = {}
    for seg in rel_dir.split('/'):
        if '=' in seg:
            k, v = seg.split('=', 1)
            out[k] = _unescape_hive(v)
    return out


def compact_table(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: Optional[Sequence[str]] = None,
    sort_by: Optional[Sequence[str]] = None,
    slot_by: Optional[Sequence[str]] = None,
) -> SparkDF:
    """Rewrite ``src`` at ``dst`` with ~``target_bytes`` files.

    Returns the :func:`compaction_plan` that drove the rewrite.

    * Flat tables: ``repartition(n_out)`` round-robin — even file
      sizes, clustering lost; pass ``sort_by`` to instead
      ``repartitionByRange`` on those keys, which keeps the data
      sorted across files so min-max row-group pruning still works
      after the rewrite.
    * ``partition_by`` layouts: each partition gets its own budget
      from the plan; rows shuffle once on ``(partition cols, slot)``
      with ``slot = pmod(xxhash64(slot_by), n_out)``, so one write
      materializes every directory at its own file count.
      ``slot_by`` defaults to all non-partition columns.

    ``dst`` must differ from ``src``: the rewrite is a copy-then-swap
    (atomic rename by the caller/orchestrator), never an in-place
    overwrite of files a concurrent reader may hold open.
    """
    if os.path.normpath(src) == os.path.normpath(dst):
        raise ValueError('compact_table writes to a NEW location; '
                         'swap directories after the rewrite '
                         f'(src == dst == {src!r})')
    plan = compaction_plan(spark, src, target_bytes)
    df = spark.read.parquet(src)

    def _record_layout(sorted_cols) -> None:
        # durable layout contract for readers and re-compactions:
        # which clustering (if any) min-max pruning can rely on
        from .shards import TABLE_LAYOUT_SIDECAR, write_layout_sidecar

        write_layout_sidecar(spark, dst, {
            'kind': 'compaction',
            'target_bytes': target_bytes,
            'partition_by': list(partition_by or []),
            'sort_by': list(sorted_cols or []),
            'source': src,
        }, name=TABLE_LAYOUT_SIDECAR)

    if not partition_by:
        total = plan.agg(F.sum('total_bytes')).collect()[0][0] or 0
        n_out = max(1, math.ceil(total / target_bytes))
        if sort_by:
            out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_by])
        else:
            out = df.repartition(n_out)
        out.write.mode('overwrite').parquet(dst)
        _record_layout(sort_by)
        return plan

    # Hive-partitioned: broadcast-join each row to its directory's
    # budget, slot rows within the partition, one shuffle, one write.
    part_cols = list(partition_by)
    budgets = []
    for r in plan.collect():
        vals = _partition_values(r['dir'])
        if set(vals) != set(part_cols):
            raise ValueError(
                f'directory {r["dir"]!r} does not match partition_by='
                f'{part_cols} (found keys {sorted(vals)})')
        budgets.append(tuple(vals[c] for c in part_cols) + (r['n_out'],))
    schema = ', '.join(f'__p_{c} string' for c in part_cols) \
        + ', __n_out int'
    bdf = spark.createDataFrame(budgets, schema=schema)
    # eqNullSafe: the null partition's budget row carries value None
    # and must still match (plain == would drop every null-partition
    # row to the coalesce(1) fallback — one giant file)
    cond = [df[c].cast('string').eqNullSafe(bdf[f'__p_{c}'])
            for c in part_cols]
    slot_cols = list(slot_by) if slot_by else [
        c for c in df.columns if c not in part_cols]
    joined = df.join(F.broadcast(bdf), cond, 'left').withColumn(
        '__slot',
        F.pmod(F.xxhash64(*[F.col(c) for c in slot_cols]),
               F.coalesce(F.col('__n_out'), F.lit(1))),
    )
    n_tasks = max(1, sum(b[-1] for b in budgets))
    (
        joined.repartition(n_tasks, *[F.col(c) for c in part_cols],
                           F.col('__slot'))
        .drop('__slot', '__n_out', *[f'__p_{c}' for c in part_cols])
        .write.mode('overwrite').partitionBy(*part_cols).parquet(dst)
    )
    _record_layout(None)
    return plan
