"""Data-layout-aware parquet writing: sorted, sized, skippable files.

Extension for the 100 TB design point. Parquet readers skip row
groups using min/max column statistics, but statistics only help
when values are CLUSTERED: a randomly-ordered write gives every row
group min≈global-min / max≈global-max and nothing skips. The fix is
layout at write time:

* ``repartitionByRange(sort_cols)`` → each output file owns a
  disjoint value range (range-partitioned, sampled boundaries);
* ``sortWithinPartitions`` → row groups inside a file are clustered
  too, so even intra-file skipping works;
* ``maxRecordsPerFile`` → bounds file size without a second job.

A point/range query on the sort columns then prunes to the files
whose [min, max] intersect the predicate — on a 100 TB table sorted
by (day, tenant) that's the difference between touching 1 file and
touching all of them. ``file_stats`` reads back the per-file
footer statistics so tests (and operators) can PROVE the layout:
disjoint ranges, bounded row counts.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert

__all__ = ['optimize_write', 'file_stats']


def optimize_write(
    df: SparkDF,
    path: str,
    sort_cols: Union[str, Sequence[str]],
    *,
    num_files: Optional[int] = None,
    max_records_per_file: Optional[int] = None,
    mode: str = 'overwrite',
) -> None:
    """Write ``df`` as range-partitioned, internally-sorted parquet.

    ``num_files`` sets the range-partition count (default: the
    session's ``spark.sql.shuffle.partitions``); one shuffle total.
    ``max_records_per_file`` caps file size for downstream split
    granularity without another repartition pass.
    """
    cols = [F.col(c) for c in list_convert(sort_cols)]
    spark = df.sparkSession
    n = num_files or int(spark.conf.get('spark.sql.shuffle.partitions'))
    laid_out = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
    )
    writer = laid_out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option(
            'maxRecordsPerFile', max_records_per_file)
    writer.parquet(path)


def file_stats(
    path: str,
    column: str,
) -> List[Tuple[str, int, object, object]]:
    """Per-file ``(name, rows, min, max)`` of ``column`` from parquet
    footers — driver-side metadata only (no data read). The proof
    surface for :func:`optimize_write`: after a range-partitioned
    write the [min, max] intervals are pairwise disjoint, which is
    exactly the property row-group/file skipping needs.
    """
    import os

    import pyarrow.parquet as pq

    out: List[Tuple[str, int, object, object]] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith('.parquet'):
            continue
        meta = pq.read_metadata(os.path.join(path, name))
        lo, hi, rows = None, None, 0
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            rows += group.num_rows
            for ci in range(group.num_columns):
                col = group.column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    lo = st.min if lo is None else min(lo, st.min)
                if st.max is not None:
                    hi = st.max if hi is None else max(hi, st.max)
        out.append((name, rows, lo, hi))
    return out
