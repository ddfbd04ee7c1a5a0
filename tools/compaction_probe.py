"""Compaction probe: measured cost of small files, and the win back.

Shatters lineitem (the largest table) into many tiny files, then
compacts it with ``sources.compaction.compact_table``, and measures
what small files actually cost a reader:

* planning+scan wall time for a filtered aggregate (each file is a
  task: scheduler overhead + per-file footer reads dominate),
* the file-listing time itself (the NameNode/object-store tax),
* file counts and mean file size before/after.

Also runs the ``sort_by`` variant to show compaction and clustering
compose: after a range-clustered rewrite the same point-range filter
prunes most row groups (min-max survivors counted from footers).

    python tools/compaction_probe.py [sf_dir] [n_frag]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.sources.compaction import (  # noqa: E402
    compact_table,
    file_stats,
)
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def _scan_time(spark, path, reps=3):
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        (
            spark.read.parquet(path)
            .filter(F.col('l_shipdate') >= '1995-01-01')
            .agg(F.sum('l_extendedprice'), F.count(F.lit(1)))
            .collect()
        )
        best = min(best, time.time() - t0)
    return best


def _listing_time(spark, path, reps=3):
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        file_stats(spark, path).collect()
        best = min(best, time.time() - t0)
    return best


def _surviving_row_groups(path, lo, hi):
    total = survive = 0
    for fn in sorted(os.listdir(path)):
        if not fn.endswith('.parquet'):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i
               for i in range(md.row_group(0).num_columns)}
        i = idx['l_orderkey']
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(i).statistics
            total += 1
            if st.max >= lo and st.min <= hi:
                survive += 1
    return survive, total


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    n_frag = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark('compaction-probe', master='local[8]',
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel('ERROR')
    li = load_tables(spark, sf_dir, ['lineitem'])['lineitem']
    work = tempfile.mkdtemp(prefix='compaction_probe_')
    try:
        frag = os.path.join(work, 'frag')
        li.repartition(n_frag).write.parquet(frag)
        fs = file_stats(spark, frag).collect()[0]
        print(f'fragmented: {fs["n_files"]} files, '
              f'avg {fs["avg_bytes"] / 1024:.0f} KiB')
        t_list_frag = _listing_time(spark, frag)
        t_scan_frag = _scan_time(spark, frag)

        compact = os.path.join(work, 'compact')
        target = 128 * 1024 * 1024
        t0 = time.time()
        compact_table(spark, frag, compact, target_bytes=target)
        t_rewrite = time.time() - t0
        cs = file_stats(spark, compact).collect()[0]
        print(f'compacted:  {cs["n_files"]} files, '
              f'avg {cs["avg_bytes"] / (1 << 20):.1f} MiB '
              f'(rewrite {t_rewrite:.1f}s)')
        t_list_comp = _listing_time(spark, compact)
        t_scan_comp = _scan_time(spark, compact)

        clustered = os.path.join(work, 'clustered')
        compact_table(spark, frag, clustered,
                      target_bytes=target // 16,
                      sort_by=['l_orderkey'])
        t_scan_clus = _scan_time(spark, clustered)
        keys = li.agg(F.max('l_orderkey')).collect()[0][0]
        s, t = _surviving_row_groups(clustered, 1, keys // 20)
        s_f, t_f = _surviving_row_groups(frag, 1, keys // 20)

        print(f'scan  fragmented {t_scan_frag:.2f}s  '
              f'compacted {t_scan_comp:.2f}s  '
              f'({t_scan_frag / t_scan_comp:.1f}x)')
        print(f'list  fragmented {t_list_frag * 1e3:.0f}ms  '
              f'compacted {t_list_comp * 1e3:.0f}ms')
        print(f'range-clustered scan {t_scan_clus:.2f}s; 5% key-range '
              f'filter keeps {s}/{t} row groups '
              f'(fragmented layout: {s_f}/{t_f})')
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == '__main__':
    main()
