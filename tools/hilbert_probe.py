"""Hilbert vs Morton layout probe: measured row-group pruning.

Extends ``tools/zorder_probe.py``: writes lineitem clustered by the
Morton curve AND by the Hilbert curve on (l_partkey, l_suppkey) with
identical file counts and small row groups, then counts from the
parquet footers how many row groups survive (a) point filters on
each dimension and (b) a small 2-D range box — the exact min-max
statistic engines prune with, measured without timing noise.

Expected shape: both curves prune both dimensions; the Hilbert
layout's tighter per-file bounding boxes (no power-of-two jumps)
keep the same or FEWER row groups, with the gap largest for box
queries at file counts that don't align with powers of four.

    python tools/hilbert_probe.py [sf_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.sources.layout import (  # noqa: E402
    hilbert_repartition,
    zorder_repartition,
)
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def _stats(path: str, cols):
    """Per-row-group {col: (min, max)} across all files."""
    groups = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith('.parquet'):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        schema = md.schema.to_arrow_schema()
        idx = {c: schema.get_field_index(c) for c in cols}
        for g in range(md.num_row_groups):
            row = {}
            for c in cols:
                st = md.row_group(g).column(idx[c]).statistics
                row[c] = (st.min, st.max) if st else (None, None)
            groups.append(row)
    return groups


def _survivors_point(groups, col, value):
    keep = sum(1 for g in groups
               if g[col][0] is None or g[col][0] <= value <= g[col][1])
    return keep, len(groups)


def _survivors_box(groups, boxes):
    """Row groups intersecting ANY of the (col -> [lo, hi]) boxes."""
    def hits(g, box):
        for c, (lo, hi) in box.items():
            gmin, gmax = g[c]
            if gmin is not None and (gmax < lo or gmin > hi):
                return False
        return True

    keep = sum(1 for g in groups if any(hits(g, b) for b in boxes))
    return keep, len(groups)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    spark = get_spark('hilbert-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    spark.conf.set('spark.sql.files.maxRecordsPerFile', '0')
    li = load_tables(spark, sf, tables=['lineitem'])['lineitem'] \
        .select('l_orderkey', 'l_partkey', 'l_suppkey', 'l_quantity')

    rg = {'parquet.block.size': str(64 * 1024)}
    # 7 partitions: deliberately NOT a power of four — the regime
    # where Hilbert's lack of long jumps should show up.
    n_parts = 7
    base = tempfile.mkdtemp(prefix='hilbert_probe_')
    layouts = {
        'morton': zorder_repartition(
            li, ['l_partkey', 'l_suppkey'], bits=16,
            num_partitions=n_parts),
        'hilbert': hilbert_repartition(
            li, ['l_partkey', 'l_suppkey'], bits=16,
            num_partitions=n_parts),
    }
    pk, sk, pk9 = li.agg(
        F.expr('percentile(l_partkey, 0.5)'),
        F.expr('percentile(l_suppkey, 0.5)'),
        F.expr('percentile(l_partkey, 0.9)')).first()
    pk, sk, pk9 = int(pk), int(sk), int(pk9)
    width_p = max(1, pk // 50)
    width_s = max(1, sk // 50)
    boxes = [
        {'l_partkey': (pk - width_p, pk + width_p),
         'l_suppkey': (sk - width_s, sk + width_s)},
        {'l_partkey': (pk9 - width_p, pk9 + width_p),
         'l_suppkey': (1, 2 * width_s)},
    ]

    results = {}
    try:
        for name, frame in layouts.items():
            path = os.path.join(base, name)
            frame.write.mode('overwrite').options(**rg).parquet(path)
            groups = _stats(path, ['l_partkey', 'l_suppkey'])
            kp, tp = _survivors_point(groups, 'l_partkey', pk)
            ks, _ = _survivors_point(groups, 'l_suppkey', sk)
            kb, _ = _survivors_box(groups, boxes)
            results[name] = (kp, ks, kb, tp)
            print(f'{name:8s} point(partkey) keeps {kp}/{tp} | '
                  f'point(suppkey) keeps {ks}/{tp} | '
                  f'2-D boxes keep {kb}/{tp}')
    finally:
        shutil.rmtree(base, ignore_errors=True)

    mp, ms, mb, total = results['morton']
    hp, hs, hb, _ = results['hilbert']
    assert hp <= total and hs <= total
    assert hb <= mb, ('hilbert box queries must prune at least as '
                      'well as morton')
    print(f'OK: hilbert box-survivors {hb} <= morton {mb} '
          f'(point filters: partkey {hp} vs {mp}, '
          f'suppkey {hs} vs {ms})')


if __name__ == '__main__':
    main()
