"""Z-order layout probe: measure real row-group pruning.

Writes lineitem three ways — unordered, single-column sorted, and
Z-ordered on (l_partkey, l_suppkey) via ``sources.layout`` — with
identical file counts and small row groups, then uses the parquet
footers (pyarrow) to count how many row groups a point filter on
EACH dimension could prune by min-max stats alone.  This is the
statistic Spark's parquet reader uses for row-group skipping, so it
is engine-level evidence that the layout works, independent of
timing noise.

Expected shape: single-column sort prunes its own column near-
perfectly and the OTHER column not at all; Z-order prunes BOTH
columns well — that is the whole point of interleaving.

    python tools/zorder_probe.py [sf_dir]
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
from ons_utils_spark.sources.layout import zorder_repartition  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def surviving_groups(path: str, col: str, value: int) -> tuple:
    """(groups whose [min,max] admit value, total groups)."""
    keep = total = 0
    for fn in os.listdir(path):
        if not fn.endswith('.parquet'):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                keep += 1
    return keep, total


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    spark = get_spark('zorder-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    spark.conf.set('spark.sql.files.maxRecordsPerFile', '0')
    li = load_tables(spark, sf, tables=['lineitem'])['lineitem'] \
        .select('l_orderkey', 'l_partkey', 'l_suppkey', 'l_quantity')

    # small row groups so each file has several prunable units
    rg = {'parquet.block.size': str(64 * 1024)}
    base = tempfile.mkdtemp(prefix='zorder_probe_')
    layouts = {
        'unordered': li.repartition(8),
        'sorted_partkey': li.repartition(8, 'l_partkey')
        .sortWithinPartitions('l_partkey'),
        'zorder': zorder_repartition(
            li, ['l_partkey', 'l_suppkey'], bits=16, num_partitions=8),
    }
    # probe values: medians of each key domain
    pk, sk = li.agg(F.expr('percentile(l_partkey, 0.5)'),
                    F.expr('percentile(l_suppkey, 0.5)')).first()
    pk, sk = int(pk), int(sk)

    print(f'probe: l_partkey={pk} l_suppkey={sk}')
    results = {}
    try:
        for name, frame in layouts.items():
            path = os.path.join(base, name)
            (frame.write.mode('overwrite')
             .options(**rg).parquet(path))
            kp, tp = surviving_groups(path, 'l_partkey', pk)
            ks, ts = surviving_groups(path, 'l_suppkey', sk)
            results[name] = (kp, tp, ks, ts)
            print(f'{name:16s} partkey-filter keeps {kp}/{tp} '
                  f'row-groups | suppkey-filter keeps {ks}/{ts}')
    finally:
        shutil.rmtree(base, ignore_errors=True)

    kp_u = results['unordered'][0] / results['unordered'][1]
    kp_z = results['zorder'][0] / results['zorder'][1]
    ks_z = results['zorder'][2] / results['zorder'][3]
    ks_s = results['sorted_partkey'][2] / results['sorted_partkey'][3]
    assert kp_z < kp_u, 'zorder must prune the first dimension'
    assert ks_z < ks_s, ('zorder must prune the second dimension '
                         'better than a single-column sort')
    print('OK: zorder prunes both dimensions; single-column sort '
          'prunes only its own')


if __name__ == '__main__':
    main()
