"""Blocked-fuzzy-matching scale probe: amplify the BLOCK COUNT.

The scale claim for ``fuzzy_blocked_pairs`` is that cost is
Σ|block|² — linear in the number of blocks when block sizes stay
bounded. This probe replicates the part table R times with shifted
block keys (same block-size distribution, R× the blocks) and times
the pair join at increasing R. Expected: wall time ~linear in R,
pair count exactly R× the base count (replica blocks are internally
identical). Prints one JSON line.

    python tools/fuzzy_scale_probe.py [sf_dir] [max_replicas]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators.joins import fuzzy_blocked_pairs  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    max_r = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark('fuzzy-scale-probe', master='local[32]',
                      shuffle_partitions=32,
                      extra_confs={'spark.driver.memory': '8g'})
    spark.sparkContext.setLogLevel('ERROR')
    part = load_tables(spark, sf_dir, tables=['part'])['part'].select(
        'p_partkey', 'p_brand', 'p_size', 'p_name')
    n_base = part.count()

    results = []
    base_pairs = None
    for r in sorted({1, max(2, max_r // 4), max_r}):
        # Shift p_size by 100 per replica: every replica contributes
        # fresh (brand, size) blocks with the SAME size distribution.
        amplified = part.crossJoin(
            spark.range(r).withColumnRenamed('id', '__rep')
        ).select(
            (F.col('p_partkey') * r + F.col('__rep')).alias('pk'),
            'p_brand',
            (F.col('p_size') + F.col('__rep') * 100).alias('psz'),
            'p_name',
        )
        amplified.count()  # materialize input before timing
        t0 = time.time()
        n_pairs = fuzzy_blocked_pairs(
            amplified, block_cols=['p_brand', 'psz'], id_col='pk',
            text_col='p_name', max_dist=4).count()
        dt = round(time.time() - t0, 2)
        if r == 1:
            base_pairs = n_pairs
        results.append({
            'replicas': r, 'rows': n_base * r, 'pairs': n_pairs,
            'sec': dt,
            'pairs_exact_multiple': n_pairs == base_pairs * r,
        })

    first, last = results[0], results[-1]
    scaling = (last['sec'] / first['sec']) / (
        last['replicas'] / first['replicas'])
    print(json.dumps({
        'metric': 'fuzzy_blocked_pairs_scaling',
        'runs': results,
        'time_ratio_vs_linear': round(scaling, 3),
        'all_exact_multiples': all(x['pairs_exact_multiple']
                                   for x in results),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
