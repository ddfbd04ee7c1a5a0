"""Time individual declared queries in isolation (3 runs, min/med).

    python tools/profile_queries.py q_price_trim q3_top_orders ...
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark('profile', master='local[32]',
                      shuffle_partitions=32,
                      extra_confs={'spark.driver.memory': '8g'})
    spark.sparkContext.setLogLevel('ERROR')
    QUERIES['q5_segment_stats'](spark, sf_dir).write.mode(
        'overwrite').format('noop').save()
    for name in names:
        ts = []
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.mode('overwrite').format(
                'noop').save()
            ts.append(time.time() - t0)
        print(f'{name:28s} min={min(ts):6.3f} med={statistics.median(ts):6.3f}')
    spark.stop()


if __name__ == '__main__':
    main()
