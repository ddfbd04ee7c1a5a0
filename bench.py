"""Benchmark: run the declared query suite and print one JSON line.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Each query is fully materialized through the `noop` sink (executes the
whole plan, no driver collect). Prints:
    {"metric": "suite_total", "value": <sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    sf = os.path.basename(sf_dir.rstrip('/')).replace('sf', '')

    spark = get_spark(
        'bench',
        master=f'local[{cpus}]',
        shuffle_partitions=int(cpus),
        extra_confs={'spark.driver.memory': '8g'},
    )
    spark.sparkContext.setLogLevel('ERROR')

    # Warm up the JVM/codegen path once (not timed).
    QUERIES['q5_segment_stats'](spark, sf_dir).write.mode(
        'overwrite'
    ).format('noop').save()

    timings = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.mode('overwrite').format('noop').save()
        timings[name] = round(time.time() - t0, 3)

    print(json.dumps({
        'metric': 'suite_total',
        'value': round(sum(timings.values()), 3),
        'unit': 'sec',
        'queries': timings,
        'sf': float(sf) if sf.replace('.', '').isdigit() else sf,
    }))
    spark.stop()


if __name__ == '__main__':
    main()
