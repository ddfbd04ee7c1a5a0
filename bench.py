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
        extra_confs={
            'spark.driver.memory': '8g',
            'spark.sql.warehouse.dir': '/tmp/ons-utils-spark-bench-wh',
        },
    )
    spark.sparkContext.setLogLevel('ERROR')

    # Warm up the JVM/codegen path once (not timed).
    QUERIES['q5_segment_stats'](spark, sf_dir).write.mode(
        'overwrite'
    ).format('noop').save()

    # Two passes per query, report the min — machine-load variance
    # between runs on this host is large (observed ±40%).
    timings = {}
    for _ in range(2):
        for name, fn in QUERIES.items():
            t0 = time.time()
            fn(spark, sf_dir).write.mode('overwrite').format(
                'noop'
            ).save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    extras = _bucketed_join_comparison(spark, sf_dir)

    print(json.dumps({
        'metric': 'suite_total',
        'value': round(sum(timings.values()), 3),
        'unit': 'sec',
        'queries': timings,
        'sf': float(sf) if sf.replace('.', '').isdigit() else sf,
        'extras': extras,
    }))
    spark.stop()


def _bucketed_join_comparison(spark, sf_dir: str) -> dict:
    """Scale evidence: co-bucketed join vs shuffled join wall time."""
    from ons_utils_spark.sources.bucketing import write_bucketed
    from ons_utils_spark.sources.readers import read_parquet

    try:
        orders = read_parquet(
            spark, os.path.join(sf_dir, 'orders.parquet')
        ).withColumnRenamed('o_orderkey', 'key')
        lineitem = read_parquet(
            spark, os.path.join(sf_dir, 'lineitem.parquet')
        ).withColumnRenamed('l_orderkey', 'key')
        threshold = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')

        t0 = time.time()
        orders.join(lineitem, 'key').write.mode('overwrite').format(
            'noop'
        ).save()
        shuffled = round(time.time() - t0, 3)

        write_bucketed(orders, 'bench_orders_b', 'key', 8, 'key')
        write_bucketed(lineitem, 'bench_lineitem_b', 'key', 8, 'key')
        t0 = time.time()
        spark.table('bench_orders_b').join(
            spark.table('bench_lineitem_b'), 'key'
        ).write.mode('overwrite').format('noop').save()
        bucketed = round(time.time() - t0, 3)

        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', threshold)
        spark.sql('DROP TABLE IF EXISTS bench_orders_b')
        spark.sql('DROP TABLE IF EXISTS bench_lineitem_b')
        return {
            'join_shuffled_sec': shuffled,
            'join_cobucketed_sec': bucketed,
        }
    except Exception:  # noqa: BLE001 — extras must never fail bench
        return {}


if __name__ == '__main__':
    main()
