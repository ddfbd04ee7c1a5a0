"""SparkSession builder with scale-appropriate defaults.

The reference hardcoded a tiny production session
(config/validation.py:352-364: 1 GB × 1-core executors, 12 shuffle
partitions, Arrow pre-0.15 compat). This builder instead sets the
knobs that matter on a modern cluster and lets the deployment override
them: AQE on (runtime partition coalescing, broadcast conversion,
skew-join splitting), Arrow on for pandas interop, and a shuffle
partition count the caller sizes to the data.
"""
from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    'spark.sql.adaptive.enabled': 'true',
    'spark.sql.adaptive.coalescePartitions.enabled': 'true',
    'spark.sql.adaptive.skewJoin.enabled': 'true',
    'spark.sql.execution.arrow.pyspark.enabled': 'true',
    'spark.sql.session.timeZone': 'UTC',
    # Parquet timestamps without isAdjustedToUTC load as LTZ instants
    # (not TIMESTAMP_NTZ) so epoch casts / unix_timestamp work and
    # results match zone-naive engines (DuckDB) under the UTC pin.
    'spark.sql.parquet.inferTimestampNTZ.enabled': 'false',
    'spark.ui.showConsoleProgress': 'false',
    # Runtime row-level pruning for large sort-merge joins: build a
    # bloom filter from the (filtered) build side and push it into the
    # probe-side scan. No-op on small/broadcast joins; at fact-fact
    # scale it cuts the shuffled probe rows before the exchange.
    # (Do NOT also enable runtimeFilter.semiJoinReduction — combined
    # with the bloom filter it deadlocks session startup on 4.1.)
    'spark.sql.optimizer.runtime.bloomFilter.enabled': 'true',
}


def get_spark(
    app_name: str = 'ons-utils-spark',
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_confs: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[N]`` with N from the
    ``SPARK_GRAFT_CPUS`` env var (fallback: all cores) when no cluster
    manager is configured; on a real cluster pass ``master=None`` and
    submit via spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and 'SPARK_MASTER' not in os.environ:
        cpus = os.environ.get('SPARK_GRAFT_CPUS', '*')
        master = f'local[{cpus}]'
    if master:
        builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is not None:
        confs['spark.sql.shuffle.partitions'] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
