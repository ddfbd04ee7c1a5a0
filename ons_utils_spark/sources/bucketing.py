"""Bucketed-table helpers for co-located (shuffle-free) joins.

At the 100 TB design point the dominant cost of a fact-to-fact join
is the shuffle. Writing both tables bucketed by the join key
(``bucketBy`` + ``sortBy``) lets Spark plan a sort-merge join with
ZERO exchanges: each task reads matching bucket files from both
sides. These helpers standardize the write and verify the plan.

Spark bucketing requires a table (metastore entry), not a bare path —
hence ``saveAsTable``. Bucket counts should be sized so one bucket of
the larger table is a few hundred MB (e.g. 100 TB / 4096 buckets).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession

from ..generic import list_convert


def write_bucketed(
    df: SparkDF,
    table: str,
    bucket_by: Union[str, Sequence[str]],
    num_buckets: int,
    sort_by: Union[str, Sequence[str], None] = None,
    mode: str = 'overwrite',
    format: str = 'parquet',
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table."""
    keys = list_convert(bucket_by)
    writer = (
        df.write.mode(mode).format(format)
        .bucketBy(num_buckets, *keys)
    )
    if sort_by is not None:
        writer = writer.sortBy(*list_convert(sort_by))
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Union[str, Sequence[str]],
) -> bool:
    """True when joining the two bucketed tables plans no Exchange.

    Use as a deployment-time assertion that bucket counts/keys line
    up (mismatched bucket counts silently fall back to shuffling).
    """
    import re

    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.join(right, on=list_convert(on))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # A BroadcastExchange is not a shuffle; only hash/range
    # repartitioning exchanges defeat co-location.
    return re.search(r'(?<!Broadcast)Exchange', plan) is None
