"""Skew-handling helpers for hot-key aggregations and joins.

Extension for the 100 TB design point (SURVEY.md §7.2): AQE's skew
join splitting handles sort-merge joins automatically, but hot-key
AGGREGATIONS and explicit broadcast patterns still benefit from
salting. These helpers make the two-phase pattern declarative.
"""
from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert


def with_salt(df: SparkDF, buckets: int = 16,
              salt_col: str = '__salt') -> SparkDF:
    """Attach a deterministic salt in [0, buckets) derived from a
    per-row hash (xxhash64 of all columns — stable, no RNG state)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(buckets)),
    )


def salted_agg(
    df: SparkDF,
    groups: Union[str, Sequence[str]],
    aggs: Sequence[SparkCol],
    final_aggs: Sequence[SparkCol],
    buckets: int = 16,
) -> SparkDF:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``buckets`` reducers; phase 2 re-aggregates the tiny partials by
    key. ``aggs`` are the phase-1 partials (aliased), ``final_aggs``
    combine those aliases (e.g. phase 1 ``sum(x) as s`` → phase 2
    ``sum(s) as s``). For algebraic aggregates only (sum/count/min/
    max/avg-via-sum+count).

    Note: Spark's hash aggregation already does map-side partial
    aggregation, which handles most skew; use this when the per-key
    state is large (e.g. collect_set) or partials can't combine
    map-side.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(
        *list_convert(groups), '__salt'
    ).agg(*aggs)
    return partial.groupBy(*list_convert(groups)).agg(*final_aggs)


def salted_broadcast_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    buckets: int = 8,
    how: str = 'inner',
) -> SparkDF:
    """Skew-proof join: replicate the (small) right side per salt
    bucket, salt the left side, join on (keys, salt).

    Spreads a hot key's left rows over ``buckets`` tasks while every
    bucket still finds its right-side match. Right side grows
    ``buckets``× — keep it broadcast-sized.
    """
    keys = list_convert(on)
    left_salted = left.withColumn(
        '__salt',
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
               F.lit(buckets)),
    )
    right_replicated = right.withColumn(
        '__salt',
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    )
    out = left_salted.join(
        F.broadcast(right_replicated), on=keys + ['__salt'], how=how
    )
    return out.drop('__salt')


def key_skew_report(
    df: SparkDF,
    keys: Union[str, Sequence[str]],
    top_k: int = 10,
) -> SparkDF:
    """Quantify key skew BEFORE choosing a join/agg strategy: the
    ``top_k`` heaviest keys with count, share of all rows, and the
    ratio to a perfectly uniform key (``count × n_keys / n_rows`` —
    >10 means salting/AQE-skew-split territory).

    Two hash aggregates (per-key count, then a one-row total
    broadcast). The top-k cut is ``orderBy().limit(k)`` — a
    distributed TakeOrdered over the counts table, NOT a global
    window (which would funnel every distinct key through one
    partition); the rank window then runs over just ``top_k`` rows.
    Deterministic tie-break on the key columns.
    """
    from pyspark.sql import Window

    key_list = list_convert(keys)
    counts = df.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias('n_rows'))
    totals = counts.agg(
        F.sum('n_rows').alias('total_rows'),
        F.count(F.lit(1)).alias('n_keys'))
    order = [F.col('n_rows').desc()] \
        + [F.col(k).asc() for k in key_list]
    top = counts.orderBy(*order).limit(top_k)
    ranked = (
        top.crossJoin(F.broadcast(totals))
        .withColumn('rank', F.row_number().over(Window.orderBy(*order)))
    )
    return ranked.select(
        'rank', *key_list, 'n_rows',
        F.round(F.col('n_rows') / F.col('total_rows'), 6)
        .alias('row_share'),
        F.round(F.col('n_rows') * F.col('n_keys')
                / F.col('total_rows'), 2).alias('vs_uniform'),
    )
