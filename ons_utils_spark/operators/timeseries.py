"""Sequential time-series recurrences (EWMA) over keyed streams.

Extension territory. The exponentially-weighted moving average
``e_i = α·x_i + (1−α)·e_{i−1}`` is the standard smoother for metric
streams (latency baselines, rate anomaly detection), and like
sequence packing it is a TRUE recurrence: no closed form over SQL
window functions that is numerically safe (the algebraic rewrite via
``(1−α)^{−i}`` prefix sums overflows double range after a few
thousand rows), so the walk runs as an Arrow-batched per-key pandas
UDF.

The recurrence is implemented as an explicit loop on float64 with
exactly ``α·x + (1−α)·e`` per step — bit-reproducible, so a SQL
engine replaying the same expression gets identical doubles and the
``q_ewma`` oracle can hash full rows.

Scale shape: one shuffle on the key columns; each key's history
walks sequentially (inherent to the semantics), keys in parallel.
Partition count = distinct keys; a single giant key serializes — for
that, window the stream first (EWMA over per-window aggregates).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..generic import list_convert

__all__ = ['ewma']


def _ewma_walk(values: np.ndarray, alpha: float) -> np.ndarray:
    """The recurrence (also the test reference): NaNs propagate the
    previous smoothed value forward without updating it."""
    out = np.empty(len(values), dtype=np.float64)
    e = np.nan
    for i, x in enumerate(values):
        if np.isnan(x):
            out[i] = e
            continue
        e = x if np.isnan(e) else alpha * x + (1.0 - alpha) * e
        out[i] = e
    return out


def ewma(
    df: SparkDF,
    value_col: str,
    order_col: str,
    keys: Union[str, Sequence[str]],
    alpha: float,
    tiebreak: Optional[str] = None,
    output_col: str = 'ewma',
    n_shards: int = 64,
) -> SparkDF:
    """Add ``output_col`` = exponentially-weighted moving average of
    ``value_col`` per key, in ``(order_col, tiebreak)`` order.

    First value seeds the average; NULL/NaN values carry the previous
    smoothed value forward (gap-tolerant). ``0 < alpha <= 1``.

    The walk is SHARD-batched: keys hash into ``n_shards`` groups and
    each Arrow batch walks all of its keys with a pandas groupby —
    per-key ``applyInPandas`` would pay one Arrow round-trip per key
    (measured 4-5× slower at ~1.5k keys). Results are independent of
    sharding (each key's history is complete within its shard); pass
    ``n_shards=0`` to group directly by key (debugging).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f'alpha must be in (0, 1], got {alpha}')
    key_list = list_convert(keys)
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    schema = T.StructType(
        list(df.schema)
        + [T.StructField(output_col, T.DoubleType(), True)]
    )

    def smooth_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_list + sort_cols, kind='mergesort')
        pdf = pdf.reset_index(drop=True)
        vals = pdf[value_col].astype('float64').to_numpy()
        out = np.empty(len(pdf), dtype=np.float64)
        grouped = pdf.groupby(key_list, sort=False, dropna=False)
        for _, idx in grouped.indices.items():
            idx = np.sort(idx)
            out[idx] = _ewma_walk(vals[idx], alpha)
        pdf[output_col] = out
        pdf[output_col] = pdf[output_col].where(
            ~pdf[output_col].isna(), None)
        return pdf

    if n_shards and n_shards > 0:
        shard = F.pmod(F.xxhash64(*key_list), F.lit(n_shards))
        shard_schema = T.StructType(
            [T.StructField('__shard', T.LongType(), False)]
            + list(schema))

        def walk_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return smooth_frame(pdf)

        out = (
            df.withColumn('__shard', shard)
            .groupBy('__shard')
            .applyInPandas(walk_shard, shard_schema)
        )
        return out.drop('__shard')
    return df.groupBy(*key_list).applyInPandas(smooth_frame, schema)
