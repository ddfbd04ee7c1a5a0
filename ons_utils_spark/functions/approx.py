"""Approximate/sketch aggregations (HyperLogLog++, t-digest quantiles).

Extension (SURVEY.md §2.2: the reference has none). Thin, documented
wrappers over Spark's built-in sketches — at 100 TB these replace
exact distinct counts (full shuffle of all keys) with fixed-size
mergeable sketches (map-side partials only).

No DuckDB oracle is possible for these (different sketch algorithms
produce different estimates); tests bound the relative error instead.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .columns import convert_to_spark_col

ColumnOrName = Union[str, SparkCol]


def approx_distinct(col: ColumnOrName, rsd: float = 0.05) -> SparkCol:
    """HyperLogLog++ distinct-count estimate (relative std dev ``rsd``).

    Sketch size grows as ~1.04/rsd² registers — rsd=0.05 ≈ 435 per
    group regardless of cardinality, vs. shuffling every distinct key
    for the exact count.

    ``rsd`` is floored at 0.001: Spark does not validate extreme
    values and a tiny rsd (e.g. 1e-5) aborts the JVM outright trying
    to allocate the register array (observed crash, not an exception).
    """
    if rsd < 0.001:
        raise ValueError(
            f'rsd={rsd} too small: sketch registers grow as 1.04/rsd^2'
            ' and Spark crashes (JVM abort, not an exception) on'
            ' extreme values; use rsd >= 0.001 or an exact'
            ' countDistinct'
        )
    return F.approx_count_distinct(convert_to_spark_col(col), rsd)


def approx_quantiles(
    df: SparkDF,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    relative_error: float = 0.01,
) -> list:
    """Greenwald-Khanna approximate quantiles (driver-side result).

    One pass, mergeable per-partition summaries; exact quantiles would
    need a full sort.
    """
    return df.approxQuantile(col, list(probabilities), relative_error)


def approx_quantile_col(
    col: ColumnOrName,
    probabilities: Sequence[float],
    accuracy: int = 10000,
) -> SparkCol:
    """``percentile_approx`` as an aggregate column (grouped use)."""
    return F.percentile_approx(
        convert_to_spark_col(col),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    )


def filter_by_percentile_range(
    df: SparkDF,
    col: ColumnOrName,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = True,
) -> SparkDF:
    """Keep rows whose ``col`` lies within [P_lower, P_upper].

    The outlier-trimming step of a curation pipeline. Bounds are a
    ONE-ROW aggregate broadcast-cross-joined onto the frame — the
    scale-safe alternative to a global (single-partition) window.
    ``exact=True`` uses sort-based ``percentile`` (one extra pass,
    interpolated, oracle-reproducible); ``exact=False`` uses the
    t-digest ``approx_percentile`` sketch (map-side partials only —
    preferred at 100 TB where a 1% error on the trim bound is
    irrelevant).
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f'need 0 <= lower <= upper <= 1, '
                         f'got {lower}/{upper}')
    c = convert_to_spark_col(col)
    fn = F.percentile if exact else F.approx_percentile
    # Both bounds from ONE aggregate buffer (array of percentages) —
    # two separate percentile aggs would each buffer the full column.
    bounds = df.agg(
        fn(c, F.array(F.lit(lower), F.lit(upper))).alias('__b')
    ).select(
        F.col('__b')[0].alias('__lo'),
        F.col('__b')[1].alias('__hi'),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(c.between(F.col('__lo'), F.col('__hi')))
        .drop('__lo', '__hi')
    )


def robust_outlier_flags(
    df: SparkDF,
    col: ColumnOrName,
    keys: Union[str, Sequence[str], None] = None,
    z: float = 3.5,
) -> SparkDF:
    """Flag outliers by the modified z-score
    ``0.6745·(x − median) / MAD`` (Iglewicz–Hoaglin): robust to the
    outliers themselves, unlike mean/stddev screens that a single
    extreme value drags.

    Adds ``robust_z`` (NULL when the group's MAD is 0 — a constant
    group has no meaningful score) and boolean ``is_outlier``.
    Per-``keys`` when given, corpus-global otherwise.

    Plan: two exact-percentile aggregates (median, then median
    absolute deviation, which NEEDS the median first — inherently
    two passes) + two broadcast joins of the tiny per-group stats
    back onto the rows. At 100 TB swap ``F.percentile`` for
    ``approx_percentile`` via :func:`filter_by_percentile_range`'s
    pattern if the exact per-group sort is too hot; the z-score
    math is unchanged.
    """
    from ..generic import list_convert

    c = convert_to_spark_col(col)
    key_list = list_convert(keys) if keys else []

    def grouped(frame):
        return frame.groupBy(*key_list) if key_list else frame.groupBy()

    med = grouped(df).agg(F.percentile(c, F.lit(0.5)).alias('__med'))
    with_med = (df.join(F.broadcast(med), key_list, 'left')
                if key_list else df.crossJoin(F.broadcast(med)))
    dev = F.abs(c - F.col('__med'))
    mad = grouped(with_med).agg(
        F.percentile(dev, F.lit(0.5)).alias('__mad'))
    with_mad = (with_med.join(F.broadcast(mad), key_list, 'left')
                if key_list else with_med.crossJoin(F.broadcast(mad)))
    score = F.when(
        F.col('__mad') > 0,
        F.lit(0.6745) * (c - F.col('__med')) / F.col('__mad'))
    return (
        with_mad
        .withColumn('robust_z', score)
        .withColumn('is_outlier', F.coalesce(
            F.abs(F.col('robust_z')) > z, F.lit(False)))
        .drop('__med', '__mad')
    )


def winsorize(
    df: SparkDF,
    col: ColumnOrName,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = True,
    output_col: Optional[str] = None,
) -> SparkDF:
    """CLIP ``col`` to its [P_lower, P_upper] percentile bounds —
    the keep-every-row sibling of :func:`filter_by_percentile_range`
    (winsorization preserves row counts and joins downstream; use it
    when dropping outlier rows would bias per-group denominators).

    Writes ``output_col`` (default: overwrite ``col`` when it is a
    plain column name). Same plan shape as the filter variant: one
    percentile aggregate (array of both bounds, single buffer)
    broadcast onto the rows; ``exact=False`` switches to the t-digest
    sketch for the 100 TB path.
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f'need 0 <= lower <= upper <= 1, '
                         f'got {lower}/{upper}')
    c = convert_to_spark_col(col)
    if output_col is None:
        if not isinstance(col, str):
            raise ValueError(
                'output_col is required when col is an expression')
        output_col = col
    fn = F.percentile if exact else F.approx_percentile
    bounds = df.agg(
        fn(c, F.array(F.lit(lower), F.lit(upper))).alias('__b')
    ).select(
        F.col('__b')[0].alias('__lo'),
        F.col('__b')[1].alias('__hi'),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            output_col,
            F.least(F.greatest(c, F.col('__lo')), F.col('__hi')))
        .drop('__lo', '__hi')
    )
