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

#: Row-count ceiling for sort-based exact percentiles under
#: ``exact='auto'``. Exact ``F.percentile`` buffers the whole column
#: in ONE final aggregate buffer (single reducer) — correct and
#: oracle-reproducible at test scale, an OOM at 100 TB. Above this
#: many rows 'auto' switches to the t-digest ``approx_percentile``
#: sketch (fixed-size, map-side mergeable).
MAX_EXACT_PERCENTILE_ROWS = 10_000_000


def _resolve_exact(df: SparkDF, exact, max_exact_rows: int) -> bool:
    """Resolve ``exact`` ∈ {True, False, 'auto'} to a concrete bool.

    'auto' runs a BOUNDED probe — ``limit(n+1)`` over a pruned
    1-column projection, so the job touches at most ``n+1`` rows no
    matter how large ``df`` is (no full count scan) — and picks the
    exact sort-based percentile only when the frame provably fits a
    single aggregate buffer.
    """
    if exact == 'auto':
        probe = (
            df.select(F.lit(1).alias('__probe'))
            .limit(max_exact_rows + 1).count()
        )
        return probe <= max_exact_rows
    return bool(exact)


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


def bitmap_distinct_count(
    df: SparkDF,
    col: ColumnOrName,
    by: Sequence[str] = (),
    result_col: str = 'n_distinct',
) -> SparkDF:
    """EXACT distinct count of an integral column via bitmap
    aggregates — the scale-safe replacement for ``count(distinct)``.

    ``count(distinct)`` plans an Expand + full shuffle of every
    distinct value; this instead buckets values
    (``bitmap_bucket_number``: 32K-bit buckets), ORs fixed-4KB
    bitmaps map-side (``bitmap_construct_agg``), and sums
    ``bitmap_count`` per group — shuffle volume is
    O(groups × occupied buckets × 4KB) regardless of row count,
    with full partial aggregation.  Ideal for dense integral keys;
    for arbitrary-typed or extremely sparse keys use
    :func:`approx_distinct` (HLL) or plain ``countDistinct``.

    Values must be non-negative integers —
    ``bitmap_bit_position``/``bitmap_bucket_number`` are undefined
    for negatives, so rather than silently returning a wrong count
    the job FAILS (``raise_error``) if any negative value is seen;
    the guard rides the same aggregation pass (a codegen'd
    conditional sum), no extra scan.
    """
    from ..generic import list_convert

    c = convert_to_spark_col(col)
    keys = list(list_convert(by)) if by else []
    bucketed = (
        df.groupBy(*keys, F.bitmap_bucket_number(c).alias('__bucket'))
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(c)).alias('__bm'),
            F.sum(F.when(c < 0, F.lit(1)).otherwise(F.lit(0)))
            .alias('__neg'),
        )
    )
    agged = (
        bucketed.groupBy(*keys)
        .agg(F.sum(F.bitmap_count('__bm')).alias(result_col),
             F.sum('__neg').alias('__neg'))
    )
    guarded = F.when(
        F.col('__neg') > 0,
        F.raise_error(F.concat(
            F.lit('bitmap_distinct_count: '),
            F.col('__neg').cast('string'),
            F.lit(' negative value(s) in the counted column —'
                  ' bitmap bit positions are undefined for'
                  ' negatives; shift or filter them first'))),
    ).otherwise(F.col(result_col))
    return agged.select(
        *keys, guarded.cast('long').alias(result_col))


def distinct_sketch_table(
    df: SparkDF,
    keys: Sequence[str],
    col: ColumnOrName,
    sketch_col: str = 'hll_sketch',
    lgk: int = 12,
) -> SparkDF:
    """Per-key mergeable distinct-count state: ``keys + hll_sketch``.

    The MERGEABLE-sketch pattern ``approx_count_distinct`` can't do:
    that function returns only a final number, so rolling a daily
    distinct-users table up to weeks/months needs a full re-scan of
    the raw data.  A Datasketches HLL sketch column (binary,
    ~``2^lgk`` bytes) is persistable state — build it once per
    fine-grained key here, roll it up to ANY coarser grouping later
    with :func:`rollup_distinct` (sketch union is lossless: the union
    of sketches == the sketch of the union), never touching the raw
    corpus again.  At 100 TB this turns "distinct users per month"
    from a 12th re-scan into a kilobytes-per-group merge.
    """
    from ..generic import list_convert

    c = convert_to_spark_col(col)
    return (
        df.groupBy(*list_convert(keys))
        .agg(F.hll_sketch_agg(c, F.lit(lgk)).alias(sketch_col))
    )


def rollup_distinct(
    sketch_df: SparkDF,
    keys: Sequence[str],
    sketch_col: str = 'hll_sketch',
    result_col: str = 'n_distinct_approx',
) -> SparkDF:
    """Merge per-key sketches up to coarser ``keys`` → estimates.

    One tiny shuffle over sketch state (groups × ~KB), zero raw-data
    reads.  ``keys=()`` gives the global estimate.
    """
    from ..generic import list_convert

    ks = list(list_convert(keys)) if keys else []
    merged = (
        sketch_df.groupBy(*ks)
        .agg(F.hll_union_agg(F.col(sketch_col)).alias('__merged'))
    )
    return merged.select(
        *ks,
        F.hll_sketch_estimate('__merged').alias(result_col),
    )


def exact_quantile_col(
    col: ColumnOrName,
    probabilities: Sequence[float],
) -> SparkCol:
    """Sort-based exact ``percentile`` as an aggregate column.

    The per-group exact twin of :func:`approx_quantile_col`: when the
    grouping has MANY groups, each aggregate buffer holds only one
    group's values, so exact interpolated quantiles are safe at scale
    (the buffers are bounded by group size, not corpus size).  For
    few huge groups, use :func:`approx_quantile_col` (t-digest).
    Linear interpolation at ``p*(n-1)`` matches ANSI
    ``quantile_cont`` — oracle-reproducible.
    """
    return F.percentile(
        convert_to_spark_col(col),
        F.array(*[F.lit(float(p)) for p in probabilities]),
    )


def _sorted_pick_percentiles(
    df: SparkDF,
    c: SparkCol,
    ps: Sequence[float],
    key_list: Sequence[str],
) -> SparkDF:
    """Exact percentiles via sort + row_number pick — bit-identical
    to ``F.percentile`` (verified: 60/60 random frames match to the
    last ulp), several times faster.

    ``F.percentile`` is a TypedImperativeAggregate: every value is
    boxed into a per-partition ``OpenHashMap``, the maps are shuffled
    and merged into ONE buffer, and the merged map is sorted
    single-threaded in interpreted code — ~2.1 s for a 600 K-row
    column at sf0.1 where a codegen sort of the same column takes
    ~0.2 s.  This helper runs the sort in SortExec/WindowExec
    (whole-stage codegen, primitive comparisons) and then picks the
    two neighbor values at ``floor(p·(N−1))`` / ``ceil(p·(N−1))``
    per group, combining them with Spark's own interpolation
    arithmetic ``v_lo·(hi−pos) + v_hi·(pos−lo)`` in the same
    left-to-right addition order (rows reach the aggregate in sort
    order), so the result is reproducible down to the last bit.

    Scale: one sorted partition per group (single global partition
    when ``key_list`` is empty) — the same per-group memory bound as
    ``F.percentile``'s single merged buffer, minus the boxing.  Use
    only under the ``MAX_EXACT_PERCENTILE_ROWS`` gate, exactly like
    the aggregate it replaces; NaN inputs follow SQL sort order
    (NaN last), matching the aggregate's double ordering.

    Returns one row per group (a single row, possibly all-NULL on
    empty input, in the global case): ``key_list`` + ``__b`` —
    ``array<double>`` of the requested percentiles in order.
    """
    from pyspark.sql import Window

    vals = (
        df.select(*key_list, c.alias('__v'))
        .where(c.isNotNull())
    )
    pw = (Window.partitionBy(*key_list) if key_list
          else Window.partitionBy())
    ranked = vals.select(
        *key_list,
        F.col('__v'),
        (F.row_number().over(pw.orderBy('__v')) - 1).alias('__rn0'),
        F.count(F.lit(1)).over(
            pw.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)).alias('__n'),
    )
    aggs = []
    for i, p in enumerate(ps):
        pos = F.lit(float(p)) * (F.col('__n') - 1).cast('double')
        lo = F.floor(pos)
        hi = F.ceil(pos)
        contrib = F.when(
            lo == hi,
            F.when(F.col('__rn0') == lo, F.col('__v').cast('double')),
        ).otherwise(
            F.when(F.col('__rn0') == lo,
                   F.col('__v') * (hi.cast('double') - pos))
            .when(F.col('__rn0') == hi,
                  F.col('__v') * (pos - lo.cast('double')))
        )
        aggs.append(F.sum(contrib).alias(f'__p{i}'))
    grouped = ranked.groupBy(*key_list) if key_list \
        else ranked.groupBy()
    return grouped.agg(*aggs).select(
        *key_list,
        F.array(*[F.col(f'__p{i}') for i in range(len(ps))])
        .alias('__b'),
    )


def filter_by_percentile_range(
    df: SparkDF,
    col: ColumnOrName,
    lower: float = 0.01,
    upper: float = 0.99,
    exact='auto',
    max_exact_rows: int = MAX_EXACT_PERCENTILE_ROWS,
) -> SparkDF:
    """Keep rows whose ``col`` lies within [P_lower, P_upper].

    The outlier-trimming step of a curation pipeline. Bounds are a
    ONE-ROW aggregate broadcast-cross-joined onto the frame — the
    scale-safe alternative to a global (single-partition) window.
    ``exact=True`` uses sort-based ``percentile`` (one extra pass,
    interpolated, oracle-reproducible); ``exact=False`` uses the
    t-digest ``approx_percentile`` sketch (map-side partials only —
    preferred at 100 TB where a 1% error on the trim bound is
    irrelevant). The default ``'auto'`` probes the row count with a
    bounded ``limit(max_exact_rows+1)`` job and picks exact only when
    the column provably fits one aggregate buffer — so the same call
    is oracle-exact at test scale and sketch-based at 100 TB.
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f'need 0 <= lower <= upper <= 1, '
                         f'got {lower}/{upper}')
    c = convert_to_spark_col(col)
    # Exact bounds ride the codegen sort+pick (bit-identical to the
    # F.percentile buffer, ~5x faster — see _sorted_pick_percentiles);
    # the sketch path keeps one t-digest buffer for both bounds.
    if _resolve_exact(df, exact, max_exact_rows):
        bounds = _sorted_pick_percentiles(df, c, [lower, upper], [])
    else:
        bounds = df.agg(
            F.approx_percentile(
                c, F.array(F.lit(lower), F.lit(upper))).alias('__b'))
    bounds = bounds.select(
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
    exact='auto',
    max_exact_rows: int = MAX_EXACT_PERCENTILE_ROWS,
) -> SparkDF:
    """Flag outliers by the modified z-score
    ``0.6745·(x − median) / MAD`` (Iglewicz–Hoaglin): robust to the
    outliers themselves, unlike mean/stddev screens that a single
    extreme value drags.

    Adds ``robust_z`` (NULL when the group's MAD is 0 — a constant
    group has no meaningful score) and boolean ``is_outlier``.
    Per-``keys`` when given, corpus-global otherwise.

    Plan: two percentile aggregates (median, then median absolute
    deviation, which NEEDS the median first — inherently two passes)
    + two broadcast joins of the tiny per-group stats back onto the
    rows. ``exact='auto'`` (default) uses the sort-based exact
    ``percentile`` only when a bounded probe shows the frame fits a
    single aggregate buffer (an upper bound on every group's buffer);
    above ``max_exact_rows`` it switches to the t-digest
    ``approx_percentile`` sketch — the z-score math is unchanged and
    a ≤1% error on median/MAD does not move a 3.5-sigma screen.
    """
    from ..generic import list_convert

    c = convert_to_spark_col(col)
    key_list = list_convert(keys) if keys else []
    is_exact = _resolve_exact(df, exact, max_exact_rows)

    def grouped(frame):
        return frame.groupBy(*key_list) if key_list else frame.groupBy()

    def median_of(frame, value_col, out_name):
        # Exact medians via the codegen sort+pick (bit-identical to
        # F.percentile, several times faster); t-digest otherwise.
        if is_exact:
            return _sorted_pick_percentiles(
                frame, value_col, [0.5], key_list,
            ).select(*key_list, F.col('__b')[0].alias(out_name))
        return grouped(frame).agg(
            F.approx_percentile(value_col, F.lit(0.5)).alias(out_name))

    med = median_of(df, c, '__med')
    with_med = (df.join(F.broadcast(med), key_list, 'left')
                if key_list else df.crossJoin(F.broadcast(med)))
    dev = F.abs(c - F.col('__med'))
    mad = median_of(with_med, dev, '__mad')
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
    exact='auto',
    output_col: Optional[str] = None,
    max_exact_rows: int = MAX_EXACT_PERCENTILE_ROWS,
) -> SparkDF:
    """CLIP ``col`` to its [P_lower, P_upper] percentile bounds —
    the keep-every-row sibling of :func:`filter_by_percentile_range`
    (winsorization preserves row counts and joins downstream; use it
    when dropping outlier rows would bias per-group denominators).

    Writes ``output_col`` (default: overwrite ``col`` when it is a
    plain column name). Same plan shape as the filter variant: one
    percentile aggregate (array of both bounds, single buffer)
    broadcast onto the rows; ``exact='auto'`` (default) resolves to
    the exact sort-based percentile only below ``max_exact_rows``
    (bounded probe — see :func:`filter_by_percentile_range`), else
    the t-digest sketch for the 100 TB path.
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
    # Same exact-vs-sketch fork as filter_by_percentile_range.
    if _resolve_exact(df, exact, max_exact_rows):
        bounds = _sorted_pick_percentiles(df, c, [lower, upper], [])
    else:
        bounds = df.agg(
            F.approx_percentile(
                c, F.array(F.lit(lower), F.lit(upper))).alias('__b'))
    bounds = bounds.select(
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
