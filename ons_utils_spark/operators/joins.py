"""Join helpers — absent from the reference (SURVEY.md §2.2: it has no
join helper anywhere), supplied here because every realistic query over
the star schema needs them.

Everything is a thin, scale-aware layer over ``DataFrame.join``:

* broadcast hints for dimension tables (no shuffle of the fact side),
* null-safe equi-joins (``eqNullSafe``),
* semi/anti wrappers,
* as-of join (the time-series join Spark lacks) via union + window —
  a single shuffle on the partition keys, no row explosion,
* per-group top-k via ranked window (the scalable ORDER BY ... LIMIT k
  per group).
"""
from __future__ import annotations

import functools
import operator
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..generic import list_convert


def broadcast_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    how: str = 'inner',
) -> SparkDF:
    """Join with the right side broadcast (for small dimension tables).

    At scale this turns a sort-merge join (two shuffles) into a
    broadcast hash join (zero shuffles of ``left``).
    """
    return left.join(F.broadcast(right), on=list_convert(on), how=how)


def null_safe_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    how: str = 'inner',
) -> SparkDF:
    """Equi-join treating NULL == NULL (SQL ``IS NOT DISTINCT FROM``).

    Join columns are deduplicated (right side's copies dropped) to
    match ``on=``-list ergonomics.
    """
    keys = list_convert(on)
    cond = functools.reduce(
        operator.and_, [left[k].eqNullSafe(right[k]) for k in keys]
    )
    joined = left.join(right, on=cond, how=how)
    for k in keys:
        joined = joined.drop(right[k])
    return joined


def semi_join(
    left: SparkDF, right: SparkDF, on: Union[str, Sequence[str]]
) -> SparkDF:
    """Rows of ``left`` with a match in ``right`` (no right columns)."""
    return left.join(right, on=list_convert(on), how='left_semi')


def anti_join(
    left: SparkDF, right: SparkDF, on: Union[str, Sequence[str]]
) -> SparkDF:
    """Rows of ``left`` with no match in ``right``."""
    return left.join(right, on=list_convert(on), how='left_anti')


def as_of_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    direction: str = 'backward',
    tolerance: Optional[float] = None,
) -> SparkDF:
    """As-of join (pandas ``merge_asof`` semantics, distributed).

    For each left row: the latest right row at-or-before
    (``backward``), earliest at-or-after (``forward``), or closest
    either way (``nearest``, ties → backward) within the same ``on``
    keys. ``tolerance`` (seconds for timestamps, plain units for
    numeric axes) null-fills matches farther than that from the left
    time.

    Implementation: tag + union both sides, then ordered windows per
    key forward/backward-fill the right-side payload onto left rows.
    ONE shuffle (hash on ``on``) regardless of direction — ``nearest``
    adds a second sort over the same partitioning, never a second
    exchange — and no range cross-product (the naive join+filter+rank
    explodes on dense keys).
    """
    on = list_convert(on)
    right_time = right_time or left_time
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_time
        ]
    if direction not in ('backward', 'forward', 'nearest'):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'")
    left_payload = [c for c in left.columns if c not in on]
    right_dtypes = dict(right.dtypes)
    left_dtypes = dict(left.dtypes)

    # Union both sides with the other side's payload NULL-filled; the
    # left payload rides along so no re-join is needed afterwards.
    # '__rt' carries the matched right time for tolerance/nearest.
    left_tagged = left.select(
        *on,
        F.col(left_time).alias('__t'),
        F.lit(1).alias('__is_left'),
        F.lit(None).cast(right_dtypes[right_time]).alias('__rt'),
        *[F.col(c).alias(f'__l_{c}') for c in left_payload],
        *[F.lit(None).cast(right_dtypes[c]).alias(f'__r_{c}')
          for c in right_cols],
    )
    right_tagged = right.select(
        *on,
        F.col(right_time).alias('__t'),
        F.lit(0).alias('__is_left'),
        F.col(right_time).alias('__rt'),
        *[F.lit(None).cast(left_dtypes[c]).alias(f'__l_{c}')
          for c in left_payload],
        *[F.col(c).alias(f'__r_{c}') for c in right_cols],
    )
    union = left_tagged.unionByName(right_tagged)

    # Right rows sort before left rows at equal time so <= matches
    # backward; the reverse tie-break makes >= match forward.
    bwd_spec = (
        Window.partitionBy(*on)
        .orderBy(F.col('__t').asc(), F.col('__is_left').asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd_spec = (
        Window.partitionBy(*on)
        .orderBy(F.col('__t').asc(), F.col('__is_left').desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )

    def _filled(fill, spec, suffix):
        return [
            fill(F.col(f'__r_{c}'), ignorenulls=True)
            .over(spec).alias(f'__{suffix}_{c}')
            for c in ['t_match'] + list(right_cols)
        ]

    # Alias '__rt' under the fill loop name 't_match'.
    union = union.withColumn('__r_t_match', F.col('__rt'))

    fills = []
    if direction in ('backward', 'nearest'):
        fills += _filled(F.last, bwd_spec, 'b')
    if direction in ('forward', 'nearest'):
        fills += _filled(F.first, fwd_spec, 'f')
    filled = union.select(
        *on, '__t', '__is_left',
        *[F.col(f'__l_{c}') for c in left_payload],
        *fills,
    ).filter(F.col('__is_left') == 1)

    def _delta(match_t):
        return F.abs(F.col('__t').cast('double') - match_t.cast('double'))

    if direction == 'nearest':
        b_t, f_t = F.col('__b_t_match'), F.col('__f_t_match')
        use_b = f_t.isNull() | (
            b_t.isNotNull() & (_delta(b_t) <= _delta(f_t)))
        picked = [
            F.when(use_b, F.col(f'__b_{c}'))
            .otherwise(F.col(f'__f_{c}')).alias(f'__p_{c}')
            for c in ['t_match'] + list(right_cols)
        ]
        filled = filled.select(
            *on, '__t',
            *[F.col(f'__l_{c}') for c in left_payload], *picked)
        prefix = '__p'
    else:
        prefix = '__b' if direction == 'backward' else '__f'

    match_t = F.col(f'{prefix}_t_match')
    if tolerance is not None:
        in_tol = match_t.isNotNull() & (_delta(match_t) <= tolerance)
        out_cols = [
            F.when(in_tol, F.col(f'{prefix}_{c}'))
            .otherwise(F.lit(None).cast(right_dtypes[c])).alias(c)
            for c in right_cols
        ]
    else:
        out_cols = [F.col(f'{prefix}_{c}').alias(c) for c in right_cols]

    return filled.select(
        *on,
        *[F.col(f'__l_{c}').alias(c) for c in left_payload],
        *out_cols,
    )


_CLOSED_PREDICATES = {
    'both': lambda p, lo, hi: (p >= lo) & (p <= hi),
    'left': lambda p, lo, hi: (p >= lo) & (p < hi),
    'right': lambda p, lo, hi: (p > lo) & (p <= hi),
    'neither': lambda p, lo, hi: (p > lo) & (p < hi),
}


def range_join(
    left: SparkDF,
    right: SparkDF,
    left_point: str,
    right_lo: str,
    right_hi: str,
    on: Union[str, Sequence[str], None] = None,
    how: str = 'inner',
    closed: str = 'left',
    broadcast_right: bool = True,
) -> SparkDF:
    """Point-in-interval join: left rows matched to right intervals
    containing ``left_point`` (plus optional equi-keys ``on``).

    With ``broadcast_right`` (the default — right is typically a small
    bands/dimension table) the plan is a broadcast nested-loop join:
    the big side streams, nothing shuffles. When BOTH sides are large
    use :func:`bucketed_range_join` instead — a plain non-equi join of
    two large inputs degenerates to a cartesian product.
    """
    if closed not in _CLOSED_PREDICATES:
        raise ValueError(f'closed must be one of {set(_CLOSED_PREDICATES)}')
    cond = _CLOSED_PREDICATES[closed](
        left[left_point], right[right_lo], right[right_hi]
    )
    for k in list_convert(on) if on else []:
        cond = cond & (left[k] == right[k])
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, on=cond, how=how)
    for k in list_convert(on) if on else []:
        joined = joined.drop(right[k])
    return joined


def bucketed_range_join(
    left: SparkDF,
    right: SparkDF,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    on: Union[str, Sequence[str], None] = None,
    closed: str = 'left',
) -> SparkDF:
    """Range join for two LARGE inputs via interval bucketization.

    Each left point hashes to one bucket ``floor(point/width)``; each
    right interval explodes into every bucket it overlaps. The join
    becomes an equi-join on (keys..., bucket) — shuffle-partitionable,
    AQE/skew-split friendly — followed by the exact range refinement.
    Each (row, interval) pair meets in exactly one bucket (the point's),
    so no dedup is needed.

    ``bucket_width`` tunes replication: right rows duplicate
    ``~(interval span / width) + 1`` times. Pick width ≈ the typical
    interval span so replication stays O(1). Point/bounds must be
    numeric (cast timestamps to epoch seconds first).
    """
    if closed not in _CLOSED_PREDICATES:
        raise ValueError(f'closed must be one of {set(_CLOSED_PREDICATES)}')
    if bucket_width <= 0:
        raise ValueError('bucket_width must be positive')
    keys = list_convert(on) if on else []

    w = F.lit(bucket_width)
    lb = left.withColumn(
        '__bucket', F.floor(F.col(left_point) / w).cast('long')
    )
    rb = right.withColumn(
        '__bucket',
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w).cast('long'),
                F.floor(F.col(right_hi) / w).cast('long'),
            )
        ),
    )
    pred = _CLOSED_PREDICATES[closed](
        lb[left_point], rb[right_lo], rb[right_hi]
    )
    joined = lb.join(rb, on=['__bucket', *keys], how='inner').filter(pred)
    return joined.drop('__bucket')


def top_k_per_group(
    df: SparkDF,
    groups: Union[str, Sequence[str]],
    order_by: Union[str, Sequence[str]],
    k: int,
    ascending: bool = False,
    method: str = 'row_number',
    partition_prune: bool = True,
) -> SparkDF:
    """Top-k rows per group via a ranked window (scalable LIMIT-per-group).

    ``method`` is one of ``row_number`` (exactly k), ``rank`` /
    ``dense_rank`` (ties kept).

    ``partition_prune`` (default): a single ranked window per group
    sorts the WHOLE group in one task — fatal when one group is most
    of a 100 TB corpus.  Spark's global ``TakeOrderedAndProject``
    has no per-group form, so this emulates it: stage 1 ranks within
    ``(group, input partition)`` slices — fully parallel — and keeps
    each slice's top k BY ``rank()`` (ties kept, so the survivor set
    is a guaranteed superset of any global top-k under any
    tie-break: a row with global rank ≤ k has ≤ k−1 strictly-better
    rows globally, hence ≤ k−1 in its own slice; for ``dense_rank``
    the prune itself uses ``dense_rank`` — there the bound is k−1
    strictly-better VALUES, which ``rank()`` would violate whenever
    one value's tie-group outnumbers k); stage 2 applies
    the requested ``method`` exactly over ≤ k·partitions survivors
    per group.  Two shuffles, but the second moves ~k·partitions
    rows per group instead of the group.  Identical output (ties at
    the k boundary under ``row_number`` are arbitrary either way,
    as with any non-total order).
    """
    order_cols = [
        F.col(c).asc() if ascending else F.col(c).desc()
        for c in list_convert(order_by)
    ]
    rank_fn = {
        'row_number': F.row_number,
        'rank': F.rank,
        'dense_rank': F.dense_rank,
    }[method]
    grp = list_convert(groups)
    if partition_prune:
        pre = Window.partitionBy(*grp, '__pid').orderBy(*order_cols)
        prune_fn = F.dense_rank if method == 'dense_rank' else F.rank
        df = (
            df.withColumn('__pid', F.spark_partition_id())
            .withColumn('__prk', prune_fn().over(pre))
            .filter(F.col('__prk') <= k)
            .drop('__pid', '__prk')
        )
    spec = Window.partitionBy(*grp).orderBy(*order_cols)
    return (
        df.withColumn('__rk', rank_fn().over(spec))
        .filter(F.col('__rk') <= k)
        .drop('__rk')
    )


def fuzzy_blocked_pairs(
    df: SparkDF,
    block_cols: Union[str, Sequence[str]],
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> SparkDF:
    """Blocked fuzzy self-match (entity-resolution shape): pairs of
    rows sharing the blocking key whose ``text_col`` values are within
    Levenshtein distance ``max_dist``.

    Scale shape: the self-join is equi-keyed on the blocking columns,
    so cost is Σ|block|² — bounded by construction as long as blocks
    stay bounded (salt or sub-split oversized blocks upstream). Two
    guards keep the per-pair cost down before the quadratic term
    bites:

    * a length pre-filter — ``|len(a) − len(b)| > max_dist`` can never
      be within distance, and length comparison is ~free next to edit
      distance;
    * the thresholded ``levenshtein(l, r, max_dist)`` form, which
      abandons a pair as soon as the running distance exceeds the
      bound (O(max_dist·min_len) instead of O(len²) per pair).

    Returns one row per unordered pair: the blocking columns,
    ``id_a`` < ``id_b``, and ``dist``.
    """
    blocks = list_convert(block_cols)
    a = df.select(
        *blocks,
        F.col(id_col).alias('id_a'),
        F.col(text_col).alias('__text_a'),
        F.length(text_col).alias('__len_a'),
    )
    b = df.select(
        *blocks,
        F.col(id_col).alias('id_b'),
        F.col(text_col).alias('__text_b'),
        F.length(text_col).alias('__len_b'),
    )
    return (
        a.join(b, on=blocks)
        .filter(F.col('id_a') < F.col('id_b'))
        .filter(
            F.abs(F.col('__len_a') - F.col('__len_b')) <= max_dist)
        .withColumn(
            'dist',
            F.levenshtein('__text_a', '__text_b', max_dist))
        .filter(F.col('dist') >= 0)  # thresholded form returns -1 over
        .select(*blocks, 'id_a', 'id_b', 'dist')
    )
