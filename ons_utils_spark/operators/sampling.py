"""Deterministic sampling and dataset splitting.

Extension (no reference counterpart). Training pipelines need splits
that are (a) reproducible run-to-run with no RNG state, (b) stable
under corpus growth — a document keeps its split when new data
arrives — and (c) identical on any engine. The standard trick: hash
the stable id, compare a fixed-width hex prefix against precomputed
thresholds. md5 is the hash because every engine agrees on it
bit-for-bit (Spark ``F.md5``, DuckDB ``md5``, Python ``hashlib``), so
a DuckDB oracle can replay the exact assignment (``q_train_split``).

Scale: one projection, no shuffle, no RNG, no driver state — the
split column is computable inside whole-stage codegen at scan time,
and partition pruning survives because nothing reorders rows.
"""
from __future__ import annotations

from typing import Mapping, Tuple

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = [
    'hash_split', 'split_thresholds', 'hash_fraction_filter',
    'stratified_sample_exact', 'weighted_sample_exact',
    'mixture_sample', 'global_order_index',
    'interleaved_mixture_order', 'fractional_epochs',
    'unimax_allocation',
]

_PREFIX_LEN = 6
_SPACE = 16 ** _PREFIX_LEN  # 16,777,216 buckets


def split_thresholds(
    splits: Mapping[str, float],
) -> Tuple[Tuple[str, str], ...]:
    """Cumulative hex thresholds for ``splits`` (name -> weight).

    Returns ``((name, upper_hex_exclusive), ...)`` in declaration
    order; the last split absorbs the rounding remainder. Exposed so
    tests/oracles can embed the exact same boundaries."""
    total = float(sum(splits.values()))
    if total <= 0:
        raise ValueError('split weights must sum to a positive value')
    out = []
    cum = 0.0
    for name, weight in splits.items():
        if weight < 0:
            raise ValueError(f'negative weight for split {name!r}')
        cum += weight / total
        bound = min(int(cum * _SPACE), _SPACE)
        out.append((name, format(bound, f'0{_PREFIX_LEN}x')))
    return tuple(out)


def _hash_prefix(id_col: str, salt: str) -> SparkCol:
    return F.substring(
        F.md5(F.concat(F.lit(salt),
                       F.col(id_col).cast('string'))),
        1, _PREFIX_LEN,
    )


def hash_split(
    df: SparkDF,
    id_col: str,
    splits: Mapping[str, float],
    salt: str = '',
    output_col: str = 'split',
) -> SparkDF:
    """Assign every row to a named split by stable hash of its id.

    ``splits`` maps split name -> weight (normalized to fractions of
    the 16^6 hash space). ``salt`` derives independent assignments
    from the same ids (e.g. per-experiment re-splits). Adds
    ``output_col``; never drops or reorders rows.
    """
    thresholds = split_thresholds(splits)
    prefix = _hash_prefix(id_col, salt)
    expr = None
    for name, bound in thresholds[:-1]:
        cond = prefix < F.lit(bound)
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    last_name = thresholds[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(output_col, expr)


def hash_fraction_filter(
    df: SparkDF,
    id_col: str,
    fraction: float,
    salt: str = '',
) -> SparkDF:
    """Keep a deterministic ~``fraction`` of rows by id hash — the
    holdout-sample primitive (generalizes the fixed ``q_hash_sample``
    threshold to any fraction)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f'fraction must be in [0, 1], got {fraction}')
    bound = format(min(int(fraction * _SPACE), _SPACE),
                   f'0{_PREFIX_LEN}x')
    return df.filter(_hash_prefix(id_col, salt) < F.lit(bound))


def stratified_sample_exact(
    df: SparkDF,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = '',
    prefix_sum_buckets: int = 256,
) -> SparkDF:
    """Exactly ``min(k, group size)`` rows per group, deterministic.

    Spark's ``sampleBy`` is fraction-based (binomial row counts,
    RNG-seeded per partition — counts drift with partitioning); a
    driver-side reservoir doesn't distribute. This instead ranks each
    group by ``md5(salt || id)`` and keeps the ``k`` smallest — a
    uniform-without-replacement sample that is (a) exact-size, (b)
    stable under repartitioning/retries, (c) replayable on any engine
    (the ``q_stratified_sample`` oracle), and (d) *consistent under
    corpus growth*: a kept row is only ever displaced by a new row
    hashing lower, never by a reshuffle.

    Plan — the same DISTRIBUTED PREFIX SUM as
    :func:`mixture_sample` (row COUNTS instead of token sums),
    because ``row_number() over (partition by group)`` sorts an
    entire group in ONE task.  Rows bucket by the leading hex of
    their order tag; per-(group, bucket) counts classify buckets as
    wholly inside the first ``k`` positions (pass untouched — no
    row sort at all), wholly outside (drop), or THE boundary bucket,
    which alone gets a ``row_number`` window over ~1/buckets of the
    group.  Selection is identical to the flat ranked window
    (parity-tested); ``prefix_sum_buckets=None`` keeps the flat
    plan.
    """
    if k <= 0:
        raise ValueError(f'k must be positive, got {k}')
    from pyspark.sql import Window
    # NULL ids hash to a NULL tag: rank them LAST (Spark asc is
    # NULLS FIRST; DuckDB's is NULLS LAST) so they never displace a
    # real row and the oracle replay agrees across engines.
    tag = F.md5(F.concat(F.lit(salt), F.col(id_col).cast('string')))
    order = [tag.asc_nulls_last(), F.col(id_col).asc_nulls_last()]
    if prefix_sum_buckets is None:
        w = Window.partitionBy(group_col).orderBy(*order)
        return (
            df.withColumn('_rk', F.row_number().over(w))
            .filter(F.col('_rk') <= k)
            .drop('_rk')
        )
    if prefix_sum_buckets not in (16, 256, 4096):
        raise ValueError(
            'prefix_sum_buckets must be 16, 256, 4096 or None,'
            f' got {prefix_sum_buckets!r}')
    plen = {16: 1, 256: 2, 4096: 3}[prefix_sum_buckets]
    # NULL ids -> NULL tag.  The bucket key must stay JOINABLE
    # (inner equi-join drops NULL keys) and sort AFTER every hex
    # bucket, preserving the NULLs-last rank: '~' (0x7E) > 'f'.
    src = df.withColumn('_tag', tag).withColumn(
        '_bkt', F.coalesce(F.substring('_tag', 1, plen), F.lit('~')))
    wb = (
        Window.partitionBy(group_col)
        .orderBy(F.col('_bkt').asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summary = (
        src.groupBy(group_col, '_bkt').agg(F.count('*').alias('_bc'))
        .withColumn('_prev', F.coalesce(F.sum('_bc').over(wb),
                                        F.lit(0)))
        .filter(F.col('_prev') < k)  # buckets past position k drop
        .withColumn('_whole', F.col('_prev') + F.col('_bc') <= k)
        .select(group_col, '_bkt', '_prev', '_whole')
    )
    # eqNullSafe on group_col: a NULL group is a real window
    # partition in the flat plan, so the prefix-sum plan must keep
    # it too (a plain inner equi-join would silently drop it).  No
    # broadcast hint: the summary has ~|groups| x buckets-kept rows,
    # so with a high-cardinality group_col a forced broadcast builds
    # an unbounded build side — AQE picks broadcast at runtime when
    # the summary is actually small and shuffles when it is not.
    s, m = src.alias('_s'), summary.alias('_m')
    tagged = s.join(
        m,
        s[group_col].eqNullSafe(m[group_col])
        & (s['_bkt'] == m['_bkt']),
        how='inner',
    ).select(*[s[c] for c in src.columns], m['_prev'], m['_whole'])
    whole = tagged.filter(F.col('_whole')).select(*df.columns)
    we = Window.partitionBy(group_col, '_bkt').orderBy(*order)
    edge = (
        tagged.filter(~F.col('_whole'))
        .withColumn('_rk', F.col('_prev') + F.row_number().over(we))
        .filter(F.col('_rk') <= k)
        .select(*df.columns)
    )
    return whole.unionByName(edge)


def weighted_sample_exact(
    df: SparkDF,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = '',
    partition_prune: bool = True,
) -> SparkDF:
    """Exactly ``min(k, group size)`` rows per group, drawn WITHOUT
    replacement with probability proportional to ``weight_col`` —
    deterministic (Efraimidis–Spirakis A-ES with an md5-derived
    uniform instead of an RNG).

    Each row gets the key ``ln(u) / w`` where ``u ∈ (0, 1]`` comes
    from the row id's md5 prefix; the ``k`` LARGEST keys win. Rows
    with weight <= 0 or NULL are never sampled. The same id keeps the
    same ``u`` across runs/engines/corpus growth, so samples are
    reproducible and stable exactly like :func:`hash_split` — and
    the DuckDB oracle (``q_weighted_sample``) replays the draw.

    Plan: the tag-prefix bucket trick of
    :func:`stratified_sample_exact` does NOT apply (the rank key
    ``ln(u)/w`` depends on the weight, so tag order is not key
    order), but the generic two-stage prune does
    (``partition_prune``, default on): rank within
    ``(group, input partition)`` slices in parallel, keep each
    slice's top k (ties kept — a guaranteed superset of any global
    top k), then rank the ~k·partitions survivors per group exactly.
    No whole-group single-task sort.
    """
    if k <= 0:
        raise ValueError(f'k must be positive, got {k}')
    from pyspark.sql import Window
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt),
                           F.col(id_col).cast('string'))),
            1, _PREFIX_LEN),
        16, 10,
    ).cast('long')
    u = (v + 1) / F.lit(float(_SPACE + 1))
    w = F.col(weight_col).cast('double')
    key = F.when(w > 0, F.log(u) / w)
    staged = df.withColumn('_wk', key).filter(
        F.col('_wk').isNotNull())
    if partition_prune:
        pre = Window.partitionBy(group_col, '_pid').orderBy(
            F.col('_wk').desc(), F.col(id_col).asc())
        staged = (
            staged.withColumn('_pid', F.spark_partition_id())
            .withColumn('_prk', F.rank().over(pre))
            .filter(F.col('_prk') <= k)
            .drop('_pid', '_prk')
        )
    win = Window.partitionBy(group_col).orderBy(
        F.col('_wk').desc(), F.col(id_col).asc())
    return (
        staged.withColumn('_rk', F.row_number().over(win))
        .filter(F.col('_rk') <= k)
        .drop('_rk', '_wk')
    )


def mixture_sample(
    df: SparkDF,
    group_col: str,
    id_col: str,
    token_col: str,
    budgets: Mapping[str, int],
    salt: str = '',
    prefix_sum_buckets: int = 256,
) -> SparkDF:
    """Build a training mixture: per group, keep a deterministic
    uniform-random subset whose token total stays within the group's
    budget (groups absent from ``budgets`` are dropped).

    The selection order is md5(salt || id) — i.e. a reproducible
    shuffle — and a document is kept while the RUNNING token total
    (including itself) fits the budget; the first overflowing doc and
    everything after it are cut.  Token counts are assumed
    non-negative; NULL counts consume nothing (never block a row). This is the "mix sources at fixed
    token ratios" step of corpus construction (e.g. 70% web / 20%
    code / 10% books by tokens), with the same growth-stability
    story as :func:`hash_split`.

    Plan — a DISTRIBUTED PREFIX SUM, because the naive
    ``Window.partitionBy(group)`` cumsum puts an entire group in ONE
    task (a web-scale source is most of the corpus — the worst
    possible skew).  Rows bucket by the first hex chars of their
    order tag (bucket order ≡ tag-prefix order, so the walk is
    unchanged); per-(group, bucket) token subtotals form a tiny
    summary whose per-group running totals classify each bucket as
    fully-inside the budget, fully-outside, or THE boundary bucket.
    Fully-inside rows pass with no row-level window at all;
    only the single boundary bucket per group (~1/buckets of that
    group) runs a row-ordered cumsum offset by the buckets before
    it.  Work: one hash agg + one broadcast join + a window over
    1/``prefix_sum_buckets`` of each group.  The selected set is
    IDENTICAL to the flat window's (property-tested);
    ``prefix_sum_buckets=None`` keeps the flat plan for tiny inputs.
    """
    from pyspark.sql import Window

    if not budgets:
        raise ValueError('budgets must name at least one group')
    # NULL-id rows rank last (see stratified_sample_exact): they only
    # consume budget after every real row, identically on any engine.
    tag = F.md5(F.concat(F.lit(salt), F.col(id_col).cast('string')))
    order = [tag.asc_nulls_last(), F.col(id_col).asc_nulls_last()]
    budget_map = F.create_map(*[
        F.lit(x) for kv in budgets.items() for x in kv
    ])
    if prefix_sum_buckets is None:
        w = (
            Window.partitionBy(group_col).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn('_budget', budget_map[F.col(group_col)])
            .withColumn('_cum', F.coalesce(
                F.sum(F.col(token_col)).over(w), F.lit(0)))
            .filter(F.col('_budget').isNotNull()
                    & (F.col('_cum') <= F.col('_budget')))
            .drop('_budget', '_cum')
        )
    if prefix_sum_buckets not in (16, 256, 4096):
        raise ValueError(
            'prefix_sum_buckets must be 16, 256, 4096 or None,'
            f' got {prefix_sum_buckets!r}')
    plen = {16: 1, 256: 2, 4096: 3}[prefix_sum_buckets]
    # NULL ids -> NULL tag.  The bucket key must stay JOINABLE
    # (inner equi-join drops NULL keys) and sort AFTER every hex
    # bucket, preserving the NULLs-last rank: '~' (0x7E) > 'f'.
    src = df.withColumn('_tag', tag).withColumn(
        '_bkt', F.coalesce(F.substring('_tag', 1, plen), F.lit('~')))
    wb = (
        Window.partitionBy(group_col)
        .orderBy(F.col('_bkt').asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summary = (
        src.groupBy(group_col, '_bkt')
        .agg(F.sum(token_col).alias('_bt'))
        .withColumn('_prev', F.coalesce(F.sum('_bt').over(wb),
                                        F.lit(0)))
        .withColumn('_budget', budget_map[F.col(group_col)])
        .filter(F.col('_budget').isNotNull())
        # fully-outside buckets (and the rows in them) drop here.
        # <= not <: a bucket whose _prev EQUALS the budget can still
        # contain zero-token rows the inclusive cum <= budget rule
        # admits — it classifies as an edge bucket and the row window
        # settles it, keeping parity with the flat plan.
        .filter(F.col('_prev') <= F.col('_budget'))
        .withColumn(
            '_whole',
            F.coalesce(F.col('_prev') + F.col('_bt'), F.col('_prev'))
            <= F.col('_budget'))
        .select(group_col, '_bkt', '_prev', '_budget', '_whole')
    )
    tagged = src.join(
        F.broadcast(summary),
        on=[group_col, '_bkt'], how='inner')
    whole = tagged.filter(F.col('_whole')).select(*df.columns)
    we = (
        Window.partitionBy(group_col, '_bkt').orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge = (
        tagged.filter(~F.col('_whole'))
        .withColumn('_cum', F.col('_prev') + F.coalesce(
            F.sum(F.col(token_col)).over(we), F.lit(0)))
        .filter(F.col('_cum') <= F.col('_budget'))
        .select(*df.columns)
    )
    return whole.unionByName(edge)


def fractional_epochs(
    df: SparkDF,
    group_col: str,
    id_col: str,
    epochs: Mapping[str, float],
    salt: str = '',
    epoch_col: str = 'epoch',
) -> SparkDF:
    """Deterministic per-source UPSAMPLING: replicate each group's
    rows ~``epochs[group]`` times — the "2.5 epochs of wiki, 1 epoch
    of web, 0.25 epochs of forums" step of training-mixture
    construction (the complement of :func:`mixture_sample`, which
    only DOWN-selects).

    A row appears once per whole epoch (``epoch_col`` = 0 ..
    floor(e)−1) plus once more in the final PARTIAL epoch iff its
    md5 fraction clears ``frac(e)`` — the :func:`hash_split`
    threshold trick, so the partial-epoch subset is exact in
    expectation, reproducible run-to-run, engine-replayable, and
    stable under corpus growth.  Groups absent from ``epochs`` (or
    with e <= 0) are dropped.  Distinct epochs of the same document
    get distinct ``(id, epoch)`` keys; feed the result to
    :func:`global_order_index` with an epoch-aware salt for the
    reading order.

    Plan: ONE projection + generator — ``array_repeat`` sized by a
    per-group literal map, exploded, then a union with the
    hash-thresholded partial epoch.  No shuffle, no RNG, no driver
    state at any scale; partition pruning survives because nothing
    reorders rows.
    """
    if not epochs:
        raise ValueError('epochs must name at least one group')
    for g, e in epochs.items():
        if e < 0:
            raise ValueError(f'negative epochs for group {g!r}: {e}')
    whole = {g: int(e) for g, e in epochs.items()}
    frac_hex = {
        g: format(min(int((e - whole[g]) * _SPACE), _SPACE),
                  f'0{_PREFIX_LEN}x')
        for g, e in epochs.items()
    }
    whole_map = F.create_map(*[
        F.lit(x) for kv in whole.items() for x in kv
    ])
    frac_map = F.create_map(*[
        F.lit(x) for kv in frac_hex.items() for x in kv
    ])
    n_whole = F.coalesce(
        whole_map[F.col(group_col)], F.lit(0)).cast('int')
    full = df.select(
        '*',
        F.posexplode(
            F.array_repeat(F.lit(1), n_whole)
        ).alias(epoch_col, '__one'),
    ).drop('__one')
    partial = df.filter(
        _hash_prefix(id_col, salt)
        < F.coalesce(frac_map[F.col(group_col)], F.lit('000000'))
    ).withColumn(epoch_col, n_whole)
    return full.unionByName(partial)


def global_order_index(
    df: SparkDF,
    id_col: str,
    salt: str = '',
    output_col: str = 'position',
    prefix_sum_buckets: int = 4096,
) -> SparkDF:
    """Assign every row a stable GLOBAL position 0..n-1 in
    md5(salt || id) order — the reproducible global shuffle a
    training run consumes (epoch order, shard boundaries, resumable
    cursors), with the same engine-replayability and growth story as
    :func:`hash_split` (``salt`` = epoch number gives independent
    orders from the same ids).

    The naive ``row_number() OVER (ORDER BY tag)`` has NO partition
    key — Spark sorts the entire corpus in ONE task.  This is the
    same distributed prefix sum as :func:`stratified_sample_exact`
    without the group: per-bucket counts (``prefix_sum_buckets``
    rows) compute each bucket's starting offset; each bucket then
    ranks its own ~1/buckets slice in parallel.  Two shuffles of the
    data (count agg keys + the per-bucket sort), one broadcast of
    the tiny offset table.

    NULL ids rank last (NULL tag → sentinel bucket), ordered among
    themselves arbitrarily but counted exactly.
    """
    from pyspark.sql import Window

    if prefix_sum_buckets not in (16, 256, 4096):
        raise ValueError(
            'prefix_sum_buckets must be 16, 256 or 4096,'
            f' got {prefix_sum_buckets!r}')
    plen = {16: 1, 256: 2, 4096: 3}[prefix_sum_buckets]
    tag = F.md5(F.concat(F.lit(salt), F.col(id_col).cast('string')))
    src = df.withColumn('_tag', tag).withColumn(
        '_bkt', F.coalesce(F.substring('_tag', 1, plen), F.lit('~')))
    # the offsets frame is <= buckets+1 rows: a single-task window
    # over it is deliberate and bounded
    wb = (
        Window.partitionBy(F.lit(0)).orderBy('_bkt')
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        src.groupBy('_bkt').agg(F.count('*').alias('_bc'))
        .withColumn('_off', F.coalesce(F.sum('_bc').over(wb),
                                       F.lit(0)))
        .select('_bkt', '_off')
    )
    we = Window.partitionBy('_bkt').orderBy(
        F.col('_tag').asc_nulls_last(),
        F.col(id_col).asc_nulls_last())
    return (
        src.join(F.broadcast(offsets), on='_bkt')
        .withColumn(
            output_col,
            (F.col('_off') + F.row_number().over(we) - 1)
            .cast('bigint'))
        .drop('_tag', '_bkt', '_off')
    )


def interleaved_mixture_order(
    df: SparkDF,
    group_col: str,
    id_col: str,
    weights: Mapping[str, float],
    salt: str = '',
    pos_col: str = 'src_pos',
    key_col: str = 'mix_key',
    prefix_sum_buckets: int = 256,
) -> SparkDF:
    """Proportional source interleaving: the training-stream order
    where each source appears at ~its mixture weight's rate (the
    "mix 2 parts web to 1 part code" READING order, vs
    :func:`mixture_sample` which decides inclusion).

    Each row gets its source-local position ``pos_col`` (0-based, in
    md5(salt || id) order — the same reproducible shuffle as
    everything else here) and the deficit-round-robin key
    ``key_col = (pos + 1) / weight``.  Sorting by ``(key, group,
    id)`` interleaves sources so that any prefix of the stream holds
    ``min(floor(t·w_s), n_s)`` rows of source ``s`` at key cutoff
    ``t`` — proportional at every scale, not just in aggregate.
    Groups absent from ``weights`` (or with weight <= 0) are
    dropped.

    The per-source positions use the same distributed prefix sum as
    :func:`global_order_index` (bucket counts → offsets → parallel
    per-bucket ranks), so no source serializes in one task; the
    interleave itself is just a sort key — at scale feed it to
    ``repartitionByRange(key)`` + ``sortWithinPartitions`` for a
    sharded, readable layout.
    """
    from pyspark.sql import Window

    if not weights:
        raise ValueError('weights must name at least one group')
    if prefix_sum_buckets not in (16, 256, 4096):
        raise ValueError(
            'prefix_sum_buckets must be 16, 256 or 4096,'
            f' got {prefix_sum_buckets!r}')
    plen = {16: 1, 256: 2, 4096: 3}[prefix_sum_buckets]
    w_map = F.create_map(*[
        F.lit(x) for kv in weights.items() for x in kv
    ])
    tag = F.md5(F.concat(F.lit(salt), F.col(id_col).cast('string')))
    src = (
        df.withColumn('_w', w_map[F.col(group_col)].cast('double'))
        .filter(F.col('_w') > 0)
        .withColumn('_tag', tag)
        .withColumn('_bkt', F.coalesce(
            F.substring('_tag', 1, plen), F.lit('~')))
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy(F.col('_bkt').asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        src.groupBy(group_col, '_bkt').agg(F.count('*').alias('_bc'))
        .withColumn('_off', F.coalesce(F.sum('_bc').over(wb),
                                       F.lit(0)))
        .select(group_col, '_bkt', '_off')
    )
    we = Window.partitionBy(group_col, '_bkt').orderBy(
        F.col('_tag').asc_nulls_last(),
        F.col(id_col).asc_nulls_last())
    # No broadcast hint (mirrors stratified_sample_exact): offsets
    # is bounded by len(weights) x buckets here, but letting AQE
    # pick keeps the join strategy consistent across the family.
    return (
        src.join(offsets, on=[group_col, '_bkt'])
        .withColumn(pos_col, (F.col('_off')
                              + F.row_number().over(we) - 1)
                    .cast('bigint'))
        .withColumn(key_col, (F.col(pos_col) + 1) / F.col('_w'))
        .drop('_tag', '_bkt', '_off', '_w')
    )


def unimax_allocation(
    df: SparkDF,
    group_col: str,
    weight_col: 'str | None' = None,
    max_epochs: float = 1.0,
    budget: 'float | None' = None,
    budget_fraction: 'float | None' = None,
) -> SparkDF:
    """UniMax budget allocation (Chung et al., ICLR 2023 — the
    T5X/PaLM-2 multilingual mixing strategy): split a total training
    budget across groups (languages) as UNIFORMLY as possible while
    never repeating any group more than ``max_epochs`` times —
    head languages stop hogging the mixture, tail languages are
    never oversampled into memorization.

    Water-filling with per-group caps ``cap_g = capacity_g ×
    max_epochs`` (capacity = ``sum(weight_col)`` per group — tokens,
    characters, or rows when ``None``): every group receives
    ``min(cap_g, λ)`` with the water level λ chosen so allocations
    sum to the budget.  Pass ``budget`` (absolute) or
    ``budget_fraction`` (× total capacity, resolved IN-PLAN so no
    driver action).  Returns one row per group:
    ``(group, capacity, cap, allocation, epochs)``.

    Closed form via windows, no iteration: sort groups by cap
    ascending — cap-outs are then a PREFIX — and group ``i`` caps
    out iff ``cap_i × (n−i+1) + prefix_{i−1} < B``; λ spreads the
    budget left after the k capped groups over the n−k others.  If
    the budget exceeds every cap the leftover is simply unallocated
    (every group trains its max_epochs; raise the cap if that is a
    surprise).  Scale shape: one group-keyed aggregate over the
    corpus, then ALL windows run over the n_groups-row aggregate
    (languages number thousands at most) — never over corpus rows.
    """
    if (budget is None) == (budget_fraction is None):
        raise ValueError(
            'pass exactly one of budget / budget_fraction')
    if max_epochs <= 0:
        raise ValueError(f'max_epochs must be > 0: {max_epochs}')
    from pyspark.sql import Window

    wexpr = F.col(weight_col) if weight_col else F.lit(1)
    caps = (
        df.groupBy(group_col)
        .agg(F.sum(wexpr).cast('double').alias('capacity'))
        .withColumn('cap', F.col('capacity') * float(max_epochs)))
    everything = Window.partitionBy()
    asc = everything.orderBy(F.col('cap').asc(),
                             F.col(group_col).asc())
    run = asc.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)
    if budget_fraction is not None:
        b = (F.sum('capacity').over(everything)
             * float(budget_fraction))
    else:
        b = F.lit(float(budget))
    n = F.count(F.lit(1)).over(everything)
    i = F.row_number().over(asc)
    prefix_prev = F.sum('cap').over(run) - F.col('cap')
    staged = (
        caps
        .withColumn('__b', b)
        .withColumn(
            '__capped',
            F.col('cap') * (n - i + 1) + prefix_prev < F.col('__b'))
        .withColumn(
            '__k', F.sum(F.col('__capped').cast('int'))
            .over(everything))
        .withColumn(
            '__pk',
            F.coalesce(
                F.sum(F.when(F.col('__capped'), F.col('cap')))
                .over(everything), F.lit(0.0)))
        .withColumn(
            '__lam',
            F.when(n > F.col('__k'),
                   (F.col('__b') - F.col('__pk'))
                   / (n - F.col('__k'))).otherwise(F.lit(0.0))))
    return staged.select(
        group_col, 'capacity', 'cap',
        F.when(F.col('__capped'), F.col('cap'))
        .otherwise(F.least(F.col('__lam'), F.col('cap')))
        .alias('allocation'),
    ).withColumn(
        'epochs',
        F.when(F.col('capacity') > 0,
               F.col('allocation') / F.col('capacity')))


def temperature_allocation(
    df: SparkDF,
    group_col: str,
    weight_col: 'str | None' = None,
    alpha: float = 0.25,
    budget: 'float | None' = None,
    quant: int = 1_000_000,
) -> SparkDF:
    """Temperature-scaled multinomial mixing weights (the mBERT /
    XLM-R / mT5 exponential-smoothing recipe, Conneau et al. 2020
    §3.1): sampling probability ``p_g ∝ capacity_g ** alpha`` —
    ``alpha=1`` reproduces the natural distribution, ``alpha→0``
    approaches uniform, and the published sweet spots (0.25 for
    mT5-scale multilinguality, 0.3/0.5/0.7 for XLM-R) lift tail
    languages without UniMax's hard epoch cap (its water-filling
    sibling is :func:`unimax_allocation`).

    Returns one row per group: ``(group, capacity, weight,
    alloc)`` with ``weight`` the normalized probability and
    ``alloc = floor(budget × w_q / Σw_q)`` (0 when no ``budget``).

    Exactness contract: ``capacity_g ** alpha`` is quantized to the
    integer ``w_q = floor(capacity**alpha × quant + 0.5)`` BEFORE
    normalizing, so the denominator is an integer SUM — associative,
    order-free — and ``weight = w_q / Σw_q`` plus ``alloc =
    floor(budget × (w_q / Σw_q))`` are fixed IEEE-double operation
    chains that replay bit-exactly on any engine.  When ``alpha``
    is 0.5, 0.25, or 0.125 the power is computed as chained
    ``sqrt`` (correctly rounded by IEEE 754, hence engine-portable);
    other alphas use ``pow``, correct to 1 ulp but not formally
    portable — quantization makes a flip astronomically unlikely,
    not impossible.

    Scale shape: one group-keyed aggregate over the corpus; the
    normalization windows run over the groups-row table (thousands
    at most), never corpus rows.  Compose with
    :func:`mixture_sample` / :func:`fractional_epochs` to realize
    the draw.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f'alpha must be in (0, 1], got {alpha!r}')
    if quant < 1:
        raise ValueError(f'quant must be >= 1, got {quant!r}')
    from pyspark.sql import Window

    wexpr = F.col(weight_col) if weight_col else F.lit(1)
    caps = df.groupBy(group_col).agg(
        F.sum(wexpr).cast('double').alias('capacity'))
    x = F.col('capacity')
    sqrt_chain = {0.5: 1, 0.25: 2, 0.125: 3}
    if alpha == 1.0:
        powered = x
    elif alpha in sqrt_chain:
        powered = x
        for _ in range(sqrt_chain[alpha]):
            powered = F.sqrt(powered)
    else:
        powered = F.pow(x, F.lit(float(alpha)))
    everything = Window.partitionBy()
    staged = caps.withColumn(
        '__wq', F.floor(powered * quant + F.lit(0.5)).cast('bigint'))
    tot = F.sum('__wq').over(everything)
    out = staged.withColumn(
        'weight', F.col('__wq') / tot)
    if budget is not None:
        alloc = F.floor(
            F.lit(float(budget)) * (F.col('__wq') / tot)) \
            .cast('bigint')
        out = out.withColumn('alloc', alloc)
    else:
        out = out.withColumn('alloc', F.lit(0).cast('bigint'))
    return out.select(group_col, 'capacity', 'weight', 'alloc')
