"""Declarative data-quality checks evaluated in one aggregate pass.

The data-value counterpart to ``config/validation.py`` (which
validates schemas/tables/paths): completeness, uniqueness, ranges,
set membership, and custom predicates over a frame, in the style of
AWS Deequ / Great Expectations — but Spark-first: every check
compiles to aggregate expressions that run in a SINGLE hash
aggregate over one scan (plus one Expand when distinct counts are
requested), so a 40-check suite on a 100 TB table costs one pass,
not 40.

Output is a tidy report frame ``(check, column, observed, expected,
passed)`` — joinable, storable, alertable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = [
    'Check', 'is_complete', 'is_unique', 'has_min', 'has_max',
    'is_in_set', 'is_non_negative', 'satisfies', 'run_checks',
    'k_anonymity', 'cohens_kappa',
]


@dataclass(frozen=True)
class Check:
    """One named check: ``violations`` counts offending rows (0 =
    pass); ``observed`` optionally reports a metric for the row."""
    name: str
    column: str
    violations: SparkCol
    observed: Optional[SparkCol] = None
    expected: str = '0 violations'


def is_complete(column: str) -> Check:
    """No NULLs in ``column``."""
    return Check(
        'is_complete', column,
        F.sum(F.col(column).isNull().cast('long')),
        expected='no NULL values')


def is_unique(column: str) -> Check:
    """No duplicate values (NULLs excluded, like a SQL UNIQUE).

    The one check that needs a distinct count — Catalyst plans an
    Expand for it; drop uniqueness checks (or pre-verify with
    ``bitmap_distinct_count``) when the single pass must stay
    Expand-free.
    """
    return Check(
        'is_unique', column,
        F.count(F.col(column)) - F.countDistinct(F.col(column)),
        observed=F.countDistinct(F.col(column)),
        expected='count == distinct count')


def has_min(column: str, bound) -> Check:
    """All values ≥ ``bound``."""
    return Check(
        f'has_min({bound})', column,
        F.sum((F.col(column) < F.lit(bound)).cast('long')),
        observed=F.min(column),
        expected=f'min >= {bound}')


def has_max(column: str, bound) -> Check:
    """All values ≤ ``bound``."""
    return Check(
        f'has_max({bound})', column,
        F.sum((F.col(column) > F.lit(bound)).cast('long')),
        observed=F.max(column),
        expected=f'max <= {bound}')


def is_in_set(column: str, allowed: Sequence) -> Check:
    """All non-NULL values drawn from ``allowed``."""
    vals = list(allowed)
    return Check(
        'is_in_set', column,
        F.sum((~F.col(column).isin(vals)
               & F.col(column).isNotNull()).cast('long')),
        expected=f'values in {vals!r}')


def is_non_negative(column: str) -> Check:
    return has_min(column, 0)


def satisfies(name: str, predicate: SparkCol,
              column: str = '*') -> Check:
    """Custom row predicate that must hold on every row (NULL
    predicate counts as a violation — unknown is not a pass)."""
    return Check(
        name, column,
        F.sum((~F.coalesce(predicate, F.lit(False))).cast('long')))


def run_checks(df: SparkDF, checks: Sequence[Check]) -> SparkDF:
    """Evaluate all ``checks`` in one aggregate job.

    Returns ``(check, column, n_rows, violations, observed,
    expected, passed)`` — one row per check.  ``observed`` is
    stringified (mixed metric types in one column).  The wide
    aggregate row is collected ONCE (one job, one scan — a
    re-selecting union would recompute the aggregate per check) and
    the tiny report frame is rebuilt from it.
    """
    if not checks:
        raise ValueError('no checks given')
    aggs: List[SparkCol] = [F.count(F.lit(1)).alias('__n')]
    for i, c in enumerate(checks):
        aggs.append(c.violations.cast('long').alias(f'__v{i}'))
        obs = c.observed if c.observed is not None else F.lit(None)
        aggs.append(obs.cast('string').alias(f'__o{i}'))
    row = df.agg(*aggs).collect()[0]
    data = []
    for i, c in enumerate(checks):
        v = row[f'__v{i}'] or 0
        data.append((c.name, c.column, row['__n'], v,
                     row[f'__o{i}'], c.expected, v == 0))
    return df.sparkSession.createDataFrame(
        data,
        'check string, column string, n_rows long, violations long,'
        ' observed string, expected string, passed boolean')


def k_anonymity(
    df: SparkDF,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> SparkDF:
    """Per-equivalence-class k-anonymity report (Sweeney 2002): group
    the frame by its quasi-identifier columns and flag classes with
    fewer than ``k`` rows — the release-gate check a dataset must
    pass before rows with quasi-identifiers (location, demographic
    buckets, rare metadata combinations) leave the pipeline.
    Returns ``(*quasi_cols, n_rows, k_anonymous)``, one row per
    equivalence class; the release rule is "suppress or generalize
    every class where ``k_anonymous`` is false".

    ONE hash aggregate keyed on the quasi-identifier tuple (map-side
    partial combine) — the same single-pass cost as any census, at
    any table size.  Skewed classes are exactly the safe ones, so
    key skew is benign here.
    """
    if k < 1:
        raise ValueError(f'k must be >= 1, got {k!r}')
    if not quasi_cols:
        raise ValueError('quasi_cols must be non-empty')
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias('n_rows'))
        .withColumn('k_anonymous', F.col('n_rows') >= k)
    )


def cohens_kappa(
    df: SparkDF,
    rater_a: str,
    rater_b: str,
) -> SparkDF:
    """Cohen's kappa inter-annotator agreement (Cohen 1960) over a
    frame of doubly-labeled items — the standard QA number for a
    labeling campaign before its labels train a classifier.
    Returns ONE row ``(n_items, n_agree, chance_pairs, kappa_u6)``
    where ``kappa_u6`` is kappa × 1e6 as an integer computed from
    the EXACT closed form

        kappa = (n_agree·N − Σ_c nA_c·nB_c) / (N² − Σ_c nA_c·nB_c)

    — all-integer arithmetic (observed minus chance agreement over
    one minus chance), so the value replays engine-exactly with no
    float accumulation anywhere.  Degenerate case: when chance
    agreement is total (``N² = Σ nA·nB``, e.g. both raters constant)
    kappa is undefined and ``kappa_u6`` is NULL.

    Plan: one (a, b) census (single shuffle, map-side combine),
    marginals re-aggregated from the census (label-cardinality-sized,
    tiny), one broadcast-scale join on label — the item table is
    scanned once.
    """
    counts = (
        df.select(F.col(rater_a).alias('__a'),
                  F.col(rater_b).alias('__b'))
        .groupBy('__a', '__b')
        .agg(F.count(F.lit(1)).alias('__n'))
    )
    na = counts.groupBy('__a').agg(F.sum('__n').alias('__na')) \
        .withColumnRenamed('__a', '__lab')
    nb = counts.groupBy('__b').agg(F.sum('__n').alias('__nb')) \
        .withColumnRenamed('__b', '__lab')
    chance = (
        na.join(nb, '__lab')
        .agg(F.coalesce(
            F.sum(F.col('__na') * F.col('__nb')), F.lit(0))
            .alias('__chance'))
    )
    agree = counts.agg(
        F.sum('__n').alias('__n_items'),
        F.sum(F.when(F.col('__a') == F.col('__b'), F.col('__n'))
              .otherwise(F.lit(0))).alias('__agree'))
    joined = agree.join(F.broadcast(chance), how='cross')
    n = F.col('__n_items')
    denom = n * n - F.col('__chance')
    kappa_u6 = F.when(
        denom != 0,
        F.round((F.col('__agree') * n - F.col('__chance'))
                .cast('double') * 1000000 / denom.cast('double'))
        .cast('bigint'))
    return joined.select(
        n.alias('n_items'),
        F.col('__agree').alias('n_agree'),
        F.col('__chance').alias('chance_pairs'),
        kappa_u6.alias('kappa_u6'))
