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
