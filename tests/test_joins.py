"""Tests for join helpers (broadcast, null-safe, semi/anti, as-of, top-k)."""
import pytest

from ons_utils_spark import (
    anti_join,
    as_of_join,
    broadcast_join,
    null_safe_join,
    semi_join,
    top_k_per_group,
)


@pytest.fixture
def facts(create_spark_df):
    return create_spark_df([
        'k bigint, v string',
        (1, 'a'), (2, 'b'), (3, 'c'), (None, 'n'),
    ])


@pytest.fixture
def dims(create_spark_df):
    return create_spark_df([
        'k bigint, label string',
        (1, 'one'), (2, 'two'), (None, 'null-dim'),
    ])


def test_broadcast_join(facts, dims):
    out = broadcast_join(facts, dims, on='k')
    rows = {(r['k'], r['v'], r['label']) for r in out.collect()}
    assert rows == {(1, 'a', 'one'), (2, 'b', 'two')}
    assert 'BroadcastHashJoin' in out._jdf.queryExecution().executedPlan() \
        .toString()


def test_null_safe_join(facts, dims):
    out = null_safe_join(facts, dims, on='k')
    rows = {(r['k'], r['v'], r['label']) for r in out.collect()}
    assert (None, 'n', 'null-dim') in rows
    assert len(rows) == 3


def test_semi_anti(facts, dims):
    assert semi_join(facts, dims, 'k').count() == 2
    anti = {r['v'] for r in anti_join(facts, dims, 'k').collect()}
    assert anti == {'c', 'n'}


def test_as_of_join_backward(create_spark_df):
    trades = create_spark_df([
        'sym string, t bigint, qty bigint',
        ('X', 5, 100), ('X', 12, 200), ('Y', 4, 50), ('X', 1, 1),
    ])
    quotes = create_spark_df([
        'sym string, t bigint, px double',
        ('X', 3, 10.0), ('X', 10, 11.0), ('Y', 9, 20.0),
    ])
    out = as_of_join(trades, quotes, on='sym', left_time='t')
    rows = {(r['sym'], r['t']): r['px'] for r in out.collect()}
    assert rows[('X', 5)] == 10.0
    assert rows[('X', 12)] == 11.0
    assert rows[('X', 1)] is None
    assert rows[('Y', 4)] is None


def test_as_of_join_forward(create_spark_df):
    left = create_spark_df(['g string, t bigint', ('a', 5)])
    right = create_spark_df([
        'g string, t bigint, v string', ('a', 4, 'old'), ('a', 7, 'new'),
    ])
    out = as_of_join(left, right, on='g', left_time='t',
                     direction='forward')
    assert out.collect()[0]['v'] == 'new'


def test_as_of_join_equal_time_matches(create_spark_df):
    left = create_spark_df(['g string, t bigint', ('a', 5)])
    right = create_spark_df(['g string, t bigint, v string', ('a', 5, 'eq')])
    out = as_of_join(left, right, on='g', left_time='t')
    assert out.collect()[0]['v'] == 'eq'


def test_top_k_per_group(create_spark_df):
    df = create_spark_df([
        'g string, v bigint',
        ('a', 1), ('a', 5), ('a', 3), ('b', 9), ('b', 2),
    ])
    out = top_k_per_group(df, groups='g', order_by='v', k=2)
    rows = {(r['g'], r['v']) for r in out.collect()}
    assert rows == {('a', 5), ('a', 3), ('b', 9), ('b', 2)}

    asc = top_k_per_group(df, groups='g', order_by='v', k=1,
                          ascending=True)
    assert {(r['g'], r['v']) for r in asc.collect()} == {('a', 1), ('b', 2)}
