"""Tests for grouped_apply (applyInPandas plumbing + key re-attachment)."""
import pandas as pd
import pytest

from ons_utils_spark import grouped_apply


@pytest.fixture
def sales(create_spark_df):
    return create_spark_df([
        'shop string, item string, amount double',
        ('A', 'x', 1.0), ('A', 'y', 3.0),
        ('B', 'x', 10.0), ('B', 'y', 30.0), ('B', 'z', 20.0),
    ])


def test_key_reattached_when_func_drops_keys(sales):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # Deliberately drop the group key.
        return pd.DataFrame({
            'item': pdf['item'],
            'centered': pdf['amount'] - pdf['amount'].mean(),
        })

    out = grouped_apply(
        sales, demean,
        schema='shop string, item string, centered double',
        groups='shop',
    )
    rows = {(r['shop'], r['item']): r['centered'] for r in out.collect()}
    assert rows[('A', 'x')] == -1.0
    assert rows[('A', 'y')] == 1.0
    assert rows[('B', 'z')] == 0.0
    assert out.columns == ['shop', 'item', 'centered']


def test_args_kwargs_passed(sales):
    def scale(pdf, factor, offset=0.0):
        return pd.DataFrame({
            'item': pdf['item'],
            'scaled': pdf['amount'] * factor + offset,
        })

    out = grouped_apply(
        sales, scale,
        schema='shop string, item string, scaled double',
        groups='shop',
        args=[2.0], kwargs={'offset': 1.0},
    )
    rows = {(r['shop'], r['item']): r['scaled'] for r in out.collect()}
    assert rows[('A', 'x')] == 3.0


def test_keep_index(sales):
    def agg(pdf):
        return pdf.groupby('item')[['amount']].sum()

    out = grouped_apply(
        sales, agg,
        schema='shop string, item string, amount double',
        groups='shop',
        keep_index=True,
    )
    rows = {(r['shop'], r['item']): r['amount'] for r in out.collect()}
    assert rows[('B', 'x')] == 10.0
    assert len(rows) == 5


def test_multi_group_keys(sales):
    def count(pdf):
        return pd.DataFrame({'n': [len(pdf)]})

    out = grouped_apply(
        sales, count,
        schema='shop string, item string, n bigint',
        groups=['shop', 'item'],
    )
    assert out.count() == 5
    assert {r['n'] for r in out.collect()} == {1}
