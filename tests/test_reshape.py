"""Tests for distributed reshape (Spark-native Stacker)."""
import pytest

from ons_utils_spark.operators.reshape import SparkStacker, stack, unstack


@pytest.fixture
def tidy(create_spark_df):
    return create_spark_df([
        'retailer string, product string, price double',
        ('r1', 'p1', 1.0), ('r1', 'p2', 2.0),
        ('r2', 'p1', 3.0), ('r2', 'p2', 4.0),
    ])


def test_unstack_pivots(tidy):
    wide = unstack(tidy, index_cols='product', value_col='price')
    assert set(wide.columns) == {'retailer', 'p1', 'p2'}
    rows = {r['retailer']: (r['p1'], r['p2']) for r in wide.collect()}
    assert rows['r1'] == (1.0, 2.0)


def test_unstack_explicit_values_deterministic_schema(tidy):
    wide = unstack(
        tidy, index_cols='product', value_col='price',
        pivot_values=['p1', 'p2', 'p3'],
    )
    assert wide.columns == ['retailer', 'p1', 'p2', 'p3']
    assert wide.filter("retailer = 'r1'").collect()[0]['p3'] is None


def test_stack_melts(tidy):
    wide = unstack(tidy, index_cols='product', value_col='price')
    back = stack(wide, key_cols='retailer', index_col='product',
                 value_col='price')
    assert set(back.columns) == {'retailer', 'product', 'price'}
    assert back.count() == 4


def test_spark_stacker_roundtrip(tidy):
    st = SparkStacker(value_col='price', index_cols=['product'])
    wide = st.unstack(tidy)
    back = st.stack(wide)
    assert back.columns == ['retailer', 'product', 'price']
    got = {(r['retailer'], r['product']): r['price']
           for r in back.collect()}
    assert got == {('r1', 'p1'): 1.0, ('r1', 'p2'): 2.0,
                   ('r2', 'p1'): 3.0, ('r2', 'p2'): 4.0}


def test_spark_stacker_multi_index_cols(create_spark_df):
    df = create_spark_df([
        'shop string, cat string, sub string, v double',
        ('s1', 'a', 'x', 1.0), ('s1', 'a', 'y', 2.0),
        ('s1', 'b', 'x', 3.0),
    ])
    st = SparkStacker(value_col='v', index_cols=['cat', 'sub'])
    wide = st.unstack(df)
    assert 'a|x' in wide.columns
    back = st.stack(wide)
    got = {(r['shop'], r['cat'], r['sub']): r['v']
           for r in back.collect()}
    assert got[('s1', 'a', 'y')] == 2.0
    assert len(got) == 3  # absent combo (b,y) dropped, not NULL-filled


def test_stacker_stack_before_unstack_raises(tidy):
    with pytest.raises(ValueError):
        SparkStacker('price', ['product']).stack(tidy)
