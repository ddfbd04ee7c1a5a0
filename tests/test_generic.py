"""Tests for pure-Python utilities (generic, factories, decorators)."""
import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

from ons_utils_spark import (
    args_kwargs_transformer_factory,
    fill_tuple_keys,
    fill_tuples,
    flatten_dict,
    get_key_value_pairs,
    invert_nested_keys,
    is_non_string_sequence,
    list_convert,
    to_spark_col,
    tuple_convert,
    unflatten_dict,
)

from tests.conftest import Case, parametrize_cases


class TestFlatten:
    def test_roundtrip(self):
        d = {'a': {'b': 1, 'c': {'d': 2}}, 'e': 3}
        flat = flatten_dict(d)
        assert flat == {('a', 'b'): 1, ('a', 'c', 'd'): 2, ('e',): 3}
        assert unflatten_dict(flat) == d

    def test_invert_nested_keys(self):
        d = {'a': {'b': 1}, 'c': {'d': {'e': 2}}}
        assert invert_nested_keys(d) == {'b': {'a': 1}, 'e': {'d': {'c': 2}}}


class TestKeyValuePairs:
    def test_simple(self):
        assert set(get_key_value_pairs({'a': 1, 'b': 2})) == {
            ('a', 1), ('b', 2),
        }

    def test_sequence_values_product(self):
        pairs = set(get_key_value_pairs({'a': [1, 2], ('b', 'c'): 3}))
        assert pairs == {('a', 1), ('a', 2), ('b', 3), ('c', 3)}


class TestFillTuples:
    @parametrize_cases(
        Case('bfill_none', tuples=[('a', 'b'), 'c'], kwargs={},
             expected=[('a', 'b'), (None, 'c')]),
        Case('ffill_none', tuples=[('a', 'b'), 'c'],
             kwargs={'fill_method': 'ffill'},
             expected=[('a', 'b'), ('c', None)]),
        Case('bfill_repeat', tuples=[('a', 'b'), 'c'],
             kwargs={'repeat': True}, expected=[('a', 'b'), ('c', 'c')]),
        Case('fixed_length', tuples=['a'], kwargs={'length': 3},
             expected=[(None, None, 'a')]),
        Case('no_seqs_passthrough', tuples=['a', 'b'], kwargs={},
             expected=['a', 'b']),
    )
    def test_fill_tuples(self, tuples, kwargs, expected):
        assert fill_tuples(tuples, **kwargs) == expected

    def test_fill_tuple_keys(self):
        d = {('a', 'b'): 1, 'c': 2}
        assert fill_tuple_keys(d) == {('a', 'b'): 1, (None, 'c'): 2}


class TestConverters:
    def test_tuple_convert(self):
        assert tuple_convert('abc') == ('abc',)
        assert tuple_convert([1, 2]) == (1, 2)
        assert tuple_convert(5) == (5,)

    def test_list_convert(self):
        assert list_convert('abc') == ['abc']
        assert list_convert((1, 2)) == [1, 2]
        assert list_convert(5) == [5]

    def test_is_non_string_sequence(self):
        assert is_non_string_sequence([1])
        assert is_non_string_sequence((1,))
        assert not is_non_string_sequence('ab')
        assert not is_non_string_sequence({1})


class TestFactories:
    def test_transform_all(self):
        deco = args_kwargs_transformer_factory(lambda x: x * 2)

        @deco
        def add(a, b):
            return a + b

        assert add(1, 2) == 6

    def test_include(self):
        deco = args_kwargs_transformer_factory(lambda x: x * 2)

        @deco(include='a')
        def add(a, b):
            return a + b

        assert add(1, b=2) == 4

    def test_exclude(self):
        deco = args_kwargs_transformer_factory(lambda x: x * 2)

        @deco(exclude='a')
        def add(a, b):
            return a + b

        assert add(1, b=2) == 5

    def test_include_and_exclude_raises(self):
        deco = args_kwargs_transformer_factory(lambda x: x * 2)
        with pytest.raises(ValueError):
            deco(include='a', exclude='b')

    def test_none_kwargs_not_transformed(self):
        # Reference bug (factories.py:132): None kwargs were transformed.
        deco = args_kwargs_transformer_factory(lambda x: x * 2)

        @deco
        def f(a, b=None):
            return (a, b)

        assert f(1, b=None) == (2, None)

    def test_to_spark_col_decorator(self):
        @to_spark_col
        def ident(col):
            return col

        assert isinstance(ident('name'), Column)
        c = F.col('x')
        assert ident(c) is c
