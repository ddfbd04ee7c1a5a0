"""Tests for the schema-harmonizing concat operator.

The case matrix mirrors the reference's spec
(tests/pyspark/test_concat.py — cheese/dogs/stores/units fixtures,
FIXTURES.md §1.1-1.6) so semantics parity is checked line-for-line.
"""
import pytest

from ons_utils_spark import UnequalSchemaWarning, concat, promote_dtypes
from ons_utils_spark.testing import assert_df_equality

from tests.conftest import Case, parametrize_cases


@pytest.fixture
def french(create_spark_df):
    return create_spark_df([
        ('name string, crumbliness bigint, maturity bigint,'
         ' tang bigint, creaminess bigint'),
        ('brie', 0, 2, 1, 4),
        ('camembert', 0, 2, 2, 4),
        ('roquefort', 3, 4, 5, 2),
    ])


@pytest.fixture
def greek(create_spark_df):
    return create_spark_df([
        ('name string, crumbliness bigint, maturity bigint,'
         ' tang bigint, creaminess bigint'),
        ('feta', 5, 1, 2, 1),
        ('halloumi', 1, 1, 1, 1),
    ])


@pytest.fixture
def british(create_spark_df):
    return create_spark_df([
        ('name string, crumbliness bigint, maturity bigint,'
         ' tang bigint, creaminess bigint'),
        ('cheddar', 3, 4, 4, 2),
        ('caerphilly', 3, 3, 2, 2),
    ])


@pytest.fixture
def italian(create_spark_df):
    return create_spark_df([
        'name string, creaminess bigint, saltiness bigint',
        ('buffalo mozzarella', 4, 3),
        ('ricotta', 5, 1),
    ])


class TestConcatBasic:
    def test_plain_union(self, french, greek, create_spark_df):
        result = concat([french, greek])
        expected = create_spark_df([
            ('name string, crumbliness bigint, maturity bigint,'
             ' tang bigint, creaminess bigint'),
            ('brie', 0, 2, 1, 4),
            ('camembert', 0, 2, 2, 4),
            ('roquefort', 3, 4, 5, 2),
            ('feta', 5, 1, 2, 1),
            ('halloumi', 1, 1, 1, 1),
        ])
        assert_df_equality(result, expected)

    def test_list_with_keys_and_name(self, french, greek, create_spark_df):
        result = concat([french, greek], keys=['french', 'greek'],
                        names='country')
        expected = create_spark_df([
            ('country string, name string, crumbliness bigint,'
             ' maturity bigint, tang bigint, creaminess bigint'),
            ('french', 'brie', 0, 2, 1, 4),
            ('french', 'camembert', 0, 2, 2, 4),
            ('french', 'roquefort', 3, 4, 5, 2),
            ('greek', 'feta', 5, 1, 2, 1),
            ('greek', 'halloumi', 1, 1, 1, 1),
        ])
        assert_df_equality(result, expected)

    def test_mapping_input(self, french, greek, create_spark_df):
        result = concat({'french': french, 'greek': greek}, names='country')
        assert result.columns[0] == 'country'
        assert result.count() == 5

    def test_mapping_with_keys_subsets_and_orders(self, french, greek):
        result = concat(
            {'greek': greek, 'french': french},
            keys=['french'],
            names='country',
        )
        assert result.count() == 3

    def test_tuple_keys(self, french, greek, create_spark_df):
        result = concat(
            [french, greek],
            keys=[('french', 'yes'), ('greek', 'no')],
            names=['country', 'tasted'],
        )
        assert result.columns[:2] == ['country', 'tasted']
        rows = {
            (r['country'], r['tasted']) for r in result.collect()
        }
        assert rows == {('french', 'yes'), ('greek', 'no')}

    def test_mixed_schema_null_fill(self, british, italian):
        # Missing columns alone (no dtype conflict) must NOT warn —
        # matches reference _compare_schemas (concat.py:273-290).
        import warnings as _warnings
        with _warnings.catch_warnings():
            _warnings.simplefilter('error', UnequalSchemaWarning)
            result = concat(
                {'british': british, 'italian': italian}, names='country'
            )
        assert result.columns == [
            'country', 'name', 'crumbliness', 'maturity', 'tang',
            'creaminess', 'saltiness',
        ]
        it = {
            r['name']: r for r in result.filter("country = 'italian'")
            .collect()
        }
        assert it['ricotta']['saltiness'] == 1
        assert it['ricotta']['crumbliness'] is None
        br = {
            r['name']: r for r in result.filter("country = 'british'")
            .collect()
        }
        assert br['cheddar']['saltiness'] is None
        assert br['cheddar']['crumbliness'] == 3


class TestConcatTypeCoercion:
    def test_int_float_widening(self, create_spark_df):
        df1 = create_spark_df([
            'breed string, weight bigint',
            ('schnauzer', 7), ('bull mastiff', 12), ('chihuahua', 2),
        ])
        df2 = create_spark_df([
            'breed string, weight double',
            ('jack russell', 3.2), ('puli', 13.4), ('doberman', 14.8),
        ])
        with pytest.warns(UnequalSchemaWarning):
            result = concat([df1, df2])
        assert dict(result.dtypes)['weight'] == 'double'
        assert result.count() == 6

    def test_string_coercion_rule(self, create_spark_df):
        df1 = create_spark_df([
            'store_type string, branch string',
            ('1', 'outlet'), ('2', 'high street'),
        ])
        df2 = create_spark_df([
            'store_type bigint, branch string',
            (3, 'outlet'), (4, 'high street'),
        ])
        df3 = create_spark_df([
            'store_type bigint, branch double',
            (5, 3.2),
        ])
        with pytest.warns(UnequalSchemaWarning):
            result = concat([df1, df2, df3])
        assert dict(result.dtypes) == {
            'store_type': 'string', 'branch': 'string',
        }
        branches = {r['branch'] for r in result.collect()}
        assert '3.2' in branches

    def test_missing_col_mixed_coercion(self, create_spark_df):
        df1 = create_spark_df([
            'unit string, speed bigint, attack string',
            ('camel_rider', 11, '9'), ('knight', 13, '12'),
        ])
        df2 = create_spark_df([
            'unit string, attack bigint',
            ('villager', 1), ('archer', 5),
        ])
        df3 = create_spark_df([
            'unit string, speed double',
            ('monk', 2.2), ('ballista', 2.4),
        ])
        with pytest.warns(UnequalSchemaWarning):
            result = concat([df1, df2, df3])
        assert dict(result.dtypes) == {
            'unit': 'string', 'speed': 'double', 'attack': 'string',
        }
        rows = {r['unit']: r for r in result.collect()}
        assert rows['villager']['speed'] is None
        assert rows['monk']['attack'] is None
        assert rows['camel_rider']['speed'] == 11.0

    def test_non_coercible_raises(self, create_spark_df):
        from ons_utils_spark.testing import to_date
        df1 = create_spark_df([
            'date date, speed bigint', (to_date('2020-01-01'), 11),
        ])
        df2 = create_spark_df(['date boolean, speed bigint', (True, 1)])
        with pytest.raises(TypeError), pytest.warns(UnequalSchemaWarning):
            concat([df1, df2])


class TestConcatValidation:
    def test_single_df_raises(self, french):
        with pytest.raises(TypeError):
            concat(french)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            concat([])

    def test_keys_length_mismatch_raises(self, french, greek):
        with pytest.raises(ValueError):
            concat([french, greek], keys=['only-one'], names='country')

    def test_mapping_without_names_raises(self, french):
        with pytest.raises(ValueError):
            concat({'french': french})

    def test_key_arity_vs_names_raises(self, french, greek):
        with pytest.raises(ValueError):
            concat(
                [french, greek],
                keys=[('a', 'b'), ('c', 'd')],
                names='country',
            )

    def test_unequal_key_arity_raises(self, french, greek):
        with pytest.raises(ValueError):
            concat(
                [french, greek],
                keys=[('a', 'b'), 'c'],
                names=['country', 'tasted'],
            )

    def test_non_df_element_raises(self, french):
        with pytest.raises(TypeError):
            concat([french, 'not a dataframe'])


class TestPromoteDtypes:
    @parametrize_cases(
        Case('tinyints_and_int', dtypes=['tinyint', 'tinyint', 'int'],
             expected='int'),
        Case('bigint_wins', dtypes=['bigint', 'tinyint', 'int'],
             expected='bigint'),
        Case('float_beats_ints', dtypes=['int', 'bigint', 'int', 'float'],
             expected='float'),
        Case('double_wins', dtypes=['double', 'bigint', 'int', 'float'],
             expected='double'),
        Case('string_wins', dtypes=['string', 'bigint'], expected='string'),
        Case('missing_is_ok', dtypes=[None, 'int'], expected='int'),
    )
    def test_common(self, dtypes, expected):
        assert promote_dtypes(dtypes) == expected
        if None not in dtypes and 'string' not in dtypes:
            assert promote_dtypes(dtypes, mode='reference') == expected

    def test_decimal_reference_quirk(self):
        # Reference lattice: decimal(10,0) outranks double.
        assert promote_dtypes(
            ['double', 'double', 'decimal(10,0)'], mode='reference'
        ) == 'decimal(10,0)'

    def test_decimal_spark_mode(self):
        # Spark semantics: decimal meets double -> double.
        assert promote_dtypes(['double', 'double', 'decimal(10,0)']) \
            == 'double'
        assert promote_dtypes(['decimal(10,0)', 'int']) == 'decimal(10,0)'
        assert promote_dtypes(['decimal(10,2)', 'bigint']) \
            == 'decimal(22,2)'
        assert promote_dtypes(['decimal(10,2)', 'decimal(5,4)']) \
            == 'decimal(12,4)'

    def test_non_coercible_raises(self):
        with pytest.raises(TypeError):
            promote_dtypes(['timestamp', 'boolean'])

    def test_identical_non_numeric_ok(self):
        assert promote_dtypes(['timestamp', 'timestamp']) == 'timestamp'
        assert promote_dtypes(['array<float>', 'array<float>']) \
            == 'array<float>'
