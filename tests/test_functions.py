"""Tests for column/array/window/schema helpers.

Golden values mirror the reference's own fixtures
(tests/pyspark/test_general.py — FIXTURES.md §1.7-1.9).
"""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark import (
    bfill,
    convert_to_spark_col,
    cosine_similarity,
    diff,
    dot_product,
    ffill,
    get_ddl_schema,
    get_fields,
    get_first_group,
    get_window_spec,
    lookup_join,
    map_col,
    map_column_names,
    to_list,
    with_global_agg,
)


@pytest.fixture
def group_val(create_spark_df):
    return create_spark_df([
        'group string, val bigint',
        ('A', 5), ('A', 2), ('B', 1), ('B', 9), ('B', 6),
    ])


class TestWindows:
    def test_grouped_window_sum(self, group_val):
        result = group_val.withColumn(
            'total', F.sum('val').over(get_window_spec('group'))
        )
        rows = {(r['group'], r['val'], r['total'])
                for r in result.collect()}
        assert rows == {
            ('A', 5, 7), ('A', 2, 7), ('B', 1, 16), ('B', 9, 16),
            ('B', 6, 16),
        }

    def test_global_window_sum(self, group_val):
        result = group_val.withColumn(
            'total', F.sum('val').over(get_window_spec())
        )
        assert {r['total'] for r in result.collect()} == {23}

    def test_with_global_agg(self, group_val):
        result = with_global_agg(group_val, F.sum('val'), 'total')
        assert {r['total'] for r in result.collect()} == {23}

    def test_ffill_bfill(self, create_spark_df):
        df = create_spark_df([
            'g string, t bigint, v double',
            ('a', 1, 1.0), ('a', 2, None), ('a', 3, 3.0), ('a', 4, None),
            ('b', 1, None), ('b', 2, 5.0),
        ])
        out = df.select(
            'g', 't',
            ffill('v', order_by='t', groups='g').alias('f'),
            bfill('v', order_by='t', groups='g').alias('b'),
        )
        rows = {(r['g'], r['t']): (r['f'], r['b']) for r in out.collect()}
        assert rows[('a', 2)] == (1.0, 3.0)
        assert rows[('a', 4)] == (3.0, None)
        assert rows[('b', 1)] == (None, 5.0)


class TestMapCol:
    def test_scalar_mapping(self, create_spark_df):
        df = create_spark_df(['position bigint', (1,), (2,), (3,), (4,)])
        result = df.withColumn(
            'ranking', map_col('position', {1: 'first', 2: 'second',
                                            3: 'third'})
        )
        rows = dict(
            (r['position'], r['ranking']) for r in result.collect()
        )
        assert rows == {1: 'first', 2: 'second', 3: 'third', 4: None}

    def test_list_values_make_arrays(self, create_spark_df):
        df = create_spark_df(['animal string', ('tiger',), ('lion',)])
        result = df.withColumn(
            'attribute',
            map_col('animal', {'tiger': ['stripes', 'fast'],
                               'lion': ['mane', 'lazy']}),
        )
        assert dict(result.dtypes)['attribute'] == 'array<string>'
        rows = dict((r['animal'], r['attribute']) for r in result.collect())
        assert rows['tiger'] == ['stripes', 'fast']

    def test_lookup_join(self, create_spark_df):
        df = create_spark_df(['position bigint', (1,), (2,), (4,)])
        result = lookup_join(
            df, 'position', {1: 'first', 2: 'second'}, 'ranking'
        )
        rows = dict((r['position'], r['ranking']) for r in result.collect())
        assert rows == {1: 'first', 2: 'second', 4: None}


class TestSchemaHelpers:
    def test_map_column_names(self, create_spark_df):
        df = create_spark_df([
            'col_A string, col_B string, col_Y string, col_D string,'
            ' col_Z string',
            ('aaa', 'bbb', 'ccc', 'ddd', 'eee'),
        ])
        result = map_column_names(
            df, {'col_Y': 'col_C', 'col_Z': 'col_E'}
        )
        assert result.columns == [
            'col_A', 'col_B', 'col_C', 'col_D', 'col_E',
        ]

    def test_get_fields(self, group_val):
        assert get_fields(group_val) == [
            ('group', 'string'), ('val', 'bigint'),
        ]
        assert get_fields(group_val, ['val']) == [('val', 'bigint')]

    def test_get_ddl_schema(self):
        ddl = get_ddl_schema([('a', 'string'), ('b', 'bigint')])
        assert ddl == 'a string,\nb bigint'

    def test_to_list_single_column(self, group_val):
        assert sorted(to_list(group_val.select('val'))) == [1, 2, 5, 6, 9]

    def test_to_list_multi_column(self, group_val):
        rows = to_list(group_val)
        assert ['A', 5] in rows and len(rows) == 5

    def test_get_first_group(self, group_val):
        result = get_first_group(
            group_val.orderBy('group', 'val'), 'group'
        )
        vals = {r['group'] for r in result.collect()}
        assert len(vals) == 1

    def test_convert_to_spark_col(self):
        from pyspark.sql import Column
        assert isinstance(convert_to_spark_col('x'), Column)
        c = F.col('y')
        assert convert_to_spark_col(c) is c
        with pytest.raises(ValueError):
            convert_to_spark_col(42)


class TestArrays:
    def test_diff_matches_np(self, spark_session):
        import numpy as np
        data = [([1.0, 3.0, 6.0, 10.0],), ([2.5],), ([],), (None,)]
        df = spark_session.createDataFrame(data, 'a array<float>')
        out = df.select(diff('a').alias('d')).collect()
        assert out[0]['d'] == pytest.approx(
            np.diff([1.0, 3.0, 6.0, 10.0]).tolist()
        )
        assert out[1]['d'] == []
        assert out[2]['d'] == []
        assert out[3]['d'] is None

    def test_dot_and_cosine(self, spark_session):
        df = spark_session.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
            'a array<double>, b array<double>',
        )
        rows = df.select(
            dot_product('a', 'b').alias('dot'),
            cosine_similarity('a', 'b').alias('cos'),
        ).collect()
        assert rows[0]['dot'] == 1.0 and rows[0]['cos'] == pytest.approx(1.0)
        assert rows[1]['dot'] == 0.0 and rows[1]['cos'] == pytest.approx(0.0)

    def test_diff_property_on_embeddings(self, spark_session):
        """Property check vs np.diff on the driver testdata."""
        import numpy as np
        emb = spark_session.read.parquet(
            '/root/testdata/sf0.001/embeddings.parquet'
        ).limit(20)
        got = emb.select('vec_id', diff('embedding').alias('d')).collect()
        raw = {r['vec_id']: r['embedding'] for r in emb.collect()}
        for r in got:
            expected = np.diff(np.array(raw[r['vec_id']],
                                        dtype=np.float32))
            assert np.allclose(r['d'], expected, rtol=1e-6)


class TestSessionize:
    def test_gap_splits_sessions(self, spark_session):
        import datetime as dt
        from ons_utils_spark.functions.windows import sessionize
        base = dt.datetime(2024, 1, 1, 10, 0)

        def t(minutes):
            return base + dt.timedelta(minutes=minutes)

        rows = [
            (1, t(0), 100), (1, t(10), 101),   # session 0
            (1, t(60), 102),                   # gap 50min > 30 → s1
            (2, t(0), 200),                    # other user → own s0
        ]
        df = spark_session.createDataFrame(
            rows, 'user_id bigint, ts timestamp, event_id bigint')
        out = sessionize(df, 'user_id', 'ts', gap_seconds=1800,
                         order_cols=['event_id'])
        got = {(r['user_id'], r['event_id']): r['session_id']
               for r in out.collect()}
        assert got == {(1, 100): 0, (1, 101): 0, (1, 102): 1,
                       (2, 200): 0}

    def test_exact_gap_stays_same_session(self, spark_session):
        import datetime as dt
        from ons_utils_spark.functions.windows import sessionize
        base = dt.datetime(2024, 1, 1)
        df = spark_session.createDataFrame(
            [(1, base, 1),
             (1, base + dt.timedelta(seconds=1800), 2),
             (1, base + dt.timedelta(seconds=3601), 3)],
            'user_id bigint, ts timestamp, event_id bigint')
        out = sessionize(df, 'user_id', 'ts', gap_seconds=1800)
        got = {r['event_id']: r['session_id'] for r in out.collect()}
        # gap == 1800 is NOT greater → same session; 1801 → new
        assert got == {1: 0, 2: 0, 3: 1}


class TestFlattenStruct:
    def test_flattens_nested_structs(self, spark_session):
        from ons_utils_spark.functions.schema import flatten_struct
        from pyspark.sql import functions as F
        df = spark_session.createDataFrame(
            [(1, '{"a": {"b": 2, "c": "x"}, "d": 3}')],
            'id bigint, js string'
        ).select('id', F.from_json(
            'js', 'struct<a: struct<b: bigint, c: string>, d: bigint>'
        ).alias('payload'))
        flat = flatten_struct(df)
        assert flat.columns == [
            'id', 'payload_a_b', 'payload_a_c', 'payload_d']
        row = flat.collect()[0]
        assert (row['payload_a_b'], row['payload_a_c'],
                row['payload_d']) == (2, 'x', 3)

    def test_arrays_pass_through(self, spark_session):
        from ons_utils_spark.functions.schema import flatten_struct
        df = spark_session.createDataFrame(
            [(1, [1, 2, 3])], 'id bigint, xs array<bigint>')
        flat = flatten_struct(df)
        assert flat.columns == ['id', 'xs']
        assert flat.collect()[0]['xs'] == [1, 2, 3]

    def test_collision_raises(self, spark_session):
        from ons_utils_spark.functions.schema import flatten_struct
        from pyspark.sql import functions as F
        df = spark_session.createDataFrame(
            [(1, 2)], 'a_b bigint, x bigint'
        ).select('a_b', F.struct(F.col('x').alias('b')).alias('a'))
        import pytest as _pytest
        with _pytest.raises(ValueError, match='collision'):
            flatten_struct(df)

    def test_no_shuffle_pure_projection(self, spark_session):
        from ons_utils_spark.functions.schema import flatten_struct
        from pyspark.sql import functions as F
        df = spark_session.range(10).select(
            F.struct(F.col('id').alias('v')).alias('s'))
        plan = flatten_struct(df)._jdf.queryExecution().explainString(
            spark_session._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString('formatted'))
        assert 'Exchange' not in plan


class TestVectorMath:
    def test_dot_norm_cosine(self, spark_session):
        from ons_utils_spark.functions.vectors import cosine, dot, norm
        from pyspark.sql import functions as F
        df = spark_session.createDataFrame(
            [([3.0, 4.0], [4.0, 3.0])],
            'a array<double>, b array<double>')
        row = df.select(
            dot('a', 'b').alias('d'),
            norm('a').alias('n'),
            cosine('a', 'b').alias('c')).collect()[0]
        assert row['d'] == 24.0
        assert row['n'] == 5.0
        assert row['c'] == pytest.approx(24 / 25)

    def test_cosine_zero_vector_null(self, spark_session):
        from ons_utils_spark.functions.vectors import cosine
        df = spark_session.createDataFrame(
            [([0.0, 0.0], [1.0, 0.0])],
            'a array<double>, b array<double>')
        assert df.select(cosine('a', 'b').alias('c')) \
            .collect()[0]['c'] is None

    def test_float_input_promoted(self, spark_session):
        """array<float> inputs compute in double (no drift)."""
        from ons_utils_spark.functions.vectors import norm
        df = spark_session.createDataFrame(
            [([0.1, 0.2, 0.3],)], 'a array<float>')
        got = df.select(norm('a').alias('n')).collect()[0]['n']
        import math
        want = math.sqrt(sum(x * x for x in
                             [0.1, 0.2, 0.3]))
        # float storage rounds the inputs, but the SUM runs in double
        assert got == pytest.approx(want, rel=1e-6)

    def test_l2_normalize(self, spark_session):
        from ons_utils_spark.functions.vectors import (
            norm, with_l2_normalized,
        )
        df = spark_session.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
            'id bigint, v array<double>')
        out = {r['id']: r for r in with_l2_normalized(
            df, 'v', 'unit').collect()}
        assert out[1]['unit'] == [0.6, 0.8]
        assert out[2]['unit'] is None
        n = spark_session.createDataFrame(
            [(out[1]['unit'],)], 'u array<double>'
        ).select(norm('u').alias('n')).collect()[0]['n']
        assert n == pytest.approx(1.0)


class TestProfileColumns:
    def test_profile_values(self, spark_session):
        from ons_utils_spark.functions.schema import profile_columns
        df = spark_session.createDataFrame(
            [(1, 'a'), (2, 'a'), (3, None)], 'id bigint, s string')
        out = {r['column']: r for r in profile_columns(df).collect()}
        assert out['id']['n_rows'] == 3
        assert out['id']['n_nulls'] == 0
        assert out['id']['n_distinct'] == 3
        assert (out['id']['min_str'], out['id']['max_str']) == ('1', '3')
        assert out['s']['n_nulls'] == 1
        assert out['s']['n_distinct'] == 1
        assert out['s']['max_str'] == 'a'

    def test_column_selection(self, spark_session):
        from ons_utils_spark.functions.schema import profile_columns
        df = spark_session.createDataFrame(
            [(1, 'a')], 'id bigint, s string')
        got = [r['column'] for r in profile_columns(
            df, ['s']).collect()]
        assert got == ['s']
