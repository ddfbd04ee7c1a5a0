"""Tests for skew helpers (salted aggregation / join)."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
    with_salt,
)


@pytest.fixture
def skewed(spark_session):
    # one hot key (90%) + tail
    rows = [('hot', float(i)) for i in range(90)] + [
        (f'k{i}', float(i)) for i in range(10)
    ]
    return spark_session.createDataFrame(rows, 'k string, v double')


def test_with_salt_bounds(skewed):
    out = with_salt(skewed, buckets=4)
    salts = {r['__salt'] for r in out.collect()}
    assert salts <= {0, 1, 2, 3}
    assert len(salts) > 1  # actually spreads


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r['k']): (r['s'], r['n'])
        for r in skewed.groupBy('k').agg(
            F.sum('v').alias('s'), F.count('*').alias('n')
        ).collect()
    }
    salted = {
        (r['k']): (r['s'], r['n'])
        for r in salted_agg(
            skewed, 'k',
            aggs=[F.sum('v').alias('ps'), F.count('*').alias('pn')],
            final_aggs=[F.sum('ps').alias('s'), F.sum('pn').alias('n')],
            buckets=4,
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_join_matches_plain(skewed, spark_session):
    dims = spark_session.createDataFrame(
        [('hot', 'HOT'), ('k1', 'K1')], 'k string, label string'
    )
    plain = skewed.join(dims, 'k').count()
    salted = salted_broadcast_join(skewed, dims, on='k', buckets=4)
    assert salted.count() == plain
    assert set(salted.columns) == {'k', 'v', 'label'}
    labels = {r['label'] for r in salted.collect()}
    assert labels == {'HOT', 'K1'}


class TestKeySkewReport:
    def test_hand_computed(self, spark_session):
        from ons_utils_spark.operators.skew import key_skew_report
        rows = [('hot',)] * 6 + [('warm',)] * 3 + [('cold',)] * 1
        df = spark_session.createDataFrame(rows, 'k string')
        out = key_skew_report(df, 'k', top_k=2).collect()
        assert [(r['rank'], r['k'], r['n_rows']) for r in out] \
            == [(1, 'hot', 6), (2, 'warm', 3)]
        assert out[0]['row_share'] == pytest.approx(0.6)
        assert out[0]['vs_uniform'] == pytest.approx(1.8)  # 6*3/10

    def test_tiebreak_on_key(self, spark_session):
        from ons_utils_spark.operators.skew import key_skew_report
        df = spark_session.createDataFrame(
            [('b',), ('a',)], 'k string')
        out = key_skew_report(df, 'k', top_k=2).collect()
        assert [r['k'] for r in out] == ['a', 'b']  # equal counts

    def test_no_global_window_over_counts(self, spark_session):
        """The plan must take the top-k via a limit (TakeOrdered),
        not sort every distinct key through one window partition."""
        from ons_utils_spark.operators.skew import key_skew_report
        df = spark_session.range(1000).selectExpr('id % 97 AS k')
        plan = key_skew_report(df, 'k')._jdf.queryExecution() \
            .explainString(
                spark_session._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString('formatted'))
        assert 'TakeOrderedAndProject' in plan or 'GlobalLimit' in plan
