"""Empty-input and degenerate-shape behavior of the main operators.

At pipeline scale, empty partitions and empty tables are routine
(a filter that matches nothing, a day with no events); every operator
must return an empty, correctly-shaped frame rather than raise.
"""
import pyspark.sql.functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


class TestEmptyInputs:
    def test_concat_empty_frames(self, spark_session):
        from ons_utils_spark import concat
        a = _empty(spark_session, 'x int, y string')
        b = _empty(spark_session, 'x bigint, z double')
        out = concat([a, b])
        assert out.count() == 0
        assert out.columns == ['x', 'y', 'z']
        assert dict(out.dtypes)['x'] == 'bigint'

    def test_concat_empty_with_nonempty(self, spark_session):
        from ons_utils_spark import concat
        a = _empty(spark_session, 'x int')
        b = spark_session.createDataFrame([(1,)], 'x int')
        assert concat([a, b]).count() == 1

    def test_exact_dedup_empty(self, spark_session):
        from ons_utils_spark import exact_dedup
        out = exact_dedup(
            _empty(spark_session, 'doc_id bigint, text string'))
        assert out.count() == 0
        assert out.columns == ['doc_id', 'text']

    def test_minhash_dedup_empty(self, spark_session):
        from ons_utils_spark import minhash_dedup
        out = minhash_dedup(
            _empty(spark_session, 'doc_id bigint, text string'))
        assert out.count() == 0

    def test_sessionize_empty(self, spark_session):
        from ons_utils_spark import sessionize
        out = sessionize(
            _empty(spark_session, 'user_id bigint, ts timestamp'),
            'user_id', 'ts')
        assert out.count() == 0
        assert 'session_id' in out.columns

    def test_as_of_join_empty_right(self, spark_session):
        import datetime as dt
        from ons_utils_spark import as_of_join
        left = spark_session.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 'a')],
            'k bigint, ts timestamp, lv string')
        right = _empty(spark_session,
                       'k bigint, ts timestamp, rv string')
        rows = as_of_join(left, right, on='k', left_time='ts').collect()
        assert len(rows) == 1 and rows[0]['rv'] is None

    def test_filter_by_percentile_range_empty(self, spark_session):
        from ons_utils_spark import filter_by_percentile_range
        out = filter_by_percentile_range(
            _empty(spark_session, 'v double'), 'v')
        assert out.count() == 0

    def test_cosine_topk_empty_corpus(self, spark_session):
        from ons_utils_spark import cosine_topk
        corpus = _empty(spark_session,
                        'vec_id bigint, embedding array<float>')
        queries = spark_session.createDataFrame(
            [(0, [1.0, 0.0])], 'query_id bigint, query_vec array<float>')
        assert cosine_topk(corpus, queries, k=5).count() == 0

    def test_chunk_and_stats_on_empty_table(self, spark_session):
        from ons_utils_spark import chunk_text, text_stats
        docs = _empty(spark_session, 'doc_id bigint, text string')
        assert docs.select(
            F.posexplode(chunk_text('text', 8))).count() == 0
        assert text_stats(docs, 'text').count() == 0


class TestRollingAnomaly:
    @staticmethod
    def _frame(spark):
        # steady series with one planted spike per user
        rows = []
        for u in (1, 2):
            for i in range(40):
                v = 10.0 + (i % 3) * 0.5
                if u == 1 and i == 30:
                    v = 500.0  # spike
                rows.append((u, i, v))
        return spark.createDataFrame(
            rows, 'user_id long, seq long, value double')

    def test_planted_spike_flagged(self, spark_session):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.timeseries import (
            rolling_anomaly_flags,
        )

        df = self._frame(spark_session)
        out = rolling_anomaly_flags(
            df, 'value', 'seq', by='user_id', window=25, z=2.0)
        flagged = {(r['user_id'], r['seq']) for r in
                   out.filter(F.col('is_anomaly')).collect()}
        assert (1, 30) in flagged
        assert not any(u == 2 for u, _ in flagged)
        # warm-up rows are unscored, not false
        nulls = out.filter(F.col('is_anomaly').isNull()).count()
        assert nulls == 2 * 24

    def test_integer_mode_matches_float(self, spark_session):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.timeseries import (
            rolling_anomaly_flags,
        )

        df = self._frame(spark_session)
        f = rolling_anomaly_flags(
            df, 'value', 'seq', by='user_id', window=25, z=2.0)
        i = rolling_anomaly_flags(
            df, 'value', 'seq', by='user_id', window=25, z=2.0,
            arithmetic='integer')
        ff = {(r['user_id'], r['seq']): r['is_anomaly']
              for r in f.collect()}
        ii = {(r['user_id'], r['seq']): r['is_anomaly']
              for r in i.collect()}
        assert ff == ii

    def test_integer_mode_needs_integral_z2(self, spark_session):
        import pytest as _pytest

        from ons_utils_spark.operators.timeseries import (
            rolling_anomaly_flags,
        )

        df = self._frame(spark_session)
        with _pytest.raises(ValueError, match='integral'):
            rolling_anomaly_flags(
                df, 'value', 'seq', by='user_id',
                arithmetic='integer', z=2.5)


def test_retention_cohorts_matrix(spark_session):
    from ons_utils_spark.operators.timeseries import retention_cohorts
    rows = [
        (1, '2024-01-01'), (1, '2024-01-02'),   # week 0, stays week 0
        (1, '2024-01-10'),                      # returns week 1
        (2, '2024-01-09'),                      # cohort week 1 only
        (3, '2024-01-01'), (3, '2024-01-22'),   # week 0 -> week 3
        (4, '2023-12-30'), (4, '2024-01-03'),   # pre-epoch dropped
        (5, '2023-12-31'),                      # ONLY pre-epoch: absent
    ]
    df = spark_session.createDataFrame(
        rows, 'user_id long, d string').selectExpr(
        'user_id', 'CAST(d AS TIMESTAMP) AS ts')
    got = {(r['cohort'], r['week_offset']): r['n_users']
           for r in retention_cohorts(df).collect()}
    # User 5 must not appear at all: their only event is pre-epoch,
    # and floor-bucketing maps it to bucket -1 (dropped), not 0.
    assert got == {
        (0, 0): 3,   # users 1, 3, 4 (4's pre-epoch event dropped)
        (0, 1): 1,   # user 1 returns
        (0, 3): 1,   # user 3 returns
        (1, 0): 1,   # user 2
    }
