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
