"""DSIR hashed-n-gram importance weights + CCNet perplexity buckets."""
import math

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.dsir import (
    bucket_counts,
    dsir_log_weights,
    hashed_ngram_buckets,
)
from ons_utils_spark.operators.lm import perplexity_buckets


class TestHashedNgramBuckets:
    def test_unigrams_plus_bigrams_with_multiplicity(
            self, spark_session):
        df = spark_session.createDataFrame(
            [('a b a',)], 'text string')
        out = df.select(
            hashed_ngram_buckets('text', 1000).alias('b')).first()
        # 3 unigrams + 2 bigrams = 5 features, duplicates kept
        assert len(out['b']) == 5
        assert all(0 <= v < 1000 for v in out['b'])

    def test_hash_is_md5_portable(self, spark_session):
        import hashlib
        df = spark_session.createDataFrame([('hello',)],
                                           'text string')
        got = df.select(
            hashed_ngram_buckets('text', 10_000).alias('b')
        ).first()['b']
        want = int(hashlib.md5(b'hello').hexdigest()[:8], 16) % 10_000
        assert got == [want]

    def test_empty_text_no_features(self, spark_session):
        df = spark_session.createDataFrame([('',), ('   ',)],
                                           'text string')
        rows = df.select(
            hashed_ngram_buckets('text', 10).alias('b')).collect()
        assert [r['b'] for r in rows] == [[], []]


class TestDsirLogWeights:
    @pytest.fixture()
    def corpora(self, spark_session):
        target = spark_session.createDataFrame(
            [(i, 'science research method') for i in range(6)],
            'doc_id long, text string')
        raw = spark_session.createDataFrame(
            [(1, 'science research method'),     # target-like
             (2, 'buy cheap pills now'),         # spam
             (3, 'science buy research pills'),  # mixed
             (4, '')],                           # featureless
            'doc_id long, text string')
        return raw, target

    def test_target_like_docs_weigh_more(self, corpora):
        raw, target = corpora
        w = {r['doc_id']: r['log_weight']
             for r in dsir_log_weights(raw, target).collect()}
        assert w[1] > w[3] > w[2]

    def test_featureless_doc_null_weight(self, corpora):
        raw, target = corpora
        row = {r['doc_id']: r for r in
               dsir_log_weights(raw, target).collect()}[4]
        assert row['n_feats'] == 0
        assert row['log_weight'] is None

    def test_hand_computed_weight(self, spark_session):
        # single-token corpora: one feature each, closed form
        target = spark_session.createDataFrame(
            [(0, 'x')], 'doc_id long, text string')
        raw = spark_session.createDataFrame(
            [(0, 'x'), (1, 'y')], 'doc_id long, text string')
        B, s = 100, 1.0
        out = {r['doc_id']: r['log_weight'] for r in
               dsir_log_weights(raw, target, n_buckets=B).collect()}
        # p_t(x)=(1+1)/(1+100); p_r(x)=(1+1)/(2+100)
        assert out[0] == pytest.approx(
            math.log(2 / 101) - math.log(2 / 102), rel=1e-12)
        # x-bucket: c_t=1, c_r=1; y-bucket: c_t=0, c_r=1
        assert out[1] == pytest.approx(
            math.log(1 / 101) - math.log(2 / 102), rel=1e-12)

    def test_precomputed_counts_match_inline(self, corpora):
        raw, target = corpora
        inline = {(r['doc_id'], r['n_feats'], r['log_weight'])
                  for r in dsir_log_weights(raw, target).collect()}
        tc = bucket_counts(target)
        rc = bucket_counts(raw)
        pre = {(r['doc_id'], r['n_feats'], r['log_weight'])
               for r in dsir_log_weights(
                   raw, None, target_counts=tc,
                   raw_counts=rc).collect()}
        assert inline == pre

    def test_counts_args_validated(self, corpora):
        raw, target = corpora
        with pytest.raises(ValueError, match='both'):
            dsir_log_weights(
                raw, target, target_counts=bucket_counts(target))

    def test_ratio_table_is_broadcast(self, corpora):
        raw, target = corpora
        plan = dsir_log_weights(raw, target)._jdf \
            .queryExecution().executedPlan().toString()
        assert 'BroadcastHashJoin' in plan
        assert 'Python' not in plan


class TestPerplexityBuckets:
    @pytest.fixture()
    def scored(self, spark_session):
        rows = [(i, 'en', float(-i)) for i in range(9)] \
            + [(100 + i, 'de', float(-i)) for i in range(3)] \
            + [(999, 'en', None)]
        return spark_session.createDataFrame(
            rows, 'doc_id long, lang string, score double')

    def test_equal_count_buckets_per_partition(self, scored):
        out = {r['doc_id']: (r['bucket_idx'], r['bucket'])
               for r in perplexity_buckets(
                   scored, 'score', 'doc_id',
                   part_col='lang').collect()}
        # en: 9 rows → 3/3/3 by descending score (head = highest)
        assert [out[i][1] for i in range(9)] == (
            ['head'] * 3 + ['middle'] * 3 + ['tail'] * 3)
        # de: 3 rows → one per bucket
        assert [out[100 + i][1] for i in range(3)] == [
            'head', 'middle', 'tail']
        assert 999 not in out  # NULL scores excluded

    def test_threshold_path_is_projection(self, scored):
        df = perplexity_buckets(
            scored, 'score', 'doc_id', part_col='lang',
            thresholds=[-2.5, -5.5])
        out = {r['doc_id']: r['bucket'] for r in df.collect()}
        assert out[0] == 'head' and out[2] == 'head'
        assert out[3] == 'middle' and out[5] == 'middle'
        assert out[6] == 'tail' and out[8] == 'tail'
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan  # no sort, no shuffle
        assert 'Window' not in plan

    def test_validation(self, scored):
        with pytest.raises(ValueError, match='labels'):
            perplexity_buckets(scored, 'score', 'doc_id',
                               n_buckets=4)
        with pytest.raises(ValueError, match='thresholds'):
            perplexity_buckets(scored, 'score', 'doc_id',
                               thresholds=[1.0])
        with pytest.raises(ValueError, match='descending'):
            perplexity_buckets(scored, 'score', 'doc_id',
                               thresholds=[-5.5, -2.5])

    def test_global_bucketing_without_part_col(self, spark_session):
        df = spark_session.createDataFrame(
            [(i, float(i)) for i in range(6)],
            'doc_id long, score double')
        out = {r['doc_id']: r['bucket'] for r in perplexity_buckets(
            df, 'score', 'doc_id', n_buckets=2,
            labels=('head', 'tail')).collect()}
        assert out == {5: 'head', 4: 'head', 3: 'head',
                       2: 'tail', 1: 'tail', 0: 'tail'}
