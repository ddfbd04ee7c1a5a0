"""Tests for operators.vocab and operators.classifier.

The reference has no vocabulary or classifier tooling — these pin
the LLM-pipeline extension surface (vocabulary sizing / OOV rates,
CCNet/DCLM-style seed-set quality scoring).
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.classifier import (
    score_texts,
    train_token_weights,
)
from ons_utils_spark.operators.vocab import (
    build_vocab,
    oov_stats,
    token_counts,
    vocab_coverage,
)


@pytest.fixture
def docs(spark_session):
    return spark_session.createDataFrame(
        [
            (1, 'the cat sat', 'a'),
            (2, 'the dog sat', 'a'),
            (3, 'THE   cat  RAN', 'b'),
            (4, 'a rare axolotl', 'b'),
        ],
        'doc_id long, text string, source string',
    )


def test_token_counts_normalizes(docs):
    rows = {r['token']: r['c'] for r in token_counts(docs).collect()}
    # case-folded and whitespace-collapsed: THE counts with the
    assert rows['the'] == 3
    assert rows['cat'] == 2
    assert rows['axolotl'] == 1
    assert '' not in rows


def test_build_vocab_rank_deterministic(docs):
    vocab = build_vocab(docs, top_k=3).collect()
    assert [r['rank'] for r in vocab] == [1, 2, 3]
    # the(3) first; then count-2 tokens tie-broken alphabetically:
    # cat < sat
    assert [r['token'] for r in vocab] == ['the', 'cat', 'sat']


def test_build_vocab_min_count(docs):
    vocab = build_vocab(docs, top_k=100, min_count=2)
    toks = {r['token'] for r in vocab.collect()}
    assert toks == {'the', 'cat', 'sat'}


def test_vocab_coverage_curve(docs):
    total = token_counts(docs).agg(F.sum('c')).collect()[0][0]
    vocab = build_vocab(docs, top_k=3)
    cov = {r['rank']: r for r in
           vocab_coverage(vocab, total).collect()}
    assert cov[1]['cum_c'] == 3
    assert cov[2]['cum_c'] == 5
    assert cov[3]['cum_c'] == 7
    assert cov[3]['coverage'] == pytest.approx(7 / total)


def test_oov_stats_broadcast_membership(docs):
    vocab = build_vocab(docs, top_k=3)  # the, cat, sat
    out = {r['source']: r for r in
           oov_stats(docs, vocab, by=('source',)).collect()}
    # source a: 'the cat sat' + 'the dog sat' -> 6 tokens, 1 oov (dog)
    assert out['a']['n_tokens'] == 6
    assert out['a']['n_oov'] == 1
    assert out['a']['oov_ratio'] == pytest.approx(1 / 6)
    # source b: 'the cat ran' + 'a rare axolotl' -> 6 tokens, 4 oov
    assert out['b']['n_oov'] == 4


@pytest.fixture
def labeled(spark_session):
    # seed class says 'good'; crawl class says 'spam'
    return spark_session.createDataFrame(
        [
            (1, 'good clean prose here', 1),
            (2, 'good thoughtful prose', 1),
            (3, 'spam spam buy now', 0),
            (4, 'buy spam now', 0),
        ],
        'doc_id long, text string, is_seed int',
    )


@pytest.mark.parametrize('mode', ['logodds', 'integer'])
def test_train_weights_sign(labeled, mode):
    wts = {r['token']: r['w'] for r in
           train_token_weights(labeled, 'text', 'is_seed',
                               mode=mode).collect()}
    assert wts['good'] > 0 and wts['prose'] > 0
    assert wts['spam'] < 0 and wts['buy'] < 0
    if mode == 'integer':
        assert all(isinstance(w, int) for w in wts.values())


def test_logodds_values(labeled):
    """Pin the exact smoothed log-odds formula."""
    wts = {r['token']: r for r in
           train_token_weights(labeled, 'text', 'is_seed').collect()}
    t_pos, t_neg = 7, 7  # token occurrences per class
    v = len(wts)
    r = wts['good']
    expected = (math.log((r['c_pos'] + 1) / (t_pos + v))
                - math.log((r['c_neg'] + 1) / (t_neg + v)))
    assert r['w'] == pytest.approx(expected, rel=1e-12)


@pytest.mark.parametrize('mode', ['logodds', 'integer'])
def test_score_separates_classes(labeled, mode):
    wts = train_token_weights(labeled, 'text', 'is_seed', mode=mode)
    scored = {r['doc_id']: r['score'] for r in
              score_texts(labeled, wts, 'text',
                          keep=('doc_id',)).collect()}
    assert scored[1] > 0 and scored[2] > 0
    assert scored[3] < 0 and scored[4] < 0


def test_score_unknown_tokens_zero(labeled, spark_session):
    wts = train_token_weights(labeled, 'text', 'is_seed')
    new = spark_session.createDataFrame(
        [(9, 'zzz qqq unseen')], 'doc_id long, text string')
    row = score_texts(new, wts, 'text', keep=('doc_id',)).collect()[0]
    assert row['score'] == 0.0
    assert row['n_tokens'] == 3


def test_score_length_normalize(labeled):
    wts = train_token_weights(labeled, 'text', 'is_seed')
    raw = {r['doc_id']: r for r in
           score_texts(labeled, wts, 'text', keep=('doc_id',))
           .collect()}
    norm = {r['doc_id']: r for r in
            score_texts(labeled, wts, 'text', keep=('doc_id',),
                        length_normalize=True).collect()}
    for d in raw:
        assert norm[d]['score'] == pytest.approx(
            raw[d]['score'] / raw[d]['n_tokens'])


def test_min_df_filters_rare(labeled):
    wts = train_token_weights(labeled, 'text', 'is_seed', min_df=2)
    toks = {r['token'] for r in wts.collect()}
    assert 'thoughtful' not in toks  # appears once
    assert 'spam' in toks


def test_invalid_mode_raises(labeled):
    with pytest.raises(ValueError, match='logodds'):
        train_token_weights(labeled, 'text', 'is_seed', mode='bogus')


class TestCalibrationBins:
    def _scored(self, spark):
        # 10 docs, scores 100..91 descending by id; labels: the top
        # half is mostly positive (well-calibrated-ish fixture)
        rows = [(i, 100 - i, 1 if i < 4 or i == 5 else 0)
                for i in range(10)]
        return spark.createDataFrame(
            rows, 'doc_id long, score long, label int')

    def test_equal_count_bins_and_rates(self, spark_session):
        from ons_utils_spark.operators.classifier import (
            calibration_bins)
        out = {r['bin_idx']: r for r in calibration_bins(
            self._scored(spark_session), n_bins=5).collect()}
        assert sorted(out) == [0, 1, 2, 3, 4]
        assert all(out[b]['n_docs'] == 2 for b in out)
        # bin 0 = docs 0,1 (both pos); bin 2 = docs 4,5 (one pos)
        assert out[0]['n_pos'] == 2
        assert out[2]['n_pos'] == 1
        assert out[4]['n_pos'] == 0
        assert out[0]['min_score'] == 99
        assert out[0]['max_score'] == 100

    def test_null_scores_excluded(self, spark_session):
        from ons_utils_spark.operators.classifier import (
            calibration_bins)
        df = spark_session.createDataFrame(
            [(1, 10, 1), (2, None, 1), (3, 5, 0), (4, 1, 0)],
            'doc_id long, score long, label int')
        out = calibration_bins(df, n_bins=3).collect()
        assert sum(r['n_docs'] for r in out) == 3

    def test_threshold_path_no_window(self, spark_session):
        from ons_utils_spark.operators.classifier import (
            calibration_bins)
        df = self._scored(spark_session)
        out_df = calibration_bins(df, n_bins=3,
                                  thresholds=[98, 94])
        out = {r['bin_idx']: r['n_docs'] for r in out_df.collect()}
        assert out == {0: 3, 1: 4, 2: 3}
        plan = out_df._jdf.queryExecution().executedPlan().toString()
        assert 'Window' not in plan
        import pytest
        with pytest.raises(ValueError, match='descending'):
            calibration_bins(df, n_bins=3, thresholds=[94, 98])
        with pytest.raises(ValueError, match='thresholds'):
            calibration_bins(df, n_bins=3, thresholds=[98])
