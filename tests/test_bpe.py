"""Tests for operators.bpe (BPE training + segmentation)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.bpe import (
    END_OF_WORD,
    bpe_segmenter_udf,
    train_bpe,
    word_histogram,
)


@pytest.fixture
def corpus(spark_session):
    # the classic Sennrich et al. example distribution
    text = ' '.join(['low'] * 5 + ['lower'] * 2
                    + ['newest'] * 6 + ['widest'] * 3)
    return spark_session.createDataFrame([(1, text)],
                                         'doc_id long, text string')


def test_word_histogram(corpus):
    hist = {r['word']: r['c'] for r in
            word_histogram(corpus).collect()}
    assert hist == {'low': 5, 'lower': 2, 'newest': 6, 'widest': 3}


def test_classic_merges(corpus):
    merges = train_bpe(corpus, num_merges=4)
    # 'es' appears 9x (newest+widest) — the canonical first merge;
    # then es+t (9), then est+</w> (9); then lo (7)
    assert merges[0] == ('e', 's')
    assert merges[1] == ('es', 't')
    assert merges[2] == ('est', END_OF_WORD)
    assert merges[3] == ('l', 'o')


def test_merges_deterministic(corpus):
    assert train_bpe(corpus, num_merges=6) == \
        train_bpe(corpus, num_merges=6)


def test_early_stop_without_repeats(spark_session):
    df = spark_session.createDataFrame([(1, 'ab cd')],
                                       'doc_id long, text string')
    # no adjacent pair occurs twice -> no merges learned
    assert train_bpe(df, num_merges=10) == []


def test_segmenter_round_trip(corpus):
    merges = train_bpe(corpus, num_merges=10)
    seg = bpe_segmenter_udf(merges)
    out = corpus.select(seg(F.col('text')).alias('toks')) \
        .collect()[0]['toks']
    # tokens reassemble the normalized text exactly
    rebuilt = ''.join(out).replace(END_OF_WORD, ' ').strip()
    norm = ' '.join(['low'] * 5 + ['lower'] * 2
                    + ['newest'] * 6 + ['widest'] * 3)
    assert rebuilt == norm
    # frequent word fully merged
    assert 'newest' + END_OF_WORD in out


def test_segmenter_handles_unseen_and_null(corpus, spark_session):
    merges = train_bpe(corpus, num_merges=10)
    seg = bpe_segmenter_udf(merges)
    df = spark_session.createDataFrame(
        [(1, 'zq lowest'), (2, None)], 'doc_id long, text string')
    rows = {r['doc_id']: r['toks'] for r in
            df.select('doc_id', seg(F.col('text')).alias('toks'))
            .collect()}
    assert rows[2] is None
    toks = rows[1]
    # unseen chars fall back to char-level symbols
    assert toks[0] == 'z' and toks[1] == 'q'
    rebuilt = ''.join(toks).replace(END_OF_WORD, ' ').strip()
    assert rebuilt == 'zq lowest'


def test_train_bpe_warns_when_max_words_truncates(spark_session):
    df = spark_session.createDataFrame(
        [('aa bb cc dd ee ff gg aa bb aa',)], 'text string')
    with pytest.warns(RuntimeWarning, match='truncated'):
        capped = train_bpe(df, num_merges=3, max_words=3)
    # decisions follow the top-3 histogram exactly (aa, bb + 1 more)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter('error')  # no warning when the cap fits
        full = train_bpe(df, num_merges=3, max_words=100)
    assert capped is not None and full is not None
