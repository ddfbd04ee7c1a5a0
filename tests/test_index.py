"""Tests for operators.index (inverted index + conjunctive search)."""
from __future__ import annotations

import pytest

from ons_utils_spark.operators.index import (
    build_inverted_index,
    search_all_terms,
)


@pytest.fixture
def corpus(spark_session):
    return spark_session.createDataFrame(
        [
            (1, 'spark shuffles data fast'),
            (2, 'spark joins data'),
            (3, 'pandas joins frames'),
            (4, 'Spark   SPARK spark'),   # dup tokens, one doc
            (5, None),
        ],
        'doc_id long, text string',
    )


def test_postings_sorted_and_deduped(corpus):
    idx = {r['token']: r for r in
           build_inverted_index(corpus).collect()}
    assert list(idx['spark']['postings']) == [1, 2, 4]
    assert idx['spark']['doc_freq'] == 3
    assert list(idx['joins']['postings']) == [2, 3]
    assert 'None' not in idx


def test_cap_bounds_postings_but_not_doc_freq(corpus):
    idx = {r['token']: r for r in
           build_inverted_index(corpus, max_postings=2).collect()}
    assert list(idx['spark']['postings']) == [1, 2]  # lowest ids kept
    assert idx['spark']['doc_freq'] == 3             # true frequency


def test_min_df_filters(corpus):
    toks = {r['token'] for r in
            build_inverted_index(corpus, min_df=2).collect()}
    assert toks == {'spark', 'data', 'joins'}


def test_conjunctive_search(corpus):
    idx = build_inverted_index(corpus)
    got = sorted(r['doc_id'] for r in
                 search_all_terms(idx, ['spark', 'data']).collect())
    assert got == [1, 2]
    assert search_all_terms(idx, ['spark', 'frames']).count() == 0


def test_search_raises_on_truncated_terms(corpus):
    idx = build_inverted_index(corpus, max_postings=2)
    with pytest.raises(ValueError, match='truncated'):
        search_all_terms(idx, ['spark'])
    # un-truncated terms still work against the capped index
    assert sorted(
        r['doc_id'] for r in
        search_all_terms(idx, ['joins']).collect()) == [2, 3]
