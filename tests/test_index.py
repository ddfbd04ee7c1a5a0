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


def test_bm25_hand_computed(spark_session):
    import math

    from ons_utils_spark.operators.index import bm25_rank

    # doc 1 mentions 'spark' twice in 4 tokens; doc 2 once in 2;
    # doc 3 not at all
    df = spark_session.createDataFrame(
        [(1, 'spark spark data fast'), (2, 'spark joins'),
         (3, 'pandas frames')],
        'doc_id long, text string')
    got = {r['doc_id']: r['score'] for r in
           bm25_rank(df, ['spark'], top_k=None).collect()}
    n, dfreq, avgdl = 3, 2, (4 + 2 + 2) / 3
    idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(s(2, 4), rel=1e-12)
    assert got[2] == pytest.approx(s(1, 2), rel=1e-12)
    assert 3 not in got


def test_bm25_ranking_and_topk(corpus):
    from ons_utils_spark.operators.index import bm25_rank

    rows = bm25_rank(corpus, ['spark', 'data'], top_k=2).collect()
    assert len(rows) == 2
    assert rows[0]['score'] >= rows[1]['score']
    # docs matching both terms outrank single-term matches
    assert rows[0]['doc_id'] in (1, 2)


def test_search_raises_on_truncated_terms(corpus):
    idx = build_inverted_index(corpus, max_postings=2)
    with pytest.raises(ValueError, match='truncated'):
        search_all_terms(idx, ['spark'])
    # un-truncated terms still work against the capped index
    assert sorted(
        r['doc_id'] for r in
        search_all_terms(idx, ['joins']).collect()) == [2, 3]


class TestBm25MultiRank:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [(1, 'spark table spark'),
             (2, 'table join'),
             (3, 'hash join merge hash'),
             (4, 'window filter window'),
             (5, 'nothing relevant here')],
            'doc_id long, text string')

    def test_matches_single_query_bm25(self, spark_session):
        from ons_utils_spark.operators.index import (
            bm25_multi_rank, bm25_rank)
        docs = self._corpus(spark_session)
        single = {r['doc_id']: r['score'] for r in bm25_rank(
            docs, ['spark', 'table'], top_k=None).collect()}
        qs = spark_session.createDataFrame(
            [(0, ['spark', 'table'])],
            'query_id int, terms array<string>')
        multi = {r['doc_id']: r['score'] for r in
                 bm25_multi_rank(docs, qs).collect()}
        assert multi.keys() == single.keys()
        for k in single:
            assert multi[k] == pytest.approx(single[k], rel=1e-12)

    def test_one_pass_covers_all_queries(self, spark_session):
        from ons_utils_spark.operators.index import bm25_multi_rank
        docs = self._corpus(spark_session)
        qs = spark_session.createDataFrame(
            [(0, ['spark']), (1, ['hash', 'merge']),
             (2, ['window'])],
            'query_id int, terms array<string>')
        out = bm25_multi_rank(docs, qs)
        got = {(r['query_id'], r['doc_id']) for r in out.collect()}
        # each query only scores docs matching >= 1 of its terms
        assert got == {(0, 1), (1, 3), (2, 4)}


class TestMineHardNegatives:
    def test_positives_excluded_and_ranked(self, spark_session):
        from ons_utils_spark.operators.index import (
            mine_hard_negatives)
        docs = spark_session.createDataFrame(
            [(1, 'spark spark spark'),
             (2, 'spark table'),
             (3, 'spark data here'),
             (4, 'unrelated words')],
            'doc_id long, text string')
        qs = spark_session.createDataFrame(
            [(0, ['spark'])], 'query_id int, terms array<string>')
        pos = spark_session.createDataFrame(
            [(0, 1)], 'query_id int, doc_id long')
        out = [(r['doc_id'], r['rank']) for r in mine_hard_negatives(
            docs, qs, pos, k=5).orderBy('rank').collect()]
        # doc 1 (the labeled positive) is gone; doc 4 never matched
        assert [d for d, _ in out] != []
        assert 1 not in [d for d, _ in out]
        assert 4 not in [d for d, _ in out]
        assert [r for _, r in out] == list(range(1, len(out) + 1))

    def test_k_caps_per_query(self, spark_session):
        from ons_utils_spark.operators.index import (
            mine_hard_negatives)
        docs = spark_session.createDataFrame(
            [(i, 'spark word%d' % i) for i in range(20)],
            'doc_id long, text string')
        qs = spark_session.createDataFrame(
            [(0, ['spark'])], 'query_id int, terms array<string>')
        pos = spark_session.createDataFrame(
            [], 'query_id int, doc_id long')
        out = mine_hard_negatives(docs, qs, pos, k=7).collect()
        assert len(out) == 7
