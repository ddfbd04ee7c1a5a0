"""Tests for TF-IDF weighting, greedy sequence packing, and exact-k
stratified sampling."""
import math
import random

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import tfidf as ti
from ons_utils_spark.operators.packing import (
    _pack_bins, pack_greedy, pack_stats,
)
from ons_utils_spark.operators.sampling import stratified_sample_exact


@pytest.fixture
def corpus(spark_session):
    rows = [
        (1, 'apple banana apple'),
        (2, 'banana cherry'),
        (3, 'apple cherry cherry date'),
        (4, ''),
    ]
    return spark_session.createDataFrame(
        rows, 'doc_id bigint, text string')


class TestTfIdf:
    def test_term_frequencies(self, corpus):
        rows = {(r['doc_id'], r['token']): r
                for r in ti.term_frequencies(corpus).collect()}
        assert rows[(1, 'apple')]['tc'] == 2
        assert rows[(1, 'apple')]['doc_len'] == 3
        assert rows[(1, 'apple')]['tf'] == pytest.approx(2 / 3)
        # empty doc contributes no token rows at all
        assert not any(doc == 4 for doc, _ in rows)

    def test_hand_computed_weight(self, corpus):
        """'apple' in doc 1: tf = 2/3, df = 2 of 3 docs →
        idf = ln(3/2)."""
        out = {(r['doc_id'], r['token']): r['weight']
               for r in ti.tfidf(corpus).collect()}
        assert out[(1, 'apple')] == pytest.approx(
            (2 / 3) * math.log(3 / 2), abs=1e-12)
        # 'date' is a hapax: idf = ln(3/1), tf = 1/4
        assert out[(3, 'date')] == pytest.approx(
            (1 / 4) * math.log(3), abs=1e-12)

    def test_min_df_cut(self, corpus):
        toks = {r['token']
                for r in ti.tfidf(corpus, min_df=2).collect()}
        assert 'date' not in toks       # df=1 dropped
        assert {'apple', 'banana', 'cherry'} <= toks

    def test_broadcast_vocab_same_result(self, corpus):
        a = sorted(map(tuple, ti.tfidf(corpus).select(
            'doc_id', 'token', 'weight').collect()))
        b = sorted(map(tuple, ti.tfidf(
            corpus, broadcast_vocab=True).select(
            'doc_id', 'token', 'weight').collect()))
        assert a == b

    def test_top_terms_deterministic_tiebreak(self, spark_session):
        """Two tokens with identical rounded weights rank by token
        ascending."""
        df = spark_session.createDataFrame(
            [(1, 'zeta alpha'), (2, 'beta'), (3, 'beta')],
            'doc_id bigint, text string')
        top = ti.top_terms(ti.tfidf(df), k=2).collect()
        doc1 = sorted((r['rank'], r['token'])
                      for r in top if r['doc_id'] == 1)
        # both hapaxes in doc 1 weigh ln(3)/2 — alpha wins rank 1
        assert doc1 == [(1, 'alpha'), (2, 'zeta')]


class TestPackGreedy:
    def test_pure_recurrence(self):
        assert _pack_bins([3, 3, 3], 6) == [0, 0, 1]
        assert _pack_bins([6, 1], 6) == [0, 1]       # exact fit stays
        assert _pack_bins([7, 1], 6) == [0, 1]       # oversize alone
        assert _pack_bins([1, 7, 1], 6) == [0, 1, 2]
        assert _pack_bins([0, 0, 5], 6) == [0, 0, 0]  # zeros join
        assert _pack_bins([], 6) == []

    def test_matches_reference_walk(self, spark_session):
        rng = random.Random(7)
        rows = [(f's{i % 3}', i, rng.randint(0, 9))
                for i in range(60)]
        df = spark_session.createDataFrame(
            rows, 'source string, doc_id bigint, n_tokens bigint')
        got = {(r['source'], r['doc_id']): r['bin_id']
               for r in pack_greedy(df, 12).collect()}
        for src in ('s0', 's1', 's2'):
            docs = sorted((d, t) for s, d, t in rows if s == src)
            want = _pack_bins([t for _, t in docs], 12)
            for (doc, _), bin_id in zip(docs, want):
                assert got[(src, doc)] == bin_id, (src, doc)

    def test_result_invariant_under_partitioning(self, spark_session):
        rows = [('a', i, (i * 7) % 11) for i in range(40)]
        df = spark_session.createDataFrame(
            rows, 'source string, doc_id bigint, n_tokens bigint')
        one = sorted(map(tuple, pack_greedy(df, 15).collect()))
        many = sorted(map(tuple, pack_greedy(
            df.repartition(13), 15).collect()))
        assert one == many

    def test_stats_and_budget_invariant(self, spark_session):
        rows = [('a', i, 5) for i in range(10)]
        df = spark_session.createDataFrame(
            rows, 'source string, doc_id bigint, n_tokens bigint')
        stats = pack_stats(pack_greedy(df, 12)).collect()
        # bins of two 5-token docs: 5 bins, each 10 tokens ≤ budget
        assert len(stats) == 5
        assert all(r['bin_tokens'] <= 12 for r in stats)
        assert sum(r['n_docs'] for r in stats) == 10

    def test_rejects_nonpositive_budget(self, spark_session):
        df = spark_session.createDataFrame(
            [('a', 1, 1)], 'source string, doc_id bigint, n_tokens bigint')
        with pytest.raises(ValueError, match='budget'):
            pack_greedy(df, 0)


class TestStratifiedSampleExact:
    @pytest.fixture
    def groups(self, spark_session):
        rows = [('big', i) for i in range(50)] + [('small', i)
                                                  for i in range(3)]
        return spark_session.createDataFrame(
            rows, 'grp string, id bigint')

    def test_exact_k_and_min_for_small_groups(self, groups):
        out = stratified_sample_exact(groups, 'grp', 'id', 5).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r['grp'], []).append(r['id'])
        assert len(by_grp['big']) == 5
        assert sorted(by_grp['small']) == [0, 1, 2]  # whole group

    def test_deterministic_under_repartition(self, groups):
        a = sorted(map(tuple, stratified_sample_exact(
            groups, 'grp', 'id', 5).collect()))
        b = sorted(map(tuple, stratified_sample_exact(
            groups.repartition(17), 'grp', 'id', 5).collect()))
        assert a == b

    def test_salt_changes_selection(self, groups):
        a = sorted(r['id'] for r in stratified_sample_exact(
            groups, 'grp', 'id', 5).collect())
        b = sorted(r['id'] for r in stratified_sample_exact(
            groups, 'grp', 'id', 5, salt='v2').collect())
        assert a != b

    def test_growth_consistent(self, spark_session):
        """Adding rows never reshuffles survivors arbitrarily: the
        kept set of the grown corpus restricted to old ids is a
        subset of the old kept set."""
        old = spark_session.createDataFrame(
            [('g', i) for i in range(30)], 'grp string, id bigint')
        new = spark_session.createDataFrame(
            [('g', i) for i in range(60)], 'grp string, id bigint')
        kept_old = {r['id'] for r in stratified_sample_exact(
            old, 'grp', 'id', 8).collect()}
        kept_new = {r['id'] for r in stratified_sample_exact(
            new, 'grp', 'id', 8).collect()}
        assert kept_new & set(range(30)) <= kept_old

    def test_rejects_nonpositive_k(self, groups):
        with pytest.raises(ValueError, match='k must be positive'):
            stratified_sample_exact(groups, 'grp', 'id', 0)


class TestDocumentFrequenciesCorpusCount:
    def test_corpus_counts_tokenless_docs(self, spark_session):
        from ons_utils_spark.operators import tfidf as ti
        rows = [(1, 'a b'), (2, 'a'), (3, '')]
        df = spark_session.createDataFrame(
            rows, 'doc_id bigint, text string')
        tf = ti.term_frequencies(df)
        from_tf = ti.document_frequencies(tf).select('n_docs').first()
        from_corpus = ti.document_frequencies(
            tf, corpus=df).select('n_docs').first()
        assert from_tf['n_docs'] == 2       # only docs with tokens
        assert from_corpus['n_docs'] == 3   # the whole corpus


class TestAssembleBins:
    def test_sequences_ordered_and_complete(self, spark_session):
        from ons_utils_spark.operators.packing import (
            assemble_bins, pack_greedy,
        )
        rows = [('a', 2, 'two', 1), ('a', 1, 'one', 1),
                ('a', 3, 'three', 1), ('b', 9, 'solo', 5)]
        df = spark_session.createDataFrame(
            rows, 'source string, doc_id bigint, text string, '
                  'n_tokens bigint')
        out = {(r['source'], r['bin_id']): r
               for r in assemble_bins(pack_greedy(df, 3)).collect()}
        seq_a = out[('a', 0)]
        # in doc_id order regardless of input order
        assert seq_a['sequence'] == 'one two three'
        assert seq_a['n_docs'] == 3 and seq_a['bin_tokens'] == 3
        assert out[('b', 0)]['sequence'] == 'solo'

    def test_custom_separator(self, spark_session):
        from ons_utils_spark.operators.packing import (
            assemble_bins, pack_greedy,
        )
        df = spark_session.createDataFrame(
            [('a', 1, 'x', 1), ('a', 2, 'y', 1)],
            'source string, doc_id bigint, text string, n_tokens bigint')
        out = assemble_bins(pack_greedy(df, 10),
                            sep='\n').collect()[0]
        assert out['sequence'] == 'x\ny'


class TestEwma:
    def test_hand_computed_chain(self, spark_session):
        from ons_utils_spark.operators.timeseries import ewma
        rows = [(1, 1, 8.0), (1, 2, 4.0), (1, 3, 6.0)]
        df = spark_session.createDataFrame(
            rows, 'k bigint, t bigint, x double')
        out = {r['t']: r['ewma'] for r in ewma(
            df, 'x', 't', 'k', alpha=0.5).collect()}
        assert out[1] == 8.0
        assert out[2] == 6.0           # .5*4 + .5*8
        assert out[3] == 6.0           # .5*6 + .5*6

    def test_null_carries_previous(self, spark_session):
        from ons_utils_spark.operators.timeseries import ewma
        rows = [(1, 1, 10.0), (1, 2, None), (1, 3, 20.0)]
        df = spark_session.createDataFrame(
            rows, 'k bigint, t bigint, x double')
        out = {r['t']: r['ewma'] for r in ewma(
            df, 'x', 't', 'k', alpha=0.5).collect()}
        assert out[2] == 10.0          # gap carries forward
        assert out[3] == 15.0          # resumes from carried state

    def test_leading_null_is_null(self, spark_session):
        from ons_utils_spark.operators.timeseries import ewma
        rows = [(1, 1, None), (1, 2, 4.0)]
        df = spark_session.createDataFrame(
            rows, 'k bigint, t bigint, x double')
        out = {r['t']: r['ewma'] for r in ewma(
            df, 'x', 't', 'k', alpha=0.5).collect()}
        assert out[1] is None and out[2] == 4.0

    def test_keys_independent_and_partition_invariant(
            self, spark_session):
        from ons_utils_spark.operators.timeseries import ewma
        rows = [(k, t, float(k * 10 + t))
                for k in (1, 2, 3) for t in range(12)]
        df = spark_session.createDataFrame(
            rows, 'k bigint, t bigint, x double')
        a = sorted(map(tuple, ewma(df, 'x', 't', 'k', 0.3).collect()))
        b = sorted(map(tuple, ewma(
            df.repartition(7), 'x', 't', 'k', 0.3).collect()))
        assert a == b

    def test_alpha_validation(self, spark_session):
        from ons_utils_spark.operators.timeseries import ewma
        df = spark_session.createDataFrame(
            [(1, 1, 1.0)], 'k bigint, t bigint, x double')
        for bad in (0.0, -0.1, 1.5):
            with pytest.raises(ValueError, match='alpha'):
                ewma(df, 'x', 't', 'k', bad)
