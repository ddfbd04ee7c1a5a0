"""Tests for the round-15c batch: token surprisal, tokenizer
fertility, Onion duplicate-ngram fraction, edit-similarity pairs,
CDX parsing, harmonic centrality."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.dedup import (
    duplicate_ngram_fraction, edit_similarity_pairs)
from ons_utils_spark.operators.graph import harmonic_centrality
from ons_utils_spark.operators.text import token_surprisal
from ons_utils_spark.operators.vocab import (
    build_vocab, tokenizer_fertility)
from ons_utils_spark.operators.web import parse_cdx


class TestTokenSurprisal:
    @pytest.fixture
    def docs(self, spark_session):
        # corpus: 'a' x4, 'b' x2, 'c' x1, 'd' x1  -> N = 8
        return spark_session.createDataFrame(
            [(1, 'a a b c'), (2, 'a a b d'), (3, '   ')],
            'doc_id long, text string')

    def expected(self, freqs, n_total):
        return round(sum(math.log2(n_total) - math.log2(f)
                         for f in freqs) / len(freqs), 6)

    def test_hand_computed(self, docs):
        out = {r['doc_id']: r for r in
               token_surprisal(docs).collect()}
        # doc 1: tokens a,a,b,c freqs 4,4,2,1
        assert out[1]['n_tokens'] == 4
        assert out[1]['mean_surprisal'] == pytest.approx(
            self.expected([4, 4, 2, 1], 8), abs=1e-6)
        # doc 2: a,a,b,d
        assert out[2]['mean_surprisal'] == pytest.approx(
            self.expected([4, 4, 2, 1], 8), abs=1e-6)
        # blank doc: absent
        assert 3 not in out

    def test_head_split_is_plan_shape_only(self, docs):
        """head_k routes tokens between broadcast and shuffle joins;
        every split must produce identical scores."""
        base = sorted(map(tuple, token_surprisal(
            docs, head_k=1000).collect()))
        for k in (1, 2):
            assert sorted(map(tuple, token_surprisal(
                docs, head_k=k).collect())) == base


class TestTokenizerFertility:
    def test_hand_computed(self, spark_session):
        docs = spark_session.createDataFrame(
            [('en', 'aa bb aa'), ('de', 'aa zzzz yyy')],
            'lang string, text string')
        vocab = spark_session.createDataFrame(
            [('aa',), ('bb',)], 'token string')
        out = {r['lang']: r for r in
               tokenizer_fertility(docs, vocab).collect()}
        # en: 3 words, all in vocab -> 3 tokens, fertility 1.0
        assert out['en']['n_words'] == 3
        assert out['en']['n_tokens'] == 3
        assert out['en']['fertility_u6'] == 1000000
        assert out['en']['oov_ratio_u6'] == 0
        # de: aa(1) + zzzz(4 chars) + yyy(3 chars) = 8 over 3 words
        assert out['de']['n_tokens'] == 8
        assert out['de']['fertility_u6'] == round(8 / 3 * 1e6)
        assert out['de']['oov_ratio_u6'] == round(2 / 3 * 1e6)

    def test_composes_with_build_vocab(self, spark_session):
        docs = spark_session.createDataFrame(
            [('en', 'x x x y'), ('fr', 'y z')],
            'lang string, text string')
        vocab = build_vocab(docs, top_k=2)  # x (3), y (2)
        out = {r['lang']: r for r in
               tokenizer_fertility(docs, vocab).collect()}
        assert out['en']['oov_ratio_u6'] == 0
        assert out['fr']['oov_ratio_u6'] == 500000  # z


class TestDuplicateNgramFraction:
    def test_planted_duplicates(self, spark_session):
        # docs 1 and 2 share 'p q r s'; doc 3 is unique; doc 4 short
        docs = spark_session.createDataFrame(
            [(1, 'p q r s t'), (2, 'p q r s u'), (3, 'k l m n o'),
             (4, 'xy')],
            'doc_id long, text string')
        out = {r['doc_id']: r for r in duplicate_ngram_fraction(
            docs, n=3, max_fraction=0.5).collect()}
        # doc 1 3-grams: pqr, qrs, rst -> pqr & qrs duplicated
        assert out[1]['n_ngrams'] == 3 and out[1]['n_dup'] == 2
        assert out[1]['dup_fraction_u6'] == round(2 / 3 * 1e6)
        assert not out[1]['keep']
        assert out[3]['n_dup'] == 0 and out[3]['keep']
        # < n tokens: zero grams, kept
        assert out[4]['n_ngrams'] == 0 and out[4]['keep']

    def test_within_doc_repeat_is_not_cross_doc(self, spark_session):
        docs = spark_session.createDataFrame(
            [(1, 'p q r p q r'), (2, 'z z z z')],
            'doc_id long, text string')
        out = {r['doc_id']: r for r in duplicate_ngram_fraction(
            docs, n=3).collect()}
        # doc 1 repeats its own grams; document frequency stays 1
        assert out[1]['n_dup'] == 0

    def test_bad_n(self, spark_session):
        docs = spark_session.createDataFrame(
            [(1, 'a')], 'doc_id long, text string')
        with pytest.raises(ValueError):
            duplicate_ngram_fraction(docs, n=0)


class TestEditSimilarityPairs:
    def test_substitution_and_insertion(self, spark_session):
        docs = spark_session.createDataFrame(
            [(1, 'the quick brown fox jumps'),
             (2, 'the quick brawn fox jumps'),   # 1 substitution
             (3, 'the quick brown fox jumps x'),  # 2 insertions
             (4, 'a completely different string')],
            'doc_id long, text string')
        out = {(r['id_a'], r['id_b']): r['distance']
               for r in edit_similarity_pairs(
                   docs, max_distance=2).collect()}
        assert out[(1, 2)] == 1
        assert out[(1, 3)] == 2
        assert (1, 4) not in out
        # (2, 3) is distance 3 -> must be rejected by the verify
        assert (2, 3) not in out

    def test_exact_dupes_at_distance_zero(self, spark_session):
        docs = spark_session.createDataFrame(
            [(1, 'same text'), (2, 'same   TEXT'), (3, 'other')],
            'doc_id long, text string')
        out = edit_similarity_pairs(docs, max_distance=0).collect()
        assert [(r['id_a'], r['id_b'], r['distance'])
                for r in out] == [(1, 2, 0)]

    def test_truncation_bounds_verify(self, spark_session):
        # differ only beyond max_len -> distance 0 after truncation
        a = 'x' * 40 + ' left tail'
        b = 'x' * 40 + ' righttail'
        docs = spark_session.createDataFrame(
            [(1, a), (2, b)], 'doc_id long, text string')
        out = edit_similarity_pairs(
            docs, max_distance=1, max_len=40).collect()
        assert [(r['id_a'], r['id_b'], r['distance'])
                for r in out] == [(1, 2, 0)]

    def test_bad_args(self, spark_session):
        docs = spark_session.createDataFrame(
            [(1, 'a')], 'doc_id long, text string')
        with pytest.raises(ValueError):
            edit_similarity_pairs(docs, max_distance=-1)


class TestParseCdx:
    def test_roundtrip_and_malformed(self, spark_session):
        good = ('com,example)/page 20260301120000 '
                '{"url": "https://example.com/page", '
                '"mime": "text/html", "status": "200", '
                '"digest": "sha1:ABC", "length": "1234", '
                '"offset": "5678", "filename": "seg0.warc.gz"}')
        bad = 'com,bad)/x 20260301120000 not json at all'
        df = spark_session.createDataFrame(
            [(good,), (bad,)], 'line string')
        rows = {r['urlkey']: r for r in parse_cdx(df).collect()}
        g = rows['com,example)/page']
        assert g['url'] == 'https://example.com/page'
        assert g['status'] == 200
        assert g['length'] == 1234
        assert g['warc_offset'] == 5678
        assert g['filename'] == 'seg0.warc.gz'
        assert g['ts'].year == 2026 and g['ts'].hour == 12
        b = rows['com,bad)/x']
        assert b['url'] is None and b['status'] is None
        assert b['ts'] is not None  # head still parses


class TestHarmonicCentrality:
    def test_hand_computed_path(self, spark_session):
        # 1 -> 2 -> 3: into 3: dist(2,3)=1, dist(1,3)=2
        edges = spark_session.createDataFrame(
            [(1, 2), (2, 3)], 'src long, dst long')
        out = {r['node']: r for r in harmonic_centrality(
            edges, max_hops=4).collect()}
        assert out[3]['n_reached'] == 2
        assert out[3]['harmonic'] == pytest.approx(1.5)
        assert out[2]['n_reached'] == 1
        assert out[2]['harmonic'] == pytest.approx(1.0)
        assert out[1]['n_reached'] == 0
        assert out[1]['harmonic'] == 0.0

    def test_truncation(self, spark_session):
        edges = spark_session.createDataFrame(
            [(1, 2), (2, 3)], 'src long, dst long')
        out = {r['node']: r for r in harmonic_centrality(
            edges, max_hops=1).collect()}
        assert out[3]['n_reached'] == 1
        assert out[3]['harmonic'] == pytest.approx(1.0)

    def test_undirected(self, spark_session):
        edges = spark_session.createDataFrame(
            [(1, 2)], 'src long, dst long')
        out = {r['node']: r['harmonic'] for r in harmonic_centrality(
            edges, directed=False).collect()}
        assert out[1] == pytest.approx(1.0)
        assert out[2] == pytest.approx(1.0)

    def test_disconnected_contributes_zero(self, spark_session):
        edges = spark_session.createDataFrame(
            [(1, 2), (3, 4)], 'src long, dst long')
        out = {r['node']: r for r in harmonic_centrality(
            edges, max_hops=4).collect()}
        # 3/4 unreachable from 1/2 and vice versa — no poisoning
        assert out[2]['n_reached'] == 1
        assert out[4]['n_reached'] == 1


class TestHyperballCentrality:
    @pytest.fixture
    def ring_chords(self, spark_session):
        edges = [(i, (i + 1) % 40) for i in range(40)] + \
            [(i, (i * 7 + 3) % 40) for i in range(40)]
        return spark_session.createDataFrame(
            edges, 'src long, dst long')

    def test_tracks_exact_within_estimator_error(self, ring_chords):
        from ons_utils_spark.operators.graph import (
            hyperball_centrality)
        ex = {r['node']: r['harmonic'] for r in harmonic_centrality(
            ring_chords, max_hops=3).collect()}
        ap = {r['node']: r['harmonic_approx'] for r in
              hyperball_centrality(
                  ring_chords, max_hops=3, p=6).collect()}
        assert set(ap) == set(ex)
        rel = [abs(ap[n] - ex[n]) / ex[n] for n in ex if ex[n] > 0]
        # stderr ≈ 1.04/sqrt(64) ≈ 13% per estimate; the mean over
        # 40 nodes should sit well inside it
        assert sum(rel) / len(rel) < 0.15
        assert max(rel) < 0.45

    def test_deterministic(self, ring_chords):
        from ons_utils_spark.operators.graph import (
            hyperball_centrality)
        a = sorted(map(tuple, hyperball_centrality(
            ring_chords, max_hops=2, p=4).collect()))
        b = sorted(map(tuple, hyperball_centrality(
            ring_chords, max_hops=2, p=4).collect()))
        assert a == b

    def test_sink_sees_sources(self, spark_session):
        from ons_utils_spark.operators.graph import (
            hyperball_centrality)
        # star into 5: node 5's 1-hop ball holds all four sources
        edges = spark_session.createDataFrame(
            [(1, 5), (2, 5), (3, 5), (4, 5)], 'src long, dst long')
        out = {r['node']: r for r in hyperball_centrality(
            edges, max_hops=2, p=6).collect()}
        assert out[5]['harmonic_approx'] > out[1]['harmonic_approx']
        # sources have empty inbound balls -> exactly zero increments
        assert out[1]['harmonic_approx'] == 0.0

    def test_bad_p(self, spark_session):
        from ons_utils_spark.operators.graph import (
            hyperball_centrality)
        edges = spark_session.createDataFrame(
            [(1, 2)], 'src long, dst long')
        with pytest.raises(ValueError):
            hyperball_centrality(edges, p=3)
