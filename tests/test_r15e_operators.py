"""Tests for the round-15e batch: k-anonymity, Cohen's kappa,
length-grouped batching."""
from __future__ import annotations

import pytest

from ons_utils_spark.operators.packing import length_bucket_batches
from ons_utils_spark.operators.quality_checks import (
    cohens_kappa, k_anonymity)


class TestKAnonymity:
    def test_classes_and_verdicts(self, spark_session):
        rows = [('a', 'x')] * 5 + [('a', 'y')] * 2 + [('b', 'x')]
        df = spark_session.createDataFrame(
            rows, 'region string, segment string')
        out = {(r['region'], r['segment']): r for r in
               k_anonymity(df, ['region', 'segment'], k=5).collect()}
        assert out[('a', 'x')]['n_rows'] == 5
        assert out[('a', 'x')]['k_anonymous']
        assert not out[('a', 'y')]['k_anonymous']
        assert not out[('b', 'x')]['k_anonymous']

    def test_bad_args(self, spark_session):
        df = spark_session.createDataFrame([('a',)], 'q string')
        with pytest.raises(ValueError):
            k_anonymity(df, ['q'], k=0)
        with pytest.raises(ValueError):
            k_anonymity(df, [], k=5)


class TestCohensKappa:
    def test_hand_computed(self, spark_session):
        # classic 2x2 example: N=100, agree=70 (45 yes-yes, 25
        # no-no), A: 50 yes / 50 no, B: 55 yes... build explicitly:
        # a_yes=50 (45 agree + 5 b_no), a_no=50 (25 agree + 25 b_yes)
        rows = ([('y', 'y')] * 45 + [('y', 'n')] * 5
                + [('n', 'y')] * 25 + [('n', 'n')] * 25)
        df = spark_session.createDataFrame(rows, 'a string, b string')
        r = cohens_kappa(df, 'a', 'b').collect()[0]
        assert r['n_items'] == 100 and r['n_agree'] == 70
        # chance = 50*70 + 50*30 = 5000; kappa = (7000-5000)/(10000-5000)
        assert r['chance_pairs'] == 5000
        assert r['kappa_u6'] == 400000

    def test_perfect_and_degenerate(self, spark_session):
        perfect = spark_session.createDataFrame(
            [('x', 'x'), ('y', 'y')], 'a string, b string')
        assert cohens_kappa(perfect, 'a', 'b').collect()[0][
            'kappa_u6'] == 1000000
        # both raters constant: chance agreement total -> undefined
        const = spark_session.createDataFrame(
            [('x', 'x'), ('x', 'x')], 'a string, b string')
        assert cohens_kappa(const, 'a', 'b').collect()[0][
            'kappa_u6'] is None


class TestLengthBucketBatches:
    def test_hand_computed(self, spark_session):
        # bucket width 10, batch size 2
        rows = [(1, 9), (2, 8), (3, 7), (4, 15), (5, 11)]
        df = spark_session.createDataFrame(
            rows, 'doc_id long, n_tokens long')
        out = {(r['bucket'], r['batch_id']): r
               for r in length_bucket_batches(
                   df, bucket_width=10, batch_size=2).collect()}
        # bucket 1: lens 9,8,7 -> batch 0 = (9,8), batch 1 = (7)
        b0 = out[(1, 0)]
        assert b0['n_seqs'] == 2 and b0['max_len'] == 9
        assert b0['sum_tokens'] == 17 and b0['padded_tokens'] == 18
        assert b0['efficiency_u6'] == round(17 / 18 * 1e6)
        assert out[(1, 1)]['n_seqs'] == 1
        # bucket 2: lens 15,11 -> one batch, pad to 15
        b2 = out[(2, 0)]
        assert b2['padded_tokens'] == 30 and b2['sum_tokens'] == 26

    def test_deterministic_tie_break(self, spark_session):
        # equal lengths order by id, so batch composition is stable
        rows = [(i, 10) for i in range(5)]
        df = spark_session.createDataFrame(
            rows, 'doc_id long, n_tokens long')
        a = sorted(map(tuple, length_bucket_batches(
            df, bucket_width=16, batch_size=2).collect()))
        b = sorted(map(tuple, length_bucket_batches(
            df.repartition(5), bucket_width=16,
            batch_size=2).collect()))
        assert a == b

    def test_bad_args(self, spark_session):
        df = spark_session.createDataFrame(
            [(1, 5)], 'doc_id long, n_tokens long')
        with pytest.raises(ValueError):
            length_bucket_batches(df, batch_size=0)


def test_cohens_kappa_disjoint_label_sets(spark_session):
    """Raters using disjoint label vocabularies have ZERO chance
    agreement (empty marginal intersection), not NULL — kappa is
    then agree/N over 1, i.e. 0 when they never agree."""
    df = spark_session.createDataFrame(
        [('x', 'p'), ('y', 'q')], 'a string, b string')
    r = cohens_kappa(df, 'a', 'b').collect()[0]
    assert r['chance_pairs'] == 0
    assert r['kappa_u6'] == 0
