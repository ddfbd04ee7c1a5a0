"""Tests for distribution-drift diagnostics."""
import math

import pytest

from ons_utils_spark.operators.drift import (
    chi2_drift, js_divergence, token_counts_by_group,
)


def _df(spark_session, rows):
    return spark_session.createDataFrame(
        rows, 'g string, text string')


class TestJsDivergence:
    def test_identical_distributions_zero(self, spark_session):
        df = _df(spark_session, [('a', 'x y x'), ('b', 'x y x')])
        r = js_divergence(df, 'g', 'a', 'b').collect()[0]
        assert r['jsd'] == pytest.approx(0.0, abs=1e-12)
        assert r['n_tokens_a'] == 3 and r['n_tokens_b'] == 3
        assert r['vocab'] == 2

    def test_disjoint_supports_ln2(self, spark_session):
        df = _df(spark_session, [('a', 'x x'), ('b', 'y y')])
        r = js_divergence(df, 'g', 'a', 'b').collect()[0]
        assert r['jsd'] == pytest.approx(math.log(2), abs=1e-12)

    def test_hand_computed(self, spark_session):
        """P = {x: 1}, Q = {x: .5, y: .5} → M = {x: .75, y: .25};
        JSD = (1·ln(1/.75) + .5·ln(.5/.75) + .5·ln(.5/.25)) / 2."""
        df = _df(spark_session, [('a', 'x x'), ('b', 'x y')])
        want = (math.log(4 / 3)
                + 0.5 * math.log(2 / 3) + 0.5 * math.log(2)) / 2
        r = js_divergence(df, 'g', 'a', 'b').collect()[0]
        assert r['jsd'] == pytest.approx(want, abs=1e-12)

    def test_other_groups_excluded(self, spark_session):
        df = _df(spark_session,
                 [('a', 'x'), ('b', 'x'), ('c', 'zzz zzz')])
        r = js_divergence(df, 'g', 'a', 'b').collect()[0]
        assert r['jsd'] == pytest.approx(0.0, abs=1e-12)
        assert r['vocab'] == 1


class TestChi2Drift:
    def test_identical_zero(self, spark_session):
        df = _df(spark_session, [('a', 'x y'), ('b', 'x y')])
        r = chi2_drift(df, 'g', 'a', 'b').collect()[0]
        assert r['chi2'] == pytest.approx(0.0, abs=1e-12)
        assert r['dof'] == 1

    def test_hand_computed_2x2(self, spark_session):
        """Counts: a={x:3, y:1}, b={x:1, y:3} → classic 2×2 table,
        expected = 4·4/8 = 2 per cell, chi2 = 4 cells × (1²/2) = 2."""
        df = _df(spark_session, [('a', 'x x x y'), ('b', 'x y y y')])
        r = chi2_drift(df, 'g', 'a', 'b').collect()[0]
        assert r['chi2'] == pytest.approx(2.0, abs=1e-12)

    def test_token_counts_shape(self, spark_session):
        df = _df(spark_session, [('a', 'x  y\tx'), ('b', '')])
        got = {(r['g'], r['token']): r['c']
               for r in token_counts_by_group(df, 'g').collect()}
        assert got == {('a', 'x'): 2, ('a', 'y'): 1}
