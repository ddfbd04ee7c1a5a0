"""Reciprocal-rank fusion: agreement boost, k-damping, determinism."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.fusion import rrf_fuse


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, 'doc_id bigint, rank int')


class TestRrfFuse:
    def test_agreement_beats_single_source_head(self, spark_session):
        """A doc ranked 2nd by BOTH sources must outrank docs each
        source put 1st but the other missed — the core RRF behavior
        (1/62+1/62 > 1/61)."""
        a = _ranking(spark_session, [(10, 1), (99, 2), (11, 3)])
        b = _ranking(spark_session, [(20, 1), (99, 2), (21, 3)])
        out = {r['doc_id']: (r['rrf_rank'], r['n_sources'])
               for r in rrf_fuse([a, b]).collect()}
        assert out[99][0] == 1 and out[99][1] == 2
        assert {out[10][0], out[20][0]} == {2, 3}

    def test_scores_are_exact_integer_reciprocals(self, spark_session):
        a = _ranking(spark_session, [(1, 1), (2, 2)])
        b = _ranking(spark_session, [(2, 1)])
        got = {r['doc_id']: r['rrf_score']
               for r in rrf_fuse([a, b], k=60).collect()}
        assert got[1] == 1_000_000_000 // 61
        assert got[2] == 1_000_000_000 // 62 + 1_000_000_000 // 61

    def test_ties_break_by_id(self, spark_session):
        a = _ranking(spark_session, [(5, 1), (3, 2)])
        b = _ranking(spark_session, [(3, 1), (5, 2)])
        ranks = [r['doc_id'] for r in sorted(
            rrf_fuse([a, b]).collect(), key=lambda r: r['rrf_rank'])]
        assert ranks == [3, 5]  # identical score -> id asc

    def test_top_k_truncates(self, spark_session):
        a = _ranking(spark_session, [(i, i) for i in range(1, 9)])
        out = rrf_fuse([a], top_k=3).collect()
        assert sorted(r['rrf_rank'] for r in out) == [1, 2, 3]

    def test_single_ranking_preserves_order(self, spark_session):
        a = _ranking(spark_session, [(7, 1), (8, 2), (9, 3)])
        out = sorted(rrf_fuse([a]).collect(),
                     key=lambda r: r['rrf_rank'])
        assert [r['doc_id'] for r in out] == [7, 8, 9]

    def test_validation(self, spark_session):
        with pytest.raises(ValueError, match='at least one'):
            rrf_fuse([])
        a = _ranking(spark_session, [(1, 1)])
        with pytest.raises(ValueError, match='positive'):
            rrf_fuse([a], k=0)

    def test_matches_float_rrf_order(self, spark_session):
        """The integer variant must order like the textbook float
        formula on a non-trivial fixture."""
        import random
        rng = random.Random(3)
        docs = list(range(40))
        ra = sorted(docs, key=lambda d: rng.random())[:15]
        rb = sorted(docs, key=lambda d: rng.random())[:15]
        a = _ranking(spark_session,
                     [(d, i + 1) for i, d in enumerate(ra)])
        b = _ranking(spark_session,
                     [(d, i + 1) for i, d in enumerate(rb)])
        got = [r['doc_id'] for r in sorted(
            rrf_fuse([a, b]).collect(), key=lambda r: r['rrf_rank'])]
        fl = {}
        for rk, d in enumerate(ra):
            fl[d] = fl.get(d, 0) + 1.0 / (60 + rk + 1)
        for rk, d in enumerate(rb):
            fl[d] = fl.get(d, 0) + 1.0 / (60 + rk + 1)
        exp = [d for d, _ in sorted(fl.items(),
                                    key=lambda kv: (-kv[1], kv[0]))]
        assert got == exp
