"""Tests for similarity search (brute-force + LSH)."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import similarity as sim


@pytest.fixture
def corpus(spark_session):
    emb = spark_session.read.parquet(
        '/root/testdata/sf0.001/embeddings.parquet'
    )
    return emb


class TestCosineTopK:
    def test_self_similarity_is_top(self, corpus):
        queries = corpus.filter(F.col('vec_id') == 0).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        out = sim.cosine_topk(corpus, queries, k=5).collect()
        assert out[0]['vec_id'] == 0  # itself, cosine 1.0
        assert out[0]['cosine'] == pytest.approx(1.0, abs=1e-6)
        cos = [r['cosine'] for r in out]
        assert cos == sorted(cos, reverse=True)

    def test_k_rows_per_query(self, corpus):
        queries = corpus.filter(F.col('vec_id') < 4).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        out = sim.cosine_topk(corpus, queries, k=3)
        counts = out.groupBy('query_id').count().collect()
        assert all(r['count'] == 3 for r in counts)
        assert len(counts) == 4


class TestLshTopK:
    def test_recall_vs_brute_force(self, corpus):
        """LSH with few planes must recover a decent share of the true
        top-10 (same bucket ⇒ similar vectors)."""
        queries = corpus.filter(F.col('vec_id') < 5).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        exact = sim.cosine_topk(corpus, queries, k=10)
        approx = sim.lsh_topk(corpus, queries, k=10, dim=64, num_planes=2)
        exact_set = {(r['query_id'], r['vec_id'])
                     for r in exact.collect()}
        approx_set = {(r['query_id'], r['vec_id'])
                      for r in approx.collect()}
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.3, f'recall too low: {recall}'

    def test_multiprobe_raises_recall(self, corpus):
        """Probing the smallest-margin bit flips must recover at least
        as much of the exact top-10 as single-bucket LSH, and strictly
        more candidates."""
        queries = corpus.filter(F.col('vec_id') < 5).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        exact = {(r['query_id'], r['vec_id'])
                 for r in sim.cosine_topk(corpus, queries, k=10).collect()}

        def recall(probes):
            got = {(r['query_id'], r['vec_id'])
                   for r in sim.lsh_topk(
                       corpus, queries, k=10, dim=64, num_planes=4,
                       probes=probes).collect()}
            return len(exact & got) / len(exact)

        # Deterministic (hyperplanes are seed-derived, data fixed):
        # measured 0.26 @ probes=0 vs 0.58 @ probes=4 on sf0.001.
        r0, r4 = recall(0), recall(4)
        assert r4 > r0
        assert r4 >= 0.5, f'multi-probe recall too low: {r4}'

    def test_multiprobe_no_duplicate_pairs(self, corpus):
        queries = corpus.filter(F.col('vec_id') < 3).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        out = sim.lsh_topk(corpus, queries, k=1000, dim=64,
                           num_planes=4, probes=4).collect()
        pairs = [(r['query_id'], r['vec_id']) for r in out]
        assert len(pairs) == len(set(pairs))

    def test_probes_validation(self, corpus):
        queries = corpus.limit(1).select(
            F.col('vec_id').alias('query_id'),
            F.col('embedding').alias('query_vec'),
        )
        with pytest.raises(ValueError, match='probes'):
            sim.lsh_topk(corpus, queries, num_planes=4, probes=5)

    def test_bucket_prunes_corpus(self, corpus):
        bucketed = sim.random_hyperplane_lsh(
            corpus, dim=64, num_planes=6
        )
        n_buckets = bucketed.select('lsh_bucket').distinct().count()
        assert n_buckets > 4  # corpus actually splits
