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

    def test_bucket_prunes_corpus(self, corpus):
        bucketed = sim.random_hyperplane_lsh(
            corpus, dim=64, num_planes=6
        )
        n_buckets = bucketed.select('lsh_bucket').distinct().count()
        assert n_buckets > 4  # corpus actually splits
