"""Tests for the persisted IVF ANN index (build / append / search)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import ann_index as ai
from ons_utils_spark.operators import similarity as sim


@pytest.fixture
def corpus(spark_session):
    return spark_session.read.parquet(
        '/root/testdata/sf0.001/embeddings.parquet'
    )


@pytest.fixture
def index_path(tmp_path, spark_session, corpus):
    path = str(tmp_path / 'ivf')
    ai.build_ivf_index(corpus, path, n_clusters=8, iters=1)
    return path


def _queries(corpus, n=3):
    return corpus.filter(F.col('vec_id') < n).select(
        F.col('vec_id').alias('query_id'),
        F.col('embedding').alias('query_vec'),
    )


class TestBuildAndSearch:
    def test_self_duplicate_is_top1(self, spark_session, corpus,
                                    index_path):
        out = ai.ivf_index_search(
            spark_session, index_path, _queries(corpus), k=5, nprobe=2,
        ).collect()
        by_query = {}
        for r in out:
            by_query.setdefault(r['query_id'], []).append(r)
        for qid, rows in by_query.items():
            # each query vector is itself in the index: guaranteed
            # found (identical vector -> identical top-1 cluster)
            assert rows[0]['vec_id'] == qid
            assert rows[0]['cosine'] == pytest.approx(1.0, abs=1e-9)

    def test_full_probe_matches_brute_force(self, spark_session,
                                            corpus, index_path):
        exact = {
            (r['query_id'], r['vec_id'])
            for r in sim.cosine_topk(corpus, _queries(corpus),
                                     k=4).collect()
        }
        pruned = {
            (r['query_id'], r['vec_id'])
            for r in ai.ivf_index_search(
                spark_session, index_path, _queries(corpus),
                k=4, nprobe=8,  # nprobe == n_clusters: exhaustive
            ).collect()
        }
        assert pruned == exact

    def test_centroid_roundtrip(self, spark_session, corpus, tmp_path):
        path = str(tmp_path / 'ivf2')
        cents = ai.build_ivf_index(corpus, path, n_clusters=4, iters=1)
        loaded = ai.load_ivf_centroids(spark_session, path)
        np.testing.assert_array_equal(cents, loaded)


class TestPartitionPruning:
    def test_probed_scan_reads_only_probed_partitions(
            self, spark_session, index_path):
        pruned = spark_session.read.parquet(
            index_path + '/vectors'
        ).filter(F.col('cluster').isin([0, 3]))
        # DataFrame.inputFiles() lists the UNPRUNED relation; the
        # files actually opened at execution are the pruned set
        files = [
            r[0] for r in
            pruned.select(F.input_file_name()).distinct().collect()
        ]
        assert files, 'expected at least one surviving file'
        assert all(
            ('cluster=0' in f) or ('cluster=3' in f) for f in files
        )

    def test_search_plan_contains_partition_filter(
            self, spark_session, corpus, index_path):
        out = ai.ivf_index_search(
            spark_session, index_path, _queries(corpus), k=3, nprobe=1,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert 'PartitionFilters' in plan


class TestAppend:
    def test_appended_batch_is_searchable(self, spark_session, corpus,
                                          index_path):
        # clone query 0's embedding under a fresh id: the ingest path
        clone = corpus.filter(F.col('vec_id') == 0).select(
            (F.col('vec_id') + F.lit(7_000_000)).alias('vec_id'),
            'embedding',
        )
        ai.ivf_index_append(clone, index_path)
        out = ai.ivf_index_search(
            spark_session, index_path,
            _queries(corpus, n=1), k=2, nprobe=1,
        ).collect()
        got = [r['vec_id'] for r in out]
        # identical vector: both the original and the appended clone
        # rank at cosine 1.0, id-ascending
        assert got == [0, 7_000_000]

    def test_append_preserves_existing_rows(self, spark_session,
                                            corpus, index_path):
        before = spark_session.read.parquet(
            index_path + '/vectors').count()
        clone = corpus.filter(F.col('vec_id') <= 1).select(
            (F.col('vec_id') + F.lit(7_000_000)).alias('vec_id'),
            'embedding',
        )
        ai.ivf_index_append(clone, index_path)
        after = spark_session.read.parquet(
            index_path + '/vectors').count()
        assert after == before + 2


class TestStats:
    def test_stats_cover_all_rows(self, spark_session, corpus,
                                  index_path):
        stats = ai.ivf_index_stats(spark_session, index_path).collect()
        assert sum(r['n_rows'] for r in stats) == corpus.count()
        assert all(r['n_files'] >= 1 for r in stats)
        clusters = [r['cluster'] for r in stats]
        assert clusters == sorted(clusters)
