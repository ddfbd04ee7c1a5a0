"""Bloom filter: perfect recall, path agreement (UDF bitmap vs
declarative join), mergeability, NULL handling, and sizing guards."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.bloom import (
    bloom_bit_positions,
    bloom_build,
    bloom_merge,
    bloom_might_contain,
    bloom_probe_join,
    bloom_to_bitmap,
)

M, K = 1 << 12, 5


@pytest.fixture
def corpus(spark_session):
    return spark_session.createDataFrame(
        [(f'key{i}',) for i in range(200)], 'k string')


@pytest.fixture
def probes(spark_session):
    # 50 members, 250 non-members, one NULL
    rows = [(f'key{i}',) for i in range(150, 400)] + [(None,)]
    return spark_session.createDataFrame(rows, 'k string')


class TestBloom:
    def test_recall_is_total(self, corpus):
        """Every inserted key MUST probe true — Bloom filters have
        false positives, never false negatives."""
        bitmap = bloom_to_bitmap(bloom_build(corpus, 'k', M, K), M)
        flags = corpus.select(
            bloom_might_contain('k', bitmap, M, K).alias('f')).collect()
        assert all(r['f'] for r in flags)

    def test_udf_and_join_paths_agree(self, corpus, probes):
        """The zero-shuffle bitmap UDF and the declarative
        explode+broadcast-join probe are the SAME function — on
        members, non-members (incl. any false positives), and NULL."""
        bloom = bloom_build(corpus, 'k', M, K)
        bitmap = bloom_to_bitmap(bloom, M)
        udf = {r['k']: r['f'] for r in probes.select(
            'k', bloom_might_contain('k', bitmap, M, K).alias('f'))
            .collect()}
        join = {r['k']: r['might_contain'] for r in
                bloom_probe_join(probes, 'k', bloom, M, K).collect()}
        assert udf == join
        assert udf[None] is None
        assert all(udf[f'key{i}'] for i in range(150, 200))

    def test_definitely_absent_dominates(self, corpus, spark_session):
        """At a generous num_bits the filter rejects essentially all
        non-members (FP rate (1-e^(-kn/m))^k ~ 1e-7 here)."""
        big_m = 1 << 16
        bitmap = bloom_to_bitmap(
            bloom_build(corpus, 'k', big_m, K), big_m)
        others = spark_session.createDataFrame(
            [(f'other{i}',) for i in range(500)], 'k string')
        flagged = others.where(
            bloom_might_contain('k', bitmap, big_m, K)).count()
        assert flagged == 0

    def test_merge_equals_combined_build(self, corpus, spark_session):
        extra = spark_session.createDataFrame(
            [(f'zzz{i}',) for i in range(40)], 'k string')
        merged = bloom_to_bitmap(
            bloom_merge(bloom_build(corpus, 'k', M, K),
                        bloom_build(extra, 'k', M, K)), M)
        combined = bloom_to_bitmap(
            bloom_build(corpus.unionByName(extra), 'k', M, K), M)
        assert np.array_equal(merged, combined)

    def test_null_keys_skipped_on_build(self, spark_session):
        """NULL is not a value: building over NULLs inserts nothing."""
        df = spark_session.createDataFrame(
            [(None,), ('a',)], 'k string')
        bloom = bloom_build(df, 'k', M, K)
        only_a = bloom_build(df.where(F.col('k').isNotNull()),
                             'k', M, K)
        assert (sorted(map(tuple, bloom.collect()))
                == sorted(map(tuple, only_a.collect())))

    def test_positions_deterministic_and_in_range(self, spark_session):
        df = spark_session.createDataFrame([('x',)], 'k string')
        pos = df.select(
            bloom_bit_positions('k', M, K).alias('p')).first()['p']
        assert len(pos) == K
        assert all(0 <= p < M for p in pos)
        again = df.select(
            bloom_bit_positions('k', M, K).alias('p')).first()['p']
        assert pos == again

    def test_word_table_is_bounded(self, corpus):
        rows = bloom_build(corpus, 'k', M, K).collect()
        assert len(rows) <= M // 32
        assert all(0 <= r['word_idx'] < M // 32 for r in rows)
        # 32-bit lanes: bits 32..63 are never set (engine-portable
        # shifts — 1 << 63 overflows replaying engines' BIGINT)
        assert all(0 <= r['word'] <= 0xFFFFFFFF for r in rows)

    def test_sizing_guards(self, corpus):
        with pytest.raises(ValueError, match='multiple of 32'):
            bloom_build(corpus, 'k', 100, K)
        with pytest.raises(ValueError, match='num_hashes'):
            bloom_build(corpus, 'k', M, 0)
        with pytest.raises(ValueError, match='words'):
            bloom_might_contain('k', np.zeros(3, np.uint32), M, K)
        with pytest.raises(ValueError, match='at least one'):
            bloom_merge()
