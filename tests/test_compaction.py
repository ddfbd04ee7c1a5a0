"""Tests for small-file compaction (sources/compaction.py)."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources import compaction as cp


@pytest.fixture
def orders(spark_session):
    return spark_session.read.parquet(
        '/root/testdata/sf0.001/orders.parquet'
    )


@pytest.fixture
def fragmented(tmp_path, orders):
    """A deliberately shattered flat table: 32 tiny files."""
    path = str(tmp_path / 'frag')
    orders.repartition(32).write.parquet(path)
    return path


def _n_files(spark, path):
    return (
        cp.file_stats(spark, path)
        .agg(F.sum('n_files')).collect()[0][0]
    )


class TestStatsAndPlan:
    def test_file_stats_counts_files(self, spark_session, fragmented):
        stats = cp.file_stats(spark_session, fragmented).collect()
        assert len(stats) == 1 and stats[0]['dir'] == ''
        assert stats[0]['n_files'] == 32
        assert stats[0]['total_bytes'] > 0

    def test_plan_budget(self, spark_session, fragmented):
        plan = cp.compaction_plan(
            spark_session, fragmented, target_bytes=1 << 40
        ).collect()
        assert plan[0]['n_out'] == 1
        assert plan[0]['needs_compaction']

    def test_compact_directory_is_left_alone(self, spark_session,
                                             tmp_path, orders):
        path = str(tmp_path / 'one')
        orders.coalesce(1).write.parquet(path)
        plan = cp.compaction_plan(
            spark_session, path, target_bytes=1 << 40
        ).collect()
        assert not plan[0]['needs_compaction']

    def test_bad_target_raises(self, spark_session, fragmented):
        with pytest.raises(ValueError):
            cp.compaction_plan(spark_session, fragmented, 0)


class TestCompactFlat:
    def test_round_robin_compaction(self, spark_session, tmp_path,
                                    orders, fragmented):
        dst = str(tmp_path / 'out')
        cp.compact_table(
            spark_session, fragmented, dst, target_bytes=1 << 40
        )
        assert _n_files(spark_session, dst) == 1
        out = spark_session.read.parquet(dst)
        assert out.count() == orders.count()
        cents = F.sum(
            F.round(F.col('o_totalprice') * 100).cast('bigint'))
        a = out.agg(cents, F.sum('o_orderkey')).collect()
        b = orders.agg(cents, F.sum('o_orderkey')).collect()
        assert a == b

    def test_sort_by_keeps_clustering(self, spark_session, tmp_path,
                                      orders, fragmented):
        dst = str(tmp_path / 'sorted')
        # force several output files, range-clustered on o_orderkey
        total = cp.file_stats(
            spark_session, fragmented
        ).agg(F.sum('total_bytes')).collect()[0][0]
        cp.compact_table(
            spark_session, fragmented, dst,
            target_bytes=max(1, total // 4), sort_by=['o_orderkey'],
        )
        spans = (
            spark_session.read.parquet(dst)
            .select('o_orderkey', F.input_file_name().alias('f'))
            .groupBy('f')
            .agg(F.min('o_orderkey').alias('lo'),
                 F.max('o_orderkey').alias('hi'))
            .orderBy('lo').collect()
        )
        assert len(spans) >= 2
        # o_orderkey is unique: range partitions must not overlap
        for prev, cur in zip(spans, spans[1:]):
            assert prev['hi'] < cur['lo']

    def test_src_eq_dst_raises(self, spark_session, fragmented):
        with pytest.raises(ValueError):
            cp.compact_table(spark_session, fragmented, fragmented)


class TestCompactPartitioned:
    def test_per_partition_budgets(self, spark_session, tmp_path,
                                   orders):
        src = str(tmp_path / 'part_frag')
        (
            orders.withColumn('status', F.col('o_orderstatus'))
            .repartition(16)
            .write.partitionBy('status').parquet(src)
        )
        plan = {
            r['dir']: r for r in cp.compaction_plan(
                spark_session, src, target_bytes=1 << 40).collect()
        }
        assert all(d.startswith('status=') for d in plan)
        dst = str(tmp_path / 'part_out')
        cp.compact_table(
            spark_session, src, dst, target_bytes=1 << 40,
            partition_by=['status'], slot_by=['o_orderkey'],
        )
        out_stats = {
            r['dir']: r for r in
            cp.file_stats(spark_session, dst).collect()
        }
        assert set(out_stats) == set(plan)
        for d, r in out_stats.items():
            assert r['n_files'] <= plan[d]['n_out']
        src_df = spark_session.read.parquet(src)
        dst_df = spark_session.read.parquet(dst)
        assert dst_df.count() == src_df.count()
        a = sorted(
            (r['status'], r['n']) for r in
            dst_df.groupBy('status').agg(
                F.count(F.lit(1)).alias('n')).collect()
        )
        b = sorted(
            (r['status'], r['n']) for r in
            src_df.groupBy('status').agg(
                F.count(F.lit(1)).alias('n')).collect()
        )
        assert a == b

    def test_partition_by_mismatch_raises(self, spark_session,
                                          tmp_path, orders,
                                          fragmented):
        with pytest.raises(ValueError):
            cp.compact_table(
                spark_session, fragmented, str(tmp_path / 'x'),
                partition_by=['status'],
            )

    def test_escaped_and_null_partitions_keep_budgets(
            self, spark_session, tmp_path):
        # ':' forces Hive %-escaping in the dir name; None becomes
        # __HIVE_DEFAULT_PARTITION__ — both previously fell out of
        # the budget join (plain ==) and collapsed to ONE output file
        rows = [(i, 'a:b' if i % 3 == 0 else
                 (None if i % 3 == 1 else 'plain'))
                for i in range(300)]
        df = spark_session.createDataFrame(rows, 'id long, k string')
        src = str(tmp_path / 'esc_src')
        df.repartition(8).write.partitionBy('k').parquet(src)
        plan = {r['dir']: r for r in cp.compaction_plan(
            spark_session, src, target_bytes=2000).collect()}
        assert any('%3A' in d for d in plan), sorted(plan)
        assert any('__HIVE_DEFAULT_PARTITION__' in d for d in plan)
        dst = str(tmp_path / 'esc_dst')
        cp.compact_table(
            spark_session, src, dst, target_bytes=2000,
            partition_by=['k'], slot_by=['id'])
        out = {r['dir']: r for r in cp.file_stats(
            spark_session, dst).collect()}
        # every partition (escaped + null included) got MORE than the
        # single file the broken join produced, up to its own budget
        for d, r in out.items():
            assert r['n_files'] <= plan[d]['n_out']
            if plan[d]['n_out'] > 1:
                assert r['n_files'] > 1, d
        src_df = spark_session.read.parquet(src)
        dst_df = spark_session.read.parquet(dst)
        assert dst_df.count() == src_df.count() == 300
        # null-partition rows survive as NULLs, escaped values intact
        assert dst_df.filter(F.col('k').isNull()).count() == 100
        assert dst_df.filter(F.col('k') == 'a:b').count() == 100


class TestLayoutSidecar:
    def test_compaction_records_contract(self, spark_session,
                                         tmp_path):
        import os

        from ons_utils_spark.sources import compaction as cp
        from ons_utils_spark.sources.shards import (
            TABLE_LAYOUT_SIDECAR, read_layout_sidecar)
        src, dst = str(tmp_path / 's'), str(tmp_path / 'd')
        spark_session.range(100).withColumn(
            'k', (F.col('id') % 7)).repartition(6) \
            .write.parquet(src)
        cp.compact_table(spark_session, src, dst,
                         target_bytes=1 << 20, sort_by=['k'])
        meta = read_layout_sidecar(
            spark_session, dst, name=TABLE_LAYOUT_SIDECAR)
        assert meta['kind'] == 'compaction'
        assert meta['sort_by'] == ['k']
        assert meta['partition_by'] == []
        assert meta['target_bytes'] == 1 << 20
        # hidden: invisible to a parquet scan of the directory
        assert spark_session.read.parquet(dst).count() == 100
        assert os.path.exists(
            os.path.join(dst, TABLE_LAYOUT_SIDECAR))

    def test_partitioned_compaction_records_contract(
            self, spark_session, tmp_path):
        from ons_utils_spark.sources import compaction as cp
        from ons_utils_spark.sources.shards import (
            TABLE_LAYOUT_SIDECAR, read_layout_sidecar)
        src, dst = str(tmp_path / 's'), str(tmp_path / 'd')
        spark_session.range(60).withColumn(
            'p', (F.col('id') % 2).cast('string')) \
            .repartition(4).write.partitionBy('p').parquet(src)
        cp.compact_table(spark_session, src, dst,
                         target_bytes=1 << 20, partition_by=['p'])
        meta = read_layout_sidecar(
            spark_session, dst, name=TABLE_LAYOUT_SIDECAR)
        assert meta['kind'] == 'compaction'
        assert meta['partition_by'] == ['p']
        assert meta['sort_by'] == []

    def test_shard_sidecar_name_not_reused(self, spark_session,
                                           tmp_path):
        # a compacted table must never be misread as a shard layout
        from ons_utils_spark.sources import compaction as cp
        from ons_utils_spark.sources.shards import read_layout_sidecar
        src, dst = str(tmp_path / 's'), str(tmp_path / 'd')
        spark_session.range(10).repartition(2).write.parquet(src)
        cp.compact_table(spark_session, src, dst)
        assert read_layout_sidecar(spark_session, dst) is None
