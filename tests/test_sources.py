"""Tests for readers/writers incl. bucketed co-located joins."""
import os

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from ons_utils_spark.sources.readers import (
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    write_parquet,
)


class TestReaders:
    def test_parquet_nanos_timestamps(self, spark_session):
        # events.ts is parquet TIMESTAMP(NANOS) — illegal for a plain
        # spark.read.parquet; read_parquet must handle it.
        df = read_parquet(
            spark_session, '/root/testdata/sf0.001/events.parquet'
        )
        assert dict(df.dtypes)['ts'] == 'timestamp'
        assert df.count() == 1000

    def test_load_tables_registers_views(self, spark_session):
        t = load_tables(
            spark_session, '/root/testdata/sf0.001',
            tables=['region', 'nation'], register_views=True,
        )
        assert set(t) == {'region', 'nation'}
        assert spark_session.sql(
            'SELECT count(*) AS n FROM region'
        ).collect()[0]['n'] == 5

    def test_csv_roundtrip(self, spark_session, tmp_path):
        df = spark_session.createDataFrame(
            [(1, 'a'), (2, 'b')], 'id bigint, name string'
        )
        path = str(tmp_path / 'out_csv')
        df.write.mode('overwrite').option('header', True).csv(path)
        back = read_csv(spark_session, path,
                        schema='id bigint, name string')
        assert sorted((r['id'], r['name']) for r in back.collect()) \
            == [(1, 'a'), (2, 'b')]

    def test_json_roundtrip(self, spark_session, tmp_path):
        df = spark_session.createDataFrame(
            [(1, 'a')], 'id bigint, name string'
        )
        path = str(tmp_path / 'out_json')
        df.write.mode('overwrite').json(path)
        back = read_json(spark_session, path,
                         schema='id bigint, name string')
        assert back.collect()[0]['name'] == 'a'

    def test_write_parquet_partitioned(self, spark_session, tmp_path):
        df = spark_session.createDataFrame(
            [(1, 'x', 1.0), (2, 'y', 2.0)],
            'id bigint, part string, v double',
        )
        path = str(tmp_path / 'out_parquet')
        write_parquet(df, path, partition_by=['part'])
        assert os.path.isdir(os.path.join(path, 'part=x'))
        back = read_parquet(spark_session, path)
        assert back.count() == 2


class TestBucketing:
    def test_cobucketed_join_has_no_shuffle(self, spark_session):
        orders = read_parquet(
            spark_session, '/root/testdata/sf0.001/orders.parquet'
        )
        lineitem = read_parquet(
            spark_session, '/root/testdata/sf0.001/lineitem.parquet'
        )
        write_bucketed(
            orders.withColumnRenamed('o_orderkey', 'key'),
            'orders_b', bucket_by='key', num_buckets=4, sort_by='key',
        )
        write_bucketed(
            lineitem.withColumnRenamed('l_orderkey', 'key'),
            'lineitem_b', bucket_by='key', num_buckets=4, sort_by='key',
        )
        threshold = spark_session.conf.get(
            'spark.sql.autoBroadcastJoinThreshold'
        )
        try:
            # disable broadcast so the planner must choose between a
            # shuffled and a bucket-co-located sort-merge join
            spark_session.conf.set(
                'spark.sql.autoBroadcastJoinThreshold', '-1'
            )
            assert bucketed_join_is_shuffle_free(
                spark_session, 'orders_b', 'lineitem_b', on='key'
            )
            # and the join result is right
            n = (
                spark_session.table('orders_b')
                .join(spark_session.table('lineitem_b'), 'key')
                .count()
            )
            plain = orders.join(
                lineitem,
                orders['o_orderkey'] == lineitem['l_orderkey'],
            ).count()
            assert n == plain
        finally:
            spark_session.conf.set(
                'spark.sql.autoBroadcastJoinThreshold', threshold
            )
            spark_session.sql('DROP TABLE IF EXISTS orders_b')
            spark_session.sql('DROP TABLE IF EXISTS lineitem_b')

    def test_mismatched_buckets_detected(self, spark_session):
        region = read_parquet(
            spark_session, '/root/testdata/sf0.001/region.parquet'
        )
        write_bucketed(region, 'r4', bucket_by='r_regionkey',
                       num_buckets=4)
        write_bucketed(region, 'r8', bucket_by='r_regionkey',
                       num_buckets=8)
        try:
            # mismatched bucket counts may still avoid one side's
            # shuffle but not both; helper reports honestly
            result = bucketed_join_is_shuffle_free(
                spark_session, 'r4', 'r8', on='r_regionkey'
            )
            assert isinstance(result, bool)
        finally:
            spark_session.sql('DROP TABLE IF EXISTS r4')
            spark_session.sql('DROP TABLE IF EXISTS r8')


class TestXml:
    def test_xml_roundtrip(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_xml, write_xml

        df = spark_session.createDataFrame(
            [(1, 'a&b', 3.5), (2, '<tag>', None)],
            'id bigint, name string, score double')
        path = str(tmp_path / 'xml')
        write_xml(df, path, row_tag='rec', root_tag='records')
        back = read_xml(spark_session, path, row_tag='rec',
                        schema='id bigint, name string, score double')
        rows = {r['id']: r for r in back.collect()}
        assert rows[1]['name'] == 'a&b'      # entities round-trip
        assert rows[2]['name'] == '<tag>'
        assert rows[1]['score'] == 3.5
        assert rows[2]['score'] is None

    def test_xml_nested_structs(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_xml

        p = tmp_path / 'doc.xml'
        p.write_text(
            '<orders><order><id>7</id>'
            '<customer><name>acme</name><tier>2</tier></customer>'
            '<item><sku>x</sku></item><item><sku>y</sku></item>'
            '</order></orders>')
        df = read_xml(spark_session, str(p), row_tag='order')
        r = df.collect()[0]
        assert r['id'] == 7
        assert r['customer']['name'] == 'acme'
        assert [i['sku'] for i in r['item']] == ['x', 'y']


class TestOrc:
    def test_orc_roundtrip_with_pushdown(self, spark_session, tmp_path):
        from pyspark.sql import functions as F
        from ons_utils_spark.sources.readers import read_orc, write_orc

        df = spark_session.createDataFrame(
            [(i, f'n{i}') for i in range(100)], 'id bigint, name string')
        path = str(tmp_path / 'orc')
        write_orc(df, path)
        back = read_orc(spark_session, path)
        assert back.count() == 100
        filtered = back.filter(F.col('id') < 10)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert 'PushedFilters: [IsNotNull(id), LessThan(id,10)]' in plan
        assert filtered.count() == 10

    def test_orc_partitioned_write(self, spark_session, tmp_path):
        import os
        from ons_utils_spark.sources.readers import write_orc

        df = spark_session.createDataFrame(
            [('a', 1), ('b', 2)], 'k string, v bigint')
        path = str(tmp_path / 'orc_part')
        write_orc(df, path, partition_by=['k'])
        assert {d for d in os.listdir(path) if d.startswith('k=')} \
            == {'k=a', 'k=b'}


class TestRuntimeBloomFilter:
    """get_spark enables runtime bloom-filter join pruning; pin that
    the optimizer actually injects it on a selective fact-fact join
    (build-side agg + might_contain on the probe side)."""

    def test_bloom_filter_injected_for_selective_join(
            self, spark_session):
        from pyspark.sql import functions as F

        from ons_utils_spark.sources.readers import load_tables

        conf = spark_session.conf
        saved = {
            k: conf.get(k, None) for k in (
                'spark.sql.optimizer.runtime.bloomFilter.enabled',
                'spark.sql.optimizer.runtime.bloomFilter'
                '.applicationSideScanSizeThreshold',
                'spark.sql.autoBroadcastJoinThreshold',
            )
        }
        try:
            conf.set(
                'spark.sql.optimizer.runtime.bloomFilter.enabled',
                'true')
            # Test tables are tiny; drop the size gates so the rule
            # fires the way it would on fact-scale inputs.
            conf.set('spark.sql.optimizer.runtime.bloomFilter'
                     '.applicationSideScanSizeThreshold', '0')
            conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
            t = load_tables(spark_session, '/root/testdata/sf0.001')
            j = t['lineitem'].join(
                t['orders'].filter(
                    F.col('o_orderpriority') == '1-URGENT'),
                F.col('l_orderkey') == F.col('o_orderkey'))
            plan = j._jdf.queryExecution().optimizedPlan().toString()
            assert 'bloom_filter_agg' in plan
            assert 'might_contain' in plan
            # and it still computes the right thing
            assert j.count() == t['lineitem'].join(
                t['orders'], F.col('l_orderkey') == F.col('o_orderkey')
            ).filter(F.col('o_orderpriority') == '1-URGENT').count()
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)


class TestTextSinks:
    def test_csv_sink_roundtrip(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_csv, write_csv

        df = spark_session.createDataFrame(
            [(1, 'a'), (2, 'b')], 'id bigint, v string')
        write_csv(df, str(tmp_path / 'csv_out'))
        back = read_csv(spark_session, str(tmp_path / 'csv_out'),
                        schema='id bigint, v string')
        assert sorted((r['id'], r['v']) for r in back.collect()) \
            == [(1, 'a'), (2, 'b')]

    def test_json_sink_roundtrip(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import (read_json,
                                                     write_json)

        df = spark_session.createDataFrame(
            [(1, [1.0, 2.0]), (2, [])], 'id bigint, xs array<double>')
        write_json(df, str(tmp_path / 'json_out'))
        back = read_json(spark_session, str(tmp_path / 'json_out'),
                         schema='id bigint, xs array<double>')
        got = {r['id']: r['xs'] for r in back.collect()}
        assert got[1] == [1.0, 2.0]
        assert got[2] in ([], None)  # empty array vs dropped key


class TestBinaryFileSource:
    def test_png_files_to_image_features(self, spark_session, tmp_path):
        """Ingestion edge of the multimodal pipeline: real PNG files
        on disk → binaryFile scan → decode → features."""
        import numpy as np

        from ons_utils_spark.operators.multimodal import image_features
        from ons_utils_spark.sources.readers import read_binary_files
        from tests.test_multimodal import _make_png

        media = tmp_path / 'media'
        media.mkdir()
        for i, (h, w) in enumerate([(4, 6), (3, 5), (8, 2)]):
            px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
            (media / f'img_{i}.png').write_bytes(
                _make_png(px, color_type=2))
        (media / 'notes.txt').write_text('not an image')

        files = read_binary_files(
            spark_session, str(media), glob='*.png')
        assert files.count() == 3  # txt filtered at listing time
        feats = image_features(
            files.withColumnRenamed('content', 'payload'),
            payload_col='payload', id_col='path')
        got = {r['width']: r['height'] for r in feats.collect()}
        assert got == {6: 4, 5: 3, 2: 8}

    def test_max_bytes_filter(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_binary_files

        d = tmp_path / 'blobs'
        d.mkdir()
        (d / 'small.bin').write_bytes(b'x' * 10)
        (d / 'large.bin').write_bytes(b'y' * 10_000)
        files = read_binary_files(spark_session, str(d), max_bytes=100)
        rows = files.collect()
        assert len(rows) == 1
        assert rows[0]['length'] == 10


class TestEnsureMinParallelism:
    def test_widens_coarse_input(self, spark_session):
        from ons_utils_spark.sources.readers import ensure_min_parallelism
        df = spark_session.range(1000).coalesce(1)
        widened = ensure_min_parallelism(df, min_partitions=8)
        assert widened.rdd.getNumPartitions() == 8
        assert widened.count() == 1000

    def test_noop_on_well_split_input(self, spark_session):
        """A scan already at/above target must NOT gain an exchange —
        the 100 TB case where inputs arrive well-split."""
        from ons_utils_spark.sources.readers import ensure_min_parallelism
        df = spark_session.range(1000).repartition(8)
        out = ensure_min_parallelism(df, min_partitions=4)
        assert out is df  # structurally unchanged, no added shuffle

    def test_default_target_is_session_parallelism(self, spark_session):
        from ons_utils_spark.sources.readers import ensure_min_parallelism
        df = spark_session.range(100).coalesce(1)
        out = ensure_min_parallelism(df)
        assert (out.rdd.getNumPartitions()
                == spark_session.sparkContext.defaultParallelism)


class TestReadText:
    def test_line_mode(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_text
        p = tmp_path / 'docs'
        p.mkdir()
        (p / 'a.txt').write_text('line one\nline two\n')
        (p / 'b.txt').write_text('line three\n')
        df = read_text(spark_session, str(p))
        assert sorted(r['value'] for r in df.collect()) \
            == ['line one', 'line three', 'line two']

    def test_whole_file_mode(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_text
        p = tmp_path / 'docs'
        p.mkdir()
        (p / 'a.txt').write_text('doc A\nwith two lines')
        (p / 'b.txt').write_text('doc B')
        df = read_text(spark_session, str(p), whole_file=True)
        got = sorted(r['value'] for r in df.collect())
        assert got == ['doc A\nwith two lines', 'doc B']

    def test_glob_filters_at_listing(self, spark_session, tmp_path):
        from ons_utils_spark.sources.readers import read_text
        p = tmp_path / 'docs'
        p.mkdir()
        (p / 'a.txt').write_text('keep')
        (p / 'b.log').write_text('drop')
        df = read_text(spark_session, str(p), glob='*.txt')
        assert [r['value'] for r in df.collect()] == ['keep']


class TestOptimizeWrite:
    def test_disjoint_file_ranges(self, spark_session, tmp_path):
        from ons_utils_spark.sources.layout import (
            file_stats, optimize_write,
        )
        df = spark_session.range(10000).selectExpr(
            '(id * 37) % 10000 AS k', 'id AS payload')
        out = str(tmp_path / 'laid_out')
        optimize_write(df, out, 'k', num_files=4)
        stats = [s for s in file_stats(out, 'k') if s[1] > 0]
        assert len(stats) >= 2
        assert sum(rows for _, rows, _, _ in stats) == 10000
        # range-partitioned: [min,max] intervals pairwise disjoint
        spans = sorted((lo, hi) for _, _, lo, hi in stats)
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, spans

    def test_max_records_per_file(self, spark_session, tmp_path):
        from ons_utils_spark.sources.layout import (
            file_stats, optimize_write,
        )
        df = spark_session.range(1000).selectExpr('id AS k')
        out = str(tmp_path / 'capped')
        optimize_write(df, out, 'k', num_files=1,
                       max_records_per_file=300)
        stats = [s for s in file_stats(out, 'k') if s[1] > 0]
        assert len(stats) >= 4
        assert all(rows <= 300 for _, rows, _, _ in stats)

    def test_skipping_actually_prunes(self, spark_session, tmp_path):
        """A point filter on the sort column must touch fewer bytes
        than the full scan (parquet min/max pruning)."""
        from ons_utils_spark.sources.layout import optimize_write
        df = spark_session.range(20000).selectExpr('id AS k',
                                                   'id % 7 AS v')
        out = str(tmp_path / 'pruned')
        optimize_write(df, out, 'k', num_files=8)
        back = spark_session.read.parquet(out)
        assert back.filter('k = 12345').count() == 1
        plan = back.filter('k = 12345')._jdf.queryExecution() \
            .explainString(
                spark_session._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString('formatted'))
        assert 'PushedFilters: [IsNotNull(k), EqualTo(k,12345)]' in plan


class TestSchemaEvolution:
    def test_merge_schema_reads_evolved_files(
            self, spark_session, tmp_path):
        """Files written before a column was added must read back as
        NULL in that column when merge_schema=True; the default
        (first-footer) read stays cheap for homogeneous tables."""
        from ons_utils_spark.sources.readers import read_parquet

        path = str(tmp_path / 'evolved')
        spark_session.createDataFrame(
            [(1, 'a')], 'id bigint, v string'
        ).write.mode('append').parquet(path)
        spark_session.createDataFrame(
            [(2, 'b', 9.5)], 'id bigint, v string, score double'
        ).write.mode('append').parquet(path)

        merged = read_parquet(spark_session, path, merge_schema=True)
        assert set(merged.columns) == {'id', 'v', 'score'}
        rows = {r['id']: r['score'] for r in merged.collect()}
        assert rows == {1: None, 2: 9.5}


class TestTrainingShards:
    def _ordered(self, spark, n=100):
        from ons_utils_spark.operators.sampling import (
            global_order_index)
        df = spark.createDataFrame(
            [(i, f'doc {i}') for i in range(n)],
            'doc_id bigint, text string')
        return global_order_index(df, 'doc_id', salt='e0')

    def test_layout_order_and_roundtrip(self, spark_session, tmp_path):
        import os
        from ons_utils_spark.sources.shards import (
            shard_manifest, write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=16)
        # directory per shard id
        dirs = sorted(d for d in os.listdir(path)
                      if d.startswith('shard='))
        assert dirs == [f'shard={s}' for s in range(7)]
        back = spark_session.read.parquet(path)
        assert back.count() == 100
        assert {r['doc_id'] for r in back.collect()} == set(range(100))
        # shard s holds exactly positions [16s, 16(s+1))
        man = {r['shard']: r for r in shard_manifest(
            spark_session, path).collect()}
        for s in range(7):
            lo, hi = 16 * s, min(16 * (s + 1), 100) - 1
            assert man[s]['min_pos'] == lo
            assert man[s]['max_pos'] == hi
            assert man[s]['n_rows'] == hi - lo + 1

    def test_rows_sorted_within_part_files(self, spark_session,
                                           tmp_path):
        """The loader streams part files sequentially — rows must be
        physically position-sorted inside each file, not just
        logically assigned to the right shard."""
        import glob

        import pyarrow.parquet as pq
        from ons_utils_spark.sources.shards import (
            write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=25,
                              partitions=4)
        for part in glob.glob(f'{path}/shard=*/part-*.parquet'):
            pos = pq.read_table(part, columns=['position']) \
                .column('position').to_pylist()
            assert pos == sorted(pos), part

    def test_rejects_bad_shard_size(self, spark_session):
        from ons_utils_spark.sources.shards import with_shard_id
        df = spark_session.range(3).withColumnRenamed('id', 'position')
        import pytest as _pt
        with _pt.raises(ValueError, match='positive'):
            with_shard_id(df, 0)

    def test_read_resumes_at_cursor(self, spark_session, tmp_path):
        from ons_utils_spark.sources.shards import (
            read_training_shards, write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=16)
        out = read_training_shards(
            spark_session, path, start_position=37, shard_size=16)
        got = sorted(r['position'] for r in out.collect())
        assert got == list(range(37, 100))
        # cursor exactly on a shard boundary
        at_boundary = read_training_shards(
            spark_session, path, start_position=32, shard_size=16)
        assert at_boundary.count() == 68
        # cursor past the end -> empty, not an error
        past = read_training_shards(
            spark_session, path, start_position=1000, shard_size=16)
        assert past.count() == 0

    def test_read_prunes_shard_directories(self, spark_session,
                                           tmp_path):
        """The resume scan must touch only shard >= cursor//size
        directories — a partition filter, not a post-scan row
        filter."""
        from pyspark.sql import functions as F
        from ons_utils_spark.sources.shards import (
            read_training_shards, write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=16)
        out = read_training_shards(
            spark_session, path, start_position=70, shard_size=16)
        # files actually opened at execution are the pruned set
        files = [r[0] for r in out.select(
            F.input_file_name()).distinct().collect()]
        assert files, 'expected surviving files'
        assert all(any(f'shard={s}' in f for s in (4, 5, 6))
                   for f in files), files
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the shard predicate must be INSIDE the PartitionFilters
        # list (an empty 'PartitionFilters: []' always prints, so
        # bare substring presence asserts nothing)
        import re
        m = re.search(r'PartitionFilters: \[([^\]]*)\]', plan)
        assert m, plan
        assert re.search(r'shard.*>=.*4', m.group(1)), m.group(1)

    def test_sidecar_makes_shard_size_authoritative(
            self, spark_session, tmp_path):
        """The writer persists shard_size in _shard_layout.json; a
        reader passing a DIFFERENT value must raise instead of
        silently pruning live shards (written 64 / read 16 at cursor
        70 would skip shards 1-3, which still hold positions >= 70),
        and may omit shard_size entirely."""
        import pytest as _pt
        from ons_utils_spark.sources.shards import (
            read_layout_sidecar, read_training_shards,
            write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=64)
        layout = read_layout_sidecar(spark_session, path)
        assert layout['shard_size'] == 64
        assert layout['position_col'] == 'position'
        # omitted shard_size: taken from the sidecar
        got = sorted(r['position'] for r in read_training_shards(
            spark_session, path, start_position=70).collect())
        assert got == list(range(70, 100))
        # matching explicit value still fine
        assert read_training_shards(
            spark_session, path, start_position=70,
            shard_size=64).count() == 30
        with _pt.raises(ValueError, match='does not match'):
            read_training_shards(
                spark_session, path, start_position=70, shard_size=16)
        with _pt.raises(ValueError, match='position_col'):
            read_training_shards(
                spark_session, path, start_position=0,
                position_col='pos')
        # the hidden sidecar must not leak into the data read
        assert '_shard_layout' not in ','.join(
            spark_session.read.parquet(path).columns)

    def test_append_rejects_mismatched_layout_contract(
            self, spark_session, tmp_path):
        """mode='append' must honor the sidecar already on disk: a
        different shard_size (or column names) would silently rewrite
        the contract the sidecar exists to enforce, leaving earlier
        shard directories violating the recorded size (r12 ADVICE)."""
        import pytest as _pt
        from ons_utils_spark.sources.shards import (
            read_layout_sidecar, write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=16)
        with _pt.raises(ValueError, match='shard_size'):
            write_training_shards(
                ordered, path, shard_size=32, mode='append')
        with _pt.raises(ValueError, match='shard_col'):
            write_training_shards(
                ordered, path, shard_size=16, shard_col='s',
                mode='append')
        # contract on disk is untouched by the refused appends
        assert read_layout_sidecar(
            spark_session, path)['shard_size'] == 16
        # a MATCHING append still works and keeps the sidecar
        more = self._ordered(spark_session, n=20)
        write_training_shards(more, path, shard_size=16, mode='append')
        assert read_layout_sidecar(
            spark_session, path)['shard_size'] == 16
        # overwrite with a new size is the legitimate re-layout path
        write_training_shards(ordered, path, shard_size=32,
                              mode='overwrite')
        assert read_layout_sidecar(
            spark_session, path)['shard_size'] == 32

    def test_pre_sidecar_layout_falls_back_to_caller_contract(
            self, spark_session, tmp_path):
        import os

        from ons_utils_spark.sources.shards import (
            read_training_shards, write_training_shards)

        ordered = self._ordered(spark_session)
        path = str(tmp_path / 'shards')
        write_training_shards(ordered, path, shard_size=16)
        os.remove(os.path.join(path, '_shard_layout.json'))
        out = read_training_shards(
            spark_session, path, start_position=37, shard_size=16)
        assert sorted(r['position'] for r in out.collect()) == list(
            range(37, 100))

    def test_with_shard_id_rejects_non_integral_position(
            self, spark_session):
        import pytest as _pt
        from pyspark.sql import functions as F
        from ons_utils_spark.sources.shards import with_shard_id

        df = spark_session.range(3).select(
            F.col('id').cast('double').alias('position'))
        with _pt.raises(TypeError, match='integral'):
            with_shard_id(df, 16)

    def test_with_shard_id_escapes_backticks(self, spark_session):
        from pyspark.sql import functions as F
        from ons_utils_spark.sources.shards import with_shard_id

        # column REFERENCES parse backticks everywhere (F.col, df[..],
        # orderBy) — only alias/withColumnRenamed take the name
        # literally, which is exactly why with_shard_id must escape
        df = spark_session.range(5).select(
            F.col('id').alias('po`s'))
        out = with_shard_id(df, 2, position_col='po`s') \
            .withColumnRenamed('po`s', 'pos')
        assert [r['shard'] for r in out.orderBy('pos').collect()] \
            == [0, 0, 1, 1, 2]

    def test_read_rejects_missing_shard_size(self, spark_session):
        import pytest as _pt
        from ons_utils_spark.sources.shards import read_training_shards
        with _pt.raises(ValueError, match='shard_size'):
            read_training_shards(spark_session, '/tmp/x', 0)
        with _pt.raises(ValueError, match='start_position'):
            read_training_shards(
                spark_session, '/tmp/x', -1, shard_size=16)

    def test_shard_id_exact_beyond_double_precision(
            self, spark_session):
        """Shard assignment must be integer division in the JVM —
        the old float path ((pos / size).cast('bigint')) silently
        mis-assigns once position exceeds double's 2^53 exact-int
        range."""
        from ons_utils_spark.sources.shards import with_shard_id
        # 2^53 + 1 is NOT representable as a double; float division
        # by 3 then truncation lands on the wrong shard
        big = (1 << 53) + 1
        df = spark_session.createDataFrame(
            [(big,), (3 * big + 2,)], 'position bigint')
        got = {r['position']: r['shard'] for r in with_shard_id(
            df, 3).collect()}
        assert got == {big: big // 3, 3 * big + 2: big}
