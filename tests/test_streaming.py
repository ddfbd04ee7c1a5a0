"""Tests for time-window aggregations (batch path of the streaming ops)."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture
def clicks(spark_session):
    rows = [
        ('u1', ts(0), 1.0), ('u1', ts(5), 2.0), ('u1', ts(50), 4.0),
        ('u2', ts(2), 8.0), ('u2', ts(59), 16.0),
    ]
    return spark_session.createDataFrame(
        rows, 'user string, t timestamp, v double'
    )


class TestTumbling:
    def test_hourly_counts(self, clicks):
        out = tumbling_window_agg(
            clicks, 't', '30 minutes',
            aggs=[F.count(F.lit(1)).alias('n'),
                  F.sum('v').alias('total')],
        )
        rows = {r['window_start']: (r['n'], r['total'])
                for r in out.collect()}
        assert rows[dt.datetime(2024, 1, 1, 10, 0)] == (3, 11.0)
        assert rows[dt.datetime(2024, 1, 1, 10, 30)] == (2, 20.0)

    def test_grouped(self, clicks):
        out = tumbling_window_agg(
            clicks, 't', '30 minutes',
            aggs=[F.count(F.lit(1)).alias('n')],
            groups='user',
        )
        rows = {(r['user'], r['window_start']): r['n']
                for r in out.collect()}
        assert rows[('u1', dt.datetime(2024, 1, 1, 10, 0))] == 2
        assert rows[('u2', dt.datetime(2024, 1, 1, 10, 30))] == 1


class TestSliding:
    def test_overlapping_windows(self, clicks):
        out = sliding_window_agg(
            clicks, 't', '20 minutes', '10 minutes',
            aggs=[F.count(F.lit(1)).alias('n')],
        )
        rows = {r['window_start']: r['n'] for r in out.collect()}
        # event at 10:05 falls in windows starting 09:50 and 10:00
        assert rows[dt.datetime(2024, 1, 1, 9, 50)] == 3
        assert rows[dt.datetime(2024, 1, 1, 10, 0)] == 3


class TestSession:
    def test_gap_splits_sessions(self, clicks):
        out = session_window_agg(
            clicks, 't', '10 minutes',
            aggs=[F.count(F.lit(1)).alias('n')],
            groups='user',
        )
        rows = sorted(
            (r['user'], r['session_start'], r['n'])
            for r in out.collect()
        )
        # u1: events at 10:00,10:05 merge; 10:50 is its own session
        assert rows == [
            ('u1', dt.datetime(2024, 1, 1, 10, 0), 2),
            ('u1', dt.datetime(2024, 1, 1, 10, 50), 1),
            ('u2', dt.datetime(2024, 1, 1, 10, 2), 1),
            ('u2', dt.datetime(2024, 1, 1, 10, 59), 1),
        ]

    def test_session_end_is_last_plus_gap(self, clicks):
        out = session_window_agg(
            clicks.filter("user = 'u1'"), 't', '10 minutes',
            aggs=[F.count(F.lit(1)).alias('n')],
        )
        # NOTE: collect once and select in Python. Filtering the
        # result on session_start would be pushed below the agg and
        # applied to PRE-MERGE windows (wrong sessions) — see module
        # docstring of streaming.windows.
        rows = sorted(out.collect(), key=lambda r: r['session_start'])
        assert rows[0]['session_end'] == dt.datetime(2024, 1, 1, 10, 15)


class TestFileSourceStream:
    """Real micro-batch runs over parquet file chunks (bounded source,
    so ``processAllAvailable`` terminates — unlike the rate source)."""

    def test_stream_batch_parity_on_events(self, spark_session, tmp_path):
        """Tumbling daily counts over events.parquet, streamed in 3
        file chunks, must equal the one-shot batch aggregation."""
        from ons_utils_spark.sources.readers import read_parquet
        from ons_utils_spark.streaming.windows import read_event_stream

        events = read_parquet(
            spark_session, '/root/testdata/sf0.001/events.parquet'
        ).select('event_id', 'ts', 'event_type', 'value')
        in_dir = str(tmp_path / 'in')
        for i in range(3):
            events.filter(F.col('event_id') % 3 == i).coalesce(1) \
                .write.mode('append').parquet(in_dir)

        schema = ('event_id bigint, ts timestamp, event_type string,'
                  ' value double')
        stream = read_event_stream(
            spark_session, in_dir, schema, max_files_per_trigger=1
        )
        agg = tumbling_window_agg(
            stream, 'ts', '1 day',
            aggs=[F.count(F.lit(1)).alias('n'),
                  F.sum('value').alias('total')],
            groups='event_type',
        )
        q = (
            agg.writeStream.format('memory')
            .queryName('parity_sink').outputMode('complete')
            .option('checkpointLocation', str(tmp_path / 'ckpt'))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = {
            (r['window_start'], r['event_type']): (r['n'], r['total'])
            for r in spark_session.sql(
                'SELECT * FROM parity_sink'
            ).collect()
        }
        want = {
            (r['window_start'], r['event_type']): (r['n'], r['total'])
            for r in tumbling_window_agg(
                events, 'ts', '1 day',
                aggs=[F.count(F.lit(1)).alias('n'),
                      F.sum('value').alias('total')],
                groups='event_type',
            ).collect()
        }
        assert set(got) == set(want)
        for k, (n, total) in want.items():
            assert got[k][0] == n
            assert got[k][1] == pytest.approx(total)

    def test_append_mode_drops_late_data(self, spark_session, tmp_path):
        """An event older than the watermark must NOT update its
        (already finalized) window in append mode."""
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir = str(tmp_path / 'in')
        schema = 'user string, t timestamp, v double'

        def write_chunk(rows):
            spark_session.createDataFrame(rows, schema) \
                .coalesce(1).write.mode('append').parquet(in_dir)

        # Chunk 1: two on-time events in [10:00, 10:30), plus a later
        # event that advances the watermark to 11:00 - 10min = 10:50,
        # finalizing the first window.
        write_chunk([('u1', ts(0), 1.0), ('u1', ts(5), 2.0)])
        stream = read_event_stream(
            spark_session, in_dir, schema, max_files_per_trigger=1
        )
        agg = tumbling_window_agg(
            stream, 't', '30 minutes',
            aggs=[F.count(F.lit(1)).alias('n')],
            watermark='10 minutes',
        )
        q = (
            agg.writeStream.format('memory')
            .queryName('late_sink').outputMode('append')
            .option('checkpointLocation', str(tmp_path / 'ckpt'))
            .start()
        )
        try:
            q.processAllAvailable()
            write_chunk([('u9', dt.datetime(2024, 1, 1, 11, 0), 0.0)])
            q.processAllAvailable()
            # Chunk 3: LATE event for the finalized 10:00 window (t is
            # far below the 10:50 watermark) + a fresh on-time event.
            write_chunk([('u1', ts(10), 99.0),
                         ('u9', dt.datetime(2024, 1, 1, 11, 40), 0.0)])
            q.processAllAvailable()
        finally:
            q.stop()

        rows = {r['window_start']: r['n'] for r in spark_session.sql(
            'SELECT * FROM late_sink').collect()}
        # The 10:00-10:30 window was emitted with the 2 on-time events
        # only; the late arrival at 10:10 was dropped, not re-emitted.
        assert rows[dt.datetime(2024, 1, 1, 10, 0)] == 2


class TestWatermark:
    def test_batch_passthrough(self, clicks):
        assert with_watermark(clicks, 't', '5 minutes') is clicks

    def test_streaming_applies(self, spark_session):
        stream = (
            spark_session.readStream.format('rate')
            .option('rowsPerSecond', 1).load()
        )
        wm = with_watermark(stream, 'timestamp', '5 seconds')
        assert wm.isStreaming


class TestStreamingDedup:
    def test_batch_fallback(self, spark_session):
        from ons_utils_spark.streaming.windows import streaming_dedup
        df = spark_session.createDataFrame(
            [(1, 'a'), (1, 'b'), (2, 'c')], 'k bigint, v string')
        assert streaming_dedup(df, 'k').count() == 2

    def test_requires_ts_col(self, spark_session):
        import pytest as pt
        from ons_utils_spark.streaming.windows import (
            read_event_stream, streaming_dedup)
        stream = (spark_session.readStream.format('rate')
                  .option('rowsPerSecond', 1).load())
        with pt.raises(ValueError, match='ts_col'):
            streaming_dedup(stream, 'value', within='10 minutes')

    def test_dedup_across_microbatches(self, spark_session, tmp_path):
        """The same event_id arriving in a later micro-batch (within
        the watermark) must be suppressed."""
        from ons_utils_spark.streaming.windows import (
            read_event_stream, streaming_dedup)

        in_dir = str(tmp_path / 'in')
        schema = 'event_id bigint, t timestamp, v double'

        def write_chunk(rows):
            spark_session.createDataFrame(rows, schema) \
                .coalesce(1).write.mode('append').parquet(in_dir)

        write_chunk([(1, ts(0), 1.0), (2, ts(1), 2.0)])
        stream = read_event_stream(
            spark_session, in_dir, schema, max_files_per_trigger=1)
        deduped = streaming_dedup(stream, 'event_id', ts_col='t',
                                  within='30 minutes')
        q = (deduped.writeStream.format('memory')
             .queryName('dedup_sink').outputMode('append')
             .option('checkpointLocation', str(tmp_path / 'ckpt'))
             .start())
        try:
            q.processAllAvailable()
            # duplicate id=1 (same batch-window) + fresh id=3
            write_chunk([(1, ts(2), 99.0), (3, ts(3), 3.0)])
            q.processAllAvailable()
        finally:
            q.stop()

        rows = spark_session.sql(
            'SELECT event_id, v FROM dedup_sink').collect()
        got = sorted((r['event_id'], r['v']) for r in rows)
        assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]


class TestSinks:
    def test_parquet_sink_available_now(self, spark_session, tmp_path):
        """File-source → checkpointed parquet sink with the
        availableNow trigger: drains everything then terminates; the
        written files round-trip through a plain batch read."""
        from ons_utils_spark.streaming.sinks import write_stream_parquet
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir, out_dir = str(tmp_path / 'in'), str(tmp_path / 'out')
        schema = 'event_id bigint, t timestamp, v double'
        rows = [(i, ts(i), float(i)) for i in range(20)]
        spark_session.createDataFrame(rows, schema) \
            .repartition(4).write.parquet(in_dir)

        stream = read_event_stream(
            spark_session, in_dir, schema, max_files_per_trigger=2)
        q = write_stream_parquet(
            stream, out_dir, str(tmp_path / 'ckpt'),
            available_now=True, query_name='pq_sink')
        q.awaitTermination(120)

        back = spark_session.read.parquet(out_dir)
        assert back.count() == 20
        assert sorted(r['event_id'] for r in back.collect()) \
            == list(range(20))

    def test_parquet_sink_partitioned(self, spark_session, tmp_path):
        from ons_utils_spark.streaming.sinks import write_stream_parquet
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir, out_dir = str(tmp_path / 'in'), str(tmp_path / 'out')
        schema = 'k string, v bigint'
        spark_session.createDataFrame(
            [('a', 1), ('a', 2), ('b', 3)], schema).write.parquet(in_dir)
        q = write_stream_parquet(
            read_event_stream(spark_session, in_dir, schema),
            out_dir, str(tmp_path / 'ckpt'),
            partition_by='k', available_now=True)
        q.awaitTermination(120)
        import os
        dirs = {d for d in os.listdir(out_dir) if d.startswith('k=')}
        assert dirs == {'k=a', 'k=b'}

    def test_foreach_batch_sink(self, spark_session, tmp_path):
        """foreachBatch receives ordinary batch frames + batch ids;
        all input rows arrive exactly once across micro-batches."""
        from ons_utils_spark.streaming.sinks import foreach_batch_sink
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir = str(tmp_path / 'in')
        schema = 'event_id bigint, t timestamp, v double'
        spark_session.createDataFrame(
            [(i, ts(i), float(i)) for i in range(10)], schema
        ).repartition(5).write.parquet(in_dir)

        seen = []

        def collect_batch(batch_df, batch_id):
            seen.append(
                (batch_id, sorted(r['event_id'] for r in
                                  batch_df.collect())))

        q = foreach_batch_sink(
            read_event_stream(spark_session, in_dir, schema,
                              max_files_per_trigger=2),
            collect_batch, str(tmp_path / 'ckpt'),
            output_mode='append', available_now=True)
        q.awaitTermination(120)

        batch_ids = [b for b, _ in seen]
        assert batch_ids == sorted(set(batch_ids))  # distinct, ordered
        got = sorted(e for _, ids in seen for e in ids)
        assert got == list(range(10))


class TestStreamStaticJoin:
    def test_stream_enriched_by_broadcast_dim(
            self, spark_session, tmp_path):
        """Stream-static join: each micro-batch joins against a static
        (broadcastable) dimension with no stateful shuffle."""
        from pyspark.sql import functions as F
        from ons_utils_spark.streaming.sinks import write_stream_parquet
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir, out_dir = str(tmp_path / 'in'), str(tmp_path / 'out')
        schema = 'event_id bigint, t timestamp, code string'
        spark_session.createDataFrame(
            [(1, ts(0), 'a'), (2, ts(1), 'b'), (3, ts(2), 'zz')],
            schema).write.parquet(in_dir)
        dim = spark_session.createDataFrame(
            [('a', 'Alpha'), ('b', 'Beta')], 'code string, label string')

        stream = read_event_stream(spark_session, in_dir, schema)
        enriched = stream.join(F.broadcast(dim), 'code', 'left')
        q = write_stream_parquet(
            enriched, out_dir, str(tmp_path / 'ckpt'),
            available_now=True)
        q.awaitTermination(120)

        got = {r['event_id']: r['label']
               for r in spark_session.read.parquet(out_dir).collect()}
        assert got == {1: 'Alpha', 2: 'Beta', 3: None}


class TestStreamStreamJoin:
    def test_watermarked_interval_join(self, spark_session, tmp_path):
        """Stream-stream inner join: clicks matched to impressions
        within a 30-minute follow window; watermarks on both sides
        bound the join state."""
        from pyspark.sql import functions as F
        from ons_utils_spark.streaming.windows import read_event_stream

        import datetime as dt

        def at(minutes):
            return dt.datetime(2024, 1, 1, 10, 0) \
                + dt.timedelta(minutes=minutes)

        imp_dir, clk_dir = str(tmp_path / 'imp'), str(tmp_path / 'clk')
        spark_session.createDataFrame(
            [(1, at(0)), (2, at(10)), (3, at(60))],
            'ad_id bigint, imp_t timestamp').write.parquet(imp_dir)
        spark_session.createDataFrame(
            [(1, at(5)), (2, at(55)), (3, at(65)), (9, at(6))],
            'ad_id bigint, clk_t timestamp').write.parquet(clk_dir)

        imps = read_event_stream(
            spark_session, imp_dir,
            'ad_id bigint, imp_t timestamp').withWatermark(
            'imp_t', '2 hours')
        clicks = read_event_stream(
            spark_session, clk_dir,
            'ad_id bigint, clk_t timestamp').withWatermark(
            'clk_t', '2 hours')

        joined = imps.join(
            clicks,
            on=[
                imps['ad_id'] == clicks['ad_id'],
                clicks['clk_t'] >= imps['imp_t'],
                clicks['clk_t']
                <= imps['imp_t'] + F.expr('INTERVAL 30 MINUTES'),
            ],
        ).select(imps['ad_id'], 'imp_t', 'clk_t')

        q = (joined.writeStream.format('memory')
             .queryName('ss_join_sink').outputMode('append')
             .option('checkpointLocation', str(tmp_path / 'ckpt'))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = sorted(
            r['ad_id'] for r in
            spark_session.sql('SELECT * FROM ss_join_sink').collect())
        # ad 1: click 5min after imp -> match; ad 2: 45min -> outside
        # window; ad 3: 5min -> match; ad 9: no impression.
        assert got == [1, 3]


class TestStreamJoinHelpers:
    def _write_sides(self, spark_session, tmp_path):
        import datetime as dt

        def at(minutes):
            return dt.datetime(2024, 1, 1, 10, 0) \
                + dt.timedelta(minutes=minutes)

        imp_dir, clk_dir = str(tmp_path / 'imp'), str(tmp_path / 'clk')
        imps = spark_session.createDataFrame(
            [(1, at(0)), (2, at(10)), (3, at(60))],
            'ad_id bigint, imp_t timestamp')
        clicks = spark_session.createDataFrame(
            [(1, at(5)), (2, at(55)), (3, at(65)), (9, at(6))],
            'ad_id bigint, clk_t timestamp')
        imps.write.parquet(imp_dir)
        clicks.write.parquet(clk_dir)
        return imp_dir, clk_dir, imps, clicks

    def test_wrapper_interval_join_streaming(
            self, spark_session, tmp_path):
        from ons_utils_spark.streaming.joins import stream_interval_join
        from ons_utils_spark.streaming.windows import read_event_stream

        imp_dir, clk_dir, _, _ = self._write_sides(
            spark_session, tmp_path)
        imps = read_event_stream(
            spark_session, imp_dir, 'ad_id bigint, imp_t timestamp')
        clicks = read_event_stream(
            spark_session, clk_dir, 'ad_id bigint, clk_t timestamp')
        joined = stream_interval_join(
            imps, clicks, 'ad_id', 'imp_t', 'clk_t',
            upper='30 minutes')
        q = (joined.writeStream.format('memory')
             .queryName('sj_helper_sink').outputMode('append')
             .option('checkpointLocation', str(tmp_path / 'ckpt'))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark_session.sql(
            'SELECT * FROM sj_helper_sink').collect()
        assert sorted(r['ad_id'] for r in rows) == [1, 3]
        assert set(rows[0].asDict()) == {'ad_id', 'imp_t', 'clk_t'}

    def test_wrapper_batch_parity(self, spark_session, tmp_path):
        """Identical call on batch frames returns the same matches —
        the batch/stream parity contract."""
        from ons_utils_spark.streaming.joins import stream_interval_join

        _, _, imps, clicks = self._write_sides(
            spark_session, tmp_path)
        got = stream_interval_join(
            imps, clicks, 'ad_id', 'imp_t', 'clk_t',
            upper='30 minutes').collect()
        assert sorted(r['ad_id'] for r in got) == [1, 3]

    def test_negative_lower_tolerates_skew(
            self, spark_session, tmp_path):
        from ons_utils_spark.streaming.joins import stream_interval_join
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 10, 0)
        left = spark_session.createDataFrame(
            [(1, base)], 'k bigint, lt timestamp')
        right = spark_session.createDataFrame(
            [(1, base - dt.timedelta(minutes=2))],
            'k bigint, rt timestamp')
        none = stream_interval_join(
            left, right, 'k', 'lt', 'rt').collect()
        assert none == []
        skewed = stream_interval_join(
            left, right, 'k', 'lt', 'rt', lower='-5 minutes').collect()
        assert len(skewed) == 1

    def test_enrich_with_static_broadcast(
            self, spark_session, tmp_path):
        from ons_utils_spark.streaming.joins import enrich_with_static
        from ons_utils_spark.streaming.sinks import write_stream_parquet
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir, out_dir = str(tmp_path / 'in'), str(tmp_path / 'out')
        schema = 'event_id bigint, t timestamp, code string'
        spark_session.createDataFrame(
            [(1, ts(0), 'a'), (2, ts(1), 'b'), (3, ts(2), 'zz')],
            schema).write.parquet(in_dir)
        dim = spark_session.createDataFrame(
            [('a', 'Alpha'), ('b', 'Beta')],
            'code string, label string')
        out = enrich_with_static(
            read_event_stream(spark_session, in_dir, schema),
            dim, 'code')
        q = write_stream_parquet(
            out, out_dir, str(tmp_path / 'ckpt'), available_now=True)
        q.awaitTermination(120)
        got = {r['event_id']: r['label']
               for r in spark_session.read.parquet(out_dir).collect()}
        assert got == {1: 'Alpha', 2: 'Beta', 3: None}


class TestQualityMonitor:
    def test_per_batch_reports(self, spark_session, tmp_path):
        from ons_utils_spark.operators.quality_checks import (
            has_min, is_complete)
        from ons_utils_spark.streaming.quality import monitor_quality
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir = str(tmp_path / 'in')
        schema = 'id bigint, v double'
        spark_session.createDataFrame(
            [(1, 1.0), (2, -5.0), (None, 3.0), (4, 2.0)], schema
        ).repartition(2).write.parquet(in_dir)

        q = monitor_quality(
            read_event_stream(spark_session, in_dir, schema,
                              max_files_per_trigger=1),
            [is_complete('id'), has_min('v', 0)],
            str(tmp_path / 'report'), str(tmp_path / 'ckpt'),
            available_now=True)
        q.awaitTermination(120)

        rep = spark_session.read.parquet(str(tmp_path / 'report'))
        rows = rep.collect()
        # one row per check per micro-batch
        batches = {r['batch_id'] for r in rows}
        assert len(rows) == 2 * len(batches)
        # totals across batches match the full data
        null_viol = sum(r['violations'] for r in rows
                        if r['check'] == 'is_complete')
        neg_viol = sum(r['violations'] for r in rows
                       if r['check'] == 'has_min(0)')
        assert null_viol == 1 and neg_viol == 1
        assert sum(r['n_rows'] for r in rows
                   if r['check'] == 'is_complete') == 4

    def test_batch_replay_is_idempotent(self, spark_session, tmp_path):
        """Re-landing the same batch_id rewrites, never duplicates.

        After a failure/restart Structured Streaming re-invokes
        foreachBatch with the same batch_id; the history table must
        end up with ONE copy of that batch's report rows.
        """
        from pyspark.sql import functions as F

        from ons_utils_spark.streaming.quality import _write_batch_report

        path = str(tmp_path / 'report')
        rep = spark_session.createDataFrame(
            [('is_complete', 'id', 4, 1)],
            'check string, column string, n_rows long, violations long')

        b0 = rep.withColumn('batch_id', F.lit(0).cast('long'))
        _write_batch_report(b0, path)
        _write_batch_report(b0, path)  # replay of batch 0
        b1 = rep.withColumn('batch_id', F.lit(1).cast('long'))
        _write_batch_report(b1, path)
        _write_batch_report(b1, path)  # replay of batch 1

        got = spark_session.read.parquet(path)
        counts = {r['batch_id']: r['n'] for r in
                  got.groupBy('batch_id').agg(
                      F.count('*').alias('n')).collect()}
        assert counts == {0: 1, 1: 1}


class TestCmsMonitor:
    """Streaming count-min monitor: per-batch sketches merge by
    counter addition into exact-or-over estimates; replay is
    idempotent."""

    def test_merged_estimates_cover_whole_stream(
            self, spark_session, tmp_path):
        from ons_utils_spark.streaming.sketches import (
            estimate_from_history, monitor_heavy_hitters)
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir = str(tmp_path / 'in')
        schema = 'tok string'
        rows = [('a',)] * 40 + [('b',)] * 25 + [('c',)] * 5
        spark_session.createDataFrame(rows, schema).repartition(
            4).write.parquet(in_dir)

        q = monitor_heavy_hitters(
            read_event_stream(spark_session, in_dir, schema,
                              max_files_per_trigger=1),
            'tok', str(tmp_path / 'sketch'), str(tmp_path / 'ckpt'),
            depth=4, width=4096, available_now=True)
        q.awaitTermination(120)

        hist = spark_session.read.parquet(str(tmp_path / 'sketch'))
        assert hist.select('batch_id').distinct().count() >= 2

        cand = spark_session.createDataFrame(
            [('a',), ('b',), ('c',), ('zzz',)], 'tok string')
        est = {r['tok']: r['cms_count'] for r in
               estimate_from_history(
                   spark_session, str(tmp_path / 'sketch'), cand,
                   'tok', depth=4, width=4096).collect()}
        # width >> distinct values: merged estimates are exact
        assert est == {'a': 40, 'b': 25, 'c': 5, 'zzz': 0}

    def test_batch_window_restricts_counts(
            self, spark_session, tmp_path):
        from ons_utils_spark.streaming.sketches import (
            estimate_from_history, monitor_heavy_hitters)
        from ons_utils_spark.streaming.windows import read_event_stream

        in_dir = str(tmp_path / 'in')
        spark_session.createDataFrame(
            [('x',)] * 8, 'tok string').repartition(
            2).write.parquet(in_dir)
        q = monitor_heavy_hitters(
            read_event_stream(spark_session, in_dir, 'tok string',
                              max_files_per_trigger=1),
            'tok', str(tmp_path / 'sketch'), str(tmp_path / 'ckpt'),
            depth=2, width=64, available_now=True)
        q.awaitTermination(120)
        hist = spark_session.read.parquet(str(tmp_path / 'sketch'))
        bids = sorted(r['batch_id'] for r in
                      hist.select('batch_id').distinct().collect())
        assert len(bids) >= 2
        cand = spark_session.createDataFrame([('x',)], 'tok string')
        windowed = estimate_from_history(
            spark_session, str(tmp_path / 'sketch'), cand, 'tok',
            depth=2, width=64, batch_ids=[bids[0]]).collect()[0]
        full = estimate_from_history(
            spark_session, str(tmp_path / 'sketch'), cand, 'tok',
            depth=2, width=64).collect()[0]
        assert 0 < windowed['cms_count'] < full['cms_count'] == 8

    def test_batch_replay_is_idempotent(self, spark_session, tmp_path):
        from pyspark.sql import functions as F  # noqa: F811

        from ons_utils_spark.operators.sketches import cms_build

        path = str(tmp_path / 'sketch')
        batch = spark_session.createDataFrame(
            [('a',)] * 6, 'tok string')

        def land(bid):
            (cms_build(batch, 'tok', 2, 64)
             .withColumn('batch_id', F.lit(bid).cast('long'))
             .coalesce(1).write.mode('overwrite')
             .option('partitionOverwriteMode', 'dynamic')
             .partitionBy('batch_id').parquet(path))

        land(0)
        land(0)  # replay must rewrite, not double
        got = spark_session.read.parquet(path)
        assert got.filter('j = 0').groupBy().sum('cnt').collect()[
            0][0] == 6
