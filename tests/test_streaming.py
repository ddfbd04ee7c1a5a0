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
