"""Tests for SCD type-2 history building and incremental merge."""
import datetime as dt

import pytest

from ons_utils_spark.operators.scd import (
    scd2_apply_updates, scd2_from_events,
)


def at(minutes):
    return dt.datetime(2024, 1, 1, 9, 0) + dt.timedelta(minutes=minutes)


@pytest.fixture
def log(spark_session):
    rows = [
        # user 1: a a b a  -> episodes a[0,20) b[20,30) a[30,∞)
        (1, at(0), 'a', 10),
        (1, at(10), 'a', 11),
        (1, at(20), 'b', 12),
        (1, at(30), 'a', 13),
        # user 2: single event -> one open episode
        (2, at(5), 'x', 20),
    ]
    return spark_session.createDataFrame(
        rows, 'uid bigint, t timestamp, state string, eid bigint')


class TestScd2FromEvents:
    def test_episode_collapse_and_intervals(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        rows = sorted(
            ((r['uid'], r['valid_from'], r['state'],
              r['valid_to'], r['is_current'])
             for r in hist.collect()))
        assert rows == [
            (1, at(0), 'a', at(20), False),
            (1, at(20), 'b', at(30), False),
            (1, at(30), 'a', None, True),
            (2, at(5), 'x', None, True),
        ]

    def test_null_state_transitions(self, spark_session):
        """NULL → 'a' and 'a' → NULL are changes; NULL → NULL is
        not (null-safe struct compare)."""
        rows = [(1, at(0), None), (1, at(10), None),
                (1, at(20), 'a'), (1, at(30), None)]
        df = spark_session.createDataFrame(
            rows, 'uid bigint, t timestamp, state string')
        hist = scd2_from_events(df, 'uid', 't', 'state')
        got = sorted((r['valid_from'], r['state'])
                     for r in hist.collect())
        assert got == [(at(0), None), (at(20), 'a'), (at(30), None)]

    def test_same_ts_tiebreak(self, spark_session):
        """Two changes at the same timestamp order by the tiebreak —
        the higher id becomes current."""
        rows = [(1, at(0), 'a', 1), (1, at(0), 'b', 2)]
        df = spark_session.createDataFrame(
            rows, 'uid bigint, t timestamp, state string, eid bigint')
        hist = scd2_from_events(df, 'uid', 't', 'state', 'eid')
        cur = [r['state'] for r in hist.collect() if r['is_current']]
        assert cur == ['b']

    def test_multi_column_state(self, spark_session):
        """A change in ANY state column opens a new episode."""
        rows = [(1, at(0), 'a', 'x'), (1, at(10), 'a', 'y'),
                (1, at(20), 'a', 'y')]
        df = spark_session.createDataFrame(
            rows, 'uid bigint, t timestamp, s1 string, s2 string')
        hist = scd2_from_events(df, 'uid', 't', ['s1', 's2'])
        assert hist.count() == 2


class TestScd2ApplyUpdates:
    def test_update_closes_current(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        upd = log.sparkSession.createDataFrame(
            [(2, at(60), 'y', 30)],
            'uid bigint, t timestamp, state string, eid bigint')
        merged = scd2_apply_updates(
            hist, upd, 'uid', 't', 'state', 'eid')
        u2 = sorted((r['valid_from'], r['state'], r['is_current'])
                    for r in merged.collect() if r['uid'] == 2)
        assert u2 == [(at(5), 'x', False), (at(60), 'y', True)]

    def test_untouched_keys_identical(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        upd = log.sparkSession.createDataFrame(
            [(2, at(60), 'y', 30)],
            'uid bigint, t timestamp, state string, eid bigint')
        merged = scd2_apply_updates(
            hist, upd, 'uid', 't', 'state', 'eid')
        before = sorted(map(tuple, hist.filter('uid = 1').collect()))
        after = sorted(map(tuple, merged.filter('uid = 1').collect()))
        assert before == after

    def test_idempotent_reapply(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        upd = log.sparkSession.createDataFrame(
            [(1, at(60), 'c', 30)],
            'uid bigint, t timestamp, state string, eid bigint')
        once = scd2_apply_updates(hist, upd, 'uid', 't', 'state', 'eid')
        twice = scd2_apply_updates(once, upd, 'uid', 't', 'state', 'eid')
        assert sorted(map(tuple, once.collect())) \
            == sorted(map(tuple, twice.collect()))

    def test_no_op_same_state_update(self, log):
        """An update that repeats the current state collapses away —
        no new episode."""
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        upd = log.sparkSession.createDataFrame(
            [(2, at(60), 'x', 30)],
            'uid bigint, t timestamp, state string, eid bigint')
        merged = scd2_apply_updates(
            hist, upd, 'uid', 't', 'state', 'eid')
        u2 = [r for r in merged.collect() if r['uid'] == 2]
        assert len(u2) == 1 and u2[0]['is_current']


class TestTiebreakPersistence:
    """Histories persist each episode's opening tiebreak so repeated
    applies re-derive under the ORIGINAL total order (ADVICE r4):
    same-valid_from episodes must not flip between applies."""

    def test_history_carries_tiebreak_column(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state', 'eid')
        assert 'eid' in hist.columns
        eids = {r['eid'] for r in hist.collect()}
        assert eids == {10, 12, 13, 20}          # episode openers

    def test_no_tiebreak_no_extra_column(self, log):
        hist = scd2_from_events(log, 'uid', 't', 'state')
        assert 'eid' not in hist.columns

    def test_same_valid_from_episodes_stable_across_applies(
            self, spark_session):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1, 9, 0)
        base = spark_session.createDataFrame(
            [(1, t0, 'a', 1), (1, t0, 'b', 2)],
            'uid bigint, t timestamp, state string, eid bigint')
        hist = scd2_from_events(base, 'uid', 't', 'state', 'eid')
        upd = spark_session.createDataFrame(
            [(2, t0, 'x', 9)],
            'uid bigint, t timestamp, state string, eid bigint')
        once = scd2_apply_updates(hist, upd, 'uid', 't', 'state', 'eid')
        twice = scd2_apply_updates(once, upd, 'uid', 't', 'state', 'eid')
        a = sorted(map(tuple, once.collect()))
        b = sorted(map(tuple, twice.collect()))
        assert a == b
        cur = [r['state'] for r in once.collect()
               if r['uid'] == 1 and r['is_current']]
        assert cur == ['b']                      # eid 2 stays current
