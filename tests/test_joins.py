"""Tests for join helpers (broadcast, null-safe, semi/anti, as-of, top-k)."""
import pytest

from ons_utils_spark import (
    anti_join,
    as_of_join,
    broadcast_join,
    null_safe_join,
    semi_join,
    top_k_per_group,
)


@pytest.fixture
def facts(create_spark_df):
    return create_spark_df([
        'k bigint, v string',
        (1, 'a'), (2, 'b'), (3, 'c'), (None, 'n'),
    ])


@pytest.fixture
def dims(create_spark_df):
    return create_spark_df([
        'k bigint, label string',
        (1, 'one'), (2, 'two'), (None, 'null-dim'),
    ])


def test_broadcast_join(facts, dims):
    out = broadcast_join(facts, dims, on='k')
    rows = {(r['k'], r['v'], r['label']) for r in out.collect()}
    assert rows == {(1, 'a', 'one'), (2, 'b', 'two')}
    assert 'BroadcastHashJoin' in out._jdf.queryExecution().executedPlan() \
        .toString()


def test_null_safe_join(facts, dims):
    out = null_safe_join(facts, dims, on='k')
    rows = {(r['k'], r['v'], r['label']) for r in out.collect()}
    assert (None, 'n', 'null-dim') in rows
    assert len(rows) == 3


def test_semi_anti(facts, dims):
    assert semi_join(facts, dims, 'k').count() == 2
    anti = {r['v'] for r in anti_join(facts, dims, 'k').collect()}
    assert anti == {'c', 'n'}


def test_as_of_join_backward(create_spark_df):
    trades = create_spark_df([
        'sym string, t bigint, qty bigint',
        ('X', 5, 100), ('X', 12, 200), ('Y', 4, 50), ('X', 1, 1),
    ])
    quotes = create_spark_df([
        'sym string, t bigint, px double',
        ('X', 3, 10.0), ('X', 10, 11.0), ('Y', 9, 20.0),
    ])
    out = as_of_join(trades, quotes, on='sym', left_time='t')
    rows = {(r['sym'], r['t']): r['px'] for r in out.collect()}
    assert rows[('X', 5)] == 10.0
    assert rows[('X', 12)] == 11.0
    assert rows[('X', 1)] is None
    assert rows[('Y', 4)] is None


def test_as_of_join_forward(create_spark_df):
    left = create_spark_df(['g string, t bigint', ('a', 5)])
    right = create_spark_df([
        'g string, t bigint, v string', ('a', 4, 'old'), ('a', 7, 'new'),
    ])
    out = as_of_join(left, right, on='g', left_time='t',
                     direction='forward')
    assert out.collect()[0]['v'] == 'new'


def test_as_of_join_equal_time_matches(create_spark_df):
    left = create_spark_df(['g string, t bigint', ('a', 5)])
    right = create_spark_df(['g string, t bigint, v string', ('a', 5, 'eq')])
    out = as_of_join(left, right, on='g', left_time='t')
    assert out.collect()[0]['v'] == 'eq'


def test_top_k_per_group(create_spark_df):
    df = create_spark_df([
        'g string, v bigint',
        ('a', 1), ('a', 5), ('a', 3), ('b', 9), ('b', 2),
    ])
    out = top_k_per_group(df, groups='g', order_by='v', k=2)
    rows = {(r['g'], r['v']) for r in out.collect()}
    assert rows == {('a', 5), ('a', 3), ('b', 9), ('b', 2)}

    asc = top_k_per_group(df, groups='g', order_by='v', k=1,
                          ascending=True)
    assert {(r['g'], r['v']) for r in asc.collect()} == {('a', 1), ('b', 2)}


class TestRangeJoin:
    def _bands(self, create_spark_df):
        return create_spark_df([
            'band string, lo double, hi double',
            ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 60.0),
        ])

    def test_point_in_interval(self, create_spark_df):
        from ons_utils_spark import range_join
        pts = create_spark_df([
            'id bigint, x double',
            (1, 5.0), (2, 10.0), (3, 24.9), (4, 60.0), (5, -1.0),
        ])
        out = range_join(pts, self._bands(create_spark_df),
                         'x', 'lo', 'hi', closed='left')
        got = {(r['id'], r['band']) for r in out.collect()}
        # closed='left': lo <= x < hi; 60.0 and -1.0 match nothing
        assert got == {(1, 'low'), (2, 'mid'), (3, 'mid')}

    def test_closed_both_includes_upper(self, create_spark_df):
        from ons_utils_spark import range_join
        pts = create_spark_df(['id bigint, x double', (1, 10.0)])
        out = range_join(pts, self._bands(create_spark_df),
                         'x', 'lo', 'hi', closed='both')
        assert {r['band'] for r in out.collect()} == {'low', 'mid'}

    def test_equi_keys_restrict(self, create_spark_df):
        from ons_utils_spark import range_join
        pts = create_spark_df(['g string, x double', ('a', 5.0)])
        bands = create_spark_df([
            'g string, band string, lo double, hi double',
            ('a', 'a-band', 0.0, 10.0), ('b', 'b-band', 0.0, 10.0),
        ])
        out = range_join(pts, bands, 'x', 'lo', 'hi', on='g')
        rows = out.collect()
        assert len(rows) == 1 and rows[0]['band'] == 'a-band'

    def test_broadcast_plan(self, create_spark_df):
        from ons_utils_spark import range_join
        pts = create_spark_df(['id bigint, x double', (1, 5.0)])
        out = range_join(pts, self._bands(create_spark_df),
                         'x', 'lo', 'hi')
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert 'BroadcastNestedLoopJoin' in plan

    def test_bucketed_matches_plain(self, spark_session):
        """Bucketed equi-join formulation must agree exactly with the
        nested-loop join, including intervals spanning many buckets."""
        import random
        from ons_utils_spark import bucketed_range_join, range_join
        rnd = random.Random(7)
        pts = spark_session.createDataFrame(
            [(i, rnd.uniform(-50, 150)) for i in range(300)],
            'id bigint, x double',
        )
        ivals = spark_session.createDataFrame(
            [(j, lo := rnd.uniform(-60, 140), lo + rnd.uniform(0, 40))
             for j in range(40)],
            'iid bigint, lo double, hi double',
        )
        plain = {(r['id'], r['iid']) for r in range_join(
            pts, ivals, 'x', 'lo', 'hi', closed='both').collect()}
        for width in (1.0, 7.5, 100.0):
            bucketed = [(r['id'], r['iid']) for r in bucketed_range_join(
                pts, ivals, 'x', 'lo', 'hi', bucket_width=width,
                closed='both').collect()]
            assert len(bucketed) == len(set(bucketed)), 'duplicate pairs'
            assert set(bucketed) == plain, f'width={width}'

    def test_bucketed_validation(self, create_spark_df):
        from ons_utils_spark import bucketed_range_join
        pts = create_spark_df(['id bigint, x double', (1, 5.0)])
        with pytest.raises(ValueError, match='bucket_width'):
            bucketed_range_join(pts, pts, 'x', 'x', 'x', bucket_width=0)
        with pytest.raises(ValueError, match='closed'):
            bucketed_range_join(pts, pts, 'x', 'x', 'x', bucket_width=1,
                                closed='bogus')


class TestAsOfNearestTolerance:
    def _frames(self, spark_session):
        import datetime as dt
        base = dt.datetime(2024, 1, 1)

        def t(m):
            return base + dt.timedelta(minutes=m)

        left = spark_session.createDataFrame(
            [(1, t(10), 'l10'), (1, t(31), 'l31'), (1, t(100), 'l100')],
            'k bigint, ts timestamp, lv string')
        right = spark_session.createDataFrame(
            [(1, t(0), 'r0'), (1, t(30), 'r30'), (1, t(35), 'r35')],
            'k bigint, ts timestamp, rv string')
        return left, right

    def test_nearest_picks_closest_with_backward_ties(
            self, spark_session):
        from ons_utils_spark.operators.joins import as_of_join
        left, right = self._frames(spark_session)
        out = {r['lv']: r['rv'] for r in as_of_join(
            left, right, on='k', left_time='ts',
            direction='nearest').collect()}
        # l10: r0 (10m) vs r30 (20m) -> r0; l31: r30 (1m) closer than
        # r35 (4m); l100: r35 (backward only)
        assert out == {'l10': 'r0', 'l31': 'r30', 'l100': 'r35'}

    def test_tolerance_nulls_far_matches(self, spark_session):
        from ons_utils_spark.operators.joins import as_of_join
        left, right = self._frames(spark_session)
        out = {r['lv']: r['rv'] for r in as_of_join(
            left, right, on='k', left_time='ts',
            direction='backward', tolerance=600).collect()}
        # backward matches: l10<-r0 (600s, AT tolerance: kept),
        # l31<-r30 (60s kept), l100<-r35 (3900s -> nulled)
        assert out == {'l10': 'r0', 'l31': 'r30', 'l100': None}

    def test_nearest_with_tolerance(self, spark_session):
        from ons_utils_spark.operators.joins import as_of_join
        left, right = self._frames(spark_session)
        out = {r['lv']: r['rv'] for r in as_of_join(
            left, right, on='k', left_time='ts',
            direction='nearest', tolerance=120).collect()}
        assert out == {'l10': None, 'l31': 'r30', 'l100': None}

    def test_bad_direction_raises(self, spark_session):
        import pytest as pt
        from ons_utils_spark.operators.joins import as_of_join
        left, right = self._frames(spark_session)
        with pt.raises(ValueError, match='direction'):
            as_of_join(left, right, on='k', left_time='ts',
                       direction='sideways')


class TestFuzzyBlockedPairs:
    def _frame(self, spark_session):
        rows = [
            # block A: near-identical names
            (1, 'A', 'blue widget'),
            (2, 'A', 'blue widgit'),       # dist 1 from id 1
            (3, 'A', 'red gear'),          # far from both
            # block B: same name as block A but never cross-matched
            (4, 'B', 'blue widget'),
            (5, 'B', 'blue widget'),       # dist 0 from id 4
            # length pre-filter: same block, length gap > max_dist
            (6, 'B', 'blue widget extra words here'),
        ]
        return spark_session.createDataFrame(
            rows, 'id bigint, block string, name string')

    def test_matches_within_block_only(self, spark_session):
        from ons_utils_spark.operators.joins import fuzzy_blocked_pairs

        out = fuzzy_blocked_pairs(
            self._frame(spark_session), 'block', 'id', 'name',
            max_dist=2).collect()
        pairs = {(r['id_a'], r['id_b']): r['dist'] for r in out}
        assert pairs == {(1, 2): 1, (4, 5): 0}

    def test_distance_matches_unthresholded(self, spark_session):
        """The threshold guard must not change reported distances."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.joins import fuzzy_blocked_pairs

        df = self._frame(spark_session)
        out = fuzzy_blocked_pairs(df, 'block', 'id', 'name', max_dist=20)
        a = df.select(F.col('id').alias('id_a'),
                      F.col('name').alias('na'))
        b = df.select(F.col('id').alias('id_b'),
                      F.col('name').alias('nb'))
        full = {(r['id_a'], r['id_b']): r['d']
                for r in out.join(a, 'id_a').join(b, 'id_b')
                .withColumn('d', F.levenshtein('na', 'nb')).collect()}
        got = {(r['id_a'], r['id_b']): r['dist'] for r in out.collect()}
        assert got == full


class TestTopKPartitionPrune:
    """The two-stage (partition-pruned) plan must match the flat
    ranked window for every method, including ties straddling
    partition boundaries."""

    def _df(self, spark):
        # many duplicate order values to force boundary ties, spread
        # over several input partitions
        rows = [(f'g{i % 3}', i % 7, i) for i in range(300)]
        return spark.createDataFrame(
            rows, 'g string, v int, id int').repartition(11)

    def test_parity_all_methods(self, spark_session):
        from ons_utils_spark.operators.joins import top_k_per_group

        df = self._df(spark_session)
        for method in ('row_number', 'rank', 'dense_rank'):
            for asc in (False, True):
                a = top_k_per_group(
                    df, 'g', ['v', 'id'], 4, ascending=asc,
                    method=method, partition_prune=True).collect()
                b = top_k_per_group(
                    df, 'g', ['v', 'id'], 4, ascending=asc,
                    method=method, partition_prune=False).collect()
                sa = sorted((r['g'], r['v'], r['id']) for r in a)
                sb = sorted((r['g'], r['v'], r['id']) for r in b)
                assert sa == sb, (method, asc)

    def test_tie_only_order_keeps_tied_rows(self, spark_session):
        """order_by 'v' alone (massive ties): rank/dense_rank keep
        every tied row; row_number keeps exactly k — same counts as
        the flat plan."""
        from ons_utils_spark.operators.joins import top_k_per_group

        df = self._df(spark_session)
        for method, want in (('row_number', 3 * 2),
                             ('rank', None), ('dense_rank', None)):
            a = top_k_per_group(df, 'g', 'v', 2, method=method,
                                partition_prune=True)
            b = top_k_per_group(df, 'g', 'v', 2, method=method,
                                partition_prune=False)
            assert a.count() == b.count(), method
            if want is not None:
                assert a.count() == want
