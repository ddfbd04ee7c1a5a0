"""Tests for approximate aggregations (error-bounded, no oracle)."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.functions.approx import (
    approx_distinct,
    approx_quantile_col,
    approx_quantiles,
)
from ons_utils_spark.sources.readers import load_tables


@pytest.fixture(scope='module')
def lineitem(spark_session):
    return load_tables(
        spark_session, '/root/testdata/sf0.01', tables=['lineitem']
    )['lineitem']


def test_bitmap_distinct_matches_count_distinct(lineitem):
    from ons_utils_spark.functions.approx import bitmap_distinct_count

    got = {r['l_returnflag']: r['n_distinct'] for r in
           bitmap_distinct_count(
               lineitem, 'l_orderkey',
               by=('l_returnflag',)).collect()}
    want = {r['l_returnflag']: r['nd'] for r in
            lineitem.groupBy('l_returnflag')
            .agg(F.countDistinct('l_orderkey').alias('nd')).collect()}
    assert got == want


def test_bitmap_distinct_global(lineitem):
    from ons_utils_spark.functions.approx import bitmap_distinct_count

    got = bitmap_distinct_count(
        lineitem, 'l_partkey').collect()[0]['n_distinct']
    want = lineitem.select('l_partkey').distinct().count()
    assert got == want


def test_approx_distinct_within_rsd(lineitem):
    exact = lineitem.select(
        F.countDistinct('l_partkey').alias('n')
    ).collect()[0]['n']
    approx = lineitem.select(
        approx_distinct('l_partkey', rsd=0.02).alias('n')
    ).collect()[0]['n']
    assert abs(approx - exact) / exact < 0.1


def test_approx_quantiles_ordering(lineitem):
    q25, q50, q75 = approx_quantiles(
        lineitem, 'l_extendedprice', (0.25, 0.5, 0.75), 0.01
    )
    assert q25 <= q50 <= q75
    mn = lineitem.agg(F.min('l_extendedprice')).collect()[0][0]
    mx = lineitem.agg(F.max('l_extendedprice')).collect()[0][0]
    assert mn <= q25 and q75 <= mx


def test_approx_quantile_col_grouped(lineitem):
    out = lineitem.groupBy('l_returnflag').agg(
        approx_quantile_col('l_quantity', [0.5]).alias('med')
    ).collect()
    assert all(1.0 <= r['med'][0] <= 50.0 for r in out)


class TestPercentileRangeFilter:
    def test_exact_trims_tails(self, spark_session):
        from ons_utils_spark.functions.approx import (
            filter_by_percentile_range)
        df = spark_session.createDataFrame(
            [(float(i),) for i in range(1, 101)], 'v double')
        kept = filter_by_percentile_range(df, 'v', 0.1, 0.9)
        vals = sorted(r['v'] for r in kept.collect())
        # P10 = 10.9, P90 = 90.1 (interpolated) → keep 11..90
        assert vals[0] == 11.0 and vals[-1] == 90.0
        assert len(vals) == 80

    def test_approx_mode_close(self, spark_session):
        from ons_utils_spark.functions.approx import (
            filter_by_percentile_range)
        df = spark_session.createDataFrame(
            [(float(i),) for i in range(1000)], 'v double')
        n = filter_by_percentile_range(
            df, 'v', 0.05, 0.95, exact=False).count()
        assert 850 <= n <= 950

    def test_bad_bounds_raise(self, spark_session):
        import pytest as pt
        from ons_utils_spark.functions.approx import (
            filter_by_percentile_range)
        df = spark_session.createDataFrame([(1.0,)], 'v double')
        with pt.raises(ValueError, match='lower'):
            filter_by_percentile_range(df, 'v', 0.9, 0.1)

    def test_broadcast_in_plan(self, spark_session):
        from ons_utils_spark.functions.approx import (
            filter_by_percentile_range)
        df = spark_session.createDataFrame(
            [(float(i),) for i in range(50)], 'v double')
        plan = filter_by_percentile_range(
            df, 'v')._jdf.queryExecution().toString()
        assert 'Broadcast' in plan


class TestRobustOutlierFlags:
    def test_flags_planted_outlier(self, spark_session):
        from ons_utils_spark.functions.approx import robust_outlier_flags
        vals = [float(v) for v in
                [10, 11, 12, 10, 11, 12, 10, 11, 12, 1000]]
        df = spark_session.createDataFrame(
            [(v,) for v in vals], 'x double')
        out = robust_outlier_flags(df, 'x').collect()
        flagged = [r['x'] for r in out if r['is_outlier']]
        assert flagged == [1000.0]
        # inliers score small
        assert all(abs(r['robust_z']) < 2 for r in out
                   if not r['is_outlier'])

    def test_grouped_stats_are_independent(self, spark_session):
        """An outlier in group a must not poison group b's median."""
        from ons_utils_spark.functions.approx import robust_outlier_flags
        rows = [('a', 1.0), ('a', 1.1), ('a', 0.9), ('a', 99.0),
                ('b', 50.0), ('b', 51.0), ('b', 49.0)]
        df = spark_session.createDataFrame(rows, 'g string, x double')
        out = robust_outlier_flags(df, 'x', keys='g').collect()
        assert [r['x'] for r in out if r['is_outlier']] == [99.0]

    def test_constant_group_null_score(self, spark_session):
        from ons_utils_spark.functions.approx import robust_outlier_flags
        df = spark_session.createDataFrame(
            [(5.0,), (5.0,), (5.0,)], 'x double')
        out = robust_outlier_flags(df, 'x').collect()
        assert all(r['robust_z'] is None for r in out)
        assert all(r['is_outlier'] is False for r in out)


class TestWinsorize:
    def test_clips_both_tails(self, spark_session):
        from ons_utils_spark.functions.approx import winsorize
        vals = [float(v) for v in range(1, 101)]
        df = spark_session.createDataFrame([(v,) for v in vals],
                                           'x double')
        out = winsorize(df, 'x', 0.10, 0.90).collect()
        assert len(out) == 100                     # every row kept
        xs = sorted(r['x'] for r in out)
        # exact interpolated P10/P90 of 1..100 are 10.9 and 90.1
        assert xs[0] == pytest.approx(10.9)
        assert xs[-1] == pytest.approx(90.1)
        # interior values untouched
        assert 50.0 in xs

    def test_output_col_preserves_original(self, spark_session):
        from ons_utils_spark.functions.approx import winsorize
        df = spark_session.createDataFrame(
            [(1.0,), (100.0,)], 'x double')
        out = winsorize(df, 'x', 0.0, 0.5, output_col='xw').collect()
        assert {r['x'] for r in out} == {1.0, 100.0}
        assert max(r['xw'] for r in out) < 100.0

    def test_expression_requires_output_col(self, spark_session):
        from ons_utils_spark.functions.approx import winsorize
        from pyspark.sql import functions as F
        df = spark_session.createDataFrame([(1.0,)], 'x double')
        with pytest.raises(ValueError, match='output_col'):
            winsorize(df, F.col('x') * 2)


class TestExactAutoGuard:
    """exact='auto' must pick the exact sort percentile only below
    max_exact_rows — the single-reducer buffer guard (VERDICT r4)."""

    def test_small_frame_resolves_exact(self, spark_session):
        from ons_utils_spark.functions.approx import _resolve_exact
        df = spark_session.createDataFrame(
            [(float(i),) for i in range(10)], 'v double')
        assert _resolve_exact(df, 'auto', 100) is True

    def test_large_frame_resolves_approx(self, spark_session):
        from ons_utils_spark.functions.approx import _resolve_exact
        df = spark_session.range(500).selectExpr('CAST(id AS DOUBLE) v')
        assert _resolve_exact(df, 'auto', 100) is False

    def test_explicit_bool_bypasses_probe(self, spark_session):
        from ons_utils_spark.functions.approx import _resolve_exact
        df = spark_session.range(500).selectExpr('CAST(id AS DOUBLE) v')
        assert _resolve_exact(df, True, 1) is True
        assert _resolve_exact(df, False, 10**9) is False

    def test_auto_above_threshold_still_close(self, spark_session):
        """Over the ceiling, 'auto' silently switches to t-digest —
        results stay within sketch tolerance."""
        from ons_utils_spark.functions.approx import winsorize
        df = spark_session.createDataFrame(
            [(float(i),) for i in range(1000)], 'x double')
        out = winsorize(df, 'x', 0.05, 0.95,
                        max_exact_rows=100).collect()
        assert len(out) == 1000
        xs = sorted(r['x'] for r in out)
        assert 30 <= xs[0] <= 70 and 930 <= xs[-1] <= 970

    def test_mad_outliers_auto_approx_same_flags(self, spark_session):
        from ons_utils_spark.functions.approx import robust_outlier_flags
        vals = [float(v) for v in range(100)] + [10000.0]
        df = spark_session.createDataFrame([(v,) for v in vals],
                                           'x double')
        out = robust_outlier_flags(df, 'x', max_exact_rows=10).collect()
        assert [r['x'] for r in out if r['is_outlier']] == [10000.0]


def test_bitmap_distinct_fails_loudly_on_negatives(spark_session):
    """Negative values make bit positions undefined: the job must
    FAIL (same-pass raise_error guard), never return a wrong count."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from ons_utils_spark.functions.approx import bitmap_distinct_count

    bad = spark_session.createDataFrame(
        [(1,), (-2,), (3,)], 'x bigint')
    with pytest.raises(
            (SparkRuntimeException, Exception),
            match='negative value'):
        bitmap_distinct_count(bad, 'x').collect()


class TestDistinctSketchTable:
    """Mergeable HLL sketch state: union of sketches == sketch of
    union, so rollups never re-scan raw data."""

    def test_rollup_matches_direct_estimate(self, spark_session):
        from ons_utils_spark.functions.approx import (
            distinct_sketch_table, rollup_distinct)
        rows = [(d, u) for d in ('mon', 'tue', 'wed')
                for u in range(d != 'mon' and 50 or 0, 200)]
        df = spark_session.createDataFrame(rows, 'day string, uid long')
        per_day = distinct_sketch_table(df, ['day'], 'uid')
        assert per_day.count() == 3
        # weekly rollup from daily sketches == direct global sketch
        weekly = rollup_distinct(per_day, ()).collect()[0]
        direct = rollup_distinct(
            distinct_sketch_table(
                df.withColumn('k', F.lit(1)), ['k'], 'uid'),
            ()).collect()[0]
        assert weekly['n_distinct_approx'] == direct['n_distinct_approx']

    def test_estimates_near_exact(self, spark_session):
        from ons_utils_spark.functions.approx import (
            distinct_sketch_table, rollup_distinct)
        df = spark_session.range(10000).selectExpr(
            "id % 2 AS grp", "id AS uid")
        est = {r['grp']: r['n_distinct_approx'] for r in
               rollup_distinct(
                   distinct_sketch_table(df, ['grp'], 'uid'),
                   ['grp']).collect()}
        for grp in (0, 1):
            assert abs(est[grp] - 5000) / 5000 < 0.05


class TestSortedPickPercentiles:
    """The codegen sort+pick exact-percentile path must be
    bit-identical to ``F.percentile`` (it replaced the aggregate in
    the exact branches of filter_by_percentile_range / winsorize /
    robust_outlier_flags)."""

    @staticmethod
    def _bits(x):
        import struct
        return None if x is None else struct.pack('<d', x)

    def _check(self, df, col, ps, keys):
        from ons_utils_spark.functions.approx import (
            _sorted_pick_percentiles)
        c = F.col(col)
        key_list = list(keys)
        if key_list:
            ref_rows = df.groupBy(*key_list).agg(
                F.percentile(c, F.array(*[F.lit(p) for p in ps]))
                .alias('b')).collect()
            ref = {tuple(r[k] for k in key_list): r['b']
                   for r in ref_rows}
            got_rows = _sorted_pick_percentiles(
                df, c, ps, key_list).collect()
            got = {tuple(r[k] for k in key_list): r['__b']
                   for r in got_rows}
        else:
            ref = {(): df.agg(
                F.percentile(c, F.array(*[F.lit(p) for p in ps]))
                .alias('b')).collect()[0]['b']}
            got = {(): _sorted_pick_percentiles(
                df, c, ps, []).collect()[0]['__b']}
        assert set(ref) == set(got)
        for k in ref:
            for a, b in zip(ref[k], got[k]):
                assert self._bits(a) == self._bits(b), (k, ref, got)

    def test_global_bits_match_percentile_agg(self, spark_session):
        import random
        rng = random.Random(1514)
        rows = [(rng.choice('ABC'), rng.uniform(-1e6, 1e6))
                for _ in range(4001)]
        df = spark_session.createDataFrame(rows, 'g string, v double')
        self._check(df, 'v', [0.01, 0.5, 0.99], [])
        self._check(df, 'v', [0.0, 1.0], [])

    def test_grouped_bits_match_percentile_agg(self, spark_session):
        import random
        rng = random.Random(2718)
        rows = [(rng.choice('ABC'), float(rng.randint(0, 500)))
                for _ in range(3000)]
        df = spark_session.createDataFrame(rows, 'g string, v double')
        self._check(df, 'v', [0.05, 0.95], ['g'])
        self._check(df, 'v', [0.5], ['g'])

    def test_nulls_and_duplicates(self, spark_session):
        rows = [(None,), (2.0,), (2.0,), (2.0,), (7.0,), (None,),
                (1.0,), (7.0,)]
        df = spark_session.createDataFrame(rows, 'v double')
        self._check(df, 'v', [0.25, 0.5, 0.75], [])

    def test_all_null_and_empty_inputs(self, spark_session):
        from ons_utils_spark.functions.approx import (
            _sorted_pick_percentiles)
        e = spark_session.createDataFrame([(None,)], 'v double')
        out = _sorted_pick_percentiles(
            e, F.col('v'), [0.5], []).collect()
        assert len(out) == 1 and out[0]['__b'][0] is None
        e2 = spark_session.createDataFrame([], 'v double')
        out2 = _sorted_pick_percentiles(
            e2, F.col('v'), [0.5], []).collect()
        assert len(out2) == 1 and out2[0]['__b'][0] is None
