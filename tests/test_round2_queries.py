"""Semantic invariants for the round-2 query additions.

Value-level parity with DuckDB is pinned by the oracle gate
(tools/check_correctness.py); these tests pin the invariants a hash
can't express — bounds, monotonicity, determinism — at sf0.001.
"""
from __future__ import annotations

import pytest

from ons_utils_spark.plans.queries import QUERIES

SF = '/root/testdata/sf0.001'


def run(spark, name):
    return QUERIES[name](spark, SF)


class TestTpchBreadth:
    def test_q7_no_self_pairs_and_positive_volume(self, spark_session):
        rows = run(spark_session, 'q7_nation_volume').collect()
        assert rows
        assert all(r['cust_nation'] != r['supp_nation'] for r in rows)
        assert all(r['volume'] > 0 and r['n_lines'] > 0 for r in rows)

    def test_q14_share_bounded(self, spark_session):
        rows = run(spark_session, 'q14_promo_share').collect()
        assert rows
        assert all(0.0 <= r['promo_share'] <= 100.0 for r in rows)

    def test_q15_single_max_supplier(self, spark_session):
        rows = run(spark_session, 'q15_top_supplier').collect()
        # The max exists; with rounded revenue ties are possible but
        # the synthetic data has a unique winner at every SF tested.
        assert len(rows) == 1
        assert rows[0]['supp_revenue'] > 0

    def test_q16_supplier_cnt_bounded_by_lines(self, spark_session):
        rows = run(spark_session, 'q16_supplier_variety').collect()
        assert rows
        assert all(r['p_size'] <= 10 for r in rows)
        assert all(r['supplier_cnt'] >= 1 and r['part_cnt'] >= 1
                   for r in rows)

    def test_q18_threshold_respected(self, spark_session):
        rows = run(spark_session, 'q18_big_orders').collect()
        assert rows
        assert all(r['max_order_qty'] > 200 for r in rows)

    def test_q19_single_row(self, spark_session):
        rows = run(spark_session, 'q19_bracket_revenue').collect()
        assert len(rows) == 1

    def test_q22_rich_without_urgent(self, spark_session):
        rows = run(spark_session, 'q22_idle_customers').collect()
        assert rows
        assert all(r['n_customers'] > 0 for r in rows)


class TestAnalyticsExtensions:
    def test_regr_matches_numpy(self, spark_session):
        import numpy as np

        rows = run(spark_session, 'q_regr_price_size').collect()
        assert rows
        part = spark_session.read.parquet(f'{SF}/part.parquet')
        pdf = part.toPandas()
        for r in rows[:3]:
            g = pdf[pdf.p_brand == r['p_brand']]
            slope, intercept = np.polyfit(
                g.p_size.astype(float), g.p_retailprice, 1)
            assert r['slope'] == pytest.approx(slope, abs=1e-3)
            assert r['intercept'] == pytest.approx(intercept, abs=1e-3)

    def test_rolling_window_bounds(self, spark_session):
        rows = run(spark_session, 'q_rolling_revenue').collect()
        assert rows
        assert all(1 <= r['days_in_window'] <= 30 for r in rows)
        # Trailing sum covers at least the current day.
        assert all(r['sum_30d'] >= r['day_rev'] for r in rows)

    def test_hash_sample_fraction_and_determinism(self, spark_session):
        out1 = run(spark_session, 'q_hash_sample').collect()
        out2 = run(spark_session, 'q_hash_sample').collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        total = spark_session.read.parquet(
            f'{SF}/documents.parquet').count()
        kept = sum(r['n_kept'] for r in out1)
        # 0x00-0x28 prefixes = 41/256 ~ 16%; loose bounds for sf0.001.
        assert 0.05 < kept / total < 0.30

    def test_fuzzy_parts_distance_bound(self, spark_session):
        # sf0.001 has only 200 parts — no (brand, size) block holds a
        # close pair, so exercise the shape one SF up.
        rows = QUERIES['q_fuzzy_parts'](
            spark_session, '/root/testdata/sf0.01').collect()
        assert rows
        assert all(0 <= r['min_dist'] <= r['avg_dist'] <= 4
                   for r in rows)

    def test_bigrams_ranked_per_lang(self, spark_session):
        rows = run(spark_session, 'q_bigrams_top').collect()
        assert rows
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r['lang'], []).append(r)
        for lang, rs in by_lang.items():
            ranks = sorted(r['rank'] for r in rs)
            assert ranks == list(range(1, len(ranks) + 1))
            counts = [r['n'] for r in sorted(rs, key=lambda x: x['rank'])]
            assert counts == sorted(counts, reverse=True)

    def test_skyline_mutual_nondomination(self, spark_session):
        rows = run(spark_session, 'q_skyline_suppliers').collect()
        assert rows
        pts = [(r['s_acctbal'], r['revenue']) for r in rows]
        for i, (a1, r1) in enumerate(pts):
            for j, (a2, r2) in enumerate(pts):
                if i != j:
                    dominated = (a2 >= a1 and r2 >= r1
                                 and (a2 > a1 or r2 > r1))
                    assert not dominated

    def test_funnel_monotone(self, spark_session):
        r = run(spark_session, 'q_funnel_events').collect()[0]
        assert (r['n_viewed'] >= r['n_view_then_click']
                >= r['n_full_funnel'] >= 0)
        assert r['n_viewed'] > 0

    def test_deciles_partition_customers(self, spark_session):
        rows = run(spark_session, 'q_ntile_deciles').collect()
        assert sorted(r['decile'] for r in rows) == list(range(1, 11))
        sizes = [r['n_customers'] for r in rows]
        assert max(sizes) - min(sizes) <= 1  # ntile balance property
        by_decile = sorted(rows, key=lambda r: r['decile'])
        for lo, hi in zip(by_decile, by_decile[1:]):
            assert lo['max_bal'] <= hi['min_bal']

    def test_mode_is_max_count(self, spark_session):
        from pyspark.sql import functions as F
        rows = run(spark_session, 'q_mode_quantity').collect()
        assert rows
        lineitem = spark_session.read.parquet(f'{SF}/lineitem.parquet')
        counts = (lineitem.groupBy('l_returnflag', 'l_quantity')
                  .agg(F.count(F.lit(1)).alias('n'))
                  .groupBy('l_returnflag')
                  .agg(F.max('n').alias('max_n')))
        max_n = {r['l_returnflag']: r['max_n'] for r in counts.collect()}
        for r in rows:
            assert r['mode_count'] == max_n[r['l_returnflag']]

    def test_entropy_bounds(self, spark_session):
        import math

        rows = run(spark_session, 'q_entropy_tokens').collect()
        assert rows
        for r in rows:
            # 0 <= H <= ln(n_distinct)
            assert -1e-9 <= r['entropy'] <= math.log(r['n_distinct']) + 1e-9


class TestSkylineProperty:
    """The windowed skyline algorithm equals brute-force dominance on
    arbitrary point sets — including duplicate points and per-axis
    ties, which the testdata never produces."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _brute_frontier(pts):
        out = []
        for i, (a1, r1) in enumerate(pts):
            dominated = any(
                a2 >= a1 and r2 >= r1 and (a2 > a1 or r2 > r1)
                for j, (a2, r2) in enumerate(pts) if j != i)
            if not dominated:
                out.append(i)
        return out

    @given(st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1, max_size=24))
    @settings(max_examples=12, deadline=None)
    def test_matches_brute_force(self, spark_session, pts):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        spark = spark_session
        df = spark.createDataFrame(
            [(i, float(a), float(r)) for i, (a, r) in enumerate(pts)],
            'id bigint, a double, r double')
        grp = df.groupBy('a').agg(F.max('r').alias('grp_max'))
        w = (Window.orderBy(F.col('a').desc())
             .rowsBetween(Window.unboundedPreceding, -1))
        frontier_a = (
            grp.withColumn('prev_max', F.max('grp_max').over(w))
            .filter(F.col('prev_max').isNull()
                    | (F.col('prev_max') < F.col('grp_max'))))
        got = sorted(
            r['id'] for r in df.join(frontier_a, on='a')
            .filter(F.col('r') == F.col('grp_max')).collect())
        assert got == sorted(self._brute_frontier(pts))
