"""Physical-plan regression guards for scale-critical properties.

PLANS.md documents the plans; these tests ENFORCE the properties the
100 TB design depends on — broadcast hints landing, predicate
pushdown reaching the parquet scan, column pruning, and map-side
partial aggregation — so a refactor that silently degrades a plan
fails CI rather than only showing up in the bench.
"""
from __future__ import annotations

import re

import pytest

from ons_utils_spark.plans.queries import QUERIES

SF = '/root/testdata/sf0.001'


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString('formatted')
    )


class TestPlanGuards:
    def test_q2_dimensions_broadcast_not_sortmerge(self, spark_session):
        plan = plan_of(spark_session, 'q2_revenue_by_nation')
        assert plan.count('BroadcastHashJoin') >= 3
        assert 'SortMergeJoin' not in plan

    def test_q6_filter_pushed_to_scan(self, spark_session):
        plan = plan_of(spark_session, 'q6_forecast_revenue')
        pushed = [p for p in
                  re.findall(r'PushedFilters: \[([^\]]*)\]', plan)
                  if p.strip()]
        assert pushed, 'q6 predicate must reach the parquet scan'

    def test_q1_map_side_partial_agg(self, spark_session):
        plan = plan_of(spark_session, 'q1_pricing_summary')
        # a partial (map-side) aggregate must exist alongside the
        # exchange — i.e. sums combine before rows shuffle
        assert 'partial_sum' in plan
        assert 'Exchange' in plan

    def test_q1_column_pruning(self, spark_session):
        plan = plan_of(spark_session, 'q1_pricing_summary')
        m = re.search(r'ReadSchema: struct<([^>]*)>', plan)
        assert m, 'expected a parquet ReadSchema'
        cols = {c.split(':')[0] for c in m.group(1).split(',') if c}
        # q1 needs 6 of lineitem's 11 columns; pruning must drop keys
        assert 'l_orderkey' not in cols
        assert 'l_partkey' not in cols
        assert {'l_returnflag', 'l_linestatus', 'l_quantity'} <= cols

    def test_q3_broadcasts_topk_side(self, spark_session):
        plan = plan_of(spark_session, 'q3_top_orders')
        assert 'BroadcastHashJoin' in plan
        assert 'SortMergeJoin' not in plan

    def test_q14_part_broadcast(self, spark_session):
        plan = plan_of(spark_session, 'q14_promo_share')
        assert 'BroadcastHashJoin' in plan

    def test_q7_entire_dimension_chain_broadcasts(self, spark_session):
        """Customer/supplier/both nation legs must all broadcast —
        five BroadcastHashJoins, no SortMergeJoin at test scale."""
        plan = plan_of(spark_session, 'q7_nation_volume')
        assert plan.count('BroadcastHashJoin') >= 4
        assert 'SortMergeJoin' not in plan

    def test_q16_distinct_agg_expands_before_exchange(
            self, spark_session):
        """The two countDistincts share one Expand+partial-agg pass —
        not two scans of the join."""
        plan = plan_of(spark_session, 'q16_supplier_variety')
        assert 'Expand' in plan
        # one physical scan per relation (lineitem + part), counted
        # via the numbered detail nodes (the tree repeats headers)
        assert len(re.findall(r'\(\d+\) Scan parquet', plan)) == 2

    def test_q8_dimension_chain_broadcasts(self, spark_session):
        """All five dimension legs (orders excepted — it's fact-sized)
        must broadcast; the fact table shuffles at most once, for the
        final year agg."""
        plan = plan_of(spark_session, 'q8_market_share')
        assert plan.count('BroadcastHashJoin') >= 3
        assert 'SortMergeJoin' not in plan

    def test_q10_topk_before_dimension_join(self, spark_session):
        """The 20-row top-k result must be the broadcast side of the
        customer join — never the full customer table shuffle."""
        plan = plan_of(spark_session, 'q10_returned_customers')
        assert 'BroadcastHashJoin' in plan
        assert 'SortMergeJoin' not in plan
        assert 'TakeOrderedAndProject' in plan

    def test_q17_no_correlated_rescan(self, spark_session):
        """The correlated scalar subquery is a per-part agg broadcast
        back — exactly two lineitem scans (fact + avg pass), no
        nested-loop re-scan per row."""
        plan = plan_of(spark_session, 'q17_small_qty_revenue')
        assert 'BroadcastNestedLoopJoin' not in plan
        assert 'SortMergeJoin' not in plan

    def test_q21_reuses_per_supplier_exchange(self, spark_session):
        """The per-(order, supplier) aggregate feeds two consumers;
        the repartition barrier must collapse them onto one exchange
        (lineitem scanned/aggregated once, not twice)."""
        df = QUERIES['q21_waiting_suppliers'](spark_session, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert 'ReusedExchange' in plan

    def test_q8_broadcasts_survive_zero_threshold(self, spark_session):
        """The dimension broadcasts are HINT-driven, not size-driven:
        with autoBroadcastJoinThreshold=-1 the q8 dim chain must
        still broadcast (on a real cluster table sizes/stats differ —
        the explicit hints are what we rely on). Only the fact-fact
        lineitem-orders join may fall back to shuffle — which IS the
        right plan at scale."""
        threshold = spark_session.conf.get(
            'spark.sql.autoBroadcastJoinThreshold')
        spark_session.conf.set(
            'spark.sql.autoBroadcastJoinThreshold', '-1')
        try:
            plan = plan_of(spark_session, 'q8_market_share')
        finally:
            spark_session.conf.set(
                'spark.sql.autoBroadcastJoinThreshold', threshold)
        # numbered detail nodes (the tree repeats headers)
        bhj = len(re.findall(r'\(\d+\) BroadcastHashJoin', plan))
        smj = len(re.findall(r'\(\d+\) SortMergeJoin', plan))
        assert bhj >= 4, plan
        assert smj <= 1, plan

    def test_winnow_pairs_have_no_self_join(self, spark_session):
        """r15 §8 shape: winnow candidate pairs expand from ONE
        fingerprint-keyed posting aggregation (collect_set) via
        generators — there must be NO self-join in the plan at all
        (the pre-r15 shape's self-join recomputed the md5 pipeline
        per side unless a ReusedExchange barrier saved it; this
        guard's ancestor asserted that barrier)."""
        df = QUERIES['q_winnow_dups'](spark_session, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert 'Join' not in plan, plan
        assert 'Generate' in plan, plan

    def test_minhash_reuses_shingle_exchange(self, spark_session):
        """The band/bucket repartition barrier must make the LSH
        self-join share ONE exchange instead of recomputing the
        signature pipeline per side."""
        from ons_utils_spark.operators.dedup import (
            minhash_lsh_candidates)
        from ons_utils_spark.sources.readers import load_tables

        docs = load_tables(
            spark_session, SF, tables=['documents'])['documents']
        cands = minhash_lsh_candidates(docs, 'doc_id', 'text')
        # Exchange reuse is an AQE runtime decision — execute this
        # QueryExecution (collect, not a write, which would clone it)
        # and inspect the finalized plan.
        cands.collect()
        plan = cands._jdf.queryExecution().executedPlan().toString()
        assert 'ReusedExchange' in plan


class TestSortMergePath:
    """The 100 TB fact-fact join path: un-bucketed lineitem×orders
    with broadcasts disabled must plan a clean SortMergeJoin with
    AQE-optimized shuffle reads — every prior guard pins broadcast
    plans (right for sf-scale dimensions); this pins the plan the
    engine falls back to when BOTH sides are big."""

    def test_fact_fact_join_sort_merges_cleanly(self, spark_session):
        import re

        from pyspark.sql import functions as F

        from ons_utils_spark.sources.readers import load_tables

        t = load_tables(spark_session, SF, tables=['lineitem', 'orders'])
        threshold = spark_session.conf.get(
            'spark.sql.autoBroadcastJoinThreshold')
        spark_session.conf.set(
            'spark.sql.autoBroadcastJoinThreshold', '-1')
        try:
            df = (
                t['lineitem']
                .join(t['orders'],
                      F.col('l_orderkey') == F.col('o_orderkey'))
                .groupBy('o_orderpriority')
                .agg(F.sum('l_quantity').alias('qty'))
            )
            df.collect()
            final = df._jdf.queryExecution().executedPlan().toString()
            formatted = df._jdf.queryExecution().explainString(
                spark_session._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString('formatted'))
        finally:
            spark_session.conf.set(
                'spark.sql.autoBroadcastJoinThreshold', threshold)

        # the join really is a shuffle sort-merge, not a broadcast
        assert 'SortMergeJoin' in final, final
        assert 'BroadcastHashJoin' not in final, final
        assert 'BroadcastNestedLoopJoin' not in final, final
        # AQE re-planned the shuffle reads (coalesced tiny partitions
        # here; splits skewed ones at scale)
        assert 'AQEShuffleRead' in final, final
        # both sides exchange on their join key — co-partitioned
        assert re.search(r'hashpartitioning\(l_orderkey', formatted)
        assert re.search(r'hashpartitioning\(o_orderkey', formatted)
        # partial aggregation still combines map-side above the join
        assert 'partial_sum' in formatted


class TestRound14PlanGuards:
    """Scale properties of the r14 surface."""

    def test_html_meta_is_scan_side_projection(self, spark_session):
        # one struct extract in the scan projection: no Python, no
        # join, no aggregate exchange beyond the fixture's widen
        plan = plan_of(spark_session, 'q_html_meta')
        assert 'Python' not in plan
        assert 'Join' not in plan

    def test_sitemap_parse_has_no_python(self, spark_session):
        plan = plan_of(spark_session, 'q_sitemap_urls')
        assert 'Python' not in plan
        assert 'SortMergeJoin' not in plan  # host-level joins stay
        # broadcast (tiny per-host tables)

    def test_bitext_candidates_join_broadcasts(self, spark_session):
        # r15 §11: the scored cross executes ONCE behind the
        # candidate-set lineage cut (it used to re-execute 12× across
        # the margin/mutual-best branches), so the final plan reads
        # the cut's RDD scan instead of showing the
        # BroadcastNestedLoopJoin itself; nothing downstream may
        # degrade to a sort-merge join.
        plan = plan_of(spark_session, 'q_bitext_mine')
        assert 'Scan ExistingRDD' in plan  # the candidate cut
        assert 'SortMergeJoin' not in plan

    def test_crawl_frontier_single_host_window(self, spark_session):
        plan = plan_of(spark_session, 'q_crawl_frontier')
        assert 'Python' not in plan
        # the politeness rank is a host-keyed window — the exchange
        # hash-partitions on host, and nothing plans a global
        # (single-partition) sort of the frontier
        assert plan.count('Window') >= 1
        assert 'hashpartitioning(host' in plan
        assert 'SinglePartition' not in plan

    def test_zipf_topk_is_take_ordered(self, spark_session):
        plan = plan_of(spark_session, 'q_zipf_slope')
        assert 'TakeOrderedAndProject' in plan
        assert 'partial_count' in plan  # map-side combine on tokens

    def test_crawl_delays_no_python(self, spark_session):
        plan = plan_of(spark_session, 'q_crawl_delays')
        assert 'Python' not in plan
