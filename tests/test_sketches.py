"""Count-min sketch: overestimate-only, exactness without collisions,
error bound, and plan shape."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_topk,
)


@pytest.fixture
def zipfy(spark_session):
    # heavy hitters a:50, b:30, c:12 + a tail of singletons
    rows = ([('a',)] * 50 + [('b',)] * 30 + [('c',)] * 12
            + [(f't{i}',) for i in range(40)])
    return spark_session.createDataFrame(rows, 'tok string')


class TestCms:
    def test_never_underestimates(self, zipfy, spark_session):
        sketch = cms_build(zipfy, 'tok', depth=4, width=64)
        truth = {r['tok']: r['n'] for r in
                 zipfy.groupBy('tok').agg(
                     F.count('*').alias('n')).collect()}
        q = spark_session.createDataFrame(
            [(t,) for t in truth], 'tok string')
        est = {r['tok']: r['cms_count'] for r in
               cms_estimate(sketch, q, 'tok', depth=4,
                            width=64).collect()}
        assert est.keys() == truth.keys()
        assert all(est[t] >= truth[t] for t in truth)
        # error bound: eps = e/width over total mass N
        import math
        n_total = sum(truth.values())
        bound = math.e / 64 * n_total
        assert all(est[t] - truth[t] <= bound for t in truth)

    def test_exact_when_width_large(self, zipfy, spark_session):
        """With width >> distinct values, collisions are (nearly)
        impossible and estimates are exact."""
        sketch = cms_build(zipfy, 'tok', depth=4, width=65536)
        q = spark_session.createDataFrame(
            [('a',), ('b',), ('c',), ('t7',), ('missing',)],
            'tok string')
        est = {r['tok']: r['cms_count'] for r in
               cms_estimate(sketch, q, 'tok', depth=4,
                            width=65536).collect()}
        assert est == {'a': 50, 'b': 30, 'c': 12, 't7': 1,
                       'missing': 0}

    def test_sketch_size_is_bounded(self, zipfy):
        sketch = cms_build(zipfy, 'tok', depth=4, width=16).collect()
        assert len(sketch) <= 4 * 16
        assert sum(r['cnt'] for r in sketch if r['j'] == 0) == 132

    def test_topk_ranks_heavy_hitters_first(self, zipfy, spark_session):
        cand = spark_session.createDataFrame(
            [('a',), ('b',), ('c',), ('t3',)], 'tok string')
        top = cms_topk(zipfy, 'tok', cand, k=3, depth=4,
                       width=4096).collect()
        assert [r['tok'] for r in top] == ['a', 'b', 'c']
        assert [r['cms_rank'] for r in top] == [1, 2, 3]

    def test_validation(self, zipfy):
        with pytest.raises(ValueError, match='depth'):
            cms_build(zipfy, 'tok', depth=0, width=16)
        with pytest.raises(ValueError, match='depth'):
            cms_build(zipfy, 'tok', depth=4, width=1)

    def test_single_shuffle_with_partial_agg(self, zipfy):
        """The build is one hash-keyed exchange with map-side
        partial counting — the property that bounds shuffle volume
        by depth*width*partitions at any corpus size."""
        plan = cms_build(zipfy, 'tok')._jdf.queryExecution(
        ).explainString(
            zipfy.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString('formatted'))
        import re
        assert len(re.findall(r'\(\d+\) Exchange', plan)) == 1, plan
        assert 'partial_count' in plan


class TestCmsEstimatePlan:
    def test_probe_join_broadcasts_the_sketch(self, zipfy,
                                              spark_session):
        """The sketch (<= depth x width rows by construction) must be
        the broadcast build side of the probe join — broadcasting the
        preserved side of an outer join is impossible, so the old
        right-join-with-hint silently shuffled the sketch."""
        from ons_utils_spark.operators.sketches import (
            cms_build, cms_estimate)
        sketch = cms_build(zipfy, 'tok', depth=4, width=64)
        queries = zipfy.select('tok').distinct().limit(5)
        est = cms_estimate(sketch, queries, 'tok', depth=4, width=64)
        plan = est._jdf.queryExecution().executedPlan().toString()
        assert 'BroadcastHashJoin' in plan, plan
        assert 'SortMergeJoin' not in plan, plan
