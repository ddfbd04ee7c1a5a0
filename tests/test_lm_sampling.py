"""Tests for n-gram LM scoring and deterministic splitting."""
import math

import pytest
from pyspark.sql import functions as F


class TestNgramLmScore:
    @pytest.fixture
    def corpus(self, spark_session):
        rows = [
            (1, 'the cat sat on the mat'),
            (2, 'the cat sat on the hat'),
            (3, 'the dog sat on the mat'),
            (4, 'xylophone quark zephyr blimp'),   # out-of-domain
            (5, 'tiny'),                            # 1 token: no bigrams
            (6, ''),                                # empty
        ]
        return spark_session.createDataFrame(
            rows, 'doc_id bigint, text string')

    def test_in_domain_scores_higher(self, corpus):
        from ons_utils_spark.operators.lm import ngram_lm_score

        out = {r['doc_id']: r['lm_logprob']
               for r in ngram_lm_score(corpus, corpus).collect()}
        assert out[1] > out[4]  # fluent-under-corpus beats outlier
        assert out[2] > out[4]

    def test_short_docs_get_null_score(self, corpus):
        from ons_utils_spark.operators.lm import ngram_lm_score

        rows = {r['doc_id']: r
                for r in ngram_lm_score(corpus, corpus).collect()}
        assert rows[5]['n_bigrams'] == 0
        assert rows[5]['lm_logprob'] is None
        assert rows[6]['n_bigrams'] == 0
        assert rows[6]['lm_logprob'] is None
        assert rows[1]['n_bigrams'] == 5  # 6 tokens -> 5 bigrams

    def test_hand_computed_probability(self, spark_session):
        """One-doc corpus 'a b a b': P(b|a) = (2+1)/(2+2), P(a|b) =
        (1+1)/(2+2); mean log over bigrams ab, ba, ab."""
        from ons_utils_spark.operators.lm import ngram_lm_score

        df = spark_session.createDataFrame(
            [(1, 'a b a b')], 'doc_id bigint, text string')
        got = ngram_lm_score(df, df).collect()[0]
        want = (math.log(3 / 4) + math.log(2 / 4) + math.log(3 / 4)) / 3
        assert got['lm_logprob'] == pytest.approx(want, abs=1e-12)
        assert got['n_bigrams'] == 3

    def test_min_count_prunes_to_unseen(self, spark_session):
        """A bigram seen once, pruned at min_count=2, must score as
        unseen (cb=0), lowering the doc's probability."""
        from ons_utils_spark.operators.lm import ngram_lm_score

        df = spark_session.createDataFrame(
            [(1, 'a b'), (2, 'c d c d c d')],
            'doc_id bigint, text string')
        full = {r['doc_id']: r['lm_logprob']
                for r in ngram_lm_score(df, df, min_count=1).collect()}
        pruned = {r['doc_id']: r['lm_logprob']
                  for r in ngram_lm_score(df, df, min_count=2).collect()}
        assert pruned[1] < full[1]       # 'a b' (count 1) now unseen
        # doc 2's bigrams ('c d' x3, 'd c' x2) all survive the prune
        assert pruned[2] == pytest.approx(full[2])


    def test_precomputed_tables_match_inline(self, corpus):
        from ons_utils_spark.operators.lm import (
            bigram_counts, ngram_lm_score, unigram_counts)

        inline = {r['doc_id']: r['lm_logprob']
                  for r in ngram_lm_score(corpus, corpus).collect()}
        big = bigram_counts(corpus).persist()
        uni = unigram_counts(corpus).persist()
        try:
            pre = {r['doc_id']: r['lm_logprob']
                   for r in ngram_lm_score(
                       corpus, bigrams=big, unigrams=uni).collect()}
        finally:
            big.unpersist()
            uni.unpersist()
        for k, v in inline.items():
            if v is None:
                assert pre[k] is None
            else:
                assert pre[k] == pytest.approx(v, abs=1e-12)

    def test_table_args_validated(self, corpus):
        from ons_utils_spark.operators.lm import (
            bigram_counts, ngram_lm_score)

        with pytest.raises(ValueError, match='both'):
            ngram_lm_score(corpus, bigrams=bigram_counts(corpus))
        with pytest.raises(ValueError, match='train'):
            ngram_lm_score(corpus)


class TestHashSplit:
    def test_deterministic_and_exhaustive(self, spark_session):
        from ons_utils_spark.operators.sampling import hash_split

        df = spark_session.range(2000).withColumnRenamed('id', 'k')
        s1 = hash_split(df, 'k', {'train': 0.8, 'val': 0.1,
                                  'test': 0.1})
        s2 = hash_split(df, 'k', {'train': 0.8, 'val': 0.1,
                                  'test': 0.1})
        rows1 = {r['k']: r['split'] for r in s1.collect()}
        rows2 = {r['k']: r['split'] for r in s2.collect()}
        assert rows1 == rows2                      # reproducible
        assert len(rows1) == 2000                  # no rows dropped
        counts = s1.groupBy('split').count().collect()
        got = {r['split']: r['count'] for r in counts}
        assert set(got) == {'train', 'val', 'test'}
        assert got['train'] == pytest.approx(1600, abs=120)
        assert got['val'] == pytest.approx(200, abs=80)

    def test_stable_under_growth(self, spark_session):
        """Adding rows must not move existing assignments."""
        from ons_utils_spark.operators.sampling import hash_split

        small = spark_session.range(500).withColumnRenamed('id', 'k')
        big = spark_session.range(1000).withColumnRenamed('id', 'k')
        w = {'train': 0.9, 'test': 0.1}
        a = {r['k']: r['split']
             for r in hash_split(small, 'k', w).collect()}
        b = {r['k']: r['split']
             for r in hash_split(big, 'k', w).collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_salt_changes_assignment(self, spark_session):
        from ons_utils_spark.operators.sampling import hash_split

        df = spark_session.range(1000).withColumnRenamed('id', 'k')
        w = {'a': 0.5, 'b': 0.5}
        plain = {r['k']: r['split']
                 for r in hash_split(df, 'k', w).collect()}
        salted = {r['k']: r['split']
                  for r in hash_split(df, 'k', w, salt='v2').collect()}
        moved = sum(1 for k in plain if plain[k] != salted[k])
        assert moved > 300  # ~half should move

    def test_threshold_hex_constants(self):
        """The oracle embeds these literals — pin them."""
        from ons_utils_spark.operators.sampling import split_thresholds

        t = split_thresholds({'train': 0.8, 'val': 0.1, 'test': 0.1})
        assert t == (('train', 'cccccc'), ('val', 'e66666'),
                     ('test', '1000000'))

    def test_weight_validation(self):
        from ons_utils_spark.operators.sampling import split_thresholds

        with pytest.raises(ValueError):
            split_thresholds({'a': -1.0, 'b': 2.0})
        with pytest.raises(ValueError):
            split_thresholds({})

    def test_fraction_filter(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            hash_fraction_filter)

        df = spark_session.range(5000).withColumnRenamed('id', 'k')
        kept = hash_fraction_filter(df, 'k', 0.25).count()
        assert kept == pytest.approx(1250, abs=150)
        with pytest.raises(ValueError):
            hash_fraction_filter(df, 'k', 1.5)

    def test_single_partition_plan_no_shuffle(self, spark_session):
        """The split is a pure projection — the physical plan must
        contain no Exchange before a narrow downstream filter."""
        from ons_utils_spark.operators.sampling import hash_split

        df = spark_session.range(100).withColumnRenamed('id', 'k')
        out = hash_split(df, 'k', {'a': 0.5, 'b': 0.5}).filter(
            F.col('split') == 'a')
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan


class TestWeightedSampleExact:
    @pytest.fixture
    def weighted(self, spark_session):
        rows = [('g', i, float(w)) for i, w in enumerate(
            [1, 1, 1, 1, 1, 1000, 1000, 1000, 0, -5])]
        return spark_session.createDataFrame(
            rows, 'grp string, id bigint, w double')

    def test_exact_k_and_validity(self, weighted):
        from ons_utils_spark.operators.sampling import (
            weighted_sample_exact,
        )
        out = weighted_sample_exact(weighted, 'grp', 'id', 'w', 4) \
            .collect()
        assert len(out) == 4
        # zero/negative weights can never be drawn
        assert all(r['w'] > 0 for r in out)

    def test_heavy_weights_dominate(self, spark_session):
        """Across many salts, weight-1000 rows must win far more
        often than weight-1 rows (statistical, deterministic seeds)."""
        from ons_utils_spark.operators.sampling import (
            weighted_sample_exact,
        )
        rows = [('g', i, 1000.0 if i < 3 else 1.0)
                for i in range(13)]
        df = spark_session.createDataFrame(
            rows, 'grp string, id bigint, w double')
        heavy_hits = 0
        for s in range(12):
            got = {r['id'] for r in weighted_sample_exact(
                df, 'grp', 'id', 'w', 3, salt=f's{s}').collect()}
            heavy_hits += len(got & {0, 1, 2})
        # 36 slots; heavy ids should take the clear majority
        assert heavy_hits >= 24

    def test_deterministic_and_growth_stable(self, weighted):
        from ons_utils_spark.operators.sampling import (
            weighted_sample_exact,
        )
        a = sorted(map(tuple, weighted_sample_exact(
            weighted, 'grp', 'id', 'w', 4).collect()))
        b = sorted(map(tuple, weighted_sample_exact(
            weighted.repartition(5), 'grp', 'id', 'w', 4).collect()))
        assert a == b

    def test_rejects_bad_k(self, weighted):
        from ons_utils_spark.operators.sampling import (
            weighted_sample_exact,
        )
        with pytest.raises(ValueError, match='k must be positive'):
            weighted_sample_exact(weighted, 'grp', 'id', 'w', 0)


class TestMixtureSample:
    @pytest.fixture
    def corpus(self, spark_session):
        rows = [(f'src{i % 2}', i, 10) for i in range(20)]
        return spark_session.createDataFrame(
            rows, 'source string, doc_id bigint, n_tokens bigint')

    def test_budget_respected_and_maximal(self, corpus):
        from ons_utils_spark.operators.sampling import mixture_sample
        kept = mixture_sample(
            corpus, 'source', 'doc_id', 'n_tokens',
            {'src0': 35, 'src1': 100}).collect()
        by_src = {}
        for r in kept:
            by_src.setdefault(r['source'], []).append(r)
        assert sum(r['n_tokens'] for r in by_src['src0']) <= 35
        assert len(by_src['src0']) == 3      # 3×10 ≤ 35, 4×10 > 35
        assert len(by_src['src1']) == 10     # whole group fits

    def test_unbudgeted_groups_dropped(self, corpus):
        from ons_utils_spark.operators.sampling import mixture_sample
        kept = mixture_sample(
            corpus, 'source', 'doc_id', 'n_tokens',
            {'src0': 1000}).collect()
        assert {r['source'] for r in kept} == {'src0'}

    def test_deterministic_and_growth_stable(self, corpus):
        from ons_utils_spark.operators.sampling import mixture_sample
        a = sorted(r['doc_id'] for r in mixture_sample(
            corpus, 'source', 'doc_id', 'n_tokens',
            {'src0': 35}).collect())
        b = sorted(r['doc_id'] for r in mixture_sample(
            corpus.repartition(7), 'source', 'doc_id', 'n_tokens',
            {'src0': 35}).collect())
        assert a == b

    def test_empty_budgets_raise(self, corpus):
        from ons_utils_spark.operators.sampling import mixture_sample
        with pytest.raises(ValueError, match='budgets'):
            mixture_sample(corpus, 'source', 'doc_id', 'n_tokens', {})


class TestNullIdOrdering:
    """NULL ids hash to a NULL tag; they must rank LAST (never
    displacing a real row) and identically to DuckDB's ASC NULLS
    LAST default (ADVICE r4)."""

    def test_stratified_null_ids_never_displace(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            stratified_sample_exact,
        )
        rows = [('g', i) for i in range(1, 6)] + [('g', None)] * 3
        df = spark_session.createDataFrame(rows, 'grp string, id int')
        kept = stratified_sample_exact(df, 'grp', 'id', 5).collect()
        assert sorted(r['id'] for r in kept) == [1, 2, 3, 4, 5]

    def test_stratified_null_ids_fill_leftover_slots(
            self, spark_session):
        from ons_utils_spark.operators.sampling import (
            stratified_sample_exact,
        )
        rows = [('g', 1), ('g', None), ('g', None)]
        df = spark_session.createDataFrame(rows, 'grp string, id int')
        kept = stratified_sample_exact(df, 'grp', 'id', 2).collect()
        ids = sorted((r['id'] is None, r['id'] or 0) for r in kept)
        assert len(kept) == 2 and ids[0] == (False, 1)

    def test_mixture_null_ids_consume_budget_last(self, spark_session):
        from ons_utils_spark.operators.sampling import mixture_sample
        rows = [('s', 'a', 10), ('s', 'b', 10), ('s', None, 10)]
        df = spark_session.createDataFrame(
            rows, 'source string, doc_id string, n_tokens int')
        kept = {r['doc_id'] for r in mixture_sample(
            df, 'source', 'doc_id', 'n_tokens', {'s': 20}).collect()}
        assert kept == {'a', 'b'}


class TestMixturePrefixSumParity:
    """The bucketed distributed-prefix-sum plan (r9 default) must
    select EXACTLY the rows the flat single-window plan selects —
    including boundary exactness, zero-token rows at the cut, NULL
    tokens, NULL ids, and tiny/empty groups."""

    def _parity(self, spark, rows, budgets, salt=''):
        from ons_utils_spark.operators.sampling import mixture_sample

        df = spark.createDataFrame(
            rows, 'source string, doc_id bigint, n_tokens bigint')
        key = lambda r: (r['source'], r['doc_id'] is None,
                         r['doc_id'] or 0)  # noqa: E731
        for buckets in (16, 256):
            a = sorted(map(key, mixture_sample(
                df, 'source', 'doc_id', 'n_tokens', budgets,
                salt=salt, prefix_sum_buckets=buckets).collect()))
            b = sorted(map(key, mixture_sample(
                df, 'source', 'doc_id', 'n_tokens', budgets,
                salt=salt, prefix_sum_buckets=None).collect()))
            assert a == b, (buckets, len(a), len(b))
        return a

    def test_parity_random_corpus(self, spark_session):
        import random
        rng = random.Random(11)
        rows = [(f's{i % 3}', i, rng.randrange(0, 40))
                for i in range(400)]
        kept = self._parity(
            spark_session, rows,
            {'s0': 900, 's1': 37, 's2': 0}, salt='mix')
        assert kept  # s0/s1 contribute; s2's zero budget drops >0s

    def test_parity_zero_token_rows_at_the_cut(self, spark_session):
        # tokens of 0 ride along even once the budget is exhausted
        rows = [('s', i, 0 if i % 2 else 7) for i in range(60)]
        self._parity(spark_session, rows, {'s': 21})

    def test_parity_null_tokens_and_null_ids(self, spark_session):
        rows = ([('s', i, None) for i in range(10)]
                + [('s', None, 5), ('s', 100, 5), ('s', 101, 5)])
        self._parity(spark_session, rows, {'s': 10})
        # a NULL-id row that FITS must be kept (it ranks last but
        # the budget still has room) — pins the joinable-sentinel
        # bucket for NULL tags (an inner join on a NULL bucket key
        # silently dropped these before the fix)
        kept = self._parity(
            spark_session,
            [('t', 7, 5), ('t', None, 5)], {'t': 10})
        assert ('t', True, 0) in kept, kept

    def test_parity_exact_boundary_budget(self, spark_session):
        # budget hits a prefix sum exactly
        rows = [('s', i, 10) for i in range(50)]
        self._parity(spark_session, rows, {'s': 200})

    def test_bad_bucket_count_rejected(self, spark_session):
        from ons_utils_spark.operators.sampling import mixture_sample

        df = spark_session.createDataFrame(
            [('s', 1, 1)], 'source string, doc_id bigint, n_tokens int')
        with pytest.raises(ValueError, match='prefix_sum_buckets'):
            mixture_sample(df, 'source', 'doc_id', 'n_tokens',
                           {'s': 1}, prefix_sum_buckets=10)


class TestStratifiedPrefixSumParity:
    """stratified_sample_exact's bucketed plan (r9 default) must
    select exactly the flat ranked window's rows."""

    def _parity(self, spark, rows, k, schema='grp string, id bigint'):
        from ons_utils_spark.operators.sampling import (
            stratified_sample_exact,
        )
        df = spark.createDataFrame(rows, schema)
        key = lambda r: (r['grp'], r['id'] is None,
                         r['id'] or 0)  # noqa: E731
        for buckets in (16, 256):
            a = sorted(map(key, stratified_sample_exact(
                df, 'grp', 'id', k,
                prefix_sum_buckets=buckets).collect()))
            b = sorted(map(key, stratified_sample_exact(
                df, 'grp', 'id', k,
                prefix_sum_buckets=None).collect()))
            assert a == b, (buckets, len(a), len(b))
        return a

    def test_parity_random_groups(self, spark_session):
        rows = [(f'g{i % 5}', i) for i in range(500)]
        kept = self._parity(spark_session, rows, 13)
        assert len(kept) == 5 * 13

    def test_parity_small_groups_and_k_exceeding(self, spark_session):
        rows = [('a', 1), ('a', 2), ('b', 3)]
        kept = self._parity(spark_session, rows, 10)
        assert len(kept) == 3  # k > group size keeps whole groups

    def test_parity_exact_bucket_boundary(self, spark_session):
        # k chosen to land exactly on a bucket-count boundary for
        # SOME bucket split is data-dependent; sweep several k
        rows = [('g', i) for i in range(200)]
        for k in (1, 16, 31, 199, 200):
            self._parity(spark_session, rows, k)

    def test_parity_null_ids_rank_last(self, spark_session):
        rows = [('g', i) for i in range(1, 6)] + [('g', None)] * 3
        kept = self._parity(spark_session, rows, 6)
        n_null = sum(1 for r in kept if r[1])  # key = (grp, is_null, id)
        assert n_null == 1  # exactly one NULL fills slot 6

    def test_parity_null_group_kept(self, spark_session):
        # A NULL group is a real window partition in the flat plan;
        # the prefix-sum plan's group join must not drop it (it is
        # eqNullSafe, not a plain inner equi-join).
        from ons_utils_spark.operators.sampling import (
            stratified_sample_exact,
        )
        rows = ([('g', i) for i in range(20)]
                + [(None, 100 + i) for i in range(7)])
        df = spark_session.createDataFrame(rows, 'grp string, id bigint')
        key = lambda r: (r['grp'] or '', r['id'])  # noqa: E731
        flat = sorted(map(key, stratified_sample_exact(
            df, 'grp', 'id', 4, prefix_sum_buckets=None).collect()))
        for buckets in (16, 256):
            got = sorted(map(key, stratified_sample_exact(
                df, 'grp', 'id', 4,
                prefix_sum_buckets=buckets).collect()))
            assert got == flat, buckets
        n_null_grp = sum(1 for g, _ in flat if g == '')
        assert n_null_grp == 4  # min(k, NULL-group size) kept

    def test_many_groups_fall_back_to_shuffle_join(
            self, spark_session):
        # The summary frame scales with |groups|, so the join must
        # not FORCE a broadcast: with the broadcast estimate
        # disabled, the plan has to show a shuffle join (a forced
        # F.broadcast hint would override the threshold).
        from ons_utils_spark.operators.sampling import (
            stratified_sample_exact,
        )
        df = spark_session.createDataFrame(
            [(f'g{i}', i) for i in range(2000)], 'grp string, id bigint')
        conf = spark_session.conf
        old = conf.get('spark.sql.autoBroadcastJoinThreshold')
        try:
            conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
            plan = stratified_sample_exact(
                df, 'grp', 'id', 2)._jdf.queryExecution() \
                .executedPlan().toString()
            assert 'BroadcastHashJoin' not in plan, plan[:2000]
        finally:
            conf.set('spark.sql.autoBroadcastJoinThreshold', old)


class TestGlobalOrderIndex:
    def test_matches_single_task_row_number(self, spark_session):
        from pyspark.sql import Window as W

        from ons_utils_spark.operators.sampling import (
            global_order_index,
        )
        df = spark_session.createDataFrame(
            [(i,) for i in range(300)], 'id bigint')
        got = {r['id']: r['position'] for r in global_order_index(
            df, 'id', salt='e1', prefix_sum_buckets=16).collect()}
        tag = F.md5(F.concat(F.lit('e1'), F.col('id').cast('string')))
        want = {r['id']: r['rn'] - 1 for r in df.withColumn(
            'rn', F.row_number().over(
                W.orderBy(tag.asc_nulls_last(), 'id'))).collect()}
        assert got == want

    def test_dense_permutation_and_salt_independence(
            self, spark_session):
        from ons_utils_spark.operators.sampling import (
            global_order_index,
        )
        df = spark_session.createDataFrame(
            [(i,) for i in range(200)], 'id bigint')
        a = global_order_index(df, 'id', salt='a').collect()
        positions = sorted(r['position'] for r in a)
        assert positions == list(range(200))  # dense 0..n-1
        b = {r['id']: r['position'] for r in global_order_index(
            df, 'id', salt='b').collect()}
        a = {r['id']: r['position'] for r in a}
        assert a != b  # different epochs, different orders

    def test_null_ids_rank_last_and_counted(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            global_order_index,
        )
        df = spark_session.createDataFrame(
            [(1,), (2,), (None,), (None,)], 'id bigint')
        rows = global_order_index(df, 'id').collect()
        assert sorted(r['position'] for r in rows) == [0, 1, 2, 3]
        null_pos = {r['position'] for r in rows if r['id'] is None}
        assert null_pos == {2, 3}  # NULLs take the last slots


class TestWeightedPartitionPrune:
    def test_parity_with_flat_plan(self, spark_session):
        import random

        from ons_utils_spark.operators.sampling import (
            weighted_sample_exact,
        )
        rng = random.Random(5)
        rows = [(f'g{i % 3}', i,
                 rng.choice([None, 0.0, 0.5, 1.0, 4.0]))
                for i in range(300)]
        df = spark_session.createDataFrame(
            rows, 'grp string, id bigint, w double').repartition(9)
        a = sorted((r['grp'], r['id']) for r in weighted_sample_exact(
            df, 'grp', 'id', 'w', 7,
            partition_prune=True).collect())
        b = sorted((r['grp'], r['id']) for r in weighted_sample_exact(
            df, 'grp', 'id', 'w', 7,
            partition_prune=False).collect())
        assert a == b and len(a) == 21


class TestInterleavedMixtureOrder:
    def _run(self, spark, rows, weights, salt='s'):
        from ons_utils_spark.operators.sampling import (
            interleaved_mixture_order,
        )
        df = spark.createDataFrame(rows, 'grp string, id bigint')
        return interleaved_mixture_order(
            df, 'grp', 'id', weights, salt=salt).collect()

    def test_matches_python_replay(self, spark_session):
        import hashlib

        rows = [(f'g{i % 3}', i) for i in range(120)]
        weights = {'g0': 1.0, 'g1': 2.0, 'g2': 4.0}
        got = sorted(
            ((r['grp'], r['id'], r['src_pos'], r['mix_key'])
             for r in self._run(spark_session, rows, weights)))

        def tag(i):
            return hashlib.md5(f's{i}'.encode()).hexdigest()
        want = []
        for g in ('g0', 'g1', 'g2'):
            ids = sorted((i for gg, i in rows if gg == g),
                         key=lambda i: (tag(i), i))
            for pos, i in enumerate(ids):
                want.append((g, i, pos, (pos + 1) / weights[g]))
        assert got == sorted(want)

    def test_prefix_proportionality(self, spark_session):
        """In the sorted stream, source s has min(floor(t*w_s), n_s)
        rows with key <= t — proportional at EVERY cutoff."""
        rows = [(f'g{i % 2}', i) for i in range(200)]  # 100 each
        weights = {'g0': 1.0, 'g1': 3.0}
        out = self._run(spark_session, rows, weights)
        stream = sorted((r['mix_key'], r['grp'], r['id'])
                        for r in out)
        import math
        for t in (0.5, 1.0, 2.5, 7.0, 33.4, 101.0):
            seen = {'g0': 0, 'g1': 0}
            for key, g, _ in stream:
                if key <= t:
                    seen[g] += 1
            for g, w in weights.items():
                assert seen[g] == min(math.floor(t * w), 100), (t, g)

    def test_unweighted_groups_dropped(self, spark_session):
        rows = [('a', 1), ('b', 2), ('c', 3)]
        out = self._run(spark_session, rows, {'a': 1.0, 'b': 0.0})
        assert {r['grp'] for r in out} == {'a'}

    def test_empty_weights_raise(self, spark_session):
        with pytest.raises(ValueError, match='weights'):
            self._run(spark_session, [('a', 1)], {})


class TestFractionalEpochs:
    def _df(self, spark):
        rows = [(f'g{i % 3}', i) for i in range(90)]
        return spark.createDataFrame(rows, 'src string, id bigint')

    def test_matches_hash_replay(self, spark_session):
        """Whole copies exact; the partial epoch is exactly the md5
        threshold subset (independent hashlib replay)."""
        import hashlib

        from ons_utils_spark.operators.sampling import (
            fractional_epochs)
        df = self._df(spark_session)
        out = fractional_epochs(
            df, 'src', 'id', {'g0': 2.5, 'g1': 1.0, 'g2': 0.25},
            salt='e')
        got = sorted((r['id'], r['epoch']) for r in out.collect())
        bound = {'g0': format(int(0.5 * 16**6), '06x'),
                 'g1': '000000',
                 'g2': format(int(0.25 * 16**6), '06x')}
        whole = {'g0': 2, 'g1': 1, 'g2': 0}
        want = []
        for i in range(90):
            g = f'g{i % 3}'
            for ep in range(whole[g]):
                want.append((i, ep))
            h = hashlib.md5(f'e{i}'.encode()).hexdigest()[:6]
            if h < bound[g]:
                want.append((i, whole[g]))
        assert got == sorted(want)
        # sanity: g1 is exactly one epoch, no partials
        g1 = [e for (i, e) in got if i % 3 == 1]
        assert g1 == [0] * 30

    def test_absent_groups_dropped_and_validation(
            self, spark_session):
        import pytest as _pt

        from ons_utils_spark.operators.sampling import (
            fractional_epochs)
        df = self._df(spark_session)
        out = fractional_epochs(df, 'src', 'id', {'g0': 1.0})
        assert {r['src'] for r in out.collect()} == {'g0'}
        with _pt.raises(ValueError, match='negative'):
            fractional_epochs(df, 'src', 'id', {'g0': -1.0})
        with _pt.raises(ValueError, match='at least one'):
            fractional_epochs(df, 'src', 'id', {})

    def test_no_shuffle_plan(self, spark_session):
        """Upsampling is a projection + generator + union — any
        exchange in the plan is a regression."""
        from ons_utils_spark.operators.sampling import (
            fractional_epochs)
        df = self._df(spark_session)
        plan = fractional_epochs(
            df, 'src', 'id', {'g0': 2.5})._jdf.queryExecution() \
            .executedPlan().toString()
        assert 'Exchange' not in plan, plan[:1500]


class TestUnimaxAllocation:
    def _df(self, spark):
        rows = [('tail', 2), ('mid', 10), ('head', 100)]
        out = []
        for g, n in rows:
            out += [(g, 1)] * n
        return spark.createDataFrame(out, 'lang string, w int')

    def test_water_filling_with_caps(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            unimax_allocation)
        got = {r['lang']: r for r in unimax_allocation(
            self._df(spark_session), 'lang', 'w',
            max_epochs=1.0, budget=30.0).collect()}
        # caps [2, 10, 100]; tail+mid cap out, head gets the rest
        assert got['tail']['allocation'] == 2.0
        assert got['mid']['allocation'] == 10.0
        assert got['head']['allocation'] == 18.0
        assert got['tail']['epochs'] == 1.0
        assert got['head']['epochs'] == pytest.approx(0.18)

    def test_uniform_when_no_cap_binds(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            unimax_allocation)
        df = spark_session.createDataFrame(
            [('a', 1)] * 10 + [('b', 1)] * 10 + [('c', 1)] * 10,
            'lang string, w int')
        got = {r['lang']: r['allocation'] for r in unimax_allocation(
            df, 'lang', 'w', max_epochs=2.0, budget=30.0).collect()}
        assert got == {'a': 10.0, 'b': 10.0, 'c': 10.0}

    def test_budget_beyond_caps_leaves_leftover(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            unimax_allocation)
        got = {r['lang']: r['allocation'] for r in unimax_allocation(
            self._df(spark_session), 'lang', 'w',
            max_epochs=1.0, budget=1000.0).collect()}
        assert got == {'tail': 2.0, 'mid': 10.0, 'head': 100.0}

    def test_budget_fraction_resolves_in_plan(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            unimax_allocation)
        got = {r['lang']: r['allocation'] for r in unimax_allocation(
            self._df(spark_session), 'lang', 'w',
            max_epochs=1.0, budget_fraction=0.5).collect()}
        # B = 56: tail 2 + mid 10 cap out, head gets 44
        assert got == {'tail': 2.0, 'mid': 10.0, 'head': 44.0}

    def test_validation(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            unimax_allocation)
        df = self._df(spark_session)
        with pytest.raises(ValueError, match='exactly one'):
            unimax_allocation(df, 'lang', 'w')
        with pytest.raises(ValueError, match='exactly one'):
            unimax_allocation(df, 'lang', 'w', budget=1.0,
                              budget_fraction=0.5)
        with pytest.raises(ValueError, match='max_epochs'):
            unimax_allocation(df, 'lang', 'w', max_epochs=0,
                              budget=1.0)


class TestTemperatureAllocation:
    def _df(self, spark_session):
        rows = ([('head', 1)] * 81 + [('mid', 1)] * 16
                + [('tail', 1)] * 1)
        return spark_session.createDataFrame(
            rows, 'lang string, w long')

    def test_alpha_one_is_natural(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            temperature_allocation)
        got = {r['lang']: r['weight'] for r in temperature_allocation(
            self._df(spark_session), 'lang', 'w',
            alpha=1.0).collect()}
        assert got['head'] == pytest.approx(81 / 98)
        assert got['tail'] == pytest.approx(1 / 98)

    def test_alpha_quarter_lifts_tail(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            temperature_allocation)
        import math
        got = {r['lang']: r['weight'] for r in temperature_allocation(
            self._df(spark_session), 'lang', 'w',
            alpha=0.25).collect()}
        # exact replay of the quantized closed form
        wq = {k: math.floor(math.sqrt(math.sqrt(v)) * 1e6 + 0.5)
              for k, v in {'head': 81, 'mid': 16, 'tail': 1}.items()}
        tot = sum(wq.values())
        for k in wq:
            assert got[k] == wq[k] / tot
        # tail lifted vs natural, head compressed, order preserved
        assert got['tail'] > 1 / 98 and got['head'] < 81 / 98
        assert got['head'] > got['mid'] > got['tail']

    def test_budget_alloc_floors(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            temperature_allocation)
        rows = temperature_allocation(
            self._df(spark_session), 'lang', 'w',
            alpha=0.5, budget=1000).collect()
        alloc = {r['lang']: r['alloc'] for r in rows}
        # sqrt weights 9/4/1 -> 642/285/71 after flooring
        assert alloc == {'head': 642, 'mid': 285, 'tail': 71}
        assert sum(alloc.values()) <= 1000

    def test_validation(self, spark_session):
        from ons_utils_spark.operators.sampling import (
            temperature_allocation)
        df = self._df(spark_session)
        with pytest.raises(ValueError, match='alpha'):
            temperature_allocation(df, 'lang', 'w', alpha=0.0)
        with pytest.raises(ValueError, match='alpha'):
            temperature_allocation(df, 'lang', 'w', alpha=1.5)
        with pytest.raises(ValueError, match='quant'):
            temperature_allocation(df, 'lang', 'w', quant=0)
