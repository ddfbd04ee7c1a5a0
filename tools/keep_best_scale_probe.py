"""Scale probe for keep_best_duplicate: mega-cluster safety.

The quality-preferring dedup's two scale claims:

1. a boilerplate MEGA-CLUSTER (one component with 100k+ members)
   resolves through the ``max_by`` AGGREGATION — partial aggregation
   combines map-side, so no single task ever window-sorts the
   component's rows;
2. a long CHAIN component (worst CC diameter) converges within the
   pointer-doubling iteration cap (O(log L) rounds).

Run: PYTHONPATH=. python tools/keep_best_scale_probe.py [n]
Prints wall times + correctness asserts; results recorded in
SCALE.md round-10 notes.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '.')

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators.dedup import keep_best_duplicate  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark('keep_best_probe', master='local[32]',
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel('ERROR')

    # corpus: ids 0..n-1 in one STAR mega-cluster (realistic
    # boilerplate family: every member pairs with the hub), plus
    # n/2 loners above; score favors the highest id in the cluster
    df = spark.range(n + n // 2).select(
        F.col('id').alias('doc_id'),
        (F.col('id') % 997).cast('double').alias('score'))
    star = spark.range(1, n).select(
        F.lit(0).cast('long').alias('id_a'),
        F.col('id').alias('id_b'))
    t0 = time.time()
    kept = keep_best_duplicate(df, star, 'doc_id', 'score').collect()
    wall_star = time.time() - t0
    kept_ids = {r['doc_id'] for r in kept}
    # winner: max score 996 (ties -> lowest id with score 996)
    winners = sorted(i for i in range(n) if i % 997 == 996)
    assert len(kept_ids) == n // 2 + 1, len(kept_ids)
    assert winners[0] in kept_ids
    assert all(i in kept_ids for i in range(n, n + n // 2))
    print(f'star mega-cluster n={n}: {wall_star:.2f}s, '
          f'winner={winners[0]}, kept={len(kept_ids)}')

    # chain component (worst diameter): 0-1-2-...-m
    m = 4096  # needs ~log2(m)=12 pointer-doubling rounds
    chain = spark.range(m).select(
        F.col('id').alias('id_a'), (F.col('id') + 1).alias('id_b'))
    cdf = spark.range(m + 1).select(
        F.col('id').alias('doc_id'),
        F.col('id').cast('double').alias('score'))
    t0 = time.time()
    ckept = {r['doc_id'] for r in keep_best_duplicate(
        cdf, chain, 'doc_id', 'score').collect()}
    wall_chain = time.time() - t0
    assert ckept == {m}, sorted(ckept)[:5]  # highest score wins
    print(f'chain length {m + 1}: {wall_chain:.2f}s, '
          f'converged to single winner {m}')
    spark.stop()


if __name__ == '__main__':
    main()
