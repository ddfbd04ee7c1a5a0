"""Scale probe: winnowing dedup under corpus amplification.

Replicates the documents corpus k x with every token prefixed by a
replica tag, so grams never collide across replicas. Replica 0 keeps
the ORIGINAL text, so its pairs must equal the base run exactly. The
tag perturbs md5 values in replicas >= 1, which legitimately moves
WHICH gram wins each winnowing window — near-threshold shared-
fingerprint counts shift a little — so the total is asserted within
a tolerance of k x base rather than exactly (the detection GUARANTEE
— one shared fp per >= k+w-1-token overlap — is hash-independent;
the count above the min_shared threshold is not).

Also reports the winnowing compression: fingerprints kept vs raw
k-grams (the factor by which the dedup self-join input shrinks
before the shuffle).

    python tools/winnow_scale_probe.py [sf_dir] [k]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators.dedup import (  # noqa: E402
    winnow_dup_pairs,
    winnow_fingerprints,
)
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def amplify(docs, k: int):
    """k tagged replicas with disjoint gram spaces and distinct ids."""
    n = docs.count()
    replicas = docs.sparkSession.range(k).withColumnRenamed('id', 'rep')
    return (
        docs.crossJoin(replicas)
        .select(
            (F.col('doc_id') + F.col('rep') * (n * 10)).alias('doc_id'),
            # replica 0 = original text (exact-equality anchor);
            # replicas >= 1 prefix every token (incl. the first), so
            # token/gram counts stay identical and gram spaces stay
            # disjoint across replicas
            F.when(F.col('rep') == 0, F.col('text')).otherwise(
                F.concat(
                    F.concat_ws('', F.lit('r'), F.col('rep'), F.lit('z')),
                    F.regexp_replace(
                        'text', ' ',
                        F.concat_ws(
                            '', F.lit(' r'), F.col('rep'), F.lit('z'))),
                )).alias('text'),
        )
    )


def run(docs, label: str) -> tuple:
    t0 = time.time()
    pairs = winnow_dup_pairs(docs, 'doc_id', 'text', k=4, w=3,
                             min_shared=20).count()
    wall = time.time() - t0
    print(f'{label}: {pairs} pairs in {wall:.2f}s')
    return pairs, wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark('winnow-probe', shuffle_partitions=32)
    spark.sparkContext.setLogLevel('ERROR')

    docs = load_tables(spark, sf_dir, tables=['documents'])['documents']
    docs = docs.select('doc_id', 'text')

    base_pairs, base_wall = run(docs, 'base (1x)')
    amp = amplify(docs, k).localCheckpoint()  # isolate generation cost
    amp_pairs, amp_wall = run(amp, f'amplified ({k}x)')

    # replica 0 is byte-identical to the base corpus: exact equality
    n = docs.count()
    rep0 = winnow_dup_pairs(
        amp.filter(F.col('doc_id') < n * 10), 'doc_id', 'text',
        k=4, w=3, min_shared=20).count()
    assert rep0 == base_pairs, f'replica-0 drift: {rep0} != {base_pairs}'
    # tagged replicas shift near-threshold counts only: total within
    # 15% of k x base
    assert abs(amp_pairs - k * base_pairs) <= 0.15 * k * base_pairs, (
        f'{amp_pairs} outside 15% of {k} * {base_pairs}')
    print(f'replica-0 pairs == base ({rep0}); total {amp_pairs} within '
          f'15% of k x base ({k * base_pairs})')

    # winnowing compression on the amplified corpus
    toks = F.split(F.lower('text'), ' ')
    n_grams = amp.select(
        F.sum(F.greatest(F.size(toks) - 3, F.lit(0))).alias('g')
    ).collect()[0]['g']
    n_fps = winnow_fingerprints(amp, 'doc_id', 'text', k=4, w=3).count()
    print(f'join-input compression: {n_fps} fingerprints vs '
          f'{n_grams} raw 4-grams ({n_grams / max(n_fps, 1):.2f}x '
          f'smaller self-join input)')
    print(f'wall amplification: {amp_wall / max(base_wall, 1e-9):.1f}x '
          f'for {k}x the documents')
    spark.stop()


if __name__ == '__main__':
    main()
