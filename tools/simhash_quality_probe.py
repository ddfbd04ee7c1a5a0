"""SimHash quality probe: Hamming distance vs ground-truth Jaccard.

The minhash family bug (round 5: missing modulus → all-or-nothing
signatures, caught only by a recall probe) showed that probabilistic
operators need QUALITY probes against exact ground truth, not just
value checks.  This is the SimHash counterpart: for every exact
near-dup pair (word-shingle Jaccard >= threshold) and a baseline of
random non-dup pairs, compute the 64-bit SimHash Hamming distance
and report (a) the separation between the two distributions and
(b) block-join recall — the share of true pairs sharing >= 1 of the
4 16-bit blocks (the pigeonhole guarantee only covers distance < 4,
so measured recall above that is the empirical margin).

    python tools/simhash_quality_probe.py [sf_dir] [threshold]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators import dedup as dd  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = get_spark('simhash-quality', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    docs = load_tables(spark, sf, tables=['documents'])['documents']

    sigs = {r['doc_id']: r['sh'] for r in docs.select(
        'doc_id', dd.simhash('text').alias('sh')).collect()}

    truth = [
        (r['id_a'], r['id_b'])
        for r in dd.ngram_jaccard_join(
            docs, 'doc_id', 'text', shingle_n=3,
            threshold=thr).collect()
    ]

    def ham(a: int, b: int) -> int:
        return sum(x != y for x, y in zip(sigs[a], sigs[b]))

    dup_d = sorted(ham(a, b) for a, b in truth)
    ids = sorted(sigs)
    rand_pairs = [(ids[i], ids[(i * 7 + 13) % len(ids)])
                  for i in range(200)]
    rand_pairs = [(a, b) for a, b in rand_pairs
                  if a != b and (a, b) not in set(truth)]
    rnd_d = sorted(ham(a, b) for a, b in rand_pairs)

    def med(xs):
        return xs[len(xs) // 2] if xs else None

    print(f'true near-dup pairs (J>={thr}): {len(dup_d)} | '
          f'hamming median={med(dup_d)} max={max(dup_d)}')
    print(f'random pairs: {len(rnd_d)} | '
          f'hamming median={med(rnd_d)} min={min(rnd_d)}')

    def blocks(bits: str):
        return {(m, bits[m * 16:(m + 1) * 16]) for m in range(4)}

    hits = sum(1 for a, b in truth
               if blocks(sigs[a]) & blocks(sigs[b]))
    recall = hits / len(truth) if truth else 1.0
    print(f'4x16-bit block-join recall on true pairs: {recall:.3f}')
    assert med(dup_d) < med(rnd_d), 'no separation — simhash broken'
    assert recall >= 0.8, f'block recall collapsed: {recall}'
    print('OK: near-dups separate from random pairs and block '
          'recall holds')
    spark.stop()


if __name__ == '__main__':
    main()
