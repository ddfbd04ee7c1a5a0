"""MinHash-LSH quality probe: recall/precision vs exact Jaccard.

Computes the exact ground-truth near-duplicate pairs (all pairs
with word-shingle Jaccard >= the threshold, via the exact
``ngram_jaccard_join``) and compares the banded MinHash candidate
sets against it at several (num_hashes, bands) operating points —
the quantified answer to "how much recall does banding trade for
its O(rows x bands) shuffle", measured on the real corpus rather
than assumed from the S-curve formula.

    python tools/lsh_recall_probe.py [sf_dir] [threshold]
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
    spark = get_spark('lsh-recall', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    docs = load_tables(spark, sf, tables=['documents'])['documents']

    truth = {
        (r['id_a'], r['id_b'])
        for r in dd.ngram_jaccard_join(
            docs, 'doc_id', 'text', shingle_n=3, threshold=thr).collect()
    }
    print(f'ground truth: {len(truth)} pairs with jaccard >= {thr}')

    points = [(32, 8), (64, 16), (64, 32), (128, 32)]
    print(f'{"hashes":>7} {"bands":>6} {"cand":>7} {"recall":>7} '
          f'{"precision":>9}')
    for num_hashes, bands in points:
        cands = {
            (r['id_a'], r['id_b'])
            for r in dd.minhash_lsh_candidates(
                docs, 'doc_id', 'text',
                num_hashes=num_hashes, bands=bands).collect()
        }
        hit = len(truth & cands)
        recall = hit / len(truth) if truth else 1.0
        precision = hit / len(cands) if cands else 1.0
        print(f'{num_hashes:>7} {bands:>6} {len(cands):>7} '
              f'{recall:>7.3f} {precision:>9.3f}')
    # the s-curve says bands=32 rows=2 catches ~all pairs >= 0.8
    spark.stop()


if __name__ == '__main__':
    main()
