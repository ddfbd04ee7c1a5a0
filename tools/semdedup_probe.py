"""SemDeDup boundary-miss probe: cluster-pruned recall vs exact GEMM.

``semantic_dedup_pairs`` only compares pairs that share a k-means
cluster, so near-duplicates straddling a cluster boundary are missed
by design.  This probe quantifies that miss on the real embeddings:
exact ground truth from ``embedding_near_duplicates`` (full blocked
GEMM), then recall/precision and the scanned-pair-fraction of the
cluster-pruned path across n_clusters operating points — the
measured answer to "how much recall does Σ|cluster|² pruning trade
away", companion to tools/lsh_recall_probe.py.

    python tools/semdedup_probe.py [sf_dir] [threshold]

Default threshold 0.5: the synthetic embeddings are near-uniform —
at sf0.1 the corpus has 14 exact pairs at cosine >= 0.5 and none at
0.7+ — so 0.5 is the highest threshold with a non-empty ground
truth to measure recall against.
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
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark('semdedup-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    emb = load_tables(spark, sf, tables=['embeddings'])['embeddings']
    n = emb.count()

    truth = {
        (r['id_a'], r['id_b'])
        for r in dd.embedding_near_duplicates(
            emb, 'vec_id', 'embedding', threshold=thr).collect()
    }
    print(f'{n} vectors; ground truth: {len(truth)} pairs with '
          f'cosine >= {thr} (exact blocked GEMM)')

    print(f'{"clusters":>9} {"overlap":>8} {"pairs":>7} {"recall":>7} '
          f'{"precision":>9} {"scan_frac":>9}')
    from ons_utils_spark.operators.similarity import (
        ivf_assign, ivf_assign_multi, ivf_centroids)
    for n_clusters in (4, 8, 16, 32, 64):
        cents = ivf_centroids(emb, 'embedding', 'vec_id',
                              n_clusters=n_clusters, iters=1)
        for overlap in (1, 2):
            got = {
                (r['id_a'], r['id_b'])
                for r in dd.semantic_dedup_pairs(
                    emb, 'vec_id', 'embedding',
                    n_clusters=n_clusters, threshold=thr,
                    overlap=overlap).collect()
            }
            hit = len(truth & got)
            recall = hit / len(truth) if truth else 1.0
            precision = hit / len(got) if got else 1.0
            # scanned-pair fraction: sum |cluster| choose 2 (over the
            # overlap-exploded assignment) / n choose 2
            assigner = (ivf_assign(emb, cents, vec_col='embedding')
                        if overlap == 1 else
                        ivf_assign_multi(emb, cents,
                                         vec_col='embedding', n=overlap))
            sizes = assigner.groupBy('__ivf_c').count().collect()
            scanned = sum(r['count'] * (r['count'] - 1) // 2
                          for r in sizes)
            frac = scanned / (n * (n - 1) // 2)
            print(f'{n_clusters:>9} {overlap:>8} {len(got):>7} '
                  f'{recall:>7.3f} {precision:>9.3f} {frac:>9.4f}')
    spark.stop()


if __name__ == '__main__':
    main()
