"""Matryoshka funnel recall probe: truncated-coarse recall vs dims.

``matryoshka_topk`` is exact whenever the truncated top-``rerank_k``
shortlist contains the true full-width top-``k``.  This probe
measures that containment on the real embeddings table: brute-force
full-width top-k as ground truth, then recall@k of the funnel across
(dims, rerank_k) operating points — the measured answer to "how
narrow can the coarse pass go before rerank_k stops covering the
misses".  Companion to tools/ann_scale_probe.py (LSH/IVF/PQ recall)
and tools/semdedup_probe.py.

    python tools/matryoshka_probe.py [sf_dir] [k] [n_queries]

Note the synthetic embeddings are near-uniform Gaussian — the
HARDEST case for prefix truncation (no energy compaction like a real
matryoshka-trained embedder), so these recalls are a floor, not a
ceiling.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators.similarity import (  # noqa: E402
    cosine_topk, matryoshka_topk)
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark('matryoshka-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    emb = load_tables(spark, sf, tables=['embeddings'])['embeddings']
    queries = emb.filter(F.col('vec_id') < n_q).select(
        F.col('vec_id').alias('query_id'),
        F.col('embedding').alias('query_vec'))
    corpus = emb.filter(F.col('vec_id') >= n_q)
    n = corpus.count()
    truth = {
        (r['query_id'], r['vec_id'])
        for r in cosine_topk(corpus, queries, k=k).collect()
    }
    print(f'{n} corpus vectors, {n_q} queries, ground truth = '
          f'full-width brute-force top-{k} ({len(truth)} pairs)')
    print(f'{"dims":>5} {"rerank_k":>9} {"recall@k":>9} '
          f'{"coarse_flops":>13}')
    for dims in (4, 8, 16, 32):
        for rerank_k in (k, 2 * k, 4 * k, 8 * k):
            got = {
                (r['query_id'], r['vec_id'])
                for r in matryoshka_topk(
                    corpus, queries, dims=dims, k=k,
                    rerank_k=rerank_k).collect()
            }
            recall = len(got & truth) / len(truth) if truth else 1.0
            # coarse FLOPs relative to full-width brute force, plus
            # the full-width rerank of n_q*rerank_k candidates
            rel = (dims * n + 64 * rerank_k) / (64 * n)
            print(f'{dims:>5} {rerank_k:>9} {recall:>9.3f} '
                  f'{rel:>12.3f}x')


if __name__ == '__main__':
    main()
