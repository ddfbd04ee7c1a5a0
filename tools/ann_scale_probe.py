"""ANN scale probe: brute-force vs IVF top-k on an amplified corpus.

Replicates the sf embeddings table R times (unique ids, identical
vectors) and compares IVF search against exact brute force at ~R×
the bench corpus: wall time plus score parity (the kth-best cosine
per query must match brute force wherever the probed cells cover the
true neighbors; replicas make ids ambiguous, scores are not).
Prints one JSON line.

    python tools/ann_scale_probe.py [sf_dir] [replicas] [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import cosine_topk, get_spark, ivf_topk  # noqa: E402
from ons_utils_spark.operators.similarity import (  # noqa: E402
    ivf_pq_topk, pq_train)
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = get_spark('ann-probe', master='local[32]',
                      shuffle_partitions=32,
                      extra_confs={'spark.driver.memory': '8g'})
    spark.sparkContext.setLogLevel('ERROR')
    emb = load_tables(spark, sf_dir, tables=['embeddings'])['embeddings']
    corpus = emb.crossJoin(
        spark.range(replicas).withColumnRenamed('id', '__rep')
    ).select(
        (F.col('vec_id') * replicas + F.col('__rep')).alias('vec_id'),
        'embedding',
    )
    n_corpus = corpus.count()
    queries = emb.limit(n_queries).select(
        F.col('vec_id').alias('query_id'),
        F.col('embedding').alias('query_vec'),
    )

    t0 = time.time()
    brute = cosine_topk(corpus, queries, k=10).collect()
    t_brute = round(time.time() - t0, 2)

    t0 = time.time()
    ivf = ivf_topk(corpus, queries, k=10, n_clusters=32, nprobe=8)
    ivf_rows = ivf.collect()
    t_ivf = round(time.time() - t0, 2)

    # IVF-PQ: same pruning plus 8-byte codes instead of raw vectors.
    t0 = time.time()
    books = pq_train(corpus, m=8, k=256, sample_size=4096)
    ivfpq_rows = ivf_pq_topk(
        corpus, queries, books, k=10, n_clusters=32, nprobe=8
    ).collect()
    t_ivfpq = round(time.time() - t0, 2)

    def kth(rows):
        best = {}
        for r in rows:
            best.setdefault(r['query_id'], []).append(r['cosine'])
        return {q: sorted(s, reverse=True)[:10] for q, s in best.items()}

    b, v = kth(brute), kth(ivf_rows)
    agree = sum(
        1 for q in b
        if q in v and all(abs(x - y) < 1e-6
                          for x, y in zip(b[q], v[q]))
    )
    # IVF-PQ returns approximate (compressed-domain) scores — measure
    # id-level recall of the true top-10 instead of score parity.
    true_ids = {}
    for r in brute:
        true_ids.setdefault(r['query_id'], set()).add(r['vec_id'])
    got_ids = {}
    for r in ivfpq_rows:
        got_ids.setdefault(r['query_id'], set()).add(r['vec_id'])
    # Replicas make ids ambiguous (every vector has R identical
    # copies) — compare on the base id (vec_id // replicas).
    recalls = [
        len({i // replicas for i in true_ids[q]}
            & {i // replicas for i in got_ids.get(q, set())})
        / len({i // replicas for i in true_ids[q]})
        for q in true_ids
    ]
    print(json.dumps({
        'n_corpus': n_corpus, 'n_queries': n_queries,
        'brute_sec': t_brute, 'ivf_sec': t_ivf,
        'ivfpq_sec': t_ivfpq,
        'speedup': round(t_brute / t_ivf, 2) if t_ivf else None,
        'ivfpq_speedup': round(t_brute / t_ivfpq, 2)
        if t_ivfpq else None,
        'score_parity': f'{agree}/{len(b)}',
        'ivfpq_base_id_recall': round(sum(recalls) / len(recalls), 3),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
