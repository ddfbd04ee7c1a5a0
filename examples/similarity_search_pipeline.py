"""End-to-end similarity-search pipeline over an embedding corpus.

The retrieval-side counterpart of the curation pipeline, composed
entirely from ons_utils_spark operators:

    raw embeddings
      → embedding-cosine near-duplicate removal (keep lowest id)
      → PQ codebook training (seeded sample, driver-bounded)
      → corpus compression to 8-byte codes (32× smaller)
      → IVF-PQ top-k retrieval for a query batch
      → results parquet (query_id, vec_id, pq_score)

Run:  PYTHONPATH=. python examples/similarity_search_pipeline.py \
          [sf_dir] [output_dir]
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ons_utils_spark import get_spark
from ons_utils_spark.operators.dedup import embedding_near_duplicates
from ons_utils_spark.operators.similarity import (
    ivf_pq_topk,
    pq_train,
)
from ons_utils_spark.sources.readers import load_tables, write_parquet


def dedup_corpus(emb: DataFrame, threshold: float = 0.98) -> DataFrame:
    """Drop near-duplicate vectors (cosine >= threshold), keeping the
    lowest id of each near-dup pair."""
    pairs = embedding_near_duplicates(emb, threshold=threshold)
    to_drop = pairs.select(F.col('id_b').alias('vec_id')).distinct()
    return emb.join(to_drop, on='vec_id', how='left_anti')


def build_and_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Train PQ codebooks, compress the corpus, IVF-PQ retrieve."""
    books = pq_train(corpus, m=8, k=256, sample_size=4096)
    return ivf_pq_topk(
        corpus, queries, books, k=k,
        n_clusters=n_clusters, nprobe=nprobe, iters=1,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/similarity_out'

    spark = get_spark('similarity-search-pipeline')
    spark.sparkContext.setLogLevel('ERROR')
    emb = load_tables(spark, sf_dir, tables=['embeddings'])['embeddings']

    n_raw = emb.count()
    corpus = dedup_corpus(emb)
    n_corpus = corpus.count()
    print(f'vectors={n_raw} after near-dup removal={n_corpus}')

    queries = emb.limit(5).select(
        F.col('vec_id').alias('query_id'),
        F.col('embedding').alias('query_vec'),
    )
    results = build_and_search(corpus, queries)
    print(f'retrieved={results.count()} rows for 5 queries')
    results.orderBy('query_id', F.col('pq_score').desc()).show(10)

    # Late-interaction RERANK of the ANN candidates: reshape each
    # 64-dim vector into an 8-token x 8-dim matrix and MaxSim-score
    # ONLY each query's own retrieved pairs via the first-class
    # candidates= parameter — the two-stage ColBERT deployment
    # shape (cheap pooled-vector candidates, token-level rerank);
    # the full query x corpus cross never forms.
    from ons_utils_spark.operators.similarity import maxsim_topk
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.slice(F.col('embedding').cast('array<double>'),
                          i * 8 + 1, 8))
    dtok = corpus.select('vec_id', tok.alias('token_vecs'))
    qtok = emb.limit(5).select(
        F.col('vec_id').alias('query_id'), tok.alias('token_vecs'))
    reranked = maxsim_topk(
        dtok, qtok, k=3, doc_id='vec_id',
        candidates=results.select('query_id', 'vec_id'))
    print('MaxSim rerank of the ANN candidates (top-3/query):')
    reranked.orderBy('query_id', F.col('maxsim').desc()).show(15)

    write_parquet(results, os.path.join(out_dir, 'topk'))
    print(f'wrote {out_dir}')


if __name__ == '__main__':
    main()
