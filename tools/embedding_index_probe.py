"""Embedding-index economics: probe a small new vector batch vs full
rebuild, with candidate-set equivalence checked on every run — the
vector sibling of tools/incremental_index_probe.py.

Splits the embeddings corpus into a 95% "indexed corpus" and a 5%
"new batch" (hash split — deterministic), then measures:

* full rebuild: banded hyperplane-LSH candidate pairs over
  corpus ∪ batch (the candidate stage of
  ``embedding_near_duplicates(method='lsh')``),
* incremental: ``embedding_band_index(corpus)`` once (the
  stored-artifact cost), then ``embedding_index_probe(index, batch)``
  + within-batch candidates per arriving batch, exact-cosine scoring
  of the probe candidates included (the full ingest-path work),

and asserts the incremental candidate set equals the rebuild's
candidates touching a new vector (banding is deterministic per
vector, so splitting the corpus loses nothing — the same
test-pinned completeness invariant as the MinHash index).

    python tools/embedding_index_probe.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators import dedup as dd  # noqa: E402
from ons_utils_spark.operators.dedup import _bucket_pair_join  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def _self_candidates(df, id_col='vec_id'):
    """Within-frame LSH candidate pairs (the banding + bucket
    self-join stage shared with embedding_near_duplicates)."""
    banded = dd.embedding_band_index(
        df, id_col).withColumnRenamed(id_col, '__id')
    return _bucket_pair_join(
        banded, ('band', 'bucket'), max_bucket_size=None,
    ).dropDuplicates(['id_a', 'id_b'])


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    spark = get_spark('emb-index-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    emb = load_tables(spark, sf, tables=['embeddings'])['embeddings'] \
        .select('vec_id', 'embedding')
    is_new = F.pmod(F.xxhash64('vec_id', F.lit(7)), F.lit(20)) == 0
    corpus = emb.filter(~is_new).localCheckpoint()
    batch = emb.filter(is_new).localCheckpoint()
    n_corpus, n_batch = corpus.count(), batch.count()
    print(f'corpus {n_corpus} vectors, new batch {n_batch} vectors')

    t0 = time.time()
    full = {(r['id_a'], r['id_b'])
            for r in _self_candidates(
                corpus.unionByName(batch)).collect()}
    t_full = time.time() - t0

    t0 = time.time()
    index = dd.embedding_band_index(corpus, 'vec_id').localCheckpoint()
    index.count()
    t_build = time.time() - t0

    t0 = time.time()
    probe_df = dd.embedding_index_probe(
        index, batch, 'vec_id', max_bucket_size=None)
    probe = {tuple(sorted((r['new_id'], r['index_id'])))
             for r in probe_df.collect()}
    within = {(r['id_a'], r['id_b'])
              for r in _self_candidates(batch)
              .collect()}
    # the real ingest path also scores its candidates — include it
    n_scored = dd.score_pairs_cosine(
        probe_df.select(F.col('new_id').alias('id_a'),
                        F.col('index_id').alias('id_b')),
        corpus.unionByName(batch), 'vec_id', 'embedding',
    ).filter(F.col('cosine') >= 0.5).count()
    t_probe = time.time() - t0

    new_ids = {r['vec_id'] for r in batch.select('vec_id').collect()}
    touching_new = {p for p in full
                    if p[0] in new_ids or p[1] in new_ids}
    ok = (probe | within) == touching_new
    print(f'full rebuild:      {t_full:6.2f}s  '
          f'({len(full)} candidate pairs)')
    print(f'index build (1x):  {t_build:6.2f}s  '
          f'(the stored-artifact cost, amortized over every batch)')
    print(f'probe per batch:   {t_probe:6.2f}s  '
          f'({len(probe)} cross + {len(within)} within pairs; '
          f'{n_scored} verified at cosine >= 0.5)')
    print(f'candidate-completeness vs rebuild: '
          f'{"EQUAL" if ok else "MISMATCH"}')
    if not ok:
        raise SystemExit(1)
    spark.stop()


if __name__ == '__main__':
    main()
