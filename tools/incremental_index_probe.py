"""Incremental-index economics: probe a small new batch vs full
rebuild, with pair-set equivalence checked on every run.

Splits the documents corpus into a 95% "indexed corpus" and a 5%
"new batch" (hash split — deterministic), then measures:

* full rebuild: minhash_lsh_candidates over corpus ∪ batch,
* incremental: minhash_band_index(corpus) once (the stored-artifact
  cost), then minhash_index_probe(index, batch) + within-batch
  candidates per arriving batch,

and asserts the incremental pair set equals the rebuild's pairs
touching a new doc (the test-pinned completeness invariant, here
exercised on the real corpus at scale).

    python tools/incremental_index_probe.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators import dedup as dd  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    spark = get_spark('inc-index-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    docs = load_tables(spark, sf, tables=['documents'])['documents'] \
        .filter(F.col('text').isNotNull()).select('doc_id', 'text')
    is_new = F.pmod(F.xxhash64('doc_id', F.lit(7)), F.lit(20)) == 0
    corpus = docs.filter(~is_new).localCheckpoint()
    batch = docs.filter(is_new).localCheckpoint()
    n_corpus, n_batch = corpus.count(), batch.count()
    print(f'corpus {n_corpus} docs, new batch {n_batch} docs')

    t0 = time.time()
    full = {(r['id_a'], r['id_b'])
            for r in dd.minhash_lsh_candidates(
                corpus.unionByName(batch),
                num_hashes=64, bands=16).collect()}
    t_full = time.time() - t0

    t0 = time.time()
    index = dd.minhash_band_index(
        corpus, num_hashes=64, bands=16).localCheckpoint()
    index.count()
    t_build = time.time() - t0

    t0 = time.time()
    probe = {tuple(sorted((r['new_id'], r['index_id'])))
             for r in dd.minhash_index_probe(
                 index, batch, num_hashes=64, bands=16).collect()}
    within = {(r['id_a'], r['id_b'])
              for r in dd.minhash_lsh_candidates(
                  batch, num_hashes=64, bands=16).collect()}
    t_probe = time.time() - t0

    new_ids = {r['doc_id'] for r in batch.select('doc_id').collect()}
    touching_new = {p for p in full
                    if p[0] in new_ids or p[1] in new_ids}
    ok = (probe | within) == touching_new
    print(f'full rebuild:      {t_full:6.2f}s  '
          f'({len(full)} candidate pairs)')
    print(f'index build (1x):  {t_build:6.2f}s  '
          f'(the stored-artifact cost, amortized over every batch)')
    print(f'probe per batch:   {t_probe:6.2f}s  '
          f'({len(probe)} cross + {len(within)} within pairs)')
    print(f'pair-completeness vs rebuild: '
          f'{"EQUAL" if ok else "MISMATCH"}')
    if not ok:
        raise SystemExit(1)
    spark.stop()


if __name__ == '__main__':
    main()
