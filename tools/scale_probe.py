"""Dedup scale probe: run MinHash-LSH dedup on an amplified corpus.

Replicates the sf documents table R times (unique ids, texts
identical across replicas) — the dedup path must collapse each
replica family to ONE survivor. This probes the candidate-join and
signature stages at ~R× the bench corpus without synthesizing new
content. Prints one JSON line.

    python tools/scale_probe.py [sf_dir] [replicas]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark, minhash_dedup  # noqa: E402
from ons_utils_spark.sources.readers import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark('scale-probe', master='local[32]',
                      shuffle_partitions=32,
                      extra_confs={'spark.driver.memory': '8g'})
    spark.sparkContext.setLogLevel('ERROR')
    docs = load_tables(spark, sf_dir, tables=['documents'])['documents']
    n_base = docs.count()

    amplified = docs.crossJoin(
        spark.range(replicas).withColumnRenamed('id', '__rep')
    ).select(
        (F.col('doc_id') * replicas + F.col('__rep')).alias('doc_id'),
        'text',
    )
    n_amp = amplified.count()  # materialize the input before timing

    t0 = time.time()
    kept = minhash_dedup(amplified, 'doc_id', 'text',
                         num_hashes=64, bands=16,
                         jaccard_threshold=0.8)
    n_kept = kept.count()
    dt = round(time.time() - t0, 2)

    # Identical texts share signatures, so replica families collapse
    # to one survivor each and cross-family near-dups behave exactly
    # as in the base corpus: the amplified result must equal the
    # base-corpus dedup count (untimed reference run).
    n_base_dedup = minhash_dedup(
        docs, 'doc_id', 'text', num_hashes=64, bands=16,
        jaccard_threshold=0.8).count()

    # Hot-family guard check: candidate-pair volume must grow
    # LINEARLY in the replica count (k-clone family -> k-1 star
    # pairs), not quadratically (k(k-1)/2 from the unguarded bucket
    # self-join). Measure at R/2 and R: the guarded ratio is ~2x,
    # the unguarded one ~4x.
    from ons_utils_spark.operators.dedup import minhash_lsh_candidates

    def _amplify(r):
        return docs.crossJoin(
            spark.range(r).withColumnRenamed('id', '__rep')
        ).select(
            (F.col('doc_id') * r + F.col('__rep')).alias('doc_id'),
            'text')

    half = max(1, replicas // 2)
    pairs_half = minhash_lsh_candidates(
        _amplify(half), num_hashes=64, bands=16).count()
    pairs_full = minhash_lsh_candidates(
        _amplify(replicas), num_hashes=64, bands=16).count()
    growth = round(pairs_full / max(1, pairs_half), 2)

    print(json.dumps({
        'n_base': n_base, 'replicas': replicas, 'n_input': n_amp,
        'n_kept': n_kept, 'n_base_dedup': n_base_dedup,
        'dedup_sec': dt,
        'docs_per_sec': round(n_amp / dt, 1),
        'collapsed_exactly': n_kept == n_base_dedup,
        'pairs_at_half_replicas': pairs_half,
        'pairs_at_full_replicas': pairs_full,
        'pair_growth_ratio': growth,
        'pair_growth_linear': growth < 3.0,
    }))
    spark.stop()


if __name__ == '__main__':
    main()
