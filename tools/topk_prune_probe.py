"""Ranked-selection prune economics: one GIANT group (the skew case
the two-stage plan exists for) — flat single-window top-k vs the
partition-pruned plan, with result equality checked.

The flat plan funnels the whole group through ONE task's sort; the
pruned plan ranks (group, input-partition) slices in parallel and
only the ~k-per-partition survivors meet in the final window.

What local[8] can and cannot show: a 30M-row in-memory sort on one
fast core is NOT a local bottleneck, so wall times here come out
near parity (the prune pays one extra exchange, the flat plan pays
one giant sort — a wash on one box).  The property that matters at
cluster scale is the PER-TASK bound, which the probe reports
structurally: the flat plan's largest task sorts n rows (at 100 TB:
one executor core sorting for hours, or OOM), the pruned plan's
largest task sorts ~n/partitions.  Equality of results is asserted.

    python tools/topk_prune_probe.py [n_rows]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.operators.joins import top_k_per_group  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    spark = get_spark('topk-prune-probe', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    # one giant group; a value column with ties; 64 input partitions
    df = (
        spark.range(n, numPartitions=64)
        .select(
            F.lit('hot').alias('g'),
            F.pmod(F.xxhash64('id'), F.lit(1_000_000)).alias('v'),
            F.col('id'),
        )
        .persist()
    )
    df.count()

    def run(prune: bool) -> tuple:
        t0 = time.time()
        rows = top_k_per_group(
            df, 'g', ['v', 'id'], 100, partition_prune=prune,
        ).collect()
        return time.time() - t0, sorted((r['v'], r['id'])
                                        for r in rows)

    t_pruned, top_pruned = run(True)
    t_flat, top_flat = run(False)
    # second measurements to shed warmup asymmetry
    t_pruned2, _ = run(True)
    t_flat2, _ = run(False)
    ok = top_pruned == top_flat
    print(f'rows={n} (ONE group, 64 input partitions), k=100')
    print(f'flat single-window:  {min(t_flat, t_flat2):6.2f}s — '
          f'largest task sorts {n:,} rows')
    print(f'partition-pruned:    {min(t_pruned, t_pruned2):6.2f}s — '
          f'largest task sorts ~{n // 64:,} rows '
          f'(final pass: {100 * 64:,})')
    print('(near-parity wall time is expected on one box; the '
          'per-task sort bound is the cluster-scale property)')
    print(f'result equality: {"EQUAL" if ok else "MISMATCH"}')
    if not ok:
        raise SystemExit(1)
    spark.stop()


if __name__ == '__main__':
    main()
