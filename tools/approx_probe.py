"""Scale probe: exact vs sketch percentile trim.

SCALE.md accepts `filter_by_percentile_range(exact=True)` as the
bench's slowest line because the oracle needs exact bounds, and
claims `exact=False` (t-digest approx_percentile, map-side partials
only) is the 100 TB path. This probe MEASURES that claim at sf0.1:
wall time for each mode and the relative error of the sketch bounds
and of the resulting trimmed-row count.

    python tools/approx_probe.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.functions.approx import (  # noqa: E402
    filter_by_percentile_range,
)
from ons_utils_spark.sources.readers import read_parquet  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    spark = get_spark('approx-probe', shuffle_partitions=32)
    spark.sparkContext.setLogLevel('ERROR')
    lineitem = read_parquet(
        spark, os.path.join(sf_dir, 'lineitem.parquet'))
    total = lineitem.count()

    results = {}
    for exact in (True, False):
        t0 = time.time()
        kept = filter_by_percentile_range(
            lineitem, 'l_extendedprice', 0.01, 0.99, exact=exact
        ).count()
        results[exact] = (kept, time.time() - t0)
    # second timed pass after warm-up, report min
    for exact in (True, False):
        t0 = time.time()
        kept = filter_by_percentile_range(
            lineitem, 'l_extendedprice', 0.01, 0.99, exact=exact
        ).count()
        old_kept, old_wall = results[exact]
        results[exact] = (kept, min(old_wall, time.time() - t0))

    (kept_exact, wall_exact) = results[True]
    (kept_approx, wall_approx) = results[False]
    err_rows = abs(kept_approx - kept_exact) / max(kept_exact, 1)
    print(f'rows={total}')
    print(f'exact : kept={kept_exact} wall={wall_exact:.2f}s')
    print(f'sketch: kept={kept_approx} wall={wall_approx:.2f}s '
          f'({wall_exact / max(wall_approx, 1e-9):.2f}x faster, '
          f'row-count error {100 * err_rows:.3f}%)')
    assert err_rows < 0.01, 'sketch trim should be within 1% of exact'
    spark.stop()


if __name__ == '__main__':
    main()
