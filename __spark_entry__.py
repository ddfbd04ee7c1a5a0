"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator query from SURVEY.md §2 (+
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL used by
the correctness gate. Implementations live in
``ons_utils_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ons_utils_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the harmonizing-concat pipeline (the reference's flagship
    operator) over two schema-drifted lineitem extracts.
    """
    from ons_utils_spark.plans.queries import q_concat_extracts

    return q_concat_extracts(spark, '/root/testdata/sf0.001')


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — every declared query
    has one (rows-only count: 0).  Non-replayable internals use
    property oracles instead of value replay: approx_percentile is
    checked by interval containment against exact quantile_cont
    bounds (its published accuracy contract), the zlib ratio by
    DEFLATE format bounds plus planted constant documents with
    deterministic compressibility classes, the LSH/PQ/IVF-PQ top-k
    by planted exact-duplicate ranks, and the minhash/simhash dedup
    decisions by planted-family greedy keep-lowest-id replay."""
    return dict(ORACLES)
