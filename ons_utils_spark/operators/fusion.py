"""Rank fusion for hybrid retrieval (lexical + vector + priors).

Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): a
document's fused score is ``Σ_sources 1/(k + rank_in_source)`` —
score-free, so rankings whose scores live on incomparable scales
(BM25 logs vs cosine vs freshness) combine without calibration, and
``k`` (conventionally 60) damps the head so one source can't dominate.

Spark-first shape: each input ranking is a (small, already-top-k)
DataFrame of ``(id, rank)``; fusion is a union + one groupBy on the
id — no corpus scan, no UDFs.  Scores use INTEGER reciprocals
(``scale div (k + rank)``, default scale 1e9): rank fusion only needs
score ORDER, and integer math makes the fused scores bit-identical on
any engine — the DuckDB oracle replays the whole fusion exactly
(float 1/(k+r) sums would differ in the low bits across engines).
The integer variant preserves the float RRF ordering whenever score
gaps exceed 1/scale — at scale=1e9 that is every realistic tie-break
short of identical rank multisets, which tie under both.

The reference has no retrieval surface; this composes with
``operators.index.bm25_rank`` (lexical) and ``operators.similarity``
(vector ANN) to form the standard hybrid-search pipeline.
"""
from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ['rrf_fuse']


def rrf_fuse(
    rankings: Sequence[SparkDF],
    id_col: str = 'doc_id',
    rank_col: str = 'rank',
    k: int = 60,
    scale: int = 1_000_000_000,
    top_k: Optional[int] = None,
) -> SparkDF:
    """Fuse rankings → ``(id, rrf_score, n_sources, rrf_rank)``.

    Every input must carry ``id_col`` and a 1-based ``rank_col``;
    items absent from a source contribute 0 from it (standard RRF).
    ``rrf_score = Σ scale div (k + rank)`` (integer division),
    ``n_sources`` counts the rankings that returned the item, and
    ``rrf_rank`` orders by (score desc, id asc) — deterministic under
    exact integer ties.  Each ranking is expected to be pre-truncated
    to its own top-k (the RRF contract), so the union is tiny and the
    groupBy broadcast-scale.
    """
    if not rankings:
        raise ValueError('rrf_fuse needs at least one ranking')
    if k <= 0 or scale <= 0:
        raise ValueError(f'k ({k}) and scale ({scale}) must be positive')
    tagged = [
        r.select(F.col(id_col),
                 F.col(rank_col).cast('long').alias('__rank'))
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    contrib = F.expr(
        f'CAST({scale} AS BIGINT) div ({k} + __rank)')
    fused = (
        unioned.select(id_col, contrib.alias('__contrib'))
        .groupBy(id_col)
        .agg(F.sum('__contrib').alias('rrf_score'),
             F.count(F.lit(1)).alias('n_sources'))
    )
    w = Window.orderBy(F.col('rrf_score').desc(), F.col(id_col).asc())
    out = fused.withColumn('rrf_rank', F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col('rrf_rank') <= top_k)
    return out
