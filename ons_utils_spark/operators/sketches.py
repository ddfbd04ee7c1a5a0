"""Count-min sketch: fixed-memory frequency estimation at corpus scale.

The streaming-classic sketch (Cormode & Muthukrishnan 2005): ``depth``
hash rows × ``width`` counters; every item increments one counter per
row; a point estimate is the MINIMUM of its ``depth`` counters —
always an OVERestimate (collisions only add), with error ≤ 2N/width
at probability 1 - 2^-depth.

Spark-first shape: the sketch IS a DataFrame ``(j, bucket, cnt)`` —
``depth × width`` rows at most, built with one ``groupBy`` whose
map-side partial aggregation does the heavy counting before the
shuffle (shuffle volume is bounded by ``depth × width × partitions``,
independent of corpus size).  No driver state, no UDFs: bucket
hashing is ``md5``-prefix arithmetic inside whole-stage codegen, so
any engine with ``md5()`` replays the sketch bit-exactly (the same
portability trick as ``dedup.minhash_signature_portable``).

Why not just ``groupBy(token).count()``?  At 100 TB the exact
counting shuffle is keyed by EVERY distinct token (billions of keys,
skewed); the sketch shuffles a fixed-size key space and still answers
heavy-hitter point queries within its error bound.  Use the sketch
for monitoring/candidate generation; verify candidates exactly.

The reference has no sketch surface (``/root/reference/ons_utils``
is utility-level); this extends the aggregation stack alongside
``functions/approx.py`` (HLL / t-digest / bitmap).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = ['cms_bucket', 'cms_build', 'cms_estimate', 'cms_topk']

# 12 hex chars = 48 bits: fits a signed long exactly in both Spark
# (conv(…,16,10)) and DuckDB (CAST('0x…' AS BIGINT)).
_PREFIX_HEX = 12


def cms_bucket(value_col, j: int, width: int):
    """Counter index of ``value_col`` in hash row ``j`` (a Column).

    ``md5(j || ':' || value)`` hex-prefix mod width — deterministic,
    seedless, engine-portable.  The ``j || ':'`` prefix makes the
    ``depth`` rows independent hash functions of one another.
    """
    h = F.md5(F.concat(F.lit(f'{j}:'), value_col.cast('string')))
    return (
        F.conv(F.substring(h, 1, _PREFIX_HEX), 16, 10)
        .cast('long') % width
    )


def cms_build(
    df: SparkDF,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> SparkDF:
    """Build the sketch: ``(j, bucket, cnt)``, one row per non-empty
    counter (missing counters are zero).

    One pass: each item fans out to ``depth`` (j, bucket) keys via
    ``posexplode`` (still codegen — no UDF), then a single groupBy
    counts.  Partial aggregation combines map-side, so the shuffle
    carries at most ``depth × width`` rows per input partition no
    matter how many items flow in.
    """
    if depth < 1 or width < 2:
        raise ValueError(
            f'depth ({depth}) must be >= 1 and width ({width}) >= 2')
    c = F.col(col)
    buckets = F.array(*[cms_bucket(c, j, width) for j in range(depth)])
    return (
        df.filter(c.isNotNull())
        .select(F.posexplode(buckets).alias('j', 'bucket'))
        .groupBy('j', 'bucket')
        .agg(F.count(F.lit(1)).alias('cnt'))
    )


def cms_estimate(
    sketch: SparkDF,
    queries: SparkDF,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> SparkDF:
    """Point-estimate the count of every value in ``queries[col]``.

    Re-derives each query value's ``depth`` counter coordinates,
    left-joins probes against the broadcast sketch (the sketch is at
    most ``depth × width`` rows — fixed-size by construction, so it
    is always the broadcastable side; broadcasting the preserved
    side of an outer join is impossible and Spark would silently
    ignore the hint), and takes the per-value MIN (absent counter =
    0).  Returns ``queries`` columns + ``cms_count``.  The estimate
    is exact for any value whose counters saw no collision, and
    otherwise overestimates by at most the collision mass — never
    under.
    """
    c = F.col(col)
    buckets = F.array(*[cms_bucket(c, j, width) for j in range(depth)])
    probes = queries.select(
        '*', F.posexplode(buckets).alias('j', 'bucket'))
    joined = probes.join(F.broadcast(sketch), on=['j', 'bucket'],
                         how='left')
    others = [f for f in queries.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col('cnt'), F.lit(0)))
             .alias('cms_count'))
    )


def cms_topk(
    df: SparkDF,
    col: str,
    candidates: SparkDF,
    k: int = 10,
    depth: int = 4,
    width: int = 1024,
    tiebreak: Sequence[str] = (),
) -> SparkDF:
    """Rank ``candidates`` by their sketch estimate over ``df[col]``.

    The monitoring pattern: the sketch is built once per batch/window
    (fixed memory), candidate sets (alerts, tracked terms, prior
    heavy hitters) are scored against it without re-scanning the
    corpus.  Output: candidates + ``cms_count`` + ``cms_rank``
    (count desc, then ``tiebreak`` asc, then ``col`` asc), top-k.
    """
    from pyspark.sql import Window

    sketch = cms_build(df, col, depth, width)
    est = cms_estimate(sketch, candidates, col, depth, width)
    order = [F.col('cms_count').desc()]
    order += [F.col(t).asc() for t in tiebreak]
    order += [F.col(col).asc()]
    w = Window.orderBy(*order)
    return (
        est.withColumn('cms_rank', F.row_number().over(w))
        .filter(F.col('cms_rank') <= k)
    )
