"""Similarity search over embedding columns.

North-star extension: approximate-nearest-neighbor over
``array<float>`` embeddings.

* :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  vectors, score every row with a codegen'd ``aggregate`` expression,
  ranked-window top-k. Linear scan — the correctness baseline, and
  actually the right plan up to ~10⁷ rows per query batch.
* :func:`random_hyperplane_lsh` / :func:`lsh_topk` — the scale path:
  sign-random-projection signatures bucket the corpus; queries probe
  only their own bucket (plus optional multi-probe), turning the scan
  into a hash join of buckets.

Determinism: hyperplanes are derived from xxhash64 of (seed, plane,
dim) — no RNG state, reproducible anywhere.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity


def cosine_topk(
    corpus: SparkDF,
    queries: SparkDF,
    k: int = 10,
    corpus_id: str = 'vec_id',
    corpus_vec: str = 'embedding',
    query_id: str = 'query_id',
    query_vec: str = 'query_vec',
) -> SparkDF:
    """Exact top-k by cosine similarity for each query vector.

    ``queries`` is broadcast (must be small); the corpus is scanned
    once with no shuffle until the final per-query top-k window on
    ``query_id`` (tiny — k rows per query survive the ranked filter).
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(
            F.col(corpus_vec).cast('array<double>'),
            F.col(query_vec).cast('array<double>'),
        ).alias('cosine'),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col('cosine').desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn('__rk', F.row_number().over(w))
        .filter(F.col('__rk') <= k)
        .drop('__rk')
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list:
    """Deterministic pseudo-random unit-free hyperplane weights.

    Derived from a splitmix-style integer mix of (seed, plane, d) —
    stable across machines, no numpy RNG state to ship.
    """
    weights = []
    for d in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9
             + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        # Map to [-1, 1)
        weights.append((x / 2**63) - 1.0)
    return weights


def _plane_dots(vec_col, dim: int, num_planes: int, seed: int):
    """Array column of ``vec · hyperplane_p`` for p in [0, num_planes)."""
    dots = []
    for p in range(num_planes):
        w = _hyperplane(dim, p, seed)
        dots.append(
            F.aggregate(
                F.zip_with(
                    vec_col.cast('array<double>'),
                    F.array(*[F.lit(x) for x in w]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*dots)


def _signature_from_dots(dots_col):
    """Fold a dot-product array into the sign-bit bucket id."""
    bits = F.transform(
        dots_col,
        lambda d, i: F.when(
            d > 0, F.pow(F.lit(2.0), i).cast('long')
        ).otherwise(F.lit(0).cast('long')),
    )
    return F.aggregate(
        bits, F.lit(0).cast('long'), lambda acc, b: acc.bitwiseOR(b)
    )


def random_hyperplane_signature(
    vec_col,
    dim: int,
    num_planes: int = 16,
    seed: int = 42,
):
    """Sign-random-projection LSH signature (bigint bucket id).

    Bit p of the signature is 1 iff ``vec · hyperplane_p > 0``. Cosine-
    similar vectors collide with probability 1 - theta/pi per bit.
    """
    return _signature_from_dots(_plane_dots(vec_col, dim, num_planes, seed))


def _probe_buckets(dots_col, bucket_col, probes: int):
    """Base bucket + multi-probe buckets (array<long>).

    Classic multi-probe for sign-random-projection: the bits most
    likely to be wrong for a near neighbor are those whose projection
    margin ``|vec · hyperplane|`` is smallest, so probe the buckets
    obtained by flipping the ``probes`` smallest-margin bits.
    """
    ranked = F.slice(
        F.sort_array(
            F.transform(
                dots_col,
                lambda d, i: F.struct(
                    F.abs(d).alias('m'), i.alias('p')
                ),
            )
        ),
        1,
        probes,
    )
    flips = F.transform(
        ranked,
        lambda s: bucket_col.bitwiseXOR(
            F.pow(F.lit(2.0), s['p']).cast('long')
        ),
    )
    return F.concat(F.array(bucket_col), flips)


def random_hyperplane_lsh(
    df: SparkDF,
    vec_col: str = 'embedding',
    dim: int = 64,
    num_planes: int = 16,
    seed: int = 42,
    output_col: str = 'lsh_bucket',
) -> SparkDF:
    """Attach an LSH bucket id column to an embedding DataFrame."""
    return df.withColumn(
        output_col,
        random_hyperplane_signature(F.col(vec_col), dim, num_planes, seed),
    )


def lsh_topk(
    corpus: SparkDF,
    queries: SparkDF,
    k: int = 10,
    dim: int = 64,
    num_planes: int = 8,
    seed: int = 42,
    probes: int = 0,
    corpus_id: str = 'vec_id',
    corpus_vec: str = 'embedding',
    query_id: str = 'query_id',
    query_vec: str = 'query_vec',
) -> SparkDF:
    """Approximate top-k: score only corpus rows in the query's bucket.

    With b planes the corpus splits into ~2^b buckets, so the scanned
    fraction is ~2^-b of brute force; recall drops for near-orthogonal
    neighbors — tune ``num_planes`` per corpus. Same output schema as
    :func:`cosine_topk` (may return < k rows when the bucket is small).

    ``probes > 0`` enables multi-probe: each query additionally scans
    the buckets reached by flipping its ``probes`` smallest-margin
    sign bits (the bits a true near-neighbor most plausibly disagrees
    on), raising recall ~(probes+1)× scan cost without adding planes.
    Probing expands the (small, broadcast) query side only — each
    corpus row still has exactly one bucket, so no pair is scored
    twice and no corpus shuffle is added.
    """
    if not 0 <= probes <= num_planes:
        raise ValueError(
            f'probes must be in [0, num_planes={num_planes}],'
            f' got {probes}'
        )
    c = corpus.withColumn(
        '__bucket',
        random_hyperplane_signature(F.col(corpus_vec), dim, num_planes,
                                    seed),
    )
    q = queries.withColumn(
        '__dots', _plane_dots(F.col(query_vec), dim, num_planes, seed)
    ).withColumn('__base', _signature_from_dots(F.col('__dots')))
    if probes:
        q = q.withColumn(
            '__bucket',
            F.explode(
                _probe_buckets(F.col('__dots'), F.col('__base'), probes)
            ),
        )
    else:
        q = q.withColumn('__bucket', F.col('__base'))
    q = q.drop('__dots', '__base')
    scored = c.join(F.broadcast(q), on='__bucket').select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(
            F.col(corpus_vec).cast('array<double>'),
            F.col(query_vec).cast('array<double>'),
        ).alias('cosine'),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col('cosine').desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn('__rk', F.row_number().over(w))
        .filter(F.col('__rk') <= k)
        .drop('__rk')
    )
