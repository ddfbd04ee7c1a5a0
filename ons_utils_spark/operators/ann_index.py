"""Persisted IVF ANN index: build once, append batches, prune at search.

The in-memory :mod:`similarity` operators re-derive their index
structures per query batch; this module is the deployment shape for
100 TB corpora — the index is a PARQUET TABLE partitioned by coarse
cluster id, built once and appended per ingest batch, and a query
batch reads only its probed cluster partitions (partition pruning at
the file-listing layer, the same lever as a date-partitioned scan):

* :func:`build_ivf_index` — train the deterministic k-means coarse
  quantizer (:func:`similarity.ivf_centroids`), tag every corpus
  vector with its nearest centroid (Arrow GEMM per batch, no
  shuffle), and write ``<path>/vectors`` partitioned by ``cluster``
  plus the tiny ``<path>/centroids`` table.
* :func:`ivf_index_append` — the ingest path: assign a NEW batch with
  the STORED centroids (no retraining, no corpus re-read, no
  shuffle) and append its partitions.  Append-only growth is what
  makes the index incremental; centroid drift is handled by a
  periodic rebuild, not per batch.
* :func:`ivf_index_search` — assign each query to its ``nprobe``
  nearest stored centroids, collect the DISTINCT probed cluster ids
  (≤ ``n_clusters`` ints — bounded regardless of query count), and
  scan ONLY those partitions: ``read.parquet(...).filter(
  cluster.isin(...))`` prunes at file listing, so the scanned
  fraction is ~``nprobe / n_clusters`` of the stored bytes.  Exact
  cosine refinement + ranked-window top-k inside the survivors.
* :func:`ivf_index_stats` — rows / files per cluster partition (skew
  and small-file visibility for the stored index).

Determinism: centroids are seeded and RNG-free (hash-ordered init +
fixed Lloyd passes — similarity.py), assignment of identical vectors
is identical, so build → append → search replays bit-identically on
any cluster layout; an exact-duplicate probe is GUARANTEED to be
found (its clone's top-1 cluster is, by identical GEMM, within the
query's top-``nprobe``).

Reference scope note: the reference engine (``/root/reference``) has
no ANN surface; this extends the training-data-pipeline extension
set (SURVEY.md §2 extras) with the persisted-index deployment model.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity
from .similarity import ivf_assign, ivf_assign_multi, ivf_centroids

__all__ = [
    'build_ivf_index',
    'ivf_index_append',
    'ivf_index_search',
    'ivf_index_stats',
    'load_ivf_centroids',
]


def _vectors_path(path: str) -> str:
    return os.path.join(path, 'vectors')


def _centroids_path(path: str) -> str:
    return os.path.join(path, 'centroids')


def build_ivf_index(
    corpus: SparkDF,
    path: str,
    vec_col: str = 'embedding',
    id_col: str = 'vec_id',
    n_clusters: int = 16,
    iters: int = 2,
    seed: int = 42,
    centroids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Build the persisted index at ``path``; returns the centroids.

    Writes ``<path>/vectors`` — ``(<id_col>, <vec_col>)`` partitioned
    by ``cluster`` — and ``<path>/centroids`` — ``(cluster,
    centroid)``.  ``mode('overwrite')`` on both: rebuilding is
    idempotent (training is deterministic, so a rebuild reproduces
    the same files).  Pass ``centroids`` to skip training (e.g. a
    codebook trained on a sample or loaded from a prior index).
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = ivf_centroids(
            corpus, vec_col=vec_col, id_col=id_col,
            n_clusters=n_clusters, iters=iters, seed=seed,
        )
    cents = np.asarray(centroids, dtype=np.float64)
    (
        ivf_assign(corpus, cents, vec_col=vec_col, output_col='cluster')
        .select(id_col, vec_col, 'cluster')
        .write.mode('overwrite').partitionBy('cluster')
        # STATIC overwrite regardless of session conf: under
        # partitionOverwriteMode=dynamic a rebuild would only replace
        # clusters the new assignment emits, silently keeping stale
        # vector partitions from a previous index (different
        # centroids/corpus) alive in the search path.
        .option('partitionOverwriteMode', 'static')
        .parquet(_vectors_path(path))
    )
    (
        spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(cents)],
            schema='cluster int, centroid array<double>',
        )
        .coalesce(1)
        .write.mode('overwrite').parquet(_centroids_path(path))
    )
    return cents


def load_ivf_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """Read the stored codebook back as a ``(n_clusters, dim)`` array."""
    rows = spark.read.parquet(_centroids_path(path)) \
        .orderBy('cluster').collect()
    return np.array([r['centroid'] for r in rows], dtype=np.float64)


def ivf_index_append(
    new_batch: SparkDF,
    path: str,
    vec_col: str = 'embedding',
    id_col: str = 'vec_id',
) -> None:
    """Assign ``new_batch`` with the STORED centroids and append it.

    The ingest path: no retraining, no corpus re-read — cost is one
    GEMM pass over the batch plus an append of its partitions.
    Callers own id uniqueness across batches (ids are not checked
    here; dedup-at-ingest is :func:`dedup.minhash_index_probe`'s
    job, not the ANN index's).
    """
    cents = load_ivf_centroids(new_batch.sparkSession, path)
    (
        ivf_assign(new_batch, cents, vec_col=vec_col,
                   output_col='cluster')
        .select(id_col, vec_col, 'cluster')
        .write.mode('append').partitionBy('cluster')
        .parquet(_vectors_path(path))
    )


def ivf_index_search(
    spark: SparkSession,
    path: str,
    queries: SparkDF,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = 'query_id',
    query_vec: str = 'query_vec',
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> SparkDF:
    """Partition-pruned top-``k``: scan only the probed clusters.

    Output: ``(<query_id>, <id_col>, cosine)`` — exact cosine within
    the probed partitions, deterministic ``(cosine desc, id asc)``
    ranking.  The only driver-side collect is the DISTINCT probed
    cluster-id set (≤ ``n_clusters`` ints); query vectors stay
    distributed and are broadcast into the probe join.  The probe
    assignment is computed twice (once for the pruning literal, once
    in the join) — two GEMM passes over the query batch are cheaper
    than materializing it, and the second pass rides the broadcast.
    """
    cents = load_ivf_centroids(spark, path)
    nprobe = min(nprobe, cents.shape[0])
    q = ivf_assign_multi(
        queries, cents, vec_col=query_vec, n=nprobe,
        output_col='cluster',
    )
    probed = sorted(
        r['cluster'] for r in q.select('cluster').distinct().collect()
    )
    vectors = spark.read.parquet(_vectors_path(path)).filter(
        F.col('cluster').isin(probed)  # file-listing partition pruning
    )
    scored = vectors.join(F.broadcast(q), on='cluster').select(
        F.col(query_id),
        F.col(id_col),
        cosine_similarity(
            F.col(vec_col).cast('array<double>'),
            F.col(query_vec).cast('array<double>'),
        ).alias('cosine'),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col('cosine').desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn('__rk', F.row_number().over(w))
        .filter(F.col('__rk') <= k)
        .drop('__rk')
    )


def ivf_index_stats(spark: SparkSession, path: str) -> SparkDF:
    """``(cluster, n_rows, n_files)`` per stored partition.

    Skew visibility: a cluster list that is 100× the median is a
    probe-latency hot spot (re-train with more clusters or split
    it); many tiny files per partition mean the append cadence
    outpaces compaction (see :mod:`sources.compaction`).
    """
    v = spark.read.parquet(_vectors_path(path))
    return (
        # input_file_name() is non-deterministic to Catalyst: project
        # it first, aggregate the plain attribute
        v.select('cluster', F.input_file_name().alias('__file'))
        .groupBy('cluster').agg(
            F.count(F.lit(1)).alias('n_rows'),
            F.countDistinct('__file').alias('n_files'),
        )
        .orderBy('cluster')
    )
