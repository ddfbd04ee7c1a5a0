"""DSIR: Data Selection via Importance Resampling (hashed n-grams).

Extension (no reference counterpart — the reference has no text
analysis; cf. SURVEY.md §2.2 "LLM-data-pipeline operators").  The
standard recipe for selecting pre-training data that "looks like" a
trusted target domain (Xie, Santurkar, Ma & Liang, "Data Selection
for Language Models via Importance Resampling", NeurIPS 2023): fit
bag-of-hashed-n-gram distributions on the TARGET corpus and on the
RAW pool, weight every raw document by its log importance ratio

    log w(x) = sum_{f in features(x)} log( p_target(h(f))
                                          / p_raw(h(f)) )

and resample the pool proportionally (compose with
``sampling.weighted_sample`` / Gumbel top-k for the draw).  Features
are word unigrams + bigrams hashed into ``n_buckets`` buckets —
hashing makes the model a FIXED-SIZE table regardless of corpus
vocabulary, the property that lets the same recipe run at 100 TB.

Spark-first design — the model IS a DataFrame:

- Fitting is one ``explode`` + ``groupBy(bucket).count`` per corpus
  (map-side partial aggregation; at most ``n_buckets`` result rows).
- The bucket log-ratio table is ≤ ``n_buckets`` rows (KiB–MiB scale)
  → broadcast hash join against the exploded raw features; one
  doc-keyed aggregate produces the weights.  Nothing is collected
  to the driver.
- The bucket hash is ENGINE-PORTABLE (first 8 hex chars of md5 →
  integer → mod): any engine with ``md5`` replays the bucketing
  bit-exactly, so a DuckDB oracle can verify the whole pipeline
  (``q_dsir_weights``).
- Smoothing is add-``smoothing`` over the bucket space:
  ``p(b) = (c_b + s) / (N + s·B)`` — exact, closed-form, ANSI-SQL
  expressible.
"""
from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .text import normalize_text, tokenize

__all__ = ['hashed_ngram_buckets', 'bucket_counts', 'dsir_log_weights']


def hashed_ngram_buckets(text_col, n_buckets: int = 10_000):
    """Array of hashed feature-bucket ids (``array<bigint>``) for one
    text column: word unigrams + bigrams (WITH multiplicity — the
    importance weight counts every occurrence), each hashed to
    ``[0, n_buckets)`` via the portable md5 recipe
    (``conv(substr(md5(f), 1, 8), 16, 10) % n_buckets``).
    Pure codegen array expressions — no UDF, no shuffle.
    """
    toks = tokenize(normalize_text(text_col))
    k = F.size(toks) - 1
    w1 = F.slice(toks, 1, F.greatest(k, F.lit(0)))
    w2 = F.slice(toks, 2, F.greatest(k, F.lit(0)))
    bgs = F.zip_with(w1, w2, lambda a, b: F.concat_ws(' ', a, b))
    feats = F.concat(toks, bgs)
    return F.transform(
        feats,
        lambda f: F.conv(F.substring(F.md5(f), 1, 8), 16, 10)
        .cast('bigint') % n_buckets)


def bucket_counts(df: SparkDF, text_col: str = 'text',
                  n_buckets: int = 10_000) -> SparkDF:
    """Hashed-feature bucket count table ``(b bigint, c bigint)`` for
    one corpus — at most ``n_buckets`` rows, the fixed-size model of
    the DSIR recipe.  One explode + one count shuffle with map-side
    partials."""
    return (
        df.select(F.explode(
            hashed_ngram_buckets(text_col, n_buckets)).alias('b'))
        .groupBy('b')
        .agg(F.count(F.lit(1)).alias('c'))
    )


def dsir_log_weights(
    raw: SparkDF,
    target: SparkDF,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    target_counts: SparkDF = None,
    raw_counts: SparkDF = None,
) -> SparkDF:
    """Per-document DSIR log importance weight of every ``raw`` row
    against the ``target`` distribution: ``(id_col, n_feats bigint,
    log_weight double)``.  Higher means more target-like; documents
    with no features (fewer than one token) have ``n_feats = 0`` and
    NULL ``log_weight``.

    Pass precomputed ``target_counts``/``raw_counts`` tables (from
    :func:`bucket_counts`, persisted) to skip refitting — at corpus
    scale the counts are the model artifact, refit only when the
    corpus changes.  The log-ratio table is at most ``n_buckets``
    rows and is explicitly broadcast; the only corpus-scale shuffle
    is the final doc-keyed aggregate.
    """
    if (target_counts is None) != (raw_counts is None):
        raise ValueError(
            'pass both target_counts and raw_counts, or neither')
    if target_counts is None:
        target_counts = bucket_counts(target, text_col, n_buckets)
        raw_counts = bucket_counts(raw, text_col, n_buckets)
    s = float(smoothing)
    t_tot = target_counts.agg(
        F.coalesce(F.sum('c'), F.lit(0)).alias('__tt'))
    r_tot = raw_counts.agg(
        F.coalesce(F.sum('c'), F.lit(0)).alias('__tr'))
    table = (
        raw_counts.withColumnRenamed('c', '__cr')
        .join(target_counts.withColumnRenamed('c', '__ct'),
              'b', 'full_outer')
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            'b',
            (F.log((F.coalesce('__ct', F.lit(0)) + s)
                   / (F.col('__tt') + s * n_buckets))
             - F.log((F.coalesce('__cr', F.lit(0)) + s)
                     / (F.col('__tr') + s * n_buckets)))
            .alias('__lr'))
    )
    # explode_outer keeps zero-feature documents (NULL/empty text) as
    # one NULL-bucket row through the SAME aggregation — count('__lr')
    # gives n_feats=0 and sum of the NULL '__lr' gives NULL
    # log_weight, exactly the old left-join contract — so the second
    # full scan of ``raw`` (the id re-join) is gone.  The table join
    # flips inner → left for the NULL rows; counting '__lr' rather
    # than 'b' preserves the old inner-join semantics for features
    # whose bucket is absent from a user-supplied stale raw_counts
    # (when the counts are fit here, every raw bucket is present and
    # the branch is moot).
    doc_feats = raw.select(
        F.col(id_col).alias('__id'),
        F.explode_outer(hashed_ngram_buckets(text_col, n_buckets))
        .alias('b'))
    return (
        doc_feats
        .join(F.broadcast(table), 'b', 'left')
        .groupBy('__id')
        .agg(F.count('__lr').alias('n_feats'),
             F.sum('__lr').alias('log_weight'))
        .select(
            F.col('__id').alias(id_col),
            F.col('n_feats').cast('bigint').alias('n_feats'),
            F.col('log_weight'))
    )
