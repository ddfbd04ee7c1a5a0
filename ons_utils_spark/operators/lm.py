"""N-gram language-model scoring for corpus curation.

Extension (no reference counterpart — the reference has no text
analysis at all; cf. SURVEY.md §2.2 "LLM-data-pipeline operators").
The perplexity-style quality signal used by corpus-curation
pipelines (e.g. the CCNet recipe, Wenzek et al. 2020: score web text
under a reference-domain LM and filter the tail): documents whose
mean token log-likelihood under a bigram model trained on a trusted
corpus is low are boilerplate, gibberish, or the wrong language.

Spark-first design — the model IS a DataFrame:
- Training: explode token bigrams, ``groupBy.count`` — two shuffles,
  map-side partial aggregation, no driver state.
- Scoring: LEFT JOIN document bigrams against the count tables and
  average ``ln P(w2|w1)`` per document. The (min_count-pruned)
  bigram table follows Zipf's law, so at 100 TB the pruned table is
  millions of rows, not billions — AQE broadcasts it when it fits
  and falls back to a shuffle join when it does not. Nothing is
  collected to the driver.
- Smoothing: add-one over the training vocabulary,
  ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)`` — exact, closed-form,
  and expressible in ANSI SQL, so the DuckDB oracle can replay it
  bit-for-bit (``q_lm_score``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .text import normalize_text, tokenize

__all__ = ['bigram_counts', 'unigram_counts', 'ngram_lm_score',
           'perplexity_buckets']


def _bigram_array(text_col: str):
    """Array of space-joined token bigrams (with multiplicity —
    unlike ``word_shingles`` there is no ``array_distinct``: LM counts
    need every occurrence). Shifted-slice ``zip_with``, O(tokens)."""
    toks = tokenize(normalize_text(text_col))
    k = F.size(toks) - 1
    w1 = F.slice(toks, 1, F.greatest(k, F.lit(0)))
    w2 = F.slice(toks, 2, F.greatest(k, F.lit(0)))
    return F.zip_with(w1, w2, lambda a, b: F.concat_ws(' ', a, b))


def bigram_counts(
    train: SparkDF,
    text_col: str = 'text',
    min_count: int = 1,
) -> SparkDF:
    """Bigram count table ``(bg string, cb bigint)`` from the
    training corpus. ``min_count`` prunes rare bigrams (they fall
    back to the smoothed unseen probability at score time) — the
    knob that keeps the table broadcast-small at corpus scale."""
    out = (
        train.select(F.explode(_bigram_array(text_col)).alias('bg'))
        .groupBy('bg')
        .agg(F.count(F.lit(1)).alias('cb'))
    )
    if min_count > 1:
        out = out.filter(F.col('cb') >= min_count)
    return out


def unigram_counts(train: SparkDF, text_col: str = 'text') -> SparkDF:
    """Unigram (context) count table ``(w1 string, c1 bigint)``.
    Never pruned — the denominator ``c(w1) + V`` must see true
    context counts or smoothing is biased."""
    toks = tokenize(normalize_text(text_col))
    return (
        train.select(F.explode(toks).alias('w1'))
        .groupBy('w1')
        .agg(F.count(F.lit(1)).alias('c1'))
    )


def ngram_lm_score(
    docs: SparkDF,
    train: SparkDF = None,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    min_count: int = 1,
    bigrams: SparkDF = None,
    unigrams: SparkDF = None,
) -> SparkDF:
    """Mean bigram log-likelihood per document under an add-one-
    smoothed bigram LM trained on ``train``.

    Returns ``(id_col, n_bigrams bigint, lm_logprob double)`` for
    EVERY input document; documents with fewer than two tokens have
    ``n_bigrams = 0`` and NULL ``lm_logprob``. Higher (less
    negative) is more fluent under the training distribution.

    Pass precomputed ``bigrams``/``unigrams`` tables (from
    :func:`bigram_counts` / :func:`unigram_counts`, persisted or
    written to parquet) instead of ``train`` to avoid re-deriving the
    model per scoring run — at corpus scale, training inline means
    re-scanning the training text for each of the two count tables,
    whereas the persisted tables are heavy-hitter-sized.
    """
    if (bigrams is None) != (unigrams is None):
        raise ValueError(
            'pass both bigrams and unigrams, or neither')
    if bigrams is None:
        if train is None:
            raise ValueError(
                'either train or precomputed bigrams+unigrams '
                'tables are required')
        big = bigram_counts(train, text_col, min_count)
        uni = unigram_counts(train, text_col)
    else:
        big, uni = bigrams, unigrams
    vocab = uni.agg(F.count(F.lit(1)).alias('__v'))

    # explode_outer keeps zero-bigram documents as one NULL-bg row,
    # so every input document survives the aggregation and the old
    # shape's second corpus scan + re-join of the id column is gone
    # (one less full pass at corpus scale).
    doc_bg = docs.select(
        F.col(id_col).alias('__id'),
        F.explode_outer(_bigram_array(text_col)).alias('bg'),
    ).withColumn('w1', F.substring_index('bg', ' ', 1))
    scored = (
        doc_bg
        .join(big, on='bg', how='left')
        .join(uni, on='w1', how='left')
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            '__logp',
            F.when(
                F.col('bg').isNotNull(),
                F.log((F.coalesce(F.col('cb'), F.lit(0)) + F.lit(1))
                      .cast('double')
                      / (F.coalesce(F.col('c1'), F.lit(0))
                         + F.col('__v')))),
        )
        .groupBy('__id')
        .agg(F.count('bg').alias('n_bigrams'),
             F.avg('__logp').alias('lm_logprob'))
    )
    return scored.select(
        F.col('__id').alias(id_col), 'n_bigrams', 'lm_logprob')


def perplexity_buckets(
    df: SparkDF,
    score_col: str,
    id_col: str,
    part_col: str = None,
    n_buckets: int = 3,
    labels=('head', 'middle', 'tail'),
    thresholds=None,
) -> SparkDF:
    """CCNet-style fluency buckets (Wenzek et al. 2020): split a
    scored corpus into ``n_buckets`` equal-count slices per
    ``part_col`` (CCNet buckets per LANGUAGE) — ``head`` is the most
    fluent slice (HIGHEST ``score_col``, i.e. lowest perplexity),
    ``tail`` the least.  Returns the input ids plus
    ``(bucket_idx int, bucket string)``; rows with NULL scores are
    EXCLUDED (unscorable docs — route them explicitly, don't let
    them silently dilute a bucket).

    Two paths:

    - **Exact (default)**: one window per partition —
      ``row_number`` over ``(score desc, id asc)`` (the id
      tie-break makes bucket edges deterministic and
      engine-replayable) with the partition count; bucket =
      ``floor(n_buckets * (rank-1) / count)``.  This is a per-
      partition SORT: right for oracle-verified runs and for
      corpora whose largest language fits a sort comfortably.
    - **Thresholds (the 100 TB path)**: pass ``thresholds`` — a
      DESCENDING list of ``n_buckets - 1`` score cutoffs (e.g. from
      ``percentile_approx`` on a sample, per CCNet's published
      recipe of fitting cutoffs once and reusing them) — and
      bucketing becomes a pure scan-side projection: no window, no
      sort, no shuffle.
    """
    if len(labels) != n_buckets:
        raise ValueError(
            f'need {n_buckets} labels, got {len(labels)}')
    lab = F.array(*[F.lit(x) for x in labels])
    out_cols = [id_col] + ([part_col] if part_col else []) \
        + [score_col]
    base = df.select(*out_cols).where(F.col(score_col).isNotNull())
    if thresholds is not None:
        if len(thresholds) != n_buckets - 1:
            raise ValueError(
                f'need {n_buckets - 1} thresholds, '
                f'got {len(thresholds)}')
        if list(thresholds) != sorted(thresholds, reverse=True):
            raise ValueError('thresholds must be descending '
                             '(head cutoff first)')
        idx = F.lit(n_buckets - 1)
        for i, t in reversed(list(enumerate(thresholds))):
            idx = F.when(F.col(score_col) >= float(t),
                         F.lit(i)).otherwise(idx)
        bucketed = base.withColumn('bucket_idx', idx.cast('int'))
    else:
        from pyspark.sql import Window

        w = (Window.partitionBy(part_col) if part_col
             else Window.partitionBy())
        order = w.orderBy(F.col(score_col).desc(),
                          F.col(id_col).asc())
        bucketed = (
            base
            .withColumn('__rk', F.row_number().over(order))
            .withColumn('__n', F.count(F.lit(1)).over(w))
            .withColumn(
                'bucket_idx',
                F.floor(F.lit(n_buckets) * (F.col('__rk') - 1)
                        / F.col('__n')).cast('int'))
            .drop('__rk', '__n'))
    return bucketed.withColumn(
        'bucket', F.element_at(lab, F.col('bucket_idx') + 1))
