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

__all__ = ['bigram_counts', 'unigram_counts', 'ngram_lm_score']


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

    doc_bg = docs.select(
        F.col(id_col).alias('__id'),
        F.explode(_bigram_array(text_col)).alias('bg'),
    ).withColumn('w1', F.substring_index('bg', ' ', 1))
    scored = (
        doc_bg
        .join(big, on='bg', how='left')
        .join(uni, on='w1', how='left')
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            '__logp',
            F.log((F.coalesce(F.col('cb'), F.lit(0)) + F.lit(1))
                  .cast('double')
                  / (F.coalesce(F.col('c1'), F.lit(0))
                     + F.col('__v'))),
        )
        .groupBy('__id')
        .agg(F.count(F.lit(1)).alias('n_bigrams'),
             F.avg('__logp').alias('lm_logprob'))
    )
    return (
        docs.select(F.col(id_col).alias('__id'))
        .join(scored, on='__id', how='left')
        .select(
            F.col('__id').alias(id_col),
            F.coalesce(F.col('n_bigrams'), F.lit(0)).alias('n_bigrams'),
            'lm_logprob',
        )
    )
