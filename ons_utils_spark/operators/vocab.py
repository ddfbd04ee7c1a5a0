"""Corpus vocabulary building and coverage / OOV analysis.

Tokenizer design for a training corpus starts from a frequency
vocabulary: which ``top_k`` tokens cover what share of all token
occurrences, and what out-of-vocabulary (OOV) rate each slice of the
corpus would see (Kudo & Richardson 2018, SentencePiece; the
coverage curve is the standard sizing artifact).  The reference
engine (``/root/reference/ons_utils``) has no vocabulary tooling —
this module is part of the LLM-pipeline extension surface alongside
``operators.text`` and ``operators.tfidf``.

Scale design (100 TB corpus):

* ``token_counts`` is one ``explode`` + hash aggregate — map-side
  partial combine, a single shuffle keyed on token.  Token-frequency
  skew (stopwords are orders of magnitude hotter than the tail) is
  irrelevant here because partial aggregation collapses each hot
  token to one row per map task before the shuffle.
* ``build_vocab`` bounds the result to ``top_k`` rows via
  ``sort().limit()`` — Catalyst plans ``TakeOrderedAndProject``,
  which keeps only ``top_k`` candidates per partition and merges
  them, never a full sort of the vocabulary.
* ``oov_stats`` joins the corpus against the bounded vocabulary with
  an explicit ``broadcast`` — the 100 TB side never shuffles; OOV
  flags resolve map-side.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = ['token_counts', 'build_vocab', 'vocab_coverage', 'oov_stats',
           'tokenizer_fertility']


def token_counts(
    df: SparkDF,
    text_col: str = 'text',
    normalize: bool = True,
) -> SparkDF:
    """Corpus-wide token frequency table ``(token, c)``.

    Tokens come from whitespace-splitting the (optionally
    canonicalized) text; empty tokens are dropped.  One explode + one
    hash aggregate; partial combine keeps hot tokens off the wire.
    """
    src = normalize_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(F.explode(F.split(src, ' ')).alias('token'))
        .filter(F.col('token') != '')
        .groupBy('token')
        .agg(F.count(F.lit(1)).alias('c'))
    )


def build_vocab(
    df: SparkDF,
    text_col: str = 'text',
    top_k: int = 1000,
    min_count: int = 1,
    normalize: bool = True,
) -> SparkDF:
    """Top-``top_k`` vocabulary ``(token, c, rank)``.

    Ranking is frequency-descending with the token string as a
    deterministic tie-break, so the vocabulary is reproducible across
    partitionings and engines.  ``sort().limit(top_k)`` plans as
    TakeOrderedAndProject (per-partition top-k, no global sort);
    the ``row_number`` window then runs over only ``top_k`` rows.
    """
    counts = token_counts(df, text_col, normalize=normalize)
    if min_count > 1:
        counts = counts.filter(F.col('c') >= min_count)
    top = (
        counts.sort(F.col('c').desc(), F.col('token').asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col('c').desc(), F.col('token').asc())
    return top.withColumn('rank', F.row_number().over(w))


def vocab_coverage(vocab: SparkDF, total_tokens: Optional[int] = None) -> SparkDF:
    """Cumulative coverage curve over a ranked vocabulary.

    Adds ``cum_c`` (running occurrence total in rank order) and, when
    the corpus-wide occurrence count is supplied, ``coverage`` — the
    share of all token occurrences a vocabulary truncated at each
    rank would cover.  Runs on the bounded vocab only (single
    partition window over ``top_k`` rows — deliberate: the input is
    already driver-scale).
    """
    w = Window.orderBy('rank').rowsBetween(Window.unboundedPreceding, 0)
    out = vocab.withColumn('cum_c', F.sum('c').over(w))
    if total_tokens is not None:
        out = out.withColumn(
            'coverage', F.col('cum_c') / F.lit(float(total_tokens)))
    return out


def oov_stats(
    df: SparkDF,
    vocab: SparkDF,
    by: Sequence[str] = ('source',),
    text_col: str = 'text',
    normalize: bool = True,
) -> SparkDF:
    """Per-group OOV profile against a bounded vocabulary.

    Returns one row per ``by`` group with ``n_tokens`` (token
    occurrences), ``n_oov`` (occurrences outside ``vocab``) and
    ``oov_ratio``.  The vocabulary side is explicitly broadcast: the
    corpus explode never shuffles for the membership test, only the
    small per-group aggregate moves.
    """
    src = normalize_text(text_col) if normalize else F.col(text_col)
    toks = (
        df.select(*by, F.explode(F.split(src, ' ')).alias('token'))
        .filter(F.col('token') != '')
    )
    marked = toks.join(
        F.broadcast(vocab.select('token').withColumn('__in_vocab', F.lit(1))),
        on='token', how='left')
    return (
        marked.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias('n_tokens'),
            F.sum(F.when(F.col('__in_vocab').isNull(), 1).otherwise(0))
            .alias('n_oov'),
        )
        .withColumn(
            'oov_ratio',
            F.col('n_oov').cast('double') / F.col('n_tokens'))
    )


def tokenizer_fertility(
    df: SparkDF,
    vocab: SparkDF,
    by: Sequence[str] = ('lang',),
    text_col: str = 'text',
    normalize: bool = True,
) -> SparkDF:
    """Per-group tokenizer fertility under the word-with-character-
    fallback cost model: a word present in ``vocab`` encodes as ONE
    token, an out-of-vocabulary word falls back to its characters
    (cost = its character length) — the standard upper-bound cost
    model for how a fixed vocabulary serves each language or corpus
    slice.  Fertility (modelled tokens per word) is THE tokenizer-
    fairness number: languages the vocabulary underserves pay a
    multi-x token premium for the same content (Petrov et al. 2023,
    "Language Model Tokenizers Introduce Unfairness Between
    Languages"; Rust et al. 2021 use the same tokens-per-word
    fertility definition).

    Returns one row per ``by`` group: ``n_words`` (word occurrences),
    ``n_tokens`` (modelled token cost), and the integer-quantized
    ratios ``fertility_u6`` (tokens per word × 1e6) and
    ``oov_ratio_u6`` — quantized so the numbers replay engine-exactly
    (the ``oov_stats`` convention; ``oov_stats`` itself keeps the raw
    ``n_oov`` when counts are wanted).

    Scale shape: the bounded vocabulary is explicitly BROADCAST, so
    the corpus explode resolves membership map-side and never
    shuffles for the test; the only exchange is the final per-group
    aggregate (groups = languages/sources — tiny).  Fertility of a
    real subword tokenizer is strictly lower; this word-or-characters
    model needs no merge tables, making it the portable screening
    metric (``operators.bpe`` holds the real BPE when merges exist).
    """
    src = normalize_text(text_col) if normalize else F.col(text_col)
    words = (
        df.select(*by, F.explode(F.split(src, ' ')).alias('token'))
        .filter(F.col('token') != '')
    )
    marked = words.join(
        F.broadcast(
            vocab.select('token').withColumn('__v', F.lit(1))),
        on='token', how='left')
    cost = F.when(F.col('__v').isNotNull(), F.lit(1)) \
        .otherwise(F.length('token'))
    agg = marked.groupBy(*by).agg(
        F.count(F.lit(1)).alias('n_words'),
        F.sum(cost).alias('n_tokens'),
        F.sum(F.when(F.col('__v').isNull(), 1).otherwise(0))
        .alias('n_oov'))
    return agg.select(
        *by, 'n_words', 'n_tokens',
        F.round(F.col('n_tokens').cast('double') * 1000000
                / F.col('n_words')).cast('bigint')
        .alias('fertility_u6'),
        F.round(F.col('n_oov').cast('double') * 1000000
                / F.col('n_words')).cast('bigint')
        .alias('oov_ratio_u6'))
