"""Seed-set quality classification (CCNet / DCLM-style).

Web-scale pipelines score every document with a cheap linear
classifier trained to separate a trusted seed corpus from the bulk
crawl, then keep the top-scoring slice (Wenzek et al. 2020, CCNet;
Li et al. 2024, DataComp-LM).  This module implements that
train-and-score loop natively in DataFrame ops — the reference
engine (``/root/reference/ons_utils``) has no classifier tooling;
this is part of the LLM-pipeline extension surface.

The model is token log-odds (a naive-Bayes linear discriminant):

    w(tok) = ln((c_pos + s) / (T_pos + s·V))
           - ln((c_neg + s) / (T_neg + s·V))

trained with two hash aggregates (token counts, class totals) and
scored as a broadcast join + per-document sum.  No MLlib, no Python
UDFs, no iterative solver — at 100 TB the training pass is one
shuffle keyed on token (map-side combine) and scoring is a
broadcast-join over the bounded weight table, so the corpus side
never shuffles.

Two weight modes:

* ``mode='logodds'`` (production): float weights as above.  The sum
  of doubles is partition-order dependent in its low bits, which is
  fine for ranking/thresholding but not for bit-exact cross-engine
  replay.
* ``mode='integer'`` (verification/replay): the sign-aligned integer
  cross-ratio ``w_q = (c_pos+1)·(T_neg+V) − (c_neg+1)·(T_pos+V)``.
  Pure 64-bit integer math end-to-end, so any engine reproduces the
  scores bit-exactly regardless of summation order.  Magnitudes grow
  as count × corpus-total — safe far past benchmark scale, but at
  extreme corpus sizes (≫10¹⁸ products) use ``logodds``; this mode
  exists for auditable replay, not as the default scorer.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = ['train_token_weights', 'score_texts',
           'calibration_bins']


def _tokens(df: SparkDF, text_col: str, keep: Sequence[str],
            normalize: bool) -> SparkDF:
    src = normalize_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(*keep, F.explode(F.split(src, ' ')).alias('token'))
        .filter(F.col('token') != '')
    )


def train_token_weights(
    df: SparkDF,
    text_col: str,
    label_col: str,
    mode: str = 'logodds',
    smoothing: float = 1.0,
    min_df: int = 1,
) -> SparkDF:
    """Train per-token weights separating ``label_col`` (1/true = seed).

    Returns ``(token, c_pos, c_neg, w)`` where ``w`` is double for
    ``mode='logodds'`` and long for ``mode='integer'`` (see module
    docstring).  One explode + one token-keyed hash aggregate; class
    totals and vocabulary size ride along as a one-row broadcast.
    ``min_df`` drops tokens seen in fewer than that many documents
    (noise control — standard fastText practice).
    """
    if mode not in ('logodds', 'integer'):
        raise ValueError(f"mode must be 'logodds' or 'integer', got {mode!r}")
    lab = F.col(label_col).cast('int')
    toks = _tokens(df.withColumn('__lab', lab), text_col,
                   ['__lab'], normalize=True)
    counts = toks.groupBy('token').agg(
        F.sum('__lab').alias('c_pos'),
        F.sum(1 - F.col('__lab')).alias('c_neg'),
        F.count(F.lit(1)).alias('c_all'),
    )
    if min_df > 1:
        counts = counts.filter(F.col('c_all') >= min_df)
    totals = counts.agg(
        F.sum('c_pos').alias('t_pos'),
        F.sum('c_neg').alias('t_neg'),
        F.count(F.lit(1)).alias('v'),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    if mode == 'integer':
        w = (
            (F.col('c_pos') + 1) * (F.col('t_neg') + F.col('v'))
            - (F.col('c_neg') + 1) * (F.col('t_pos') + F.col('v'))
        ).cast('long')
    else:
        s = F.lit(float(smoothing))
        w = (
            F.log((F.col('c_pos') + s)
                  / (F.col('t_pos') + s * F.col('v')))
            - F.log((F.col('c_neg') + s)
                    / (F.col('t_neg') + s * F.col('v')))
        )
    return joined.select('token', 'c_pos', 'c_neg', w.alias('w'))


def score_texts(
    df: SparkDF,
    weights: SparkDF,
    text_col: str,
    keep: Sequence[str] = ('doc_id',),
    length_normalize: bool = False,
) -> SparkDF:
    """Score each row: sum of token weights over the text.

    ``weights`` is the (bounded) output of :func:`train_token_weights`
    and is explicitly broadcast — the scored corpus never shuffles
    for the lookup, only the per-document aggregate does (keyed on
    ``keep``, map-side combined).  Unknown tokens score 0.
    ``length_normalize=True`` divides by the token count (mean weight
    — comparable across document lengths; float output).
    """
    toks = _tokens(df, text_col, list(keep), normalize=True)
    marked = toks.join(F.broadcast(weights.select('token', 'w')),
                       on='token', how='left')
    agg = marked.groupBy(*keep).agg(
        F.count(F.lit(1)).alias('n_tokens'),
        F.sum(F.coalesce(F.col('w'), F.lit(0))).alias('score'),
    )
    if length_normalize:
        agg = agg.withColumn(
            'score', F.col('score') / F.col('n_tokens'))
    return agg


def calibration_bins(
    scored: SparkDF,
    score_col: str = 'score',
    label_col: str = 'label',
    id_col: str = 'doc_id',
    n_bins: int = 10,
    thresholds=None,
) -> SparkDF:
    """Reliability-diagram bins for a quality classifier: rank the
    scored corpus (score desc, id as the deterministic tie-break),
    cut into ``n_bins`` equal-count bins, and per bin report
    ``(bin_idx, n_docs, n_pos, min_score, max_score)`` — bin 0 is
    the most seed-like slice.  ``n_pos / n_docs`` against the bin's
    score range is the calibration curve: a filter threshold chosen
    on an uncalibrated score keeps junk and drops keepers, so this
    is the diagnostic to run BEFORE committing a corpus-wide
    quality cut (same role as the CCNet tail inspection).

    Rows with NULL scores are excluded (unscorable docs can't sit
    in a bin).  The default exact path is one global window — a
    SORT of the scored corpus; right for verified runs and for
    integer-mode scores (bit-exact, engine-replayable).  At corpus
    scale pass ``thresholds`` (a DESCENDING list of ``n_bins - 1``
    score cutoffs, e.g. from ``percentile_approx`` on a sample) and
    binning becomes a pure scan projection feeding one n_bins-row
    aggregate — no sort, no window.
    """
    from pyspark.sql import Window

    base = scored.select(
        F.col(id_col), F.col(score_col), F.col(label_col)
    ).where(F.col(score_col).isNotNull())
    if thresholds is not None:
        if len(thresholds) != n_bins - 1:
            raise ValueError(
                f'need {n_bins - 1} thresholds, got {len(thresholds)}')
        if list(thresholds) != sorted(thresholds, reverse=True):
            raise ValueError('thresholds must be descending')
        idx = F.lit(n_bins - 1)
        for i, t in reversed(list(enumerate(thresholds))):
            idx = F.when(F.col(score_col) >= t,
                         F.lit(i)).otherwise(idx)
        binned = base.withColumn('bin_idx', idx.cast('int'))
    else:
        w = Window.partitionBy()
        order = w.orderBy(F.col(score_col).desc(),
                          F.col(id_col).asc())
        binned = (
            base
            .withColumn('__rk', F.row_number().over(order))
            .withColumn('__n', F.count(F.lit(1)).over(w))
            .withColumn(
                'bin_idx',
                F.floor(F.lit(n_bins) * (F.col('__rk') - 1)
                        / F.col('__n')).cast('int')))
    return (
        binned.groupBy('bin_idx')
        .agg(F.count(F.lit(1)).alias('n_docs'),
             F.sum(F.col(label_col).cast('long')).alias('n_pos'),
             F.min(score_col).alias('min_score'),
             F.max(score_col).alias('max_score'))
    )
