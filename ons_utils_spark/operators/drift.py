"""Distribution-drift diagnostics between corpus slices.

Extension territory (no reference counterpart). Curation pipelines
need a cheap answer to "did this month's crawl change?" and "do
train and validation actually look alike?" — token-distribution
divergence is the standard first check before anything model-based.

Everything here is two hash aggregates and arithmetic — no windows,
no joins wider than the token vocabulary, no UDFs — so the cost at
100 TB is one explode pass plus vocabulary-sized shuffles
(map-side partial aggregation collapses repeated tokens per
partition first).

Determinism: probabilities are exact integer-count ratios and the
log arithmetic is fixed-order (sum over tokens of closed-form
terms), so a SQL engine replays the numbers bit-comparably modulo
final rounding (``q_js_divergence`` is oracle-checked).
"""
from __future__ import annotations

from typing import Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .text import normalize_text

ColumnOrName = Union[str, SparkCol]

__all__ = ['token_counts_by_group', 'js_divergence', 'chi2_drift']


def token_counts_by_group(
    df: SparkDF,
    group_col: str = 'source',
    text_col: ColumnOrName = 'text',
) -> SparkDF:
    """``(group, token, c)`` token counts — the shared input of both
    divergence measures. One explode + one hash aggregate."""
    toks = F.split(normalize_text(text_col), ' ')
    return (
        df.select(F.col(group_col).alias('g'),
                  F.explode(toks).alias('token'))
        .filter(F.col('token') != '')
        .groupBy('g', 'token')
        .agg(F.count(F.lit(1)).alias('c'))
    )


def _two_group_pivot(counts: SparkDF, a: str, b: str) -> SparkDF:
    """Token rows with both groups' counts (0 where absent)."""
    return (
        counts.filter(F.col('g').isin(a, b))
        .groupBy('token')
        .agg(
            F.sum(F.when(F.col('g') == a, F.col('c'))
                  .otherwise(0)).alias('ca'),
            F.sum(F.when(F.col('g') == b, F.col('c'))
                  .otherwise(0)).alias('cb'),
        )
    )


def js_divergence(
    df: SparkDF,
    group_col: str,
    a: str,
    b: str,
    text_col: ColumnOrName = 'text',
) -> SparkDF:
    """Jensen–Shannon divergence (natural log, so JSD ∈ [0, ln 2])
    between the token distributions of groups ``a`` and ``b``.

    One-row result ``(jsd, n_tokens_a, n_tokens_b, vocab)``.
    Closed form per token — P·ln(P/M) + Q·ln(Q/M) halved, with the
    absent-side terms dropping out exactly (lim x→0 of x·ln x = 0) —
    summed in one hash aggregate. No smoothing: JSD is finite for
    disjoint supports, which is why it's the right default drift
    metric (KL would be infinite).
    """
    piv = _two_group_pivot(
        token_counts_by_group(df, group_col, text_col), a, b)
    totals = piv.agg(
        F.sum('ca').alias('na'), F.sum('cb').alias('nb'))
    t = piv.crossJoin(F.broadcast(totals))
    p = F.col('ca') / F.col('na')
    q = F.col('cb') / F.col('nb')
    m = (p + q) / 2
    term = (
        F.when(F.col('ca') > 0, p * F.log(p / m)).otherwise(0.0)
        + F.when(F.col('cb') > 0, q * F.log(q / m)).otherwise(0.0)
    ) / 2
    return t.agg(
        F.sum(term).alias('jsd'),
        F.first('na').alias('n_tokens_a'),
        F.first('nb').alias('n_tokens_b'),
        F.count(F.lit(1)).alias('vocab'),
    )


def chi2_drift(
    df: SparkDF,
    group_col: str,
    a: str,
    b: str,
    text_col: ColumnOrName = 'text',
) -> SparkDF:
    """Pearson chi-square statistic for the 2×V contingency table of
    token counts in groups ``a`` vs ``b`` (plus degrees of freedom
    ``vocab - 1``). Large values → the slices draw from different
    token distributions. Same two-agg shape as :func:`js_divergence`.
    """
    piv = _two_group_pivot(
        token_counts_by_group(df, group_col, text_col), a, b)
    totals = piv.agg(
        F.sum('ca').alias('na'), F.sum('cb').alias('nb'))
    t = piv.crossJoin(F.broadcast(totals))
    n = F.col('na') + F.col('nb')
    row_tot = F.col('ca') + F.col('cb')
    ea = row_tot * F.col('na') / n
    eb = row_tot * F.col('nb') / n
    contrib = (
        (F.col('ca') - ea) * (F.col('ca') - ea) / ea
        + (F.col('cb') - eb) * (F.col('cb') - eb) / eb
    )
    return t.agg(
        F.sum(contrib).alias('chi2'),
        (F.count(F.lit(1)) - 1).alias('dof'),
    )
