"""TF-IDF term weighting and per-document top-term extraction.

North-star extension (no reference counterpart — SURVEY.md §2.2 has
no text-mining surface). TF-IDF is the workhorse of corpus triage in
training-data pipelines: keyword extraction, quality heuristics
("documents whose top terms are boilerplate"), and cheap
lexical-similarity features that don't need an embedding model.

Spark-first shape — everything is native ``pyspark.sql.functions``
(JVM-side, whole-stage codegen), zero Python UDFs:

* ``term_frequencies``: explode tokens → one hash aggregate keyed on
  ``(doc, token)``. Map-side partial aggregation collapses repeated
  tokens before the shuffle, so shuffle volume is bounded by the
  per-partition *distinct* (doc, token) count, not raw token count.
* ``document_frequencies``: second hash aggregate keyed on token
  alone — again partial-agg-friendly.
* ``tfidf``: joins the two on ``token``. The vocabulary side is NOT
  broadcast by default: at 100 TB the vocabulary is itself huge
  (billions of distinct shingle-ish tokens), so a shuffle hash join
  keyed on token is the safe plan; pass ``broadcast_vocab=True`` when
  the caller knows the vocabulary is small (e.g. after a ``min_df``
  cut).
* ``top_terms``: ranked-window top-k per document with a
  deterministic ``(weight desc, token asc)`` tie-break. Ranking uses
  the *rounded* weight so the ordering is reproducible across
  engines/architectures (ulp-level float differences can't flip
  ranks — same trick as the oracle-checked quantile queries).

Weighting: tf is the within-document relative frequency
``count / doc_len``; idf is the unsmoothed ``ln(N / df)`` — both
chosen because every engine computes them bit-comparably from
integers, keeping the DuckDB oracle (``q_tfidf_top_terms``) exact.
"""
from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from .text import normalize_text

ColumnOrName = Union[str, SparkCol]

__all__ = ['term_frequencies', 'document_frequencies', 'tfidf', 'top_terms']


def term_frequencies(
    df: SparkDF,
    text_col: ColumnOrName = 'text',
    id_col: str = 'doc_id',
) -> SparkDF:
    """Per-document token counts and relative frequencies.

    Returns ``(id_col, token, tc, doc_len, tf)`` where ``tc`` is the
    raw in-document count, ``doc_len`` the document's total token
    count and ``tf = tc / doc_len``. Tokenization is
    ``normalize_text`` + single-space split with empties dropped, the
    package-wide convention (oracle-replayable in ANSI SQL).
    """
    toks = F.split(normalize_text(text_col), ' ')
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias('token'))
        .filter(F.col('token') != '')
        .groupBy(id_col, 'token')
        .agg(F.count(F.lit(1)).alias('tc'))
    )
    # doc_len from the counts themselves (window sum partitioned by
    # doc) — avoids a second scan of the raw text.
    w = Window.partitionBy(id_col)
    return counts.withColumn(
        'doc_len', F.sum('tc').over(w)
    ).withColumn('tf', F.col('tc') / F.col('doc_len'))


def document_frequencies(
    term_freqs: SparkDF,
    id_col: str = 'doc_id',
    corpus: Optional[SparkDF] = None,
) -> SparkDF:
    """Token → number of documents containing it, plus the corpus
    document count ``n_docs`` on every row (cross-joined scalar, a
    broadcast of one row — not a shuffle).

    Pass the raw ``corpus`` frame when available: its doc count is a
    column-pruned scan of the id column alone, where counting from
    ``term_freqs`` re-runs the whole explode+aggregate subtree (docs
    with zero tokens also count — matching ln(N/df) over the actual
    corpus). Note the tiny semantic difference: empty documents have
    no term_freqs rows, so the two sources differ when the corpus
    contains token-less docs."""
    df_counts = term_freqs.groupBy('token').agg(
        F.count(F.lit(1)).alias('df')
    )
    source = corpus if corpus is not None else term_freqs
    n_docs = source.select(
        F.countDistinct(id_col).alias('n_docs'))
    return df_counts.crossJoin(F.broadcast(n_docs))


def tfidf(
    df: SparkDF,
    text_col: ColumnOrName = 'text',
    id_col: str = 'doc_id',
    *,
    min_df: int = 1,
    broadcast_vocab: bool = False,
) -> SparkDF:
    """Full TF-IDF table ``(id, token, tc, doc_len, tf, df, idf,
    weight)`` with ``idf = ln(n_docs / df)`` and
    ``weight = tf * idf``.

    ``min_df`` drops hapax-ish tokens before the join (a cheap
    vocabulary cut that also shrinks the join's build side);
    ``broadcast_vocab`` opts in to a broadcast hash join when the
    caller knows the post-cut vocabulary fits in executor memory.
    """
    # The tf subtree appears in three consumers (vocab agg, doc
    # count, join probe). Static plans duplicate it, but the three
    # copies are IDENTICAL up to each exchange, so AQE's runtime
    # exchange reuse collapses them; an explicit repartition barrier
    # was measured SLOWER here (it adds an exchange without enabling
    # more reuse). At extreme scale, cache/checkpoint tf explicitly
    # or pass the raw corpus to document_frequencies for the n_docs
    # side.
    tf = term_frequencies(df, text_col, id_col)
    vocab = document_frequencies(tf, id_col)
    if min_df > 1:
        vocab = vocab.filter(F.col('df') >= min_df)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    joined = tf.join(vocab, 'token', 'inner')
    return joined.withColumn(
        'idf', F.log(F.col('n_docs') / F.col('df'))
    ).withColumn('weight', F.col('tf') * F.col('idf'))


def top_terms(
    weighted: SparkDF,
    k: int = 3,
    id_col: str = 'doc_id',
    *,
    weight_col: str = 'weight',
    digits: Optional[int] = 6,
) -> SparkDF:
    """Top-``k`` terms per document by TF-IDF weight.

    Ranks on ``round(weight, digits)`` (then ``token`` ascending) so
    the cut is deterministic and engine-portable; pass
    ``digits=None`` to rank on the raw float. Output:
    ``(id, rank, token, weight)`` with the weight rounded the same
    way it was ranked.
    """
    wcol = F.col(weight_col)
    if digits is not None:
        wcol = F.round(wcol, digits)
    w = Window.partitionBy(id_col).orderBy(
        wcol.desc(), F.col('token').asc())
    return (
        weighted.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select(id_col, 'rank', 'token', wcol.alias(weight_col))
    )
