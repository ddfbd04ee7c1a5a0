"""Byte-pair-encoding tokenizer training and segmentation.

Real BPE (Sennrich, Haddow & Birch 2016 — the GPT-2/SentencePiece
family of subword tokenizers), structured the way production
trainers actually run at corpus scale:

* the corpus reduces to a WORD HISTOGRAM with one distributed
  explode + hash aggregate (map-side combined; the histogram is
  vocabulary-bounded, not corpus-bounded);
* merge training iterates on that bounded histogram driver-side —
  the standard design (counting pair frequencies over ~10⁵ word
  types, not 10¹² tokens); ``max_words``/``min_count`` make the
  bound explicit and enforced;
* segmentation fans back out as an Arrow-vectorized pandas UDF with
  per-batch word-level memoization, so each distinct word in a
  batch is segmented once regardless of its frequency.

Complements ``operators/vocab.py`` (whole-token vocabularies) and
``text.bpe_ish_token_count`` (the regex estimator): this is the
trainable path when the real subword inventory matters.
"""
from __future__ import annotations

import warnings
from typing import Dict, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = ['word_histogram', 'train_bpe', 'bpe_segmenter_udf']

END_OF_WORD = '</w>'


def word_histogram(
    df: SparkDF,
    text_col: str = 'text',
    min_count: int = 1,
    max_words: int = 100_000,
) -> SparkDF:
    """Distributed word-frequency histogram ``(word, c)``.

    ``max_words`` keeps the driver-bound training input explicit:
    the top words by count (ties to the lexicographically smaller
    word) via TakeOrderedAndProject — never a global sort.  The cap
    is SILENT at this DataFrame level (no job runs until an
    action); :func:`train_bpe` detects an actually-hit cap with an
    N+1 fetch and warns loudly.
    """
    counts = (
        df.select(F.explode(
            F.split(normalize_text(text_col), ' ')).alias('word'))
        .filter(F.col('word') != '')
        .groupBy('word')
        .agg(F.count(F.lit(1)).alias('c'))
    )
    if min_count > 1:
        counts = counts.filter(F.col('c') >= min_count)
    return counts.sort(F.col('c').desc(),
                       F.col('word').asc()).limit(max_words)


def _pair_counts(
    vocab: Dict[Tuple[str, ...], int],
) -> Dict[Tuple[str, str], int]:
    pairs: Dict[Tuple[str, str], int] = {}
    for symbols, c in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + c
    return pairs


def _merge_vocab(
    vocab: Dict[Tuple[str, ...], int],
    pair: Tuple[str, str],
) -> Dict[Tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: Dict[Tuple[str, ...], int] = {}
    for symbols, c in vocab.items():
        syms: List[str] = []
        i = 0
        while i < len(symbols):
            if (i < len(symbols) - 1
                    and symbols[i] == a and symbols[i + 1] == b):
                syms.append(merged)
                i += 2
            else:
                syms.append(symbols[i])
                i += 1
        out[tuple(syms)] = out.get(tuple(syms), 0) + c
    return out


def train_bpe(
    df: SparkDF,
    text_col: str = 'text',
    num_merges: int = 200,
    min_count: int = 1,
    max_words: int = 100_000,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the ordered merge list ``[(left, right), ...]`` —
    deterministic: the most frequent adjacent symbol pair wins each
    round, ties broken lexicographically (reproducible across runs
    and partitionings, unlike hash-order ties).  Training stops
    early when no pair repeats.

    When the corpus has more than ``max_words`` distinct word types
    a ``RuntimeWarning`` reports the truncation (detected by
    fetching ``max_words + 1`` rows — no extra job): the dropped
    rare tail is excluded from merge counts, which is the standard
    subword-trainer design but should never happen silently.
    """
    hist = word_histogram(
        df, text_col, min_count, max_words + 1).collect()
    if len(hist) > max_words:
        warnings.warn(
            f'BPE word histogram truncated to the top {max_words} '
            f'word types (corpus has more); the rare tail is '
            f'excluded from merge counts — raise max_words to '
            f'widen coverage',
            RuntimeWarning, stacklevel=2)
        hist = hist[:max_words]
    vocab: Dict[Tuple[str, ...], int] = {}
    for row in hist:
        key = tuple(row['word']) + (END_OF_WORD,)
        vocab[key] = vocab.get(key, 0) + row['c']
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # max by count; ties -> lexicographically SMALLEST pair
        top_count = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == top_count)
        if top_count < 2:
            break
        merges.append(pair)
        vocab = _merge_vocab(vocab, pair)
    return merges


def _segment_word(
    word: str,
    ranks: Dict[Tuple[str, str], int],
) -> List[str]:
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_segmenter_udf(merges: Sequence[Tuple[str, str]]):
    """Arrow-vectorized segmenter: text column → ``array<string>``
    of BPE tokens.  The merge table ships once in the UDF closure
    (broadcast-sized: one string pair per merge); within each Arrow
    batch every distinct word is segmented once (memoized)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf('array<string>')
    def _seg(texts: pd.Series) -> pd.Series:
        cache: Dict[str, List[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: List[str] = []
            for w in t.lower().split():
                if w not in cache:
                    cache[w] = _segment_word(w, ranks)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return _seg
