"""Bloom filter: fixed-memory set membership for cross-corpus checks.

The classic mergeable membership sketch (Bloom 1970): ``num_bits``
bits, ``num_hashes`` hash functions per key; insert sets k bits,
probe answers "definitely absent" or "maybe present" with false-
positive rate ~(1 - e^(-kn/m))^k.  The canonical 100 TB uses are
decontamination (build once over a benchmark corpus, stream the
training corpus through the bitmap — no join, no shuffle of the big
side) and cheap pre-filters in front of expensive exact anti-joins.

Spark-first shape: the filter IS a DataFrame ``(word_idx, word)`` —
at most ``num_bits/32`` rows (32-bit lanes in a signed 64-bit word:
``1 << 63`` overflows DuckDB's BIGINT, ``1 << 31`` is safe in every
engine) — built with one ``groupBy(word_idx)``
+ ``bit_or`` whose map-side partial aggregation folds each
partition's bits before the shuffle (shuffle volume is bounded by
``num_bits/32 × partitions``, independent of corpus size; no
``distinct`` needed — OR is duplicate-insensitive).  Bit positions
are ``md5``-prefix arithmetic inside whole-stage codegen, the same
engine-portable hash family as ``sketches.cms_bucket`` and
``dedup.minhash_signature_portable``: any engine with ``md5()``
replays the filter — including its false positives — bit-exactly.

Probing has two paths, chosen by where the data is big:
- :func:`bloom_might_contain` — Arrow-vectorized pandas UDF over a
  numpy bitmap shipped once per executor in the UDF closure.  Zero
  shuffle, zero join: the 100 TB scan path.  The bitmap is
  ``num_bits/8`` bytes (16 MiB at ``num_bits=2^27``), the same
  budget class as a broadcast hash join's build side.
- :func:`bloom_probe_join` — pure DataFrame explode + broadcast
  join + ``min`` bit-test conjunction.  Fully declarative (Catalyst
  sees everything), and it is the shape the DuckDB oracle replays —
  use it when the bitmap exceeds closure-shipping comfort or for
  audits.

The reference has no sketch surface (``/root/reference/ons_utils``
is utility-level); this extends the sketch stack alongside
``sketches.py`` (CMS) and ``functions/approx.py`` (HLL / t-digest /
bitmap).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

__all__ = [
    'bloom_bit_positions',
    'bloom_build',
    'bloom_merge',
    'bloom_to_bitmap',
    'bloom_might_contain',
    'bloom_probe_join',
]

# 15 hex chars = 60 bits: fits a signed long exactly in both Spark
# (conv(…,16,10).cast('long')) and DuckDB (('0x'||…)::BIGINT), and
# leaves modulo-bias over any practical num_bits at ~2^-40.
_PREFIX_HEX = 15

#: Bitmap word-count ceiling for the pure-JVM literal-array probe in
#: :func:`bloom_might_contain` (1K 32-bit lanes = 2^15 bits = 4 KiB
#: of plan literal).  The JVM form always evaluates all
#: ``num_hashes`` md5 positions (codegen CSE makes the bit tests
#: eager), while the Arrow-UDF form short-circuits on the first
#: clear bit — so the JVM form wins exactly when the filter is small
#: (saturated → high FP rate → probes rarely exit early, and the
#: Python boundary is the dominant cost), and loses on big sparse
#: filters where most probes miss on the first hash.  Measured
#: crossover at sf0.1: 32-word probe 1.44→1.29 s JVM, 4096-word
#: mostly-miss probe 4.1 s UDF vs 6.5 s JVM.
_MAX_LITERAL_WORDS = 1 << 10


def _check_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < 32 or num_bits % 32:
        raise ValueError(
            f'num_bits must be a positive multiple of 32, got {num_bits}')
    if not 1 <= num_hashes <= 16:
        raise ValueError(
            f'num_hashes must be in [1, 16], got {num_hashes}')


def bloom_bit_positions(col, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for ``col`` (a Column).

    Position ``i`` is ``md5(i || ':' || value)`` 60-bit hex prefix
    mod ``num_bits`` — deterministic, seedless, engine-portable.
    The ``i || ':'`` prefix makes the k probes independent hash
    functions of one another (same trick as ``cms_bucket``).
    """
    _check_params(num_bits, num_hashes)
    value = F.col(col).cast('string') if isinstance(col, str) \
        else col.cast('string')
    return F.array(*[
        (F.conv(F.substring(F.md5(F.concat(F.lit(f'{i}:'), value)),
                            1, _PREFIX_HEX), 16, 10)
         .cast('long') % num_bits)
        for i in range(num_hashes)
    ])


def bloom_build(
    df: SparkDF,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> SparkDF:
    """Build a Bloom filter over ``df[col]`` as a ``(word_idx, word)``
    DataFrame — ``word_idx`` in ``[0, num_bits/32)``, ``word`` a
    32-bit lane (held in a 64-bit long) with its set bits OR-ed
    together.  32-bit lanes keep every shift below 32: ``1 << 63``
    overflows a signed BIGINT in replaying engines (DuckDB raises),
    ``1 << 31`` is portable everywhere.

    One explode + one ``groupBy(word_idx).agg(bit_or)``: the partial
    aggregation folds every partition's bits map-side, so the single
    shuffle moves at most ``num_bits/32`` rows per partition no
    matter how many input rows there are.  NULL keys are skipped
    (a Bloom filter answers membership of values, and NULL is not a
    value — mirror the exact anti-join you are fronting).
    """
    _check_params(num_bits, num_hashes)
    pos = F.explode(
        bloom_bit_positions(col, num_bits, num_hashes)).alias('pos')
    return (
        df.where(F.col(col).isNotNull())
        .select(pos)
        .select(
            (F.col('pos') / 32).cast('long').alias('word_idx'),
            # shiftleft() the builtin takes a literal count; the
            # column-valued shift needs the SQL form.
            F.expr('shiftleft(CAST(1 AS BIGINT), '
                   'CAST(pos % 32 AS INT))').alias('bit'))
        .groupBy('word_idx')
        .agg(F.bit_or('bit').alias('word'))
    )


def bloom_merge(*filters: SparkDF) -> SparkDF:
    """OR several same-shape Bloom filters into one.

    Union + one re-aggregation — the mergeability that makes the
    sketch work across corpora, dates, or incremental batches.
    Caller must have built every input with the same ``num_bits`` /
    ``num_hashes`` (the frames carry no metadata; wrap in a sidecar
    if you persist them — see ``sources/shards.py`` for the
    pattern).
    """
    if not filters:
        raise ValueError('bloom_merge needs at least one filter')
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy('word_idx').agg(F.bit_or('word').alias('word'))


def bloom_to_bitmap(bloom: SparkDF, num_bits: int) -> np.ndarray:
    """Collect a built filter into a dense ``uint32`` numpy bitmap.

    The collect is bounded by ``num_bits/32`` rows — the CALLER's
    sizing decision, not data-dependent (2^27 bits = 4M rows =
    16 MiB).  This is the one driver round-trip in the scan path;
    the bitmap then ships once per executor inside the probe UDF's
    closure, exactly like a broadcast hash join's build side.
    """
    _check_params(num_bits, 1)
    words = np.zeros(num_bits // 32, dtype=np.uint32)
    for row in bloom.collect():
        words[int(row['word_idx'])] = np.uint32(row['word'] & 0xFFFFFFFF)
    return words


def bloom_might_contain(
    col,
    bitmap: np.ndarray,
    num_bits: int,
    num_hashes: int,
) -> Column:
    """Membership probe against a collected bitmap: zero shuffle,
    zero join — the 100 TB scan path.

    Two physical forms, same answer bit-for-bit:

    * bitmap ≤ :data:`_MAX_LITERAL_WORDS` words — the word array is
      embedded as a plain ``array<bigint>`` LITERAL and the whole
      probe (md5 positions + bit tests) runs as JVM expressions
      inside whole-stage codegen.  No Python boundary at all: the
      previous pandas-UDF form paid per-value *interpreted Python*
      ``hashlib.md5`` calls (row-at-a-time ``Series.map`` — guide
      §4's first anti-pattern) and shipped every probe column
      JVM→Python→JVM.  The ``num_hashes`` bit tests are a chained
      ``AND`` — NOT ``forall`` over a position array — because
      ``And`` short-circuits in codegen: a miss on bit *i* skips
      the remaining md5 computations, exactly like the UDF's early
      ``return False`` (on mostly-negative probes, e.g. novelty
      scans, that is the difference between ~1 and ``num_hashes``
      md5 calls per row).
    * larger bitmaps — the original Arrow pandas-UDF form (closure-
      shipped numpy bitmap; a multi-MB plan literal would bloat task
      serialization and driver analysis instead).

    Positions are the :func:`bloom_bit_positions` md5-prefix family
    in both forms (hashlib and Spark's ``md5`` agree byte-for-byte).
    NULL in, NULL out (the JVM form's every bit test is NULL for a
    NULL value, and ``NULL AND NULL = NULL``, matching the UDF).
    """
    _check_params(num_bits, num_hashes)
    if bitmap.shape != (num_bits // 32,):
        raise ValueError(
            f'bitmap has {bitmap.shape[0]} words, '
            f'num_bits={num_bits} needs {num_bits // 32}')

    if num_bits // 32 <= _MAX_LITERAL_WORDS:
        words_lit = F.lit([int(w) for w in bitmap.tolist()])
        value = F.col(col).cast('string') if isinstance(col, str) \
            else col.cast('string')

        def _bit_set(i: int) -> Column:
            # Position i inline, same family as bloom_bit_positions.
            # pos is written twice (word index + mask) — codegen's
            # common-subexpression elimination collapses the two md5
            # chains into ONE eager per-row evaluation.  Eager (not
            # short-circuit) is deliberately fine here: a literal-
            # sized (small) filter is saturated enough that most
            # probes pass several bit tests anyway, and the
            # alternatives measured worse (a transform() let-binding
            # is CodegenFallback — the whole probe subtree went
            # interpreted).
            pos = (F.conv(F.substring(
                F.md5(F.concat(F.lit(f'{i}:'), value)),
                1, _PREFIX_HEX), 16, 10)
                .cast('long') % num_bits)
            word = F.element_at(
                words_lit, (F.shiftright(pos, 5) + 1).cast('int'))
            # 2^(pos mod 32) via pow(): exact in a double up to 2^52,
            # and the only column-valued shift the DSL offers without
            # an expr() escape.  NULL pos propagates to a NULL test.
            mask = F.pow(F.lit(2.0), (pos % 32).cast('double')) \
                .cast('long')
            return word.bitwiseAND(mask) != 0

        probe = _bit_set(0)
        for i in range(1, num_hashes):
            probe = probe & _bit_set(i)
        return probe

    import hashlib

    from pyspark.sql.functions import pandas_udf

    words = bitmap  # closure capture; ships once per executor

    @pandas_udf('boolean')
    def _probe(values: pd.Series) -> pd.Series:
        def one(v):
            s = str(v)
            for i in range(num_hashes):
                h = hashlib.md5(f'{i}:{s}'.encode()).hexdigest()
                pos = int(h[:_PREFIX_HEX], 16) % num_bits
                if not (int(words[pos >> 5]) >> (pos & 31)) & 1:
                    return False
            return True
        # Hash each DISTINCT value once per batch: bulk probe streams
        # (shingles, tokens, URLs) repeat values heavily within a
        # partition, and md5 work is the whole cost of this UDF.
        # NULL in, NULL out, as before.
        verdicts = {v: one(v) for v in values.dropna().unique()}
        return values.map(verdicts)

    value = F.col(col).cast('string') if isinstance(col, str) \
        else col.cast('string')
    return _probe(value)


def bloom_probe_join(
    df: SparkDF,
    col: str,
    bloom: SparkDF,
    num_bits: int,
    num_hashes: int,
    out_col: str = 'might_contain',
    key_cols: Optional[list] = None,
) -> SparkDF:
    """Membership probe as a pure DataFrame plan: explode the probe
    positions, broadcast-join the ``(word_idx, word)`` filter, test
    each bit, and conjoin with ``min`` per input row.

    Declarative end-to-end (Catalyst prunes/pushes everything) and
    exactly replayable in SQL — the oracle shape.  Costs one
    broadcast (≤ ``num_bits/32`` rows — 32-bit lanes) and one ``groupBy`` on the
    probe key; prefer :func:`bloom_might_contain` when the probe
    side is the 100 TB corpus and the bitmap fits the closure.

    ``key_cols`` must uniquely key ``df`` (default: all columns —
    fine for distinct-value probes; pass an id for row-level use).
    NULL probe values come back NULL, matching the UDF path: their
    positions are NULL, the left join misses, the bit test is NULL,
    and ``min`` over an all-NULL group is NULL.
    """
    _check_params(num_bits, num_hashes)
    keys = key_cols if key_cols is not None else df.columns
    exploded = df.select(
        *keys,
        F.posexplode(bloom_bit_positions(col, num_bits, num_hashes))
        .alias('_i', '_pos'))
    joined = exploded.join(
        F.broadcast(bloom),
        (F.col('_pos') / 32).cast('long') == F.col('word_idx'),
        'left')
    bit_set = F.when(
        F.col('_pos').isNotNull(),
        F.expr('shiftrightunsigned(coalesce(word, CAST(0 AS BIGINT)), '
               'CAST(_pos % 32 AS INT))')
        .bitwiseAND(1) == 1)
    return (
        joined.select(*keys, bit_set.alias('_hit'))
        .groupBy(*keys)
        .agg(F.min('_hit').alias(out_col)))
