"""Python user-defined table functions (Spark 4 UDTF API).

Completes the UDF-surface coverage alongside pandas UDFs,
``applyInPandas``/``mapInPandas`` (see ``operators/grouped.py``,
``operators/multimodal.py``): a UDTF maps ONE input row to MANY
output rows with an arbitrary Python generator — the escape hatch
for expansions that have no higher-order-function form.

Honest scale note: UDTFs execute row-at-a-time in Python workers
(``useArrow=True`` batches the transfer, not the loop).  Every
expansion in the hot paths of this package has a JVM-side
formulation instead (``text.chunk_text``, ``explode`` +
``split``, shifted-slice n-grams) — reach for a UDTF only when the
per-row logic is genuinely imperative, and keep it off the
100 TB critical path.
"""
from __future__ import annotations

import re

__all__ = ['sentence_split_udtf', 'register_sentence_split']

_SENT_RE = re.compile(r'(?<=[.!?])\s+')


def sentence_split_udtf():
    """Build the ``SentenceSplit`` UDTF: one row per sentence.

    Lazily constructed (the ``@udtf`` decorator needs a live Spark
    runtime).  Columns: ``sentence string, idx int, n_chars int``.
    Use via ``F.lateral_join`` / SQL ``LATERAL`` or directly::

        split = sentence_split_udtf()
        df = split(F.lit('One. Two! Three?'))
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType='sentence string, idx int, n_chars int',
          useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(_SENT_RE.split(text)):
                s = s.strip()
                if s:
                    yield s, i, len(s)

    return SentenceSplit


def register_sentence_split(spark, name: str = 'sentence_split'):
    """Register the UDTF for SQL use:
    ``SELECT t.* FROM docs, LATERAL sentence_split(text) t``."""
    spark.udtf.register(name, sentence_split_udtf())
