"""Custom stateful streaming operators (applyInPandasWithState).

Extension (SURVEY.md §2.2 lists streaming/state as absent from the
reference). Implements the canonical custom-state pattern: a per-key
running aggregate maintained across micro-batches with timeout-based
state expiry. Works only on streaming DataFrames; for batch frames
:func:`running_totals` falls back to a plain aggregation so pipelines
can be tested in batch.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTAL_SCHEMA = 'key string, n_events bigint, total double'
_STATE_SCHEMA = 'n bigint, total double'


def _make_running_total_fn(timeout_ms: int):
    def _running_total_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {'key': [key[0]], 'n_events': [n], 'total': [total]}
            )
            return

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf['value'].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {'key': [key[0]], 'n_events': [n], 'total': [total]}
        )

    return _running_total_fn


def running_totals(
    df: SparkDF,
    key_col: str,
    value_col: str = 'value',
    state_timeout_ms: int = 60_000,
) -> SparkDF:
    """Per-key running (count, sum) maintained in operator state.

    Streaming: ``applyInPandasWithState`` with processing-time
    timeout — each micro-batch emits the updated running totals for
    the keys it touched; idle keys expire after 60 s and emit a final
    row. Batch: equivalent one-shot aggregation (same schema), so the
    same pipeline code is testable offline.
    """
    keyed = df.select(
        F.col(key_col).cast('string').alias('key'),
        F.col(value_col).cast('double').alias('value'),
    )
    if not df.isStreaming:
        return keyed.groupBy('key').agg(
            F.count('*').alias('n_events'),
            F.sum('value').alias('total'),
        )
    return keyed.groupBy('key').applyInPandasWithState(
        _make_running_total_fn(state_timeout_ms),
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode='update',
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
