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


def _stage_from_firsts(firsts: Iterable) -> int:
    """Funnel stage = length of the strictly-increasing prefix of
    first-occurrence times (None/NULL = step never seen; negative
    epochs — pre-1970 timestamps — are valid observations)."""
    stage, prev = 0, None
    for t in firsts:
        if t is None or (prev is not None and t <= prev):
            break
        stage += 1
        prev = t
    return stage


def funnel_stages(
    df: SparkDF,
    key_col: str = 'user_id',
    type_col: str = 'event_type',
    ts_col: str = 'ts',
    steps: Tuple[str, ...] = ('view', 'click', 'purchase'),
    state_timeout_ms: int = 300_000,
) -> SparkDF:
    """Per-key funnel progress: how many of ``steps`` each key has
    completed IN ORDER (first occurrences strictly increasing, at
    whole-second precision).

    Streaming: ``applyInPandasWithState`` keeps only the per-step
    first-occurrence epochs per key (fixed-width state, bounded by
    the timeout) and re-emits a key's stage whenever new events
    arrive — min() is associative, so arrival order never changes the
    converged result. Batch: the equivalent conditional-min hash agg
    (same schema), so pipelines are testable offline and the
    streaming answer must converge to it.
    """
    n = len(steps)
    out_schema = 'key string, stage int, ' + ', '.join(
        f't{i} bigint' for i in range(n))
    state_schema = ', '.join(f't{i} bigint' for i in range(n))

    keyed = df.select(
        F.col(key_col).cast('string').alias('key'),
        F.col(type_col).alias('etype'),
        F.col(ts_col).cast('long').alias('es'),
    )

    if not df.isStreaming:
        agg = keyed.groupBy('key').agg(*[
            F.min(F.when(F.col('etype') == s, F.col('es')))
            .alias(f't{i}')
            for i, s in enumerate(steps)
        ])
        stage = F.lit(0)
        cond = F.lit(True)
        prev = None
        for i in range(n):
            t = F.col(f't{i}')
            step_ok = t.isNotNull() if prev is None \
                else (t.isNotNull() & (t > prev))
            cond = cond & step_ok
            stage = stage + F.when(cond, 1).otherwise(0)
            prev = t
        return agg.select(
            'key', stage.cast('int').alias('stage'),
            # NULL marks a never-seen step — matches the streaming
            # state encoding so batch/stream outputs compare equal,
            # and keeps negative (pre-1970) epochs distinguishable.
            *[F.col(f't{i}') for i in range(n)])

    def fn(key, pdfs, state: GroupState):
        def emit(firsts):
            # Nullable Int64 so a None (step unseen) survives the
            # Arrow trip to a NULL bigint instead of becoming NaN.
            return pd.DataFrame({
                'key': pd.array([key[0]], dtype='string'),
                'stage': pd.array(
                    [_stage_from_firsts(firsts)], dtype='Int64'),
                **{f't{i}': pd.array([firsts[i]], dtype='Int64')
                   for i in range(n)},
            })

        if state.hasTimedOut:
            firsts = list(state.get)
            state.remove()
            yield emit(firsts)
            return
        firsts = list(state.get) if state.exists else [None] * n
        for pdf in pdfs:
            for i, s in enumerate(steps):
                es = pdf.loc[pdf['etype'] == s, 'es']
                if len(es):
                    m = int(es.min())
                    firsts[i] = m if firsts[i] is None \
                        else min(firsts[i], m)
        state.update(tuple(firsts))
        state.setTimeoutDuration(state_timeout_ms)
        yield emit(firsts)

    return keyed.groupBy('key').applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode='update',
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_topk(
    df: SparkDF,
    key_col: str,
    value_col: str = 'value',
    k: int = 3,
    state_api: str = 'auto',
) -> SparkDF:
    """Per-key running top-k values, maintained across micro-batches.

    Streaming: two interchangeable state backends —

    - ``'typed'``: the Spark 4 ``transformWithStateInPandas`` API; a
      typed ValueState holds just the current top-k array per key.
      Requires the RocksDB state store provider AND the ``protobuf``
      package (the runner's state wire format; raises
      ``NotImplementedError`` without it).
    - ``'groupstate'``: ``applyInPandasWithState`` with the same
      array-of-doubles state — no extra dependencies, works on the
      default state store.
    - ``'auto'`` (default): ``'typed'`` when protobuf is importable,
      else ``'groupstate'`` — so the streaming path is always
      runnable, never silently skipped.

    Batch: the rank-then-aggregate equivalent (row_number <= k, then
    an ordered collect of at most k rows per key), so pipelines are
    testable offline and the streaming answer must converge to it.

    Returns ``key string, topk array<double>`` (descending).
    """
    if state_api not in ('auto', 'typed', 'groupstate'):
        raise ValueError(
            f"state_api must be 'auto', 'typed', or 'groupstate',"
            f" got {state_api!r}")
    keyed = df.select(
        F.col(key_col).cast('string').alias('key'),
        F.col(value_col).cast('double').alias('value'),
    )
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy('key').orderBy(F.col('value').desc())
        return (
            keyed.withColumn('__rk', F.row_number().over(w))
            .filter(F.col('__rk') <= k)
            .groupBy('key')
            .agg(F.reverse(F.sort_array(F.collect_list('value')))
                 .alias('topk'))
        )

    try:
        # the transformWithState Python runner serializes state over
        # protobuf; without it the worker crashes at start
        from google.protobuf import descriptor  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False
    if state_api == 'typed' and not have_protobuf:
        raise NotImplementedError(
            'streaming running_topk with state_api=\'typed\' uses '
            'transformWithStateInPandas, whose Python runner requires '
            'the protobuf package — not installed in this '
            'environment. Use state_api=\'groupstate\' (or \'auto\') '
            'for the applyInPandasWithState backend instead.'
        )
    if state_api == 'groupstate' or not have_protobuf:
        def _topk_fn(
            key: Tuple[str],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            vals = list(state.get[0]) if state.exists else []
            for pdf in pdfs:
                vals.extend(float(v) for v in pdf['value'])
            vals = sorted(vals, reverse=True)[:k]
            state.update((vals,))
            yield pd.DataFrame({'key': [key[0]], 'topk': [vals]})

        return keyed.groupBy('key').applyInPandasWithState(
            _topk_fn,
            outputStructType='key string, topk array<double>',
            stateStructType='vals array<double>',
            outputMode='update',
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                'topk', 'vals array<double>')

        def handleInputRows(self, key, rows, timer_values):
            prev = self._state.get()
            vals = list(prev[0]) if prev is not None else []
            for pdf in rows:
                vals.extend(float(v) for v in pdf['value'])
            vals = sorted(vals, reverse=True)[:k]
            self._state.update((vals,))
            yield pd.DataFrame({'key': [key[0]], 'topk': [vals]})

        def close(self) -> None:
            pass

    return keyed.groupBy('key').transformWithStateInPandas(
        _TopK(),
        outputStructType='key string, topk array<double>',
        outputMode='Update',
        timeMode='None',
    )


EWMA_OUTPUT_SCHEMA = 'key string, seq bigint, value double, ewma double'
_EWMA_STATE_SCHEMA = 'e double'


def _make_ewma_fn(alpha: float):
    def _ewma_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:        # pragma: no cover - no timeout set
            state.remove()
            return
        e = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values('seq', kind='mergesort')
            out = []
            for v in pdf['value']:
                if v is None or pd.isna(v):
                    out.append(e)
                    continue
                e = float(v) if e is None \
                    else alpha * float(v) + (1.0 - alpha) * e
                out.append(e)
            pdf = pdf.copy()
            pdf['ewma'] = out
            yield pdf[['key', 'seq', 'value', 'ewma']]
        if e is not None:
            state.update((e,))

    return _ewma_fn


def streaming_ewma(
    df: SparkDF,
    key_col: str,
    value_col: str,
    order_col: str,
    alpha: float,
) -> SparkDF:
    """Per-key EWMA maintained ACROSS micro-batches: operator state
    holds each key's last smoothed value, so the recurrence continues
    seamlessly from one batch to the next — the streaming face of
    ``operators.timeseries.ewma`` (which handles the batch case and
    pins the recurrence itself).

    Rows are smoothed in ``order_col`` order WITHIN each micro-batch;
    cross-batch ordering is the source's responsibility (event-time
    re-ordering needs a watermarked sort upstream — state here is
    deliberately one double per key, not a reorder buffer). Emits one
    row per input row (append semantics): ``(key, seq, value, ewma)``.

    Batch frames delegate to the batch walk, so the same pipeline
    code is testable offline.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f'alpha must be in (0, 1], got {alpha}')
    keyed = df.select(
        F.col(key_col).cast('string').alias('key'),
        F.col(order_col).cast('bigint').alias('seq'),
        F.col(value_col).cast('double').alias('value'),
    )
    if not df.isStreaming:
        from ..operators.timeseries import ewma as batch_ewma

        return batch_ewma(keyed, 'value', 'seq', 'key', alpha) \
            .select('key', 'seq', 'value', 'ewma')
    return keyed.groupBy('key').applyInPandasWithState(
        _make_ewma_fn(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode='append',
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
