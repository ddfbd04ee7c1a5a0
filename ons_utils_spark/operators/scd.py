"""Slowly-changing-dimension (SCD type 2) history building.

Extension territory (the reference has no dimensional-modeling
surface). Warehouse pipelines keep attribute history as validity
intervals: one row per (key, state) episode with
``valid_from``/``valid_to`` and an ``is_current`` flag. This module
derives that history from an append-only change/event log — the
CDC-to-dimension step — and applies incremental update batches.

Spark-first shape: everything is two ranked windows over one shuffle
on the key (change detection via null-safe ``lag`` compare, interval
closing via ``lead``); no joins, no UDFs, no driver state. At 100 TB
the single ``partitionBy(keys)`` exchange is the whole cost, and
AQE's skew split handles hot keys.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..generic import list_convert

__all__ = ['scd2_from_events', 'scd2_apply_updates']


def _state_struct(state_cols: Sequence[str]) -> SparkCol:
    return F.struct(*[F.col(c) for c in state_cols])


def scd2_from_events(
    df: SparkDF,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    state_cols: Union[str, Sequence[str]],
    tiebreak: Optional[str] = None,
) -> SparkDF:
    """Collapse an event log into SCD2 validity intervals.

    For each key (ordered by ``ts_col``, then ``tiebreak`` for a
    total order), consecutive events with identical ``state_cols``
    merge into one episode; each episode becomes a row with
    ``valid_from`` (first ts of the episode), ``valid_to`` (start of
    the next episode, NULL while open) and ``is_current``.

    Change detection is null-safe (``NULL → 'a'`` and ``'a' → NULL``
    both count as changes; ``NULL → NULL`` does not), so nullable
    attributes are safe. Output: keys + state_cols [+ ``tiebreak``]
    + ``valid_from``, ``valid_to``, ``is_current``. The tiebreak
    value of each episode's OPENING event is persisted in the output
    so that re-deriving history (:func:`scd2_apply_updates`) has a
    total order even when two episodes of one key share the same
    ``valid_from`` — without it, episode order (and hence
    valid_to/is_current) could flip between applies.
    """
    key_list = list_convert(keys)
    state_list = list_convert(state_cols)
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key_list).orderBy(*order)

    state = _state_struct(state_list)
    prev = F.lag(state).over(w)
    # first event of a key has prev NULL-struct: eqNullSafe makes the
    # compare total, so "changed" is simply NOT null-safe-equal.
    changed = ~state.eqNullSafe(prev)

    episodes = (
        df.withColumn('__chg', changed)
        .filter(F.col('__chg'))
        .drop('__chg')
    )
    w2 = Window.partitionBy(*key_list).orderBy(*order)
    tb_cols = [F.col(tiebreak)] if tiebreak else []
    out = episodes.select(
        *key_list,
        *state_list,
        *tb_cols,
        F.col(ts_col).alias('valid_from'),
        F.lead(ts_col).over(w2).alias('valid_to'),
    )
    return out.withColumn('is_current', F.col('valid_to').isNull())


def scd2_apply_updates(
    history: SparkDF,
    updates: SparkDF,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    state_cols: Union[str, Sequence[str]],
    tiebreak: Optional[str] = None,
) -> SparkDF:
    """Merge a batch of new change events into an existing SCD2
    history (the warehouse MERGE pattern, join-free).

    Reopens each key's timeline by converting history rows back to
    pseudo-events at their ``valid_from``, unioning the update
    events, and re-deriving intervals. Untouched keys come out
    byte-identical (their episodes re-collapse to the same rows), so
    the operation is idempotent: applying the same batch twice is a
    no-op. Cost: one union + the same single-shuffle derivation as
    :func:`scd2_from_events` — at scale, partition ``updates`` by key
    range to keep the exchange balanced.

    ``updates`` must carry ``keys + state_cols + ts_col`` (and
    ``tiebreak`` if given). Histories built by
    :func:`scd2_from_events` persist each episode's opening tiebreak,
    so pseudo-events re-derive under the ORIGINAL total order —
    same-timestamp episodes keep their relative order across repeated
    applies (idempotence holds). For legacy histories lacking the
    tiebreak column, pseudo-events get a NULL tiebreak, which sorts
    first: an existing episode wins a same-timestamp tie, i.e. the
    update is treated as the later change.
    """
    key_list = list_convert(keys)
    state_list = list_convert(state_cols)
    cols = key_list + state_list + [ts_col]
    if tiebreak:
        cols.append(tiebreak)
    tb_cols = []
    if tiebreak:
        if tiebreak in history.columns:
            tb_cols = [F.col(tiebreak)]
        else:
            tb_type = updates.schema[tiebreak].dataType
            tb_cols = [F.lit(None).cast(tb_type).alias(tiebreak)]
    as_events = history.select(
        *key_list, *state_list,
        F.col('valid_from').alias(ts_col),
        *tb_cols,
    ).select(*cols)
    merged = as_events.unionByName(updates.select(*cols))
    return scd2_from_events(
        merged, key_list, ts_col, state_list, tiebreak)
