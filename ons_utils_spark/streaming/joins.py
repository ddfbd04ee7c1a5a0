"""Stream-stream and stream-static join helpers.

Extension territory — the reference has no streaming (SURVEY.md
§2.2). Structured Streaming's join support has sharp edges that are
easy to get wrong ad hoc: stream-stream inner joins REQUIRE an
event-time range (or window-equality) condition plus watermarks on
both sides, or state grows without bound and the query either fails
to plan (outer joins) or OOMs slowly (inner joins). These wrappers
encode the safe patterns once.

Scale notes:

* ``stream_interval_join`` keeps per-key state only inside the
  watermark × interval horizon — state size is
  ``rate × (delay + upper_bound)``, independent of stream length.
  Both sides shuffle on the key; co-partitioning is automatic.
* ``enrich_with_static`` is the no-state path: each micro-batch
  hash-joins against a broadcast dimension — no shuffle of the
  stream, no state store. Use it whenever one side is bounded and
  small; it also re-resolves the dimension per batch, picking up
  slowly-refreshed lookup tables for free.

Both helpers run unchanged on batch DataFrames (watermarks no-op),
so pipelines are testable in batch and deployable on ``readStream``
as-is — the same batch/stream parity contract as
``streaming.windows``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert
from .windows import with_watermark

__all__ = ['stream_interval_join', 'enrich_with_static']


def stream_interval_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    *,
    lower: str = '0 seconds',
    upper: str = '30 minutes',
    watermark: str = '2 hours',
    how: str = 'inner',
) -> SparkDF:
    """Join two event streams on key(s) + an event-time interval:
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Watermarks are applied to BOTH sides (required for the state to
    be reclaimable); ``lower``/``upper`` are SQL interval strings and
    may be negative (e.g. ``lower='-5 minutes'`` tolerates clock
    skew). Output carries the left frame's columns plus the right
    frame's non-key columns (key columns are emitted once).

    For ``how='left_outer'``/``'right_outer'`` Spark additionally
    requires the watermark-delayed side to be the outer side — passed
    through as-is so misuse fails loudly at plan time rather than
    silently dropping rows.
    """
    keys = list_convert(on)
    lw = with_watermark(left, left_ts, watermark)
    rw = with_watermark(right, right_ts, watermark)
    cond = [lw[k] == rw[k] for k in keys]
    cond.append(rw[right_ts] >= lw[left_ts] + F.expr(f'INTERVAL {lower}'))
    cond.append(rw[right_ts] <= lw[left_ts] + F.expr(f'INTERVAL {upper}'))
    joined = lw.join(rw, on=cond, how=how)
    # emit key columns once (from the left side)
    right_cols = [rw[c] for c in right.columns if c not in keys]
    left_cols = [lw[c] for c in left.columns]
    return joined.select(*left_cols, *right_cols)


def enrich_with_static(
    stream: SparkDF,
    dim: SparkDF,
    on: Union[str, Sequence[str]],
    how: str = 'left',
    *,
    broadcast_dim: bool = True,
) -> SparkDF:
    """Stream-static enrichment join: no state store, no stream-side
    shuffle when the dimension is broadcast (the default — pass
    ``broadcast_dim=False`` only when the dimension is too large to
    broadcast, accepting a per-batch shuffle)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=list_convert(on), how=how)
