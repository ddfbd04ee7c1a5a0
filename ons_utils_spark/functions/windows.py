"""Window-spec factories and window-based column helpers.

Parity target: ``get_window_spec`` (reference pyspark/general.py:170-183)
— partition-only spec, with the documented single-partition hazard when
``groups`` is None. Extended with ordered/framed variants and
forward/backward fill, covering the reference's pandas-side
``shifted_within_year_ffill`` (pandas.py:136-138) Spark-natively.

Scale note: a global window (no partition) funnels ALL rows through one
task. For global aggregates prefer ``df.agg(...)`` + a broadcast/cross
join of the scalar — see :func:`with_global_agg`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F

from ..generic import list_convert
from .columns import convert_to_spark_col

ColumnOrName = Union[str, SparkCol]


def get_window_spec(
    groups: Union[str, Sequence[str], None] = None,
) -> WindowSpec:
    """WindowSpec partitioned by ``groups``; global window when None.

    .. warning::
       ``groups=None`` creates a single-partition window — every row is
       shuffled to one task. Fine on small frames; at scale use
       :func:`with_global_agg` instead.
    """
    return (
        Window.partitionBy(*list_convert(groups)) if groups
        else Window.partitionBy()
    )


def get_ordered_window_spec(
    groups: Union[str, Sequence[str], None],
    order_by: Union[str, Sequence[str]],
    rows_between: Optional[Sequence[int]] = None,
) -> WindowSpec:
    """Partitioned + ordered window, optional row frame."""
    spec = get_window_spec(groups).orderBy(*list_convert(order_by))
    if rows_between is not None:
        lo, hi = rows_between
        spec = spec.rowsBetween(lo, hi)
    return spec


def with_global_agg(
    df: SparkDF,
    agg_col: SparkCol,
    name: str,
) -> SparkDF:
    """Attach a global aggregate as a column without a 1-partition window.

    Computes ``df.agg(agg_col)`` (a tree-aggregated 1-row frame) and
    broadcast-cross-joins it back — the scalable alternative to
    ``F.sum(...).over(Window.partitionBy())``.
    """
    scalar = df.agg(agg_col.alias(name))
    return df.crossJoin(F.broadcast(scalar))


def ffill(
    col: ColumnOrName,
    order_by: Union[str, Sequence[str]],
    groups: Union[str, Sequence[str], None] = None,
) -> SparkCol:
    """Forward-fill NULLs within ordered (optionally grouped) windows.

    Spark-native equivalent of pandas ``groupby(...).ffill()`` —
    ``last(col, ignorenulls=True)`` over an unbounded-preceding frame.
    """
    spec = get_window_spec(groups).orderBy(
        *list_convert(order_by)
    ).rowsBetween(Window.unboundedPreceding, 0)
    return F.last(convert_to_spark_col(col), ignorenulls=True).over(spec)


def bfill(
    col: ColumnOrName,
    order_by: Union[str, Sequence[str]],
    groups: Union[str, Sequence[str], None] = None,
) -> SparkCol:
    """Backward-fill NULLs within ordered (optionally grouped) windows."""
    spec = get_window_spec(groups).orderBy(
        *list_convert(order_by)
    ).rowsBetween(0, Window.unboundedFollowing)
    return F.first(convert_to_spark_col(col), ignorenulls=True).over(spec)


def shifted_year(date_col: ColumnOrName, months: int = -1) -> SparkCol:
    """Fiscal-year key: the year of ``date + months`` months.

    With the default ``months=-1`` a Feb→Jan+1 fiscal year (the
    reference's ``shifted_within_year_apply`` semantics, pandas.py:121-133)
    becomes an ordinary partition key — distributed, no pandas axis ops.
    """
    return F.year(F.add_months(convert_to_spark_col(date_col), months))


def shifted_within_year_ffill(
    df: SparkDF,
    col: str,
    date_col: str,
    output_col: Optional[str] = None,
) -> SparkDF:
    """Forward-fill ``col`` within Feb→Jan+1 fiscal years.

    Spark-native port of the reference's pandas-only
    ``shifted_within_year_ffill`` (pandas.py:136-138).
    """
    return df.withColumn(
        output_col or col,
        F.last(F.col(col), ignorenulls=True).over(
            Window.partitionBy(shifted_year(date_col))
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def sessionize(
    df: SparkDF,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: Optional[Sequence[str]] = None,
    session_col: str = 'session_id',
) -> SparkDF:
    """Assign gap-based session ids per user (0-based, in time order).

    A new session starts when the gap since the user's previous event
    exceeds ``gap_seconds``. Classic lag-flag-cumsum over ONE ordered
    window (one shuffle on ``user_col``); pass ``order_cols`` to break
    timestamp ties deterministically. Complements
    ``streaming.windows.session_window_agg`` (which merges windows
    but does not expose ids on the event rows).
    """
    order = [ts_col, *(order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    epoch = F.col(ts_col).cast('long')
    prev = F.lag(F.col(ts_col)).over(w).cast('long')
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1,
    )
