"""Driver-side pandas helpers (small-data parity with the reference).

Parity target: ``ons_utils/pandas.py`` — MultiIndex reshaping and
fiscal-year utilities used on small, post-Spark frames. Kept as a thin
pandas module because MultiIndex has no Spark analogue; the
SPARK-NATIVE equivalents for big data are noted per function and live
in ``functions.windows`` / plain DataFrame ops.

Fixes vs. reference (documented in SURVEY.md §2.3/§7.0):

* ``MultiIndexSlicer.get_slicer`` raised nothing — the reference
  ``return``-ed a ValueError (pandas.py:99-101); here it raises.
* ``shifted_within_year_apply`` avoids ``groupby(axis=1)`` (removed in
  pandas 2) by transposing instead.
* ``Stacker`` round-trips column order explicitly (pandas.py:44,63-64).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import pandas as pd

from .generic import fill_tuple_keys, flatten_dict


def nested_dict_to_df(
    d: dict,
    columns: Optional[list] = None,
    level_names: Optional[list] = None,
) -> pd.DataFrame:
    """Flatten a nested dict into a DataFrame with MultiIndex rows.

    Ragged keys are front-filled with None so all tuples have equal
    length. Spark-native equivalent: ``spark.createDataFrame`` with the
    flattened tuples as ordinary key columns.
    """
    new_d = fill_tuple_keys(flatten_dict(d), fill_method='ffill')
    idx = pd.MultiIndex.from_tuples(new_d.keys(), names=level_names)
    return pd.DataFrame(list(new_d.values()), index=idx, columns=columns)


class Stacker:
    """Stack/unstack a tidy DataFrame, preserving column order.

    ``value_cols`` stay as values; ``index_cols`` pivot to columns on
    ``unstack`` and back on ``stack``. Spark-native equivalent:
    ``groupBy().pivot().agg(first(...))`` / ``DataFrame.melt``.
    """

    def __init__(
        self,
        value_cols: list,
        index_cols: list,
        transpose: bool = False,
    ):
        self.value_cols = value_cols
        self.index_cols = index_cols
        self.transpose = transpose
        self.all_cols: Optional[pd.Index] = None

    def unstack(self, df: pd.DataFrame) -> pd.DataFrame:
        """Set all non-value cols as index, then unstack index_cols."""
        self.all_cols = df.columns
        set_cols = [c for c in df.columns if c not in self.value_cols]
        out = df.set_index(set_cols).unstack(self.index_cols)
        if self.transpose:
            out = out.T
        return out

    def stack(self, df: pd.DataFrame) -> pd.DataFrame:
        """Inverse of :meth:`unstack`; restores original column order."""
        if self.all_cols is None:
            raise ValueError('call unstack before stack')
        if self.transpose:
            df = df.T
        stacked = df.stack(self.index_cols, future_stack=True)
        return stacked.reset_index()[list(self.all_cols)]


def convert_level_to_datetime(
    df: pd.DataFrame, level, axis: int = 0
) -> pd.DataFrame:
    """Convert one MultiIndex level to DatetimeIndex.

    Spark-native equivalent: ``F.to_date``/``to_timestamp`` on a key
    column.
    """
    ax = df.axes[axis]
    new_levels = [
        pd.to_datetime(ax.levels[i]) if name == level else ax.levels[i]
        for i, name in enumerate(ax.names)
    ]
    return df.set_axis(ax.set_levels(new_levels), axis=axis)


class MultiIndexSlicer:
    """Build ``.loc`` tuples that slice given MultiIndex levels."""

    def __init__(self, df: pd.DataFrame, levels: Sequence, axis: int = 0):
        self.df = df
        self.levels = levels
        self.axis = axis

    def get_slicer(self, *args):
        """Return a tuple slicing ``levels`` to ``args``; ``slice(None)``
        elsewhere. Raises ValueError on arity mismatch (the reference
        returned the exception instead of raising, pandas.py:99-101)."""
        if len(args) != len(self.levels):
            raise ValueError(
                f'len args must be same as len self.levels:'
                f' {len(self.levels)}'
            )
        it = iter(args)
        return tuple(
            next(it) if name in self.levels else slice(None)
            for name in self.df.axes[self.axis].names
        )


def get_index_level_values(
    df: pd.DataFrame, levels, axis: int = 0
) -> List[tuple]:
    """Distinct combinations of the given index levels.

    Spark-native equivalent: ``df.select(levels).distinct()``.
    """
    return list(
        df.axes[axis].to_frame()[levels]
        .drop_duplicates()
        .itertuples(index=False, name=None)
    )


def shifted_within_year_apply(
    df: pd.DataFrame,
    method: Callable[[pd.DataFrame], pd.DataFrame],
    axis: int = 0,
) -> pd.DataFrame:
    """Apply ``method`` within Feb→Jan+1 fiscal years.

    The one-period shift makes January belong to the previous year's
    group. pandas-2-safe: axis=1 is handled by transposing (the
    reference's ``groupby(axis=1)`` was removed upstream).

    Spark-native equivalent:
    ``Window.partitionBy(F.year(F.add_months(date, -1)))`` — see
    ``functions.windows.shifted_year``.
    """
    if axis == 1:
        return shifted_within_year_apply(df.T, method, axis=0).T
    shifted = df.shift(-1)
    out = (
        shifted.groupby(lambda x: x.year, group_keys=False)
        .apply(method)
    )
    return out.shift(1)


def shifted_within_year_ffill(
    df: pd.DataFrame, axis: int = 0
) -> pd.DataFrame:
    """Forward-fill within Feb→Jan+1 fiscal years."""
    return shifted_within_year_apply(df, lambda x: x.ffill(), axis)
