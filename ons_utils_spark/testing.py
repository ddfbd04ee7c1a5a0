"""Test-suite utilities (public surface — tests import them).

Parity targets: ``to_date`` / ``create_dataframe`` /
``create_multi_column_df`` / ``create_df_with_multi_indices``
(reference testing.py:9-87) plus a local Spark-frame equality
assertion replacing the reference's chispa dependency
(tests/pyspark/test_concat.py:2).
"""
from __future__ import annotations

from datetime import date
from typing import Any, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame as SparkDF


def to_date(dt: str) -> date:
    """Convert a date string to a ``datetime.date``."""
    return pd.Timestamp(dt).date()


def create_dataframe(data: Sequence[Tuple[Any, ...]]) -> pd.DataFrame:
    """Create a pandas DataFrame from tuple data with a header row."""
    return pd.DataFrame.from_records(list(data[1:]), columns=list(data[0]))


def create_multi_column_df(
    data: Sequence[Tuple[Any, ...]], column_levels: int
) -> pd.DataFrame:
    """Pandas DataFrame whose first ``column_levels`` rows form a
    MultiIndex on the columns."""
    m_idx = pd.MultiIndex.from_tuples(list(zip(*data[:column_levels])))
    return pd.DataFrame.from_records(list(data[column_levels:]), columns=m_idx)


def create_df_with_multi_indices(
    data: Sequence[Tuple[Any, ...]],
    column_labels: Sequence[str],
    index_labels: Sequence[str],
) -> pd.DataFrame:
    """DataFrame with MultiIndex on both axes.

    The first ``len(column_labels)`` tuples are the column levels; the
    remaining tuples carry ``len(index_labels)`` leading index values
    followed by the data cells.
    """
    n_col_levels = len(column_labels)
    if n_col_levels == 1:
        column_index = pd.Index(data[0], name=column_labels[0])
    else:
        column_index = pd.MultiIndex.from_tuples(
            list(zip(*data[:n_col_levels])), names=list(column_labels)
        )
    return (
        pd.DataFrame.from_records(list(data[n_col_levels:]))
        .set_index(list(range(len(index_labels))))
        .rename_axis(list(index_labels))
        .set_axis(column_index, axis=1)
    )


def assert_df_equality(
    left: SparkDF,
    right: SparkDF,
    ignore_row_order: bool = False,
    ignore_nullable: bool = True,
    ignore_column_order: bool = False,
    check_dtype: bool = True,
    rtol: float = 0.0,
) -> None:
    """Assert two Spark DataFrames are equal (chispa-equivalent).

    Compares schema (names + dtypes, nullability optionally ignored)
    then collected values via pandas. Driver-bound — tests only.
    """
    lcols, rcols = list(left.columns), list(right.columns)
    if ignore_column_order:
        lcols, rcols = sorted(lcols), sorted(rcols)
        left, right = left.select(*lcols), right.select(*rcols)
    assert lcols == rcols, f'columns differ: {lcols} != {rcols}'
    if check_dtype:
        ldt = [dict(left.dtypes)[c] for c in lcols]
        rdt = [dict(right.dtypes)[c] for c in rcols]
        assert ldt == rdt, (
            f'dtypes differ:\n  left:  {list(zip(lcols, ldt))}'
            f'\n  right: {list(zip(rcols, rdt))}'
        )

    lpd = left.toPandas()
    rpd = right.toPandas()
    if ignore_row_order:
        lpd = lpd.sort_values(lcols, kind='mergesort').reset_index(drop=True)
        rpd = rpd.sort_values(rcols, kind='mergesort').reset_index(drop=True)
    pd.testing.assert_frame_equal(
        lpd, rpd,
        check_dtype=check_dtype,
        check_exact=(rtol == 0.0),
        rtol=rtol or 1.0e-5,
    )


def assert_spark_pandas_equality(
    sdf: SparkDF,
    expected: pd.DataFrame,
    sort_by: Optional[Sequence[str]] = None,
) -> None:
    """Assert a Spark frame equals a pandas golden frame (values only)."""
    got = sdf.toPandas()
    if sort_by:
        got = got.sort_values(list(sort_by)).reset_index(drop=True)
        expected = (
            expected.sort_values(list(sort_by)).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
