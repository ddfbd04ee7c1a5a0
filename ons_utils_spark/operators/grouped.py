"""Grouped-map pandas apply on Spark.

Parity target: ``convert_to_pandas_udf`` (reference
pyspark/general.py:42-106), which wrapped a pandas→pandas function as a
Spark 2.4 ``GROUPED_MAP`` pandas UDF and re-attached the group-key
values taken from row 0 of each group.

Modernization: ``PandasUDFType.GROUPED_MAP`` was removed; this module
uses ``df.groupBy(*groups).applyInPandas`` with the explicit two-arg
``(key, pdf)`` form, so key re-attachment needs no row-0/index
assumptions. Execution is a hash shuffle on the group keys followed by
Arrow-batched JVM↔Python transfer per group — the idiomatic scale path
for arbitrary per-group pandas logic. Groups must individually fit in
a worker's memory; for skewed group sizes pre-split or salt upstream.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql.types import StructType

from ..generic import list_convert


def grouped_apply(
    df: SparkDF,
    func: Callable[..., pd.DataFrame],
    schema: Union[StructType, str],
    groups: Union[str, Sequence[str]],
    keep_index: bool = False,
    args: Optional[Sequence[Any]] = None,
    kwargs: Optional[Mapping[str, Any]] = None,
) -> SparkDF:
    """Apply a pandas→pandas function per group, keys re-attached.

    Parameters
    ----------
    df : SparkDF
    func : callable
        Takes a pandas DataFrame (one group) as its first argument and
        returns a pandas DataFrame. May drop the group-key columns —
        they are restored as the leading output columns.
    schema : StructType or DDL string
        Output schema INCLUDING the group-key columns.
    groups : str or sequence of str
        Grouping column names.
    keep_index : bool, default False
        If True, ``reset_index()`` is applied to ``func``'s result so
        index levels become columns.
    args, kwargs
        Extra arguments unpacked into ``func``.
    """
    groups = list_convert(groups)
    args = list(args) if args else []
    kwargs = dict(kwargs) if kwargs else {}

    def apply_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        result = func(pdf, *args, **kwargs)
        if keep_index:
            result = result.reset_index()
        result = result.reset_index(drop=True)
        # Restore group keys (constant per group) as leading columns,
        # overwriting any stale copies func may have kept.
        for name in reversed(groups):
            if name in result.columns:
                result = result.drop(columns=[name])
        key_df = pd.DataFrame(
            {name: [val] * len(result) for name, val in zip(groups, key)}
        )
        return pd.concat([key_df, result], axis=1)

    return df.groupBy(*groups).applyInPandas(apply_fn, schema)


def convert_to_pandas_udf(*args, **kwargs):  # pragma: no cover
    """Removed API surface from the reference (Spark 2.4 GROUPED_MAP).

    Use :func:`grouped_apply` — the underlying UDF type no longer
    exists in Spark 4.
    """
    raise NotImplementedError(
        'PandasUDFType.GROUPED_MAP was removed in modern Spark;'
        ' use ons_utils_spark.operators.grouped_apply(df, func, schema,'
        ' groups, ...) instead.'
    )
