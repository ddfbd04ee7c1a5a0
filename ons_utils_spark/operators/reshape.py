"""Distributed reshaping: the Spark-native Stacker equivalent.

Parity target: the reference's pandas-only ``Stacker``
(pandas.py:21-64) — tidy↔wide round-trips. Here the same contract is
expressed with ``groupBy().pivot()`` / ``DataFrame.melt`` so it runs
distributed; column order restoration (the reference's
``self.all_cols`` trick, pandas.py:44) is preserved explicitly.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert


def unstack(
    df: SparkDF,
    index_cols: Sequence[str],
    value_col: str,
    pivot_values: Optional[Sequence] = None,
    agg: str = 'first',
) -> SparkDF:
    """Pivot ``index_cols`` values into columns (tidy → wide).

    All other columns become the row key. Pass ``pivot_values`` when
    known — it skips the extra distinct-collection job AND makes the
    output schema deterministic (important on big data; Spark caps
    discovered pivot values at ``spark.sql.pivotMaxValues``).
    """
    index_cols = list_convert(index_cols)
    key_cols = [
        c for c in df.columns if c not in index_cols and c != value_col
    ]
    pivot_key = (
        F.concat_ws('|', *[F.col(c).cast('string') for c in index_cols])
        if len(index_cols) > 1 else F.col(index_cols[0])
    )
    grouped = df.withColumn('__pk', pivot_key).groupBy(*key_cols)
    pivoted = (
        grouped.pivot('__pk', list(pivot_values))
        if pivot_values is not None else grouped.pivot('__pk')
    )
    agg_fn = {'first': F.first, 'sum': F.sum, 'avg': F.avg,
              'max': F.max, 'min': F.min}[agg]
    return pivoted.agg(agg_fn(value_col))


def stack(
    df: SparkDF,
    key_cols: Sequence[str],
    index_col: str,
    value_col: str,
    value_columns: Optional[Sequence[str]] = None,
) -> SparkDF:
    """Melt pivoted columns back to tidy (wide → tidy).

    ``value_columns`` defaults to every non-key column.
    """
    key_cols = list_convert(key_cols)
    if value_columns is None:
        value_columns = [c for c in df.columns if c not in key_cols]
    return df.melt(
        ids=key_cols,
        values=list(value_columns),
        variableColumnName=index_col,
        valueColumnName=value_col,
    )


class SparkStacker:
    """Round-trip helper mirroring the reference ``Stacker`` API.

    ``value_cols`` must be a single value column (Spark pivots one
    measure per pass); ``index_cols`` pivot to columns on
    :meth:`unstack` and back on :meth:`stack`, restoring the original
    column order.
    """

    def __init__(self, value_col: str, index_cols: Sequence[str]):
        self.value_col = value_col
        self.index_cols = list_convert(index_cols)
        self.all_cols: Optional[List[str]] = None
        self.key_cols: Optional[List[str]] = None

    def unstack(self, df: SparkDF) -> SparkDF:
        self.all_cols = list(df.columns)
        self.key_cols = [
            c for c in df.columns
            if c not in self.index_cols and c != self.value_col
        ]
        return unstack(df, self.index_cols, self.value_col)

    def stack(self, df: SparkDF) -> SparkDF:
        if self.all_cols is None:
            raise ValueError('call unstack before stack')
        out = stack(
            df, self.key_cols,
            index_col='__pk', value_col=self.value_col,
        )
        if len(self.index_cols) > 1:
            parts = F.split(F.col('__pk'), r'\|')
            for i, name in enumerate(self.index_cols):
                out = out.withColumn(name, parts[i])
        else:
            out = out.withColumnRenamed('__pk', self.index_cols[0])
        return out.filter(
            F.col(self.value_col).isNotNull()
        ).select(*self.all_cols)
