"""Column-expression helpers.

Parity targets in the reference: ``convert_to_spark_col``
(pyspark/general.py:29-39), ``map_col`` (pyspark/general.py:152-162),
``is_list_or_tuple`` (pyspark/general.py:165-167).

All helpers build JVM-side Catalyst expressions — no Python UDFs — so
they stay inside whole-stage codegen at any scale.
"""
from __future__ import annotations

import itertools
from typing import Any, Mapping, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def convert_to_spark_col(s: Union[str, SparkCol]) -> SparkCol:
    """Lift a string to ``F.col``; pass Columns through; else ValueError."""
    if isinstance(s, str):
        return F.col(s)
    if isinstance(s, SparkCol):
        return s
    raise ValueError(
        "expecting a string or pyspark column but received obj"
        f" of type {type(s)}"
    )


def is_list_or_tuple(x: Any) -> bool:
    """Return True if x is a list or tuple."""
    return isinstance(x, (list, tuple))


def map_col(col_name: str, mapping: Mapping[Any, Any]) -> SparkCol:
    """Dict-lookup column built from a literal ``MapType`` expression.

    ``map_col('position', {1: 'first', 2: 'second'})`` yields a column
    whose value is the mapping of ``position``; unmapped keys → NULL.
    List/tuple mapping values become array literals.

    Scale note: a ``create_map`` literal is evaluated entirely in the
    JVM with no shuffle — right for small/medium maps (≲10k entries,
    the expression is shipped with the plan). For large lookup tables
    use :func:`lookup_join` instead (broadcast join).
    """
    map_expr = F.create_map([
        F.lit(x) if not is_list_or_tuple(x)
        else F.array([F.lit(i) for i in x])
        for x in itertools.chain(*mapping.items())
    ])
    return map_expr[F.col(col_name)]


def lookup_join(
    df: SparkDF,
    col_name: str,
    mapping: Mapping[Any, Any],
    output_col: str,
) -> SparkDF:
    """Broadcast-join a Python mapping onto ``df`` as ``output_col``.

    The scale path for what :func:`map_col` does: the mapping becomes a
    tiny DataFrame broadcast to every executor, so the lookup is a
    hash-probe with no shuffle of ``df``.
    """
    spark = df.sparkSession
    lookup = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()],
        schema=[col_name, output_col],
    )
    return df.join(F.broadcast(lookup), on=col_name, how='left')
