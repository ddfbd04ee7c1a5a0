"""JSON extraction helpers.

Extension (the reference has none; the testdata ``events.props`` is a
JSON string — FIXTURES.md §2). Thin wrappers over the native
``from_json`` / ``get_json_object`` expressions.
"""
from __future__ import annotations

from typing import Mapping, Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .columns import convert_to_spark_col

ColumnOrName = Union[str, SparkCol]


def json_get(col: ColumnOrName, path: str) -> SparkCol:
    """Extract one JSON path as string (``get_json_object``)."""
    return F.get_json_object(convert_to_spark_col(col), path)


def json_struct(col: ColumnOrName, schema: str) -> SparkCol:
    """Parse a JSON string column into a typed struct (``from_json``)."""
    return F.from_json(convert_to_spark_col(col), schema)


def with_json_fields(
    df: SparkDF,
    col: str,
    fields: Mapping[str, str],
) -> SparkDF:
    """Extract typed fields from a JSON column.

    ``fields`` maps output column name → ``'$.path:dtype'`` (dtype
    optional, default string), e.g. ``{'k': '$.k:int'}``.
    """
    out = df
    for name, spec in fields.items():
        if ':' in spec:
            path, dtype = spec.rsplit(':', 1)
        else:
            path, dtype = spec, 'string'
        out = out.withColumn(
            name, F.get_json_object(F.col(col), path).cast(dtype)
        )
    return out
