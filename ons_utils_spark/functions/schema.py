"""Schema introspection & renaming helpers.

Parity targets in the reference: ``get_fields``
(pyspark/general.py:128-149), ``get_ddl_schema``
(pyspark/general.py:109-125), ``map_column_names``
(pyspark/general.py:202-211), ``get_hive_table_columns``
(pyspark/general.py:214-216), ``to_list`` (pyspark/general.py:186-199),
``get_first_group`` (pyspark/general.py:224-228), ``transform``
(pyspark/general.py:219-221).

Notes vs. reference:

* ``get_fields`` always returns a list of ``(name, dtype)`` pairs —
  the reference returned a *dict* when ``selection=None`` despite its
  annotation (general.py:144-149); that inconsistency is fixed.
* ``get_first_group`` builds a Column predicate instead of formatting a
  SQL string (the reference's string version broke on non-string keys
  and was injection-prone, general.py:227-228).
* ``get_table_columns`` uses the public catalog API rather than
  ``SHOW columns`` collected through the driver.
"""
from __future__ import annotations

import functools
import operator
from typing import Any, List, Mapping, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_fields(
    df: SparkDF,
    selection: Optional[Sequence[str]] = None,
) -> List[Tuple[str, Optional[str]]]:
    """Return ``(name, dtype)`` pairs, optionally for a selection."""
    fields = dict(df.dtypes)
    if selection:
        return [(col, fields.get(col)) for col in selection]
    return list(df.dtypes)


def get_ddl_schema(fields: Sequence[Tuple[str, str]]) -> str:
    """Render ``(name, dtype)`` pairs to a DDL schema string."""
    return ',\n'.join(f'{name} {dtype}' for name, dtype in fields)


def map_column_names(df: SparkDF, mapper: Mapping[str, str]) -> SparkDF:
    """Bulk-rename columns; names absent from the mapper pass through.

    Uses ``withColumnsRenamed`` (Spark >= 3.4) — a single Project node,
    zero data movement.
    """
    return df.withColumnsRenamed(dict(mapper))


def to_list(df: SparkDF) -> List[Any]:
    """Collect a DataFrame to the driver as a list.

    One column → flat list of values; multiple columns → list of row
    lists. Driver-bound by design — do not call on large frames.
    """
    if len(df.columns) == 1:
        return [row[0] for row in df.collect()]
    return [list(row) for row in df.collect()]


def get_table_columns(spark: SparkSession, table_path: str) -> List[str]:
    """Column names of a catalog (e.g. Hive) table via the public API."""
    return [c.name for c in spark.catalog.listColumns(table_path)]


# Back-compat alias matching the reference name.
get_hive_table_columns = get_table_columns


def transform(self: SparkDF, f, *args, **kwargs):
    """Chainable transform helper (built-in since Spark 3.0)."""
    return f(self, *args, **kwargs)


def get_first_group(df: SparkDF, groups: Union[str, Sequence[str]]) -> SparkDF:
    """Return the rows of the first group observed in ``df``.

    Builds a Column conjunction (null-safe ``eqNullSafe``) instead of a
    formatted SQL string, so it works for any key dtype.
    """
    if isinstance(groups, str):
        groups = [groups]
    head = df.select(*groups).head(1)
    if not head:
        return df
    row = head[0]
    predicate = functools.reduce(
        operator.and_,
        [F.col(g).eqNullSafe(F.lit(row[g])) for g in groups],
    )
    return df.filter(predicate)


def flatten_struct(
    df: SparkDF,
    sep: str = '_',
    max_depth: int = 10,
) -> SparkDF:
    """Recursively lift nested struct fields to top-level columns
    (``a.b.c`` → ``a_b_c``) — the standard post-``from_json`` /
    post-ingest normalization step.

    A pure projection (metadata-only: no shuffle, no UDF; Catalyst
    collapses it into the scan, and column pruning still reaches the
    nested fields it needs). Arrays and maps pass through unflattened
    — explode them explicitly if row expansion is wanted; silently
    multiplying rows is not this function's job. Name collisions
    raise rather than shadow.
    """
    from pyspark.sql import types as T

    def leaves(expr, name, dtype, depth):
        if isinstance(dtype, T.StructType) and depth < max_depth:
            out = []
            for field in dtype.fields:
                out += leaves(expr[field.name],
                              f'{name}{sep}{field.name}',
                              field.dataType, depth + 1)
            return out
        return [(name, expr)]

    named = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            named += leaves(F.col(field.name), field.name,
                            field.dataType, 1)
        else:
            named.append((field.name, F.col(field.name)))
    names = [n for n, _ in named]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f'flatten_struct name collision(s): {sorted(dupes)!r}; '
            f'use a different sep')
    return df.select(*[expr.alias(n) for n, expr in named])


def profile_columns(df: SparkDF, cols=None) -> SparkDF:
    """Data-quality profile: one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_str, max_str)``.

    ONE aggregation pass: all per-column stats are expressions of a
    single ``agg`` (multiple DISTINCT aggregates plan as one
    Expand + aggregate — rows multiply by the column count, which is
    the documented cost), then the wide row unpivots via an
    array-of-structs explode. min/max render as strings so mixed
    column types share one schema. At 100 TB swap ``countDistinct``
    for ``approx_count_distinct`` — same shape, no Expand blowup.
    """
    cols = list(cols) if cols else list(df.columns)
    aggs = [F.count(F.lit(1)).alias('__n')]
    for c in cols:
        aggs += [
            F.count(c).alias(f'__nn_{c}'),
            F.countDistinct(c).alias(f'__nd_{c}'),
            F.min(c).cast('string').alias(f'__mn_{c}'),
            F.max(c).cast('string').alias(f'__mx_{c}'),
        ]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias('column'),
            (F.col('__n') - F.col(f'__nn_{c}')).alias('n_nulls'),
            F.col(f'__nd_{c}').alias('n_distinct'),
            F.col(f'__mn_{c}').alias('min_str'),
            F.col(f'__mx_{c}').alias('max_str'),
        )
        for c in cols
    ])
    return wide.select(
        F.col('__n').alias('n_rows'),
        F.explode(entries).alias('p'),
    ).select('p.column', 'n_rows', 'p.n_nulls', 'p.n_distinct',
             'p.min_str', 'p.max_str')
