"""JVM-side vector math over embedding array columns.

Extension territory. The similarity operators
(``operators/similarity.py``) use Arrow-batched numpy GEMMs for
corpus×corpus work — the right tool for O(n·m) kernels. But plenty of
embedding work is ROW-LOCAL (normalize a column, score against one
anchor, compare consecutive rows), and for that a Python UDF is pure
overhead: these helpers express dot/norm/cosine with Spark's
higher-order functions (``zip_with`` + ``aggregate``), which run
inside whole-stage codegen — no serialization boundary, no Python
workers, vectorized by Tungsten.

All math is in double regardless of the input element type
(embeddings are commonly ``array<float>``; summing floats in float
drifts, and engines disagree about promotion — an explicit cast keeps
the DuckDB oracle bit-comparable).
"""
from __future__ import annotations

from typing import Union

from pyspark.sql import Column as SparkCol
from pyspark.sql import functions as F

from .columns import convert_to_spark_col

ColumnOrName = Union[str, SparkCol]

__all__ = ['dot', 'norm', 'cosine', 'with_l2_normalized']


def _as_double(col: ColumnOrName) -> SparkCol:
    return convert_to_spark_col(col).cast('array<double>')


def dot(a: ColumnOrName, b: ColumnOrName) -> SparkCol:
    """Σ aᵢ·bᵢ — sequential left fold, deterministic order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b),
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: ColumnOrName) -> SparkCol:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(a, a))


def cosine(a: ColumnOrName, b: ColumnOrName) -> SparkCol:
    """Cosine similarity; NULL when either vector has zero norm
    (no principled similarity to a zero vector — callers decide)."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def with_l2_normalized(df, col: ColumnOrName, output_col: str):
    """Add ``output_col`` = unit-norm copy of vector ``col`` (NULL
    for zero vectors).

    Deliberately a DataFrame helper, not a Column expression: the
    norm must be materialized ONCE per row before the per-element
    divide — referencing an aggregate expression inside a
    ``transform`` lambda would inline and re-evaluate it per element
    (O(d²) per row; higher-order-function lambdas are interpreted,
    not codegen'd, so Catalyst cannot CSE it away).
    """
    tmp = '__l2n'
    out = df.withColumn(tmp, norm(col))
    return out.withColumn(
        output_col,
        F.when(
            F.col(tmp) > 0,
            F.transform(_as_double(col), lambda x: x / F.col(tmp))),
    ).drop(tmp)
