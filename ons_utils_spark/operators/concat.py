"""Schema-harmonizing n-way concatenation for Spark DataFrames.

The flagship operator. Parity target: ``concat``
(reference pyspark/concat.py:36-160) — a pandas.concat-for-Spark with:

* automatic numeric type widening per column,
* string coercion (any frame string → all string),
* NULL-filling of columns missing from a frame,
* optional pandas-style hierarchical key columns (``keys``/``names``),
* ``UnequalSchemaWarning`` + schema diff when dtypes conflict,
* ``TypeError`` on non-coercible dtype pairs (e.g. timestamp vs boolean).

Architecture (Spark-first, not a port): the harmonized schema is
computed driver-side as a pure function over ``df.dtypes`` (a Py4J
metadata call — no job runs), then each frame is rewritten with a
single ``select`` projection of casts/null-literals, and the frames are
combined with one n-ary ``unionByName``. Catalyst collapses the
projections (CollapseProject) and the union chain (CombineUnions), so
the physical plan is a flat union of casted scans — zero extra
shuffles, and at 100 TB the union is pure metadata: each input keeps
its own partitioning.

Type promotion modes:

* ``'spark'`` (default) — follows Spark's own ``findWiderTypeForTwo``
  semantics: decimal meets float/double → double; decimals widen to
  cover both precisions; integral meets decimal → widened decimal.
* ``'reference'`` — bug-compatible with the reference lattice
  (concat.py:25-33) where decimal(10,0) outranks double/float, which
  silently drops fractional precision (asserted by the reference's own
  test, tests/pyspark/test_concat.py:452-455).
"""
from __future__ import annotations

import functools
import re
import warnings
from collections import abc
from typing import (
    Dict,
    Iterable,
    List,
    Mapping,
    Optional,
    Sequence,
    Tuple,
    Union,
)

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..generic import list_convert

Key = Sequence[Union[str, Sequence[str]]]


class UnequalSchemaWarning(Warning):
    """Emitted when input frames disagree on a column dtype."""


# Widening order, big → small (reference concat.py:25-33). In
# 'reference' mode any decimal outranks double.
_REFERENCE_LATTICE = (
    'decimal', 'double', 'float', 'bigint', 'int', 'smallint', 'tinyint',
)

# Integral rank & max decimal digits for 'spark' mode promotion.
_INTEGRAL_DIGITS = {'tinyint': 3, 'smallint': 5, 'int': 10, 'bigint': 20}
_NUMERIC_RANK = {
    'tinyint': 0, 'smallint': 1, 'int': 2, 'bigint': 3,
    'float': 4, 'double': 5,
}
_DECIMAL_RE = re.compile(r'^decimal\((\d+),\s*(-?\d+)\)$')


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC_RANK or _DECIMAL_RE.match(dtype) is not None


def _decimal_parts(dtype: str) -> Optional[Tuple[int, int]]:
    m = _DECIMAL_RE.match(dtype)
    return (int(m.group(1)), int(m.group(2))) if m else None


def _widen_pair_spark(a: str, b: str) -> str:
    """Spark-style wider type for two numeric dtype strings."""
    da, db = _decimal_parts(a), _decimal_parts(b)
    if da and db:
        p1, s1 = da
        p2, s2 = db
        scale = max(s1, s2)
        return f'decimal({min(38, max(p1 - s1, p2 - s2) + scale)},{scale})'
    if da or db:
        dec, other = (da, b) if da else (db, a)
        if other in ('float', 'double'):
            return 'double'
        # integral meets decimal → decimal wide enough for both
        p, s = dec
        digits = _INTEGRAL_DIGITS[other]
        return f'decimal({min(38, max(p - s, digits) + s)},{s})'
    return a if _NUMERIC_RANK[a] >= _NUMERIC_RANK[b] else b


def _widen_reference(dtypes: Sequence[str]) -> str:
    """Pick per the reference lattice: first (biggest) family present."""
    for family in _REFERENCE_LATTICE:
        for dt in dtypes:
            if dt == family or (family == 'decimal' and _decimal_parts(dt)):
                return dt
    raise TypeError(f'no numeric dtype among {dtypes}')  # pragma: no cover


def promote_dtypes(
    dtypes: Sequence[Optional[str]],
    mode: str = 'spark',
) -> str:
    """Resolve one column's dtypes across frames to a single dtype.

    ``None`` entries mean the column is missing from that frame (it
    will be NULL-filled); per the reference (concat.py:224) missing
    slots don't block numeric coercion.
    """
    present = [dt for dt in dtypes if dt is not None]
    if not present:
        return 'string'
    if any(dt == 'string' for dt in present):
        return 'string'
    if all(_is_numeric(dt) for dt in present):
        if mode == 'reference':
            return _widen_reference(present)
        return functools.reduce(_widen_pair_spark, present)
    if all(dt == present[0] for dt in present):
        return present[0]
    raise TypeError(
        "Spark column data type mismatch, can't auto-convert between"
        f' types: {sorted(set(present))}'
    )


def _collect_schemas(
    frames: Sequence[SparkDF],
) -> Tuple[List[str], List[Dict[str, str]]]:
    """Column order (first appearance) + per-frame {name: dtype} maps."""
    order: List[str] = []
    seen = set()
    per_frame: List[Dict[str, str]] = []
    for df in frames:
        schema = dict(df.dtypes)
        per_frame.append(schema)
        for name, _ in df.dtypes:
            if name not in seen:
                seen.add(name)
                order.append(name)
    return order, per_frame


def _schema_diff(
    order: Sequence[str],
    per_frame: Sequence[Mapping[str, str]],
) -> str:
    lines = []
    for name in order:
        dtypes = [schema.get(name) for schema in per_frame]
        if len({dt for dt in dtypes if dt is not None}) > 1:
            lines.append(f'  {name}: {dtypes}')
    return '\n'.join(lines)


def _final_schema(
    order: Sequence[str],
    per_frame: Sequence[Mapping[str, str]],
    mode: str,
) -> List[Tuple[str, str]]:
    return [
        (name, promote_dtypes([s.get(name) for s in per_frame], mode))
        for name in order
    ]


def _conform(
    df: SparkDF,
    final_schema: Sequence[Tuple[str, str]],
) -> SparkDF:
    """Project ``df`` onto the final schema (casts + NULL-fill)."""
    have = dict(df.dtypes)
    cols = []
    for name, dtype in final_schema:
        if name not in have:
            cols.append(F.lit(None).cast(dtype).alias(name))
        elif have[name] != dtype:
            cols.append(F.col(name).cast(dtype).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def concat(
    frames: Union[Iterable[SparkDF], Mapping[Key, SparkDF]],
    keys: Optional[Key] = None,
    names: Optional[Union[str, Sequence[str]]] = None,
    *,
    type_promotion: str = 'spark',
) -> SparkDF:
    """Concatenate Spark DataFrames with schema harmonization.

    Parameters
    ----------
    frames : sequence or mapping of SparkDF
        If a mapping is passed its keys are used as ``keys`` (unless
        ``keys`` is given, in which case it also subsets/orders the
        mapping).
    keys : sequence of str or str-sequences, optional
        One key per frame; multi-part keys must all have the same arity,
        equal to ``len(names)``. Each part becomes a literal column.
    names : str or sequence of str, optional
        Names of the new key columns (leading columns of the output).
        Required when ``frames`` is a mapping.
    type_promotion : {'spark', 'reference'}
        Numeric widening semantics (see module docstring).

    Returns
    -------
    SparkDF
        One DataFrame: union of all frames on the harmonized schema,
        with key columns prepended when ``keys``/``names`` are given.
    """
    if isinstance(frames, (SparkDF, str)):
        raise TypeError(
            'first argument must be an iterable of pyspark DataFrames,'
            f" you passed an object of type '{type(frames)}'"
        )

    if isinstance(frames, abc.Mapping):
        if names is None:
            raise ValueError(
                'when the first argument is a mapping,'
                ' the names argument must be given'
            )
        if keys is None:
            keys = list(frames.keys())
        frames = [frames[k] for k in keys]
    else:
        frames = list(frames)
        if keys is not None and len(frames) != len(keys):
            raise ValueError(
                'keys must be same length as frames'
                ' when frames is a list or tuple'
            )

    if len(frames) == 0:
        raise ValueError('No objects to concatenate')

    for frame in frames:
        if not isinstance(frame, SparkDF):
            raise TypeError(
                f"cannot concatenate object of type '{type(frame)}'; "
                'only pyspark.sql.DataFrame objs are valid'
            )

    order, per_frame = _collect_schemas(frames)

    diff = _schema_diff(order, per_frame)
    if diff:
        warnings.warn(
            'column dtypes in the schemas are not equal,'
            f' attempting to coerce\n\n{diff}',
            UnequalSchemaWarning,
            stacklevel=2,
        )

    schemas_equal = all(s == per_frame[0] for s in per_frame)
    if not schemas_equal:
        final = _final_schema(order, per_frame, type_promotion)
        frames = [_conform(f, final) for f in frames]

    if not names and not keys:
        return functools.reduce(
            functools.partial(SparkDF.unionByName, allowMissingColumns=False),
            frames,
        )

    names = list_convert(names)
    keys = [list_convert(key) for key in keys]

    if not all(len(key) == len(names) for key in keys):
        raise ValueError(
            'the length of each key must equal the length of names'
        )
    if not all(len(key) == len(keys[0]) for key in keys):
        raise ValueError('all keys must be of equal length')

    keyed = [
        frame.select(
            *[F.lit(part).alias(name) for name, part in zip(names, parts)],
            '*',
        )
        for parts, frame in zip(keys, frames)
    ]
    return functools.reduce(
        functools.partial(SparkDF.unionByName, allowMissingColumns=False),
        keyed,
    )
