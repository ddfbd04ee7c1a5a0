"""Pure-Python helper utilities (no Spark dependency).

Parity target: ``ons_utils/generic.py`` in the reference
(ONSdigital/ons-utils). Re-implemented from the documented behavior;
the reference's dependency on the third-party ``flatten_dict`` package
is replaced by the local :func:`flatten_dict` / :func:`unflatten_dict`.

Reference parity notes (file:line cite the reference repo):

* ``invert_nested_keys`` — generic.py:9-11
* ``get_key_value_pairs`` — generic.py:14-25 (the reference builds a
  *set* of ``itertools.product`` objects so its output order is
  nondeterministic; here the order is deterministic: input order)
* ``fill_tuples`` / ``fill_tuple_keys`` — generic.py:28-88
* ``is_non_string_sequence`` / ``tuple_convert`` / ``list_convert`` —
  generic.py:91-111
"""
from __future__ import annotations

import itertools
from collections import abc
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple


def flatten_dict(
    d: Mapping[Any, Any],
    parent: Tuple[Any, ...] = (),
) -> Dict[Tuple[Any, ...], Any]:
    """Flatten a nested mapping to ``{tuple_key: leaf_value}``.

    Equivalent of ``flatten_dict.flatten(d)`` with tuple reducer.
    """
    out: Dict[Tuple[Any, ...], Any] = {}
    for k, v in d.items():
        key = parent + (k,)
        if isinstance(v, abc.Mapping) and len(v) > 0:
            out.update(flatten_dict(v, key))
        else:
            out[key] = v
    return out


def unflatten_dict(d: Mapping[Tuple[Any, ...], Any]) -> Dict[Any, Any]:
    """Inverse of :func:`flatten_dict`."""
    out: Dict[Any, Any] = {}
    for key, value in d.items():
        cur = out
        for part in key[:-1]:
            cur = cur.setdefault(part, {})
        cur[key[-1]] = value
    return out


def invert_nested_keys(d: Mapping[Any, Any]) -> Dict[Any, Any]:
    """Invert the order of the keys in a nested dict."""
    return unflatten_dict({k[::-1]: v for k, v in flatten_dict(d).items()})


def get_key_value_pairs(d: Mapping[Any, Any]) -> List[Tuple[Any, Any]]:
    """Get the key-value pairs of a dict as a list of tuples.

    If the value is a non-string sequence, a pair is produced for each
    item in the sequence. Output order is deterministic (input order).
    """
    pairs = [
        itertools.product(list_convert(k), list_convert(v))
        for k, v in d.items()
    ]
    return list(itertools.chain.from_iterable(pairs))


def fill_tuples(
    tuples: Sequence[Any],
    length: Optional[int] = None,
    repeat: bool = False,
    fill_method: str = 'bfill',
) -> Sequence[Tuple[Any, ...]]:
    """Fill tuples so they are all the same length.

    Parameters
    ----------
    length : int, optional
        Fill tuples to a fixed length. If None, fills to the max length
        of the non-string sequences in ``tuples``; if there are none,
        the input is returned unchanged.
    repeat : bool, default False
        If True, fill with the edge value instead of None.
    fill_method : {'bfill', 'ffill'}
        'bfill' pads at the front, 'ffill' pads at the end.
    """
    if not length:
        if not any(is_non_string_sequence(t) for t in tuples):
            return tuples
        length = max(len(t) for t in tuples if is_non_string_sequence(t))

    new_tups = []
    for tup in tuples:
        tup = tuple_convert(tup)
        while len(tup) < length:
            if fill_method == 'bfill':
                tup = (tup[0] if repeat else None,) + tup
            else:
                tup = tup + (tup[-1] if repeat else None,)
        new_tups.append(tup)
    return new_tups


def fill_tuple_keys(
    d: Mapping[Any, Any],
    length: Optional[int] = None,
    repeat: bool = False,
    fill_method: str = 'bfill',
) -> Dict[Tuple[Any, ...], Any]:
    """:func:`fill_tuples` applied to the keys of a dict."""
    filled_keys = fill_tuples(list(d.keys()), length, repeat, fill_method)
    return dict(zip(filled_keys, d.values()))


def is_non_string_sequence(obj: Any) -> bool:
    """Return True if obj is a non-string sequence (list/tuple/...)."""
    return isinstance(obj, abc.Sequence) and not isinstance(obj, str)


def tuple_convert(obj: Any) -> Tuple[Any, ...]:
    """Wrap scalars/strings in a 1-tuple; convert other sequences."""
    return tuple(obj) if is_non_string_sequence(obj) else (obj,)


def list_convert(obj: Any) -> List[Any]:
    """Wrap scalars/strings in a 1-list; convert other sequences."""
    return list(obj) if is_non_string_sequence(obj) else [obj]
