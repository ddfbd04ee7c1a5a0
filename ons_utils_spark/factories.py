"""Decorator factories.

Parity target: ``ons_utils/factories.py`` (reference
``args_kwargs_transformer_factory``, factories.py:16-135). Fixes the
reference's latent bug where ``_transform_kwargs`` tested
``kwargs is not None`` instead of the individual value
(factories.py:132), causing None keyword values to be transformed.
"""
from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Mapping, Optional, Sequence, Union

from .generic import list_convert


def args_kwargs_transformer_factory(
    transform_func: Callable[[Any], Any],
) -> Callable:
    """Return a decorator that transforms function arguments.

    The returned decorator may be used bare (``@deco``) or with
    ``include=``/``exclude=`` parameter-name filters
    (``@deco(include='col')``). Arguments whose value is None are never
    transformed.
    """
    def transformer_decorator(
        _func=None,
        *,
        include: Optional[Union[str, Sequence[str]]] = None,
        exclude: Optional[Union[str, Sequence[str]]] = None,
    ) -> Callable:
        if include and exclude:
            raise ValueError(
                'only one of include or exclude parameters can be specified'
                ' but both have been specified'
            )
        if include:
            selected = set(list_convert(include))
            conditional = lambda name: name in selected  # noqa: E731
        elif exclude:
            excluded = set(list_convert(exclude))
            conditional = lambda name: name not in excluded  # noqa: E731
        else:
            conditional = lambda _: True  # noqa: E731

        def caller(func: Callable) -> Callable:
            varnames = inspect.getfullargspec(func).args

            @functools.wraps(func)
            def wrapper(*args, **kwargs):
                new_args = [
                    transform_func(arg)
                    if i < len(varnames)
                    and conditional(varnames[i])
                    and arg is not None
                    else arg
                    for i, arg in enumerate(args)
                ]
                new_kwargs = {
                    k: transform_func(v)
                    if conditional(k) and v is not None
                    else v
                    for k, v in kwargs.items()
                }
                return func(*new_args, **new_kwargs)

            return wrapper

        return caller if _func is None else caller(_func)

    return transformer_decorator


def _transform_args(
    args: Sequence[Any],
    varnames: Sequence[str],
    transform_func: Callable[[Any], Any],
    conditional: Callable[[str], bool] = lambda _: True,
) -> Sequence[Any]:
    """Transform positional args whose parameter name passes the filter."""
    return [
        transform_func(arg)
        if i < len(varnames) and conditional(varnames[i]) and arg is not None
        else arg
        for i, arg in enumerate(args)
    ]


def _transform_kwargs(
    kwargs: Mapping[str, Any],
    transform_func: Callable[[Any], Any],
    conditional: Callable[[str], bool] = lambda _: True,
) -> Mapping[str, Any]:
    """Transform kwargs whose name passes the filter (None never transformed)."""
    return {
        k: transform_func(v) if conditional(k) and v is not None else v
        for k, v in kwargs.items()
    }
