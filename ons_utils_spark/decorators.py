"""Argument-transforming decorators.

Parity target: reference ``decorators.py:15-16`` — ``to_spark_col``
(lift string args to Columns) and ``to_list`` (wrap scalars in lists),
both instances of :func:`args_kwargs_transformer_factory`.
"""
from .factories import args_kwargs_transformer_factory
from .functions.columns import convert_to_spark_col
from .generic import list_convert

to_spark_col = args_kwargs_transformer_factory(convert_to_spark_col)
to_list = args_kwargs_transformer_factory(list_convert)
