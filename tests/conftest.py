"""Shared fixtures: Spark session, frame constructors, Case parametrization.

Modeled on the reference test harness (tests/conftest.py:28-201) —
session-scoped local session, tuple-data constructors, and the
``Case``/``parametrize_cases`` labeled-parametrization pattern.
"""
from __future__ import annotations

import logging
from typing import Any, Mapping, Optional

import pandas as pd
import pytest
from pyspark.sql import SparkSession


def suppress_py4j_logging() -> None:
    logging.getLogger('py4j').setLevel(logging.WARN)


@pytest.fixture(scope='session')
def spark_session():
    """Session-scoped local Spark session sized for unit tests."""
    suppress_py4j_logging()
    spark = (
        SparkSession.builder
        .master('local[4]')
        .appName('ons-utils-spark-tests')
        .config('spark.sql.shuffle.partitions', '4')
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.ui.enabled', 'false')
        .config('spark.ui.showConsoleProgress', 'false')
        .config('spark.sql.warehouse.dir',
                '/tmp/ons-utils-spark-test-warehouse')
        .getOrCreate()
    )
    yield spark


@pytest.fixture
def create_spark_df(spark_session):
    """Create a Spark DataFrame from tuple data; first row is the DDL
    schema string (or column list)."""
    def _(data):
        return spark_session.createDataFrame(list(data[1:]), schema=data[0])
    return _


@pytest.fixture
def to_spark(spark_session):
    """Convert a pandas DataFrame to Spark."""
    def _(df: pd.DataFrame, *args, **kwargs):
        return spark_session.createDataFrame(df, *args, **kwargs)
    return _


class Case:
    """A labeled test case carrying kwargs for parametrized tests."""

    def __init__(self, label: Optional[str] = None, **kwargs: Any):
        self.label = label
        self.kwargs = kwargs

    def __repr__(self) -> str:  # pragma: no cover
        return f'Case({self.label!r}, **{self.kwargs!r})'


def parametrize_cases(*cases: Case):
    """Parametrize a test with :class:`Case` objects.

    All cases must use the same kwarg names (missing keys default to
    None). The test function receives each kwarg as a parameter.
    """
    all_keys: list[str] = []
    for case in cases:
        for k in case.kwargs:
            if k not in all_keys:
                all_keys.append(k)
    argvalues = [
        pytest.param(
            *[case.kwargs.get(k) for k in all_keys],
            id=case.label or f'case{i}',
        )
        for i, case in enumerate(cases)
    ]
    return pytest.mark.parametrize(','.join(all_keys), argvalues)
