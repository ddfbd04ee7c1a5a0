"""The conftest conveniences are themselves part of the surface
(SURVEY §2 #54-55; reference tests/conftest.py:61-201) — self-host
them."""
from __future__ import annotations

import warnings

import pandas as pd


def test_spark_column_wraps_rows(spark_session, spark_column):
    df = spark_session.createDataFrame(
        spark_column([1.0, None, 2.5]), 'v double')
    assert df.count() == 3


def test_all_in_output(all_in_output):
    assert all_in_output([1, 2], [1, 2, 3])
    assert not all_in_output([1, 4], [1, 2, 3])


def test_make_path_like_round_trips(make_path_like, tmp_path):
    p = make_path_like(str(tmp_path / 'x.csv'))
    pd.DataFrame({'a': [1]}).to_csv(p, index=False)
    assert pd.read_csv(p)['a'].tolist() == [1]


def test_filename_fixtures(filename_to_pandas, filename_to_spark,
                           tmp_path):
    pd.DataFrame({'a': [1, 2]}).to_csv(tmp_path / 'd.csv', index=False)
    assert filename_to_pandas('d.csv', str(tmp_path))['a'].sum() == 3
    assert filename_to_spark('d.csv', str(tmp_path)).count() == 2


def test_suppress_warnings_scoped(suppress_warnings):
    warnings.warn('invisible', RuntimeWarning)


def test_suppress_warnings_does_not_leak():
    import pytest
    with pytest.warns(RuntimeWarning):
        warnings.warn('visible again', RuntimeWarning)
