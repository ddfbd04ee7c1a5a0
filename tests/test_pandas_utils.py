"""Tests for driver-side pandas helpers (reference pandas.py parity)."""
import pandas as pd
import pytest

from ons_utils_spark.pandas_utils import (
    MultiIndexSlicer,
    Stacker,
    convert_level_to_datetime,
    get_index_level_values,
    nested_dict_to_df,
    shifted_within_year_apply,
    shifted_within_year_ffill,
)


class TestNestedDictToDf:
    def test_reference_fixture(self):
        # FIXTURES.md §1.10 (reference tests/test_pandas.py:10-42)
        d = {
            'bones': {'femur': {'tendons': 24},
                      'humerus': {'tendons': 14}},
            'muscles': {'gluteus_maximus': {'tendons': 18}},
            'cars': 7,
        }
        df = nested_dict_to_df(
            d, columns=['number'], level_names=['a', 'b', 'c']
        )
        assert df.loc[('bones', 'femur', 'tendons'), 'number'] == 24
        assert df.loc[('muscles', 'gluteus_maximus', 'tendons'),
                      'number'] == 18
        # ragged key 'cars' is end-padded with None (NaN in the index)
        cars_rows = df[df.index.get_level_values('a') == 'cars']
        assert len(cars_rows) == 1
        assert cars_rows['number'].iloc[0] == 7
        assert pd.isna(cars_rows.index[0][1])
        assert df.index.names == ['a', 'b', 'c']


class TestStacker:
    def test_roundtrip_preserves_columns(self):
        df = pd.DataFrame({
            'retailer': ['r1', 'r1', 'r2', 'r2'],
            'product': ['p1', 'p2', 'p1', 'p2'],
            'price': [1.0, 2.0, 3.0, 4.0],
        })
        stacker = Stacker(value_cols=['price'], index_cols=['product'])
        wide = stacker.unstack(df)
        assert wide.shape == (2, 2)
        back = stacker.stack(wide)
        pd.testing.assert_frame_equal(
            back.sort_values(['retailer', 'product'])
            .reset_index(drop=True),
            df,
        )

    def test_transpose_roundtrip(self):
        df = pd.DataFrame({
            'retailer': ['r1', 'r1', 'r2', 'r2'],
            'product': ['p1', 'p2', 'p1', 'p2'],
            'price': [1.0, 2.0, 3.0, 4.0],
        })
        stacker = Stacker(
            value_cols=['price'], index_cols=['product'], transpose=True
        )
        wide = stacker.unstack(df)
        back = stacker.stack(wide)
        assert list(back.columns) == ['retailer', 'product', 'price']
        assert len(back) == 4

    def test_stack_before_unstack_raises(self):
        with pytest.raises(ValueError):
            Stacker(['v'], ['i']).stack(pd.DataFrame())


class TestMultiIndexHelpers:
    @pytest.fixture
    def midf(self):
        idx = pd.MultiIndex.from_product(
            [['r1', 'r2'], ['2020-01-01', '2020-02-01']],
            names=['retailer', 'month'],
        )
        return pd.DataFrame({'v': [1, 2, 3, 4]}, index=idx)

    def test_convert_level_to_datetime(self, midf):
        out = convert_level_to_datetime(midf, 'month')
        assert isinstance(
            out.index.levels[1], pd.DatetimeIndex
        )

    def test_slicer(self, midf):
        slicer = MultiIndexSlicer(midf, levels=['retailer'])
        sl = slicer.get_slicer('r1')
        assert sl == ('r1', slice(None))
        assert len(midf.loc[sl, :]) == 2

    def test_slicer_arity_raises(self, midf):
        slicer = MultiIndexSlicer(midf, levels=['retailer'])
        with pytest.raises(ValueError):
            slicer.get_slicer('r1', 'extra')

    def test_get_index_level_values(self, midf):
        vals = get_index_level_values(midf, ['retailer'])
        assert vals == [('r1',), ('r2',)]


class TestShiftedWithinYear:
    def test_ffill_respects_fiscal_year(self):
        # Feb->Jan+1 fiscal year: January belongs to the PREVIOUS
        # year's group (the shift(-1)/shift(1) trick regroups value_i
        # under label_{i-1}'s year; the first value falls off the
        # edge — reference semantics, pandas.py:121-133).
        idx = pd.DatetimeIndex([
            '2020-11-01', '2020-12-01', '2021-01-01', '2021-02-01',
            '2021-03-01',
        ])
        df = pd.DataFrame({'v': [None, 2.0, None, None, 5.0]}, index=idx)
        out = shifted_within_year_ffill(df)
        # Dec 2020 value ffills across the calendar boundary into Jan…
        assert out.loc['2020-12-01', 'v'] == 2.0
        assert out.loc['2021-01-01', 'v'] == 2.0
        # …but not into February (new fiscal year).
        assert pd.isna(out.loc['2021-02-01', 'v'])
        assert out.loc['2021-03-01', 'v'] == 5.0

    def test_apply_axis1(self):
        df = pd.DataFrame(
            [[9.0, 2.0, None]],
            columns=pd.DatetimeIndex(
                ['2020-11-01', '2020-12-01', '2021-01-01']
            ),
        )
        out = shifted_within_year_apply(df, lambda x: x.ffill(), axis=1)
        # Dec value ffills into January (same fiscal year).
        assert out.iloc[0, 2] == 2.0
