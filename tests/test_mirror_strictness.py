"""The local mirror must be as type-strict as the driver canon.

Round-5 postmortem: ``q_char_shingles`` was driver-red for two rounds
because its oracle's ``sum(n_shingles)`` returned DuckDB HUGEINT while
Spark returned BIGINT — values equal, storage kind different.  The
mirror compared values loosely and stayed green, so "mirror-green"
stopped predicting "driver-green".  These tests pin the strict
behavior: an uncast integer ``sum()`` oracle must FAIL the mirror.
"""
from types import SimpleNamespace

import duckdb
import pytest

from tools.check_correctness import _duck_kind, _spark_kind, type_mismatches


class TestKindMaps:
    def test_hugeint_is_never_int(self):
        assert _duck_kind('HUGEINT') == 'int128'
        assert _duck_kind('UHUGEINT') == 'int128'
        assert _duck_kind('UBIGINT') == 'int128'

    @pytest.mark.parametrize('duck, spark', [
        ('BIGINT', 'bigint'),
        ('INTEGER', 'int'),
        ('DOUBLE', 'double'),
        ('DECIMAL(18,4)', 'decimal(18,4)'),
        ('VARCHAR', 'string'),
        ('DATE', 'date'),
        ('TIMESTAMP WITH TIME ZONE', 'timestamp'),
        ('BOOLEAN', 'boolean'),
    ])
    def test_compatible_kinds_agree(self, duck, spark):
        assert _duck_kind(duck) == _spark_kind(spark)


def _fake_sdf(dtypes):
    return SimpleNamespace(dtypes=dtypes)


class TestUncastSumIsFlagged:
    """End-to-end on a real DuckDB relation, no Spark needed."""

    def test_uncast_integer_sum_mismatches_bigint(self):
        con = duckdb.connect()
        rel = con.sql('SELECT sum(x) AS total FROM (VALUES (1), (2)) t(x)')
        rel.fetchall()
        bad = type_mismatches(_fake_sdf([('total', 'bigint')]), rel)
        assert bad == [('total', 'int', 'int128')]

    def test_cast_integer_sum_matches_bigint(self):
        con = duckdb.connect()
        rel = con.sql(
            'SELECT CAST(sum(x) AS BIGINT) AS total'
            ' FROM (VALUES (1), (2)) t(x)'
        )
        rel.fetchall()
        assert type_mismatches(_fake_sdf([('total', 'bigint')]), rel) == []

    def test_count_star_is_bigint_already(self):
        con = duckdb.connect()
        rel = con.sql('SELECT count(*) AS n FROM (VALUES (1), (2)) t(x)')
        rel.fetchall()
        assert type_mismatches(_fake_sdf([('n', 'bigint')]), rel) == []

    def test_double_vs_bigint_is_flagged(self):
        con = duckdb.connect()
        rel = con.sql('SELECT 1.5::DOUBLE AS v')
        rel.fetchall()
        bad = type_mismatches(_fake_sdf([('v', 'bigint')]), rel)
        assert bad == [('v', 'int', 'float')]
