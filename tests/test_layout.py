"""Tests for sources.layout (Z-order / Morton clustering)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.layout import z_value, zorder_repartition


def _morton2(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark_session):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5),
            (65535, 65535), (12345, 54321)]
    df = spark_session.createDataFrame(rows, 'a long, b long')
    got = [r['z'] for r in
           df.select(z_value(['a', 'b']).alias('z')).collect()]
    assert got == [_morton2(a, b) for a, b in rows]


def test_z_value_unit_square_order(spark_session):
    # the first 2x2 cell enumerates as the classic Z: 0,1,2,3
    df = spark_session.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], 'a long, b long')
    got = [r['z'] for r in
           df.select(z_value(['a', 'b'], bits=1).alias('z')).collect()]
    assert got == [0, 1, 2, 3]


def test_z_value_three_columns(spark_session):
    df = spark_session.createDataFrame([(1, 1, 1)],
                                       'a long, b long, c long')
    z = df.select(z_value(['a', 'b', 'c'], bits=2).alias('z')) \
        .collect()[0]['z']
    assert z == 0b111  # bit 0 of each column interleaved


def test_z_value_validation(spark_session):
    with pytest.raises(ValueError, match='at least 2'):
        z_value(['a'])
    with pytest.raises(ValueError, match='62'):
        z_value(['a', 'b', 'c'], bits=21)


def test_zorder_repartition_sorted_within_partitions(spark_session):
    df = spark_session.range(0, 1024).select(
        (F.col('id') % 32).alias('x'),
        (F.col('id') / 32).cast('long').alias('y'))
    out = zorder_repartition(df, ['x', 'y'], bits=5,
                             num_partitions=4, keep_zvalue=True)
    parts = out.select(
        F.spark_partition_id().alias('p'), '__zvalue').collect()
    by_part: dict = {}
    for r in parts:
        by_part.setdefault(r['p'], []).append(r['__zvalue'])
    assert len(by_part) <= 4
    for zs in by_part.values():
        assert zs == sorted(zs)
    # range partitioning: partitions cover disjoint z ranges
    spans = sorted((min(z), max(z)) for z in by_part.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_z_value_round_trips(spark_session):
    """Interleave is a bijection below 2^bits per column: decoding
    the z-value recovers the exact inputs."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.randrange(65536), rnd.randrange(65536))
            for _ in range(200)]
    df = spark_session.createDataFrame(rows, 'a long, b long')
    got = df.select('a', 'b', z_value(['a', 'b']).alias('z')).collect()
    for r in got:
        a = b = 0
        for i in range(16):
            a |= ((r['z'] >> (2 * i)) & 1) << i
            b |= ((r['z'] >> (2 * i + 1)) & 1) << i
        assert (a, b) == (r['a'], r['b'])


def test_zorder_repartition_drops_zvalue_by_default(spark_session):
    df = spark_session.range(0, 10).select(
        F.col('id').alias('x'), F.col('id').alias('y'))
    out = zorder_repartition(df, ['x', 'y'], bits=4)
    assert out.columns == ['x', 'y']
    assert out.count() == 10
