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


def _xy2d(n, x, y):
    """Reference Hilbert index (Wikipedia xy2d), driver-side."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbert:
    def test_matches_reference_walk_full_grid(self, spark_session):
        import itertools

        from ons_utils_spark.sources.layout import with_hilbert_value

        pts = list(itertools.product(range(16), range(16)))
        df = spark_session.createDataFrame(pts, 'x long, y long')
        got = {(r['x'], r['y']): r['__hvalue']
               for r in with_hilbert_value(df, ['x', 'y'],
                                           bits=4).collect()}
        assert got == {(x, y): _xy2d(16, x, y) for x, y in pts}

    def test_bijective_at_16_bits(self, spark_session):
        import random

        from ons_utils_spark.sources.layout import with_hilbert_value

        rng = random.Random(11)
        pts = list({(rng.randrange(65536), rng.randrange(65536))
                    for _ in range(300)})
        df = spark_session.createDataFrame(pts, 'x long, y long')
        rows = with_hilbert_value(df, ['x', 'y'], bits=16).collect()
        assert all(r['__hvalue'] == _xy2d(65536, r['x'], r['y'])
                   for r in rows)
        # distinct points -> distinct curve positions
        assert len({r['__hvalue'] for r in rows}) == len(pts)

    def test_consecutive_positions_are_adjacent_cells(
            self, spark_session):
        """THE Hilbert property (and why it beats Morton): stepping
        along the curve always moves to a 4-neighbor cell."""
        import itertools

        pairs = sorted(
            (_xy2d(32, x, y), (x, y))
            for x, y in itertools.product(range(32), range(32)))
        assert all(
            abs(a[1][0] - b[1][0]) + abs(a[1][1] - b[1][1]) == 1
            for a, b in zip(pairs, pairs[1:]))

    def test_tighter_file_bounding_boxes_than_morton(self):
        """Scale evidence for the layout choice: split each curve
        into contiguous 'files' over the full 32x32 grid and compare
        the mean min-max bounding-box area — the statistic parquet
        pruning works off.  At power-of-4-aligned file counts both
        curves tile quadrants identically; real file sizing never
        aligns, and at unaligned counts a Morton file straddles the
        curve's long power-of-two jumps while a Hilbert file stays a
        compact region — so Hilbert must be strictly tighter there
        and never worse at aligned counts."""
        import itertools

        def interleave(x, y, bits=5):
            z = 0
            for i in range(bits):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        def mean_box_area(key, nfiles):
            order = sorted(
                itertools.product(range(32), range(32)),
                key=lambda p: key(p[0], p[1]))
            chunk = len(order) // nfiles
            areas = []
            for f in range(nfiles):
                pts = order[f * chunk:(f + 1) * chunk]
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                areas.append((max(xs) - min(xs) + 1)
                             * (max(ys) - min(ys) + 1))
            return sum(areas) / len(areas)

        for nfiles in (11, 24):  # unaligned: the common case
            hil = mean_box_area(lambda x, y: _xy2d(32, x, y), nfiles)
            mor = mean_box_area(interleave, nfiles)
            assert hil < 0.7 * mor, (nfiles, hil, mor)
        for nfiles in (16, 64):  # aligned: both tile perfectly
            hil = mean_box_area(lambda x, y: _xy2d(32, x, y), nfiles)
            mor = mean_box_area(interleave, nfiles)
            assert hil <= mor, (nfiles, hil, mor)

    def test_hilbert_repartition_disjoint_ranges(
            self, spark_session, tmp_path):
        import itertools

        from ons_utils_spark.sources.layout import (
            file_stats, hilbert_repartition)

        pts = list(itertools.product(range(64), range(64)))
        df = spark_session.createDataFrame(pts, 'x long, y long')
        out = str(tmp_path / 'hil')
        hilbert_repartition(
            df, ['x', 'y'], bits=6, num_partitions=4,
            keep_hvalue=True,
        ).write.parquet(out)
        stats = [s for s in file_stats(out, '__hvalue') if s[1] > 0]
        assert len(stats) == 4
        spans = sorted((lo, hi) for _, _, lo, hi in stats)
        assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))

    def test_validation(self, spark_session):
        import pytest as _pytest

        from ons_utils_spark.sources.layout import with_hilbert_value

        df = spark_session.range(1).selectExpr(
            'id as x', 'id as y', 'id as z')
        with _pytest.raises(ValueError, match='2-D'):
            with_hilbert_value(df, ['x', 'y', 'z'])
        with _pytest.raises(ValueError, match='bits'):
            with_hilbert_value(df, ['x', 'y'], bits=40)


def test_hilbert_expr_matches_arrow(spark_session):
    """The codegen-expression path and the Arrow/numpy path must be
    bit-identical — the oracle replays the expr form, production
    uses arrow."""
    import random

    from ons_utils_spark.sources.layout import with_hilbert_value

    rng = random.Random(23)
    pts = [(rng.randrange(65536), rng.randrange(65536))
           for _ in range(500)]
    df = spark_session.createDataFrame(pts, 'x long, y long')
    arrow = {(r['x'], r['y']): r['__hvalue'] for r in
             with_hilbert_value(df, ['x', 'y'], bits=16,
                                method='arrow').collect()}
    expr = {(r['x'], r['y']): r['__hvalue'] for r in
            with_hilbert_value(df, ['x', 'y'], bits=16,
                               method='expr').collect()}
    assert arrow == expr


def test_hilbert_null_keys_propagate_on_both_paths(spark_session):
    """NULL in either key must yield NULL __hvalue on BOTH paths —
    a raw to_numpy(int64) cast on a nullable pandas column raises
    (or mangles NaN into INT64_MIN), so the arrow path masks nulls
    explicitly."""
    from ons_utils_spark.sources.layout import with_hilbert_value

    rows = [(1, 2), (None, 5), (7, None), (None, None), (3, 4)]
    df = spark_session.createDataFrame(rows, 'x long, y long')
    for method in ('arrow', 'expr'):
        got = {(r['x'], r['y']): r['__hvalue'] for r in
               with_hilbert_value(df, ['x', 'y'], bits=8,
                                  method=method).collect()}
        assert got[(None, 5)] is None, method
        assert got[(7, None)] is None, method
        assert got[(None, None)] is None, method
        assert got[(1, 2)] is not None and got[(3, 4)] is not None
    # and the two paths agree on the non-null rows
    a = with_hilbert_value(df, ['x', 'y'], bits=8,
                           method='arrow').collect()
    e = with_hilbert_value(df, ['x', 'y'], bits=8,
                           method='expr').collect()
    assert ({(r['x'], r['y'], r['__hvalue']) for r in a}
            == {(r['x'], r['y'], r['__hvalue']) for r in e})


def test_optimize_write_records_layout_sidecar(spark_session,
                                               tmp_path):
    from ons_utils_spark.sources.layout import optimize_write
    from ons_utils_spark.sources.shards import (
        TABLE_LAYOUT_SIDECAR, read_layout_sidecar)
    path = str(tmp_path / 'opt')
    df = spark_session.range(200).withColumn(
        'k', (F.col('id') * 37 % 100))
    optimize_write(df, path, 'k', num_files=3,
                   max_records_per_file=500)
    meta = read_layout_sidecar(
        spark_session, path, name=TABLE_LAYOUT_SIDECAR)
    assert meta == {'kind': 'optimize_write', 'sort_cols': ['k'],
                    'num_files': 3, 'max_records_per_file': 500}
    # the hidden sidecar must not disturb the data read
    assert spark_session.read.parquet(path).count() == 200
