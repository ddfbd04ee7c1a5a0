"""WARC source: round trips (plain + gzip), framing strictness,
deterministic identity, and the file==partition/file==task contract."""
import glob
import os

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.warc import (
    _parse_warc_stream,
    read_warc,
    write_warc,
)


@pytest.fixture
def pages(spark_session):
    rows = [(f'https://s{i % 3}.com/doc{i}',
             f'payload text {i} ' + 'x' * (i % 7)) for i in range(40)]
    return spark_session.createDataFrame(
        rows, 'target_uri string, payload string')


def _roundtrip(spark, pages, path, **kw):
    manifest = write_warc(
        pages.repartitionByRange(3, 'target_uri'), path, **kw).collect()
    back = read_warc(spark, path)
    return manifest, back


class TestWarcRoundTrip:
    def test_plain(self, spark_session, pages, tmp_path):
        manifest, back = _roundtrip(
            spark_session, pages, str(tmp_path / 'w'))
        assert sum(m['n_records'] for m in manifest) == 40
        assert len(manifest) == 3
        got = {r['target_uri']: r for r in back.collect()}
        want = {r['target_uri']: r['payload'] for r in pages.collect()}
        assert got.keys() == want.keys()
        for uri, row in got.items():
            assert bytes(row['payload']).decode() == want[uri]
            assert row['content_length'] == len(want[uri].encode())
            assert row['warc_type'] == 'response'
            assert row['record_id'].startswith('urn:md5:')

    def test_gzip(self, spark_session, pages, tmp_path):
        path = str(tmp_path / 'wgz')
        manifest, back = _roundtrip(
            spark_session, pages, path, compress=True)
        assert glob.glob(os.path.join(path, '*.warc.gz'))
        assert back.count() == 40
        one = back.where(
            F.col('target_uri') == 'https://s1.com/doc1').first()
        assert bytes(one['payload']).decode().startswith(
            'payload text 1')

    def test_leftover_tmp_is_invisible_to_reader(
            self, spark_session, pages, tmp_path):
        """A losing/failed attempt's tmp file must never be ingested:
        tmps are dot-prefixed (skipped by Spark's file listing and
        unmatched by the '*.warc*' glob), and the winning attempt
        sweeps siblings for its partition."""
        path = str(tmp_path / 'w')
        write_warc(
            pages.repartitionByRange(2, 'target_uri'), path).collect()
        # plant a partial archive as a zombie attempt's tmp AND a
        # stale tmp for a partition that never committed
        junk = b'WARC/1.0\r\nWARC-Type: response\r\n'  # truncated
        for name in ('.part-00000.warc.77.tmp',
                     '.part-00099.warc.12.tmp'):
            with open(os.path.join(path, name), 'wb') as fh:
                fh.write(junk)
        assert read_warc(spark_session, path).count() == 40

    def test_winner_sweeps_losing_tmps(self, spark_session, pages,
                                       tmp_path):
        path = str(tmp_path / 'w')
        os.makedirs(path)
        # pre-plant a losing attempt's tmp for partition 0; the real
        # write must remove it after its own rename
        stale = os.path.join(path, '.part-00000.warc.999.tmp')
        open(stale, 'wb').write(b'partial')
        write_warc(
            pages.repartitionByRange(2, 'target_uri'), path).collect()
        assert not os.path.exists(stale)
        assert not glob.glob(os.path.join(path, '.*.tmp'))

    def test_rewrite_is_byte_stable(self, spark_session, pages,
                                    tmp_path):
        """Deterministic record ids + atomic rename: writing the
        same partitioning twice yields identical archives."""
        p1, p2 = str(tmp_path / 'a'), str(tmp_path / 'b')
        part = pages.repartitionByRange(2, 'target_uri')
        write_warc(part, p1).collect()
        write_warc(part, p2).collect()
        for f1 in sorted(glob.glob(os.path.join(p1, '*.warc'))):
            f2 = os.path.join(p2, os.path.basename(f1))
            assert open(f1, 'rb').read() == open(f2, 'rb').read()

    def test_binary_payload(self, spark_session, tmp_path):
        df = spark_session.createDataFrame(
            [('u://1', bytearray(b'\x00\xff\r\n\r\nbytes'))],
            'target_uri string, payload binary')
        write_warc(df, str(tmp_path / 'bin')).collect()
        back = read_warc(spark_session, str(tmp_path / 'bin')).first()
        # Content-Length framing carries payloads containing the
        # record separator itself
        assert bytes(back['payload']) == b'\x00\xff\r\n\r\nbytes'


class TestWarcParser:
    def test_missing_content_length_raises(self):
        buf = b'WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n'
        with pytest.raises(ValueError, match='Content-Length'):
            list(_parse_warc_stream(buf, 'f'))

    def test_truncated_payload_raises(self):
        buf = (b'WARC/1.0\r\nContent-Length: 100\r\n\r\nshort')
        with pytest.raises(ValueError, match='declares'):
            list(_parse_warc_stream(buf, 'f'))

    def test_non_warc_header_raises(self):
        buf = b'HTTP/1.1 200 OK\r\n\r\n'
        with pytest.raises(ValueError, match='expected WARC'):
            list(_parse_warc_stream(buf, 'f'))

    def test_padding_tolerance(self):
        rec = (b'WARC/1.0\r\nContent-Length: 3\r\n'
               b'WARC-Target-URI: u\r\n\r\nabc\r\n\r\n')
        out = list(_parse_warc_stream(rec + b'\r\n\r\n' + rec, 'f'))
        assert len(out) == 2
        assert all(r[5] == b'abc' for r in out)
