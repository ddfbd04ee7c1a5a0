"""WARC source: read (and write) Web ARChive record files.

Extension (no reference counterpart) — the on-disk front door of a
CommonCrawl-style corpus: crawl deliveries arrive as directories of
``.warc`` / ``.warc.gz`` files, each a concatenation of records
(``WARC/1.0`` header block, ``\\r\\n\\r\\n``, ``Content-Length``
bytes of payload, ``\\r\\n\\r\\n``).  This module turns them into a
DataFrame without any driver-side I/O.

Scale shape: ``spark.read.format('binaryFile')`` never splits a
file, so each WARC maps to exactly ONE task — the standard access
pattern for CommonCrawl processing (archives are written ~1 GiB
precisely so that file == work unit).  Parsing runs inside
``mapInPandas`` (Arrow-batched, one pass over the bytes, no Python
per-row loop beyond the record scan itself); nothing shuffles until
the caller aggregates.  Per-record gzip members (the ``.warc.gz``
convention) decompress transparently: Python's gzip handles
concatenated members in one stream.

The writer is the fixture/export-grade inverse: one ``.warc`` file
per partition written executor-side (atomic tmp+rename, so task
retries are idempotent), returning a manifest DataFrame instead of
mutating driver state.  Columnar formats remain the right long-term
storage — the writer exists to round-trip test the reader and to
hand corpora back to WARC-consuming tools.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ['read_warc', 'write_warc', 'WARC_READ_SCHEMA']

WARC_READ_SCHEMA = (
    'file string, warc_type string, record_id string, '
    'warc_date string, target_uri string, content_length long, '
    'payload binary'
)

_FIXED_DATE = '2026-01-01T00:00:00Z'


def _parse_warc_stream(buf: bytes, fname: str):
    """Yield record tuples from one WARC byte stream.

    Tolerates trailing garbage shorter than a header block and any
    run of CRLFs between records; raises on a record whose header
    block lacks ``Content-Length`` (the stream is unwalkable past
    that point — better loud than silently truncated).
    """
    i, n = 0, len(buf)
    while i < n:
        # skip inter-record CRLF padding
        while buf[i:i + 2] == b'\r\n':
            i += 2
        if i >= n:
            break
        j = buf.find(b'\r\n\r\n', i)
        if j < 0:
            break  # trailing partial header — end of stream
        head = buf[i:j].decode('utf-8', 'replace')
        lines = head.split('\r\n')
        if not lines[0].startswith('WARC/'):
            raise ValueError(
                f'{fname}: expected WARC/x.y header at offset {i}, '
                f'got {lines[0][:40]!r}')
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(':')
            hdrs[k.strip().lower()] = v.strip()
        if 'content-length' not in hdrs:
            raise ValueError(
                f'{fname}: record at offset {i} has no '
                'Content-Length — cannot walk the stream')
        clen = int(hdrs['content-length'])
        payload = buf[j + 4:j + 4 + clen]
        if len(payload) != clen:
            raise ValueError(
                f'{fname}: record at offset {i} declares '
                f'{clen} payload bytes, stream has {len(payload)}')
        yield (
            hdrs.get('warc-type', ''),
            hdrs.get('warc-record-id', ''),
            hdrs.get('warc-date', ''),
            hdrs.get('warc-target-uri', ''),
            clen,
            payload,
        )
        i = j + 4 + clen


def read_warc(
    spark: SparkSession,
    path: str,
    max_file_bytes: Optional[int] = 8 * 1024 ** 3,
) -> SparkDF:
    """All WARC records under ``path`` as a DataFrame
    (:data:`WARC_READ_SCHEMA`).

    One task per archive file (binaryFile never splits — the
    CommonCrawl work unit); ``.gz`` files decompress in-task.

    ``binaryFile`` materializes each archive as ONE row, so a file
    far beyond the ~1 GiB CommonCrawl convention OOMs the task
    rather than running slow.  ``max_file_bytes`` (default 8 GiB,
    ``None`` to disable) fails LOUD up front instead: a
    metadata-only pre-scan — ``content`` pruned, so only the
    listing's ``length`` column is read, no payload bytes move —
    names the offending files.  Split oversized deliveries (e.g.
    ``split --bytes`` on record boundaries, or re-cut with
    :func:`write_warc`) before ingest.

    EAGER when ``max_file_bytes`` is set (the default): the
    pre-scan runs a driver-side metadata collect at
    DataFrame-CONSTRUCTION time — a deliberate fail-loud check, not
    a plan deferral bug.  Both the pre-scan and the content read
    share ONE loaded relation (one file listing).  Pass
    ``max_file_bytes=None`` for a fully lazy plan.
    """
    listing = (
        spark.read.format('binaryFile')
        .option('pathGlobFilter', '*.warc*')
        .load(path))
    if max_file_bytes is not None:
        bad = (
            listing
            .select('path', 'length')
            .where(F.col('length') > max_file_bytes)
            .limit(5)
            .collect())
        if bad:
            names = ', '.join(
                f'{r["path"]} ({r["length"]} B)' for r in bad)
            raise ValueError(
                f'WARC archive(s) exceed max_file_bytes='
                f'{max_file_bytes}: {names} — binaryFile loads each '
                'archive whole into one task; re-cut the archives '
                'or raise/disable max_file_bytes explicitly')
    files = listing.select('path', 'content')

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            out = []
            for fname, blob in zip(pdf['path'], pdf['content']):
                buf = bytes(blob)
                if fname.endswith('.gz'):
                    buf = gzip.decompress(buf)
                for rec in _parse_warc_stream(buf, fname):
                    out.append((fname,) + rec)
            yield pd.DataFrame(
                out, columns=['file', 'warc_type', 'record_id',
                              'warc_date', 'target_uri',
                              'content_length', 'payload'])

    return files.mapInPandas(parse, WARC_READ_SCHEMA)


def write_warc(
    df: SparkDF,
    path: str,
    uri_col: str = 'target_uri',
    payload_col: str = 'payload',
    warc_type: str = 'response',
    date: Optional[str] = None,
    compress: bool = False,
) -> SparkDF:
    """Write ``df`` as WARC files, one per partition, and RETURN the
    manifest ``(path, n_records, n_bytes)`` (an action-free plan —
    the files land when the caller runs the manifest).

    Record identity is deterministic (``urn:md5:`` of the URI and
    payload), so re-writes are byte-stable; each task writes to an
    attempt-unique tmp name and renames, so retries (and concurrent
    speculative attempts) are idempotent.  Payloads may be string
    (UTF-8 encoded) or binary.  Partition the input the way you
    want the archives cut (e.g. ``repartitionByRange`` on a sort
    key) — file == partition is the contract, mirroring how the
    reader schedules file == task.

    Header hygiene: CR/LF in a URI would inject header lines (or
    corrupt the record framing so the reader rejects the whole
    archive), so URIs are sanitized per record — ``\\r`` and
    ``\\n`` stripped — BEFORE the record id is computed (the id
    commits to what is actually written).  The driver-supplied
    ``warc_type`` / ``date`` are rejected outright if they contain
    CR/LF.
    """
    import hashlib

    when = date or _FIXED_DATE
    for name, val in (('warc_type', warc_type), ('date', when)):
        if '\r' in val or '\n' in val:
            raise ValueError(
                f'{name} must not contain CR/LF (header injection): '
                f'{val!r}')
    cols = df.select(
        F.col(uri_col).cast('string').alias('__uri'),
        F.col(payload_col).cast('binary').alias('__payload'))

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        from pyspark import TaskContext

        import glob as _glob

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        ext = '.warc.gz' if compress else '.warc'
        fname = f'part-{pid:05d}{ext}'
        final = os.path.join(path, fname)
        # attempt-unique tmp: two concurrent attempts (speculation,
        # retry racing a zombie) must never interleave into one
        # file.  DOT-prefixed so a leftover from a failed/losing
        # attempt can never be ingested: Spark's file listing skips
        # '.'/'_'-prefixed names, and read_warc's '*.warc*' glob
        # cannot match a name that does not start with 'part-'.
        tmp = os.path.join(
            path, f'.{fname}.{ctx.taskAttemptId()}.tmp')
        os.makedirs(path, exist_ok=True)
        n_records = n_bytes = 0
        opener = gzip.open if compress else open
        with opener(tmp, 'wb') as fh:
            for pdf in batches:
                for uri, payload in zip(pdf['__uri'],
                                        pdf['__payload']):
                    body = bytes(payload) if payload is not None \
                        else b''
                    uri = (uri or '').replace('\r', '').replace(
                        '\n', '')
                    rid = hashlib.md5(
                        uri.encode() + b'\x00' + body).hexdigest()
                    head = (
                        f'WARC/1.0\r\n'
                        f'WARC-Type: {warc_type}\r\n'
                        f'WARC-Record-ID: urn:md5:{rid}\r\n'
                        f'WARC-Date: {when}\r\n'
                        f'WARC-Target-URI: {uri}\r\n'
                        f'Content-Length: {len(body)}\r\n'
                        f'\r\n').encode()
                    fh.write(head)
                    fh.write(body)
                    fh.write(b'\r\n\r\n')
                    n_records += 1
                    n_bytes += len(head) + len(body) + 4
        os.replace(tmp, final)
        # best-effort sweep of losing-attempt tmps for this
        # partition (speculative/zombie attempts that lost the
        # rename race) — harmless if another attempt races the
        # unlink, since tmps are invisible to readers anyway
        for stale in _glob.glob(
                os.path.join(path, f'.{fname}.*.tmp')):
            try:
                os.remove(stale)
            except OSError:
                pass
        yield pd.DataFrame([(final, n_records, n_bytes)],
                           columns=['path', 'n_records', 'n_bytes'])

    return cols.mapInPandas(
        dump, 'path string, n_records long, n_bytes long')
