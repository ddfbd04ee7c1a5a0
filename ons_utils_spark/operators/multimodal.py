"""Multimodal (image/audio/video) column plumbing.

North-star extension. Media payloads are opaque ``binary`` columns
with typed metadata (the Spark-idiomatic layout — same shape as
``spark.read.format('image')`` / Delta's media tables). All heavy
per-item work runs through ``mapInPandas`` with Arrow batches, so the
Spark-side contract (schema, batching, partition sizing) is real and
tested.

Decoders: PPM (P6/P5 binary, P3/P2 ASCII), uncompressed 24/32-bit
BMP, non-interlaced PNG (zlib inflate + all five scanline filters,
gray/RGB/palette/alpha at 8/16-bit depth), and RIFF/WAVE PCM audio
are decoded FOR REAL in pure Python/numpy (:func:`decode_ppm`,
:func:`decode_bmp`, :func:`decode_png`, :func:`decode_wav`) — image
features are an 8-bin luminance histogram of the actual pixels; audio
features are the 8-segment RMS energy envelope of the actual samples.
Formats that need codec libraries not present in this container
(JPEG/WebP → Pillow; MP3/AAC → ffmpeg/torchaudio) are STUBBED: they
raise ``NotImplementedError`` unless ``deterministic_fake=True``,
which produces seeded fake features so pipelines stay testable
end-to-end.
"""
from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    'media_id bigint, kind string, payload binary, mime string,'
    ' width int, height int, duration_ms int'
)

IMAGE_FEATURE_SCHEMA = (
    'media_id bigint, width int, height int, n_bytes int,'
    ' feature array<float>'
)

AUDIO_FEATURE_SCHEMA = (
    'media_id bigint, duration_ms int, n_bytes int, feature array<float>'
)


def _feature_schema(base_ddl: str, df: SparkDF, id_col: str):
    """Output schema for a feature extractor: the DDL constant with the
    ``media_id`` field re-typed from the input's ``id_col`` (bigint keys
    from a media table, string paths from a binaryFile scan). Built as a
    StructType — not text substitution — so a drift in the constant's
    spelling fails here, at the call site, not as an opaque Arrow type
    error downstream."""
    from pyspark.sql.types import StructField, StructType

    base = StructType.fromDDL(base_ddl)
    return StructType(
        [StructField(base.fields[0].name,
                     df.schema[id_col].dataType, True)]
        + list(base.fields)[1:]
    )


def decode_ppm(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """Decode a Netpbm image (P2/P3 ASCII, P5/P6 binary).

    Returns ``(width, height, gray)`` where ``gray`` is a float64
    ``(h, w)`` luminance array in [0, 1], or None if not Netpbm.
    Pure Python/numpy — no codec library needed.
    """
    if len(payload) < 2 or payload[0:1] != b'P' or payload[1:2] not in b'2356':
        return None
    magic = payload[:2].decode('ascii')
    # Header tokens (width, height, maxval) with '#' comments allowed.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= len(payload):
            raise ValueError('truncated netpbm header')
        if payload[pos:pos + 1] == b'#':
            while pos < len(payload) and payload[pos:pos + 1] != b'\n':
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError('bad netpbm dimensions')
    channels = 3 if magic in ('P3', 'P6') else 1
    n = w * h * channels
    if magic in ('P5', 'P6'):
        pos += 1  # single whitespace byte after maxval
        itemsize = 2 if maxval > 255 else 1
        raw = np.frombuffer(
            payload, dtype=f'>u{itemsize}', count=n, offset=pos
        ).astype(np.float64)
    else:
        raw = np.array(payload[pos:].split()[:n], dtype=np.float64)
        if raw.size != n:
            raise ValueError('truncated netpbm pixel data')
    pix = raw.reshape(h, w, channels) / float(maxval)
    if channels == 3:
        gray = (pix * np.array([0.299, 0.587, 0.114])).sum(axis=2)
    else:
        gray = pix[:, :, 0]
    return w, h, gray


def decode_bmp(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER).

    Returns ``(width, height, gray)`` luminance in [0, 1], or None if
    the payload is not BMP. Raises on compressed / paletted variants.
    """
    if len(payload) < 54 or payload[:2] != b'BM':
        return None
    data_offset, = struct.unpack_from('<I', payload, 10)
    header_size, = struct.unpack_from('<I', payload, 14)
    if header_size < 40:
        raise ValueError('BITMAPCOREHEADER BMPs not supported')
    w, h_signed = struct.unpack_from('<ii', payload, 18)
    bpp, = struct.unpack_from('<H', payload, 28)
    compression, = struct.unpack_from('<I', payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f'only uncompressed 24/32-bit BMP supported'
            f' (bpp={bpp}, compression={compression})'
        )
    h = abs(h_signed)
    bottom_up = h_signed > 0
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if bottom_up:
        rows = rows[::-1]
    # BMP stores BGR(A)
    b, g, r = (rows[:, :, i].astype(np.float64) for i in range(3))
    gray = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    return w, h, gray


def decode_png(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """Decode a non-interlaced 8/16-bit PNG (pure zlib + numpy).

    Color types: 0 (gray), 2 (RGB), 3 (8-bit palette), 4 (gray+alpha),
    6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns ``(width, height, gray)`` luminance in [0, 1], or None if
    the payload is not PNG. Raises on interlaced/sub-byte-depth
    variants. Chunk CRCs are verified.

    Filters Up and Sub reconstruct vectorized (row add / per-residue
    cumsum); Average and Paeth fall back to a per-pixel loop — fine
    for thumbnail-scale payloads, and the mapInPandas boundary keeps
    one task's batch bounded regardless.
    """
    if len(payload) < 8 or payload[:8] != b'\x89PNG\r\n\x1a\n':
        return None
    pos, idat, plte, ihdr = 8, [], None, None
    while pos + 12 <= len(payload):
        length, ctype = struct.unpack_from('>I4s', payload, pos)
        data = payload[pos + 8:pos + 8 + length]
        crc, = struct.unpack_from('>I', payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f'PNG chunk {ctype!r} CRC mismatch')
        pos += 12 + length
        if ctype == b'IHDR':
            ihdr = struct.unpack('>IIBBBBB', data)
        elif ctype == b'PLTE':
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b'IDAT':
            idat.append(data)
        elif ctype == b'IEND':
            break
    if ihdr is None or not idat:
        raise ValueError('PNG missing IHDR/IDAT')
    w, h, depth, ct, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError('only non-interlaced deflate PNGs supported')
    if ct not in (0, 2, 3, 4, 6):
        raise ValueError(f'unknown PNG color type {ct}')
    if depth not in (8, 16) or (ct == 3 and depth != 8):
        raise ValueError(f'unsupported PNG bit depth {depth} (type {ct})')
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    sb = depth // 8
    bpp = channels * sb
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b''.join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError('PNG pixel data size mismatch')
    raw = raw.reshape(h, stride + 1)
    ftype, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    recon = np.empty((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, line = int(ftype[y]), lines[y]
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-residue-class cumulative sum mod 256
            cur = line.copy()
            for r in range(bpp):
                cur[r::bpp] = np.cumsum(cur[r::bpp]) & 255
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (a + prev[x]) // 2) & 255
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 255
        else:
            raise ValueError(f'bad PNG filter {f} on row {y}')
        recon[y] = cur
        prev = cur
    pix8 = recon.astype(np.uint8)
    if sb == 2:  # 16-bit: recombine big-endian sample pairs
        samples = (
            pix8.reshape(h, w, channels, 2).astype(np.float64)
            @ np.array([256.0, 1.0])
        ) / 65535.0
    else:
        samples = pix8.reshape(h, w, channels) / 255.0
    if ct == 3:
        if plte is None:
            raise ValueError('palette PNG missing PLTE')
        idx = pix8.reshape(h, w)
        samples = plte[idx].astype(np.float64) / 255.0
        ct = 2
    if ct in (2, 6):
        rgb = samples[:, :, :3]
        gray = rgb @ np.array([0.299, 0.587, 0.114])
    else:  # 0 or 4: first channel is luminance
        gray = samples[:, :, 0]
    return w, h, gray


# ---------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): pure Python/numpy decode — no codec
# library in this container. Sequential DCT, Huffman, grayscale or
# YCbCr at 4:4:4 / 4:2:2 / 4:2:0, DRI/RSTn restart markers.
# Progressive (SOF2) and arithmetic coding raise with a clear error.
# ---------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# DCT-II basis: forward F = _DCT_M @ f @ _DCT_M.T, inverse
# f = _DCT_M.T @ F @ _DCT_M (orthonormal).
_DCT_M = np.array([
    [(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
     * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


class _HuffTable:
    """Canonical JPEG Huffman table from DHT counts + symbols."""

    def __init__(self, counts, symbols):
        self.lookup = {}
        code = 0
        it = iter(symbols)
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = next(it)
                code += 1
            code <<= 1

    def decode(self, br) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError('invalid JPEG Huffman code')


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f'unexpected marker 0xFF{nxt:02X} inside'
                        ' entropy data')
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF \
                and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.data[self.pos] != 0xFF or \
                not 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            raise ValueError('expected JPEG restart marker')
        self.pos += 2


def _decode_block(br, dc_tab, ac_tab, pred: int):
    """Huffman-decode one 8x8 block; returns (zigzag coeffs, new DC)."""
    coeffs = np.zeros(64, np.int32)
    s = dc_tab.decode(br)
    pred += br.receive_extend(s)
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError('JPEG AC run past end of block')
        coeffs[k] = br.receive_extend(size)
        k += 1
    return coeffs, pred


def decode_jpeg(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """Decode a baseline JPEG to ``(width, height, gray)`` luminance
    in [0, 1], or None if the payload is not JPEG.

    JPEG's Y channel IS BT.601 luminance, so the gray feature needs
    no chroma reconstruction: chroma blocks are entropy-decoded (the
    bitstream interleaves them per MCU, so they must be walked) but
    skip dequant + IDCT entirely — the decoder does ~1/2 the IDCT
    work of a full pixel decode at 4:2:0 and never upsamples.
    Supports grayscale and 3-component YCbCr at 4:4:4 / 4:2:2 /
    4:2:0, restart intervals, 8-bit precision. Progressive (SOF2)
    and arithmetic-coded (SOF9+) streams raise ``ValueError``.
    """
    if len(payload) < 4 or payload[:2] != b'\xff\xd8':
        return None
    qt: dict = {}
    huff: dict = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f'bad JPEG marker sync at {pos}')
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seglen, = struct.unpack_from('>H', payload, pos + 2)
        seg = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq:
                    qt[tq] = np.frombuffer(
                        seg, '>u2', 64, off).astype(np.int32)
                    off += 128
                else:
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, 64, off).astype(np.int32)
                    off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                counts = list(seg[off + 1:off + 17])
                n = sum(counts)
                symbols = list(seg[off + 17:off + 17 + n])
                huff[(tc, th)] = _HuffTable(counts, symbols)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline/ext sequential
            precision = seg[0]
            if precision != 8:
                raise ValueError(
                    f'only 8-bit JPEG supported, got {precision}')
            h, w = struct.unpack_from('>HH', seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({'id': cid, 'h': hv >> 4, 'v': hv & 0x0F,
                              'tq': tq})
            frame = {'h': h, 'w': w, 'comps': comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f'unsupported JPEG coding (SOF{marker - 0xC0}):'
                ' only baseline/extended sequential Huffman')
        elif marker == 0xDD:  # DRI
            restart_interval, = struct.unpack_from('>H', seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError('JPEG SOS before SOF')
            ns = seg[0]
            scan_tabs = {}
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i:3 + 2 * i]
                scan_tabs[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                payload, pos, frame, scan_tabs, qt, huff,
                restart_interval)
    raise ValueError('JPEG has no scan data')


def _decode_scan(payload, pos, frame, scan_tabs, qt, huff,
                 restart_interval):
    h, w, comps = frame['h'], frame['w'], frame['comps']
    h_max = max(c['h'] for c in comps)
    v_max = max(c['v'] for c in comps)
    mcus_x = -(-w // (8 * h_max))
    mcus_y = -(-h // (8 * v_max))
    y_comp = comps[0]  # first component is Y (or the only one)
    y_plane = np.zeros(
        (mcus_y * y_comp['v'] * 8, mcus_x * y_comp['h'] * 8))
    br = _BitReader(payload, pos)
    preds = {c['id']: 0 for c in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                br.restart()
                preds = {c['id']: 0 for c in comps}
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_tabs[c['id']]
                for by in range(c['v']):
                    for bx in range(c['h']):
                        zz, preds[c['id']] = _decode_block(
                            br, huff[(0, dc_t)], huff[(1, ac_t)],
                            preds[c['id']])
                        if ci != 0:
                            continue  # chroma: bitstream walk only
                        block = np.zeros(64)
                        block[_ZIGZAG] = zz * qt[c['tq']]
                        px = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M
                        r0 = (my * c['v'] + by) * 8
                        c0 = (mx * c['h'] + bx) * 8
                        y_plane[r0:r0 + 8, c0:c0 + 8] = px
            n_mcu += 1
    y_plane = np.clip(y_plane + 128.0, 0.0, 255.0)
    # crop to the component's true resolution, then to image size
    comp_h = -(-h * y_comp['v'] // v_max)
    comp_w = -(-w * y_comp['h'] // h_max)
    gray = y_plane[:comp_h, :comp_w] / 255.0
    if (comp_h, comp_w) != (h, w):  # Y subsampled (rare): upsample
        gray = resize_nearest(gray, h, w)
    return w, h, gray


def _huff_encode_tables():
    """One flat canonical table for the test-grade encoder: 255
    symbols, all 8-bit codes — every symbol's code is its own value.
    Valid per T.81 (the all-ones 8-bit code stays unused)."""
    counts = [0] * 16
    counts[7] = 255
    symbols = list(range(255))
    return counts, symbols


def encode_jpeg(
    img: np.ndarray,
    subsampling: str = '444',
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF encoder (test-fixture grade).

    ``img`` is ``(h, w)`` grayscale or ``(h, w, 3)`` RGB — floats in
    [0, 1], or any integer dtype in [0, 255] (normalized here; an
    un-normalized 0–255 float input would overflow the DC bit
    categories and produce an undecodable stream).
    Writes its own DQT (flat ``quant``) and DHT (flat 8-bit canonical
    table), so decoders exercise their real table-parsing path; with
    ``quant=1`` the round-trip error is DCT float rounding only.
    ``subsampling``: '444', '422', or '420' (3-component input only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises a decoder's restart path).
    """
    img = np.asarray(img)
    if img.dtype.kind in 'iu':
        img = img.astype(np.float64) / 255.0
    elif float(np.nanmax(img, initial=0.0)) > 1.0 + 1e-9:
        raise ValueError(
            'float image values must be in [0, 1] '
            '(got max {:.3f}); integer dtypes are normalized '
            'automatically'.format(float(np.nanmax(img))))
    if img.ndim == 2:
        planes = [np.asarray(img, np.float64) * 255.0]
        samps = [(1, 1)]
    else:
        rgb = np.asarray(img, np.float64) * 255.0
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        fac = {'444': (1, 1), '422': (2, 1), '420': (2, 2)}[subsampling]
        planes = [y,
                  cb[::fac[1], ::fac[0]],
                  cr[::fac[1], ::fac[0]]]
        samps = [fac, (1, 1), (1, 1)]
    h, w = (planes[0].shape[0], planes[0].shape[1])
    h_max = max(s[0] for s in samps)
    v_max = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * h_max))
    mcus_y = -(-h // (8 * v_max))

    qtab = np.full(64, quant, np.int32)
    counts, symbols = _huff_encode_tables()

    out = bytearray(b'\xff\xd8')  # SOI
    out += b'\xff\xdb' + struct.pack('>H', 2 + 1 + 64) + b'\x00' \
        + bytes(int(v) for v in qtab)
    # SOF0
    ncomp = len(planes)
    sof = struct.pack('>BHHB', 8, h, w, ncomp)
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b'\xff\xc0' + struct.pack('>H', 2 + len(sof)) + sof
    if restart_interval:
        out += b'\xff\xdd' + struct.pack('>HH', 4, restart_interval)
    # DHT: same flat table as DC class 0 and AC class 1
    for tc in (0, 1):
        dht = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b'\xff\xc4' + struct.pack('>H', 2 + len(dht)) + dht
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += b'\x00\x3f\x00'
    out += b'\xff\xda' + struct.pack('>H', 2 + len(sos)) + sos

    bits: list = []

    def flush_bits() -> None:
        """Pad to a byte with 1s, byte-stuff, append to out."""
        while len(bits) % 8:
            bits.append(1)
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()

    def put(val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((val >> i) & 1)

    def put_sym(sym: int) -> None:
        put(sym, 8)  # flat table: code == symbol, 8 bits

    def put_val(v: int) -> None:
        s = 0 if v == 0 else int(v).bit_length() if v > 0 \
            else int(-v).bit_length()
        put_sym(s)
        if s:
            put(v if v > 0 else v + (1 << s) - 1, s)

    def pad_block(plane, r0, c0):
        ph, pw = plane.shape
        blk = np.zeros((8, 8))
        rh, rw = min(8, ph - r0), min(8, pw - c0)
        if rh <= 0 or rw <= 0:
            return blk
        blk[:rh, :rw] = plane[r0:r0 + rh, c0:c0 + rw]
        if rw < 8:
            blk[:, rw:] = blk[:, rw - 1:rw]
        if rh < 8:
            blk[rh:, :] = blk[rh - 1:rh, :]
        return blk

    preds = [0] * ncomp
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                flush_bits()
                out += bytes([
                    0xFF,
                    0xD0 + ((n_mcu // restart_interval - 1) % 8)])
                preds = [0] * ncomp
            n_mcu += 1
            for ci, plane in enumerate(planes):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = pad_block(
                            plane,
                            (my * vs + by) * 8, (mx * hs + bx) * 8,
                        ) - 128.0
                        coeffs = _DCT_M @ blk @ _DCT_M.T
                        zz = np.round(
                            coeffs.reshape(64)[_ZIGZAG] / qtab
                        ).astype(np.int64)
                        put_val(int(zz[0]) - preds[ci])
                        preds[ci] = int(zz[0])
                        k, run = 1, 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                put_sym(0xF0)  # ZRL
                                run -= 16
                            v = int(zz[k])
                            s = abs(v).bit_length()
                            put_sym((run << 4) | s)
                            put(v if v > 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            put_sym(0x00)  # EOB
    flush_bits()
    out += b'\xff\xd9'  # EOI
    return bytes(out)


def luminance_histogram(gray: np.ndarray, bins: int = 8) -> list:
    """Normalized luminance histogram — the real image feature."""
    hist, _ = np.histogram(gray, bins=bins, range=(0.0, 1.0))
    total = max(int(hist.sum()), 1)
    return [float(c) / total for c in hist]


def resize_nearest(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D array (thumbnail extraction)."""
    h, w = gray.shape
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return gray[np.ix_(ri, ci)]


def _decode_image(payload: bytes, deterministic_fake: bool):
    """Decode an image payload to (width, height, feature[8]).

    PPM/PGM (ASCII+binary), uncompressed BMP, non-interlaced PNG,
    and baseline JPEG decode for real — feature is the 8-bin
    luminance histogram of actual pixels. Formats needing codec
    libraries absent here (WebP/AVIF → Pillow) raise
    ``NotImplementedError`` unless ``deterministic_fake`` is set.
    """
    decoded = decode_ppm(payload)
    if decoded is None:
        decoded = decode_bmp(payload)
    if decoded is None:
        decoded = decode_png(payload)
    if decoded is None:
        decoded = decode_jpeg(payload)
    if decoded is not None:
        w, h, gray = decoded
        return w, h, luminance_histogram(gray, bins=8)
    if not deterministic_fake:
        raise NotImplementedError(
            'only PPM/PGM/BMP/PNG/baseline-JPEG decode natively;'
            ' other formats require Pillow/torchvision — pass'
            ' deterministic_fake=True for plumbing tests'
        )
    h = zlib.crc32(payload) & 0xFFFFFFFF
    return (
        (h % 1920) + 1,
        ((h >> 8) % 1080) + 1,
        [float((h >> (i * 4)) & 0xF) / 15.0 for i in range(8)],
    )


def decode_wav(payload: bytes) -> Optional[Tuple[int, np.ndarray]]:
    """Decode a RIFF/WAVE file (PCM 8/16/32-bit int or IEEE float).

    Returns ``(sample_rate, mono)`` where ``mono`` is float64 samples
    in [-1, 1] (channels averaged), or None if the payload is not
    RIFF/WAVE. Raises on compressed (non-PCM) variants. Pure
    Python/numpy — no codec library needed.
    """
    if len(payload) < 12 or payload[:4] != b'RIFF' \
            or payload[8:12] != b'WAVE':
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from('<I', payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b'fmt ':
            fmt = body
        elif cid == b'data':
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError('missing/short fmt or data chunk')
    audio_fmt, n_ch, rate = struct.unpack_from('<HHI', fmt, 0)
    bits, = struct.unpack_from('<H', fmt, 14)
    if n_ch < 1 or rate < 1:
        raise ValueError('bad WAVE channel count / sample rate')
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is unsigned
            x = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, '<i2').astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, '<i4').astype(np.float64) / 2.0**31
        else:
            raise ValueError(f'unsupported PCM bit depth {bits}')
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(
            data, '<f4' if bits == 32 else '<f8'
        ).astype(np.float64)
    else:
        raise ValueError(f'unsupported WAVE format code {audio_fmt}')
    n = (x.size // n_ch) * n_ch
    mono = x[:n].reshape(-1, n_ch).mean(axis=1)
    return int(rate), mono


def energy_envelope(mono: np.ndarray, segments: int = 8) -> list:
    """Per-segment RMS energy — the real audio feature (8 floats in
    [0, 1] for samples in [-1, 1])."""
    if mono.size == 0:
        return [0.0] * segments
    bounds = (np.arange(segments + 1) * mono.size) // segments
    return [
        float(np.sqrt(np.mean(np.square(mono[bounds[i]:bounds[i + 1]]))))
        if bounds[i + 1] > bounds[i] else 0.0
        for i in range(segments)
    ]


def _extract_audio_features(payload: bytes, deterministic_fake: bool):
    """Decode audio to (duration_ms, feature[8]).

    RIFF/WAVE PCM decodes for real — the feature is the 8-segment RMS
    energy envelope of the actual samples. Compressed formats
    (MP3/AAC/OGG) need codec libraries absent in this container: they
    raise ``NotImplementedError`` unless ``deterministic_fake`` is
    set.
    """
    decoded = decode_wav(payload)
    if decoded is not None:
        rate, mono = decoded
        return int(mono.size * 1000 // rate), energy_envelope(mono, 8)
    if not deterministic_fake:
        raise NotImplementedError(
            'only RIFF/WAVE PCM decodes natively; compressed audio'
            ' requires ffmpeg/torchaudio — pass deterministic_fake='
            'True for plumbing tests'
        )
    h = zlib.crc32(payload) & 0xFFFFFFFF
    return (
        (h % 600000) + 1,
        [float((h >> (i * 3)) & 0x7) / 7.0 for i in range(8)],
    )


def image_features(
    df: SparkDF,
    payload_col: str = 'payload',
    id_col: str = 'media_id',
    deterministic_fake: bool = False,
    batch_size_hint: int = 256,
) -> SparkDF:
    """Extract per-image features via Arrow-batched ``mapInPandas``.

    Partition sizing: media rows are large — repartition upstream so
    each task holds ~(batch_size_hint × mean payload) bytes; set
    ``spark.sql.files.maxPartitionBytes`` accordingly when reading.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col] or b'')
                w, h, feat = _decode_image(payload, deterministic_fake)
                rows.append((row[id_col], w, h, len(payload), feat))
            yield pd.DataFrame(
                rows,
                columns=['media_id', 'width', 'height', 'n_bytes',
                         'feature'],
            )

    schema = _feature_schema(IMAGE_FEATURE_SCHEMA, df, id_col)
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def audio_features(
    df: SparkDF,
    payload_col: str = 'payload',
    id_col: str = 'media_id',
    deterministic_fake: bool = False,
) -> SparkDF:
    """Extract per-audio features via Arrow-batched ``mapInPandas``."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col] or b'')
                dur, feat = _extract_audio_features(
                    payload, deterministic_fake
                )
                rows.append((row[id_col], dur, len(payload), feat))
            yield pd.DataFrame(
                rows,
                columns=['media_id', 'duration_ms', 'n_bytes', 'feature'],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, _feature_schema(AUDIO_FEATURE_SCHEMA, df, id_col))


def frame_sample_plan(
    df: SparkDF,
    every_ms: int = 1000,
    id_col: str = 'media_id',
    duration_col: str = 'duration_ms',
) -> SparkDF:
    """Plan video frame sampling: one row per (media, frame_ts).

    Pure JVM expansion (``sequence`` + ``explode``) — the decode of
    each planned frame is then a :func:`image_features`-style
    mapInPandas pass.
    """
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias('frame_ts_ms'),
    )


# ---------------------------------------------------------------------
# Perceptual hashing (image near-duplicate detection)
# ---------------------------------------------------------------------

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (the cv2.dct convention), cached."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n).reshape(-1, 1)
        x = np.arange(n).reshape(1, -1)
        d = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) \
            * np.sqrt(2.0 / n)
        d[0, :] /= np.sqrt(2.0)
        _DCT32 = d
    return _DCT32


def _box_resample32(gray: np.ndarray) -> np.ndarray:
    """Deterministic 32×32 area resample via an integral image;
    images smaller than 32 px on a side are index-upsampled first."""
    h, w = gray.shape
    if h < 32 or w < 32:
        gray = resize_nearest(gray, max(h, 32), max(w, 32))
        h, w = gray.shape
    integ = np.zeros((h + 1, w + 1), dtype=np.float64)
    integ[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    r = (np.arange(33) * h) // 32
    c = (np.arange(33) * w) // 32
    sums = (integ[r[1:], :][:, c[1:]] - integ[r[:-1], :][:, c[1:]]
            - integ[r[1:], :][:, c[:-1]] + integ[r[:-1], :][:, c[:-1]])
    areas = np.outer(r[1:] - r[:-1], c[1:] - c[:-1]).astype(np.float64)
    return sums / areas


def phash64(gray: np.ndarray) -> int:
    """64-bit perceptual hash (classic DCT pHash): 32×32 area
    resample → 2-D orthonormal DCT → top-left 8×8 low-frequency
    block → threshold each coefficient against the median of the 63
    non-DC coefficients → MSB-first bit pack (signed int64).

    Hamming-close hashes ↔ perceptually similar images: the
    low-frequency block survives recompression, mild noise, and
    resizing — exactly the transforms that defeat byte-level dedup.
    """
    d = _dct_basis(32)
    g = _box_resample32(gray.astype(np.float64))
    coeffs = (d @ g @ d.T)[:8, :8].flatten()
    med = float(np.median(coeffs[1:]))
    val = 0
    for bit in (coeffs > med).astype(np.uint8):
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


def perceptual_hashes(
    df: SparkDF,
    payload_col: str = 'payload',
    id_col: str = 'media_id',
    deterministic_fake: bool = False,
) -> SparkDF:
    """Per-image pHash via Arrow-batched ``mapInPandas``:
    ``(id, width, height, phash)``. Same decode dispatch (and
    format-gate behavior) as :func:`image_features`."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col] or b'')
                decoded = decode_ppm(payload) or decode_bmp(payload) \
                    or decode_png(payload) or decode_jpeg(payload)
                if decoded is not None:
                    w, h, gray = decoded
                    rows.append((row[id_col], w, h, phash64(gray)))
                elif deterministic_fake:
                    crc = zlib.crc32(payload) & 0xFFFFFFFF
                    fake = (crc << 32) | crc
                    fake = fake - (1 << 64) if fake >= (1 << 63) \
                        else fake
                    rows.append((row[id_col], 0, 0, fake))
                else:
                    raise NotImplementedError(
                        'undecodable format for phash; pass '
                        'deterministic_fake=True for plumbing tests')
            yield pd.DataFrame(
                rows, columns=['media_id', 'width', 'height', 'phash'])

    schema = _feature_schema(
        'media_id bigint, width int, height int, phash bigint',
        df, id_col)
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def phash_duplicates(
    hashes: SparkDF,
    id_col: str = 'media_id',
    hash_col: str = 'phash',
    max_hamming: int = 6,
) -> SparkDF:
    """All image pairs within ``max_hamming`` bits — banded exactly
    like SimHash: split the 64-bit hash into 4 × 16-bit blocks
    (pigeonhole: ≤6 flipped bits leave ≥1 block intact... for ≤3
    strictly; with 4 bands the guarantee holds for distance ≤ 3,
    larger distances are best-effort), equi-join per block, verify
    with one ``bit_count(xor)``. Shuffle O(rows × 4), never O(n²).
    """
    h = F.col(hash_col)
    blocks = F.array(*[
        F.shiftrightunsigned(h, shift).bitwiseAND(F.lit(0xFFFF))
        for shift in (48, 32, 16, 0)
    ])
    sig = hashes.select(
        F.col(id_col).alias('__id'), h.alias('__h'),
        F.posexplode(blocks).alias('block', 'key'),
    )
    l, r = sig.alias('l'), sig.alias('r')
    return (
        l.join(r, on=[
            F.col('l.block') == F.col('r.block'),
            F.col('l.key') == F.col('r.key'),
            F.col('l.__id') < F.col('r.__id'),
        ])
        .select(
            F.col('l.__id').alias('id_a'),
            F.col('r.__id').alias('id_b'),
            F.bit_count(
                F.col('l.__h').bitwiseXOR(F.col('r.__h'))
            ).alias('hamming'),
        )
        .filter(F.col('hamming') <= max_hamming)
        .distinct()
    )
