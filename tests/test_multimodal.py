"""Tests for multimodal plumbing (schemas/batching real, decode stubbed)."""
import pytest

from ons_utils_spark.operators import multimodal as mm


@pytest.fixture
def media(spark_session):
    rows = [
        (1, bytearray(b'payload-one')),
        (2, bytearray(b'payload-two-longer')),
        (3, bytearray(b'')),
    ]
    return spark_session.createDataFrame(
        rows, 'media_id bigint, payload binary'
    )


def test_image_features_fake_deterministic(media):
    out1 = sorted(
        (r['media_id'], r['width'], r['height'], tuple(r['feature']))
        for r in mm.image_features(media, deterministic_fake=True)
        .collect()
    )
    out2 = sorted(
        (r['media_id'], r['width'], r['height'], tuple(r['feature']))
        for r in mm.image_features(media, deterministic_fake=True)
        .collect()
    )
    assert out1 == out2
    assert all(len(f) == 8 for *_, f in out1)
    assert all(w >= 1 and h >= 1 for _, w, h, _ in out1)


def test_image_features_real_decode_raises(media):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as exc_info:
        mm.image_features(media, deterministic_fake=False).collect()
    assert 'NotImplementedError' in str(exc_info.value) \
        or 'Pillow' in str(exc_info.value)


def test_audio_features_fake(media):
    out = mm.audio_features(media, deterministic_fake=True).collect()
    assert len(out) == 3
    assert all(r['duration_ms'] >= 1 for r in out)
    assert dict(
        mm.audio_features(media, deterministic_fake=True).dtypes
    )['feature'] == 'array<float>'


def _make_bmp_24(pixels):
    """Encode rows of (r, g, b) tuples as an uncompressed 24-bit BMP."""
    import struct
    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    img = b''
    for row in reversed(pixels):  # bottom-up storage
        line = b''.join(bytes((b, g, r)) for (r, g, b) in row)
        img += line + b'\x00' * (stride - len(line))
    header = struct.pack('<2sIHHI', b'BM', 54 + len(img), 0, 0, 54)
    info = struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0, len(img),
                       2835, 2835, 0, 0)
    return header + info + img


class TestRealDecoders:
    """PPM/PGM/BMP decode for real — pixel-accurate, no codec libs."""

    def test_ppm_p6_binary(self):
        # 2x1: pure white then pure black
        payload = b'P6\n2 1\n255\n' + bytes([255, 255, 255, 0, 0, 0])
        w, h, gray = mm.decode_ppm(payload)
        assert (w, h) == (2, 1)
        assert gray[0, 0] == pytest.approx(1.0)
        assert gray[0, 1] == pytest.approx(0.0)

    def test_ppm_p3_ascii_with_comment(self):
        payload = b'P3\n# a comment\n1 2\n255\n255 0 0\n0 255 0\n'
        w, h, gray = mm.decode_ppm(payload)
        assert (w, h) == (1, 2)
        assert gray[0, 0] == pytest.approx(0.299)  # red luminance
        assert gray[1, 0] == pytest.approx(0.587)  # green luminance

    def test_pgm_p5_binary(self):
        payload = b'P5\n3 1\n255\n' + bytes([0, 128, 255])
        w, h, gray = mm.decode_ppm(payload)
        assert (w, h) == (3, 1)
        assert gray[0, 1] == pytest.approx(128 / 255)

    def test_ppm_16bit_maxval(self):
        payload = b'P5\n1 1\n65535\n' + (32768).to_bytes(2, 'big')
        _, _, gray = mm.decode_ppm(payload)
        assert gray[0, 0] == pytest.approx(32768 / 65535)

    def test_not_ppm_returns_none(self):
        assert mm.decode_ppm(b'GIF89a...') is None

    def test_bmp_24bit(self):
        payload = _make_bmp_24([
            [(255, 255, 255), (0, 0, 0)],
            [(255, 0, 0), (0, 255, 0)],
        ])
        w, h, gray = mm.decode_bmp(payload)
        assert (w, h) == (2, 2)
        assert gray[0, 0] == pytest.approx(1.0)     # top-left white
        assert gray[0, 1] == pytest.approx(0.0)
        assert gray[1, 0] == pytest.approx(0.299)   # red
        assert gray[1, 1] == pytest.approx(0.587)   # green

    def test_not_bmp_returns_none(self):
        assert mm.decode_bmp(b'\x89PNG\r\n' + b'\x00' * 64) is None

    def test_not_png_returns_none(self):
        assert mm.decode_png(b'BM' + b'\x00' * 64) is None

    def test_luminance_histogram_normalized(self):
        import numpy as np
        gray = np.array([[0.0, 0.5], [0.5, 1.0]])
        hist = mm.luminance_histogram(gray, bins=8)
        assert len(hist) == 8
        assert sum(hist) == pytest.approx(1.0)
        assert hist[0] == pytest.approx(0.25)   # the 0.0 pixel
        assert hist[4] == pytest.approx(0.5)    # the two 0.5 pixels
        assert hist[7] == pytest.approx(0.25)   # the 1.0 pixel

    def test_resize_nearest(self):
        import numpy as np
        gray = np.arange(16, dtype=float).reshape(4, 4)
        thumb = mm.resize_nearest(gray, 2, 2)
        assert thumb.shape == (2, 2)
        assert thumb[0, 0] == 0.0 and thumb[1, 1] == 10.0

    def test_image_features_real_end_to_end(self, spark_session):
        """Real decode through the full mapInPandas Spark path."""
        ppm = b'P6\n2 2\n255\n' + bytes(
            [255, 255, 255, 0, 0, 0, 255, 255, 255, 0, 0, 0]
        )
        bmp = _make_bmp_24([[(0, 0, 0), (255, 255, 255)]])
        df = spark_session.createDataFrame(
            [(1, bytearray(ppm)), (2, bytearray(bmp))],
            'media_id bigint, payload binary',
        )
        out = {r['media_id']: r for r in
               mm.image_features(df, deterministic_fake=False).collect()}
        assert (out[1]['width'], out[1]['height']) == (2, 2)
        assert (out[2]['width'], out[2]['height']) == (2, 1)
        # 2 white + 2 black pixels → histogram mass split at the edges
        feat = out[1]['feature']
        assert feat[0] == pytest.approx(0.5)
        assert feat[7] == pytest.approx(0.5)


class TestJpegDecode:
    """Baseline JPEG decode for real — generated-fixture round trips
    (the in-module test-grade encoder writes its own quant + Huffman
    tables, so the decoder's table parsing runs against real DHT/DQT
    segments, not constants)."""

    def _roundtrip(self, shape, seed=7, **enc_kwargs):
        import numpy as np
        rng = np.random.default_rng(seed)
        img = rng.random(shape)
        payload = mm.encode_jpeg(img, **enc_kwargs)
        assert payload[:2] == b'\xff\xd8'
        w, h, gray = mm.decode_jpeg(payload)
        assert (w, h) == (shape[1], shape[0])
        want = img @ np.array([0.299, 0.587, 0.114]) \
            if img.ndim == 3 else img
        return float(np.abs(gray - want).max())

    def test_grayscale_roundtrip(self):
        # quant=1: error is DCT integer-rounding only (~1/255)
        assert self._roundtrip((16, 16)) < 0.01

    def test_non_multiple_of_8_dims(self):
        assert self._roundtrip((17, 24)) < 0.01

    def test_ycbcr_444(self):
        assert self._roundtrip((16, 16, 3), subsampling='444') < 0.01

    def test_ycbcr_422(self):
        # chroma subsampling never touches Y, so gray stays tight
        assert self._roundtrip((20, 18, 3), subsampling='422') < 0.01

    def test_ycbcr_420_odd_dims(self):
        assert self._roundtrip((13, 9, 3), subsampling='420') < 0.01

    def test_restart_markers(self):
        err = self._roundtrip(
            (40, 33, 3), subsampling='420', restart_interval=2)
        assert err < 0.01

    def test_coarse_quant_still_decodes(self):
        # quality loss ≠ decode failure; error grows with quant step
        err = self._roundtrip((16, 16), quant=16)
        assert 0.01 < err < 0.3

    def test_arithmetic_coding_rejected(self):
        bad = (b'\xff\xd8\xff\xc9\x00\x0b'
               + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match='SOF9'):
            mm.decode_jpeg(bad)

    def test_progressive_without_scan_rejected(self):
        trunc = (b'\xff\xd8\xff\xc2\x00\x0b'
                 + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match='no scan'):
            mm.decode_jpeg(trunc)

    def test_not_jpeg_returns_none(self):
        assert mm.decode_jpeg(b'RIFF....WEBP') is None

    def test_image_features_jpeg_end_to_end(self, spark_session):
        """JPEG payloads through the full mapInPandas Spark path,
        mixed with other formats in one batch."""
        import numpy as np
        rng = np.random.default_rng(11)
        jpg = mm.encode_jpeg(rng.random((24, 16, 3)), subsampling='420')
        ppm = b'P6\n2 2\n255\n' + bytes(
            [255, 255, 255, 0, 0, 0, 255, 255, 255, 0, 0, 0]
        )
        df = spark_session.createDataFrame(
            [(1, bytearray(jpg)), (2, bytearray(ppm))],
            'media_id bigint, payload binary',
        )
        out = {r['media_id']: r for r in
               mm.image_features(df, deterministic_fake=False).collect()}
        assert (out[1]['width'], out[1]['height']) == (16, 24)
        assert len(out[1]['feature']) == 8
        assert sum(out[1]['feature']) == pytest.approx(1.0, abs=1e-6)


def test_frame_sample_plan(spark_session):
    vids = spark_session.createDataFrame(
        [(1, 2500), (2, 0)], 'media_id bigint, duration_ms int'
    )
    out = mm.frame_sample_plan(vids, every_ms=1000).collect()
    got = sorted((r['media_id'], r['frame_ts_ms']) for r in out)
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]


def _make_wav(samples, rate=8000, n_ch=1, bits=16, fmt_code=1):
    """Build a minimal RIFF/WAVE payload from float samples [-1,1]."""
    import numpy as np
    import struct as st
    x = np.asarray(samples, dtype=np.float64)
    if bits == 8:
        data = (np.clip(x, -1, 1) * 128 + 128).clip(0, 255) \
            .astype('u1').tobytes()
    elif bits == 16 and fmt_code == 1:
        data = (np.clip(x, -1, 1) * 32767).astype('<i2').tobytes()
    elif bits == 32 and fmt_code == 1:
        data = (np.clip(x, -1, 1) * (2**31 - 1)).astype('<i4').tobytes()
    elif fmt_code == 3:
        data = x.astype('<f4' if bits == 32 else '<f8').tobytes()
    else:
        raise ValueError
    block = n_ch * bits // 8
    fmt = st.pack('<HHIIHH', fmt_code, n_ch, rate, rate * block,
                  block, bits)
    chunks = (b'fmt ' + st.pack('<I', len(fmt)) + fmt
              + b'data' + st.pack('<I', len(data)) + data)
    return b'RIFF' + st.pack('<I', 4 + len(chunks)) + b'WAVE' + chunks


class TestWavDecode:
    def test_pcm16_roundtrip(self):
        import numpy as np
        t = np.arange(8000) / 8000.0
        sine = 0.5 * np.sin(2 * np.pi * 440 * t)
        rate, mono = mm.decode_wav(_make_wav(sine))
        assert rate == 8000 and mono.size == 8000
        assert np.abs(mono - sine).max() < 1e-3

    def test_stereo_averages_to_mono(self):
        import numpy as np
        # L channel all +0.5, R channel all -0.5 → mono ≈ 0
        inter = np.empty(200)
        inter[0::2], inter[1::2] = 0.5, -0.5
        rate, mono = mm.decode_wav(_make_wav(inter, n_ch=2))
        assert mono.size == 100
        assert np.abs(mono).max() < 1e-3

    def test_pcm8_and_float32(self):
        import numpy as np
        x = np.linspace(-0.9, 0.9, 64)
        for kw in ({'bits': 8}, {'bits': 32, 'fmt_code': 3},
                   {'bits': 32, 'fmt_code': 1}):
            _, mono = mm.decode_wav(_make_wav(x, **kw))
            tol = 1e-2 if kw.get('bits') == 8 else 1e-6
            assert np.abs(mono - x).max() < tol, kw

    def test_not_wav_returns_none(self):
        assert mm.decode_wav(b'\xff\xfb junk mp3') is None
        assert mm.decode_wav(b'RIFFxxxxAVI ') is None

    def test_compressed_raises(self):
        import pytest as pt
        import struct as st
        fmt = st.pack('<HHIIHH', 85, 1, 8000, 8000, 1, 16)  # 85=MP3
        payload = (b'RIFF' + st.pack('<I', 28) + b'WAVE'
                   + b'fmt ' + st.pack('<I', len(fmt)) + fmt
                   + b'data' + st.pack('<I', 0))
        with pt.raises(ValueError, match='format code'):
            mm.decode_wav(payload)

    def test_energy_envelope_reflects_amplitude(self):
        import numpy as np
        # first half silent, second half loud → envelope steps up
        x = np.concatenate([np.zeros(400), 0.8 * np.ones(400)])
        env = mm.energy_envelope(x, segments=8)
        assert env[:4] == [0.0] * 4
        assert all(abs(e - 0.8) < 1e-9 for e in env[4:])

    def test_audio_features_real_end_to_end(self, spark_session):
        """Real WAV decode through the full mapInPandas Spark path."""
        import numpy as np
        quiet = _make_wav(0.1 * np.ones(4000), rate=8000)   # 500 ms
        loud = _make_wav(0.9 * np.ones(16000), rate=16000)  # 1000 ms
        df = spark_session.createDataFrame(
            [(1, bytearray(quiet)), (2, bytearray(loud))],
            'media_id bigint, payload binary',
        )
        out = {r['media_id']: r for r in
               mm.audio_features(df, deterministic_fake=False).collect()}
        assert out[1]['duration_ms'] == 500
        assert out[2]['duration_ms'] == 1000
        assert out[1]['feature'][0] == pytest.approx(0.1, abs=1e-3)
        assert out[2]['feature'][7] == pytest.approx(0.9, abs=1e-3)


class TestWavProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.floats(min_value=-1.0, max_value=1.0,
                           allow_nan=False, width=32),
                 min_size=2, max_size=64),
        st.sampled_from([8000, 16000, 44100]),
        st.sampled_from([1, 2, 3]),
        st.sampled_from([(16, 1), (32, 1), (32, 3)]),
    )
    @settings(max_examples=40, deadline=None)
    def test_decode_roundtrip(self, samples, rate, n_ch, bits_fmt):
        import numpy as np
        bits, fmt_code = bits_fmt
        # replicate each sample across channels so mono avg == input
        x = np.repeat(np.asarray(samples), n_ch)
        got_rate, mono = mm.decode_wav(
            _make_wav(x, rate=rate, n_ch=n_ch, bits=bits,
                      fmt_code=fmt_code))
        assert got_rate == rate
        assert mono.size == len(samples)
        tol = 1e-4 if bits == 16 else 1e-6
        assert np.abs(mono - np.asarray(samples)).max() <= tol


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack('>I', len(data)) + ctype + data
            + struct.pack('>I', zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _make_png(pixels, color_type, filters=None, palette=None, depth=8):
    """Minimal PNG encoder for round-trip tests.

    ``pixels``: (h, w, channels) uint8/uint16 array. ``filters``: one
    PNG filter id per row (default all 0); rows are FORWARD-filtered
    so the decoder must reconstruct them.
    """
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels)
    h, w, channels = px.shape
    sb = depth // 8
    if sb == 2:
        flat = np.zeros((h, w * channels * 2), np.uint8)
        flat[:, 0::2] = (px.reshape(h, -1) >> 8) & 255
        flat[:, 1::2] = px.reshape(h, -1) & 255
    else:
        flat = px.reshape(h, -1).astype(np.uint8)
    bpp = channels * sb
    stride = w * bpp
    filters = filters or [0] * h
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y].astype(np.int32)
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 255
        elif f == 2:
            enc = (cur - prev) & 255
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - (left + prev) // 2) & 255
        elif f == 4:
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 255
        out.append(f)
        out.extend(int(v) for v in enc)
        prev = cur
    ihdr = struct.pack('>IIBBBBB', w, h, depth, color_type, 0, 0, 0)
    png = b'\x89PNG\r\n\x1a\n' + _png_chunk(b'IHDR', ihdr)
    if palette is not None:
        png += _png_chunk(b'PLTE', bytes(palette))
    png += _png_chunk(b'IDAT', zlib.compress(bytes(out)))
    png += _png_chunk(b'IEND', b'')
    return png


class TestPngDecode:
    """Real PNG decode: inflate + unfilter, no codec libraries."""

    def test_gray_filter0(self):
        import numpy as np
        px = np.array([[[0], [128]], [[255], [64]]], np.uint8)
        w, h, gray = mm.decode_png(_make_png(px, color_type=0))
        assert (w, h) == (2, 2)
        assert gray[0, 1] == pytest.approx(128 / 255)
        assert gray[1, 0] == pytest.approx(1.0)

    def test_rgb_luminance(self):
        import numpy as np
        px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]],
                      np.uint8)
        w, h, gray = mm.decode_png(_make_png(px, color_type=2))
        assert (w, h) == (3, 1)
        assert gray[0, 0] == pytest.approx(0.299)
        assert gray[0, 1] == pytest.approx(0.587)
        assert gray[0, 2] == pytest.approx(0.114)

    @pytest.mark.parametrize('f', [0, 1, 2, 3, 4])
    def test_each_filter_roundtrips(self, f):
        import numpy as np
        rng = np.random.default_rng(f)
        px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint16) \
            .astype(np.uint8).reshape(5, 7, 3)
        png = _make_png(px, color_type=2, filters=[0] + [f] * 4)
        w, h, gray = mm.decode_png(png)
        want = (px.astype(np.float64) / 255.0) \
            @ np.array([0.299, 0.587, 0.114])
        assert np.abs(gray - want).max() < 1e-12

    def test_mixed_filters_roundtrip(self):
        import numpy as np
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(6, 4, 4), dtype=np.int64) \
            .astype(np.uint8)
        png = _make_png(px, color_type=6,
                        filters=[0, 1, 2, 3, 4, 2])  # RGBA
        w, h, gray = mm.decode_png(png)
        want = (px[:, :, :3].astype(np.float64) / 255.0) \
            @ np.array([0.299, 0.587, 0.114])
        assert np.abs(gray - want).max() < 1e-12

    def test_palette(self):
        import numpy as np
        palette = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # R, G, B entries
        px = np.array([[[0], [1], [2]]], np.uint8)
        w, h, gray = mm.decode_png(
            _make_png(px, color_type=3, palette=palette))
        assert gray[0, 0] == pytest.approx(0.299)
        assert gray[0, 1] == pytest.approx(0.587)
        assert gray[0, 2] == pytest.approx(0.114)

    def test_16bit_gray(self):
        import numpy as np
        px = np.array([[[0], [32768]], [[65535], [16384]]], np.uint16)
        w, h, gray = mm.decode_png(_make_png(px, color_type=0, depth=16))
        assert gray[0, 1] == pytest.approx(32768 / 65535)
        assert gray[1, 0] == pytest.approx(1.0)

    def test_crc_mismatch_raises(self):
        import numpy as np
        png = bytearray(_make_png(
            np.zeros((1, 1, 1), np.uint8), color_type=0))
        png[-5] ^= 0xFF  # corrupt IEND... corrupt IDAT crc instead
        png = bytearray(_make_png(
            np.zeros((2, 2, 1), np.uint8), color_type=0))
        # flip a byte inside the IDAT data region
        idat_at = bytes(png).index(b'IDAT')
        png[idat_at + 5] ^= 0xFF
        with pytest.raises(ValueError, match='CRC'):
            mm.decode_png(bytes(png))

    def test_interlaced_raises(self):
        import struct
        ihdr = struct.pack('>IIBBBBB', 1, 1, 8, 0, 0, 0, 1)
        png = (b'\x89PNG\r\n\x1a\n' + _png_chunk(b'IHDR', ihdr)
               + _png_chunk(b'IDAT', b'x') + _png_chunk(b'IEND', b''))
        with pytest.raises(ValueError, match='interlaced'):
            mm.decode_png(png)

    def test_image_features_picks_up_png(self):
        import numpy as np
        png = _make_png(
            np.full((4, 4, 3), 255, np.uint8), color_type=2)
        w, h, feat = mm._decode_image(png, deterministic_fake=False)
        assert (w, h) == (4, 4)
        assert feat[7] == pytest.approx(1.0)  # all-white histogram


def _pgm(pixels):
    import numpy as np
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape
    return (f'P5 {w} {h} 255\n'.encode() + arr.tobytes())


class TestPerceptualHash:
    def _gradient(self, h=48, w=64, noise_at=None):
        """Seeded low-pass-filtered noise: spectrally rich like a
        real photo (a pure gradient/sawtooth has degenerate DCT
        spectra where half the coefficients tie at the median and
        the hash is legitimately unstable)."""
        import numpy as np
        rng = np.random.RandomState(7)
        field = rng.rand(h, w)
        k = np.ones(5) / 5.0
        field = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode='same'), 1, field)
        field = np.apply_along_axis(
            lambda c: np.convolve(c, k, mode='same'), 0, field)
        base = (field * 255 / field.max()).astype(np.uint8)
        if noise_at:
            for (r, c) in noise_at:
                base[r, c] = min(int(base[r, c]) + 40, 255)
        return base

    def test_identical_images_same_hash(self):
        from ons_utils_spark.operators.multimodal import (
            decode_ppm, phash64,
        )
        img = _pgm(self._gradient())
        _, _, g1 = decode_ppm(img)
        _, _, g2 = decode_ppm(_pgm(self._gradient()))
        assert phash64(g1) == phash64(g2)

    def test_noise_small_hamming_invert_large(self):
        from ons_utils_spark.operators.multimodal import (
            decode_ppm, phash64,
        )
        import numpy as np
        base = self._gradient()
        noisy = self._gradient(noise_at=[(3, 5), (20, 30), (40, 50)])
        inverted = (255 - base).astype(np.uint8)
        _, _, g0 = decode_ppm(_pgm(base))
        _, _, gn = decode_ppm(_pgm(noisy))
        _, _, gi = decode_ppm(_pgm(inverted))
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count('1')
        h0, hn, hi = phash64(g0), phash64(gn), phash64(gi)
        assert ham(h0, hn) <= 8          # noise barely moves it
        assert ham(h0, hi) >= 20         # inversion is a different image

    def test_survives_jpeg_recompression(self):
        from ons_utils_spark.operators.multimodal import (
            decode_jpeg, decode_ppm, encode_jpeg, phash64,
        )
        base = self._gradient()
        _, _, g0 = decode_ppm(_pgm(base))
        jpeg = encode_jpeg(base)
        _, _, gj = decode_jpeg(jpeg)
        ham = bin((phash64(g0) ^ phash64(gj)) & ((1 << 64) - 1)) \
            .count('1')
        assert ham <= 8

    def test_spark_pipeline_finds_planted_neardup(
            self, spark_session):
        from ons_utils_spark.operators.multimodal import (
            perceptual_hashes, phash_duplicates,
        )
        import numpy as np
        base = self._gradient()
        noisy = self._gradient(noise_at=[(3, 5), (20, 30)])
        different = (255 - base).astype(np.uint8)
        rows = [(1, bytearray(_pgm(base))),
                (2, bytearray(_pgm(noisy))),
                (3, bytearray(_pgm(different)))]
        df = spark_session.createDataFrame(
            rows, 'media_id bigint, payload binary')
        hashes = perceptual_hashes(df)
        pairs = phash_duplicates(hashes, max_hamming=8).collect()
        assert [(r['id_a'], r['id_b']) for r in pairs] == [(1, 2)]

    def test_banding_guarantee_at_max_hamming(self, spark_session):
        """Pigeonhole recall guarantee (ADVICE r4): a pair at EXACTLY
        max_hamming bits, with the flipped bits spread one per old
        16-bit block (which the former 4-band scheme missed for
        distance > 3), must be found."""
        from ons_utils_spark.operators.multimodal import (
            phash_duplicates,
        )
        base = 0x0123456789ABCDEF
        # flip 6 bits: at least one in each of the four 16-bit blocks
        flipped = base
        for bit in (60, 44, 28, 12, 5, 50):
            flipped ^= 1 << bit
        assert bin(base ^ flipped).count('1') == 6
        to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
        df = spark_session.createDataFrame(
            [(1, to_signed(base)), (2, to_signed(flipped))],
            'media_id bigint, phash bigint')
        pairs = phash_duplicates(df, max_hamming=6).collect()
        assert [(r['id_a'], r['id_b'], r['hamming'])
                for r in pairs] == [(1, 2, 6)]

    def test_banding_excludes_beyond_max_hamming(self, spark_session):
        from ons_utils_spark.operators.multimodal import (
            phash_duplicates,
        )
        base = 0x7EDCBA9876543210
        far = base
        for bit in range(0, 28, 4):                  # 7 bits > 6
            far ^= 1 << bit
        df = spark_session.createDataFrame(
            [(1, base), (2, far)], 'media_id bigint, phash bigint')
        assert phash_duplicates(df, max_hamming=6).count() == 0

    def test_banding_rejects_bad_max_hamming(self, spark_session):
        from ons_utils_spark.operators.multimodal import (
            phash_duplicates,
        )
        df = spark_session.createDataFrame(
            [(1, 0)], 'media_id bigint, phash bigint')
        import pytest as pt
        with pt.raises(ValueError, match='max_hamming'):
            phash_duplicates(df, max_hamming=64)


class TestProgressiveJpeg:
    """Progressive (SOF2) decode verified against the test-grade
    progressive encoder: DC/AC first + refinement scans, spectral
    selection, EOBRUN, chroma byte-skip, 4:2:0 interleaved DC."""

    def _roundtrip(self, img, **kw):
        import numpy as np
        prog = mm.encode_jpeg_progressive(img, **kw)
        out = mm.decode_jpeg(prog)
        assert out is not None
        w, h, gray = out
        if img.ndim == 2:
            ref = img.astype(float)
        else:
            ref = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                   + 0.114 * img[:, :, 2]).astype(float)
        assert (h, w) == ref.shape[:2][::-1][::-1]  # (h, w) matches
        return float(np.abs(gray * 255 - ref).max())

    def test_gray_gradient_exact_to_dct_rounding(self):
        import numpy as np
        g = np.tile(np.linspace(0, 255, 56, dtype=np.uint8), (40, 1))
        assert self._roundtrip(g) <= 1.5

    def test_flat_image_eobrun_heavy(self):
        import numpy as np
        assert self._roundtrip(
            np.full((32, 32), 128, np.uint8)) == 0.0

    def test_noise_refinement_heavy(self):
        import numpy as np
        rng = np.random.RandomState(7)
        assert self._roundtrip(
            rng.randint(0, 256, (24, 24)).astype(np.uint8)) <= 1.5

    def test_color_444_chroma_scans_skipped(self):
        import numpy as np
        rng = np.random.RandomState(8)
        c = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
        assert self._roundtrip(c) <= 1.5

    def test_color_420_interleaved_dc_mcus(self):
        import numpy as np
        rng = np.random.RandomState(9)
        c = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
        assert self._roundtrip(c, subsampling='420') <= 1.5

    def test_coarse_quant_bounded(self):
        import numpy as np
        rng = np.random.RandomState(10)
        g = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        assert self._roundtrip(g, quant=4) <= 4.5

    def test_matches_sequential_decode(self):
        """Progressive and sequential encodings of the same image
        must decode to (near-)identical luminance."""
        import numpy as np
        g = np.tile(np.linspace(10, 240, 32, dtype=np.uint8), (32, 1))
        _, _, seq = mm.decode_jpeg(mm.encode_jpeg(g))
        _, _, prog = mm.decode_jpeg(mm.encode_jpeg_progressive(g))
        assert float(np.abs(seq - prog).max()) * 255 <= 1.0

    def test_progressive_phash_matches_sequential(self):
        import numpy as np
        g = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
        _, _, a = mm.decode_jpeg(mm.encode_jpeg(g))
        _, _, b = mm.decode_jpeg(mm.encode_jpeg_progressive(g))
        ham = bin((mm.phash64(a) ^ mm.phash64(b))
                  & ((1 << 64) - 1)).count('1')
        assert ham <= 2


def _make_mp3(n_frames=20, version=3, br_idx=9, sr_idx=0,
              vbr_pattern=None, id3=False):
    """Synthesize a syntactically-valid MP3 Layer-III stream (headers
    + zero-filled frame bodies)."""
    out = bytearray()
    if id3:
        body = b'\x00' * 100
        out += b'ID3\x04\x00\x00' + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body
    rates = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000)}
    brs = ((0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320) if version == 3 else
           (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
            160))
    for i in range(n_frames):
        bi = vbr_pattern[i % len(vbr_pattern)] if vbr_pattern else br_idx
        hdr = bytes([
            0xFF,
            0xE0 | (version << 3) | (0x01 << 1) | 1,
            (bi << 4) | (sr_idx << 2) | 0,
            0xC0,
        ])
        spf = 1152 if version == 3 else 576
        flen = spf // 8 * brs[bi] * 1000 // rates[version][sr_idx]
        out += hdr + b'\x00' * (flen - 4)
    return bytes(out)


class TestMp3Meta:
    def test_cbr_duration_and_rate(self):
        p = _make_mp3(n_frames=38)             # ~1 s at 44.1k/1152
        meta = mm.decode_mp3_meta(p)
        assert meta is not None
        assert meta['sample_rate'] == 44100
        assert meta['n_frames'] == 38
        assert meta['duration_ms'] == 38 * 1152 * 1000 // 44100
        assert meta['avg_bitrate_kbps'] == 128.0
        assert meta['vbr'] is False

    def test_id3v2_tag_skipped(self):
        meta = mm.decode_mp3_meta(_make_mp3(n_frames=10, id3=True))
        assert meta is not None and meta['n_frames'] == 10

    def test_vbr_envelope_tracks_bitrate(self):
        # low bitrate first half, high second half
        p = _make_mp3(n_frames=32, vbr_pattern=[1] * 16 + [14] * 16)
        meta = mm.decode_mp3_meta(p)
        assert meta['vbr'] is True
        env = meta['bitrate_envelope']
        assert len(env) == 8
        assert max(env[:4]) < min(env[4:])

    def test_mpeg2_half_samples(self):
        meta = mm.decode_mp3_meta(
            _make_mp3(n_frames=10, version=2, sr_idx=0))
        assert meta['sample_rate'] == 22050
        assert meta['duration_ms'] == 10 * 576 * 1000 // 22050

    def test_rejects_non_mp3(self):
        assert mm.decode_mp3_meta(b'payload-one-random') is None
        assert mm.decode_mp3_meta(b'') is None
        # a lone false sync with garbage successor
        assert mm.decode_mp3_meta(b'\xff\xfb\x90\x00' + b'xy') is None

    def test_audio_features_parses_mp3(self, spark_session):
        p = _make_mp3(n_frames=38)
        df = spark_session.createDataFrame(
            [(1, bytearray(p))], 'media_id bigint, payload binary')
        out = mm.audio_features(df).collect()
        assert out[0]['duration_ms'] == 38 * 1152 * 1000 // 44100
        assert len(out[0]['feature']) == 8


class TestCountedSkip:
    """on_undecodable='status': undecodable rows are counted, never
    silently dropped and never job-fatal."""

    def test_image_status_mode(self, spark_session):
        import numpy as np
        good = mm.encode_jpeg(
            np.tile(np.linspace(0, 255, 16, dtype=np.uint8), (16, 1)))
        rows = [(1, bytearray(good)),
                (2, bytearray(b'RIFFxxxxWEBPVP8 garbage')),
                (3, bytearray(b''))]
        df = spark_session.createDataFrame(
            rows, 'media_id bigint, payload binary')
        out = {r['media_id']: r for r in mm.image_features(
            df, on_undecodable='status').collect()}
        assert out[1]['decode_ok'] is True and out[1]['width'] == 16
        assert out[2]['decode_ok'] is False
        assert 'NotImplementedError' in out[2]['decode_error']
        assert out[3]['decode_ok'] is False
        n_skipped = sum(1 for r in out.values() if not r['decode_ok'])
        assert n_skipped == 2

    def test_audio_status_mode(self, spark_session):
        rows = [(1, bytearray(_make_mp3(5))),
                (2, bytearray(b'OggS not supported'))]
        df = spark_session.createDataFrame(
            rows, 'media_id bigint, payload binary')
        out = {r['media_id']: r for r in mm.audio_features(
            df, on_undecodable='status').collect()}
        assert out[1]['decode_ok'] is True
        assert out[2]['decode_ok'] is False

    def test_bad_mode_rejected(self, media):
        with pytest.raises(ValueError, match='on_undecodable'):
            mm.image_features(media, on_undecodable='drop')


# ---------------------------------------------------------------------
# MP4 / ISO BMFF container parse
# ---------------------------------------------------------------------

class TestMp4Parse:
    N, DELTA, KE = 7, 50, 3
    SIZES = [100 + i * 7 for i in range(7)]

    def _mp4(self, **kw):
        return mm.encode_test_mp4(
            self.N, self.DELTA, self.KE, self.SIZES, **kw)

    def test_meta_round_trip(self):
        meta = mm.decode_mp4_meta(self._mp4(width=320, height=240))
        assert meta == {
            'brand': 'isom', 'codec': 'avc1',
            'width': 320, 'height': 240,
            'duration_ms': self.N * self.DELTA * 1000 // 600,
            'n_frames': self.N, 'n_keyframes': 3,
        }

    def test_closed_form_layout(self):
        """The oracle's byte-offset formula is the encoder's
        single-chunk layout: mdat payload starts at
        599 + 4*n_keyframes + 4*n_frames."""
        for n, ke in [(1, 1), (5, 2), (24, 5), (7, 3)]:
            sizes = [64 + i for i in range(n)]
            payload = mm.encode_test_mp4(n, 40, ke, sizes)
            nk = (n + ke - 1) // ke
            hdr = 599 + 4 * nk + 4 * n
            table = mm.mp4_sample_table(payload)
            assert table[0][3] == hdr
            assert len(payload) == hdr + sum(sizes)

    def test_sample_table_offsets_and_keys(self):
        table = mm.mp4_sample_table(self._mp4())
        off = table[0][3]
        for i, (idx, pts, key, o, sz) in enumerate(table):
            assert idx == i + 1
            assert pts == i * self.DELTA * 1000 // 600
            assert key == (i % self.KE == 0)
            assert o == off and sz == self.SIZES[i]
            off += sz

    def test_multi_chunk_stsc_expansion(self):
        """spc=3 over 7 samples -> chunks [3,3,1] (two stsc runs);
        offsets stay contiguous within each chunk."""
        table = mm.mp4_sample_table(
            self._mp4(samples_per_chunk=3))
        sizes, pos, want = self.SIZES, table[0][3], []
        for chunk in ([0, 1, 2], [3, 4, 5], [6]):
            p = pos
            for i in chunk:
                want.append(p)
                p += sizes[i]
            pos = p
        assert [r[3] for r in table] == want
        assert [r[4] for r in table] == sizes

    def test_ctts_composition_offsets(self):
        ct = [0, 100, 0, 50, 0, -6, 0]
        table = mm.mp4_sample_table(self._mp4(ctts_offsets=ct))
        for i, row in enumerate(table):
            assert row[1] == (i * self.DELTA + ct[i]) * 1000 // 600

    def test_non_mp4_returns_none(self):
        for junk in (b'', b'not an mp4', b'\x00\x00\x00\x08free',
                     _make_wav([0] * 100)):
            assert mm.decode_mp4_meta(junk) is None
            assert mm.mp4_sample_table(junk) is None

    def test_truncated_payload_safe(self):
        whole = self._mp4()
        for cut in (4, 12, 30, 100, len(whole) - 5):
            mm.decode_mp4_meta(whole[:cut])  # must not raise
            mm.mp4_sample_table(whole[:cut])

    def test_video_meta_spark(self, spark_session):
        rows = [(1, bytearray(self._mp4(width=128, height=96))),
                (2, bytearray(b'MKV not supported'))]
        df = spark_session.createDataFrame(
            rows, 'media_id bigint, payload binary')
        out = {r['media_id']: r for r in mm.video_meta(
            df, on_undecodable='status').collect()}
        assert out[1]['decode_ok'] is True
        assert (out[1]['width'], out[1]['height']) == (128, 96)
        assert out[1]['n_frames'] == self.N
        assert out[2]['decode_ok'] is False
        with pytest.raises(Exception):
            mm.video_meta(df).collect()

    def test_mp4_samples_spark(self, spark_session):
        df = spark_session.createDataFrame(
            [(9, bytearray(self._mp4()))],
            'media_id bigint, payload binary')
        rows = sorted(
            mm.mp4_samples(df, keyframes_only=True).collect(),
            key=lambda r: r['sample_idx'])
        assert [r['sample_idx'] for r in rows] == [1, 4, 7]
        assert all(r['is_keyframe'] for r in rows)

    def test_keyframe_sample_plan(self, spark_session):
        """Every planned tick maps to the latest keyframe at or
        before it (keyframes at pts 0/250/500 ms; ticks every
        200 ms over 583 ms -> 0,200,400 -> keyframes 0,0,250)."""
        df = spark_session.createDataFrame(
            [(9, bytearray(self._mp4()))],
            'media_id bigint, payload binary')
        samples = mm.mp4_samples(df)
        durations = spark_session.createDataFrame(
            [(9, 583)], 'media_id bigint, duration_ms bigint')
        out = sorted(
            mm.keyframe_sample_plan(samples, durations, every_ms=200)
            .collect(), key=lambda r: r['frame_ts_ms'])
        assert [r['frame_ts_ms'] for r in out] == [0, 200, 400]
        assert [r['keyframe_pts_ms'] for r in out] == [0, 0, 250]
        assert [r['keyframe_idx'] for r in out] == [1, 1, 4]

    def test_keyframe_sample_ticks_before_first_keyframe(
            self, spark_session):
        """Ticks earlier than the first keyframe carry NULLs —
        counted, never silently dropped (samples built directly, no
        encoder: first keyframe at 500 ms)."""
        samples = spark_session.createDataFrame(
            [(9, 1, 500, True, 1000, 64), (9, 2, 900, False, 1064, 64)],
            'media_id bigint, sample_idx int, pts_ms bigint,'
            ' is_keyframe boolean, byte_offset bigint, byte_size bigint')
        durations = spark_session.createDataFrame(
            [(9, 1200)], 'media_id bigint, duration_ms bigint')
        out = sorted(
            mm.keyframe_sample_plan(samples, durations, every_ms=400)
            .collect(), key=lambda r: r['frame_ts_ms'])
        assert [r['frame_ts_ms'] for r in out] == [0, 400, 800]
        assert [r['keyframe_pts_ms'] for r in out] == [None, None, 500]
        assert out[2]['keyframe_idx'] == 1

    def test_keyframe_payloads_bytes_exact(self, spark_session):
        """The sliced blobs equal the encoder's known frame
        payloads: sample s (1-based) is byte (s % 251) repeated
        sizes[s-1] times."""
        df = spark_session.createDataFrame(
            [(9, bytearray(self._mp4()))],
            'media_id bigint, payload binary')
        rows = sorted(
            mm.keyframe_payloads(df).collect(),
            key=lambda r: r['sample_idx'])
        assert [r['sample_idx'] for r in rows] == [1, 4, 7]
        for r in rows:
            s = r['sample_idx']
            want = bytes([s % 251]) * self.SIZES[s - 1]
            assert bytes(r['frame_bytes']) == want
            assert r['byte_size'] == self.SIZES[s - 1]
            assert r['is_keyframe'] is True

    def test_keyframe_payloads_all_samples_multichunk(
            self, spark_session):
        """keyframes_only=False over a multi-chunk layout slices
        every sample correctly (exercises the stsc run expansion
        through the payload slicer)."""
        df = spark_session.createDataFrame(
            [(3, bytearray(self._mp4(samples_per_chunk=3)))],
            'media_id bigint, payload binary')
        rows = sorted(
            mm.keyframe_payloads(df, keyframes_only=False).collect(),
            key=lambda r: r['sample_idx'])
        assert len(rows) == self.N
        for r in rows:
            s = r['sample_idx']
            assert bytes(r['frame_bytes']) \
                == bytes([s % 251]) * self.SIZES[s - 1]

    def test_keyframe_payloads_truncated_payload(self,
                                                 spark_session):
        """A file cut mid-mdat yields the available prefix for the
        boundary frame and drops frames wholly past the end; the
        truncation is observable as byte_size != len(frame_bytes)."""
        whole = self._mp4()
        table = mm.mp4_sample_table(whole)
        # cut 10 bytes into keyframe 4's range
        k4 = next(r for r in table if r[0] == 4)
        cut = k4[3] + 10
        df = spark_session.createDataFrame(
            [(1, bytearray(whole[:cut]))],
            'media_id bigint, payload binary')
        rows = {r['sample_idx']: r
                for r in mm.keyframe_payloads(df).collect()}
        assert set(rows) == {1, 4}  # keyframe 7 starts past the cut
        assert len(bytes(rows[1]['frame_bytes'])) \
            == rows[1]['byte_size']
        assert len(bytes(rows[4]['frame_bytes'])) == 10
        assert rows[4]['byte_size'] == self.SIZES[3]

    def test_stsc_first_chunk_zero_degrades(self):
        """A corrupt stsc run with first_chunk=0 must stop the chunk
        walk (partial table), not wrap around to offsets[-1]."""
        whole = bytearray(self._mp4(samples_per_chunk=3))
        i = whole.find(b'stsc')
        # stsc payload: ver/flags(4) count(4) then (first, spc, sdi)
        first_off = i + 4 + 8
        assert int.from_bytes(whole[first_off:first_off + 4],
                              'big') == 1
        whole[first_off:first_off + 4] = (0).to_bytes(4, 'big')
        table = mm.mp4_sample_table(bytes(whole))
        assert table == []  # first run corrupt -> empty, no wrap


class TestMjpegDecodeLoop:
    """Demux -> decode: MJPEG-in-MP4 keyframe slices through the
    module's own JPEG decoder (no external codec)."""

    def test_constant_tile_roundtrip_exact_all_values(self):
        """The q_mjpeg_keyframe_decode oracle's closed form: with a
        flat quant=1 table a constant-gray tile decodes back to
        exactly v for EVERY v in 0..255 (DC quantizes losslessly,
        all AC terms are zero) — pinned here so the oracle is not
        circular with the decoder."""
        import numpy as np
        for v in range(256):
            jpg = mm.encode_jpeg(np.full((16, 24), v, np.uint8),
                                 quant=1)
            w, h, gray = mm.decode_jpeg(jpg)
            assert (w, h) == (24, 16)
            luma = np.rint(gray * 255.0)
            assert luma.min() == luma.max() == v, v

    def test_payloads_replace_filler_mdat(self):
        """encode_test_mp4(payloads=...) keeps the sample table
        honest: each keyframe slice IS the planted JPEG bytes."""
        import numpy as np
        jpgs = [mm.encode_jpeg(np.full((16, 16), v, np.uint8),
                               quant=1) for v in (10, 20, 30, 40)]
        mp4 = mm.encode_test_mp4(
            4, 60, 2, [len(p) for p in jpgs],
            width=16, height=16, payloads=jpgs)
        table = mm.mp4_sample_table(mp4)
        assert [r[0] for r in table] == [1, 2, 3, 4]
        for idx, pts, key, off, size in table:
            assert mp4[off:off + size] == jpgs[idx - 1]
            assert key == (idx in (1, 3))

    def test_payload_size_mismatch_rejected(self):
        import pytest as _pt
        with _pt.raises(AssertionError, match='sizes'):
            mm.encode_test_mp4(2, 60, 1, [5, 5], payloads=[b'abc',
                                                           b'de'])

    def test_decode_jpeg_frames_spark(self, spark_session):
        """Slicer -> decoder over Spark: stats are integer-exact and
        a corrupt frame comes back decoded=false with NULL stats
        instead of vanishing."""
        import numpy as np
        vals = (7, 131, 250)
        jpgs = [mm.encode_jpeg(np.full((16, 32), v, np.uint8),
                               quant=1) for v in vals]
        mp4 = mm.encode_test_mp4(
            3, 60, 1, [len(p) for p in jpgs],
            width=32, height=16, payloads=jpgs)
        df = spark_session.createDataFrame(
            [(5, bytearray(mp4))], 'media_id bigint, payload binary')
        frames = mm.keyframe_payloads(df)
        out = {r['sample_idx']: r
               for r in mm.decode_jpeg_frames(frames).collect()}
        assert set(out) == {1, 2, 3}
        for i, v in zip((1, 2, 3), vals):
            r = out[i]
            assert r['decoded'] is True
            assert (r['width'], r['height']) == (32, 16)
            assert r['n_pixels'] == 512
            assert r['luma_mean_255'] == r['luma_min_255'] \
                == r['luma_max_255'] == v
        # corrupt one frame's entropy bytes -> decoded=false row
        table = mm.mp4_sample_table(mp4)
        off = table[1][3]
        broken = bytearray(mp4)
        broken[off:off + 2] = b'\x00\x00'  # no SOI -> not a JPEG
        df2 = spark_session.createDataFrame(
            [(6, broken)], 'media_id bigint, payload binary')
        out2 = {r['sample_idx']: r for r in mm.decode_jpeg_frames(
            mm.keyframe_payloads(df2)).collect()}
        assert out2[2]['decoded'] is False
        assert out2[2]['luma_mean_255'] is None
        assert out2[1]['decoded'] is True

    def test_decode_jpeg_frames_truncated_midstream(
            self, spark_session):
        """A payload with a VALID SOI that is truncated or corrupted
        mid-stream can escape the bit-reader/Huffman tables as
        IndexError/KeyError/struct.error, not just ValueError — every
        such frame must come back decoded=false instead of failing
        the Spark task (r12 ADVICE)."""
        import numpy as np
        good = mm.encode_jpeg(
            np.arange(512, dtype=np.uint8).reshape(16, 32) % 251,
            quant=1)
        # valid SOI, body cut at many different points (header walk,
        # table parse, entropy scan) — exercises whatever exception
        # type each stage raises
        variants = [good[:n] for n in (4, 12, 40, len(good) // 2,
                                       len(good) - 10)]
        variants.append(good[:60] + b'\xff' * 40)  # garbage markers
        rows = [(i, 0, 0, bytearray(v))
                for i, v in enumerate(variants)]
        frames = spark_session.createDataFrame(
            rows, 'media_id bigint, sample_idx int, pts_ms bigint,'
                  ' frame_bytes binary')
        out = mm.decode_jpeg_frames(frames).collect()
        assert len(out) == len(variants)
        assert all(r['decoded'] is False and r['luma_mean_255'] is None
                   for r in out)
