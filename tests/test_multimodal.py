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


def test_frame_sample_plan(spark_session):
    vids = spark_session.createDataFrame(
        [(1, 2500), (2, 0)], 'media_id bigint, duration_ms int'
    )
    out = mm.frame_sample_plan(vids, every_ms=1000).collect()
    got = sorted((r['media_id'], r['frame_ts_ms']) for r in out)
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]
