"""Multimodal (image/audio/video) column plumbing.

North-star extension. Media payloads are opaque ``binary`` columns
with typed metadata (the Spark-idiomatic layout — same shape as
``spark.read.format('image')`` / Delta's media tables). All heavy
per-item work runs through ``mapInPandas`` with Arrow batches, so the
Spark-side contract (schema, batching, partition sizing) is real and
tested; the actual decoders are STUBBED behind ``_decode_image`` /
``_extract_audio_features`` because the codec libraries (Pillow,
ffmpeg, torchaudio) are not in this container — each stub raises
``NotImplementedError`` unless ``deterministic_fake=True``, which
produces seeded fake features so pipelines are testable end-to-end.
"""
from __future__ import annotations

import zlib
from typing import Iterator

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


def _decode_image(payload: bytes, deterministic_fake: bool):
    """STUB: decode an image payload to (width, height, feature[8]).

    Real implementation needs Pillow/torchvision (not in container).
    """
    if not deterministic_fake:
        raise NotImplementedError(
            'image decoding requires Pillow/torchvision; pass'
            ' deterministic_fake=True for plumbing tests'
        )
    h = zlib.crc32(payload) & 0xFFFFFFFF
    return (
        (h % 1920) + 1,
        ((h >> 8) % 1080) + 1,
        [float((h >> (i * 4)) & 0xF) / 15.0 for i in range(8)],
    )


def _extract_audio_features(payload: bytes, deterministic_fake: bool):
    """STUB: decode audio to (duration_ms, feature[8])."""
    if not deterministic_fake:
        raise NotImplementedError(
            'audio decoding requires ffmpeg/torchaudio; pass'
            ' deterministic_fake=True for plumbing tests'
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

    return df.select(id_col, payload_col).mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


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
        run, AUDIO_FEATURE_SCHEMA
    )


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
