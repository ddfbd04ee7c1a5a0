"""End-to-end multimodal ingestion + similarity pipeline.

    image/audio files on disk
      → binaryFile scan (glob + size cap BEFORE bytes move)
      → decode + feature extraction (Arrow-batched mapInPandas)
      → feature table (typed metadata + array<float> feature)
      → exact cosine top-k against a probe image

The decoders are the real ones from ``operators.multimodal``
(PNG/BMP/PPM zlib+numpy, WAV PCM); the feature is a luminance
histogram for images and an energy envelope for audio — stand-ins
for a learned embedding, with the Spark-side plumbing (schema,
batching, id typing, search) identical to the real thing.  Video
adds the container-parse path: MP4 files are box-walked for
metadata and keyframe byte ranges, and the sampling grid aligns to
keyframes — the decode-cheap plan a codec stage would consume.

Run:  PYTHONPATH=. python examples/multimodal_pipeline.py [work_dir]
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
from pyspark.sql import functions as F

from ons_utils_spark import get_spark
from ons_utils_spark.operators.multimodal import (
    audio_features,
    encode_test_mp4,
    image_features,
    keyframe_payloads,
    keyframe_sample_plan,
    mp4_samples,
    video_meta,
)
from ons_utils_spark.operators.similarity import cosine_topk
from ons_utils_spark.sources.readers import read_binary_files


def synthesize_media(media_dir: str, n_images: int = 24,
                     n_wavs: int = 8) -> None:
    """Write small deterministic PNGs and WAVs (plus one oversized
    blob and one non-media file that the scan must skip/drop)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'tests'))
    from test_multimodal import _make_png, _make_wav

    os.makedirs(media_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n_images):
        h, w = 8 + (i % 5), 8 + ((i * 3) % 7)
        px = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        with open(os.path.join(media_dir, f'img_{i:03d}.png'), 'wb') as f:
            f.write(_make_png(px, color_type=2))
    for i in range(n_wavs):
        tone = (np.sin(np.linspace(0, 40 + i * 7, 1600))
                * 12000).astype(np.int16)
        with open(os.path.join(media_dir, f'clip_{i:02d}.wav'), 'wb') as f:
            f.write(_make_wav(tone, rate=8000))
    for i in range(6):
        n_frames, key_every = 10 + i * 3, 2 + (i % 3)
        sizes = [80 + (i * 31 + j * 17) % 60 for j in range(n_frames)]
        with open(os.path.join(media_dir, f'vid_{i:02d}.mp4'),
                  'wb') as f:
            f.write(encode_test_mp4(
                n_frames, 40 + 10 * (i % 2), key_every, sizes,
                width=64 + 16 * i, height=48 + 16 * i))
    with open(os.path.join(media_dir, 'huge.png'), 'wb') as f:
        f.write(b'\x89PNG' + b'\0' * 3_000_000)  # dropped by size cap
    with open(os.path.join(media_dir, 'README.txt'), 'w') as f:
        f.write('not media')  # skipped by glob at listing time


def run(spark, media_dir: str):
    images = read_binary_files(
        spark, media_dir, glob='*.png', max_bytes=1_000_000)
    audio = read_binary_files(spark, media_dir, glob='*.wav')

    img_feats = image_features(
        images.withColumnRenamed('content', 'payload'),
        payload_col='payload', id_col='path')
    wav_feats = audio_features(
        audio.withColumnRenamed('content', 'payload'),
        payload_col='payload', id_col='path')

    videos = read_binary_files(
        spark, media_dir, glob='*.mp4'
    ).withColumnRenamed('content', 'payload')
    vid_meta = video_meta(videos, id_col='path')
    samples = mp4_samples(videos, id_col='path')
    frames = keyframe_sample_plan(
        samples,
        vid_meta.select('media_id', 'duration_ms'),
        every_ms=250)
    # …and the actual bytes: per-keyframe mdat blobs, ready for a
    # codec stage (one moov parse + slice pass per file)
    blobs = keyframe_payloads(videos, id_col='path')

    n_img, n_wav = img_feats.count(), wav_feats.count()
    n_vid, n_frames = vid_meta.count(), frames.count()
    n_blob = blobs.count()
    print(f'decoded images={n_img} audio clips={n_wav} '
          f'videos={n_vid} sampled keyframe ranges={n_frames} '
          f'sliced keyframe blobs={n_blob}')

    # probe: most similar images to the first one (by path order)
    probe = (
        img_feats.orderBy('media_id').limit(1)
        .select(F.col('media_id').alias('query_id'),
                F.col('feature').alias('query_vec'))
    )
    top = cosine_topk(
        img_feats.select('media_id', 'feature'), probe, k=4,
        corpus_id='media_id', corpus_vec='feature')
    return img_feats, wav_feats, top


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/multimodal_demo'
    shutil.rmtree(work, ignore_errors=True)
    media_dir = os.path.join(work, 'media')
    synthesize_media(media_dir)

    spark = get_spark('multimodal-pipeline')
    spark.sparkContext.setLogLevel('ERROR')
    img_feats, wav_feats, top = run(spark, media_dir)
    print('nearest to probe image:')
    top.show(truncate=60)
    assert img_feats.count() == 24  # oversized + txt excluded
    assert wav_feats.count() == 8
    print('ok')


if __name__ == '__main__':
    main()
