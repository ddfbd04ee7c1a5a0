"""End-to-end streaming ingestion pipeline.

The streaming counterpart of ``training_data_pipeline.py``, composed
from ons_utils_spark streaming operators:

    event files arriving in a directory (file source, bounded
    micro-batches)
      → bounded-state dedup (dropDuplicatesWithinWatermark)
      → checkpointed, partitioned parquet sink (exactly-once)
    and, on the same stream,
      → watermarked tumbling-window aggregation
      → foreachBatch sink (update mode, driver-side merge)
    and, on a sequence-ordered replay,
      → per-key stateful EWMA baselines (applyInPandasWithState,
        recurrence state carried across micro-batches)

Everything is verified at the end against DuckDB on the source
parquet and against the same aggregation run in batch mode (the
window helpers share one code path for batch and streaming frames).

Run:  PYTHONPATH=. python examples/streaming_pipeline.py \
          [sf_dir] [work_dir]
"""
from __future__ import annotations

import os
import shutil
import sys

import duckdb
from pyspark.sql import functions as F

from ons_utils_spark import get_spark
from ons_utils_spark.sources.readers import read_parquet
from ons_utils_spark.streaming.sinks import (
    foreach_batch_sink,
    write_stream_parquet,
)
from ons_utils_spark.streaming.windows import (
    read_event_stream,
    streaming_dedup,
    tumbling_window_agg,
)

SCHEMA = ('event_id bigint, ts timestamp, user_id bigint, '
          'event_type string, value double, props string')


def stage_chunks(spark, events_path: str, stage_dir: str,
                 n_chunks: int = 5) -> None:
    """Split the source events into n parquet files, simulating files
    landing in an ingest directory."""
    read_parquet(spark, events_path).select(
        'event_id', 'ts', 'user_id', 'event_type', 'value', 'props'
    ).repartition(n_chunks).write.mode('overwrite').parquet(stage_dir)


def run_pipeline(spark, sf_dir: str, work: str) -> dict:
    """Run both streaming paths and verify them; returns check stats."""
    events_path = os.path.join(sf_dir, 'events.parquet')
    stage_dir = os.path.join(work, 'incoming')
    out_dir = os.path.join(work, 'bronze')
    shutil.rmtree(work, ignore_errors=True)

    stage_chunks(spark, events_path, stage_dir)

    # ---- path 1: dedup → exactly-once partitioned parquet ----------
    stream = read_event_stream(spark, stage_dir, SCHEMA,
                               max_files_per_trigger=2)
    # The staged replay arrives in RANDOM time order (each chunk spans
    # the whole month), so the dedup/watermark delay must cover the
    # full disorder — 35 days > the 30-day span. In production, with
    # roughly time-ordered arrival, this is the real disorder bound
    # (minutes/hours) and state stays correspondingly small.
    deduped = streaming_dedup(stream, 'event_id', ts_col='ts',
                              within='35 days')
    q1 = write_stream_parquet(
        deduped, out_dir, os.path.join(work, 'ckpt_bronze'),
        partition_by='event_type', available_now=True,
        query_name='bronze')
    q1.awaitTermination(300)

    # ---- path 2: windowed agg → foreachBatch (update mode) ---------
    windows = {}

    def merge_batch(batch_df, batch_id):
        # Driver-side merge: last update per window key wins. A
        # production target would upsert into a store keyed the same
        # way (idempotent per batch_id).
        for r in batch_df.collect():
            windows[(r['window_start'], r['event_type'])] = \
                (r['n_events'], r['sum_value'])

    agg_stream = tumbling_window_agg(
        read_event_stream(spark, stage_dir, SCHEMA,
                          max_files_per_trigger=2),
        ts_col='ts', duration='1 hour', groups='event_type',
        aggs=[F.count('*').alias('n_events'),
              F.round(F.sum('value'), 2).alias('sum_value')],
        watermark='35 days',  # covers the unordered replay, see above
    )
    q2 = foreach_batch_sink(
        agg_stream, merge_batch, os.path.join(work, 'ckpt_agg'),
        output_mode='update', available_now=True)
    q2.awaitTermination(300)

    # ---- verification ----------------------------------------------
    bronze = spark.read.parquet(out_dir)
    n_bronze = bronze.count()
    n_distinct, n_total = duckdb.sql(
        f"SELECT count(DISTINCT event_id), count(*) "
        f"FROM '{events_path}'").fetchone()
    print(f'bronze rows={n_bronze} source distinct ids={n_distinct} '
          f'(source total={n_total})')
    assert n_bronze == n_distinct, (n_bronze, n_distinct)

    per_type = dict(
        (r['event_type'], r['n'])
        for r in bronze.groupBy('event_type')
        .agg(F.count('*').alias('n')).collect()
    )
    for etype, n in duckdb.sql(
        f"SELECT event_type, count(DISTINCT event_id) "
        f"FROM '{events_path}' GROUP BY event_type").fetchall():
        assert per_type[etype] == n, (etype, per_type[etype], n)

    batch_agg = {
        (r['window_start'], r['event_type']):
            (r['n_events'], r['sum_value'])
        for r in tumbling_window_agg(
            read_parquet(spark, events_path).dropDuplicates(['event_id']),
            ts_col='ts', duration='1 hour', groups='event_type',
            aggs=[F.count('*').alias('n_events'),
                  F.round(F.sum('value'), 2).alias('sum_value')],
        ).collect()
    }
    assert windows == batch_agg, (
        len(windows), len(batch_agg),
        sorted(set(windows) ^ set(batch_agg))[:5])
    print(f'windowed agg: {len(windows)} windows match batch run')

    # ---- path 3: stateful EWMA baselines (custom operator state) ---
    # Sequence-ordered staging (one file per event_id third,
    # mtime-staggered so the file source replays them in order): the
    # recurrence is order-sensitive, so this path models the
    # production case of roughly in-order arrival; the watermarked
    # paths above deliberately model the out-of-order case.
    from ons_utils_spark.streaming.stateful import streaming_ewma

    ordered_dir = os.path.join(work, 'ordered')
    src = read_parquet(spark, events_path).dropDuplicates(['event_id'])
    bounds = src.approxQuantile(
        'event_id', [1 / 3, 2 / 3], 0.0)
    chunks = [
        src.filter(F.col('event_id') < bounds[0]),
        src.filter((F.col('event_id') >= bounds[0])
                   & (F.col('event_id') < bounds[1])),
        src.filter(F.col('event_id') >= bounds[1]),
    ]
    for i, chunk in enumerate(chunks):
        path = os.path.join(ordered_dir, f'chunk={i}')
        chunk.coalesce(1).write.mode('overwrite').parquet(path)
        for name in os.listdir(path):
            full = os.path.join(path, name)
            os.utime(full, (1_700_000_000 + i, 1_700_000_000 + i))

    smoothed = streaming_ewma(
        spark.readStream.schema(SCHEMA)
        .option('maxFilesPerTrigger', 1)
        .option('recursiveFileLookup', 'true').parquet(ordered_dir),
        'user_id', 'value', 'event_id', alpha=0.3)
    q3 = (smoothed.writeStream.format('memory')
          .queryName('ewma_sink').outputMode('append')
          .option('checkpointLocation', os.path.join(work, 'ckpt_ewma'))
          .trigger(availableNow=True).start())
    q3.awaitTermination(300)

    got = {(r['key'], r['seq']): r['ewma'] for r in
           spark.sql('SELECT * FROM ewma_sink').collect()}
    want = {(r['key'], r['seq']): r['ewma'] for r in
            streaming_ewma(src, 'user_id', 'value', 'event_id',
                           alpha=0.3).collect()}
    assert len(got) == len(want)
    mismatched = [k for k in want
                  if abs((got[k] or 0) - (want[k] or 0)) > 1e-9]
    assert not mismatched, mismatched[:5]
    print(f'streaming EWMA: {len(got)} rows match the batch walk')

    # ---- path 4: embedding dedup-at-ingest -------------------------
    # Vectors arriving in batches are filtered against everything
    # already accepted (durable hyperplane-LSH band store + exact
    # cosine verify). Clones of early vectors are planted under high
    # ids so the cross-batch path has real work; the accepted set is
    # verified against a DuckDB exact-cosine NOT EXISTS replay.
    from ons_utils_spark.streaming.incremental import (
        incremental_embedding_dedup)

    emb_path = os.path.join(sf_dir, 'embeddings.parquet')
    emb = read_parquet(spark, emb_path).select('vec_id', 'embedding')
    clones = (
        emb.filter(F.col('vec_id') < 4)
        .select((F.col('vec_id') + F.lit(9_000_000)).alias('vec_id'),
                'embedding'))
    vec_src = os.path.join(work, 'vec_incoming')
    (emb.unionByName(clones).repartitionByRange(3, 'vec_id')
     .write.mode('overwrite').parquet(vec_src))
    parts = sorted(p for p in os.listdir(vec_src)
                   if p.startswith('part-'))
    for i, p in enumerate(parts):  # batch order = id order
        os.utime(os.path.join(vec_src, p),
                 (1_700_000_000 + i, 1_700_000_000 + i))
    q4 = incremental_embedding_dedup(
        spark.readStream
        .schema(emb.schema)
        .option('maxFilesPerTrigger', 1).parquet(vec_src),
        out_dir=os.path.join(work, 'vec_accepted'),
        store_dir=os.path.join(work, 'vec_store'),
        checkpoint=os.path.join(work, 'ckpt_vec'),
        threshold=0.95)
    q4.awaitTermination(300)
    accepted = sorted(
        r['vec_id'] for r in
        spark.read.parquet(os.path.join(work, 'vec_accepted'))
        .select('vec_id').collect())
    want_accept = sorted(r[0] for r in duckdb.sql(f"""
        WITH corpus AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM '{emb_path}'
            UNION ALL
            SELECT vec_id + 9000000, CAST(embedding AS DOUBLE[])
            FROM '{emb_path}' WHERE vec_id < 4
        )
        SELECT a.vec_id FROM corpus a
        WHERE NOT EXISTS (
            SELECT 1 FROM corpus b
            WHERE b.vec_id < a.vec_id
              AND list_cosine_similarity(b.v, a.v) >= 0.95)
        """).fetchall())
    assert accepted == want_accept, (
        len(accepted), len(want_accept),
        sorted(set(accepted) ^ set(want_accept))[:5])
    n_staged = emb.count() + 4
    print(f'embedding dedup-at-ingest: {len(accepted)} of {n_staged} '
          f'accepted — matches DuckDB exact-cosine replay')
    return {'n_bronze': n_bronze, 'n_windows': len(windows),
            'n_ewma': len(got), 'n_vec_accepted': len(accepted)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    work = sys.argv[2] if len(sys.argv) > 2 else '/tmp/streaming_pipeline'
    spark = get_spark('streaming-pipeline', master='local[8]',
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')
    run_pipeline(spark, sf_dir, work)
    print('STREAMING-PIPELINE-OK')
    spark.stop()


if __name__ == '__main__':
    main()
