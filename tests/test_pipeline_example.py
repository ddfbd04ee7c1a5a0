"""Integration test: the example curation pipeline end-to-end."""
from examples.training_data_pipeline import curate, report
from ons_utils_spark.sources.readers import load_tables


def test_pipeline_on_testdata(spark_session, tmp_path):
    docs = load_tables(
        spark_session, '/root/testdata/sf0.001', tables=['documents']
    )['documents']
    curated = curate(docs, quality_threshold=0.2)
    n = curated.count()
    assert 0 < n <= docs.count()
    assert {'doc_id', 'text', 'quality', 'lang_pred', 'fp64'} \
        <= set(curated.columns)

    from pyspark.sql import functions as F

    from examples.training_data_pipeline import seed_score, vocab_report
    curated = seed_score(curated)
    assert 'seed_score' in curated.columns
    assert curated.filter(F.col('seed_score').isNull()).count() == 0
    oov = {r['lang_pred']: r for r in vocab_report(curated).collect()}
    assert all(0 <= r['oov_ratio'] <= 1 for r in oov.values())

    stats = report(curated)
    rows = stats.collect()
    assert sum(r['n_docs'] for r in rows) == n
    assert all(0.0 <= r['avg_quality'] <= 1.0 for r in rows)

    from examples.training_data_pipeline import holdout_split
    split = holdout_split(curated)
    counts = {r['split']: r['count']
              for r in split.groupBy('split').count().collect()}
    assert counts.get('train', 0) + counts.get('holdout', 0) == n
    # determinism: same rows land in the same split on a re-run
    again = {r['split']: r['count']
             for r in holdout_split(curated)
             .groupBy('split').count().collect()}
    assert counts == again


def test_pipeline_drops_planted_duplicates(spark_session):
    base = ('the quick brown fox jumps over the lazy dog and then '
            'runs far away into the deep green forest tonight while '
            'stars shine bright over the quiet sleeping town below')
    rows = [
        (1, base), (2, base.upper()),
        (3, base.replace('quick', 'swift')),
        (4, 'x'),  # too short -> quality filtered
    ]
    docs = spark_session.createDataFrame(
        rows, 'doc_id bigint, text string'
    )
    curated = curate(docs, quality_threshold=0.3,
                     jaccard_threshold=0.5)
    ids = sorted(r['doc_id'] for r in curated.collect())
    assert ids == [1]


def test_streaming_pipeline_on_testdata(spark_session, tmp_path):
    """Streaming example end-to-end: dedup → exactly-once parquet
    sink, windowed agg → foreachBatch, both verified inside
    run_pipeline (DuckDB + batch-mode parity)."""
    from examples.streaming_pipeline import run_pipeline

    stats = run_pipeline(
        spark_session, '/root/testdata/sf0.001', str(tmp_path / 'wk'))
    assert stats['n_bronze'] == 1000
    assert stats['n_windows'] > 0
    assert stats['n_ewma'] == 1000  # stateful path covers every row


def test_training_chunks(spark_session):
    from examples.training_data_pipeline import to_training_chunks

    docs = spark_session.createDataFrame(
        [(1, ' '.join(f'w{i}' for i in range(300))
          + ' mail me@example.com')],
        'doc_id bigint, text string')
    chunks = to_training_chunks(docs, chunk_tokens=128,
                                overlap_tokens=0).collect()
    # 301 tokens -> chunks of 128/128/45
    assert [r['chunk_idx'] for r in chunks] == [0, 1, 2]
    assert all('me@example.com' not in r['chunk'] for r in chunks)
    assert any('<EMAIL>' in r['chunk'] for r in chunks)


def test_similarity_pipeline_on_testdata(spark_session):
    from pyspark.sql import functions as F

    from examples.similarity_search_pipeline import (build_and_search,
                                                     dedup_corpus)

    emb = load_tables(
        spark_session, '/root/testdata/sf0.001', tables=['embeddings']
    )['embeddings']
    corpus = dedup_corpus(emb)
    assert 0 < corpus.count() <= emb.count()

    queries = emb.limit(3).select(
        F.col('vec_id').alias('query_id'),
        F.col('embedding').alias('query_vec'),
    )
    out = build_and_search(corpus, queries, k=5)
    counts = {r['query_id']: r['count']
              for r in out.groupBy('query_id').count().collect()}
    assert len(counts) == 3
    assert all(c == 5 for c in counts.values())


def test_multimodal_pipeline(spark_session, tmp_path):
    """binaryFile scan → decode → features → cosine top-k, with the
    size cap and glob dropping the planted junk files."""
    from examples.multimodal_pipeline import run, synthesize_media

    media = str(tmp_path / 'media')
    synthesize_media(media, n_images=10, n_wavs=3)
    img_feats, wav_feats, top = run(spark_session, media)
    assert img_feats.count() == 10
    assert wav_feats.count() == 3
    rows = top.collect()
    assert len(rows) == 4
    # self-match ranks first with cosine ~1
    best = max(rows, key=lambda r: r['cosine'])
    assert best['query_id'] == best['media_id']
    assert abs(best['cosine'] - 1.0) < 1e-9


def test_pipeline_packing_and_drift(spark_session):
    from examples.training_data_pipeline import (
        curate, holdout_split, pack_chunks, split_drift,
        to_training_chunks,
    )
    from pyspark.sql import functions as F

    docs = load_tables(
        spark_session, '/root/testdata/sf0.001', tables=['documents']
    )['documents']
    split = holdout_split(curate(docs, quality_threshold=0.2))

    drift = split_drift(split).collect()[0]
    assert 0.0 <= drift['jsd'] <= 0.6932  # JSD ∈ [0, ln 2]

    chunks = to_training_chunks(split.filter(F.col('split') == 'train'))
    packed = pack_chunks(chunks, budget=256)
    assert packed.count() == chunks.count()  # packing drops nothing
    stats = (packed.groupBy('shard', 'bin_id')
             .agg(F.sum('chunk_tokens').alias('fill'),
                  F.count('*').alias('n'))
             .collect())
    assert all(r['fill'] <= 256 for r in stats if r['n'] > 1)


def test_incremental_ingest_drops_cross_batch_dups(spark_session):
    from examples.training_data_pipeline import incremental_ingest
    base = ('the quick brown fox jumps over the lazy dog while the '
            'cat watches from the warm windowsill in afternoon sun')
    corpus = spark_session.createDataFrame(
        [(1, base),
         (2, 'existing corpus document about distributed query '
             'engines and their adaptive execution strategies')],
        'doc_id long, text string')
    new = spark_session.createDataFrame(
        [(10, base.upper()),        # dup of corpus doc 1
         (11, 'genuinely new content about growing tomatoes in '
              'cold northern climates with frost protection'),
         (12, base + '  '),         # dup of 1 AND of 10
         ],
        'doc_id long, text string')
    kept = incremental_ingest(corpus, new, num_hashes=16, bands=8)
    ids = {r['doc_id'] for r in kept.collect()}
    assert 11 in ids           # new content survives
    assert 12 not in ids       # within-batch dup removed first
    assert 10 not in ids       # cross-batch dup dropped via index


def test_robots_gate_blocks_disallowed_lang(spark_session):
    from examples.training_data_pipeline import robots_gate
    docs = load_tables(
        spark_session, '/root/testdata/sf0.001',
        tables=['documents'])['documents']
    kept = robots_gate(docs)
    langs = {r['lang'] for r in kept.select('lang').distinct().collect()}
    assert 'zh' not in langs  # planted Disallow: /zh
    # nothing else dropped
    from pyspark.sql import functions as F
    assert kept.count() == docs.where(F.col('lang') != 'zh').count()


def test_bloom_prefilter_changes_nothing(spark_session):
    """Bloom has no false negatives: prefiltered decontamination
    keeps exactly the docs the exact path keeps."""
    from pyspark.sql import functions as F

    from examples.training_data_pipeline import decontaminate
    docs = load_tables(
        spark_session, '/root/testdata/sf0.001',
        tables=['documents'])['documents']
    bench = docs.filter(F.col('doc_id') < 20)
    with_bloom = {r['doc_id'] for r in
                  decontaminate(docs, bench).select('doc_id').collect()}
    exact = {r['doc_id'] for r in
             decontaminate(docs, bench, bloom_bits=0)
             .select('doc_id').collect()}
    assert with_bloom == exact
    assert len(exact) < docs.count()  # the guard actually bites
