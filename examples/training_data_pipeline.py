"""End-to-end training-data curation pipeline.

The canonical 100 TB use-case this engine is built for, composed
entirely from ons_utils_spark operators:

    raw documents
      → robots.txt politeness gate (broadcast rule join)
      → canonical-URL crawl dedup (one groupBy shuffle)
      → text stats + quality scoring (JVM expressions)
      → quality + compressibility filter (zlib spam screen)
      → exact dedup (hash groupBy)
      → MinHash-LSH near-dedup (banded candidates + Jaccard verify)
      → winnowing sweep (guaranteed-detection residual near-dups)
      → benchmark decontamination (Bloom bitmap prefilter +
        exact 4-gram confirm — zero corpus shuffle)
      → seed-set classifier scoring (CCNet/DCLM token log-odds)
      → vocabulary/OOV report (tokenizer sizing)
      → deterministic train/holdout split + JSD drift check
      → per-source token-budget mixture + reproducible epoch order
      → PII-redacted context chunks → greedy sequence packing
      → curated parquet + per-language stats

Run:  PYTHONPATH=. python examples/training_data_pipeline.py \
          [sf_dir] [output_dir]
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ons_utils_spark import get_spark
from ons_utils_spark.operators import dedup as dd
from ons_utils_spark.operators import text as tx
from ons_utils_spark.sources.readers import load_tables, write_parquet


def robots_gate(documents: DataFrame) -> DataFrame:
    """Politeness gate AHEAD of URL dedup: keep only pages the
    hosts' robots.txt allows for agent ``*``.  The policy files are
    synthesized here (block ``/zh`` everywhere — a real crawl
    fetches one robots.txt per host); verdicts are one broadcast
    rule join + one URL-keyed aggregate, no UDFs."""
    from ons_utils_spark.operators import robots as rb

    hosts = documents.select('source').distinct().select(
        F.concat(F.col('source'), F.lit('.example.com')).alias('host'),
        F.lit('User-agent: googlebot\nDisallow: /\n\n'
              'User-agent: *\nDisallow: /zh\n').alias('robots_txt'))
    urls = documents.select(
        'doc_id',
        F.concat(F.lit('https://'), F.col('source'),
                 F.lit('.example.com/'), F.col('lang'),
                 F.lit('/page'),
                 (F.col('doc_id') % 50).cast('string')).alias('url'))
    fetchable = rb.crawl_allowed(urls, 'url', rb.parse_robots(hosts))
    allowed_urls = urls.join(fetchable.where(F.col('allowed')),
                             on='url', how='left_semi')
    # Fetch scheduling for the allowed frontier: per-host politeness
    # waves (one host-keyed window) spaced by each host's effective
    # Crawl-delay (1.0s default here — the planted policies carry
    # none).  The makespan print shows the slowest host's timeline.
    from ons_utils_spark.operators.web import crawl_frontier, url_host

    frontier = crawl_frontier(
        allowed_urls.withColumn('host', url_host('url')),
        'url', 'host', per_host_per_wave=4)
    delays = rb.crawl_delays(hosts)
    makespan = (frontier.groupBy('host')
                .agg(F.max('wave').alias('waves'))
                .join(F.broadcast(delays), 'host')
                .agg(F.max(F.col('waves') * 4 * F.col('crawl_delay'))
                     .alias('sec')).first()['sec'])
    print(f'frontier politeness makespan: ~{makespan:.0f}s at 4 '
          'fetches/host/wave')
    keep = allowed_urls.select('doc_id')
    return documents.join(keep, on='doc_id', how='left_semi')


def ingest_url_dedup(documents: DataFrame) -> DataFrame:
    """Crawl-front-door stage: canonical-URL dedup BEFORE any text
    processing (the same page arrives under tracking params, case
    variants, and fragments).  The URL column here is synthesized
    from doc columns (the corpus has none); with a real crawl it is
    the WARC target URI.  One groupBy shuffle; the canonicalization
    itself is a pure codegen projection."""
    from ons_utils_spark.operators import web

    urls = documents.select(
        'doc_id',
        F.concat(
            F.lit('HtTpS://WWW.'), F.col('source'),
            F.lit('.ExAmPle.com:443/'), F.col('lang'),
            F.lit('/page'), (F.col('doc_id') % 50).cast('string'),
            F.lit('?utm_source=crawl&id='),
            (F.col('doc_id') % 10).cast('string'),
        ).alias('url'))
    keep = web.url_dedup(urls, 'url', 'doc_id').select('doc_id')
    # Domain grouping for source weighting: PSL-EXACT eTLD+1 via the
    # bundled Public Suffix List snapshot (pass a full snapshot path
    # in production) — not the 10-suffix codegen heuristic.  One
    # chain of broadcast joins, then the same groupBy any per-domain
    # stat needs.
    suffixes = web.load_public_suffixes()
    (web.with_registrable_domain(urls, 'url', suffixes=suffixes)
     .groupBy('domain')
     .agg(F.count(F.lit(1)).alias('n_pages'))
     .orderBy(F.desc('n_pages'))
     .show(5, truncate=False))
    return documents.join(keep, on='doc_id', how='left_semi')


def domain_gate(documents: DataFrame, min_docs: int = 10,
                max_fail_num: int = 2,
                max_fail_den: int = 5) -> DataFrame:
    """Domain-level gate (RefinedWeb/FineWeb shape): census every
    source domain's cheap-quality failure rate, derive the
    blocklist with an evidence floor, and anti-join it back —
    one aggregate + one broadcast anti-join, BEFORE any per-doc
    dedup spends work on pages a domain verdict would discard."""
    from ons_utils_spark.operators.web import quality_blocklist

    flagged = documents.withColumn(
        '__q_ok', tx.quality_score('text') >= 0.4)
    census = quality_blocklist(
        flagged, 'source', '__q_ok', min_docs=min_docs,
        max_fail_num=max_fail_num, max_fail_den=max_fail_den)
    blocked = census.filter('blocked').select('source')
    return flagged.join(F.broadcast(blocked), 'source',
                        'left_anti').drop('__q_ok')


def contamination_audit(curated: DataFrame,
                        benchmark: DataFrame,
                        gram_n: int = 4) -> DataFrame:
    """EXACT contamination evidence (GPT-3 appendix-C audit table):
    which benchmark items leak into which surviving documents, how
    many n-grams, and where.  The Bloom-prefiltered
    :func:`decontaminate` stage DROPS tainted docs wholesale; this
    names them — the artifact a release review reads.  Benchmark
    grams broadcast; the corpus is scanned once."""
    from ons_utils_spark.operators.dedup import ngram_contamination

    bench = benchmark.select(
        F.col('doc_id').alias('bench_id'), 'text')
    return ngram_contamination(curated, bench, n=gram_n)


def mixing_plan(train: DataFrame,
                budget_tokens: int = 50_000) -> DataFrame:
    """Language-mixture plan for the training run: temperature
    smoothing (mT5 α=0.25 — sqrt-chain exact) over per-language
    token capacities, with the UniMax epoch-capped allocation
    alongside for comparison — both run their windows over the
    languages-row aggregate, never corpus rows."""
    from ons_utils_spark.operators.sampling import (
        temperature_allocation, unimax_allocation)

    temp = temperature_allocation(
        train, 'lang_pred', 'n_tokens', alpha=0.25,
        budget=budget_tokens)
    uni = unimax_allocation(
        train, 'lang_pred', 'n_tokens', max_epochs=2.0,
        budget=float(budget_tokens)).select(
        'lang_pred', F.col('allocation').alias('unimax_alloc'))
    return temp.join(uni, 'lang_pred')


def curate(documents: DataFrame, quality_threshold: float = 0.5,
           jaccard_threshold: float = 0.8) -> DataFrame:
    """Quality-filter then dedup a documents frame (returns curated)."""
    scored = documents.select(
        '*',
        tx.quality_score('text').alias('quality'),
        tx.language_id('text').alias('lang_pred'),
        tx.token_count('text').alias('n_tokens'),
        tx.fingerprint('text', 64).alias('fp64'),
        tx.compression_ratio('text').alias('zratio'),
    )
    # compressibility screen: near-zero zlib ratio = degenerate
    # repetition (spam/boilerplate) the heuristic score can miss;
    # NULL ratio (empty text) fails the quality gate anyway.
    quality_ok = scored.filter(
        (F.col('quality') >= quality_threshold)
        & (F.col('zratio').isNull() | (F.col('zratio') >= 0.05)))
    exact_unique = dd.exact_dedup(quality_ok, 'text', 'doc_id')
    return dd.minhash_dedup(
        exact_unique, 'doc_id', 'text',
        num_hashes=64, bands=16, jaccard_threshold=jaccard_threshold,
    )


def winnow_sweep(curated: DataFrame, min_shared: int = 20) -> DataFrame:
    """Residual near-dup sweep after MinHash: winnowing has a
    deterministic detection guarantee (any >= k+w-1-token overlap
    shares a fingerprint), so it catches pairs the probabilistic
    bands missed. Keeps the lower doc_id of each surviving pair."""
    pairs = dd.winnow_dup_pairs(
        curated, 'doc_id', 'text', k=4, w=3, min_shared=min_shared)
    losers = pairs.select(F.col('id_b').alias('doc_id')).distinct()
    return curated.join(losers, on='doc_id', how='left_anti')


def decontaminate(curated: DataFrame, benchmark: DataFrame,
                  gram_n: int = 4,
                  bloom_bits: int = 1 << 17) -> DataFrame:
    """Drop curated docs sharing any word n-gram with the benchmark
    set (eval-set leakage guard).  A Bloom bitmap over the benchmark
    grams prefilters the corpus grams in the SCAN (zero shuffle, no
    join for the overwhelming definitely-absent majority — Bloom
    filters have no false negatives, so nothing tainted slips
    through); only the surviving maybes hit the exact broadcast
    semi-join confirm.  ``bloom_bits=0`` disables the prefilter —
    results are identical by construction."""
    from ons_utils_spark.plans.queries import _word_grams

    def grams(df):
        return df.select(
            'doc_id',
            F.explode(F.array_distinct(_word_grams(F.col('text'), gram_n))
                      ).alias('g'))

    bench_grams = grams(benchmark).select('g').distinct()
    corpus_grams = grams(curated)
    if bloom_bits:
        from ons_utils_spark.operators import bloom as bm

        bitmap = bm.bloom_to_bitmap(
            bm.bloom_build(bench_grams, 'g', bloom_bits, 5),
            bloom_bits)
        corpus_grams = corpus_grams.where(
            bm.bloom_might_contain('g', bitmap, bloom_bits, 5))
    tainted = (
        corpus_grams
        .join(F.broadcast(bench_grams), on='g', how='left_semi')
        .select('doc_id').distinct()
    )
    return curated.join(tainted, on='doc_id', how='left_anti')


def report(curated: DataFrame) -> DataFrame:
    """Per-language curation stats."""
    agg = [
        F.count('*').alias('n_docs'),
        F.round(F.avg('quality'), 4).alias('avg_quality'),
        F.round(F.avg('n_tokens'), 2).alias('avg_tokens'),
    ]
    if 'seed_score' in curated.columns:
        agg.append(
            F.round(F.avg('seed_score'), 4).alias('avg_seed_score'))
    return curated.groupBy('lang_pred').agg(*agg)


def seed_score(curated: DataFrame, seed_lang: str = 'en') -> DataFrame:
    """CCNet/DCLM-style quality scoring: train token log-odds
    separating documents language-ID'd as the seed slice from the
    rest (one token-keyed hash agg), then score every doc with a
    broadcast weight join, length-normalized. The score feeds
    curation dashboards and top-p selection; here it lands in the
    per-language report."""
    from ons_utils_spark.operators.classifier import (
        score_texts, train_token_weights)

    labeled = curated.withColumn(
        '__is_seed', (F.col('lang_pred') == seed_lang).cast('int'))
    wts = train_token_weights(labeled, 'text', '__is_seed', min_df=2)
    scores = score_texts(curated, wts, 'text', keep=('doc_id',),
                         length_normalize=True)
    return curated.join(
        scores.select('doc_id', F.col('score').alias('seed_score')),
        on='doc_id', how='left')


def vocab_report(curated: DataFrame, top_k: int = 500) -> DataFrame:
    """Tokenizer-sizing artifact: per-language OOV rate against the
    corpus top-``top_k`` vocabulary (broadcast membership — the
    corpus explode never shuffles for the test)."""
    from ons_utils_spark.operators.vocab import build_vocab, oov_stats

    vocab = build_vocab(curated, 'text', top_k=top_k)
    return oov_stats(curated, vocab, by=('lang_pred',))


def fertility_report(curated: DataFrame,
                     top_k: int = 500) -> DataFrame:
    """Tokenizer-fairness artifact: per-language fertility (tokens
    per word) under the word-or-characters cost model against the
    same top-``top_k`` vocabulary — the premium each language pays
    for a shared vocabulary (Petrov et al. 2023)."""
    from ons_utils_spark.operators.vocab import (
        build_vocab, tokenizer_fertility)

    vocab = build_vocab(curated, 'text', top_k=top_k)
    return tokenizer_fertility(curated, vocab, by=('lang_pred',))


def onion_gate(documents: DataFrame,
               max_fraction: float = 0.8) -> DataFrame:
    """Onion-style cross-document repetition gate (Pomikálek 2011),
    run BEFORE pairwise dedup: drop documents whose positional
    5-gram occurrences are mostly cross-document duplicates.  Exact
    on content overlap with NO pair join (md5 gram census), so it
    cheaply strips boilerplate-dominated pages and shrinks the
    MinHash stage's candidate volume."""
    from ons_utils_spark.operators.dedup import (
        duplicate_ngram_fraction)

    verdicts = duplicate_ngram_fraction(
        documents, 'doc_id', 'text', n=5,
        max_fraction=max_fraction)
    return documents.join(
        verdicts.filter(F.col('keep')).select('doc_id'),
        on='doc_id', how='inner')


def to_training_chunks(curated: DataFrame, chunk_tokens: int = 256,
                       overlap_tokens: int = 32) -> DataFrame:
    """Final corpus-prep step: PII-redact then split each curated doc
    into overlapping context-window chunks, one row per chunk."""
    redacted = curated.select(
        'doc_id', tx.redact_pii(tx.clean_text('text')).alias('text'))
    return redacted.select(
        'doc_id',
        F.posexplode(
            tx.chunk_text('text', chunk_tokens, overlap_tokens)
        ).alias('chunk_idx', 'chunk'),
    )


def holdout_split(curated: DataFrame, id_col: str = 'doc_id',
                  holdout_pct: int = 16) -> DataFrame:
    """Tag each row 'train' / 'holdout' by deterministic md5-prefix
    hash of its id — reproducible across runs, engines, and scales
    (no RNG state to ship), and a pure scan-side expression. 16% ≈
    prefixes 00-28 of 256."""
    bound = format(max(0, holdout_pct * 256 // 100 - 1), '02x')
    return curated.withColumn(
        'split',
        F.when(
            F.substring(F.md5(F.col(id_col).cast('string')), 1, 2)
            <= bound,
            F.lit('holdout')).otherwise(F.lit('train')),
    )


def pack_chunks(chunks: DataFrame, budget: int = 512,
                n_shards: int = 8) -> DataFrame:
    """Pack context-window chunks into fixed token budgets (LLM
    sequence packing): shard deterministically, then greedy first-fit
    per shard in (doc_id, chunk_idx) order — bins never span shards,
    so shards are the parallelism unit."""
    from ons_utils_spark.operators.packing import pack_greedy

    sized = chunks.select(
        '*',
        (F.col('doc_id') % n_shards).alias('shard'),
        tx.token_count('chunk').cast('long').alias('chunk_tokens'),
        # one total order within a shard
        (F.col('doc_id') * 100000 + F.col('chunk_idx')).alias('seq'),
    )
    return pack_greedy(sized, budget, group_col='shard',
                       order_col='seq', token_col='chunk_tokens')


def split_drift(split: DataFrame) -> DataFrame:
    """Sanity check that the holdout is distributionally like the
    train set: Jensen-Shannon divergence between their token
    distributions (near 0 = healthy random split)."""
    from ons_utils_spark.operators.drift import js_divergence

    return js_divergence(split, 'split', 'train', 'holdout')


def incremental_ingest(
    corpus: DataFrame,
    new_batch: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Dedup a NEW batch against the curated corpus WITHOUT
    re-processing the corpus — the steady-state ingest path once the
    initial curation has run.

    In production the band index is a stored table written at
    curation time (``dd.minhash_band_index(corpus).write...``) and
    read back here; this example builds it inline.  Only the new
    batch is shingled and banded; candidates come from one equi-join
    against the index, are exact-Jaccard-verified against the
    corpus text, and surviving new docs are returned (append them
    and their band rows to corpus + index to complete the cycle).
    Within-batch duplicates are removed first with the ordinary
    batch dedup over just the batch.
    """
    new_unique = dd.minhash_dedup(
        new_batch, 'doc_id', 'text',
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold)
    index = dd.minhash_band_index(
        corpus, 'doc_id', 'text', num_hashes, bands)
    cand = dd.minhash_index_probe(
        index, new_unique, 'doc_id', 'text', num_hashes, bands)
    # the verify is spelled out on string shingles for readability;
    # production code should reuse dedup.verify_jaccard_hashed over
    # a union'd shingle-HASH frame (bigint set arithmetic, one
    # shingle pass, and threshold semantics guaranteed identical to
    # minhash_dedup's)
    new_sh = new_unique.select(
        F.col('doc_id').alias('new_id'),
        dd.word_shingles('text', 3).alias('__sa'))
    old_sh = corpus.select(
        F.col('doc_id').alias('index_id'),
        dd.word_shingles('text', 3).alias('__sb'))
    dup_new_ids = (
        cand.join(new_sh, on='new_id').join(old_sh, on='index_id')
        .withColumn('__i', F.size(F.array_intersect('__sa', '__sb')))
        .withColumn('__u', F.size('__sa') + F.size('__sb')
                    - F.col('__i'))
        .filter(F.col('__i') >= F.lit(jaccard_threshold) * F.col('__u'))
        .select(F.col('new_id').alias('doc_id'))
        .distinct()
    )
    return new_unique.join(dup_new_ids, on='doc_id', how='left_anti')


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/curated_docs'

    # local[32] with the 1 GiB default heap OOMs in the packing
    # stage (32 concurrent Arrow tasks); size the single local JVM
    # like one real executor.  No effect under spark-submit.
    spark = get_spark('training-data-pipeline',
                      extra_confs={'spark.driver.memory': '4g'})
    spark.sparkContext.setLogLevel('ERROR')
    docs = load_tables(spark, sf_dir, tables=['documents'])['documents']

    n_raw = docs.count()
    docs = robots_gate(docs)
    n_robots = docs.count()
    docs = ingest_url_dedup(docs)
    n_url = docs.count()
    print(f'robots gate kept {n_robots}/{n_raw}, '
          f'url-dedup kept {n_url}/{n_robots} docs')
    docs = domain_gate(docs)
    n_domain = docs.count()
    print(f'domain gate kept {n_domain}/{n_url} docs')
    docs = onion_gate(docs)
    n_onion = docs.count()
    print(f'onion repetition gate kept {n_onion}/{n_domain} docs')
    curated = curate(docs)
    n_minhash = curated.count()
    curated = winnow_sweep(curated)
    n_winnow = curated.count()
    # stand-in benchmark set: the 20 lowest doc_ids
    benchmark = docs.filter(F.col('doc_id') < 20)
    audit = contamination_audit(curated, benchmark)
    n_tainted = audit.select('doc_id').distinct().count()
    print(f'contamination audit: {n_tainted} docs share >=1 exact '
          f'4-gram with the benchmark (evidence table has '
          f'{audit.count()} doc-bench rows)')
    curated = decontaminate(curated, benchmark)
    n_curated = curated.count()
    print(f'raw={n_raw} after_minhash={n_minhash} '
          f'after_winnow={n_winnow} after_decontam={n_curated} '
          f'removed={n_raw - n_curated}')
    curated = seed_score(curated)
    report(curated).show()
    vocab_report(curated, top_k=200).show()
    fertility_report(curated, top_k=200).show()

    split = holdout_split(curated)
    split.groupBy('split').count().show()

    drift = split_drift(split).collect()[0]
    print(f"train/holdout JSD={drift['jsd']:.4f} "
          f"(vocab={drift['vocab']})")

    # per-source token budgets + a stable global epoch order — both
    # distributed prefix sums (no whole-source single-task window)
    from ons_utils_spark.operators.sampling import (
        global_order_index, mixture_sample)
    train = split.filter(F.col('split') == 'train')
    print('language mixing plan (temperature α=0.25 vs UniMax):')
    mixing_plan(train).show()
    mixed = mixture_sample(
        train, 'source', 'doc_id', 'n_chars',
        {f'src{i}': 2500 for i in range(20)}, salt='mix-v1')
    epoch = global_order_index(mixed, 'doc_id', salt='epoch0')
    n_mix = epoch.count()
    lo, hi = epoch.agg(F.min('position'), F.max('position')).first()
    assert (lo, hi) == (0, n_mix - 1), (lo, hi, n_mix)
    print(f'mixture: {n_mix}/{train.count()} train docs within '
          f'per-source char budgets; epoch order dense 0..{hi}')

    # lay the epoch out as seekable size-bounded shards (one range
    # repartition + partition-local sort; no single-task sort)
    from ons_utils_spark.sources.shards import (
        shard_manifest, write_training_shards)
    shards_dir = os.path.join(out_dir, 'epoch0_shards')
    write_training_shards(epoch, shards_dir, shard_size=256)
    n_shards = shard_manifest(spark, shards_dir).count()
    print(f'epoch laid out as {n_shards} ordered shards of <=256')
    # resume mid-epoch: shard_size comes from the layout's own
    # sidecar (authoritative — a mismatched divisor would raise),
    # and the shard >= cursor//size predicate prunes directories
    from ons_utils_spark.sources.shards import read_training_shards
    cursor = n_mix // 2
    resumed = read_training_shards(spark, shards_dir,
                                   start_position=cursor)
    n_resumed = resumed.count()
    assert n_resumed == n_mix - cursor, (n_resumed, n_mix, cursor)
    print(f'resume at position {cursor}: {n_resumed} docs left')

    chunks = to_training_chunks(split.filter(F.col('split') == 'train'))
    packed = pack_chunks(chunks)
    n_bins = packed.select('shard', 'bin_id').distinct().count()
    print(f'train chunks={chunks.count()} packed into {n_bins} bins')

    write_parquet(split, os.path.join(out_dir, 'documents'),
                  partition_by=['split'])
    write_parquet(report(curated), os.path.join(out_dir, 'stats'))
    write_parquet(packed, os.path.join(out_dir, 'chunks'))
    print(f'wrote {out_dir}')


if __name__ == '__main__':
    main()
