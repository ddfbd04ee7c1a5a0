"""ons_utils_spark — a PySpark-native analytics/utility engine.

Brand-new implementation of the capabilities of ONSdigital/ons-utils
(reference at /root/reference), re-expressed Spark-first for
Spark >= 3.5/4.x, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""
from ._typing import PathLike
from .decorators import to_list as to_list_args, to_spark_col
from .factories import args_kwargs_transformer_factory
from .generic import (
    fill_tuple_keys,
    fill_tuples,
    flatten_dict,
    get_key_value_pairs,
    invert_nested_keys,
    is_non_string_sequence,
    list_convert,
    tuple_convert,
    unflatten_dict,
)
from .functions.arrays import cosine_similarity, diff, dot_product, l2_norm
from .functions.columns import convert_to_spark_col, lookup_join, map_col
from .functions.schema import (
    get_ddl_schema,
    get_fields,
    get_first_group,
    get_table_columns,
    map_column_names,
    to_list,
)
from .functions.windows import (
    bfill,
    ffill,
    get_ordered_window_spec,
    get_window_spec,
    sessionize,
    shifted_within_year_ffill,
    with_global_agg,
)
from .functions.approx import (
    approx_distinct,
    approx_quantile_col,
    approx_quantiles,
    bitmap_distinct_count,
    exact_quantile_col,
    filter_by_percentile_range,
)
from .functions.json import json_get, json_struct, with_json_fields
from .operators.clustering import connected_components, dedup_by_components
from .operators.concat import UnequalSchemaWarning, concat, promote_dtypes
from .operators.dedup import (
    char_shingles,
    embedding_band_index,
    embedding_index_probe,
    embedding_near_duplicates,
    exact_dedup,
    minhash_dedup,
    minhash_band_index,
    minhash_index_probe,
    minhash_lsh_candidates,
    minhash_lsh_candidates_portable,
    ngram_jaccard_join,
    score_pairs_cosine,
    simhash_block_index,
    simhash_candidates_portable,
    simhash_dedup,
    simhash_index_probe,
)
from .operators.bpe import bpe_segmenter_udf, train_bpe, word_histogram
from .operators.graph import (
    bfs_levels,
    label_propagation,
    pagerank,
    triangle_count,
)
from .operators.quality_checks import (
    Check,
    has_max,
    has_min,
    is_complete,
    is_in_set,
    is_non_negative,
    is_unique,
    run_checks,
    satisfies,
)
from .operators.timeseries import ewma, rolling_anomaly_flags
from .operators.grouped import grouped_apply
from .operators.index import (
    bm25_rank,
    build_inverted_index,
    search_all_terms,
)
from .operators.joins import (
    anti_join,
    as_of_join,
    broadcast_join,
    bucketed_range_join,
    null_safe_join,
    range_join,
    semi_join,
    top_k_per_group,
)
from .operators.lm import bigram_counts, ngram_lm_score, unigram_counts
from .operators.multimodal import (
    audio_features,
    decode_jpeg,
    encode_jpeg,
    frame_sample_plan,
    image_features,
)
from .operators.sampling import (
    hash_fraction_filter,
    hash_split,
    split_thresholds,
)
from .operators.reshape import SparkStacker
from .operators.reshape import stack as stack_spark
from .operators.reshape import unstack as unstack_spark
from .operators.similarity import (
    cosine_topk,
    hyperplane_band_udf,
    hyperplane_signature_udf,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
    random_hyperplane_lsh,
)
from .operators.skew import salted_agg, salted_broadcast_join, with_salt
from .operators.classifier import score_texts, train_token_weights
from .operators.vocab import (
    build_vocab,
    oov_stats,
    token_counts,
    vocab_coverage,
)
from .operators.text import (
    chunk_text,
    clean_text,
    dedup_lines,
    fingerprint,
    language_id,
    quality_score,
    redact_pii,
    repetition_score,
    strip_html,
    text_stats,
    token_count,
    tokenize,
)
from .session import get_spark
from .sources.layout import z_value, zorder_repartition
from .streaming.quality import monitor_quality
from .streaming.sinks import foreach_batch_sink, write_stream_parquet
from .streaming.stateful import running_totals
from .streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)

__version__ = '0.1.0'

__all__ = [
    'args_kwargs_transformer_factory', 'to_spark_col', 'to_list_args',
    'flatten_dict', 'unflatten_dict', 'invert_nested_keys',
    'get_key_value_pairs', 'fill_tuples', 'fill_tuple_keys',
    'is_non_string_sequence', 'tuple_convert', 'list_convert',
    'diff', 'dot_product', 'l2_norm', 'cosine_similarity',
    'convert_to_spark_col', 'map_col', 'lookup_join',
    'get_fields', 'get_ddl_schema', 'map_column_names', 'to_list',
    'get_table_columns', 'get_first_group',
    'get_window_spec', 'get_ordered_window_spec', 'ffill', 'bfill',
    'with_global_agg', 'shifted_within_year_ffill', 'sessionize',
    'concat', 'promote_dtypes', 'UnequalSchemaWarning',
    'grouped_apply',
    'broadcast_join', 'null_safe_join', 'semi_join', 'anti_join',
    'as_of_join', 'top_k_per_group', 'range_join',
    'bucketed_range_join',
    'get_spark',
    'json_get', 'json_struct', 'with_json_fields',
    'exact_dedup', 'minhash_dedup', 'minhash_lsh_candidates',
    'minhash_band_index', 'minhash_index_probe',
    'minhash_lsh_candidates_portable', 'char_shingles',
    'simhash_dedup', 'simhash_candidates_portable',
    'simhash_block_index', 'simhash_index_probe',
    'ngram_jaccard_join', 'embedding_band_index', 'embedding_index_probe',
    'embedding_near_duplicates', 'score_pairs_cosine',
    'cosine_topk', 'lsh_topk', 'random_hyperplane_lsh',
    'hyperplane_band_udf', 'hyperplane_signature_udf',
    'ivf_topk', 'ivf_centroids', 'ivf_assign',
    'tokenize', 'token_count', 'quality_score', 'language_id',
    'fingerprint', 'text_stats', 'clean_text', 'strip_html',
    'redact_pii', 'repetition_score', 'chunk_text', 'dedup_lines',
    'tumbling_window_agg', 'sliding_window_agg', 'session_window_agg',
    'with_watermark', 'write_stream_parquet', 'foreach_batch_sink',
    'SparkStacker', 'stack_spark', 'unstack_spark',
    'with_salt', 'salted_agg', 'salted_broadcast_join',
    'running_totals',
    'approx_distinct', 'approx_quantiles', 'approx_quantile_col',
    'exact_quantile_col', 'bitmap_distinct_count',
    'filter_by_percentile_range',
    'token_counts', 'build_vocab', 'vocab_coverage', 'oov_stats',
    'train_token_weights', 'score_texts',
    'train_bpe', 'bpe_segmenter_udf', 'word_histogram',
    'ewma', 'rolling_anomaly_flags',
    'Check', 'run_checks', 'is_complete', 'is_unique', 'has_min',
    'has_max', 'is_in_set', 'is_non_negative', 'satisfies',
    'monitor_quality',
    'connected_components', 'dedup_by_components', 'pagerank',
    'triangle_count', 'bfs_levels', 'label_propagation',
    'image_features', 'audio_features', 'frame_sample_plan',
    'decode_jpeg', 'encode_jpeg',
    'ngram_lm_score', 'bigram_counts', 'unigram_counts',
    'hash_split', 'hash_fraction_filter', 'split_thresholds',
    'z_value', 'zorder_repartition',
    'build_inverted_index', 'search_all_terms', 'bm25_rank',
    'PathLike',
]
