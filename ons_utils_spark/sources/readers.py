"""Source readers and the testdata table registry.

The reference reads nothing itself (SURVEY.md §2.2 — CSV only via
pandas in its tests); the new build standardizes on ``spark.read``
with schema/pushdown-friendly options. ``load_tables`` maps the
driver-generated star schema (TESTDATA.md) into a dict and optionally
registers temp views so queries can be written in SQL.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession

TPCH_TABLES = (
    'region', 'nation', 'customer', 'supplier', 'part',
    'orders', 'lineitem', 'events', 'documents', 'embeddings',
)


def _nanos_timestamp_columns(path: str) -> list:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot
    read natively (PARQUET_TYPE_ILLEGAL)."""
    try:
        import pyarrow.parquet as pq
        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == 'timestamp[ns]']
    except Exception:
        return []


def read_parquet(
    spark: SparkSession,
    path: str,
    normalize_session: bool = True,
    merge_schema: bool = False,
) -> SparkDF:
    """Parquet scan — Catalyst gets predicate pushdown + column pruning.

    ``merge_schema=True`` reconciles files written under EVOLVED
    schemas (added columns read as NULL in older files) by merging
    every footer — a per-file metadata pass at planning time, so
    reserve it for tables that actually evolved; homogeneous tables
    should keep the default (first-footer schema, cheapest plan).

    Handles parquet TIMESTAMP(NANOS) columns (illegal in Spark) by
    reading them as nano longs (``spark.sql.legacy.parquet.nanosAsLong``)
    and casting to microsecond timestamps — same truncation DuckDB
    applies, so oracles agree.

    .. warning:: **Session-wide side effect.** With
       ``normalize_session=True`` (default) this call PERMANENTLY pins
       ``spark.sql.session.timeZone='UTC'`` and disables
       ``spark.sql.parquet.inferTimestampNTZ`` on the whole session —
       not just for this read. Timestamps load as UTC instants and all
       later date/year extraction in the session happens in UTC. This
       is deliberate: the correctness harness runs queries in a session
       it does not build, and the pins must survive past the read (the
       zone matters at query time, not scan time, so save-and-restore
       would silently unpin before the query runs). Sessions built via
       :func:`ons_utils_spark.get_spark` already carry both pins.
       Library users embedding this reader in a zone-sensitive session
       should pass ``normalize_session=False`` and manage the two confs
       themselves.
    """
    from pyspark.sql import functions as F

    if normalize_session:
        # Parquet timestamps without isAdjustedToUTC would otherwise
        # load as TIMESTAMP_NTZ (Spark 4 default), which has no cast to
        # BIGINT and shifts epoch math; read them as LTZ instants so
        # downstream unix_timestamp/cast semantics match the DuckDB
        # oracles.
        spark.conf.set(
            'spark.sql.parquet.inferTimestampNTZ.enabled', 'false')
        # Pin date/year extraction from those instants to UTC regardless
        # of the host session's zone — keeps results identical to the
        # (zone-naive) DuckDB oracles.
        spark.conf.set('spark.sql.session.timeZone', 'UTC')
    reader = spark.read
    if merge_schema:
        reader = reader.option('mergeSchema', 'true')
    nanos_cols = _nanos_timestamp_columns(path)
    if not nanos_cols:
        return reader.parquet(path)
    spark.conf.set('spark.sql.legacy.parquet.nanosAsLong', 'true')
    df = reader.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(
            c, F.timestamp_micros((F.col(c) / 1000).cast('long'))
        )
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    header: bool = True,
    **options,
) -> SparkDF:
    """CSV scan. Always pass a schema in production — inference reads
    the data twice."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option('inferSchema', True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    **options,
) -> SparkDF:
    """JSON-lines scan; schema strongly recommended at scale."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: Optional[str] = None,
    **options,
) -> SparkDF:
    """XML scan via the Spark 4 built-in ``xml`` source.

    ``row_tag`` names the repeated element that becomes one row;
    nested elements become struct/array columns. Supply ``schema``
    at scale — schema inference reads the data twice, and ANSI-mode
    inference can widen numerics unexpectedly. XML is a
    line-unsplittable format: one large document is ONE task, so
    prefer many files (or convert to parquet immediately — the
    standard ingest-once pattern this module's writers support).
    """
    reader = spark.read.format('xml').option('rowTag', row_tag) \
        .options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: SparkDF,
    path: str,
    row_tag: str = 'row',
    root_tag: str = 'rows',
    mode: str = 'overwrite',
    **options,
) -> None:
    """Write ``df`` as XML part-files (Spark 4 built-in sink)."""
    (df.write.format('xml')
     .option('rowTag', row_tag).option('rootTag', root_tag)
     .options(**options).mode(mode).save(path))


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: Iterable[str] = TPCH_TABLES,
    register_views: bool = False,
) -> Dict[str, SparkDF]:
    """Load the testdata parquet tables from ``sf_dir``.

    Missing files are skipped (some scale factors may omit tables).
    """
    out: Dict[str, SparkDF] = {}
    for name in tables:
        path = os.path.join(sf_dir, f'{name}.parquet')
        if not os.path.exists(path):
            continue
        df = read_parquet(spark, path)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out


def ensure_min_parallelism(
    df: SparkDF,
    min_partitions: Optional[int] = None,
) -> SparkDF:
    """Repartition ONLY when the scan is coarser than the target
    (default: the session's ``defaultParallelism``).

    Small or few-file inputs read as a handful of partitions (a
    single 3 MB parquet file = ONE task), which serializes every
    CPU-heavy per-row expression downstream — shingling, tokenizing,
    LM scoring — no matter how many cores the cluster has. This
    helper is the scale-safe fix: on a coarse scan it pays one cheap
    round-robin shuffle of the raw rows to unlock full parallelism;
    on a well-split input (the 100 TB case — thousands of file
    splits) it is a structural NO-OP, adding no shuffle at all.

    Use it between a scan and an expensive projection, not
    reflexively: for cheap map work the extra exchange buys nothing.
    """
    spark = df.sparkSession
    if min_partitions is not None:
        target = min_partitions
    else:
        try:
            target = spark.sparkContext.defaultParallelism
        except Exception:
            # Spark Connect has no sparkContext; the shuffle-partition
            # conf is the closest session-level parallelism signal.
            target = int(spark.conf.get('spark.sql.shuffle.partitions'))
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # Connect: partition introspection unavailable — repartition
        # unconditionally (the caller asked for a parallelism floor).
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)


def write_parquet(
    df: SparkDF,
    path: str,
    mode: str = 'overwrite',
    partition_by: Optional[Iterable[str]] = None,
) -> None:
    """Parquet sink; partition by low-cardinality keys for pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: SparkDF,
    path: str,
    mode: str = 'overwrite',
    header: bool = True,
    partition_by: Optional[Iterable[str]] = None,
    **options,
) -> None:
    """CSV sink (header on by default). Interchange format only —
    no pushdown, no types, no compression by default; use parquet
    for anything a Spark job will read back."""
    writer = df.write.mode(mode).options(header=header, **options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_json(
    df: SparkDF,
    path: str,
    mode: str = 'overwrite',
    partition_by: Optional[Iterable[str]] = None,
    **options,
) -> None:
    """JSON-lines sink — one object per row, schema carried in every
    record (verbose; interchange only, like :func:`write_csv`)."""
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    max_bytes: Optional[int] = None,
) -> SparkDF:
    """Scan raw files (images/audio/any blob) as one row per file:
    ``path, modificationTime, length, content (binary)`` — Spark's
    ``binaryFile`` source. The ingestion edge of the multimodal
    pipeline: feed ``content`` to ``operators.multimodal``
    decoders/feature extractors (Arrow-batched ``mapInPandas``).

    ``glob`` filters filenames (e.g. ``*.png``) at LISTING time —
    non-matching files are never opened. ``max_bytes`` drops oversize
    files by the ``length`` metadata column BEFORE content reaches
    the executors' memory: at 100 TB the content column is the
    dominant cost, so both pushdowns happen before any byte moves.
    """
    reader = spark.read.format('binaryFile')
    if glob is not None:
        reader = reader.option('pathGlobFilter', glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F
        df = df.filter(F.col('length') <= max_bytes)
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    **options,
) -> SparkDF:
    """ORC scan — same pushdown/pruning properties as parquet (both
    columnar with min/max stats; pick by ecosystem, not performance)."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: SparkDF,
    path: str,
    mode: str = 'overwrite',
    partition_by: Optional[Iterable[str]] = None,
) -> None:
    """ORC sink; partition by low-cardinality keys for pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: Optional[str] = None,
    glob: Optional[str] = None,
) -> SparkDF:
    """Raw text ingestion — the front door of a document pipeline.

    ``whole_file=False`` (default): one row per line (``value``
    string), splittable and parallel within large files — the right
    mode for line-delimited corpora. ``whole_file=True``: one row per
    FILE (document-per-file corpora); files then become the
    parallelism unit and a single file is never split, so keep
    individual files bounded (the binaryFile guidance applies).
    ``line_sep`` overrides the record delimiter (e.g. ``'\\0'`` for
    NUL-delimited dumps); ``glob`` filters filenames at listing time.
    """
    reader = spark.read
    if glob is not None:
        reader = reader.option('pathGlobFilter', glob)
    if line_sep is not None:
        reader = reader.option('lineSep', line_sep)
    return reader.text(path, wholetext=whole_file)
