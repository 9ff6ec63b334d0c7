"""Sources & sinks (SURVEY.md §2.B scans/sources rows).

Engine policy: explicit schemas in the core API (matches the reference's
fixed-compile-time-shape philosophy, ``/root/reference/parallel_sort.cpp``
— one implicit int column); schema inference only as an opt-in
convenience. Parquet is the primary format: columnar, predicate pushdown,
partition pruning — all prerequisites at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet write — the layout that enables partition
    pruning on later scans (the 100 TB access path)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


# The events fixture's ts column has shipped in two physical layouts:
# parquet TIMESTAMP(NANOS) (which Spark 4 refuses to map to TimestampType,
# PARQUET_TYPE_ILLEGAL) and plain TIMESTAMP(MICROS). Both are INT64 on
# disk, so one schema-forced LongType read handles both — sniff the unit
# from the footer and truncate ns → µs (exactly DuckDB's ns → µs cast).
# Deliberately NOT a native timestamp read for the µs layout: the file is
# tz-naive (NTZ), and casting NTZ → TimestampType re-interprets the
# wall-clock in the *session* timezone, making every epoch-derived value
# session-tz-dependent. timestamp_micros(raw int) pins the instant to
# the wall-clock-as-UTC reading under ANY session tz — the same instants
# DuckDB's naive TIMESTAMP arithmetic produces.
from pyspark.sql import functions as _F
from pyspark.sql import types as _T

EVENTS_RAW_SCHEMA = _T.StructType(
    [
        _T.StructField("event_id", _T.LongType()),
        _T.StructField("ts", _T.LongType()),  # raw nanos
        _T.StructField("user_id", _T.LongType()),
        _T.StructField("event_type", _T.StringType()),
        _T.StructField("value", _T.DoubleType()),
        _T.StructField("props", _T.StringType()),
    ]
)


def _events_ts_unit(path: str) -> str:
    """Physical time unit of events.parquet's ts column ('us' or 'ns').

    Footer-only read (no data pages); one file's footer answers for the
    whole dataset since the fixture is written in one shot. Accepts a
    bare file or a directory of part files (a future regeneration could
    switch layouts, as the ns → µs drift already did once).
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    if _os.path.isdir(path):
        parts = sorted(_glob.glob(f"{path}/*.parquet"))
        if not parts:
            return "us"
        path = parts[0]
    field = _pq.read_schema(path).field("ts")
    unit = getattr(field.type, "unit", None)
    if unit not in ("us", "ns"):
        # Fail fast on any layout this reader has never seen (e.g. a
        # future regeneration shipping timestamp[ms] or plain int64):
        # silently defaulting to the µs path would mis-scale every epoch
        # by 1000× — the exact class of bug this sniffer exists to stop.
        raise ValueError(
            f"events.parquet ts column has unsupported physical type "
            f"{field.type!r} (unit={unit!r}); read_events understands "
            "timestamp[us] and timestamp[ns] only — extend the sniffer "
            "rather than guessing a scale"
        )
    return unit


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events fixture with ts as a proper µs TimestampType."""
    path = f"{sf_dir}/events.parquet"
    raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
    micros = _F.expr("ts div 1000") if _events_ts_unit(path) == "ns" else _F.col("ts")
    return raw.withColumn("ts", _F.timestamp_micros(micros))


def write_bucketed(
    df,
    table: str,
    key: str,
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (session catalog): pre-shuffles once at
    write time so every later equi-join/aggregation on ``key`` between
    same-bucketed tables runs with NO exchange — the 100 TB answer to
    repeated joins on the same key (shuffle paid once, amortized over
    every downstream query). Pair with ``sortBy`` to also skip the
    sort-merge join's sort."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan — Spark's second columnar format, built in (no extra
    package). Same vectorized reader + predicate-pushdown machinery as
    parquet; production use is interop with Hive/Trino warehouses."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def parquet_zone_map(spark, path: str, cols: list[str]):
    """Per-FILE min/max/null-count manifest over an existing parquet
    dataset — the data-skipping zone map a scan planner prunes with
    (pair with the z-order layout of q140, which is what makes these
    per-file ranges narrow enough to skip). One scan of only the
    requested columns, grouped by ``input_file_name()`` — the exchange
    carries one partial row per (file, task), and the result is
    files × 1 rows of metadata.

    The ``file`` column is the basename (scheme/directory stripped), so
    the manifest is location-independent and cross-engine comparable
    (DuckDB's ``read_parquet(..., filename=true)`` yields plain paths
    where Spark yields file: URIs).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"), *cols
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls"),
        ]
    return df.groupBy("file").agg(*aggs)


def read_json_with_deadletter(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSON ingest with a dead-letter channel: returns
    ``(good, bad)`` where ``bad`` holds the raw text of every line that
    failed to parse against the schema — the production ingest contract
    (never silently drop, never fail the whole job for one corrupt
    line). PERMISSIVE mode routes malformed rows into a corrupt-record
    column; both frames come from ONE pass over the input.

    At 100 TB the dead-letter frame is written next to the good data and
    alarmed on: a rising bad-row rate is an upstream schema drift signal
    that a FAILFAST job would turn into a 3am page and a DROPMALFORMED
    job would turn into silent data loss.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    corrupt = "_corrupt_record"
    full = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    # Spark disallows referencing ONLY the corrupt-record column of a lazy
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parse must be
    # materialized once; cache() is the documented resolution and is also
    # what keeps this ONE pass over the input for both output frames.
    raw = raw.cache()
    good = raw.where(F.col(corrupt).isNull()).drop(corrupt)
    bad = raw.where(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_record")
    )
    return good, bad


def incremental_read(
    spark: SparkSession, src_dir: str, state_dir: str, fmt: str = "parquet",
    schema: StructType | None = None,
):
    """Batch incremental ingestion: read ONLY files not yet committed to
    the state ledger, and return ``(df, commit)`` — call ``commit()``
    after the downstream write succeeds to mark this batch processed.
    The batch counterpart of the streaming file source for pipelines
    that run on a scheduler rather than a always-on stream: re-running
    the job after new files land processes exactly the delta; re-running
    after a failure (commit never called) re-processes the same delta —
    at-least-once, made exactly-once by an idempotent downstream write
    (content-keyed upsert or overwrite-by-batch-dir).

    The ledger is a plain text file of processed file names, rewritten
    atomically (os.replace) — file LISTING is driver-side metadata work
    (as in every table format); only the delta's DATA is read
    distributed.
    """
    import glob as _glob
    import os as _os

    _os.makedirs(state_dir, exist_ok=True)
    ledger = _os.path.join(state_dir, "processed.txt")
    seen: set[str] = set()
    if _os.path.exists(ledger):
        with open(ledger) as f:
            seen = {ln.strip() for ln in f if ln.strip()}
    ext = {"parquet": "parquet", "json": "json", "csv": "csv"}[fmt]
    files = sorted(
        f for f in _glob.glob(_os.path.join(src_dir, f"*.{ext}"))
        if _os.path.basename(f) not in seen
    )
    if files:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = getattr(reader, fmt)(*files) if fmt != "parquet" else reader.parquet(*files)
    else:
        df = None

    def commit() -> None:
        tmp = ledger + ".tmp"
        with open(tmp, "w") as f:
            for name in sorted(seen | {_os.path.basename(p) for p in files}):
                f.write(name + "\n")
        _os.replace(tmp, ledger)

    return df, commit


def read_csv_with_deadletter(
    spark: SparkSession, path: str, schema: StructType, header: bool = False
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_json_with_deadletter`: schema-enforced
    ingest returning ``(good, bad)`` from one PERMISSIVE pass, with the
    raw text of every row that failed to parse (wrong arity, bad cast)
    routed to the dead-letter frame instead of silently nulling
    (DROPMALFORMED) or failing the job (FAILFAST). Same 100 TB contract:
    dead-letter volume is the upstream-drift alarm signal.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    corrupt = "_corrupt_record"
    full = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .option("header", str(header).lower())
        .csv(path)
    )
    raw = raw.cache()  # same QUERY_ONLY_CORRUPT_RECORD_COLUMN resolution
    good = raw.where(F.col(corrupt).isNull()).drop(corrupt)
    bad = raw.where(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_record")
    )
    return good, bad


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: parquet directory scan with
    ``mergeSchema`` — files written under older, narrower schemas
    surface NULLs in the columns they predate instead of failing the
    scan or silently adopting one footer's schema (Spark's default
    takes an arbitrary file's schema when footers disagree). The read
    path every long-lived dataset needs once columns start being added.

    Schema merging reads every footer (metadata, not data — cheap
    relative to the scan, but at 100 TB with millions of files pin the
    merged schema in a table catalog once known and pass it explicitly
    to :func:`read_parquet` instead).
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-binary ingest (images/audio/video payloads) via Spark's
    ``binaryFile`` source: (path, modificationTime, length, content) —
    the loading end of the multimodal surface
    (operators/multimodal.py): content stays an opaque ``binary``
    column for the decode/feature UDFs; nothing interprets bytes at
    scan time. ``glob`` filters by pattern (e.g. ``*.png``) BEFORE any
    bytes move.

    Scale note: one row per file — the right shape for multimodal
    corpora where each object is a self-contained payload; pack tiny
    files into parquet binary columns (q97-style) before shipping
    100 TB of them through a scan, since per-file open cost dominates
    below ~1 MB.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
