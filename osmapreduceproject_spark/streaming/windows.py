"""Structured Streaming surface (SURVEY.md §2.B streaming row).

Builders return *unbound* transformations applicable to either a batch or
a streaming DataFrame — the batch twin is what the DuckDB oracle checks,
and batch/stream equivalence is asserted in tests (replay
``events.parquet`` through a file-source stream with availableNow).

Watermark discipline at scale: state size for a windowed agg is
O(open windows × groups); the watermark bounds it. Session windows and
dropDuplicates keep per-key state — always pair them with a watermark in
production or state grows without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "5 minutes",
    group_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count+sum per group. Epoch-aligned (F.window), so
    the bucket start equals floor(epoch/len)·len — oracle-friendly arithmetic."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact sum → double: summation-order independent
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    slide: str = "5 minutes",
    group_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len, slide).alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            group_col,
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based). Batch twin: operators/windows.py
    sessionize()."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            key_col,
            "n_events",
        )
    )


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with bounded state (watermarked)."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def deduped_user_counts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Distinct-user counts per event type AFTER exact dedup on
    (user, type) — the dedup→aggregate composition every streaming
    ingestion pipeline runs (dedup bounds upstream at-least-once
    delivery; the aggregate feeds dashboards). Chained stateful
    operators: dropDuplicates keeps per-key state (watermark-bounded),
    the downstream count is a second stateful agg.

    The twin contract: in batch mode dropDuplicates == DISTINCT, so the
    result is COUNT(DISTINCT user) per type — and because the aggregate
    counts *keys*, the output is invariant to WHICH duplicate row
    survives, which is exactly what makes this composition
    oracle-checkable (q159) despite dropDuplicates' arbitrary-survivor
    semantics.

    NULL users are filtered BEFORE the dedup: dropDuplicates would keep
    one null-key row and count(1) would include it, while the oracle's
    COUNT(DISTINCT user_id) excludes NULLs — the filter makes both
    engines agree regardless of fixture contents."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.where(F.col(user_col).isNotNull())
        .dropDuplicates([user_col, type_col])
        .groupBy(type_col)
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def read_events_stream(spark, events_dir: str) -> DataFrame:
    """Replay the events fixture as a file-source stream.

    ``events_dir`` must be a DIRECTORY containing events parquet file(s)
    — Spark's file streaming source rejects a bare file path ("Option
    'basePath' must be a directory"); symlink the fixture file into a
    tmpdir when needed (see tests/test_streaming.py). The fixture's ts
    layout is sniffed per sources/io.py (ns-int64 legacy vs native µs)
    and normalized to a µs timestamp either way, so batch and stream
    readers agree bit-for-bit.
    """
    import glob as _glob

    from ..sources.io import EVENTS_RAW_SCHEMA, _events_ts_unit

    files = sorted(_glob.glob(f"{events_dir}/*.parquet"))
    unit = _events_ts_unit(files[0]) if files else "us"
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(events_dir)
    micros = F.expr("ts div 1000") if unit == "ns" else F.col("ts")
    return raw.withColumn("ts", F.timestamp_micros(micros))


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming query to completion synchronously (test helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def write_stream_foreach_batch(stream_df: DataFrame, out_dir: str):
    """foreachBatch parquet sink with idempotent batch directories.

    The standard exactly-once recipe when the target isn't a native
    streaming sink: each micro-batch lands in ``batch_id=<n>/`` with
    overwrite semantics, so a replayed batch (restart between write and
    checkpoint commit) rewrites the same directory instead of
    duplicating rows. Downstream reads the directory tree as one
    partitioned dataset.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )


def late_arrival_report(
    df: DataFrame,
    delay_seconds: int,
    window_seconds: int,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Watermark late-data accounting — the sizing study a streaming job
    runs BEFORE committing to ``withWatermark(delay)``: replay events in
    a deterministic arrival order (``arrival_col``), maintain the
    running per-row watermark max(event time seen so far) − delay, and
    classify each event late iff its event time is already behind that
    watermark at arrival; report per tumbling window how many rows
    arrive on time vs late. Per-ROW watermarking is the TIGHTEST
    accounting: a real Structured Streaming run advances the watermark
    only at micro-batch boundaries, so it drops a SUBSET of the rows
    flagged late here — this report is the safe upper bound for
    choosing ``delay``.

    Scale shape: the running prefix max over arrival order is the
    ranked_sort offset technique applied to MAX — range repartition on
    the arrival key, per-partition maxima (≤ num_partitions rows)
    broadcast-joined into prefix offsets, and a partition-local running
    max — NO single-partition window for what is semantically a global
    scan. Pure integer-µs arithmetic (session-timezone-immune); the
    first-arriving row has no watermark and is on time by definition.
    Returns (window_start_epoch, n_on_time, n_late_dropped, n_rows).
    """
    from pyspark.sql import Window

    e = F.unix_micros(F.col(ts_col))
    rows = df.select(F.col(arrival_col).alias("__a"), e.alias("__e"))
    spark = df.sparkSession
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        nparts = spark.sparkContext.defaultParallelism
    ranged = (
        rows.repartitionByRange(nparts, F.col("__a").asc())
        .sortWithinPartitions(F.col("__a").asc())
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("__pid").agg(F.max("__e").alias("__tm"))
    b = totals.select(F.col("__pid").alias("__bpid"), F.col("__tm").alias("__btm"))
    offsets = (
        totals.join(F.broadcast(b), F.col("__bpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.max("__btm").alias("__off"))  # NULL for the first partition
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col("__a").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_max = F.greatest(
        F.max("__e").over(w), F.col("__off")
    )  # greatest() skips NULLs; NULL only for the very first row overall
    classified = ranged.join(F.broadcast(offsets), "__pid").select(
        "__e",
        (
            F.col("__e")
            < prefix_max - F.lit(int(delay_seconds) * 1_000_000)
        ).alias("__late"),
    )
    win = F.floor(F.col("__e") / F.lit(int(window_seconds) * 1_000_000)) * int(
        window_seconds
    )
    return classified.groupBy(win.cast("bigint").alias("window_start_epoch")).agg(
        F.sum((~F.coalesce(F.col("__late"), F.lit(False))).cast("int"))
        .cast("bigint")
        .alias("n_on_time"),
        F.sum(F.coalesce(F.col("__late"), F.lit(False)).cast("int"))
        .cast("bigint")
        .alias("n_late_dropped"),
        F.count(F.lit(1)).alias("n_rows"),
    )
