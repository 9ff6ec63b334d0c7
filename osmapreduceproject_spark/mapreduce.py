"""MapReduce facade + the reference's two conformance programs.

The reference's whole surface is: chunk → parallel map → barrier →
synchronized reduce (``/root/reference/parallel_sort.cpp`` and
``/root/reference/max_aggregation.cpp``). On Spark that pattern *is* the
execution model: narrow map stages, shuffle barrier, partial→final
aggregation. This module exposes:

- :func:`map_reduce` — the generic facade (DataFrame-first; the
  reference's ``--workers`` knob becomes ``workers=...`` →
  ``repartition``).
- :func:`parallel_sort` — conformance program 0a
  (``parallel_sort.cpp:29-157``): global ascending sort. Spark replaces
  the reference's sequential left-deep run-merge
  (``parallel_sort.cpp:96-133``, flagged as a limitation at
  ``README.md:170``) with sampled range partitioning + parallel
  per-partition sort — same semantics, parallel reduce.
- :func:`max_aggregation` — conformance program 0b
  (``max_aggregation.cpp:23-113``): global max. The CAS / semaphore
  combine (``max_aggregation.cpp:47-60,72-96``) becomes Spark's partial
  HashAggregate → exchange → final HashAggregate, automatic in
  ``df.agg(F.max(...))``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .metrics import PhaseTimer


def map_reduce(
    df: DataFrame,
    map_fn: Callable[[DataFrame], DataFrame],
    reduce_exprs: list[Column] | None = None,
    reduce_keys: list[str] | None = None,
    workers: int | None = None,
) -> DataFrame:
    """Generic MapReduce over a DataFrame, Spark-first.

    ``map_fn`` is a narrow DataFrame transformation (the per-chunk worker
    body, ``parallel_sort.cpp:69-91``); ``reduce_exprs`` are aggregate
    columns (the combine, ``max_aggregation.cpp:57-63``); ``reduce_keys``
    optionally group the reduce (the reference is always global / 0 keys).
    ``workers`` mirrors ``--workers`` — normally leave None and let AQE
    pick; forcing it adds a shuffle, exactly like the reference's explicit
    chunk plan.
    """
    if workers is not None:
        df = df.repartition(workers)
    mapped = map_fn(df)
    if reduce_exprs is None:
        return mapped
    if reduce_keys:
        return mapped.groupBy(*reduce_keys).agg(*reduce_exprs)
    return mapped.agg(*reduce_exprs)


def parallel_sort(
    df: DataFrame, col: str = "value", workers: int | None = None
) -> DataFrame:
    """Conformance 0a: globally sort ``col`` ascending.

    At 100 TB: ``orderBy`` range-partitions on sampled bounds then sorts
    each partition in parallel — no single-reducer merge bottleneck.
    """
    if workers is not None:
        df = df.repartition(workers)
    return df.orderBy(F.col(col).asc())


def max_aggregation(
    df: DataFrame, col: str = "value", workers: int | None = None
) -> DataFrame:
    """Conformance 0b: global max of ``col``.

    Partial max per partition (the reference's ``local_max``,
    ``max_aggregation.cpp:54-55``) then final combine after a 1-row
    exchange — a combiner-first plan that moves O(partitions), not O(N),
    bytes regardless of scale.
    """
    if workers is not None:
        df = df.repartition(workers)
    return df.agg(F.max(col).alias("max_value"))


def ranked_sort(
    df: DataFrame,
    order_cols: list[Column],
    pos_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global total order WITH explicit positions, never a single-partition
    window.

    The scale-safe generalization of ``parallel_sort.cpp:29-157``:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` — the parallel
       sample-sort ``orderBy`` plans; partition *i* holds a contiguous key
       range below partition *i+1*'s.
    2. ``monotonically_increasing_id()`` on the sorted runs encodes
       (partition id << 33) + local offset → free per-row local ranks with
       no window and no extra shuffle.
    3. Per-partition counts (≤ num_partitions rows) → cumulative offsets
       via a broadcast non-equi self-join on the tiny counts table →
       broadcast-joined back. ``pos = offset + local + 1``.

    The plan contains NO ``Exchange SinglePartition``: the only O(N) moves
    are the range shuffle itself. The sorted run is persisted because two
    branches (counts, output) consume it — Spark shares no subplans across
    branches, and ``monotonically_increasing_id`` must observe identical
    partition layouts in both. Callers release via
    ``plans.inspect.release_intermediates()``; at 100 TB use the same plan
    with DISK_ONLY storage (``zipWithIndex``'s two-pass design, kept in
    the DataFrame API).

    Positions are deterministic when ``order_cols`` is a unique total
    order; under ties, tied rows are interchangeable so the result *set*
    is still deterministic.
    """
    from .plans.inspect import tracked_persist

    if num_partitions:
        nparts = int(num_partitions)
    else:
        # spark.sql.shuffle.partitions may be "auto" on AQE-managed
        # platforms; fall back to the cluster's default parallelism rather
        # than failing at plan-build time.
        try:
            nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            nparts = df.sparkSession.sparkContext.defaultParallelism
    sorted_runs = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)).alias("__local"),
        )
    )
    sorted_runs = tracked_persist(sorted_runs)
    counts = sorted_runs.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    b = counts.select(F.col("__pid").alias("__bpid"), F.col("__cnt").alias("__bcnt"))
    offsets = (
        counts.join(F.broadcast(b), F.col("__bpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__bcnt"), F.lit(0)).alias("__offset"))
    )
    out_cols = [c for c in df.columns]
    return (
        sorted_runs.join(F.broadcast(offsets), "__pid")
        .select((F.col("__offset") + F.col("__local") + 1).alias(pos_col), *out_cols)
    )


def is_sorted(df: DataFrame, col: str = "value") -> bool:
    """Distributed sortedness check — port of the reference's verify scan
    (``parallel_sort.cpp:137-142``), but without collecting N rows or
    funneling them through a single-partition window.

    Validates the defining property of a partitioned sort in ONE scan with
    ZERO shuffles: every partition is a sorted run, and run bounds are
    non-overlapping in partition order. ``mapInPandas`` emits one summary
    row per partition (pid, run-sorted?, min, max, count); only those
    ≤ num_partitions rows reach the driver for the boundary check.
    """
    vt = df.schema[col].dataType.simpleString()
    src = df.select(F.spark_partition_id().alias("__pid"), F.col(col).alias("v"))

    # Self-contained closure (no module-level references): workers may not
    # have this package importable when driven from a foreign cwd.
    def summarize(batches):
        import pandas as pd

        pid, ok, prev, vmin, vmax, cnt = None, True, None, None, None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
                vmin = pdf["v"].iloc[0]
            arr = pdf["v"]
            if prev is not None and arr.iloc[0] < prev:
                ok = False
            if not arr.is_monotonic_increasing:
                ok = False
            prev = arr.iloc[-1]
            vmax = arr.iloc[-1]
            cnt += len(pdf)
        if cnt:
            yield pd.DataFrame(
                {"pid": [pid], "ok": [ok], "vmin": [vmin], "vmax": [vmax], "cnt": [cnt]}
            )

    stats = src.mapInPandas(
        summarize, schema=f"pid int, ok boolean, vmin {vt}, vmax {vt}, cnt long"
    )
    rows = sorted(stats.collect(), key=lambda r: r.pid)  # ≤ num_partitions rows
    if any(not r.ok for r in rows):
        return False
    return all(a.vmax <= b.vmin for a, b in zip(rows, rows[1:]))


def run_conformance(spark, n: int, seed: int, which: str, workers: int | None = None) -> dict:
    """Run one reference program end-to-end with the reference's report
    format (map/reduce/total ms + peak RSS + verification flag),
    mirroring ``parallel_sort.cpp:144-152`` / ``max_aggregation.cpp:64-69``.
    """
    from .datagen import seeded_ints

    timer = PhaseTimer()
    with timer.time("gen"):
        df = seeded_ints(spark, n, seed, num_partitions=workers)
        df = df.cache()
        df.count()
    if which == "sort":
        with timer.time("sort"):
            out = parallel_sort(df, workers=workers)
            head = out.limit(1).collect()
        with timer.time("verify"):
            ok = is_sorted(out)
        result: dict[str, Any] = {"first": head[0][0] if head else None, "sorted_ok": ok}
    elif which == "max":
        from .metrics import observed

        with timer.time("map_reduce"):
            # Final value captured by observation during the sink write —
            # one job, no driver round-trip (metrics.observed docstring).
            out, obs = observed(
                max_aggregation(df, workers=workers),
                F.max("max_value").alias("final_max"),
                name="final",
            )
            out.write.format("noop").mode("overwrite").save()
        result = {"final_max": obs.get["final_max"]}
    else:
        raise ValueError(which)
    df.unpersist()
    result.update(timer.report())
    return result
