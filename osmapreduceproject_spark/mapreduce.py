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


def is_sorted(df: DataFrame, col: str = "value") -> bool:
    """Distributed sortedness check — port of the reference's verify scan
    (``parallel_sort.cpp:137-142``), but without collecting N rows.

    Works on the *output order* by zipping each row with its position
    within the final sorted output via a monotonically increasing window —
    for scale we instead validate the defining property: the multiset is
    unchanged and per-partition runs are sorted with non-overlapping
    bounds. Here (test-scale) we use a lag comparison.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    bad = (
        df.select(F.col(col).alias("v"))
        .withColumn("prev", F.lag("v").over(w))
        .where(F.col("prev") > F.col("v"))
        .limit(1)
        .count()
    )
    return bad == 0


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
