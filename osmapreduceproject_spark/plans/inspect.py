"""Physical-plan inspection helpers.

The 100 TB discipline is enforced by *asserting on plans*, not hoping:
tests use these to check that filters reach the parquet scan
(PushedFilters), projections prune columns (ReadSchema), small dims go
broadcast, and hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the formatted plan shows ``fragment`` inside PushedFilters."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema) — a
    2-column projection reading 11 columns is a pruning bug."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols += [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))


def data_carrying_single_partitions(df: DataFrame) -> list[str]:
    """``Exchange SinglePartition`` nodes whose child is NOT a partial
    aggregate — exchanges that funnel raw DATA through one task.

    A SinglePartition exchange is the correct, unavoidable final step of
    a global aggregate: its child is the partial (map-side) aggregate, so
    the exchange moves one pre-aggregated row per input partition at ANY
    data scale. Any other child means unbounded rows through a single
    task — a global sort, an unaggregated funnel — the one plan shape
    that cannot survive a 100× scale-up. Returns the offending child
    lines (empty = plan is scale-safe on this invariant), so PLANS.md's
    honest "defect only when it carries data" reclassification can never
    quietly widen into absorbing a real regression.
    """
    lines = explain_str(df, "simple").splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1].strip() if i + 1 < len(lines) else "<no child>"
        if not ("Aggregate" in child and "partial_" in child):
            bad.append(child)
    return bad


def take_ordered_limits(df: DataFrame) -> list[int]:
    """``limit`` of every TakeOrderedAndProject in the physical plan —
    the per-task heap size AND the row count funneled through the final
    single task. Bounded-k invariants (exact_percentile's hot-bucket
    recursion) assert ``max(...) <= cap``: a TakeOrdered whose limit
    grows with the data is a data-carrying single partition wearing a
    different node name."""
    return [
        int(m)
        for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", explain_str(df, "simple"))
    ]


def num_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan (AQE-final where
    available). Bucketed co-located joins must show 0."""
    plan = explain_str(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")


_INTERMEDIATES: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``persist()`` with a session-level registry so long-lived sessions
    can reclaim executor storage.

    Operators that persist intermediates (MinHash buckets, token sets,
    sorted runs) return lazy DataFrames whose evaluation *needs* the cache
    — they cannot unpersist before the caller materializes the result.
    The contract: callers that loop over many operator invocations call
    :func:`release_intermediates` after materializing each result (bench
    and the test suite do). Storage is additionally LRU-evicted by Spark,
    so an unreleased cache degrades to recompute, never to OOM.
    """
    df = df.persist()
    _INTERMEDIATES.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = 0
    while _INTERMEDIATES:
        _INTERMEDIATES.pop().unpersist()
        n += 1
    return n


def intermediates_mark() -> int:
    """Current length of the intermediate registry — pair with
    :func:`release_intermediates_since` so an operator that fully
    materializes in-call can release ONLY the caches it created,
    without unpersisting frames backing OTHER operators' still-pending
    lazy results (review finding, r10: a global in-call release
    silently degrades a sibling's persisted pipeline to recompute)."""
    return len(_INTERMEDIATES)


def release_intermediates_since(mark: int) -> int:
    """Unpersist intermediates registered after ``mark``; returns how
    many. Safe for in-call cleanup: frames tracked before the mark
    (other operators' caches) are left alone."""
    n = 0
    while len(_INTERMEDIATES) > mark:
        _INTERMEDIATES.pop().unpersist()
        n += 1
    return n


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the executor blocks behind an eager ``localCheckpoint``
    frame — for DEAD frames only (the lineage is truncated, so the data
    is unrecoverable after this). Iterative operators (pagerank,
    connected components) checkpoint a carried frame each round; without
    an explicit release the previous rounds' blocks wait on Python GC +
    the ContextCleaner, and a tight invocation loop (the 6-run bench
    rerun block) accumulates storage across runs (advisor finding, r9).
    Returns False when the frame isn't a checkpoint leaf (non-LogicalRDD
    plan) instead of raising — callers treat the release as best-effort.
    Skips and failures log at debug (advisor finding, r10: the py4j
    plan-class probe would silently disable this path if a Spark
    upgrade renamed LogicalRDD — the behavior is additionally pinned by
    tests/test_plans.py::test_release_local_checkpoint_drops_storage,
    which fails loudly on such a rename).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            _LOG.debug(
                "release_local_checkpoint: skipped — plan root is %s, "
                "not a LogicalRDD checkpoint leaf",
                plan.getClass().getName(),
            )
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        _LOG.debug("release_local_checkpoint: failed", exc_info=True)
        return False


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    under-partitioned.

    Explode/fold-heavy narrow stages (shingling, token explosion,
    signature folds) must be partitioned by their OUTPUT size, not their
    input bytes: a small parquet file lands in one partition and a 50x
    explode then runs on one core (measured: 3.1s single-threaded shingle
    stage vs 0.1s fanned out). At 100 TB inputs are already wide and this
    is a no-op — the round-robin exchange only fires when partitions <
    target, and it moves the *pre*-explosion (small) rows.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
