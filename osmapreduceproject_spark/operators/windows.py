"""Window / ranking / sessionization operators (SURVEY.md §2.B window row).

All pure built-in window functions — JVM-side, whole-stage-codegen'd, one
shuffle per distinct partitioning. At 100 TB the rule is: every window in
a query should share the same ``partitionBy`` where possible so Catalyst
reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via row_number — Spark pushes the rank filter
    into a per-partition top-k (WindowGroupLimit in 3.5+), so each
    partition keeps only k rows before the shuffle."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def global_top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit(k)`` plans TakeOrderedAndProject —
    per-partition heap of k rows, then a k·partitions merge on the driver;
    never a full global sort."""
    return df.orderBy(*order_cols).limit(k)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    lag + cumulative-sum over one (key, ts) window — single shuffle on
    ``key``; state is O(1) per row. The streaming twin is
    ``F.session_window`` (streaming/windows.py).

    Gaps are compared at microsecond precision (``unix_micros``), not
    whole seconds — casting the timestamp to long truncates, so events
    straddling the gap boundary by sub-second amounts would classify
    differently from an epoch-µs oracle.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def running_agg(
    df: DataFrame, key: str, order: Column, agg_col: Column, out_col: str
) -> DataFrame:
    """Running aggregate over an unbounded-preceding frame."""
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(agg_col).over(w))


def compact_latest(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CDC/upsert compaction: keep each key's LATEST version — the
    standard merge-on-read step that turns an append-only change log
    into current state (the other half of the q149 snapshot diff, which
    detects changes; this applies them).

    One key-partitioned window ranked by (version desc, tiebreak desc)
    — a single shuffle on the key, no join back, deterministic when the
    tiebreak makes (key, version, tiebreak) unique (e.g. a change-log
    sequence number). At scale this is the compaction shape every lake
    table format runs; AQE splits hot keys.
    """
    order = [F.col(version_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
