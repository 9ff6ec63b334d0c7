"""Streaming joins (SURVEY.md §2.B streaming row): stream-static
enrichment and watermarked stream-stream interval joins.

State discipline at 100 TB/day stream rates:
- stream-static: the static side is broadcast per micro-batch — zero
  streaming state. Always the first choice for dimension enrichment.
- stream-stream: BOTH sides buffer rows in the state store until the
  watermark plus the join's time bound passes them; an unbounded-time
  equi-join would grow state forever. The time-interval condition here is
  what lets Spark evict — never ship a stream-stream join without one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream_df: DataFrame, static_df: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Enrich a stream against a static dimension table.

    Stateless: each micro-batch joins against the (broadcastable) static
    side; no watermark required.
    """
    return stream_df.join(static_df, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "5 minutes",
) -> DataFrame:
    """Inner join of two streams on ``key`` where the right event lands
    within ``[left_ts - within, left_ts]``.

    Both sides are watermarked; the interval bound gives the state store
    an eviction horizon of (watermark + within) per side. The same
    builder applied to two batch DataFrames produces the batch twin used
    by the equivalence test.
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    lk, rk = f"__l_{key}", f"__r_{key}"
    l = l.select(
        F.col(key).alias(lk), F.col(left_ts).alias("l_ts"), "event_id"
    ).withColumnRenamed("event_id", "l_event_id")
    r = r.select(
        F.col(key).alias(rk), F.col(right_ts).alias("r_ts"), "event_id"
    ).withColumnRenamed("event_id", "r_event_id")
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond).select(
        F.col(lk).alias(key),
        "l_event_id",
        "r_event_id",
        F.unix_timestamp("l_ts").alias("l_epoch"),
        F.unix_timestamp("r_ts").alias("r_epoch"),
    )
