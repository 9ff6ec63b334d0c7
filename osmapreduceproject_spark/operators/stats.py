"""Exact distributed order statistics.

The built-in exact ``F.percentile`` buffers a whole group in one
aggregation state — fine per-group, wrong for a GLOBAL percentile over
100 TB (one task holds the column). ``F.percentile_approx`` (q90) trades
exactness for a sketch. :func:`exact_percentile` is the third point in
that design space: exact answers with bounded memory, via the classic
two-pass bucket-counting algorithm — no global sort, no single-task
buffering; the only driver-side data is a bounded histogram.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentile(
    df: DataFrame,
    col: str,
    percentiles: list[float],
    n_buckets: int = 1024,
) -> list[float]:
    """EXACT discrete percentiles (quantile_disc semantics: the value at
    1-indexed ascending rank ``ceil(p·n)``) of a numeric column, in two
    distributed passes:

    1. one narrow aggregation computes (min, max, n); a second computes
       per-bucket counts over ``n_buckets`` uniform buckets — the
       driver receives only the bounded histogram (metadata-scale:
       n_buckets rows, never data);
    2. for each requested rank, the covering bucket is located on the
       histogram's cumulative sums, and ONLY that bucket's rows are
       scanned again — a pushed-down range filter — taking the
       (rank − rows_below)-th smallest inside it via a bucket-local
       TakeOrdered.

    Memory per task is O(bucket), not O(n); skewed value distributions
    degrade gracefully (a hot bucket is still a tiny fraction of the
    column, and n_buckets can grow logarithmically with data size).
    Deterministic: bucket boundaries are pure arithmetic on (min, max)
    and ranks are integers.

    Returns the percentile values in the order requested. Raises on an
    empty input (no rank exists).
    """
    c = F.col(col).cast("double")
    lo_hi_n = df.agg(
        F.min(c).alias("lo"), F.max(c).alias("hi"), F.count(c).alias("n")
    ).first()
    lo, hi, n = lo_hi_n["lo"], lo_hi_n["hi"], lo_hi_n["n"]
    if not n:
        raise ValueError(f"exact_percentile: no non-null rows in {col!r}")
    if lo == hi:
        return [float(lo) for _ in percentiles]
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(n_buckets - 1)
    )
    hist = {
        r["b"]: r["cnt"]
        for r in df.where(c.isNotNull())
        .groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    out: list[float] = []
    for p in percentiles:
        rank = max(1, math.ceil(p * n))  # 1-indexed ascending
        below, target = 0, n_buckets - 1
        for b in range(n_buckets):
            cnt = hist.get(b, 0)
            if below + cnt >= rank:
                target = b
                break
            below += cnt
        b_lo = lo + target * width
        b_hi = hi if target == n_buckets - 1 else lo + (target + 1) * width
        in_bucket = df.where(
            c.isNotNull()
            & (c >= F.lit(b_lo))
            & ((c < F.lit(b_hi)) if target < n_buckets - 1 else (c <= F.lit(b_hi)))
        )
        k_local = rank - below
        val = (
            in_bucket.select(c.alias("v"))
            .orderBy(F.col("v").asc())
            .limit(k_local)
            .agg(F.max("v"))
            .first()[0]
        )
        out.append(float(val))
    return out


def mad_outlier_bounds(
    df: DataFrame, col: str, k: float = 3.0, n_buckets: int = 1024
) -> tuple[float, float, float]:
    """Robust outlier fences via median absolute deviation: returns
    (median, lo, hi) with lo/hi = median ∓ k·1.4826·MAD — the
    monitoring-grade alternative to mean/std z-scores (q142), unmoved
    by the very outliers it hunts (a traffic spike inflates a stddev
    fence but not a MAD fence).

    Both the median and the MAD median run through
    :func:`exact_percentile` — exact, two passes each, bounded driver
    histograms only. The deviation column is computed lazily; no
    materialization of the corpus.
    """
    med = exact_percentile(df, col, [0.5], n_buckets)[0]
    dev = df.select(
        (F.abs(F.col(col).cast("double") - F.lit(med))).alias("__dev")
    )
    mad = exact_percentile(dev, "__dev", [0.5], n_buckets)[0]
    half = k * 1.4826 * mad
    return med, med - half, med + half
