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


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Time-series regularization: per key, a fixed-interval grid of slot
    timestamps spanning the key's own observation span (slot boundaries
    aligned to absolute epoch multiples of ``step_seconds``), each slot
    carrying the LAST observed value at or before it (forward fill) plus
    the staleness of that observation — the resampling step that turns
    irregular event streams into the regular series that dashboards,
    joins against other series, and feature pipelines require.

    Implemented WITHOUT an as-of join: grid rows (null value) union with
    observations, and one per-key window takes ``last(value,
    ignorenulls=True)`` over the (ts, is_grid, value)-ordered frame —
    an observation landing exactly on a slot boundary sorts before the
    slot and is included in its fill. Returns
    (key, slot_epoch [s], value, staleness_s).

    Scale shape: one per-key (min, max) aggregation builds the grid via
    ``sequence`` (grid volume = span/step per key, never event volume);
    one per-key window fills — both exchanges hash on the key, so a
    key's whole series never funnels through a global sort. Keys whose
    span contains no slot boundary emit no rows (documented: a series
    shorter than one step has no complete slot). Determinism: slot
    arithmetic is integer µs; among same-timestamp observations the
    largest value wins the fill (value tiebreak in the sort order).
    """
    step_us = int(step_seconds) * 1_000_000
    ep = F.unix_micros(F.col(ts))
    obs = df.select(
        F.col(key).alias("__k"),
        ep.alias("__e"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__grid"),
    )
    spans = obs.groupBy("__k").agg(F.min("__e").alias("__lo"), F.max("__e").alias("__hi"))
    grid = (
        spans.where(
            F.floor(F.col("__hi") / step_us) * step_us
            >= F.ceil(F.col("__lo") / F.lit(step_us).cast("double")) * step_us
        )
        .select(
            "__k",
            F.explode(
                F.sequence(
                    (F.ceil(F.col("__lo") / F.lit(step_us).cast("double")) * step_us).cast("bigint"),
                    (F.floor(F.col("__hi") / step_us) * step_us).cast("bigint"),
                    F.lit(step_us),
                )
            ).alias("__e"),
        )
        .withColumn("__v", F.lit(None).cast("double"))
        .withColumn("__grid", F.lit(1))
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__e").asc(), F.col("__grid").asc(), F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        obs.unionByName(grid)
        .withColumn("__fv", F.last("__v", ignorenulls=True).over(w))
        .withColumn(
            "__fe",
            F.last(
                F.when(F.col("__grid") == 0, F.col("__e")), ignorenulls=True
            ).over(w),
        )
    )
    return filled.where(F.col("__grid") == 1).select(
        F.col("__k").alias(key),
        (F.col("__e") / 1_000_000).cast("bigint").alias("slot_epoch"),
        F.col("__fv").alias(value_col),
        ((F.col("__e") - F.col("__fe")) / 1_000_000).cast("bigint").alias("staleness_s"),
    )


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_ffill`: each grid
    slot carries the value interpolated between the bracketing
    observations, ``v = v0 + (v1−v0)·(t−t0)/(t1−t0)`` — the
    regularization continuous gauges (temperature, price, battery)
    want, where forward-fill's step function would bias downstream
    means; counters and state flags should keep ffill.

    Same grid-union-window machinery, one extra window: the backward
    pass fills the last observation at-or-before each slot (value AND
    epoch), the forward pass — the same window descending — fills the
    first at-or-after; both always exist because the grid spans
    [ceil(min obs), floor(max obs)]. A slot landing exactly on an
    observation reduces to that observation (guarded before the ratio,
    so no 0/0). Among same-timestamp observations the largest value
    wins on BOTH sides (the ffill tiebreak, kept symmetric).
    Interpolation is one fixed per-row IEEE expression — deterministic
    across engines with no accumulated state. Returns
    (key, slot_epoch, value, prev_gap_s, next_gap_s).

    Scale shape: identical to resample_ffill — grid volume is span/step
    per key, both windows reuse ONE key-hashed exchange, nothing sorts
    globally.
    """
    step_us = int(step_seconds) * 1_000_000
    ep = F.unix_micros(F.col(ts))
    obs = df.select(
        F.col(key).alias("__k"),
        ep.alias("__e"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__grid"),
    )
    spans = obs.groupBy("__k").agg(F.min("__e").alias("__lo"), F.max("__e").alias("__hi"))
    grid = (
        spans.where(
            F.floor(F.col("__hi") / step_us) * step_us
            >= F.ceil(F.col("__lo") / F.lit(step_us).cast("double")) * step_us
        )
        .select(
            "__k",
            F.explode(
                F.sequence(
                    (F.ceil(F.col("__lo") / F.lit(step_us).cast("double")) * step_us).cast("bigint"),
                    (F.floor(F.col("__hi") / step_us) * step_us).cast("bigint"),
                    F.lit(step_us),
                )
            ).alias("__e"),
        )
        .withColumn("__v", F.lit(None).cast("double"))
        .withColumn("__grid", F.lit(1))
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__e").asc(), F.col("__grid").asc(), F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__e").desc(), F.col("__grid").asc(), F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ov = F.when(F.col("__grid") == 0, F.col("__v"))
    oe = F.when(F.col("__grid") == 0, F.col("__e"))
    u = (
        obs.unionByName(grid)
        .withColumn("__pv", F.last(ov, ignorenulls=True).over(wb))
        .withColumn("__pe", F.last(oe, ignorenulls=True).over(wb))
        .withColumn("__nv", F.last(ov, ignorenulls=True).over(wf))
        .withColumn("__ne", F.last(oe, ignorenulls=True).over(wf))
    )
    exact = F.col("__ne") == F.col("__pe")
    ratio = (F.col("__e") - F.col("__pe")).cast("double") / (
        F.col("__ne") - F.col("__pe")
    )
    interp = F.when(exact, F.col("__pv")).otherwise(
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * ratio
    )
    return u.where(F.col("__grid") == 1).select(
        F.col("__k").alias(key),
        (F.col("__e") / 1_000_000).cast("bigint").alias("slot_epoch"),
        F.round(interp, 6).alias(value_col),
        ((F.col("__e") - F.col("__pe")) / 1_000_000).cast("bigint").alias("prev_gap_s"),
        ((F.col("__ne") - F.col("__e")) / 1_000_000).cast("bigint").alias("next_gap_s"),
    )


def _disc_median_per_key(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Per-key DISCRETE median (quantile_disc convention: the value at
    1-indexed rank ceil(n/2)) via one key-partitioned rank — exact,
    oracle-replicable, and bounded by the per-key series length (unlike
    the global-percentile machinery, which exists because a GLOBAL
    median can't sort in one task). Ties share a value, so the selected
    median is deterministic regardless of tie order."""
    w = Window.partitionBy(key).orderBy(F.col(val).asc())
    wc = Window.partitionBy(key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .where(F.col("__rn") == F.ceil(F.col("__n") / 2))
        .select(key, F.col(val).alias(out))
    )


def _with_disc_median_col(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """:func:`_disc_median_per_key` as an appended COLUMN — the same
    rank-ceil(n/2) median, but computed with two windows over the
    existing ``key`` partitioning instead of a filtered one-row frame
    joined back (r15 optimization). The join form re-evaluates the
    input subtree on each side of the join (a resample pipeline feeding
    median → MAD → fences was planned FOUR times in series_anomalies /
    cusum_changepoints); this form shares one exchange and one
    evaluation. The picked value is identical: ``max`` over the
    partition of "the value at rank ceil(n/2)" (NULL elsewhere) is that
    value, including a NULL median when NULLs reach the median rank
    (max over all-NULL is NULL, exactly what the join produced)."""
    w = Window.partitionBy(key).orderBy(F.col(val).asc())
    wc = Window.partitionBy(key)
    pick = F.when(
        F.row_number().over(w) == F.ceil(F.count(F.lit(1)).over(wc) / 2),
        F.col(val),
    )
    return df.withColumn(out, F.max(pick).over(wc))


def series_anomalies(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    k: float = 3.0,
) -> DataFrame:
    """Per-key robust anomaly flags over the REGULARIZED series: resample
    (:func:`resample_ffill`), then flag slots outside each key's
    median ∓ k·1.4826·MAD fence — the per-series twin of the global MAD
    fences (operators/stats.py mad_outlier_bounds) and the robust
    alternative to q142's mean/std z-scores, computed on the gap-filled
    grid so a silent sensor (stale forward-fills) doesn't fabricate
    variance and a bursty one isn't over-weighted.

    Medians are exact per-key DISCRETE medians (quantile_disc rank
    convention) via key-partitioned ranks — each key's series is
    span/step slots, so per-key sorting is bounded by construction; no
    global machinery, no approximation. Fences use the same arithmetic
    order on both engines. Returns the resampled rows plus
    (median, fence_lo, fence_hi, is_anomaly).

    Scale shape: every exchange hashes on ``key`` (the resample window,
    both median ranks, and the fence join-backs), so Catalyst reuses one
    partitioning end-to-end; fence tables are one row per key.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    # median/MAD as window columns over the resample's own key
    # partitioning (r15): the previous filtered-frame-join form planned
    # the resample subtree four times and added two joins
    dev = _with_disc_median_col(s, key, value_col, "__med").withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    half = F.lit(k) * 1.4826 * F.col("__mad")
    return (
        _with_disc_median_col(dev, key, "__adev", "__mad")
        .select(
            key,
            "slot_epoch",
            value_col,
            "staleness_s",
            F.col("__med").alias("median"),
            (F.col("__med") - half).alias("fence_lo"),
            (F.col("__med") + half).alias("fence_hi"),
            (
                (F.col(value_col) < F.col("__med") - half)
                | (F.col(value_col) > F.col("__med") + half)
            ).alias("is_anomaly"),
        )
    )


def series_correlation(
    a: DataFrame,
    b: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Per-key Pearson correlation between two metric streams on a SHARED
    regular grid: both inputs resample (:func:`resample_ffill`) to the
    same absolute-aligned slots, inner-join on (key, slot), and
    correlate — the "does latency move with error rate, per service"
    report. Resampling first is what makes the correlation honest:
    correlating raw irregular events silently weights bursty periods.

    Returns (key, n_slots, corr), 6 decimals; keys with fewer than 2
    overlapping slots or zero variance on either side report NULL corr.
    The correlation aggregates per-key sums over the bounded slot grid
    (span/step per key), so the 6-decimal round sits far outside float
    association noise. Every exchange hashes on the key.
    """
    sa = resample_ffill(a, key, ts, value_col, step_seconds).select(
        key, "slot_epoch", F.col(value_col).alias("__x")
    )
    sb = resample_ffill(b, key, ts, value_col, step_seconds).select(
        key, "slot_epoch", F.col(value_col).alias("__y")
    )
    j = sa.join(sb, [key, "slot_epoch"])
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("__x"), F.sum("__y")
    sxx = F.sum(F.col("__x") * F.col("__x"))
    syy = F.sum(F.col("__y") * F.col("__y"))
    sxy = F.sum(F.col("__x") * F.col("__y"))
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr = F.when(
        (n >= 2) & (var_x > 0) & (var_y > 0),
        F.round(cov_n / F.sqrt(var_x * var_y), 6),
    )
    return j.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_slots"), corr.alias("corr")
    )


def series_rolling(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    window_slots: int,
) -> DataFrame:
    """Rolling statistics over the REGULARIZED series: resample first
    (:func:`resample_ffill`), then a ``window_slots``-slot trailing
    frame per key yields moving mean/min/max and the observed slot
    count — the smoothing/monitoring layer over irregular event
    streams, honest because the grid is regular (a raw-event rolling
    window over-weights bursts and silently skips silent periods).

    One additional per-key window over the grid (Catalyst reuses the
    resample's key partitioning); frames are row-bounded
    (``window_slots``), so state per row is O(window). The mean rounds
    to 6 decimals (frame sums are short, association noise is far
    below the round).
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("slot_epoch").asc())
        .rowsBetween(-(window_slots - 1), 0)
    )
    v = F.col(value_col)
    return s.select(
        key,
        "slot_epoch",
        value_col,
        F.round(F.avg(v).over(w), 6).alias("rolling_mean"),
        F.min(v).over(w).alias("rolling_min"),
        F.max(v).over(w).alias("rolling_max"),
        F.count(v).over(w).alias("n_slots_in_window"),
    )


def series_trend(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Per-key least-squares trend over the REGULARIZED series: resample
    first (:func:`resample_ffill`), then regress value on the key-local
    slot index — slope per step, intercept (fitted value at the key's
    first slot), and r² per key. The "which services are drifting and
    how fast" report: :func:`series_anomalies` flags points,
    ``series_trend`` quantifies direction — zipf_fit's regression shape
    applied to time.

    The regressor is the key-LOCAL slot index ((slot − first slot) /
    step — small exact integers), not the absolute epoch: centering
    keeps ``n·Σxy − Σx·Σy`` away from the catastrophic-cancellation
    regime that absolute-epoch x values (~5e5) would enter (the
    corr_matrix lesson), so plain double sums stay far inside the
    6-decimal round. Keys with <2 slots or zero x-variance report NULL
    slope; r² additionally NULL for flat (zero-variance) values.

    Scale shape: one per-key MIN window over the resample's existing key
    partitioning (no extra exchange), then a key-keyed aggregation of
    bounded per-key grids — every exchange hashes on the key.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    w = Window.partitionBy(key)
    x = (
        (F.col("slot_epoch") - F.min("slot_epoch").over(w)) / step_seconds
    ).cast("double")
    g = s.select(key, x.alias("__x"), F.col(value_col).cast("double").alias("__y"))
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("__x"), F.sum("__y")
    sxx = F.sum(F.col("__x") * F.col("__x"))
    syy = F.sum(F.col("__y") * F.col("__y"))
    sxy = F.sum(F.col("__x") * F.col("__y"))
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    ok = (n >= 2) & (var_x > 0)
    slope = F.when(ok, F.round(cov_n / var_x, 6))
    intercept = F.when(ok, F.round((sy - (cov_n / var_x) * sx) / n, 6))
    r2 = F.when(ok & (var_y > 0), F.round((cov_n * cov_n) / (var_x * var_y), 6))
    return g.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_slots"),
        slope.alias("slope_per_step"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


_SERIES_MAX_SLOTS = 8784  # 366 days at an hourly step


def _make_jround():
    """Build the :func:`_jround` replica as a NON-importable nested
    function: the series-fold ``applyInPandas`` closures reference it,
    and cloudpickle serializes a nested function BY VALUE (its qualname
    contains ``<locals>``) where a module-level function would ship as
    an ``import osmapreduceproject_spark…`` reference — crashing every
    worker whose driver cwd isn't the repo root (the documented
    foreign-cwd contract in .claude/skills/verify)."""

    def _jround(x: float) -> float:
        """Exact replica of Spark's ``round(double, 0)`` (and DuckDB's):
        the HALF_UP decimal rounding of ``BigDecimal.valueOf(x)``.
        Java's ``Double.toString`` and Python's ``repr(float)`` both
        emit the shortest decimal string that round-trips, i.e. the SAME
        decimal value, so ``Decimal(repr(x)).quantize(1,
        ROUND_HALF_UP)`` is the identical operation (property-pinned
        against F.round in
        tests/test_operators.py::test_jround_matches_spark_round).

        Fast path: when the fractional part sits safely away from the
        .5 boundary (and |x| is small enough that the double's ulp
        cannot straddle the band), the binary and decimal decisions
        agree and a plain floor comparison suffices; the band and large
        magnitudes go through Decimal. NaN/±inf pass through like
        Spark's Round."""
        import math
        from decimal import ROUND_HALF_UP, Decimal

        if x != x or x == float("inf") or x == float("-inf"):
            return x
        if abs(x) < 1e13:
            f = math.floor(x)
            r = x - f
            if r < 0.49:
                return float(f)
            if r > 0.51:
                return float(f + 1)
        return float(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    return _jround


_jround = _make_jround()


def _slots_msg(op: str, max_slots: int) -> str:
    """Guard message TEMPLATE for the Python-side series folds — same
    contract as :func:`_guard_series` (names the knob). Returns a plain
    string with an ``{n}`` placeholder so the worker closure captures a
    str, never a module-level function (see :func:`_make_jround`)."""
    return (
        f"{op}: a key's resampled series has {{n}} grid slots, over "
        f"max_slots={max_slots} — the per-key fold walks the whole series "
        "in one task; increase step_seconds or raise max_slots explicitly"
    )


def _guard_series(rows: DataFrame, max_slots: int, op: str) -> DataFrame:
    """Fail fast when a key's collected grid exceeds ``max_slots``. The
    ordered folds below append to the accumulated history array each
    step (``concat(acc, array(step))``), so a key with L grid slots
    copies ~L²/2 elements — fine at the documented per-key contract
    (the fixtures top out at 720 hourly slots), silently quadratic for
    an unguarded multi-year span at a fine step. The guard makes the
    contract machine-enforced: coarsen ``step_seconds`` or raise
    ``max_slots`` deliberately, with the cost named in the error.
    """
    ok = F.size("__series") <= F.lit(int(max_slots))
    msg = F.concat(
        F.lit(f"{op}: a key's resampled series has "),
        F.size("__series").cast("string"),
        F.lit(
            f" grid slots, over max_slots={int(max_slots)} — the per-key "
            "ordered fold copies O(slots^2) elements; increase "
            "step_seconds or raise max_slots explicitly"
        ),
    )
    # as a FILTER, not a when() over the array column: assert_true is
    # NULL whenever it doesn't raise, so the predicate is always true on
    # the pass path — and the series array is never rewritten/copied
    # (a when() wrapper re-materializes the array per row; measured
    # +18% on q187's fold at sf0.1)
    return rows.where(F.assert_true(ok, msg).isNull())


def ewma(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    alpha: float = 0.3,
    max_slots: int = _SERIES_MAX_SLOTS,
) -> DataFrame:
    """Per-key exponentially weighted moving average over the
    REGULARIZED grid (:func:`resample_ffill` first — EWMA over irregular
    raw events silently re-weights bursts): ``s_0 = v_0;
    s_t = α·v_t + (1−α)·s_{t−1}``, the smoothing layer behind alerting
    baselines, emitted per slot alongside the raw value.

    The recurrence is inherently sequential PER KEY, so it runs as ONE
    linear Arrow ``applyInPandas`` walk over the key's slot-ordered
    series (r16, guide §1.2/§4.2 — the previous JVM ``aggregate`` fold
    appended to the accumulated array each step, copying O(L²) struct
    pointers per key; the Python walk is O(L) and measured ~2× faster
    on the q187/q234/q199 family at sf0.1) — state is bounded by the
    key's series length (span/step), the same bound
    :func:`series_rolling` and :func:`resample_ffill` already carry,
    and nothing sequential crosses keys: the fold parallelizes per key
    exactly like the rest of the series family. The walked state is an
    INTEGER in micro-units (the corr_matrix/winsorized quantization
    convention): ``round(x, 9)`` state diverges across engines by an
    ulp at decimal-grid boundaries (measured 7/105k slots at sf0.01)
    because a 9-decimal value has no exact double, while rounding to a
    whole integer of the same IEEE double is exact on both engines —
    so every step computes ``round(α·v_q + (1−α)·e)`` into a bigint
    (:func:`_jround` IS Spark's round-half-up on the identical double,
    property-pinned) and the recurrence replays bit-identically
    anywhere; a NULL value poisons the state to NULL from that slot on,
    exactly as the JVM fold's NULL propagation did. Emitted ewma
    is the state / 1e6 (one shared IEEE division). The per-key bound is
    machine-enforced: a series over ``max_slots`` grid slots raises
    (see :func:`_guard_series` — the fold is quadratic in slots).
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    ktype = s.schema[key].dataType.simpleString()
    a, b = float(alpha), 1.0 - float(alpha)
    jr, guard_msg = _jround, _slots_msg("ewma", max_slots)

    def fold(pdf):
        import pandas as pd

        if len(pdf) > max_slots:
            raise ValueError(guard_msg.format(n=len(pdf)))
        pdf = pdf.sort_values("slot_epoch")
        isna = pdf[value_col].isna().tolist()
        vals = pdf[value_col].tolist()
        eqs: list = []
        eq = None
        for i, v in enumerate(vals):
            if isna[i]:
                eq = None
            elif i == 0:
                eq = int(jr(v * 1_000_000.0))
            elif eq is not None:
                eq = int(jr(a * jr(v * 1_000_000.0) + b * float(eq)))
            eqs.append(eq)
        out = pdf[[key, "slot_epoch", value_col]].copy()
        out["__eq"] = pd.array(eqs, dtype="Int64")
        return out

    res = (
        s.select(key, "slot_epoch", value_col)
        .groupBy(key)
        .applyInPandas(
            fold, f"{key} {ktype}, slot_epoch bigint, {value_col} double, __eq bigint"
        )
    )
    return res.select(
        key, "slot_epoch", value_col, (F.col("__eq") / 1_000_000.0).alias("ewma")
    )


def cusum_changepoints(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
    max_slots: int = _SERIES_MAX_SLOTS,
) -> DataFrame:
    """Per-key CUSUM change-point detection over the REGULARIZED grid:
    the two-sided cumulative-sum statistic on standardized values,

        s⁺_t = max(0, s⁺_{t−1} + z_t − k),  s⁻_t = max(0, s⁻_{t−1} − z_t − k),

    flagging a level SHIFT when either side crosses ``h`` (and resetting
    that side) — the sustained-drift detector that complements
    :func:`series_anomalies`' point-outlier MAD fences: a 1.5σ step
    change never trips a 3σ fence but accumulates in CUSUM within a few
    slots. Standardization uses the key's own exact mean and the exact
    DISCRETE-median-based MAD scale (the q172 machinery), both from the
    resampled grid; zero-MAD keys (constant series) emit no flags.

    The recurrence walks INTEGER micro-unit state exactly like
    :func:`ewma` (round(x,9)-style float state diverges across engines
    by an ulp at decimal-grid boundaries; :func:`_jround` IS Spark's
    round-half-up, property-pinned), one linear Arrow walk per key
    (r16 — the JVM array-aggregate form copied O(L²) state), state
    bounded by series length and capped at ``max_slots`` (raised from
    the worker, naming the knob). Flagged rows are filtered IN the
    walk, so only change points cross the Arrow boundary back. Returns
    flagged slots only: (key, slot_epoch, value, side ['up'|'down'],
    cusum_stat).
    """
    # project the resample to the three columns the fold needs BEFORE
    # the median windows (staleness_s never reaches cusum's output —
    # guide §2.3: don't sort/buffer bytes you drop)
    s = resample_ffill(df, key, ts, value_col, step_seconds).select(
        key, "slot_epoch", value_col
    )
    # mean/median/MAD as window columns over the resample's own key
    # partitioning (r15): the previous one-row-frame-join form planned
    # the resample subtree four times (stats, median, MAD, and the
    # final join-back each re-evaluated it) and added three joins; the
    # sums/rank picks are the same integers, so every value is
    # unchanged
    wc = Window.partitionBy(key)
    dev = _with_disc_median_col(s, key, value_col, "__med").withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    base = (
        _with_disc_median_col(dev, key, "__adev", "__mad")
        .withColumn(
            "__mu",
            F.sum(F.round(F.col(value_col) * 1_000_000).cast("bigint")).over(wc)
            / (F.count(F.lit(1)).over(wc) * 1_000_000.0),
        )
        .where(F.col("__mad") > 0)
        .withColumn("__sigma", F.col("__mad") * 1.4826)
    )
    kq = int(round(drift_k * 1_000_000))
    hq = int(round(threshold_h * 1_000_000))
    ktype = base.schema[key].dataType.simpleString()
    jr, guard_msg = _jround, _slots_msg("cusum_changepoints", max_slots)

    def fold(pdf):
        import pandas as pd

        if len(pdf) > max_slots:
            raise ValueError(guard_msg.format(n=len(pdf)))
        pdf = pdf.sort_values("slot_epoch")
        mu = float(pdf["__mu"].iloc[0])
        sigma = float(pdf["__sigma"].iloc[0])
        isna = pdf[value_col].isna().tolist()
        vals = pdf[value_col].tolist()
        keep_idx: list = []
        stats: list = []
        sides: list = []
        up = dn = 0
        flag_up = flag_dn = False
        for i, v in enumerate(vals):
            prev_up = 0 if (i == 0 or flag_up) else up
            prev_dn = 0 if (i == 0 or flag_dn) else dn
            if isna[i]:
                # JVM: greatest(0, NULL) skips the NULL → both sides 0
                up = dn = 0
            else:
                z = int(jr((v - mu) / sigma * 1_000_000.0))
                up = max(0, prev_up + z - kq)
                dn = max(0, prev_dn - z - kq)
            flag_up = up > hq
            flag_dn = dn > hq
            if flag_up or flag_dn:
                keep_idx.append(i)
                sides.append(bool(flag_up))
                stats.append(up if flag_up else dn)
        out = pdf.iloc[keep_idx][[key, "slot_epoch", value_col]].copy()
        out["__is_up"] = pd.array(sides, dtype="boolean")
        out["__stat"] = pd.array(stats, dtype="Int64")
        return out

    flagged = (
        base.select(key, "slot_epoch", value_col, "__mu", "__sigma")
        .groupBy(key)
        .applyInPandas(
            fold,
            f"{key} {ktype}, slot_epoch bigint, {value_col} double, "
            "__is_up boolean, __stat bigint",
        )
    )
    return flagged.select(
        key,
        "slot_epoch",
        value_col,
        F.when(F.col("__is_up"), F.lit("up")).otherwise(F.lit("down")).alias("side"),
        F.round(F.col("__stat") / 1_000_000.0, 6).alias("cusum_stat"),
    )


def seasonal_profile(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    period_slots: int = 24,
) -> DataFrame:
    """Per-key seasonal profile over the REGULARIZED grid: slots fold
    onto their position within a ``period_slots`` cycle (24 with hourly
    steps = hour-of-day, 168 = hour-of-week), and each (key, position)
    reports its mean and the additive seasonal index (position mean −
    key mean) — the baseline layer alerting needs before
    :func:`series_anomalies`/:func:`cusum_changepoints` can separate
    "traffic is low because it's 4am" from "traffic is low". Positions
    are pure integer arithmetic on the absolute slot number
    (timezone-free by construction — a calendar hour-of-day would shift
    with the session zone, the q148 class of bug).

    Means sum micro-quantized integers (partition-order-free); the key
    mean is the mean OF the key's slot values (equal-weighted per slot,
    consistent with the position means). Bounded aggregations only:
    (key, position) and key — nothing beyond the resample's own
    exchanges. Returns (key, season_pos, n_slots, pos_mean,
    seasonal_index), 6-decimal.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    vq = F.round(F.col(value_col) * 1_000_000).cast("bigint")
    # pmod, not %: Spark's % follows the dividend's sign, so pre-1970
    # slots (negative slot_epoch) would fold each cycle position into
    # two groups (e.g. -1 and 23). pmod keeps positions in [0, period).
    pos = F.pmod(
        F.floor(F.col("slot_epoch") / step_seconds), F.lit(period_slots)
    ).cast("int")
    base = s.select(key, pos.alias("season_pos"), vq.alias("__vq"))
    per_pos = base.groupBy(key, "season_pos").agg(
        F.count(F.lit(1)).alias("n_slots"), F.sum("__vq").alias("__s")
    )
    per_key = base.groupBy(key).agg(
        F.count(F.lit(1)).alias("__kn"), F.sum("__vq").alias("__ks")
    )
    pos_mean = F.col("__s").cast("double") / F.col("n_slots") / 1_000_000
    key_mean = F.col("__ks").cast("double") / F.col("__kn") / 1_000_000
    return per_pos.join(per_key, key).select(
        key, "season_pos", "n_slots",
        F.round(pos_mean, 6).alias("pos_mean"),
        F.round(pos_mean - key_mean, 6).alias("seasonal_index"),
    )


def interval_union_duration(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
) -> DataFrame:
    """Total COVERED time per key over possibly-overlapping intervals —
    union length, the "actual time spent" metric naive SUM(end − start)
    double-counts whenever sessions/jobs/spans overlap. Classic
    gaps-and-islands sweep: order intervals by start within the key,
    carry the running max end; an interval whose start exceeds that
    running max opens a new island; union length = Σ island spans.

    Returns (key, n_intervals, n_islands, covered_s). Exact integer-µs
    arithmetic end-to-end. One key-partitioned sort feeds the running
    max, the island numbering, and the island aggregation — a single
    exchange on the key; islands and keys are bounded aggregations.
    """
    s = F.unix_micros(F.col(start))
    e = F.unix_micros(F.col(end))
    w = Window.partitionBy(key).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(prev_max_end.isNull() | (s > prev_max_end), 1).otherwise(0)
    islands = (
        df.withColumn("__s", s)
        .withColumn("__e", e)
        .withColumn("__new", is_new)
        .withColumn(
            "__island",
            F.sum("__new").over(
                Window.partitionBy(key)
                .orderBy(F.col("__s").asc(), F.col("__e").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per_island = islands.groupBy(key, "__island").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.max("__e") - F.min("__s")).alias("__span_us"),
    )
    return per_island.groupBy(key).agg(
        F.sum("__n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        (F.sum("__span_us") / 1_000_000).cast("bigint").alias("covered_s"),
    )


def holt_linear(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    max_slots: int = _SERIES_MAX_SLOTS,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) over
    the REGULARIZED grid — the series family's next step past
    :func:`ewma` when the signal drifts: ``l_t = α·v_t + (1−α)(l_{t−1}
    + b_{t−1})``, ``b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}``, seeded
    ``l_0 = v_0, b_0 = 0`` (the trend warms up from data, no
    second-point peek). Emits per slot the smoothed level, trend, and
    the one-step-ahead forecast ``l + b`` the alerting layer compares
    the NEXT observation against.

    Same execution shape and cross-engine determinism contract as ewma
    (windows.py:479): the two state cells are INTEGERS in micro-units,
    every step rounds ``α·v_q + (1−α)(l+b)`` and ``β·Δl + (1−β)b`` into
    bigints (:func:`_jround` — Spark's round-half-up, property-pinned),
    so the coupled recurrence replays bit-identically in a
    recursive-CTE oracle; the fold is one linear Arrow walk per key
    (r16 — the JVM array-aggregate form copied O(L²) state) —
    sequential per key, parallel across keys, state bounded by the
    grid length like the whole series family and capped at
    ``max_slots`` (raised from the worker, naming the knob).
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    ktype = s.schema[key].dataType.simpleString()
    a, oma = float(alpha), 1.0 - float(alpha)
    bt, omb = float(beta), 1.0 - float(beta)
    jr, guard_msg = _jround, _slots_msg("holt_linear", max_slots)

    def fold(pdf):
        import pandas as pd

        if len(pdf) > max_slots:
            raise ValueError(guard_msg.format(n=len(pdf)))
        pdf = pdf.sort_values("slot_epoch")
        isna = pdf[value_col].isna().tolist()
        vals = pdf[value_col].tolist()
        lqs: list = []
        bqs: list = []
        lq = bq = None
        for i, v in enumerate(vals):
            if i == 0:
                # JVM seed: lq = round(v·1e6) (NULL if v NULL), bq = 0
                lq = None if isna[i] else int(jr(v * 1_000_000.0))
                bq = 0
            elif isna[i] or lq is None or bq is None:
                # NULL value or poisoned state: both recurrences are
                # arithmetic over a NULL → NULL, exactly like the fold
                lq = bq = None
            else:
                vq = jr(v * 1_000_000.0)
                # the JVM expression computes the new level TWICE (once
                # for lq, once inside bq's Δlevel) — same double both
                # times, so reuse it; operand order preserved
                lq_d = jr(a * vq + oma * float(lq + bq))
                bq_new = int(
                    jr(bt * (lq_d - float(lq)) + omb * float(bq))
                )
                lq = int(lq_d)
                bq = bq_new
            lqs.append(lq)
            bqs.append(bq)
        out = pdf[[key, "slot_epoch", value_col]].copy()
        out["__lq"] = pd.array(lqs, dtype="Int64")
        out["__bq"] = pd.array(bqs, dtype="Int64")
        return out

    res = (
        s.select(key, "slot_epoch", value_col)
        .groupBy(key)
        .applyInPandas(
            fold,
            f"{key} {ktype}, slot_epoch bigint, {value_col} double, "
            "__lq bigint, __bq bigint",
        )
    )
    return res.select(
        key,
        "slot_epoch",
        value_col,
        (F.col("__lq") / 1_000_000.0).alias("level"),
        (F.col("__bq") / 1_000_000.0).alias("trend"),
        ((F.col("__lq") + F.col("__bq")) / 1_000_000.0).alias("forecast_next"),
    )


def _unpivot_lag_pearson(
    wide: DataFrame,
    part_cols: list[str],
    labels: list[int],
    out_col: str,
    scale: int | None,
) -> DataFrame:
    """THE lag-unpivot + quantized-integer-moment Pearson core, shared
    by :func:`series_autocorrelation`, :func:`lagged_crosscorr`, and
    multimodal.audio_envelope_periodicity (the r12 consolidation — the
    r10 precedent for :func:`~.stats._ranged_cumsum`: one copy of the
    subtle parts, not three). ``wide`` carries ``part_cols``, the base
    series as ``__v``, and one pre-shifted column ``__s{i}`` per entry
    of ``labels`` (the caller owns the window and the lag/lead
    direction so graded plans keep their exact shift expressions).

    Pairs where EITHER side is NULL drop — the shifted side running
    off the span, or a NULL-VALUED slot on either side (the ADVICE-r11
    phantom-observation class: counting a row whose x-moments are
    skipped biases every denominator). ``scale`` quantizes doubles to
    micro-integers; ``None`` means the inputs are already exact
    integers. Per-operand DECIMAL(38,0) casts precede every product
    (the corr_matrix overflow recipe). Returns
    (*part_cols, lag, n_pairs, <out_col>), 6-decimal.
    """
    stacked = wide.select(
        *part_cols,
        "__v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lb).alias("lag"), F.col(f"__s{i}").alias("__u")
                    )
                    for i, lb in enumerate(labels)
                ]
            )
        ).alias("__p"),
    ).select(
        *part_cols, F.col("__p.lag").alias("lag"), "__v",
        F.col("__p.__u").alias("__u"),
    ).where(F.col("__u").isNotNull() & F.col("__v").isNotNull())
    if scale is None:
        xq = F.col("__v").cast("bigint")
        yq = F.col("__u").cast("bigint")
    else:
        xq = F.round(F.col("__v") * scale).cast("bigint")
        yq = F.round(F.col("__u") * scale).cast("bigint")
    sums = stacked.select(
        *part_cols, "lag", xq.alias("__x"), yq.alias("__y")
    ).groupBy(*part_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        # per-OPERAND decimal cast (the corr_matrix recipe): the bigint
        # PRODUCT itself overflows at |value| > ~3037 (xq ≈ 1e10 →
        # xq² ≈ 1e20 > int64), so the cast must precede the multiply,
        # not just the sum
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y").cast("decimal(38,0)") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return sums.select(
        *part_cols,
        "lag",
        "n_pairs",
        F.when(
            (F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6),
        ).alias(out_col),
    )


def series_autocorrelation(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    max_lag: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key autocorrelation function over the REGULARIZED grid: for
    each lag k = 1..max_lag, the Pearson correlation between the series
    and itself shifted k slots — the periodicity detector that tells a
    pipeline whether a signal has structure at a given cadence (daily
    seasonality shows as a spike at lag 24 on an hourly grid) before it
    commits to :func:`seasonal_profile`'s cycle. Defined over the
    AVAILABLE pairs at each lag (the sample-correlation convention of
    :func:`series_correlation`, not the fixed-variance textbook ACF —
    documented so the oracle matches term for term).

    Because :func:`resample_ffill` emits a COMPLETE grid per key,
    shift-by-k is exactly ``F.lag(v, k)`` over the (key, slot) window —
    no self-join per lag: ONE per-key window computes every lag column,
    then the shared :func:`_unpivot_lag_pearson` core (r12
    consolidation) unpivots to (key, lag) rows and finishes with
    quantized integer moments (the series_correlation convention).
    Pairs where either slot carries a NULL value drop from n_pairs AND
    the moments (the ADVICE-r11 convention — a NULL-valued slot from
    leading NULL observations is not an observation). Degenerate
    groups (constant series, < 2 pairs) emit NULL. Returns
    (key, lag, n_pairs, acf).
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    w = Window.partitionBy(key).orderBy(F.col("slot_epoch").asc())
    lag_cols = [
        F.lag(F.col(value_col), k).over(w).alias(f"__s{k - 1}")
        for k in range(1, max_lag + 1)
    ]
    wide = s.select(key, F.col(value_col).alias("__v"), *lag_cols)
    return _unpivot_lag_pearson(
        wide, [key], list(range(1, max_lag + 1)), "acf", scale
    )


def interval_gaps(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    min_gap_seconds: int = 0,
) -> DataFrame:
    """Idle gaps per key — the complement of
    :func:`interval_union_duration`: between each pair of consecutive
    merged islands, the uncovered stretch (no interval touches it),
    filtered to gaps of at least ``min_gap_seconds``. The "when was
    this user/machine/job actually idle" feature that session length
    alone can't give when spans overlap.

    Same single-exchange sweep as the union: order intervals by start
    within the key, carry the running max end; wherever an interval's
    start exceeds that running max, the stretch (running_max, start)
    is a gap — overlapping and contained intervals never fabricate one
    because the RUNNING max (not the previous row's end) closes the
    island. Exact integer-µs arithmetic. Returns
    (key, gap_start_us, gap_end_us, gap_s) with µs epoch bounds and
    whole-second duration.
    """
    sel = df.select(
        F.col(key),
        F.unix_micros(F.col(start)).alias("__s"),
        F.unix_micros(F.col(end)).alias("__e"),
    )
    w = Window.partitionBy(key).orderBy(F.col("__s").asc(), F.col("__e").asc())
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    gaps = sel.withColumn("__pme", prev_max_end).where(
        F.col("__pme").isNotNull() & (F.col("__s") > F.col("__pme"))
    )
    return (
        gaps.select(
            key,
            F.col("__pme").alias("gap_start_us"),
            F.col("__s").alias("gap_end_us"),
            ((F.col("__s") - F.col("__pme")) / 1_000_000)
            .cast("bigint")
            .alias("gap_s"),
        )
        .where(F.col("gap_s") >= int(min_gap_seconds))
    )


def series_extrema(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Strict local extrema over the REGULARIZED grid: slots whose value
    is strictly greater (peak) or strictly smaller (trough) than BOTH
    neighbors — the turning-point labeler feeding anomaly triage and
    burst detection (where :func:`series_anomalies` asks "is this slot
    outside the fences", this asks "is it a local turning point").
    Plateau slots (equal to a neighbor) are NOT extrema by the strict
    convention — documented so the oracle matches edge-for-edge; first
    and last slots have one neighbor only and never qualify.

    ONE per-key ordered window computes lag and lead (the
    :func:`series_autocorrelation` shape — the grid is complete, so a
    slot's neighbors ARE lag/lead 1); the classifier is a narrow map.
    Every exchange hashes on the key.
    Returns (key, slot_epoch, value, kind) with kind ∈ {'peak','trough'}.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    w = Window.partitionBy(key).orderBy(F.col("slot_epoch").asc())
    v = F.col(value_col)
    prev = F.lag(v).over(w)
    nxt = F.lead(v).over(w)
    kind = F.when(
        prev.isNotNull() & nxt.isNotNull() & (v > prev) & (v > nxt), F.lit("peak")
    ).when(
        prev.isNotNull() & nxt.isNotNull() & (v < prev) & (v < nxt), F.lit("trough")
    )
    return (
        s.select(key, "slot_epoch", value_col, kind.alias("kind"))
        .where(F.col("kind").isNotNull())
    )


def mann_kendall_trend(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    max_slots: int = 2000,
) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per key over the
    REGULARIZED grid — the ROBUST counterpart to :func:`series_trend`'s
    OLS line (one outlier can own a least-squares slope; MK/Sen ask
    "do later slots exceed earlier slots more often than chance" and
    "what is the median pairwise slope"): the standard monotone-trend
    gate for sensor/metric series. Emits the exact S statistic, the
    tie-corrected variance, the continuity-corrected z, and the Sen
    slope (per slot).

    All pairwise by definition — O(L²) per key — so the bound is
    MACHINE-ENFORCED with its own tighter default (``max_slots`` 2000:
    the Sen slope materializes the L(L−1)/2 pairwise-slope array,
    ~16 MB per key at the bound). The per-key combinatorial pass runs
    as an Arrow-batched grouped map (numpy upper-triangle
    broadcasting), NOT Catalyst higher-order functions: the
    interpreted per-element HOF path measured 67.3 s at sf0.1
    (1,500 keys, Σ L² ≈ 7.3·10⁸ pair ops) vs seconds vectorized —
    this is the brief's "(b) applyInPandas where built-ins genuinely
    can't express it" case, and the first-class exception to the
    JVM-only rule next to the multimodal decoders. Cross-engine
    determinism is unchanged: comparisons use JVM-quantized integers
    (``round(v·10⁶)`` computed IN SPARK before the Arrow hop), slopes
    divide raw doubles by integer index distance (IEEE-identical in
    numpy), the Sen median is the discrete ceil(N/2) order statistic
    of the sorted slope array, and the variance/z finalization stays
    in the original JVM expressions. Tie variance:
    Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18. Keys with <2 slots
    emit NULL statistics. Returns
    (key, n_slots, s_stat, var_s, z, sen_slope).
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    base = s.select(
        F.col(key).alias("__k"),
        "slot_epoch",
        F.col(value_col).cast("double").alias("__v"),
        F.round(F.col(value_col) * 1_000_000).cast("bigint").alias("__q"),
    )
    cap = int(max_slots)

    def mk(pdf):
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("slot_epoch")
        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"mann_kendall_trend: a key has {n} grid slots, over "
                f"max_slots={cap}; the Sen slope materializes O(n^2) "
                "pairwise slopes - raise max_slots explicitly if this "
                "volume is intended"
            )
        k = pdf["__k"].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {"__k": [k], "n_slots": [n], "__s": [0], "__sen": [0.0],
                 "__tie": [0]}
            )
        # NULL grid values (a key's leading slots before its first
        # non-null observation) arrive as NaN; the conventions mirror
        # the SQL oracle exactly: a comparison against NULL contributes
        # sign 0, NULL slopes are skipped by the Sen median
        # (quantile_disc semantics), and NULL is one tie level (SQL
        # GROUP BY groups all NULLs together). The old HOF path
        # tolerated NULLs the same way; a bare int64 cast here crashed
        # the Arrow worker instead (review finding, r11).
        q = pdf["__q"].to_numpy(dtype=np.float64)  # ints < 2^53: exact
        v = pdf["__v"].to_numpy(dtype=np.float64)
        lo, hi = np.triu_indices(n, 1)
        s_stat = int(np.nan_to_num(np.sign(q[hi] - q[lo]), nan=0.0).sum())
        slopes = (v[hi] - v[lo]) / (hi - lo).astype(np.float64)
        good = slopes[~np.isnan(slopes)]
        sen = (
            float(np.sort(good)[math.ceil(good.size / 2) - 1])
            if good.size
            else float("nan")
        )
        nan_q = np.isnan(q)
        _, counts = np.unique(q[~nan_q], return_counts=True)
        counts = counts.astype(np.int64)
        tie = int((counts * (counts - 1) * (2 * counts + 5)).sum())
        nn = int(nan_q.sum())
        tie += nn * (nn - 1) * (2 * nn + 5)
        return pd.DataFrame(
            {"__k": [k], "n_slots": [n], "__s": [s_stat], "__sen": [sen],
             "__tie": [tie]}
        )

    kt = base.schema["__k"].dataType.simpleString()
    rows = base.groupBy("__k").applyInPandas(
        mk,
        f"__k {kt}, n_slots bigint, __s bigint, __sen double, __tie bigint",
    )
    n = F.col("n_slots")
    var_s = F.when(
        n >= 2,
        (
            n.cast("double") * (n - 1) * (2 * n + 5)
            - F.col("__tie").cast("double")
        )
        / 18.0,
    )
    sq = F.sqrt(var_s)
    s_col = F.when(n >= 2, F.col("__s"))
    z = F.when(
        var_s > 0,
        F.when(s_col > 0, (s_col - 1) / sq)
        .when(s_col < 0, (s_col + 1) / sq)
        .otherwise(F.lit(0.0)),
    )
    return rows.select(
        F.col("__k").alias(key),
        "n_slots",
        s_col.alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(
            (n >= 2) & ~F.isnan(F.col("__sen")), F.round(F.col("__sen"), 6)
        ).alias("sen_slope"),
    )


def seasonal_decompose(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    period_slots: int = 24,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key additive seasonal decomposition SUMMARY over the
    regularized grid: how much of each series' variance the
    ``period_slots`` cycle explains — 1 − SS_residual/SS_total where
    the fitted value at each slot is its cycle-position mean (the
    :func:`seasonal_profile` baseline). The one-number answer to "is
    this signal actually daily-periodic" that decides whether the
    q205 profile is a usable baseline or noise; the ANOVA identity
    makes it the R² of the position-as-factor model.

    Exactness: per-(key, position) moments sum micro-quantized
    DECIMAL integers; per-position residual mass SS_p − S_p²/n_p is a
    double per position, combined by an ORDERED sequential fold over
    the ≤ ``period_slots`` positions (collect_list + array_sort +
    aggregate — bounded by the cycle length, replayed term-for-term
    by the oracle's ORDER BY fold); SS_total comes from the same
    integer moments in one fixed expression. Constant series (zero
    total variance) emit NULL var_explained.

    NULL-slot convention (the :func:`mann_kendall` scenario — a key
    whose leading observations carry NULL values leaves NULL-filled
    grid slots): NULL-valued slots are EXCLUDED before the moments,
    so ``n_slots`` counts value-bearing slots only and the variance
    denominators never see phantom observations (ADVICE r11 — the
    pre-fix convention counted them in n but not in the sums, biasing
    var_total low). A key whose every slot is NULL emits no row.
    Returns (key, n_slots, n_positions, var_total, var_explained),
    6-decimal, var_total in original units.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    vq = F.round(F.col(value_col) * scale).cast("decimal(38,0)")
    pos = F.pmod(
        F.floor(F.col("slot_epoch") / step_seconds), F.lit(period_slots)
    ).cast("int")
    base = s.select(key, pos.alias("__pos"), vq.alias("__vq")).where(
        F.col("__vq").isNotNull()
    )
    per_pos = base.groupBy(key, "__pos").agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum("__vq").alias("__sp"),
        F.sum(F.col("__vq") * F.col("__vq")).alias("__ssp"),
    )
    resid_p = (
        F.col("__ssp").cast("double")
        - F.col("__sp").cast("double") * F.col("__sp").cast("double")
        / F.col("__np")
    )
    folded = (
        per_pos.select(
            key,
            "__np", "__sp", "__ssp",
            F.struct(F.col("__pos"), resid_p.alias("r")).alias("__pr"),
        )
        .groupBy(key)
        .agg(
            F.sum("__np").alias("n_slots"),
            F.count(F.lit(1)).alias("n_positions"),
            F.sum("__sp").alias("__s"),
            F.sum("__ssp").alias("__ss"),
            F.aggregate(
                F.array_sort(F.collect_list("__pr")),
                F.lit(0.0),
                lambda acc, x: acc + x["r"],
            ).alias("__ss_resid"),
        )
    )
    n = F.col("n_slots").cast("double")
    ss_tot = (
        F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / n
    )
    return folded.select(
        key,
        "n_slots",
        "n_positions",
        F.round(ss_tot / n / float(scale) ** 2, 6).alias("var_total"),
        F.when(
            ss_tot > 0, F.round(1.0 - F.col("__ss_resid") / ss_tot, 6)
        ).alias("var_explained"),
    )


def ljung_box(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    max_lag: int = 3,
    term_scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Ljung–Box portmanteau statistic per key over the regularized
    grid: Q = n·(n+2)·Σ_{k=1..m} ρ_k²/(n−k) with the
    :func:`series_autocorrelation` sample-ACF convention — the
    "is anything left in this series" whiteness screen a forecasting
    layer runs over residuals (a high Q after q234's Holt fit means
    the model missed structure; a low Q on the raw series means
    there's nothing to model). Emits the statistic and dof, not a
    p-value (the chi2_independence convention).

    Built ON the graded ACF machinery: one per-key lag window produces
    every ρ_k (quantized integer moments, 6-decimal — consumed at the
    ROUNDED value so both engines agree bit-exactly), n recovers as
    n_pairs + lag, and each term ρ_k²/(n−k) quantizes to an integer at
    ``term_scale`` BEFORE the ≤ max_lag-term sum — order-free
    addition. NULL-slot caveat (ADVICE r11): the n_pairs + lag
    recovery is exact only for a fully value-bearing grid; NULL-valued
    grid slots (leading NULL observations — the :func:`mann_kendall`
    scenario) also drop pairs from the ACF, so ``n_slots`` is the
    EFFECTIVE pair-supported length, not the raw grid length, and the
    n·(n+2) scaling uses that effective n. The oracle mirrors the
    convention, so it is deterministic cross-engine — documented
    rather than hidden behind a completeness claim. Degenerate lags
    (NULL ρ: constant series or < 2 pairs) are excluded and counted;
    keys with zero usable lags emit NULL Q. Returns
    (key, n_slots, n_lags_used, dof, q_stat), 6-decimal.
    """
    acf = series_autocorrelation(
        df, key=key, ts=ts, value_col=value_col,
        step_seconds=step_seconds, max_lag=max_lag,
    )
    n = (F.col("n_pairs") + F.col("lag")).cast("double")
    term = F.when(
        F.col("acf").isNotNull(),
        F.round(
            F.col("acf") * F.col("acf") / (n - F.col("lag")) * term_scale
        ).cast("decimal(38,0)"),
    )
    agg = acf.groupBy(key).agg(
        F.max(F.col("n_pairs") + F.col("lag")).alias("n_slots"),
        F.count(term).alias("n_lags_used"),
        F.sum(term).alias("__t"),
    )
    nn = F.col("n_slots").cast("double")
    return agg.select(
        key,
        "n_slots",
        "n_lags_used",
        F.col("n_lags_used").cast("bigint").alias("dof"),
        F.when(
            F.col("n_lags_used") > 0,
            F.round(
                nn * (nn + 2.0) * F.col("__t").cast("double") / term_scale, 6
            ),
        ).alias("q_stat"),
    )


def lagged_crosscorr(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    split_col: str,
    split_a,
    split_b,
    step_seconds: int,
    max_lag: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key lagged cross-correlation between TWO series carved out of
    one event stream (rows where ``split_col`` = a vs = b, each
    regularized onto the shared absolute slot grid): for every lag
    k ∈ [−max_lag, +max_lag], the Pearson correlation between series A
    at t and series B at t+k — the lead/lag detector
    :func:`series_correlation` (lag 0 only) and
    :func:`series_autocorrelation` (self only) can't express: "do
    clicks lead purchases, and by how many slots". Positive lag means
    B LAGS A (A at t aligns with B later); read the argmax row per key.

    Shape: two :func:`resample_ffill` passes (each hash-keyed, grids
    aligned to the same absolute epoch multiples so the inner join on
    (key, slot) is exact), ONE per-key window computes every shifted
    column (lag for positive, lead for negative — the joined grid is
    the intersection of two complete spans, itself complete, so
    shift-by-k is exactly k slots), an unpivot to (key, lag) rows, and
    quantized integer moments (the :func:`series_autocorrelation`
    convention — per-operand DECIMAL casts, one fixed IEEE expression).
    Pairs where EITHER side is missing drop — the shift running off the
    span, or a NULL-VALUED slot on either side (leading NULL
    observations, the :func:`mann_kendall`/:func:`seasonal_decompose`
    scenario — review finding r12: filtering only the shifted side
    would count phantom A-side slots in n_pairs while the x-moments
    skip them, the exact ADVICE-r11 bias class). Degenerate groups
    (constant series, < 2 pairs) emit NULL. Returns
    (key, lag, n_pairs, xcorr), 6-decimal.
    """
    sp = F.col(split_col)
    a = resample_ffill(
        df.where(sp == F.lit(split_a)), key, ts, value_col, step_seconds
    ).select(key, "slot_epoch", F.col(value_col).alias("__va"))
    b = resample_ffill(
        df.where(sp == F.lit(split_b)), key, ts, value_col, step_seconds
    ).select(key, "slot_epoch", F.col(value_col).alias("__vb"))
    j = a.join(b, [key, "slot_epoch"])
    w = Window.partitionBy(key).orderBy(F.col("slot_epoch").asc())
    shifted = []
    for k in range(-max_lag, max_lag + 1):
        # positive lag pairs A(t) with B(t+k) — B later, i.e. B lags A
        col = (
            F.col("__vb") if k == 0
            else F.lead("__vb", k).over(w) if k > 0
            else F.lag("__vb", -k).over(w)
        )
        shifted.append(col.alias(f"__s{k + max_lag}"))
    wide = j.select(key, F.col("__va").alias("__v"), *shifted)
    return _unpivot_lag_pearson(
        wide, [key], list(range(-max_lag, max_lag + 1)), "xcorr", scale
    )


def periodogram(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    periods: tuple[int, ...] = (2, 3, 4, 6, 8, 12),
) -> DataFrame:
    """Discrete-Fourier power at FIXED candidate periods over the
    resampled grid — the frequency-domain periodicity detector next to
    :func:`series_autocorrelation` (lag domain) and
    :func:`seasonal_decompose` (assumes the period is known): for each
    key and candidate period p, power = (A² + B²)/n² with
    A = Σ (v−v̄)·cos(2π·(t mod p)/p), B the sine sum — high power at
    the true cycle length, near-zero elsewhere. Series are CENTERED
    per key (mean subtracted) so the DC offset can't leak unequal
    partial-cycle residue into every candidate.

    Exactness: slot index and (t mod p) are pure integers; the mean is
    the exact rational Σround(v·10⁶)/(n·10⁶); each trig term is
    micro-quantized half-up BEFORE summation (round(vc·cos(x)·10⁶) —
    the q278/q285 quantized-transcendental convention, with the 2π
    literal pinned to one double so both engines evaluate cos on
    identical operand bits), so the per-(key, period) sums are integer
    and order-independent. The best period per key is flagged by a
    (power desc, period asc) rank — a bounded per-key window over
    len(``periods``) rows. Keys with fewer than 2 observed slots emit
    no rows. Returns (key, period, n_slots, power, is_best).
    """
    two_pi = 6.283185307179586  # float(2·π), pinned as a literal
    step = int(step_seconds)
    s = resample_ffill(df, key, ts, value_col, step)
    base = s.select(
        F.col(key).alias("__k"),
        "slot_epoch",
        F.col(value_col).cast("double").alias("__v"),
    )
    # r15: the per-key anchors (first slot, quantized sum, count) as
    # window columns over the resample's own key partitioning — the
    # previous groupBy + join-back planned the resample subtree twice
    wk = Window.partitionBy("__k")
    j = (
        base.withColumn("__s0", F.min("slot_epoch").over(wk))
        .withColumn(
            "__sq",
            F.sum(F.round(F.col("__v") * 1_000_000).cast("bigint")).over(wk),
        )
        .withColumn("__nv", F.count("__v").over(wk))
        .where(F.col("__v").isNotNull() & (F.col("__nv") >= 2))
        .select(
            "__k",
            F.expr(f"(slot_epoch - __s0) div {step}").alias("__t"),
            (
                F.col("__v")
                - (F.col("__sq").cast("double") / F.col("__nv")) / 1_000_000
            ).alias("__vc"),
        )
        .withColumn("__p", F.explode(F.array(*[F.lit(int(p)) for p in periods])))
    )
    x = (F.lit(two_pi) * (F.col("__t") % F.col("__p"))) / F.col("__p")
    terms = j.select(
        "__k",
        "__p",
        F.round(F.col("__vc") * F.cos(x) * 1_000_000).cast("bigint").alias("__a"),
        F.round(F.col("__vc") * F.sin(x) * 1_000_000).cast("bigint").alias("__b"),
    )
    g = terms.groupBy("__k", "__p").agg(
        F.sum("__a").alias("__aq"),
        F.sum("__b").alias("__bq"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    ad = F.col("__aq").cast("double") / 1_000_000
    bd = F.col("__bq").cast("double") / 1_000_000
    nd = F.col("__n").cast("double")
    scored = g.select(
        "__k",
        "__p",
        F.col("__n").alias("n_slots"),
        F.round((ad * ad + bd * bd) / (nd * nd), 6).alias("power"),
    )
    wr = Window.partitionBy("__k").orderBy(
        F.col("power").desc(), F.col("__p").asc()
    )
    return scored.withColumn(
        "is_best", (F.row_number().over(wr) == 1).cast("boolean")
    ).select(
        F.col("__k").alias(key),
        F.col("__p").cast("int").alias("period"),
        "n_slots",
        "power",
        "is_best",
    )


def hurst_exponent(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    window_sizes: tuple[int, ...] = (8, 16, 32, 64),
) -> DataFrame:
    """Hurst exponent per key via classic rescaled-range (R/S) analysis
    over the resampled grid — the long-memory diagnostic
    (H ≈ 0.5 noise, → 1 persistent/trending, → 0 mean-reverting) that
    complements :func:`series_autocorrelation` (fixed lags) and
    :func:`mann_kendall_trend` (monotone only): for each block size w,
    the series splits into complete blocks, each block reports
    R/S = (range of its mean-centered cumulative sums)/(its population
    std), and H is the log–log OLS slope of the mean R/S against w.

    Exactness: on the micro-quantized series, every block's centered
    cumulative sum is scaled by w so it stays an EXACT integer
    (w·run_i − i·Σq — no per-step mean subtraction in float), the
    block's R/S is one fixed-order double expression from integer
    operands, per-(key, w) means re-quantize the block R/S values
    half-up before summing, and the ≤len(window_sizes)-point OLS runs
    entirely on micro-quantized ln terms — the slope's numerator and
    denominator are exact bigint combinations of integer products
    (n·Σ(qx·qy) − Σqx·Σqy), so the scales cancel and only the final
    division is float. Only complete blocks (exactly w slots, no NULL
    values, positive std) count; keys with fewer than 2 usable block
    sizes emit NULL H. Returns (key, n_sizes, hurst).
    """
    step = int(step_seconds)
    s = resample_ffill(df, key, ts, value_col, step)
    base = s.select(
        F.col(key).alias("__k"),
        "slot_epoch",
        F.round(F.col(value_col) * 1_000_000).cast("bigint").alias("__q"),
    ).where(F.col("__q").isNotNull())
    # r15: the key's first slot as a window column over the resample's
    # own key partitioning — the previous one-row-frame join-back
    # re-planned the resample subtree on both sides of the join
    t = base.withColumn(
        "__s0", F.min("slot_epoch").over(Window.partitionBy("__k"))
    ).select(
        "__k",
        F.expr(f"(slot_epoch - __s0) div {step}").alias("__t"),
        "__q",
    )
    sized = t.withColumn(
        "__w", F.explode(F.array(*[F.lit(int(w)) for w in window_sizes]))
    ).select(
        "__k",
        "__w",
        (F.col("__t") % F.col("__w")).alias("__i"),
        F.expr("__t div __w").alias("__b"),
        "__q",
    )
    dec = "decimal(38,0)"
    # r15: the per-block count/Σq/Σq² ride the SAME (key, w, block)
    # partitioning as the centered-cumulative window below, as window
    # aggregates — the previous groupBy + join-back evaluated the
    # resample→explode subtree twice and added a join; the sums are
    # the same DECIMAL accumulations over the same groups
    wb = Window.partitionBy("__k", "__w", "__b")
    wrun = wb.orderBy(F.col("__i").asc())
    run = (
        sized.withColumn("__cnt", F.count(F.lit(1)).over(wb))
        .withColumn("__sq", F.sum(F.col("__q").cast(dec)).over(wb))
        .withColumn("__s2", F.sum((F.col("__q").cast(dec)) * F.col("__q")).over(wb))
        .where(F.col("__cnt") == F.col("__w"))
        .select(
            "__k",
            "__w",
            "__b",
            "__sq",
            "__s2",
            # w·run_i − (i+1)·Σq: exact bigint centered cumulative ·w
            (
                F.col("__w").cast("bigint")
                * F.sum("__q").over(wrun.rowsBetween(Window.unboundedPreceding, 0))
                - F.row_number().over(wrun) * F.col("__sq").cast("bigint")
            ).alias("__cd"),
        )
    )
    per_block = run.groupBy("__k", "__w", "__b", "__sq", "__s2").agg(
        (F.max("__cd") - F.min("__cd")).alias("__rng")
    )
    wd = F.col("__w").cast("double")
    sqd = F.col("__sq").cast("double")
    s2d = F.col("__s2").cast("double")
    var_q = s2d / wd - (sqd / wd) * (sqd / wd)  # in squared micro-units
    rs = (F.col("__rng").cast("double") / wd) / F.sqrt(var_q)
    usable = per_block.where(var_q > 0).select(
        "__k", "__w", F.round(rs * 1_000_000).cast("bigint").alias("__rsq")
    )
    per_w = usable.groupBy("__k", "__w").agg(
        F.sum("__rsq").alias("__srs"), F.count(F.lit(1)).alias("__nb")
    ).where(F.col("__srs") > 0)
    mean_rs = F.col("__srs").cast("double") / F.col("__nb") / 1_000_000
    pts = per_w.select(
        "__k",
        F.round(F.log(F.col("__w").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("__qx"),
        F.round(F.log(mean_rs) * 1_000_000).cast("bigint").alias("__qy"),
    )
    ols = pts.select(
        "__k",
        "__qx",
        "__qy",
        (F.col("__qx") * F.col("__qy")).alias("__qxy"),
        (F.col("__qx") * F.col("__qx")).alias("__qxx"),
    ).groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__np"),
        F.sum("__qx").alias("__sx"),
        F.sum("__qy").alias("__sy"),
        F.sum("__qxy").alias("__sxy"),
        F.sum("__qxx").alias("__sxx"),
    )
    num = F.col("__np") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("__np") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return ols.select(
        F.col("__k").alias(key),
        F.col("__np").alias("n_sizes"),
        F.when(
            (F.col("__np") >= 2) & (den > 0),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("hurst"),
    )


def forecast_backtest(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    alpha: float = 0.3,
    max_slots: int = _SERIES_MAX_SLOTS,
) -> DataFrame:
    """One-step-ahead backtest of the :func:`ewma` forecaster per key —
    the model-selection readout of the smoothing family (is α any good
    on THIS series?): the forecast for slot t is the EWMA state at
    t−1, and the report aggregates the exact integer errors into MAE,
    bias (mean signed error), and MAPE (over slots with a non-zero
    actual, counted separately — a percentage against zero is
    undefined, not infinite).

    Exactness: rides :func:`ewma`'s integer micro-unit state verbatim
    (the state is recovered exactly from the emitted ewma column:
    eq < 2⁵³/10⁶, so round(ewma·10⁶) inverts the one shared division),
    error = round(v·10⁶) − lag(eq) stays integer, and each MAPE term
    micro-quantizes |err|/|actual| half-up before summation. The lag
    window partitions by key (the grid bound, never event volume).
    First slots have no forecast and are excluded. Returns
    (key, n_forecasts, mae, bias, n_mape, mape).
    """
    e = ewma(df, key, ts, value_col, step_seconds, alpha, max_slots)
    w = Window.partitionBy(key).orderBy(F.col("slot_epoch").asc())
    eq = F.round(F.col("ewma") * 1_000_000).cast("bigint")
    vq = F.round(F.col(value_col) * 1_000_000).cast("bigint")
    scored = e.select(
        F.col(key).alias("__k"),
        vq.alias("__vq"),
        F.lag(eq).over(w).alias("__fq"),
    ).where(F.col("__fq").isNotNull())
    err = F.col("__vq") - F.col("__fq")
    terms = scored.select(
        "__k",
        err.alias("__e"),
        F.abs(err).alias("__ae"),
        F.when(
            F.col("__vq") != 0,
            F.round(F.abs(err) / F.abs(F.col("__vq")) * 1_000_000).cast("bigint"),
        ).alias("__mq"),
    )
    n = F.count(F.lit(1))
    return terms.groupBy("__k").agg(
        n.cast("bigint").alias("n_forecasts"),
        F.round(F.sum("__ae").cast("double") / n / 1_000_000, 6).alias("mae"),
        F.round(F.sum("__e").cast("double") / n / 1_000_000, 6).alias("bias"),
        F.count("__mq").cast("bigint").alias("n_mape"),
        F.when(
            F.count("__mq") > 0,
            F.round(
                F.sum("__mq").cast("double") / F.count("__mq") / 1_000_000, 6
            ),
        ).alias("mape"),
    ).withColumnRenamed("__k", key)


def runs_test(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per key: is the series' above/below-its-
    own-median sign sequence RANDOM in time order, or does it cluster
    (trending/regime-switching: few long runs → z ≪ 0) or oscillate
    (mean-reverting/alternating: many short runs → z ≫ 0)? The
    sequence-randomness screen beside :func:`series_autocorrelation`
    (which measures linear dependence; runs see any sign structure) and
    :func:`mann_kendall_trend` (monotone trend only).

    The split point is the key's own DISCRETE median (the
    :func:`_disc_median_per_key` machinery — exact, per-key bounded);
    observations EQUAL to the median are excluded (the classic
    convention; their count is reported). Runs count from ONE per-key
    lag window over (epoch µs, value)-ordered rows — the value tiebreak
    makes equal-timestamp rows deterministic on both engines. The null
    moments E[R] = 1 + 2n₁n₂/n and Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1))
    are fixed-order double expressions over exact integer counts.
    Returns (key, n_above, n_below, n_ties, n_runs, expected_runs, z),
    6-decimal; a one-sided key (n₁ = 0 or n₂ = 0) or n < 2 reports
    NULL z.
    """
    k = F.col(key)
    v = F.col(value_col).cast("double")
    pool = df.where(k.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        k.alias("__k"),
        F.unix_micros(F.col(ts)).alias("__e"),
        v.alias("__v"),
    )
    med = _disc_median_per_key(pool, "__k", "__v", "__med")
    tagged = pool.join(med, "__k")
    ties = tagged.groupBy("__k").agg(
        F.sum((F.col("__v") == F.col("__med")).cast("bigint")).alias("n_ties")
    )
    signed = tagged.where(F.col("__v") != F.col("__med")).select(
        "__k", "__e", "__v", (F.col("__v") > F.col("__med")).cast("int").alias("__s")
    )
    w = Window.partitionBy("__k").orderBy(F.col("__e").asc(), F.col("__v").asc())
    flipped = signed.select(
        "__k",
        "__s",
        F.when(
            F.lag("__s").over(w).isNotNull(),
            (F.col("__s") != F.lag("__s").over(w)).cast("bigint"),
        ).alias("__flip"),
    )
    agg = flipped.groupBy("__k").agg(
        F.sum("__s").cast("bigint").alias("n_above"),
        F.sum(F.lit(1) - F.col("__s")).cast("bigint").alias("n_below"),
        (F.coalesce(F.sum("__flip"), F.lit(0)) + 1).cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    n = n1 + n2
    e_runs = F.lit(1.0) + 2.0 * n1 * n2 / n
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0) & (n > 1)
    out = agg.join(ties, "__k").select(
        F.col("__k").alias(key),
        "n_above",
        "n_below",
        "n_ties",
        "n_runs",
        F.when(ok, F.round(e_runs, 6)).alias("expected_runs"),
        F.when(
            ok & (var > 0),
            F.round((F.col("n_runs").cast("double") - e_runs) / F.sqrt(var), 6),
        ).alias("z"),
    )
    return out


def step_change_report(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Retrospective level-shift locator per key — the binary-
    segmentation FIRST split: over the regularized grid, the slot
    boundary maximizing |mean(after) − mean(before)|, with both
    segment means and the shift magnitude. The offline counterpart to
    :func:`cusum_changepoints` (online alarm with thresholds): CUSUM
    says "something drifted, around here"; this names THE split a
    report can annotate, thresholds-free.

    One :func:`resample_ffill` pass builds the grid (NULL-valued
    leading slots excluded — the lagged_crosscorr convention), values
    micro-quantize once, ONE per-key window yields prefix counts and
    exact integer prefix sums, every interior boundary's segment means
    are fixed-order doubles over those integers, and the argmax is a
    bounded per-key rank on (quantized |shift| desc, slot asc) — ties
    break to the EARLIEST boundary on both engines. Returns
    (key, n_slots, split_slot_epoch [last slot of the left segment],
    mean_before, mean_after, shift), 6-decimal; keys with < 2
    value-bearing slots emit no row.
    """
    s = resample_ffill(df, key, ts, value_col, step_seconds)
    pool = s.where(F.col(value_col).isNotNull()).select(
        F.col(key).alias("__k"),
        F.col("slot_epoch").alias("__t"),
        F.round(F.col(value_col) * 1_000_000).cast("bigint").alias("__q"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("__k")
    pref = pool.select(
        "__k",
        "__t",
        F.row_number().over(
            Window.partitionBy("__k").orderBy(F.col("__t").asc())
        ).alias("__i"),
        F.sum("__q").over(w).alias("__si"),
        F.count(F.lit(1)).over(wk).alias("__n"),
        F.sum("__q").over(wk).alias("__s"),
    )
    cand = pref.where(F.col("__i") < F.col("__n"))
    mean_l = F.col("__si").cast("double") / F.col("__i") / 1_000_000
    mean_r = (
        (F.col("__s") - F.col("__si")).cast("double")
        / (F.col("__n") - F.col("__i"))
        / 1_000_000
    )
    diff = mean_r - mean_l
    scored = cand.select(
        "__k",
        "__t",
        "__n",
        mean_l.alias("__ml"),
        mean_r.alias("__mr"),
        diff.alias("__d"),
        F.round(F.abs(diff) * 1_000_000).cast("bigint").alias("__qd"),
    )
    wr = Window.partitionBy("__k").orderBy(
        F.col("__qd").desc(), F.col("__t").asc()
    )
    best = scored.withColumn("__rn", F.row_number().over(wr)).where(
        F.col("__rn") == 1
    )
    return best.select(
        F.col("__k").alias(key),
        F.col("__n").alias("n_slots"),
        F.col("__t").alias("split_slot_epoch"),
        F.round(F.col("__ml"), 6).alias("mean_before"),
        F.round(F.col("__mr"), 6).alias("mean_after"),
        F.round(F.col("__d"), 6).alias("shift"),
    )


def theil_sen(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    max_rows: int = 2000,
) -> DataFrame:
    """Theil–Sen robust trend per key — the MEDIAN of all pairwise
    slopes (vⱼ−vᵢ)/(tⱼ−tᵢ), in value-units per HOUR: the outlier-proof
    alternative to :func:`series_trend`'s least-squares line (one wild
    spike moves an OLS slope arbitrarily; it moves a median of
    O(n²) slopes not at all — breakdown point ≈ 29%). The ordinal
    cousin is :func:`mann_kendall_trend` (sign-only); Theil–Sen is its
    canonical slope estimator.

    All-pairs by definition — O(n²) per key — so the per-key bound is
    MACHINE-ENFORCED (``max_rows``, the kendall_tau convention) and
    the pair pass runs as an Arrow-batched grouped map over
    JVM-quantized integers: slopes compute as the fixed expression
    ((qvⱼ−qvᵢ)/10⁶) / ((qtⱼ−qtᵢ)/(3600·10⁶)) over exact micro-value /
    epoch-µs integers (identical doubles on both engines), zero-Δt
    pairs drop (two observations in the same microsecond have no
    slope — counted via n_pairs), and the median averages the two
    middle order statistics ((m−1)//2 and m//2, the same element twice
    when m is odd) before ONE half-away 6-decimal round. Keys with
    n < 2 or no usable pair emit NULL slope. Returns
    (key, n, n_pairs, slope_per_hour).
    """
    v = F.col(value_col).cast("double")
    pool = df.where(
        v.isNotNull() & ~F.isnan(v) & F.col(ts).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(ts)).alias("__qt"),
        F.round(v * 1_000_000).cast("bigint").alias("__qv"),
    )
    cap = int(max_rows)

    def ts_slope(pdf):
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"theil_sen: a key has {n} rows, over max_rows={cap}; "
                "the slope pass materializes O(n^2) pairs - raise "
                "max_rows explicitly if this volume is intended"
            )
        k = pdf["__k"].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {"__k": [k], "n": [n], "n_pairs": [0],
                 "slope_per_hour": [None]}
            )
        qt = pdf["__qt"].to_numpy(dtype=np.int64)
        qv = pdf["__qv"].to_numpy(dtype=np.int64)
        lo, hi = np.triu_indices(n, 1)
        dt = qt[hi] - qt[lo]
        dv = qv[hi] - qv[lo]
        keep = dt != 0
        m = int(keep.sum())
        if m == 0:
            return pd.DataFrame(
                {"__k": [k], "n": [n], "n_pairs": [0],
                 "slope_per_hour": [None]}
            )
        # fixed operand order, mirrored by the oracle expression
        slopes = (dv[keep].astype(np.float64) / 1e6) / (
            dt[keep].astype(np.float64) / 3600e6
        )
        slopes.sort()
        med = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2.0
        out = math.copysign(math.floor(abs(med) * 1e6 + 0.5), med) / 1e6
        return pd.DataFrame(
            {"__k": [k], "n": [n], "n_pairs": [m], "slope_per_hour": [out]}
        )

    key_type = df.schema[key].dataType.simpleString()
    out = pool.groupBy("__k").applyInPandas(
        ts_slope,
        f"__k {key_type}, n bigint, n_pairs bigint, slope_per_hour double",
    )
    return out.withColumnRenamed("__k", key)


def max_drawdown(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Maximum drawdown per key — the deepest peak-to-trough fall of the
    value series in time order (max over t of running_max − v, plus the
    same as a fraction of the peak it fell from): the "worst slide"
    risk statistic next to :func:`series_extrema` (which finds global
    extremes — a series can set its low BEFORE its high and have zero
    drawdown) and :func:`cusum_changepoints` (mean shifts, not falls).

    One per-key ordered running-max window over micro-quantized
    integers (tiebroken by ``id_col`` when given, so duplicate
    timestamps order deterministically), then one aggregation: the
    absolute drawdown is exact integer max(runmax − q); the fractional
    form quantizes (runmax − q)/runmax per row (exact ints → one
    double division) only where the running peak is positive, and
    takes the max. Rows with NULL/NaN values drop. Keys where the
    series never falls report exact 0. Returns
    (key, n_obs, peak_value, max_drawdown, max_drawdown_frac).
    """
    v = F.col(value_col).cast("double")
    pool = df.where(
        v.isNotNull() & ~F.isnan(v) & F.col(ts).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        *([F.col(id_col).alias("__id")] if id_col else []),
        F.round(v * 1_000_000).cast("bigint").alias("__q"),
    )
    order = [F.col("__ts").asc()] + (
        [F.col("__id").asc()] if id_col else []
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pool.select(
        "__k", "__q", F.max("__q").over(w).alias("__peak")
    )
    dd = F.col("__peak") - F.col("__q")
    frac = F.when(
        F.col("__peak") > 0,
        dd.cast("double") / F.col("__peak").cast("double"),
    )
    agg = run.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.max("__q").cast("double") / 1_000_000).alias("peak_value"),
        (F.max(dd).cast("double") / 1_000_000).alias("max_drawdown"),
        # frac is a non-negative exact rational: the floor(x·10⁶ + 0.5)
        # recipe is the cross-engine half-up round (rounding commutes
        # with max — both monotone)
        (F.floor(F.max(frac) * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
            "max_drawdown_frac"
        ),
    )
    return agg.withColumnRenamed("__k", key)


def spectral_entropy(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    periods: tuple[int, ...] = (2, 3, 4, 6, 8, 12),
) -> DataFrame:
    """Spectral entropy per key — Shannon entropy of the normalized
    :func:`periodogram` power distribution over the fixed candidate
    set: ONE number for "is this series rhythmic or noise" (a pure
    cycle concentrates power in one candidate → entropy near 0; flat
    noise spreads it → entropy near log₂ of the candidate count). The
    scalar screen a monitoring pipeline reads before paying for the
    full per-period table, and the frequency-domain twin of
    :func:`~.stats.dispersion_index`'s time-domain burstiness.

    Rides :func:`periodogram` VERBATIM (same grid, same quantized trig
    terms, same centered series — one implementation), then: powers
    re-quantize to micro-units, the per-key total is an exact integer
    sum, each nonzero candidate contributes
    round_half_away((p/T)·log₂(p/T)·10⁹) over the exact integer ratio,
    and the entropy finalizes once (half-away, 6-decimal). The
    normalization divides by log₂(len(periods)) — a pinned-literal
    double both engines compute identically. Keys whose candidates all
    score zero power (constant series) emit NULL entropy. Returns
    (key, n_candidates, n_nonzero, dominant_period,
    spectral_entropy_bits, normalized_entropy).
    """
    import math

    pg = periodogram(df, key, ts, value_col, step_seconds, periods=periods)
    pq = F.round(F.col("power") * 1_000_000).cast("bigint")
    per = pg.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(pq > 0, 1).otherwise(0)).alias("n_nonzero"),
        F.max(F.when(F.col("is_best"), F.col("period"))).alias(
            "dominant_period"
        ),
        F.sum(pq).alias("__t"),
        F.collect_list(F.struct(F.col("period"), pq.alias("__pq"))).alias(
            "__ps"
        ),
    )
    # Σ (p/T)·log₂(p/T) over the bounded candidate list — a higher-order
    # array fold over ≤ len(periods) elements, micro-quantized half-up
    # per term (the sign-symmetric floor recipe: terms are ≤ 0)
    t_d = F.col("__t").cast("double")
    ratio = lambda x: x["__pq"].cast("double") / t_d  # noqa: E731
    term = lambda x: (  # noqa: E731
        -F.floor(-(ratio(x) * F.log2(ratio(x))) * 1e9 + F.lit(0.5))
    ).cast("bigint")
    sum_terms = F.aggregate(
        F.filter("__ps", lambda x: x["__pq"] > 0),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + term(x),
    )
    max_bits = math.log2(len(periods))
    h = -sum_terms.cast("double") / 1e9
    ok = F.col("__t") > 0
    # both outputs are non-negative: the floor(x·10⁶ + 0.5) recipe is
    # the cross-engine half-up round (h is an exact n/10⁹ rational —
    # F.round's BigDecimal path would diverge on .5 boundaries)
    r6 = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return per.select(
        key,
        "n_candidates",
        F.col("n_nonzero").cast("bigint").alias("n_nonzero"),
        "dominant_period",
        F.when(ok, r6(h)).alias("spectral_entropy_bits"),
        F.when(ok, r6(h / F.lit(max_bits))).alias("normalized_entropy"),
    )


def variance_ratio_test(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    step_seconds: int,
    q: int = 4,
) -> DataFrame:
    """Lo–MacKinlay variance ratio per key — Var(q-step change) /
    (q · Var(1-step change)) over the regular grid: the random-walk
    test completing the memory family (:func:`hurst_exponent` reads
    long memory from R/S scaling; :func:`series_autocorrelation` one
    lag at a time; VR reads it as ONE calibrated number — a random
    walk scores 1, a trending series > 1, a mean-reverting one < 1).

    Rides :func:`resample_ffill` VERBATIM (same grid, same fill, same
    staleness semantics — one resampling implementation); filled
    values micro-quantize once, both difference series come from ONE
    per-key ordered lag window (lag 1 and lag q over the same
    exchange), q-step changes are OVERLAPPING (the Lo–MacKinlay
    convention; n_q = n_slots − q), and both population variances are
    exact DECIMAL(38,0) moments divided in one fixed order. The ratio
    is an exact-rational double emitted UNROUNDED (identical bits on
    both engines — the floor-recipe convention's sibling). Keys with a
    degenerate 1-step variance (a constant or perfectly linear grid)
    emit NULL vr. Returns
    (key, n_slots, n_diffs_1, n_diffs_q, variance_1, variance_q, vr).
    """
    dec = "decimal(38,0)"
    step_q = int(q)
    rs = resample_ffill(df, key, ts, value_col, step_seconds)
    qv = F.round(F.col("value") * 1_000_000).cast("bigint")
    base = rs.select(F.col(key).alias("__k"), F.col("slot_epoch"), qv.alias("__q"))
    w = Window.partitionBy("__k").orderBy(F.col("slot_epoch").asc())
    d = base.select(
        "__k",
        (F.col("__q") - F.lag("__q", 1).over(w)).alias("__d1"),
        (F.col("__q") - F.lag("__q", step_q).over(w)).alias("__dq"),
    )
    agg = d.groupBy("__k").agg(
        (F.count(F.lit(1))).alias("n_slots"),
        F.count("__d1").alias("__n1"),
        F.count("__dq").alias("__nq"),
        F.sum(F.col("__d1").cast(dec)).alias("__s1"),
        F.sum((F.col("__d1").cast(dec) * F.col("__d1")).cast(dec)).alias("__ss1"),
        F.sum(F.col("__dq").cast(dec)).alias("__sq"),
        F.sum((F.col("__dq").cast(dec) * F.col("__dq")).cast(dec)).alias("__ssq"),
    )
    n1 = F.col("__n1").cast("double")
    nq = F.col("__nq").cast("double")
    # population variance of the micro-int diffs, in value units²:
    # (Σd² − (Σd)²/n)/n / 10¹² — one fixed operand order
    v1 = (
        (F.col("__ss1").cast("double")
         - F.col("__s1").cast("double") * F.col("__s1").cast("double") / n1)
        / n1 / 1e12
    )
    vq = (
        (F.col("__ssq").cast("double")
         - F.col("__sq").cast("double") * F.col("__sq").cast("double") / nq)
        / nq / 1e12
    )
    ok1 = F.col("__n1") >= 2
    okq = F.col("__nq") >= 2
    return agg.select(
        F.col("__k").alias(key),
        F.col("n_slots").cast("bigint").alias("n_slots"),
        F.col("__n1").cast("bigint").alias("n_diffs_1"),
        F.col("__nq").cast("bigint").alias("n_diffs_q"),
        F.when(ok1, v1).alias("variance_1"),
        F.when(okq, vq).alias("variance_q"),
        F.when(ok1 & okq & (v1 > 0), vq / (F.lit(float(step_q)) * v1)).alias(
            "vr"
        ),
    )


def durbin_watson(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Durbin–Watson statistic per key series — Σ(Δe)²/Σe² over the
    mean-centered series in time order: THE classic first-order
    autocorrelation screen (DW ≈ 2 ⇒ independent residuals, → 0 ⇒
    positive serial correlation, → 4 ⇒ alternation), read before
    trusting any i.i.d.-assuming test (:func:`runs_test` gives the
    sign-sequence view; DW gives the magnitude view) and after a trend
    fit (:func:`series_trend`) to check what the fit left behind.

    Exactness: the mean CANCELS in the numerator (Δe = Δx), so the
    numerator is the exact integer Σ(x_i − x_{i−1})² over micro-
    quantized values from ONE per-key lag window; the denominator is
    the exact centered moment n·Σx² − S² over n; DW = n·num/(n·Σx²−S²)
    divides ONCE in fixed-order doubles (the common 10¹² quantization
    factor cancels exactly). rho_approx = 1 − DW/2 is the implied
    lag-1 coefficient. Time order tiebreaks on the quantized value
    (documented — duplicate timestamps order deterministically on both
    engines). Keys need n ≥ 2 (no pairs → no row); a constant series
    has zero denominator → NULL DW. All accumulation DECIMAL(38,0).
    Returns (key, n, dw, rho_approx).
    """
    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(
        F.col(key).isNotNull() & v.isNotNull() & ~F.isnan(v)
    ).select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.round(v * scale).cast("bigint").alias("__vq"),
    )
    w = Window.partitionBy("__k").orderBy(
        F.col("__ts").asc(), F.col("__vq").asc()
    )
    lagged = pool.select(
        "__k",
        "__vq",
        (F.col("__vq") - F.lag("__vq").over(w)).alias("__d"),
    )
    agg = lagged.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col("__vq").cast(dec)).alias("__s"),
        F.sum(F.col("__vq").cast(dec) * F.col("__vq")).alias("__ss"),
        F.sum(F.col("__d").cast(dec) * F.col("__d")).alias("__num"),
    )
    n_d = F.col("__n").cast("double")
    den = (
        n_d * F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double")
    )
    dw = n_d * F.col("__num").cast("double") / den
    h6 = lambda x: (  # noqa: E731  signed half-away micro round
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return agg.where(F.col("__n") >= 2).select(
        F.col("__k").alias(key),
        F.col("__n").alias("n"),
        F.when(den > 0, h6(dw)).alias("dw"),
        F.when(den > 0, h6(F.lit(1.0) - dw / 2.0)).alias("rho_approx"),
    )


def turning_points_test(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """Turning-points randomness test per key: count interior local
    extrema (strict peaks and troughs) in the time-ordered series and
    compare against the i.i.d. null E[T] = 2(n−2)/3,
    Var[T] = (16n−29)/90 — the oscillation-vs-smoothness screen beside
    :func:`runs_test` (sign clustering around the median; turning
    points see LOCAL shape, so a slow drift with jitter reads random
    here while runs flags it) and :func:`series_autocorrelation`
    (linear dependence only). z ≪ 0 → too few turns (smooth/trending),
    z ≫ 0 → too many (anti-persistent, faster than noise).

    Convention (documented): consecutive EQUAL values collapse to
    their first row before counting (the classic tie treatment —
    a plateau is one observation; collapsed rows are counted), so
    every kept neighbor pair differs and peaks/troughs are strict.
    Order is (epoch µs, value) — the :func:`runs_test` deterministic
    tiebreak. Scale shape: two per-key lag/lead windows (key-
    partitioned, never global) and one groupBy; the null moments are
    fixed-order doubles over exact integer counts. Returns
    (key, n, n_collapsed, n_turning_points, expected, z), 6-decimal;
    n < 3 after collapsing reports NULL expected/z.
    """
    k = F.col(key)
    v = F.col(value_col).cast("double")
    pool = df.where(k.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        k.alias("__k"),
        F.unix_micros(F.col(ts)).alias("__e"),
        v.alias("__v"),
    )
    w = Window.partitionBy("__k").orderBy(F.col("__e").asc(), F.col("__v").asc())
    lagged = pool.select(
        "__k", "__e", "__v", F.lag("__v").over(w).alias("__pv")
    )
    kept = lagged.where(
        F.col("__pv").isNull() | (F.col("__v") != F.col("__pv"))
    )
    collapsed = lagged.groupBy("__k").agg(
        F.sum(
            (F.col("__pv").isNotNull() & (F.col("__v") == F.col("__pv")))
            .cast("bigint")
        ).alias("n_collapsed")
    )
    w2 = Window.partitionBy("__k").orderBy(
        F.col("__e").asc(), F.col("__v").asc()
    )
    tri = kept.select(
        "__k",
        "__v",
        F.lag("__v").over(w2).alias("__p"),
        F.lead("__v").over(w2).alias("__x"),
    )
    turn = (
        F.col("__p").isNotNull()
        & F.col("__x").isNotNull()
        & (
            (F.col("__v") - F.col("__p")) * (F.col("__v") - F.col("__x"))
            > 0
        )
    ).cast("bigint")
    agg = tri.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(turn).alias("n_turning_points"),
    )
    n_d = F.col("n").cast("double")
    e_t = F.lit(2.0) * (n_d - F.lit(2.0)) / F.lit(3.0)
    var = (F.lit(16.0) * n_d - F.lit(29.0)) / F.lit(90.0)
    ok = F.col("n") >= 3
    return agg.join(collapsed, "__k").select(
        F.col("__k").alias(key),
        "n",
        "n_collapsed",
        "n_turning_points",
        F.when(ok, F.round(e_t, 6)).alias("expected"),
        F.when(
            ok & (var > 0),
            F.round(
                (F.col("n_turning_points").cast("double") - e_t)
                / F.sqrt(var),
                6,
            ),
        ).alias("z"),
    )


def sample_entropy(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    r_frac: float = 0.2,
    max_rows: int = 2000,
) -> DataFrame:
    """Sample entropy (SampEn, m = 2) per key — the series-complexity
    readout beside :func:`spectral_entropy` (frequency concentration)
    and :func:`series_autocorrelation` (linear memory): the negative
    log conditional probability that two length-2 template matches
    stay matched one step further, SampEn = ln(B/A). Low = regular/
    predictable (periodic telemetry, heartbeat-like), high = chaotic;
    self-matches are excluded by construction (Richman & Moorman's fix
    to ApEn's bias). Tolerance r = ``r_frac``·σ (population σ of the
    key's own series — the standard normalization), Chebyshev
    distance, matches counted with ≤ r.

    Template convention: indices run over the n−2 positions whose
    m+1 extension exists, so A ≤ B structurally and the pair
    normalizations cancel in the ratio. Order is (epoch µs, value) —
    the :func:`runs_test` deterministic tiebreak; NULL/NaN values are
    excluded (the sequence closes over gaps). All-pairs by definition
    — O(n²) per key — so the per-key bound is MACHINE-ENFORCED
    (``max_rows``, the :func:`~.stats.kendall_tau` convention) and the
    combinatorial pass runs as an Arrow-batched grouped map over
    JVM-quantized integers (round(v·10⁶) BEFORE the Arrow hop):
    match counts are exact integers, σ comes from exact integer
    moments, and the one ln finalize rounds half-away — bit-identical
    to the SQL oracle's self-join count. Returns
    (key, n, n_templates, r_tol, n_matches_m, n_matches_m1,
    sample_entropy); n < 4 emits NULL entropy, A = 0 emits NULL
    (no extension ever survives — entropy unbounded).
    """
    k = F.col(key)
    v = F.col(value_col).cast("double")
    pool = df.where(k.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        k.alias("__k"),
        F.unix_micros(F.col(ts)).alias("__e"),
        F.round(v * 1_000_000).cast("bigint").alias("__q"),
        v.alias("__v"),
    )
    cap = int(max_rows)
    rf = float(r_frac)

    def se(pdf):
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"sample_entropy: a key has {n} rows, over max_rows={cap}; "
                "the template pass materializes O(n^2) pairs - raise "
                "max_rows explicitly if this volume is intended"
            )
        kv = pdf["__k"].iloc[0]

        def rnd6(x):
            return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

        if n < 4:
            return pd.DataFrame(
                {"__k": [kv], "n": [n], "n_templates": [max(0, n - 2)],
                 "r_tol": [None], "n_matches_m": [0], "n_matches_m1": [0],
                 "sample_entropy": [None]}
            )
        o = pdf.sort_values(["__e", "__v"], kind="mergesort")
        q = o["__q"].to_numpy(dtype=np.int64)
        # population σ in micro-units from exact integer moments; the
        # operand order (sqrt of the exact difference, then /n) is
        # mirrored by the oracle
        s1 = int(q.sum())
        s2 = int((q.astype(object) * q.astype(object)).sum())
        sd = math.sqrt(float(n * s2 - s1 * s1)) / n
        r = rf * sd
        t = q[: n - 2]
        t1 = q[1: n - 1]
        t2 = q[2:]
        lo, hi = np.triu_indices(n - 2, 1)
        d0 = np.abs(t[hi] - t[lo])
        d1 = np.abs(t1[hi] - t1[lo])
        d2 = np.abs(t2[hi] - t2[lo])
        mb = (d0 <= r) & (d1 <= r)
        b = int(mb.sum())
        a = int((mb & (d2 <= r)).sum())
        ent = None
        if a > 0 and b > 0:
            ent = rnd6(math.log(float(b) / float(a)))
        return pd.DataFrame(
            {"__k": [kv], "n": [n], "n_templates": [n - 2],
             "r_tol": [rnd6(r / 1e6)], "n_matches_m": [b],
             "n_matches_m1": [a], "sample_entropy": [ent]}
        )

    key_type = df.schema[key].dataType.simpleString()
    out = pool.groupBy("__k").applyInPandas(
        se,
        f"__k {key_type}, n bigint, n_templates bigint, r_tol double, "
        "n_matches_m bigint, n_matches_m1 bigint, sample_entropy double",
    )
    return out.select(
        F.col("__k").alias(key), "n", "n_templates", "r_tol",
        "n_matches_m", "n_matches_m1", "sample_entropy",
    )
