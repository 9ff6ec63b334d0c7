"""Exact distributed order statistics.

The built-in exact ``F.percentile`` buffers a whole group in one
aggregation state — fine per-group, wrong for a GLOBAL percentile over
100 TB (one task holds the column). ``F.percentile_approx`` (q90) trades
exactness for a sketch. :func:`exact_percentile` is the third point in
that design space: exact answers with bounded memory, via the classic
multi-pass bucket-counting algorithm — no global sort, no single-task
buffering; the only driver-side data is a bounded histogram.
"""

from __future__ import annotations

import functools
import math
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(v: F.Column, lo: float, width: float, n_buckets: int) -> F.Column:
    """THE bucket assignment — built once per (lo, width) and reused by
    both the histogram pass and every narrowing filter, so the two can
    never disagree on a value that lands exactly on a float bucket
    boundary (recomputing the boundary as ``lo + b*width`` and range-
    filtering on it is NOT bit-equivalent to ``floor((v-lo)/width)``)."""
    return F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(n_buckets - 1)
    )


def _audit_take_ordered(frame: DataFrame, plan_audit: list | None) -> None:
    if plan_audit is not None:
        from ..plans.inspect import take_ordered_limits

        plan_audit.extend(take_ordered_limits(frame))


def _kth_smallest(
    sub: DataFrame, k: int, n_buckets: int, cap: int, plan_audit: list | None
) -> float:
    """The k-th smallest value of ``sub.__v`` (1-indexed), never planning
    a TakeOrdered with limit > ``cap``: while k exceeds the cap, re-bucket
    the current value range and descend into the covering bucket (each
    round shrinks the range ~n_buckets×; pure-tie ranges terminate at
    ``lo == hi``). Only once k ≤ cap does an ``orderBy().limit(k)`` run —
    a bounded per-task heap and a ≤cap-row final task, not the O(n)
    data-carrying single partition a zero-inflated column would otherwise
    produce (90% zeros + p50 ⇒ k ≈ 0.45·n inside one bucket)."""
    for _ in range(64):
        row = sub.agg(
            F.min("__v").alias("lo"), F.max("__v").alias("hi")
        ).first()
        lo, hi = row["lo"], row["hi"]
        if lo == hi:
            return lo
        if k <= cap:
            break
        width = (hi - lo) / n_buckets
        b = _bucket_expr(F.col("__v"), lo, width, n_buckets)
        hist = {
            r["b"]: r["cnt"]
            for r in sub.groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        below, target = 0, n_buckets - 1
        for bb in sorted(hist):
            if below + hist[bb] >= k:
                target = bb
                break
            below += hist[bb]
        sub = sub.where(b == F.lit(target))
        k -= below
    frame = (
        sub.orderBy(F.col("__v").asc()).limit(k).agg(F.max("__v").alias("v"))
    )
    _audit_take_ordered(frame, plan_audit)
    return frame.first()["v"]


def exact_percentile(
    df: DataFrame,
    col: str,
    percentiles: list[float],
    n_buckets: int = 1024,
    hot_cap: int | None = None,
    plan_audit: list | None = None,
) -> list[float]:
    """EXACT discrete percentiles (quantile_disc semantics: the value at
    1-indexed ascending rank ``ceil(p·n)``) of a numeric column:

    1. one narrow aggregation computes (min, max, n) over the non-null,
       non-NaN rows (NaN is counted by ``F.count`` but falls outside
       every bucket, so it is excluded up front — ranks are computed
       over exactly the population the scans can reach);
    2. one histogram pass buckets the column into ``n_buckets`` uniform
       buckets — the driver receives only the bounded histogram
       (metadata-scale: n_buckets rows, never data);
    3. ALL requested ranks are resolved against the one histogram, and
       every rank whose covering bucket is small (≤ ``hot_cap``,
       default max(10·n/n_buckets, 1024)) is answered by a SINGLE
       batched scan — a bucket-partitioned row_number over only the
       covering buckets (each partition ≤ hot_cap rows), not one
       full-column scan per percentile;
    4. a rank whose covering bucket is HOT (skew: a zero-inflated or
       low-cardinality column can put O(n) rows in one bucket)
       recursively re-buckets that bucket's value range until the local
       rank fits under the cap (:func:`_kth_smallest`) — the plan never
       contains a TakeOrdered with limit > hot_cap (assert via
       ``plan_audit``/plans.inspect.take_ordered_limits).

    Memory per task is O(hot_cap ∨ bucket), not O(n); skewed value
    distributions trigger extra bounded rounds, never a data-carrying
    single partition. Deterministic: bucket assignment is ONE shared
    expression (histogram and filters can't disagree on boundary
    values) and ranks are integers.

    Returns the percentile values in the order requested. Raises on an
    empty (all-null/NaN) input — no rank exists.
    """
    if not percentiles:
        return []
    c = F.col(col).cast("double")
    valid = df.where(c.isNotNull() & ~F.isnan(c)).select(c.alias("__v"))
    v = F.col("__v")
    row = valid.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    ).first()
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if not n:
        raise ValueError(f"exact_percentile: no non-null finite rows in {col!r}")
    if lo == hi:
        return [float(lo) for _ in percentiles]
    cap = hot_cap if hot_cap is not None else max(10 * n // n_buckets, 1024)
    width = (hi - lo) / n_buckets
    bucket = _bucket_expr(v, lo, width, n_buckets)
    hist = {
        r["b"]: r["cnt"]
        for r in valid.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    ranks = [max(1, math.ceil(p * n)) for p in percentiles]
    needed: dict[tuple[int, int], list[int]] = {}
    for idx, rank in enumerate(ranks):
        below, target = 0, n_buckets - 1
        for b in sorted(hist):
            if below + hist[b] >= rank:
                target = b
                break
            below += hist[b]
        needed.setdefault((target, rank - below), []).append(idx)
    out: list[float] = [0.0] * len(ranks)
    cold = [bk for bk in needed if hist.get(bk[0], 0) <= cap]
    hot = [bk for bk in needed if bk not in cold]
    if cold:
        bs = sorted({b for b, _ in cold})
        w = Window.partitionBy("__b").orderBy(v.asc())
        pred = functools.reduce(
            operator.or_,
            [(F.col("__b") == b) & (F.col("__rn") == k) for b, k in cold],
        )
        got = {
            (r["__b"], r["__rn"]): r["__v"]
            for r in valid.withColumn("__b", bucket)
            .where(F.col("__b").isin([int(b) for b in bs]))
            .withColumn("__rn", F.row_number().over(w))
            .where(pred)
            .select("__b", "__rn", "__v")
            .collect()
        }
        for b, k in cold:
            for idx in needed[(b, k)]:
                out[idx] = float(got[(b, k)])
    for b, k in hot:
        sub = valid.where(bucket == F.lit(int(b)))
        val = _kth_smallest(sub, k, n_buckets, cap, plan_audit)
        for idx in needed[(b, k)]:
            out[idx] = float(val)
    return out


def mad_outlier_bounds(
    df: DataFrame,
    col: str,
    k: float = 3.0,
    n_buckets: int = 1024,
    hot_cap: int | None = None,
    plan_audit: list | None = None,
) -> tuple[float, float, float]:
    """Robust outlier fences via median absolute deviation: returns
    (median, lo, hi) with lo/hi = median ∓ k·1.4826·MAD — the
    monitoring-grade alternative to mean/std z-scores (q142), unmoved
    by the very outliers it hunts (a traffic spike inflates a stddev
    fence but not a MAD fence).

    Both the median and the MAD median run through
    :func:`exact_percentile` — exact, batched passes, bounded driver
    histograms only, hot buckets handled by bounded recursion. The
    deviation column is computed lazily; no materialization of the
    corpus.
    """
    med = exact_percentile(df, col, [0.5], n_buckets, hot_cap, plan_audit)[0]
    dev = df.select(
        (F.abs(F.col(col).cast("double") - F.lit(med))).alias("__dev")
    )
    mad = exact_percentile(dev, "__dev", [0.5], n_buckets, hot_cap, plan_audit)[0]
    half = k * 1.4826 * mad
    return med, med - half, med + half


def equi_depth_buckets(
    df: DataFrame,
    col: str,
    n_bins: int,
    n_buckets: int = 1024,
    hot_cap: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Global equi-depth binning: each row gets the quantile bucket
    (1..n_bins) of its value — the feature-binning / monotone-binning
    step of a training pipeline, and the equi-depth histogram layout a
    range-partitioned write wants. Bucket b is the smallest b with
    value ≤ the exact i/n_bins percentile boundary; nulls/NaNs keep a
    NULL bucket.

    The n_bins−1 boundaries come from ONE batched
    :func:`exact_percentile` call (shared histogram, one second-pass
    scan, hot buckets handled by bounded recursion), land on the driver
    as plain literals, and assignment is a narrow broadcast-free map —
    no sort, no join, no shuffle beyond the percentile machinery's
    bounded passes. Heavily tied distributions yield duplicate
    boundaries; the smallest qualifying bucket wins (some buckets then
    hold no rows — the correct equi-depth answer for a value that
    exceeds a whole bucket's mass).
    """
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = exact_percentile(df, col, ps, n_buckets, hot_cap)
    c = F.col(col).cast("double")
    expr = F.when(c.isNull() | F.isnan(c), F.lit(None).cast("int"))
    for i, b in enumerate(bounds):
        expr = expr.when(c <= F.lit(b), i + 1)
    expr = expr.otherwise(F.lit(n_bins))
    return df.withColumn(bucket_col, expr)


def winsorized_stats(
    df: DataFrame,
    col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
    n_buckets: int = 1024,
    hot_cap: int | None = None,
) -> DataFrame:
    """Outlier-robust summary via winsorization: values below the lo_p
    percentile clamp up to it, values above hi_p clamp down — then
    exact decimal-summed mean plus a trimmed count, in ONE narrow pass
    after the (batched) percentile bounds land as literals. The
    robust-mean companion to the MAD fences: a fat-tailed metric's
    plain mean is owned by its outliers; the winsorized mean is the
    production dashboard number.

    Returns one row: (lo_bound, hi_bound, n, n_clamped_lo, n_clamped_hi,
    winsorized_mean). Cross-engine exact: bounds are exact order
    statistics; the mean sums DECIMAL(28,6)-quantized clamped values
    (associative — no float-order noise) and divides once in double.
    """
    lo, hi = exact_percentile(df, col, [lo_p, hi_p], n_buckets, hot_cap)
    c = F.col(col).cast("double")
    clamped = F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    valid = df.where(c.isNotNull() & ~F.isnan(c))
    return valid.agg(
        F.lit(lo).alias("lo_bound"),
        F.lit(hi).alias("hi_bound"),
        F.count(F.lit(1)).alias("n"),
        F.sum((c < F.lit(lo)).cast("bigint")).alias("n_clamped_lo"),
        F.sum((c > F.lit(hi)).cast("bigint")).alias("n_clamped_hi"),
        (
            F.sum(clamped.cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )


def corr_matrix(df: DataFrame, cols: list[str], scale: int = 1_000_000) -> DataFrame:
    """Pairwise Pearson correlations across numeric columns in ONE pass:
    a single aggregation computes every Σx, Σx², and Σxy, and the
    matrix assembles driver-side from those scalars — the profiling
    step before feature selection or redundancy pruning, at the cost of
    one scan regardless of how many pairs (k columns → k(k+1)/2 sums in
    one partial-aggregating pass, never k² scans).

    EXACT cross-engine arithmetic where naive float sums would not be:
    the textbook n·Σxy − Σx·Σy form cancels catastrophically when
    means dominate spread, amplifying float-association noise past any
    rounding mask — so operands quantize to ``round(x·scale)`` integers
    summed in DECIMAL(38,0) (associative, partition-order-free), the
    cancellations run in arbitrary-precision driver integers, and only
    the final ratio touches floating point. Inputs are thereby
    quantized at 1/scale (exact for the fixture's 2-decimal numerics);
    correlation is scale-invariant so the quantization factor cancels.

    Returns (col_a, col_b, corr) for a < b; NULL corr for a
    zero-variance side or n < 2. Rows with a NULL/NaN in EITHER member
    of a pair are excluded pairwise (per-pair n), matching SQL CORR
    semantics.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    dec = "decimal(38,0)"
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        ok = x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
        xq = F.when(ok, F.round(x * scale)).cast(dec)
        yq = F.when(ok, F.round(y * scale)).cast(dec)
        p = f"{a}__{b}"
        aggs += [
            F.count(xq).alias(f"n_{p}"),
            F.sum(xq).alias(f"sx_{p}"),
            F.sum(yq).alias(f"sy_{p}"),
            F.sum(xq * xq).alias(f"sxx_{p}"),
            F.sum(yq * yq).alias(f"syy_{p}"),
            F.sum(xq * yq).alias(f"sxy_{p}"),
        ]
    row = df.agg(*aggs).first()
    out = []
    for a, b in pairs:
        p = f"{a}__{b}"
        n = int(row[f"n_{p}"] or 0)
        corr = None
        if n >= 2:
            sx, sy = int(row[f"sx_{p}"]), int(row[f"sy_{p}"])
            sxx, syy = int(row[f"sxx_{p}"]), int(row[f"syy_{p}"])
            sxy = int(row[f"sxy_{p}"])
            var_x = n * sxx - sx * sx  # exact python ints
            var_y = n * syy - sy * sy
            if var_x > 0 and var_y > 0:
                corr = float(n * sxy - sx * sy) / math.sqrt(
                    float(var_x) * float(var_y)
                )
        out.append((a, b, corr))
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, corr double"
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    min_share: float = 0.01,
) -> DataFrame:
    """Count-Min-sketch heavy hitters with a per-key exact/estimate
    audit: build a ``depth × width`` CMS over ``key_col`` (hash row
    ``depth`` times with the seeded md5 family, increment one bucket per
    row per seed), estimate each candidate key as the MIN of its
    ``depth`` bucket counts, and report keys whose ESTIMATE reaches
    ``min_share`` of total rows, alongside their exact counts — the
    sketch-vs-truth calibration a pipeline runs before trusting CMS
    numbers corpus-wide (the q168 pattern applied to frequency
    sketching).

    Unlike the engine's HLL/approx-quantile surface (q51/q90 —
    implementation-defined sketches, rows-only checkable), the md5 hash
    family (functions/hashing.py) makes every bucket index reproducible
    in ANSI SQL, so this sketch is fully value-oracle-able: estimates
    are deterministic integer minima, ``overestimate = estimate − exact``
    is the classic CMS one-sided error, never negative.

    Scale shape (the reference's partial→final combine,
    max_aggregation.cpp:70-112, with a fixed-size state): the sketch is
    one explode(depth) → (seed, bucket) groupBy with map-side combine —
    state bounded at depth·width rows regardless of input size, then
    broadcast to score candidates; candidate exact counts are one
    key-keyed groupBy. At 100 TB the sketch build shuffles depth·width
    pre-combined rows per task, not data.
    """
    from ..functions.hashing import seeded_hash

    key = F.col(key_col).cast("string")
    hashed = df.select(
        key.alias("__k"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"),
                    (seeded_hash(key, s) % width).alias("bucket"),
                )
                for s in range(depth)
            ])
        ).alias("h"),
    )
    sketch = hashed.groupBy("h.seed", "h.bucket").agg(
        F.count(F.lit(1)).alias("bucket_count")
    )
    exact = df.groupBy(key.alias("__k")).agg(F.count(F.lit(1)).alias("exact_count"))
    cand = exact.select(
        "__k", "exact_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"),
                    (seeded_hash(F.col("__k"), s) % width).alias("bucket"),
                )
                for s in range(depth)
            ])
        ).alias("h"),
    )
    est = (
        cand.join(
            F.broadcast(sketch),
            [cand["h.seed"] == sketch["seed"], cand["h.bucket"] == sketch["bucket"]],
        )
        .groupBy("__k", "exact_count")
        .agg(F.min("bucket_count").alias("cms_estimate"))
    )
    # Total rows as a broadcast 1-row aggregate (Σ exact counts) — no
    # separate driver-side count job, no second scan of the input.
    total = exact.agg(F.sum("exact_count").alias("__total"))
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("cms_estimate") >= F.lit(min_share) * F.col("__total"))
        .select(
            F.col("__k").alias(key_col),
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
            F.round(
                F.col("cms_estimate") / F.col("__total").cast("double"), 6
            ).alias("est_share"),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 200,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Shuffle-key skew diagnostic — the "would a groupBy/join on this
    key break at 1000 executors" report run BEFORE committing a
    partitioning strategy: per-key count distribution (max, top-1 share,
    exact count percentiles via :func:`exact_percentile`'s bounded
    multi-pass machinery) plus a deterministic hash-partition simulation
    (``md5(key) % n_partitions``): ``max_partition_share`` is the
    largest simulated partition's row share and ``skew_factor`` is that
    share relative to the uniform ideal ``1/n_partitions`` — a
    skew_factor near 1 means AQE has nothing to split; ≫1 quantifies
    the straggler before it happens (salting/broadcast decision input).

    One key-keyed aggregation (persisted — it feeds the scalar rollup,
    the percentile passes, and the partition simulation), then
    bounded-cardinality aggregations only: everything after the first
    groupBy is metadata-scale. Eager like :func:`exact_percentile`
    (the percentile literals are resolved while building the report).
    Returns one row.
    """
    from ..functions.hashing import md5_int
    from ..plans.inspect import tracked_persist

    key = F.col(key_col).cast("string")
    counts = tracked_persist(
        df.groupBy(key.alias("__k")).agg(F.count(F.lit(1)).alias("key_count"))
    )
    p_vals = exact_percentile(counts, "key_count", list(percentiles))
    parts = counts.groupBy(
        F.pmod(md5_int(F.col("__k")), F.lit(n_partitions)).alias("__p")
    ).agg(F.sum("key_count").alias("part_rows"))
    top = counts.agg(
        F.sum("key_count").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("key_count").alias("max_key_count"),
    )
    maxp = parts.agg(F.max("part_rows").alias("max_part_rows"))
    share = F.col("max_part_rows").cast("double") / F.col("n_rows")
    out = top.crossJoin(F.broadcast(maxp)).select(
        "n_rows", "n_keys", "max_key_count",
        F.round(F.col("max_key_count").cast("double") / F.col("n_rows"), 6).alias(
            "top1_share"
        ),
        *[
            F.lit(int(v)).cast("bigint").alias(f"p{int(p * 100)}_key_count")
            for p, v in zip(percentiles, p_vals)
        ],
        F.round(share, 6).alias("max_partition_share"),
        F.round(share * n_partitions, 6).alias("skew_factor"),
    )
    return out


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-squared test of independence between two categorical columns,
    with Cramér's V effect size — the categorical companion to
    :func:`~..operators.events.ab_significance`'s two-proportion z-test:
    "is source mix independent of language", "does event type depend on
    variant". Emits the statistic and degrees of freedom, not a p-value
    (no incomplete-gamma approximation to diverge across engines) —
    exact closed-form arithmetic on integer counts.

    Uses the identity  χ² = n·(Σ_cells o²/(rowtot·coltot)) − n  which
    needs only the OBSERVED cells (zero cells of the full r×c table
    contribute via the −n term), so the computation is one (a,b)-keyed
    count, marginals via two windows OVER THE CONTINGENCY TABLE (r·c
    rows — metadata-scale, no second scan of the input), and one scalar
    finalization (the reference's partial→final combine,
    max_aggregation.cpp:70-112). NULL categories count as a level
    (they're real segments); returns one row:
    (n, levels_a, levels_b, dof, chi2, cramers_v).
    """
    cont = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("o"))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    cells = cont.select(
        "__a", "__b", "o",
        F.sum("o").over(wa).alias("rt"),
        F.sum("o").over(wb).alias("ct"),
    )
    agg = cells.agg(
        F.sum("o").alias("n"),
        # struct-wrapped so a NULL category counts as its own level
        # (collect_set drops bare NULLs, but not NULL-carrying structs)
        F.size(F.collect_set(F.struct(F.col("__a").isNull(), F.col("__a")))).alias(
            "levels_a"
        ),
        F.size(F.collect_set(F.struct(F.col("__b").isNull(), F.col("__b")))).alias(
            "levels_b"
        ),
        F.sum(
            F.col("o").cast("double") * F.col("o")
            / (F.col("rt") * F.col("ct"))
        ).alias("__s"),
    )
    chi2 = F.col("n") * F.col("__s") - F.col("n")
    dof = (F.col("levels_a") - 1) * (F.col("levels_b") - 1)
    mindim = F.least(F.col("levels_a") - 1, F.col("levels_b") - 1)
    return agg.select(
        "n", "levels_a", "levels_b",
        dof.cast("bigint").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.when(
            (F.col("n") > 0) & (mindim > 0),
            F.round(F.sqrt(chi2 / (F.col("n") * mindim)), 6),
        ).alias("cramers_v"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups of a numeric
    column — the continuous-metric companion to
    :func:`~..operators.events.ab_significance`'s proportion z-test
    ("did mean order value move", not just conversion). Emits the t
    statistic and the Welch–Satterthwaite degrees of freedom, not a
    p-value (no incomplete-beta approximation to diverge on).

    Follows :func:`corr_matrix`'s exactness recipe: group sums
    quantize to ``round(x·scale)`` integers in DECIMAL(38,0)
    (associative, partition-order-free), the variance cancellation
    ``n·Σx² − (Σx)²`` runs in arbitrary-precision driver integers over
    the TWO aggregate rows (bounded — never data), and only the final
    ratios touch floating point, in one fixed expression order mirrored
    by the oracle. NULL/NaN rows are excluded per group; t and dof are
    NULL when either group has n < 2 or both variances are zero.
    Returns one row: (n_a, n_b, mean_a, mean_b, t_stat, welch_dof).
    """
    dec = "decimal(38,0)"
    x = F.col(value_col).cast("double")
    ok = x.isNotNull() & ~F.isnan(x)
    out_aggs = []
    for tag, gval in (("a", group_a), ("b", group_b)):
        in_g = ok & (F.col(group_col) == F.lit(gval))
        xq = F.when(in_g, F.round(x * scale)).cast(dec)
        out_aggs += [
            F.count(xq).alias(f"n_{tag}"),
            F.sum(xq).alias(f"sx_{tag}"),
            F.sum(xq * xq).alias(f"sxx_{tag}"),
        ]
    row = df.agg(*out_aggs).first()
    n_a, n_b = int(row["n_a"] or 0), int(row["n_b"] or 0)
    mean_a = mean_b = t = dof = None
    if n_a >= 1:
        mean_a = float(int(row["sx_a"])) / n_a / scale
    if n_b >= 1:
        mean_b = float(int(row["sx_b"])) / n_b / scale
    if n_a >= 2 and n_b >= 2:
        var_a = (
            float(n_a * int(row["sxx_a"]) - int(row["sx_a"]) ** 2)
            / (n_a * (n_a - 1))
            / float(scale) ** 2
        )
        var_b = (
            float(n_b * int(row["sxx_b"]) - int(row["sx_b"]) ** 2)
            / (n_b * (n_b - 1))
            / float(scale) ** 2
        )
        vn_a, vn_b = var_a / n_a, var_b / n_b
        se2 = vn_a + vn_b
        if se2 > 0:
            t = (mean_b - mean_a) / math.sqrt(se2)
            dof = (se2 * se2) / (
                vn_a * vn_a / (n_a - 1) + vn_b * vn_b / (n_b - 1)
            )
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [(n_a, n_b, rnd(mean_a), rnd(mean_b), rnd(t), rnd(dof))],
        "n_a bigint, n_b bigint, mean_a double, mean_b double, "
        "t_stat double, welch_dof double",
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of a numeric column — the standard "has this score/feature
    distribution drifted since the model was fit" gate (rule of thumb:
    <0.1 stable, >0.25 act). Bins are the REFERENCE sample's exact
    equi-depth quantile bins (:func:`exact_percentile` boundaries — the
    bounded multi-pass machinery, no sort), applied identically to both
    samples; per-bin proportions are clamped at ``eps`` before the
    ``(q−p)·ln(q/p)`` term so an emptied bin contributes a large finite
    term instead of ±inf.

    Complements :func:`~..operators.similarity.cluster_drift` (embedding
    drift) and the vocab/source deltas of ``pipelines.refresh_report``
    with the scalar-feature drift axis. Returns one row per bin
    (bin, n_ref, n_cur, p_ref, p_cur, psi_term, all 6-decimal) — total
    PSI is the sum of psi_term, left to the caller so the per-bin
    attribution (WHICH bins moved) stays visible.

    Scale shape: the percentile passes are bounded; each sample then
    takes one narrow bucket-assignment map and one n_bins-key count —
    the join of the two count frames is n_bins rows. Deterministic:
    integer counts, one fixed expression order, ln on identical IEEE
    doubles.
    """
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = exact_percentile(ref, col, ps)

    def assign(df: DataFrame) -> DataFrame:
        c = F.col(col).cast("double")
        expr = F.when(c.isNull() | F.isnan(c), F.lit(None).cast("int"))
        for i, b in enumerate(bounds):
            expr = expr.when(c <= F.lit(b), i + 1)
        expr = expr.otherwise(F.lit(n_bins))
        return (
            df.where(c.isNotNull() & ~F.isnan(c))
            .groupBy(expr.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    bins = ref.sparkSession.range(1, n_bins + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    r = assign(ref).withColumnRenamed("n", "n_ref")
    c = assign(cur).withColumnRenamed("n", "n_cur")
    j = (
        bins.join(F.broadcast(r), "bin", "left")
        .join(F.broadcast(c), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = F.greatest(F.col("n_ref").cast("double") / F.col("__tr"), F.lit(eps))
    q = F.greatest(F.col("n_cur").cast("double") / F.col("__tc"), F.lit(eps))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_ref", "n_cur",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("p_cur"),
            F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        )
    )


def hll_estimate(
    df: DataFrame,
    key_col: str,
    p: int = 10,
) -> DataFrame:
    """HyperLogLog distinct-count estimate with a FULLY deterministic,
    cross-engine-reproducible sketch — the audit twin of Spark's native
    ``approx_count_distinct`` (q51), whose binary register layout is
    implementation-defined and therefore only rows-only checkable. Here
    the registers derive from the md5 hash family: the top ``p`` of the
    60 hash bits pick one of ``m = 2^p`` registers, the rank is the
    position of the first 1-bit in the remaining 50 bits (string-exact
    via ``bin()``, no float log2 on integers), and the register table is
    one (register → max rank) aggregation — bounded at m rows, the
    whole point of HLL at 100 TB.

    The harmonic sum runs in INTEGER space (``Σ 2^(51−M_j)`` as bigint;
    a float Σ2^−M mixes magnitudes across >53 bits and becomes
    partition-order-dependent), with the standard small-range linear
    counting correction when empty registers remain. Reports the
    estimate NEXT TO the exact distinct count and the relative error —
    the calibration contract of :func:`cms_heavy_hitters`/q168: run at
    sample scale, trust (or re-parameterize) at corpus scale, where the
    exact column is dropped. Returns one row.
    """
    from ..functions.hashing import md5_int

    m = 1 << p
    shift = 60 - p  # remainder width of the 60-bit hash
    h = md5_int(F.col(key_col).cast("string"))
    # integer shift, NOT h / 2^shift: the division path goes through
    # double and a 60-bit hash exceeds the 53-bit significand — boundary
    # hashes would land in the wrong register (and disagree with the
    # oracle's exact integer >>)
    reg = F.shiftright(h, shift)  # top p bits
    rest = h % F.lit(1 << shift)
    # rank = leading zeros in the shift-bit remainder + 1, string-exact
    rank = F.when(rest == 0, F.lit(shift + 1)).otherwise(
        F.lit(shift + 1) - F.length(F.bin(rest))
    )
    regs = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(reg.alias("__r"))
        .agg(F.max(rank).alias("__m"))
    )
    # harmonic sum scaled by 2^(shift+1) so it stays in exact integers
    sums = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(shift + 1) - F.col("__m")).cast("bigint")
        ).alias("__s_present"),
    )
    exact = df.where(F.col(key_col).isNotNull()).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << (shift + 1))
    )
    raw = F.lit(alpha * m * m * float(1 << (shift + 1))) / s_total
    zeros = F.lit(m) - F.col("n_present")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((zeros > 0) & (raw <= 2.5 * m), linear).otherwise(raw)
    return (
        sums.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).alias("n_registers"),
            "n_present",
            F.round(est, 6).alias("hll_estimate"),
            "exact_distinct",
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_error"),
        )
    )


# P(Poisson(1) <= k) cumulative thresholds, k = 0..7; mass beyond 8 is
# ~1e-6 and truncates to weight 8. Shared literals: both engines compare
# the same uniform against the same doubles, so weights are identical.
_POIS1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
]


def _boot_lane_u(h: F.Column, lane: int) -> F.Column:
    """One 20-bit uniform lane of a 60-bit content hash (the bootstrap
    family's three-resamples-per-md5 cost reduction)."""
    return (
        F.shiftright(h, 20 * lane) % F.lit(1 << 20)
    ).cast("double") / F.lit(float(1 << 20))


def _pois1_weight(u: F.Column) -> F.Column:
    """Poisson(1) weight from a uniform draw via the shared CDF ladder —
    ONE implementation behind every bootstrap operator."""
    w = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    col: str,
    n_resamples: int = 64,
    alpha: float = 0.05,
    scale: int = 1_000_000,
    salt: str = "boot|",
    id_col: str | None = None,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a column mean in ONE
    pass — the distributed bootstrap (Poisson(1) weights approximate
    multinomial resampling without materializing B copies of the data):
    each row draws a deterministic weight per resample from the md5
    hash of (salt, row id, resample index), all B weighted sums
    accumulate in one aggregation, and the driver takes the empirical
    ``alpha/2``/``1−alpha/2`` quantiles of the B resample means
    (discrete, ceil-rank convention — the engine's quantile_disc rule).

    Hash-seeded weights make the resampling REPRODUCIBLE — the
    bootstrap is data, not a run artifact — and fully value-oracle-able
    (shared CDF literals, quantized-integer sums in DECIMAL(38,0), the
    corr_matrix exactness recipe). ``id_col`` defaults to the value
    column itself: rows with equal values are then resampled as a
    block, which leaves every resample mean unchanged for identical
    inputs (the estimator depends on values, not identities); pass a
    unique id for row-level draws. Oracle-bound callers should prefer
    an explicit integer ``id_col``: the default seeds from the DOUBLE's
    string form, whose exponent formatting can differ across engines
    for very small/large magnitudes (fixture-range values agree).
    Returns one row:
    (n, mean, ci_lo, ci_hi, n_resamples).

    Scale shape: the B·2 sums ride one partial-aggregating scan (the
    reference's combine, max_aggregation.cpp:70-112); driver state is
    the B means. NULL/NaN rows are excluded. Hashing is the scan's
    dominant per-row cost, so each md5 feeds THREE resamples (the
    60-bit hash splits into three independent 20-bit lanes — 2⁻²⁰
    uniform granularity, far inside bootstrap noise): ⌈B/3⌉ hashes per
    row, not B. The lane hashes are pre-projected so the aggregation
    never re-evaluates an md5.
    """
    from ..functions.hashing import md5_int

    dec = "decimal(38,0)"
    x = F.col(col).cast("double")
    ok = x.isNotNull() & ~F.isnan(x)
    xq = F.when(ok, F.round(x * scale)).cast(dec)
    rid = F.col(id_col).cast("string") if id_col else x.cast("string")
    n_groups = (n_resamples + 2) // 3
    proj = df.select(
        ok.alias("__ok"),
        xq.alias("__xq"),
        *[
            md5_int(F.concat(F.lit(salt), rid, F.lit(f"|{g}"))).alias(f"__h{g}")
            for g in range(n_groups)
        ],
    )
    aggs = [F.count("__xq").alias("n"), F.sum("__xq").alias("sx")]
    for b in range(n_resamples):
        g, lane = b // 3, b % 3
        u = _boot_lane_u(F.col(f"__h{g}"), lane)
        w = F.when(F.col("__ok"), _pois1_weight(u)).cast(dec)
        aggs += [
            F.sum(w * F.col("__xq")).alias(f"swx_{b}"),
            F.sum(w).alias(f"sw_{b}"),
        ]
    row = proj.agg(*aggs).first()
    n = int(row["n"] or 0)
    if n == 0:
        raise ValueError(f"bootstrap_mean_ci: no non-null finite rows in {col!r}")
    mean = float(int(row["sx"])) / n / scale
    means = []
    for b in range(n_resamples):
        sw = int(row[f"sw_{b}"] or 0)
        if sw > 0:
            means.append(float(int(row[f"swx_{b}"])) / sw / scale)
    means.sort()
    lo_rank = max(1, math.ceil(alpha / 2 * len(means)))
    hi_rank = max(1, math.ceil((1 - alpha / 2) * len(means)))
    return df.sparkSession.createDataFrame(
        [(
            n, _round6_half_away(mean),
            _round6_half_away(means[lo_rank - 1]),
            _round6_half_away(means[hi_rank - 1]),
            n_resamples,
        )],
        "n bigint, mean double, ci_lo double, ci_hi double, n_resamples int",
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Smoothed target encoding — the category → mean-target feature map
    with the standard additive-smoothing shrinkage toward the global
    prior, ``enc = (Σy + m·prior) / (n + m)``: rare categories shrink to
    the prior instead of memorizing their few labels (the leakage-prone
    naive mean), frequent categories approach their own mean. Returns
    the bounded MAPPING frame (category, n, category mean, encoding) —
    callers broadcast-join it back; shipping the map rather than the
    encoded rows is what a 100 TB pipeline wants (the map is
    category-cardinality-sized metadata).

    Exactness: target sums quantize to integers (micro-units) so both
    the per-category and the global sums are partition-order-free; the
    prior and encodings are fixed-order float expressions over those
    integers, 6-decimal rounded. NULL/NaN targets are excluded; a NULL
    category is a real level and gets a row.
    """
    y = F.col(target_col).cast("double")
    ok = y.isNotNull() & ~F.isnan(y)
    yq = F.when(ok, F.round(y * scale)).cast("decimal(38,0)")
    per_cat = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(yq).alias("n"),
        F.sum(yq).alias("__sy"),
    )
    tot = per_cat.agg(
        F.sum("n").alias("__tn"), F.sum("__sy").alias("__tsy")
    )
    prior = F.col("__tsy").cast("double") / F.col("__tn") / scale
    cat_mean = F.col("__sy").cast("double") / F.col("n") / scale
    enc = (
        (F.col("__sy").cast("double") / scale + F.lit(smoothing) * prior)
        / (F.col("n") + F.lit(smoothing))
    )
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            F.round(cat_mean, 6).alias("category_mean"),
            F.round(enc, 6).alias("encoding"),
            F.round(prior, 6).alias("prior"),
        )
    )


def expect_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality expectations — the contract-check layer
    a production table runs before publishing (the
    expectations-framework shape, engine-native): each rule is a dict
    ``{"col", "check", "arg"?}`` with checks ``not_null`` / ``min`` /
    ``max`` / ``regex`` (substring search — anchor with ``^...$`` for a
    full match; Java and RE2 agree on plain character classes) /
    ``in_set`` / ``unique``, and the
    report gives per-rule violation counts and rates over one scan —
    complementing q130's referential-integrity audit with column-level
    contracts.

    All rules evaluate as conditional sums in a SINGLE aggregation
    (``unique``, the one non-row-local check, rides the same pass as
    ``n − count_distinct``); the unpivot to one row per rule is a
    bounded typed-struct explode (the q122 pattern). Deterministic
    integer counts → exact cross-engine. Returns
    (rule_id, col, check, n_rows, n_violations, violation_rate).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        c = F.col(r["col"])
        check, arg = r["check"], r.get("arg")
        if check == "not_null":
            bad = c.isNull()
        elif check == "min":
            bad = c.isNotNull() & (c < F.lit(arg))
        elif check == "max":
            bad = c.isNotNull() & (c > F.lit(arg))
        elif check == "regex":
            bad = c.isNotNull() & ~c.cast("string").rlike(str(arg))
        elif check == "in_set":
            bad = c.isNotNull() & ~c.isin(list(arg))
        elif check == "unique":
            aggs.append(
                (F.count(c) - F.count_distinct(c)).alias(f"__v{i}")
            )
            continue
        else:
            raise ValueError(f"unknown check: {check!r}")
        aggs.append(F.sum(bad.cast("bigint")).alias(f"__v{i}"))
    row = df.agg(*aggs)
    out = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).cast("int").alias("rule_id"),
                F.lit(r["col"]).alias("col"),
                F.lit(r["check"]).alias("check"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ])
    ).alias("r")
    return row.select(out).select(
        "r.rule_id", "r.col", "r.check", "r.n_rows", "r.n_violations",
        F.when(
            F.col("r.n_rows") > 0,
            F.round(
                F.col("r.n_violations").cast("double") / F.col("r.n_rows"), 6
            ),
        ).alias("violation_rate"),
    )


def benford_check(
    df: DataFrame,
    col: str,
    scale: int = 100,
) -> DataFrame:
    """Benford's-law first-significant-digit audit — the classic
    fabricated-numbers screen for financial/metric columns: observed
    digit shares vs the Benford expectation ``log10(1 + 1/d)``, with
    the chi-squared goodness-of-fit statistic (dof = 8) accumulated
    over the 9 digit rows. Flags synthetic, truncated, or capped
    distributions that per-column min/max contracts can't see.

    The first digit comes from the STRING form of the value quantized
    to integer units (``round(x·scale)`` — cents for money): integer →
    string is exact and identical across engines, avoiding the float
    ``log10`` boundary hazard at powers of ten that a closed-form digit
    extraction carries. Only values with ``|x·scale| ≥ 1`` have a first
    significant digit; zeros/NULL/NaN are excluded and reported via
    ``n_used``. One narrow map + a 9-key aggregation. Returns 9 rows:
    (digit, n, observed_share, benford_share, chi2_term), 6-decimal.
    """
    x = F.col(col).cast("double")
    ok = x.isNotNull() & ~F.isnan(x)
    q = F.round(F.abs(x) * scale).cast("bigint")
    digit = F.substring(q.cast("string"), 1, 1).cast("int")
    base = df.where(ok & (q >= 1)).select(digit.alias("digit"))
    counts = base.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    digits = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = digits.join(F.broadcast(counts), "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = full.agg(F.sum("n").alias("__t"))
    p_obs = F.col("n").cast("double") / F.col("__t")
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi_term = (
        (p_obs - p_exp) * (p_obs - p_exp) / p_exp * F.col("__t")
    )
    return (
        full.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            F.round(p_obs, 6).alias("observed_share"),
            F.round(p_exp, 6).alias("benford_share"),
            F.round(chi_term, 6).alias("chi2_term"),
        )
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    the normalized variant ``MI / min(H(a), H(b))`` — the dependence
    STRENGTH measure next to :func:`chi2_independence`'s significance
    test (χ² grows with n even for trivial dependence; MI does not).
    Feature-selection and redundancy-pruning input.

    Same contingency machinery as chi2: one (a,b)-keyed count; the
    grand total is a broadcast 1-row aggregate (never an unpartitioned
    window), marginals are bounded level-keyed aggregations of the
    contingency table, and only observed cells contribute (zero cells
    add zero MI terms by the 0·ln 0 = 0 convention). Everything is a
    fixed-order float expression over integer counts — ln on identical
    IEEE doubles, 6-decimal rounded. NULL categories count as levels.
    Returns one row: (n, mi_nats, h_a, h_b, normalized_mi).
    """
    cont = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = cont.agg(F.sum("o").alias("n"))
    ra = cont.groupBy("__a").agg(F.sum("o").alias("rt"))
    rb = cont.groupBy("__b").agg(F.sum("o").alias("ct"))
    # Marginals via windows over the contingency table (the
    # chi2_independence pattern) — equi-joins on __a/__b would DROP
    # NULL-keyed cells (SQL null-unsafe equality) and silently omit
    # their MI terms while the join-free entropies still count them.
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    cells = cont.select(
        "__a", "__b", "o",
        F.sum("o").over(wa).alias("rt"),
        F.sum("o").over(wb).alias("ct"),
    ).crossJoin(F.broadcast(tot))
    p = F.col("o").cast("double") / F.col("n")
    mi_term = p * F.log(
        F.col("o").cast("double") * F.col("n") / (F.col("rt") * F.col("ct"))
    )
    mi = cells.agg(F.max("n").alias("n"), F.sum(mi_term).alias("__mi"))

    def _entropy(marg: DataFrame, cnt: str, out: str) -> DataFrame:
        t = marg.crossJoin(F.broadcast(tot)).select(
            (
                -(F.col(cnt).cast("double") / F.col("n"))
                * F.log(F.col(cnt).cast("double") / F.col("n"))
            ).alias("t")
        )
        return t.agg(F.sum("t").alias(out))

    hmin = F.least(F.col("h_a"), F.col("h_b"))
    return (
        mi.crossJoin(F.broadcast(_entropy(ra, "rt", "h_a")))
        .crossJoin(F.broadcast(_entropy(rb, "ct", "h_b")))
        .select(
            "n",
            F.round("__mi", 6).alias("mi_nats"),
            F.round("h_a", 6).alias("h_a"),
            F.round("h_b", 6).alias("h_b"),
            F.when(
                hmin > 0, F.round(F.col("__mi") / hmin, 6)
            ).alias("normalized_mi"),
        )
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """PER-GROUP exact discrete percentiles (the ceil-rank
    ``quantile_disc`` convention shared with :func:`exact_percentile`)
    — the per-source latency/size/quality report. The design split with
    the global machinery is deliberate: a GLOBAL percentile must never
    sort one column through one task (hence exact_percentile's bounded
    multi-pass histograms), while a per-GROUP percentile sorts only
    within each group's hash partition — one (group)-keyed window over
    rows whose per-group volume is the operator's stated bound (use it
    for per-source/per-tenant groups, not per-corpus; AQE splits hot
    groups' exchanges but not the window state). NaN/NULL excluded.

    One window (rank + count share it) and one filter per requested
    rank, collapsed into a single pass; output
    (group, p, value) rows, one per group × percentile.
    """
    v = F.col(col).cast("double")
    base = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    w = Window.partitionBy("__g").orderBy(F.col("__v").asc())
    ranked = base.select(
        "__g", "__v",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("__g")).alias("__n"),
    )
    targets = F.array_compact(
        F.array(*[
            F.when(
                F.col("__rn")
                == F.greatest(F.ceil(F.lit(p) * F.col("__n")), F.lit(1)),
                F.lit(p),
            )
            for p in percentiles
        ])
    )
    return (
        ranked.select("__g", "__v", F.explode(targets).alias("p"))
        .select(
            F.col("__g").alias(group_col),
            F.col("p"),
            F.col("__v").alias("value"),
        )
    )


def _ranged_cumsum(per_value: DataFrame, order_col: str, sum_cols: list[str]) -> DataFrame:
    """Inclusive running prefix sums of ``sum_cols`` over ``per_value``
    ordered by ``order_col``, with NO single-partition window anywhere
    (the ranked_sort offset technique, mapreduce.py:91): range
    repartition puts contiguous value ranges in each partition,
    per-partition totals (≤ num_partitions rows) cumulate through a
    broadcast non-equi self-join, and each partition's running sums are
    an ordinary partition-local window plus its broadcast offset.

    The ONE implementation behind every ECDF/rank consumer —
    :func:`ks_test`, :func:`auc_roc`, :func:`_doubled_midrank_map`, and
    :func:`weighted_quantiles` previously each carried a near-verbatim
    copy (review finding, r10); a fix to the idiom's subtleties now
    lands once. Preserves all input columns and appends
    ``__cum_<col>`` per requested column. The range-partitioned frame
    is ``tracked_persist``-ed (it feeds two passes: totals and the
    final join); callers release via
    plans.inspect.release_intermediates[_since]().

    ``sum_cols`` must be integral (the broadcast offsets accumulate in
    exact bigint — every caller sums counts or quantized micro-units;
    a double/decimal column would silently truncate its prefix sums
    through the offset cast, so misuse fails loudly here instead —
    advisor finding, r10). Quantize floats upstream (the
    :func:`weighted_quantiles` pattern) before calling.
    """
    from pyspark.sql import types as T

    from ..plans.inspect import tracked_persist

    _integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in sum_cols:
        dt = per_value.schema[c].dataType
        if not isinstance(dt, _integral):
            raise TypeError(
                f"_ranged_cumsum: sum column {c!r} has non-integral type "
                f"{dt.simpleString()}; offsets accumulate in exact bigint — "
                "quantize to integer units upstream"
            )

    spark = per_value.sparkSession
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        nparts = spark.sparkContext.defaultParallelism
    ranged = tracked_persist(
        per_value.repartitionByRange(nparts, F.col(order_col).asc())
        .sortWithinPartitions(F.col(order_col).asc())
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    b = totals.select(
        F.col("__pid").alias("__bpid"),
        *[F.col(f"__t_{c}").alias(f"__bt_{c}") for c in sum_cols],
    )
    offsets = (
        totals.join(F.broadcast(b), F.col("__bpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(
            *[
                F.coalesce(F.sum(f"__bt_{c}"), F.lit(0))
                .cast("bigint")
                .alias(f"__off_{c}")
                for c in sum_cols
            ]
        )
    )
    w = Window.partitionBy("__pid").orderBy(F.col(order_col).asc())
    out = [F.col(c) for c in per_value.columns] + [
        (F.col(f"__off_{c}") + F.sum(c).over(w)).alias(f"__cum_{c}")
        for c in sum_cols
    ]
    return ranged.join(F.broadcast(offsets), "__pid").select(*out)


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic between the
    ``value_col`` distributions of two groups — the NONPARAMETRIC drift
    test next to :func:`psi` (binned, threshold-parameterized) and
    :func:`welch_ttest` (means only): D = max |F_a(v) − F_b(v)| over
    the pooled support, sensitive to ANY distributional difference
    (location, scale, shape).

    Scale shape (the ranked_sort offset technique, mapreduce.py:91 —
    no single-partition window anywhere): per-distinct-value counts →
    ``repartitionByRange`` on the value so partitions hold contiguous
    ranges → per-partition count totals (≤ num_partitions rows)
    cumulated via a broadcast non-equi self-join → each partition's
    running counts are an ordinary partition-local window plus its
    broadcast offset. The ECDF differences are computed as
    ``cum_a/n_a − cum_b/n_b`` — exact integer operands into two IEEE
    divisions, bit-identical on any engine — and the report row keeps
    the argmax location (ties broken toward the smallest value).

    Returns one row: (n_a, n_b, n_values, d_stat, d_at_value).
    NULL/NaN values are excluded (they have no place on the ECDF).
    """
    v = F.col(value_col).cast("double")
    pool = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .where(v.isNotNull() & ~F.isnan(v))
        .select(
            v.alias("__v"),
            F.when(F.col(group_col) == F.lit(group_a), F.lit(1))
            .otherwise(F.lit(0))
            .alias("__a"),
        )
    )
    per_value = pool.groupBy("__v").agg(
        F.sum("__a").cast("bigint").alias("__ca"),
        F.sum(F.lit(1) - F.col("__a")).cast("bigint").alias("__cb"),
    )
    cum = _ranged_cumsum(per_value, "__v", ["__ca", "__cb"]).select(
        "__v",
        F.col("__cum___ca").alias("__cuma"),
        F.col("__cum___cb").alias("__cumb"),
    )
    n = pool.agg(
        F.sum("__a").cast("bigint").alias("__na"),
        F.sum(F.lit(1) - F.col("__a")).cast("bigint").alias("__nb"),
        F.count(F.lit(1)).alias("__nn"),
    )
    scored = cum.crossJoin(F.broadcast(n)).select(
        "__v",
        "__na",
        "__nb",
        F.abs(
            F.col("__cuma") / F.nullif(F.col("__na"), F.lit(0))
            - F.col("__cumb") / F.nullif(F.col("__nb"), F.lit(0))
        ).alias("__d"),
    )
    return scored.groupBy("__na", "__nb").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.max("__d"), 6).alias("d_stat"),
        F.min_by("__v", F.struct((-F.col("__d")).alias("d"), F.col("__v").alias("v")))
        .alias("d_at_value"),
    ).select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        "n_values",
        "d_stat",
        "d_at_value",
    )


def gini_concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Gini coefficient of the per-key row-count distribution — the
    corpus-concentration readout ("is the training set dominated by a
    few sources/domains/users?") that summarizes what
    :func:`key_skew_report` itemizes: G = (2·Σᵢ i·xᵢ) / (n·Σx) −
    (n+1)/n over counts x sorted ascending (i is the 1-based rank).

    Ranks come from mapreduce.ranked_sort (range-partitioned sample
    sort — key-cardinality scale, no single-partition window); the two
    moments Σx and Σ i·x are exact DECIMAL(38,0) sums (rank·count
    products overflow bigint once keys × rows pass ~9·10¹⁸ — the
    corr_matrix convention), and G is two exact integer operands into
    one IEEE division each. Returns one row:
    (n_keys, n_rows, gini, top1_share).
    """
    from ..mapreduce import ranked_sort

    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    ranked = ranked_sort(
        counts, [F.col("__c").asc(), F.col("__k").asc()], pos_col="__i"
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("__c").cast("decimal(38,0)")).alias("__sx"),
        F.sum(
            (F.col("__i").cast("decimal(38,0)") * F.col("__c").cast("decimal(38,0)"))
        ).alias("__six"),
        F.max("__c").alias("__mx"),
    )
    return agg.select(
        F.col("n_keys"),
        F.col("__sx").cast("bigint").alias("n_rows"),
        F.round(
            (F.lit(2.0) * F.col("__six").cast("double"))
            / (F.col("n_keys").cast("double") * F.col("__sx").cast("double"))
            - (F.col("n_keys") + F.lit(1)).cast("double")
            / F.col("n_keys").cast("double"),
            6,
        ).alias("gini"),
        F.round(
            F.col("__mx").cast("double") / F.col("__sx").cast("double"), 6
        ).alias("top1_share"),
    )


def hist_quantile_audit(
    df: DataFrame,
    col: str,
    percentiles: list[float] = (0.5, 0.9, 0.99),
    n_bins: int = 64,
) -> DataFrame:
    """Histogram-sketch quantile estimate WITH its exact audit — the
    third sketch-audit in the family (q180 CMS counts, q194 HLL
    distincts; this one retires the q90 approx-quantile rows-only
    class): one equi-width histogram pass gives a BIN-EDGE quantile
    estimate (the lower edge of the bin covering rank ⌈p·n⌉ — a
    deterministic estimator with a machine-checkable ±bin_width
    guarantee, unlike percentile_approx's engine-private KLL sketch),
    and :func:`exact_percentile` supplies the exact value alongside so
    abs_error is graded data.

    Everything the driver sees is bounded: the n_bins histogram
    (metadata-scale collect, the exact_percentile precedent at
    stats.py:66) and the exact machinery's own bounded passes. The
    estimate arithmetic is ``lo + bin·width`` on the same IEEE operands
    both engines compute. Returns one row per requested percentile:
    (p, n, hist_estimate, exact_value, abs_error, bin_width).
    """
    ps = list(percentiles)
    c = F.col(col).cast("double")
    valid = df.where(c.isNotNull() & ~F.isnan(c)).select(c.alias("__v"))
    v = F.col("__v")
    row = valid.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    ).first()
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if not n:
        raise ValueError(f"hist_quantile_audit: no non-null finite rows in {col!r}")
    spark = df.sparkSession
    if lo == hi:
        rows = [(float(p), int(n), float(lo), float(lo), 0.0, 0.0) for p in ps]
        return spark.createDataFrame(
            rows,
            "p double, n bigint, hist_estimate double, exact_value double, "
            "abs_error double, bin_width double",
        )
    width = (hi - lo) / n_bins
    bucket = _bucket_expr(v, lo, width, n_bins)
    hist = {
        r["b"]: r["cnt"]
        for r in valid.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    exact = exact_percentile(df, col, ps)
    rows = []
    for p, ex in zip(ps, exact):
        rank = max(1, math.ceil(p * n))
        below, target = 0, n_bins - 1
        for b in sorted(hist):
            if below + hist[b] >= rank:
                target = b
                break
            below += hist[b]
        est = lo + target * width
        rows.append(
            (float(p), int(n), float(est), float(ex), abs(float(ex) - float(est)),
             float(width))
        )
    return spark.createDataFrame(
        rows,
        "p double, n bigint, hist_estimate double, exact_value double, "
        "abs_error double, bin_width double",
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col,
) -> DataFrame:
    """Exact AUC-ROC of a score against a boolean label via the
    Mann–Whitney rank statistic — the acceptance gate for the quality
    classifiers LLM data pipelines filter with (a fastText/logreg
    quality score only earns its keep if it actually ranks kept docs
    above dropped ones): AUC = (Σ_pos avg_rank − n₊(n₊+1)/2) /
    (n₊·n₋), with midranks for ties, so a threshold sweep is never
    needed.

    Same scale shape as :func:`ks_test` (the ranked_sort offset
    technique over per-distinct-value counts — no single-partition
    window): midranks come from the ranged prefix sums DOUBLED to stay
    integer (2·avg_rank = 2·cum_before + cnt + 1), the rank-sum moment
    is a DECIMAL(38,0) sum (rank·count products overflow bigint past
    ~9·10¹⁸), and AUC is exact integer operands into one IEEE
    division. ``label_col`` may be a column name or a boolean Column
    expression. Returns one row: (n_pos, n_neg, n_values, auc,
    gini_coef) where gini_coef = 2·AUC − 1.
    """
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    v = F.col(score_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        v.alias("__v"), label.cast("int").alias("__pos")
    )
    per_value = pool.groupBy("__v").agg(
        F.sum("__pos").cast("bigint").alias("__cp"),
        F.count(F.lit(1)).cast("bigint").alias("__cn"),
    )
    ranked = _ranged_cumsum(per_value, "__v", ["__cn"]).select(
        "__cp",
        "__cn",
        # 2·avg_rank of this value's tied block — integer by construction
        (
            F.lit(2) * (F.col("__cum___cn") - F.col("__cn"))
            + F.col("__cn")
            + F.lit(1)
        ).alias("__r2"),
    )
    agg = ranked.agg(
        F.sum(F.col("__cp").cast("decimal(38,0)") * F.col("__r2").cast("decimal(38,0)"))
        .alias("__rs2"),
        F.sum("__cp").cast("bigint").alias("n_pos"),
        F.sum(F.col("__cn") - F.col("__cp")).cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).alias("n_values"),
    )
    auc_expr = (
        F.col("__rs2").cast("double") / 2.0
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double") / 2.0
    ) / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        "n_pos",
        "n_neg",
        "n_values",
        # one-class input has no ranking to score — NULL, not NaN/∞
        F.when(defined, F.round(auc_expr, 6)).alias("auc"),
        F.when(defined, F.round(F.lit(2.0) * auc_expr - F.lit(1.0), 6)).alias(
            "gini_coef"
        ),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] score against a boolean
    label — AUC (:func:`auc_roc`) says the ranking is right; this says
    the PROBABILITIES are right (a miscalibrated quality score breaks
    any pipeline that thresholds it at a nominal precision): scores
    bucket into ``n_bins`` equi-width bins, each reporting count, exact
    mean score (integer micro-unit sum), observed positive rate, and
    the signed calibration gap. Scores exactly 1.0 land in the top bin.

    One narrow map + a ≤n_bins-key aggregation — nothing downstream of
    the scan exceeds bin cardinality. Returns (bin, bin_lo, n, mean_score,
    positive_rate, calibration_gap) rows for non-empty bins.
    """
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    v = F.col(score_col).cast("double")
    base = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.least(F.floor(v * n_bins).cast("int"), F.lit(n_bins - 1)).alias("bin"),
        F.round(v * 1_000_000).cast("bigint").alias("__vq"),
        label.cast("int").alias("__pos"),
    )
    per = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__vq").alias("__sv"),
        F.sum("__pos").cast("bigint").alias("__np"),
    )
    return per.select(
        "bin",
        F.round(F.col("bin").cast("double") / n_bins, 6).alias("bin_lo"),
        "n",
        F.round(F.col("__sv").cast("double") / F.col("n") / 1_000_000, 6).alias(
            "mean_score"
        ),
        F.round(F.col("__np").cast("double") / F.col("n"), 6).alias("positive_rate"),
        F.round(
            F.col("__np").cast("double") / F.col("n")
            - F.col("__sv").cast("double") / F.col("n") / 1_000_000,
            6,
        ).alias("calibration_gap"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa agreement between two categorical label columns —
    the inter-rater statistic an LLM-data pipeline runs between two
    quality raters (two rule sets, a model vs a heuristic, two
    annotation passes): observed agreement corrected for the agreement
    their marginal label rates would produce by chance,
    κ = (p_o − p_e)/(1 − p_e).

    One (a, b)-keyed contingency count, then everything is metadata-
    scale: the diagonal sum, and per-axis marginals joined BY CATEGORY
    (p_e = Σ_k row_k·col_k / n²) over r·c rows. NULL labels count as a
    real category (they agree with each other — the chi2_independence
    convention); a degenerate table where p_e = 1 (both raters constant)
    returns NULL kappa rather than 0/0. Exact integer counts into IEEE
    divisions; one row out:
    (n, n_agree, po, pe, kappa).
    """
    dec = "decimal(38,0)"
    cont = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("o"))
    ra = cont.groupBy("__a").agg(F.sum("o").alias("__ra"))
    cb = cont.groupBy("__b").agg(F.sum("o").alias("__cb"))
    # marginal products and n² in DECIMAL(38,0): bigint row_k·col_k (and
    # n·n) overflows past ~3e9 rows — at 100 TB these are 1e24-class
    # integers, exact in decimal, converted to double exactly once
    pe_terms = ra.join(cb, ra["__a"].eqNullSafe(cb["__b"]), "inner").select(
        (F.col("__ra").cast(dec) * F.col("__cb")).alias("__rc")
    )
    pe_sum = pe_terms.agg(
        F.coalesce(F.sum("__rc"), F.lit(0).cast(dec)).alias("__pe_num")
    )
    agg = cont.agg(
        F.sum("o").alias("n"),
        F.sum(
            F.when(F.col("__a").eqNullSafe(F.col("__b")), F.col("o")).otherwise(
                F.lit(0)
            )
        ).alias("n_agree"),
    )
    j = agg.crossJoin(F.broadcast(pe_sum))
    po = F.col("n_agree") / F.col("n")
    pe = F.col("__pe_num").cast("double") / (
        F.col("n").cast(dec) * F.col("n")
    ).cast("double")
    return j.select(
        "n",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6)).alias("kappa"),
    )


def brown_forsythe_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """Brown–Forsythe test of equal SPREAD between two named groups —
    Levene's test with MEDIAN centers (robust to the heavy tails real
    value columns have): ANOVA's F statistic on the absolute deviations
    z = |x − median_group|. The variance-drift companion to
    :func:`welch_ttest` (which compares LOCATION): a feature whose mean
    held but whose spread doubled fails THIS gate, not that one.

    Two-group shape on purpose, and the exactness recipe is
    :func:`welch_ttest`'s verbatim: per-group medians are exact
    discrete order statistics (quantile_disc convention, one per-group
    rank — each group sorts within one window partition, the documented
    group_percentiles bound); deviations quantize to ``scale``
    micro-units and sum in DECIMAL(38,0) (associative,
    partition-order-free) in ONE conditional scan; the F statistic is
    computed from the two exact moment rows in one fixed expression
    order the oracle mirrors (the scale² factor cancels in the ratio).
    Emits the statistic and dofs, not a p-value (no F-distribution
    approximation to diverge across engines). F is NULL when the
    within-group deviation mass is zero or either group is empty.
    Returns one row:
    (n_a, n_b, median_a, median_b, dof_between, dof_within, f_stat).
    """
    from .windows import _disc_median_per_key

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    # two inherent passes (moments need the medians) — persist so the
    # second pass reads cached rows instead of rescanning the source;
    # released before returning (both materializations happen in-call)
    pool = df.where(
        F.col(group_col).isin([group_a, group_b]) & v.isNotNull() & ~F.isnan(v)
    ).select(F.col(group_col).alias("__g"), v.alias("__v")).persist()
    try:
        med_rows = {
            r["__g"]: r["__med"]
            for r in _disc_median_per_key(pool, "__g", "__v", "__med").collect()
        }
        med_a = med_rows.get(group_a)
        med_b = med_rows.get(group_b)
        out_aggs = []
        for tag, gval, med in (("a", group_a, med_a), ("b", group_b, med_b)):
            in_g = F.col("__g") == F.lit(gval)
            zq = F.when(
                in_g, F.round(F.abs(F.col("__v") - F.lit(med or 0.0)) * scale)
            ).cast(dec)
            out_aggs += [
                F.count(zq).alias(f"n_{tag}"),
                F.sum(zq).alias(f"s_{tag}"),
                F.sum(zq * zq).alias(f"ss_{tag}"),
            ]
        row = pool.agg(*out_aggs).first()
    finally:
        # both materializations happen in-call, so the cache never
        # outlives the function — including on a failed collect/agg
        pool.unpersist()
    na, nb = int(row["n_a"] or 0), int(row["n_b"] or 0)
    f_stat = None
    if na >= 1 and nb >= 1 and na + nb >= 3:
        sa, sb = int(row["s_a"]), int(row["s_b"])
        ssa, ssb = int(row["ss_a"]), int(row["ss_b"])
        mz = float(sa + sb) / (na + nb)
        da = float(sa) / na - mz
        db = float(sb) / nb - mz
        between = na * (da * da) + nb * (db * db)
        within = (float(ssa) - float(sa) * sa / na) + (
            float(ssb) - float(sb) * sb / nb
        )
        if within > 0:
            f_stat = between / (within / (na + nb - 2))
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [
            (
                na,
                nb,
                med_a,
                med_b,
                1,
                max(na + nb - 2, 0),
                rnd(f_stat),
            )
        ],
        "n_a bigint, n_b bigint, median_a double, median_b double, "
        "dof_between bigint, dof_within bigint, f_stat double",
    )


def _doubled_midrank_map(vals: DataFrame) -> DataFrame:
    """(__v) → (__v, __r2): each distinct value's DOUBLED midrank
    (2·avg_rank of its tied block = 2·cum_before + count + 1 — integer
    by construction), via the ranked_sort offset technique shared with
    :func:`ks_test`/:func:`auc_roc`: per-distinct-value counts, a range
    repartition on the value, per-partition totals cumulated through a
    broadcast non-equi self-join, and a partition-LOCAL running sum —
    no single-partition window. Input column ``__v`` must be non-null,
    non-NaN. The returned frame is ``tracked_persist``-ed (it is
    consumed by a join back to rows); callers release via
    plans.inspect.release_intermediates().
    """
    from ..plans.inspect import tracked_persist

    per_value = vals.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cn")
    )
    return tracked_persist(
        _ranged_cumsum(per_value, "__v", ["__cn"]).select(
            "__v",
            (
                F.lit(2) * (F.col("__cum___cn") - F.col("__cn"))
                + F.col("__cn")
                + F.lit(1)
            ).alias("__r2"),
        )
    )


def spearman_corr(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Spearman rank correlation between two numeric columns — Pearson
    over midranks, the monotone-association readout Pearson misses when
    the relationship is nonlinear (a quality score that RANKS documents
    correctly but on a warped scale still earns ρ≈1 here): the
    outlier-robust companion to :func:`corr_matrix` and the
    whole-column analogue of :func:`auc_roc`'s binary ranking gate.

    Exactness recipe: both columns rank via DOUBLED midranks (integers,
    the :func:`_doubled_midrank_map` machinery — no single-partition
    window), rows join their ranks back by VALUE (two hash joins
    against distinct-value frames), and Pearson runs over exact
    DECIMAL(38,0) rank moments into IEEE divisions in one fixed
    expression order — the doubled-rank scale factor cancels in the
    ratio. Rows with NULL/NaN in EITHER column are excluded (pairwise
    deletion of the complete-pair kind). Degenerate inputs (a constant
    column, <2 rows) return NULL. One row: (n, spearman_rho).
    """
    dec = "decimal(38,0)"
    va = F.col(col_a).cast("double")
    vb = F.col(col_b).cast("double")
    pool = df.where(
        va.isNotNull() & ~F.isnan(va) & vb.isNotNull() & ~F.isnan(vb)
    ).select(va.alias("__x"), vb.alias("__y"))
    ra = _doubled_midrank_map(pool.select(F.col("__x").alias("__v"))).select(
        F.col("__v").alias("__x"), F.col("__r2").alias("__ra")
    )
    rb = _doubled_midrank_map(pool.select(F.col("__y").alias("__v"))).select(
        F.col("__v").alias("__y"), F.col("__r2").alias("__rb")
    )
    j = pool.join(ra, "__x").join(rb, "__y")
    sums = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__ra").cast(dec)).alias("__sx"),
        F.sum(F.col("__rb").cast(dec)).alias("__sy"),
        F.sum(F.col("__ra").cast(dec) * F.col("__ra")).alias("__sxx"),
        F.sum(F.col("__rb").cast(dec) * F.col("__rb")).alias("__syy"),
        F.sum(F.col("__ra").cast(dec) * F.col("__rb")).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return sums.select(
        "n",
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6),
        ).alias("spearman_rho"),
    )


def mcnemar_test(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """McNemar's test on two PAIRED boolean raters — the
    did-the-change-help statistic for comparing two filters/classifiers
    on the SAME rows (where :func:`cohens_kappa` measures agreement,
    this weighs the DISAGREEMENTS against each other): only the
    discordant counts matter, χ² = (b − c)²/(b + c) with b = a-only
    positives and c = b-only positives (no continuity correction —
    documented, so the oracle matches exactly; no p-value — no
    chi-square CDF approximation to diverge across engines).

    One conditional aggregation scan, exact integer counts into one
    IEEE expression. NULL labels pair like values (NULL==NULL agrees,
    the kappa convention). b + c = 0 (perfect agreement) → NULL
    statistic, not 0/0. One row: (n, n_a_only, n_b_only, mcnemar_chi2).
    """
    a = F.col(col_a).cast("boolean")
    b = F.col(col_b).cast("boolean")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(a.eqNullSafe(F.lit(True)) & ~b.eqNullSafe(F.lit(True)), 1)
            .otherwise(0)
        ).alias("n_a_only"),
        F.sum(
            F.when(b.eqNullSafe(F.lit(True)) & ~a.eqNullSafe(F.lit(True)), 1)
            .otherwise(0)
        ).alias("n_b_only"),
    )
    diff = F.col("n_a_only").cast("double") - F.col("n_b_only").cast("double")
    tot = (F.col("n_a_only") + F.col("n_b_only")).cast("double")
    return agg.select(
        "n",
        "n_a_only",
        "n_b_only",
        F.when(tot > 0, F.round(diff * diff / tot, 6)).alias("mcnemar_chi2"),
    )


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Kruskal–Wallis rank test of equal LOCATION across k groups — the
    nonparametric k-group member of the eval layer's location family
    (:func:`welch_ttest` is 2-group parametric, :func:`brown_forsythe_test`
    is 2-group spread; this asks "does ANY source/segment shift the
    metric's distribution" without normality assumptions). Emits the
    tie-corrected H statistic and its dof, not a p-value (no chi-square
    CDF approximation to diverge across engines).

    Computed via the rank-ANOVA identity H_adj = (N−1)·SSB/SST over
    midranks — algebraically equal to the textbook 12/(N(N+1))·Σ…/C
    form WITH the tie correction built in, and it needs only rank
    moments: doubled midranks (exact integers, the
    :func:`_doubled_midrank_map` machinery — the doubling cancels in
    the ratio), per-group count and rank sums in DECIMAL(38,0), and a
    driver-side finalize over the BOUNDED per-group rows (one row per
    categorical level — the :func:`brown_forsythe_test` convention).
    The one inexact step, Σ double(S_i)²/n_i, is a SEQUENTIAL fold in
    group order mirrored term-for-term by the oracle's ordered
    list_reduce (the queries.py float-rule for sequential folds).
    Degenerate inputs (all values tied, <2 groups) → NULL H.
    The midrank caches materialize in-call, so the operator releases
    ONLY the frames it registered (intermediates_mark /
    release_intermediates_since) — a global in-call release would
    unpersist caches backing other operators' still-pending lazy
    results (review finding, r10).
    One row: (n, n_groups, dof, h_stat).
    """
    from ..plans.inspect import intermediates_mark, release_intermediates_since

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    mark = intermediates_mark()
    r2 = _doubled_midrank_map(pool.select("__v"))
    per = (
        pool.join(r2, "__v")
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__r2").cast(dec)).alias("__s2"),
            F.sum(F.col("__r2").cast(dec) * F.col("__r2")).alias("__s22"),
        )
        .orderBy(F.col("__g").asc_nulls_last())
    )
    rows = per.collect()  # bounded: one row per categorical level
    release_intermediates_since(mark)
    n_total = sum(int(r["__n"]) for r in rows)
    k = len(rows)
    h = None
    if k >= 2 and n_total >= 2:
        sr = sum(int(r["__s2"]) for r in rows)  # exact Σ doubled ranks
        srr = sum(int(r["__s22"]) for r in rows)  # exact Σ r2²
        # sequential fold in group order — the oracle's list_reduce
        # replays these exact operand bits term for term
        sb = 0.0
        for r in rows:
            sb = sb + (float(int(r["__s2"])) * float(int(r["__s2"]))) / int(r["__n"])
        cf = float(sr) * float(sr) / n_total
        sst = float(srr) - cf
        ssb = sb - cf
        if sst > 0:
            h = (n_total - 1) * ssb / sst
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [(n_total, k, max(k - 1, 0), rnd(h))],
        "n bigint, n_groups bigint, dof bigint, h_stat double",
    )


def anova_oneway(
    df: DataFrame, group_col: str, value_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Classic one-way ANOVA F across k groups — the parametric k-group
    location test completing the family around :func:`welch_ttest`
    (2-group, unequal variance), :func:`brown_forsythe_test` (spread),
    and :func:`kruskal_wallis` (rank-based). Emits F and both dofs, no
    p-value (no F-distribution approximation to diverge on).

    Exactness recipe shared with the family: values quantize to
    ``round(x·scale)`` integers summed in DECIMAL(38,0) per group (ONE
    conditional scan — the per-group frame is bounded at one row per
    categorical level), the between-group Σ double(S_i)²/n_i term is a
    sequential fold in group order (oracle: ordered list_reduce), the
    correction factor and within-group mass come from exact integer
    moments, and the scale² factor cancels in the F ratio. NULL/NaN
    values are excluded. F is NULL when k < 2, N ≤ k, or the
    within-group mass is zero (constant groups).
    One row: (n, n_groups, dof_between, dof_within, f_stat).
    """
    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    xq = F.round(F.col("__v") * scale).cast(dec)
    per = (
        pool.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(xq).alias("__s"),
            F.sum(xq * xq).alias("__ss"),
        )
        .orderBy(F.col("__g").asc_nulls_last())
    )
    rows = per.collect()  # bounded: one row per categorical level
    n_total = sum(int(r["__n"]) for r in rows)
    k = len(rows)
    f_stat = None
    if k >= 2 and n_total > k:
        sr = sum(int(r["__s"]) for r in rows)
        srr = sum(int(r["__ss"]) for r in rows)
        sb = 0.0
        for r in rows:
            sb = sb + (float(int(r["__s"])) * float(int(r["__s"]))) / int(r["__n"])
        cf = float(sr) * float(sr) / n_total
        ssb = sb - cf
        ssw = float(srr) - sb
        if ssw > 0:
            f_stat = (ssb / (k - 1)) / (ssw / (n_total - k))
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [(n_total, k, max(k - 1, 0), max(n_total - k, 0), rnd(f_stat))],
        "n bigint, n_groups bigint, dof_between bigint, dof_within bigint, "
        "f_stat double",
    )


def cohens_d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohen's d standardized mean difference between two groups — the
    EFFECT SIZE companion to :func:`welch_ttest`'s significance: at
    100 TB row counts everything is "significant", so the gate a data
    pipeline actually wants is "did the mean move by a meaningful
    fraction of the spread" (|d| ≥ 0.2/0.5/0.8 small/medium/large).
    Pooled-SD convention: sp² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2),
    d = (mean_b − mean_a)/sp.

    The :func:`welch_ttest` exactness recipe verbatim: ONE conditional
    scan of quantized DECIMAL(38,0) moments, variance cancellation
    n·Σx² − (Σx)² in arbitrary-precision driver integers over the two
    bounded aggregate rows, floats only in the final fixed-order
    expression the oracle mirrors (scale cancels in d). NULL/NaN
    excluded per group; d is NULL when either group has n < 2 or the
    pooled spread is zero.
    One row: (n_a, n_b, mean_a, mean_b, pooled_sd, cohens_d).
    """
    dec = "decimal(38,0)"
    x = F.col(value_col).cast("double")
    ok = x.isNotNull() & ~F.isnan(x)
    out_aggs = []
    for tag, gval in (("a", group_a), ("b", group_b)):
        in_g = ok & (F.col(group_col) == F.lit(gval))
        xq = F.when(in_g, F.round(x * scale)).cast(dec)
        out_aggs += [
            F.count(xq).alias(f"n_{tag}"),
            F.sum(xq).alias(f"sx_{tag}"),
            F.sum(xq * xq).alias(f"sxx_{tag}"),
        ]
    row = df.agg(*out_aggs).first()
    n_a, n_b = int(row["n_a"] or 0), int(row["n_b"] or 0)
    mean_a = mean_b = sd = d = None
    if n_a >= 1:
        mean_a = float(int(row["sx_a"])) / n_a / scale
    if n_b >= 1:
        mean_b = float(int(row["sx_b"])) / n_b / scale
    if n_a >= 2 and n_b >= 2:
        ssd_a = float(n_a * int(row["sxx_a"]) - int(row["sx_a"]) ** 2) / n_a
        ssd_b = float(n_b * int(row["sxx_b"]) - int(row["sx_b"]) ** 2) / n_b
        sp2 = (ssd_a + ssd_b) / (n_a + n_b - 2) / float(scale) ** 2
        if sp2 > 0:
            sd = math.sqrt(sp2)
            d = (mean_b - mean_a) / sd
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [(n_a, n_b, rnd(mean_a), rnd(mean_b), rnd(sd), rnd(d))],
        "n_a bigint, n_b bigint, mean_a double, mean_b double, "
        "pooled_sd double, cohens_d double",
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact WEIGHTED discrete quantiles: the smallest value whose
    cumulative weight reaches p·W — the order statistic a mixture
    pipeline needs once rows stop counting equally (q110's loss-side
    mixing weights, importance-weighted eval sets, byte-weighted
    document sizes). The discrete convention mirrors ``quantile_disc``:
    result is always an OBSERVED value, never an interpolation.

    Scale shape (the :func:`ks_test` technique — no single-partition
    window anywhere): weights quantize to integer micro-units and
    collapse to per-distinct-value sums (ONE value-keyed aggregation
    with map-side combine), a ``repartitionByRange`` puts contiguous
    value ranges in each partition, per-partition totals cumulate
    through a broadcast non-equi self-join, and each partition's
    running weight is a partition-local window plus its broadcast
    offset. Thresholds p·W are doubles built from the same exact
    integers on both engines; the per-p pick is a broadcast of
    |percentiles| rows against the distinct-value frame. Rows with
    NULL/NaN values or NULL/NaN/non-positive weights are excluded.
    Returns (p, value, total_weight) — one row per requested p,
    total_weight in original units, 6 decimals.

    Empty-pool contract (advisor finding, r10): when EVERY row is
    excluded (all values NULL/NaN or all weights NULL/NaN/non-positive)
    the result has ZERO rows — there is no observed value for any
    quantile to land on, and the SQL oracle's threshold join emits
    nothing for the same reason. Callers that need one row per p
    regardless should left-join their percentile frame against this
    result.
    """
    v = F.col(value_col).cast("double")
    wgt = F.col(weight_col).cast("double")
    pool = df.where(
        v.isNotNull() & ~F.isnan(v) & wgt.isNotNull() & ~F.isnan(wgt) & (wgt > 0)
    ).select(v.alias("__v"), F.round(wgt * scale).cast("bigint").alias("__wq"))
    per_value = pool.groupBy("__v").agg(F.sum("__wq").alias("__w"))
    spark = df.sparkSession
    cum = _ranged_cumsum(per_value, "__v", ["__w"]).select(
        "__v", F.col("__cum___w").alias("__cum")
    )
    # total weight from the LAST partition totals would need ordering;
    # cheaper and exact: sum the per-distinct-value sums (≤ |values|
    # rows, already computed) — never a second scan of the raw input
    # (review finding, r10: the pool re-aggregation doubled the
    # heaviest stage per invocation)
    total = per_value.agg(F.sum("__w").alias("__W"))
    ps = spark.createDataFrame([(float(p),) for p in percentiles], "p double")
    hits = (
        cum.crossJoin(F.broadcast(total))
        .join(F.broadcast(ps), F.col("__cum") >= F.col("p") * F.col("__W"))
        .groupBy("p")
        .agg(
            F.min("__v").alias("value"),
            F.round(F.max(F.col("__W")).cast("double") / scale, 6).alias(
                "total_weight"
            ),
        )
    )
    return hits.select("p", "value", "total_weight")


def quantile_shift_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    percentiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-percentile shift between two groups' distributions — the
    QQ-table drift readout that says WHERE a distribution moved
    (:func:`ks_test` says "they differ", :func:`welch_ttest` says "the
    mean moved"; this says "the p90 moved 3× more than the median" —
    tail drift that both can under-describe). One row per requested p:
    the exact discrete quantile of each group and the difference.

    Delegates to :func:`group_percentiles` (per-group ceil-rank window
    — bounded by per-group volume, the documented contract) and pivots
    the two groups via one p-keyed join; NULL quantiles (an empty
    group) propagate to a NULL shift. Returns (p, q_a, q_b, shift),
    shifts 6 decimals.
    """
    base = df.where(F.col(group_col).isin([group_a, group_b]))
    q = group_percentiles(base, group_col, value_col, percentiles)
    qa = q.where(F.col(group_col) == F.lit(group_a)).select(
        "p", F.col("value").alias("q_a")
    )
    qb = q.where(F.col(group_col) == F.lit(group_b)).select(
        "p", F.col("value").alias("q_b")
    )
    return (
        qa.join(qb, "p", "full")
        .select(
            "p", "q_a", "q_b",
            F.round(F.col("q_b") - F.col("q_a"), 6).alias("shift"),
        )
    )


def wilson_ci(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Wilson score confidence interval for a per-group proportion —
    the CI that stays inside [0, 1] and behaves at extreme p̂ where the
    normal (Wald) interval collapses: the per-segment companion to
    :func:`~..operators.events.ab_significance` (that compares two
    groups; this bounds EACH group's rate — conversion by channel,
    keep-rate by source, defect rate by shard).

    One group-keyed conditional count (map-side combined); the interval
    is one fixed-order closed-form expression over exact integer (k, n)
    the oracle mirrors term for term, 6 decimals. NULL successes count
    as failures (a row with no signal is a non-success, the funnel
    convention). Empty groups cannot occur (a group exists only via its
    rows). Returns (group, n, n_success, p_hat, ci_lo, ci_hi).
    """
    s = F.col(success_col).cast("boolean").eqNullSafe(F.lit(True))
    per = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(s.cast("bigint")).alias("n_success"),
    )
    nn = F.col("n").cast("double")
    p = F.col("n_success").cast("double") / nn
    z2 = float(z) * float(z)
    denom = 1.0 + F.lit(z2) / nn
    center = (p + F.lit(z2) / (2.0 * nn)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (1.0 - p) / nn + F.lit(z2) / (4.0 * nn * nn))
        / denom
    )
    return per.select(
        group_col,
        "n",
        "n_success",
        F.round(p, 6).alias("p_hat"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


def distribution_shape_report(
    df: DataFrame,
    value_col: str,
    scale: int = 10,
) -> DataFrame:
    """Skewness, excess kurtosis, and the Jarque–Bera normality
    statistic — the distribution-SHAPE gate next to the location
    (:func:`welch_ttest`), spread (:func:`brown_forsythe_test`), and
    whole-CDF (:func:`ks_test`) tests: a feature whose mean and
    variance held but whose tail flipped from light to heavy fails this
    gate first (JB = n/6·(S² + K²/4), large under skew or fat tails).
    No p-value (no χ² CDF approximation to diverge on).

    Exactness recipe: ONE scan of quantized raw moments Σxq..Σxq⁴ in
    DECIMAL(38,0). ``scale`` defaults to 10, far below the family's
    1e6, because the FOURTH power compounds: the bound is
    |x·scale|⁴ · n < 10³⁸ (measured: scale 1e3 over ~500k-magnitude
    prices overflows at fixture row counts). Shape statistics are
    scale-free, so the coarse grid only changes WHICH distribution is
    scored — the quantized one — and both engines score the same grid,
    so parity is exact by construction; raise ``scale`` deliberately
    for |x| ≪ 1 columns. Central moments via the raw-
    moment identities in arbitrary-precision driver integers over the
    single bounded aggregate row, floats only in the final fixed-order
    ratios the oracle mirrors (the scale factor cancels in S, K, JB).
    NULL/NaN excluded; degenerate inputs (n < 2 or zero variance) emit
    NULL shape stats. One row:
    (n, mean, skewness, kurtosis_excess, jarque_bera).
    """
    dec = "decimal(38,0)"
    x = F.col(value_col).cast("double")
    xq = F.when(x.isNotNull() & ~F.isnan(x), F.round(x * scale)).cast(dec)
    row = df.agg(
        F.count(xq).alias("n"),
        F.sum(xq).alias("s1"),
        F.sum(xq * xq).alias("s2"),
        F.sum(xq * xq * xq).alias("s3"),
        F.sum(xq * xq * xq * xq).alias("s4"),
    ).first()
    n = int(row["n"] or 0)
    mean = skew = kurt = jb = None
    if n >= 1:
        s1 = int(row["s1"])
        mean = float(s1) / n / scale
    if n >= 2:
        # the n³/n⁴-scaled central-moment numerators are ~|x·scale|⁴·n⁴
        # — exact 128-bit integers overflow there (DuckDB HUGEINT does
        # at fixture scale already), so BOTH engines evaluate the
        # identities in IEEE doubles over the exact integer sums, in
        # one fixed operand order (each sum converts to double once;
        # identical operand bits → identical results)
        f1 = float(s1)
        f2, f3, f4 = float(int(row["s2"])), float(int(row["s3"])), float(int(row["s4"]))
        m2n = n * f2 - f1 * f1  # n² · m2
        m3n = n * n * f3 - 3.0 * n * f1 * f2 + 2.0 * f1 * f1 * f1  # n³ · m3
        m4n = (
            n * n * n * f4
            - 4.0 * n * n * f1 * f3
            + 6.0 * n * f1 * f1 * f2
            - 3.0 * f1 * f1 * f1 * f1
        )  # n⁴ · m4
        if m2n > 0:
            # scale and n powers cancel exactly: m3n/m2n^1.5 = m3/m2^1.5
            # (both numerators carry n³) and m4n/m2n² = m4/m2² (both n⁴)
            skew = m3n / (m2n ** 1.5)
            kurt = m4n / (m2n * m2n) - 3.0
            jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    rnd = _round6_half_away  # half-away like the oracle (r12 retrofit)
    return df.sparkSession.createDataFrame(
        [(n, rnd(mean), rnd(skew), rnd(kurt), rnd(jb))],
        "n bigint, mean double, skewness double, kurtosis_excess double, "
        "jarque_bera double",
    )


def odds_ratio(
    df: DataFrame,
    flag_a: str,
    flag_b: str,
    z: float = 1.96,
) -> DataFrame:
    """Odds ratio between two boolean flags with the Wald confidence
    interval on the log-odds scale — the 2×2 association measure a
    curation pipeline reads off "does tripping filter A change the odds
    of tripping filter B" (or exposure × outcome in an experiment
    readout), with the error bars :func:`wilson_ci` gives single
    proportions. Exponentiating the log-OR ± z·SE bounds keeps the
    interval positive and asymmetric, as it should be.

    ONE conditional-count scan produces the four exact integer cells
    (n11 both, n10 a-only, n01 b-only, n00 neither; rows with a NULL
    flag are excluded — a missing rating is not a False); OR and the
    CI are fixed-order double expressions over those integers that the
    oracle mirrors. Any empty cell → NULL OR/CI, never ±inf (the
    Haldane 0.5 correction is a modeling choice, not a default — apply
    it upstream if wanted). An empty pool (no rows, or every flag
    NULL) reports four ZERO cells, never NULL counts — the
    :func:`chi2_gof` never-a-NULL-count convention (ADVICE r11).
    Returns one row:
    (n, n11, n10, n01, n00, odds_ratio, log_or, or_ci_lo, or_ci_hi).
    """
    a = F.col(flag_a).cast("boolean")
    b = F.col(flag_b).cast("boolean")
    pool = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("__a"), b.alias("__b")
    )
    cell = lambda pa, pb: F.coalesce(  # noqa: E731
        F.sum(((F.col("__a") == pa) & (F.col("__b") == pb)).cast("bigint")),
        F.lit(0).cast("bigint"),
    )
    agg = pool.agg(
        F.count(F.lit(1)).alias("n"),
        cell(True, True).alias("n11"),
        cell(True, False).alias("n10"),
        cell(False, True).alias("n01"),
        cell(False, False).alias("n00"),
    )
    n11, n10 = F.col("n11").cast("double"), F.col("n10").cast("double")
    n01, n00 = F.col("n01").cast("double"), F.col("n00").cast("double")
    ok = (n11 > 0) & (n10 > 0) & (n01 > 0) & (n00 > 0)
    odds = (n11 * n00) / (n10 * n01)
    se = F.sqrt(1.0 / n11 + 1.0 / n10 + 1.0 / n01 + 1.0 / n00)
    return agg.select(
        "n", "n11", "n10", "n01", "n00",
        F.when(ok, F.round(odds, 6)).alias("odds_ratio"),
        F.when(ok, F.round(F.log(odds), 6)).alias("log_or"),
        F.when(ok, F.round(F.exp(F.log(odds) - F.lit(float(z)) * se), 6)).alias(
            "or_ci_lo"
        ),
        F.when(ok, F.round(F.exp(F.log(odds) + F.lit(float(z)) * se), 6)).alias(
            "or_ci_hi"
        ),
    )


def chi2_gof(df: DataFrame, cat_col: str) -> DataFrame:
    """Chi-squared goodness-of-fit of a categorical column against the
    UNIFORM distribution over its observed levels — the "is this split
    balanced" one-liner for hash buckets, k-fold assignments, and shard
    keys (the statistical sibling of q112's shard accounting):
    χ² = (k/n)·Σ o_i² − n needs only Σ o_i², so zero per-cell float
    sums exist to diverge across engines. Emits the statistic and dof,
    not a p-value (no incomplete-gamma to approximate — the
    :func:`chi2_independence` convention).

    One ``cat_col``-keyed count (map-side combine; NULL counts as a
    level), one scalar finalization over exact DECIMAL(38,0) integer
    moments, a single fixed-order double expression at the end.
    Returns one row: (n, n_levels, dof, chi2). Degenerate inputs floor
    cleanly: a single level gives (n, 1, 0, NULL); an EMPTY input gives
    (0, 0, 0, NULL) — never a negative dof or NULL count (review
    finding, r11).
    """
    counts = df.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(F.lit(1)).alias("o")
    )
    agg = counts.agg(
        F.coalesce(F.sum("o"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("n_levels"),
        F.sum(F.col("o").cast("decimal(38,0)") * F.col("o")).alias("__oo"),
    )
    chi2 = (
        F.col("n_levels").cast("double")
        * F.col("__oo").cast("double")
        / F.col("n")
        - F.col("n")
    )
    return agg.select(
        "n",
        "n_levels",
        F.greatest(F.col("n_levels") - 1, F.lit(0)).cast("bigint").alias("dof"),
        F.when(F.col("n_levels") >= 2, F.round(chi2, 6)).alias("chi2"),
    )


def trimmed_mean(
    df: DataFrame,
    col: str,
    trim: float = 0.1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Symmetric trimmed mean: the exact mean of the values between the
    ``trim`` and ``1−trim`` discrete percentiles (inclusive) — the
    robust location estimate that DROPS the tails outright where
    q224's winsorized stats CLAMP them; the right default for
    latency/size columns whose tails are heavy but meaningless.

    The cut values come from :func:`exact_percentile` (bounded
    multi-pass bucket counting — never a global sort), so this is
    "several small jobs in one timing" like q171/q206; the kept-range
    mean is then ONE conditional scan of micro-quantized
    DECIMAL(38,0) sums divided once in double. The discrete
    ``quantile_disc`` cut convention means the kept mass can exceed
    1−2·trim under ties — by design, both engines agree exactly.
    Returns one row: (n, n_kept, lo_cut, hi_cut, trimmed_mean);
    raises on an all-null/NaN column (no rank exists).
    """
    if not (0.0 < trim < 0.5):
        raise ValueError(f"trimmed_mean: trim must be in (0, 0.5), got {trim}")
    lo, hi = exact_percentile(df, col, [trim, 1.0 - trim])
    v = F.col(col).cast("double")
    ok = v.isNotNull() & ~F.isnan(v)
    kept = ok & (v >= F.lit(lo)) & (v <= F.lit(hi))
    vq = F.when(kept, F.round(v * scale)).cast("decimal(38,0)")
    agg = df.agg(
        F.sum(ok.cast("bigint")).alias("n"),
        F.count(vq).alias("n_kept"),
        F.sum(vq).alias("__s"),
    )
    return agg.select(
        "n",
        "n_kept",
        F.lit(float(lo)).alias("lo_cut"),
        F.lit(float(hi)).alias("hi_cut"),
        F.when(
            F.col("n_kept") > 0,
            F.round(F.col("__s").cast("double") / F.col("n_kept") / scale, 6),
        ).alias("trimmed_mean"),
    )


def group_diversity(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group categorical diversity: Shannon entropy (bits) of the
    within-group category distribution, its normalized form H/log2(k),
    and the Herfindahl–Hirschman concentration index Σ(c/n)² — the
    "is this user/source/shard doing one thing or many" profile (bot
    accounts collapse to near-zero entropy over event types; a healthy
    corpus source spreads over languages). The per-GROUP companion to
    q109's per-document word entropy and q232's global Gini.

    One (group, category)-keyed count (NULL is a real level), then one
    group-keyed aggregation using the partial-summable identity
    H = log2(n) − Σ c·log2(c)/n with EVERY c·log2(c) term quantized to
    an integer BEFORE the sum (round half-up at micro-units) — exact,
    order-free addition, so engines can't disagree on float summation
    order; HHI rides exact Σc² the same way. Returns
    (group, n, n_categories, entropy_bits, norm_entropy, hhi);
    norm_entropy is NULL for single-category groups (log2(1) = 0).
    """
    counts = df.groupBy(
        F.col(group_col).alias("__g"), F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("c"))
    term = F.round(F.col("c").cast("double") * F.log2("c") * scale).cast(
        "decimal(38,0)"
    )
    agg = counts.groupBy("__g").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(term).alias("__t"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("__cc"),
    )
    h = F.log2(F.col("n")) - F.col("__t").cast("double") / scale / F.col("n")
    return agg.select(
        F.col("__g").alias(group_col),
        "n",
        "n_categories",
        F.round(h, 6).alias("entropy_bits"),
        F.when(
            F.col("n_categories") >= 2,
            F.round(h / F.log2(F.col("n_categories")), 6),
        ).alias("norm_entropy"),
        F.round(
            F.col("__cc").cast("double") / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("hhi"),
    )


def _round6_half_away(x):
    """Driver-side 6-decimal rounding that matches the ORACLE's round()
    (and Spark's F.round): half away from zero — Python's built-in
    round() is half-to-even and diverges on an exact .5 at the 7th
    digit (the ADVICE-r11 image-exposure bug class, hit again by
    mann_whitney_u's var_u on real data). Use this, not round(), in
    every driver-side finalize."""
    if x is None:
        return None
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups — the
    nonparametric 2-group location test completing the family around
    :func:`welch_ttest` (parametric means), :func:`ks_test` (whole
    distribution), and :func:`kruskal_wallis` (k groups; this is its
    k = 2 member with the U effect-size convention a curation pipeline
    actually reads — U/(n_a·n_b) is the probability a random group-a
    value outranks a random group-b value). Emits U for GROUP A, the
    null mean, the tie-corrected variance, and the normal-approximation
    z WITHOUT continuity correction (documented so the oracle replays
    the identical expression; the ±0.5 correction is a modeling choice).

    Exactness: pooled DOUBLED midranks (exact integers, the
    :func:`_doubled_midrank_map` machinery — no single-partition
    window), per-group rank sums in DECIMAL(38,0), the tie term
    Σ(t³ − t) in exact DECIMAL from per-value counts, and a
    driver-side finalize over the BOUNDED per-group rows (two rows —
    the :func:`kruskal_wallis` convention) in ONE fixed operand order
    the oracle mirrors: 2U_a = S2_a − n_a(n_a+1) stays integer until
    the final halving. All-tied pools (zero variance) emit NULL z.
    One row: (n_a, n_b, u_stat, mean_u, var_u, z).
    """
    from ..plans.inspect import intermediates_mark, release_intermediates_since

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    pool = df.where(
        v.isNotNull() & ~F.isnan(v) & g.isin([group_a, group_b])
    ).select((g == F.lit(group_a)).alias("__is_a"), v.alias("__v"))
    mark = intermediates_mark()
    r2 = _doubled_midrank_map(pool.select("__v"))
    per = (
        pool.join(r2, "__v")
        .groupBy("__is_a")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__r2").cast(dec)).alias("__s2"),
        )
    )
    cn = F.col("__cn").cast(dec)
    ties = pool.groupBy("__v").agg(F.count(F.lit(1)).alias("__cn")).agg(
        F.coalesce(F.sum(cn * cn * cn - cn), F.lit(0).cast(dec)).alias("__t")
    )
    rows = {bool(r["__is_a"]): r for r in per.collect()}  # bounded: ≤ 2 rows
    t_row = ties.first()
    release_intermediates_since(mark)
    na = int(rows[True]["__n"]) if True in rows else 0
    nb = int(rows[False]["__n"]) if False in rows else 0
    n = na + nb
    u = mu = var = z = None
    if na > 0 and nb > 0:
        s2a = int(rows[True]["__s2"])
        # 2U_a = S2_a − n_a(n_a+1): exact integer, halved once
        u = (s2a - na * (na + 1)) / 2.0
        mu = na * nb / 2.0
        t_sum = int(t_row["__t"])
        # fixed operand order, mirrored by the oracle expression
        var = na * nb * ((n + 1.0) - float(t_sum) / (n * (n - 1.0))) / 12.0 \
            if n >= 2 else 0.0
        if var > 0:
            z = (u - mu) / math.sqrt(var)
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(na, nb, rnd(u), rnd(mu), rnd(var if na and nb else None), rnd(z))],
        "n_a bigint, n_b bigint, u_stat double, mean_u double, "
        "var_u double, z double",
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Friedman rank test of equal treatment effects across matched
    blocks — the within-subject sibling of :func:`kruskal_wallis`
    (rank k treatments WITHIN each block, so between-block level
    differences cancel): "does the metric differ across event types
    for the SAME user", the paired k-group readout next to
    :func:`mcnemar_test`'s paired-binary case. Emits the tie-corrected
    Q statistic and dof, not a p-value (the chi2 convention).

    Per (block, treatment) the MEAN value aggregates first (quantized
    micro-integer sums); only blocks observing ALL k global treatments
    enter (incomplete blocks are dropped and counted — documented, the
    complete-block textbook definition). Within-block midranks come
    from a k×k within-block comparison join (k is the bounded
    treatment cardinality, never data volume) with mean comparisons as
    EXACT integer cross-products (S_a·c_b vs S_b·c_a — no float mean
    ever compared); doubled midranks keep every rank integer. The
    tie-corrected Q = (k−1)·(ΣR2_j² − n²k(k+1)²)/(Σr2² − nk(k+1)²)
    is exact integer arithmetic until ONE final division (driver-side
    over k bounded treatment rows, the kruskal_wallis convention).
    All-tied blocks throughout → NULL Q. One row:
    (n_blocks, n_blocks_dropped, k_treatments, dof, q_stat).
    """
    from ..plans.inspect import (
        intermediates_mark,
        release_intermediates_since,
        tracked_persist,
    )

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).alias("__t"),
        F.round(v * scale).cast(dec).alias("__vq"),
    )
    mark = intermediates_mark()
    # the cell frame feeds the k-count, the block sizes, and BOTH sides
    # of the k×k comparison join — persist once so the input scans once,
    # not five times (review finding, r12)
    cell = tracked_persist(
        pool.groupBy("__b", "__t").agg(
            F.sum("__vq").alias("__s"), F.count(F.lit(1)).alias("__c")
        )
    )
    k = cell.select("__t").distinct().count()  # bounded: treatment levels
    sizes = cell.groupBy("__b").agg(F.count(F.lit(1)).alias("__kt"))
    n_total = sizes.count()
    complete = tracked_persist(sizes.where(F.col("__kt") == k).select("__b"))
    n_blocks = complete.count()
    dropped = n_total - n_blocks
    q_stat = None
    if k >= 2 and n_blocks >= 1:
        # tied block occupies ranks L+1..L+T (L = #strictly-below,
        # T = #equal INCLUDING self) → midrank L + (T+1)/2, doubled =
        # 2L + T + 1 — integer by construction; the k×k comparison
        # join lives in _block_doubled_midranks, shared verbatim with
        # page_trend_test (one ranking implementation).
        # ranks feeds both the per-treatment sums and the total moment
        ranks = tracked_persist(
            _block_doubled_midranks(cell.join(complete, "__b"))
        )
        per_t = ranks.groupBy("__ta").agg(
            F.sum(F.col("__r2").cast(dec)).alias("__rsum")
        )
        tot = ranks.agg(
            F.sum(F.col("__r2").cast(dec) * F.col("__r2")).alias("__rr")
        ).first()
        rows = per_t.collect()  # bounded: one row per treatment
        num = sum(int(r["__rsum"]) ** 2 for r in rows) \
            - n_blocks * n_blocks * k * (k + 1) * (k + 1)
        den = int(tot["__rr"]) - n_blocks * k * (k + 1) * (k + 1)
        if den > 0:
            q_stat = (k - 1) * float(num) / float(den)
    release_intermediates_since(mark)
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(n_blocks, dropped, k, max(k - 1, 0), rnd(q_stat))],
        "n_blocks bigint, n_blocks_dropped bigint, k_treatments bigint, "
        "dof bigint, q_stat double",
    )


def benjamini_hochberg(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    scale: int = 1_000_000,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR selection over a p-value column:
    sort the m p-values ascending, find the LARGEST k with
    p_(k) ≤ (k/m)·α, and reject everything at or below that threshold
    — the multiple-testing gate a metrics pipeline runs over per-slice
    test results (one :func:`welch_ttest`/:func:`ks_test` per segment
    → which slices survive FDR control, not per-test α). Emits the
    selection summary, not per-row flags (join ``p <= p_threshold``
    downstream to materialize them).

    Distributed WITHOUT a global sort: p-values quantize to
    micro-units (the comparison convention — p, k·α/m agreement is
    decided at micro-unit precision: pq·m ≤ c·αq in exact integers,
    documented), per-distinct-value counts flow through the
    :func:`_ranged_cumsum` broadcast-offset machinery for the
    ascending cumulative count c(v) = #{p ≤ v} (= the step-up k for
    the duplicate block's LAST member, which is exactly the member
    step-up needs), and m arrives as a broadcast one-row aggregate.
    NULL/NaN and out-of-[0,1] values are excluded and counted
    (n_invalid — a p-value outside [0,1] is an upstream bug worth
    surfacing, not aborting on). No rejections → n_rejected 0 with
    NULL threshold. One row:
    (m, n_invalid, alpha, n_rejected, p_threshold).
    """
    v = F.col(p_col).cast("double")
    base = df.where(v.isNotNull() & ~F.isnan(v))
    pool = base.where((v >= 0.0) & (v <= 1.0)).select(
        F.round(v * scale).cast("bigint").alias("__pq")
    )
    # lazy one-row aggregate, not an eager .count() — the operator
    # stays plan-only until the caller acts (review finding, r12)
    inv_frame = base.agg(
        F.coalesce(
            F.sum(((v < 0.0) | (v > 1.0)).cast("bigint")), F.lit(0)
        ).alias("__inv")
    )
    aq = int(round(float(alpha) * scale))
    per = pool.groupBy("__pq").agg(F.count(F.lit(1)).alias("__cn"))
    cum = _ranged_cumsum(per, "__pq", ["__cn"])
    m_frame = per.agg(F.coalesce(F.sum("__cn"), F.lit(0)).alias("__m"))
    joined = cum.crossJoin(F.broadcast(m_frame))
    passing = F.col("__pq") * F.col("__m") <= F.col("__cum___cn") * F.lit(aq)
    sel = joined.agg(
        F.max("__m").alias("m"),
        F.max(F.when(passing, F.col("__pq"))).alias("__thr"),
        F.coalesce(
            F.max(F.when(passing, F.col("__cum___cn"))), F.lit(0)
        ).alias("n_rejected"),
    )
    return sel.crossJoin(F.broadcast(inv_frame)).select(
        F.coalesce(F.col("m"), F.lit(0)).cast("bigint").alias("m"),
        F.col("__inv").cast("bigint").alias("n_invalid"),
        F.lit(float(alpha)).alias("alpha"),
        F.col("n_rejected").cast("bigint"),
        (F.col("__thr").cast("double") / scale).alias("p_threshold"),
    )


def hellinger_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    width: float,
    n_buckets: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Pairwise Hellinger distance between the per-group distributions
    of a numeric column over a FIXED equi-width binning — the
    all-pairs drift matrix next to :func:`psi` (one candidate vs one
    baseline) and :func:`ks_test` (two named groups): which sources
    disagree about this metric's shape, at a bounded-metric scale
    (H ∈ [0, 1], symmetric, triangle inequality — unlike PSI/KL it
    never blows up on empty bins). H(a,b) = √(1 − Σ_i √(p_i·q_i)).

    One histogram pass (the :func:`equi_depth_buckets` clamp-to-edge
    binning convention via the shared bucket expression), then ALL
    pairwise work happens on the bounded groups×buckets frame —
    metadata scale, never data volume. Each Bhattacharyya term
    √(c_a·c_b/(n_a·n_b)) quantizes to micro-units BEFORE the exact
    order-free per-pair sum (the stats-family recipe); group pairs
    sharing NO bucket emit BC = 0, H = 1 (built from the group
    universe, not the join). The coefficient clamps at 1 before the
    final √ (quantization can overshoot by micro-units). Returns one
    row per unordered pair (group_a < group_b):
    (group_a, group_b, n_a, n_b, bhattacharyya, hellinger), 6-decimal.
    """
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("__g"),
        _bucket_expr(v, lo, width, n_buckets).alias("__bk"),
    )
    hist = pool.groupBy("__g", "__bk").agg(F.count(F.lit(1)).alias("__c"))
    totals = hist.groupBy("__g").agg(F.sum("__c").alias("__n"))
    ha = hist.select(F.col("__g").alias("__ga"), "__bk", F.col("__c").alias("__ca"))
    hb = hist.select(F.col("__g").alias("__gb"), "__bk", F.col("__c").alias("__cb"))
    term = F.round(
        F.sqrt(
            (F.col("__ca").cast("decimal(38,0)") * F.col("__cb")).cast("double")
            / (F.col("__na").cast("decimal(38,0)") * F.col("__nb")).cast("double")
        )
        * scale
    ).cast("bigint")
    ta = totals.select(F.col("__g").alias("__ga"), F.col("__n").alias("__na"))
    tb = totals.select(F.col("__g").alias("__gb"), F.col("__n").alias("__nb"))
    bc = (
        ha.join(hb, "__bk")
        .where(F.col("__ga") < F.col("__gb"))
        .join(ta, "__ga")
        .join(tb, "__gb")
        .groupBy("__ga", "__gb")
        .agg(F.sum(term).alias("__bcq"))
    )
    pairs = ta.crossJoin(tb).where(F.col("__ga") < F.col("__gb"))
    out = pairs.join(bc, ["__ga", "__gb"], "left").select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        (F.coalesce(F.col("__bcq"), F.lit(0)).cast("double") / scale).alias("__bc"),
    )
    bcc = F.least(F.col("__bc"), F.lit(1.0))
    return out.select(
        "group_a", "group_b", "n_a", "n_b",
        F.round("__bc", 6).alias("bhattacharyya"),
        F.round(F.sqrt(F.lit(1.0) - bcc), 6).alias("hellinger"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator over right-censored durations —
    the time-to-event readout of retention/churn analysis (how long do
    users/sessions/documents "survive"?) that plain cohort retention
    counts (q124) can't give when observation windows differ: a
    censored subject (still alive at the horizon) contributes to the
    at-risk denominator up to its censoring time but never counts as a
    death. One row per distinct duration with ≥1 event:
    (t, n_risk, n_events, n_censored, survival).

    Scale shape (the ranked_sort offset technique — NO single-partition
    window): per-distinct-duration (count, deaths) → one
    :func:`_ranged_cumsum` pass gives the at-risk count
    n(t) = N − (cum_count(t) − count(t)); a second ranged pass over the
    death times accumulates the micro-quantized log factors
    qln(t) = round(ln(1 − d/n)·10⁶), so
    S(t) = exp(Σ qln / 10⁶) — an integer prefix sum between two IEEE
    transcendental calls with identical operand bits on any engine
    (the q278/q285 quantized-log convention; ln of the exact rational
    (n−d)/n). A time where d = n drives S to EXACT zero from that
    point on (a quantized-flag prefix, not ln(0)). NULL/NaN durations
    are excluded; ``event_col`` must be 0/1-coercible (censored = 0).
    """
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    pool = df.where(t.isNotNull() & ~F.isnan(t)).select(
        t.alias("__t"), e.alias("__e")
    )
    per_t = pool.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum("__e").cast("bigint").alias("__d"),
    )
    cum = _ranged_cumsum(per_t, "__t", ["__c"])
    # N = max inclusive prefix — read from the PERSISTED ranged frame,
    # never a second pass over raw duration volume (review finding, r12)
    n_total = cum.agg(F.max("__cum___c").alias("__n"))
    risk = cum.crossJoin(F.broadcast(n_total)).select(
        "__t",
        "__c",
        "__d",
        (F.col("__n") - (F.col("__cum___c") - F.col("__c"))).alias("__nr"),
    )
    deaths = risk.where(F.col("__d") > 0)
    # factor (n−d)/n is an exact rational of two bigints: identical
    # double on both engines; ln then micro-quantized half-up (F.round)
    factor = (F.col("__nr") - F.col("__d")).cast("double") / F.col("__nr")
    qd = deaths.select(
        "__t",
        "__nr",
        "__d",
        (F.col("__c") - F.col("__d")).alias("__cens"),
        F.when(F.col("__d") < F.col("__nr"), F.round(F.log(factor) * 1_000_000))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__qln"),
        (F.col("__d") == F.col("__nr")).cast("int").alias("__z"),
    )
    out = _ranged_cumsum(qd, "__t", ["__qln", "__z"])
    return out.select(
        F.col("__t").alias("t"),
        F.col("__nr").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.col("__cens").alias("n_censored"),
        F.when(F.col("__cum___z") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("__cum___qln").cast("double") / 1_000_000), 6))
        .alias("survival"),
    )


def kendall_tau(
    df: DataFrame,
    key_col: str,
    col_a: str,
    col_b: str,
    max_rows: int = 2000,
) -> DataFrame:
    """Kendall's τ-b rank correlation between two metrics per key — the
    ordinal-association member of the correlation family
    (:func:`spearman_corr` is corpus-global and midrank-based;
    :func:`~.windows.mann_kendall_trend` is this machinery against TIME).
    τ-b = (C − D) / √((n₀ − t_a)(n₀ − t_b)) with the standard tie terms
    n₀ = n(n−1)/2, t = Σ tᵢ(tᵢ−1)/2.

    All-pairs by definition — O(n²) per key — so the per-key bound is
    MACHINE-ENFORCED (``max_rows``, the :func:`mann_kendall_trend`
    convention) and the combinatorial pass runs as an Arrow-batched
    grouped map over JVM-quantized integers (round(v·10⁶) computed in
    Spark BEFORE the Arrow hop): concordant/discordant/tie counts are
    exact integers, and the single finalize divides once and rounds
    half-away-from-zero — bit-identical to the SQL oracle's self-join
    count. Rows with a NULL/NaN in either metric are excluded (pairwise
    deletion is per KEY, not per pair). Keys with n < 2 or a zero tie
    denominator emit NULL tau. Returns
    (key, n, n_concordant, n_discordant, tau_b).
    """
    ka = F.col(col_a).cast("double")
    kb = F.col(col_b).cast("double")
    pool = df.where(
        ka.isNotNull() & ~F.isnan(ka) & kb.isNotNull() & ~F.isnan(kb)
    ).select(
        F.col(key_col).alias("__k"),
        F.round(ka * 1_000_000).cast("bigint").alias("__qa"),
        F.round(kb * 1_000_000).cast("bigint").alias("__qb"),
    )
    cap = int(max_rows)

    def tau(pdf):
        # Self-contained closure: no module-global references.
        import math

        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"kendall_tau: a key has {n} rows, over max_rows={cap}; "
                "the tau pass materializes O(n^2) pair signs - raise "
                "max_rows explicitly if this volume is intended"
            )
        k = pdf["__k"].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {"__k": [k], "n": [n], "n_concordant": [0],
                 "n_discordant": [0], "tau_b": [None]}
            )
        qa = pdf["__qa"].to_numpy(dtype=np.int64)
        qb = pdf["__qb"].to_numpy(dtype=np.int64)
        lo, hi = np.triu_indices(n, 1)
        sa = np.sign(qa[hi] - qa[lo])
        sb = np.sign(qb[hi] - qb[lo])
        prod = sa * sb
        c = int((prod > 0).sum())
        d = int((prod < 0).sum())
        n0 = n * (n - 1) // 2
        ta = n0 - int((sa != 0).sum())
        tb = n0 - int((sb != 0).sum())
        tau_b = None
        den = float(n0 - ta) * float(n0 - tb)
        if den > 0:
            x = (c - d) / math.sqrt(den)
            tau_b = math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
        return pd.DataFrame(
            {"__k": [k], "n": [n], "n_concordant": [c],
             "n_discordant": [d], "tau_b": [tau_b]}
        )

    key_type = df.schema[key_col].dataType.simpleString()
    out = pool.groupBy("__k").applyInPandas(
        tau,
        f"__k {key_type}, n bigint, n_concordant bigint, n_discordant bigint, "
        "tau_b double",
    )
    return out.withColumnRenamed("__k", key_col)


def dispersion_index(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    step_seconds: int,
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of per-window event
    counts, per event type — the Poissonness check of arrival streams
    (σ²/μ = 1 under Poisson; ≫1 = bursty/clumped, ≪1 = regular), the
    distributional complement to :func:`~.events` gap statistics. The
    observation span is GLOBAL (min..max window over the whole stream),
    so empty windows count as zeros for every type — a type that fires
    once looks maximally clumped, as it should.

    Exactness: window index = epoch_µs // (step·10⁶) (pure integer
    floor division — timezone-free); per-(type, window) counts are
    integers, Σc and Σc² accumulate in DECIMAL(38,0), and zero windows
    enter through the closed form (they add nothing to Σc, Σc²):
    μ = S/W, population σ² = (S₂ − S²/W)/W — one fixed operand order in
    double, mirrored by the oracle. Returns
    (type, n_events, n_windows, mean_per_window, variance,
    dispersion_index); a type with zero mean emits NULL dispersion.
    NULL-typed events are excluded — a NULL is not an arrival stream
    (the markov_stationary / cohort_ltv NULL-key convention).
    """
    from ..plans.inspect import tracked_persist

    step_us = int(step_seconds) * 1_000_000
    # a NULL type is not an arrival stream (the markov_stationary /
    # cohort_ltv NULL-key convention — ADVICE r12): exclude NULL-typed
    # events rather than reporting a NULL output group
    pool = df.where(
        F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()
    ).select(
        F.col(type_col).alias("__g"),
        # pure integer epoch FLOOR division: timezone-free and exact.
        # `div` truncates toward zero, which would merge the two windows
        # adjacent to epoch 0 for pre-1970 timestamps (review finding,
        # r12) — the pmod construction makes the numerator an exact
        # multiple, so truncating `div` IS floor for any sign, with no
        # double round-trip (second review finding, r12).
        F.expr(
            f"(unix_micros({ts_col})"
            f" - pmod(unix_micros({ts_col}), {step_us})) div {step_us}"
        ).cast("bigint").alias("__w"),
    )
    # cells is the reduced frame BOTH consumers read (the global span and
    # the per-type moments) — persist it so neither re-reduces raw event
    # volume (review finding, r12)
    cells = tracked_persist(
        pool.groupBy("__g", "__w").agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
    )
    span = cells.agg(
        (F.max("__w") - F.min("__w") + 1).cast("bigint").alias("__nw")
    )
    dec = "decimal(38,0)"
    per = cells.groupBy("__g").agg(
        F.sum(F.col("__c").cast(dec)).alias("__s"),
        F.sum((F.col("__c") * F.col("__c")).cast(dec)).alias("__s2"),
    )
    s = F.col("__s").cast("double")
    s2 = F.col("__s2").cast("double")
    w = F.col("__nw").cast("double")
    mean = s / w
    var = (s2 - s * s / w) / w
    return per.crossJoin(F.broadcast(span)).select(
        F.col("__g").alias(type_col),
        F.col("__s").cast("bigint").alias("n_events"),
        F.col("__nw").alias("n_windows"),
        F.round(mean, 6).alias("mean_per_window"),
        F.round(var, 6).alias("variance"),
        F.when(s > 0, F.round(var / mean, 6)).alias("dispersion_index"),
    )


def grubbs_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Grubbs' maximum studentized deviate per group — the single-outlier
    screen (G = max|x − x̄|/s) next to :func:`mad_outlier_bounds`
    (robust fences) and :func:`winsorized_stats` (trim-and-keep): G
    says whether the WORST point is surprising under normality, and
    which side it sits on. The suspect value falls out of the closed
    form max(max − x̄, x̄ − min) — no argmax join-back, ONE aggregation
    pass (ties between sides go to the HIGH side, documented).

    Exactness: values are micro-quantized (round(v·10⁶), the family
    convention); n, Σq, Σq², min, max are exact integers/decimals; the
    finalize x̄ = S/n, s² = (S₂ − S²/n)/(n−1) runs one fixed operand
    order in double, mirrored by the oracle. Groups with n < 3 or zero
    variance emit NULL G. Returns
    (group, n, mean, stddev, g_stat, outlier_value, outlier_side).
    """
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("__g"),
        F.round(v * 1_000_000).cast("bigint").alias("__q"),
    )
    dec = "decimal(38,0)"
    per = pool.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col("__q").cast(dec)).alias("__s"),
        F.sum((F.col("__q").cast(dec)) * F.col("__q")).alias("__s2"),
        F.min("__q").alias("__lo"),
        F.max("__q").alias("__hi"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    s2 = F.col("__s2").cast("double")
    mean_q = s / n
    var_q = (s2 - s * s / n) / (n - F.lit(1.0))
    dev_hi = F.col("__hi") - mean_q
    dev_lo = mean_q - F.col("__lo")
    dev = F.greatest(dev_hi, dev_lo)
    sd_q = F.sqrt(var_q)
    g_ok = (F.col("__n") >= 3) & (var_q > 0)
    return per.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n"),
        F.round(mean_q / 1_000_000, 6).alias("mean"),
        F.when(F.col("__n") >= 2, F.round(sd_q / 1_000_000, 6)).alias("stddev"),
        F.when(g_ok, F.round(dev / sd_q, 6)).alias("g_stat"),
        F.when(
            g_ok,
            F.when(dev_hi >= dev_lo, F.col("__hi")).otherwise(F.col("__lo"))
            .cast("double")
            / 1_000_000,
        ).alias("outlier_value"),
        F.when(g_ok, F.when(dev_hi >= dev_lo, F.lit("high")).otherwise(F.lit("low")))
        .alias("outlier_side"),
    )


def partial_correlation(
    df: DataFrame,
    col_x: str,
    col_y: str,
    col_z: str,
) -> DataFrame:
    """Partial Pearson correlation r_xy·z — the association between x
    and y with the confounder z held fixed, the causal-hygiene
    companion to :func:`corr_matrix` (raw pairwise r's routinely
    reverse sign once a shared driver is controlled):
    r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)).

    One LISTWISE pool (rows where all three are non-NULL/non-NaN — the
    three r's must describe the same population or the formula is
    incoherent), one scan of micro-quantized integer moments in
    DECIMAL(38,0), then a fixed-order finalize: every covariance term
    n·Σab − Σa·Σb stays an EXACT integer until its one cast to double
    (the oracle computes the identical HUGEINT then casts), so both
    engines divide identical operand bits. Emits NULL partial_r when
    either conditioning correlation is ±1 (degenerate denominator) or
    any marginal variance is zero. Returns one row:
    (n, r_xy, r_xz, r_yz, partial_r).
    """
    cx = F.col(col_x).cast("double")
    cy = F.col(col_y).cast("double")
    cz = F.col(col_z).cast("double")
    ok = (
        cx.isNotNull() & ~F.isnan(cx)
        & cy.isNotNull() & ~F.isnan(cy)
        & cz.isNotNull() & ~F.isnan(cz)
    )
    dec = "decimal(38,0)"
    pool = df.where(ok).select(
        F.round(cx * 1_000_000).cast("bigint").alias("__x"),
        F.round(cy * 1_000_000).cast("bigint").alias("__y"),
        F.round(cz * 1_000_000).cast("bigint").alias("__z"),
    )
    x, y, z = F.col("__x").cast(dec), F.col("__y").cast(dec), F.col("__z").cast(dec)
    agg = pool.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(z).alias("__sz"),
        F.sum(x * F.col("__x")).alias("__sxx"),
        F.sum(y * F.col("__y")).alias("__syy"),
        F.sum(z * F.col("__z")).alias("__szz"),
        F.sum(x * F.col("__y")).alias("__sxy"),
        F.sum(x * F.col("__z")).alias("__sxz"),
        F.sum(y * F.col("__z")).alias("__syz"),
    )
    row = agg.first()  # bounded: one row
    n = int(row["__n"])
    out = {"r_xy": None, "r_xz": None, "r_yz": None, "partial_r": None}
    if n >= 2:
        s = {k: int(row[f"__{k}"]) for k in
             ("sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz")}
        vxx = n * s["sxx"] - s["sx"] * s["sx"]
        vyy = n * s["syy"] - s["sy"] * s["sy"]
        vzz = n * s["szz"] - s["sz"] * s["sz"]

        def r(vab, vaa, vbb):
            if vaa <= 0 or vbb <= 0:
                return None
            return float(vab) / math.sqrt(float(vaa) * float(vbb))

        rxy = r(n * s["sxy"] - s["sx"] * s["sy"], vxx, vyy)
        rxz = r(n * s["sxz"] - s["sx"] * s["sz"], vxx, vzz)
        ryz = r(n * s["syz"] - s["sy"] * s["sz"], vyy, vzz)
        out["r_xy"], out["r_xz"], out["r_yz"] = rxy, rxz, ryz
        if None not in (rxy, rxz, ryz):
            den2 = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
            if den2 > 0:
                out["partial_r"] = (rxy - rxz * ryz) / math.sqrt(den2)
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(n, rnd(out["r_xy"]), rnd(out["r_xz"]), rnd(out["r_yz"]),
          rnd(out["partial_r"]))],
        "n bigint, r_xy double, r_xz double, r_yz double, partial_r double",
    )


def _bootstrap_diff_scan(
    df, group_col, value_col, group_a, group_b, n_resamples, scale, salt,
    id_col,
):
    """The ONE-scan lazy aggregation behind :func:`bootstrap_diff_ci` —
    factored out so the plan-shape pin can assert the no-per-replicate-
    pass claim on the actual plan (review finding, r12)."""
    from ..functions.hashing import md5_int

    dec = "decimal(38,0)"
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    ok = x.isNotNull() & ~F.isnan(x) & g.isin([group_a, group_b])
    rid = F.col(id_col).cast("string") if id_col else x.cast("string")
    n_groups = (n_resamples + 2) // 3
    # prefilter BEFORE hashing: rows outside both groups contribute to
    # no aggregate, so the md5 ladder (the scan's dominant per-row
    # cost) must never run on them (review finding, r12); matches the
    # oracle's WHERE clause
    proj = df.where(ok).select(
        (g == F.lit(group_a)).alias("__ga"),
        F.round(x * scale).cast(dec).alias("__xq"),
        *[
            md5_int(F.concat(F.lit(salt), rid, F.lit(f"|{grp}"))).alias(f"__h{grp}")
            for grp in range(n_groups)
        ],
    )
    in_a, in_b = F.col("__ga"), ~F.col("__ga")
    aggs = [
        F.count(F.when(in_a, 1)).alias("na"),
        F.count(F.when(in_b, 1)).alias("nb"),
        F.sum(F.when(in_a, F.col("__xq"))).alias("sxa"),
        F.sum(F.when(in_b, F.col("__xq"))).alias("sxb"),
    ]
    for b in range(n_resamples):
        grp, lane = b // 3, b % 3
        w = _pois1_weight(_boot_lane_u(F.col(f"__h{grp}"), lane)).cast(dec)
        aggs += [
            F.sum(F.when(in_a, w * F.col("__xq"))).alias(f"swxa_{b}"),
            F.sum(F.when(in_a, w)).alias(f"swa_{b}"),
            F.sum(F.when(in_b, w * F.col("__xq"))).alias(f"swxb_{b}"),
            F.sum(F.when(in_b, w)).alias(f"swb_{b}"),
        ]
    return proj.agg(*aggs)


def bootstrap_diff_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    n_resamples: int = 16,
    alpha: float = 0.05,
    scale: int = 1_000_000,
    salt: str = "bootdiff|",
    id_col: str | None = None,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a DIFFERENCE of group
    means — the uncertainty band :func:`welch_ttest` can't give when
    normality is doubtful, and the two-sample member of the
    :func:`bootstrap_mean_ci` family (same Chamandy-style streaming
    bootstrap: deterministic hash-seeded Poisson(1) weights, every
    replicate's four weighted sums folding in ONE scan, driver state =
    B replicate diffs). Replicates where either group draws zero total
    weight are skipped (documented — with n ≫ B this is vanishing).

    Seeding follows the family contract: ``id_col`` defaults to the
    value's string form (block-resampling of equal values; prefer an
    explicit integer id for row-level draws and oracle safety). Exact
    integer quantization end-to-end; the CI is the discrete ceil-rank
    quantile of the sorted replicate diffs. Returns one row:
    (n_a, n_b, mean_a, mean_b, diff, ci_lo, ci_hi, n_resamples).
    """
    row = _bootstrap_diff_scan(
        df, group_col, value_col, group_a, group_b, n_resamples, scale,
        salt, id_col,
    ).first()  # bounded: one row
    na, nb = int(row["na"] or 0), int(row["nb"] or 0)
    if na == 0 or nb == 0:
        raise ValueError(
            f"bootstrap_diff_ci: empty group pool ({group_a!r}: {na}, "
            f"{group_b!r}: {nb})"
        )
    mean_a = float(int(row["sxa"])) / na / scale
    mean_b = float(int(row["sxb"])) / nb / scale
    diffs = []
    for b in range(n_resamples):
        swa, swb = int(row[f"swa_{b}"] or 0), int(row[f"swb_{b}"] or 0)
        if swa > 0 and swb > 0:
            diffs.append(
                float(int(row[f"swxa_{b}"])) / swa / scale
                - float(int(row[f"swxb_{b}"])) / swb / scale
            )
    diffs.sort()
    rnd = _round6_half_away
    lo = hi = None
    if diffs:
        lo_rank = max(1, math.ceil(alpha / 2 * len(diffs)))
        hi_rank = max(1, math.ceil((1 - alpha / 2) * len(diffs)))
        lo, hi = rnd(diffs[lo_rank - 1]), rnd(diffs[hi_rank - 1])
    return df.sparkSession.createDataFrame(
        [(
            na, nb, rnd(mean_a), rnd(mean_b), rnd(mean_a - mean_b),
            lo, hi, n_resamples,
        )],
        "n_a bigint, n_b bigint, mean_a double, mean_b double, diff double, "
        "ci_lo double, ci_hi double, n_resamples int",
    )


def mood_median_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mood's median test — a 2×k chi-squared on above-the-grand-median
    counts per group: the coarsest, most outlier-proof k-sample
    location test (Kruskal–Wallis reads all ranks; this reads ONE bit
    per row), the screen to run when heavy tails or sentinel values
    make even rank statistics suspect.

    The grand median is the exact discrete percentile (the
    :func:`exact_percentile` machinery — bounded histogram + batched
    rank scan, never a global sort), dichotomization "v > median" is
    ONE conditional-count pass producing exact integer cells, and the
    2×k χ² finalizes per group as D²/(n·n_g·A) with the inner
    difference D = a_g·n − n_g·A exact in bigint and the square taken
    in DOUBLE on both engines (the image-blur squaring-domain
    convention, ADVICE r12); per-group terms micro-quantize half-up
    before the exact order-free sum. NULL/NaN values and NULL groups
    are excluded (a NULL is not a sample — the family convention).
    Returns one row: (n, k_groups, grand_median, n_above, chi2, dof);
    a degenerate split (every row on one side, e.g. >50% of mass AT
    the median) or k < 2 reports NULL chi2.
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    pool = df.where(g.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        g.alias("__g"), v.alias("__v")
    )
    med = exact_percentile(pool, "__v", [0.5])[0]
    per = pool.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum((F.col("__v") > F.lit(med)).cast("bigint")).alias("__a"),
    )
    tot = per.agg(
        F.sum("__n").cast("bigint").alias("__nt"),
        F.sum("__a").cast("bigint").alias("__at"),
        F.count(F.lit(1)).cast("bigint").alias("__k"),
    )
    cells = per.crossJoin(F.broadcast(tot))
    # D_a = a·n − n_g·A and D_b = b·n − n_g·B are exact bigints;
    # squares and divisions run in double, one fixed operand order
    da = (F.col("__a") * F.col("__nt") - F.col("__n") * F.col("__at")).cast(
        "double"
    )
    b_g = F.col("__n") - F.col("__a")
    bt = F.col("__nt") - F.col("__at")
    db = (b_g * F.col("__nt") - F.col("__n") * bt).cast("double")
    ok = (F.col("__at") > 0) & (bt > 0)
    term = (
        da * da / (F.col("__nt").cast("double") * F.col("__n") * F.col("__at"))
        + db * db / (F.col("__nt").cast("double") * F.col("__n") * bt)
    )
    qterm = cells.select(
        "__nt",
        "__at",
        "__k",
        F.when(ok, F.floor(term * 1_000_000 + F.lit(0.5)).cast("bigint")).alias(
            "__qt"
        ),
    )
    agg = qterm.groupBy("__nt", "__at", "__k").agg(
        F.sum("__qt").alias("__chi2q")
    )
    return agg.select(
        F.col("__nt").alias("n"),
        F.col("__k").alias("k_groups"),
        F.lit(float(med)).alias("grand_median"),
        F.col("__at").alias("n_above"),
        F.when(
            (F.col("__k") >= 2) & F.col("__chi2q").isNotNull(),
            F.round(F.col("__chi2q").cast("double") / 1_000_000, 6),
        ).alias("chi2"),
        F.greatest(F.col("__k") - 1, F.lit(0)).cast("bigint").alias("dof"),
    )


def cochran_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran's Q — the k-treatment repeated-measures test for BINARY
    outcomes (did any of k filters/variants/models succeed on the same
    blocks at different rates?): the binary sibling of
    :func:`friedman_test` (ranks) and the k-way generalization of
    :func:`mcnemar_test` (k = 2 ⇒ Q = McNemar's statistic without
    continuity correction).

    A block's cell value is "any success" (MAX of the 0/1 outcome over
    that block×treatment's rows); blocks missing a treatment DROP
    (complete-block design, dropped count reported — the Friedman
    convention). Q = (k−1)·(k·ΣG² − N²)/(k·N − ΣB²) over column totals
    G_j, row totals B_i, and grand total N — every moment an exact
    DECIMAL(38,0) integer, ONE division at the end, so both engines
    replay the identical rational. All-constant blocks (every B_i = 0
    or k) zero the denominator → NULL Q. Returns one row:
    (n_blocks, n_blocks_dropped, k_treatments, dof, q_stat).
    """
    b = F.col(block_col)
    t = F.col(treatment_col)
    x = F.col(outcome_col).cast("int")
    pool = df.where(b.isNotNull() & t.isNotNull() & x.isNotNull()).select(
        b.alias("__b"), t.alias("__t"), (x != 0).cast("int").alias("__x")
    )
    cell = pool.groupBy("__b", "__t").agg(F.max("__x").alias("__v"))
    kk = cell.agg(F.countDistinct("__t").cast("bigint").alias("__k"))
    sizes = cell.groupBy("__b").agg(F.count(F.lit(1)).alias("__kt"))
    tagged = sizes.crossJoin(F.broadcast(kk))
    complete = tagged.where(F.col("__kt") == F.col("__k")).select("__b")
    n_all = sizes.agg(F.count(F.lit(1)).cast("bigint").alias("__ntot"))
    cc = cell.join(complete, "__b")
    dec = "decimal(38,0)"
    rows = cc.groupBy("__b").agg(F.sum("__v").cast("bigint").alias("__bi"))
    rowm = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
        F.coalesce(F.sum(F.col("__bi").cast(dec)), F.lit(0).cast(dec)).alias(
            "__nn"
        ),
        F.coalesce(
            F.sum((F.col("__bi") * F.col("__bi")).cast(dec)), F.lit(0).cast(dec)
        ).alias("__sb2"),
    )
    cols = cc.groupBy("__t").agg(F.sum("__v").cast("bigint").alias("__gj"))
    colm = cols.agg(
        F.coalesce(
            F.sum((F.col("__gj") * F.col("__gj")).cast(dec)), F.lit(0).cast(dec)
        ).alias("__sg2")
    )
    e = rowm.crossJoin(F.broadcast(colm)).crossJoin(F.broadcast(kk)).crossJoin(
        F.broadcast(n_all)
    )
    num = F.col("__k").cast(dec) * F.col("__sg2") - F.col("__nn") * F.col("__nn")
    den = F.col("__k").cast(dec) * F.col("__nn") - F.col("__sb2")
    return e.select(
        F.col("__nb").alias("n_blocks"),
        (F.col("__ntot") - F.col("__nb")).cast("bigint").alias(
            "n_blocks_dropped"
        ),
        F.col("__k").alias("k_treatments"),
        F.greatest(F.col("__k") - 1, F.lit(0)).cast("bigint").alias("dof"),
        F.when(
            (F.col("__k") >= 2) & (F.col("__nb") >= 1) & (den > 0),
            F.round(
                (F.col("__k") - 1).cast("double")
                * num.cast("double")
                / den.cast("double"),
                6,
            ),
        ).alias("q_stat"),
    )


def contingency_residuals(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-cell drill-down of a contingency table: observed vs expected
    counts with Pearson and adjusted (Haberman) standardized residuals —
    the "WHICH cell drives the association" readout behind
    :func:`chi2_independence`'s single χ² number (the statistic says
    sources and languages are dependent; this says source X is the one
    over-represented in language Y, and by how many σ).

    One (a, b)-keyed count produces the contingency frame; marginals
    are two windows OVER that frame (r·c rows — metadata-scale, the
    chi2_independence shape, no second input scan) and the grand total
    broadcasts back as a one-row frame. Expected e = rt·ct/n and both
    residuals are fixed-order double expressions over exact integer
    marginals (rt·ct stays within bigint to 10⁸-row marginals; the
    division is the first float op). Only OBSERVED cells are emitted —
    a structural zero never appears (its residual is computable from
    the marginals; emitting the full r×c universe is a caller-side
    cross join when wanted). NULL categories count as levels (real
    segments — the chi2_independence convention). Returns
    (a, b, observed, expected, pearson_residual, adj_residual,
    chi2_contribution), 6-decimal; a single-level dimension zeroes the
    adjusted residual's denominator → NULL adj_residual.
    """
    cont = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    cells = cont.select(
        "__a",
        "__b",
        "o",
        F.sum("o").over(wa).cast("bigint").alias("rt"),
        F.sum("o").over(wb).cast("bigint").alias("ct"),
    )
    tot = cont.agg(F.sum("o").cast("bigint").alias("n"))
    j = cells.crossJoin(F.broadcast(tot))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    diff = F.col("o").cast("double") - e
    adj_var = (
        e
        * (F.lit(1.0) - F.col("rt").cast("double") / F.col("n"))
        * (F.lit(1.0) - F.col("ct").cast("double") / F.col("n"))
    )
    return j.select(
        F.col("__a").alias(col_a),
        F.col("__b").alias(col_b),
        F.col("o").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round(diff / F.sqrt(e), 6).alias("pearson_residual"),
        F.when(adj_var > 0, F.round(diff / F.sqrt(adj_var), 6)).alias(
            "adj_residual"
        ),
        F.round(diff * diff / e, 6).alias("chi2_contribution"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over right-censored
    durations — :func:`kaplan_meier`'s additive sibling: H(t) = Σ d/n
    over event times ≤ t, with the Fleming–Harrington survival
    exp(−H(t)) that is more stable than the KM product in small
    at-risk tails (and the estimator whose INCREMENTS d/n are the raw
    hazard a churn model fits). Same contract as kaplan_meier: one row
    per distinct duration with ≥1 event, censored subjects leave the
    risk set at their censoring time without contributing an event.

    Scale shape: IDENTICAL to kaplan_meier — per-distinct-duration
    (count, deaths), one :func:`_ranged_cumsum` for the at-risk
    denominator, a second ranged pass accumulating the micro-quantized
    hazard increments qh = round(d/n·10⁶) (an integer prefix sum;
    d/n is an exact rational of two bigints, identical double on both
    engines), so H(t) = cum_qh/10⁶ and exp(−H) is one transcendental
    over identical bits. NULL/NaN durations are excluded;
    ``event_col`` is 0/1-coercible (censored = 0). Returns
    (t, n_risk, n_events, n_censored, cum_hazard, fh_survival).
    """
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    pool = df.where(t.isNotNull() & ~F.isnan(t)).select(
        t.alias("__t"), e.alias("__e")
    )
    per_t = pool.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum("__e").cast("bigint").alias("__d"),
    )
    cum = _ranged_cumsum(per_t, "__t", ["__c"])
    n_total = cum.agg(F.max("__cum___c").alias("__n"))
    risk = cum.crossJoin(F.broadcast(n_total)).select(
        "__t",
        "__c",
        "__d",
        (F.col("__n") - (F.col("__cum___c") - F.col("__c"))).alias("__nr"),
    )
    deaths = risk.where(F.col("__d") > 0)
    qd = deaths.select(
        "__t",
        "__nr",
        "__d",
        (F.col("__c") - F.col("__d")).alias("__cens"),
        F.round(F.col("__d").cast("double") / F.col("__nr") * 1_000_000)
        .cast("bigint")
        .alias("__qh"),
    )
    out = _ranged_cumsum(qd, "__t", ["__qh"])
    hz = F.col("__cum___qh").cast("double") / 1_000_000
    return out.select(
        F.col("__t").alias("t"),
        F.col("__nr").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.col("__cens").alias("n_censored"),
        F.round(hz, 6).alias("cum_hazard"),
        F.round(F.exp(-hz), 6).alias("fh_survival"),
    )


def mean_excess_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Peaks-over-threshold tail report per group — the
    extreme-value-theory screen (mean excess over a high threshold ≈
    the GPD's location/scale read-out) for latency SLOs, cost spikes,
    and outlier budgets: "of the requests over 500 ms, HOW far over
    are they on average, and is that tail fattening by segment?" —
    the tail counterpart to :func:`winsorized_stats` (which clamps the
    tail this measures) and :func:`mad_outlier_bounds` (which flags
    points; this characterizes the exceedance mass).

    ONE conditional-count scan per the odds-ratio recipe: exceedances
    (v > u) contribute their micro-quantized excess round((v−u)·10⁶)
    to an exact bigint sum, so the mean excess is a single division
    over integers both engines replay; max_value is an exact MAX.
    NULL/NaN values are excluded; NULL groups are excluded (the
    family convention). Returns
    (group, n, n_exceed, exceed_frac, mean_excess, max_value); a
    group with zero exceedances reports NULL mean_excess and its
    (sub-threshold) max_value.
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    pool = df.where(g.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        g.alias("__g"), v.alias("__v")
    )
    u = F.lit(float(threshold))
    exceed = F.col("__v") > u
    out = pool.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(exceed.cast("bigint")).alias("n_exceed"),
        # DECIMAL(38,0) accumulation — micro-unit excess mass can pass
        # 2^63 at corpus scale (the soft_dedup/cohort_ltv convention)
        F.sum(
            F.when(
                exceed, F.round((F.col("__v") - u) * 1_000_000).cast("bigint")
            ).cast("decimal(38,0)")
        ).alias("__sq"),
        F.max("__v").alias("max_value"),
    )
    return out.select(
        F.col("__g").alias(group_col),
        "n",
        "n_exceed",
        F.round(F.col("n_exceed").cast("double") / F.col("n"), 6).alias(
            "exceed_frac"
        ),
        F.when(
            F.col("n_exceed") > 0,
            F.round(
                F.col("__sq").cast("double") / F.col("n_exceed") / 1_000_000, 6
            ),
        ).alias("mean_excess"),
        "max_value",
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Jonckheere–Terpstra trend test across ORDERED groups: are values
    stochastically increasing along the groups' natural (sort) order?
    The ordered-alternative k-sample test that Kruskal–Wallis (any
    difference) and Mann–Kendall (one series over time) don't cover —
    "does quality rise monotonically across dataset versions
    v1 < v2 < v3", with far more power than KW when the ordering is
    the hypothesis. JT = Σ_{i<j} U_ij over every ordered group pair's
    Mann–Whitney U (ties count half).

    Scale shape: rows collapse to the per-(group, value) count frame
    FIRST; per-group inclusive cumulatives are per-group windows; each
    ordered pair's U then needs group i's cumulative AT group j's
    value points — ONE :func:`~.joins.asof_join` (backward, inclusive)
    over the pair-tagged value frame, so the whole statistic is
    value-level × k², never row². Doubled-U integers (2U = Σ c_j·(2·C_i(<v)
    + c_i(v))) accumulate exactly in DECIMAL; the null moments
    E = (N²−Σn²)/4 and the LARGE-SAMPLE NO-TIE variance
    Var = (N²(2N+3) − Σn²(2n+3))/72 are fixed-order doubles over
    exact integer moments (the tie-corrected variance is a documented
    refinement — with heavy ties z is slightly conservative; the
    midrank U itself is exact). NULL groups/values excluded. Returns
    one row: (k_groups, n, jt_stat, mean_jt, var_jt, z); k < 2 or a
    degenerate variance reports NULL moments/z.
    """
    from .joins import asof_join

    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    pool = df.where(g.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        g.alias("__g"), v.alias("__v")
    )
    pv = pool.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    wg = (
        Window.partitionBy("__g")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select("__g", "__v", "__c", F.sum("__c").over(wg).alias("__cc"))
    gs = pv.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__n"))
    gi = gs.select(F.col("__g").alias("__gi"))
    gj = gs.select(F.col("__g").alias("__gj"))
    pairs = gi.join(gj, F.col("__gi") < F.col("__gj"))
    jrows = pairs.join(
        pv.select(F.col("__g").alias("__gj"), "__v", "__c"), "__gj"
    )
    right = cum.select(
        F.col("__g").alias("__gi"),
        "__v",
        F.col("__v").alias("__vr"),
        "__cc",
        F.col("__c").alias("__cir"),
    )
    m = asof_join(
        jrows, right, on="__gi", left_time="__v", right_time="__v",
        right_cols=["__vr", "__cc", "__cir"],
    )
    at_v = F.when(
        F.col("__vr_asof") == F.col("__v"), F.col("__cir_asof")
    ).otherwise(F.lit(0))
    c_less = F.coalesce(F.col("__cc_asof"), F.lit(0)) - at_v
    u2 = F.col("__c") * (2 * c_less + at_v)
    dec = "decimal(38,0)"
    jt = m.agg(
        F.coalesce(F.sum(u2.cast(dec)), F.lit(0).cast(dec)).alias("__jt2")
    )
    mom = gs.agg(
        F.sum("__n").cast("bigint").alias("__nn"),
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.sum((F.col("__n") * F.col("__n")).cast(dec)).alias("__sn2"),
        F.sum(
            (F.col("__n") * F.col("__n") * (2 * F.col("__n") + 3)).cast(dec)
        ).alias("__sn23"),
    )
    e = jt.crossJoin(F.broadcast(mom))
    nn_d = F.col("__nn").cast("double")
    mean = (nn_d * F.col("__nn") - F.col("__sn2").cast("double")) / 4
    var = (
        nn_d * F.col("__nn") * (2 * F.col("__nn") + 3)
        - F.col("__sn23").cast("double")
    ) / 72
    jt_d = F.col("__jt2").cast("double") / 2
    ok = F.col("__k") >= 2
    return e.select(
        F.col("__k").alias("k_groups"),
        F.col("__nn").alias("n"),
        F.round(jt_d, 6).alias("jt_stat"),
        F.when(ok, F.round(mean, 6)).alias("mean_jt"),
        F.when(ok, F.round(var, 6)).alias("var_jt"),
        F.when(ok & (var > 0), F.round((jt_d - mean) / F.sqrt(var), 6)).alias(
            "z"
        ),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED per-key means — the
    within-subject two-condition location test completing the family:
    :func:`mann_whitney_u` compares two INDEPENDENT pools,
    :func:`friedman_test` handles k paired treatments, this is the
    k = 2 paired member ("did condition A move the metric for the SAME
    user"). Pairs form per key: d = mean(value | a) − mean(value | b),
    keys observing only one condition drop (complete-pair design,
    counted), and exact zero differences drop per the classic
    Wilcoxon convention (counted, documented). Emits W⁺ (rank mass of
    positive differences), W⁻, the null mean n(n+1)/4, the
    tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48, and the
    normal-approximation z WITHOUT continuity correction (the
    :func:`mann_whitney_u` convention, so the oracle replays the
    identical expression).

    Exactness: per-(key, condition) means are exact-integer
    micro-sums divided ONCE; d quantizes to micro-units
    (round(d·10⁶) — both engines difference the identical doubles);
    |d| ranks via DOUBLED midranks (:func:`_doubled_midrank_map` — no
    single-partition window); rank sums and the tie term Σ(t³−t)
    accumulate in DECIMAL(38,0); ONE driver-side finalize over
    bounded per-sign rows halves the doubled sums and rounds
    half-away. All-tied-|d| degenerate variance emits NULL z. One
    row: (n_pairs, n_dropped_zero, n_incomplete, w_plus, w_minus,
    mean_w, var_w, z).
    """
    from ..plans.inspect import intermediates_mark, release_intermediates_since

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    pool = df.where(
        v.isNotNull() & ~F.isnan(v) & g.isin([group_a, group_b])
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        (g == F.lit(group_a)).alias("__is_a"),
        F.round(v * 1_000_000).cast(dec).alias("__vq"),
    )
    per = pool.groupBy("__k", "__is_a").agg(
        F.sum("__vq").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    means = per.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__sides"),
        F.max(F.when(F.col("__is_a"), F.col("__s"))).alias("__sa"),
        F.max(F.when(F.col("__is_a"), F.col("__c"))).alias("__ca"),
        F.max(F.when(~F.col("__is_a"), F.col("__s"))).alias("__sb"),
        F.max(F.when(~F.col("__is_a"), F.col("__c"))).alias("__cb"),
    )
    # d in micro-units: one fixed expression over exact integers — the
    # oracle differences the identical doubles before the round
    d_micro = F.round(
        F.col("__sa").cast("double") / F.col("__ca")
        - F.col("__sb").cast("double") / F.col("__cb")
    ).cast("bigint")
    diffs = means.select(
        (F.col("__sides") == 2).alias("__complete"),
        F.when(F.col("__sides") == 2, d_micro).alias("__d"),
    )
    mark = intermediates_mark()
    from ..plans.inspect import tracked_persist

    diffs = tracked_persist(diffs)
    counts = diffs.agg(
        F.sum(F.when(~F.col("__complete"), 1).otherwise(0)).alias("__inc"),
        F.sum(
            F.when(F.col("__complete") & (F.col("__d") == 0), 1).otherwise(0)
        ).alias("__zero"),
    ).first()
    nz = diffs.where(F.col("__complete") & (F.col("__d") != 0)).select(
        F.col("__d").alias("__dd"), F.abs(F.col("__d")).alias("__v")
    )
    r2 = _doubled_midrank_map(nz.select("__v"))
    per_sign = (
        nz.join(r2, "__v")
        .groupBy((F.col("__dd") > 0).alias("__pos"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__r2").cast(dec)).alias("__s2"),
        )
    )
    cn = F.col("__cn").cast(dec)
    ties = nz.groupBy("__v").agg(F.count(F.lit(1)).alias("__cn")).agg(
        F.coalesce(F.sum(cn * cn * cn - cn), F.lit(0).cast(dec)).alias("__t")
    )
    rows = {bool(r["__pos"]): r for r in per_sign.collect()}  # bounded: ≤ 2
    t_row = ties.first()
    release_intermediates_since(mark)
    np_ = int(rows[True]["__n"]) if True in rows else 0
    nn_ = int(rows[False]["__n"]) if False in rows else 0
    n = np_ + nn_
    # doubled rank sums: W = S2/2, exact until the one halving
    s2p = int(rows[True]["__s2"]) if True in rows else 0
    s2n = int(rows[False]["__s2"]) if False in rows else 0
    w_plus = w_minus = mean_w = var = z = None
    if n > 0:
        w_plus = s2p / 2.0
        w_minus = s2n / 2.0
        mean_w = n * (n + 1) / 4.0
        t_sum = int(t_row["__t"])
        # fixed operand order, mirrored by the oracle expression
        var = n * (n + 1) * (2 * n + 1) / 24.0 - float(t_sum) / 48.0
        if var > 0:
            z = (w_plus - mean_w) / math.sqrt(var)
        else:
            z = None
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(
            n, int(counts["__zero"] or 0), int(counts["__inc"] or 0),
            rnd(w_plus), rnd(w_minus), rnd(mean_w),
            rnd(var), rnd(z),
        )],
        "n_pairs bigint, n_dropped_zero bigint, n_incomplete bigint, "
        "w_plus double, w_minus double, mean_w double, var_w double, "
        "z double",
    )


def theil_u(
    df: DataFrame,
    col_x: str,
    col_y: str,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Theil's uncertainty coefficient between two categorical columns —
    the ASYMMETRIC association measure the χ² family can't give:
    U(y|x) = (H(y) − H(y|x)) / H(y) reads "what fraction of y's
    uncertainty does knowing x remove", and U(y|x) ≠ U(x|y) exposes
    direction (a source column may fully determine language while
    language barely narrows source). Completes the categorical kit
    beside :func:`chi2_independence` (significance),
    :func:`mutual_information` (symmetric bits), and
    :func:`group_diversity` (single-column entropy).

    Exactness: one (x, y) count aggregation feeds everything; every
    entropy term quantizes as round(c·log2(c/total)·scale) over
    EXACT integer count ratios, terms sum as integers (both engines
    sum identical integers in any order), and the three entropies
    finalize in one fixed expression. A zero-entropy target (constant
    column) emits NULL U in that direction, never a division blowup.
    One row: (n, n_x_levels, n_y_levels, h_x, h_y, h_xy, u_y_given_x,
    u_x_given_y), entropies in bits, 6-decimal.
    """
    from ..plans.inspect import (
        intermediates_mark,
        release_intermediates_since,
        tracked_persist,
    )

    dec = "decimal(38,0)"
    pool = df.where(
        F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
    ).select(F.col(col_x).alias("__x"), F.col(col_y).alias("__y"))
    mark = intermediates_mark()
    # the cell frame feeds the total, both marginals, and the joint term
    # sum — persist once so the input scans once, not four times
    cells = tracked_persist(
        pool.groupBy("__x", "__y").agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
    )
    tot = cells.agg(
        F.sum(F.col("__c").cast(dec)).alias("__n"),
    ).first()
    n = int(tot["__n"] or 0)
    if n == 0:
        release_intermediates_since(mark)
        return df.sparkSession.createDataFrame(
            [(0, 0, 0, None, None, None, None, None)],
            "n bigint, n_x_levels bigint, n_y_levels bigint, h_x double, "
            "h_y double, h_xy double, u_y_given_x double, "
            "u_x_given_y double",
        )
    n_lit = F.lit(n).cast("double")

    def term(c):
        return F.round(
            c.cast("double") * F.log2(c.cast("double") / n_lit)
            * F.lit(scale)
        ).cast(dec)

    hx_q = (
        cells.groupBy("__x").agg(F.sum("__c").alias("__cx"))
        .agg(F.sum(term(F.col("__cx"))).alias("__q"),
             F.count(F.lit(1)).alias("__lv"))
        .first()
    )
    hy_q = (
        cells.groupBy("__y").agg(F.sum("__c").alias("__cy"))
        .agg(F.sum(term(F.col("__cy"))).alias("__q"),
             F.count(F.lit(1)).alias("__lv"))
        .first()
    )
    hxy_q = cells.agg(F.sum(term(F.col("__c"))).alias("__q")).first()
    release_intermediates_since(mark)
    # H = log-sum identity: Σ c·log2(c/n) = −n·H, so H = −q/(scale·n)
    h_x = -int(hx_q["__q"]) / scale / n
    h_y = -int(hy_q["__q"]) / scale / n
    h_xy = -int(hxy_q["__q"]) / scale / n
    # H(y|x) = H(x,y) − H(x); U(y|x) = (H(y) − H(y|x)) / H(y)
    u_yx = (h_y - (h_xy - h_x)) / h_y if h_y > 0 else None
    u_xy = (h_x - (h_xy - h_y)) / h_x if h_x > 0 else None
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(
            n, int(hx_q["__lv"]), int(hy_q["__lv"]),
            rnd(h_x), rnd(h_y), rnd(h_xy), rnd(u_yx), rnd(u_xy),
        )],
        "n bigint, n_x_levels bigint, n_y_levels bigint, h_x double, "
        "h_y double, h_xy double, u_y_given_x double, u_x_given_y double",
    )


def cramers_v_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Cramér's V over a bounded list of categorical columns —
    the normalized [0, 1] association matrix a feature-selection /
    leakage screen reads where :func:`chi2_independence` gives one
    pair's raw χ² and :func:`theil_u` the asymmetric directional view:
    V = √(χ²/(n·(min(r,c)−1))) puts every pair on one comparable scale
    regardless of cardinality.

    Per pair (one aggregation pipeline each, unioned — the column list
    is bounded API input, never data): (x, y) cell counts reduce once,
    marginals re-aggregate from the CELL frame (never a second input
    scan), and χ² uses the identity χ² = n·(Σ c²ₓᵧ/(cₓ·c•ᵧ)) − n with
    each term micro-quantized as round(c²/(cx·cy)·10¹²) over exact
    integer ratios — both engines sum identical integers, ONE
    driver-side finalize per pair over bounded totals (the
    mann_whitney convention). Pairs with min(r, c) = 1 (a constant
    column) emit NULL V. Returns one row per unordered pair:
    (col_x, col_y, n, levels_x, levels_y, chi2, cramers_v).
    """
    from ..plans.inspect import (
        intermediates_mark,
        release_intermediates_since,
        tracked_persist,
    )

    dec = "decimal(38,0)"
    rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            cx, cy = cols[i], cols[j]
            pool = df.where(
                F.col(cx).isNotNull() & F.col(cy).isNotNull()
            ).select(F.col(cx).alias("__x"), F.col(cy).alias("__y"))
            mark = intermediates_mark()
            cells = tracked_persist(
                pool.groupBy("__x", "__y").agg(
                    F.count(F.lit(1)).cast("bigint").alias("__c")
                )
            )
            mx = cells.groupBy("__x").agg(F.sum("__c").alias("__cx"))
            my = cells.groupBy("__y").agg(F.sum("__c").alias("__cy"))
            term = F.round(
                F.col("__c").cast("double") * F.col("__c")
                / (F.col("__cx").cast("double") * F.col("__cy"))
                * F.lit(1_000_000_000_000)
            ).cast(dec)
            fin = (
                cells.join(mx, "__x").join(my, "__y")
                .agg(
                    F.sum(F.col("__c").cast(dec)).alias("__n"),
                    F.count_distinct("__x").alias("__lx"),
                    F.count_distinct("__y").alias("__ly"),
                    F.sum(term).alias("__t"),
                )
                .first()
            )
            release_intermediates_since(mark)
            n = int(fin["__n"] or 0)
            lx, ly = int(fin["__lx"]), int(fin["__ly"])
            chi2 = v = None
            if n > 0:
                # χ² = n·Σterm/10¹² − n: exact ints until one finalize
                chi2 = n * int(fin["__t"]) / 1e12 - n
                dof_min = min(lx, ly) - 1
                if dof_min > 0:
                    v = math.sqrt(max(chi2, 0.0) / (n * dof_min))
            rnd = _round6_half_away
            rows.append((cx, cy, n, lx, ly, rnd(chi2), rnd(v)))
    return df.sparkSession.createDataFrame(
        rows,
        "col_x string, col_y string, n bigint, levels_x bigint, "
        "levels_y bigint, chi2 double, cramers_v double",
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran–Armitage trend test — does a BINARY outcome's rate trend
    monotonically across ORDERED integer groups: the proportions
    member of the ordered-alternatives family
    (:func:`jonckheere_terpstra` handles a continuous outcome,
    :func:`chi2_independence` ignores the ordering entirely and burns
    power on it). T = Σ sₓ·x against its null moments under the pooled
    rate: E[T] = p̄·Σnₓx, Var[T] = p̄(1−p̄)(Σnₓx² − (Σnₓx)²/N); the
    z sign reads the direction (positive = the rate rises with the
    score).

    ONE aggregation over (score, success) pairs computes every moment
    in exact DECIMAL(38,0) (scores are integers by contract — bucket
    upstream); the finalize is driver-side over the bounded one-row
    totals in a fixed operand order the oracle mirrors, rounding
    half-away. Degenerate inputs (one score level, or a pooled rate
    of exactly 0 or 1) emit NULL z — no trend is estimable. NULL
    scores/outcomes are excluded. Returns one row:
    (n, n_success, n_score_levels, t_stat, mean_t, var_t, z).
    """
    dec = "decimal(38,0)"
    x = F.col(score_col).cast("bigint")
    s = F.col(success_col).cast("boolean").cast("int")
    pool = df.where(
        F.col(score_col).isNotNull() & F.col(success_col).isNotNull()
    ).select(x.alias("__x"), s.alias("__s"))
    agg = pool.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__s").alias("__ns"),
        F.count_distinct("__x").alias("__lv"),
        F.sum((F.col("__s") * F.col("__x")).cast(dec)).alias("__t"),
        F.sum(F.col("__x").cast(dec)).alias("__ex"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__exx"),
    ).first()
    n = int(agg["__n"] or 0)
    ns = int(agg["__ns"] or 0)
    lv = int(agg["__lv"] or 0)
    t = mean_t = var_t = z = None
    if n > 0:
        t = float(int(agg["__t"]))
        ex, exx = int(agg["__ex"]), int(agg["__exx"])
        # p̄·Ex and p̄(1−p̄)(Exx − Ex²/N): exact ints into fixed-order
        # double expressions, mirrored by the oracle
        pbar = ns / n
        mean_t = pbar * ex
        var_t = pbar * (1.0 - pbar) * (exx - float(ex) * ex / n)
        if lv >= 2 and var_t > 0:
            z = (t - mean_t) / math.sqrt(var_t)
        else:
            z = None
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(n, ns, lv, rnd(t), rnd(mean_t), rnd(var_t), rnd(z))],
        "n bigint, n_success bigint, n_score_levels bigint, t_stat double, "
        "mean_t double, var_t double, z double",
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected multi-rater agreement when each
    ITEM receives several categorical ratings (here: each row is one
    rating event): "do the raters/models/heuristics assign the same
    label beyond what the label base rates predict", the k-category,
    n-rater generalization of :func:`cohens_kappa` (which is locked to
    exactly two raters). The readout an annotation-QA or
    ensemble-labeling pipeline wants before trusting majority votes.

    Conventions (documented because implementations differ on unequal
    rating counts): items with fewer than 2 ratings cannot express
    agreement and DROP (counted in ``n_items_dropped``); per-item
    agreement is P_i = (Σ_j n_ij² − n_i)/(n_i(n_i−1)) — valid for
    VARYING n_i; the chance term P_e = Σ_j p_j² uses the pooled
    category shares over participating items. Exactness: every count
    is an exact integer; P_i quantizes half-up to micro-units per item
    so P̄ is an exact integer sum with ONE division; P_e is the exact
    integer Σc_j² over N² in one fixed-order double division; κ
    finalizes half-away. A single-category pool has P_e = 1 → NULL κ
    (0/0). Scale shape: two bounded aggregations (items, categories) —
    rating volume flows through one (item, category) count; no
    windows, no driver state. One row:
    (n_items, n_items_dropped, n_categories, n_ratings, p_bar, p_e,
    kappa).
    """
    dec = "decimal(38,0)"
    i = F.col(item_col)
    c = F.col(category_col)
    pool = df.where(i.isNotNull() & c.isNotNull()).select(
        i.alias("__i"), c.alias("__c")
    )
    cell = pool.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_item = cell.groupBy("__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * F.col("__n")).alias("__a2"),
        F.count(F.lit(1)).alias("__kcats"),
    )
    kept = per_item.where(F.col("__ni") >= 2)
    # P_i = (Σn² − n)/(n(n−1)) ∈ [0,1]: double in fixed order, half-up
    pi_q = F.floor(
        (F.col("__a2") - F.col("__ni")).cast("double")
        / (F.col("__ni") * (F.col("__ni") - 1)).cast("double")
        * 1_000_000
        + F.lit(0.5)
    ).cast("bigint")
    items = kept.agg(
        F.count(F.lit(1)).cast("bigint").alias("__m"),
        F.coalesce(F.sum(pi_q.cast(dec)), F.lit(0).cast(dec)).alias("__sp"),
        F.coalesce(F.sum(F.col("__ni").cast(dec)), F.lit(0).cast(dec)).alias(
            "__nr"
        ),
    )
    dropped = per_item.where(F.col("__ni") < 2).agg(
        F.count(F.lit(1)).cast("bigint").alias("__d")
    )
    # category totals over PARTICIPATING items only
    cats = (
        cell.join(kept.select("__i"), "__i")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__cj"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__ncat"),
            F.coalesce(
                F.sum(F.col("__cj").cast(dec) * F.col("__cj")),
                F.lit(0).cast(dec),
            ).alias("__sc2"),
        )
    )
    one = items.crossJoin(F.broadcast(dropped)).crossJoin(F.broadcast(cats))
    pbar = F.col("__sp").cast("double") / F.col("__m") / 1_000_000
    pe = (
        F.col("__sc2").cast("double")
        / (F.col("__nr").cast("double") * F.col("__nr").cast("double"))
    )
    kap = (pbar - pe) / (F.lit(1.0) - pe)
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    s6 = lambda x: (  # noqa: E731  signed half-away
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return one.select(
        F.col("__m").alias("n_items"),
        F.col("__d").alias("n_items_dropped"),
        F.col("__ncat").alias("n_categories"),
        F.col("__nr").cast("bigint").alias("n_ratings"),
        F.when(F.col("__m") > 0, h6(pbar)).alias("p_bar"),
        F.when(F.col("__m") > 0, h6(pe)).alias("p_e"),
        F.when((F.col("__m") > 0) & (pe < 1.0), s6(kap)).alias("kappa"),
    )


def _block_doubled_midranks(c: DataFrame) -> DataFrame:
    """Within-block doubled midranks over a complete-block cell frame
    (__b, __t, __s, __c) — the :func:`friedman_test` k×k comparison
    join, extracted so :func:`page_trend_test` rides the IDENTICAL
    ranking (exact integer fraction comparisons S_a·c_b vs S_b·c_a, no
    float mean ever compared; doubled midranks 2L + T + 1 stay
    integer). Returns (__b, __ta, __r2)."""
    a = c.select("__b", F.col("__t").alias("__ta"),
                 F.col("__s").alias("__sa"), F.col("__c").alias("__ca"))
    b = c.select("__b", F.col("__t").alias("__tb"),
                 F.col("__s").alias("__sb"), F.col("__c").alias("__cb"))
    cmpj = a.join(b, "__b").select(
        "__b", "__ta",
        (F.col("__sb") * F.col("__ca") < F.col("__sa") * F.col("__cb"))
        .cast("int").alias("__less"),
        (F.col("__sb") * F.col("__ca") == F.col("__sa") * F.col("__cb"))
        .cast("int").alias("__eq"),
    )
    return cmpj.groupBy("__b", "__ta").agg(
        (F.lit(2) * F.sum("__less") + F.sum("__eq") + F.lit(1)).alias("__r2")
    )


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Page's L trend test — the ORDERED-alternative member of the
    matched-blocks family: where :func:`friedman_test` asks "do the k
    treatments differ at all within blocks", Page's L asks "do they
    INCREASE in a prespecified order" and buys the same power advantage
    over Friedman that :func:`jonckheere_terpstra` buys over
    Kruskal–Wallis for independent groups. The treatment order is the
    ascending label sort (the JT convention — encode the hypothesis in
    the labels).

    Rides friedman's machinery verbatim (:func:`_block_doubled_midranks`
    — one ranking implementation; complete blocks only, dropped count
    reported; per-cell MEAN compared as exact integer cross-products).
    L = Σ_j j·R_j stays exact through the doubled-rank channel
    (L2 = Σ j·R2_j is an exact integer; L = L2/2 exact at .5
    resolution). The z finalize uses the classical NO-TIE moments
    E[L] = b·k(k+1)²/4, Var[L] = b(k³−k)²/(144(k−1)) — documented
    (midrank ties make the variance conservative, the runs_test/JT
    convention). k < 3 or zero variance → NULL z. One row: (n_blocks,
    n_blocks_dropped, k_treatments, l_stat, mean_l, var_l, z).
    """
    from ..plans.inspect import (
        intermediates_mark,
        release_intermediates_since,
        tracked_persist,
    )

    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).alias("__t"),
        F.round(v * scale).cast(dec).alias("__vq"),
    )
    mark = intermediates_mark()
    cell = tracked_persist(
        pool.groupBy("__b", "__t").agg(
            F.sum("__vq").alias("__s"), F.count(F.lit(1)).alias("__c")
        )
    )
    k = cell.select("__t").distinct().count()  # bounded: treatment levels
    sizes = cell.groupBy("__b").agg(F.count(F.lit(1)).alias("__kt"))
    n_total = sizes.count()
    complete = tracked_persist(sizes.where(F.col("__kt") == k).select("__b"))
    n_blocks = complete.count()
    dropped = n_total - n_blocks
    l_stat = mean_l = var_l = z = None
    if k >= 2 and n_blocks >= 1:
        ranks = _block_doubled_midranks(cell.join(complete, "__b"))
        per_t = ranks.groupBy("__ta").agg(
            F.sum(F.col("__r2").cast(dec)).alias("__rsum")
        )
        rows = sorted(per_t.collect(), key=lambda r: r["__ta"])  # bounded: k
        l2 = sum((j + 1) * int(r["__rsum"]) for j, r in enumerate(rows))
        l_stat = l2 / 2.0  # doubled ranks halve exactly (.5 resolution)
        mean_l = n_blocks * k * (k + 1) * (k + 1) / 4.0
        var_l = (
            n_blocks * (k**3 - k) ** 2 / (144.0 * (k - 1)) if k >= 2 else None
        )
        if k >= 3 and var_l and var_l > 0:
            z = (l_stat - mean_l) / math.sqrt(var_l)
    release_intermediates_since(mark)
    rnd = _round6_half_away
    return df.sparkSession.createDataFrame(
        [(n_blocks, dropped, k, rnd(l_stat), rnd(mean_l), rnd(var_l), rnd(z))],
        "n_blocks bigint, n_blocks_dropped bigint, k_treatments bigint, "
        "l_stat double, mean_l double, var_l double, z double",
    )


def inequality_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Inequality indices per group — Hoover (robin-hood share), Theil T
    (entropy-based, decomposable), and Atkinson ε=1 (geometric-mean
    based) over a positive metric: how CONCENTRATED is the mass (doc
    length, revenue, event volume) inside each group — the
    distribution-shape companions to :func:`gini_concentration`
    (q232), each with a different sensitivity (Hoover: the middle;
    Theil: the top; Atkinson-1: the bottom). A corpus-mix review reads
    these to see whether a source's token mass rides on a few mega-docs.

    Conventions: NULL/NaN and NONPOSITIVE values are excluded and
    counted (logarithmic indices need x > 0 — documented). Exactness:
    values quantize to micro-units; Hoover = Σ|x_i·n − S| / (2·S·n) is
    EXACT integer arithmetic end-to-end with one final division; Theil
    and Atkinson terms quantize per DISTINCT value (x·ln-terms in
    fixed-order doubles, half-up to micro-units, weighted by the exact
    value count) so both engines sum identical integers; the exp/µ
    finalizes are fixed-order doubles rounded half-away. All-equal
    groups report exactly 0 on all three. Scale shape: one value-level
    collapse per group (bounded by distinct values), one group
    aggregate — no windows over data volume, no driver state. Returns
    (group, n, n_excluded, mean, hoover, theil_t, atkinson).
    """
    dec = "decimal(38,0)"
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    base = df.where(g.isNotNull()).select(
        g.alias("__g"),
        F.when(v.isNotNull() & ~F.isnan(v), v).alias("__v"),
    )
    # distinct alias on the join key: excl and agg share base's lineage,
    # and a same-name self-join condition is trivially true in Spark
    excl = (
        base.where(F.col("__v").isNull() | (F.col("__v") <= 0))
        .groupBy(F.col("__g").alias("__gx"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__nx"))
    )
    pool = base.where(F.col("__v") > 0).select(
        "__g", F.round(F.col("__v") * scale).cast(dec).alias("__vq")
    )
    cells = pool.groupBy("__g", "__vq").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    tot = cells.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("__n"),
        F.sum(F.col("__vq") * F.col("__c")).alias("__s"),
    )
    j = cells.join(tot, "__g")
    # Hoover: Σ|x·n − S|·c over 2·S·n — exact integers until one division
    hov_num = F.sum(
        F.abs(F.col("__vq") * F.col("__n") - F.col("__s")) * F.col("__c")
    )
    # Theil T term per distinct value: t = x·n/S; q = half-up(t·ln t·1e6)
    t_ratio = (
        F.col("__vq").cast("double")
        * F.col("__n").cast("double")
        / F.col("__s").cast("double")
    )
    th_term = t_ratio * F.log(t_ratio) * 1_000_000
    th_q = F.when(th_term >= 0, F.floor(th_term + F.lit(0.5))).otherwise(
        -F.floor(-th_term + F.lit(0.5))
    ).cast("bigint")
    # Atkinson(1): ln x per distinct value, half-away micro-quantized
    ln_term = F.log(F.col("__vq").cast("double")) * 1_000_000
    ln_q = F.when(ln_term >= 0, F.floor(ln_term + F.lit(0.5))).otherwise(
        -F.floor(-ln_term + F.lit(0.5))
    ).cast("bigint")
    agg = j.groupBy("__g", "__n", "__s").agg(
        hov_num.alias("__hnum"),
        F.sum(th_q.cast(dec) * F.col("__c")).alias("__tq"),
        F.sum(ln_q.cast(dec) * F.col("__c")).alias("__lq"),
    )
    mu = F.col("__s").cast("double") / F.col("__n") / scale
    theil = F.col("__tq").cast("double") / F.col("__n") / 1_000_000
    geo = F.exp(
        F.col("__lq").cast("double") / F.col("__n") / 1_000_000
    ) / scale  # back to value units
    atk = F.lit(1.0) - geo / mu
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    s6 = lambda x: (  # noqa: E731
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return (
        agg.join(excl, F.col("__g") == F.col("__gx"), "left")
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n"),
            F.coalesce(F.col("__nx"), F.lit(0)).cast("bigint").alias(
                "n_excluded"
            ),
            h6(mu).alias("mean"),
            # |x·n − S| = n·|x − μ|, so Hoover = Σ|x−μ|/(2S) = hnum/(2·S·n)
            h6(
                F.col("__hnum").cast("double")
                / (F.lit(2.0) * F.col("__s").cast("double"))
                / F.col("__n").cast("double")
            ).alias("hoover"),
            s6(theil).alias("theil_t"),
            s6(atk).alias("atkinson"),
        )
    )


def gamma_concordance(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Goodman–Kruskal gamma and Somers' D between two ORDINAL columns —
    the tie-aware concordance pair the ordered-association toolkit
    needs between :func:`kendall_tau` (τ-b, per-key and tie-penalized)
    and :func:`spearman_corr` (rank linear): gamma ignores ties
    entirely ((C−D)/(C+D), the "among untied pairs, how often do the
    orders agree" readout), Somers' D_yx charges ties on the DEPENDENT
    axis only — the asymmetric effect size behind rank-based AUC.

    Scale shape: data volume collapses ONCE to the (x, y) contingency
    cells (bounded by the product of distinct levels — document the
    ordinal-input contract); concordant/discordant mass is the
    cell×cell join over that bounded frame with strict </> predicates
    (cells², never rows²); every product accumulates in DECIMAL(38,0).
    Ties come from the exact marginals: T_x = Σ r_i(r_i−1)/2 − T_xy …
    all integer. Finalizes are two fixed-order double divisions rounded
    half-away. Degenerate pools (C+D = 0, e.g. a constant column) →
    NULL gamma/D. NULL/NaN rows excluded. One row: (n, n_x_levels,
    n_y_levels, n_concordant, n_discordant, gamma, somers_d_yx).
    """
    dec = "decimal(38,0)"
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    pool = df.where(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    ).select(x.alias("__x"), y.alias("__y"))
    cells = pool.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    a = cells.select(
        F.col("__x").alias("__xa"), F.col("__y").alias("__ya"),
        F.col("__c").alias("__ca"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"), F.col("__y").alias("__yb"),
        F.col("__c").alias("__cb"),
    )
    pairs = a.join(
        b,
        (F.col("__xa") < F.col("__xb"))
        & (F.col("__ya") != F.col("__yb")),
    ).select(
        (F.col("__ca").cast(dec) * F.col("__cb")).alias("__m"),
        (F.col("__ya") < F.col("__yb")).cast("int").alias("__conc"),
    )
    cd = pairs.agg(
        F.coalesce(
            F.sum(F.when(F.col("__conc") == 1, F.col("__m"))),
            F.lit(0).cast(dec),
        ).alias("__cc"),
        F.coalesce(
            F.sum(F.when(F.col("__conc") == 0, F.col("__m"))),
            F.lit(0).cast(dec),
        ).alias("__dd"),
    )
    # tie mass on y (for Somers' D_yx): pairs tied on y but NOT on x.
    # From marginals: T_y_pairs = Σ_y s_y(s_y−1)/2 − Σ_cells c(c−1)/2
    #                − (pairs tied on BOTH removed via cell term) …
    # exactly: ties_y_only = Σ_y s_y² − Σ_cells c² over 2 minus the
    # within-cell pairs already excluded by the c² term.
    ycnt = cells.groupBy("__y").agg(F.sum("__c").alias("__sy"))
    ty = ycnt.agg(
        F.coalesce(
            F.sum(F.col("__sy").cast(dec) * F.col("__sy")), F.lit(0).cast(dec)
        ).alias("__sy2")
    )
    cc2 = cells.agg(
        F.coalesce(
            F.sum(F.col("__c").cast(dec) * F.col("__c")), F.lit(0).cast(dec)
        ).alias("__sc2"),
        F.sum("__c").cast("bigint").alias("__n"),
        F.countDistinct("__x").cast("bigint").alias("__nx"),
        F.countDistinct("__y").cast("bigint").alias("__ny"),
    )
    one = cd.crossJoin(F.broadcast(ty)).crossJoin(F.broadcast(cc2))
    c_d = F.col("__cc").cast("double")
    d_d = F.col("__dd").cast("double")
    # ties on y with x differing, as PAIR counts (halved exact integers)
    tyo = (F.col("__sy2") - F.col("__sc2")).cast("double") / 2.0
    gamma = (c_d - d_d) / (c_d + d_d)
    somers = (c_d - d_d) / (c_d + d_d + tyo)
    s6 = lambda v: (  # noqa: E731
        F.when(v >= 0, F.floor(v * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-v * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return one.select(
        F.col("__n").alias("n"),
        F.col("__nx").alias("n_x_levels"),
        F.col("__ny").alias("n_y_levels"),
        F.col("__cc").cast("bigint").alias("n_concordant"),
        F.col("__dd").cast("bigint").alias("n_discordant"),
        F.when(c_d + d_d > 0, s6(gamma)).alias("gamma"),
        F.when(c_d + d_d + tyo > 0, s6(somers)).alias("somers_d_yx"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Log-rank (Mantel–Cox) test — do two groups share a survival
    curve? The hypothesis test completing the survival kit:
    :func:`kaplan_meier` and :func:`nelson_aalen` ESTIMATE curves,
    this asks whether cohort A churns faster than cohort B once
    right-censoring is handled correctly — the comparison plain
    retention-rate deltas get wrong whenever observation windows
    differ. At each pooled event time t the group-A death count is
    compared against its hypergeometric expectation
    E₁(t) = d·n₁/n, with variance
    V(t) = d·n₁·(n−n₁)·(n−d) / (n²·(n−1));
    χ² = (Σd₁ − ΣE₁)²/ΣV and z = (Σd₁ − ΣE₁)/√ΣV (A dying MORE than
    expected → positive z).

    Scale shape: the :func:`kaplan_meier` machinery with a group tag —
    per-distinct-duration counts (c, c₁, d, d₁), ONE
    :func:`_ranged_cumsum` pass over [c, c₁] gives both at-risk
    series, and the per-time E/V terms micro-quantize half-up
    (floor(x·10⁶ + 0.5) — exact-rational inputs, so never F.round;
    the video_brightness_slope cross-engine catch) into exact DECIMAL
    sums; the finalize is one fixed-order double expression over a
    broadcast one-row frame. NULL/NaN durations and rows outside the
    two groups are excluded; ``event_col`` is 0/1-coercible. One row:
    (n_a, n_b, observed_a, expected_a, variance, z, chi2); an empty
    group or zero variance reports NULL z/chi2.
    """
    dec = "decimal(38,0)"
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    g = F.col(group_col)
    pool = df.where(
        t.isNotNull() & ~F.isnan(t) & g.isin([group_a, group_b])
    ).select(
        t.alias("__t"),
        e.alias("__e"),
        (g == F.lit(group_a)).cast("int").alias("__a"),
    )
    per_t = pool.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum("__a").cast("bigint").alias("__c1"),
        F.sum("__e").cast("bigint").alias("__d"),
        F.sum(F.col("__e") * F.col("__a")).cast("bigint").alias("__d1"),
    )
    cum = _ranged_cumsum(per_t, "__t", ["__c", "__c1"])
    tot = cum.agg(
        F.coalesce(F.max("__cum___c"), F.lit(0)).cast("bigint").alias("__nn"),
        F.coalesce(F.max("__cum___c1"), F.lit(0)).cast("bigint").alias("__na"),
    )
    risk = cum.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__d1",
        (F.col("__nn") - (F.col("__cum___c") - F.col("__c"))).alias("__nr"),
        (F.col("__na") - (F.col("__cum___c1") - F.col("__c1"))).alias("__nr1"),
    )
    nr = F.col("__nr").cast("double")
    nr1 = F.col("__nr1").cast("double")
    dd = F.col("__d").cast("double")
    # exact-rational per-time terms, micro-quantized half-up; the V
    # operand order is pinned and mirrored verbatim by the oracle
    qe = F.floor(dd * nr1 / nr * 1_000_000 + F.lit(0.5)).cast(dec)
    qv = F.when(
        F.col("__nr") > 1,
        F.floor(
            dd * nr1 * (nr - nr1) * (nr - dd) / (nr * nr * (nr - F.lit(1.0)))
            * 1_000_000
            + F.lit(0.5)
        ),
    ).otherwise(F.lit(0)).cast(dec)
    terms = risk.where(F.col("__d") > 0).agg(
        F.coalesce(F.sum("__d1"), F.lit(0)).cast("bigint").alias("__o1"),
        F.coalesce(F.sum(qe), F.lit(0).cast(dec)).alias("__qe"),
        F.coalesce(F.sum(qv), F.lit(0).cast(dec)).alias("__qv"),
    )
    one = terms.crossJoin(F.broadcast(tot))
    e1 = F.col("__qe").cast("double") / 1_000_000
    var = F.col("__qv").cast("double") / 1_000_000
    diff = F.col("__o1").cast("double") - e1
    both = (F.col("__na") > 0) & (F.col("__nn") > F.col("__na"))
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return one.select(
        F.col("__na").alias("n_a"),
        (F.col("__nn") - F.col("__na")).alias("n_b"),
        F.col("__o1").alias("observed_a"),
        F.when(both, h6(e1)).alias("expected_a"),
        F.when(both, h6(var)).alias("variance"),
        F.when(both & (var > 0), F.round(diff / F.sqrt(var), 6)).alias("z"),
        F.when(both & (var > 0), F.round(diff * diff / var, 6)).alias("chi2"),
    )


def cronbach_alpha(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    value_col: str,
) -> DataFrame:
    """Cronbach's alpha — internal-consistency reliability of a
    multi-item scale: "do the k items/judges/heuristic scores move
    together across subjects enough to justify summing them into one
    score?" The reliability member of the agreement family —
    :func:`cohens_kappa`/:func:`fleiss_kappa` handle CATEGORICAL
    labels, alpha handles NUMERIC item scores (an LLM-judge ensemble,
    a multi-probe quality rubric):
    α = k/(k−1) · (1 − Σᵢ Var(itemᵢ) / Var(total)).

    Conventions (documented): the item set is the distinct observed
    items; only subjects observing ALL k items participate
    (complete-case — dropped subjects counted); duplicate
    (subject, item) measurements average first; SAMPLE variances
    (n−1). Exactness: values micro-quantize once
    (floor(v·10⁶ + 0.5)); per-item and per-subject-total moments
    (Σx, Σx²) accumulate in exact DECIMAL; each item's
    n·Σx²−(Σx)² numerator stays exact DECIMAL and the variance ratio
    is ONE fixed-order double expression — per-item numerators SUM
    exactly before any division, so no float-sum order dependence.
    Scale shape: one (subject, item) cell aggregation → a bounded
    per-item frame and a per-subject total frame → two one-row
    aggregates broadcast into the finalize; no windows, no driver
    state. One row: (k_items, n_subjects, n_subjects_dropped, alpha);
    k < 2, n < 2, or zero total variance reports NULL alpha.
    """
    dec = "decimal(38,0)"
    s = F.col(subject_col)
    i = F.col(item_col)
    v = F.col(value_col).cast("double")
    pool = df.where(s.isNotNull() & i.isNotNull() & v.isNotNull() & ~F.isnan(v))
    # duplicate measurements average via exact micro-sums divided ONCE
    # (F.avg over raw doubles is partition-order-dependent — the
    # wilcoxon paired-means recipe)
    qv = F.floor(v * 1_000_000 + F.lit(0.5)).cast(dec)
    cell = pool.groupBy(s.alias("__s"), i.alias("__i")).agg(
        F.floor(
            F.sum(qv).cast("double") / F.count(F.lit(1)) + F.lit(0.5)
        ).cast("bigint").alias("__q")
    )
    k_items = cell.select("__i").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__k")
    )
    per_subj = cell.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__ki"),
        F.sum(F.col("__q").cast(dec)).alias("__tot"),
    )
    complete = per_subj.crossJoin(F.broadcast(k_items)).where(
        F.col("__ki") == F.col("__k")
    )
    # subject-total moments (exact DECIMAL over micro-units)
    subj_mom = complete.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum("__tot"), F.lit(0).cast(dec)).alias("__st"),
        F.coalesce(F.sum(F.col("__tot") * F.col("__tot")), F.lit(0).cast(dec))
        .alias("__st2"),
    )
    dropped = per_subj.crossJoin(F.broadcast(k_items)).where(
        F.col("__ki") < F.col("__k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__dr"))
    # per-item exact variance numerators n·Σx²−(Σx)², summed exactly
    item_mom = (
        cell.join(complete.select("__s"), "__s")
        .groupBy("__i")
        .agg(
            F.sum(F.col("__q").cast(dec)).alias("__sx"),
            F.sum(F.col("__q").cast(dec) * F.col("__q")).alias("__sx2"),
            F.count(F.lit(1)).cast("bigint").alias("__ni"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__ni") * F.col("__sx2")
                    - F.col("__sx") * F.col("__sx")
                ),
                F.lit(0).cast(dec),
            ).alias("__sinum")
        )
    )
    one = (
        subj_mom.crossJoin(F.broadcast(item_mom))
        .crossJoin(F.broadcast(k_items))
        .crossJoin(F.broadcast(dropped))
    )
    n_d = F.col("__n").cast("double")
    # Σ itemvar / totalvar: both share the n(n−1) denominator, so the
    # ratio is Σ per-item numerators over the total numerator — exact
    # DECIMAL until this ONE division
    tot_num = (
        F.col("__n") * F.col("__st2") - F.col("__st") * F.col("__st")
    ).cast("double")
    ratio = F.col("__sinum").cast("double") / tot_num
    k_d = F.col("__k").cast("double")
    alpha = k_d / (k_d - F.lit(1.0)) * (F.lit(1.0) - ratio)
    s6 = lambda x: (  # noqa: E731
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    ok = (F.col("__k") >= 2) & (F.col("__n") >= 2) & (tot_num > 0)
    return one.select(
        F.col("__k").alias("k_items"),
        F.col("__n").alias("n_subjects"),
        F.col("__dr").alias("n_subjects_dropped"),
        F.when(ok, s6(alpha)).alias("alpha"),
    )


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Bartlett's test for equal variances across k groups — the
    parametric, more powerful sibling of :func:`brown_forsythe_test`
    (which trades power for robustness to non-normality; run both —
    agreement is evidence, disagreement localizes the tail problem):
    T = [(N−k)·ln(Sₚ²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with the usual
    correction C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)), T ~ χ²(k−1).

    Conventions: groups need nᵢ ≥ 2; a ZERO-variance group makes
    ln(Sᵢ²) undefined — such groups are excluded and counted
    (``n_groups_degenerate``), the documented deviation from engines
    that return NaN. Exactness: values micro-quantize once; per-group
    moments in exact DECIMAL so every Sᵢ² is the exact rational
    (n·Σx²−(Σx)²)/(n(n−1)) in micro²-units; each group's
    (nᵢ−1)·ln(Sᵢ²) and 1/(nᵢ−1) term micro-quantizes half-away
    BEFORE the sum (float-sum order independence — the
    :func:`fleiss_kappa` recipe), and the finalize is one fixed-order
    double expression. Scale shape: one groupBy over value volume →
    bounded per-group frame → one-row aggregate; no windows, no
    driver state. One row: (k_groups, n, n_groups_degenerate,
    pooled_var, chi2, df); k < 2 after exclusions reports NULL
    chi2/df.
    """
    dec = "decimal(38,0)"
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    pool = df.where(g.isNotNull() & v.isNotNull() & ~F.isnan(v)).select(
        g.alias("__g"),
        F.floor(v * 1_000_000 + F.lit(0.5)).cast("bigint").alias("__q"),
    )
    per_g = pool.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col("__q").cast(dec)).alias("__sx"),
        F.sum(F.col("__q").cast(dec) * F.col("__q")).alias("__sx2"),
    )
    num = (F.col("__n") * F.col("__sx2") - F.col("__sx") * F.col("__sx"))
    eligible = per_g.where(F.col("__n") >= 2).select(
        "__n",
        num.alias("__num"),
        (F.col("__n") * (F.col("__n") - 1)).cast(dec).alias("__den"),
    )
    live = eligible.where(F.col("__num") > 0)
    # Sᵢ² in micro²-units: exact rational → identical double; the
    # ssq numerator (nᵢ−1)·Sᵢ² = num/n stays an exact rational too
    s2 = F.col("__num").cast("double") / F.col("__den").cast("double")
    nm1 = (F.col("__n") - 1).cast("double")
    s6q = lambda x: (  # noqa: E731  signed micro-quantize half-away
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        ).cast("decimal(38,0)")
    )
    terms = live.agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("__nn"),
        F.coalesce(F.sum(s6q(nm1 * F.log(s2))), F.lit(0).cast(dec)).alias(
            "__qln"
        ),
        # pooled numerator Σ(nᵢ−1)Sᵢ² in micro²-units: num/n is an
        # exact rational per group — quantize half-up (nonneg) and sum
        F.coalesce(
            F.sum(
                F.floor(
                    F.col("__num").cast("double")
                    / F.col("__n").cast("double")
                    + F.lit(0.5)
                ).cast(dec)
            ),
            F.lit(0).cast(dec),
        ).alias("__qssq"),
        F.coalesce(
            F.sum(s6q(F.lit(1.0) / nm1)), F.lit(0).cast(dec)
        ).alias("__qinv"),
    )
    degen = eligible.where(~(F.col("__num") > 0)).agg(
        F.count(F.lit(1)).cast("bigint").alias("__dg")
    )
    one = terms.crossJoin(F.broadcast(degen))
    k_d = F.col("__k").cast("double")
    nmk = (F.col("__nn") - F.col("__k")).cast("double")
    sp2 = F.col("__qssq").cast("double") / nmk
    t_num = nmk * F.log(sp2) - F.col("__qln").cast("double") / 1_000_000
    corr = F.lit(1.0) + (
        F.col("__qinv").cast("double") / 1_000_000 - F.lit(1.0) / nmk
    ) / (F.lit(3.0) * (k_d - F.lit(1.0)))
    ok = F.col("__k") >= 2
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    s6 = lambda x: (  # noqa: E731
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return one.select(
        F.col("__k").alias("k_groups"),
        F.col("__nn").alias("n"),
        F.col("__dg").alias("n_groups_degenerate"),
        # pooled variance back in value²-units (micro² → ÷10¹²)
        F.when(ok, h6(sp2 / F.lit(1_000_000_000_000.0))).alias("pooled_var"),
        F.when(ok, s6(t_num / corr)).alias("chi2"),
        F.when(ok, (F.col("__k") - 1).cast("bigint")).alias("df"),
    )
