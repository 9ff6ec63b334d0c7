"""Join operators beyond plain ``df.join`` (SURVEY.md §2.B joins rows).

Equi joins (inner/left/right/full/semi/anti) are plain ``df.join`` and
need no wrapper — Catalyst picks broadcast / sort-merge / shuffled-hash,
and AQE re-plans at runtime. This module adds the composites Spark lacks
as built-ins: as-of join and range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the matching right row within the
    same ``on`` key — ``backward`` (default) takes the latest right row
    with ``right_time <= left_time``, ``forward`` the earliest with
    ``right_time >= left_time``, ``nearest`` whichever of the two is
    closer in time (ties to backward) — the full pandas ``merge_asof``
    direction surface, without its single-machine limits.

    Scale-first implementation: a single union + window pass instead of a
    per-key pandas merge_asof or an O(|L|·|R|) inequality join. Both
    inputs shuffle once on ``on``; a window's ``last(..., ignorenulls)``
    carries the most recent right-side values onto left rows (the
    forward direction runs the mirrored descending window; ``nearest``
    runs both over the SAME partitioning — Catalyst reuses one
    exchange — and picks per row by time distance). This survives
    100 TB because the only shuffle is the same hash-partition a plain
    equi-join would do, and state per key is one row of carried values
    per direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lt = F.col(left_time)
    nearest = direction == "nearest"
    carried_cols = list(right_cols) + (["__rtime"] if nearest else [])
    tagged_left = left.withColumn("__t", lt).withColumn("__is_left", F.lit(1))
    for c in right_cols:
        tagged_left = tagged_left.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    tagged_right = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    if nearest:
        # Exact time axis for the distance comparison: a timestamp cast
        # to double is epoch SECONDS with ~4e-7 s error at current
        # epochs — enough to flip a near-tie — so timestamps compare in
        # integer µs (unix_micros); numeric time columns compare as-is.
        from pyspark.sql.types import TimestampNTZType, TimestampType

        is_ts = isinstance(
            left.schema[left_time].dataType, (TimestampType, TimestampNTZType)
        )

        def _tnum(col):
            return F.unix_micros(col) if is_ts else col.cast("double")

        tagged_left = tagged_left.withColumn(
            f"__rtime{suffix}",
            F.lit(None).cast("bigint" if is_ts else "double"),
        )
        tagged_right = tagged_right.withColumn(
            f"__rtime{suffix}", _tnum(F.col("__t"))
        )
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in (on,):
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal timestamps in BOTH
    # directions (asof bounds are inclusive: <= backward, >= forward).
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    if direction == "backward":
        for c in right_cols:
            carried = carried.withColumn(
                f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wb)
            )
    elif direction == "forward":
        for c in right_cols:
            carried = carried.withColumn(
                f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wf)
            )
    else:
        for c in carried_cols:
            carried = carried.withColumn(
                f"__b_{c}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wb)
            ).withColumn(
                f"__f_{c}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wf)
            )
        tnum = _tnum(F.col("__t"))
        back_rt = F.col("__b___rtime")
        fwd_rt = F.col("__f___rtime")
        prefer_fwd = fwd_rt.isNotNull() & (
            back_rt.isNull() | ((fwd_rt - tnum) < (tnum - back_rt))
        )
        for c in right_cols:
            carried = carried.withColumn(
                f"{c}{suffix}",
                F.when(prefer_fwd, F.col(f"__f_{c}")).otherwise(F.col(f"__b_{c}")),
            )
        carried = carried.drop(
            f"__rtime{suffix}",
            *[f"__b_{c}" for c in carried_cols],
            *[f"__f_{c}" for c in carried_cols],
        )
    return carried.where(F.col("__is_left") == 1).drop("__t", "__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    ``[right_lo, right_hi)``.

    Plain Spark plans this as BroadcastNestedLoopJoin when the interval
    side is small (broadcast it); for two large sides, bucketize the point
    and interval endpoints to a common grid and equi-join on the bucket
    before filtering — turns O(N·M) into a co-partitioned join.
    """
    cond = (F.col(left_point) >= right[right_lo]) & (F.col(left_point) < right[right_hi])
    return left.join(F.broadcast(right), cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 8,
    salt_src: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigating equi join.

    Each left row gets a deterministic salt in ``[0, salts)``; the right
    side is replicated ``salts`` times; the join key becomes
    ``(on..., salt)``. A hot key's rows spread across ``salts`` reducers
    instead of hammering one. Result set is identical to the unsalted
    join (verified by oracle in q63).

    When to reach for this instead of AQE: AQE's skew-join splitting only
    rewrites sort-merge joins whose skewed side can be sub-split; explicit
    salting also covers shuffled-hash joins, aggregations that must keep
    the join's partitioning, and streaming joins where AQE doesn't apply.
    The salt is a hash of ``salt_src`` (default: all left columns), not
    rand() — same input → same partitioning → reproducible runs.
    """
    keys = on if isinstance(on, list) else [on]
    salt_cols = salt_src or list(left.columns)
    l = left.withColumn("__salt", F.pmod(F.hash(*salt_cols), F.lit(salts)))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return l.join(r, on=[*keys, "__salt"], how=how).drop("__salt")


def _bloom_positions(key: F.Column, n_bits: int, n_hashes: int) -> F.Column:
    from ..functions.hashing import seeded_hash

    return F.array(*[seeded_hash(key, s) % n_bits for s in range(n_hashes)])


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join pruning: filter ``fact`` down to rows whose
    key MIGHT exist in ``dim``, using a ``n_bits``-bit Bloom filter built
    from the dim keys — the classic pre-shuffle reduction when the dim
    side is too large to broadcast as a hash set but the fact side is
    vastly larger still (Spark's own runtime row-level filtering /
    InjectRuntimeFilter plays this trick internally; this operator makes
    it explicit, parameterized, and cross-engine verifiable via the
    deterministic md5 hash family instead of an opaque native filter).

    Build: dim keys → ``n_hashes`` seeded positions each → DISTINCT set
    bits (≤ n_bits integers, metadata-scale) aggregated to ONE row,
    packed into an ``n_bits/64``-word BITMASK, and broadcast. Probe: a
    narrow map — fact survives iff the bit at every position is set
    (element_at + bitwiseAND — O(1) per probe; the earlier
    array_contains form linearly scanned the set-bit list per hash per
    row, which dominated the probe at ~1k set bits). No shuffle touches
    fact; the output may contain Bloom false positives (one-sided
    error) and is intended to feed the exact join, which then carries
    only the pruned volume. At 100 TB the wide exchange after pruning
    moves ``n_pass`` rows, not ``n_fact``.
    """
    dim_key = dim_key or fact_key
    # 32-bit words: 2^(b%32) stays exactly representable through the
    # pow→bigint build (2^63 would clamp), and getbit probes O(1)
    n_words = (n_bits + 31) // 32
    bits = (
        dim.select(
            F.explode(
                _bloom_positions(F.col(dim_key).cast("string"), n_bits, n_hashes)
            ).alias("__bit")
        )
        .distinct()
        .agg(F.array_sort(F.collect_set("__bit")).alias("__bits"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.aggregate(
                    F.filter(F.col("__bits"), lambda b: (b / 32).cast("int") == w),
                    F.lit(0).cast("bigint"),
                    lambda acc, b: acc.bitwiseOR(
                        F.pow(F.lit(2.0), (b % 32).cast("int")).cast("bigint")
                    ),
                ),
            ).alias("__mask")
        )
    )
    probe = _bloom_positions(F.col(fact_key).cast("string"), n_bits, n_hashes)
    return (
        fact.crossJoin(F.broadcast(bits))
        .where(
            F.forall(
                probe,
                lambda p: F.getbit(
                    F.element_at(F.col("__mask"), (p / 32).cast("int") + 1),
                    (p % 32).cast("int"),
                )
                == 1,
            )
        )
        .drop("__mask")
    )


def bloom_prejoin_report(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """One-row calibration report for :func:`bloom_prejoin`: total fact
    rows, rows passing the Bloom probe, rows with a TRUE dim match
    (exact left-semi join over the already-pruned survivors), false
    positives and their rate among pass-throughs, and the pruned
    fraction — the "is n_bits big enough for this key population" check
    to run at small scale before sizing the filter for the cluster.
    Deterministic md5 positions → fully value-oracle-able, unlike a
    native Bloom whose bit layout is implementation-defined.
    """
    from ..plans.inspect import tracked_persist

    dim_key = dim_key or fact_key
    # two consumers (pass count + true-match semi-join) — persist so the
    # probe computes once; callers release via release_intermediates()
    passed = tracked_persist(
        bloom_prejoin(fact, dim, fact_key, dim_key, n_bits, n_hashes)
    )
    n_fact = fact.agg(F.count(F.lit(1)).alias("n_fact"))
    hits = passed.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )
    stats = passed.agg(F.count(F.lit(1)).alias("n_pass_bloom")).crossJoin(
        F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_true_match")))
    )
    return (
        n_fact.crossJoin(F.broadcast(stats))
        .select(
            "n_fact", "n_pass_bloom", "n_true_match",
            (F.col("n_pass_bloom") - F.col("n_true_match")).alias("n_false_pos"),
            F.when(
                F.col("n_pass_bloom") > 0,
                F.round(
                    (F.col("n_pass_bloom") - F.col("n_true_match")).cast("double")
                    / F.col("n_pass_bloom"),
                    6,
                ),
            ).alias("false_pos_rate"),
            F.when(
                F.col("n_fact") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("n_pass_bloom").cast("double") / F.col("n_fact"),
                    6,
                ),
            ).alias("pruned_frac"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    grid: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join between two LARGE interval tables — rows
    pair when their half-open ranges ``[lo, hi)`` intersect. The
    big-big companion to :func:`range_join` (which broadcasts a small
    interval side): plain Spark plans an inequality-only join as a
    nested-loop cartesian, O(N·M) at any cluster size.

    Grid decomposition makes it an EQUI join: each interval explodes
    into the ``grid``-sized cells it covers, the two sides hash-join
    on the cell, and the exact overlap predicate filters within the
    cell. Every overlapping pair shares the cell containing the later
    of the two interval starts, so emitting a pair ONLY at
    ``floor(max(l_lo, r_lo) / grid)`` makes output exactly-once with
    NO distinct/dedup pass. Cost is O(span/grid) replication per row
    against a co-partitioned join — pick ``grid`` near the typical
    interval length so replication stays O(1) per row; a hot cell
    (many long intervals over one range) is an ordinary skewed key,
    handled by AQE/salting like any equi join.

    Bounds are integers (epoch seconds/µs — timestamps cast upstream).
    EMPTY intervals (hi ≤ lo) are dropped before cell explosion — an
    empty range overlaps nothing, and its descending cell sequence
    would otherwise fabricate cells. Left columns keep their names.

    ``how`` accepts inner ONLY: BOTH sides are cell-exploded, so every
    other variant multiplies rows by covered cells — an outer join
    emits an unmatched interval once per cell, and even semi/anti
    evaluate per EXPLODED row (the canonical-cell rule only dedups
    MATCHED pairs). Rejected loudly rather than silently multiplied;
    derive semi/anti/outer from the inner result (distinct keys /
    anti-join against them).
    """
    if how.replace("_", "").lower() != "inner":
        raise ValueError(
            f"interval_overlap_join: how={how!r} is not supported — both "
            "sides are cell-exploded, so non-inner variants emit rows "
            "per covered cell (outer) or per exploded row (semi/anti); "
            "derive them from the inner result: distinct left keys for "
            "semi, an anti-join against those keys for anti/outer"
        )
    left = left.where(F.col(left_hi) > F.col(left_lo))
    right = right.where(F.col(right_hi) > F.col(right_lo))
    lcell = F.explode(
        F.sequence(
            F.floor(F.col(left_lo) / grid),
            F.floor((F.col(left_hi) - 1) / grid),
        )
    ).alias("__cell")
    rcell = F.explode(
        F.sequence(
            F.floor(F.col(right_lo) / grid),
            F.floor((F.col(right_hi) - 1) / grid),
        )
    ).alias("__cell")
    l = left.select("*", lcell)
    r = right.select("*", rcell)
    cond = (
        (l["__cell"] == r["__cell"])
        & (l[left_lo] < r[right_hi])
        & (r[right_lo] < l[left_hi])
        & (
            l["__cell"]
            == F.floor(F.greatest(l[left_lo], r[right_lo]) / grid)
        )
    )
    return l.join(r, cond, how).drop("__cell")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    grid: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join between a LARGE point table and a LARGE
    interval table — a point row pairs with every interval whose
    half-open range ``[lo, hi)`` contains it. The point-side companion
    to :func:`interval_overlap_join` (timestamps vs maintenance
    windows, prices vs tier bands, offsets vs document spans): plain
    Spark plans the pure-inequality predicate as a nested-loop
    cartesian.

    Same grid decomposition, but SIMPLER exactly-once story: a point
    lies in exactly ONE ``grid`` cell, so only the interval side
    explodes (cells floor(lo/grid)..floor((hi-1)/grid)) and each
    (point, interval) pair meets in exactly one cell — no
    canonical-cell filter, no dedup. Cost is O(span/grid) replication
    per interval against a co-partitioned equi join; pick ``grid``
    near the typical interval length. EMPTY intervals (hi ≤ lo) drop
    before explosion (their descending cell sequence would fabricate
    cells). Bounds and points are integers (epoch seconds/µs cast
    upstream). Point columns keep their names.

    ``how`` accepts inner and the POINT-side variants (left outer /
    left_semi / left_anti — points are not exploded, so their
    multiplicity is safe); right/full outer are rejected: an unmatched
    interval would surface once per covered cell.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.replace("_", "").lower() not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"point_in_interval_join: how={how!r} is not supported — the "
            "interval side is cell-exploded, so right/full outer would "
            "emit an unmatched interval once per covered cell; use the "
            "point-side variants (inner/left/left_semi/left_anti)"
        )
    intervals = intervals.where(F.col(hi_col) > F.col(lo_col))
    icell = F.explode(
        F.sequence(
            F.floor(F.col(lo_col) / grid),
            F.floor((F.col(hi_col) - 1) / grid),
        )
    ).alias("__cell")
    p = points.withColumn("__cell", F.floor(F.col(point_col) / grid))
    i = intervals.select("*", icell)
    cond = (
        (p["__cell"] == i["__cell"])
        & (i[lo_col] <= p[point_col])
        & (p[point_col] < i[hi_col])
    )
    return p.join(i, cond, how).drop("__cell")


def epsilon_band_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    eps: int,
    how: str = "inner",
) -> DataFrame:
    """ε-band join between two LARGE tables on a numeric axis: every
    (l, r) pair with ``|l − r| ≤ eps`` — the keyless 1-D near-join
    (align two systems' event logs within a tolerance, match
    measurements to calibration readings, pair offsets across
    re-tokenizations) that plain Spark plans as a nested-loop cartesian
    for the pure-inequality predicate. Completes the grid-join family:
    :func:`interval_overlap_join` is interval×interval,
    :func:`point_in_interval_join` point×interval, this is point×point.

    Grid decomposition with cell width ``eps``: |l − r| ≤ eps implies
    the two cells ``floor(v/eps)`` differ by at most 1, so the LEFT
    side keeps its single cell and the RIGHT side explodes into
    {cell−1, cell, cell+1} (a fixed 3× on one side — grid choice is
    built into the predicate, not tuned). The three emitted cells are
    distinct, so each qualifying pair meets in EXACTLY one cell (the
    left row's cell): exactly-once with no canonical-cell filter and no
    dedup shuffle. The exact band predicate filters inside the same
    join condition.

    Bounds are integers (epoch seconds/µs or quantized upstream) and
    ``eps`` a positive integer. Only ``inner`` is accepted: the right
    side is cell-exploded, so any right-preserving variant would emit
    an unmatched right row once per emitted cell, and left-preserving
    variants would need the filter folded into join semantics —
    compose with an anti/semi join downstream instead.
    """
    if how != "inner":
        raise ValueError(
            f"epsilon_band_join: how={how!r} is not supported — the right "
            "side is cell-exploded (an unmatched right row would surface "
            "once per emitted cell); only inner is exactly-once by "
            "construction. Compose semi/anti downstream."
        )
    eps = int(eps)
    if eps < 1:
        raise ValueError("epsilon_band_join: eps must be a positive integer")
    l = left.withColumn("__cell", F.floor(F.col(left_col) / eps))
    r = right.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(right_col) / eps) - 1,
                F.floor(F.col(right_col) / eps) + 1,
            )
        ).alias("__cell"),
    )
    cond = (
        (l["__cell"] == r["__cell"])
        & (F.abs(l[left_col] - r[right_col]) <= eps)
    )
    return l.join(r, cond, "inner").drop("__cell")


def knn_band_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    k: int,
    max_dist: int,
) -> DataFrame:
    """k-nearest-neighbor join on a 1-D numeric axis with a hard search
    radius: for each left row, the ``k`` closest right rows within
    ``max_dist`` — the bounded-radius 1-D kNN (match each reading to
    its k nearest calibration points, each event to its k nearest
    checkpoints) that a naive formulation plans as a cartesian plus a
    global sort.

    Composition of graded shapes: candidates come from
    :func:`epsilon_band_join` (grid cells, exactly-once, equi-join
    plan), then ONE left-id-partitioned window ranks candidates by
    (distance, right value, right id) — fully deterministic under
    ties — and keeps rank ≤ k. The radius is the scale contract:
    per-left fan-in is bounded by the right-side density within
    ``max_dist``, so the window state is bounded by construction
    (an unbounded kNN would sort every right row per left row).
    Returns left id/value + right id/value + ``dist`` + ``knn_rank``
    (1-based).

    The four id/value column names must be pairwise distinct (the
    output carries all four side by side); the two SIDES may freely
    share names internally — both are rebound to internal aliases
    before the join, so ``knn_band_join(l, r, "id", "v", "rid", "v2")``
    works even when ``l`` and ``r`` each have columns named ``id`` and
    ``v`` (advisor finding, r10: unaliased same-name value columns
    raised an ambiguous-reference AnalysisException after the join).
    """
    names = [left_id, left_col, right_id, right_col]
    if len(set(names)) != 4:
        raise ValueError(
            "knn_band_join: the output carries all four columns, so "
            f"left/right id and value names must be pairwise distinct; got {names}"
        )
    cand = epsilon_band_join(
        left.select(F.col(left_id).alias("__lid"), F.col(left_col).alias("__lv")),
        right.select(F.col(right_id).alias("__rid"), F.col(right_col).alias("__rv")),
        "__lv",
        "__rv",
        eps=int(max_dist),
    )
    dist = F.abs(F.col("__lv") - F.col("__rv"))
    w = Window.partitionBy("__lid").orderBy(
        dist.asc(), F.col("__rv").asc(), F.col("__rid").asc()
    )
    return (
        cand.withColumn("dist", dist)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= int(k))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__lv").alias(left_col),
            F.col("__rid").alias(right_id),
            F.col("__rv").alias(right_col),
            "dist",
            "knn_rank",
        )
    )
