"""Event-analytics operators: funnel conversion and retention cohorts.

The product-analytics surface every event store grows (mirrors the
reference's aggregation row, SURVEY.md §2.B group-by/agg — see
`/root/reference/max_aggregation.cpp:23-112` for the partial→final
combine these queries generalize): both operators are
user-keyed partial aggregations followed by a small final aggregation,
so at 100 TB the only wide exchange hashes on ``user_id`` — the same
key both operators share, letting Catalyst reuse one exchange when they
run in the same job. Nothing here windows over the full corpus or
sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_WEEK = 604800


def funnel_user_mins(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest timestamp of each funnel step (m1..mN) — the
    single stateful aggregation of the funnel, factored out because it is
    the streaming-able part: conditional ``min`` is an incrementally
    maintainable aggregate, so the same expression runs over
    ``readStream`` (update/complete mode) with per-user state bounded at
    one row of N timestamps; the scalar step-count finalization then runs
    batch-side over the sink (chained stateful aggregations are not
    streamable). Batch↔stream equivalence is asserted in
    tests/test_streaming.py."""
    mins = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"m{i}")
        for i, s in enumerate(steps, start=1)
    ]
    return df.groupBy(user_col).agg(*mins)


def funnel_counts(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Min-timestamp funnel: a user converts through step k iff the
    earliest occurrences of steps 1..k are in non-decreasing time order
    (the standard first-touch funnel — cheap, one pass, no per-event
    sequence scan; re-tries after a later step don't count, which is the
    conservative reading).

    Scale shape: one user-keyed aggregation computes all step-min
    timestamps in a single shuffle (map-side combined conditional mins);
    the step counts are then one scalar final over that — the
    ``Exchange SinglePartition`` carries one pre-aggregated row per
    partition, the correct shape at any scale. Output: one row per step
    (step, step_name, n_users), n_users non-increasing down the funnel.
    """
    per_user = funnel_user_mins(df, steps, user_col, type_col, ts_col)
    converted = F.col("m1").isNotNull()
    counts = []
    for i in range(1, len(steps) + 1):
        if i > 1:
            converted = converted & F.col(f"m{i}").isNotNull() & (
                F.col(f"m{i}") >= F.col(f"m{i - 1}")
            )
        counts.append(F.sum(converted.cast("bigint")).alias(f"n{i}"))
    row = per_user.agg(*counts)
    # Typed-Column unpivot (ADVICE r5): building the per-step rows as an
    # explode over struct literals keeps step names as data (F.lit), so a
    # name containing an apostrophe can never reach a SQL parser.
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("bigint").alias("step"),
                    F.lit(s).alias("step_name"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i, s in enumerate(steps, start=1)
            ]
        )
    ).alias("r")
    return row.select(rows).select("r.step", "r.step_name", "r.n_users")


def week_index(ts_col: str = "ts") -> F.Column:
    """Epoch-week index (floor(epoch_seconds / 604800)) — integer math
    identical on every engine, no timezone or week-start convention."""
    return F.floor(F.unix_timestamp(F.col(ts_col)) / SECONDS_PER_WEEK).cast("bigint")


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active epoch-week,
    counted at each later week offset — the triangle chart behind every
    retention dashboard.

    Scale shape: distinct (user, week) pairs → user-keyed min for the
    cohort week → join back on ``user_col`` (both sides already hashed on
    it, so the join reuses the aggregation's partitioning) → a small
    (cohort, offset)-keyed count. The distinct collapses event volume to
    at most users × weeks rows before anything else moves; no window
    functions, no global sort.
    """
    weeks = df.select(F.col(user_col), week_index(ts_col).alias("week_idx")).distinct()
    cohort = weeks.groupBy(user_col).agg(F.min("week_idx").alias("cohort_week"))
    return (
        weeks.join(cohort, user_col)
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix between event types: for each
    user's time-ordered event sequence, count (from → to) adjacent pairs
    and row-normalize into transition probabilities — the behavioral
    model behind next-action prediction and anomaly scoring on event
    streams.

    Scale shape: the ``lead()`` window partitions by user (parallel, no
    global sort — each user's events sort within their hash partition);
    the transition matrix is a bounded types²-key aggregation with
    map-side combine, and the row-normalizing window partitions by
    ``from_type`` (bounded cardinality). The exchange after the window
    carries one row per (from, to) pair per partition, never event
    volume. Ordering is tiebroken by the unique event id so the sequence
    — and therefore every count — is deterministic across engines and
    partitionings.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wrow = Window.partitionBy("from_type")
    return counts.withColumn(
        "prob",
        F.round(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wrow), 6
        ),
    )


def top_event_paths(
    df: DataFrame,
    path_len: int = 3,
    top_n: int = 20,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common length-``path_len`` event-type paths WITHIN sessions —
    the sequence-mining extension of :func:`event_transitions` (paths of
    2 are its transition pairs): per user-session, consecutive event
    types joined as "a>b>c", counted corpus-wide, top-N. The report
    behind funnel discovery — which multi-step journeys actually happen,
    rather than the analyst-guessed funnel of q122.

    Scale shape: gap-sessionization and the lead() chain share ONE
    user-keyed sort (Catalyst reuses the exchange: both windows
    partition by user); paths never materialize per-document arrays —
    each event row looks ahead path_len−1 rows inside its partition.
    The path count is a bounded-key aggregation (types^path_len ceiling,
    far fewer in practice) with map-side combine, and top-N plans as
    TakeOrderedAndProject. Ordering ties break on the unique event id,
    so every path — and the final ranking, tie-broken by path string —
    is deterministic across engines.
    """
    from pyspark.sql import Window

    from .windows import sessionize

    sess = sessionize(df, key=user_col, ts=ts_col, gap_seconds=gap_seconds)
    w = Window.partitionBy(user_col, "session_id").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, path_len)
    ]
    path = F.concat_ws(">", *steps)
    complete = steps[-1].isNotNull()
    return (
        sess.select(path.alias("path"), complete.alias("__ok"))
        .where(F.col("__ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(top_n)
    )


def _conversion_touch_pairs(
    df: DataFrame,
    conversion_type: str,
    touch_types: tuple[str, ...],
    lookback_seconds: int,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """(conversion × touch) pairs inside the lookback window — the ONE
    pairing behind :func:`multi_touch_attribution` and
    :func:`attribution_models` (review finding, r10: the join and its
    boundary predicate were duplicated line-for-line; a semantics
    change must land once). User-keyed equi-join, touch STRICTLY before
    the conversion and within ``lookback_seconds``; per-conversion
    fan-out bounded by the user's in-window touches. Emits
    (__u, __cid, __cts[, __cval], channel, __tts)."""
    conv_cols = [
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        F.unix_micros(F.col(ts_col)).alias("__cts"),
    ]
    if value_col is not None:
        conv_cols.append(F.col(value_col).cast("double").alias("__cval"))
    conv = df.where(F.col(type_col) == conversion_type).select(*conv_cols)
    touch = df.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("channel"),
        F.unix_micros(F.col(ts_col)).alias("__tts"),
    )
    return conv.join(touch, "__u").where(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - lookback_seconds * 1_000_000)
    )


def multi_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 86400,
    decay_halflife_s: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch channel attribution: every conversion's credit is
    split across the SAME user's touch events inside the lookback window
    (touch strictly before the conversion, within ``lookback_seconds``),
    then rolled up per channel — the marketing-analytics counterpart of
    q24's single-touch (last-click) as-of attribution. ``decay_halflife_s``
    None → linear (equal split per touch); set → time-decay weights
    0.5^(age/halflife) normalized per conversion (recent touches earn
    more). Conversions with zero in-window touches drop out (their
    credit is unattributable — report them via the count delta against
    q122's funnel, not by inventing a channel).

    Returns (channel, n_touches, credited_conversions, credited_value),
    6 decimals — credited_conversions sums each conversion's fractional
    credit, so the column totals the number of ATTRIBUTED conversions
    exactly.

    Scale shape: the conversions × touches join is user-keyed (both
    sides hash on the user — co-partitioned, no broadcast of event
    volume); fan-out per conversion is bounded by the user's touches
    inside the lookback window; the per-conversion normalization
    windows on the conversion id (bounded groups); the final rollup is
    a channels-cardinality aggregation with map-side combine. Ordering
    never matters: weights are per-row functions of (age, per-conversion
    totals), and the 6-decimal round at the rollup absorbs float
    association noise.
    """
    from pyspark.sql import Window

    j = _conversion_touch_pairs(
        df, conversion_type, touch_types, lookback_seconds,
        user_col, type_col, ts_col, id_col, value_col,
    )
    w = Window.partitionBy("__cid")
    if decay_halflife_s is None:
        credit = F.lit(1.0) / F.count(F.lit(1)).over(w)
    else:
        age_s = (F.col("__cts") - F.col("__tts")) / 1_000_000.0
        weight = F.pow(F.lit(0.5), age_s / F.lit(float(decay_halflife_s)))
        credit = weight / F.sum(weight).over(w)
    return (
        j.withColumn("__credit", credit)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("__credit"), 6).alias("credited_conversions"),
            F.round(F.sum(F.col("__credit") * F.col("__cval")), 6).alias(
                "credited_value"
            ),
        )
    )


def funnel_step_latencies(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert between adjacent funnel steps: for every user who
    reached step i+1 after reaching step i (first-touch timestamps, the
    q122 funnel-ordering rule m_{i+1} ≥ m_i), the latency distribution
    per step pair — the "WHERE does the funnel stall" report that step
    conversion counts alone can't answer. Returns one row per
    transition: (step_from, step_to, n_converted, avg_latency_s,
    min_latency_s, max_latency_s).

    Exactness: latencies are integer µs differences of the per-user
    conditional mins; the average divides an exact integer-µs sum once
    in double. Scale shape: one user-keyed aggregation (the
    funnel_user_mins pass — streamable) then a steps-cardinality rollup;
    nothing beyond the funnel's own exchange.
    """
    mins = funnel_user_mins(df, steps, user_col, type_col, ts_col)
    out = None
    for i in range(1, len(steps)):
        a, b = f"m{i}", f"m{i + 1}"
        lat = F.unix_micros(F.col(b)) - F.unix_micros(F.col(a))
        stage = (
            mins.where(F.col(a).isNotNull() & F.col(b).isNotNull() & (lat >= 0))
            .agg(
                F.lit(steps[i - 1]).alias("step_from"),
                F.lit(steps[i]).alias("step_to"),
                F.count(F.lit(1)).alias("n_converted"),
                (F.sum(lat).cast("double") / (F.count(F.lit(1)) * 1_000_000.0)).alias(
                    "avg_latency_s"
                ),
                (F.min(lat) / 1_000_000).cast("bigint").alias("min_latency_s"),
                (F.max(lat) / 1_000_000).cast("bigint").alias("max_latency_s"),
            )
        )
        out = stage if out is None else out.unionByName(stage)
    return out


def ab_significance(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    salt: str = "ab|",
    z_crit: float = 1.959964,
) -> DataFrame:
    """Two-proportion z-test over a hash-split A/B experiment — the
    significance readout on top of the q135 metrics: variants assigned by
    content hash (``md5(salt || user_id) % 2``, the stable split
    primitive — no assignment table), conversion = full ordered funnel
    (q122's first-touch ``m_{i+1} >= m_i`` rule), then the pooled
    two-proportion z-statistic

        z = (p_b - p_a) / sqrt(p(1-p)(1/n_a + 1/n_b)),  p = (x_a+x_b)/(n_a+n_b)

    with ``significant = |z| > z_crit`` (default 1.959964 ≈ two-sided
    5%). Emitting z rather than a p-value keeps the result exact
    closed-form arithmetic on integer counts — bit-identical across
    engines, no erf approximation to diverge on.

    Scale shape: one user-keyed conditional-min aggregation (the
    streamable funnel pass), one 2-row variant rollup, then scalar
    finalization — the reference's partial→final combine
    (max_aggregation.cpp:70-112) with a hypothesis test as the final
    step. The only wide exchange hashes on ``user_id``.
    """
    from ..functions.hashing import md5_int

    variant = F.when(
        md5_int(F.concat(F.lit(salt), F.col(user_col).cast("string"))) % 2 == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    assigned = df.withColumn("__variant", variant)
    # Per (variant, user): conditional mins, then ordered-conversion flag
    # (funnel_user_mins' aggregation, keyed by variant as well).
    m_aggs = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"m{i}")
        for i, s in enumerate(steps, start=1)
    ]
    per_user = assigned.groupBy("__variant", user_col).agg(*m_aggs)
    conv = F.col("m1").isNotNull()
    for i in range(2, len(steps) + 1):
        conv = conv & F.col(f"m{i}").isNotNull() & (
            F.col(f"m{i}") >= F.col(f"m{i - 1}")
        )
    by_variant = per_user.groupBy("__variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(conv.cast("bigint")).alias("x"),
    )
    one = by_variant.agg(
        F.sum(F.when(F.col("__variant") == "A", F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("__variant") == "A", F.col("x"))).alias("conv_a"),
        F.sum(F.when(F.col("__variant") == "B", F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("__variant") == "B", F.col("x"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = (p_b - p_a) / se
    return one.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > F.lit(z_crit)).alias("significant"),
    )


def rfm_segmentation(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation: per-user
    days-since-last-event, event count, and value sum, each scored into
    ``n_bins`` equi-depth quantile bins, plus the concatenated segment
    label ("444" = most recent / most frequent / highest spend) — the
    classic cohorting operator every event warehouse grows.

    Scored via :func:`~..operators.stats.equi_depth_buckets` (exact
    quantile boundaries from the bounded multi-pass percentile
    machinery, assignment a narrow map), NOT a global ``ntile`` window —
    ntile's global sort is a data-carrying single partition over every
    user, exactly the plan shape the engine forbids at 100 TB; the
    equi-depth path computes the same discrete-quantile cutoffs with
    driver-side state bounded at the histogram. Recency is scored on
    NEGATED staleness so a HIGHER score is better on all three axes
    (boundary ties collapse to the smaller bin on identical sides in
    both engines: scores are deterministic).

    Scale shape: one user-keyed aggregation, then three bounded
    percentile passes over the per-user frame (n_users rows, already
    aggregated) and a narrow scoring map. Reference parity: the
    partial→final aggregation (max_aggregation.cpp:70-112) feeding a
    per-key classification.
    """
    from .stats import equi_depth_buckets

    # Monetary sums micro-quantized integers (the corr_matrix/winsorized
    # convention): a plain double sum is partial-order-sensitive, and the
    # quantile boundary comparisons downstream must be bit-deterministic.
    agg = df.groupBy(user_col).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        (
            F.sum(
                F.round(F.col(value_col).cast("double") * 1_000_000).cast("bigint")
            )
            / 1_000_000.0
        ).alias("monetary"),
    )
    # Corpus "now" anchor: a broadcast 1-row max over the per-user frame
    # (scalar partial→final), not an unpartitioned window (which would
    # plan a data-carrying single partition over every user).
    anchor = agg.agg(F.max("__last").alias("__now"))
    per_user = (
        agg.crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.floor(
                (F.unix_micros(F.col("__now")) - F.unix_micros(F.col("__last")))
                / (86400 * 1_000_000)
            ).cast("bigint"),
        )
        .withColumn("__neg_rec", -F.col("recency_days").cast("double"))
    )
    scored = equi_depth_buckets(per_user, "__neg_rec", n_bins, bucket_col="r_score")
    scored = equi_depth_buckets(scored, "frequency", n_bins, bucket_col="f_score")
    scored = equi_depth_buckets(scored, "monetary", n_bins, bucket_col="m_score")
    return scored.select(
        user_col, "recency_days", "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score", "f_score", "m_score",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


def windowed_funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_seconds: int = 86400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-constrained funnel: step i+1 counts only if it happens
    within ``within_seconds`` AFTER the user's step-i anchor — the
    "converted within 24h" report. q122's first-touch funnel is the
    unbounded limit; the windowed variant is what campaign and checkout
    analyses actually ask, and it is NOT derivable from the
    unconditioned per-step minima (a user can click days after the
    anchoring view yet re-view later: earliest-chain semantics need the
    constraint applied at each hop).

    Anchors greedily: step 1's anchor is the user's earliest step-1
    event; step i+1's anchor is the EARLIEST step-i+1 event inside
    ``(anchor_i, anchor_i + within]``. Greedy-earliest maximizes
    conversion under a fixed per-hop window (any later qualifying
    anchor only shrinks the next hop's room — earliest anchoring
    dominates), so the count is well-defined, not heuristic.

    Scale shape: one conditional-min aggregation per hop, each keyed on
    ``user_col`` — K−1 user-keyed passes over the (user, step-type)
    slice of events, every exchange on the same key so Catalyst reuses
    the partitioning; no per-event sequential scan, no window over
    event volume. Output one row per step: (step, step_name, n_users),
    non-increasing.
    """
    ep = F.unix_micros(F.col(ts_col))
    within_us = int(within_seconds) * 1_000_000
    by_type = {
        s: df.where(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), ep.alias("__e")
        )
        for s in steps
    }
    anchors = by_type[steps[0]].groupBy("__u").agg(F.min("__e").alias("__a"))
    counts = [anchors.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(1).cast("bigint").alias("step"),
        F.lit(steps[0]).alias("step_name"),
        F.col("n").alias("n_users"),
    )]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            by_type[s]
            .join(anchors, "__u")
            .where(
                (F.col("__e") > F.col("__a"))
                & (F.col("__e") <= F.col("__a") + within_us)
            )
            .groupBy("__u")
            .agg(F.min("__e").alias("__a"))
        )
        anchors = nxt
        counts.append(
            anchors.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(i).cast("bigint").alias("step"),
                F.lit(s).alias("step_name"),
                F.col("n").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def activity_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (q126's duplicate-span machinery applied
    to engagement): distinct active days per user, islands identified
    by ``epoch_day − row_number`` (constant within a consecutive run),
    then per-user longest/current streak and totals. The
    retention-adjacent metric cohort tables can't express (cohorts see
    WHICH week a user returns, streaks see how continuously).

    Days are UTC epoch days (``unix_date`` on the µs-pinned timestamp —
    timezone-free integer arithmetic, the q148 lesson). Scale shape:
    the distinct collapses event volume to user-days first; the
    row_number window partitions by user (bounded by active days per
    user); two user-keyed aggregations end the plan — every exchange
    hashes on the user. Returns (user, n_active_days, n_streaks,
    longest_streak, current_streak) where ``current_streak`` is the
    streak touching the user's LAST active day.
    """
    from pyspark.sql import Window

    # floor(epoch_us / day_us), NOT to_date(ts): to_date renders in the
    # SESSION timezone, shifting day boundaries under a non-UTC session
    # (the q148 class of bug the hostile-TZ sweep exists to catch)
    days = df.select(
        F.col(user_col),
        F.floor(F.unix_micros(F.col(ts_col)) / 86_400_000_000).cast("bigint").alias(
            "__day"
        ),
    ).distinct()
    w = Window.partitionBy(user_col).orderBy(F.col("__day").asc())
    islands = days.withColumn(
        "__isl", F.col("__day") - F.row_number().over(w)
    )
    runs = islands.groupBy(user_col, "__isl").agg(
        F.count(F.lit(1)).alias("__len"), F.max("__day").alias("__end")
    )
    return runs.groupBy(user_col).agg(
        F.sum("__len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("__len").alias("longest_streak"),
        F.max_by("__len", F.col("__end")).alias("current_streak"),
    )


def bot_detection(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    burst_window_s: int = 60,
    max_burst: int = 30,
    min_events: int = 20,
    max_gap_cv: float = 0.1,
) -> DataFrame:
    """Behavioral bot screen over event timing — the traffic-cleaning
    gate a training pipeline runs before user events feed analytics or
    models: per user, inter-event gap statistics (mean and coefficient
    of variation over integer-µs gaps) and the maximum burst (events in
    any trailing ``burst_window_s``), flagging metronomic timing
    (cv below ``max_gap_cv`` with enough events — humans jitter,
    schedulers don't) and super-human burst rates. Gap variance uses
    the exact integer cancellation n·Σg² − (Σg)² in DECIMAL(38,0)
    (the corr_matrix recipe — µs gaps square past 2^53 fast).

    Scale shape: one (user, time)-ordered lag window and one
    range-frame count share the user-keyed exchange; then a user-keyed
    aggregation. Nothing global. Returns flagged users only:
    (user, n_events, mean_gap_s, gap_cv, max_burst, reasons) with the
    fixed-order reasons contract of filter_report.
    """
    from pyspark.sql import Window

    ep = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ep.asc(), F.col(id_col).asc())
    wr = (
        Window.partitionBy(user_col)
        .orderBy(ep.asc())
        .rangeBetween(-(burst_window_s * 1_000_000 - 1), 0)
    )
    dec = "decimal(38,0)"
    base = df.select(
        F.col(user_col),
        (ep - F.lag(ep).over(w)).alias("__gap"),
        F.count(F.lit(1)).over(wr).alias("__burst"),
    )
    per_user = base.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap").alias("__ng"),
        F.sum(F.col("__gap").cast(dec)).alias("__sg"),
        F.sum((F.col("__gap").cast(dec) * F.col("__gap").cast(dec))).alias("__sgg"),
        F.max("__burst").alias("max_burst"),
    )
    n = F.col("__ng")
    mean_us = F.col("__sg").cast("double") / n
    # exact integer cancellation, then one double division
    var_us2 = F.when(
        n >= 2,
        (n.cast(dec) * F.col("__sgg") - F.col("__sg") * F.col("__sg")).cast("double")
        / (n * (n - 1)).cast("double"),
    )
    cv = F.when(
        (n >= 2) & (mean_us > 0), F.round(F.sqrt(var_us2) / mean_us, 6)
    )
    stats = per_user.select(
        user_col, "n_events", "max_burst",
        F.round(mean_us / 1_000_000.0, 6).alias("mean_gap_s"),
        cv.alias("gap_cv"),
    )
    reasons = F.array_compact(
        F.array(
            F.when(
                (F.col("n_events") >= min_events)
                & F.col("gap_cv").isNotNull()
                & (F.col("gap_cv") < max_gap_cv),
                F.lit("metronomic"),
            ),
            F.when(F.col("max_burst") > max_burst, F.lit("burst_rate")),
        )
    )
    return (
        stats.withColumn("reasons", F.array_join(reasons, ","))
        .where(F.col("reasons") != "")
        .select(
            user_col, "n_events", "mean_gap_s", "gap_cv", "max_burst", "reasons"
        )
    )


def inter_event_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-key inter-event gap distribution — the cadence profile
    (how often does this user/device/sensor act) that feeds
    :func:`bot_detection`'s heuristics as a reusable feature frame:
    per key, the count, exact mean, min/max, and exact discrete median
    of consecutive-event gaps in seconds.

    Gaps come from ONE key-partitioned lag over event timestamps —
    the gap MULTISET of a sorted timestamp multiset is order-unique,
    so ties need no tiebreak for the emitted values. The mean is an
    exact integer-µs sum into one IEEE division (the funnel-latency
    recipe); the median is the per-key discrete order statistic
    (:func:`~.windows._disc_median_per_key` — bounded by a key's own
    event count). Keys with fewer than 2 events emit nothing (no
    gaps exist). Every exchange hashes on the key. Returns
    (key, n_events, n_gaps, mean_gap_s, min_gap_s, max_gap_s,
    median_gap_s), seconds as 6-decimal doubles.
    """
    from pyspark.sql import Window

    from .windows import _disc_median_per_key

    e = F.unix_micros(F.col(ts))
    w = Window.partitionBy(key).orderBy(F.col("__e").asc())
    from ..plans.inspect import tracked_persist

    # two consumers (the moment aggregate and the median rank window)
    # read the gap frame — persist it so the per-key sort+lag pass runs
    # once, not twice (review finding, r10); tracked_persist → callers
    # release via plans.inspect.release_intermediates()
    gaps = tracked_persist(
        df.select(F.col(key), e.alias("__e"))
        .withColumn("__gap_us", F.col("__e") - F.lag("__e").over(w))
        .where(F.col("__gap_us").isNotNull())
    )
    agg = gaps.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__gap_us").alias("__sum_us"),
        F.min("__gap_us").alias("__min_us"),
        F.max("__gap_us").alias("__max_us"),
    )
    med = _disc_median_per_key(gaps, key, "__gap_us", "__med_us")
    s = F.lit(1_000_000.0)
    return (
        agg.join(med, key)
        .select(
            key,
            (F.col("n_gaps") + 1).alias("n_events"),
            "n_gaps",
            F.round(F.col("__sum_us").cast("double") / F.col("n_gaps") / s, 6).alias(
                "mean_gap_s"
            ),
            F.round(F.col("__min_us").cast("double") / s, 6).alias("min_gap_s"),
            F.round(F.col("__max_us").cast("double") / s, 6).alias("max_gap_s"),
            F.round(F.col("__med_us").cast("double") / s, 6).alias("median_gap_s"),
        )
    )


def attribution_models(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 86400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch, last-touch, and linear attribution side by side —
    the model-comparison table a marketing/conversion analysis reads
    before committing to ONE model (:func:`multi_touch_attribution`
    computes the linear/decay credit in value terms; this compares the
    MODELS' conversion counts per channel: a channel that wins
    first-touch but loses last-touch is a discovery channel, the
    reverse a closer).

    Same conversion×touch pairing as multi_touch_attribution (user-keyed
    equi-join bounded by the lookback window); the first/last picks are
    ONE per-conversion window ordering touches by (time, channel, —
    deterministic under same-timestamp touches), and all three models
    aggregate from the same joined frame in one pass. Conversions with
    zero in-window touches drop (unattributable). Returns
    (channel, n_touches, first_touch_conversions, last_touch_conversions,
    linear_conversions), linear 6 decimals — each conversions column
    totals the attributed-conversion count exactly.
    """
    from pyspark.sql import Window

    j = _conversion_touch_pairs(
        df, conversion_type, touch_types, lookback_seconds,
        user_col, type_col, ts_col, id_col,
    )
    w = Window.partitionBy("__cid")
    wo = w.orderBy(F.col("__tts").asc(), F.col("channel").asc())
    wd = w.orderBy(F.col("__tts").desc(), F.col("channel").desc())
    scored = j.select(
        "channel",
        (F.row_number().over(wo) == 1).cast("int").alias("__first"),
        (F.row_number().over(wd) == 1).cast("int").alias("__last"),
        (F.lit(1.0) / F.count(F.lit(1)).over(w)).alias("__linear"),
    )
    return scored.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("__first").cast("bigint").alias("first_touch_conversions"),
        F.sum("__last").cast("bigint").alias("last_touch_conversions"),
        F.round(F.sum("__linear"), 6).alias("linear_conversions"),
    )


def weekly_churn(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Week-over-week churn/retention/new-user counts — the engagement
    delta report next to :func:`retention_cohorts`' triangle (cohorts
    answer "how do users age"; this answers "what happened THIS week"):
    for every epoch-week w with activity in w or w−1, how many users
    were retained (active both), new (active w, not w−1), and churned
    (active w−1, not w).

    Scale shape: events collapse to distinct (user, week) FIRST (at
    most users × weeks rows move anywhere), then one user-keyed
    full-outer self-join of week w against week w+1 classifies every
    (user, week-boundary) into exactly one bucket, and a week-keyed
    count finishes. Integer epoch-week indexes (:func:`week_index`) —
    no timezone or week-start convention to diverge on. Returns
    (week_idx, n_active, n_retained, n_new, n_churned_from_prev);
    n_active = n_retained + n_new, and the week AFTER the last active
    week appears with n_active = 0 carrying the final churn.
    """
    weeks = df.select(
        F.col(user_col).alias("__u"), week_index(ts_col).alias("__w")
    ).distinct()
    nxt = weeks.select(F.col("__u"), (F.col("__w") + 1).alias("__w2"))
    j = weeks.join(
        nxt,
        (weeks["__u"] == nxt["__u"]) & (weeks["__w"] == nxt["__w2"]),
        "full",
    ).select(
        F.coalesce(weeks["__w"], nxt["__w2"]).alias("week_idx"),
        weeks["__w"].isNotNull().alias("__active"),
        nxt["__w2"].isNotNull().alias("__prev_active"),
    )
    return j.groupBy("week_idx").agg(
        F.sum(F.col("__active").cast("int")).cast("bigint").alias("n_active"),
        F.sum((F.col("__active") & F.col("__prev_active")).cast("int"))
        .cast("bigint")
        .alias("n_retained"),
        F.sum((F.col("__active") & ~F.col("__prev_active")).cast("int"))
        .cast("bigint")
        .alias("n_new"),
        F.sum((~F.col("__active") & F.col("__prev_active")).cast("int"))
        .cast("bigint")
        .alias("n_churned_from_prev"),
    )


def active_user_rollup(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 30,
) -> DataFrame:
    """DAU/WAU/MAU per day — the engagement headline every event store
    reports: for each epoch-day in the data's span, distinct users
    active that day, in the trailing ``wau_days``, and in the trailing
    ``mau_days``. Rolling DISTINCT is not window-able (a distinct count
    cannot subtract departures), so the standard shape is contribution
    explosion: each distinct (user, day) pair contributes to the ≤
    ``mau_days`` target days it keeps the user active for.

    Scale shape: events collapse to distinct (user, day) FIRST (the
    :func:`retention_cohorts` discipline — at most users × days rows
    move anywhere); each pair then explodes ×wau_days and ×mau_days
    into (target_day, user) pairs whose distinct-count is one
    day-keyed aggregation — bounded fan-out of the ALREADY-collapsed
    frame, never of event volume. Days inside the span with zero
    activity still report (grid = the full min..max day sequence, a
    per-corpus-small frame); integer epoch-day arithmetic throughout
    (timezone-immune). Returns (day_epoch, dau, wau, mau) with
    day_epoch = floor(epoch_seconds/86400)·86400.
    """
    day = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000))
    pairs = df.select(F.col(user_col).alias("__u"), day.alias("__d")).distinct()
    dau = pairs.groupBy(F.col("__d").alias("__td")).agg(
        F.count_distinct("__u").alias("dau")
    )

    def rolling(days_back: int, name: str) -> DataFrame:
        contrib = pairs.select(
            "__u",
            F.explode(
                F.sequence(F.col("__d"), F.col("__d") + days_back - 1)
            ).alias("__td"),
        ).distinct()
        return contrib.groupBy("__td").agg(F.count_distinct("__u").alias(name))

    wau = rolling(int(wau_days), "wau")
    mau = rolling(int(mau_days), "mau")
    span = pairs.agg(F.min("__d").alias("__lo"), F.max("__d").alias("__hi"))
    grid = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__td")
    )
    return (
        grid.join(dau, "__td", "left")
        .join(wau, "__td", "left")
        .join(mau, "__td", "left")
        .select(
            (F.col("__td") * 86400).alias("day_epoch"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
            F.coalesce("mau", F.lit(0)).alias("mau"),
        )
    )


def max_concurrency(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak concurrent intervals per key via the classic sweep line:
    +1 at each interval start, −1 at each end, running-sum the
    endpoints in time order — the "how many sessions/jobs/streams were
    open at once" capacity statistic that interval-union coverage
    (q227) and gaps (q251) don't give. Half-open ``[start, end)``
    semantics: an interval ending exactly when another starts does NOT
    overlap it, enforced by ordering −1 deltas before +1 at equal
    timestamps. Empty intervals (end ≤ start) drop.

    Shape: the endpoint frame is 2 rows per interval, the running sum
    is ONE per-key ordered window (state bounded by per-key volume —
    use a real key, not a constant), and the per-key max, its
    first-reached timestamp, AND the interval count all come from one
    aggregation over the SAME exchange (n_intervals = the +1 endpoint
    count — a separate count-join would re-scan the input, review
    finding r11). Within a tie group of identical (t, +1) rows the
    intermediate running values depend on row order, but the MAX and
    the argmin timestamp are order-free (the max at t is the value
    after the whole tie group).
    Returns (key, n_intervals, max_concurrent, t_at_max_us) with the
    timestamp in integer epoch µs (session-timezone-immune).
    """
    from pyspark.sql import Window

    iv = df.where(F.col(end_col) > F.col(start_col))
    s = iv.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(start_col)).alias("__t"),
        F.lit(1).alias("__d"),
    )
    e = iv.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(end_col)).alias("__t"),
        F.lit(-1).alias("__d"),
    )
    pts = s.unionAll(e)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("__k", "__t", "__d", F.sum("__d").over(w).alias("__run"))
    wk = Window.partitionBy("__k")
    peaked = run.select(
        "__k", "__t", "__d", "__run", F.max("__run").over(wk).alias("__mx")
    )
    return (
        peaked.groupBy(F.col("__k").alias(key))
        .agg(
            F.sum((F.col("__d") == 1).cast("bigint")).alias("n_intervals"),
            F.max("__run").alias("max_concurrent"),
            F.min(
                F.when(F.col("__run") == F.col("__mx"), F.col("__t"))
            ).alias("t_at_max_us"),
        )
        .select(key, "n_intervals", "max_concurrent", "t_at_max_us")
    )


def _markov_core(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    n_iter: int,
    max_states: int,
    caller: str,
):
    """Shared Markov machinery for :func:`markov_stationary` and
    :func:`entropy_rate` — ONE pairing implementation (review finding,
    r12: a fix to the pairing convention must never land in only one
    place). Builds the bounded transition matrix from
    :func:`event_transitions` (NULL types excluded BEFORE pairing — a
    NULL is not a state), completes terminal states with absorbing
    self-loops, and runs the integer-picoprobability power iteration
    (π'ⱼ = Σᵢ floor(πᵢ·pᵢⱼ + 0.5), so every engine sums identical
    integers). Returns (states, totals, p, pi, scale)."""
    import math

    pool = df.where(F.col(type_col).isNotNull())
    counts = event_transitions(
        pool, user_col=user_col, type_col=type_col, ts_col=ts_col,
        id_col=id_col,
    ).select(
        F.col("from_type").alias("__f"),
        F.col("to_type").alias("__t"),
        F.col("n_transitions").cast("bigint").alias("__n"),
    )
    states_df = pool.select(F.col(type_col).alias("__s")).distinct()
    # limit(max+1): enough to detect overflow without ever collecting an
    # unbounded state list
    states = sorted(
        r["__s"] for r in states_df.limit(max_states + 1).collect()
    )
    if len(states) > max_states:
        raise ValueError(
            f"{caller}: {len(states)} states, over "
            f"max_states={max_states}; the transition matrix is collected "
            "driver-side - raise max_states explicitly if this is intended"
        )
    trans = counts.collect()  # bounded: ≤ states² rows
    totals: dict = {}
    for r in trans:
        totals[r["__f"]] = totals.get(r["__f"], 0) + int(r["__n"])
    # full matrix incl. absorbing self-loops: p = n/T (exact ints → one
    # IEEE division, identical on any engine)
    p: dict = {}
    for r in trans:
        p[(r["__f"], r["__t"])] = int(r["__n"]) / totals[r["__f"]]
    for s in states:
        if s not in totals:
            p[(s, s)] = 1.0
    scale = 1_000_000_000_000
    pi = {s: int(math.floor(scale / len(states) + 0.5)) for s in states}
    for _ in range(int(n_iter)):
        nxt = {s: 0 for s in states}
        for (i, j), pij in p.items():
            if pi.get(i, 0):
                nxt[j] += int(math.floor(pi[i] * pij + 0.5))
        pi = nxt
    return states, totals, p, pi, scale


def markov_stationary(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_iter: int = 8,
    max_states: int = 64,
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain — the long-run "where does a user's attention settle" readout
    on top of :func:`event_transitions`' one-step matrix (which it
    reuses verbatim: per-user time-ordered ``lead`` pairs, tiebroken by
    the unique event id; NULL types are excluded before pairing — a
    NULL is not a state). States that never transition OUT (a type that
    only ever ends sequences) become self-loops (p = 1, the standard
    absorbing completion), so probability mass is conserved exactly.

    Exactness across engines: the power iteration runs on INTEGER
    picoprobabilities — π₀ = round_half_up(10¹²/s) per state, each step
    π'ⱼ = Σᵢ floor(πᵢ·pᵢⱼ + 0.5) with pᵢⱼ = nᵢⱼ/Tᵢ the exact-integer
    ratio in double — so every engine sums the SAME integers in any
    order (the quantized-term convention; float Σ would be
    order-dependent). The chain is bounded (``max_states``, asserted),
    so the iteration is driver-side control flow over ≤ s² collected
    rows — the :func:`~.stats.mann_whitney_u` bounded-collect
    convention, NOT a data-volume collect; event volume only flows
    through the user-keyed lead window and the (from, to) count
    aggregation. A reducible chain simply reports the mass the
    iteration reaches in ``n_iter`` steps (documented, not hidden).
    Returns one row per state: (state, n_out, stationary_prob).
    """
    states, totals, p, pi, scale = _markov_core(
        df, user_col, type_col, ts_col, id_col, n_iter, max_states,
        caller="markov_stationary",
    )
    # no rounding: both engines hold the IDENTICAL integer π, so the one
    # division by 10¹² yields identical doubles (a round() here would be
    # the banker's-rounding bug class _round6_half_away exists for)
    rows = [
        (s, int(totals.get(s, 0)), pi.get(s, 0) / scale) for s in states
    ]
    # the state column keeps the INPUT type (an int event-code column
    # must not crash the pinned schema — review finding, r12)
    state_type = df.schema[type_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        rows, f"state {state_type}, n_out bigint, stationary_prob double"
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cohort lifetime-value curve: users cohort by their FIRST active
    epoch-week (:func:`week_index` — pure integer math, no week-start
    convention), and each (cohort, age) cell reports the active-user
    count plus the cohort's CUMULATIVE value per original member — the
    revenue/engagement companion to :func:`retention_cohorts` (which
    counts presence only; two cohorts with equal retention routinely
    separate on LTV).

    Exactness: values micro-quantize once (NULL value = zero
    contribution but still activity; a NULL user is excluded entirely —
    not a member, documented), per-cell sums accumulate in
    DECIMAL(38,0), and the running cumulative is a cohort-partitioned
    window over the BOUNDED age axis (weeks, never event volume) —
    cells exist only at ages with ≥1 active user, and the cumulative
    is exact at every emitted cell. One user-keyed first-week
    aggregation + one (cohort, age) aggregation: the only wide
    exchanges hash on user and cohort keys. Returns
    (cohort_week, age_weeks, n_active, cohort_size, cum_value,
    ltv_per_user).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    # a NULL user is not a cohort member: an equi-join would silently
    # drop its activity while the size count kept it (review finding,
    # r12) — exclude it from BOTH sides up front, documented
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        week_index(ts_col).alias("__w"),
        F.coalesce(
            F.when(~F.isnan(v), F.round(v * 1_000_000)).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("__vq"),
    )
    first = base.groupBy("__u").agg(F.min("__w").alias("__cw"))
    sizes = first.groupBy("__cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    # sums accumulate in DECIMAL(38,0) — a large cohort's micro-unit
    # mass can pass 2^63 and bigint SUM would wrap silently (review
    # finding, r12; the bootstrap/dispersion convention)
    cells = (
        base.join(first, "__u")
        .groupBy("__cw", (F.col("__w") - F.col("__cw")).alias("__age"))
        .agg(
            F.countDistinct("__u").cast("bigint").alias("n_active"),
            F.sum(F.col("__vq").cast("decimal(38,0)")).alias("__wsum"),
        )
    )
    wcum = (
        Window.partitionBy("__cw")
        .orderBy(F.col("__age").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = cells.withColumn("__cum", F.sum("__wsum").over(wcum)).join(
        sizes, "__cw"
    )
    return out.select(
        F.col("__cw").alias("cohort_week"),
        F.col("__age").alias("age_weeks"),
        "n_active",
        "cohort_size",
        F.round(F.col("__cum").cast("double") / 1_000_000, 6).alias("cum_value"),
        F.round(
            F.col("__cum").cast("double") / 1_000_000 / F.col("cohort_size"), 6
        ).alias("ltv_per_user"),
    )


def concurrency_profile(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Time-weighted concurrency profile per key — the Little's-law
    readout beside :func:`max_concurrency`'s peak: total busy mass
    Σ(end−start), covered (union) time, observation span, the
    time-AVERAGED concurrency busy/span (= arrival rate × mean
    duration — the L = λW identity a capacity plan checks), the duty
    cycle covered/span, and the mean concurrency while active
    busy/covered. Peak says "provision for this"; the averages say
    "how far from peak you usually run".

    ONE endpoint sweep serves every statistic: ±1 endpoints (half-open
    [s, e) — the max_concurrency ordering, −1 before +1 at equal
    timestamps), one per-key (t, delta)-ordered window yields both the
    running count and the gap to the next endpoint, covered time sums
    the gaps where the running count is positive, and busy mass is
    Σ(−delta·t) — the endpoint identity Σe − Σs, so the interval frame
    is never re-scanned. Tie groups are order-free for every output:
    zero-width gaps contribute nothing, and the group-final running
    sum is order-independent (the max_concurrency argument). Empty
    intervals (end ≤ start) drop; all times integer epoch µs
    (session-timezone-immune). Returns
    (key, n_intervals, span_us, busy_us, covered_us, peak_concurrent,
    mean_concurrency, utilization, mean_active_concurrency),
    6-decimal ratios.
    """
    from pyspark.sql import Window

    iv = df.where(F.col(end_col) > F.col(start_col))
    s = iv.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(start_col)).alias("__t"),
        F.lit(1).alias("__d"),
    )
    e = iv.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(end_col)).alias("__t"),
        F.lit(-1).alias("__d"),
    )
    pts = s.unionAll(e)
    ordering = [F.col("__t").asc(), F.col("__d").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("__k").orderBy(*ordering)
    run = pts.select(
        "__k",
        "__t",
        "__d",
        F.sum("__d").over(w).alias("__run"),
        F.lead("__t").over(wl).alias("__nt"),
    )
    agg = run.groupBy(F.col("__k").alias(key)).agg(
        F.sum((F.col("__d") == 1).cast("bigint")).alias("n_intervals"),
        (F.max("__t") - F.min("__t")).cast("bigint").alias("span_us"),
        # ±epoch_µs terms are ~1.7e15 each: a bigint partial sum wraps
        # past ~5k endpoints per key — DECIMAL(38,0) accumulation (the
        # soft_dedup/cohort_ltv micro-unit-mass convention); the
        # telescoped Σ(e−s) result always fits bigint
        F.sum((-F.col("__d") * F.col("__t")).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("busy_us"),
        F.coalesce(
            F.sum(
                F.when(F.col("__run") > 0, F.col("__nt") - F.col("__t"))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("covered_us"),
        F.max("__run").cast("bigint").alias("peak_concurrent"),
    )
    return agg.select(
        key,
        "n_intervals",
        "span_us",
        "busy_us",
        "covered_us",
        "peak_concurrent",
        F.round(F.col("busy_us").cast("double") / F.col("span_us"), 6).alias(
            "mean_concurrency"
        ),
        F.round(F.col("covered_us").cast("double") / F.col("span_us"), 6).alias(
            "utilization"
        ),
        F.round(F.col("busy_us").cast("double") / F.col("covered_us"), 6).alias(
            "mean_active_concurrency"
        ),
    )


def cooccurrence_lift(
    df: DataFrame,
    scope_col: str,
    type_col: str,
    min_both: int = 1,
) -> DataFrame:
    """Market-basket co-occurrence report over event types: for every
    observed pair of types, the scopes (users/sessions) containing
    both, the support, the LIFT P(A∩B)/(P(A)·P(B)), and the Jaccard
    overlap — the "which behaviors travel together" readout behind
    :func:`event_transitions` (which sees ORDER within a stream; this
    sees set-level association across scopes) and the categorical
    sibling of :func:`~.stats.chi2_independence` (one number for the
    whole table; this names the pairs).

    Shape: the corpus collapses to the DISTINCT (scope, type) frame
    FIRST (one map-side-combined dedup — event volume never joins);
    the pair frame is a self-equi-join on the scope key, bounded per
    scope by the type cardinality squared, never scope². Lift and
    Jaccard are fixed-order doubles over exact integer supports
    (n_both·N / (n_a·n_b) — the integer products stay within bigint
    to 3·10⁹ scopes). NULL scopes/types are excluded (the family
    convention); pairs are emitted once as (type_a < type_b). Returns
    (type_a, type_b, n_scopes, n_a, n_b, n_both, support, lift,
    jaccard), 6-decimal, cut at ``min_both`` co-occurrences.
    """
    sc = F.col(scope_col)
    tc = F.col(type_col)
    pool = (
        df.where(sc.isNotNull() & tc.isNotNull())
        .select(sc.alias("__s"), tc.alias("__t"))
        .distinct()
    )
    n_scopes = pool.agg(F.countDistinct("__s").cast("bigint").alias("__n"))
    per_type = pool.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    a = pool.select(F.col("__s"), F.col("__t").alias("__ta"))
    b = pool.select(F.col("__s"), F.col("__t").alias("__tb"))
    both = (
        a.join(b, "__s")
        .where(F.col("__ta") < F.col("__tb"))
        .groupBy("__ta", "__tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= int(min_both))
    )
    ca = per_type.select(F.col("__t").alias("__ta"), F.col("__c").alias("n_a"))
    cb = per_type.select(F.col("__t").alias("__tb"), F.col("__c").alias("n_b"))
    j = (
        both.join(ca, "__ta")
        .join(cb, "__tb")
        .crossJoin(F.broadcast(n_scopes))
    )
    return j.select(
        F.col("__ta").alias("type_a"),
        F.col("__tb").alias("type_b"),
        F.col("__n").alias("n_scopes"),
        "n_a",
        "n_b",
        "n_both",
        F.round(F.col("n_both").cast("double") / F.col("__n"), 6).alias(
            "support"
        ),
        F.round(
            F.col("n_both").cast("double") * F.col("__n")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("lift"),
        F.round(
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
            6,
        ).alias("jaccard"),
    )


def entropy_rate(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_iter: int = 8,
    max_states: int = 64,
    term_scale: int = 1_000_000,
) -> DataFrame:
    """Entropy rate of the first-order event-type Markov chain —
    H = −Σᵢ πᵢ Σⱼ pᵢⱼ log₂ pᵢⱼ, "how many bits does the NEXT action
    carry once you know the current one": the sequence-predictability
    readout on top of :func:`markov_stationary` (long-run occupancy)
    and :func:`event_transitions` (the matrix itself). A bot replaying
    one loop scores near 0; organic browsing scores near the uniform
    bound log₂(s). Both the π iteration and the matrix come from the
    SHARED :func:`_markov_core` (one pairing implementation — NULL
    types excluded before pairing, absorbing self-loop completion, the
    integer-picoprobability power iteration).

    Exactness: per-state conditional entropies quantize as
    hᵢ = −Σⱼ round_half_away(pᵢⱼ·log₂(pᵢⱼ)·10⁶) over the exact-integer
    ratios pᵢⱼ = nᵢⱼ/Tᵢ (absorbing p = 1 rows contribute exactly 0);
    the rate is the EXACT integer dot product Σ πᵢ_pico·hᵢ_micro
    (arbitrary-precision driver-side, HUGEINT in the oracle) divided
    once by 10¹²·10⁶. The whole computation is bounded by the state
    cardinality (``max_states``, loud guard) — event volume only flows
    through the shared lead window and the (from, to) count. One row:
    (n_states, n_transitions, entropy_rate_bits, max_entropy_bits,
    normalized_entropy); a 1-state chain reports rate 0 with NULL
    normalization (log₂ 1 = 0). PERIODIC chains inherit
    :func:`markov_stationary`'s documented ``n_iter`` behavior: raw
    power iteration oscillates instead of converging, so π is the
    n_iter-step occupancy, not the cycle-averaged limit (real event
    streams have self-loops and are aperiodic; the pin uses one).
    """
    import math

    states, totals, p, pi, scale = _markov_core(
        df, user_col, type_col, ts_col, id_col, n_iter, max_states,
        caller="entropy_rate",
    )
    if not states:
        # Zero states (empty frame or all-NULL event types): the chain
        # has no occupancy, so the rate is undefined — emit the typed
        # zero/NULL row the theil_u empty-pool convention uses instead
        # of letting log₂(0) raise (ADVICE r14).
        return df.sparkSession.createDataFrame(
            [(0, 0, None, None, None)],
            "n_states bigint, n_transitions bigint, entropy_rate_bits "
            "double, max_entropy_bits double, normalized_entropy double",
        )
    # hᵢ in NEGATED micro-bits: −Σⱼ round_half_away(p·log₂p·10⁶) —
    # p·log₂p ≤ 0, so the half-away round matches the oracle's round()
    h_micro: dict = {}
    for (i, _j), pij in p.items():
        if pij > 0:
            x = pij * math.log2(pij) * term_scale
            q = int(math.copysign(math.floor(abs(x) + 0.5), x))
            h_micro[i] = h_micro.get(i, 0) - q
    acc = 0
    for s in states:
        acc += pi.get(s, 0) * h_micro.get(s, 0)  # exact big-int product
    rate = acc / scale / term_scale
    n_states = len(states)
    max_bits = math.log2(n_states)
    from .stats import _round6_half_away as _rnd

    return df.sparkSession.createDataFrame(
        [(
            n_states,
            int(sum(totals.values())),
            _rnd(rate),
            _rnd(max_bits),
            _rnd(rate / max_bits) if max_bits > 0 else None,
        )],
        "n_states bigint, n_transitions bigint, entropy_rate_bits double, "
        "max_entropy_bits double, normalized_entropy double",
    )


def retention_halflife(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention half-life per weekly cohort — fit ln(active fraction)
    against cohort age by least squares and convert the decay slope to
    "weeks until half the cohort stops showing up": the ONE number a
    growth dashboard wants from :func:`retention_cohorts`' triangle
    (which this rides verbatim — same distinct (user, week) collapse,
    same epoch-week indexing, no new pass over event volume).

    Exactness: the active fraction at age a is the exact integer ratio
    n_active(a)/cohort_size (cohort_size = the age-0 count, present by
    construction); fit points quantize as (a,
    round_half_away(ln(frac)·10⁶)) — ages ≥ 1 only, the a = 0 point is
    identically ln 1 = 0 and would just anchor the intercept; the OLS
    slope is exact integer cross-moments divided ONCE; half-life =
    −ln 2/slope with the ln 2 literal pinned (0.6931471805599453) so
    both engines divide identical doubles. Cohorts with < 2 usable
    ages or a non-negative slope emit NULL half-life (a cohort that
    grows has no decay to halve). Output one row per cohort:
    (cohort_week, cohort_size, n_ages, slope, half_life_weeks).
    """
    _LN2 = 0.6931471805599453  # float(ln 2), pinned as a literal

    tri = retention_cohorts(df, user_col=user_col, ts_col=ts_col)
    base = tri.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("__size")
    )
    pts = (
        tri.where(F.col("week_offset") >= 1)
        .join(base, "cohort_week")
        .select(
            "cohort_week",
            "__size",
            F.col("week_offset").cast("bigint").alias("__x"),
            # ln(exact integer ratio), micro-quantized half-up — ratios
            # are < 1 so ln < 0 and Spark's HALF_UP round() on the
            # NEGATED... use the sign-symmetric floor recipe instead
            (
                -F.floor(
                    -F.log(
                        F.col("n_users").cast("double") / F.col("__size")
                    ) * 1_000_000 + F.lit(0.5)
                )
            ).cast("bigint").alias("__qy"),
        )
    )
    ols = pts.groupBy("cohort_week").agg(
        F.max("__size").alias("cohort_size"),
        F.count(F.lit(1)).alias("n_ages"),
        F.sum("__x").alias("__sx"),
        F.sum("__qy").alias("__sy"),
        F.sum(F.col("__x") * F.col("__qy")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    n = F.col("n_ages")
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    slope = num / den / 1_000_000
    ok = (n >= 2) & (den > 0)
    full = base.join(ols.drop("cohort_size"), "cohort_week", "left")
    # slope is an EXACT integer ratio — emit the raw double division
    # (identical bits on both engines); half_life is positive, so the
    # floor(x·10⁶ + 0.5) recipe is the cross-engine half-up round (the
    # multimodal convention — F.round's BigDecimal path and a
    # float-multiply round() disagree exactly on rational boundaries)
    half = F.lit(-_LN2) / slope
    return full.select(
        "cohort_week",
        F.col("__size").alias("cohort_size"),
        F.coalesce(F.col("n_ages"), F.lit(0)).cast("bigint").alias("n_ages"),
        F.when(ok, slope).alias("slope"),
        F.when(
            ok & (slope < 0),
            F.floor(half * 1_000_000 + F.lit(0.5)) / 1_000_000,
        ).alias("half_life_weeks"),
    )


def transition_perplexity(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user behavioral perplexity under the GLOBAL first-order
    transition model — cross-entropy of each user's own (from → to)
    sequence against the corpus-wide :func:`event_transitions` matrix:
    the "how surprising is this user's behavior" score that turns the
    Markov machinery into an anomaly detector (bots replay one loop →
    perplexity near 1; scripted fuzzers jump uniformly → perplexity
    near the branching factor). The event-stream twin of a language
    model scoring documents.

    Exactness: model probabilities are the exact integer ratios
    n_ft/n_f; the per-TRANSITION-TYPE surprisal quantizes ONCE as
    q_ft = round_half_up(−log₂(n_ft/n_f)·10⁶) (micro-bits, computed
    in one fixed-order double expression), so every user's bit total
    is the exact integer Σ count_u,ft·q_ft — both engines sum
    identical integers, ONE division by the user's transition count,
    exp2 at the very end. Every user transition exists in the model
    by construction (the model is fit on the same pool), so no
    smoothing channel is needed — documented. NULL types are excluded
    BEFORE pairing (the :func:`_markov_core` convention — a NULL is
    not a state); users with zero transitions emit no row.

    Scale shape: ONE user-keyed lead window builds pairs, the model is
    a bounded types² aggregate joined back on (from, to) — user volume
    never joins user volume, no collect, no driver state. Returns
    (user, n_transitions, cross_entropy_bits, perplexity).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pool = df.where(F.col(type_col).isNotNull())
    pairs = pool.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__f"),
        F.lead(type_col).over(w).alias("__t"),
    ).where(F.col("__t").isNotNull())
    upairs = pairs.groupBy("__u", "__f", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__uc")
    )
    model = pairs.groupBy("__f", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    wrow = Window.partitionBy("__f")
    scored = model.select(
        "__f",
        "__t",
        F.floor(
            -F.log2(
                F.col("__n").cast("double")
                / F.sum("__n").over(wrow).cast("double")
            )
            * 1_000_000
            + F.lit(0.5)
        ).cast("bigint").alias("__q"),
    )
    per_user = (
        upairs.join(scored, ["__f", "__t"])
        .groupBy("__u")
        .agg(
            F.sum("__uc").cast("bigint").alias("n_transitions"),
            F.sum(F.col("__uc").cast(dec) * F.col("__q")).alias("__bits2"),
        )
    )
    bits = (
        F.col("__bits2").cast("double")
        / F.col("n_transitions").cast("double")
        / 1_000_000
    )
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return per_user.select(
        F.col("__u").alias(user_col),
        "n_transitions",
        h6(bits).alias("cross_entropy_bits"),
        h6(F.pow(F.lit(2.0), bits)).alias("perplexity"),
    )


def hitting_time(
    df: DataFrame,
    target: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_iter: int = 8,
    max_states: int = 64,
) -> DataFrame:
    """Truncated expected hitting time to a TARGET event type — from
    each state, the expected number of steps the first-order chain
    spends before reaching ``target``, capped at an ``n_iter``-step
    horizon: the "how far is each behavior from conversion" readout
    that turns :func:`markov_stationary`'s long-run view into a
    goal-directed one (funnel tools like q122 count OBSERVED paths;
    this prices every state under the fitted model, including paths no
    single user completed).

    Semantics (documented): h⁰ ≡ 0 and
    hᵐ⁺¹(i) = 0 if i = target else 1 + Σⱼ p(i,j)·hᵐ(j) — the value
    iteration whose limit is the true expected hitting time; at a
    finite horizon, states that cannot reach the target read exactly
    the horizon n_iter (the natural "at least this far" reading).
    Exactness: the iteration runs on INTEGER MICRO-STEPS
    (hᵐ⁺¹ᵢ = 10⁶ + Σⱼ floor(pᵢⱼ·hᵐⱼ + 0.5), pᵢⱼ = exact-integer-ratio
    doubles), the :func:`markov_stationary` picoprobability recipe —
    every engine sums identical integers, replayable as chained SQL
    CTEs. Shares :func:`_markov_core` verbatim (one pairing
    implementation; NULL types excluded; absorbing self-loop
    completion — a terminal non-target state self-loops and rides to
    the horizon). Unknown ``target`` raises loudly. Bounded by
    ``max_states`` (asserted) — event volume only flows through the
    shared lead window and (from, to) count. One row per state:
    (state, n_out, is_target, hitting_steps).
    """
    states, totals, p, _pi, _scale = _markov_core(
        df, user_col, type_col, ts_col, id_col, n_iter, max_states,
        caller="hitting_time",
    )
    if target not in states:
        raise ValueError(
            f"hitting_time: target {target!r} is not an observed state"
        )
    import math

    step = 1_000_000
    h = {s: 0 for s in states}
    for _ in range(int(n_iter)):
        nxt = {}
        for s in states:
            if s == target:
                nxt[s] = 0
                continue
            acc = step
            for (i, j), pij in p.items():
                if i == s and h.get(j, 0):
                    acc += int(math.floor(pij * h[j] + 0.5))
            nxt[s] = acc
        h = nxt
    return df.sparkSession.createDataFrame(
        [
            (
                s,
                int(totals.get(s, 0)),
                s == target,
                h[s] / step,
            )
            for s in states
        ],
        "state string, n_out bigint, is_target boolean, hitting_steps double",
    )
