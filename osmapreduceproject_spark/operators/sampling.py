"""Deterministic sampling / corpus-mixing operators.

Training-data pipelines re-sample sources at different rates (domain
mixing: up-weight books, down-weight web crawl) and need the decision to
be REPRODUCIBLE — re-running the pipeline, on any cluster layout, must
keep exactly the same rows. Spark's ``df.sample`` is seeded per-partition
and changes membership when partitioning changes, so these operators key
the decision on CONTENT (a 60-bit md5 of the row key, bucketed mod 1e6),
like the hash train/eval split (queries.py q68): membership is a pure
function of the row, independent of partitioning, ordering, and cluster
size — and replicable in any engine with md5, which keeps every sampling
query oracle-checkable.

All expressions are built-in Catalyst (md5/conv/%), codegen'd, no UDFs;
``stratified_sample`` gets per-stratum rates via a BROADCAST join of a
tiny rates table, so sampling is a narrow scan-bound filter at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int

BUCKETS = 1_000_000


def _bucket(key_col: str, salt: str):
    """Content-stable bucket in [0, 1e6): md5 of 'salt|key'."""
    return (
        md5_int(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
        % BUCKETS
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a row iff its content bucket < rate·1e6 — a reproducible
    Bernoulli(rate) sample. Different ``salt`` values give independent
    samples over the same keys."""
    return df.where(_bucket(key_col, salt) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing /
    source-reweighting step of corpus construction.

    The (stratum → rate) table is joined in as a BROADCAST left join
    (strata counts are tiny — sources, languages, domains), so the plan
    stays a narrow filter over the scan: no shuffle of the corpus, no
    driver-side literal explosion when the rate table grows to thousands
    of domains. Strata missing from ``rates`` get ``default_rate``.
    """
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, __rate double",
    )
    return (
        df.join(F.broadcast(rates_df), strata_col, "left")
        .withColumn("__rate", F.coalesce("__rate", F.lit(float(default_rate))))
        .where(_bucket(key_col, salt) < (F.col("__rate") * BUCKETS).cast("bigint"))
        .drop("__rate")
    )


def cap_per_source(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-domain document cap — the guard against any single source /
    domain flooding the corpus (web-crawl curation caps docs per
    registered domain before mixing).

    Keeps at most ``cap`` rows per stratum, selected by the content-stable
    bucket order with the key as tiebreak — NOT arrival or partition
    order: the kept set is a reproducible unbiased within-stratum sample,
    identical on any cluster layout, rather than "whichever rows the scan
    produced first". Changing ``salt`` re-draws the kept subset.

    Scale shape: one window keyed on the stratum — a single shuffle on
    ``strata_col``. The rank ≤ cap filter plans as WindowGroupLimit
    (asserted in tests/test_plans.py): each map task keeps only its local
    top-``cap`` per stratum before the exchange, so a hot domain ships
    O(cap · partitions) rows, not its full volume.
    """
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(cap))
        .drop("__rk")
    )


def mixing_weights(
    df: DataFrame, strata_col: str = "source", alpha: float = 0.7
) -> DataFrame:
    """Temperature-scaled source-mixing weights: weight_s ∝ n_s^alpha,
    normalized — the standard multinomial re-balancing of corpus
    construction (alpha < 1 up-weights small sources, alpha = 1 keeps
    natural proportions). The output table is what
    :func:`stratified_sample` consumes as its per-stratum rates.

    Scale shape: one strata-keyed count aggregation (tiny result), one
    broadcast single-row normalizer — the corpus is scanned once and
    never shuffled beyond the count's partial aggregation. Weights
    rounded to 6 decimals (pow/sum ulp differences across engines).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    norm = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("__z")
    )
    return (
        counts.crossJoin(F.broadcast(norm))
        .select(
            F.col(strata_col),
            F.col("n_docs"),
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("__z"), 6
            ).alias("weight"),
        )
    )


def epoch_plan(
    df: DataFrame,
    token_budget: int,
    strata_col: str = "source",
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Data-budget solver: given a training token budget, how many epochs
    of each source does the temperature-scaled mixture imply? The
    planning step between corpus stats and dataloader config — it makes
    over-sampling visible (epochs ≫ 1 on a small up-weighted source
    means that source repeats many times in training, the
    repetition-harm regime) and under-sampling explicit (epochs < 1
    means the budget never sees all of the source).

    weight_s ∝ n_tokens_s^alpha normalized (token-weighted, not
    doc-weighted — budgets are in tokens); target_tokens_s =
    budget·weight_s; epochs_s = target_tokens_s / n_tokens_s.

    Scale shape: one strata-keyed count/sum aggregation (map-side
    combined, tiny result) + one broadcast single-row normalizer; the
    corpus is scanned once. Same shape as :func:`mixing_weights`.
    """
    from .text import tokens

    nt = F.size(tokens(F.col(text_col))).cast("bigint")
    g = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(nt).alias("n_tokens")
    )
    z = g.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("__z")
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__z")
    return (
        g.crossJoin(F.broadcast(z))
        .select(
            F.col(strata_col),
            "n_docs",
            "n_tokens",
            F.round(w, 6).alias("weight"),
            F.round(F.lit(float(token_budget)) * w, 6).alias("target_tokens"),
            F.round(
                F.lit(float(token_budget)) * w / F.col("n_tokens"), 6
            ).alias("epochs"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES, public paper): each row draws a reproducible
    uniform u ∈ (0, 1) from the md5 content bucket of (salt|key), keys
    itself with −ln(u)/w, and the ``n`` SMALLEST keys are the sample —
    inclusion probability proportional to ``weight_col``. The
    quality-weighted corpus sampler: weight by q38's quality score and
    high-quality documents are drawn preferentially, yet the drawn set
    is a pure function of content — identical on any cluster layout,
    re-runnable, and oracle-replicable (same hash, same ln, same ratio
    on both engines). Rows with weight ≤ 0 or NULL are excluded (zero
    inclusion mass).

    Scale shape: the sample key is a narrow map over the scan;
    ``orderBy().limit(n)`` plans TakeOrderedAndProject — a per-task heap
    of the requested sample size, never a global sort. Ties break on the
    row key (ln collisions are astronomically unlikely but determinism
    is contractual, not probabilistic).
    """
    w = F.col(weight_col).cast("double")
    u = (_bucket(key_col, salt) + 1).cast("double") / float(BUCKETS + 1)
    rank = -F.log(u) / w
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__wr", rank)
        .orderBy(F.col("__wr").asc(), F.col(key_col).asc())
        .limit(int(n))
        .drop("__wr")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    salt: str = "neg|",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-random OTHER rows drawn by content
    hash — reproducible across runs, engines, and cluster layouts, so a
    training set's negatives are stable data, not a runtime accident
    (the q68/q115 hash-reproducibility contract applied to pair
    construction).

    Candidate t for anchor i is index ``md5(salt ∥ id ∥ t) % (n−1)``,
    shifted past the anchor's own index (the classic skip-self map:
    j < i keeps j, j ≥ i becomes j+1) — self-pairs are impossible by
    construction rather than by rejection-resampling, which would need
    a data-dependent number of hash rounds. Indexing is
    :func:`~..mapreduce.ranked_sort` over ``id_col`` (parallel sample
    sort — no single-partition window), negatives resolve through one
    index-keyed equi-join. With n < 2 there is nothing to sample —
    returns empty. Output: (anchor id, neg_rank 1..k, negative id).

    Scale shape: the range shuffle of ranked_sort plus one hash join on
    the dense index; k multiplies only the slim (anchor, index) frame,
    never document bodies. Duplicate negatives for one anchor are
    possible (sampling WITH replacement across ranks) — the standard
    trade; dedup downstream if the loss requires distinct negatives.
    """
    from ..functions.hashing import md5_int
    from ..mapreduce import ranked_sort
    from ..plans.inspect import release_intermediates  # noqa: F401  (caller releases)

    indexed = ranked_sort(
        df.select(F.col(id_col)), [F.col(id_col).asc()], pos_col="__pos"
    ).select(F.col(id_col), (F.col("__pos") - 1).alias("__i"))
    n_row = indexed.agg(F.count(F.lit(1)).alias("__n"))
    anchors = indexed.crossJoin(F.broadcast(n_row)).where(F.col("__n") >= 2)
    drawn = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col("__i"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("neg_rank"),
                    (
                        md5_int(
                            F.concat(
                                F.lit(salt),
                                F.col(id_col).cast("string"),
                                F.lit("|"),
                                F.lit(str(t)),
                            )
                        )
                        % (F.col("__n") - 1)
                    ).alias("__j0"),
                )
                for t in range(1, k + 1)
            ])
        ).alias("s"),
    ).select(
        "anchor_id",
        F.col("s.neg_rank").alias("neg_rank"),
        F.when(F.col("s.__j0") < F.col("__i"), F.col("s.__j0"))
        .otherwise(F.col("s.__j0") + 1)
        .alias("__j"),
    )
    lookup = indexed.select(
        F.col("__i").alias("__j"), F.col(id_col).alias("negative_id")
    )
    return drawn.join(lookup, "__j").select("anchor_id", "neg_rank", "negative_id")


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_frac: float = 0.8,
) -> DataFrame:
    """Time-based train/eval split: rows at or before the exact
    ``train_frac`` quantile of the timestamp go to ``train``, later
    rows to ``eval`` — the leakage-safe split for anything with
    temporal structure (forecasting, churn, recommendation), where the
    hash split (q68) would let the model peek at the future. The
    cutoff is the exact discrete quantile of epoch-µs via the bounded
    multi-pass percentile machinery — no sort, driver state is a
    histogram — and comparison happens in integer µs.

    Returns the input plus (split, cutoff_epoch_us); ties AT the
    cutoff all land in train (≤), so the boundary is deterministic
    regardless of partitioning. NULL timestamps are excluded (a row
    with no time cannot be placed honestly on a timeline).
    """
    from .stats import exact_percentile

    with_e = df.where(F.col(ts_col).isNotNull()).withColumn(
        "__e", F.unix_micros(F.col(ts_col))
    )
    cutoff = int(exact_percentile(with_e, "__e", [train_frac])[0])
    return (
        with_e.withColumn(
            "split",
            F.when(F.col("__e") <= cutoff, F.lit("train")).otherwise(F.lit("eval")),
        )
        .withColumn("cutoff_epoch_us", F.lit(cutoff).cast("bigint"))
        .drop("__e")
    )


def rebalance_to_mix(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Materialize the LARGEST corpus subset matching a target stratum
    mix exactly — the "rebalance to the published language/domain
    ratios" step (:func:`mixing_weights` computes temperature WEIGHTS
    for loss-side mixing; this physically re-samples the data when the
    trainer wants materialized ratios): feasible total
    ``T = min_s floor(n_s / t_s)`` (the stratum that runs out first
    caps everything), per-stratum quota ``q_s = floor(t_s · T)``, and
    each stratum keeps its ``q_s`` rows with the SMALLEST content-hash
    rank — membership is a pure function of the data (md5 of
    salt|stratum|id, id-tiebroken), so reruns and engines agree row
    for row. Strata absent from ``targets`` are dropped (share 0); a
    TARGET stratum absent from the data makes the mix infeasible —
    T = 0 and the result is empty, never a silent renormalization.

    Scale shape: one stratum-keyed count (bounded frame), the feasible
    total as a broadcast scalar, then a rank window PARTITIONED BY
    STRATUM — the documented per-stratum bound (strata are
    languages/sources/domains, thousands at most; the window sorts one
    stratum per task like group_percentiles documents). Output keeps
    the input columns.
    """
    total_targets = sum(targets.values())
    if not targets or total_targets <= 0:
        raise ValueError("rebalance_to_mix: targets must have positive mass")
    tgt = df.sparkSession.createDataFrame(
        [(k, float(v) / total_targets) for k, v in targets.items()],
        f"{strata_col} string, __t double",
    )
    counts = df.groupBy(F.col(strata_col)).agg(F.count(F.lit(1)).alias("__n"))
    # LEFT join from the targets: a target stratum with NO rows means
    # n_s = 0, so the feasible total is 0 and the result is EMPTY — the
    # honest "this mix cannot be satisfied" answer, not a silent
    # renormalization over the strata that happen to exist
    quotas = F.broadcast(tgt).join(counts, strata_col, "left").select(
        strata_col, F.coalesce(F.col("__n"), F.lit(0)).alias("__n"), "__t"
    )
    feasible = quotas.where(F.col("__t") > 0).agg(
        F.min(F.floor(F.col("__n") / F.col("__t"))).alias("__T")
    )
    # feasible descends from quotas — alias both sides so the rejoin's
    # attribute references resolve unambiguously
    quotas = (
        quotas.alias("qa")
        .crossJoin(F.broadcast(feasible.alias("fa")))
        .select(
            F.col(f"qa.{strata_col}"),
            F.floor(F.col("qa.__t") * F.col("fa.__T")).alias("__q"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(
        md5_int(
            F.concat_ws(
                "|",
                F.lit(salt),
                F.col(strata_col).cast("string"),
                F.col(id_col).cast("string"),
            )
        ).asc(),
        F.col(id_col).asc(),
    )
    ranked = df.join(F.broadcast(quotas), strata_col).withColumn(
        "__r", F.row_number().over(w)
    )
    return ranked.where(F.col("__r") <= F.col("__q")).drop("__r", "__q")


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int,
    salt: str = "gkf",
) -> DataFrame:
    """Group-integral k-fold assignment: every row of a group lands in
    the SAME fold (fold = cross-engine md5 of 'salt|group' mod k) — the
    cross-validation split that prevents group leakage (all of one
    user's events, one document's chunks, one domain's pages stay
    together), the k-way companion of the q206 temporal split and the
    q160 leakage audit. Deterministic and seedable via ``salt``:
    reruns, engines, and partitionings all agree on every assignment.

    NULL groups coalesce to the ``'<null>'`` sentinel BEFORE hashing —
    concat_ws silently skips NULL operands, so without the sentinel
    Spark would hash the salt alone while a ``salt || '|' || col``
    oracle yields NULL; the sentinel keeps both engines assigning NULL
    groups the same (single, group-integral) fold.

    A narrow map — no shuffle, no state: the fold is a pure function of
    the group value, so it needs no group table, broadcasts nothing,
    and scales to any corpus. Adds a ``fold`` column (0..k-1).
    """
    return df.withColumn(
        "fold",
        (
            md5_int(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.coalesce(F.col(group_col).cast("string"), F.lit("<null>")),
                )
            )
            % int(k)
        ).cast("int"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — split a sampling
    budget across strata proportional to N_h·σ_h (stratum size × its
    population sd), the allocation that minimizes the variance of the
    stratified mean estimator: the planning table a labeling or
    eval-subset pipeline computes BEFORE :func:`stratified_sample`
    draws rows (equal or proportional allocation over-samples flat
    strata and starves volatile ones). The proportional column is
    reported beside it so the reviewer sees exactly where Neyman
    disagrees.

    Exactness and determinism: values quantize to micro-units; each
    stratum's σ comes from exact DECIMAL(38,0) moments with ONE
    fixed-order double finalize, and the weight w_h = N_h·σ_h
    re-quantizes half-up to micro-units so the allocation arithmetic
    is INTEGER end-to-end: base_h = ⌊budget·qw_h / Σqw⌋ by integer
    division, and the leftover seats go to the largest exact integer
    remainders budget·qw_h mod Σqw (ties → smaller stratum label) —
    the largest-remainder method, deterministic on any engine, summing
    to exactly ``budget``. Zero-variance strata get Neyman weight 0
    (pure Neyman, documented — floor allocations upstream if a
    minimum per stratum is required); an all-zero-weight pool reports
    NULL shares with zero allocations. NULL/NaN values are excluded
    from moments but strata keep their row counts from the non-NULL
    pool only (documented). Scale shape: one groupBy for moments, one
    k-row window for remainder ranks — data volume never shuffles
    twice, no driver state. Returns (stratum, n, sd, neyman_share,
    n_neyman, n_proportional).
    """
    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    pool = df.where(
        F.col(stratum_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    ).select(
        F.col(stratum_col).alias("__h"),
        F.round(v * 1_000_000).cast(dec).alias("__vq"),
    )
    per = pool.groupBy("__h").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__vq").alias("__s"),
        F.sum(F.col("__vq") * F.col("__vq")).alias("__ss"),
    )
    n_d = F.col("__n").cast("double")
    # population sd in value units, one fixed-order expression
    sd = F.sqrt(
        (F.col("__ss").cast("double")
         - F.col("__s").cast("double") * F.col("__s").cast("double") / n_d)
        / n_d
    ) / 1_000_000
    qw = F.floor(n_d * sd * 1_000_000 + F.lit(0.5)).cast(dec)
    wts = per.select(
        "__h",
        "__n",
        F.floor(sd * 1_000_000 + F.lit(0.5)).cast("bigint").alias("__qsd"),
        qw.alias("__w"),
    )
    tot = wts.agg(
        F.sum("__w").alias("__tw"),
        F.sum(F.col("__n").cast(dec)).alias("__tn"),
    )
    j = wts.crossJoin(F.broadcast(tot))

    def _largest_remainder(weight, total, tag):
        # an all-zero weight pool (every stratum constant) has no
        # Neyman direction: guard the 0-divisor, allocations stay 0
        base = F.when(
            total > 0, F.floor((F.lit(budget) * weight) / total)
        ).otherwise(F.lit(0)).cast("bigint").alias(f"__base_{tag}")
        rem = F.when(total > 0, (F.lit(budget) * weight) % total).otherwise(
            F.lit(0)
        )
        return base, rem.alias(f"__rem_{tag}")

    nb, nr = _largest_remainder(F.col("__w"), F.col("__tw"), "n")
    pb, pr = _largest_remainder(F.col("__n").cast(dec), F.col("__tn"), "p")
    staged = j.select(
        "__h", "__n", "__qsd", "__w", "__tw", nb, nr, pb, pr
    )
    # remainder ranks WITHOUT an unpartitioned window (which would move
    # the frame to one partition): a bounded k×k comparison join over
    # the stratum rows — the friedman/JT midrank pattern. rank = 1 +
    # #{rows strictly ahead in (rem DESC, label ASC) order}.
    other = staged.select(
        F.col("__h").alias("__h2"),
        F.col("__rem_n").alias("__rem_n2"),
        F.col("__rem_p").alias("__rem_p2"),
    )
    ahead_n = (F.col("__rem_n2") > F.col("__rem_n")) | (
        (F.col("__rem_n2") == F.col("__rem_n"))
        & (F.col("__h2") < F.col("__h"))
    )
    ahead_p = (F.col("__rem_p2") > F.col("__rem_p")) | (
        (F.col("__rem_p2") == F.col("__rem_p"))
        & (F.col("__h2") < F.col("__h"))
    )
    # constant-key equi-join (k×k over the bounded stratum frame — a
    # hash join, not a CartesianProduct; k = stratum cardinality)
    rk = (
        staged.withColumn("__one", F.lit(1))
        .join(other.withColumn("__one", F.lit(1)), "__one")
        .groupBy(
            "__h", "__n", "__qsd", "__w", "__tw",
            "__base_n", "__rem_n", "__base_p", "__rem_p",
        )
        .agg(
            (F.lit(1) + F.sum(ahead_n.cast("int"))).alias("__rk_n"),
            (F.lit(1) + F.sum(ahead_p.cast("int"))).alias("__rk_p"),
        )
    )
    shorts = staged.agg(
        (F.lit(budget) - F.sum("__base_n")).alias("__short_n"),
        (F.lit(budget) - F.sum("__base_p")).alias("__short_p"),
    )
    ranked = rk.crossJoin(F.broadcast(shorts)).select(
        "*",
        (F.col("__rk_n") <= F.col("__short_n")).cast("int").alias("__extra_n"),
        (F.col("__rk_p") <= F.col("__short_p")).cast("int").alias("__extra_p"),
    )
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return ranked.select(
        F.col("__h").alias(stratum_col),
        F.col("__n").alias("n"),
        (F.col("__qsd").cast("double") / 1_000_000).alias("sd"),
        F.when(
            F.col("__tw") > 0,
            h6(F.col("__w").cast("double") / F.col("__tw").cast("double")),
        ).alias("neyman_share"),
        F.when(F.col("__tw") > 0, F.col("__base_n") + F.col("__extra_n"))
        .otherwise(F.lit(0)).cast("bigint").alias("n_neyman"),
        (F.col("__base_p") + F.col("__extra_p")).cast("bigint").alias(
            "n_proportional"
        ),
    )


def effective_sample_size(
    df: DataFrame,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group effective sample size of a weighted pool — Kish's
    ESS = (Σw)²/Σw² and the design effect deff = n·Σw²/(Σw)² — the
    diagnostic a weighted training mix needs BEFORE trusting
    :func:`mixing_weights`/:func:`rebalance_to_mix` output: a source
    whose ESS collapses far below its row count is dominated by a few
    heavy documents, and any metric computed over it has the variance
    of ESS rows, not n rows. Also reports the heaviest single row's
    weight share (the degenerate-mix smoke alarm).

    Conventions: NULL/NaN/≤0 weights are excluded and counted —
    a zero-weight row contributes nothing to any weighted estimate,
    so letting it inflate n would overstate the design effect.
    Exactness: weights micro-quantize once (floor(w·10⁶ + 0.5) —
    exact-rational inputs, never F.round); Σw, Σw², max w accumulate
    in exact DECIMAL; ESS/deff/share are fixed-order double
    expressions over those integers. Scale shape: ONE groupBy over
    row volume into a bounded per-group frame; no windows, no driver
    state. Returns (group, n, n_excluded, ess, ess_ratio, deff,
    max_weight_share), 6-decimal; groups whose weights all quantize
    to zero report NULL ratios.
    """
    dec = "decimal(38,0)"
    g = F.col(group_col)
    w = F.col(weight_col).cast("double")
    q = F.floor(w * 1_000_000 + F.lit(0.5)).cast("bigint")
    base = df.where(g.isNotNull()).select(
        g.alias("__g"),
        F.when(w.isNotNull() & ~F.isnan(w) & (w > 0), q).alias("__q"),
    )
    per = base.groupBy("__g").agg(
        F.sum(F.col("__q").isNotNull().cast("bigint")).alias("n"),
        F.sum(F.col("__q").isNull().cast("bigint")).alias("n_excluded"),
        F.coalesce(F.sum(F.col("__q").cast(dec)), F.lit(0).cast(dec)).alias(
            "__sw"
        ),
        F.coalesce(
            F.sum(F.col("__q").cast(dec) * F.col("__q")), F.lit(0).cast(dec)
        ).alias("__sw2"),
        F.coalesce(F.max("__q"), F.lit(0)).alias("__mx"),
    )
    sw = F.col("__sw").cast("double")
    sw2 = F.col("__sw2").cast("double")
    ess = sw * sw / sw2
    ok = F.col("__sw2") > 0
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return per.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("bigint"),
        F.col("n_excluded").cast("bigint"),
        F.when(ok, h6(ess)).alias("ess"),
        F.when(ok, h6(ess / F.col("n"))).alias("ess_ratio"),
        F.when(ok, h6(F.col("n") * sw2 / (sw * sw))).alias("deff"),
        F.when(ok, h6(F.col("__mx").cast("double") / sw)).alias(
            "max_weight_share"
        ),
    )
