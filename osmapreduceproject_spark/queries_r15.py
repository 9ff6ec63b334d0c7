"""Round-15 catalog tranche: the staged-operator declarations (q318–q337).

Every entry was pre-verified a round early — its Spark body and oracle
SQL are the same (body, SQL) pair its parity test ran green before
declaration (tests/test_r16_oracles.py, SURVEY.md §8 staging
discipline, eighth declaration tranche after r8/r9/r10/r11/r12/r13/r14;
the whole staged file re-ran green under the hostile Australia/Eucla
session zone before the declaring round opened, and nelson_aalen /
concurrency_profile carry judge-re-run gated scale smokes at 10M
durations / 4M intervals). Split out of queries.py for file hygiene;
the registration decorator, fixture readers, and cross-engine float
rules (queries.py module docstring) are shared.

Imported by queries.py immediately before the verdict-window rotation,
so these entries participate in the same QUERIES dict, the same
tests/test_oracle_parity.py sweep, and the same driver grading.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.events import concurrency_profile, cooccurrence_lift
from .operators.multimodal import (
    arith_raw_audio,
    arith_raw_images,
    arith_video_frames,
    arith_video_frames_looped,
    audio_zero_crossing,
    image_colorfulness,
    image_symmetry,
    video_loop_detect,
    video_shot_stats,
)
from .operators.similarity import dim_truncation_report, pq_reconstruction_error
from .operators.stats import (
    cochran_q,
    contingency_residuals,
    jonckheere_terpstra,
    mean_excess_report,
    mood_median_test,
    nelson_aalen,
)
from .operators.text import (
    _CODE_KEYWORDS,
    _CODE_SYMBOLS,
    code_detect_report,
    template_prefix_report,
    vocab_coverage_curve,
)
from .operators.windows import runs_test, step_change_report
from .queries import _t, q
from .queries_r9 import _scene_hash_sql

# ---------------------------------------------------------------------------
# stats family
# ---------------------------------------------------------------------------


@q(
    "q318_mood_median_test",
    """
    WITH pool AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    nn AS (SELECT COUNT(*) AS n FROM pool),
    med AS (SELECT v AS m
            FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM pool) t,
                 nn
            WHERE rn = CAST(ceil(0.5 * nn.n) AS BIGINT)),
    per AS (SELECT g, COUNT(*) AS ng,
                   SUM(CASE WHEN v > med.m THEN 1 ELSE 0 END) AS a
            FROM pool, med GROUP BY g),
    tot AS (SELECT SUM(ng) AS nt, SUM(a) AS at_, COUNT(*) AS k FROM per),
    terms AS (SELECT per.g, per.ng, per.a, tot.nt, tot.at_, tot.k,
                CAST(a*nt - ng*at_ AS DOUBLE) AS da,
                CAST((ng-a)*nt - ng*(nt-at_) AS DOUBLE) AS db
              FROM per, tot),
    q AS (SELECT nt, at_, k,
            SUM(CASE WHEN at_ > 0 AND nt - at_ > 0 THEN
              CAST(floor((da*da / (CAST(nt AS DOUBLE) * ng * at_)
                   + db*db / (CAST(nt AS DOUBLE) * ng * (nt - at_)))
                   * 1000000 + 0.5) AS BIGINT) END) AS cq
          FROM terms GROUP BY 1, 2, 3)
    SELECT CAST(nt AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
           (SELECT m FROM med) AS grand_median,
           CAST(at_ AS BIGINT) AS n_above,
           CASE WHEN k >= 2 AND cq IS NOT NULL THEN
             round(CAST(cq AS DOUBLE) / 1000000, 6) END AS chi2,
           CAST(greatest(k - 1, 0) AS BIGINT) AS dof
    FROM q
    """,
    "Mood's median test over event-type value pools "
    "(operators/stats.py mood_median_test — 2×k above-the-grand-"
    "median counts, χ² with k−1 dof): the rank-free k-sample "
    "location screen that stays valid under the heavy tails that "
    "break ANOVA — the robust sibling of q252 Kruskal–Wallis. The "
    "grand median is the EXACT rank-⌈n/2⌉ order statistic (single "
    "bounded lookup, no interpolation ambiguity across engines); "
    "per-group χ² terms compute in the double domain from exact "
    "integer counts and quantize half-up to micro-units, so both "
    "engines sum identical integers and divide once. A degenerate "
    "pool where nothing clears the median (all values AT it) "
    "reports NULL χ² instead of 0/0. Fully separated 4-vs-4 pin: "
    "χ² = 8 at dof 1.",
)
def q318(spark, sf_dir):
    return mood_median_test(_t(spark, sf_dir, "events"), "event_type", "value")


@q(
    "q319_cochran_q",
    """
    WITH pool AS (
      SELECT user_id AS b, event_type AS t,
             CASE WHEN abs(CAST(value AS DOUBLE))
                       - floor(abs(CAST(value AS DOUBLE))) >= 0.5
                  THEN 1 ELSE 0 END AS x
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    cell AS (SELECT b, t, MAX(x) AS v FROM pool GROUP BY 1, 2),
    kk AS (SELECT COUNT(DISTINCT t) AS k FROM cell),
    sizes AS (SELECT b, COUNT(*) AS kt FROM cell GROUP BY b),
    complete AS (SELECT b FROM sizes, kk WHERE kt = kk.k),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    rws AS (SELECT b, SUM(v) AS bi FROM cc GROUP BY b),
    rowm AS (SELECT COUNT(*) AS nb,
                    COALESCE(SUM(CAST(bi AS HUGEINT)), 0) AS nn,
                    COALESCE(SUM(CAST(bi AS HUGEINT) * bi), 0) AS sb2
             FROM rws),
    cls AS (SELECT t, SUM(v) AS gj FROM cc GROUP BY t),
    colm AS (SELECT COALESCE(SUM(CAST(gj AS HUGEINT) * gj), 0) AS sg2
             FROM cls),
    nt AS (SELECT COUNT(*) AS ntot FROM sizes)
    SELECT CAST(nb AS BIGINT) AS n_blocks,
           CAST(ntot - nb AS BIGINT) AS n_blocks_dropped,
           CAST(k AS BIGINT) AS k_treatments,
           CAST(greatest(k - 1, 0) AS BIGINT) AS dof,
           CASE WHEN k >= 2 AND nb >= 1 AND (k * nn - sb2) > 0 THEN
             round(CAST(k - 1 AS DOUBLE) * CAST(k * sg2 - nn * nn AS DOUBLE)
                   / CAST(k * nn - sb2 AS DOUBLE), 6)
           END AS q_stat
    FROM rowm, colm, kk, nt
    """,
    "Cochran's Q over user blocks × event-type treatments "
    "(operators/stats.py cochran_q — binary repeated-measures "
    "extension of McNemar to k treatments, the q250 family's "
    "k-sample closer): 'did success rates differ across treatments "
    "for the SAME users'. Cells collapse to MAX(hit) per "
    "(block, treatment); incomplete blocks (a user missing a "
    "treatment) DROP with their count reported, the standard "
    "complete-block convention. Q's numerator and denominator are "
    "EXACT integer moments (HUGEINT row/column squares) — one final "
    "division; an all-success/all-failure table has zero "
    "denominator and reports NULL. One-hot 4-block pin: Q = 2·b = 8 "
    "at dof 2, invariant to an extra dropped block.",
)
def q319(spark, sf_dir):
    v = F.col("value").cast("double")
    frac = F.abs(v) - F.floor(F.abs(v))
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.when(v.isNotNull() & ~F.isnan(v), (frac >= 0.5).cast("int")).alias(
            "hit"
        ),
    )
    return cochran_q(ev, "user_id", "event_type", "hit")


@q(
    "q320_contingency_residuals",
    """
    WITH cont AS (SELECT source AS a, lang AS b, COUNT(*) AS o
                  FROM documents GROUP BY 1, 2),
    cells AS (SELECT a, b, o,
                SUM(o) OVER (PARTITION BY a) AS rt,
                SUM(o) OVER (PARTITION BY b) AS ct
              FROM cont),
    tot AS (SELECT SUM(o) AS n FROM cont),
    e AS (SELECT a, b, o, rt, ct, n,
            CAST(rt * ct AS DOUBLE) / n AS ex,
            CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / n AS diff,
            CAST(rt * ct AS DOUBLE) / n
              * (1.0 - CAST(rt AS DOUBLE) / n)
              * (1.0 - CAST(ct AS DOUBLE) / n) AS av
          FROM cells, tot)
    SELECT a AS source, b AS lang, CAST(o AS BIGINT) AS observed,
           round(ex, 6) AS expected,
           round(diff / sqrt(ex), 6) AS pearson_residual,
           CASE WHEN av > 0 THEN round(diff / sqrt(av), 6) END AS adj_residual,
           round(diff * diff / ex, 6) AS chi2_contribution
    FROM e
    """,
    "Per-cell contingency residuals over the source × lang table "
    "(operators/stats.py contingency_residuals — expected counts, "
    "Pearson and Haberman-adjusted residuals, per-cell χ² "
    "contributions): q185's χ² says THAT source and language are "
    "associated; this says WHERE — which (source, lang) cells are "
    "over/under-represented and by how many standard deviations, "
    "the drill-down a corpus-mix audit actually acts on. Marginals "
    "are exact integers from ONE count aggregation (window sums "
    "over the contingency frame — no second pass over documents); "
    "residuals finalize in fixed-order doubles. The contribution "
    "column cross-pins: its sum equals q185's χ² (asserted). A "
    "single-level dimension yields zero adjusted-residual variance "
    "→ NULL, never a division error.",
)
def q320(spark, sf_dir):
    return contingency_residuals(_t(spark, sf_dir, "documents"), "source", "lang")


_NA_CHURN_US = 24 * 3600 * 1_000_000  # churned = inactive for the final day


@q(
    "q321_nelson_aalen",
    f"""
    WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
               FROM events GROUP BY user_id),
    h AS (SELECT MAX(hi) AS hz FROM u),
    obs AS (SELECT CAST((hi - lo) // 3600000000 AS DOUBLE) AS t,
                   CASE WHEN hi < hz - {_NA_CHURN_US} THEN 1 ELSE 0 END AS e
            FROM u, h),
    per AS (SELECT t, COUNT(*) AS c, SUM(e) AS d FROM obs GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM per),
    cum AS (SELECT t, c, d, n, SUM(c) OVER (ORDER BY t) AS cc FROM per, tot),
    risk AS (SELECT t, c, d, n - (cc - c) AS nr FROM cum),
    de AS (SELECT t, nr, d, c - d AS cens,
                  CAST(round(CAST(d AS DOUBLE) / nr * 1000000) AS BIGINT) AS qh
           FROM risk WHERE d > 0),
    fin AS (SELECT t, nr, d, cens, SUM(qh) OVER (ORDER BY t) AS cq FROM de)
    SELECT t, CAST(nr AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
           CAST(cens AS BIGINT) AS n_censored,
           round(CAST(cq AS DOUBLE) / 1000000, 6) AS cum_hazard,
           round(exp(-(CAST(cq AS DOUBLE) / 1000000)), 6) AS fh_survival
    FROM fin
    """,
    "Nelson–Aalen cumulative hazard over user lifetimes "
    "(operators/stats.py nelson_aalen — the hazard-domain twin of "
    "q299's Kaplan–Meier, over the IDENTICAL right-censored churn "
    "shaping so the two estimators read off the same pool): H(t) "
    "sums d/n increments where KM multiplies (1 − d/n), and "
    "exp(−H) is the Fleming–Harrington survival that dominates the "
    "KM product (exp(−x) ≥ 1 − x, cross-estimator pin). Same scale "
    "shape as KM: at-risk counts ride _ranged_cumsum (value-level "
    "cells + bounded range offsets, NO global sort), increments "
    "quantize to micro-units so both engines sum identical "
    "integers — one exp at the very end (judge-re-run 10M-duration "
    "smoke, seconds). Textbook 1, 2†, 3 pin: H(1) = 1/3, "
    "H(3) = 4/3.",
)
def q321(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per = ev.groupBy("user_id").agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    horizon = per.agg(F.max("__hi").alias("__hz"))
    obs = per.crossJoin(F.broadcast(horizon)).select(
        F.expr("(__hi - __lo) div 3600000000").cast("bigint").alias("dur_hours"),
        (F.col("__hi") < F.col("__hz") - F.lit(_NA_CHURN_US)).cast("int").alias(
            "churned"
        ),
    )
    return nelson_aalen(obs, "dur_hours", "churned")


@q(
    "q322_mean_excess",
    """
    WITH pool AS (
      SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
    a AS (SELECT g, COUNT(*) AS n,
                 SUM(CASE WHEN v > 50000.0 THEN 1 ELSE 0 END) AS ne,
                 SUM(CASE WHEN v > 50000.0 THEN
                   CAST(round((v - 50000.0) * 1000000) AS HUGEINT) END) AS sq,
                 MAX(v) AS mx
          FROM pool GROUP BY g)
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(ne AS BIGINT) AS n_exceed,
           round(CAST(ne AS DOUBLE) / n, 6) AS exceed_frac,
           CASE WHEN ne > 0 THEN
             round(CAST(sq AS DOUBLE) / ne / 1000000, 6) END AS mean_excess,
           mx AS max_value
    FROM a
    """,
    "Mean-excess (peaks-over-threshold) tail report of "
    "l_extendedprice over u = 50k per return flag "
    "(operators/stats.py mean_excess_report — E[X − u | X > u], the "
    "extreme-value-theory diagnostic that decides whether a tail is "
    "heavy BEFORE anyone fits a GPD): rising mean excess ⇒ "
    "heavier-than-exponential tail; the number a revenue-risk or "
    "outlier-budget review reads next to q172's MAD fences. One "
    "narrow scan-side aggregation — conditional counts are exact "
    "integers, excess mass accumulates as micro-quantized "
    "DECIMAL(38,0) (no double drift at 100 TB row counts), one "
    "division per group at finalize. All-below groups report NULL "
    "mean excess with their own max (never 0/0). Hand pin: "
    "[1,5,10] over u=4 → 2 exceedances, mean excess 3.5.",
)
def q322(spark, sf_dir):
    return mean_excess_report(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice", 50_000.0
    )


# ---------------------------------------------------------------------------
# events family
# ---------------------------------------------------------------------------


@q(
    "q323_concurrency_profile",
    """
    WITH iv AS (
      SELECT user_id AS k, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS e
      FROM events),
    v AS (SELECT * FROM iv WHERE e > s),
    pts AS (SELECT k, s AS t, 1 AS d FROM v
            UNION ALL SELECT k, e AS t, -1 AS d FROM v),
    r AS (SELECT k, t, d,
            SUM(d) OVER (PARTITION BY k ORDER BY t, d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS run,
            LEAD(t) OVER (PARTITION BY k ORDER BY t, d) AS nt
          FROM pts),
    a AS (SELECT k, SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS ni,
                 MAX(t) - MIN(t) AS span,
                 SUM(CAST(-d * t AS HUGEINT)) AS busy,
                 COALESCE(SUM(CASE WHEN run > 0 THEN nt - t END), 0) AS cov,
                 MAX(run) AS peak
          FROM r GROUP BY k)
    SELECT k AS user_id, CAST(ni AS BIGINT) AS n_intervals,
           CAST(span AS BIGINT) AS span_us, CAST(busy AS BIGINT) AS busy_us,
           CAST(cov AS BIGINT) AS covered_us,
           CAST(peak AS BIGINT) AS peak_concurrent,
           round(CAST(busy AS DOUBLE) / span, 6) AS mean_concurrency,
           round(CAST(cov AS DOUBLE) / span, 6) AS utilization,
           round(CAST(busy AS DOUBLE) / cov, 6) AS mean_active_concurrency
    FROM a
    """,
    "Little's-law concurrency profile over per-user activity "
    "intervals (operators/events.py concurrency_profile — busy "
    "mass, covered time, span, peak, in ONE endpoint sweep): q279 "
    "gave the single max-concurrency number; this is the full "
    "utilization readout (mean concurrency = busy/span, "
    "utilization = covered/span, mean ACTIVE concurrency = "
    "busy/covered ≥ 1) a capacity plan wants per key. The sweep is "
    "the shared ±1 endpoint encoding: busy mass falls out as the "
    "EXACT integer Σ(−d·t) telescoping sum (DECIMAL-safe "
    "accumulation — epoch-µs × volume overflows int64 products), "
    "covered time sums gap-to-next only while the running depth is "
    "positive, and everything is per-key windows — no global sort, "
    "no driver state (judge-re-run 4M-interval staircase smoke: "
    "peak exactly 10 on every key). Half-overlap pin: busy 20, "
    "covered 15, peak 2.",
)
def q323(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    return concurrency_profile(iv, "user_id", "s", "e")


@q(
    "q332_cooccurrence_lift",
    """
    WITH pool AS (SELECT DISTINCT user_id AS s, event_type AS t FROM events
                  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    nn AS (SELECT COUNT(DISTINCT s) AS n FROM pool),
    pt AS (SELECT t, COUNT(*) AS c FROM pool GROUP BY t),
    pr AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS nb
           FROM pool a JOIN pool b ON a.s = b.s AND a.t < b.t GROUP BY 1, 2)
    SELECT ta AS type_a, tb AS type_b, CAST(nn.n AS BIGINT) AS n_scopes,
           CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
           CAST(nb AS BIGINT) AS n_both,
           round(CAST(nb AS DOUBLE) / nn.n, 6) AS support,
           round(CAST(nb AS DOUBLE) * nn.n / (CAST(ca.c AS DOUBLE) * cb.c), 6)
             AS lift,
           round(CAST(nb AS DOUBLE) / (ca.c + cb.c - nb), 6) AS jaccard
    FROM pr JOIN pt ca ON ca.t = pr.ta JOIN pt cb ON cb.t = pr.tb, nn
    WHERE nb >= 1
    """,
    "Event-type co-occurrence lift/jaccard over user scopes "
    "(operators/events.py cooccurrence_lift — market-basket "
    "association over 'which event types does the same user "
    "touch'): lift > 1 reads 'users who do A do B more than "
    "chance', the behavioral-segmentation companion to q161's "
    "sequential transitions (this one ignores order entirely). "
    "Scale shape: event volume collapses FIRST to the distinct "
    "(user, type) frame — the pair join is scope-keyed on that "
    "collapsed frame and bounded by types-per-user², never "
    "events²; supports are exact integers, ratios finalize in "
    "fixed order. Pairs that never co-occur are absent by "
    "construction (inner join semantics, documented). Hand pin: "
    "u1{a,b} u2{a,b} u3{a} u4{c} → (a,b) support 1/2, lift 4/3, "
    "jaccard 2/3.",
)
def q332(spark, sf_dir):
    return cooccurrence_lift(_t(spark, sf_dir, "events"), "user_id", "event_type")


# ---------------------------------------------------------------------------
# windows family
# ---------------------------------------------------------------------------


@q(
    "q330_runs_test",
    """
    WITH pool AS (
      SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    med AS (SELECT k, v AS m FROM (
              SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
                     COUNT(*) OVER (PARTITION BY k) AS n
              FROM pool) WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)),
    tagged AS (SELECT p.k, p.e, p.v, m.m FROM pool p JOIN med m ON m.k = p.k),
    tcount AS (SELECT k, SUM(CASE WHEN v = m THEN 1 ELSE 0 END) AS n_ties
               FROM tagged GROUP BY k),
    sg AS (SELECT k, e, v, CASE WHEN v > m THEN 1 ELSE 0 END AS s
           FROM tagged WHERE v <> m),
    fl AS (SELECT k, s,
             CASE WHEN LAG(s) OVER (PARTITION BY k ORDER BY e, v) IS NOT NULL
               THEN CASE WHEN s <> LAG(s) OVER (PARTITION BY k ORDER BY e, v)
                         THEN 1 ELSE 0 END END AS flip
           FROM sg),
    a AS (SELECT k, SUM(s) AS n1, SUM(1 - s) AS n2,
                 COALESCE(SUM(flip), 0) + 1 AS r
          FROM fl GROUP BY k),
    f AS (SELECT a.k, a.n1, a.n2, tc.n_ties, a.r,
            CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2
          FROM a JOIN tcount tc ON tc.k = a.k),
    g AS (SELECT k, n1, n2, n_ties, r,
            1.0 + 2.0 * d1 * d2 / (d1 + d2) AS er,
            (2.0 * d1 * d2 * (2.0 * d1 * d2 - (d1 + d2)))
              / ((d1 + d2) * (d1 + d2) * ((d1 + d2) - 1.0)) AS vr
          FROM f)
    SELECT k AS user_id, CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below, CAST(n_ties AS BIGINT) AS n_ties,
           CAST(r AS BIGINT) AS n_runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 THEN round(er, 6)
           END AS expected_runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 AND vr > 0 THEN
             round((r - er) / sqrt(vr), 6) END AS z
    FROM g
    """,
    "Wald–Wolfowitz runs test per user series (operators/windows.py "
    "runs_test — randomness-of-sequence against each user's own "
    "discrete median, time order with value tiebreak): too FEW runs "
    "= trending/sticky values, too MANY = oscillation; the "
    "model-free stationarity screen a series pipeline runs before "
    "trusting q184's trend slope. Median is the exact rank-⌈n/2⌉ "
    "per-key order statistic (one window, no interpolation); "
    "at-median ties are EXCLUDED from the sign sequence and "
    "reported in n_ties (the classical convention, pinned); runs "
    "count flips through ONE per-key lag window; the closed-form "
    "moments finalize in fixed-order doubles — all per-key windows, "
    "no global sort. Monotone 1..9 pin: exactly 2 runs, z negative "
    "from the closed form; an all-tied series emits no row.",
)
def q330(spark, sf_dir):
    return runs_test(_t(spark, sf_dir, "events"), "user_id", "ts", "value")


_SC_STEP = 3600
_SC_US = _SC_STEP * 1_000_000


@q(
    "q331_step_change",
    f"""
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e,
                        CAST(value AS DOUBLE) AS v
                 FROM events
                 WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (SELECT k, unnest(range(
               CAST(ceil(lo / {_SC_US}.0) * {_SC_US} AS BIGINT),
               CAST(floor(hi / {_SC_US}.0) * {_SC_US} AS BIGINT) + 1,
               {_SC_US})) AS e
             FROM spans),
    rs AS (SELECT g.k, g.e // 1000000 AS t, o.v
           FROM grid g ASOF JOIN obs o ON g.k = o.k AND o.e <= g.e),
    pool AS (SELECT k, t, CAST(round(v * 1000000) AS BIGINT) AS q
             FROM rs WHERE v IS NOT NULL),
    pref AS (SELECT k, t, ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) AS i,
               SUM(q) OVER (PARTITION BY k ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS si,
               COUNT(*) OVER (PARTITION BY k) AS n,
               SUM(q) OVER (PARTITION BY k) AS s
             FROM pool),
    cand AS (SELECT *, CAST(si AS DOUBLE) / i / 1000000 AS ml,
                    CAST(s - si AS DOUBLE) / (n - i) / 1000000 AS mr
             FROM pref WHERE i < n),
    sc AS (SELECT k, t, n, ml, mr, mr - ml AS d,
                 CAST(round(abs(mr - ml) * 1000000) AS BIGINT) AS qd
           FROM cand),
    best AS (SELECT * FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                            ORDER BY qd DESC, t ASC) AS rn
               FROM sc) WHERE rn = 1)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n_slots,
           CAST(t AS BIGINT) AS split_slot_epoch,
           round(ml, 6) AS mean_before, round(mr, 6) AS mean_after,
           round(d, 6) AS shift
    FROM best
    """,
    "Single step-change locator per user series "
    "(operators/windows.py step_change_report — best mean-shift "
    "split over the hourly LOCF grid, the offline change-point "
    "sibling of q199's online CUSUM): argmax over split candidates "
    "of |mean_after − mean_before|, locating WHERE a level shifted "
    "and by how much — the first question after q142 flags an "
    "anomaly. Rides the SHARED resample machinery (per-key hourly "
    "grid + as-of LOCF fill, the q192 path, NO new pass shape); "
    "split scoring is prefix sums over micro-quantized values in "
    "ONE per-key window — every candidate mean is an exact integer "
    "sum divided once, the argmax tiebreak is quantized-|shift| "
    "DESC then earliest slot (deterministic across engines). "
    "Planted 6×10→6×20 pin: split on the last level-10 slot, means "
    "(10, 20), shift exactly 10.",
)
def q331(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan(F.col("value"))
    )
    return step_change_report(ev, "user_id", "ts", "value", _SC_STEP)


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------


@q(
    "q324_template_prefixes",
    """
    WITH pool AS (
      SELECT source AS s, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    pp AS (SELECT s,
             array_to_string(toks[1:5], ' ') AS pre,
             array_to_string(
               CASE WHEN len(toks) <= 5 THEN toks
                    ELSE toks[len(toks)-4:len(toks)] END, ' ') AS suf
           FROM pool),
    base AS (SELECT s, COUNT(*) AS nd, COUNT(DISTINCT pre) AS dp
             FROM pp GROUP BY s),
    pc AS (SELECT s, pre, COUNT(*) AS c FROM pp GROUP BY 1, 2),
    tp AS (SELECT s, pre, c FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY s
                                          ORDER BY c DESC, pre ASC) AS rn
             FROM pc) WHERE rn = 1),
    sc AS (SELECT s, suf, COUNT(*) AS c FROM pp GROUP BY 1, 2),
    tsx AS (SELECT s, suf, c FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY s
                                          ORDER BY c DESC, suf ASC) AS rn
             FROM sc) WHERE rn = 1)
    SELECT base.s AS source, CAST(nd AS BIGINT) AS n_docs,
           tp.pre AS top_prefix, CAST(tp.c AS BIGINT) AS top_prefix_n,
           round(CAST(tp.c AS DOUBLE) / nd, 6) AS top_prefix_share,
           round(CAST(dp AS DOUBLE) / nd, 6) AS distinct_prefix_ratio,
           tsx.suf AS top_suffix, CAST(tsx.c AS BIGINT) AS top_suffix_n,
           round(CAST(tsx.c AS DOUBLE) / nd, 6) AS top_suffix_share
    FROM base JOIN tp ON tp.s = base.s JOIN tsx ON tsx.s = base.s
    """,
    "Template-prefix/suffix report per source (operators/text.py "
    "template_prefix_report — top first-5/last-5-token grams with "
    "shares and the distinct-prefix ratio): boilerplate openings "
    "('terms of service…') and canned sign-offs are the highest-"
    "yield template signal in scraped corpora — a top-prefix share "
    "near 1 or a distinct ratio near 0 marks a source as "
    "template-generated BEFORE q107's line-level boilerplate pass "
    "spends effort inside documents. Slices are JVM-side split/"
    "slice expressions (narrow codegen map — bodies never shuffle; "
    "only 5-token grams move), per-source winners are window top-1 "
    "with count-DESC then LEXICOGRAPHIC tiebreak (deterministic "
    "cross-engine), shares finalize in fixed order. Short docs "
    "contribute their whole text (pinned). 3-of-4 planted-opening "
    "pin: share 0.75, distinct ratio 0.5.",
)
def q324(spark, sf_dir):
    return template_prefix_report(
        _t(spark, sf_dir, "documents"), "source", "text", k=5
    )


@q(
    "q325_code_detect",
    f"""
    WITH pool AS (
      SELECT source AS s, length(text) AS nc,
             length(text)
               - length(regexp_replace(text, '{_CODE_SYMBOLS}', '', 'g'))
               AS sym,
             len(regexp_extract_all(text, '{_CODE_KEYWORDS}')) AS kw,
             len(string_split(text, ' ')) AS ntk
      FROM documents WHERE text IS NOT NULL AND length(text) > 0),
    scored AS (SELECT s,
        CAST(round(CAST(sym AS DOUBLE) / nc * 1000000) AS BIGINT) AS qsd,
        CAST(round(CAST(kw AS DOUBLE) / ntk * 1000000) AS BIGINT) AS qkd,
        CASE WHEN CAST(sym AS DOUBLE) / nc >= 0.03
                  OR CAST(kw AS DOUBLE) / ntk >= 0.01
             THEN 1 ELSE 0 END AS code
      FROM pool),
    a AS (SELECT s, COUNT(*) AS nd, SUM(code) AS cd,
                 SUM(qsd) AS ssd, SUM(qkd) AS skd
          FROM scored GROUP BY s)
    SELECT s AS source, CAST(nd AS BIGINT) AS n_docs,
           CAST(cd AS BIGINT) AS code_docs,
           round(CAST(cd AS DOUBLE) / nd, 6) AS code_frac,
           round(CAST(ssd AS DOUBLE) / nd / 1000000, 6)
             AS mean_symbol_density,
           round(CAST(skd AS DOUBLE) / nd / 1000000, 6)
             AS mean_keyword_density
    FROM a
    """,
    "Code detection report per source (operators/text.py "
    "code_detect_report — symbol density over characters + "
    "programming-keyword density over tokens, thresholded OR): "
    "code-vs-prose mix is a first-class training-data mixing axis "
    "(q105/q110 want it as an input), and a prose source suddenly "
    "full of brackets is a scraper bug. Both densities are pure "
    "JVM regex counts in ONE narrow codegen map (the mojibake/q267 "
    "char-class pattern — no Python, no explode; bodies never "
    "shuffle), micro-quantized per doc so per-source means sum "
    "identical integers in both engines; empty docs are excluded "
    "(no density exists, pinned). Planted-pin: a def/return line "
    "trips both densities, prose trips neither — exact counted "
    "densities on hand strings.",
)
def q325(spark, sf_dir):
    return code_detect_report(_t(spark, sf_dir, "documents"), "source", "text")


@q(
    "q333_vocab_coverage",
    """
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents WHERE text IS NOT NULL),
    tc AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    freq AS (SELECT c, COUNT(*) AS nt, COUNT(*) * c AS mass FROM tc GROUP BY c),
    cum AS (SELECT c, nt, mass, SUM(nt) OVER (ORDER BY c) AS cn,
                   SUM(mass) OVER (ORDER BY c) AS cm
            FROM freq),
    tot AS (SELECT SUM(nt) AS v, SUM(mass) AS m FROM freq)
    SELECT c AS min_count, CAST(nt AS BIGINT) AS n_types_at,
           CAST(v - (cn - nt) AS BIGINT) AS types_ge,
           CAST(m - (cm - mass) AS BIGINT) AS mass_ge,
           round(CAST(m - (cm - mass) AS DOUBLE) / m, 6) AS coverage
    FROM cum, tot
    """,
    "Vocabulary coverage curve (operators/text.py "
    "vocab_coverage_curve — for every min-count cutoff, how many "
    "types survive and what fraction of the token MASS they cover): "
    "the exact curve a tokenizer-vocab or min_df decision reads — "
    "q106 builds ONE vocab at ONE cutoff, this prices EVERY cutoff "
    "in a single pass. Scale shape: token volume collapses to the "
    "(count → n_types) count-of-counts frame first (bounded by "
    "distinct frequencies, ~hundreds of rows), then the cumulative "
    "types/mass ride _ranged_cumsum over that tiny frame — no "
    "global sort, no single-partition window anywhere near data "
    "volume. Counts and masses stay exact integers end-to-end; the "
    "one division per row is the finalize. 'x x x y y z' pin: "
    "cutoffs 1/2/3 keep 3/2/1 types covering 6/5/3 of 6 tokens; "
    "coverage is monotone non-increasing (asserted).",
)
def q333(spark, sf_dir):
    return vocab_coverage_curve(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal family
# ---------------------------------------------------------------------------

# the arith_raw_images channel formula as a SQL fragment (p = pixel
# index expression, k = channel)
_CF_CH = "((31*m + 7*(p*3 + {k}) + ((p*3 + {k})*(p*3 + {k})) % 251) % 256)"


def _rnd6_sql(expr: str) -> str:
    """floor(|x|·1e6 + 0.5)·sign(x)/1e6 — the shared half-away recipe."""
    return (
        f"CASE WHEN ({expr}) >= 0 THEN floor(({expr}) * 1000000 + 0.5)"
        f" ELSE -floor(-({expr}) * 1000000 + 0.5) END / 1000000"
    )


_CF_R, _CF_G, _CF_B = (_CF_CH.format(k=k) for k in (0, 1, 2))


@q(
    "q326_image_colorfulness",
    f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    v AS (SELECT m, {_CF_R} - {_CF_G} AS rg,
                 {_CF_R} + {_CF_G} - 2*({_CF_B}) AS yb2 FROM px),
    s AS (SELECT m, COUNT(*) AS n,
            SUM(rg) AS sr, SUM(CAST(rg AS HUGEINT) * rg) AS srr,
            SUM(yb2) AS sy, SUM(CAST(yb2 AS HUGEINT) * yb2) AS syy
          FROM v GROUP BY m),
    e AS (SELECT m, n,
            (CAST(srr AS DOUBLE)
             - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / n AS vr,
            ((CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n) / 4.0 AS vy,
            CAST(sr AS DOUBLE) / n AS mr,
            (CAST(sy AS DOUBLE) / n) / 2.0 AS my
          FROM s)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_px,
           {_rnd6_sql('mr')} AS mean_rg,
           {_rnd6_sql('my')} AS mean_yb,
           {_rnd6_sql('sqrt(vr)')} AS std_rg,
           {_rnd6_sql('sqrt(vy)')} AS std_yb,
           {_rnd6_sql('sqrt(vr + vy) + 0.3 * sqrt(mr*mr + my*my)')}
             AS colorfulness
    FROM e
    """,
    "Hasler–Süsstrunk colorfulness per image "
    "(operators/multimodal.py image_colorfulness — opponent-space "
    "rg = R−G, yb = (R+G)/2 − B moments combined as "
    "√(σ²rg+σ²yb) + 0.3·√(µ²rg+µ²yb)): grayscale scans, faded "
    "captures, and synthetic flat fills score near 0 — the "
    "color-health screen a vision ingest runs beside q285's "
    "exposure and q294's cast reports. The opponent sums are EXACT "
    "integers accumulated INSIDE the Arrow batch (yb doubles to "
    "R+G−2B to stay integral; HUGEINT squares in the oracle, int64 "
    "in the batch — payloads never shuffle, one row per image "
    "leaves the map); variance/mean finalize in the double domain "
    "with the shared half-away µ-unit round. The oracle regenerates "
    "every pixel of the arithmetic RAW8 fixture. Pins: gray frame "
    "= exactly 0; pure red = 0.3·√(255² + 127.5²) with zero "
    "opponent variance.",
)
def q326(spark, sf_dir):
    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    return image_colorfulness(imgs)


@q(
    "q327_audio_zero_crossing",
    """
    WITH t AS (SELECT unnest(range(32)) AS m),
    s AS (SELECT m, unnest(range(2048)) AS i FROM t),
    v AS (SELECT m, i, (17*m + 11*i + (i*i) % 89) % 256 AS val FROM s),
    l AS (SELECT m, val >= 128 AS nn,
                 LAG(val >= 128) OVER (PARTITION BY m ORDER BY i) AS pn
          FROM v),
    a AS (SELECT m, COUNT(*) AS n,
                 SUM(CASE WHEN pn IS NOT NULL AND nn <> pn THEN 1 ELSE 0 END)
                   AS c
          FROM l GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(c AS BIGINT) AS n_crossings,
           round(CAST(c AS DOUBLE) / (n - 1), 6) AS zcr
    FROM a
    """,
    "Audio zero-crossing rate per clip (operators/multimodal.py "
    "audio_zero_crossing — sign changes about the unsigned-PCM "
    "midline 128, normalized by n−1): THE classic cheap "
    "voiced/unvoiced/noise discriminator — high ZCR = fricatives "
    "or hiss, low = voiced tones or rumble; beside q284's SNR and "
    "q260's clipping it completes the no-decode audio-QC triple. "
    "The crossing count is one vectorized sign-diff reduction "
    "INSIDE the Arrow batch (payload bytes never shuffle; one row "
    "per clip leaves the map); the count is an exact integer, the "
    "single division is the finalize. The oracle regenerates every "
    "sample of the arithmetic PCM fixture and replays the "
    "lag-compare. Pins: alternating 127/128 → zcr exactly 1; "
    "constant clip → 0; a single-sample clip reports NULL (no "
    "pairs), never 0/0.",
)
def q327(spark, sf_dir):
    clips = arith_raw_audio(spark, n=32, n_samples=2048)
    return audio_zero_crossing(clips)


@q(
    "q328_video_loop_detect",
    """
    WITH vv AS (SELECT unnest(range(24)) AS m),
    ff AS (SELECT m, unnest(range(12)) AS f FROM vv),
    by_ AS (SELECT m, f, unnest(range(576)) AS i FROM ff),
    cs AS (SELECT m, f,
             SUM(((31*m + 7*i + (i*i) % 251
                   + (f % 4) * (CASE WHEN i < 12 THEN 1 ELSE 0 END)) % 256)
                 * (i + 1)) AS w
           FROM by_ GROUP BY 1, 2),
    g AS (SELECT m, f - LAG(f) OVER (PARTITION BY m, w ORDER BY f) AS gap
          FROM cs),
    gg AS (SELECT m, gap FROM g WHERE gap IS NOT NULL),
    pg AS (SELECT m, gap, COUNT(*) AS c FROM gg GROUP BY 1, 2),
    dom AS (SELECT m, gap, c FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY m
                                           ORDER BY c DESC, gap ASC) AS rn
              FROM pg) WHERE rn = 1),
    rep AS (SELECT m, SUM(c) AS np, MIN(gap) AS mg FROM pg GROUP BY m),
    base AS (SELECT m, COUNT(*) AS nf, COUNT(DISTINCT w) AS ndist
             FROM cs GROUP BY m)
    SELECT CAST(base.m AS BIGINT) AS media_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(ndist AS BIGINT) AS n_distinct_frames,
           CAST(COALESCE(np, 0) AS BIGINT) AS n_repeat_pairs,
           CAST(mg AS INTEGER) AS min_repeat_gap,
           CAST(dom.gap AS INTEGER) AS dominant_gap,
           CAST(dom.c AS BIGINT) AS dominant_gap_n
    FROM base LEFT JOIN rep ON rep.m = base.m LEFT JOIN dom ON dom.m = base.m
    """,
    "Video loop detection per clip (operators/multimodal.py "
    "video_loop_detect — byte-identical frame recurrence gaps via "
    "the position-weighted integer checksum, dominant/min gap "
    "report): animated-GIF-style loops and stutter-repeats inflate "
    "a video corpus with near-zero information — the loop PERIOD "
    "(dominant gap) is what q295's freeze detector (gap 1 = "
    "freeze) can't see. Each frame reduces to ONE int64 checksum "
    "inside the Arrow batch (payloads never shuffle); recurrence "
    "gaps are a per-(video, checksum) lag window over the tiny "
    "checksum frame; the dominant gap is window top-1 with "
    "count-DESC, gap-ASC tiebreak. Loop-free clips report zero "
    "repeat pairs and NULL gaps via left joins (pinned); period 1 "
    "degenerates to a freeze and AGREES with video_freeze_detect "
    "(cross-detector pin). Planted period-4 fixture: every clip "
    "reports 4 distinct frames, 8 repeat pairs, dominant gap 4.",
)
def q328(spark, sf_dir):
    frames = arith_video_frames_looped(spark, n_videos=24, n_frames=12, period=4)
    return video_loop_detect(frames)


_SY_CH = "((31*m + 7*({p}*3 + {k}) + (({p}*3 + {k})*({p}*3 + {k})) % 251) % 256)"


def _sym_gray(p: str) -> str:
    return " + ".join(_SY_CH.format(p=p, k=k) for k in (0, 1, 2))


@q(
    "q334_image_symmetry",
    f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    yy AS (SELECT m, unnest(range(12)) AS y FROM mm),
    xx AS (SELECT m, y, unnest(range(8)) AS x FROM yy),
    pp AS (SELECT m, y*16 + x AS p1, y*16 + (15 - x) AS p2 FROM xx),
    g AS (SELECT m, {_sym_gray('p1')} AS g1, {_sym_gray('p2')} AS g2 FROM pp),
    a AS (SELECT m, COUNT(*) AS np, SUM(abs(g1 - g2)) AS diff,
                 SUM(g1 + g2) AS hm
          FROM g GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(np AS BIGINT) AS n_px_pairs,
           CAST(diff AS BIGINT) AS diff_mass, CAST(hm AS BIGINT) AS half_mass,
           CASE WHEN hm > 0 THEN
             {_rnd6_sql('1.0 - CAST(diff AS DOUBLE) / hm')} END
             AS symmetry_score
    FROM a
    """,
    "Horizontal mirror symmetry per image (operators/multimodal.py "
    "image_symmetry — 1 − |left − mirrored-right| mass over total "
    "half mass on grayscale sums): logos, card templates, UI "
    "chrome, and synthetic placeholders are strongly mirror-"
    "symmetric while natural photos are not — a high score beside "
    "q261's border-uniformity flags non-photographic content "
    "before embedding budget is spent. Both halves pair INSIDE the "
    "Arrow batch (x paired with width−1−x per row — payloads never "
    "shuffle, one row per image leaves the map); diff and half "
    "masses are exact integers, the score is one fixed-order "
    "division with the shared half-away round. The oracle "
    "regenerates both halves pixel-for-pixel. Pins: mirror frame "
    "scores exactly 1; all-black reports NULL (0/0 guarded); "
    "half-white/half-black scores exactly 0.",
)
def q334(spark, sf_dir):
    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    return image_symmetry(imgs)


@q(
    "q337_video_shot_stats",
    f"""
    WITH frames AS (
      SELECT v.vid, f.f,
             CASE WHEN f.f < 6 THEN v.vid ELSE v.vid + 500 END AS m
      FROM (SELECT unnest(range(24)) AS vid) v,
           (SELECT unnest(range(12)) AS f) f),
    hh AS (SELECT vid, f, {{scene_hash}} AS hv FROM frames),
    signed AS (
      SELECT vid, f,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - CAST('18446744073709551616' AS HUGEINT)
                       ELSE hv END AS BIGINT) AS dhash
      FROM hh),
    lagged AS (
      SELECT vid, f, dhash,
             LAG(dhash) OVER (PARTITION BY vid ORDER BY f) AS ph
      FROM signed),
    marked AS (
      SELECT vid, f,
             CASE WHEN ph IS NULL OR bit_count(xor(dhash, ph)) > 10
                  THEN 1 ELSE 0 END AS st
      FROM lagged),
    ids AS (SELECT vid, f, SUM(st) OVER (PARTITION BY vid ORDER BY f) AS shot
            FROM marked),
    shots AS (SELECT vid, shot, COUNT(*) AS len FROM ids GROUP BY 1, 2),
    a AS (SELECT vid, SUM(len) AS nf, COUNT(*) AS ns,
                 MAX(len) AS lg, MIN(len) AS sh
          FROM shots GROUP BY vid)
    SELECT CAST(vid AS BIGINT) AS media_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(ns - 1 AS BIGINT) AS n_cuts, CAST(ns AS BIGINT) AS n_shots,
           round(CAST(nf AS DOUBLE) / ns, 6) AS mean_shot_frames,
           CAST(lg AS BIGINT) AS longest_shot_frames,
           CAST(sh AS BIGINT) AS shortest_shot_frames
    FROM a
    """.format(scene_hash=_scene_hash_sql(16, 12, 12)),
    "Video shot-structure stats (operators/multimodal.py "
    "video_shot_stats — q239's dHash cut signal turned into "
    "per-video shot-length islands: shot count, mean/longest/"
    "shortest shot): shot rhythm separates slideshows (few long "
    "shots) from music-video cuts (many short) — the structural "
    "prior a frame-sampling policy (q65/q248) should condition on. "
    "dHashes compute inside the Arrow batch (payloads never "
    "shuffle), cut marks are ONE per-video lag window with the "
    "shared Hamming threshold, and shot ids are the gaps-and-"
    "islands running sum over cut marks — all per-key windows on "
    "the tiny hash frame. The shot axis counts ROWS, so "
    "sampled/gapped frame indices still form one shot when content "
    "is continuous (pinned). Planted cut at frame 6: every clip is "
    "exactly two 6-frame shots (full value oracle regenerating "
    "every dHash).",
)
def q337(spark, sf_dir):
    frames = arith_video_frames(
        spark, n_videos=24, n_frames=12, cut_at=6, width=16, height=12,
        delta_bytes=12,
    )
    return video_shot_stats(frames, max_hamming=10)


# ---------------------------------------------------------------------------
# similarity family
# ---------------------------------------------------------------------------

_DT_DOT = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range(1, {d}), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def _dt_ranked(tag: str, d: int) -> str:
    dot = _DT_DOT.format(a="q.embedding", b="c.embedding", d=d + 1)
    nq = _DT_DOT.format(a="q.embedding", b="q.embedding", d=d + 1)
    nc = _DT_DOT.format(a="c.embedding", b="c.embedding", d=d + 1)
    return f"""
    scored_{tag} AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS sim
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id),
    e_{tag} AS (
      SELECT qid, nid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid ASC) AS rn
        FROM scored_{tag}) WHERE rn <= 5)"""


@q(
    "q329_dim_truncation",
    f"""
    WITH {_dt_ranked('f', 64)},
    {_dt_ranked('t', 32)},
    hits AS (SELECT e_f.qid, COUNT(*) AS h
             FROM e_f JOIN e_t ON e_t.qid = e_f.qid AND e_t.nid = e_f.nid
             GROUP BY e_f.qid),
    per AS (SELECT q.qid, COALESCE(h.h, 0) AS h
            FROM (SELECT DISTINCT qid FROM e_f) q
            LEFT JOIN hits h ON h.qid = q.qid),
    sc AS (SELECT CAST(round(CAST(h AS DOUBLE) / 5 * 1000000) AS BIGINT) AS qr,
                  CASE WHEN h = 5 THEN 1 ELSE 0 END AS fl
           FROM per),
    a AS (SELECT COUNT(*) AS nq, SUM(qr) AS sr, SUM(fl) AS nf FROM sc)
    SELECT CAST(nq AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
           CAST(32 AS INTEGER) AS trunc_dim,
           CASE WHEN nq > 0 THEN
             round(CAST(sr AS DOUBLE) / nq / 1000000, 6) END AS mean_recall,
           CASE WHEN nq > 0 THEN
             round(CAST(nf AS DOUBLE) / nq, 6) END AS frac_full_recall
    FROM a
    """,
    "Matryoshka-style dimension-truncation recall report "
    "(operators/similarity.py dim_truncation_report — recall@5 of "
    "the 32-dim PREFIX ranking against the full 64-dim ranking): "
    "halving stored dims halves ANN memory and doubles scan speed "
    "IF the prefix carries the geometry — this measures exactly "
    "that trade before anyone re-encodes a corpus; the q66/q335 "
    "IVF/PQ reports' cheaper sibling (truncation needs no "
    "codebook). Both rankings reuse the shared brute top-k at the "
    "fixture scale (the oracle-baseline role — the production swap "
    "is lsh_topk edges, the q338 pattern); overlap counting is an "
    "equi-join on (query, neighbor), per-query recalls "
    "micro-quantize so the means sum identical integers. Pins: "
    "prefix-carried geometry → recall exactly 1; a planted vector "
    "whose TAIL flips the full ranking → recall < 1.",
)
def q329(spark, sf_dir):
    return dim_truncation_report(_t(spark, sf_dir, "embeddings"), k=5, trunc_dim=32)


_PQ_SUBDIST = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range((s.j - 1) * 16 + 1, (s.j - 1) * 16 + 17), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) "
    "* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))), "
    "(x, y) -> x + y)"
)
_PQ_SELFDOT = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range(1, 65), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


@q(
    "q335_pq_reconstruction",
    f"""
    WITH cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
                       embedding AS cvec
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id LIMIT 16)),
    sub AS (SELECT unnest(range(1, 5)) AS j),
    enc AS (SELECT e.vec_id, s.j, MIN({_PQ_SUBDIST}) AS mind
            FROM embeddings e CROSS JOIN cb c CROSS JOIN sub s
            GROUP BY 1, 2),
    pv AS (SELECT vec_id, SUM(CAST(round(mind * 1000000) AS BIGINT)) AS eq
           FROM enc GROUP BY vec_id),
    nr AS (SELECT vec_id, CAST(round({_PQ_SELFDOT} * 1000000) AS BIGINT) AS nq
           FROM embeddings e),
    a AS (SELECT COUNT(*) AS n, SUM(CAST(eq AS HUGEINT)) AS se,
                 SUM(CAST(nq AS HUGEINT)) AS sn
          FROM pv JOIN nr USING (vec_id))
    SELECT CAST(n AS BIGINT) AS n_vectors, CAST(4 AS INTEGER) AS m,
           CAST(16 AS INTEGER) AS k_codes,
           round(CAST(se AS DOUBLE) / n / 1000000, 6) AS mean_sq_error,
           round(CAST(sn AS DOUBLE) / n / 1000000, 6) AS mean_vec_sq_norm,
           CASE WHEN CAST(sn AS DOUBLE) / n / 1000000 > 0 THEN
             round((CAST(se AS DOUBLE) / n / 1000000)
                   / (CAST(sn AS DOUBLE) / n / 1000000), 6) END AS rel_error
    FROM a
    """,
    "Product-quantization reconstruction-error report "
    "(operators/similarity.py pq_reconstruction_error — encode "
    "distortion of the m=4 × 16-code PQ codebook, absolute and "
    "relative to mean vector energy): the storage-side twin of "
    "q203's recall gate — rel_error prices what the 64-float → "
    "4-byte compression DESTROYS before a corpus commits to it. "
    "Reuses q125 pq_topk's codebook construction and _sq_subdist "
    "encode verbatim (one implementation), keeping the per-"
    "subspace argmin distance instead of discarding it; per-vector "
    "errors micro-quantize so both engines sum identical integers "
    "(HUGEINT corpus totals), two divisions at finalize. The "
    "codebook broadcast is bounded (k_codes rows); the encode is "
    "the same broadcast-join shape the IVF family pins. Pins: a "
    "corpus that IS the codebook reconstructs exactly (mse 0); a "
    "midpoint vector loses the hand-computed 0.5 + 0.5.",
)
def q335(spark, sf_dir):
    return pq_reconstruction_error(_t(spark, sf_dir, "embeddings"), m=4, k_codes=16)


# ---------------------------------------------------------------------------
# third tranche: Jonckheere–Terpstra
# ---------------------------------------------------------------------------


@q(
    "q336_jonckheere_terpstra",
    """
    WITH pool AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    pv AS (SELECT g, v, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    cum AS (SELECT g, v, c, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cc
            FROM pv),
    gs AS (SELECT g, SUM(c) AS n FROM pv GROUP BY g),
    pairs AS (SELECT a.g AS gi, b.g AS gj FROM gs a, gs b WHERE a.g < b.g),
    jrows AS (SELECT p.gi, p.gj, j.v, j.c
              FROM pairs p JOIN pv j ON j.g = p.gj),
    m AS (SELECT jr.gi, jr.gj, jr.v, jr.c, ci.v AS vr, ci.cc, ci.c AS cic
          FROM jrows jr ASOF LEFT JOIN cum ci
          ON ci.g = jr.gi AND ci.v <= jr.v),
    terms AS (SELECT c * (2 * (COALESCE(cc, 0)
                               - CASE WHEN vr = v THEN cic ELSE 0 END)
                          + CASE WHEN vr = v THEN cic ELSE 0 END) AS u2
              FROM m),
    jt AS (SELECT COALESCE(SUM(CAST(u2 AS HUGEINT)), 0) AS jt2 FROM terms),
    mom AS (SELECT SUM(n) AS nn, COUNT(*) AS k,
                   SUM(CAST(n AS HUGEINT) * n) AS sn2,
                   SUM(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS sn23
            FROM gs),
    e AS (SELECT jt2, nn, k,
            (CAST(nn AS DOUBLE) * nn - CAST(sn2 AS DOUBLE)) / 4 AS mean_jt,
            (CAST(nn AS DOUBLE) * nn * (2 * nn + 3)
             - CAST(sn23 AS DOUBLE)) / 72 AS var_jt
          FROM jt, mom)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n,
           round(CAST(jt2 AS DOUBLE) / 2, 6) AS jt_stat,
           CASE WHEN k >= 2 THEN round(mean_jt, 6) END AS mean_jt,
           CASE WHEN k >= 2 THEN round(var_jt, 6) END AS var_jt,
           CASE WHEN k >= 2 AND var_jt > 0 THEN
             round((CAST(jt2 AS DOUBLE) / 2 - mean_jt) / sqrt(var_jt), 6)
           END AS z
    FROM e
    """,
    "Jonckheere–Terpstra ordered-alternative trend test over "
    "event-type value pools (operators/stats.py "
    "jonckheere_terpstra — Σ pairwise Mann–Whitney U counts in "
    "group label order): when the k groups have a NATURAL order "
    "(dose, tier, severity), JT beats Kruskal–Wallis by testing "
    "the monotone alternative directly — the companion q269's "
    "Mann–Kendall gives for time. Scale shape: NO pairwise row "
    "join — each group collapses to (value → cumulative count) "
    "cells, and every cross-group U reads off ONE asof_join probe "
    "of the later group's values into the earlier group's "
    "cumulatives (value-level × group-pairs rows, ties split via "
    "the doubled-U integer channel — jt2 is exact end-to-end). "
    "The no-tie large-sample moments are documented; z finalizes "
    "in fixed-order doubles. Pins: perfectly ordered groups hit "
    "JT = Σnᵢnⱼ exactly; reversed order hits 0 with z negated; "
    "an all-tied pool lands exactly on the null mean (z = 0).",
)
def q336(spark, sf_dir):
    return jonckheere_terpstra(_t(spark, sf_dir, "events"), "event_type", "value")
