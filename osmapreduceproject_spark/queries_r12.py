"""Round-12 catalog tranche: the staged-operator declarations (q275–q286).

Every entry was pre-verified a round early — its Spark body and oracle
SQL are the same (body, SQL) pair its parity test ran green before
declaration (tests/test_r13_oracles.py, SURVEY.md §8 staging
discipline, fifth tranche after r8/r9/r10/r11; the whole suite
additionally re-ran green under the hostile Australia/Eucla session
zone before the declaring round opened, and all four ADVICE r11
findings were closed IN the staged wave before declaration —
seasonal_decompose's NULL-slot exclusion, ljung_box's documented
NULL-slot caveat, image_exposure's half-up term quantization,
odds_ratio's zero-cell floor). Split out of queries.py for file
hygiene; the registration decorator, fixture readers, and
cross-engine float rules (queries.py module docstring) are shared.

Imported by queries.py immediately before the verdict-window rotation,
so these entries participate in the same QUERIES dict, the same
tests/test_oracle_parity.py sweep, and the same driver grading.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.events import max_concurrency
from .operators.joins import point_in_interval_join
from .operators.multimodal import (
    arith_raw_audio_dither,
    arith_raw_images,
    audio_snr_report,
    image_exposure_report,
)
from .operators.similarity import silhouette_report
from .operators.stats import chi2_gof, group_diversity, odds_ratio, trimmed_mean
from .operators.text import tokenizer_fertility
from .operators.windows import ljung_box, seasonal_decompose
from .queries import _t, q
from .queries_r11 import _COHESION_DOT, _COHESION_NORM, _MK_RS_CTE


@q(
    "q275_odds_ratio",
    """
    WITH r AS (SELECT (n_chars >= 200) AS a,
                      (len(string_split(text, ' ')) >= 30) AS b
               FROM documents),
    p AS (SELECT a, b FROM r WHERE a IS NOT NULL AND b IS NOT NULL),
    s AS (SELECT COUNT(*) AS n,
                 COALESCE(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END), 0) AS n11,
                 COALESCE(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END), 0) AS n10,
                 COALESCE(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END), 0) AS n01,
                 COALESCE(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END), 0) AS n00
          FROM p),
    e AS (SELECT *,
            (CAST(n11 AS DOUBLE) * CAST(n00 AS DOUBLE))
              / (CAST(n10 AS DOUBLE) * CAST(n01 AS DOUBLE)) AS odds,
            sqrt(1.0 / CAST(n11 AS DOUBLE) + 1.0 / CAST(n10 AS DOUBLE)
                 + 1.0 / CAST(n01 AS DOUBLE) + 1.0 / CAST(n00 AS DOUBLE)) AS se,
            n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0 AS ok
          FROM s)
    SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
           CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
           CAST(n00 AS BIGINT) AS n00,
           CASE WHEN ok THEN round(odds, 6) END AS odds_ratio,
           CASE WHEN ok THEN round(ln(odds), 6) END AS log_or,
           CASE WHEN ok THEN round(exp(ln(odds) - 1.96 * se), 6) END AS or_ci_lo,
           CASE WHEN ok THEN round(exp(ln(odds) + 1.96 * se), 6) END AS or_ci_hi
    FROM e
    """,
    "2×2 odds ratio with the Wald log-OR confidence interval "
    "(operators/stats.py odds_ratio, the q243 rater pair: "
    "length≥200-chars × tokens≥30): does tripping filter A change the "
    "odds of tripping filter B — the association readout beside "
    "q270's single-proportion Wilson CI. ONE conditional-count scan "
    "produces four exact integer cells (NULL flags excluded — a "
    "missing rating is not a False; an EMPTY pool reports four ZERO "
    "cells, never NULL counts — the chi2_gof convention, ADVICE r11); "
    "OR and the exponentiated log-scale CI are fixed-order double "
    "expressions over those integers both engines replay. Any zero "
    "cell → NULL OR/CI, never ±inf (Haldane correction is a modeling "
    "choice, not a default). Hand 2×2 (OR = 33), zero-cell, "
    "NULL-flag, and empty-pool pins unit-tested.",
)
def q275(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # NULL text must leave rater_b NULL (excluded by odds_ratio's pool)
    # like the oracle's len(string_split(NULL)) — bare F.size() returns
    # -1 on NULL, a non-NULL False the oracle would not count (the q286
    # F.size convention; review finding, r12)
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split(F.col("text"), " ")) >= 30,
        ).alias("rater_b"),
    )
    return odds_ratio(rated, "rater_a", "rater_b")


@q(
    "q276_chi2_gof",
    """
    WITH c AS (SELECT event_type, COUNT(*) AS o FROM events GROUP BY 1),
    s AS (SELECT SUM(o) AS n, COUNT(*) AS k,
                 SUM(CAST(o AS HUGEINT) * o) AS oo
          FROM c)
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_levels,
           CAST(k - 1 AS BIGINT) AS dof,
           CASE WHEN k >= 2 THEN
             round(CAST(k AS DOUBLE) * CAST(oo AS DOUBLE) / n - n, 6)
           END AS chi2
    FROM s
    """,
    "Chi-squared goodness-of-fit against the uniform distribution "
    "(operators/stats.py chi2_gof over event_type): the 'is this "
    "split balanced' one-liner for hash buckets, k-fold assignments, "
    "and shard keys — the statistical sibling of q112's shard "
    "accounting. χ² = (k/n)·Σo² − n needs only Σo², so ZERO per-cell "
    "float sums exist to diverge across engines: one map-side-combined "
    "count, exact DECIMAL(38,0) integer moments, a single fixed-order "
    "double expression at the end. Degenerate inputs floor cleanly — "
    "single level (n, 1, 0, NULL), empty input (0, 0, 0, NULL), never "
    "a negative dof or NULL count (review pin, r11); the hand "
    "50/30/20 → χ²=14 and uniform → 0 cases unit-pinned.",
)
def q276(spark, sf_dir):
    return chi2_gof(_t(spark, sf_dir, "events"), "event_type")


@q(
    "q277_trimmed_mean",
    """
    WITH pool AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
    cuts AS (SELECT unnest([0.1, 0.9]) AS p,
                    unnest(quantile_disc(v, [0.1, 0.9])) AS q
             FROM pool),
    lo AS (SELECT q FROM cuts WHERE p = 0.1),
    hi AS (SELECT q FROM cuts WHERE p = 0.9),
    s AS (SELECT COUNT(*) AS n,
                 SUM(CASE WHEN v >= lo.q AND v <= hi.q THEN 1 ELSE 0 END)
                   AS n_kept,
                 SUM(CASE WHEN v >= lo.q AND v <= hi.q THEN
                       CAST(round(v * 1000000) AS HUGEINT) END) AS sq
          FROM pool, lo, hi)
    SELECT CAST(n AS BIGINT) AS n, CAST(n_kept AS BIGINT) AS n_kept,
           lo.q AS lo_cut, hi.q AS hi_cut,
           CASE WHEN n_kept > 0 THEN
             round(CAST(sq AS DOUBLE) / n_kept / 1000000, 6)
           END AS trimmed_mean
    FROM s, lo, hi
    """,
    "Symmetric trimmed mean (operators/stats.py trimmed_mean, "
    "l_extendedprice at trim 0.1): the exact mean of the values "
    "between the discrete p10/p90 percentiles inclusive — the robust "
    "location estimate where q224's winsorized stats CLAMP the tails, "
    "this DROPS them. Exact-percentile cuts (the q21/q233 "
    "discrete-quantile machinery — sort-free ranked selection, no "
    "interpolation to diverge) feed ONE conditional micro-quantized "
    "DECIMAL scan; the kept-range mean is a single fixed expression. "
    "1..100 → cuts (10, 90), kept mean exactly 50 unit-pinned; "
    "trim ≥ 0.5 fails loudly.",
)
def q277(spark, sf_dir):
    return trimmed_mean(_t(spark, sf_dir, "lineitem"), "l_extendedprice", trim=0.1)


@q(
    "q278_group_diversity",
    """
    WITH c AS (SELECT user_id AS g, event_type AS c, COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
    a AS (SELECT g, SUM(cnt) AS n, COUNT(*) AS k,
                 SUM(CAST(round(CAST(cnt AS DOUBLE)
                                * log2(CAST(cnt AS DOUBLE)) * 1000000)
                          AS HUGEINT)) AS t,
                 SUM(CAST(cnt AS HUGEINT) * cnt) AS cc
          FROM c GROUP BY g)
    SELECT g AS user_id, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS n_categories,
           round(log2(n) - CAST(t AS DOUBLE) / 1000000 / n, 6) AS entropy_bits,
           CASE WHEN k >= 2 THEN
             round((log2(n) - CAST(t AS DOUBLE) / 1000000 / n)
                   / log2(CAST(k AS DOUBLE)), 6)
           END AS norm_entropy,
           round(CAST(cc AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS hhi
    FROM a
    """,
    "Per-group categorical diversity report (operators/stats.py "
    "group_diversity, event-type mix per user): Shannon entropy in "
    "bits, entropy normalized by log2(k) (NULL for single-category "
    "groups — 0/0 is a convention, not a number), and the "
    "Herfindahl–Hirschman concentration index — the "
    "behavioral-diversity screens an engagement or curation pipeline "
    "reads per user/source (q109's word entropy, per group). "
    "Determinism: the partial-summable H = log2(n) − Σc·log2(c)/n "
    "form with every c·log2(c) term quantized to micro-units BEFORE "
    "the exact order-free sum (the stats-family recipe); HHI from "
    "exact DECIMAL Σc². Two map-side-combined groupBys on the same "
    "key — group cardinality rows, never event rows, leave the "
    "second exchange. 4+4 two-category (H=1, HHI=0.5) and "
    "single-category (H=0, NULL norm, HHI=1) pins unit-tested.",
)
def q278(spark, sf_dir):
    return group_diversity(_t(spark, sf_dir, "events"), "user_id", "event_type")


@q(
    "q279_max_concurrency",
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
                   AS run
          FROM pts),
    m AS (SELECT k, MAX(run) AS mx FROM r GROUP BY k),
    p AS (SELECT r.k, MIN(r.t) AS tmin FROM r JOIN m
          ON m.k = r.k AND r.run = m.mx GROUP BY r.k),
    n AS (SELECT k, COUNT(*) AS n_intervals FROM v GROUP BY k)
    SELECT n.k AS user_id, n.n_intervals,
           CAST(m.mx AS BIGINT) AS max_concurrent, p.tmin AS t_at_max_us
    FROM n JOIN m ON m.k = n.k JOIN p ON p.k = n.k
    """,
    "Peak interval concurrency per key (operators/events.py "
    "max_concurrency over the q251 interval construction — event ts "
    "plus floor(value) seconds): the classic sweep-line — every "
    "interval contributes a +1/−1 endpoint, one per-KEY (t, delta)-"
    "ordered running sum finds the maximum overlap and its earliest "
    "onset — answering 'how many sessions/jobs/streams were open at "
    "once' without materializing any pairwise overlap join (q235's "
    "shape would be O(n²) here). HALF-OPEN [s, e) semantics: the −1 "
    "sorts before the +1 at the same instant via the delta tiebreak, "
    "so touching intervals never double-count (boundary pin "
    "unit-tested); empty intervals (e ≤ s) are dropped and "
    "n_intervals comes from the SAME aggregation as the peak — no "
    "third scan (review fix, r11). Endpoints hash on the key — 2n "
    "narrow rows per key through one exchange, never a global sort; "
    "10M-interval staircase scale smoke (peak exactly 10 across 1000 "
    "keys) green, gated.",
)
def q279(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    return max_concurrency(iv, "user_id", "s", "e")


@q(
    "q280_seasonal_decompose",
    f"""
    WITH {_MK_RS_CTE},
    q AS (SELECT k, CAST(round(value * 1000000) AS HUGEINT) AS vq,
                 CAST((slot_epoch // 3600) % 24 AS INTEGER) AS pos
          FROM resampled WHERE value IS NOT NULL),
    pp AS (SELECT k, pos, COUNT(*) AS np, SUM(vq) AS sp,
                  SUM(vq * vq) AS ssp
           FROM q GROUP BY 1, 2),
    fold AS (SELECT k,
               list_reduce(list_concat([CAST(0 AS DOUBLE)],
                 list(CAST(ssp AS DOUBLE)
                      - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / np
                      ORDER BY pos)),
                 (a, b) -> a + b) AS ss_resid,
               SUM(np) AS n, COUNT(*) AS npos, SUM(sp) AS s, SUM(ssp) AS ss
             FROM pp GROUP BY k)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n_slots,
           CAST(npos AS BIGINT) AS n_positions,
           round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / n / 1000000000000.0, 6) AS var_total,
           CASE WHEN CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n > 0 THEN
             round(1.0 - ss_resid
                   / (CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
           END AS var_explained
    FROM fold
    """,
    "Seasonal decomposition summary per key (operators/windows.py "
    "seasonal_decompose, 24-slot daily cycle over the hourly resample "
    "grid): how much of each series' variance the cycle explains — "
    "R² of the position-as-factor model via the ANOVA identity, the "
    "one-number 'is this signal actually daily-periodic' gate that "
    "decides whether q205's seasonal profile is a usable baseline or "
    "noise. Per-(key, position) moments sum micro-quantized "
    "DECIMAL(38,0) integers (grid volume collapses to ≤24 position "
    "rows per key BEFORE any inexact math); the per-position residual "
    "masses combine by an ORDERED sequential fold over the bounded "
    "positions that the oracle replays term-for-term (ORDER BY fold). "
    "NULL-filled grid slots (leading NULL observations — the q269 "
    "scenario) are EXCLUDED before the moments on both engines "
    "(ADVICE r11 — phantom slots no longer inflate the variance "
    "denominators). Constant series emit NULL var_explained; "
    "pure-cycle R²=1 pin + a gated 10M-slot scale smoke.",
)
def q280(spark, sf_dir):
    return seasonal_decompose(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=3600, period_slots=24,
    )


@q(
    "q281_ljung_box",
    f"""
    WITH {_MK_RS_CTE},
    l AS (SELECT k, slot_epoch, value,
            lag(value, 1) OVER w AS u1, lag(value, 2) OVER w AS u2,
            lag(value, 3) OVER w AS u3
          FROM resampled WINDOW w AS (PARTITION BY k ORDER BY slot_epoch)),
    st AS (SELECT k, lg.lag AS lag, value AS v,
                  CASE lg.lag WHEN 1 THEN u1 WHEN 2 THEN u2 ELSE u3 END AS u
           FROM l, (SELECT unnest([1, 2, 3]) AS lag) lg
           WHERE value IS NOT NULL
             AND CASE lg.lag WHEN 1 THEN u1 WHEN 2 THEN u2 ELSE u3 END
                 IS NOT NULL),
    qq AS (SELECT k, lag, CAST(round(v * 1000000) AS BIGINT) AS x,
                  CAST(round(u * 1000000) AS BIGINT) AS y
           FROM st),
    s AS (SELECT k, lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM qq GROUP BY 1, 2),
    fin AS (SELECT *,
              n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS vx,
              n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS vy
            FROM s),
    acf AS (SELECT k, lag, n AS n_pairs,
              CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
                round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                      / sqrt(vx * vy), 6)
              END AS acf
            FROM fin),
    term AS (SELECT k, n_pairs + lag AS n,
               CASE WHEN acf IS NOT NULL THEN
                 CAST(round(acf * acf
                            / (CAST(n_pairs + lag AS DOUBLE) - lag)
                            * 1000000000000) AS HUGEINT)
               END AS t
             FROM acf),
    agg AS (SELECT k, MAX(n) AS n_slots, COUNT(t) AS n_lags_used,
                   SUM(t) AS tt
            FROM term GROUP BY k)
    SELECT k AS user_id, CAST(n_slots AS BIGINT) AS n_slots,
           CAST(n_lags_used AS BIGINT) AS n_lags_used,
           CAST(n_lags_used AS BIGINT) AS dof,
           CASE WHEN n_lags_used > 0 THEN
             round(CAST(n_slots AS DOUBLE) * (CAST(n_slots AS DOUBLE) + 2.0)
                   * CAST(tt AS DOUBLE) / 1000000000000, 6)
           END AS q_stat
    FROM agg
    """,
    "Ljung–Box portmanteau whiteness statistic per key "
    "(operators/windows.py ljung_box, lags 1–3 over the hourly "
    "resample grid): Q = n(n+2)·Σρ_k²/(n−k) over the GRADED q246 "
    "sample-ACF machinery — the 'is anything left in this series' "
    "screen a forecasting layer runs over residuals (high Q after "
    "q234's Holt fit = missed structure). Emits the statistic and "
    "dof, not a p-value (the chi2 convention). Each ρ_k is consumed "
    "at its ROUNDED 6-decimal value and each term ρ_k²/(n−k) "
    "quantizes to an integer at 1e12 BEFORE the ≤3-term sum — "
    "order-free addition both engines replay; n recovers as "
    "n_pairs + lag (the EFFECTIVE pair-supported length when "
    "NULL-valued slots drop pairs — documented convention, ADVICE "
    "r11). Degenerate lags are excluded and counted; zero usable "
    "lags → NULL Q. Periodic-large-Q and constant-NULL pins "
    "unit-tested.",
)
def q281(spark, sf_dir):
    return ljung_box(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=3600, max_lag=3,
    )


@q(
    "q282_coverage_gap_join",
    """
    WITH p AS (SELECT event_id AS p_id, epoch_us(ts) // 1000000 AS p_sec
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT epoch_us(ts) // 1000000 AS c_lo FROM events
          WHERE event_type = 'click')
    SELECT p.p_id, p.p_sec FROM p
    WHERE NOT EXISTS (SELECT 1 FROM c
                      WHERE c.c_lo <= p.p_sec AND p.p_sec < c.c_lo + 60)
    """,
    "Coverage-gap anti join (operators/joins.py point_in_interval_join "
    "how='left_anti' — purchases NOT covered by any [click, click+60s) "
    "attribution window): the complement of the graded q241 "
    "containment join, the 'orphan events' audit every attribution or "
    "monitoring pipeline needs. Same grid decomposition — intervals "
    "replicate to the ≤2 epoch-grid cells they touch, points probe "
    "their one cell via an equi-join on the cell id, so the anti "
    "semantics compute as a grid-bucketed left_anti with NO cartesian "
    "(plan-asserted) and NO per-point interval scan; the oracle is "
    "the literal NOT EXISTS. Anti + semi PARTITION the point set "
    "(unit-pinned: anti.count + semi.count = points.count); the "
    "2M×2M smoke covers the shared grid machinery.",
)
def q282(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("p_sec"),
    )
    intervals = ev.where(F.col("event_type") == "click").select(
        F.floor(F.unix_micros("ts") / 1_000_000).alias("c_lo"),
        (F.floor(F.unix_micros("ts") / 1_000_000) + 60).alias("c_hi"),
    )
    return point_in_interval_join(
        points, intervals, "p_sec", "c_lo", "c_hi", grid=60, how="left_anti"
    ).select("p_id", "p_sec")


_SIL_D_EC = _COHESION_DOT.format(a="e.embedding", b="c.cvec")
_SIL_N_E = _COHESION_NORM.format(a="e.embedding")
_SIL_N_C = _COHESION_NORM.format(a="c.cvec")


@q(
    "q283_silhouette_report",
    f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    scored AS (
      SELECT e.vec_id, c.cid,
             round({_SIL_D_EC} / ({_SIL_N_E} * {_SIL_N_C}), 6) AS cos
      FROM embeddings e CROSS JOIN cents c),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cos DESC, cid DESC) AS rn
      FROM scored),
    b AS (SELECT vec_id, cid, cos AS c1 FROM ranked WHERE rn = 1),
    s2 AS (SELECT vec_id, cos AS c2 FROM ranked WHERE rn = 2),
    per AS (SELECT b.cid,
              CASE WHEN greatest(1.0 - c1, 1.0 - c2) > 0 THEN
                CAST(round(round(((1.0 - c2) - (1.0 - c1))
                                 / greatest(1.0 - c1, 1.0 - c2), 6)
                           * 1000000) AS BIGINT)
              END AS sq
            FROM b JOIN s2 USING (vec_id))
    SELECT cid, COUNT(*) AS n_members, COUNT(sq) AS n_scored,
           CASE WHEN COUNT(sq) > 0 THEN
             round(CAST(SUM(sq) AS DOUBLE) / COUNT(sq) / 1000000, 6)
           END AS mean_silhouette
    FROM per GROUP BY cid
    """,
    "Centroid-based silhouette report (operators/similarity.py "
    "silhouette_report, 16 deterministic centroids over the 64-d "
    "embeddings): per-cluster mean of (b − a)/max(a, b) where a is "
    "the cosine DISTANCE to the assigned (nearest) centroid and b to "
    "the runner-up — the cluster-quality readout beside q271's "
    "cohesion (cohesion says 'how tight', silhouette says 'tight "
    "RELATIVE to the next-best home'; b ≥ a holds BY CONSTRUCTION "
    "under nearest-centroid assignment, so scores land in [0, 1], "
    "parity-pinned). Shape: centroids BROADCAST (16 rows — the only "
    "'cross' join is vs a constant-size frame, the q66/q75 IVF "
    "pattern), one narrow per-vector pass scores all 16, a bounded "
    "per-vector top-2 rank (tie → larger cid, both engines), "
    "per-vector silhouettes quantize to micro-units before the exact "
    "per-cluster mean. Member counts conserve the corpus total "
    "(parity-pinned).",
)
def q283(spark, sf_dir):
    return silhouette_report(_t(spark, sf_dir, "embeddings"), n_centroids=16)


@q(
    "q284_audio_snr",
    """
    WITH t AS (SELECT unnest(range(32)) AS m),
    s AS (SELECT m, unnest(range(2048)) AS i FROM t),
    v AS (SELECT m, i,
            CASE WHEN (i >= 512 AND i < 768) OR (i >= 1536 AND i < 1664)
                 THEN 127 + (17*m + i) % 3
                 ELSE (17*m + 11*i + (i*i) % 89) % 256 END AS val
          FROM s),
    f AS (SELECT m, i // 64 AS fr, SUM(abs(val - 128)) AS amp
          FROM v GROUP BY 1, 2),
    a AS (SELECT m, COUNT(*) AS n_frames,
                 SUM(CASE WHEN amp <= 64 THEN 1 ELSE 0 END) AS nf,
                 SUM(CASE WHEN amp <= 64 THEN amp END) AS fm,
                 SUM(CASE WHEN amp > 64 THEN amp END) AS sm
          FROM f GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(nf AS BIGINT) AS n_floor_frames,
           round(CAST(nf AS DOUBLE) / n_frames, 6) AS floor_frac,
           CASE WHEN n_frames > nf THEN
             round(CAST(sm AS DOUBLE) / (n_frames - nf), 6)
           END AS mean_signal_mass,
           CASE WHEN nf > 0 THEN round(CAST(fm AS DOUBLE) / nf, 6)
           END AS mean_floor_mass,
           CASE WHEN nf > 0 AND n_frames > nf AND fm > 0 THEN
             round(10.0 * (ln((CAST(sm AS DOUBLE) / (n_frames - nf))
                              / (CAST(fm AS DOUBLE) / nf)) / ln(10.0)), 6)
           END AS snr_db
    FROM a
    """,
    "Audio SNR report (operators/multimodal.py audio_snr_report over "
    "8-bit-PCM payloads, 64-sample frames, amplitude-mass floor "
    "threshold): classifies frames into noise-floor vs signal by "
    "mean-absolute-deviation mass and reports the 10·log10 "
    "signal/floor ratio — the 'is there anything on this tape' "
    "screen an audio-ingest pipeline runs before paying for "
    "transcription (q242's silence detector finds WHERE the quiet "
    "is; this says how clean the loud part is). Fixture plants "
    "±1-LSB dithered quiet ranges (a real noise floor — digital "
    "silence would make the ratio degenerate; the all-zero fixture "
    "pins NULL snr_db, never ±inf) in arithmetic wave clips; the "
    "oracle regenerates every sample from the closed-form byte "
    "formula, so decode, framing, classification, and the log ratio "
    "are all value-pinned (6 floor frames per clip, unit-asserted). "
    "Framing and mass reduce inside the Arrow batch — payloads "
    "never shuffle, one summary row per clip leaves the map.",
)
def q284(spark, sf_dir):
    clips = arith_raw_audio_dither(spark, n=32, n_samples=2048)
    return audio_snr_report(clips)


_EXPOSURE_CH = "((31*m + 7*(p*3 + {k}) + ((p*3 + {k})*(p*3 + {k})) % 251) % 256)"
_EXPOSURE_GRAY = (
    f"({_EXPOSURE_CH.format(k=0)} + {_EXPOSURE_CH.format(k=1)}"
    f" + {_EXPOSURE_CH.format(k=2)}) // 3"
)


@q(
    "q285_image_exposure",
    f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    g AS (SELECT m, p, {_EXPOSURE_GRAY} AS gray FROM px),
    bins AS (SELECT m, gray // 16 AS b, COUNT(*) AS c FROM g GROUP BY 1, 2),
    ent AS (SELECT m,
              SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                             * 1000000) AS HUGEINT)) AS t
            FROM bins GROUP BY m),
    a AS (SELECT m, COUNT(*) AS n,
                 SUM(CASE WHEN gray <= 7 THEN 1 ELSE 0 END) AS sh,
                 SUM(CASE WHEN gray >= 248 THEN 1 ELSE 0 END) AS hi,
                 MIN(gray) AS mn, MAX(gray) AS mx
          FROM g GROUP BY m)
    SELECT CAST(a.m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_px,
           round(log2(n) - CAST(t AS DOUBLE) / 1000000 / n, 6) AS entropy_bits,
           round(CAST(sh AS DOUBLE) / n, 6) AS shadow_frac,
           round(CAST(hi AS DOUBLE) / n, 6) AS highlight_frac,
           CAST(mn AS BIGINT) AS gray_min, CAST(mx AS BIGINT) AS gray_max
    FROM a JOIN ent ON ent.m = a.m
    """,
    "Image exposure/contrast QC (operators/multimodal.py "
    "image_exposure_report over RAW8 RGB payloads, 16 luma bins): "
    "gray-histogram entropy in bits, crushed-shadow (gray ≤ 7) and "
    "blown-highlight (gray ≥ 248) fractions, and the observed gray "
    "range — the cheap screens for black/overexposed/low-contrast "
    "frames a vision pipeline drops before paying for resize and "
    "embedding (q261's border check finds letterboxing; this finds "
    "bad exposure). Gray is the integer (r+g+b)//3 luma; entropy "
    "uses the partial-summable log2(n) − Σc·log2(c)/n form with "
    "every term quantized HALF-UP to micro-units before the exact "
    "order-free sum (floor(x+0.5), matching the oracle's rounding "
    "on exact .5 ties — ADVICE r11); n_bins must divide 256 or the "
    "call fails loudly (review pin). Decode and the whole histogram "
    "reduce inside the Arrow batch — payloads never shuffle; the "
    "oracle regenerates every pixel from the closed-form formula; "
    "all-black frame pins (H=0, shadow 1, range (0,0)) unit-tested.",
)
def q285(spark, sf_dir):
    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    return image_exposure_report(imgs)


@q(
    "q286_tokenizer_fertility",
    r"""
    WITH per AS (
      SELECT source, length(text) AS nc, len(string_split(text, ' ')) AS nw,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS nr
      FROM documents),
    a AS (SELECT source, COUNT(*) AS n_docs, SUM(nc) AS n_chars,
                 SUM(nw) AS nws, SUM(nr) AS nrg
          FROM per GROUP BY source)
    SELECT source, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(nws AS BIGINT) AS n_ws_tokens,
           CAST(nrg AS BIGINT) AS n_regex_tokens,
           CASE WHEN nws > 0 THEN
             round(CAST(n_chars AS DOUBLE) / nws, 6) END AS chars_per_ws_token,
           CASE WHEN nrg > 0 THEN
             round(CAST(n_chars AS DOUBLE) / nrg, 6)
           END AS chars_per_regex_token,
           CASE WHEN nws > 0 THEN
             round(CAST(nrg AS DOUBLE) / nws, 6) END AS regex_per_ws_ratio
    FROM a
    """,
    "Tokenizer fertility report per source (operators/text.py "
    "tokenizer_fertility, the q96 counting conventions): "
    "chars-per-whitespace-token, chars-per-regex-token (the BPE-ish "
    "[A-Za-z]+|[0-9]+|punct splitter), and the regex/whitespace "
    "token ratio — the per-source 'how expensive is this text to "
    "tokenize' readout a training-data pipeline reads next to "
    "q113's corpus report (fertility drift between sources flags "
    "encoding problems and boilerplate before they hit the token "
    "budget). ONE narrow per-document pass (three counters, "
    "JVM-side length/split/regexp_extract_all — no UDF) into a "
    "map-side-combined per-source sum; NULL text contributes NULL "
    "(skipped) to every counter — F.size's −1-on-NULL never "
    "subtracts from token sums (review pin, r11). Ratios are "
    "single fixed-order divisions over exact integer sums.",
)
def q286(spark, sf_dir):
    return tokenizer_fertility(_t(spark, sf_dir, "documents"))
