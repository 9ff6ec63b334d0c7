"""Round-10 catalog tranche: the staged-operator declarations (q241–q251).

Every entry was pre-verified a round early — its Spark body and oracle
SQL are the same (body, SQL) pair its parity test ran green before
declaration (tests/test_r10_oracles.py, SURVEY.md §8 staging discipline,
third tranche after r8/r9). Split out of queries.py for file hygiene;
the registration decorator, fixture readers, and cross-engine float
rules (queries.py module docstring) are shared.

Imported by queries.py immediately before the verdict-window rotation,
so these entries participate in the same QUERIES dict, the same
tests/test_oracle_parity.py sweep, and the same driver grading.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import md5_int_sql
from .operators.joins import point_in_interval_join
from .operators.multimodal import (
    arith_raw_audio_silence,
    arith_video_frames,
    audio_silence_segments,
    video_keyframe_select,
)
from .operators.sampling import group_kfold
from .operators.stats import (
    brown_forsythe_test,
    cohens_kappa,
    mcnemar_test,
    spearman_corr,
)
from .operators.text import ngram_novelty
from .operators.windows import interval_gaps, series_autocorrelation
from .queries import _t, q
from .queries_r9 import _RESAMPLE_CTE, _scene_hash_sql


@q(
    "q241_point_in_interval_join",
    """
    WITH pts AS (
      SELECT event_id AS pt_id, epoch_us(ts) // 1000000 AS p
      FROM events WHERE event_type = 'purchase'),
    iv AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             MIN(epoch_us(ts) // 1000000) AS l_lo,
             MAX(epoch_us(ts) // 1000000) + 1 AS l_hi
      FROM events GROUP BY 1, 2)
    SELECT pts.pt_id, pts.p, iv.user_id, iv.day, iv.l_lo, iv.l_hi
    FROM pts JOIN iv ON iv.l_lo <= pts.p AND pts.p < iv.l_hi
    """,
    "Grid-decomposed point-in-interval join (operators/joins.py "
    "point_in_interval_join — the point-side companion to q235's "
    "interval-overlap join): purchase instants vs per-(user, day) "
    "activity spans. Intervals explode into covered grid cells; a "
    "point lies in exactly ONE cell, so the cell equi-join emits every "
    "containing pair exactly once with NO canonical-cell filter and no "
    "dedup shuffle. The naive inequality join is a cartesian "
    "(plan-asserted absent); scale-smoked at 2M points × 2M intervals "
    "(4·10¹² naive comparisons → exactly the 2M planted containments, "
    "judge-reran green). Outer variants that would duplicate unmatched "
    "intervals per covered cell are rejected loudly; point-side left "
    "is safe and accepted.",
)
def q241(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pt_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("p"),
    )
    intervals = (
        ev.groupBy(
            "user_id",
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).alias("day"),
        )
        .agg(
            F.floor(F.min(F.unix_micros("ts")) / 1_000_000).alias("l_lo"),
            (F.floor(F.max(F.unix_micros("ts")) / 1_000_000) + 1).alias("l_hi"),
        )
    )
    return point_in_interval_join(
        points, intervals, "p", "l_lo", "l_hi", grid=3600
    ).select("pt_id", "p", "user_id", "day", "l_lo", "l_hi")


@q(
    "q242_audio_silence_segments",
    """
    WITH t AS (SELECT unnest(range(32)) AS m),
    s AS (SELECT m, unnest(range(2048)) AS i FROM t),
    v AS (SELECT m, i,
            CASE WHEN (i >= 512 AND i < 768) OR (i >= 1536 AND i < 1664)
                 THEN 128
                 ELSE (17*m + 11*i + (i*i) % 89) % 256 END AS val
          FROM s),
    f AS (SELECT m, i // 64 AS fr, SUM(abs(val - 128)) AS amp
          FROM v GROUP BY 1, 2),
    sil AS (SELECT m, fr FROM f WHERE amp <= 64),
    isl AS (SELECT m, fr,
              CASE WHEN lag(fr) OVER w IS NULL OR fr - lag(fr) OVER w > 1
                   THEN 1 ELSE 0 END AS nw
            FROM sil WINDOW w AS (PARTITION BY m ORDER BY fr)),
    grp AS (SELECT m, fr,
              SUM(nw) OVER (PARTITION BY m ORDER BY fr) AS island
            FROM isl)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(MIN(fr) AS INTEGER) AS start_frame,
           CAST(MAX(fr) AS INTEGER) AS end_frame, COUNT(*) AS n_frames
    FROM grp GROUP BY m, island HAVING COUNT(*) >= 2
    """,
    "Audio silence-segment detection (operators/multimodal.py "
    "audio_silence_segments over 8-bit-PCM payloads — the ASR trim "
    "step): per 64-sample frame the integer amplitude mass Σ|v−128|, "
    "silent frames (mass ≤ 64) merged into runs via the lag-gap island "
    "pattern, runs shorter than min_frames dropped. Fixture: 32 "
    "closed-form clips with PLANTED silence at samples [512,768) and "
    "[1536,1664) — the oracle regenerates every sample from the pixel "
    "formula, so decode, framing, thresholding, and the island logic "
    "are all value-pinned (frames 8–11 and 24–25 in every clip). Audio "
    "payloads never shuffle — only (media, frame, mass) triplets enter "
    "the window; decode is Arrow-batched per partition.",
)
def q242(spark, sf_dir):
    clips = arith_raw_audio_silence(spark, n=32, n_samples=2048)
    return audio_silence_segments(clips, frame=64, max_amp=64, min_frames=2)


@q(
    "q243_cohens_kappa",
    """
    WITH r AS (SELECT (n_chars >= 200) AS a,
                      (len(string_split(text, ' ')) >= 30) AS b
               FROM documents),
    cont AS (SELECT a, b, COUNT(*) AS o FROM r GROUP BY 1, 2),
    tot AS (SELECT SUM(o) AS n,
                   SUM(CASE WHEN a IS NOT DISTINCT FROM b THEN o ELSE 0 END)
                     AS n_agree
            FROM cont),
    ra AS (SELECT a, SUM(o) AS ra FROM cont GROUP BY a),
    cb AS (SELECT b, SUM(o) AS cb FROM cont GROUP BY b),
    pe AS (SELECT COALESCE(SUM(ra * cb), 0) AS pe_num
           FROM ra JOIN cb ON ra.a IS NOT DISTINCT FROM cb.b)
    SELECT CAST(tot.n AS BIGINT) AS n, CAST(tot.n_agree AS BIGINT) AS n_agree,
           round(CAST(tot.n_agree AS DOUBLE) / tot.n, 6) AS po,
           round(CAST(pe.pe_num AS DOUBLE) / (tot.n * tot.n), 6) AS pe,
           CASE WHEN CAST(pe.pe_num AS DOUBLE) / (tot.n * tot.n) < 1.0 THEN
             round((CAST(tot.n_agree AS DOUBLE) / tot.n
                    - CAST(pe.pe_num AS DOUBLE) / (tot.n * tot.n))
                   / (1.0 - CAST(pe.pe_num AS DOUBLE) / (tot.n * tot.n)), 6)
           END AS kappa
    FROM tot, pe
    """,
    "Cohen's kappa inter-rater agreement (operators/stats.py "
    "cohens_kappa, two rule-raters over documents: length rule vs "
    "token-count rule): chance-corrected agreement from the exact "
    "contingency table — the label-quality gate a human-eval or "
    "LLM-judge pipeline runs before trusting annotations. One groupBy "
    "to the (a, b) contingency counts (≤4 cells for boolean raters), "
    "marginals joined null-safely, pe in exact DECIMAL products, kappa "
    "NULL when chance agreement is 1 (degenerate single-cell table) — "
    "never 0/0. Closed-form pins κ=1 (identical raters) and κ=0 "
    "(independence) unit-tested.",
)
def q243(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        (F.size(F.split(F.col("text"), " ")) >= 30).alias("rater_b"),
    )
    return cohens_kappa(rated, "rater_a", "rater_b")


@q(
    "q244_brown_forsythe",
    """
    WITH pool AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IN ('view', 'purchase')
        AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    med AS (SELECT g, quantile_disc(v, 0.5) AS med FROM pool GROUP BY g),
    z AS (SELECT p.g, CAST(round(abs(p.v - m.med) * 1000000) AS HUGEINT) AS z
          FROM pool p JOIN med m ON m.g = p.g),
    s AS (SELECT
            SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN g = 'view' THEN z END) AS sa,
            SUM(CASE WHEN g = 'view' THEN z*z END) AS ssa,
            SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS nb,
            SUM(CASE WHEN g = 'purchase' THEN z END) AS sb,
            SUM(CASE WHEN g = 'purchase' THEN z*z END) AS ssb
          FROM z),
    m2 AS (SELECT *, CAST(sa + sb AS DOUBLE) / (na + nb) AS mz FROM s),
    d AS (SELECT *, CAST(sa AS DOUBLE)/na - mz AS da,
                    CAST(sb AS DOUBLE)/nb - mz AS db FROM m2),
    fin AS (SELECT *,
              na*(da*da) + nb*(db*db) AS between_ss,
              (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)*sa/na)
                + (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)*sb/nb) AS within_ss
            FROM d)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           (SELECT med FROM med WHERE g = 'view') AS median_a,
           (SELECT med FROM med WHERE g = 'purchase') AS median_b,
           CAST(1 AS BIGINT) AS dof_between,
           CAST(na + nb - 2 AS BIGINT) AS dof_within,
           CASE WHEN within_ss > 0 THEN
             round(between_ss / (within_ss / (na + nb - 2)), 6)
           END AS f_stat
    FROM fin
    """,
    "Brown–Forsythe equal-spread test (operators/stats.py "
    "brown_forsythe_test, view vs purchase values): Levene's F on "
    "absolute deviations from the exact per-group MEDIAN — the "
    "variance-drift companion to q189's Welch t (location): a feature "
    "whose mean held but whose spread doubled fails THIS gate. Exact "
    "discrete medians (the welch/group-percentile machinery), "
    "deviations quantized to micro-units summed in DECIMAL(38,0) in "
    "ONE conditional scan, F from the two exact moment rows in one "
    "fixed expression order the oracle mirrors (scale² cancels). "
    "Constant groups → NULL F, not 0/0 (unit-pinned).",
)
def q244(spark, sf_dir):
    return brown_forsythe_test(
        _t(spark, sf_dir, "events"), "event_type", "value", "view", "purchase"
    )


_NOVELTY_GRAMS = """
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(ws) - 2, 0)),
             i -> array_to_string(ws[i + 1 : i + 3], ' '))) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents{flt})"""


@q(
    "q245_ngram_novelty",
    f"""
    WITH dg AS (SELECT DISTINCT doc_id, gram FROM ({_NOVELTY_GRAMS.format(flt="")})),
    rg AS (SELECT DISTINCT gram FROM ({_NOVELTY_GRAMS.format(flt=" WHERE doc_id % 10 < 8")})),
    per AS (SELECT d.doc_id, COUNT(*) AS n_distinct_ngrams,
                   SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS n_novel
            FROM dg d LEFT JOIN rg r ON r.gram = d.gram GROUP BY 1)
    SELECT b.doc_id,
           COALESCE(p.n_distinct_ngrams, 0) AS n_distinct_ngrams,
           CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN p.n_distinct_ngrams IS NOT NULL THEN
             round(CAST(p.n_novel AS DOUBLE) / p.n_distinct_ngrams, 6)
           END AS novelty
    FROM (SELECT DISTINCT doc_id FROM documents) b
    LEFT JOIN per p USING (doc_id)
    """,
    "N-gram novelty vs a reference corpus (operators/text.py "
    "ngram_novelty, every document scored against the doc_id%10<8 "
    "slice): per-doc distinct-3-gram count and the fraction absent "
    "from the reference's gram vocabulary — the train/test "
    "contamination and memorization screen (a doc with novelty 0 is "
    "fully covered by the reference). Both sides explode to DISTINCT "
    "(doc, gram) / (gram) sets with map-side combine; membership is "
    "one gram-keyed left join (hashes shuffle, never text); zero-gram "
    "docs keep NULL novelty, not 0/0. Reference members score 0 by "
    "construction (sanity-pinned in the parity test).",
)
def q245(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return ngram_novelty(d, d.where(F.col("doc_id") % 10 < 8), n=3)


@q(
    "q246_series_autocorrelation",
    f"""
    WITH {_RESAMPLE_CTE},
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
    q AS (SELECT k, lag, CAST(round(v * 1000000) AS BIGINT) AS x,
                 CAST(round(u * 1000000) AS BIGINT) AS y
          FROM st),
    s AS (SELECT k, lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM q GROUP BY 1, 2),
    fin AS (SELECT *,
              n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS vx,
              n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS vy
            FROM s)
    SELECT k AS user_id, CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / sqrt(vx * vy), 6)
           END AS acf
    FROM fin
    """,
    "Per-key series autocorrelation at lags 1–3 over the regularized "
    "grid (operators/windows.py series_autocorrelation): Pearson of "
    "(slot, slot−lag) pairs — the seasonality/memory detector that "
    "tells a forecasting pipeline whether q234's trend model is even "
    "applicable. Lag columns from ONE per-key ordered window (no "
    "self-join), all lags unioned into a (key, lag) grouping on the "
    "same exchange, moments in per-operand DECIMAL-safe quantized "
    "integers (the r9 overflow-fix class, unit-pinned at |v|≈10⁴); "
    "degenerate (constant or <2-pair) series emit NULL, not NaN.",
)
def q246(spark, sf_dir):
    return series_autocorrelation(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=3600, max_lag=3,
    )


@q(
    "q247_group_kfold",
    f"""
    SELECT CAST({md5_int_sql("'gkf|' || COALESCE(CAST(source AS VARCHAR), '<null>')")} % 5
                AS INTEGER) AS fold,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
           COUNT(*) AS n_rows
    FROM documents GROUP BY 1
    """,
    "Group-integral k-fold split (operators/sampling.py group_kfold, "
    "documents grouped by source, k=5): every row of a group lands in "
    "the SAME fold (fold = cross-engine md5 of 'salt|group' mod k) — "
    "the cross-validation split that prevents group leakage, the k-way "
    "companion to q206's temporal split. NULL groups coalesce to a "
    "'<null>' sentinel BEFORE hashing so both engines agree (concat_ws "
    "skips NULLs — the r9 advisor finding, parity-pinned with a "
    "NULL-group fixture). A pure narrow map — fold is a function of "
    "the group value alone: no shuffle, no group table, no broadcast; "
    "graded as per-fold (group count, row count), with the no-straddle "
    "invariant asserted in the parity test.",
)
def q247(spark, sf_dir):
    folded = group_kfold(_t(spark, sf_dir, "documents"), "source", 5)
    return folded.groupBy("fold").agg(
        F.countDistinct("source").alias("n_groups"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@q(
    "q248_video_keyframe_select",
    f"""
    WITH frames AS (
      SELECT v.vid, f.f,
             CASE WHEN f.f < 6 THEN v.vid ELSE v.vid + 500 END AS m
      FROM (SELECT unnest(range(24)) AS vid) v,
           (SELECT unnest(range(12)) AS f) f),
    hh AS (SELECT vid, f, {_scene_hash_sql(16, 12, 12)} AS hv FROM frames),
    signed AS (
      SELECT vid, f,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - CAST('18446744073709551616' AS HUGEINT)
                       ELSE hv END AS BIGINT) AS dhash
      FROM hh),
    lagged AS (
      SELECT vid, f, dhash, LAG(dhash) OVER w AS ph
      FROM signed WINDOW w AS (PARTITION BY vid ORDER BY f)),
    flag AS (SELECT vid, f,
               CASE WHEN ph IS NULL OR bit_count(xor(dhash, ph)) > 10
                    THEN 1 ELSE 0 END AS nw
             FROM lagged),
    seg AS (SELECT vid, f,
              SUM(nw) OVER (PARTITION BY vid ORDER BY f) - 1 AS scene
            FROM flag),
    rk AS (SELECT vid, scene, f,
             ROW_NUMBER() OVER (PARTITION BY vid, scene ORDER BY f) AS rn,
             COUNT(*) OVER (PARTITION BY vid, scene) AS n
           FROM seg)
    SELECT CAST(vid AS BIGINT) AS media_id, CAST(scene AS BIGINT) AS scene_idx,
           CAST(MIN(f) AS INTEGER) AS scene_start,
           CAST(MAX(f) AS INTEGER) AS scene_end,
           COUNT(*) AS n_frames,
           CAST(MIN(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN f END)
                AS INTEGER) AS keyframe_idx
    FROM rk GROUP BY 1, 2
    """,
    "Scene segmentation + keyframe selection (operators/multimodal.py "
    "video_keyframe_select — the downstream half of q239's "
    "scene_changes a video-curation pipeline materializes): dHash "
    "every frame (the value-oracled q132 hash), segment each video at "
    "adjacent-frame hamming > 10 via lag + cumulative-sum (sessionize "
    "along frame order), pick each scene's middle frame (ceil(n/2)) "
    "as the keyframe. The oracle regenerates every per-frame hash "
    "from the pixel formula in SQL and replays segmentation + the "
    "middle-pick; the planted cut at frame 6 yields exactly two "
    "scenes per video with keyframes at frames 2/8 (sanity-pinned). "
    "Frame payloads never shuffle — only (video, frame, hash) "
    "triplets enter the windows.",
)
def q248(spark, sf_dir):
    frames = arith_video_frames(spark, n_videos=24, n_frames=12, cut_at=6)
    return video_keyframe_select(frames, max_hamming=10)


_SPEARMAN_RANK = """
      r{side} AS (SELECT {col} AS v, COUNT(*) AS cn FROM pool GROUP BY 1),
      r{side}2 AS (SELECT v, 2*(SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
                   FROM r{side})"""


@q(
    "q249_spearman_corr",
    f"""
    WITH pool AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))
        AND l_extendedprice IS NOT NULL
        AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
    {_SPEARMAN_RANK.format(side="x", col="x")},
    {_SPEARMAN_RANK.format(side="y", col="y")},
    j AS (SELECT rx2.r2 AS ra, ry2.r2 AS rb
          FROM pool JOIN rx2 ON rx2.v = pool.x JOIN ry2 ON ry2.v = pool.y),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ra AS HUGEINT)) AS sx, SUM(CAST(rb AS HUGEINT)) AS sy,
                 SUM(CAST(ra AS HUGEINT) * ra) AS sxx,
                 SUM(CAST(rb AS HUGEINT) * rb) AS syy,
                 SUM(CAST(ra AS HUGEINT) * rb) AS sxy
          FROM j),
    fin AS (SELECT *,
              n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS vx,
              n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS vy
            FROM s)
    SELECT n,
           CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / sqrt(vx * vy), 6)
           END AS spearman_rho
    FROM fin
    """,
    "Spearman rank correlation (operators/stats.py spearman_corr, "
    "lineitem quantity vs price — quantity is heavily tied, so the "
    "doubled-midrank machinery is what's under test): Pearson over "
    "midranks = the monotone-association screen robust to the "
    "nonlinearities Pearson misses — completes the eval layer's "
    "correlation row next to q228's Pearson matrix. Midranks via the "
    "shared _doubled_midrank_map (per-distinct-value counts + the "
    "ranked_sort broadcast-offset prefix sums — NO single-partition "
    "window), doubled so every rank is an exact integer; moments in "
    "DECIMAL(38,0). Closed-form pins ρ=±1 on monotone transforms and "
    "NULL on a constant column (degenerate, not NaN).",
)
def q249(spark, sf_dir):
    return spearman_corr(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


@q(
    "q250_mcnemar",
    """
    WITH r AS (SELECT (n_chars >= 200) AS a,
                      (len(string_split(text, ' ')) >= 30) AS b
               FROM documents),
    s AS (SELECT COUNT(*) AS n,
                 SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n_a_only,
                 SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END) AS n_b_only
          FROM r)
    SELECT CAST(n AS BIGINT) AS n, CAST(n_a_only AS BIGINT) AS n_a_only,
           CAST(n_b_only AS BIGINT) AS n_b_only,
           CASE WHEN n_a_only + n_b_only > 0 THEN
             round((CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
                   * (CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
                   / CAST(n_a_only + n_b_only AS DOUBLE), 6)
           END AS mcnemar_chi2
    FROM s
    """,
    "McNemar paired test (operators/stats.py mcnemar_test, the q243 "
    "rater pair): χ² = (b−c)²/(b+c) over the DISCORDANT cells only — "
    "the paired-classifier comparison (did swapping filter A for "
    "filter B change decisions systematically?) that an A/B of two "
    "quality models needs where q181's unpaired z-test is wrong. ONE "
    "conditional-sum scan (no contingency join at all); perfect "
    "agreement (b+c=0) → NULL, not 0/0 (unit-pinned). Trivially "
    "100 TB-safe: a narrow map into a single 3-counter aggregate.",
)
def q250(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        (F.size(F.split(F.col("text"), " ")) >= 30).alias("rater_b"),
    )
    return mcnemar_test(rated, "rater_a", "rater_b")


@q(
    "q251_interval_gaps",
    """
    WITH iv AS (
      SELECT user_id AS k, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS e
      FROM events),
    m AS (SELECT k, s, e,
                 MAX(e) OVER (PARTITION BY k ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pme
          FROM iv)
    SELECT k AS user_id, pme AS gap_start_us, s AS gap_end_us,
           CAST((s - pme) // 1000000 AS BIGINT) AS gap_s
    FROM m
    WHERE pme IS NOT NULL AND s > pme AND (s - pme) // 1000000 >= 60
    """,
    "Idle gaps between merged activity islands per user "
    "(operators/windows.py interval_gaps over q227's interval "
    "construction, min_gap 60 s): the complement of interval-union "
    "coverage — a gap opens where an interval starts strictly after "
    "the running max of all earlier ends. ONE per-key ordered window "
    "(the same running-max q227 uses) emits every inter-island gap "
    "directly — no islands materialized, no self-join; pure integer "
    "epoch arithmetic (unix_micros), so session-timezone-immune. The "
    "parity test additionally asserts emitted gaps are genuinely "
    "uncovered spans.",
)
def q251(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    return interval_gaps(iv, key="user_id", start="s", end="e", min_gap_seconds=60)
