"""Cross-engine (DuckDB) parity for the r10-ready operators — the next
staged wave, proven against their oracles BEFORE declaration (the
SURVEY.md §8 staging discipline that produced the r8/r9 tranches: every
operator lands with its oracle parity test in the same commit, so the
future q-entry is a copy-paste of (body, SQL) pairs already green).

Each test is (future Spark query body, future oracle SQL, driver-identical
compare) at sf0.01 — the same comparison tests/test_oracle_parity.py runs
for declared queries.
"""

from __future__ import annotations

import os as _os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare

STEP = 3600
STEP_US = STEP * 1_000_000


def _events(spark):
    from osmapreduceproject_spark.queries import _t

    return _t(spark, SF_CORRECT, "events")


_RESAMPLE_CTE = f"""
    obs AS (SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
            FROM events),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / {STEP_US}.0) * {STEP_US} AS BIGINT),
        CAST(floor(hi / {STEP_US}.0) * {STEP_US} AS BIGINT) + 1,
        {STEP_US})) AS e
      FROM spans),
    resampled AS (
      SELECT g.k, g.e // 1000000 AS slot_epoch, o.v AS value,
             (g.e - o.e) // 1000000 AS staleness_s
      FROM grid g ASOF JOIN obs o ON g.k = o.k AND o.e <= g.e)"""


def test_point_in_interval_join_oracle(spark, duck):
    """Purchase instants vs per-(user, day) activity spans — every
    containing (point, interval) pair, exactly once, via the point-cell
    equi join (a point lies in ONE cell, so no canonical-cell filter is
    even needed)."""
    from osmapreduceproject_spark.operators.joins import point_in_interval_join

    ev = _events(spark)
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
    got = point_in_interval_join(
        points, intervals, "p", "l_lo", "l_hi", grid=3600
    ).select("pt_id", "p", "user_id", "day", "l_lo", "l_hi")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    n = got.count()
    assert n == got.dropDuplicates(["pt_id", "user_id", "day"]).count()
    assert n > 0


def test_audio_silence_segments_oracle(spark, duck):
    """Planted-silence PCM clips: frame amplitude mass, silent-run
    islands, and the ≥min_frames filter all replayed closed-form."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_silence,
        audio_silence_segments,
    )

    clips = arith_raw_audio_silence(spark, n=32, n_samples=2048)
    got = audio_silence_segments(clips, frame=64, max_amp=64, min_frames=2)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    # the planted ranges: samples [512,768) → frames 8-11, [1536,1664)
    # → frames 24-25, in every clip
    rows = {(r["media_id"], r["start_frame"], r["end_frame"]) for r in got.collect()}
    assert rows == {(m, 8, 11) for m in range(32)} | {(m, 24, 25) for m in range(32)}


def test_cohens_kappa_oracle(spark, duck):
    """Two rule-raters over documents (length rule vs token-count rule):
    kappa from exact contingency counts."""
    from osmapreduceproject_spark.operators.stats import cohens_kappa

    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        (F.size(F.split(F.col("text"), " ")) >= 30).alias("rater_b"),
    )
    got = cohens_kappa(rated, "rater_a", "rater_b")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert -1.0 <= row["kappa"] <= 1.0


def test_cohens_kappa_known_cases(spark):
    """Closed-form pins: identical raters → κ = 1; raters whose
    agreement exactly equals chance → κ = 0."""
    from osmapreduceproject_spark.operators.stats import cohens_kappa

    same = spark.createDataFrame(
        [(i % 2 == 0, i % 2 == 0) for i in range(40)], "a boolean, b boolean"
    )
    assert cohens_kappa(same, "a", "b").first()["kappa"] == 1.0
    # independent 50/50 raters: po = 0.5 = pe → kappa 0
    indep = spark.createDataFrame(
        [((i // 2) % 2 == 0, i % 2 == 0) for i in range(40)],
        "a boolean, b boolean",
    )
    assert cohens_kappa(indep, "a", "b").first()["kappa"] == 0.0


def test_brown_forsythe_oracle(spark, duck):
    """Spread-equality test between view and purchase values: exact
    discrete medians, DECIMAL deviation moments, one fixed-order F."""
    from osmapreduceproject_spark.operators.stats import brown_forsythe_test

    got = brown_forsythe_test(_events(spark), "event_type", "value",
                              "view", "purchase")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["f_stat"] is not None and row["f_stat"] >= 0.0


def test_brown_forsythe_degenerate_is_null(spark):
    """Constant groups (zero within-deviation mass) → NULL F, not 0/0."""
    from osmapreduceproject_spark.operators.stats import brown_forsythe_test

    df = spark.createDataFrame(
        [("a", 1.0)] * 5 + [("b", 2.0)] * 5, "g string, v double"
    )
    row = brown_forsythe_test(df, "g", "v", "a", "b").first()
    assert row["n_a"] == 5 and row["n_b"] == 5 and row["f_stat"] is None


def test_ngram_novelty_oracle(spark, duck):
    """Every document scored against the doc_id%10<8 reference slice:
    distinct-3-gram counts and the not-in-reference fraction."""
    from osmapreduceproject_spark.operators.text import ngram_novelty
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    got = ngram_novelty(d, d.where(F.col("doc_id") % 10 < 8), n=3)
    grams = """
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(ws) - 2, 0)),
             i -> array_to_string(ws[i + 1 : i + 3], ' '))) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents{flt})"""
    sql = f"""
    WITH dg AS (SELECT DISTINCT doc_id, gram FROM ({grams.format(flt="")})),
    rg AS (SELECT DISTINCT gram FROM ({grams.format(flt=" WHERE doc_id % 10 < 8")})),
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    # reference members score 0 novelty; at least one held-out doc > 0
    assert (pdf[pdf.doc_id % 10 < 8].n_novel == 0).all()
    assert (pdf.n_novel > 0).any()


def test_series_autocorrelation_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import series_autocorrelation

    got = series_autocorrelation(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP, max_lag=3,
    )
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert set(pdf.lag) == {1, 2, 3}
    ok = pdf.acf.dropna()
    assert ((ok >= -1.0 - 1e-9) & (ok <= 1.0 + 1e-9)).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (2M points x 2M intervals)",
)
def test_point_in_interval_join_scale_smoke(spark):
    """2M points × 2M intervals — 4·10¹² naive comparisons; the grid
    path finds EXACTLY the 2M planted containments (point i = 100i+30
    lies in interval i = [100i, 100i+50) and nothing else), once each."""
    from osmapreduceproject_spark.operators.joins import point_in_interval_join

    n = 2_000_000
    points = spark.range(n).select(
        F.col("id").alias("pid"), (F.col("id") * 100 + 30).alias("p")
    )
    intervals = spark.range(n).select(
        F.col("id").alias("iid"),
        (F.col("id") * 100).alias("lo"),
        (F.col("id") * 100 + 50).alias("hi"),
    )
    j = point_in_interval_join(points, intervals, "p", "lo", "hi", grid=100)
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("pid") == F.col("iid")).cast("int")).alias("self_pairs"),
    ).first()
    assert agg["n"] == n and agg["self_pairs"] == n


def test_group_kfold_oracle(spark, duck):
    """Per-fold summary over documents grouped by source, plus the
    integrity invariant: every group lands in exactly one fold."""
    from osmapreduceproject_spark.functions.hashing import md5_int_sql
    from osmapreduceproject_spark.operators.sampling import group_kfold
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    folded = group_kfold(d, "source", 5)
    got = folded.groupBy("fold").agg(
        F.countDistinct("source").alias("n_groups"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    h = md5_int_sql("'gkf|' || COALESCE(CAST(source AS VARCHAR), '<null>')")
    sql = f"""
    SELECT CAST({h} % 5 AS INTEGER) AS fold,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
           COUNT(*) AS n_rows
    FROM documents GROUP BY 1
    """
    assert compare(got, duck.execute(sql).df()) == []
    # group integrity: a source never straddles folds
    assert (
        folded.groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
        .where(F.col("nf") > 1)
        .count()
        == 0
    )


def test_group_kfold_null_group_sentinel(spark, duck):
    """NULL groups hash through the '<null>' sentinel, not the bare
    salt — concat_ws skips NULLs, so the unsentineled Spark fold and a
    ``salt || '|' || col`` oracle (NULL fold) would silently disagree
    (advisor finding, r9). Both engines must put every NULL-group row
    in the same, non-NULL fold."""
    from osmapreduceproject_spark.functions.hashing import md5_int_sql
    from osmapreduceproject_spark.operators.sampling import group_kfold

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"g{i % 5}") for i in range(60)],
        "id int, grp string",
    )
    got = group_kfold(df, "grp", 4).groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    h = md5_int_sql("'gkf|' || COALESCE(CAST(grp AS VARCHAR), '<null>')")
    duck.execute("CREATE OR REPLACE TEMP VIEW kf AS " + " UNION ALL ".join(
        f"SELECT {i} AS id, "
        + ("CAST(NULL AS VARCHAR)" if i % 3 == 0 else f"'g{i % 5}'")
        + " AS grp"
        for i in range(60)
    ))
    sql = f"SELECT CAST({h} % 4 AS INTEGER) AS fold, COUNT(*) AS n_rows FROM kf GROUP BY 1"
    assert compare(got, duck.execute(sql).df()) == []
    folded = group_kfold(df, "grp", 4)
    assert folded.where(F.col("fold").isNull()).count() == 0
    assert folded.where(F.col("grp").isNull()).select("fold").distinct().count() == 1


def test_video_keyframe_select_oracle(spark, duck):
    """Scene segmentation + middle-frame keyframe over the q239
    closed-form video fixture: the oracle replays hash, lag-hamming
    segmentation, and the ceil(n/2) pick in SQL; the planted single cut
    yields exactly two scenes per video with keyframes at frames 2/8."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_keyframe_select,
    )
    from osmapreduceproject_spark.queries_r9 import _scene_hash_sql

    frames = arith_video_frames(spark, n_videos=24, n_frames=12, cut_at=6)
    got = video_keyframe_select(frames, max_hamming=10)
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {
        (r["media_id"], r["scene_idx"], r["keyframe_idx"]) for r in got.collect()
    }
    assert rows == {(v, 0, 2) for v in range(24)} | {(v, 1, 8) for v in range(24)}


def test_grid_joins_reject_outer_variants(spark):
    """Cell explosion duplicates UNMATCHED rows under outer joins (one
    per covered cell) — both grid joins must reject those variants
    loudly instead of silently multiplying; the safe variants stay
    accepted (review finding, r9)."""
    from osmapreduceproject_spark.operators.joins import (
        interval_overlap_join,
        point_in_interval_join,
    )

    pts = spark.createDataFrame([(1, 5)], "pid int, p long")
    iv = spark.createDataFrame([(1, 0, 40)], "iid int, lo long, hi long")
    with pytest.raises(ValueError, match="per covered cell"):
        point_in_interval_join(pts, iv, "p", "lo", "hi", 4, how="full")
    with pytest.raises(ValueError, match="per covered cell"):
        point_in_interval_join(pts, iv, "p", "lo", "hi", 4, how="right")
    # point-side outer is safe (points are not exploded): an unmatched
    # point surfaces exactly once
    lonely = spark.createDataFrame([(1, 5), (2, 100)], "pid int, p long")
    out = point_in_interval_join(lonely, iv, "p", "lo", "hi", 4, how="left")
    assert out.count() == 2 and out.where(F.col("iid").isNull()).count() == 1

    # interval_overlap_join explodes BOTH sides, so even semi/anti
    # evaluate per exploded row — only inner is accepted
    l2 = spark.createDataFrame([(1, 0, 40)], "lid int, l_lo long, l_hi long")
    r2 = spark.createDataFrame([(9, 100, 140)], "rid int, r_lo long, r_hi long")
    for bad in ("left", "full", "left_anti", "left_semi"):
        with pytest.raises(ValueError, match="covered cell|exploded row"):
            interval_overlap_join(
                l2, r2, "l_lo", "l_hi", "r_lo", "r_hi", 4, how=bad
            )


def test_series_autocorrelation_large_values_no_overflow(spark):
    """|value| ≈ 10,000 quantizes to ~1e10; its square exceeds int64 —
    the per-operand decimal cast must keep the moments exact instead of
    raising ARITHMETIC_OVERFLOW (review finding, r9)."""
    import datetime

    from osmapreduceproject_spark.operators.windows import series_autocorrelation

    base = datetime.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base + datetime.timedelta(hours=i), 10_000.0 + (i % 7) * 913.0)
            for i in range(24)
        ],
        "k bigint, ts timestamp, v double",
    )
    rows = series_autocorrelation(
        df, key="k", ts="ts", value_col="v", step_seconds=3600, max_lag=2
    ).collect()
    assert {r["lag"] for r in rows} == {1, 2}
    for r in rows:
        assert r["acf"] is None or -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_spearman_corr_oracle(spark, duck):
    """Spearman over lineitem quantity vs price — quantity is heavily
    tied, so the doubled-midrank machinery is what's under test."""
    from osmapreduceproject_spark.operators.stats import spearman_corr
    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import _t

    got = spearman_corr(
        _t(spark, SF_CORRECT, "lineitem"), "l_quantity", "l_extendedprice"
    )
    rank = """
      r{side} AS (SELECT {col} AS v, COUNT(*) AS cn FROM pool GROUP BY 1),
      r{side}2 AS (SELECT v, 2*(SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
                   FROM r{side})"""
    sql = f"""
    WITH pool AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))
        AND l_extendedprice IS NOT NULL
        AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
    {rank.format(side="x", col="x")},
    {rank.format(side="y", col="y")},
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert -1.0 <= row["spearman_rho"] <= 1.0
    release_intermediates()


def test_spearman_known_cases(spark):
    """Closed-form pins: any strictly monotone transform of a strictly
    increasing sequence has ρ = 1; reversing it gives ρ = −1; a constant
    column is degenerate → NULL."""
    from osmapreduceproject_spark.operators.stats import spearman_corr
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    up = spark.createDataFrame(
        [(float(i), float(i * i * i + 5)) for i in range(20)], "x double, y double"
    )
    assert spearman_corr(up, "x", "y").first()["spearman_rho"] == 1.0
    release_intermediates()
    down = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(20)], "x double, y double"
    )
    assert spearman_corr(down, "x", "y").first()["spearman_rho"] == -1.0
    release_intermediates()
    const = spark.createDataFrame(
        [(float(i), 7.0) for i in range(20)], "x double, y double"
    )
    assert spearman_corr(const, "x", "y").first()["spearman_rho"] is None
    release_intermediates()


def test_mcnemar_oracle(spark, duck):
    """Paired-rater discordance over the kappa fixture raters."""
    from osmapreduceproject_spark.operators.stats import mcnemar_test
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        (F.size(F.split(F.col("text"), " ")) >= 30).alias("rater_b"),
    )
    got = mcnemar_test(rated, "rater_a", "rater_b")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    # perfect agreement → NULL, not 0/0
    from osmapreduceproject_spark.operators.stats import mcnemar_test as mt

    same = spark.createDataFrame([(True, True), (False, False)], "a boolean, b boolean")
    assert mt(same, "a", "b").first()["mcnemar_chi2"] is None


def test_interval_gaps_oracle(spark, duck):
    """Idle gaps between merged activity islands per user (q227's
    interval construction), min_gap 60 s."""
    from osmapreduceproject_spark.operators.windows import interval_gaps

    e = _events(spark)
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    got = interval_gaps(iv, key="user_id", start="s", end="e", min_gap_seconds=60)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    # gaps are genuinely uncovered: each gap's span intersects no interval
    rows = got.limit(50).collect()
    assert rows and all(r["gap_end_us"] > r["gap_start_us"] for r in rows)
