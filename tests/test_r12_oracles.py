"""Cross-engine (DuckDB) parity for the r12-ready operators — staged a
round ahead of declaration (SURVEY.md §8 staging discipline, fifth
tranche after r8–r11): every operator lands with its oracle parity test
in the same commit, so the future q-entry is a copy-paste of (body, SQL)
pairs already green. Same driver-identical compare at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


def _t(spark, name):
    from osmapreduceproject_spark.queries import _t as t

    return t(spark, SF_CORRECT, name)


def test_weighted_quantiles_oracle(spark, duck):
    """Quantity-weighted price quantiles over lineitem: integer
    micro-unit weights, broadcast-offset cumulative sums, the smallest
    value whose cumulative weight reaches p·W."""
    from osmapreduceproject_spark.operators.stats import weighted_quantiles
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    got = weighted_quantiles(
        _t(spark, "lineitem"), "l_extendedprice", "l_quantity",
        percentiles=(0.5, 0.9, 0.99),
    )
    sql = """
    WITH pool AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v,
             CAST(round(CAST(l_quantity AS DOUBLE) * 1000000) AS BIGINT) AS wq
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
        AND l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))
        AND CAST(l_quantity AS DOUBLE) > 0),
    pv AS (SELECT v, SUM(wq) AS w FROM pool GROUP BY v),
    cum AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw FROM pv),
    tot AS (SELECT SUM(wq) AS W FROM pool),
    ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
    SELECT ps.p, MIN(cum.v) AS value,
           round(CAST(MAX(tot.W) AS DOUBLE) / 1000000, 6) AS total_weight
    FROM ps, tot, cum
    WHERE cum.cw >= ps.p * tot.W
    GROUP BY ps.p
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["p"]: r["value"] for r in got.collect()}
    assert rows[0.5] <= rows[0.9] <= rows[0.99]
    release_intermediates()


def test_weighted_quantiles_known_case(spark):
    """Hand-computed pin: values 1..4 with weights 1,1,1,7 → p50 lands
    on 4 (cum 3 < 5 ≤ 10), p25 on 3 (cum 2 < 2.5 ≤ 3); uniform weights
    reduce to the unweighted discrete quantile."""
    from osmapreduceproject_spark.operators.stats import weighted_quantiles
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)], "v double, w double"
    )
    rows = {
        r["p"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", percentiles=(0.25, 0.5)).collect()
    }
    assert rows[0.5] == 4.0 and rows[0.25] == 3.0
    release_intermediates()


def test_quantile_shift_report_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import quantile_shift_report

    got = quantile_shift_report(
        _t(spark, "events"), "event_type", "value", "view", "purchase",
        percentiles=(0.1, 0.25, 0.5, 0.75, 0.9),
    )
    one = """
      q{side} AS (
        SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS p,
               unnest(quantile_disc(v, [0.1, 0.25, 0.5, 0.75, 0.9])) AS qv
        FROM (
          SELECT CAST(value AS DOUBLE) AS v FROM events
          WHERE event_type = '{etype}' AND value IS NOT NULL
            AND NOT isnan(CAST(value AS DOUBLE))))"""
    sql = f"""
    WITH {one.format(side="a", etype="view")},
    {one.format(side="b", etype="purchase")}
    SELECT COALESCE(qa.p, qb.p) AS p, qa.qv AS q_a, qb.qv AS q_b,
           round(qb.qv - qa.qv, 6) AS shift
    FROM qa FULL OUTER JOIN qb ON qa.p = qb.p
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() == 5


def test_attribution_models_oracle(spark, duck):
    """First/last/linear attribution over one conversion-touch pairing:
    the oracle replays the join and both deterministic row_number picks."""
    from osmapreduceproject_spark.operators.events import attribution_models

    got = attribution_models(
        _t(spark, "events"), conversion_type="purchase",
        touch_types=("view", "click"), lookback_seconds=86400,
    )
    sql = """
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cts
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id AS u, event_type AS channel, epoch_us(ts) AS tts
      FROM events WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT c.cid, t.channel, t.tts,
             ROW_NUMBER() OVER (PARTITION BY c.cid
                                ORDER BY t.tts ASC, t.channel ASC) AS rf,
             ROW_NUMBER() OVER (PARTITION BY c.cid
                                ORDER BY t.tts DESC, t.channel DESC) AS rl,
             COUNT(*) OVER (PARTITION BY c.cid) AS cnt
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE t.tts < c.cts AND t.tts >= c.cts - CAST(86400 AS BIGINT) * 1000000)
    SELECT channel, COUNT(*) AS n_touches,
           CAST(SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_conversions,
           CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_conversions,
           round(SUM(1.0 / cnt), 6) AS linear_conversions
    FROM j GROUP BY channel
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    # every model attributes the same total number of conversions
    assert pdf.first_touch_conversions.sum() == pdf.last_touch_conversions.sum()
    assert pdf.linear_conversions.sum() == pytest.approx(
        float(pdf.first_touch_conversions.sum()), abs=1e-3
    )


def test_weekly_churn_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import weekly_churn

    got = weekly_churn(_t(spark, "events"), user_col="user_id", ts_col="ts")
    sql = """
    WITH weeks AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(epoch_us(ts) / 1000000.0 / 604800) AS BIGINT) AS w
      FROM events),
    nxt AS (SELECT u, w + 1 AS w2 FROM weeks),
    j AS (
      SELECT COALESCE(weeks.w, nxt.w2) AS week_idx,
             weeks.w IS NOT NULL AS active,
             nxt.w2 IS NOT NULL AS prev_active
      FROM weeks FULL OUTER JOIN nxt
        ON weeks.u = nxt.u AND weeks.w = nxt.w2)
    SELECT week_idx,
           CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN active AND prev_active THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN active AND NOT prev_active THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN NOT active AND prev_active THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned_from_prev
    FROM j GROUP BY week_idx
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_active == pdf.n_retained + pdf.n_new).all()


def test_knn_band_join_oracle(spark, duck):
    """3-NN within ±30 s, purchases against clicks: grid candidates +
    one left-keyed rank window equals the naive join + row_number."""
    from osmapreduceproject_spark.operators.joins import knn_band_join

    ev = _t(spark, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("p_sec"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("c_sec"),
    )
    got = knn_band_join(purch, clicks, "p_id", "p_sec", "c_id", "c_sec",
                        k=3, max_dist=30)
    sql = """
    WITH p AS (SELECT event_id AS p_id, epoch_us(ts) // 1000000 AS p_sec
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS c_id, epoch_us(ts) // 1000000 AS c_sec
          FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.p_id, p.p_sec, c.c_id, c.c_sec,
             abs(p.p_sec - c.c_sec) AS dist,
             ROW_NUMBER() OVER (PARTITION BY p.p_id
                                ORDER BY abs(p.p_sec - c.c_sec) ASC,
                                         c.c_sec ASC, c.c_id ASC) AS knn_rank
      FROM p JOIN c ON abs(p.p_sec - c.c_sec) <= 30)
    SELECT p_id, p_sec, c_id, c_sec, dist, CAST(knn_rank AS INTEGER) AS knn_rank
    FROM j WHERE knn_rank <= 3
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.groupby("p_id").knn_rank.max().le(3).all()
    assert (pdf.dist <= 30).all()


def test_char_class_report_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import char_class_report

    got = char_class_report(_t(spark, "documents"))
    cnt = "(length(text) - length(regexp_replace(text, '{pat}', '', 'g')))"
    letters = cnt.format(pat="[A-Za-z]")
    digits = cnt.format(pat="[0-9]")
    spaces = cnt.format(pat=r"[ \t\n\r]")
    puncts = cnt.format(pat=r"[!-/:-@\[-`{{-~]".replace("{{", "{"))
    sql = f"""
    WITH c AS (
      SELECT doc_id, length(text) AS n,
             {letters} AS letters,
             {digits} AS digits,
             {spaces} AS spaces,
             {puncts} AS puncts
      FROM documents)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           CASE WHEN n > 0 THEN round(CAST(letters AS DOUBLE) / n, 6) END AS letter_frac,
           CASE WHEN n > 0 THEN round(CAST(digits AS DOUBLE) / n, 6) END AS digit_frac,
           CASE WHEN n > 0 THEN round(CAST(spaces AS DOUBLE) / n, 6) END AS space_frac,
           CASE WHEN n > 0 THEN round(CAST(puncts AS DOUBLE) / n, 6) END AS punct_frac,
           CASE WHEN n > 0 THEN
             round(CAST(n - letters - digits - spaces - puncts AS DOUBLE) / n, 6)
           END AS other_frac
    FROM c
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna()
    total = (
        pdf.letter_frac + pdf.digit_frac + pdf.space_frac
        + pdf.punct_frac + pdf.other_frac
    )
    assert ((total - 1.0).abs() < 1e-5).all()


def test_video_motion_profile_oracle(spark, duck):
    """Per-video motion stats over the q239 closed-form fixture: mean
    and max adjacent hamming plus the single planted cut per video."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_motion_profile,
    )
    from osmapreduceproject_spark.queries_r9 import _scene_hash_sql

    frames = arith_video_frames(spark, n_videos=24, n_frames=12, cut_at=6)
    got = video_motion_profile(frames, max_hamming=10)
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
    per AS (
      SELECT vid,
             CASE WHEN ph IS NOT NULL
                  THEN bit_count(xor(dhash, ph)) END AS ham
      FROM lagged)
    SELECT CAST(vid AS BIGINT) AS media_id, COUNT(*) AS n_frames,
           COUNT(ham) AS n_pairs,
           round(CAST(SUM(ham) AS DOUBLE) / COUNT(ham), 6) AS mean_hamming,
           CAST(MAX(ham) AS BIGINT) AS max_hamming_obs,
           CAST(COALESCE(SUM(CASE WHEN ham > 10 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_cuts
    FROM per GROUP BY vid
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    assert all(
        rows[v]["n_frames"] == 12 and rows[v]["n_pairs"] == 11
        and rows[v]["n_cuts"] == 1
        for v in range(24)
    )


import os as _os


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M weighted rows, planted quantiles)",
)
def test_weighted_quantiles_scale_smoke(spark):
    """10M rows on a 1000-value grid where value v carries total weight
    proportional to (v+1) — the closed-form weighted CDF is quadratic,
    so p50 must land at v = ceil(sqrt(0.5)·1000)−1 ± 1 grid step.
    Evidences the broadcast-offset cumulative weights at a volume where
    a single-partition running sum would funnel the distinct-value
    frame through one task."""
    import math

    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.stats import weighted_quantiles
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("v"),
        ((F.col("id") % 1000) + 1).cast("double").alias("w"),
    )
    rows = {
        r["p"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", percentiles=(0.5, 0.9)).collect()
    }
    # cum weight up to v is (v+1)(v+2)/2 of total 1000*1001/2
    expect50 = math.ceil(math.sqrt(0.5 * 1000 * 1001) ) - 1
    assert abs(rows[0.5] - expect50) <= 1.0
    expect90 = math.ceil(math.sqrt(0.9 * 1000 * 1001)) - 1
    assert abs(rows[0.9] - expect90) <= 1.0
    release_intermediates()
