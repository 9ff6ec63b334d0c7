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


def test_knn_band_join_shared_and_clashing_names(spark):
    """Advisor finding, r10: sides sharing a value-column name raised an
    ambiguous-reference AnalysisException — both sides now rebind to
    internal aliases, so shared names across sides work; the four
    OUTPUT names must still be pairwise distinct (loud ValueError)."""
    from osmapreduceproject_spark.operators.joins import knn_band_join

    import pytest as _pytest

    l = spark.createDataFrame([(1, 10), (2, 100)], "id int, v long")
    r = spark.createDataFrame([(7, 12), (8, 14), (9, 104)], "rid int, rv long")
    # the advice scenario: BOTH frames carry columns named id/v — the
    # requested output names (id2/v2) are distinct, and the sides'
    # extra same-named columns must not poison resolution
    r_same = r.select(
        F.col("rid").alias("id2"), F.col("rv").alias("v2"),
        F.lit(0).alias("id"), F.lit(0).alias("v"),
    )
    shared = knn_band_join(l, r_same, "id", "v", "id2", "v2", k=2, max_dist=30)
    rows = {(x["id"], x["knn_rank"]): x["id2"] for x in shared.collect()}
    assert rows[(1, 1)] == 7 and rows[(1, 2)] == 8 and rows[(2, 1)] == 9
    with _pytest.raises(ValueError, match="pairwise distinct"):
        knn_band_join(l, r, "id", "v", "rid", "v", k=1, max_dist=5)


def test_ranged_cumsum_rejects_non_integral(spark):
    """Advisor finding, r10: a double/decimal sum column would silently
    truncate its prefix sums through the bigint offset cast — misuse
    now fails loudly at call time."""
    import pytest as _pytest

    from osmapreduceproject_spark.operators.stats import _ranged_cumsum

    df = spark.createDataFrame([(1.0, 2.5)], "v double, w double")
    with _pytest.raises(TypeError, match="non-integral"):
        _ranged_cumsum(df, "v", ["w"])


def test_weighted_quantiles_empty_pool_contract(spark):
    """Documented contract (advisor finding, r10): an all-excluded pool
    (NULL/NaN values, non-positive weights) returns ZERO rows — same as
    the oracle's threshold join."""
    from osmapreduceproject_spark.operators.stats import weighted_quantiles
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    df = spark.createDataFrame(
        [(None, 1.0), (2.0, 0.0), (3.0, -1.0), (float("nan"), 2.0)],
        "v double, w double",
    )
    assert weighted_quantiles(df, "v", "w", percentiles=(0.5,)).count() == 0
    release_intermediates()


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


_STEP = 3600
_STEP_US = _STEP * 1_000_000

_RS_CTE = f"""
    obs AS (SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
            FROM events),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / {_STEP_US}.0) * {_STEP_US} AS BIGINT),
        CAST(floor(hi / {_STEP_US}.0) * {_STEP_US} AS BIGINT) + 1,
        {_STEP_US})) AS e
      FROM spans),
    resampled AS (
      SELECT g.k, g.e // 1000000 AS slot_epoch, o.v AS value
      FROM grid g ASOF JOIN obs o ON g.k = o.k AND o.e <= g.e)"""


def test_mann_kendall_trend_oracle(spark, duck):
    """MK S / tie-corrected variance / continuity-corrected z / Sen
    slope per key, the all-pairs oracle replaying quantized sign
    comparisons and the discrete median of pairwise slopes."""
    from osmapreduceproject_spark.operators.windows import mann_kendall_trend

    got = mann_kendall_trend(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=_STEP,
    )
    sql = f"""
    WITH {_RS_CTE},
    q AS (SELECT k, value AS v,
                 CAST(round(value * 1000000) AS BIGINT) AS vq,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY slot_epoch) - 1 AS j
          FROM resampled),
    pairs AS (SELECT a.k,
                     CASE WHEN b.vq > a.vq THEN 1
                          WHEN b.vq < a.vq THEN -1 ELSE 0 END AS sg,
                     (b.v - a.v) / CAST(b.j - a.j AS DOUBLE) AS slope
              FROM q a JOIN q b ON a.k = b.k AND a.j < b.j),
    per AS (SELECT k, SUM(sg) AS s_stat, quantile_disc(slope, 0.5) AS sen
            FROM pairs GROUP BY k),
    ties AS (SELECT k, SUM(c*(c-1)*(2*c+5)) AS tie FROM (
               SELECT k, vq, COUNT(*) AS c FROM q GROUP BY 1, 2) GROUP BY k),
    nn AS (SELECT k, COUNT(*) AS n FROM q GROUP BY k),
    fin AS (
      SELECT nn.k, nn.n, per.s_stat, per.sen,
             CASE WHEN nn.n >= 2 THEN
               (CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2*nn.n + 5)
                - CAST(ties.tie AS DOUBLE)) / 18.0
             END AS var_s
      FROM nn LEFT JOIN per ON per.k = nn.k
      LEFT JOIN ties ON ties.k = nn.k)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n_slots,
           CAST(s_stat AS BIGINT) AS s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN var_s > 0 THEN
             CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END
           END, 6) AS z,
           round(sen, 6) AS sen_slope
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["s_stat"])
    assert len(pdf) > 0
    # |S| is bounded by the pair count
    assert (pdf.s_stat.abs() <= pdf.n_slots * (pdf.n_slots - 1) / 2).all()


def test_mann_kendall_known_cases(spark):
    """Pins: a strictly increasing series has S = n(n−1)/2 and Sen
    slope exactly the common difference; a constant series has S = 0
    with zero variance (NULL z)."""
    import datetime

    from osmapreduceproject_spark.operators.windows import mann_kendall_trend

    base = datetime.datetime(2025, 1, 1)
    inc = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), 2.0 * i) for i in range(10)],
        "k bigint, ts timestamp, v double",
    )
    r = mann_kendall_trend(inc, "k", "ts", "v", 3600).first()
    assert r["s_stat"] == 45 and r["sen_slope"] == 2.0 and r["z"] > 0
    const = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), 7.0) for i in range(10)],
        "k bigint, ts timestamp, v double",
    )
    r2 = mann_kendall_trend(const, "k", "ts", "v", 3600).first()
    assert r2["s_stat"] == 0 and r2["z"] is None


def test_mann_kendall_guard_fires(spark):
    import datetime

    from osmapreduceproject_spark.operators.windows import mann_kendall_trend

    base = datetime.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), float(i % 5)) for i in range(30)],
        "k bigint, ts timestamp, v double",
    )
    with pytest.raises(Exception, match="max_slots"):
        mann_kendall_trend(df, "k", "ts", "v", 3600, max_slots=10).count()
    assert mann_kendall_trend(df, "k", "ts", "v", 3600, max_slots=30).count() == 1


def test_wilson_ci_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import wilson_ci

    ev = _t(spark, "events")
    rated = ev.select("event_type", (F.col("value") > 5.0).alias("hit"))
    got = wilson_ci(rated, "event_type", "hit")
    sql = """
    WITH per AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CASE WHEN CAST(value AS DOUBLE) > 5.0 THEN 1 ELSE 0 END) AS k
      FROM events GROUP BY event_type),
    e AS (SELECT event_type, n, k,
                 CAST(k AS DOUBLE) / n AS p,
                 1.0 + (1.96*1.96) / n AS denom
          FROM per)
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_success,
           round(p, 6) AS p_hat,
           round((p + (1.96*1.96) / (2.0*n)) / denom
                 - 1.96 * sqrt(p*(1.0 - p)/n + (1.96*1.96)/(4.0*n*n)) / denom,
                 6) AS ci_lo,
           round((p + (1.96*1.96) / (2.0*n)) / denom
                 + 1.96 * sqrt(p*(1.0 - p)/n + (1.96*1.96)/(4.0*n*n)) / denom,
                 6) AS ci_hi
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert ((pdf.ci_lo >= 0) & (pdf.ci_hi <= 1)).all()
    assert ((pdf.ci_lo <= pdf.p_hat) & (pdf.p_hat <= pdf.ci_hi)).all()


def test_cluster_cohesion_oracle(spark, duck):
    """Per-cluster cohesion/margin over the deterministic quantizer:
    the oracle replays the rounded-dot tie-to-larger-cid top-2 and the
    quantized means with sequential-fold dot products."""
    from osmapreduceproject_spark.operators.similarity import cluster_cohesion

    got = cluster_cohesion(_t(spark, "embeddings"), n_centroids=16)
    dotf = (
        "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )
    norm = (
        "sqrt(list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    d_ec = dotf.format(a="e.embedding", b="c.cvec")
    n_e = norm.format(a="e.embedding")
    n_c = norm.format(a="c.cvec")
    sql = f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    scored AS (
      SELECT e.vec_id, c.cid,
             round({d_ec}, 6) AS s,
             round({d_ec} / ({n_e} * {n_c}), 6) AS cos
      FROM embeddings e CROSS JOIN cents c),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY s DESC, cid DESC) AS rn
      FROM scored),
    best AS (SELECT vec_id, cid, s,
                    CAST(round(cos * 1000000) AS BIGINT) AS cosq
             FROM ranked WHERE rn = 1),
    sec AS (SELECT vec_id, s AS s2 FROM ranked WHERE rn = 2),
    per AS (SELECT b.cid, b.cosq,
                   CAST(round((b.s - sec.s2) * 1000000) AS BIGINT) AS marq
            FROM best b JOIN sec ON sec.vec_id = b.vec_id)
    SELECT cid, COUNT(*) AS n_members,
           round(CAST(SUM(cosq) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_cosine,
           round(CAST(SUM(marq) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_margin
    FROM per GROUP BY cid
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.n_members.sum() == _t(spark, "embeddings").count()
    assert (pdf.mean_margin >= 0).all()


def test_late_arrival_report_oracle(spark, duck):
    """Per-row watermark accounting replayed with a plain running-max
    window in SQL: same arrival order (event_id), same strict-<
    lateness rule, same tumbling windows."""
    from osmapreduceproject_spark.streaming.windows import late_arrival_report

    got = late_arrival_report(
        _t(spark, "events"), delay_seconds=3600, window_seconds=86400
    )
    sql = """
    WITH a AS (
      SELECT event_id AS aid, epoch_us(ts) AS e FROM events),
    m AS (SELECT e,
                 MAX(e) OVER (ORDER BY aid
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pm
          FROM a),
    c AS (SELECT e,
                 pm IS NOT NULL AND e < pm - CAST(3600 AS BIGINT) * 1000000
                   AS late
          FROM m)
    SELECT CAST(e // (CAST(86400 AS BIGINT) * 1000000) * 86400 AS BIGINT) AS window_start_epoch,
           CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_on_time,
           CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped,
           COUNT(*) AS n_rows
    FROM c GROUP BY 1
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_on_time + pdf.n_late_dropped == pdf.n_rows).all()


def test_late_arrival_known_case(spark):
    """Pins: arrival order 10:00, 12:00, 10:30 with delay 1h — the
    10:30 event is behind the 12:00-driven watermark (11:00) and is
    late; in-order arrivals are never late; delay large enough keeps
    everything."""
    import datetime

    from osmapreduceproject_spark.streaming.windows import late_arrival_report

    base = datetime.datetime(2025, 1, 1, 10, 0)
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + datetime.timedelta(hours=2)),
            (3, base + datetime.timedelta(minutes=30)),
        ],
        "event_id bigint, ts timestamp",
    )
    r = late_arrival_report(df, delay_seconds=3600, window_seconds=86400).first()
    assert r["n_rows"] == 3 and r["n_late_dropped"] == 1
    r2 = late_arrival_report(df, delay_seconds=7200, window_seconds=86400).first()
    assert r2["n_late_dropped"] == 0


def test_distribution_shape_report_oracle(spark, duck):
    """Skew/kurtosis/JB from quantized raw moments: the oracle replays
    the central-moment identities over HUGEINT sums in the identical
    fixed expression order."""
    from osmapreduceproject_spark.operators.stats import distribution_shape_report

    got = distribution_shape_report(_t(spark, "orders"), "o_totalprice")
    sql = """
    WITH pool AS (
      SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 10) AS HUGEINT) AS xq
      FROM orders
      WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    s AS (SELECT COUNT(*) AS n, SUM(xq) AS s1, SUM(xq*xq) AS s2,
                 SUM(xq*xq*xq) AS s3, SUM(xq*xq*xq*xq) AS s4
          FROM pool),
    d AS (SELECT n, s1,
                 CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
                 CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4
          FROM s),
    m AS (SELECT n, s1,
                 n * d2 - d1 * d1 AS m2n,
                 n * n * d3 - 3.0 * n * d1 * d2 + 2.0 * d1 * d1 * d1 AS m3n,
                 n * n * n * d4 - 4.0 * n * n * d1 * d3
                   + 6.0 * n * d1 * d1 * d2
                   - 3.0 * d1 * d1 * d1 * d1 AS m4n
          FROM d),
    f AS (SELECT n,
                 CAST(s1 AS DOUBLE) / n / 10 AS mean,
                 CASE WHEN n >= 2 AND m2n > 0 THEN
                   m3n / pow(m2n, 1.5)
                 END AS skew,
                 CASE WHEN n >= 2 AND m2n > 0 THEN
                   m4n / (m2n * m2n) - 3.0
                 END AS kurt
          FROM m)
    SELECT CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
           round(skew, 6) AS skewness, round(kurt, 6) AS kurtosis_excess,
           round(n / 6.0 * (skew * skew + kurt * kurt / 4.0), 6) AS jarque_bera
    FROM f
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["jarque_bera"] is not None and row["jarque_bera"] >= 0


def test_distribution_shape_known_cases(spark):
    """Pins: a symmetric two-point mass has skew 0 and kurtosis −2
    (the minimum); the hand-computed {0,0,0,10} case has
    skew = 93.75/18.75^1.5 ≈ 1.154701; constant input → NULL stats."""
    from osmapreduceproject_spark.operators.stats import distribution_shape_report

    sym = spark.createDataFrame([(0.0,), (1.0,)] * 8, "v double")
    r = distribution_shape_report(sym, "v").first()
    assert r["skewness"] == 0.0 and r["kurtosis_excess"] == -2.0
    hand = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (10.0,)], "v double")
    r2 = distribution_shape_report(hand, "v").first()
    assert r2["skewness"] == pytest.approx(1.154701, abs=1e-6)
    const = spark.createDataFrame([(3.0,)] * 5, "v double")
    r3 = distribution_shape_report(const, "v").first()
    assert r3["skewness"] is None and r3["jarque_bera"] is None


def test_active_user_rollup_oracle(spark, duck):
    """DAU/WAU/MAU via contribution explosion of distinct (user, day)
    pairs; the oracle uses the equivalent range predicate. Full-span
    day grid, zero-activity days report zeros."""
    from osmapreduceproject_spark.operators.events import active_user_rollup

    got = active_user_rollup(_t(spark, "events"))
    sql = """
    WITH pairs AS (
      SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
      FROM events),
    span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM pairs),
    grid AS (SELECT unnest(range(lo, hi + 1)) AS td FROM span),
    dau AS (SELECT d AS td, COUNT(DISTINCT u) AS dau FROM pairs GROUP BY d),
    wau AS (SELECT g.td, COUNT(DISTINCT p.u) AS wau
            FROM grid g JOIN pairs p ON p.d <= g.td AND p.d > g.td - 7
            GROUP BY g.td),
    mau AS (SELECT g.td, COUNT(DISTINCT p.u) AS mau
            FROM grid g JOIN pairs p ON p.d <= g.td AND p.d > g.td - 30
            GROUP BY g.td)
    SELECT CAST(g.td * 86400 AS BIGINT) AS day_epoch,
           CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
           CAST(COALESCE(wau.wau, 0) AS BIGINT) AS wau,
           CAST(COALESCE(mau.mau, 0) AS BIGINT) AS mau
    FROM grid g
    LEFT JOIN dau ON dau.td = g.td
    LEFT JOIN wau ON wau.td = g.td
    LEFT JOIN mau ON mau.td = g.td
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert ((pdf.dau <= pdf.wau) & (pdf.wau <= pdf.mau)).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M rows, shape moments)",
)
def test_distribution_shape_scale_smoke(spark):
    """10M rows on a symmetric two-point mass: skew exactly 0, excess
    kurtosis exactly −2 — the quantized decimal moment sums survive the
    fourth power at volume (the documented |x·scale|⁴·n bound)."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.stats import distribution_shape_report

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 2 * 1000).cast("double").alias("v")
    )
    r = distribution_shape_report(df, "v").first()
    assert r["n"] == n and r["skewness"] == 0.0 and r["kurtosis_excess"] == -2.0


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M user-days through the rollup explosion)",
)
def test_active_user_rollup_scale_smoke(spark):
    """100k users × 100 distinct days each (10M user-day pairs, 300M
    contribution rows at the MAU fan-out): every user active every day
    in a 100-day span → dau = wau = mau = 100k on every day from day 29
    onward; day d < 29 has mau = 100k too (all users active within the
    window) — pins the explosion arithmetic at volume."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.events import active_user_rollup

    n_users, n_days = 100_000, 100
    df = spark.range(n_users * n_days).select(
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_seconds(
            (F.col("id") / n_users).cast("bigint") * 86400 + 1_700_000_000 // 86400 * 86400
        ).alias("ts"),
    )
    out = active_user_rollup(df)
    agg = out.agg(
        F.count(F.lit(1)).alias("days"),
        F.min("dau").alias("min_dau"),
        F.min("mau").alias("min_mau"),
        F.max("mau").alias("max_mau"),
    ).first()
    assert agg["days"] == n_days
    assert agg["min_dau"] == n_users and agg["min_mau"] == n_users
    assert agg["max_mau"] == n_users


def test_mann_kendall_null_values(spark):
    """Review pin (r11): leading-NULL grid values (a key whose first
    observations carry NULL value) must not crash the Arrow worker —
    NULL comparisons contribute sign 0, NULL slopes are skipped by the
    Sen median, NULL is one tie level (the oracle's conventions).
    Hand case [NULL, 2, 4] hourly: S = 1 (only the 2<4 pair counts),
    Sen = 2.0 (the one defined slope), Var = 3·2·11/18."""
    import datetime

    from osmapreduceproject_spark.operators.windows import mann_kendall_trend

    base = datetime.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [(1, base, None), (1, base + datetime.timedelta(hours=1), 2.0),
         (1, base + datetime.timedelta(hours=2), 4.0)],
        "k bigint, ts timestamp, v double",
    )
    r = mann_kendall_trend(df, "k", "ts", "v", 3600).first()
    assert r["n_slots"] == 3 and r["s_stat"] == 1
    assert r["sen_slope"] == 2.0
    assert r["var_s"] == pytest.approx(66 / 18, abs=1e-6)
    allnull = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), None) for i in range(4)],
        "k bigint, ts timestamp, v double",
    )
    r2 = mann_kendall_trend(allnull, "k", "ts", "v", 3600).first()
    assert r2["s_stat"] == 0 and r2["sen_slope"] is None
