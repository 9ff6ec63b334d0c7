"""Cross-engine (DuckDB) parity for the r12-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, sixth tranche after r8–r12; the file number continues the
test-file series, the DECLARATION round is r12). Every operator lands
with its oracle parity test in the same commit, so the future q-entry
is a copy-paste of (body, SQL) pairs already green. Same
driver-identical compare at sf0.01.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


def _t(spark, name):
    from osmapreduceproject_spark.queries import _t as t

    return t(spark, SF_CORRECT, name)


def test_odds_ratio_oracle(spark, duck):
    """2×2 odds ratio over the q243 rater pair, Wald log-OR CI replayed
    in the identical fixed expression order."""
    from osmapreduceproject_spark.operators.stats import odds_ratio

    d = _t(spark, "documents")
    # NULL-text guard: F.size is -1 (non-NULL False) on NULL while the
    # oracle's len(string_split) is NULL (review finding, r12)
    rated = d.select(
        (F.col("n_chars") >= 200).alias("rater_a"),
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split(F.col("text"), " ")) >= 30,
        ).alias("rater_b"),
    )
    got = odds_ratio(rated, "rater_a", "rater_b")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n11"] + row["n10"] + row["n01"] + row["n00"] == row["n"]
    if row["odds_ratio"] is not None:
        assert row["or_ci_lo"] <= row["odds_ratio"] <= row["or_ci_hi"]


def test_odds_ratio_known_cases(spark):
    """Pins: the hand 2×2 (30,10,5,55) has OR = 33; any zero cell →
    NULL OR/CI, never inf; NULL flags are excluded, not False."""
    from osmapreduceproject_spark.operators.stats import odds_ratio

    df = spark.createDataFrame(
        [(True, True)] * 30 + [(True, False)] * 10
        + [(False, True)] * 5 + [(False, False)] * 55,
        "a boolean, b boolean",
    )
    r = odds_ratio(df, "a", "b").first()
    assert r["odds_ratio"] == 33.0 and r["or_ci_lo"] < 33.0 < r["or_ci_hi"]
    zero = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 3, "a boolean, b boolean"
    )
    rz = odds_ratio(zero, "a", "b").first()
    assert rz["odds_ratio"] is None and rz["or_ci_lo"] is None
    withnull = spark.createDataFrame(
        [(True, True), (True, None), (None, False), (False, False)],
        "a boolean, b boolean",
    )
    assert odds_ratio(withnull, "a", "b").first()["n"] == 2
    # ADVICE-r11 pin: an empty pool (all-NULL flags) reports four ZERO
    # cells — never NULL counts (the chi2_gof convention)
    empty = spark.createDataFrame(
        [(None, True), (True, None)], "a boolean, b boolean"
    )
    re_ = odds_ratio(empty, "a", "b").first()
    assert (re_["n"], re_["n11"], re_["n10"], re_["n01"], re_["n00"]) == (
        0, 0, 0, 0, 0,
    )
    assert re_["odds_ratio"] is None


def test_chi2_gof_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import chi2_gof

    got = chi2_gof(_t(spark, "events"), "event_type")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["chi2"] is not None and row["chi2"] >= 0.0


def test_chi2_gof_known_cases(spark):
    """Pins: 50/30/20 over 3 levels → χ² = 3·3800/100 − 100 = 14; a
    perfectly uniform split → 0; a single level → NULL (dof 0)."""
    from osmapreduceproject_spark.operators.stats import chi2_gof

    df = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 30 + [("z",)] * 20, "c string"
    )
    assert chi2_gof(df, "c").first()["chi2"] == 14.0
    uni = spark.createDataFrame([("x",)] * 5 + [("y",)] * 5, "c string")
    assert chi2_gof(uni, "c").first()["chi2"] == 0.0
    one = spark.createDataFrame([("x",)] * 7, "c string")
    r = chi2_gof(one, "c").first()
    assert r["chi2"] is None and r["dof"] == 0


def test_trimmed_mean_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import trimmed_mean

    got = trimmed_mean(_t(spark, "lineitem"), "l_extendedprice", trim=0.1)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["lo_cut"] <= row["trimmed_mean"] <= row["hi_cut"]
    assert row["n_kept"] <= row["n"]


def test_trimmed_mean_known_cases(spark):
    """Pins: 1..100 at trim 0.1 cuts at the discrete p10/p90 (10, 90)
    and the kept mean is exactly 50; invalid trim raises."""
    from osmapreduceproject_spark.operators.stats import trimmed_mean

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    r = trimmed_mean(df, "v", trim=0.1).first()
    assert (r["lo_cut"], r["hi_cut"]) == (10.0, 90.0)
    assert r["n_kept"] == 81 and r["trimmed_mean"] == 50.0
    with pytest.raises(ValueError, match="trim"):
        trimmed_mean(df, "v", trim=0.6)


def test_group_diversity_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import group_diversity

    got = group_diversity(_t(spark, "events"), "user_id", "event_type")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.hhi <= 1.0).all() and (pdf.hhi > 0.0).all()
    assert (pdf.entropy_bits >= -1e-9).all()


def test_group_diversity_known_cases(spark):
    """Pins: a 4+4 two-category group has H = 1 bit, norm 1, HHI 0.5;
    a single-category group has H = 0, NULL norm, HHI 1."""
    from osmapreduceproject_spark.operators.stats import group_diversity

    df = spark.createDataFrame(
        [("u1", "a")] * 4 + [("u1", "b")] * 4 + [("u2", "a")] * 8,
        "g string, c string",
    )
    rows = {r["g"]: r for r in group_diversity(df, "g", "c").collect()}
    assert rows["u1"]["entropy_bits"] == 1.0 and rows["u1"]["hhi"] == 0.5
    assert rows["u1"]["norm_entropy"] == 1.0
    assert rows["u2"]["entropy_bits"] == 0.0 and rows["u2"]["hhi"] == 1.0
    assert rows["u2"]["norm_entropy"] is None


def test_max_concurrency_oracle(spark, duck):
    """Sweep-line peak concurrency over the q251 interval construction;
    the oracle replays the endpoint running sum with the identical
    (t, delta) ordering."""
    from osmapreduceproject_spark.operators.events import max_concurrency

    ev = _t(spark, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    got = max_concurrency(iv, "user_id", "s", "e")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.max_concurrent >= 1).all()
    assert (pdf.max_concurrent <= pdf.n_intervals).all()


def test_max_concurrency_known_cases(spark):
    """Pins: two overlapping + one disjoint → 2; half-open semantics —
    an interval ending exactly when the next starts does NOT overlap."""
    from osmapreduceproject_spark.operators.events import max_concurrency

    base = datetime.datetime(2025, 1, 1)
    mins = lambda m: base + datetime.timedelta(minutes=m)  # noqa: E731
    df = spark.createDataFrame(
        [(1, mins(0), mins(10)), (1, mins(5), mins(15)), (1, mins(15), mins(20))],
        "k bigint, s timestamp, e timestamp",
    )
    r = max_concurrency(df, "k", "s", "e").first()
    assert r["max_concurrent"] == 2 and r["n_intervals"] == 3
    touch = spark.createDataFrame(
        [(1, mins(0), mins(10)), (1, mins(10), mins(20))],
        "k bigint, s timestamp, e timestamp",
    )
    assert max_concurrency(touch, "k", "s", "e").first()["max_concurrent"] == 1
    empty = spark.createDataFrame(
        [(1, mins(0), mins(0)), (1, mins(1), mins(2))],
        "k bigint, s timestamp, e timestamp",
    )
    assert max_concurrency(empty, "k", "s", "e").first()["n_intervals"] == 1


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


def test_seasonal_decompose_oracle(spark, duck):
    """Variance explained by the 24-slot cycle: per-position integer
    moments + the ordered residual fold, replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import seasonal_decompose

    got = seasonal_decompose(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=_STEP, period_slots=24,
    )
    sql = f"""
    WITH {_RS_CTE},
    q AS (SELECT k, CAST(round(value * 1000000) AS HUGEINT) AS vq,
                 CAST((slot_epoch // {_STEP}) % 24 AS INTEGER) AS pos
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["var_explained"])
    assert (pdf.var_explained <= 1.0 + 1e-9).all()


def test_seasonal_decompose_known_cases(spark):
    """Pins: a pure period-4 signal on an hourly grid is fully explained
    (R² = 1); a constant series has zero variance → NULL."""
    from osmapreduceproject_spark.operators.windows import seasonal_decompose

    base = datetime.datetime(2025, 1, 1)
    pure = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), float(i % 4)) for i in range(24)],
        "k bigint, ts timestamp, v double",
    )
    r = seasonal_decompose(pure, "k", "ts", "v", 3600, period_slots=4).first()
    assert r["var_explained"] == 1.0 and r["n_positions"] == 4
    const = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), 5.0) for i in range(12)],
        "k bigint, ts timestamp, v double",
    )
    r2 = seasonal_decompose(const, "k", "ts", "v", 3600, period_slots=4).first()
    assert r2["var_total"] == 0.0 and r2["var_explained"] is None


def test_seasonal_decompose_null_slots(spark):
    """ADVICE-r11 pin: leading NULL observations leave NULL-filled grid
    slots — those are EXCLUDED from n_slots and the moments (pre-fix
    they inflated the variance denominators); an all-NULL key emits no
    row."""
    from osmapreduceproject_spark.operators.windows import seasonal_decompose

    base = datetime.datetime(2025, 1, 1)
    rows = [(1, base + datetime.timedelta(hours=i), None) for i in range(4)]
    rows += [
        (1, base + datetime.timedelta(hours=4 + i), float(i % 4))
        for i in range(20)
    ]
    rows += [(2, base + datetime.timedelta(hours=i), None) for i in range(8)]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    out = seasonal_decompose(df, "k", "ts", "v", 3600, period_slots=4).collect()
    assert len(out) == 1 and out[0]["k"] == 1
    # 24 grid slots for key 1, first 4 NULL-filled → 20 value-bearing;
    # the pure period-4 signal over those is fully explained
    assert out[0]["n_slots"] == 20 and out[0]["var_explained"] == 1.0


def test_ljung_box_oracle(spark, duck):
    """Q over the graded ACF machinery: the oracle replays the q246 SQL
    and the quantized per-lag term sum."""
    from osmapreduceproject_spark.operators.windows import ljung_box

    got = ljung_box(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=_STEP, max_lag=3,
    )
    sql = f"""
    WITH {_RS_CTE},
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["q_stat"])
    assert (pdf.q_stat >= 0).all()


def test_ljung_box_known_cases(spark):
    """Pins: a strongly periodic series yields a large Q; a constant
    series has no usable lags (NULL Q, dof 0)."""
    from osmapreduceproject_spark.operators.windows import ljung_box

    base = datetime.datetime(2025, 1, 1)
    per = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), float(i % 2)) for i in range(48)],
        "k bigint, ts timestamp, v double",
    )
    r = ljung_box(per, "k", "ts", "v", 3600, max_lag=3).first()
    # lag-1 ACF of a perfect alternation is ≈ −1, lag-2 ≈ +1 → Q is large
    assert r["q_stat"] is not None and r["q_stat"] > 50.0
    const = spark.createDataFrame(
        [(1, base + datetime.timedelta(hours=i), 3.0) for i in range(12)],
        "k bigint, ts timestamp, v double",
    )
    r2 = ljung_box(const, "k", "ts", "v", 3600, max_lag=3).first()
    assert r2["q_stat"] is None and r2["n_lags_used"] == 0


def test_coverage_gap_anti_join_oracle(spark, duck):
    """Purchases NOT covered by any [click, click+60 s) window — the
    left_anti path of the graded grid join; oracle is NOT EXISTS."""
    from osmapreduceproject_spark.operators.joins import point_in_interval_join

    ev = _t(spark, "events")
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("p_sec"),
    )
    intervals = ev.where(F.col("event_type") == "click").select(
        F.floor(F.unix_micros("ts") / 1_000_000).alias("c_lo"),
        (F.floor(F.unix_micros("ts") / 1_000_000) + 60).alias("c_hi"),
    )
    got = point_in_interval_join(
        points, intervals, "p_sec", "c_lo", "c_hi", grid=60, how="left_anti"
    ).select("p_id", "p_sec")
    sql = """
    WITH p AS (SELECT event_id AS p_id, epoch_us(ts) // 1000000 AS p_sec
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT epoch_us(ts) // 1000000 AS c_lo FROM events
          WHERE event_type = 'click')
    SELECT p.p_id, p.p_sec FROM p
    WHERE NOT EXISTS (SELECT 1 FROM c
                      WHERE c.c_lo <= p.p_sec AND p.p_sec < c.c_lo + 60)
    """
    assert compare(got, duck.execute(sql).df()) == []
    # anti + semi partition the point set
    covered = point_in_interval_join(
        points, intervals, "p_sec", "c_lo", "c_hi", grid=60, how="left_semi"
    )
    assert got.count() + covered.count() == points.count()


def test_silhouette_report_oracle(spark, duck):
    """Centroid-based silhouette over the deterministic quantizer; the
    oracle replays cosine ranking (tie-to-larger-cid) and the
    double-rounded micro-quantized means."""
    from osmapreduceproject_spark.operators.similarity import silhouette_report

    got = silhouette_report(_t(spark, "embeddings"), n_centroids=16)
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
             round({d_ec} / ({n_e} * {n_c}), 6) AS cos
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.n_members.sum() == _t(spark, "embeddings").count()
    scored = pdf.dropna(subset=["mean_silhouette"])
    assert ((scored.mean_silhouette >= 0) & (scored.mean_silhouette <= 1)).all()


def test_audio_snr_report_oracle(spark, duck):
    """SNR over the dithered-silence fixture: the oracle regenerates
    every sample (127/128/129 floor, arithmetic wave signal) and
    replays framing, classification, and the log ratio."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_dither,
        audio_snr_report,
    )

    clips = arith_raw_audio_dither(spark, n=32, n_samples=2048)
    got = audio_snr_report(clips)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    # planted quiet ranges = frames 8..11 and 24..25 → 6 floor frames
    assert all(rows[m]["n_floor_frames"] == 6 for m in range(32))
    assert all(rows[m]["snr_db"] is not None and rows[m]["snr_db"] > 10
               for m in range(32))


def test_audio_snr_degenerate(spark):
    """Digital silence (zero floor mass) and all-signal clips emit NULL
    SNR, never ±inf."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_silence,
        audio_snr_report,
    )

    pure = arith_raw_audio_silence(spark, n=4, n_samples=2048)
    rows = audio_snr_report(pure).collect()
    assert all(r["snr_db"] is None for r in rows)  # floor mass exactly 0
    assert all(r["n_floor_frames"] == 6 for r in rows)


def test_image_exposure_report_oracle(spark, duck):
    """Exposure histogram entropy + clip fractions over the arithmetic
    RAW8 fixture — every gray regenerated from the pixel formula, the
    per-bin entropy terms quantized identically on both engines."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_exposure_report,
    )

    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    got = image_exposure_report(imgs)
    ch = "((31*m + 7*(p*3 + {k}) + ((p*3 + {k})*(p*3 + {k})) % 251) % 256)"
    gray = f"({ch.format(k=0)} + {ch.format(k=1)} + {ch.format(k=2)}) // 3"
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    g AS (SELECT m, p, {gray} AS gray FROM px),
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.entropy_bits > 0).all() and (pdf.entropy_bits <= 4.0 + 1e-9).all()


def test_image_exposure_known_case(spark):
    """Pin on a hand-built frame: an all-black 4×4 image has entropy 0,
    shadow_frac 1, gray range (0, 0)."""
    from osmapreduceproject_spark.operators.multimodal import image_exposure_report

    payload = bytes(4 * 4 * 3)
    df = spark.createDataFrame(
        [(0, "image", payload, (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = image_exposure_report(df).first()
    assert r["n_px"] == 16 and r["entropy_bits"] == 0.0
    assert r["shadow_frac"] == 1.0 and r["highlight_frac"] == 0.0
    assert (r["gray_min"], r["gray_max"]) == (0, 0)


def test_tokenizer_fertility_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import tokenizer_fertility

    got = tokenizer_fertility(_t(spark, "documents"))
    sql = r"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.chars_per_ws_token > 0).all()


import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M-interval sweep line)",
)
def test_max_concurrency_scale_smoke(spark):
    """10M staircase intervals across 1000 keys: key k holds 10k
    intervals [i·10, i·10 + 100) — each interval overlaps exactly the
    9 before and 9 after it interior-wise, so peak concurrency is
    exactly 10 everywhere in the steady state. Evidences the per-key
    endpoint window at volume (20M endpoint rows, no global sort)."""
    from osmapreduceproject_spark.operators.events import max_concurrency

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("k"),
        F.timestamp_micros((F.col("id") / 1000).cast("bigint") * 10_000_000).alias("s"),
        F.timestamp_micros(
            (F.col("id") / 1000).cast("bigint") * 10_000_000 + 100_000_000
        ).alias("e"),
    )
    out = max_concurrency(df, "k", "s", "e")
    agg = out.agg(
        F.count(F.lit(1)).alias("keys"),
        F.min("max_concurrent").alias("mn"),
        F.max("max_concurrent").alias("mx"),
    ).first()
    assert agg["keys"] == 1000 and agg["mn"] == 10 and agg["mx"] == 10


def test_chi2_gof_empty_input(spark):
    """Review pin (r11): empty input floors to (0, 0, 0, NULL), never a
    negative dof or NULL count."""
    from osmapreduceproject_spark.operators.stats import chi2_gof

    df = spark.createDataFrame([], "c string")
    r = chi2_gof(df, "c").first()
    assert (r["n"], r["n_levels"], r["dof"], r["chi2"]) == (0, 0, 0, None)


def test_tokenizer_fertility_null_text(spark):
    """Review pin (r11): NULL text contributes NULL (skipped) to every
    count — F.size's -1-on-NULL must never subtract from token sums."""
    from osmapreduceproject_spark.operators.text import tokenizer_fertility

    df = spark.createDataFrame(
        [("s", "a b c"), ("s", None), ("s", "d e")], "source string, text string"
    )
    r = tokenizer_fertility(df).first()
    assert r["n_docs"] == 3 and r["n_ws_tokens"] == 5
    assert r["n_chars"] == 8 and r["n_regex_tokens"] == 5


def test_image_exposure_rejects_bad_bins(spark):
    """Review pin (r11): n_bins must divide 256 (a non-divisor would
    silently add an extra histogram bin)."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_exposure_report,
    )

    imgs = arith_raw_images(spark, n=1, width=4, height=4)
    with pytest.raises(ValueError, match="divisor of 256"):
        image_exposure_report(imgs, n_bins=10)
    assert image_exposure_report(imgs, n_bins=32).count() == 1


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M slots through the decomposition)",
)
def test_seasonal_decompose_scale_smoke(spark):
    """10k keys × 1000 hourly slots (10M grid rows), every series a pure
    period-24 cycle: the position model explains ALL variance —
    var_explained exactly 1.0 for every key, 24 positions each.
    Evidences the per-(key, position) moment collapse and the bounded
    ordered residual fold at volume (240k position rows, never a
    per-slot window)."""
    from osmapreduceproject_spark.operators.windows import seasonal_decompose

    n_keys, n_slots = 10_000, 1_000
    df = spark.range(n_keys * n_slots).select(
        (F.col("id") % n_keys).alias("k"),
        F.timestamp_seconds(
            1_700_000_000 // 3600 * 3600
            + (F.col("id") / n_keys).cast("bigint") * 3600
        ).alias("ts"),
        (((F.col("id") / n_keys).cast("bigint") % 24) * 10).cast("double").alias("v"),
    )
    out = seasonal_decompose(df, "k", "ts", "v", 3600, period_slots=24)
    agg = out.agg(
        F.count(F.lit(1)).alias("keys"),
        F.min("var_explained").alias("mn"),
        F.max("var_explained").alias("mx"),
        F.min("n_positions").alias("np"),
    ).first()
    assert agg["keys"] == n_keys
    assert agg["mn"] == 1.0 and agg["mx"] == 1.0 and agg["np"] == 24
