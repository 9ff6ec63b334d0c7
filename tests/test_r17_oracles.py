"""Cross-engine (DuckDB) parity for the r16-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, tenth tranche after r8–r16; the file number continues the
test-file series, the DECLARATION round is r16). Every operator lands
with its oracle parity test in the same commit, so the future q-entry
is a copy-paste of (body, SQL) pairs already green. Same
driver-identical compare at sf0.01.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


def _t(spark, name):
    from osmapreduceproject_spark.queries import _t as t

    return t(spark, SF_CORRECT, name)


# ---------------------------------------------------------------------------
# stats family
# ---------------------------------------------------------------------------


def test_wilcoxon_signed_rank_oracle(spark, duck):
    """Paired per-user (click mean − purchase mean) differences through
    the doubled-midrank machinery — the full pipeline replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import wilcoxon_signed_rank

    got = wilcoxon_signed_rank(
        _t(spark, "events"), "user_id", "event_type", "value",
        "click", "purchase",
    )
    sql = """
    WITH per AS (
      SELECT user_id AS k, event_type = 'click' AS ga,
             SUM(CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT)) AS s,
             COUNT(*) AS c
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND event_type IN ('click', 'purchase') AND user_id IS NOT NULL
      GROUP BY 1, 2),
    m AS (SELECT k, COUNT(*) AS sides,
            MAX(CASE WHEN ga THEN s END) AS sa,
            MAX(CASE WHEN ga THEN c END) AS ca,
            MAX(CASE WHEN NOT ga THEN s END) AS sb,
            MAX(CASE WHEN NOT ga THEN c END) AS cb
          FROM per GROUP BY k),
    d AS (SELECT sides,
            CASE WHEN sides = 2 THEN CAST(round(
              CAST(sa AS DOUBLE) / ca - CAST(sb AS DOUBLE) / cb)
              AS BIGINT) END AS d
          FROM m),
    cnt AS (SELECT SUM(CASE WHEN sides != 2 THEN 1 ELSE 0 END) AS inc,
                   SUM(CASE WHEN sides = 2 AND d = 0 THEN 1 ELSE 0 END) AS zr
            FROM d),
    nz AS (SELECT d, abs(d) AS v FROM d WHERE sides = 2 AND d != 0),
    pv AS (SELECT v, COUNT(*) AS cn FROM nz GROUP BY v),
    r2 AS (SELECT v, 2 * (SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
           FROM pv),
    p2 AS (SELECT nz.d > 0 AS pos, COUNT(*) AS n,
                  SUM(CAST(r2.r2 AS HUGEINT)) AS s2
           FROM nz JOIN r2 ON r2.v = nz.v GROUP BY 1),
    ties AS (SELECT COALESCE(SUM(CAST(cn AS HUGEINT)*cn*cn - cn), 0) AS t
             FROM pv),
    f AS (SELECT
            COALESCE((SELECT n FROM p2 WHERE pos), 0) AS np,
            COALESCE((SELECT n FROM p2 WHERE NOT pos), 0) AS nn,
            COALESCE((SELECT s2 FROM p2 WHERE pos), 0) AS s2p,
            COALESCE((SELECT s2 FROM p2 WHERE NOT pos), 0) AS s2n,
            (SELECT t FROM ties) AS t,
            (SELECT inc FROM cnt) AS inc, (SELECT zr FROM cnt) AS zr),
    e AS (SELECT np + nn AS n, s2p, s2n, t, inc, zr,
                 CAST(s2p AS DOUBLE) / 2 AS wp,
                 (np + nn) * (np + nn + 1) / 4.0 AS mw,
                 (np + nn) * (np + nn + 1) * (2 * (np + nn) + 1) / 24.0
                   - CAST(t AS DOUBLE) / 48.0 AS var
          FROM f)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(COALESCE(zr, 0) AS BIGINT) AS n_dropped_zero,
           CAST(COALESCE(inc, 0) AS BIGINT) AS n_incomplete,
           CASE WHEN n > 0 THEN round(wp, 6) END AS w_plus,
           CASE WHEN n > 0 THEN round(CAST(s2n AS DOUBLE) / 2, 6) END
             AS w_minus,
           CASE WHEN n > 0 THEN round(mw, 6) END AS mean_w,
           CASE WHEN n > 0 THEN round(var, 6) END AS var_w,
           CASE WHEN n > 0 AND var > 0 THEN
             round((wp - mw) / sqrt(var), 6) END AS z
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    # rank mass splits exactly: W+ + W− = n(n+1)/2
    assert abs(r["w_plus"] + r["w_minus"]
               - r["n_pairs"] * (r["n_pairs"] + 1) / 2) < 1e-6


def test_wilcoxon_signed_rank_known_cases(spark):
    """Pins: all-positive differences put the whole rank mass in W⁺
    (W⁻ = 0); a symmetric ± pattern gives z ≈ 0; a one-sided key and an
    exact-zero pair are counted, not fatal."""
    from osmapreduceproject_spark.operators.stats import wilcoxon_signed_rank

    rows = []
    for k in range(1, 7):  # a: k + 1, b: 1 → d = k·1e6 > 0, all distinct
        rows.append((k, "a", float(k + 1)))
        rows.append((k, "b", 1.0))
    rows.append((7, "a", 5.0))  # incomplete (no b side)
    rows.append((8, "a", 2.0))
    rows.append((8, "b", 2.0))  # exact zero difference
    df = spark.createDataFrame(rows, "k long, g string, v double")
    r = wilcoxon_signed_rank(df, "k", "g", "v", "a", "b").first()
    assert r["n_pairs"] == 6
    assert r["n_incomplete"] == 1 and r["n_dropped_zero"] == 1
    assert r["w_plus"] == 21.0 and r["w_minus"] == 0.0  # 1+2+..+6
    assert r["z"] > 2.0
    sym = spark.createDataFrame(
        [(1, "a", 2.0), (1, "b", 1.0), (2, "a", 1.0), (2, "b", 2.0)],
        "k long, g string, v double",
    )
    s = wilcoxon_signed_rank(sym, "k", "g", "v", "a", "b").first()
    assert s["w_plus"] == s["w_minus"]
    assert abs(s["z"]) < 1e-9


def test_theil_u_oracle(spark, duck):
    """source ↔ lang uncertainty coefficients — quantized entropy terms
    over exact count ratios, both directions replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import theil_u

    got = theil_u(_t(spark, "documents"), "source", "lang")
    sql = """
    WITH pool AS (SELECT source AS x, lang AS y FROM documents
                  WHERE source IS NOT NULL AND lang IS NOT NULL),
    cells AS (SELECT x, y, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    nn AS (SELECT SUM(c) AS n FROM cells),
    hx AS (SELECT SUM(CAST(round(CAST(cx AS DOUBLE)
                 * log2(CAST(cx AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * 1000000000) AS HUGEINT)) AS q, COUNT(*) AS lv
           FROM (SELECT x, SUM(c) AS cx FROM cells GROUP BY x), nn),
    hy AS (SELECT SUM(CAST(round(CAST(cy AS DOUBLE)
                 * log2(CAST(cy AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * 1000000000) AS HUGEINT)) AS q, COUNT(*) AS lv
           FROM (SELECT y, SUM(c) AS cy FROM cells GROUP BY y), nn),
    hxy AS (SELECT SUM(CAST(round(CAST(c AS DOUBLE)
                 * log2(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * 1000000000) AS HUGEINT)) AS q
            FROM cells, nn),
    e AS (SELECT nn.n, hx.lv AS lx, hy.lv AS ly,
                 -CAST(hx.q AS DOUBLE) / 1000000000 / nn.n AS h_x,
                 -CAST(hy.q AS DOUBLE) / 1000000000 / nn.n AS h_y,
                 -CAST(hxy.q AS DOUBLE) / 1000000000 / nn.n AS h_xy
          FROM nn, hx, hy, hxy)
    SELECT CAST(n AS BIGINT) AS n, CAST(lx AS BIGINT) AS n_x_levels,
           CAST(ly AS BIGINT) AS n_y_levels,
           round(h_x, 6) AS h_x, round(h_y, 6) AS h_y,
           round(h_xy, 6) AS h_xy,
           CASE WHEN h_y > 0 THEN
             round((h_y - (h_xy - h_x)) / h_y, 6) END AS u_y_given_x,
           CASE WHEN h_x > 0 THEN
             round((h_x - (h_xy - h_y)) / h_x, 6) END AS u_x_given_y
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    for c in ("u_y_given_x", "u_x_given_y"):
        assert -1e-9 <= r[c] <= 1.0 + 1e-9


def test_theil_u_known_cases(spark):
    """Pins: y a deterministic function of x → U(y|x) = 1 while
    U(x|y) < 1 (asymmetry is the point); a constant y → NULL U(y|x)."""
    from osmapreduceproject_spark.operators.stats import theil_u

    det = spark.createDataFrame(
        [("a", "en"), ("a", "en"), ("b", "de"), ("b", "de"),
         ("c", "en"), ("c", "en")],
        "x string, y string",
    )
    r = theil_u(det, "x", "y").first()
    assert r["u_y_given_x"] == 1.0  # x fully determines y
    assert r["u_x_given_y"] < 1.0   # y does not determine x (a vs c)
    const = spark.createDataFrame(
        [("a", "en"), ("b", "en")], "x string, y string"
    )
    c = theil_u(const, "x", "y").first()
    assert c["u_y_given_x"] is None  # H(y) = 0 → undefined


def test_theil_u_constant_direction(spark):
    """Pin the constant-y direction precisely: with y constant,
    H(x,y) = H(x), so U(x|y) = (H(x) − H(x)) / H(x) = 0."""
    from osmapreduceproject_spark.operators.stats import theil_u

    const = spark.createDataFrame(
        [("a", "en"), ("b", "en")], "x string, y string"
    )
    c = theil_u(const, "x", "y").first()
    assert c["u_x_given_y"] == 0.0


# ---------------------------------------------------------------------------
# events family
# ---------------------------------------------------------------------------

_MARKOV_PRELUDE = """pairs AS (
      SELECT event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
      FROM events),
    cnt AS (SELECT f, t, COUNT(*) AS n FROM pairs WHERE t IS NOT NULL
            GROUP BY 1, 2),
    tot AS (SELECT f, SUM(n) AS tn FROM cnt GROUP BY f),
    states AS (SELECT DISTINCT event_type AS s FROM events),
    ns AS (SELECT COUNT(*) AS c FROM states),
    p AS (SELECT c.f AS i, c.t AS j, CAST(c.n AS DOUBLE) / tot.tn AS p
          FROM cnt c JOIN tot ON tot.f = c.f
          UNION ALL
          SELECT s.s, s.s, 1.0 FROM states s
          WHERE s.s NOT IN (SELECT f FROM tot))"""


def _markov_its() -> str:
    its = ["it0 AS (SELECT s.s AS j, CAST(floor(1000000000000.0 / ns.c + 0.5)"
           " AS BIGINT) AS pi FROM states s, ns)"]
    for k in range(1, 9):
        its.append(
            f"it{k} AS (SELECT p.j AS j, CAST(SUM(CAST(floor(it{k-1}.pi * p.p"
            f" + 0.5) AS BIGINT)) AS BIGINT) AS pi FROM it{k-1}"
            f" JOIN p ON p.i = it{k-1}.j GROUP BY p.j)"
        )
    return ", ".join(its)


def test_entropy_rate_oracle(spark, duck):
    """Markov entropy rate — the q303 integer-pico iteration chain plus
    a quantized per-state conditional-entropy term sum, the exact
    HUGEINT dot product replayed in SQL."""
    from osmapreduceproject_spark.operators.events import entropy_rate

    got = entropy_rate(_t(spark, "events"))
    sql = f"""
    WITH {_MARKOV_PRELUDE},
    {_markov_its()},
    hterm AS (SELECT i,
                SUM(CAST(round(p * log2(p) * 1000000) AS BIGINT)) AS hq
              FROM p WHERE p > 0 GROUP BY i),
    acc AS (SELECT SUM(CAST(COALESCE(it8.pi, 0) AS HUGEINT)
                       * CAST(-COALESCE(h.hq, 0) AS HUGEINT)) AS t
            FROM states s
            LEFT JOIN it8 ON it8.j = s.s
            LEFT JOIN hterm h ON h.i = s.s),
    ntr AS (SELECT COALESCE(SUM(tn), 0) AS nt FROM tot),
    e AS (SELECT ns.c AS s, ntr.nt,
                 CAST(acc.t AS DOUBLE) / 1000000000000.0 / 1000000.0 AS rate
          FROM ns, ntr, acc)
    SELECT CAST(s AS BIGINT) AS n_states, CAST(nt AS BIGINT) AS n_transitions,
           round(rate, 6) AS entropy_rate_bits,
           round(log2(CAST(s AS DOUBLE)), 6) AS max_entropy_bits,
           CASE WHEN s > 1 THEN
             round(rate / log2(CAST(s AS DOUBLE)), 6) END AS normalized_entropy
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert 0 <= r["entropy_rate_bits"] <= r["max_entropy_bits"] + 1e-9


def test_entropy_rate_known_cases(spark):
    """Pins: a deterministic loop is fully predictable (H = 0); a
    uniform 2-way branch from every state is exactly 1 bit; a single
    self-looping state reports rate 0 with NULL normalization."""
    from osmapreduceproject_spark.operators.events import entropy_rate

    def ev(seqs):
        rows = []
        eid = 0
        for u, seq in enumerate(seqs):
            for i, s in enumerate(seq):
                rows.append((eid, i * 1_000_000, u, s))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, event_type string"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "event_type",
        )

    loop = entropy_rate(ev(["abababab"])).first()
    assert loop["entropy_rate_bits"] == 0.0
    # APERIODIC branch chain (a periodic one like a→{b,c}→a oscillates
    # under raw power iteration — the documented markov_stationary
    # n_iter behavior, inherited here): from a: 50% a / 50% b, from b:
    # always a → π = (2/3, 1/3), H(a) = 1, H(b) = 0 → rate = 2/3
    # (π₈ is within (1/2)⁸ of π∞ — the subdominant eigenvalue is −1/2).
    branch = entropy_rate(ev(["aab" * 8])).first()
    assert abs(branch["entropy_rate_bits"] - 2 / 3) < 0.01
    single = entropy_rate(ev(["aaaa"])).first()
    assert single["n_states"] == 1
    assert single["entropy_rate_bits"] == 0.0
    assert single["normalized_entropy"] is None
    # zero states (all-NULL types): the typed zero/NULL row, not a
    # math.log2(0) ValueError (ADVICE r14 — theil_u convention)
    allnull = ev(["aa"]).withColumn(
        "event_type", F.lit(None).cast("string")
    )
    rz = entropy_rate(allnull).first()
    assert rz["n_states"] == 0 and rz["n_transitions"] == 0
    assert rz["entropy_rate_bits"] is None
    assert rz["max_entropy_bits"] is None
    assert rz["normalized_entropy"] is None


def test_retention_halflife_oracle(spark, duck):
    """Cohort decay fit — the retention triangle, quantized ln-fraction
    points, and the integer OLS replayed in SQL."""
    from osmapreduceproject_spark.operators.events import retention_halflife

    got = retention_halflife(_t(spark, "events"))
    sql = """
    WITH weeks AS (SELECT DISTINCT user_id AS u,
                          epoch_us(ts) // 1000000 // 604800 AS w
                   FROM events),
    cohort AS (SELECT u, MIN(w) AS cw FROM weeks GROUP BY u),
    tri AS (SELECT c.cw, w.w - c.cw AS off, COUNT(DISTINCT w.u) AS n
            FROM weeks w JOIN cohort c ON c.u = w.u GROUP BY 1, 2),
    base AS (SELECT cw, n AS sz FROM tri WHERE off = 0),
    pts AS (SELECT t.cw, t.off AS x,
              -CAST(floor(-ln(CAST(t.n AS DOUBLE) / b.sz) * 1000000 + 0.5)
                    AS BIGINT) AS qy
            FROM tri t JOIN base b ON b.cw = t.cw WHERE t.off >= 1),
    ols AS (SELECT cw, COUNT(*) AS na, SUM(x) AS sx, SUM(qy) AS sy,
                   SUM(x * qy) AS sxy, SUM(x * x) AS sxx
            FROM pts GROUP BY cw)
    SELECT b.cw AS cohort_week, CAST(b.sz AS BIGINT) AS cohort_size,
           CAST(COALESCE(na, 0) AS BIGINT) AS n_ages,
           CASE WHEN na >= 2 AND na * sxx - sx * sx > 0 THEN
             CAST(na * sxy - sx * sy AS DOUBLE)
             / CAST(na * sxx - sx * sx AS DOUBLE) / 1000000 END AS slope,
           CASE WHEN na >= 2 AND na * sxx - sx * sx > 0
                 AND CAST(na * sxy - sx * sy AS DOUBLE)
                     / CAST(na * sxx - sx * sx AS DOUBLE) / 1000000 < 0
           THEN floor(-0.6931471805599453
             / (CAST(na * sxy - sx * sy AS DOUBLE)
                / CAST(na * sxx - sx * sx AS DOUBLE) / 1000000)
             * 1000000 + 0.5) / 1000000
           END AS half_life_weeks
    FROM base b LEFT JOIN ols ON ols.cw = b.cw
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_retention_halflife_known_case(spark):
    """Pin: a cohort retaining exactly half each week (8, 4, 2, 1) decays
    at slope −ln 2 per week → half-life exactly 1.0."""
    from osmapreduceproject_spark.operators.events import retention_halflife

    wk = 604800 * 1_000_000
    rows = []
    for u in range(8):
        rows.append((u, 0))
    for age, alive in ((1, 4), (2, 2), (3, 1)):
        for u in range(alive):
            rows.append((u, age * wk + u + 1))
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    r = retention_halflife(df).first()
    assert r["cohort_size"] == 8 and r["n_ages"] == 3
    assert abs(r["slope"] + 0.693147) < 1e-5
    assert abs(r["half_life_weeks"] - 1.0) < 1e-5
    # a cohort that never returns has no decay points
    one = spark.createDataFrame([(1, 0)], "user_id long, us long").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    o = retention_halflife(one).first()
    assert o["n_ages"] == 0 and o["half_life_weeks"] is None


# ---------------------------------------------------------------------------
# windows family
# ---------------------------------------------------------------------------


def test_theil_sen_oracle(spark, duck):
    """Per-user median pairwise slope — exact micro-integer pair pool,
    the identical slope doubles and two-middle median replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import theil_sen

    got = theil_sen(_t(spark, "events"), "user_id", "ts", "value")
    sql = """
    WITH p AS (
      SELECT user_id AS k, epoch_us(ts) AS qt,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS qv,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND ts IS NOT NULL),
    pr AS (SELECT a.k,
             ((b.qv - a.qv) / 1000000.0) / ((b.qt - a.qt) / 3600000000.0) AS s
           FROM p a JOIN p b ON a.k = b.k AND a.rn < b.rn AND a.qt != b.qt),
    r AS (SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k ORDER BY s) AS rk,
                 COUNT(*) OVER (PARTITION BY k) AS m
          FROM pr),
    med AS (SELECT k, MAX(m) AS m,
              AVG(CASE WHEN rk = (m - 1) // 2 + 1 OR rk = m // 2 + 1
                       THEN s END) AS md
            FROM r GROUP BY k),
    cnt AS (SELECT k, COUNT(*) AS n FROM p GROUP BY k)
    SELECT cnt.k AS user_id, CAST(cnt.n AS BIGINT) AS n,
           CAST(COALESCE(med.m, 0) AS BIGINT) AS n_pairs,
           round(med.md, 6) AS slope_per_hour
    FROM cnt LEFT JOIN med ON med.k = cnt.k
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_theil_sen_known_cases(spark):
    """Pins: an exact line recovers its slope; ONE wild spike leaves the
    median slope untouched (the point of Theil–Sen); duplicate
    timestamps drop from the pair pool, not crash it."""
    from osmapreduceproject_spark.operators.windows import theil_sen

    def series(vals_us):
        rows = [(i, us, 1, float(v)) for i, (us, v) in enumerate(vals_us)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    hour = 3_600_000_000
    line = series([(i * hour, 2.5 * i + 1) for i in range(10)])
    r = theil_sen(line, "user_id", "ts", "value").first()
    assert r["slope_per_hour"] == 2.5 and r["n_pairs"] == 45
    spiked = series(
        [(i * hour, 2.5 * i + 1) for i in range(10)] + [(10 * hour, 1e6)]
    )
    s = theil_sen(spiked, "user_id", "ts", "value").first()
    assert abs(s["slope_per_hour"] - 2.5) < 1e-6  # the spike cannot move it
    dup = series([(0, 1.0), (0, 2.0), (hour, 3.0)])
    d = theil_sen(dup, "user_id", "ts", "value").first()
    assert d["n_pairs"] == 2  # the zero-Δt pair dropped


def test_max_drawdown_oracle(spark, duck):
    """Per-user running-peak drawdown — the ordered window and both
    finalizes replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import max_drawdown

    got = max_drawdown(
        _t(spark, "events"), "user_id", "ts", "value", id_col="event_id"
    )
    sql = """
    WITH p AS (
      SELECT user_id AS k, ts, event_id,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND ts IS NOT NULL),
    r AS (SELECT k, q,
            MAX(q) OVER (PARTITION BY k ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS pk
          FROM p)
    SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(MAX(q) AS DOUBLE) / 1000000 AS peak_value,
           CAST(MAX(pk - q) AS DOUBLE) / 1000000 AS max_drawdown,
           floor(MAX(CASE WHEN pk > 0 THEN
             CAST(pk - q AS DOUBLE) / CAST(pk AS DOUBLE) END)
             * 1000000 + 0.5) / 1000000 AS max_drawdown_frac
    FROM r GROUP BY k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.max_drawdown >= 0).all()


def test_max_drawdown_known_cases(spark):
    """Pins: a monotone rise has exactly zero drawdown; a planted
    100 → 40 slide reports 60 absolute / 0.6 fractional."""
    from osmapreduceproject_spark.operators.windows import max_drawdown

    def series(vals):
        rows = [(i, i * 3_600_000_000, 1, float(v))
                for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    up = max_drawdown(series(range(10)), "user_id", "ts", "value",
                      id_col="event_id").first()
    assert up["max_drawdown"] == 0.0 and up["max_drawdown_frac"] == 0.0
    slide = max_drawdown(
        series([10, 100, 70, 40, 90]), "user_id", "ts", "value",
        id_col="event_id",
    ).first()
    assert slide["peak_value"] == 100.0
    assert slide["max_drawdown"] == 60.0
    assert slide["max_drawdown_frac"] == 0.6


_PG_SCORED = """obs AS (SELECT user_id AS k, epoch_us(ts) AS e,
                        CAST(value AS DOUBLE) AS v FROM events),
    o2 AS (SELECT k, e, MAX(v) AS v FROM obs GROUP BY k, e),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM o2 GROUP BY k),
    grid AS (SELECT k, unnest(range(
               CAST(ceil(lo / 3600000000.0) * 3600000000 AS BIGINT),
               CAST(floor(hi / 3600000000.0) * 3600000000 AS BIGINT) + 1,
               3600000000)) AS e
             FROM spans),
    rs AS (SELECT g.k, g.e // 1000000 AS slot_epoch, o.v
           FROM grid g ASOF JOIN o2 o ON g.k = o.k AND o.e <= g.e),
    pk AS (SELECT k, MIN(slot_epoch) AS s0,
                  SUM(CAST(round(v * 1000000) AS BIGINT)) AS sq,
                  COUNT(v) AS nv
           FROM rs GROUP BY k),
    c AS (SELECT rs.k, (rs.slot_epoch - pk.s0) // 3600 AS t,
                 rs.v - (CAST(pk.sq AS DOUBLE) / pk.nv) / 1000000 AS vc
          FROM rs JOIN pk ON pk.k = rs.k
          WHERE rs.v IS NOT NULL AND pk.nv >= 2),
    terms AS (SELECT c.k, pp.p,
                CAST(round(c.vc * cos((6.283185307179586 * (c.t % pp.p)) / pp.p)
                           * 1000000) AS BIGINT) AS a,
                CAST(round(c.vc * sin((6.283185307179586 * (c.t % pp.p)) / pp.p)
                           * 1000000) AS BIGINT) AS b
              FROM c, (SELECT unnest([2, 3, 4, 6, 8, 12]) AS p) pp),
    g AS (SELECT k, p, SUM(a) AS aq, SUM(b) AS bq, COUNT(*) AS n
          FROM terms GROUP BY 1, 2),
    scored AS (SELECT k, p,
                 round((CAST(aq AS DOUBLE) / 1000000 * (CAST(aq AS DOUBLE) / 1000000)
                        + CAST(bq AS DOUBLE) / 1000000 * (CAST(bq AS DOUBLE) / 1000000))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS power
               FROM g)"""


def test_spectral_entropy_oracle(spark, duck):
    """Entropy of the normalized periodogram — the q304 grid/trig CTEs
    verbatim, plus the quantized entropy fold replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import spectral_entropy

    got = spectral_entropy(_t(spark, "events"), "user_id", "ts", "value", 3600)
    max_bits = math.log2(6)
    sql = f"""
    WITH {_PG_SCORED},
    pq AS (SELECT k, p, CAST(round(power * 1000000) AS BIGINT) AS pq,
             (row_number() OVER (PARTITION BY k
                                 ORDER BY power DESC, p ASC) = 1) AS best
           FROM scored),
    tt AS (SELECT k, COUNT(*) AS nc,
                  SUM(CASE WHEN pq > 0 THEN 1 ELSE 0 END) AS nz,
                  MAX(CASE WHEN best THEN p END) AS dom, SUM(pq) AS t
           FROM pq GROUP BY k),
    trm AS (SELECT pq.k,
              -CAST(floor(-((CAST(pq.pq AS DOUBLE) / CAST(tt.t AS DOUBLE))
                 * log2(CAST(pq.pq AS DOUBLE) / CAST(tt.t AS DOUBLE)))
                 * 1000000000 + 0.5) AS BIGINT) AS tq
            FROM pq JOIN tt ON tt.k = pq.k WHERE pq.pq > 0 AND tt.t > 0),
    hs AS (SELECT k, SUM(tq) AS st FROM trm GROUP BY k)
    SELECT tt.k AS user_id, CAST(nc AS BIGINT) AS n_candidates,
           CAST(nz AS BIGINT) AS n_nonzero,
           CAST(dom AS INTEGER) AS dominant_period,
           CASE WHEN t > 0 THEN
             floor(-CAST(hs.st AS DOUBLE) / 1000000000
                   * 1000000 + 0.5) / 1000000
           END AS spectral_entropy_bits,
           CASE WHEN t > 0 THEN
             floor(-CAST(hs.st AS DOUBLE) / 1000000000 / {max_bits!r}
                   * 1000000 + 0.5) / 1000000
           END AS normalized_entropy
    FROM tt LEFT JOIN hs ON hs.k = tt.k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.normalized_entropy.dropna().between(0, 1 + 1e-9).all()


def test_spectral_entropy_known_cases(spark):
    """Pins: a pure period-4 lattice concentrates power (entropy well
    below a half bit); a constant series has zero power everywhere →
    NULL entropy."""
    from osmapreduceproject_spark.operators.windows import spectral_entropy

    def series(vals):
        rows = [(i, i * 3_600_000_000, 1, float(v))
                for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    sine = spectral_entropy(
        series([0.0, 1.0, 0.0, -1.0] * 6), "user_id", "ts", "value", 3600
    ).first()
    assert sine["dominant_period"] == 4
    assert sine["spectral_entropy_bits"] < 0.5
    flat = spectral_entropy(
        series([5.0] * 12), "user_id", "ts", "value", 3600
    ).first()
    assert flat["spectral_entropy_bits"] is None
    assert flat["n_nonzero"] == 0


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------


def test_casing_report_oracle(spark, duck):
    """Token-casing profile — the same string predicates over the same
    whitespace split replayed in SQL."""
    from osmapreduceproject_spark.operators.text import casing_report

    got = casing_report(_t(spark, "documents"))
    sql = """
    WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
                 FROM documents WHERE text IS NOT NULL),
    c AS (SELECT doc_id, source,
            SUM(CASE WHEN lower(t) != upper(t) THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN lower(t) != upper(t) AND t = upper(t)
                THEN 1 ELSE 0 END) AS nc,
            SUM(CASE WHEN lower(t) != upper(t) AND t != upper(t)
                     AND substring(t, 1, 1) = upper(substring(t, 1, 1))
                     AND substring(t, 1, 1) != lower(substring(t, 1, 1))
                THEN 1 ELSE 0 END) AS nt
          FROM tok GROUP BY 1, 2),
    agg AS (SELECT source, COUNT(*) AS n_docs, SUM(na) AS sna,
                   SUM(nc) AS snc, SUM(nt) AS snt,
                   SUM(CASE WHEN na >= 5 AND CAST(nc AS DOUBLE)
                            >= 0.3 * CAST(na AS DOUBLE)
                       THEN 1 ELSE 0 END) AS shout
            FROM c GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sna AS BIGINT) AS n_alpha_tokens,
           CASE WHEN sna > 0 THEN
             floor(CAST(snc AS DOUBLE) / sna * 1000000 + 0.5) / 1000000
           END AS allcaps_frac,
           CASE WHEN sna > 0 THEN
             floor(CAST(snt AS DOUBLE) / sna * 1000000 + 0.5) / 1000000
           END AS titlecase_frac,
           CAST(shout AS BIGINT) AS n_shouting_docs
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_casing_report_known_case(spark):
    """Pin: planted casing — 'NASA Bought 3 rockets' has 1 ALL-CAPS and
    1 Title-Case among 3 alphabetic tokens; a shouting doc flags; a
    digits-only doc contributes zero alpha tokens."""
    from osmapreduceproject_spark.operators.text import casing_report

    df = spark.createDataFrame(
        [(1, "NASA Bought 3 rockets", "s1"),
         (2, "THIS IS VERY LOUD INDEED OK", "s2"),
         (3, "42 17 99", "s3")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in casing_report(df).collect()}
    s1 = rows["s1"]
    assert s1["n_alpha_tokens"] == 3
    assert abs(s1["allcaps_frac"] - 1 / 3) < 1e-6
    assert abs(s1["titlecase_frac"] - 1 / 3) < 1e-6
    assert s1["n_shouting_docs"] == 0  # only 3 alpha tokens, under min 5
    s2 = rows["s2"]
    assert s2["allcaps_frac"] == 1.0 and s2["n_shouting_docs"] == 1
    s3 = rows["s3"]
    assert s3["n_alpha_tokens"] == 0 and s3["allcaps_frac"] is None


# ---------------------------------------------------------------------------
# multimodal family
# ---------------------------------------------------------------------------

# the arith_raw_images pixel formula as a SQL fragment (i is an expression)
def _px(i: str) -> str:
    return f"((31*m + 7*({i}) + (({i})*({i}))%251) % 256)"


def test_image_palette_size_oracle(spark, duck):
    """RGB444 palette census — every fixture byte regenerated, the
    distinct-color and top-share census replayed in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_palette_size,
    )

    got = image_palette_size(arith_raw_images(spark, n=64, width=16, height=12))
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    ch AS (SELECT m, p,
             {_px('3*p')} // 16 AS r,
             {_px('3*p+1')} // 16 AS g,
             {_px('3*p+2')} // 16 AS b
           FROM px),
    keys AS (SELECT m, r * 256 + g * 16 + b AS key FROM ch),
    kc AS (SELECT m, key, COUNT(*) AS cnt FROM keys GROUP BY 1, 2),
    top AS (SELECT m, key, cnt,
              ROW_NUMBER() OVER (PARTITION BY m
                                 ORDER BY cnt DESC, key ASC) AS rn
            FROM kc),
    n AS (SELECT m, COUNT(*) AS ncol FROM kc GROUP BY m)
    SELECT CAST(n.m AS BIGINT) AS media_id, CAST(192 AS BIGINT) AS n_px,
           CAST(ncol AS BIGINT) AS n_colors,
           CAST(t.key AS BIGINT) AS top_color_key,
           floor(CAST(t.cnt AS DOUBLE) / 192 * 1000000 + 0.5) / 1000000
             AS top_color_share
    FROM n JOIN top t ON t.m = n.m AND t.rn = 1
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_colors <= pdf.n_px).all()
    assert (pdf.top_color_share > 0).all()


def test_image_palette_size_known_cases(spark):
    """Pins: a flat image is 1 color with share 1.0; a half/half image
    is 2 colors with the tie broken to the SMALLER color key."""
    from osmapreduceproject_spark.operators.multimodal import image_palette_size

    flat = spark.createDataFrame(
        [(0, "image", bytes([200, 16, 32] * 8), (4, 2, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = image_palette_size(flat).first()
    # (200>>4)·256 + (16>>4)·16 + (32>>4) = 12·256 + 1·16 + 2
    assert r["n_colors"] == 1 and r["top_color_share"] == 1.0
    assert r["top_color_key"] == 12 * 256 + 16 + 2
    half = spark.createDataFrame(
        [(1, "image", bytes([0, 0, 0] * 4 + [255, 255, 255] * 4),
          (4, 2, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    h = image_palette_size(half).first()
    assert h["n_colors"] == 2
    assert h["top_color_key"] == 0  # tie → smallest key
    assert h["top_color_share"] == 0.5


def test_video_brightness_slope_oracle(spark, duck):
    """Planted linear fade — every byte regenerated (ramp multiply +
    floor division), the integer OLS replayed in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_fade,
        video_brightness_slope,
    )

    got = video_brightness_slope(
        arith_video_frames_fade(spark, n_videos=24, n_frames=12)
    )
    sql = """
    WITH mm AS (SELECT unnest(range(288)) AS id),
    fr AS (SELECT id // 12 AS m, id % 12 AS f FROM mm),
    px AS (SELECT m, f, unnest(range(576)) AS i FROM fr),
    v AS (SELECT m, f,
            ((31*m + 7*i + (i*i)%251) % 256) * (11 - f) // 11 AS b
          FROM px),
    s AS (SELECT m, f, SUM(b) AS lsum, COUNT(*) AS sz FROM v GROUP BY 1, 2),
    q AS (SELECT m, CAST(f AS BIGINT) AS x, lsum * 1000000 // sz AS qm
          FROM s),
    ols AS (SELECT m, COUNT(*) AS n, SUM(x) AS sx, SUM(qm) AS sy,
                   SUM(x * qm) AS sxy, SUM(x * x) AS sxx,
                   MIN(qm) AS lo, MAX(qm) AS hi
            FROM q GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_frames,
           CAST(sy AS DOUBLE) / n / 1000000 AS mean_luma,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000
           END AS luma_slope_per_frame,
           CAST(hi - lo AS DOUBLE) / 1000000 AS luma_range
    FROM ols
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    # the planted fade must read as a clearly negative slope everywhere
    assert (pdf.luma_slope_per_frame < -5).all()


def test_video_brightness_slope_known_cases(spark):
    """Pins: a constant-brightness clip has slope exactly 0; a
    hand-built two-frame fade has the hand-computable slope; a
    single-frame clip emits NULL slope."""
    from osmapreduceproject_spark.operators.multimodal import (
        video_brightness_slope,
    )

    def clip(mid, frames):
        return [
            (mid, "video", fi, bytes(p), (4, 4, None, len(frames)))
            for fi, p in frames
        ]

    schema = ("media_id long, kind string, frame_idx int, payload binary, "
              "meta struct<width:int,height:int,sample_rate:int,n_frames:int>")
    flat = spark.createDataFrame(
        clip(0, [(0, [50] * 48), (1, [50] * 48), (2, [50] * 48)]), schema
    )
    r = video_brightness_slope(flat).first()
    assert r["luma_slope_per_frame"] == 0.0 and r["luma_range"] == 0.0
    assert r["mean_luma"] == 50.0
    fade = spark.createDataFrame(
        clip(1, [(0, [100] * 48), (1, [40] * 48)]), schema
    )
    f = video_brightness_slope(fade).first()
    assert f["luma_slope_per_frame"] == -60.0
    single = spark.createDataFrame(clip(2, [(0, [10] * 48)]), schema)
    s = video_brightness_slope(single).first()
    assert s["luma_slope_per_frame"] is None


# ---------------------------------------------------------------------------
# similarity / dedup families
# ---------------------------------------------------------------------------


def test_neighbor_label_purity_ann_oracle(spark, duck):
    """Label purity over the LSH-fed kNN edge list — the q338 bucket
    pipeline verbatim, plus the label joins, replayed in SQL."""
    from osmapreduceproject_spark.operators.similarity import (
        lsh_topk,
        neighbor_label_purity,
    )
    from osmapreduceproject_spark.queries import _cosine_sql, _sparse_sig_sql

    emb = _t(spark, "embeddings")
    edges = lsh_topk(emb, emb, k=5, num_planes=6, num_tables=6)
    got = neighbor_label_purity(emb, k=5, edges=edges)
    buckets = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sparse_sig_sql(64, 6, t)} AS sig "
        f"FROM embeddings"
        for t in range(6)
    )
    sql = f"""
    WITH buckets AS (
      {buckets}),
    cand AS (
      SELECT DISTINCT c.vec_id AS nid, q.vec_id AS qid
      FROM buckets c JOIN buckets q ON c.tbl = q.tbl AND c.sig = q.sig
      WHERE c.vec_id != q.vec_id),
    scored AS (
      SELECT cand.qid, cand.nid,
             round({_cosine_sql('e.embedding', 'eq.embedding')}, 6) AS sim
      FROM cand
      JOIN embeddings e ON e.vec_id = cand.nid
      JOIN embeddings eq ON eq.vec_id = cand.qid),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, nid ASC) AS rn
      FROM scored),
    e AS (SELECT qid, nid FROM ranked WHERE rn <= 5),
    lab AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
    j AS (SELECT lq.label AS ql, ln.label AS nl, e.qid
          FROM e JOIN lab lq ON lq.vec_id = e.qid
                 JOIN lab ln ON ln.vec_id = e.nid)
    SELECT ql AS label, CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN ql = nl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_label,
           floor(CAST(SUM(CASE WHEN ql = nl THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS purity
    FROM j GROUP BY ql
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.purity.between(0, 1).all()


def test_neighbor_label_purity_known_case(spark):
    """Pin: two well-separated label clusters (e₀-aligned vs e₁-aligned)
    have purity exactly 1.0 under the brute edge list; a NULL-labeled
    vector is excluded from both ends."""
    from osmapreduceproject_spark.operators.similarity import (
        neighbor_label_purity,
    )

    def vec(axis, scale):
        v = [0.0] * 64
        v[axis] = float(scale)
        return v

    rows = [(i, vec(0, i + 1), "a") for i in range(4)]
    rows += [(10 + i, vec(1, i + 1), "b") for i in range(4)]
    rows.append((99, vec(2, 1), None))  # NULL label: excluded
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r["label"]: r for r in
           neighbor_label_purity(df, k=3).collect()}
    assert out["a"]["purity"] == 1.0 and out["b"]["purity"] == 1.0
    assert out["a"]["n_queries"] == 4 and out["a"]["n_edges"] == 12
    assert set(out) == {"a", "b"}


def test_cross_source_dup_matrix_oracle(spark, duck):
    """Source×source near-dup pair counts over the exact-Jaccard pair
    frame — the shared pairs CTE plus the provenance mapping in SQL."""
    from osmapreduceproject_spark.operators.dedup import cross_source_dup_matrix
    from osmapreduceproject_spark.queries import _JACCARD_PAIRS_CTE

    got = cross_source_dup_matrix(_t(spark, "documents"))
    sql = f"""
    WITH {_JACCARD_PAIRS_CTE},
    s AS (SELECT p.a_id, p.b_id, da.source AS sa, db.source AS sb
          FROM pairs p
          JOIN documents da ON da.doc_id = p.a_id
          JOIN documents db ON db.doc_id = p.b_id),
    u AS (SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
                 a_id, b_id FROM s),
    ex AS (SELECT source_a, source_b, unnest([a_id, b_id]) AS d FROM u),
    docs AS (SELECT source_a, source_b, COUNT(DISTINCT d) AS nd
             FROM ex GROUP BY 1, 2),
    cnt AS (SELECT source_a, source_b, COUNT(*) AS np FROM u GROUP BY 1, 2)
    SELECT cnt.source_a, cnt.source_b, CAST(np AS BIGINT) AS n_pairs,
           CAST(nd AS BIGINT) AS n_docs_involved,
           cnt.source_a = cnt.source_b AS within_source
    FROM cnt JOIN docs USING (source_a, source_b)
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_cross_source_dup_matrix_known_case(spark):
    """Pin: one exact copy planted across two sources and one within a
    source land in the right cells with the right flags."""
    from osmapreduceproject_spark.operators.dedup import cross_source_dup_matrix

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "один два три четыре пять шесть семь восемь девять десять"
    df = spark.createDataFrame(
        [(1, body, "src_a"), (2, body, "src_b"),       # cross-source pair
         (3, other, "src_a"), (4, other, "src_a")],    # within-source pair
        "doc_id long, text string, source string",
    )
    rows = {(r["source_a"], r["source_b"]): r
            for r in cross_source_dup_matrix(df).collect()}
    assert set(rows) == {("src_a", "src_b"), ("src_a", "src_a")}
    x = rows[("src_a", "src_b")]
    assert x["n_pairs"] == 1 and x["n_docs_involved"] == 2
    assert x["within_source"] is False
    w = rows[("src_a", "src_a")]
    assert w["n_pairs"] == 1 and w["within_source"] is True


# ---------------------------------------------------------------------------
# second r16-wave tranche: variance ratio, Cramér's V matrix, frame entropy
# ---------------------------------------------------------------------------


def test_variance_ratio_oracle(spark, duck):
    """Lo–MacKinlay VR over the shared hourly resample grid — one lag
    window for both difference series, exact DECIMAL moments, the
    unrounded ratio replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import variance_ratio_test
    from osmapreduceproject_spark.queries_r8 import _RESAMPLE_CTE

    got = variance_ratio_test(
        _t(spark, "events"), "user_id", "ts", "value", 3600, q=4
    )
    sql = f"""
    WITH {_RESAMPLE_CTE},
    b AS (SELECT k, slot_epoch,
                 CAST(round(value * 1000000) AS BIGINT) AS q
          FROM resampled),
    d AS (SELECT k, q - lag(q, 1) OVER w AS d1, q - lag(q, 4) OVER w AS dq
          FROM b WINDOW w AS (PARTITION BY k ORDER BY slot_epoch)),
    a AS (SELECT k, COUNT(*) AS n_slots, COUNT(d1) AS n1, COUNT(dq) AS nq,
                 SUM(CAST(d1 AS HUGEINT)) AS s1,
                 SUM(CAST(d1 AS HUGEINT) * d1) AS ss1,
                 SUM(CAST(dq AS HUGEINT)) AS sq,
                 SUM(CAST(dq AS HUGEINT) * dq) AS ssq
          FROM d GROUP BY k),
    v AS (SELECT k, n_slots, n1, nq,
            CASE WHEN n1 >= 2 THEN
              (CAST(ss1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
              / n1 / 1000000000000.0 END AS v1,
            CASE WHEN nq >= 2 THEN
              (CAST(ssq AS DOUBLE)
               - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / nq)
              / nq / 1000000000000.0 END AS vq
          FROM a)
    SELECT k AS user_id, CAST(n_slots AS BIGINT) AS n_slots,
           CAST(n1 AS BIGINT) AS n_diffs_1, CAST(nq AS BIGINT) AS n_diffs_q,
           v1 AS variance_1, vq AS variance_q,
           CASE WHEN n1 >= 2 AND nq >= 2 AND v1 > 0 THEN
             vq / (4.0 * v1) END AS vr
    FROM v
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.vr.dropna() >= 0).all()


def test_variance_ratio_known_cases(spark):
    """Pins: a strict ±1 alternation has zero 4-step variance (VR = 0);
    a perfect linear ramp has zero 1-step variance (NULL VR — nothing
    to calibrate against); a persistent two-regime walk scores VR > 1."""
    from osmapreduceproject_spark.operators.windows import variance_ratio_test

    def series(vals):
        rows = [(i, i * 3_600_000_000, 1, float(v))
                for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    alt = variance_ratio_test(
        series([1.0 if i % 2 else -1.0 for i in range(24)]),
        "user_id", "ts", "value", 3600, q=4,
    ).first()
    assert alt["vr"] == 0.0 and alt["variance_q"] == 0.0
    ramp = variance_ratio_test(
        series(range(24)), "user_id", "ts", "value", 3600, q=4
    ).first()
    assert ramp["variance_1"] == 0.0 and ramp["vr"] is None
    trend = variance_ratio_test(
        series([0, 1, 2, 3, 4, 5, 6, 7, 8, 7, 6, 5, 4, 3, 2, 1]
               + [0, 1, 2, 3, 4, 5, 6, 7]),
        "user_id", "ts", "value", 3600, q=4,
    ).first()
    assert trend["vr"] > 1.0  # locally persistent moves compound


def test_cramers_v_matrix_oracle(spark, duck):
    """source↔lang Cramér's V — quantized χ² identity terms over the
    cell frame, the one-pair matrix replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import cramers_v_matrix

    got = cramers_v_matrix(_t(spark, "documents"), ["source", "lang"])
    sql = """
    WITH pool AS (SELECT source AS x, lang AS y FROM documents
                  WHERE source IS NOT NULL AND lang IS NOT NULL),
    cells AS (SELECT x, y, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
    my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
    f AS (SELECT SUM(CAST(c AS HUGEINT)) AS n,
                 COUNT(DISTINCT cells.x) AS lx,
                 COUNT(DISTINCT cells.y) AS ly,
                 SUM(CAST(round(CAST(c AS DOUBLE) * c
                      / (CAST(cx AS DOUBLE) * cy)
                      * 1000000000000) AS HUGEINT)) AS t
          FROM cells JOIN mx USING (x) JOIN my USING (y)),
    e AS (SELECT n, lx, ly,
                 CAST(n * t AS DOUBLE) / 1000000000000.0
                   - CAST(n AS DOUBLE) AS chi2
          FROM f)
    SELECT 'source' AS col_x, 'lang' AS col_y, CAST(n AS BIGINT) AS n,
           CAST(lx AS BIGINT) AS levels_x, CAST(ly AS BIGINT) AS levels_y,
           round(chi2, 6) AS chi2,
           CASE WHEN least(lx, ly) > 1 THEN
             round(sqrt(greatest(chi2, 0) / CAST(n * (least(lx, ly) - 1)
                                                 AS DOUBLE)), 6)
           END AS cramers_v
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert 0 <= r["cramers_v"] <= 1 + 1e-9


def test_cramers_v_matrix_known_cases(spark):
    """Pins: a perfectly associated 2×2 scores V = 1; an independent
    2×2 scores V = 0; a constant column emits NULL V; three columns
    produce the 3 unordered pairs."""
    from osmapreduceproject_spark.operators.stats import cramers_v_matrix

    perfect = spark.createDataFrame(
        [("a", "x", "k")] * 4 + [("b", "y", "k")] * 4,
        "c1 string, c2 string, c3 string",
    )
    rows = {(r["col_x"], r["col_y"]): r
            for r in cramers_v_matrix(perfect, ["c1", "c2", "c3"]).collect()}
    assert len(rows) == 3
    assert rows[("c1", "c2")]["cramers_v"] == 1.0
    assert rows[("c1", "c3")]["cramers_v"] is None  # c3 constant
    indep = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "c1 string, c2 string",
    )
    i = cramers_v_matrix(indep, ["c1", "c2"]).first()
    assert i["chi2"] == 0.0 and i["cramers_v"] == 0.0


def test_video_frame_entropy_oracle(spark, duck):
    """Per-frame byte entropy over the scene-cut fixture — every byte
    regenerated, the quantized term sum and per-video trajectory
    replayed in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_frame_entropy,
    )

    got = video_frame_entropy(
        arith_video_frames(spark, n_videos=12, n_frames=8, cut_at=4)
    )
    sql = """
    WITH mm AS (SELECT unnest(range(96)) AS id),
    fr AS (SELECT id // 8 AS vid, id % 8 AS f FROM mm),
    px AS (SELECT vid, f, unnest(range(576)) AS i FROM fr),
    v AS (SELECT vid, f,
            (31 * (CASE WHEN f < 4 THEN vid ELSE vid + 500 END)
             + 7*i + (i*i)%251
             + f * (CASE WHEN i < 12 THEN 1 ELSE 0 END)) % 256 AS b
          FROM px),
    hist AS (SELECT vid, f, b, COUNT(*) AS c FROM v GROUP BY 1, 2, 3),
    trm AS (SELECT vid, f,
              SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE) / 576)
                             * 1000000) AS BIGINT)) AS s
            FROM hist GROUP BY 1, 2),
    hq AS (SELECT vid, f,
             CAST(floor(-CAST(s AS DOUBLE) / 576 + 0.5) AS BIGINT) AS hq
           FROM trm)
    SELECT CAST(vid AS BIGINT) AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(hq) AS DOUBLE) / COUNT(*) / 1000000 AS mean_entropy_bits,
           CAST(MIN(hq) AS DOUBLE) / 1000000 AS min_entropy_bits,
           CAST(MAX(hq) AS DOUBLE) / 1000000 AS max_entropy_bits
    FROM hq GROUP BY vid
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.mean_entropy_bits.between(0, 8).all()


def test_video_frame_entropy_known_cases(spark):
    """Pins: a flat frame has exactly 0 bits; a 50/50 two-value frame
    exactly 1 bit; the per-video min/max bracket the mean."""
    from osmapreduceproject_spark.operators.multimodal import (
        video_frame_entropy,
    )

    schema = ("media_id long, kind string, frame_idx int, payload binary, "
              "meta struct<width:int,height:int,sample_rate:int,n_frames:int>")
    df = spark.createDataFrame(
        [(0, "video", 0, bytes([7] * 48), (4, 4, None, 2)),
         (0, "video", 1, bytes([0] * 24 + [255] * 24), (4, 4, None, 2))],
        schema,
    )
    r = video_frame_entropy(df).first()
    assert r["n_frames"] == 2
    assert r["min_entropy_bits"] == 0.0
    assert r["max_entropy_bits"] == 1.0
    assert r["mean_entropy_bits"] == 0.5


# ---------------------------------------------------------------------------
# gated scale smokes (SPARK_GRAFT_SCALE=1)
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M rows through max_drawdown)",
)
def test_max_drawdown_scale_smoke(spark):
    """10M rows over 1,000 keys through the running-peak window: every
    key reports, drawdowns are non-negative and bounded by the peak
    spread — the window stays key-partitioned at volume."""
    from osmapreduceproject_spark.operators.windows import max_drawdown

    df = spark.range(10_000_000).select(
        (F.col("id") % 1000).alias("k"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("double") / 100.0)
        .alias("v"),
        F.col("id").alias("eid"),
    )
    dd = max_drawdown(df, "k", "ts", "v", id_col="eid")
    pdf = dd.toPandas()
    assert len(pdf) == 1000
    assert (pdf.max_drawdown >= 0).all()
    assert (pdf.max_drawdown <= pdf.peak_value - pdf.peak_value.min() + 1000).all()
    assert pdf.max_drawdown_frac.between(0, 1).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (1,000 keys × 500 rows through theil_sen)",
)
def test_theil_sen_scale_smoke(spark):
    """1,000 keys × 500 observations (124,750 pairs per key, ~125M pair
    slopes total) through the bounded Arrow pair pass: every key
    reports the full pair count and a sane slope — the quadratic work
    stays inside per-key groups, nothing quadratic crosses the
    shuffle."""
    from osmapreduceproject_spark.operators.windows import theil_sen

    n_keys, n_obs = 1_000, 500
    df = spark.range(n_keys * n_obs).select(
        (F.col("id") / n_obs).cast("bigint").alias("k"),
        F.timestamp_micros(
            (F.col("id") % n_obs) * F.lit(3_600_000_000)
        ).alias("ts"),
        (
            (F.col("id") % n_obs).cast("double") * 2.0
            + F.pmod(F.xxhash64("id"), F.lit(100)).cast("double") / 100.0
        ).alias("v"),
    )
    ts_ = theil_sen(df, "k", "ts", "v")
    pdf = ts_.toPandas()
    assert len(pdf) == n_keys
    assert (pdf.n_pairs == n_obs * (n_obs - 1) // 2).all()
    # the planted slope is 2/hour with sub-unit noise: medians hug it
    assert pdf.slope_per_hour.between(1.9, 2.1).all()


# ---------------------------------------------------------------------------
# third r16-wave tranche: distinctive terms, Cochran–Armitage trend
# ---------------------------------------------------------------------------


def test_distinctive_terms_oracle(spark, duck):
    """Monroe log-odds with informative Dirichlet prior — per-source
    token counts, the fixed-order δ/σ²/z expressions, and the ranked
    top-k replayed in SQL."""
    from osmapreduceproject_spark.operators.text import distinctive_terms

    got = distinctive_terms(_t(spark, "documents"))
    sql = """
    WITH tok AS (SELECT source AS s, unnest(string_split(text, ' ')) AS w
                 FROM documents
                 WHERE text IS NOT NULL AND source IS NOT NULL),
    tok2 AS (SELECT s, w FROM tok WHERE w != ''),
    cells AS (SELECT s, w, COUNT(*) AS y FROM tok2 GROUP BY 1, 2),
    wt AS (SELECT w, SUM(y) AS yw FROM cells GROUP BY w),
    st AS (SELECT s, SUM(y) AS ni FROM cells GROUP BY s),
    nn AS (SELECT SUM(y) AS n FROM cells),
    sc AS (SELECT c.s, c.w, c.y, wt.yw, st.ni, nn.n,
             (500.0 * wt.yw) / nn.n AS aw
           FROM cells c JOIN wt USING (w) JOIN st USING (s), nn
           WHERE c.y >= 3),
    zz AS (SELECT s, w, y, yw - y AS yrest,
             (ln((CAST(y AS DOUBLE) + aw)
                 / (CAST(ni AS DOUBLE) + 500.0 - CAST(y AS DOUBLE) - aw))
              - ln((CAST(yw - y AS DOUBLE) + aw)
                   / (CAST(n AS DOUBLE) - ni + 500.0
                      - CAST(yw - y AS DOUBLE) - aw)))
             / sqrt(1.0 / (CAST(y AS DOUBLE) + aw)
                    + 1.0 / (CAST(yw - y AS DOUBLE) + aw)) AS z
           FROM sc),
    rk AS (SELECT s, w, y, yrest, z,
             ROW_NUMBER() OVER (PARTITION BY s ORDER BY z DESC, w ASC)
               AS rank
           FROM zz)
    SELECT s AS source, w AS token, CAST(y AS BIGINT) AS n_source,
           CAST(yrest AS BIGINT) AS n_rest,
           CASE WHEN z >= 0 THEN floor(z * 1000000 + 0.5) / 1000000
                ELSE -floor(-z * 1000000 + 0.5) / 1000000 END AS log_odds_z,
           CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 10
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.groupby("source")["rank"].max().le(10).all()


def test_distinctive_terms_known_case(spark):
    """Pin: a token saturating one source and absent elsewhere ranks
    first for that source with a clearly positive z; shared filler
    never outranks it."""
    from osmapreduceproject_spark.operators.text import distinctive_terms

    filler = "the quick brown fox jumps over the lazy dog"
    rows = [(i, filler + " zebra zebra zebra", "a") for i in range(6)]
    rows += [(100 + i, filler, "b") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = distinctive_terms(df, k=3).toPandas()
    top_a = out[(out.source == "a") & (out["rank"] == 1)].iloc[0]
    assert top_a.token == "zebra"
    assert top_a.n_source == 18 and top_a.n_rest == 0
    assert top_a.log_odds_z > 1.0


def test_cochran_armitage_oracle(spark, duck):
    """Trend in purchase share across props-length buckets — exact
    DECIMAL moments, the fixed-order finalize replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import cochran_armitage

    ev = _t(spark, "events").select(
        F.expr("length(props) div 10").alias("bucket"),
        (F.col("event_type") == "purchase").alias("purchased"),
    )
    got = cochran_armitage(ev, "bucket", "purchased")
    sql = """
    WITH pool AS (
      SELECT CAST(len(props) // 10 AS BIGINT) AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
      FROM events WHERE props IS NOT NULL AND event_type IS NOT NULL),
    a AS (SELECT COUNT(*) AS n, SUM(s) AS ns, COUNT(DISTINCT x) AS lv,
                 SUM(CAST(s * x AS HUGEINT)) AS t,
                 SUM(CAST(x AS HUGEINT)) AS ex,
                 SUM(CAST(x * x AS HUGEINT)) AS exx
          FROM pool),
    e AS (SELECT n, ns, lv, CAST(t AS DOUBLE) AS t,
                 (CAST(ns AS DOUBLE) / n) * CAST(ex AS DOUBLE) AS mt,
                 (CAST(ns AS DOUBLE) / n) * (1.0 - CAST(ns AS DOUBLE) / n)
                   * (CAST(exx AS DOUBLE)
                      - CAST(ex AS DOUBLE) * ex / n) AS vt
          FROM a)
    SELECT CAST(n AS BIGINT) AS n, CAST(ns AS BIGINT) AS n_success,
           CAST(lv AS BIGINT) AS n_score_levels,
           round(t, 6) AS t_stat, round(mt, 6) AS mean_t,
           round(vt, 6) AS var_t,
           CASE WHEN lv >= 2 AND vt > 0 THEN
             round((t - mt) / sqrt(vt), 6) END AS z
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_cochran_armitage_known_cases(spark):
    """Pins: hand case (rates 0/10, 5/10, 10/10 over scores 0,1,2 →
    T = 25, E = 15, Var = 5, z = 4.472136); a single score level and
    an all-success pool emit NULL z."""
    from osmapreduceproject_spark.operators.stats import cochran_armitage

    rows = []
    for x, k in ((0, 0), (1, 5), (2, 10)):
        for i in range(10):
            rows.append((x, i < k))
    df = spark.createDataFrame(rows, "x long, ok boolean")
    r = cochran_armitage(df, "x", "ok").first()
    assert r["n"] == 30 and r["n_success"] == 15
    assert r["t_stat"] == 25.0 and r["mean_t"] == 15.0 and r["var_t"] == 5.0
    assert r["z"] == 4.472136
    one = spark.createDataFrame([(1, True), (1, False)], "x long, ok boolean")
    assert cochran_armitage(one, "x", "ok").first()["z"] is None
    allsucc = spark.createDataFrame(
        [(0, True), (1, True)], "x long, ok boolean"
    )
    assert cochran_armitage(allsucc, "x", "ok").first()["z"] is None
