"""Cross-engine (DuckDB) parity for the r17-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, tenth tranche after r8–r16; the file number continues the
test-file series, the DECLARATION round is r17). Every operator lands
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


def test_fleiss_kappa_oracle(spark, duck):
    """Multi-rater agreement: items = users, categories = event types;
    micro-quantized per-item P_i integers and the exact Σc² chance
    term replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import fleiss_kappa

    got = fleiss_kappa(_t(spark, "events"), "user_id", "event_type")
    sql = """
    WITH pool AS (SELECT user_id AS i, event_type AS c FROM events
                  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    cell AS (SELECT i, c, COUNT(*) AS n FROM pool GROUP BY 1, 2),
    per AS (SELECT i, SUM(n) AS ni, SUM(n * n) AS a2 FROM cell GROUP BY i),
    kept AS (SELECT * FROM per WHERE ni >= 2),
    items AS (SELECT COUNT(*) AS m,
                COALESCE(SUM(CAST(floor(
                  CAST(a2 - ni AS DOUBLE) / CAST(ni * (ni - 1) AS DOUBLE)
                  * 1000000 + 0.5) AS HUGEINT)), 0) AS sp,
                COALESCE(SUM(CAST(ni AS HUGEINT)), 0) AS nr
              FROM kept),
    dropped AS (SELECT COUNT(*) AS d FROM per WHERE ni < 2),
    cats AS (SELECT COUNT(*) AS ncat,
               COALESCE(SUM(CAST(cj AS HUGEINT) * cj), 0) AS sc2
             FROM (SELECT cell.c, SUM(cell.n) AS cj
                   FROM cell JOIN kept ON kept.i = cell.i GROUP BY cell.c)),
    fin AS (SELECT m, d, ncat, nr,
              CAST(sp AS DOUBLE) / m / 1000000 AS pbar,
              CAST(sc2 AS DOUBLE)
                / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE)) AS pe
            FROM items, dropped, cats)
    SELECT CAST(m AS BIGINT) AS n_items, CAST(d AS BIGINT) AS n_items_dropped,
           CAST(ncat AS BIGINT) AS n_categories, CAST(nr AS BIGINT) AS n_ratings,
           CASE WHEN m > 0 THEN floor(pbar * 1000000 + 0.5) / 1000000 END
             AS p_bar,
           CASE WHEN m > 0 THEN floor(pe * 1000000 + 0.5) / 1000000 END AS p_e,
           CASE WHEN m > 0 AND pe < 1.0 THEN
             CASE WHEN (pbar - pe) / (1.0 - pe) >= 0
                  THEN floor((pbar - pe) / (1.0 - pe) * 1000000 + 0.5)
                  ELSE -floor(-((pbar - pe) / (1.0 - pe)) * 1000000 + 0.5)
             END / 1000000
           END AS kappa
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["p_bar"] is not None and 0.0 <= r["p_bar"] <= 1.0
    assert r["kappa"] is None or -1.0 <= r["kappa"] <= 1.0


def test_fleiss_kappa_known_cases(spark):
    """Pins: perfect two-category agreement → κ = 1 with P_e = 1/2;
    perfect disagreement → κ = −1; a single-category pool → NULL κ
    (P_e = 1); items with one rating drop."""
    from osmapreduceproject_spark.operators.stats import fleiss_kappa

    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "i long, c string"
    )
    r = fleiss_kappa(perfect, "i", "c").first()
    assert r["p_bar"] == 1.0 and r["p_e"] == 0.5 and r["kappa"] == 1.0
    disagree = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], "i long, c string"
    )
    rd = fleiss_kappa(disagree, "i", "c").first()
    assert rd["p_bar"] == 0.0 and rd["kappa"] == -1.0
    single = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "a")], "i long, c string"
    )
    rs = fleiss_kappa(single, "i", "c").first()
    assert rs["kappa"] is None and rs["n_items_dropped"] == 2
    assert rs["n_items"] == 1 and rs["p_e"] == 1.0


def test_page_trend_test_oracle(spark, duck):
    """Ordered matched-blocks trend: blocks = users, ordered treatments
    = event types; friedman's exact-fraction doubled midranks and the
    no-tie moments replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import page_trend_test

    got = page_trend_test(_t(spark, "events"), "user_id", "event_type", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS b, event_type AS t,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS vq
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    cell AS (SELECT b, t, SUM(vq) AS s, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    kk AS (SELECT COUNT(DISTINCT t) AS k FROM cell),
    sizes AS (SELECT b, COUNT(*) AS kt FROM cell GROUP BY b),
    nt AS (SELECT COUNT(*) AS ntot FROM sizes),
    complete AS (SELECT b FROM sizes, kk WHERE kt = kk.k),
    nb AS (SELECT COUNT(*) AS n_blocks FROM complete),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    cmp AS (SELECT a.b, a.t AS ta,
              SUM(CASE WHEN b2.s * a.c < a.s * b2.c THEN 1 ELSE 0 END) AS l,
              SUM(CASE WHEN b2.s * a.c = a.s * b2.c THEN 1 ELSE 0 END) AS e
            FROM cc a JOIN cc b2 ON b2.b = a.b GROUP BY 1, 2),
    ranks AS (SELECT b, ta, 2 * l + e + 1 AS r2 FROM cmp),
    per_t AS (SELECT ta, SUM(CAST(r2 AS HUGEINT)) AS rsum FROM ranks GROUP BY ta),
    idx AS (SELECT ta, rsum, ROW_NUMBER() OVER (ORDER BY ta ASC) AS j FROM per_t),
    lsum AS (SELECT SUM(j * rsum) AS l2 FROM idx),
    mom AS (SELECT n_blocks, k,
              CAST(l2 AS DOUBLE) / 2 AS l_stat,
              n_blocks * k * (k + 1) * (k + 1) / 4.0 AS mean_l,
              n_blocks * CAST((k*k*k - k) AS DOUBLE) * (k*k*k - k)
                / (144.0 * (k - 1)) AS var_l
            FROM lsum, nb, kk)
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST((SELECT ntot FROM nt) - n_blocks AS BIGINT) AS n_blocks_dropped,
           CAST(k AS BIGINT) AS k_treatments,
           round(l_stat, 6) AS l_stat, round(mean_l, 6) AS mean_l,
           round(var_l, 6) AS var_l,
           CASE WHEN k >= 3 AND var_l > 0 THEN
             CASE WHEN l_stat - mean_l >= 0
                  THEN floor((l_stat - mean_l) / sqrt(var_l) * 1000000 + 0.5)
                  ELSE -floor(-(l_stat - mean_l) / sqrt(var_l) * 1000000 + 0.5)
             END / 1000000
           END AS z
    FROM mom
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["n_blocks"] >= 1 and r["l_stat"] > 0


def test_page_trend_known_cases(spark):
    """Pins: 4 blocks perfectly ordered over 3 treatments → L = 56,
    E[L] = 48, Var[L] = 8, z = 2.828427; reversing the values negates
    z; k = 2 reports NULL z (normal approx needs k ≥ 3)."""
    from osmapreduceproject_spark.operators.stats import page_trend_test

    rows = [
        (b, t, float(v))
        for b in range(4)
        for t, v in (("t1", 1), ("t2", 2), ("t3", 3))
    ]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = page_trend_test(df, "b", "t", "v").first()
    assert r["l_stat"] == 56.0 and r["mean_l"] == 48.0 and r["var_l"] == 8.0
    assert r["z"] == 2.828427
    down = [(b, t, -v) for b, t, v in rows]
    rd = page_trend_test(
        spark.createDataFrame(down, "b int, t string, v double"), "b", "t", "v"
    ).first()
    assert rd["z"] == -2.828427
    two = [(b, t, v) for b, t, v in rows if t != "t3"]
    r2 = page_trend_test(
        spark.createDataFrame(two, "b int, t string, v double"), "b", "t", "v"
    ).first()
    assert r2["k_treatments"] == 2 and r2["z"] is None


def test_inequality_report_oracle(spark, duck):
    """Hoover/Theil/Atkinson over doc lengths per source; the exact
    integer Hoover and the value-level quantized log terms replayed."""
    from osmapreduceproject_spark.operators.text import tokens  # noqa: F401
    from osmapreduceproject_spark.operators.stats import inequality_report

    docs = _t(spark, "documents").select(
        "source", F.length("text").cast("double").alias("len")
    )
    got = inequality_report(docs, "source", "len")
    sql = """
    WITH base AS (SELECT source AS g, CAST(length(text) AS DOUBLE) AS v
                  FROM documents WHERE source IS NOT NULL),
    excl AS (SELECT g, COUNT(*) AS nx FROM base
             WHERE v IS NULL OR v <= 0 GROUP BY g),
    pool AS (SELECT g, CAST(round(v * 1000000) AS HUGEINT) AS vq
             FROM base WHERE v > 0),
    cells AS (SELECT g, vq, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    tot AS (SELECT g, SUM(c) AS n, SUM(vq * c) AS s FROM cells GROUP BY g),
    j AS (SELECT cells.g, vq, c, n, s,
            (CAST(vq AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(s AS DOUBLE) AS t
          FROM cells JOIN tot ON tot.g = cells.g),
    terms AS (SELECT g, n, s,
        SUM(abs(vq * n - s) * c) AS hnum,
        SUM(CAST(CASE WHEN t * ln(t) >= 0
              THEN floor(t * ln(t) * 1000000 + 0.5)
              ELSE -floor(-(t * ln(t)) * 1000000 + 0.5) END AS HUGEINT) * c)
          AS tq,
        SUM(CAST(CASE WHEN ln(CAST(vq AS DOUBLE)) >= 0
              THEN floor(ln(CAST(vq AS DOUBLE)) * 1000000 + 0.5)
              ELSE -floor(-ln(CAST(vq AS DOUBLE)) * 1000000 + 0.5) END
            AS HUGEINT) * c) AS lq
      FROM j GROUP BY 1, 2, 3),
    fin AS (SELECT g, n, s, hnum, tq, lq,
              CAST(s AS DOUBLE) / n / 1000000 AS mu,
              CAST(tq AS DOUBLE) / n / 1000000 AS theil,
              exp(CAST(lq AS DOUBLE) / n / 1000000) / 1000000 AS geo
            FROM terms)
    SELECT fin.g AS source, CAST(n AS BIGINT) AS n,
           CAST(COALESCE(excl.nx, 0) AS BIGINT) AS n_excluded,
           floor(mu * 1000000 + 0.5) / 1000000 AS mean,
           floor(CAST(hnum AS DOUBLE) / (2.0 * CAST(s AS DOUBLE))
                 / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS hoover,
           CASE WHEN theil >= 0 THEN floor(theil * 1000000 + 0.5)
                ELSE -floor(-theil * 1000000 + 0.5) END / 1000000 AS theil_t,
           CASE WHEN 1.0 - geo / mu >= 0
                THEN floor((1.0 - geo / mu) * 1000000 + 0.5)
                ELSE -floor(-(1.0 - geo / mu) * 1000000 + 0.5) END / 1000000
             AS atkinson
    FROM fin LEFT JOIN excl ON excl.g = fin.g
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.hoover.between(0, 1).all()
    assert (pdf.theil_t >= -1e-9).all()
    assert pdf.atkinson.between(-1e-9, 1).all()


def test_inequality_known_cases(spark):
    """Pins: [1, 3] → Hoover exactly 1/4, Theil and Atkinson from the
    closed forms; an all-equal group reports exactly 0 on all three;
    nonpositive values are excluded and counted."""
    from osmapreduceproject_spark.operators.stats import inequality_report

    df = spark.createDataFrame([("g", 1.0), ("g", 3.0)], "s string, v double")
    r = inequality_report(df, "s", "v").first()
    assert r["hoover"] == 0.25 and r["mean"] == 2.0
    th = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert abs(r["theil_t"] - th) < 2e-6
    assert abs(r["atkinson"] - (1 - math.sqrt(3) / 2)) < 2e-6
    flat = spark.createDataFrame([("g", 5.0)] * 4, "s string, v double")
    rf = inequality_report(flat, "s", "v").first()
    assert rf["hoover"] == 0.0 and rf["theil_t"] == 0.0
    assert rf["atkinson"] == 0.0
    mixed = spark.createDataFrame(
        [("g", 2.0), ("g", 0.0), ("g", -1.0)], "s string, v double"
    )
    rm = inequality_report(mixed, "s", "v").first()
    assert rm["n"] == 1 and rm["n_excluded"] == 2


def test_gamma_concordance_oracle(spark, duck):
    """Gamma/Somers' D over (l_quantity, l_discount) contingency cells;
    the bounded cell×cell concordance join replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import gamma_concordance

    got = gamma_concordance(_t(spark, "lineitem"), "l_quantity", "l_discount")
    sql = """
    WITH pool AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
                         CAST(l_discount AS DOUBLE) AS y
                  FROM lineitem
                  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
    cells AS (SELECT x, y, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    cd AS (SELECT
             COALESCE(SUM(CASE WHEN a.y < b.y
               THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS cc,
             COALESCE(SUM(CASE WHEN a.y > b.y
               THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS dd
           FROM cells a JOIN cells b ON a.x < b.x AND a.y <> b.y),
    ty AS (SELECT COALESCE(SUM(CAST(sy AS HUGEINT) * sy), 0) AS sy2
           FROM (SELECT y, SUM(c) AS sy FROM cells GROUP BY y)),
    cm AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS sc2,
                  SUM(c) AS n, COUNT(DISTINCT x) AS nx,
                  COUNT(DISTINCT y) AS ny
           FROM cells),
    fin AS (SELECT cc, dd, sy2, sc2, n, nx, ny,
              CAST(cc AS DOUBLE) AS c_d, CAST(dd AS DOUBLE) AS d_d,
              CAST(sy2 - sc2 AS DOUBLE) / 2.0 AS tyo
            FROM cd, ty, cm)
    SELECT CAST(n AS BIGINT) AS n, CAST(nx AS BIGINT) AS n_x_levels,
           CAST(ny AS BIGINT) AS n_y_levels,
           CAST(cc AS BIGINT) AS n_concordant,
           CAST(dd AS BIGINT) AS n_discordant,
           CASE WHEN c_d + d_d > 0 THEN
             CASE WHEN (c_d - d_d) / (c_d + d_d) >= 0
                  THEN floor((c_d - d_d) / (c_d + d_d) * 1000000 + 0.5)
                  ELSE -floor(-((c_d - d_d) / (c_d + d_d)) * 1000000 + 0.5)
             END / 1000000 END AS gamma,
           CASE WHEN c_d + d_d + tyo > 0 THEN
             CASE WHEN (c_d - d_d) / (c_d + d_d + tyo) >= 0
                  THEN floor((c_d - d_d) / (c_d + d_d + tyo) * 1000000 + 0.5)
                  ELSE -floor(-((c_d - d_d) / (c_d + d_d + tyo)) * 1000000
                              + 0.5)
             END / 1000000 END AS somers_d_yx
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["gamma"] is None or -1.0 <= r["gamma"] <= 1.0
    assert abs(r["somers_d_yx"]) <= abs(r["gamma"]) + 1e-9


def test_gamma_known_cases(spark):
    """Pins: perfect concordance → γ = D = 1; a y-tie discounts D but
    not γ (hand 2/3); a constant y → NULL γ with D = 0."""
    from osmapreduceproject_spark.operators.stats import gamma_concordance

    up = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)], "x double, y double"
    )
    r = gamma_concordance(up, "x", "y").first()
    assert r["gamma"] == 1.0 and r["somers_d_yx"] == 1.0
    assert r["n_concordant"] == 3 and r["n_discordant"] == 0
    tie = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0)], "x double, y double"
    )
    rt = gamma_concordance(tie, "x", "y").first()
    assert rt["gamma"] == 1.0 and rt["somers_d_yx"] == 0.666667
    const = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0)], "x double, y double"
    )
    rc = gamma_concordance(const, "x", "y").first()
    assert rc["gamma"] is None and rc["somers_d_yx"] == 0.0


# ---------------------------------------------------------------------------
# windows family
# ---------------------------------------------------------------------------


def test_durbin_watson_oracle(spark, duck):
    """Per-user DW over the value series; exact integer numerator
    (mean cancels) and centered denominator replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import durbin_watson

    got = durbin_watson(_t(spark, "events"), "user_id", "ts", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS k, epoch_us(ts) AS e,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vq
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    lagged AS (SELECT k, vq,
                 vq - LAG(vq) OVER (PARTITION BY k ORDER BY e, vq) AS d
               FROM pool),
    agg AS (SELECT k, COUNT(*) AS n,
              SUM(CAST(vq AS HUGEINT)) AS s,
              SUM(CAST(vq AS HUGEINT) * vq) AS ss,
              SUM(CAST(d AS HUGEINT) * d) AS num
            FROM lagged GROUP BY k),
    fin AS (SELECT k, n, num,
              CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) AS den
            FROM agg WHERE n >= 2)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n,
           CASE WHEN den > 0 THEN
             CASE WHEN CAST(n AS DOUBLE) * CAST(num AS DOUBLE) / den >= 0
               THEN floor(CAST(n AS DOUBLE) * CAST(num AS DOUBLE) / den
                          * 1000000 + 0.5)
               ELSE -floor(-(CAST(n AS DOUBLE) * CAST(num AS DOUBLE) / den)
                           * 1000000 + 0.5) END / 1000000
           END AS dw,
           CASE WHEN den > 0 THEN
             CASE WHEN 1.0 - CAST(n AS DOUBLE) * CAST(num AS DOUBLE) / den / 2.0 >= 0
               THEN floor((1.0 - CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
                           / den / 2.0) * 1000000 + 0.5)
               ELSE -floor(-(1.0 - CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
                             / den / 2.0) * 1000000 + 0.5) END / 1000000
           END AS rho_approx
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    ok = pdf.dropna(subset=["dw"])
    assert ok.dw.between(0, 4).all()


def test_durbin_watson_known_cases(spark):
    """Pins: an alternating ±1 series → DW = 10/3 (hand); a monotone
    ramp → DW = 0.4 with ρ ≈ 0.8; a constant series → NULL; a
    single-point key emits no row."""
    import datetime

    from osmapreduceproject_spark.operators.windows import durbin_watson

    base = datetime.datetime(2025, 1, 1)

    def ts(h):
        return base + datetime.timedelta(hours=h)

    rows = [(1, ts(i), 1.0 if i % 2 == 0 else -1.0) for i in range(6)]
    rows += [(2, ts(i), float(i + 1)) for i in range(5)]
    rows += [(3, ts(i), 7.0) for i in range(4)]
    rows += [(4, ts(0), 1.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {r["k"]: r for r in durbin_watson(df, "k", "ts", "v").collect()}
    assert out[1]["dw"] == 3.333333 and out[1]["rho_approx"] == -0.666667
    assert out[2]["dw"] == 0.4 and out[2]["rho_approx"] == 0.8
    assert out[3]["dw"] is None
    assert 4 not in out


# ---------------------------------------------------------------------------
# events family
# ---------------------------------------------------------------------------


def test_transition_perplexity_oracle(spark, duck):
    """Per-user cross-entropy under the global transition model; the
    per-type micro-bit surprisal and exact per-user sums replayed."""
    from osmapreduceproject_spark.operators.events import transition_perplexity

    got = transition_perplexity(_t(spark, "events"))
    sql = """
    WITH pairs AS (
      SELECT user_id AS u, event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events WHERE event_type IS NOT NULL),
    p2 AS (SELECT u, f, t FROM pairs WHERE t IS NOT NULL),
    up AS (SELECT u, f, t, COUNT(*) AS uc FROM p2 GROUP BY 1, 2, 3),
    model AS (SELECT f, t, COUNT(*) AS n FROM p2 GROUP BY 1, 2),
    cf AS (SELECT f, SUM(n) AS nf FROM model GROUP BY f),
    scored AS (SELECT model.f, model.t,
                 CAST(floor(-log2(CAST(n AS DOUBLE) / CAST(nf AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS q
               FROM model JOIN cf ON cf.f = model.f),
    per AS (SELECT u, SUM(uc) AS m,
              SUM(CAST(uc AS HUGEINT) * q) AS bits2
            FROM up JOIN scored ON scored.f = up.f AND scored.t = up.t
            GROUP BY u)
    SELECT u AS user_id, CAST(m AS BIGINT) AS n_transitions,
           floor(CAST(bits2 AS DOUBLE) / m / 1000000 * 1000000 + 0.5)
             / 1000000 AS cross_entropy_bits,
           floor(pow(2.0, CAST(bits2 AS DOUBLE) / m / 1000000)
                 * 1000000 + 0.5) / 1000000 AS perplexity
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.perplexity >= 1.0 - 1e-9).all()
    assert (pdf.cross_entropy_bits >= 0).all()


def test_transition_perplexity_known_cases(spark):
    """Pins: identical deterministic users → 0 bits, perplexity 1; a
    50/50 branch charges exactly 1 bit on the branching transitions
    (hand 0.5 bits over the ababa loop); single-event users no row."""
    import datetime

    from osmapreduceproject_spark.operators.events import transition_perplexity

    base = datetime.datetime(2025, 1, 1)

    def ev(seqs):
        rows, eid = [], 0
        for u, seq in enumerate(seqs):
            for i, s in enumerate(seq):
                rows.append(
                    (eid, base + datetime.timedelta(minutes=i), u, s)
                )
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )

    out = {r["user_id"]: r
           for r in transition_perplexity(ev(["abab", "abab"])).collect()}
    assert all(
        r["cross_entropy_bits"] == 0.0 and r["perplexity"] == 1.0
        for r in out.values()
    )
    out2 = {r["user_id"]: r
            for r in transition_perplexity(ev(["ababa", "acaca"])).collect()}
    assert out2[0]["cross_entropy_bits"] == 0.5
    assert out2[0]["perplexity"] == 1.414214
    out3 = transition_perplexity(ev(["ab", "x"])).collect()
    assert {r["user_id"] for r in out3} == {0}  # 'x' has no transitions


def _ht_sql(n_iter: int = 8) -> str:
    """Chained-CTE replay of hitting_time's integer micro-step value
    iteration (the q303 _MARKOV_ITS pattern): h⁰ ≡ 0;
    hᵐ⁺¹(i≠target) = 10⁶ + Σⱼ floor(pᵢⱼ·hᵐⱼ + 0.5)."""
    its = ["it0 AS (SELECT s.s AS s, CAST(0 AS BIGINT) AS h FROM states s)"]
    for k in range(1, n_iter + 1):
        its.append(
            f"it{k} AS (SELECT st.s AS s, CASE WHEN st.s = tgt.t THEN 0 "
            f"ELSE 1000000 + COALESCE(agg{k}.x, 0) END AS h "
            f"FROM states st CROSS JOIN tgt LEFT JOIN "
            f"(SELECT p.i, CAST(SUM(CAST(floor(p.p * it{k-1}.h + 0.5) "
            f"AS BIGINT)) AS BIGINT) AS x FROM p "
            f"JOIN it{k-1} ON it{k-1}.s = p.j WHERE it{k-1}.h > 0 "
            f"GROUP BY p.i) agg{k} ON agg{k}.i = st.s)"
        )
    return f"""
    WITH pairs AS (
      SELECT event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events WHERE event_type IS NOT NULL),
    cnt AS (SELECT f, t, COUNT(*) AS n FROM pairs WHERE t IS NOT NULL
            GROUP BY 1, 2),
    tot AS (SELECT f, SUM(n) AS tn FROM cnt GROUP BY f),
    states AS (SELECT DISTINCT event_type AS s FROM events
               WHERE event_type IS NOT NULL),
    tgt AS (SELECT event_type AS t FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY COUNT(*) DESC, event_type ASC LIMIT 1),
    p AS (SELECT c.f AS i, c.t AS j, CAST(c.n AS DOUBLE) / tot.tn AS p
          FROM cnt c JOIN tot ON tot.f = c.f
          UNION ALL
          SELECT s.s, s.s, 1.0 FROM states s
          WHERE s.s NOT IN (SELECT f FROM tot)),
    {", ".join(its)}
    SELECT s.s AS state, CAST(COALESCE(tot.tn, 0) AS BIGINT) AS n_out,
           s.s = (SELECT t FROM tgt) AS is_target,
           CAST(it{n_iter}.h AS DOUBLE) / 1000000 AS hitting_steps
    FROM states s LEFT JOIN tot ON tot.f = s.s
    JOIN it{n_iter} ON it{n_iter}.s = s.s
    """


def test_hitting_time_oracle(spark, duck):
    """Truncated expected hitting time to the most frequent event type;
    the 8-step integer micro-step iteration replayed as chained CTEs."""
    from osmapreduceproject_spark.operators.events import hitting_time

    ev = _t(spark, "events")
    target = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .count()
        .orderBy(F.col("count").desc(), F.col("event_type").asc())
        .first()["event_type"]
    )
    got = hitting_time(ev, target=target)
    assert compare(got, duck.execute(_ht_sql(8)).df()) == []
    rows = got.collect()
    tgt_rows = [r for r in rows if r["is_target"]]
    assert len(tgt_rows) == 1 and tgt_rows[0]["hitting_steps"] == 0.0
    assert all(0.0 <= r["hitting_steps"] <= 8.0 for r in rows)


def test_hitting_time_known_cases(spark):
    """Pins: a deterministic a→b→c chain reports 2/1/0 steps to c; an
    unreachable target reads exactly the horizon; an unknown target
    raises loudly."""
    import datetime

    from osmapreduceproject_spark.operators.events import hitting_time

    base = datetime.datetime(2025, 1, 1)

    def ev(seqs):
        rows, eid = [], 0
        for u, seq in enumerate(seqs):
            for i, s in enumerate(seq):
                rows.append(
                    (eid, base + datetime.timedelta(minutes=i), u, s)
                )
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )

    rows = {r["state"]: r for r in hitting_time(ev(["abc"]), target="c").collect()}
    assert rows["c"]["hitting_steps"] == 0.0 and rows["c"]["is_target"]
    assert rows["b"]["hitting_steps"] == 1.0
    assert rows["a"]["hitting_steps"] == 2.0
    rows2 = {r["state"]: r
             for r in hitting_time(ev(["ab"]), target="a").collect()}
    assert rows2["b"]["hitting_steps"] == 8.0  # absorbed away: horizon
    assert rows2["a"]["hitting_steps"] == 0.0
    with pytest.raises(ValueError, match="not an observed state"):
        hitting_time(ev(["abc"]), target="zzz")


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------


def test_bigram_surprise_oracle(spark, duck):
    """Per-doc add-1 bigram LM scoring; the type-level micro-bit
    surprisal and exact per-doc sums replayed in SQL (1-based DuckDB
    list indexing over a per-row range)."""
    from osmapreduceproject_spark.operators.text import bigram_surprise

    got = bigram_surprise(_t(spark, "documents"))
    sql = """
    WITH pool AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                  FROM documents WHERE text IS NOT NULL),
    bpool AS (SELECT * FROM pool WHERE len(toks) >= 2),
    idx AS (SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i
            FROM bpool),
    bg AS (SELECT doc_id, source, toks[CAST(i AS BIGINT)] AS f,
                  toks[CAST(i + 1 AS BIGINT)] AS w
           FROM idx),
    model AS (SELECT f, w, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    cf AS (SELECT f, SUM(c) AS cfn FROM model GROUP BY f),
    vocab AS (SELECT COUNT(DISTINCT t) AS v FROM
              (SELECT unnest(toks) AS t FROM pool)),
    scored AS (SELECT model.f, model.w,
                 CAST(floor(-log2(CAST(c + 1 AS DOUBLE)
                                  / CAST(cfn + v AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS q
               FROM model JOIN cf ON cf.f = model.f, vocab),
    per AS (SELECT doc_id, source, COUNT(*) AS nb,
              SUM(CAST(q AS HUGEINT)) AS bits2
            FROM bg JOIN scored ON scored.f = bg.f AND scored.w = bg.w
            GROUP BY 1, 2)
    SELECT doc_id, source, CAST(nb AS BIGINT) AS n_bigrams,
           floor(CAST(bits2 AS DOUBLE) / nb / 1000000 * 1000000 + 0.5)
             / 1000000 AS bits_per_bigram
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.bits_per_bigram > 0).all()
    assert len(pdf) > 0


def test_bigram_surprise_known_cases(spark):
    """Pins: hand model over a 3-doc corpus (V includes the bigram-less
    doc); single-token docs emit no row; a repeated-bigram doc scores
    the model's cheapest continuation."""
    from osmapreduceproject_spark.operators.text import bigram_surprise

    df = spark.createDataFrame(
        [(1, "s", "a b a b"), (2, "s", "a c"), (3, "s", "x")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in bigram_surprise(df).collect()}
    # V = {a,b,c,x} = 4; P(b|a) = 3/7, P(a|b) = 2/5, P(c|a) = 2/7
    q = lambda p: math.floor(-math.log2(p) * 1e6 + 0.5)  # noqa: E731
    exp1 = math.floor((2 * q(3 / 7) + q(2 / 5)) / 3 / 1e6 * 1e6 + 0.5) / 1e6
    assert out[1]["n_bigrams"] == 3 and out[1]["bits_per_bigram"] == exp1
    assert out[2]["bits_per_bigram"] == q(2 / 7) / 1e6
    assert 3 not in out


# ---------------------------------------------------------------------------
# multimodal family
# ---------------------------------------------------------------------------


def test_video_flicker_report_oracle(spark, duck):
    """Flicker over the planted-cut fixture: the oracle regenerates
    every frame-luma sum from the closed-form byte formula and replays
    the delta-sign machinery."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_flicker_report,
    )

    frames = arith_video_frames(
        spark, n_videos=24, n_frames=12, cut_at=6, width=16, height=12,
        delta_bytes=12,
    )
    got = video_flicker_report(frames)
    sql = """
    WITH vv AS (SELECT unnest(range(24)) AS vid),
    ff AS (SELECT vid, unnest(range(12)) AS f FROM vv),
    by_ AS (SELECT vid, f,
              CASE WHEN f < 6 THEN vid ELSE vid + 500 END AS m,
              unnest(range(576)) AS i
            FROM ff),
    ls AS (SELECT vid, f,
             SUM((31*m + 7*i + (i*i) % 251
                  + f * (CASE WHEN i < 12 THEN 1 ELSE 0 END)) % 256) AS lsum,
             COUNT(*) AS sz
           FROM by_ GROUP BY 1, 2),
    d AS (SELECT vid, sz,
            lsum - LAG(lsum) OVER (PARTITION BY vid ORDER BY f) AS dd,
            f
          FROM ls),
    nz AS (SELECT vid, f, dd,
             LAG(dd > 0) OVER (PARTITION BY vid ORDER BY f) AS ps
           FROM d WHERE dd IS NOT NULL AND dd <> 0),
    pnz AS (SELECT vid, COUNT(*) AS nnz,
              SUM(CASE WHEN ps IS NOT NULL AND (dd > 0) <> ps
                       THEN 1 ELSE 0 END) AS nf
            FROM nz GROUP BY vid),
    base AS (SELECT vid, COUNT(*) AS n_frames,
               SUM(CASE WHEN dd IS NOT NULL THEN 1 ELSE 0 END) AS n_deltas,
               SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS n_zero,
               SUM(CASE WHEN dd IS NOT NULL THEN
                 CAST(abs(dd) AS HUGEINT) END) AS sad,
               MAX(sz) AS px
             FROM d GROUP BY vid)
    SELECT CAST(base.vid AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_deltas AS BIGINT) AS n_deltas,
           CAST(n_zero AS BIGINT) AS n_zero_deltas,
           CASE WHEN COALESCE(nnz, 0) >= 2 THEN
             floor(CAST(nf AS DOUBLE) / (nnz - 1) * 1000000 + 0.5) / 1000000
           END AS flip_rate,
           CASE WHEN n_deltas >= 1 THEN
             floor(CAST(sad AS DOUBLE) / n_deltas / px * 1000000 + 0.5)
               / 1000000
           END AS mean_abs_delta_px
    FROM base LEFT JOIN pnz ON pnz.vid = base.vid
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_frames == 12).all()
    assert pdf.flip_rate.dropna().between(0, 1).all()


def test_video_flicker_known_cases(spark):
    """Pins: alternating bright/dark frames → flip_rate exactly 1 with
    per-pixel delta 255; a monotone ramp → 0; an all-frozen clip has
    only zero deltas → NULL flip_rate (the runs-test exclusion)."""
    from osmapreduceproject_spark.operators.multimodal import (
        video_flicker_report,
    )

    meta = "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    rows = []
    for f in range(6):
        rows.append(
            (0, "video", f, bytes([255 if f % 2 == 0 else 0] * 12),
             (2, 2, None, 6))
        )
    for f in range(6):
        rows.append((1, "video", f, bytes([f * 10] * 12), (2, 2, None, 6)))
    for f in range(4):
        rows.append((2, "video", f, bytes([9] * 12), (2, 2, None, 4)))
    df = spark.createDataFrame(
        rows,
        f"media_id long, kind string, frame_idx int, payload binary, {meta}",
    )
    out = {r["media_id"]: r for r in video_flicker_report(df).collect()}
    assert out[0]["flip_rate"] == 1.0 and out[0]["mean_abs_delta_px"] == 255.0
    assert out[1]["flip_rate"] == 0.0 and out[1]["mean_abs_delta_px"] == 10.0
    assert out[2]["flip_rate"] is None and out[2]["n_zero_deltas"] == 3
    assert out[2]["mean_abs_delta_px"] == 0.0


def test_image_letterbox_detect_oracle(spark, duck):
    """Letterbox bands over the planted-bar fixture: the oracle
    regenerates every row-luma sum (barred rows mod 8, interior mod
    256) and replays the band arithmetic."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images_letterboxed,
        image_letterbox_detect,
    )

    imgs = arith_raw_images_letterboxed(
        spark, n=64, width=16, height=12, top_rows=2, bottom_rows=1
    )
    got = image_letterbox_detect(imgs)
    sql = """
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(576)) AS i FROM mm),
    v AS (SELECT m, (i // 3) // 16 AS y,
            CASE WHEN (i // 3) // 16 < 2 OR (i // 3) // 16 >= 11
                 THEN (31*m + 7*i + (i*i) % 251) % 8
                 ELSE (31*m + 7*i + (i*i) % 251) % 256 END AS b
          FROM px),
    rows_ AS (SELECT m, y, SUM(b) AS rsum, COUNT(*) AS rsz
              FROM v GROUP BY 1, 2),
    mk AS (SELECT m, y,
             CASE WHEN rsum >= 32 * rsz THEN 1 ELSE 0 END AS bright
           FROM rows_),
    agg AS (SELECT m, COUNT(*) AS n_rows,
              MIN(CASE WHEN bright = 1 THEN y END) AS first_b,
              MAX(CASE WHEN bright = 1 THEN y END) AS last_b,
              SUM(bright) AS ncontent
            FROM mk GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(COALESCE(first_b, n_rows) AS BIGINT) AS top_band,
           CAST(COALESCE(n_rows - 1 - last_b, n_rows) AS BIGINT)
             AS bottom_band,
           CAST(ncontent AS BIGINT) AS n_content_rows,
           COALESCE(first_b, n_rows) >= 1
             AND COALESCE(n_rows - 1 - last_b, n_rows) >= 1
             AND ncontent > 0 AS letterboxed
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = got.collect()
    assert all(r["top_band"] == 2 and r["bottom_band"] == 1 for r in rows)
    assert all(r["letterboxed"] for r in rows)


def test_image_letterbox_known_cases(spark):
    """Pins: an all-black image reports bands = height and is NOT
    letterboxed (no content); an all-bright image reports 0/0 bands;
    a malformed payload raises loudly."""
    from osmapreduceproject_spark.operators.multimodal import (
        image_letterbox_detect,
    )

    meta = "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    black = spark.createDataFrame(
        [(0, "image", bytes(16 * 12 * 3), (16, 12, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rb = image_letterbox_detect(black).first()
    assert rb["top_band"] == 12 and rb["bottom_band"] == 12
    assert rb["n_content_rows"] == 0 and not rb["letterboxed"]
    bright = spark.createDataFrame(
        [(1, "image", bytes([200] * (16 * 12 * 3)), (16, 12, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rn = image_letterbox_detect(bright).first()
    assert rn["top_band"] == 0 and rn["bottom_band"] == 0
    assert not rn["letterboxed"]
    bad = spark.createDataFrame(
        [(2, "image", bytes(10), (16, 12, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    with pytest.raises(Exception, match="RAW8"):
        image_letterbox_detect(bad).collect()


# ---------------------------------------------------------------------------
# similarity family
# ---------------------------------------------------------------------------


def test_embedding_dim_variance_oracle(spark, duck):
    """Per-dim variance census over the 64-d embeddings; the quantized
    per-dim variances and the PR finalize replayed in SQL."""
    from osmapreduceproject_spark.operators.similarity import (
        embedding_dim_variance,
    )

    got = embedding_dim_variance(_t(spark, "embeddings"))
    sql = """
    WITH cells AS (
      SELECT i - 1 AS dim,
             CAST(round(CAST(embedding[CAST(i AS BIGINT)] AS DOUBLE)
                        * 1000000) AS BIGINT) AS xq
      FROM (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i
            FROM embeddings WHERE embedding IS NOT NULL)),
    per AS (SELECT dim, COUNT(*) AS n, SUM(CAST(xq AS HUGEINT)) AS s,
              SUM(CAST(xq AS HUGEINT) * xq) AS ss
            FROM cells GROUP BY dim),
    qv AS (SELECT dim, n,
             CAST(floor((CAST(ss AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n / 1e12
                  * 1000000 + 0.5) AS BIGINT) AS v
           FROM per),
    agg AS (SELECT MAX(n) AS nvec, COUNT(*) AS nd,
              SUM(CAST(v AS HUGEINT)) AS tr,
              MAX(v) AS mx,
              SUM(CAST(v AS HUGEINT) * v) AS ss2
            FROM qv),
    mxd AS (SELECT MIN(dim) AS d FROM qv, agg WHERE qv.v = agg.mx)
    SELECT CAST(nvec AS BIGINT) AS n_vectors, CAST(nd AS BIGINT) AS n_dims,
           CAST(tr AS DOUBLE) / 1000000 AS total_variance,
           CAST(mx AS DOUBLE) / 1000000 AS max_dim_variance,
           CAST((SELECT d FROM mxd) AS INTEGER) AS max_var_dim,
           CASE WHEN tr > 0 THEN
             floor(CAST(mx AS DOUBLE) / CAST(tr AS DOUBLE) * 1000000 + 0.5)
               / 1000000 END AS top_dim_share,
           CASE WHEN ss2 > 0 THEN
             floor(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE)
                   / CAST(ss2 AS DOUBLE) * 1000000 + 0.5) / 1000000
           END AS participation_ratio
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["n_dims"] == 64
    assert 1.0 <= r["participation_ratio"] <= 64.0
    assert 1.0 / 64 <= r["top_dim_share"] <= 1.0


def test_embedding_dim_variance_known_cases(spark):
    """Pins: variance carried by one dim → share 1, PR 1, argmax on
    the smaller tied dim; identical vectors → zero trace with NULL
    shares; isotropic two dims → PR exactly 2."""
    from osmapreduceproject_spark.operators.similarity import (
        embedding_dim_variance,
    )

    one = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [3.0, 0.0]), (2, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    r = embedding_dim_variance(one).first()
    assert r["total_variance"] == 2.666667 and r["max_var_dim"] == 0
    assert r["top_dim_share"] == 1.0 and r["participation_ratio"] == 1.0
    flat = spark.createDataFrame(
        [(i, [2.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    rf = embedding_dim_variance(flat).first()
    assert rf["total_variance"] == 0.0 and rf["top_dim_share"] is None
    assert rf["participation_ratio"] is None and rf["max_var_dim"] == 0
    iso = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [-1.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    ri = embedding_dim_variance(iso).first()
    assert ri["participation_ratio"] == 2.0 and ri["max_var_dim"] == 0


# ---------------------------------------------------------------------------
# sampling family
# ---------------------------------------------------------------------------


def test_neyman_allocation_oracle(spark, duck):
    """Neyman vs proportional allocation over doc lengths per source;
    the exact integer largest-remainder arithmetic replayed in SQL."""
    from osmapreduceproject_spark.operators.sampling import neyman_allocation

    docs = _t(spark, "documents").select(
        "source", F.length("text").cast("double").alias("len")
    )
    got = neyman_allocation(docs, "source", "len", budget=1000)
    sql = """
    WITH pool AS (SELECT source AS h,
                    CAST(round(CAST(length(text) AS DOUBLE) * 1000000)
                         AS HUGEINT) AS vq
                  FROM documents WHERE source IS NOT NULL
                    AND text IS NOT NULL),
    per AS (SELECT h, COUNT(*) AS n, SUM(vq) AS s, SUM(vq * vq) AS ss
            FROM pool GROUP BY h),
    wts AS (SELECT h, n,
              CAST(floor(sqrt((CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                / 1000000 * 1000000 + 0.5) AS BIGINT) AS qsd,
              CAST(floor(CAST(n AS DOUBLE) * (sqrt((CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                / 1000000) * 1000000 + 0.5) AS HUGEINT) AS w
            FROM per),
    tot AS (SELECT SUM(w) AS tw, SUM(CAST(n AS HUGEINT)) AS tn FROM wts),
    staged AS (SELECT h, n, qsd, w, tw, tn,
                 CASE WHEN tw > 0 THEN CAST((1000 * w) // tw AS BIGINT)
                      ELSE 0 END AS base_n,
                 CASE WHEN tw > 0 THEN (1000 * w) % tw ELSE 0 END AS rem_n,
                 CAST((1000 * CAST(n AS HUGEINT)) // tn AS BIGINT) AS base_p,
                 (1000 * CAST(n AS HUGEINT)) % tn AS rem_p
               FROM wts, tot),
    ranked AS (SELECT *,
                 ROW_NUMBER() OVER (ORDER BY rem_n DESC, h ASC) AS rk_n,
                 ROW_NUMBER() OVER (ORDER BY rem_p DESC, h ASC) AS rk_p,
                 SUM(base_n) OVER () AS sb_n,
                 SUM(base_p) OVER () AS sb_p
               FROM staged)
    SELECT h AS source, CAST(n AS BIGINT) AS n,
           CAST(qsd AS DOUBLE) / 1000000 AS sd,
           CASE WHEN tw > 0 THEN
             floor(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) * 1000000 + 0.5)
               / 1000000 END AS neyman_share,
           CASE WHEN tw > 0 THEN
             base_n + CASE WHEN rk_n <= 1000 - sb_n THEN 1 ELSE 0 END
           ELSE 0 END AS n_neyman,
           base_p + CASE WHEN rk_p <= 1000 - sb_p THEN 1 ELSE 0 END
             AS n_proportional
    FROM ranked
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.n_neyman.sum() == 1000 and pdf.n_proportional.sum() == 1000
    assert (pdf.sd > 0).all()


def test_neyman_known_cases(spark):
    """Pins: equal-N strata with sd ratio 2:1 split the budget 2:1; a
    zero-variance stratum gets 0; an all-constant pool reports NULL
    shares with zero allocations; largest-remainder seats break ties
    to the smaller label."""
    from osmapreduceproject_spark.operators.sampling import neyman_allocation

    rows = [
        ("a", 0.0), ("a", 4.0), ("a", 0.0), ("a", 4.0),
        ("b", 0.0), ("b", 2.0), ("b", 0.0), ("b", 2.0),
    ]
    df = spark.createDataFrame(rows, "s string, v double")
    out = {r["s"]: r for r in neyman_allocation(df, "s", "v", budget=9).collect()}
    assert out["a"]["sd"] == 2.0 and out["b"]["sd"] == 1.0
    assert out["a"]["neyman_share"] == 0.666667
    assert out["a"]["n_neyman"] == 6 and out["b"]["n_neyman"] == 3
    # proportional: equal N → 4 each + 1 remainder seat to label 'a'
    assert out["a"]["n_proportional"] == 5 and out["b"]["n_proportional"] == 4
    z = [("a", 1.0), ("a", 3.0), ("c", 5.0), ("c", 5.0)]
    outz = {r["s"]: r for r in neyman_allocation(
        spark.createDataFrame(z, "s string, v double"), "s", "v", budget=10
    ).collect()}
    assert outz["c"]["n_neyman"] == 0 and outz["a"]["n_neyman"] == 10
    const = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0)], "s string, v double"
    )
    outc = neyman_allocation(const, "s", "v", budget=4).collect()
    assert all(r["neyman_share"] is None and r["n_neyman"] == 0 for r in outc)
    assert sum(r["n_proportional"] for r in outc) == 4


# ---------------------------------------------------------------------------
# fourth tranche: logrank / cronbach / bartlett / turning points / ESS /
# hubness
# ---------------------------------------------------------------------------


def test_logrank_test_oracle(spark, duck):
    """Two-group survival comparison: durations = l_quantity, event =
    returnflag 'R', groups = linestatus O vs F; the ranged-cumsum
    at-risk series and the micro-quantized E/V terms replayed in SQL
    with the pinned operand order."""
    from osmapreduceproject_spark.operators.stats import logrank_test

    li = _t(spark, "lineitem").select(
        F.col("l_quantity").cast("double").alias("t"),
        (F.col("l_returnflag") == "R").cast("int").alias("e"),
        F.col("l_linestatus").alias("g"),
    )
    got = logrank_test(li, "t", "e", "g", "O", "F")
    sql = """
    WITH pool AS (
      SELECT CAST(l_quantity AS DOUBLE) AS t,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS e,
             CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS a
      FROM lineitem
      WHERE l_linestatus IN ('O', 'F') AND l_quantity IS NOT NULL),
    per_t AS (SELECT t, COUNT(*) AS c, SUM(a) AS c1, SUM(e) AS d,
                     SUM(e * a) AS d1
              FROM pool GROUP BY t),
    cum AS (SELECT *, SUM(c) OVER (ORDER BY t) AS cc,
                   SUM(c1) OVER (ORDER BY t) AS cc1 FROM per_t),
    tot AS (SELECT COALESCE(MAX(cc), 0) AS nn, COALESCE(MAX(cc1), 0) AS na
            FROM cum),
    risk AS (SELECT d, d1, nn - (cc - c) AS nr, na - (cc1 - c1) AS nr1
             FROM cum, tot),
    terms AS (SELECT
        COALESCE(SUM(d1), 0) AS o1,
        COALESCE(SUM(CAST(floor(CAST(d AS DOUBLE) * CAST(nr1 AS DOUBLE)
          / CAST(nr AS DOUBLE) * 1000000 + 0.5) AS HUGEINT)), 0) AS qe,
        COALESCE(SUM(CASE WHEN nr > 1 THEN
          CAST(floor(CAST(d AS DOUBLE) * CAST(nr1 AS DOUBLE)
            * (CAST(nr AS DOUBLE) - CAST(nr1 AS DOUBLE))
            * (CAST(nr AS DOUBLE) - CAST(d AS DOUBLE))
            / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE)
               * (CAST(nr AS DOUBLE) - 1.0))
            * 1000000 + 0.5) AS HUGEINT) ELSE 0 END), 0) AS qv
      FROM risk WHERE d > 0)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nn - na AS BIGINT) AS n_b,
           CAST(o1 AS BIGINT) AS observed_a,
           CASE WHEN na > 0 AND nn > na THEN
             floor(CAST(qe AS DOUBLE) / 1000000 * 1000000 + 0.5) / 1000000
           END AS expected_a,
           CASE WHEN na > 0 AND nn > na THEN
             floor(CAST(qv AS DOUBLE) / 1000000 * 1000000 + 0.5) / 1000000
           END AS variance,
           CASE WHEN na > 0 AND nn > na AND qv > 0 THEN
             round((CAST(o1 AS DOUBLE) - CAST(qe AS DOUBLE) / 1000000)
                   / sqrt(CAST(qv AS DOUBLE) / 1000000), 6)
           END AS z,
           CASE WHEN na > 0 AND nn > na AND qv > 0 THEN
             round((CAST(o1 AS DOUBLE) - CAST(qe AS DOUBLE) / 1000000)
                   * (CAST(o1 AS DOUBLE) - CAST(qe AS DOUBLE) / 1000000)
                   / (CAST(qv AS DOUBLE) / 1000000), 6)
           END AS chi2
    FROM terms, tot
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["chi2"] is None or r["chi2"] >= 0


def test_logrank_known_cases(spark):
    """Pins: A dying strictly before B (all events) → O=3, E=1.15,
    V=0.6775, z=2.24759; identical groups → z=0, chi2=0; an
    all-censored B still contributes at-risk mass (hand E/V)."""
    import math as m

    from osmapreduceproject_spark.operators.stats import logrank_test

    sep = spark.createDataFrame(
        [(1.0, 1, "a"), (2.0, 1, "a"), (3.0, 1, "a"),
         (4.0, 1, "b"), (5.0, 1, "b"), (6.0, 1, "b")],
        "t double, e int, g string",
    )
    r = logrank_test(sep, "t", "e", "g", "a", "b").first()
    assert r["observed_a"] == 3 and r["expected_a"] == 1.15
    assert r["variance"] == 0.6775
    assert r["z"] == 2.24759 and r["chi2"] == 5.051661
    same = spark.createDataFrame(
        [(1.0, 1, "a"), (2.0, 1, "a"), (1.0, 1, "b"), (2.0, 1, "b")],
        "t double, e int, g string",
    )
    rs = logrank_test(same, "t", "e", "g", "a", "b").first()
    assert rs["z"] == 0.0 and rs["chi2"] == 0.0
    cens = spark.createDataFrame(
        [(1.0, 1, "a"), (2.0, 1, "a"), (3.0, 0, "b"), (4.0, 0, "b")],
        "t double, e int, g string",
    )
    rc = logrank_test(cens, "t", "e", "g", "a", "b").first()
    assert rc["observed_a"] == 2 and rc["expected_a"] == 0.833333
    assert rc["variance"] == 0.472222
    assert rc["z"] == round((2 - 0.833333) / m.sqrt(0.472222), 6)


def test_cronbach_alpha_oracle(spark, duck):
    """Internal consistency: subjects = users, items = event types,
    scores = value; complete-case item matrix and the exact
    DECIMAL variance-numerator ratio replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import cronbach_alpha

    got = cronbach_alpha(_t(spark, "events"), "user_id", "event_type", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS s, event_type AS i,
             CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) AS HUGEINT)
               AS qv
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    cell AS (SELECT s, i,
               CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*) + 0.5)
                 AS BIGINT) AS q
             FROM pool GROUP BY s, i),
    k AS (SELECT COUNT(DISTINCT i) AS k FROM cell),
    per_subj AS (SELECT s, COUNT(*) AS ki, SUM(CAST(q AS HUGEINT)) AS tot
                 FROM cell GROUP BY s),
    complete AS (SELECT per_subj.* FROM per_subj, k WHERE ki = k.k),
    subj_mom AS (SELECT COUNT(*) AS n,
                   COALESCE(SUM(tot), 0) AS st,
                   COALESCE(SUM(tot * tot), 0) AS st2
                 FROM complete),
    dropped AS (SELECT COUNT(*) AS dr FROM per_subj, k WHERE ki < k.k),
    item_mom AS (
      SELECT COALESCE(SUM(ni * sx2 - sx * sx), 0) AS sinum FROM (
        SELECT cell.i, SUM(CAST(cell.q AS HUGEINT)) AS sx,
               SUM(CAST(cell.q AS HUGEINT) * cell.q) AS sx2,
               COUNT(*) AS ni
        FROM cell JOIN complete ON complete.s = cell.s
        GROUP BY cell.i)),
    fin AS (SELECT k.k, n, dr, sinum,
              CAST(n * st2 - st * st AS DOUBLE) AS totnum
            FROM subj_mom, item_mom, dropped, k)
    SELECT CAST(k AS BIGINT) AS k_items, CAST(n AS BIGINT) AS n_subjects,
           CAST(dr AS BIGINT) AS n_subjects_dropped,
           CASE WHEN k >= 2 AND n >= 2 AND totnum > 0 THEN
             CASE WHEN CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                    * (1.0 - CAST(sinum AS DOUBLE) / totnum) >= 0
               THEN floor(CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                    * (1.0 - CAST(sinum AS DOUBLE) / totnum)
                    * 1000000 + 0.5)
               ELSE -floor(-(CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                    * (1.0 - CAST(sinum AS DOUBLE) / totnum))
                    * 1000000 + 0.5)
             END / 1000000
           END AS alpha
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["k_items"] >= 2 and r["n_subjects"] + r["n_subjects_dropped"] > 0


def test_cronbach_known_cases(spark):
    """Pins: two perfectly-correlated items → α = 1; hand 2-item case
    → α = 104/107; an incomplete subject drops (counted) without
    moving α; constant totals (zero variance) → NULL α."""
    from osmapreduceproject_spark.operators.stats import cronbach_alpha

    perfect = spark.createDataFrame(
        [(s, i, float(s)) for s in (1, 2, 3) for i in ("i1", "i2")],
        "s long, i string, v double",
    )
    assert cronbach_alpha(perfect, "s", "i", "v").first()["alpha"] == 1.0
    hand = spark.createDataFrame(
        [(1, "i1", 1.0), (2, "i1", 2.0), (3, "i1", 3.0), (4, "i1", 4.0),
         (1, "i2", 2.0), (2, "i2", 3.0), (3, "i2", 4.0), (4, "i2", 6.0)],
        "s long, i string, v double",
    )
    # ratio = (20+35)/107 → α = 104/107 = 0.971963 (half-away micro)
    assert cronbach_alpha(hand, "s", "i", "v").first()["alpha"] == 0.971963
    withdrop = hand.union(
        spark.createDataFrame([(5, "i1", 9.0)], "s long, i string, v double")
    )
    rd = cronbach_alpha(withdrop, "s", "i", "v").first()
    assert rd["alpha"] == 0.971963 and rd["n_subjects_dropped"] == 1
    const = spark.createDataFrame(
        [(1, "i1", 1.0), (1, "i2", 3.0), (2, "i1", 2.0), (2, "i2", 2.0)],
        "s long, i string, v double",
    )
    assert cronbach_alpha(const, "s", "i", "v").first()["alpha"] is None


def test_bartlett_test_oracle(spark, duck):
    """Equal-variance test: l_discount by returnflag; exact DECIMAL
    per-group moments, micro-quantized log terms, and the pinned
    correction-factor operand order replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import bartlett_test

    got = bartlett_test(_t(spark, "lineitem"), "l_returnflag", "l_discount")
    sql = """
    WITH pool AS (
      SELECT l_returnflag AS g,
             CAST(floor(CAST(l_discount AS DOUBLE) * 1000000 + 0.5)
               AS HUGEINT) AS q
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL),
    per_g AS (SELECT g, COUNT(*) AS n, SUM(q) AS sx, SUM(q * q) AS sx2
              FROM pool GROUP BY g),
    eligible AS (SELECT n, n * sx2 - sx * sx AS num,
                        CAST(n AS HUGEINT) * (n - 1) AS den
                 FROM per_g WHERE n >= 2),
    live AS (SELECT * FROM eligible WHERE num > 0),
    terms AS (SELECT COUNT(*) AS k, COALESCE(SUM(n), 0) AS nn,
        COALESCE(SUM(CASE WHEN (CAST(n AS DOUBLE) - 1.0)
            * ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) >= 0
          THEN CAST(floor((CAST(n AS DOUBLE) - 1.0)
            * ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            * 1000000 + 0.5) AS HUGEINT)
          ELSE -CAST(floor(-((CAST(n AS DOUBLE) - 1.0)
            * ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)))
            * 1000000 + 0.5) AS HUGEINT) END), 0) AS qln,
        COALESCE(SUM(CAST(floor(CAST(num AS DOUBLE) / CAST(n AS DOUBLE)
          + 0.5) AS HUGEINT)), 0) AS qssq,
        COALESCE(SUM(CASE WHEN 1.0 / (CAST(n AS DOUBLE) - 1.0) >= 0
          THEN CAST(floor(1.0 / (CAST(n AS DOUBLE) - 1.0) * 1000000 + 0.5)
            AS HUGEINT)
          ELSE 0 END), 0) AS qinv
      FROM live),
    degen AS (SELECT COUNT(*) AS dg FROM eligible WHERE NOT (num > 0)),
    fin AS (SELECT k, nn, dg,
              CAST(qssq AS DOUBLE) / CAST(nn - k AS DOUBLE) AS sp2,
              CAST(nn - k AS DOUBLE)
                * ln(CAST(qssq AS DOUBLE) / CAST(nn - k AS DOUBLE))
                - CAST(qln AS DOUBLE) / 1000000 AS tnum,
              1.0 + (CAST(qinv AS DOUBLE) / 1000000
                - 1.0 / CAST(nn - k AS DOUBLE))
                / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS corr
            FROM terms, degen)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n,
           CAST(dg AS BIGINT) AS n_groups_degenerate,
           CASE WHEN k >= 2 THEN
             floor(sp2 / 1000000000000.0 * 1000000 + 0.5) / 1000000
           END AS pooled_var,
           CASE WHEN k >= 2 THEN
             CASE WHEN tnum / corr >= 0
               THEN floor(tnum / corr * 1000000 + 0.5)
               ELSE -floor(-(tnum / corr) * 1000000 + 0.5)
             END / 1000000
           END AS chi2,
           CASE WHEN k >= 2 THEN CAST(k - 1 AS BIGINT) END AS df
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["k_groups"] >= 2 and r["chi2"] is not None


def test_bartlett_known_cases(spark):
    """Pins: hand 2-group case (s² = 5/3 vs 20/3) → T = 1.147596 with
    pooled 25/6; a zero-variance group excludes and counts; a single
    live group → NULL chi2."""
    from osmapreduceproject_spark.operators.stats import bartlett_test

    hand = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 1.0), ("b", 3.0), ("b", 5.0), ("b", 7.0)],
        "g string, v double",
    )
    r = bartlett_test(hand, "g", "v").first()
    assert r["pooled_var"] == 4.166667 and r["chi2"] == 1.147596
    assert r["df"] == 1 and r["n_groups_degenerate"] == 0
    degen = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0),
         ("c", 1.0), ("c", 4.0)],
        "g string, v double",
    )
    rd = bartlett_test(degen, "g", "v").first()
    assert rd["n_groups_degenerate"] == 1 and rd["pooled_var"] == 2.166667
    assert rd["chi2"] == 0.587154
    solo = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double",
    )
    rs = bartlett_test(solo, "g", "v").first()
    assert rs["k_groups"] == 1 and rs["chi2"] is None


def test_turning_points_test_oracle(spark, duck):
    """Per-user local-extrema randomness over (epoch µs, value)-ordered
    event values; the plateau collapse and strict-peak counting
    replayed with SQL window functions."""
    from osmapreduceproject_spark.operators.windows import (
        turning_points_test,
    )

    got = turning_points_test(_t(spark, "events"), "user_id", "ts", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    lagged AS (SELECT k, e, v,
                 lag(v) OVER (PARTITION BY k ORDER BY e, v) AS pv
               FROM pool),
    collapsed AS (SELECT k,
                    SUM(CASE WHEN pv IS NOT NULL AND v = pv THEN 1
                        ELSE 0 END) AS n_collapsed
                  FROM lagged GROUP BY k),
    kept AS (SELECT k, e, v FROM lagged WHERE pv IS NULL OR v <> pv),
    tri AS (SELECT k, v,
              lag(v) OVER (PARTITION BY k ORDER BY e, v) AS p,
              lead(v) OVER (PARTITION BY k ORDER BY e, v) AS x
            FROM kept),
    agg AS (SELECT k, COUNT(*) AS n,
              SUM(CASE WHEN p IS NOT NULL AND x IS NOT NULL
                  AND (v - p) * (v - x) > 0 THEN 1 ELSE 0 END) AS t
            FROM tri GROUP BY k)
    SELECT agg.k AS user_id, CAST(n AS BIGINT) AS n,
           CAST(n_collapsed AS BIGINT) AS n_collapsed,
           CAST(t AS BIGINT) AS n_turning_points,
           CASE WHEN n >= 3 THEN
             round(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 6)
           END AS expected,
           CASE WHEN n >= 3
                  AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0 > 0 THEN
             round((CAST(t AS DOUBLE)
                    - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
                   / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6)
           END AS z
    FROM agg JOIN collapsed ON collapsed.k = agg.k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert len(pdf) > 0 and (pdf.n_turning_points <= pdf.n - 2).all()


def test_turning_points_known_cases(spark):
    """Pins: [1,3,2,4,3] → T=3, z=1.328422; a monotone series → T=0,
    z=−2.656845; plateaus collapse first ([1,1,2,2,1] → n=3,
    2 collapsed, T=1)."""
    import datetime as dt

    from osmapreduceproject_spark.operators.windows import (
        turning_points_test,
    )

    T = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    rows = [("k1", T(i), v) for i, v in enumerate([1.0, 3.0, 2.0, 4.0, 3.0])]
    rows += [("k2", T(i), float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [("k3", T(i), v) for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 1.0])]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["k"]: r for r in turning_points_test(df, "k", "ts", "v").collect()}
    assert out["k1"]["n_turning_points"] == 3 and out["k1"]["z"] == 1.328422
    assert out["k2"]["n_turning_points"] == 0 and out["k2"]["z"] == -2.656845
    assert out["k3"]["n"] == 3 and out["k3"]["n_collapsed"] == 2
    assert out["k3"]["n_turning_points"] == 1 and out["k3"]["expected"] == 0.666667


def test_effective_sample_size_oracle(spark, duck):
    """Kish ESS per source with text length as the weight; the
    micro-quantized exact moments replayed in SQL."""
    from osmapreduceproject_spark.operators.sampling import (
        effective_sample_size,
    )

    docs = _t(spark, "documents").select(
        "source", F.length("text").cast("double").alias("w")
    )
    got = effective_sample_size(docs, "source", "w")
    sql = """
    WITH base AS (
      SELECT source AS g,
             CASE WHEN len(text) IS NOT NULL AND len(text) > 0 THEN
               CAST(floor(CAST(len(text) AS DOUBLE) * 1000000 + 0.5)
                 AS HUGEINT)
             END AS q
      FROM documents WHERE source IS NOT NULL),
    per AS (SELECT g,
              SUM(CASE WHEN q IS NOT NULL THEN 1 ELSE 0 END) AS n,
              SUM(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS nx,
              COALESCE(SUM(q), 0) AS sw, COALESCE(SUM(q * q), 0) AS sw2,
              COALESCE(MAX(q), 0) AS mx
            FROM base GROUP BY g)
    SELECT g AS source, CAST(n AS BIGINT) AS n,
           CAST(nx AS BIGINT) AS n_excluded,
           CASE WHEN sw2 > 0 THEN
             floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                   / CAST(sw2 AS DOUBLE) * 1000000 + 0.5) / 1000000
           END AS ess,
           CASE WHEN sw2 > 0 THEN
             floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                   / CAST(sw2 AS DOUBLE) / n * 1000000 + 0.5) / 1000000
           END AS ess_ratio,
           CASE WHEN sw2 > 0 THEN
             floor(n * CAST(sw2 AS DOUBLE)
                   / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
           END AS deff,
           CASE WHEN sw2 > 0 THEN
             floor(CAST(mx AS DOUBLE) / CAST(sw AS DOUBLE) * 1000000 + 0.5)
               / 1000000
           END AS max_weight_share
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.ess <= pdf.n + 1e-9).all() and (pdf.deff >= 1.0 - 1e-9).all()


def test_effective_sample_size_known_cases(spark):
    """Pins: equal weights → ESS = n, deff = 1; weights 3:1 → ESS 1.6,
    deff 1.25, max share 0.75; non-positive weights exclude."""
    from osmapreduceproject_spark.operators.sampling import (
        effective_sample_size,
    )

    w = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0),
         ("b", 3.0), ("b", 1.0), ("c", -1.0), ("c", 2.0)],
        "g string, w double",
    )
    out = {r["g"]: r for r in effective_sample_size(w, "g", "w").collect()}
    assert out["a"]["ess"] == 4.0 and out["a"]["deff"] == 1.0
    assert out["a"]["max_weight_share"] == 0.25
    assert out["b"]["ess"] == 1.6 and out["b"]["deff"] == 1.25
    assert out["b"]["max_weight_share"] == 0.75
    assert out["c"]["n"] == 1 and out["c"]["n_excluded"] == 1


def test_hubness_report_oracle(spark, duck):
    """k-occurrence distribution over the exact brute top-3 graph on
    the vec_id ≡ 0 (mod 5) sub-corpus (the q297 operating-point
    convention); the in-degree moments, mean+2σ hub threshold, and
    antihub census replayed in SQL."""
    from osmapreduceproject_spark.operators.similarity import hubness_report
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    emb = _t(spark, "embeddings").where(F.col("vec_id") % 5 == 0)
    got = hubness_report(emb, k=3)
    dot = (
        "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) "
        "* CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )
    d_qc = dot.format(a="q.embedding", b="c.embedding")
    d_qq = dot.format(a="q.embedding", b="q.embedding")
    d_cc = dot.format(a="c.embedding", b="c.embedding")
    sql = f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id % 5 = 0),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round({d_qc} / (sqrt({d_qq}) * sqrt({d_cc})), 6) AS sim
      FROM sub q JOIN sub c ON c.vec_id <> q.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, nid ASC) AS rn
      FROM scored),
    e AS (SELECT qid, nid FROM ranked WHERE rn <= 3),
    indeg AS (SELECT sub.vec_id,
                COALESCE(d.c, 0) AS d
              FROM sub LEFT JOIN
                (SELECT nid, COUNT(*) AS c FROM e GROUP BY nid) d
                ON d.nid = sub.vec_id),
    mom AS (SELECT COUNT(*) AS n, COALESCE(SUM(CAST(d AS HUGEINT)), 0) AS s1,
              COALESCE(SUM(CAST(d AS HUGEINT) * d), 0) AS s2,
              COALESCE(SUM(CAST(d AS HUGEINT) * d * d), 0) AS s3
            FROM indeg),
    fin0 AS (SELECT n, s1, s2, s3,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m2
             FROM mom),
    thr AS (SELECT *,
              CASE WHEN m2 > 0 THEN mean + 2.0 * sqrt(m2) END AS t
            FROM fin0),
    cls AS (SELECT
              SUM(CASE WHEN t IS NOT NULL AND d > t THEN 1 ELSE 0 END) AS nh,
              COALESCE(SUM(CASE WHEN t IS NOT NULL AND d > t
                  THEN CAST(d AS HUGEINT) ELSE 0 END), 0) AS he,
              SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS na
            FROM indeg, thr),
    fin AS (SELECT thr.*, cls.nh, cls.he, cls.na,
              CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                - 3.0 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                + 2.0 * mean * mean * mean AS m3
            FROM thr, cls)
    SELECT CAST(n AS BIGINT) AS n_nodes, CAST(3 AS INTEGER) AS k,
           CAST(s1 AS BIGINT) AS n_edges,
           CASE WHEN n > 0 THEN floor(mean * 1000000 + 0.5) / 1000000 END
             AS mean_in_degree,
           CASE WHEN n > 0 AND m2 > 0 AND s1 > 0 THEN
             floor(sqrt(m2) / mean * 1000000 + 0.5) / 1000000
           END AS indeg_cv,
           CASE WHEN n > 0 AND m2 > 0 THEN
             CASE WHEN m3 / sqrt(m2 * m2 * m2) >= 0
               THEN floor(m3 / sqrt(m2 * m2 * m2) * 1000000 + 0.5)
               ELSE -floor(-(m3 / sqrt(m2 * m2 * m2)) * 1000000 + 0.5)
             END / 1000000
           END AS indeg_skewness,
           CAST(COALESCE(nh, 0) AS BIGINT) AS n_hubs,
           CASE WHEN n > 0 AND s1 > 0 THEN
             floor(CAST(he AS DOUBLE) / CAST(s1 AS DOUBLE) * 1000000 + 0.5)
               / 1000000
           END AS hub_edge_share,
           CAST(COALESCE(na, 0) AS BIGINT) AS n_antihubs,
           CASE WHEN n > 0 THEN
             floor(CAST(na AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5)
               / 1000000
           END AS antihub_frac
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["n_edges"] == 3 * r["n_nodes"]
    release_intermediates()


def test_hubness_known_cases(spark):
    """Pins: a hand edge list with one popular node → skew 0.816497,
    2 antihubs; a uniform 1-regular ring → zero variance (NULL
    cv/skew), no hubs, no antihubs."""
    from osmapreduceproject_spark.operators.similarity import hubness_report
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    corpus = spark.createDataFrame(
        [(i, [0.0]) for i in range(1, 5)], "vec_id long, embedding array<double>"
    )
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.8), (3, 1, 0.7), (4, 1, 0.6)],
        "query_id long, neighbor_id long, sim double",
    )
    r = hubness_report(corpus, k=1, edges=edges).first()
    assert r["mean_in_degree"] == 1.0 and r["indeg_cv"] == 1.224745
    assert r["indeg_skewness"] == 0.816497
    assert r["n_hubs"] == 0 and r["n_antihubs"] == 2
    assert r["antihub_frac"] == 0.5
    ring = spark.createDataFrame(
        [(i, (i % 4) + 1, 0.5) for i in range(1, 5)],
        "query_id long, neighbor_id long, sim double",
    )
    rr = hubness_report(corpus, k=1, edges=ring).first()
    assert rr["indeg_cv"] is None and rr["indeg_skewness"] is None
    assert rr["n_hubs"] == 0 and rr["n_antihubs"] == 0
    assert rr["mean_in_degree"] == 1.0
    release_intermediates()


def test_sample_entropy_oracle(spark, duck):
    """SampEn(m=2, r=0.2σ) per user over (epoch µs, value)-ordered
    event values; the template self-join match counts and the exact
    integer σ moments replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import sample_entropy

    got = sample_entropy(_t(spark, "events"), "user_id", "ts", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS k, epoch_us(ts) AS e,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS q,
             CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND NOT isnan(CAST(value AS DOUBLE))),
    seq AS (SELECT k, q,
              ROW_NUMBER() OVER (PARTITION BY k ORDER BY e, v) AS rn,
              COUNT(*) OVER (PARTITION BY k) AS n
            FROM pool),
    mom AS (SELECT k, MAX(n) AS n, SUM(CAST(q AS HUGEINT)) AS s1,
                   SUM(CAST(q AS HUGEINT) * q) AS s2
            FROM seq GROUP BY k),
    tol AS (SELECT k, n,
              0.2 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n) AS r
            FROM mom WHERE n >= 4),
    tmpl AS (SELECT seq.k, rn, q,
               LEAD(q, 1) OVER (PARTITION BY seq.k ORDER BY rn) AS q1,
               LEAD(q, 2) OVER (PARTITION BY seq.k ORDER BY rn) AS q2,
               n
             FROM seq),
    t AS (SELECT * FROM tmpl WHERE rn <= n - 2),
    pairs AS (SELECT a.k,
                CASE WHEN abs(a.q - b.q) <= tol.r
                     AND abs(a.q1 - b.q1) <= tol.r THEN 1 ELSE 0 END AS mb,
                CASE WHEN abs(a.q - b.q) <= tol.r
                     AND abs(a.q1 - b.q1) <= tol.r
                     AND abs(a.q2 - b.q2) <= tol.r THEN 1 ELSE 0 END AS ma
              FROM t a JOIN t b ON a.k = b.k AND a.rn < b.rn
              JOIN tol ON tol.k = a.k),
    cnt AS (SELECT k, SUM(mb) AS b, SUM(ma) AS a FROM pairs GROUP BY k),
    small AS (SELECT k, n FROM mom WHERE n < 4)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n,
           CAST(GREATEST(0, n - 2) AS BIGINT) AS n_templates,
           CAST(NULL AS DOUBLE) AS r_tol, CAST(0 AS BIGINT) AS n_matches_m,
           CAST(0 AS BIGINT) AS n_matches_m1,
           CAST(NULL AS DOUBLE) AS sample_entropy
    FROM small
    UNION ALL
    SELECT tol.k AS user_id, CAST(tol.n AS BIGINT) AS n,
           CAST(tol.n - 2 AS BIGINT) AS n_templates,
           floor(tol.r / 1000000 * 1000000 + 0.5) / 1000000 AS r_tol,
           CAST(COALESCE(cnt.b, 0) AS BIGINT) AS n_matches_m,
           CAST(COALESCE(cnt.a, 0) AS BIGINT) AS n_matches_m1,
           CASE WHEN COALESCE(cnt.a, 0) > 0 AND COALESCE(cnt.b, 0) > 0 THEN
             CASE WHEN ln(CAST(cnt.b AS DOUBLE) / CAST(cnt.a AS DOUBLE)) >= 0
               THEN floor(ln(CAST(cnt.b AS DOUBLE) / CAST(cnt.a AS DOUBLE))
                          * 1000000 + 0.5)
               ELSE -floor(-ln(CAST(cnt.b AS DOUBLE) / CAST(cnt.a AS DOUBLE))
                           * 1000000 + 0.5)
             END / 1000000
           END AS sample_entropy
    FROM tol LEFT JOIN cnt ON cnt.k = tol.k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_matches_m1 <= pdf.n_matches_m).all()


def test_sample_entropy_known_cases(spark):
    """Pins: a constant series matches everywhere → SampEn 0; a pure
    alternation is perfectly predictable → 0; a planted surprise
    ([1,2,1,2,1,9]) → ln(2/1) = 0.693147 with r = 0.573488; n < 4 →
    NULL."""
    import datetime as dt

    from osmapreduceproject_spark.operators.windows import sample_entropy

    T = lambda i: dt.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    rows = [("c", T(i), 5.0) for i in range(6)]
    rows += [("alt", T(i), float(i % 2)) for i in range(6)]
    rows += [("h", T(i), v) for i, v in enumerate(
        [1.0, 2.0, 1.0, 2.0, 1.0, 9.0])]
    rows += [("tiny", T(i), float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["k"]: r for r in sample_entropy(df, "k", "ts", "v").collect()}
    assert out["c"]["n_matches_m"] == 6 and out["c"]["sample_entropy"] == 0.0
    assert out["alt"]["n_matches_m"] == 2 and out["alt"]["sample_entropy"] == 0.0
    assert out["h"]["n_matches_m"] == 2 and out["h"]["n_matches_m1"] == 1
    assert out["h"]["sample_entropy"] == 0.693147
    assert out["h"]["r_tol"] == 0.573488
    assert out["tiny"]["sample_entropy"] is None


def test_audio_spectral_flatness_oracle(spark, duck):
    """Wiener flatness over the arithmetic PCM fixture's 256-sample
    head at bins 1..32; the quantized-trig DFT, HUGEINT powers, and
    the pinned flatness finalize replayed in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio,
        audio_spectral_flatness,
    )

    clips = arith_raw_audio(spark, n=16, n_samples=2048)
    got = audio_spectral_flatness(clips)
    sql = """
    WITH t AS (SELECT unnest(range(16)) AS m),
    s AS (SELECT m, unnest(range(256)) AS i FROM t),
    v AS (SELECT m, i,
            CAST((17*m + 11*i + (i*i) % 89) % 256 AS DOUBLE) AS val
          FROM s),
    mu AS (SELECT m, SUM(val) / 256 AS mean FROM v GROUP BY m),
    c AS (SELECT v.m, v.i, v.val - mu.mean AS vc
          FROM v JOIN mu ON mu.m = v.m),
    terms AS (SELECT m, b, i,
        vc * cos(6.283185307179586 * ((b * i) % 256) / 256) AS tc,
        vc * sin(6.283185307179586 * ((b * i) % 256) / 256) AS ts
      FROM c, (SELECT unnest(range(1, 33)) AS b)),
    q AS (SELECT m, b,
        SUM(CASE WHEN tc >= 0
            THEN CAST(floor(tc * 1000000 + 0.5) AS HUGEINT)
            ELSE -CAST(floor(-tc * 1000000 + 0.5) AS HUGEINT) END) AS aq,
        SUM(CASE WHEN ts >= 0
            THEN CAST(floor(ts * 1000000 + 0.5) AS HUGEINT)
            ELSE -CAST(floor(-ts * 1000000 + 0.5) AS HUGEINT) END) AS bq
      FROM terms GROUP BY m, b),
    pw AS (SELECT m, b, aq * aq + bq * bq AS p FROM q),
    agg AS (SELECT m, SUM(p) AS sp, COUNT(*) AS nb,
              SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS z,
              COALESCE(SUM(CASE WHEN p > 0 THEN
                CASE WHEN ln(CAST(p AS DOUBLE)) >= 0
                  THEN CAST(floor(ln(CAST(p AS DOUBLE)) * 1000000 + 0.5)
                    AS HUGEINT)
                  ELSE -CAST(floor(-ln(CAST(p AS DOUBLE)) * 1000000 + 0.5)
                    AS HUGEINT) END ELSE 0 END), 0) AS qs
            FROM pw GROUP BY m),
    dom AS (SELECT m, b AS dominant_bin, p AS mx FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY m
                ORDER BY p DESC, b ASC) AS rn FROM pw) WHERE rn = 1)
    SELECT CAST(agg.m AS BIGINT) AS media_id,
           CAST(2048 AS BIGINT) AS n_samples,
           CAST(32 AS INTEGER) AS n_bins_used,
           CASE WHEN sp = 0 THEN NULL
                WHEN z > 0 THEN 0.0
                ELSE floor(exp(CAST(qs AS DOUBLE) / nb / 1000000)
                       / (CAST(sp AS DOUBLE) / nb) * 1000000 + 0.5) / 1000000
           END AS spectral_flatness,
           CASE WHEN sp > 0 THEN CAST(dom.dominant_bin AS INTEGER) END
             AS dominant_bin,
           CASE WHEN sp > 0 THEN
             floor(CAST(dom.mx AS DOUBLE) / CAST(sp AS DOUBLE)
                   * 1000000 + 0.5) / 1000000
           END AS dominant_share
    FROM agg JOIN dom ON dom.m = agg.m
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.spectral_flatness.between(0, 1).all()


def test_audio_spectral_flatness_known_cases(spark):
    """Pins: a pure integer-bin cosine is tonal (dominant bin 2,
    share ≈ 1, flatness pinned to 0 by the zero-leakage-bin
    convention); a constant clip has zero spectrum → NULLs; a
    sub-2-sample clip → NULL row."""
    from osmapreduceproject_spark.operators.multimodal import (
        audio_spectral_flatness,
    )
    import math

    meta = "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    tone = bytes(
        128 + round(100 * math.cos(2 * math.pi * 2 * i / 64))
        for i in range(64)
    )
    aud = spark.createDataFrame(
        [(0, "audio", tone, (None, None, 16000, None)),
         (1, "audio", bytes([128] * 64), (None, None, 16000, None)),
         (2, "audio", bytes([7]), (None, None, 16000, None))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    out = {r["media_id"]: r
           for r in audio_spectral_flatness(aud, n_head=64, n_bins=8).collect()}
    assert out[0]["dominant_bin"] == 2 and out[0]["dominant_share"] > 0.999
    assert out[0]["spectral_flatness"] == 0.0
    assert out[1]["spectral_flatness"] is None
    assert out[1]["dominant_bin"] is None
    assert out[2]["n_bins_used"] == 0
    assert out[2]["spectral_flatness"] is None


# ---------------------------------------------------------------------------
# gated scale smokes (SPARK_GRAFT_SCALE=1)
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402

import pytest as _pytest  # noqa: E402


@_pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 "
    "(1,000 keys × 500 rows through sample_entropy)",
)
def test_sample_entropy_scale_smoke(spark):
    """1,000 keys × 500 observations (~124k template pairs per key,
    ~124M Chebyshev comparisons total) through the Arrow pair pass
    with max_rows raised to the intended volume: every key reports,
    the planted pure trend is maximally regular (every template
    matches its shifted twins), and the quadratic work stays inside
    per-key groups."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.windows import sample_entropy

    n_keys, n_obs = 1_000, 500
    df = spark.range(n_keys * n_obs).select(
        (F.col("id") / n_obs).cast("bigint").alias("k"),
        F.timestamp_micros(
            (F.col("id") % n_obs) * F.lit(1_000_000)
        ).alias("ts"),
        (F.col("id") % n_obs).cast("double").alias("v"),
    )
    out = sample_entropy(df, "k", "ts", "v", max_rows=n_obs)
    pdf = out.toPandas()
    assert len(pdf) == n_keys
    assert (pdf.n_templates == n_obs - 2).all()
    # a pure ramp: every pair of templates differs by a constant shift
    # > r in the first coordinate except none — matches come only from
    # the tolerance band r = 0.2σ, which at σ≈144 covers lag ≤ 28:
    # entropy is defined and finite for every key
    assert (pdf.n_matches_m >= pdf.n_matches_m1).all()
    assert pdf.sample_entropy.notna().all()
