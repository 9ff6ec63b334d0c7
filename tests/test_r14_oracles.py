"""Cross-engine (DuckDB) parity for the r13-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, seventh tranche after r8–r13; the file number continues
the test-file series, the DECLARATION round is r13). Every operator
lands with its oracle parity test in the same commit, so the future
q-entry is a copy-paste of (body, SQL) pairs already green. Same
driver-identical compare at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


def _t(spark, name):
    from osmapreduceproject_spark.queries import _t as t

    return t(spark, SF_CORRECT, name)


def test_mann_whitney_u_oracle(spark, duck):
    """Rank-sum over the click/purchase value pools: doubled midranks,
    exact tie term, one fixed-order finalize replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import mann_whitney_u

    got = mann_whitney_u(_t(spark, "events"), "event_type", "value",
                         "click", "purchase")
    sql = """
    WITH pool AS (
      SELECT event_type = 'click' AS is_a, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND event_type IN ('click', 'purchase')),
    pv AS (SELECT v, COUNT(*) AS cn FROM pool GROUP BY v),
    r2 AS (SELECT v, 2*(SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
           FROM pv),
    per AS (SELECT p.is_a, COUNT(*) AS n, SUM(CAST(r2.r2 AS HUGEINT)) AS s2
            FROM pool p JOIN r2 ON r2.v = p.v GROUP BY 1),
    ties AS (SELECT COALESCE(SUM(CAST(cn AS HUGEINT)*cn*cn - cn), 0) AS t
             FROM pv),
    f AS (SELECT
            (SELECT n FROM per WHERE is_a) AS na,
            (SELECT n FROM per WHERE NOT is_a) AS nb,
            (SELECT s2 FROM per WHERE is_a) AS s2a,
            (SELECT t FROM ties) AS t),
    e AS (SELECT na, nb, na + nb AS n,
                 (CAST(s2a - na*(na+1) AS DOUBLE)) / 2.0 AS u,
                 na*nb / 2.0 AS mu,
                 na*nb * ((na + nb + 1.0)
                          - CAST(t AS DOUBLE)
                            / ((na + nb) * (na + nb - 1.0))) / 12.0 AS var
          FROM f)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(u, 6) AS u_stat, round(mu, 6) AS mean_u,
           round(var, 6) AS var_u,
           CASE WHEN var > 0 THEN round((u - mu) / sqrt(var), 6) END AS z
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert 0 <= row["u_stat"] <= row["n_a"] * row["n_b"]


def test_mann_whitney_known_cases(spark):
    """Pins: a fully separated 3-vs-3 has U = 0 and z ≈ −1.963961; an
    all-tied pool has zero variance → NULL z."""
    from osmapreduceproject_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").first()
    assert r["u_stat"] == 0.0 and r["mean_u"] == 4.5 and r["var_u"] == 5.25
    assert r["z"] == round((0.0 - 4.5) / 5.25 ** 0.5, 6)
    tied = spark.createDataFrame(
        [("a", 7.0)] * 3 + [("b", 7.0)] * 3, "g string, v double"
    )
    rt = mann_whitney_u(tied, "g", "v", "a", "b").first()
    assert rt["z"] is None and rt["u_stat"] == 4.5  # midranks: U = n_a·n_b/2


def test_friedman_oracle(spark, duck):
    """Within-block (user) ranks of per-event-type mean values; exact
    integer Q until one division, complete blocks only."""
    from osmapreduceproject_spark.operators.stats import friedman_test

    got = friedman_test(_t(spark, "events"), "user_id", "event_type", "value")
    sql = """
    WITH pool AS (
      SELECT user_id AS b, event_type AS t,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS vq
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    cell AS (SELECT b, t, SUM(vq) AS s, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    kk AS (SELECT COUNT(DISTINCT t) AS k FROM cell),
    sizes AS (SELECT b, COUNT(*) AS kt FROM cell GROUP BY b),
    complete AS (SELECT b FROM sizes, kk WHERE kt = kk.k),
    cc AS (SELECT cell.* FROM cell JOIN complete USING (b)),
    cmp AS (SELECT a.b, a.t AS ta,
              SUM(CASE WHEN bb.s * a.c < a.s * bb.c THEN 1 ELSE 0 END) AS less,
              SUM(CASE WHEN bb.s * a.c = a.s * bb.c THEN 1 ELSE 0 END) AS eq
            FROM cc a JOIN cc bb ON a.b = bb.b GROUP BY 1, 2),
    ranks AS (SELECT b, ta, 2*less + eq + 1 AS r2 FROM cmp),
    pert AS (SELECT ta, SUM(CAST(r2 AS HUGEINT)) AS rsum FROM ranks GROUP BY ta),
    tot AS (SELECT SUM(CAST(r2 AS HUGEINT) * r2) AS rr FROM ranks),
    nb AS (SELECT COUNT(*) AS n FROM complete),
    nt AS (SELECT COUNT(*) AS ntot FROM sizes),
    num AS (SELECT SUM(rsum * rsum) AS sr2 FROM pert),
    e AS (SELECT nb.n, nt.ntot, kk.k,
                 sr2 - CAST(nb.n AS HUGEINT) * nb.n * kk.k * (kk.k+1) * (kk.k+1)
                   AS numv,
                 rr - CAST(nb.n AS HUGEINT) * kk.k * (kk.k+1) * (kk.k+1) AS denv
          FROM nb, nt, kk, num, tot)
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(ntot - n AS BIGINT) AS n_blocks_dropped,
           CAST(k AS BIGINT) AS k_treatments,
           CAST(greatest(k - 1, 0) AS BIGINT) AS dof,
           CASE WHEN k >= 2 AND n >= 1 AND denv > 0 THEN
             round((k - 1) * CAST(numv AS DOUBLE) / CAST(denv AS DOUBLE), 6)
           END AS q_stat
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n_blocks"] >= 1 and row["q_stat"] is not None
    assert row["q_stat"] >= 0.0


def test_friedman_known_cases(spark):
    """Pins: 3 blocks × 3 treatments in a consistent order → Q = 6
    (the textbook perfect-ordering value); an incomplete block drops."""
    from osmapreduceproject_spark.operators.stats import friedman_test

    rows = []
    for b in range(3):
        rows += [(b, "t1", 1.0 + b), (b, "t2", 2.0 + b), (b, "t3", 3.0 + b)]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").first()
    assert r["q_stat"] == 6.0 and r["n_blocks"] == 3 and r["dof"] == 2
    rows.append((9, "t1", 5.0))  # block 9 misses t2/t3 → dropped
    df2 = spark.createDataFrame(rows, "b int, t string, v double")
    r2 = friedman_test(df2, "b", "t", "v").first()
    assert r2["n_blocks"] == 3 and r2["n_blocks_dropped"] == 1
    assert r2["q_stat"] == 6.0
    tied = spark.createDataFrame(
        [(b, t, 1.0) for b in range(3) for t in ("x", "y")],
        "b int, t string, v double",
    )
    rt = friedman_test(tied, "b", "t", "v").first()
    assert rt["q_stat"] is None  # all tied → zero denominator


def test_benjamini_hochberg_oracle(spark, duck):
    """Step-up selection over a derived p-like column (fractional part
    of |value|), micro-unit integer criterion replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import benjamini_hochberg

    ev = _t(spark, "events")
    scored = ev.select(
        (F.abs(F.col("value")) - F.floor(F.abs(F.col("value")))).alias("p")
    )
    got = benjamini_hochberg(scored, "p", alpha=0.05)
    sql = """
    WITH base AS (
      SELECT abs(CAST(value AS DOUBLE)) - floor(abs(CAST(value AS DOUBLE))) AS p
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    pool AS (SELECT CAST(round(p * 1000000) AS BIGINT) AS pq FROM base
             WHERE p >= 0 AND p <= 1),
    inv AS (SELECT COUNT(*) AS ninv FROM base WHERE p < 0 OR p > 1),
    pv AS (SELECT pq, COUNT(*) AS cn FROM pool GROUP BY pq),
    cum AS (SELECT pq, SUM(cn) OVER (ORDER BY pq) AS c FROM pv),
    m AS (SELECT COALESCE(SUM(cn), 0) AS m FROM pv),
    sel AS (SELECT MAX(CASE WHEN pq * m.m <= c * 50000 THEN pq END) AS thr,
                   COALESCE(MAX(CASE WHEN pq * m.m <= c * 50000 THEN c END), 0)
                     AS nrej
            FROM cum, m)
    SELECT CAST(m.m AS BIGINT) AS m, CAST(inv.ninv AS BIGINT) AS n_invalid,
           CAST(0.05 AS DOUBLE) AS alpha,
           CAST(sel.nrej AS BIGINT) AS n_rejected,
           CAST(sel.thr AS DOUBLE) / 1000000 AS p_threshold
    FROM m, inv, sel
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n_rejected"] <= row["m"]
    if row["p_threshold"] is not None:
        assert 0.0 <= row["p_threshold"] <= 0.05


def test_benjamini_hochberg_known_cases(spark):
    """Pins: [.01, .02, .2, .8] at α=.05 rejects exactly the first two
    (threshold .02); all-large p rejects nothing (NULL threshold);
    out-of-range values are counted, not fatal."""
    from osmapreduceproject_spark.operators.stats import benjamini_hochberg

    df = spark.createDataFrame(
        [(0.01,), (0.02,), (0.2,), (0.8,)], "p double"
    )
    r = benjamini_hochberg(df, "p", alpha=0.05).first()
    assert r["n_rejected"] == 2 and r["p_threshold"] == 0.02 and r["m"] == 4
    none = spark.createDataFrame([(0.9,), (0.95,)], "p double")
    rn = benjamini_hochberg(none, "p", alpha=0.05).first()
    assert rn["n_rejected"] == 0 and rn["p_threshold"] is None
    bad = spark.createDataFrame([(0.01,), (1.5,), (-0.2,)], "p double")
    rb = benjamini_hochberg(bad, "p", alpha=0.05).first()
    assert rb["m"] == 1 and rb["n_invalid"] == 2 and rb["n_rejected"] == 1


def test_hellinger_matrix_oracle(spark, duck):
    """Pairwise source drift over the n_chars histogram; micro-quantized
    Bhattacharyya terms, pair universe from the group totals."""
    from osmapreduceproject_spark.operators.stats import hellinger_matrix

    got = hellinger_matrix(
        _t(spark, "documents"), "source", "n_chars",
        lo=0.0, width=100.0, n_buckets=30,
    )
    sql = """
    WITH pool AS (
      SELECT source AS g,
             LEAST(CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) / 100.0)
                        AS INTEGER), 29) AS bk
      FROM documents
      WHERE n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))),
    hist AS (SELECT g, bk, COUNT(*) AS c FROM pool GROUP BY 1, 2),
    tot AS (SELECT g, SUM(c) AS n FROM hist GROUP BY g),
    bc AS (SELECT a.g AS ga, b.g AS gb,
             SUM(CAST(round(sqrt(CAST(a.c * b.c AS DOUBLE)
                                 / CAST(ta.n * tb.n AS DOUBLE)) * 1000000)
                      AS BIGINT)) AS bcq
           FROM hist a JOIN hist b ON a.bk = b.bk AND a.g < b.g
           JOIN tot ta ON ta.g = a.g JOIN tot tb ON tb.g = b.g
           GROUP BY 1, 2),
    pairs AS (SELECT ta.g AS ga, tb.g AS gb, ta.n AS na, tb.n AS nb
              FROM tot ta, tot tb WHERE ta.g < tb.g)
    SELECT ga AS group_a, gb AS group_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(COALESCE(bcq, 0) / 1000000.0, 6) AS bhattacharyya,
           round(sqrt(1.0 - LEAST(COALESCE(bcq, 0) / 1000000.0, 1.0)), 6)
             AS hellinger
    FROM pairs LEFT JOIN bc USING (ga, gb)
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert len(pdf) == 20 * 19 // 2  # every unordered source pair
    assert ((pdf.hellinger >= 0) & (pdf.hellinger <= 1)).all()


def test_hellinger_known_cases(spark):
    """Pins: identical histograms → BC 1, H 0; disjoint supports →
    BC 0, H 1 (the pair still reports — from the group universe)."""
    from osmapreduceproject_spark.operators.stats import hellinger_matrix

    same = spark.createDataFrame(
        [("a", 1.0), ("a", 11.0), ("b", 1.0), ("b", 11.0)], "g string, v double"
    )
    r = hellinger_matrix(same, "g", "v", lo=0.0, width=10.0, n_buckets=4).first()
    assert r["bhattacharyya"] == 1.0 and r["hellinger"] == 0.0
    disj = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 21.0), ("b", 25.0)], "g string, v double"
    )
    rd = hellinger_matrix(disj, "g", "v", lo=0.0, width=10.0, n_buckets=4).first()
    assert rd["bhattacharyya"] == 0.0 and rd["hellinger"] == 1.0


import datetime  # noqa: E402

_XC_STEP = 3600
_XC_US = _XC_STEP * 1_000_000


def _xc_rs(alias: str, etype: str) -> str:
    return f"""
    obs_{alias} AS (SELECT user_id AS k, epoch_us(ts) AS e,
                           CAST(value AS DOUBLE) AS v
                    FROM events WHERE event_type = '{etype}'),
    spans_{alias} AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi
                      FROM obs_{alias} GROUP BY k),
    grid_{alias} AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / {_XC_US}.0) * {_XC_US} AS BIGINT),
        CAST(floor(hi / {_XC_US}.0) * {_XC_US} AS BIGINT) + 1,
        {_XC_US})) AS e
      FROM spans_{alias}),
    rs_{alias} AS (
      SELECT g.k, g.e // 1000000 AS slot_epoch, o.v AS value
      FROM grid_{alias} g ASOF JOIN obs_{alias} o
      ON g.k = o.k AND o.e <= g.e)"""


def test_lagged_crosscorr_oracle(spark, duck):
    """Click series vs purchase series per user at lags −3..+3 — two
    resample passes, one window, quantized moments replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import lagged_crosscorr

    got = lagged_crosscorr(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        split_col="event_type", split_a="click", split_b="purchase",
        step_seconds=_XC_STEP, max_lag=3,
    )
    sql = f"""
    WITH {_xc_rs('a', 'click')},
    {_xc_rs('b', 'purchase')},
    j AS (SELECT a.k, a.slot_epoch, a.value AS va, b.value AS vb
          FROM rs_a a JOIN rs_b b
          ON a.k = b.k AND a.slot_epoch = b.slot_epoch),
    l AS (SELECT k, slot_epoch, va, vb,
            lead(vb, 1) OVER w AS f1, lead(vb, 2) OVER w AS f2,
            lead(vb, 3) OVER w AS f3,
            lag(vb, 1) OVER w AS p1, lag(vb, 2) OVER w AS p2,
            lag(vb, 3) OVER w AS p3
          FROM j WINDOW w AS (PARTITION BY k ORDER BY slot_epoch)),
    st AS (SELECT k, lg.lag AS lag, va AS v,
             CASE lg.lag WHEN -3 THEN p3 WHEN -2 THEN p2 WHEN -1 THEN p1
                         WHEN 0 THEN vb
                         WHEN 1 THEN f1 WHEN 2 THEN f2 ELSE f3 END AS u
           FROM l, (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag) lg
           WHERE va IS NOT NULL
             AND CASE lg.lag WHEN -3 THEN p3 WHEN -2 THEN p2 WHEN -1 THEN p1
                             WHEN 0 THEN vb
                             WHEN 1 THEN f1 WHEN 2 THEN f2 ELSE f3 END
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
            FROM s)
    SELECT k AS user_id, CAST(lag AS INTEGER) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / sqrt(vx * vy), 6)
           END AS xcorr
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert set(pdf.lag.unique()) <= set(range(-3, 4))
    ok = pdf.dropna(subset=["xcorr"])
    assert ((ok.xcorr >= -1.0 - 1e-9) & (ok.xcorr <= 1.0 + 1e-9)).all()


def test_lagged_crosscorr_known_case(spark):
    """Pin: B is A shifted 2 slots later → xcorr = 1 exactly at lag +2
    (and the sign convention is 'positive lag = B lags A')."""
    from osmapreduceproject_spark.operators.windows import lagged_crosscorr

    base = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(24):
        v = float((i * 7) % 11)
        rows.append((1, "a", base + datetime.timedelta(hours=i), v))
        rows.append((1, "b", base + datetime.timedelta(hours=i + 2), v))
    df = spark.createDataFrame(rows, "k bigint, s string, ts timestamp, v double")
    out = {r["lag"]: r for r in lagged_crosscorr(
        df, "k", "ts", "v", "s", "a", "b", 3600, max_lag=3
    ).collect()}
    assert out[2]["xcorr"] == 1.0
    # joined grid = hours 2..23 (22 slots); lead(2) drops the last two
    assert out[2]["n_pairs"] == 20
    assert out[0]["xcorr"] is None or out[0]["xcorr"] < 1.0


def test_lagged_crosscorr_null_slots(spark):
    """Review pin (r12): leading NULL A-side observations leave
    NULL-valued slots on the joined grid — those pairs DROP from
    n_pairs and the moments (pre-fix they inflated n_pairs while the
    x-sums skipped them, the ADVICE-r11 phantom-observation class)."""
    from osmapreduceproject_spark.operators.windows import lagged_crosscorr

    base = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(4):
        rows.append((1, "a", base + datetime.timedelta(hours=i), None))
    for i in range(4, 24):
        rows.append((1, "a", base + datetime.timedelta(hours=i), float((i * 7) % 11)))
    for i in range(24):
        rows.append((1, "b", base + datetime.timedelta(hours=i), float((i * 7) % 11)))
    df = spark.createDataFrame(rows, "k bigint, s string, ts timestamp, v double")
    out = {r["lag"]: r for r in lagged_crosscorr(
        df, "k", "ts", "v", "s", "a", "b", 3600, max_lag=3
    ).collect()}
    # joined grid = 24 slots, first 4 A-values NULL -> 20 usable lag-0 pairs
    assert out[0]["n_pairs"] == 20 and out[0]["xcorr"] == 1.0


def test_token_burstiness_oracle(spark, duck):
    """Per-token within-doc repetition rates over the corpus; exact
    integer counts, min_df cut, ratios as single divisions."""
    from osmapreduceproject_spark.operators.text import token_burstiness

    got = token_burstiness(_t(spark, "documents"), min_df=5)
    sql = """
    WITH pairs AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    pc AS (SELECT doc_id, token, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    a AS (SELECT token, COUNT(*) AS n_docs,
                 SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS n_docs_multi,
                 SUM(c) AS total_count
          FROM pc GROUP BY token)
    SELECT token, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs_multi AS BIGINT) AS n_docs_multi,
           CAST(total_count AS BIGINT) AS total_count,
           round(CAST(n_docs_multi AS DOUBLE) / n_docs, 6) AS burstiness,
           round(CAST(total_count AS DOUBLE) / n_docs, 6) AS mean_count_per_doc
    FROM a WHERE n_docs >= 5
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert ((pdf.burstiness >= 0) & (pdf.burstiness <= 1)).all()
    assert (pdf.mean_count_per_doc >= 1).all()


def test_token_burstiness_known_case(spark):
    """Pin: a token in 5 docs, twice in 2 of them → burstiness 0.4,
    mean 7/5; a 4-doc token is cut at min_df=5."""
    from osmapreduceproject_spark.operators.text import token_burstiness

    rows = [(i, "hot hot filler" if i < 2 else "hot filler") for i in range(5)]
    rows += [(10 + i, "rare") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["token"]: r for r in token_burstiness(df, min_df=5).collect()}
    assert "rare" not in out
    assert out["hot"]["n_docs"] == 5 and out["hot"]["n_docs_multi"] == 2
    assert out["hot"]["burstiness"] == 0.4
    assert out["hot"]["mean_count_per_doc"] == 1.4
    assert out["filler"]["burstiness"] == 0.0


def test_heaps_law_fit_oracle(spark, duck):
    """OLS over micro-quantized per-source (ln N, ln V) points, exact
    DECIMAL moments replayed in SQL."""
    from osmapreduceproject_spark.operators.text import heaps_law_fit

    got = heaps_law_fit(_t(spark, "documents"))
    sql = """
    WITH toks AS (
      SELECT source AS g, unnest(string_split(text, ' ')) AS t
      FROM documents),
    per AS (SELECT g, COUNT(*) AS n, COUNT(DISTINCT t) AS v
            FROM toks GROUP BY g HAVING COUNT(*) > 0),
    pts AS (SELECT CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
                   CAST(round(ln(CAST(v AS DOUBLE)) * 1000000) AS HUGEINT) AS y
            FROM per),
    mom AS (SELECT COUNT(*) AS ng, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
            FROM pts),
    e AS (SELECT ng,
                 ng * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS vx,
                 ng * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS vy,
                 ng * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cov,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
          FROM mom)
    SELECT CAST(ng AS BIGINT) AS n_groups,
           CASE WHEN ng >= 2 AND vx > 0 THEN round(cov / vx, 6) END AS heaps_beta,
           CASE WHEN ng >= 2 AND vx > 0 THEN
             round((syd - cov / vx * sxd) / ng / 1000000.0, 6)
           END AS heaps_log_c,
           CASE WHEN ng >= 2 AND vx > 0 AND vy > 0 THEN
             round(cov * cov / (vx * vy), 6)
           END AS r2
    FROM e
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n_groups"] == 20
    if row["r2"] is not None:
        assert 0.0 <= row["r2"] <= 1.0 + 1e-9


def test_heaps_law_known_cases(spark):
    """Pins: equal-size groups have zero x-variance → NULL fit; a
    perfect power law recovers its exponent."""
    from osmapreduceproject_spark.operators.text import heaps_law_fit

    same = spark.createDataFrame(
        [("a", "x y z"), ("b", "p q r")], "source string, text string"
    )
    r = heaps_law_fit(same).first()
    assert r["heaps_beta"] is None and r["n_groups"] == 2
    # V = N: ln V = 0 + 1·ln N exactly (all-distinct tokens per group)
    rows = [
        ("g1", "t0 t1 t2 t3"),
        ("g2", " ".join(f"u{i}" for i in range(16))),
        ("g3", " ".join(f"w{i}" for i in range(64))),
    ]
    r2 = heaps_law_fit(spark.createDataFrame(rows, "source string, text string")).first()
    assert r2["heaps_beta"] == 1.0 and r2["heaps_log_c"] == 0.0 and r2["r2"] == 1.0


_CB_CH = "((31*m + 7*(p*3 + {k}) + ((p*3 + {k})*(p*3 + {k})) % 251) % 256)"


def test_image_channel_balance_oracle(spark, duck):
    """Per-channel exact sums over the arithmetic RAW8 fixture; the
    oracle regenerates every pixel and replays the floor(x·1e6+0.5)
    half-up rounding recipe bit-for-bit."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_channel_balance,
    )

    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    got = image_channel_balance(imgs)
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    s AS (SELECT m, COUNT(*) AS n,
                 SUM({_CB_CH.format(k=0)}) AS sr,
                 SUM({_CB_CH.format(k=1)}) AS sg,
                 SUM({_CB_CH.format(k=2)}) AS sb
          FROM px GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_px,
           floor(sr / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_r,
           floor(sg / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_g,
           floor(sb / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mean_b,
           floor((greatest(sr, sg, sb) - least(sr, sg, sb))
                 / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS cast_range,
           CASE WHEN sr >= sg AND sr >= sb THEN 'r'
                WHEN sg >= sb THEN 'g' ELSE 'b' END AS dominant_channel
    FROM s
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.cast_range >= 0).all()
    assert set(pdf.dominant_channel) <= {"r", "g", "b"}


def test_image_channel_balance_known_case(spark):
    """Pin on a hand-built frame: pure-red pixels → mean (255, 0, 0),
    cast range 255, dominant 'r'."""
    from osmapreduceproject_spark.operators.multimodal import image_channel_balance

    payload = bytes([255, 0, 0] * 16)
    df = spark.createDataFrame(
        [(0, "image", payload, (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = image_channel_balance(df).first()
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (255.0, 0.0, 0.0)
    assert r["cast_range"] == 255.0 and r["dominant_channel"] == "r"
    gray = spark.createDataFrame(
        [(1, "image", bytes([9, 9, 9] * 16), (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rg = image_channel_balance(gray).first()
    assert rg["cast_range"] == 0.0 and rg["dominant_channel"] == "r"  # tie → r


def test_video_freeze_detect_oracle(spark, duck):
    """Planted 4-frame freeze: the oracle regenerates every byte's
    position-weighted checksum and replays the island logic."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_frozen,
        video_freeze_detect,
    )

    frames = arith_video_frames_frozen(
        spark, n_videos=24, n_frames=12, freeze_from=4, freeze_len=4
    )
    got = video_freeze_detect(frames)
    sql = """
    WITH vv AS (SELECT unnest(range(24)) AS m),
    ff AS (SELECT m, unnest(range(12)) AS f FROM vv),
    by_ AS (SELECT m, f, unnest(range(576)) AS i FROM ff),
    cs AS (SELECT m, f,
             SUM(((31*m + 7*i + (i*i) % 251
                   + (CASE WHEN f >= 4 AND f < 8 THEN 4 ELSE f END)
                     * (CASE WHEN i < 12 THEN 1 ELSE 0 END)) % 256)
                 * (i + 1)) AS w
           FROM by_ GROUP BY 1, 2),
    l AS (SELECT m, f, w, lag(w) OVER (PARTITION BY m ORDER BY f) AS pw,
                 lag(f) OVER (PARTITION BY m ORDER BY f) AS pf
          FROM cs),
    mk AS (SELECT m, f,
             CASE WHEN pw IS NOT NULL THEN
               CASE WHEN w = pw AND f - pf = 1 THEN 1 ELSE 0 END END AS st
           FROM l),
    sp AS (SELECT m, f FROM mk WHERE st = 1),
    isl AS (SELECT m, f,
              CASE WHEN lag(f) OVER w2 IS NULL OR f - lag(f) OVER w2 > 1
                   THEN 1 ELSE 0 END AS nw
            FROM sp WINDOW w2 AS (PARTITION BY m ORDER BY f)),
    grp AS (SELECT m, f, SUM(nw) OVER (PARTITION BY m ORDER BY f) AS island
            FROM isl),
    runs AS (SELECT m, island, COUNT(*) AS rl FROM grp GROUP BY 1, 2),
    lng AS (SELECT m, MAX(rl) AS lp FROM runs GROUP BY m),
    base AS (SELECT m, COUNT(*) AS n_frames,
                    COALESCE(SUM(st), 0) AS n_static
             FROM mk GROUP BY m)
    SELECT CAST(base.m AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_static AS BIGINT) AS n_static_pairs,
           CASE WHEN n_frames >= 2 THEN
             round(CAST(n_static AS DOUBLE) / (n_frames - 1), 6)
           END AS freeze_frac,
           CAST(COALESCE(lng.lp + 1, 1) AS BIGINT) AS longest_freeze_frames
    FROM base LEFT JOIN lng ON lng.m = base.m
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    # planted: frames 4..7 identical → 3 static pairs, 4-frame run
    assert all(rows[m]["n_static_pairs"] == 3 for m in range(24))
    assert all(rows[m]["longest_freeze_frames"] == 4 for m in range(24))


def test_video_freeze_known_cases(spark):
    """Pins: a freeze-free clip reports zero pairs and run 1; a
    single-frame video has NULL freeze_frac."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_frozen,
        video_freeze_detect,
    )

    clean = arith_video_frames_frozen(
        spark, n_videos=2, n_frames=6, freeze_from=0, freeze_len=1
    )
    rows = video_freeze_detect(clean).collect()
    assert all(r["n_static_pairs"] == 0 for r in rows)
    assert all(r["longest_freeze_frames"] == 1 for r in rows)
    one = arith_video_frames_frozen(
        spark, n_videos=1, n_frames=1, freeze_from=0, freeze_len=1
    )
    r1 = video_freeze_detect(one).first()
    assert r1["freeze_frac"] is None and r1["n_frames"] == 1


def test_video_freeze_gapped_indices(spark):
    """Review pin (r12): identical frames at NON-consecutive indices
    (a sampled video) are not freeze pairs — the pair rule and the
    island splitter agree on frame_idx delta == 1."""
    from osmapreduceproject_spark.operators.multimodal import video_freeze_detect

    payload = bytes(range(48)) * 3
    meta = (4, 4, None, 4)
    rows = [(0, "video", f, payload, meta) for f in (0, 2, 4, 6)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, frame_idx int, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = video_freeze_detect(df).first()
    assert r["n_static_pairs"] == 0 and r["longest_freeze_frames"] == 1
    # the same frames at contiguous indices ARE one 4-frame freeze
    rows2 = [(1, "video", f, payload, meta) for f in (0, 1, 2, 3)]
    df2 = spark.createDataFrame(
        rows2,
        "media_id long, kind string, frame_idx int, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r2 = video_freeze_detect(df2).first()
    assert r2["n_static_pairs"] == 3 and r2["longest_freeze_frames"] == 4


def test_audio_envelope_periodicity_oracle(spark, duck):
    """Planted 4-frame AM cycle: the oracle regenerates every sample,
    frames the envelope, and replays the per-lag integer-moment ACF."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_am,
        audio_envelope_periodicity,
    )

    clips = arith_raw_audio_am(spark, n=32, n_samples=2048)
    got = audio_envelope_periodicity(clips, frame=64, max_lag=8)
    lag_cols = ", ".join(
        f"lag(amp, {k}) OVER w AS u{k}" for k in range(1, 9)
    )
    lag_case = " ".join(
        f"WHEN {k} THEN u{k}" for k in range(1, 9)
    )
    sql = f"""
    WITH t AS (SELECT unnest(range(32)) AS m),
    s AS (SELECT m, unnest(range(2048)) AS i FROM t),
    v AS (SELECT m, i,
            CASE WHEN (i // 64) % 4 < 2 THEN 127 + (17*m + i) % 3
                 ELSE (17*m + 11*i + (i*i) % 89) % 256 END AS val
          FROM s),
    env AS (SELECT m, i // 64 AS fr, SUM(abs(val - 128)) AS amp
            FROM v GROUP BY 1, 2),
    l AS (SELECT m, fr, amp, {lag_cols}
          FROM env WINDOW w AS (PARTITION BY m ORDER BY fr)),
    st AS (SELECT m, lg.lag AS lag, amp AS x,
                  CASE lg.lag {lag_case} END AS y
           FROM l, (SELECT unnest(range(1, 9)) AS lag) lg
           WHERE CASE lg.lag {lag_case} END IS NOT NULL),
    mo AS (SELECT m, lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx,
                  SUM(CAST(y AS HUGEINT) * y) AS syy,
                  SUM(CAST(x AS HUGEINT) * y) AS sxy
           FROM st GROUP BY 1, 2),
    fin AS (SELECT *,
              n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS vx,
              n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS vy
            FROM mo),
    acf AS (SELECT m, lag,
              CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
                round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                      / sqrt(vx * vy), 6)
              END AS a
            FROM fin),
    best AS (SELECT m, lag, a,
               ROW_NUMBER() OVER (PARTITION BY m ORDER BY a DESC, lag ASC) AS rn
             FROM acf WHERE a IS NOT NULL),
    nf AS (SELECT m, COUNT(*) AS n_frames FROM env GROUP BY m)
    SELECT CAST(nf.m AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(b.lag AS INTEGER) AS best_lag, b.a AS best_acf
    FROM nf LEFT JOIN (SELECT m, lag, a FROM best WHERE rn = 1) b
    ON b.m = nf.m
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    # the best lag is a multiple of the planted period (the lag-8
    # harmonic legitimately competes with the fundamental)
    assert all(rows[m]["best_lag"] % 4 == 0 for m in range(32))
    assert all(rows[m]["best_acf"] > 0.9 for m in range(32))
    # with the harmonic out of range the fundamental wins exactly
    fund = audio_envelope_periodicity(clips, frame=64, max_lag=5)
    assert all(r["best_lag"] == 4 for r in fund.collect())


def test_audio_envelope_degenerate(spark):
    """Pin: a constant-envelope clip (digital silence) has no usable
    lag → NULL best_lag/best_acf."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_silence,
        audio_envelope_periodicity,
    )

    pure = arith_raw_audio_silence(spark, n=2, n_samples=2048)
    rows = audio_envelope_periodicity(pure, frame=64, max_lag=4).collect()
    assert all(r["n_frames"] == 32 for r in rows)


_KG_DOT = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def test_knn_graph_stats_oracle(spark, duck):
    """kNN-graph reciprocity/hubness over the exact brute edge list;
    the oracle replays cosine ranking and the micro-integer sim mean."""
    from osmapreduceproject_spark.operators.similarity import knn_graph_stats

    got = knn_graph_stats(_t(spark, "embeddings"), k=5)
    dot = _KG_DOT.format(a="q.embedding", b="c.embedding")
    nq = _KG_DOT.format(a="q.embedding", b="q.embedding")
    nc = _KG_DOT.format(a="c.embedding", b="c.embedding")
    sql = f"""
    WITH scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             round({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS sim
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, nid ASC) AS rn
      FROM scored),
    e AS (SELECT qid, nid, CAST(round(sim * 1000000) AS BIGINT) AS sq
          FROM ranked WHERE rn <= 5),
    recip AS (SELECT COUNT(*) AS r FROM e a
              WHERE EXISTS (SELECT 1 FROM e b
                            WHERE b.qid = a.nid AND b.nid = a.qid)),
    indeg AS (SELECT nid, COUNT(*) AS d FROM e GROUP BY nid),
    nn AS (SELECT COUNT(DISTINCT vec_id) AS n_nodes FROM embeddings),
    ea AS (SELECT COUNT(*) AS n_edges, SUM(sq) AS ssim FROM e),
    ind AS (SELECT COALESCE(MAX(d), 0) AS mx, COUNT(*) AS cited FROM indeg)
    SELECT nn.n_nodes, CAST(5 AS INTEGER) AS k,
           CAST(ea.n_edges AS BIGINT) AS n_edges,
           CAST(recip.r AS BIGINT) AS n_reciprocal,
           CASE WHEN ea.n_edges > 0 THEN
             round(CAST(recip.r AS DOUBLE) / ea.n_edges, 6) END AS reciprocity,
           CAST(ind.mx AS BIGINT) AS max_in_degree,
           CAST(nn.n_nodes - ind.cited AS BIGINT) AS n_isolated,
           CASE WHEN ea.n_edges > 0 THEN
             round(CAST(ssim AS DOUBLE) / ea.n_edges / 1000000, 6)
           END AS mean_sim
    FROM nn, ea, recip, ind
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n_edges"] == row["n_nodes"] * 5
    assert 0.0 <= row["reciprocity"] <= 1.0
    assert row["n_reciprocal"] % 2 == 0  # mutual edges come in pairs


def test_knn_graph_known_case(spark):
    """Pin: two tight clusters of 3 identical-direction vectors with
    k=2 → every edge reciprocal, no hubs beyond k, nobody isolated."""
    from osmapreduceproject_spark.operators.similarity import knn_graph_stats

    rows = []
    for i in range(3):
        rows.append((i, [1.0, 0.0, 0.0, float(i) * 1e-9]))
    for i in range(3, 6):
        rows.append((i, [0.0, 1.0, 0.0, float(i) * 1e-9]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = knn_graph_stats(df, k=2, vec_col="embedding").first()
    assert r["n_nodes"] == 6 and r["n_edges"] == 12
    assert r["reciprocity"] == 1.0 and r["n_isolated"] == 0
    assert r["max_in_degree"] == 2


def test_lsh_bucket_stats_oracle(spark, duck):
    """Band-bucket occupancy over the exact q31 signature machinery;
    the oracle reuses the shared minhash CTE's buckets."""
    from osmapreduceproject_spark.operators.dedup import lsh_bucket_stats
    from osmapreduceproject_spark.queries import _minhash_cte

    got = lsh_bucket_stats(_t(spark, "documents"), num_hashes=16, bands=4)
    sql = f"""
    WITH {_minhash_cte(16, 4)},
    bsizes AS (SELECT band, bh, COUNT(*) AS c FROM buckets GROUP BY 1, 2),
    a AS (SELECT band, SUM(c) AS n_docs, COUNT(*) AS n_buckets,
                 MAX(c) AS mx,
                 SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS singles,
                 SUM(CAST(c AS HUGEINT) * (c - 1)) AS p2
          FROM bsizes GROUP BY band)
    SELECT CAST(band AS INTEGER) AS band, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(mx AS BIGINT) AS max_bucket_size,
           round(CAST(singles AS DOUBLE) / n_buckets, 6) AS singleton_frac,
           round(CAST(n_docs AS DOUBLE) / n_buckets, 6) AS mean_bucket_size,
           CAST(p2 / 2 AS BIGINT) AS candidate_pairs
    FROM a
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert len(pdf) == 4 and (pdf.n_docs == 500).all()
    assert (pdf.candidate_pairs >= 0).all()


def test_lsh_bucket_known_case(spark):
    """Pin: 4 identical docs + 2 unique ones in one band land as one
    4-bucket (6 candidate pairs) + singletons."""
    from osmapreduceproject_spark.operators.dedup import lsh_bucket_stats

    docs = [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
    docs += [(10, "one two three four five six"),
             (11, "seven eight nine ten eleven twelve")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["band"]: r for r in lsh_bucket_stats(df, num_hashes=8, bands=2).collect()}
    for b in (0, 1):
        assert out[b]["n_docs"] == 6
        assert out[b]["max_bucket_size"] == 4
        assert out[b]["candidate_pairs"] == 6
        assert out[b]["n_buckets"] == 3 and out[b]["singleton_frac"] == round(2 / 3, 6)


import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M p-values through BH)",
)
def test_benjamini_hochberg_scale_smoke(spark):
    """10M p-values, ~1M distinct micro-units, through the step-up
    selection: with p ~ U(0,1) from the engine-hash mix and α = 0.05,
    BH on a null-uniform sample rejects only a vanishing prefix; the
    invariants n_rejected ≤ m and threshold ≤ α hold at volume.
    Evidences the ranged-cumsum machinery on a 10M-row pool with a
    million-value distinct frame — never a global sort."""
    from osmapreduceproject_spark.operators.stats import benjamini_hochberg

    df = spark.range(10_000_000).select(
        (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)).cast("double")
         / 1_000_003.0).alias("p")
    )
    r = benjamini_hochberg(df, "p", alpha=0.05).first()
    assert r["m"] == 10_000_000 and r["n_invalid"] == 0
    assert r["n_rejected"] <= r["m"]
    if r["p_threshold"] is not None:
        assert r["p_threshold"] <= 0.05


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (500k frames through freeze detect)",
)
def test_video_freeze_scale_smoke(spark):
    """2,000 videos × 250 frames (500k frames, ~288 MB of payload)
    through the checksum + island path: every video carries the same
    planted 10-frame freeze — exactly 9 static pairs and a 10-frame
    longest run, at volume. Evidences that only (video, idx, checksum)
    triplets leave the Arrow decode and the windows hash on the video
    key."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_frozen,
        video_freeze_detect,
    )

    frames = arith_video_frames_frozen(
        spark, n_videos=2_000, n_frames=250, freeze_from=100, freeze_len=10
    )
    out = video_freeze_detect(frames)
    agg = out.agg(
        F.count(F.lit(1)).alias("vids"),
        F.min("n_static_pairs").alias("mn"),
        F.max("n_static_pairs").alias("mx"),
        F.min("longest_freeze_frames").alias("lmn"),
        F.max("longest_freeze_frames").alias("lmx"),
    ).first()
    assert agg["vids"] == 2_000
    assert agg["mn"] == 9 and agg["mx"] == 9
    assert agg["lmn"] == 10 and agg["lmx"] == 10
