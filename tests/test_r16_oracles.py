"""Cross-engine (DuckDB) parity for the r15-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, ninth tranche after r8–r15; the file number continues the
test-file series, the DECLARATION round is r15). Every operator lands
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


def test_mood_median_test_oracle(spark, duck):
    """2×k above-the-grand-median counts per event type; exact rank
    median, double-domain squares, quantized per-group terms."""
    from osmapreduceproject_spark.operators.stats import mood_median_test

    got = mood_median_test(_t(spark, "events"), "event_type", "value")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["chi2"] is None or row["chi2"] >= 0.0
    assert 0 <= row["n_above"] <= row["n"]


def test_mood_median_known_cases(spark):
    """Pins: fully separated 4-vs-4 groups → χ² = 8 at dof 1; an
    all-equal pool (everything AT the median) → NULL χ²."""
    from osmapreduceproject_spark.operators.stats import mood_median_test

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)]
        + [("b", float(v)) for v in (5, 6, 7, 8)],
        "g string, v double",
    )
    r = mood_median_test(df, "g", "v").first()
    assert r["grand_median"] == 4.0 and r["n_above"] == 4
    assert r["chi2"] == 8.0 and r["dof"] == 1
    flat = spark.createDataFrame([("a", 7.0)] * 3 + [("b", 7.0)] * 3,
                                 "g string, v double")
    rf = mood_median_test(flat, "g", "v").first()
    assert rf["chi2"] is None and rf["n_above"] == 0


def test_cochran_q_oracle(spark, duck):
    """Binary repeated-measures over user blocks × event-type
    treatments (outcome: fractional |value| ≥ 0.5); exact integer
    moments, one division."""
    from osmapreduceproject_spark.operators.stats import cochran_q

    v = F.col("value").cast("double")
    frac = F.abs(v) - F.floor(F.abs(v))
    ev = _t(spark, "events").select(
        "user_id",
        "event_type",
        F.when(v.isNotNull() & ~F.isnan(v), (frac >= 0.5).cast("int")).alias(
            "hit"
        ),
    )
    got = cochran_q(ev, "user_id", "event_type", "hit")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["q_stat"] is None or row["q_stat"] >= 0.0


def test_cochran_q_known_cases(spark):
    """Pins: 4 blocks where only treatment t3 ever succeeds → Q = 8
    (= 2·b for the one-hot pattern); an incomplete block drops; an
    all-success table has zero denominator → NULL Q."""
    from osmapreduceproject_spark.operators.stats import cochran_q

    rows = []
    for b in range(4):
        rows += [(b, "t1", 0), (b, "t2", 0), (b, "t3", 1)]
    df = spark.createDataFrame(rows, "b int, t string, x int")
    r = cochran_q(df, "b", "t", "x").first()
    assert r["q_stat"] == 8.0 and r["n_blocks"] == 4 and r["dof"] == 2
    rows.append((9, "t1", 1))  # block 9 misses t2/t3 → dropped
    r2 = cochran_q(spark.createDataFrame(rows, "b int, t string, x int"),
                   "b", "t", "x").first()
    assert r2["n_blocks"] == 4 and r2["n_blocks_dropped"] == 1
    assert r2["q_stat"] == 8.0
    allone = spark.createDataFrame(
        [(b, t, 1) for b in range(3) for t in ("x", "y")],
        "b int, t string, x int",
    )
    ra = cochran_q(allone, "b", "t", "x").first()
    assert ra["q_stat"] is None  # every B_i = k → zero denominator


def test_contingency_residuals_oracle(spark, duck):
    """Per-cell expected counts and Pearson/adjusted residuals over the
    source × lang table; integer marginals, fixed-order doubles."""
    from osmapreduceproject_spark.operators.stats import contingency_residuals

    got = contingency_residuals(_t(spark, "documents"), "source", "lang")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.observed > 0).all()
    assert (pdf.chi2_contribution >= 0).all()


def test_contingency_residuals_known_case(spark):
    """Pin: the [[30,10],[10,10]] table — hand expected 26.666667 and
    residuals; the contribution column sums to chi2_independence's χ²
    (cross-operator consistency) within rounding."""
    from osmapreduceproject_spark.operators.stats import (
        chi2_independence,
        contingency_residuals,
    )

    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["a"], r["b"]): r for r in contingency_residuals(df, "a", "b").collect()}
    xp = out[("x", "p")]
    assert xp["observed"] == 30 and xp["expected"] == round(40 * 40 / 60, 6)
    assert xp["pearson_residual"] == round(
        (30 - 40 * 40 / 60) / math.sqrt(40 * 40 / 60), 6
    )
    chi2 = chi2_independence(df, "a", "b").first()["chi2"]
    assert abs(sum(r["chi2_contribution"] for r in out.values()) - chi2) < 1e-4
    # single-level dimension → NULL adjusted residual
    one = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    ro = contingency_residuals(one, "a", "b").first()
    assert ro["adj_residual"] is None


_NA_CHURN_US = 24 * 3600 * 1_000_000  # churned = inactive for the final day


def _na_frame(spark):
    """Per-user observed lifetime in whole hours + churn flag — the same
    right-censored shaping as the staged kaplan_meier entry, so the two
    estimators grade over the identical pool."""
    ev = _t(spark, "events")
    us = F.unix_micros(F.col("ts"))
    per = ev.groupBy("user_id").agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    horizon = per.agg(F.max("__hi").alias("__hz"))
    return per.crossJoin(F.broadcast(horizon)).select(
        F.expr("(__hi - __lo) div 3600000000").cast("bigint").alias("dur_hours"),
        (F.col("__hi") < F.col("__hz") - F.lit(_NA_CHURN_US)).cast("int").alias(
            "churned"
        ),
    )


def test_nelson_aalen_oracle(spark, duck):
    """Cumulative hazard over user lifetimes — ranged at-risk counts,
    micro-quantized d/n increments, exp(−H) replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import nelson_aalen

    got = nelson_aalen(_na_frame(spark), "dur_hours", "churned")
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.orderBy("t").toPandas()
    assert (pdf.cum_hazard.diff().dropna() >= -1e-12).all()  # monotone up
    assert pdf.fh_survival.between(0.0, 1.0).all()


def test_nelson_aalen_known_cases(spark):
    """Textbook pins: durations 1, 2†, 3 († censored) → H(1) = 1/3,
    H(3) = 1/3 + 1 = 1.333333; FH survival dominates the KM product
    (exp(−x) ≥ 1 − x, cross-estimator invariant)."""
    from osmapreduceproject_spark.operators.stats import kaplan_meier, nelson_aalen

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "d double, e int"
    )
    rows = {r["t"]: r for r in nelson_aalen(df, "d", "e").collect()}
    assert rows[1.0]["cum_hazard"] == round(1 / 3, 6)
    assert rows[3.0]["cum_hazard"] == round(1 / 3 + 1.0, 6)
    assert rows[1.0]["n_risk"] == 3 and rows[3.0]["n_risk"] == 1
    km = {r["t"]: r["survival"] for r in kaplan_meier(df, "d", "e").collect()}
    for t, r in rows.items():
        assert r["fh_survival"] >= km[t] - 1e-9


def test_mean_excess_report_oracle(spark, duck):
    """POT tail stats of l_extendedprice over 50k per return flag;
    micro-quantized excess mass, exact conditional counts."""
    from osmapreduceproject_spark.operators.stats import mean_excess_report

    got = mean_excess_report(
        _t(spark, "lineitem"), "l_returnflag", "l_extendedprice", 50_000.0
    )
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_exceed <= pdf.n).all()
    ok = pdf.dropna(subset=["mean_excess"])
    assert (ok.mean_excess > 0).all()
    assert (ok.max_value > 50_000.0).all()


def test_mean_excess_known_cases(spark):
    """Pins: [1, 5, 10] over u=4 → 2 exceedances, mean excess 3.5; an
    all-below group reports NULL mean excess with its own max."""
    from osmapreduceproject_spark.operators.stats import mean_excess_report

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 10.0), ("b", 2.0), ("b", 3.0)],
        "g string, v double",
    )
    out = {r["g"]: r for r in mean_excess_report(df, "g", "v", 4.0).collect()}
    assert out["a"]["n_exceed"] == 2 and out["a"]["mean_excess"] == 3.5
    assert out["a"]["exceed_frac"] == round(2 / 3, 6)
    assert out["b"]["n_exceed"] == 0 and out["b"]["mean_excess"] is None
    assert out["b"]["max_value"] == 3.0


# ---------------------------------------------------------------------------
# events family
# ---------------------------------------------------------------------------


def test_concurrency_profile_oracle(spark, duck):
    """Little's-law profile over the q279 interval construction — one
    endpoint sweep for busy/covered/span/peak, replayed in SQL."""
    from osmapreduceproject_spark.operators.events import concurrency_profile

    ev = _t(spark, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    got = concurrency_profile(iv, "user_id", "s", "e")
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.covered_us <= pdf.span_us).all()
    assert (pdf.busy_us >= pdf.covered_us).all()  # overlap only adds mass
    assert (pdf.mean_active_concurrency >= 1.0 - 1e-9).all()
    assert (pdf.peak_concurrent >= 1).all()


def test_concurrency_profile_known_cases(spark):
    """Pins: two half-overlapping intervals → busy 20, covered 15,
    peak 2, mean 4/3; back-to-back intervals (half-open) → peak 1,
    utilization 1."""
    import datetime

    from osmapreduceproject_spark.operators.events import concurrency_profile

    base = datetime.datetime(2025, 1, 1)

    def ts(sec):
        return base + datetime.timedelta(seconds=sec)

    df = spark.createDataFrame(
        [(1, ts(0), ts(10)), (1, ts(5), ts(15)),
         (2, ts(0), ts(5)), (2, ts(5), ts(10))],
        "k bigint, s timestamp, e timestamp",
    )
    out = {r["k"]: r for r in concurrency_profile(df, "k", "s", "e").collect()}
    r1 = out[1]
    assert r1["busy_us"] == 20_000_000 and r1["covered_us"] == 15_000_000
    assert r1["span_us"] == 15_000_000 and r1["peak_concurrent"] == 2
    assert r1["mean_concurrency"] == round(20 / 15, 6)
    assert r1["utilization"] == 1.0
    r2 = out[2]
    assert r2["peak_concurrent"] == 1  # [0,5) and [5,10) never overlap
    assert r2["covered_us"] == 10_000_000 and r2["utilization"] == 1.0
    assert r2["mean_active_concurrency"] == 1.0


# ---------------------------------------------------------------------------
# text family
# ---------------------------------------------------------------------------


def test_template_prefix_report_oracle(spark, duck):
    """Top first/last-5-token grams per source with shares and the
    distinct-prefix ratio; slice/count/rank replayed in SQL."""
    from osmapreduceproject_spark.operators.text import template_prefix_report

    got = template_prefix_report(_t(spark, "documents"), "source", "text", k=5)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.top_prefix_share > 0).all()
    assert (pdf.top_prefix_share <= 1).all()
    assert (pdf.distinct_prefix_ratio <= 1).all()


def test_template_prefix_known_cases(spark):
    """Pins: 3-of-4 docs share a 5-token opening → share 0.75, distinct
    ratio 0.5; a short doc contributes its whole text; ties break
    lexicographically."""
    from osmapreduceproject_spark.operators.text import template_prefix_report

    docs = [
        ("w", "terms of service apply here alpha"),
        ("w", "terms of service apply here beta"),
        ("w", "terms of service apply here gamma"),
        ("w", "totally different opening text here"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    r = template_prefix_report(df, "source", "text", k=5).first()
    assert r["top_prefix"] == "terms of service apply here"
    assert r["top_prefix_n"] == 3 and r["top_prefix_share"] == 0.75
    assert r["distinct_prefix_ratio"] == 0.5
    short = spark.createDataFrame(
        [("s", "hi there"), ("s", "hi there"), ("s", "bye")],
        "source string, text string",
    )
    rs = template_prefix_report(short, "source", "text", k=5).first()
    assert rs["top_prefix"] == "hi there" and rs["top_prefix_n"] == 2
    tie = spark.createDataFrame(
        [("t", "bbb x"), ("t", "aaa y")], "source string, text string"
    )
    rt = template_prefix_report(tie, "source", "text", k=5).first()
    assert rt["top_prefix"] == "aaa y"  # count tie → lexicographic


def test_code_detect_report_oracle(spark, duck):
    """Symbol/keyword densities and code fraction per source; regex
    counts and quantized means replayed in SQL."""
    from osmapreduceproject_spark.operators.text import (
        _CODE_KEYWORDS,
        _CODE_SYMBOLS,
        code_detect_report,
    )

    got = code_detect_report(_t(spark, "documents"), "source", "text")
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.code_frac.between(0, 1).all()
    assert (pdf.mean_symbol_density >= 0).all()


def test_code_detect_known_cases(spark):
    """Pin: a planted code doc trips both densities, prose trips
    neither — exact counted densities on hand strings."""
    from osmapreduceproject_spark.operators.text import code_detect_report

    code = "def f(x): return [x] * (x + 1);"  # symbols: ( ) [ ] * ( ) ; =0…
    prose = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [("m", code), ("m", prose)], "source string, text string"
    )
    r = code_detect_report(df, "source", "text").first()
    assert r["n_docs"] == 2 and r["code_docs"] == 1
    assert r["code_frac"] == 0.5
    n_sym = sum(code.count(ch) for ch in "{}()[];=<>&|#*")
    qsd = math.floor(n_sym / len(code) * 1e6 + 0.5)  # half-up, not banker's
    expect_mean = math.floor((qsd + 0) / 2 / 1e6 * 1e6 + 0.5) / 1e6
    assert r["mean_symbol_density"] == expect_mean
    empty = spark.createDataFrame(
        [("e", ""), ("e", "plain words")], "source string, text string"
    )
    re_ = code_detect_report(empty, "source", "text").first()
    assert re_["n_docs"] == 1  # the empty doc is excluded (no density)


# ---------------------------------------------------------------------------
# multimodal family
# ---------------------------------------------------------------------------

_CF_CH = "((31*m + 7*(p*3 + {k}) + ((p*3 + {k})*(p*3 + {k})) % 251) % 256)"


def _rnd6_sql(expr: str) -> str:
    """floor(|x|·1e6 + 0.5)·sign(x)/1e6 — the half-away recipe."""
    return (
        f"CASE WHEN ({expr}) >= 0 THEN floor(({expr}) * 1000000 + 0.5)"
        f" ELSE -floor(-({expr}) * 1000000 + 0.5) END / 1000000"
    )


def test_image_colorfulness_oracle(spark, duck):
    """Hasler–Süsstrunk metric over the arithmetic RAW8 fixture; the
    oracle regenerates every pixel and replays the integer opponent
    moments and the double-domain finalize bit-for-bit."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_colorfulness,
    )

    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    got = image_colorfulness(imgs)
    r, g, b = (_CF_CH.format(k=k) for k in (0, 1, 2))
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(192)) AS p FROM mm),
    v AS (SELECT m, {r} - {g} AS rg, {r} + {g} - 2*({b}) AS yb2 FROM px),
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.colorfulness >= 0).all()
    assert (pdf.n_px == 192).all()


def test_image_colorfulness_known_cases(spark):
    """Pins: a gray frame scores exactly 0; a pure-red frame scores
    0.3·√(255² + 127.5²) with zero opponent variance."""
    from osmapreduceproject_spark.operators.multimodal import image_colorfulness

    gray = spark.createDataFrame(
        [(0, "image", bytes([9, 9, 9] * 16), (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rg = image_colorfulness(gray).first()
    assert rg["colorfulness"] == 0.0 and rg["std_rg"] == 0.0
    red = spark.createDataFrame(
        [(1, "image", bytes([255, 0, 0] * 16), (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rr = image_colorfulness(red).first()
    expect = 0.3 * math.sqrt(255.0 * 255.0 + 127.5 * 127.5)
    assert rr["colorfulness"] == math.floor(expect * 1e6 + 0.5) / 1e6
    assert rr["mean_rg"] == 255.0 and rr["mean_yb"] == 127.5


def test_audio_zero_crossing_oracle(spark, duck):
    """ZCR over the arithmetic PCM fixture; the oracle regenerates
    every sample and replays the sign-change count."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio,
        audio_zero_crossing,
    )

    clips = arith_raw_audio(spark, n=32, n_samples=2048)
    got = audio_zero_crossing(clips)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert pdf.zcr.between(0, 1).all()
    assert (pdf.n_samples == 2048).all()


def test_audio_zero_crossing_known_cases(spark):
    """Pins: alternating 127/128 crosses every pair (zcr 1); a constant
    clip never crosses; a single-sample clip has NULL zcr."""
    from osmapreduceproject_spark.operators.multimodal import audio_zero_crossing

    meta = "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    alt = spark.createDataFrame(
        [(0, "audio", bytes([127, 128] * 8), (None, None, 16000, None))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    ra = audio_zero_crossing(alt).first()
    assert ra["n_crossings"] == 15 and ra["zcr"] == 1.0
    const = spark.createDataFrame(
        [(1, "audio", bytes([200] * 16), (None, None, 16000, None))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rc = audio_zero_crossing(const).first()
    assert rc["n_crossings"] == 0 and rc["zcr"] == 0.0
    one = spark.createDataFrame(
        [(2, "audio", bytes([5]), (None, None, 16000, None))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    ro = audio_zero_crossing(one).first()
    assert ro["zcr"] is None and ro["n_samples"] == 1


def test_video_loop_detect_oracle(spark, duck):
    """Planted 4-frame loop: the oracle regenerates every checksum from
    the closed-form byte formula and replays the gap machinery."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_looped,
        video_loop_detect,
    )

    frames = arith_video_frames_looped(spark, n_videos=24, n_frames=12, period=4)
    got = video_loop_detect(frames)
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    # period 4 over 12 frames: 4 distinct frames, 8 repeat pairs, all at gap 4
    assert all(rows[m]["n_distinct_frames"] == 4 for m in range(24))
    assert all(rows[m]["n_repeat_pairs"] == 8 for m in range(24))
    assert all(rows[m]["dominant_gap"] == 4 for m in range(24))
    assert all(rows[m]["min_repeat_gap"] == 4 for m in range(24))


def test_video_loop_known_cases(spark):
    """Pins: a loop-free clip (period ≥ n_frames) reports zero repeat
    pairs and NULL gaps; period = 1 degenerates to a freeze — dominant
    gap 1, agreeing with video_freeze_detect."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_looped,
        video_freeze_detect,
        video_loop_detect,
    )

    clean = arith_video_frames_looped(spark, n_videos=2, n_frames=6, period=6)
    rows = video_loop_detect(clean).collect()
    assert all(r["n_repeat_pairs"] == 0 for r in rows)
    assert all(r["dominant_gap"] is None for r in rows)
    assert all(r["n_distinct_frames"] == 6 for r in rows)
    frozen = arith_video_frames_looped(spark, n_videos=1, n_frames=5, period=1)
    rl = video_loop_detect(frozen).first()
    assert rl["dominant_gap"] == 1 and rl["n_repeat_pairs"] == 4
    rf = video_freeze_detect(frozen).first()
    assert rf["longest_freeze_frames"] == 5  # the two detectors agree


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


def test_dim_truncation_report_oracle(spark, duck):
    """Recall@5 of the 32-dim prefix ranking vs the full 64-dim ranking;
    both brute edge lists and the overlap replayed in SQL."""
    from osmapreduceproject_spark.operators.similarity import dim_truncation_report

    got = dim_truncation_report(_t(spark, "embeddings"), k=5, trunc_dim=32)
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert 0.0 <= row["mean_recall"] <= 1.0
    assert 0.0 <= row["frac_full_recall"] <= row["mean_recall"] + 1e-9


def test_dim_truncation_known_cases(spark):
    """Pins: geometry fully carried by the prefix dims → recall 1; a
    planted vector whose tail flips the full ranking → recall < 1."""
    from osmapreduceproject_spark.operators.similarity import dim_truncation_report

    rows = [
        (i, [math.cos(0.3 * i), math.sin(0.3 * i), 0.0, 0.0])
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = dim_truncation_report(df, k=2, trunc_dim=2).first()
    assert r["mean_recall"] == 1.0 and r["frac_full_recall"] == 1.0
    assert r["n_queries"] == 5
    adv = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [1.0, 0.0, -3.0, 0.0]),  # trunc-sim 1.0 to v0, full-sim low
        ],
        "vec_id bigint, embedding array<double>",
    )
    ra = dim_truncation_report(adv, k=1, trunc_dim=2).first()
    assert ra["mean_recall"] < 1.0


# ---------------------------------------------------------------------------
# gated scale smokes
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M durations through NA)",
)
def test_nelson_aalen_scale_smoke(spark):
    """10M right-censored durations (~1000 distinct) through the
    ranged-cumsum hazard path: H is monotone, the first increment is
    the exact d/n rational, and no global sort exists (the KM smoke's
    twin — the two estimators share the machinery)."""
    from osmapreduceproject_spark.operators.stats import nelson_aalen

    df = spark.range(10_000_000).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(997)).cast("double").alias("d"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(2)).cast("int").alias("e"),
    )
    out = nelson_aalen(df, "d", "e").orderBy("t")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf.cum_hazard.diff().dropna() >= -1e-12).all()
    assert pdf.fh_survival.between(0.0, 1.0).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (4M intervals through the sweep)",
)
def test_concurrency_profile_scale_smoke(spark):
    """2,000 keys × 2,000 intervals (4M) in a per-key staircase: each
    interval [i, i+10) overlaps its 9 successors → peak 10, busy
    exactly 10× the interval count, covered = span. Evidences the
    per-key sweep at volume with DECIMAL-safe busy accumulation."""
    from osmapreduceproject_spark.operators.events import concurrency_profile

    n_keys, per_key = 2_000, 2_000
    df = spark.range(n_keys * per_key).select(
        (F.col("id") % n_keys).alias("k"),
        F.timestamp_micros((F.col("id") / n_keys).cast("bigint") * 1_000_000).alias("s"),
        F.timestamp_micros(
            ((F.col("id") / n_keys).cast("bigint") + 10) * 1_000_000
        ).alias("e"),
    )
    out = concurrency_profile(df, "k", "s", "e")
    agg = out.agg(
        F.count(F.lit(1)).alias("keys"),
        F.min("peak_concurrent").alias("pmin"),
        F.max("peak_concurrent").alias("pmax"),
        F.min("n_intervals").alias("imin"),
        F.min("utilization").alias("umin"),
    ).first()
    assert agg["keys"] == n_keys
    assert agg["pmin"] == 10 and agg["pmax"] == 10
    assert agg["imin"] == per_key
    assert agg["umin"] == 1.0


# ---------------------------------------------------------------------------
# second tranche (staged later in round 13; same gates)
# ---------------------------------------------------------------------------


def test_runs_test_oracle(spark, duck):
    """Wald–Wolfowitz runs vs each user's own discrete median, time
    order with value tiebreak, closed-form moments replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import runs_test

    got = runs_test(_t(spark, "events"), "user_id", "ts", "value")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_runs >= 1).all()
    assert (pdf.n_runs <= pdf.n_above + pdf.n_below).all()


def test_runs_test_known_cases(spark):
    """Pins: a strictly monotone 1..9 series has 2 runs (z from the
    closed form, negative); an all-equal series has no signed rows and
    emits no row."""
    import datetime

    from osmapreduceproject_spark.operators.windows import runs_test

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (1, base + datetime.timedelta(hours=i), float(i + 1)) for i in range(9)
    ]
    rows += [(2, base + datetime.timedelta(hours=i), 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    out = {r["k"]: r for r in runs_test(df, "k", "ts", "v").collect()}
    r1 = out[1]
    # median 5 excluded; signs 0000 1111 -> 2 runs of 4+4
    assert r1["n_above"] == 4 and r1["n_below"] == 4 and r1["n_ties"] == 1
    assert r1["n_runs"] == 2
    e = 1.0 + 2.0 * 4 * 4 / 8
    var = (2.0 * 16 * (32 - 8)) / (8 * 8 * 7.0)
    assert r1["expected_runs"] == round(e, 6)
    assert r1["z"] == math.copysign(
        math.floor(abs((2 - e) / math.sqrt(var)) * 1e6 + 0.5), (2 - e)
    ) / 1e6
    assert 2 not in out  # all-tied key emits no row


_SC_STEP = 3600
_SC_US = _SC_STEP * 1_000_000


def test_step_change_report_oracle(spark, duck):
    """Best mean-shift split per user over the hourly LOCF grid —
    prefix sums, quantized argmax, replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import step_change_report

    ev = _t(spark, "events").where(
        F.col("value").isNotNull() & ~F.isnan(F.col("value"))
    )
    got = step_change_report(ev, "user_id", "ts", "value", _SC_STEP)
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_slots >= 2).all()


def test_step_change_known_case(spark):
    """Pin: 6 slots at 10 then 6 at 20 → the split lands on the last
    level-10 slot with means (10, 20) and shift exactly 10."""
    import datetime

    from osmapreduceproject_spark.operators.windows import step_change_report

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (1, base + datetime.timedelta(hours=h), 10.0 if h < 6 else 20.0)
        for h in range(12)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    r = step_change_report(df, "k", "ts", "v", 3600).first()
    assert r["n_slots"] == 12
    assert r["mean_before"] == 10.0 and r["mean_after"] == 20.0
    assert r["shift"] == 10.0
    split = datetime.datetime(2025, 1, 1, 5, tzinfo=datetime.timezone.utc)
    assert r["split_slot_epoch"] == int(split.timestamp())


def test_cooccurrence_lift_oracle(spark, duck):
    """Event-type pair lift/jaccard over distinct user scopes; exact
    supports, fixed-order ratios replayed in SQL."""
    from osmapreduceproject_spark.operators.events import cooccurrence_lift

    got = cooccurrence_lift(_t(spark, "events"), "user_id", "event_type")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_both <= pdf[["n_a", "n_b"]].min(axis=1)).all()
    assert pdf.support.between(0, 1).all()
    assert pdf.jaccard.between(0, 1).all()


def test_cooccurrence_lift_known_case(spark):
    """Pin: u1{a,b}, u2{a,b}, u3{a}, u4{c} → (a,b) support 1/2,
    lift 4/3, jaccard 2/3; pairs never co-occurring are absent."""
    from osmapreduceproject_spark.operators.events import cooccurrence_lift

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
            (1, "a")]  # duplicate event collapses in the distinct frame
    df = spark.createDataFrame(rows, "u bigint, t string")
    out = {(r["type_a"], r["type_b"]): r
           for r in cooccurrence_lift(df, "u", "t").collect()}
    ab = out[("a", "b")]
    assert ab["n_scopes"] == 4 and ab["n_both"] == 2
    assert ab["n_a"] == 3 and ab["n_b"] == 2
    assert ab["support"] == 0.5
    assert ab["lift"] == round(2 * 4 / (3 * 2), 6)
    assert ab["jaccard"] == round(2 / 3, 6)
    assert ("a", "c") not in out and ("b", "c") not in out


def test_vocab_coverage_curve_oracle(spark, duck):
    """Frequency-threshold coverage over the corpus vocabulary; ranged
    cumulative types/mass replayed in SQL."""
    from osmapreduceproject_spark.operators.text import vocab_coverage_curve

    got = vocab_coverage_curve(_t(spark, "documents"))
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.sort("min_count").toPandas()
    assert pdf.coverage.iloc[0] == 1.0  # the smallest cutoff covers all
    assert (pdf.coverage.diff().dropna() <= 1e-12).all()  # monotone down


def test_vocab_coverage_known_case(spark):
    """Pin: 'x x x y y z' → cutoffs 1/2/3 cover 6/6, 5/6, 3/6 of the
    token mass with 3/2/1 surviving types."""
    from osmapreduceproject_spark.operators.text import vocab_coverage_curve

    df = spark.createDataFrame([(1, "x x x y y z")], "doc_id bigint, text string")
    rows = {r["min_count"]: r for r in vocab_coverage_curve(df).collect()}
    assert rows[1]["types_ge"] == 3 and rows[1]["coverage"] == 1.0
    assert rows[2]["types_ge"] == 2 and rows[2]["mass_ge"] == 5
    assert rows[2]["coverage"] == round(5 / 6, 6)
    assert rows[3]["types_ge"] == 1 and rows[3]["coverage"] == 0.5


_SY_CH = "((31*m + 7*({p}*3 + {k}) + (({p}*3 + {k})*({p}*3 + {k})) % 251) % 256)"


def _sym_gray(p: str) -> str:
    return " + ".join(_SY_CH.format(p=p, k=k) for k in (0, 1, 2))


def test_image_symmetry_oracle(spark, duck):
    """Mirror-difference mass over the arithmetic RAW8 fixture; the
    oracle regenerates both halves pixel-for-pixel."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images,
        image_symmetry,
    )

    imgs = arith_raw_images(spark, n=64, width=16, height=12)
    got = image_symmetry(imgs)
    sql = f"""
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_px_pairs == 96).all()
    assert pdf.symmetry_score.between(0, 1).all()


def test_image_symmetry_known_cases(spark):
    """Pins: a mirror-symmetric frame scores exactly 1; an all-black
    frame has NULL score (0/0); a half-black/half-white frame scores
    1 − 765·pairs/hm computed by hand."""
    from osmapreduceproject_spark.operators.multimodal import image_symmetry

    meta = "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    sym_row = bytes([5, 5, 5, 9, 9, 9, 9, 9, 9, 5, 5, 5])  # [5,9,9,5] gray row
    sym = spark.createDataFrame(
        [(0, "image", sym_row * 2, (4, 2, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rs = image_symmetry(sym).first()
    assert rs["symmetry_score"] == 1.0 and rs["diff_mass"] == 0
    black = spark.createDataFrame(
        [(1, "image", bytes(24), (4, 2, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rb = image_symmetry(black).first()
    assert rb["symmetry_score"] is None and rb["half_mass"] == 0
    # left half white (255,255,255), right half black
    hw_row = bytes([255] * 6 + [0] * 6)
    hw = spark.createDataFrame(
        [(2, "image", hw_row * 2, (4, 2, None, 1))],
        f"media_id long, kind string, payload binary, {meta}",
    )
    rh = image_symmetry(hw).first()
    # per row: pairs (255·3 vs 0) ×2 → diff 765·2, masses 765·2
    assert rh["diff_mass"] == 765 * 4 and rh["half_mass"] == 765 * 4
    assert rh["symmetry_score"] == 0.0


def test_pq_reconstruction_error_oracle(spark, duck):
    """PQ encode distortion over the 64-d embeddings (m=4, 16 codes);
    the oracle replays codebook, per-subspace argmin, and the
    quantized error/norm means."""
    from osmapreduceproject_spark.operators.similarity import (
        pq_reconstruction_error,
    )

    got = pq_reconstruction_error(_t(spark, "embeddings"), m=4, k_codes=16)
    subdist = (
        "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_transform(range((s.j - 1) * 16 + 1, (s.j - 1) * 16 + 17), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) "
        "* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))), "
        "(x, y) -> x + y)"
    )
    selfdot = (
        "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_transform(range(1, 65), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )
    sql = f"""
    WITH cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
                       embedding AS cvec
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id LIMIT 16)),
    sub AS (SELECT unnest(range(1, 5)) AS j),
    enc AS (SELECT e.vec_id, s.j, MIN({subdist}) AS mind
            FROM embeddings e CROSS JOIN cb c CROSS JOIN sub s
            GROUP BY 1, 2),
    pv AS (SELECT vec_id, SUM(CAST(round(mind * 1000000) AS BIGINT)) AS eq
           FROM enc GROUP BY vec_id),
    nr AS (SELECT vec_id, CAST(round({selfdot} * 1000000) AS BIGINT) AS nq
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["mean_sq_error"] >= 0.0
    assert row["rel_error"] is not None and row["rel_error"] >= 0.0


def test_pq_reconstruction_known_cases(spark):
    """Pins: a corpus that IS the codebook reconstructs exactly (mse
    0); a midpoint vector loses the hand-computed distance."""
    from osmapreduceproject_spark.operators.similarity import (
        pq_reconstruction_error,
    )

    ident = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(2)],
        "vec_id bigint, embedding array<double>",
    )
    r0 = pq_reconstruction_error(ident, m=2, k_codes=2).first()
    assert r0["mean_sq_error"] == 0.0 and r0["rel_error"] == 0.0
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]),
         (1, [1.0, 1.0, 1.0, 1.0]),
         (2, [0.5, 0.5, 0.5, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    r = pq_reconstruction_error(df, m=2, k_codes=2).first()
    # v2: each 2-d subspace is 0.5 from both codes -> error 0.5 + 0.5
    assert r["n_vectors"] == 3
    assert r["mean_sq_error"] == round(1.0 / 3, 6)
    assert r["mean_vec_sq_norm"] == round((0.0 + 4.0 + 1.0) / 3, 6)
    assert r["rel_error"] == round((1.0 / 3) / (5.0 / 3), 6)


# ---------------------------------------------------------------------------
# third tranche (staged later in round 13; same gates)
# ---------------------------------------------------------------------------


def test_jonckheere_terpstra_oracle(spark, duck):
    """Ordered-groups trend over event-type value pools: pair U sums
    via the as-of cumulative probe, exact doubled-U integers, no-tie
    moments replayed in SQL (DuckDB ASOF JOIN mirrors the operator's
    asof_join)."""
    from osmapreduceproject_spark.operators.stats import jonckheere_terpstra

    got = jonckheere_terpstra(_t(spark, "events"), "event_type", "value")
    sql = """
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["jt_stat"] >= 0.0
    assert row["k_groups"] >= 2 and row["z"] is not None


def test_jonckheere_terpstra_known_cases(spark):
    """Pins: perfectly ordered groups hit the maximum JT = Σ nᵢnⱼ with
    the closed-form z; reversed order hits 0; an all-tied pool lands
    exactly on the null mean (z = 0)."""
    from osmapreduceproject_spark.operators.stats import jonckheere_terpstra

    up = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("c", 5.0), ("c", 6.0)]
    r = jonckheere_terpstra(
        spark.createDataFrame(up, "g string, v double"), "g", "v"
    ).first()
    assert r["jt_stat"] == 12.0 and r["mean_jt"] == 6.0
    var = (36 * 15 - 3 * (4 * 7)) / 72.0
    assert r["var_jt"] == round(var, 6)
    assert r["z"] == math.copysign(
        math.floor(abs(6.0 / math.sqrt(var)) * 1e6 + 0.5), 1
    ) / 1e6
    down = [(g, -v) for g, v in up]
    rd = jonckheere_terpstra(
        spark.createDataFrame(down, "g string, v double"), "g", "v"
    ).first()
    assert rd["jt_stat"] == 0.0 and rd["z"] == -r["z"]
    tied = [(g, 7.0) for g, _ in up]
    rt = jonckheere_terpstra(
        spark.createDataFrame(tied, "g string, v double"), "g", "v"
    ).first()
    assert rt["jt_stat"] == 6.0 and rt["z"] == 0.0


def test_video_shot_stats_oracle(spark, duck):
    """Shot structure over the q239 planted-cut fixture; the oracle
    regenerates every dHash and replays the island run lengths."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_shot_stats,
    )
    from osmapreduceproject_spark.queries_r9 import _scene_hash_sql

    frames = arith_video_frames(
        spark, n_videos=24, n_frames=12, cut_at=6, width=16, height=12,
        delta_bytes=12,
    )
    got = video_shot_stats(frames, max_hamming=10)
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
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    # the planted cut at frame 6 splits every clip into two 6-frame shots
    assert all(rows[m]["n_shots"] == 2 for m in range(24))
    assert all(rows[m]["longest_shot_frames"] == 6 for m in range(24))
    assert all(rows[m]["mean_shot_frames"] == 6.0 for m in range(24))


def test_video_shot_stats_known_cases(spark):
    """Pins: a cut-free clip is one shot spanning every frame; the
    shot axis counts ROWS, so sampled (gapped) indices still form one
    shot when content is continuous."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_shot_stats,
    )

    clean = arith_video_frames(
        spark, n_videos=2, n_frames=8, cut_at=8, width=16, height=12,
        delta_bytes=12,
    )
    rows = video_shot_stats(clean, max_hamming=10).collect()
    assert all(r["n_shots"] == 1 and r["n_cuts"] == 0 for r in rows)
    assert all(r["longest_shot_frames"] == 8 for r in rows)
    sampled = clean.where(F.col("frame_idx") % 2 == 0)
    rs = video_shot_stats(sampled, max_hamming=10).collect()
    assert all(r["n_frames"] == 4 and r["n_shots"] == 1 for r in rs)
