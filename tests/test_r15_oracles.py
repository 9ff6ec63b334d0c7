"""Cross-engine (DuckDB) parity for the r14-ready operators — the wave
staged a round ahead of its declaration (SURVEY.md §8 staging
discipline, eighth tranche after r8–r14; the file number continues the
test-file series, the DECLARATION round is r14). Every operator lands
with its oracle parity test in the same commit, so the future q-entry
is a copy-paste of (body, SQL) pairs already green. Same
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


# ---------------------------------------------------------------------------
# stats family
# ---------------------------------------------------------------------------

_KM_CHURN_US = 24 * 3600 * 1_000_000  # churned = inactive for the final day


def _km_frame(spark):
    """Per-user observed lifetime in whole hours + churn flag: the
    standard right-censored shaping (a user still active inside the
    final day of the stream is censored, not dead)."""
    ev = _t(spark, "events")
    us = F.unix_micros(F.col("ts"))
    per = ev.groupBy("user_id").agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    horizon = per.agg(F.max("__hi").alias("__hz"))
    return per.crossJoin(F.broadcast(horizon)).select(
        F.expr("(__hi - __lo) div 3600000000").cast("bigint").alias("dur_hours"),
        (F.col("__hi") < F.col("__hz") - F.lit(_KM_CHURN_US)).cast("int").alias(
            "churned"
        ),
    )


def test_kaplan_meier_oracle(spark, duck):
    """User-lifetime survival over events — at-risk counts via ranged
    prefix sums, quantized-ln survival product replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import kaplan_meier

    got = kaplan_meier(_km_frame(spark), "dur_hours", "churned")
    sql = f"""
    WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
               FROM events GROUP BY user_id),
    h AS (SELECT MAX(hi) AS hz FROM u),
    obs AS (SELECT CAST((hi - lo) // 3600000000 AS DOUBLE) AS t,
                   CASE WHEN hi < hz - {_KM_CHURN_US} THEN 1 ELSE 0 END AS e
            FROM u, h),
    per AS (SELECT t, COUNT(*) AS c, SUM(e) AS d FROM obs GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM per),
    cum AS (SELECT t, c, d, n, SUM(c) OVER (ORDER BY t) AS cc FROM per, tot),
    risk AS (SELECT t, c, d, n - (cc - c) AS nr FROM cum),
    de AS (SELECT t, nr, d, c - d AS cens,
                  CASE WHEN d < nr THEN CAST(round(
                    ln(CAST(nr - d AS DOUBLE) / nr) * 1000000) AS BIGINT)
                  ELSE 0 END AS qln,
                  CASE WHEN d = nr THEN 1 ELSE 0 END AS z
           FROM risk WHERE d > 0),
    fin AS (SELECT t, nr, d, cens,
                   SUM(qln) OVER (ORDER BY t) AS cq,
                   SUM(z) OVER (ORDER BY t) AS cz
            FROM de)
    SELECT t, CAST(nr AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
           CAST(cens AS BIGINT) AS n_censored,
           CASE WHEN cz > 0 THEN 0.0
                ELSE round(exp(CAST(cq AS DOUBLE) / 1000000), 6) END AS survival
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.orderBy("t").toPandas()
    assert len(pdf) > 0
    # survival is monotone non-increasing and in [0, 1]
    assert (pdf.survival.diff().dropna() <= 1e-12).all()
    assert pdf.survival.between(0.0, 1.0).all()


def test_kaplan_meier_known_case(spark):
    """Textbook pin: durations 1,2†,3,4† († censored) → S(1) = 3/4,
    S(3) = 3/8; a terminal death (d = n_risk) pins S to exact 0."""
    from osmapreduceproject_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)], "t double, e int"
    )
    rows = {r["t"]: r for r in kaplan_meier(df, "t", "e").collect()}
    assert set(rows) == {1.0, 3.0}
    assert rows[1.0]["n_risk"] == 4 and rows[1.0]["n_events"] == 1
    assert abs(rows[1.0]["survival"] - 0.75) < 1e-6
    assert rows[3.0]["n_risk"] == 2
    assert abs(rows[3.0]["survival"] - 0.375) < 1e-6
    term = spark.createDataFrame([(1.0, 1), (2.0, 1)], "t double, e int")
    rows = {r["t"]: r for r in kaplan_meier(term, "t", "e").collect()}
    assert rows[2.0]["survival"] == 0.0  # d = n_risk → exact zero


def test_kendall_tau_oracle(spark, duck):
    """τ-b between event value and props length per user — exact
    concordant/discordant/tie counts replayed by a per-key self-join."""
    from osmapreduceproject_spark.operators.stats import kendall_tau

    ev = _t(spark, "events").select(
        "user_id",
        F.col("value").cast("double").alias("v"),
        F.length("props").cast("double").alias("plen"),
    )
    got = kendall_tau(ev, "user_id", "v", "plen")
    sql = """
    WITH p AS (
      SELECT user_id AS k,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS qa,
             CAST(round(CAST(len(props) AS DOUBLE) * 1000000) AS BIGINT) AS qb,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND props IS NOT NULL),
    pr AS (SELECT a.k, sign(b.qa - a.qa) AS sa, sign(b.qb - a.qb) AS sb
           FROM p a JOIN p b ON a.k = b.k AND a.rn < b.rn),
    ag AS (SELECT k,
                  SUM(CASE WHEN sa * sb > 0 THEN 1 ELSE 0 END) AS c,
                  SUM(CASE WHEN sa * sb < 0 THEN 1 ELSE 0 END) AS d,
                  SUM(CASE WHEN sa != 0 THEN 1 ELSE 0 END) AS nza,
                  SUM(CASE WHEN sb != 0 THEN 1 ELSE 0 END) AS nzb
           FROM pr GROUP BY k),
    cnt AS (SELECT k, COUNT(*) AS n FROM p GROUP BY k)
    SELECT cnt.k AS user_id, CAST(cnt.n AS BIGINT) AS n,
           CAST(COALESCE(ag.c, 0) AS BIGINT) AS n_concordant,
           CAST(COALESCE(ag.d, 0) AS BIGINT) AS n_discordant,
           CASE WHEN ag.nza * ag.nzb > 0 THEN
             round((ag.c - ag.d)
                   / sqrt(CAST(ag.nza AS DOUBLE) * ag.nzb), 6) END AS tau_b
    FROM cnt LEFT JOIN ag ON ag.k = cnt.k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["tau_b"])
    assert pdf.tau_b.between(-1.0, 1.0).all()


def test_kendall_tau_known_cases(spark):
    """Pins: a strictly monotone pair has τ = 1; a reversed pair −1;
    an all-tied column NULL; the guard trips over max_rows."""
    from osmapreduceproject_spark.operators.stats import kendall_tau

    mono = spark.createDataFrame(
        [(1, 1.0, 10.0), (1, 2.0, 20.0), (1, 3.0, 30.0),
         (2, 1.0, 3.0), (2, 2.0, 2.0), (2, 3.0, 1.0)],
        "k long, a double, b double",
    )
    rows = {r["k"]: r for r in kendall_tau(mono, "k", "a", "b").collect()}
    assert rows[1]["tau_b"] == 1.0 and rows[2]["tau_b"] == -1.0
    tied = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, 5.0)], "k long, a double, b double"
    )
    assert kendall_tau(tied, "k", "a", "b").first()["tau_b"] is None
    with pytest.raises(Exception, match="max_rows"):
        kendall_tau(mono, "k", "a", "b", max_rows=2).collect()


def test_dispersion_index_oracle(spark, duck):
    """Hourly arrival counts per event type over the GLOBAL stream span
    (empty windows are zeros) — integer moments, one fixed finalize."""
    from osmapreduceproject_spark.operators.stats import dispersion_index

    got = dispersion_index(_t(spark, "events"), "ts", "event_type", 3600)
    sql = """
    WITH p AS (SELECT event_type AS g, epoch_us(ts) // 3600000000 AS w
               FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    span AS (SELECT MAX(w) - MIN(w) + 1 AS nw FROM p),
    cells AS (SELECT g, w, COUNT(*) AS c FROM p GROUP BY 1, 2),
    per AS (SELECT g, SUM(CAST(c AS HUGEINT)) AS s,
                   SUM(CAST(c AS HUGEINT) * c) AS s2
            FROM cells GROUP BY g)
    SELECT g AS event_type, CAST(s AS BIGINT) AS n_events,
           CAST(nw AS BIGINT) AS n_windows,
           round(CAST(s AS DOUBLE) / nw, 6) AS mean_per_window,
           round((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nw)
                 / nw, 6) AS variance,
           CASE WHEN s > 0 THEN round(
             ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nw)
              / nw) / (CAST(s AS DOUBLE) / nw), 6) END AS dispersion_index
    FROM per, span
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.dispersion_index > 0).all()
    # every type shares the one global window span
    assert pdf.n_windows.nunique() == 1


def test_dispersion_index_known_case(spark):
    """Pin: a perfectly regular stream (1 event per window) has
    dispersion 0... over its own span; a one-burst stream is maximally
    clumped (index = mean·(W−1)/W·W/... > 1)."""
    from osmapreduceproject_spark.operators.stats import dispersion_index

    regular = spark.createDataFrame(
        [(h * 3_600_000_000 + 1_800_000_000, "a") for h in range(10)],
        "us long, g string",
    ).select(F.timestamp_micros("us").alias("ts"), "g")
    r = dispersion_index(regular, "ts", "g", 3600).first()
    assert r["n_windows"] == 10 and r["mean_per_window"] == 1.0
    assert r["dispersion_index"] == 0.0
    burst = spark.createDataFrame(
        [(1_800_000_000, "a")] * 9 + [(9 * 3_600_000_000 + 1_800_000_000, "a")],
        "us long, g string",
    ).select(F.timestamp_micros("us").alias("ts"), "g")
    b = dispersion_index(burst, "ts", "g", 3600).first()
    assert b["n_windows"] == 10 and b["dispersion_index"] > 1.0


def test_grubbs_oracle(spark, duck):
    """Max studentized deviate per event type — quantized moments, the
    suspect value from the min/max closed form, no join-back."""
    from osmapreduceproject_spark.operators.stats import grubbs_test

    got = grubbs_test(_t(spark, "events"), "event_type", "value")
    sql = """
    WITH p AS (
      SELECT event_type AS g,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    per AS (SELECT g, COUNT(*) AS n, SUM(CAST(q AS HUGEINT)) AS s,
                   SUM(CAST(q AS HUGEINT) * q) AS s2,
                   MIN(q) AS lo, MAX(q) AS hi
            FROM p GROUP BY g),
    fin AS (SELECT g, n, lo, hi,
                   CAST(s AS DOUBLE) / n AS mq,
                   (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                     / (n - 1.0) AS vq
            FROM per)
    SELECT g AS event_type, CAST(n AS BIGINT) AS n,
           round(mq / 1000000, 6) AS mean,
           CASE WHEN n >= 2 THEN round(sqrt(vq) / 1000000, 6) END AS stddev,
           CASE WHEN n >= 3 AND vq > 0 THEN
             round(greatest(hi - mq, mq - lo) / sqrt(vq), 6) END AS g_stat,
           CASE WHEN n >= 3 AND vq > 0 THEN
             CASE WHEN hi - mq >= mq - lo THEN CAST(hi AS DOUBLE) / 1000000
                  ELSE CAST(lo AS DOUBLE) / 1000000 END END AS outlier_value,
           CASE WHEN n >= 3 AND vq > 0 THEN
             CASE WHEN hi - mq >= mq - lo THEN 'high' ELSE 'low' END
           END AS outlier_side
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["g_stat"])
    assert (pdf.g_stat > 0).all()
    # G is bounded by (n−1)/√n
    import math

    assert all(
        r.g_stat <= (r.n - 1) / math.sqrt(r.n) + 1e-9 for r in pdf.itertuples()
    )


def test_grubbs_known_cases(spark):
    """Pins: one planted spike dominates (side=high); a constant group
    and an n<3 group emit NULL G."""
    from osmapreduceproject_spark.operators.stats import grubbs_test

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.1), ("a", 0.9), ("a", 1.05), ("a", 9.0),
         ("b", 5.0), ("b", 5.0), ("b", 5.0),
         ("c", 1.0), ("c", 2.0)],
        "g string, v double",
    )
    rows = {r["g"]: r for r in grubbs_test(df, "g", "v").collect()}
    assert rows["a"]["outlier_side"] == "high"
    assert rows["a"]["outlier_value"] == 9.0
    assert rows["a"]["g_stat"] > 1.5
    assert rows["b"]["g_stat"] is None  # zero variance
    assert rows["c"]["g_stat"] is None  # n < 3


# ---------------------------------------------------------------------------
# events / windows families
# ---------------------------------------------------------------------------


def test_markov_stationary_oracle(spark, duck):
    """Power iteration on integer picoprobabilities — 8 chained SQL
    iterations sum the IDENTICAL integers the driver-side loop sums."""
    from osmapreduceproject_spark.operators.events import markov_stationary

    got = markov_stationary(_t(spark, "events"))
    its = ["it0 AS (SELECT s.s AS j, CAST(floor(1000000000000.0 / ns.c + 0.5)"
           " AS BIGINT) AS pi FROM states s, ns)"]
    for k in range(1, 9):
        its.append(
            f"it{k} AS (SELECT p.j AS j, CAST(SUM(CAST(floor(it{k-1}.pi * p.p"
            f" + 0.5) AS BIGINT)) AS BIGINT) AS pi FROM it{k-1}"
            f" JOIN p ON p.i = it{k-1}.j GROUP BY p.j)"
        )
    sql = f"""
    WITH pairs AS (
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
          WHERE s.s NOT IN (SELECT f FROM tot)),
    {", ".join(its)}
    SELECT s.s AS state, CAST(COALESCE(tot.tn, 0) AS BIGINT) AS n_out,
           CAST(COALESCE(it8.pi, 0) AS DOUBLE) / 1000000000000.0
             AS stationary_prob
    FROM states s LEFT JOIN tot ON tot.f = s.s LEFT JOIN it8 ON it8.j = s.s
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    # probability mass is conserved to quantization (≤ s·0.5 pico each step)
    assert abs(pdf.stationary_prob.sum() - 1.0) < 1e-6
    assert (pdf.stationary_prob >= 0).all()


def test_markov_stationary_known_cases(spark):
    """Pins: a 2-cycle a↔b settles at (0.5, 0.5); an absorbing terminal
    state swallows all mass in one step; the state guard trips."""
    from osmapreduceproject_spark.operators.events import markov_stationary

    def ev(seq):
        return spark.createDataFrame(
            [(i, f"2024-01-01 00:00:{i:02d}", 1, s) for i, s in enumerate(seq)],
            "event_id long, ts string, user_id long, event_type string",
        ).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )

    cyc = {r["state"]: r for r in markov_stationary(ev("ababa")).collect()}
    assert abs(cyc["a"]["stationary_prob"] - 0.5) < 1e-9
    assert abs(cyc["b"]["stationary_prob"] - 0.5) < 1e-9
    absb = {r["state"]: r for r in markov_stationary(ev("ab")).collect()}
    assert absb["b"]["stationary_prob"] == 1.0
    assert absb["b"]["n_out"] == 0  # terminal: never transitions out
    # with an a→a self-loop, residual mass decays geometrically:
    # after 8 iterations exactly 0.5·(1/2)⁸ remains in a
    loop = {r["state"]: r for r in markov_stationary(ev("aab")).collect()}
    assert loop["a"]["stationary_prob"] == 0.001953125
    assert loop["b"]["stationary_prob"] == 0.998046875
    with pytest.raises(Exception, match="max_states"):
        markov_stationary(ev("abcde"), max_states=3)


def test_periodogram_oracle(spark, duck):
    """Fixed-period DFT power per user over the hourly grid — quantized
    trig terms with a pinned 2π literal, replayed in SQL."""
    from osmapreduceproject_spark.operators.windows import periodogram

    got = periodogram(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=3600,
    )
    sql = """
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e,
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
    scored AS (SELECT k, p, CAST(n AS BIGINT) AS n_slots,
                 round((CAST(aq AS DOUBLE) / 1000000 * (CAST(aq AS DOUBLE) / 1000000)
                        + CAST(bq AS DOUBLE) / 1000000 * (CAST(bq AS DOUBLE) / 1000000))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS power
               FROM g)
    SELECT k AS user_id, CAST(p AS INTEGER) AS period, n_slots, power,
           (row_number() OVER (PARTITION BY k ORDER BY power DESC, p ASC) = 1)
             AS is_best
    FROM scored
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.power >= 0).all()
    assert pdf.groupby("user_id").is_best.sum().eq(1).all()


def test_periodogram_known_case(spark):
    """Pin: a pure period-4 sine lattice (0, 1, 0, −1 repeating over 24
    hourly slots) peaks at period 4 with power 0.25; the 8/12-slot
    candidates see only a harmonic (≈0)."""
    from osmapreduceproject_spark.operators.windows import periodogram

    vals = [0.0, 1.0, 0.0, -1.0] * 6
    # epoch-micros construction: hostile-session-TZ-proof (a naive
    # string cast would shift slot boundaries under a +8:45 zone)
    rows = [(i, i * 3_600_000_000, 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, value double"
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"),
        "user_id", "value",
    )
    got = {r["period"]: r for r in
           periodogram(df, "user_id", "ts", "value", 3600).collect()}
    assert got[4]["is_best"]
    assert abs(got[4]["power"] - 0.25) < 1e-3
    for p in (2, 3, 6, 8, 12):
        assert got[p]["power"] < 0.01


# ---------------------------------------------------------------------------
# similarity / text / dedup families
# ---------------------------------------------------------------------------


def test_centroid_similarity_oracle(spark, duck):
    """Label-centroid cosine matrix over embeddings — quantized per-dim
    means, re-quantized products, bounded pair join replayed in SQL."""
    from osmapreduceproject_spark.operators.similarity import centroid_similarity

    got = centroid_similarity(_t(spark, "embeddings"), "label")
    sql = """
    WITH ex AS (
      SELECT label AS g, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u),
    cent AS (SELECT g, pos, SUM(CAST(q AS HUGEINT)) AS s, COUNT(*) AS n
             FROM ex GROUP BY 1, 2),
    m AS (SELECT g, pos, CAST(s AS DOUBLE) / n AS m FROM cent),
    norms AS (SELECT g, SUM(CAST(round(m * m / 1000000) AS BIGINT)) AS nrm
              FROM m GROUP BY g),
    counts AS (SELECT label AS g, COUNT(*) AS cnt FROM embeddings
               WHERE embedding IS NOT NULL GROUP BY 1),
    dots AS (SELECT a.g AS ga, b.g AS gb,
                    SUM(CAST(round(a.m * b.m / 1000000) AS BIGINT)) AS dot
             FROM m a JOIN m b ON a.pos = b.pos AND a.g < b.g GROUP BY 1, 2)
    SELECT d.ga AS group_a, d.gb AS group_b,
           CAST(ca.cnt AS BIGINT) AS n_a, CAST(cb.cnt AS BIGINT) AS n_b,
           CASE WHEN na.nrm > 0 AND nb.nrm > 0 THEN
             round(CAST(d.dot AS DOUBLE)
                   / sqrt(CAST(na.nrm AS DOUBLE) * nb.nrm), 6) END AS cosine
    FROM dots d JOIN norms na ON na.g = d.ga JOIN norms nb ON nb.g = d.gb
                JOIN counts ca ON ca.g = d.ga JOIN counts cb ON cb.g = d.gb
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    n_labels = pdf[["group_a", "group_b"]].stack().nunique()
    assert len(pdf) == n_labels * (n_labels - 1) // 2
    assert pdf.cosine.between(-1.0 - 1e-9, 1.0 + 1e-9).all()


def test_centroid_similarity_known_cases(spark):
    """Pins: identical centroids → cosine 1; orthogonal → 0; a
    NULL-vector row does not inflate n_a/n_b (ADVICE r12 — the counts
    describe the population the centroid averages)."""
    from osmapreduceproject_spark.operators.similarity import centroid_similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [1.0, 0.0]), (1, None),
         (2, [2.0, 0.0]),
         (3, [0.0, 3.0])],
        "label int, embedding array<float>",
    )
    out = {(r["group_a"], r["group_b"]): r
           for r in centroid_similarity(df, "label").collect()}
    rows = {k: r["cosine"] for k, r in out.items()}
    assert abs(rows[(1, 2)] - 1.0) < 1e-6  # parallel
    assert abs(rows[(1, 3)]) < 1e-6        # orthogonal
    assert abs(rows[(2, 3)]) < 1e-6
    assert out[(1, 2)]["n_a"] == 2  # the NULL-vector row is not counted


def test_mojibake_report_oracle(spark, duck):
    """Encoding-damage markers per source — integer length deltas,
    global regexp strips on both engines."""
    from osmapreduceproject_spark.operators.text import mojibake_report

    got = mojibake_report(_t(spark, "documents"))
    sql = r"""
    WITH d AS (SELECT source, COALESCE(text, '') AS t FROM documents),
    per AS (SELECT source, length(t) AS len,
      CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT) AS repl,
      CAST(length(t) - length(regexp_replace(t,
        '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')) AS BIGINT) AS ctrl,
      CAST((length(t) - length(replace(t, 'â€', ''))) / 2 AS BIGINT) AS seq,
      CAST(length(t) - length(replace(t, 'Ã', '')) AS BIGINT) AS at
      FROM d)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN repl + ctrl + seq > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(SUM(repl) AS BIGINT) AS n_replacement,
           CAST(SUM(ctrl) AS BIGINT) AS n_control,
           CAST(SUM(seq) AS BIGINT) AS n_utf8_digraph,
           CAST(SUM(at) AS BIGINT) AS n_a_tilde,
           CASE WHEN SUM(len) > 0 THEN
             round(CAST(SUM(repl) + SUM(ctrl) + SUM(seq) AS DOUBLE) * 1000
                   / SUM(len), 6) END AS markers_per_kchar
    FROM per GROUP BY source
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_mojibake_report_known_case(spark):
    """Pin: planted damage — one replacement char, one control byte, one
    â€-digraph, one legitimate Ã (informational, unflagged)."""
    from osmapreduceproject_spark.operators.text import mojibake_report

    df = spark.createDataFrame(
        [(1, "clean text here", "s1"),
         (2, "bad � char", "s1"),
         (3, "ctrl\x07bell", "s1"),
         (4, "donâ€™t decode twice", "s2"),
         (5, "SÃO PAULO", "s2"),  # Ã alone must NOT flag
         (6, None, "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in mojibake_report(df).collect()}
    s1, s2 = rows["s1"], rows["s2"]
    assert s1["n_docs"] == 3 and s1["n_flagged"] == 2
    assert s1["n_replacement"] == 1 and s1["n_control"] == 1
    assert s2["n_docs"] == 3 and s2["n_flagged"] == 1
    assert s2["n_utf8_digraph"] == 1
    assert s2["n_a_tilde"] == 1  # counted, not flagged


def test_bigram_conditional_entropy_oracle(spark, duck):
    """H(next|token) per source — bigram/prefix counts from one pair
    population, quantized log terms replayed in SQL."""
    from osmapreduceproject_spark.operators.text import bigram_conditional_entropy

    got = bigram_conditional_entropy(_t(spark, "documents"))
    sql = """
    WITH t AS (SELECT source, string_split(text, ' ') AS a
               FROM documents WHERE text IS NOT NULL),
    big AS (SELECT source, a[i] AS x, a[i + 1] AS y
            FROM t, LATERAL (SELECT unnest(range(1, len(a))) AS i) u
            WHERE len(a) >= 2),
    cxy AS (SELECT source, x, y, COUNT(*) AS c FROM big GROUP BY 1, 2, 3),
    cx AS (SELECT source, x, SUM(c) AS cx FROM cxy GROUP BY 1, 2),
    j AS (SELECT cxy.source, cxy.x, cxy.c,
                 CAST(round(cxy.c * log2(CAST(cxy.c AS DOUBLE) / cx.cx)
                            * 1000000) AS BIGINT) AS t
          FROM cxy JOIN cx ON cx.source = cxy.source AND cx.x = cxy.x)
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
           CAST(COUNT(DISTINCT x) AS BIGINT) AS n_prefix_types,
           round(-CAST(SUM(t) AS DOUBLE) / 1000000 / SUM(c), 6)
             AS cond_entropy_bits
    FROM j GROUP BY source
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.cond_entropy_bits >= -1e-9).all()


def test_bigram_conditional_entropy_known_cases(spark):
    """Pins: a perfect loop (a b a b …) is fully predictable (H = 0);
    a uniform 2-way branch from one prefix is exactly 1 bit."""
    from osmapreduceproject_spark.operators.text import bigram_conditional_entropy

    df = spark.createDataFrame(
        [(1, "a b a b a", "loop"),
         (2, "a b", "branch"), (3, "a c", "branch")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in bigram_conditional_entropy(df).collect()}
    assert rows["loop"]["cond_entropy_bits"] == 0.0
    assert abs(rows["branch"]["cond_entropy_bits"] - 1.0) < 1e-6
    assert rows["branch"]["n_prefix_types"] == 1


def test_soft_dedup_weights_oracle(spark, duck):
    """1/cluster-size training weights over the SAME near-dup clusters
    as the hard-dedup path — per-source effective mass in SQL."""
    from osmapreduceproject_spark.operators.dedup import soft_dedup_weights
    from osmapreduceproject_spark.queries import _JACCARD_PAIRS_CTE

    got = soft_dedup_weights(_t(spark, "documents"))
    sql = f"""
    WITH RECURSIVE
    {_JACCARD_PAIRS_CTE},
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    walk AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.src AS node, w.label FROM edges e JOIN walk w ON w.node = e.dst),
    clusters AS (SELECT node AS doc_id, MIN(label) AS cluster_id
                 FROM walk GROUP BY node),
    ksz AS (SELECT cluster_id, COUNT(*) AS k FROM clusters GROUP BY 1),
    wts AS (SELECT c.doc_id,
                   CAST(floor(1000000.0 / s.k + 0.5) AS BIGINT) AS wq
            FROM clusters c JOIN ksz s USING (cluster_id)),
    g AS (SELECT d.source, COUNT(*) AS n, SUM(w.wq) AS eff
          FROM wts w JOIN documents d ON d.doc_id = w.doc_id GROUP BY 1)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(CAST(eff AS DOUBLE) / 1000000, 6) AS effective_docs,
           round(1.0 - CAST(eff AS DOUBLE) / 1000000 / n, 6) AS dedup_discount
    FROM g
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.effective_docs <= pdf.n_docs + 1e-9).all()
    assert pdf.dedup_discount.between(0.0, 1.0).all()


def test_soft_dedup_weights_known_case(spark):
    """Pin: 3 exact copies + 1 unique in one source → effective mass
    3·(1/3) + 1 = 2 of 4 raw, discount 0.5; singletons weigh 1."""
    from osmapreduceproject_spark.operators.dedup import soft_dedup_weights

    body = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, body, "s"), (2, body, "s"), (3, body, "s"),
         (4, "совершенно другой текст без общих слов вовсе", "s")],
        "doc_id long, text string, source string",
    )
    r = soft_dedup_weights(df).first()
    assert r["n_docs"] == 4
    assert abs(r["effective_docs"] - 2.0) < 1e-5
    assert abs(r["dedup_discount"] - 0.5) < 1e-5


# ---------------------------------------------------------------------------
# multimodal family
# ---------------------------------------------------------------------------

# the arith_raw_images pixel formula as a SQL fragment (i is an expression)
def _px(i: str) -> str:
    return f"((31*m + 7*({i}) + (({i})*({i}))%251) % 256)"


def test_image_blur_score_oracle(spark, duck):
    """Laplacian-variance sharpness over the mixed sharp/blurred
    arithmetic fixture — the oracle regenerates every byte (including
    the odd-id 3-tap floor blur) and replays the exact finalize."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images_blurred,
        image_blur_score,
    )

    imgs = arith_raw_images_blurred(spark, n=64, width=16, height=12)
    got = image_blur_score(imgs)
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    px AS (SELECT m, unnest(range(576)) AS i FROM mm),
    bl AS (SELECT m, i,
             CASE WHEN m % 2 = 1 AND ((i // 3) % 16) BETWEEN 1 AND 14
                  THEN ({_px('i-3')} + {_px('i')} + {_px('i+3')}) // 3
                  ELSE {_px('i')} END AS v
           FROM px),
    gray AS (SELECT m, i // 48 AS y, (i // 3) % 16 AS x, SUM(v) AS gv
             FROM bl GROUP BY 1, 2, 3),
    g2 AS (SELECT m, y, x, gv, lag(gv) OVER w AS gl, lead(gv) OVER w AS gr
           FROM gray WINDOW w AS (PARTITION BY m, y ORDER BY x)),
    lap AS (SELECT m, 2*gv - gl - gr AS l FROM g2
            WHERE gl IS NOT NULL AND gr IS NOT NULL),
    agg AS (SELECT m, COUNT(*) AS n, SUM(l) AS s,
                   SUM(CAST(l AS HUGEINT)*l) AS s2, SUM(ABS(l)) AS sa
            FROM lap GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_lap,
           floor((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/n
                 * 1000000 + 0.5) / 1000000 AS lap_var,
           floor(CAST(sa AS DOUBLE)/n * 1000000 + 0.5) / 1000000 AS mean_abs_lap
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    # the planted blur must collapse second-derivative energy
    sharp = pdf[pdf.media_id % 2 == 0].lap_var.mean()
    blurred = pdf[pdf.media_id % 2 == 1].lap_var.mean()
    assert blurred < sharp * 0.6


def test_image_blur_score_known_case(spark):
    """Pin: a constant image has zero Laplacian variance; a one-column
    impulse has a hand-computable one."""
    from osmapreduceproject_spark.operators.multimodal import image_blur_score

    flat = spark.createDataFrame(
        [(0, "image", bytes([7, 7, 7] * 16), (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = image_blur_score(flat).first()
    assert r["n_lap"] == 8  # (w−2)·h = 2·4
    assert r["lap_var"] == 0.0 and r["mean_abs_lap"] == 0.0
    bad = spark.createDataFrame(
        [(1, "image", bytes([1, 2, 3]), (4, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    with pytest.raises(Exception, match="RAW8"):
        image_blur_score(bad).collect()


def test_video_black_frames_oracle(spark, duck):
    """Planted fade-to-black span — integer luma-sum threshold, island
    runs, every byte regenerated in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames_black,
        video_black_frames,
    )

    vids = arith_video_frames_black(
        spark, n_videos=24, n_frames=12, black_from=5, black_len=3
    )
    got = video_black_frames(vids)
    sql = """
    WITH mm AS (SELECT unnest(range(288)) AS id),
    fr AS (SELECT id // 12 AS m, id % 12 AS f FROM mm),
    px AS (SELECT m, f, unnest(range(576)) AS i FROM fr),
    v AS (SELECT m, f,
            CASE WHEN f BETWEEN 5 AND 7
                 THEN ((31*m + 7*i + (i*i)%251) % 8)
                 ELSE ((31*m + 7*i + (i*i)%251
                        + f * (CASE WHEN i < 12 THEN 1 ELSE 0 END)) % 256)
            END AS b
          FROM px),
    s AS (SELECT m, f, SUM(b) AS lsum, COUNT(*) AS sz FROM v GROUP BY 1, 2),
    mk AS (SELECT m, f, CASE WHEN lsum < 32 * sz THEN 1 ELSE 0 END AS blk FROM s),
    bl AS (SELECT m, f, f - row_number() OVER (PARTITION BY m ORDER BY f) AS grp
           FROM mk WHERE blk = 1),
    runs AS (SELECT m, MAX(cnt) AS longest
             FROM (SELECT m, grp, COUNT(*) AS cnt FROM bl GROUP BY 1, 2)
             GROUP BY m),
    base AS (SELECT m, COUNT(*) AS nf, SUM(blk) AS nb FROM mk GROUP BY m)
    SELECT CAST(base.m AS BIGINT) AS media_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(nb AS BIGINT) AS n_black,
           round(CAST(nb AS DOUBLE) / nf, 6) AS black_frac,
           CAST(COALESCE(longest, 0) AS BIGINT) AS longest_black_run
    FROM base LEFT JOIN runs ON runs.m = base.m
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_black == 3).all()
    assert (pdf.longest_black_run == 3).all()
    assert (pdf.black_frac == 0.25).all()


def test_video_black_frames_known_cases(spark):
    """Pins: a clean video reports zero; sampled (even-only) frame
    indices never merge separated black frames into one run."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_video_frames,
        video_black_frames,
    )

    clean = arith_video_frames(spark, n_videos=2, n_frames=6)
    pdf = video_black_frames(clean).toPandas()
    assert (pdf.n_black == 0).all()
    assert (pdf.longest_black_run == 0).all()
    dark = bytes([0] * 48)
    lit = bytes([200] * 48)
    rows = [
        # frame indices 0,2,4,6: two black frames at 2 and 6, separated
        (0, "video", 0, lit), (0, "video", 2, dark),
        (0, "video", 4, lit), (0, "video", 6, dark),
    ]
    df = spark.createDataFrame(
        [(m, k, f, p, (4, 4, None, 4)) for m, k, f, p in rows],
        "media_id long, kind string, frame_idx int, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = video_black_frames(df).first()
    assert r["n_black"] == 2 and r["longest_black_run"] == 1


# ---------------------------------------------------------------------------
# gated scale smokes (SPARK_GRAFT_SCALE=1)
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M durations through Kaplan-Meier)",
)
def test_kaplan_meier_scale_smoke(spark):
    """10M right-censored durations over ~100k distinct values through
    both ranged-cumsum passes (at-risk counts + survival product):
    S starts at (N − d₁-share)/N-ish, stays monotone, and the at-risk
    count at the smallest death time equals the full pool — never a
    global sort, never a single-partition window."""
    from osmapreduceproject_spark.operators.stats import kaplan_meier

    df = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100_003)).cast("double").alias("t"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2)).cast("int").alias("e"),
    )
    km = kaplan_meier(df, "t", "e")
    first = km.orderBy("t").first()
    assert first["n_risk"] == 10_000_000
    pdf = km.orderBy("t").toPandas()
    assert len(pdf) > 50_000
    assert (pdf.survival.diff().dropna() <= 1e-12).all()
    assert pdf.survival.between(0.0, 1.0).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (2M grid slots / 12M trig terms)",
)
def test_periodogram_scale_smoke(spark):
    """1,000 keys × 2,000 hourly slots (2M grid rows, 12M quantized trig
    terms across 6 candidate periods): every key reports exactly six
    candidates, one best, n_slots = 2,000 — the grid and the term
    explode stay key-partitioned at volume."""
    from osmapreduceproject_spark.operators.windows import periodogram

    n_keys, n_slots = 1_000, 2_000
    df = spark.range(n_keys * n_slots).select(
        (F.col("id") / n_slots).cast("bigint").alias("user_id"),
        F.timestamp_micros(
            (F.col("id") % n_slots) * F.lit(3_600_000_000)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 100.0).alias(
            "value"
        ),
    )
    pg = periodogram(df, "user_id", "ts", "value", 3600)
    agg = pg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.sum(F.col("is_best").cast("int")).alias("n_best"),
        F.min("n_slots").alias("min_slots"),
    )
    bad = agg.where(
        (F.col("n_cand") != 6) | (F.col("n_best") != 1)
        | (F.col("min_slots") != n_slots)
    ).count()
    assert bad == 0
    assert pg.where(F.col("power") < 0).count() == 0


def test_markov_stationary_null_types(spark):
    """A NULL event type is not a state: it is excluded before pairing,
    so a,NULL,b contributes the a→b transition (documented)."""
    from osmapreduceproject_spark.operators.events import markov_stationary

    df = spark.createDataFrame(
        [(0, 0, 1, "a"), (1, 1_000_000, 1, None), (2, 2_000_000, 1, "b")],
        "event_id long, us long, user_id long, event_type string",
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"),
        "user_id", "event_type",
    )
    rows = {r["state"]: r for r in markov_stationary(df).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_out"] == 1  # the a→b pair bridged the NULL
    assert rows["b"]["stationary_prob"] == 1.0


def test_image_blur_score_degenerate_width(spark):
    """Width < 3 has no interior column: zero Laplacian support, NULL
    scores — not a crash, not a fake zero."""
    from osmapreduceproject_spark.operators.multimodal import image_blur_score

    thin = spark.createDataFrame(
        [(0, "image", bytes([5, 5, 5] * 2 * 4), (2, 4, None, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = image_blur_score(thin).first()
    assert r["n_lap"] == 0
    assert r["lap_var"] is None and r["mean_abs_lap"] is None


# ---------------------------------------------------------------------------
# second r14-wave tranche: partial correlation, Hurst, embedding dedup,
# audio dynamic range
# ---------------------------------------------------------------------------


def test_partial_correlation_oracle(spark, duck):
    """r(value, props-length | stream-hour): exact HUGEINT covariance
    terms into one fixed-order finalize, replayed in SQL."""
    from osmapreduceproject_spark.operators.stats import partial_correlation

    ev = _t(spark, "events").select(
        F.col("value").alias("v"),
        F.length("props").cast("double").alias("plen"),
        (F.unix_micros("ts") / F.lit(3600000000.0)).alias("hrs"),
    )
    got = partial_correlation(ev, "v", "plen", "hrs")
    sql = """
    WITH pool AS (
      SELECT CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS x,
             CAST(round(CAST(len(props) AS DOUBLE) * 1000000) AS BIGINT) AS y,
             CAST(round((epoch_us(ts) / 3600000000.0) * 1000000) AS BIGINT) AS z
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND props IS NOT NULL AND ts IS NOT NULL),
    s AS (SELECT COUNT(*) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(z AS HUGEINT)) AS sz,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy,
                 SUM(CAST(z AS HUGEINT) * z) AS szz,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * z) AS sxz,
                 SUM(CAST(y AS HUGEINT) * z) AS syz
          FROM pool),
    v AS (SELECT n, n*sxx - sx*sx AS vxx, n*syy - sy*sy AS vyy,
                 n*szz - sz*sz AS vzz, n*sxy - sx*sy AS vxy,
                 n*sxz - sx*sz AS vxz, n*syz - sy*sz AS vyz
          FROM s),
    r AS (SELECT n,
            CAST(vxy AS DOUBLE) / sqrt(CAST(vxx AS DOUBLE) * CAST(vyy AS DOUBLE)) AS rxy,
            CAST(vxz AS DOUBLE) / sqrt(CAST(vxx AS DOUBLE) * CAST(vzz AS DOUBLE)) AS rxz,
            CAST(vyz AS DOUBLE) / sqrt(CAST(vyy AS DOUBLE) * CAST(vzz AS DOUBLE)) AS ryz
          FROM v WHERE vxx > 0 AND vyy > 0 AND vzz > 0)
    SELECT CAST(n AS BIGINT) AS n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           CASE WHEN (1 - rxz*rxz) * (1 - ryz*ryz) > 0 THEN
             round((rxy - rxz*ryz) / sqrt((1 - rxz*rxz) * (1 - ryz*ryz)), 6)
           END AS partial_r
    FROM r
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    for c in ("r_xy", "r_xz", "r_yz", "partial_r"):
        if r[c] is not None:
            assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9


def test_partial_correlation_known_cases(spark):
    """Pin: y = x exactly, z independent-ish → partial ≈ 1; y = z (x
    spurious through z) → controlling z kills the x–y correlation."""
    from osmapreduceproject_spark.operators.stats import partial_correlation

    rows = [(float(i), float(i), float((i * 7) % 5)) for i in range(40)]
    direct = partial_correlation(
        spark.createDataFrame(rows, "x double, y double, z double"),
        "x", "y", "z",
    ).first()
    assert direct["r_xy"] == 1.0 and abs(direct["partial_r"] - 1.0) < 1e-6
    # x and y only co-move through z: y = z, x = z + alternating noise
    rows2 = [
        (float(z + (0.5 if i % 2 else -0.5)), float(z), float(z))
        for i, z in enumerate([j % 7 for j in range(42)])
    ]
    spurious = partial_correlation(
        spark.createDataFrame(rows2, "x double, y double, z double"),
        "x", "y", "z",
    ).first()
    assert spurious["r_xy"] > 0.9  # raw correlation looks strong
    assert spurious["partial_r"] is None or abs(spurious["partial_r"]) < 0.05


def test_hurst_exponent_oracle(spark, duck):
    """R/S analysis per user over the hourly grid — integer centered
    cumulative sums, quantized block R/S, quantized log–log OLS."""
    from osmapreduceproject_spark.operators.windows import hurst_exponent

    got = hurst_exponent(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=3600,
    )
    sql = """
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e,
                        CAST(value AS DOUBLE) AS v FROM events),
    o2 AS (SELECT k, e, MAX(v) AS v FROM obs GROUP BY 1, 2),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM o2 GROUP BY k),
    grid AS (SELECT k, unnest(range(
               CAST(ceil(lo / 3600000000.0) * 3600000000 AS BIGINT),
               CAST(floor(hi / 3600000000.0) * 3600000000 AS BIGINT) + 1,
               3600000000)) AS e
             FROM spans),
    rs_g AS (SELECT g.k, g.e // 1000000 AS slot_epoch, o.v
             FROM grid g ASOF JOIN o2 o ON g.k = o.k AND o.e <= g.e),
    q AS (SELECT k, slot_epoch, CAST(round(v * 1000000) AS BIGINT) AS q
          FROM rs_g WHERE v IS NOT NULL),
    s0 AS (SELECT k, MIN(slot_epoch) AS s0 FROM q GROUP BY k),
    t AS (SELECT q.k, (q.slot_epoch - s0.s0) // 3600 AS t, q.q
          FROM q JOIN s0 ON s0.k = q.k),
    sz AS (SELECT t.k, ww.w, t.t % ww.w AS i, t.t // ww.w AS b, t.q
           FROM t, (SELECT unnest([8, 16, 32, 64]) AS w) ww),
    blocks AS (SELECT k, w, b, COUNT(*) AS cnt,
                      SUM(CAST(q AS HUGEINT)) AS sq,
                      SUM(CAST(q AS HUGEINT) * q) AS s2
               FROM sz GROUP BY 1, 2, 3),
    run AS (SELECT sz.k, sz.w, sz.b, blocks.sq, blocks.s2,
              CAST(sz.w AS BIGINT)
                * SUM(sz.q) OVER (PARTITION BY sz.k, sz.w, sz.b ORDER BY sz.i)
              - (row_number() OVER (PARTITION BY sz.k, sz.w, sz.b ORDER BY sz.i))
                * CAST(blocks.sq AS BIGINT) AS cd
            FROM sz JOIN blocks
              ON blocks.k = sz.k AND blocks.w = sz.w AND blocks.b = sz.b
            WHERE blocks.cnt = sz.w),
    pb AS (SELECT k, w, b, sq, s2, MAX(cd) - MIN(cd) AS rng
           FROM run GROUP BY 1, 2, 3, 4, 5),
    rsv AS (SELECT k, w, CAST(round(
              ((CAST(rng AS DOUBLE) / w)
               / sqrt(CAST(s2 AS DOUBLE)/w - (CAST(sq AS DOUBLE)/w)*(CAST(sq AS DOUBLE)/w)))
              * 1000000) AS BIGINT) AS rsq
            FROM pb
            WHERE CAST(s2 AS DOUBLE)/w - (CAST(sq AS DOUBLE)/w)*(CAST(sq AS DOUBLE)/w) > 0),
    pw AS (SELECT k, w, SUM(rsq) AS srs, COUNT(*) AS nb FROM rsv
           GROUP BY 1, 2 HAVING SUM(rsq) > 0),
    pts AS (SELECT k,
              CAST(round(ln(CAST(w AS DOUBLE)) * 1000000) AS BIGINT) AS qx,
              CAST(round(ln(CAST(srs AS DOUBLE) / nb / 1000000) * 1000000)
                   AS BIGINT) AS qy
            FROM pw),
    ols AS (SELECT k, COUNT(*) AS np, SUM(qx) AS sx, SUM(qy) AS sy,
                   SUM(qx*qy) AS sxy, SUM(qx*qx) AS sxx
            FROM pts GROUP BY k)
    SELECT k AS user_id, CAST(np AS BIGINT) AS n_sizes,
           CASE WHEN np >= 2 AND np*sxx - sx*sx > 0 THEN
             round(CAST(np*sxy - sx*sy AS DOUBLE)
                   / CAST(np*sxx - sx*sx AS DOUBLE), 6) END AS hurst
    FROM ols
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().dropna(subset=["hurst"])
    assert len(pdf) > 0
    # R/S Hurst estimates live in a sane band
    assert pdf.hurst.between(-0.5, 1.5).all()


def test_hurst_exponent_known_cases(spark):
    """Pins: a pure linear trend is maximally persistent (H ≈ 1); a
    strict ±1 alternation is maximally anti-persistent (H ≈ 0)."""
    from osmapreduceproject_spark.operators.windows import hurst_exponent

    def series(vals):
        rows = [(i, i * 3_600_000_000, 1, float(v)) for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    trend = hurst_exponent(
        series(range(256)), "user_id", "ts", "value", 3600
    ).first()
    assert trend["n_sizes"] == 4
    assert 0.9 < trend["hurst"] < 1.1
    alt = hurst_exponent(
        series([1.0 if i % 2 else -1.0 for i in range(256)]),
        "user_id", "ts", "value", 3600,
    ).first()
    assert alt["hurst"] < 0.2


def test_embedding_exact_dedup_oracle(spark, duck):
    """Quantized-coordinate md5 signatures — the cross-engine hash
    family over list_transform/array_join in SQL."""
    from osmapreduceproject_spark.operators.similarity import embedding_exact_dedup
    from osmapreduceproject_spark.queries import md5_int_sql

    got = embedding_exact_dedup(_t(spark, "embeddings"))
    sig = md5_int_sql(
        "array_to_string(list_transform(embedding, "
        "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)"
        "), ',')"
    )
    sql = f"""
    WITH sigs AS (SELECT {sig} AS sig FROM embeddings
                  WHERE embedding IS NOT NULL),
    per AS (SELECT sig, COUNT(*) AS n FROM sigs GROUP BY sig)
    SELECT CAST(SUM(n) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) AS BIGINT) AS n_signatures,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(SUM(n - 1) AS BIGINT) AS n_redundant
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["n_vectors"] == r["n_signatures"] + r["n_redundant"]


def test_embedding_exact_dedup_known_case(spark):
    """Pin: within-precision twins collapse to one signature; a
    distinct vector stays its own group."""
    from osmapreduceproject_spark.operators.similarity import embedding_exact_dedup

    df = spark.createDataFrame(
        [(1, [0.50001, -1.0]), (2, [0.50002, -1.0]),  # both round to 5000
         (3, [0.51, -1.0])],
        "vec_id long, embedding array<float>",
    )
    r = embedding_exact_dedup(df).first()
    assert r["n_vectors"] == 3 and r["n_signatures"] == 2
    assert r["n_dup_groups"] == 1 and r["n_redundant"] == 1


def test_audio_dynamic_range_oracle(spark, duck):
    """Crest factor over the arithmetic PCM fixture — exact centered
    integer moments, every byte regenerated in SQL."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio,
        audio_dynamic_range,
    )

    got = audio_dynamic_range(arith_raw_audio(spark, n=64, n_samples=2048))
    sql = """
    WITH mm AS (SELECT unnest(range(64)) AS m),
    smp AS (SELECT m, unnest(range(2048)) AS i FROM mm),
    w AS (SELECT m, ((17*m + 11*i + (i*i)%89) % 256) - 128 AS c FROM smp),
    agg AS (SELECT m, COUNT(*) AS n, MAX(ABS(c)) AS peak,
                   SUM(CAST(c AS HUGEINT) * c) AS s2
            FROM w GROUP BY m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(peak AS BIGINT) AS peak,
           floor(sqrt(CAST(s2 AS DOUBLE) / n) * 1000000 + 0.5) / 1000000 AS rms,
           CASE WHEN peak > 0 AND sqrt(CAST(s2 AS DOUBLE) / n) > 0 THEN
             floor(20.0 * log10(peak / sqrt(CAST(s2 AS DOUBLE) / n))
                   * 1000000 + 0.5) / 1000000 END AS crest_db
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.crest_db >= 0).all()  # peak ≥ rms always


def test_audio_dynamic_range_known_cases(spark):
    """Pins: a constant full-scale square wave has crest 0 dB; a
    single-impulse clip has a hand-computable high crest; silence →
    NULL."""
    from osmapreduceproject_spark.operators.multimodal import audio_dynamic_range

    def clip(mid, payload):
        return (mid, "audio", bytes(payload), (None, None, 16000, None))

    schema = ("media_id long, kind string, payload binary, "
              "meta struct<width:int,height:int,sample_rate:int,n_frames:int>")
    df = spark.createDataFrame(
        [clip(0, [228] * 64),          # constant +100 → crest 0 dB
         clip(1, [128] * 63 + [228]),  # one impulse of 100
         clip(2, [128] * 64)],         # silence → rms 0 → NULL
        schema,
    )
    rows = {r["media_id"]: r for r in audio_dynamic_range(df).collect()}
    assert rows[0]["crest_db"] == 0.0 and rows[0]["peak"] == 100
    import math

    expect = 20.0 * math.log10(100 / math.sqrt(100 * 100 / 64))
    assert abs(rows[1]["crest_db"] - expect) < 1e-5
    assert rows[2]["rms"] == 0.0 and rows[2]["crest_db"] is None


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (2M slots through R/S Hurst)",
)
def test_hurst_scale_smoke(spark):
    """1,000 keys × 2,048 hourly slots (2M grid rows, 8M sized rows
    across 4 block sizes) through the full R/S machinery: every key
    reports 4 usable sizes and a sane H — the block windows stay
    (key, w, block)-partitioned at volume."""
    from osmapreduceproject_spark.operators.windows import hurst_exponent

    n_keys, n_slots = 1_000, 2_048
    df = spark.range(n_keys * n_slots).select(
        (F.col("id") / n_slots).cast("bigint").alias("user_id"),
        F.timestamp_micros(
            (F.col("id") % n_slots) * F.lit(3_600_000_000)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 100.0).alias(
            "value"
        ),
    )
    he = hurst_exponent(df, "user_id", "ts", "value", 3600)
    pdf = he.toPandas()
    assert len(pdf) == n_keys
    assert (pdf.n_sizes == 4).all()
    # hash-noise series: H clusters near 0.5, never outside a sane band
    assert pdf.hurst.between(-0.25, 1.25).all()


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M rows through partial correlation)",
)
def test_partial_correlation_scale_smoke(spark):
    """10M rows, three hash-derived columns with a planted confounder
    (x and y both load on z): raw r_xy is visibly positive, the partial
    residual association collapses toward 0 — one scan, exact DECIMAL
    moments at volume."""
    from osmapreduceproject_spark.operators.stats import partial_correlation

    z = F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")
    nx = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("double")
    ny = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("double")
    df = spark.range(10_000_000).select(
        (z + nx).alias("x"), (z + ny).alias("y"), z.alias("z")
    )
    r = partial_correlation(df, "x", "y", "z").first()
    assert r["n"] == 10_000_000
    assert r["r_xy"] > 0.3          # the confounder makes x–y look real
    assert abs(r["partial_r"]) < 0.01  # controlling z removes it


def test_dispersion_index_pre_1970_floor(spark):
    """Window indexing FLOORS (truncation would merge the two windows
    adjacent to epoch 0 — review finding, r12): one event each side of
    1970-01-01 lands in two distinct hourly windows."""
    from osmapreduceproject_spark.operators.stats import dispersion_index

    df = spark.createDataFrame(
        [(-1_800_000_000, "a"), (1_800_000_000, "a")], "us long, g string"
    ).select(F.timestamp_micros("us").alias("ts"), "g")
    r = dispersion_index(df, "ts", "g", 3600).first()
    assert r["n_windows"] == 2
    assert r["mean_per_window"] == 1.0 and r["dispersion_index"] == 0.0


def test_markov_stationary_integer_states(spark):
    """The state column keeps the input type: an int event-code chain
    must not crash the output schema (review finding, r12)."""
    from osmapreduceproject_spark.operators.events import markov_stationary

    df = spark.createDataFrame(
        [(0, 0, 1, 10), (1, 1_000_000, 1, 20), (2, 2_000_000, 1, 10)],
        "event_id long, us long, user_id long, event_type int",
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"),
        "user_id", "event_type",
    )
    got = markov_stationary(df)
    assert dict(got.dtypes)["state"] == "int"
    rows = {r["state"]: r for r in got.collect()}
    assert abs(rows[10]["stationary_prob"] + rows[20]["stationary_prob"] - 1.0) < 1e-6


def test_embedding_exact_dedup_empty_pool(spark):
    """An all-NULL-embedding pool reports ZEROS, never NULL sums
    (review finding, r12)."""
    from osmapreduceproject_spark.operators.similarity import embedding_exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    r = embedding_exact_dedup(df).first()
    assert (r["n_vectors"], r["n_signatures"], r["n_dup_groups"],
            r["n_redundant"]) == (0, 0, 0, 0)


# ---------------------------------------------------------------------------
# third r14-wave tranche: bootstrap diff CI, forecast backtest, cohort LTV
# ---------------------------------------------------------------------------


def test_bootstrap_diff_ci_oracle(spark, duck):
    """Two-group streaming Poisson bootstrap (click − purchase value
    means, B=16, id-seeded): four weighted sums per replicate in one
    scan, replicate diffs ranked by the ceil-rank rule in SQL."""
    from osmapreduceproject_spark.operators.stats import _POIS1_CDF, bootstrap_diff_ci
    from osmapreduceproject_spark.queries import md5_int_sql

    got = bootstrap_diff_ci(
        _t(spark, "events"), "event_type", "value", "click", "purchase",
        n_resamples=16, id_col="event_id",
    )
    w_case = "CASE " + " ".join(
        f"WHEN u{{b}} < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    ) + " ELSE 8 END"
    cols, sums = [], []
    for g in range((16 + 2) // 3):
        h = md5_int_sql(f"'bootdiff|' || CAST(event_id AS VARCHAR) || '|{g}'")
        cols.append(f"{h} AS h{g}")
    for b in range(16):
        g, lane = b // 3, b % 3
        cols.append(
            f"CAST((h{g} >> {20 * lane}) % 1048576 AS DOUBLE) / 1048576.0 AS u{b}"
        )
        wb = w_case.format(b=b)
        sums.append(
            f"SUM(CASE WHEN ga THEN CAST({wb} AS HUGEINT) * xq END) AS swxa_{b}, "
            f"SUM(CASE WHEN ga THEN CAST({wb} AS HUGEINT) END) AS swa_{b}, "
            f"SUM(CASE WHEN NOT ga THEN CAST({wb} AS HUGEINT) * xq END) AS swxb_{b}, "
            f"SUM(CASE WHEN NOT ga THEN CAST({wb} AS HUGEINT) END) AS swb_{b}"
        )
    diff_list = ", ".join(
        f"CASE WHEN swa_{b} > 0 AND swb_{b} > 0 THEN "
        f"CAST(swxa_{b} AS DOUBLE)/swa_{b}/1000000 "
        f"- CAST(swxb_{b} AS DOUBLE)/swb_{b}/1000000 END"
        for b in range(16)
    )
    sql = f"""
    WITH base AS (
      SELECT event_type = 'click' AS ga,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS xq,
             {', '.join(cols)}
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND event_type IN ('click', 'purchase')),
    s AS (SELECT SUM(CASE WHEN ga THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS nb,
                 SUM(CASE WHEN ga THEN xq END) AS sxa,
                 SUM(CASE WHEN NOT ga THEN xq END) AS sxb,
                 {', '.join(sums)}
          FROM base),
    diffs AS (SELECT s.na, s.nb, s.sxa, s.sxb, unnest([{diff_list}]) AS d
              FROM s),
    ranked AS (SELECT na, nb, sxa, sxb, d,
                      ROW_NUMBER() OVER (ORDER BY d) AS rk,
                      COUNT(*) OVER () AS nd
               FROM diffs WHERE d IS NOT NULL)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(CAST(sxa AS DOUBLE)/na/1000000, 6) AS mean_a,
           round(CAST(sxb AS DOUBLE)/nb/1000000, 6) AS mean_b,
           round(CAST(sxa AS DOUBLE)/na/1000000
                 - CAST(sxb AS DOUBLE)/nb/1000000, 6) AS diff,
           round(MAX(CASE WHEN rk = greatest(1, CAST(ceil(0.025 * nd) AS BIGINT))
                          THEN d END), 6) AS ci_lo,
           round(MAX(CASE WHEN rk = greatest(1, CAST(ceil(0.975 * nd) AS BIGINT))
                          THEN d END), 6) AS ci_hi,
           16 AS n_resamples
    FROM ranked GROUP BY na, nb, sxa, sxb
    """
    assert compare(got, duck.execute(sql).df()) == []
    r = got.first()
    assert r["ci_lo"] <= r["ci_hi"]


def test_bootstrap_diff_ci_known_cases(spark):
    """Pins: well-separated groups put 0 far outside the CI with the
    right sign; an empty group raises."""
    from osmapreduceproject_spark.operators.stats import bootstrap_diff_ci

    df = spark.createDataFrame(
        [(i, "a", 100.0 + (i % 3)) for i in range(30)]
        + [(100 + i, "b", 1.0 + (i % 3)) for i in range(30)],
        "event_id long, g string, v double",
    )
    r = bootstrap_diff_ci(df, "g", "v", "a", "b", id_col="event_id").first()
    assert 95 < r["diff"] < 103
    assert r["ci_lo"] > 90 and r["ci_hi"] < 110
    with pytest.raises(Exception, match="empty group"):
        bootstrap_diff_ci(df, "g", "v", "a", "missing", id_col="event_id")


def test_forecast_backtest_oracle(spark, duck):
    """One-step-ahead EWMA errors per user — the integer state walk
    lagged and aggregated, replayed by the recursive-CTE fold."""
    from osmapreduceproject_spark.operators.windows import forecast_backtest
    from osmapreduceproject_spark.queries_r8 import _RESAMPLE_CTE

    got = forecast_backtest(
        _t(spark, "events"), key="user_id", ts="ts", value_col="value",
        step_seconds=3600, alpha=0.3,
    )
    sql = f"""
    WITH RECURSIVE {_RESAMPLE_CTE},
    numbered AS (
      SELECT k, slot_epoch, value,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY slot_epoch) AS ord
      FROM resampled),
    walk AS (
      SELECT k, ord, slot_epoch, value,
             CAST(round(value * 1000000) AS BIGINT) AS eq
      FROM numbered WHERE ord = 1
      UNION ALL
      SELECT n.k, n.ord, n.slot_epoch, n.value,
             CAST(round(CAST(0.3 AS DOUBLE) * round(n.value * 1000000)
                        + CAST(0.7 AS DOUBLE) * w.eq) AS BIGINT)
      FROM numbered n JOIN walk w ON n.k = w.k AND n.ord = w.ord + 1),
    l AS (SELECT k, CAST(round(value * 1000000) AS BIGINT) AS vq,
                 lag(eq) OVER (PARTITION BY k ORDER BY slot_epoch) AS fq
          FROM walk),
    t AS (SELECT k, vq - fq AS e, abs(vq - fq) AS ae,
                 CASE WHEN vq != 0 THEN
                   CAST(round(abs(vq - fq) / abs(vq) * 1000000) AS BIGINT)
                 END AS mq
          FROM l WHERE fq IS NOT NULL)
    SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           round(CAST(SUM(ae) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mae,
           round(CAST(SUM(e) AS DOUBLE) / COUNT(*) / 1000000, 6) AS bias,
           CAST(COUNT(mq) AS BIGINT) AS n_mape,
           CASE WHEN COUNT(mq) > 0 THEN
             round(CAST(SUM(mq) AS DOUBLE) / COUNT(mq) / 1000000, 6)
           END AS mape
    FROM t GROUP BY k
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.mae >= pdf.bias.abs() - 1e-9).all()  # |mean e| ≤ mean |e|


def test_forecast_backtest_known_case(spark):
    """Pin: a constant series forecasts itself perfectly (MAE 0); a
    +1-per-slot ramp under α=0.5 settles at a constant one-step error."""
    from osmapreduceproject_spark.operators.windows import forecast_backtest

    def series(vals):
        rows = [(i, i * 3_600_000_000, 1, float(v)) for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "event_id long, us long, user_id long, value double"
        ).select(
            "event_id", F.timestamp_micros("us").alias("ts"),
            "user_id", "value",
        )

    const = forecast_backtest(
        series([5.0] * 24), "user_id", "ts", "value", 3600
    ).first()
    assert const["mae"] == 0.0 and const["bias"] == 0.0
    ramp = forecast_backtest(
        series(range(64)), "user_id", "ts", "value", 3600, alpha=0.5
    ).first()
    # s_t lags the ramp by a constant: error v_t − s_{t−1} → 2 as t→∞
    assert 1.5 < ramp["mae"] < 2.1
    assert ramp["bias"] == ramp["mae"]  # the ramp never under-runs


def test_cohort_ltv_oracle(spark, duck):
    """First-active-week cohorts with cumulative per-member value —
    exact integer cells + a bounded cohort-partitioned running sum."""
    from osmapreduceproject_spark.operators.events import cohort_ltv

    got = cohort_ltv(_t(spark, "events"))
    sql = """
    WITH base AS (
      SELECT user_id AS u,
             epoch_us(ts) // 1000000 // 604800 AS w,
             COALESCE(CASE WHEN NOT isnan(CAST(value AS DOUBLE)) THEN
               CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) END, 0)
               AS vq
      FROM events WHERE ts IS NOT NULL),
    first AS (SELECT u, MIN(w) AS cw FROM base GROUP BY u),
    sizes AS (SELECT cw, COUNT(*) AS cohort_size FROM first GROUP BY cw),
    cells AS (SELECT f.cw, b.w - f.cw AS age,
                     COUNT(DISTINCT b.u) AS n_active,
                     SUM(b.vq) AS wsum
              FROM base b JOIN first f ON f.u = b.u
              GROUP BY 1, 2),
    cum AS (SELECT cw, age, n_active, wsum,
                   SUM(wsum) OVER (PARTITION BY cw ORDER BY age) AS c
            FROM cells)
    SELECT cum.cw AS cohort_week, CAST(age AS BIGINT) AS age_weeks,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(sizes.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(c AS DOUBLE) / 1000000, 6) AS cum_value,
           round(CAST(c AS DOUBLE) / 1000000 / sizes.cohort_size, 6)
             AS ltv_per_user
    FROM cum JOIN sizes ON sizes.cw = cum.cw
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_active <= pdf.cohort_size).all()


def test_cohort_ltv_known_case(spark):
    """Pin: two users cohort at week 0; one returns in week 1 — the
    age-1 cell accumulates on top of age 0 and divides by BOTH
    original members."""
    from osmapreduceproject_spark.operators.events import cohort_ltv

    wk = 604800 * 1_000_000
    df = spark.createDataFrame(
        [(1, 0, 10.0), (2, 1_000_000, 30.0), (1, wk + 5, 20.0)],
        "user_id long, us long, value double",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "value")
    rows = {r["age_weeks"]: r for r in cohort_ltv(df).collect()}
    assert rows[0]["n_active"] == 2 and rows[0]["cohort_size"] == 2
    assert rows[0]["cum_value"] == 40.0 and rows[0]["ltv_per_user"] == 20.0
    assert rows[1]["n_active"] == 1
    assert rows[1]["cum_value"] == 60.0 and rows[1]["ltv_per_user"] == 30.0


def test_cohort_ltv_null_user_excluded(spark):
    """A NULL user is not a cohort member: it must appear in NEITHER
    cohort_size nor the value mass (review finding, r12 — an equi-join
    dropped its activity while the size count kept it)."""
    from osmapreduceproject_spark.operators.events import cohort_ltv

    df = spark.createDataFrame(
        [(1, 0, 10.0), (None, 1_000_000, 999.0)],
        "user_id long, us long, value double",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "value")
    r = cohort_ltv(df).first()
    assert r["cohort_size"] == 1 and r["n_active"] == 1
    assert r["cum_value"] == 10.0 and r["ltv_per_user"] == 10.0


# ---------------------------------------------------------------------------
# VERDICT r13 item #2: ANN-fed knn_graph_stats (declared as q338 in the
# same r14 window as this file's wave)
# ---------------------------------------------------------------------------


def test_knn_graph_ann_oracle(spark, duck):
    """lsh_topk(corpus, corpus, k) edge list → knn_graph_stats, against
    the full SQL replica (sparse-plane buckets → candidates → re-ranked
    top-k → the q297 graph-stats finalize)."""
    from osmapreduceproject_spark.operators.similarity import (
        knn_graph_stats,
        lsh_topk,
    )
    from osmapreduceproject_spark.queries_r14 import _knn_ann_oracle

    emb = _t(spark, "embeddings")
    edges = lsh_topk(emb, emb, k=5, num_planes=6, num_tables=6)
    got = knn_graph_stats(emb, k=5, edges=edges)
    assert compare(got, duck.execute(_knn_ann_oracle()).df()) == []
    r = got.first()
    assert r["n_edges"] > 0
    assert r["n_reciprocal"] % 2 == 0  # mutual edges come in pairs


def test_knn_graph_ann_identical_cluster_pin(spark):
    """Pin: a corpus of 6 identical vectors shares every LSH signature,
    so the ANN edge list has FULL recall — every node cites its 5
    twins at sim 1.0, every edge is reciprocal, in-degree k
    everywhere, nobody isolated."""
    from osmapreduceproject_spark.operators.similarity import (
        knn_graph_stats,
        lsh_topk,
    )

    vec = [float(i % 7 - 3) for i in range(64)]
    df = spark.createDataFrame(
        [(i, vec) for i in range(6)], "vec_id long, embedding array<float>"
    )
    edges = lsh_topk(df, df, k=5, num_planes=6, num_tables=6)
    r = knn_graph_stats(df, k=5, edges=edges).first()
    assert r["n_nodes"] == 6 and r["n_edges"] == 30
    assert r["n_reciprocal"] == 30 and r["reciprocity"] == 1.0
    assert r["max_in_degree"] == 5 and r["n_isolated"] == 0
    assert r["mean_sim"] == 1.0
