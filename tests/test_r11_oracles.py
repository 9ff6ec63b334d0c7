"""Cross-engine (DuckDB) parity for the r11-ready operators — the next
staged wave, proven against their oracles BEFORE declaration (the
SURVEY.md §8 staging discipline that produced the r8/r9/r10 tranches:
every operator lands with its oracle parity test in the same commit, so
the future q-entry is a copy-paste of (body, SQL) pairs already green).

Each test is (future Spark query body, future oracle SQL, driver-identical
compare) at sf0.01 — the same comparison tests/test_oracle_parity.py runs
for declared queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


def _events(spark):
    from osmapreduceproject_spark.queries import _t

    return _t(spark, SF_CORRECT, "events")


def _docs(spark):
    from osmapreduceproject_spark.queries import _t

    return _t(spark, SF_CORRECT, "documents")


def test_kruskal_wallis_oracle(spark, duck):
    """Location shift across ALL event types (k=4 groups, heavy ties):
    tie-corrected H via the rank-ANOVA identity, midranks replayed in
    SQL, the one inexact Σ double(S_i)²/n_i term an ORDERED fold on
    both sides."""
    from osmapreduceproject_spark.operators.stats import kruskal_wallis
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    got = kruskal_wallis(_events(spark), "event_type", "value")
    sql = """
    WITH pool AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    pv AS (SELECT v, COUNT(*) AS cn FROM pool GROUP BY v),
    r2 AS (SELECT v, 2*(SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
           FROM pv),
    ranked AS (SELECT p.g, r2.r2 FROM pool p JOIN r2 ON r2.v = p.v),
    per AS (SELECT g, COUNT(*) AS n, SUM(CAST(r2 AS HUGEINT)) AS s2,
                   SUM(CAST(r2 AS HUGEINT) * r2) AS s22
            FROM ranked GROUP BY g),
    tot AS (SELECT SUM(n) AS nt, COUNT(*) AS k, SUM(s2) AS sr,
                   SUM(s22) AS srr
            FROM per),
    fold AS (SELECT list_reduce(list_concat([CAST(0 AS DOUBLE)],
               list(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n ORDER BY g)),
               (a, b) -> a + b) AS sb
             FROM per)
    SELECT CAST(tot.nt AS BIGINT) AS n, CAST(tot.k AS BIGINT) AS n_groups,
           CAST(tot.k - 1 AS BIGINT) AS dof,
           CASE WHEN tot.k >= 2 AND tot.nt >= 2
                     AND CAST(srr AS DOUBLE)
                     - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nt > 0 THEN
             round((tot.nt - 1)
                   * (fold.sb - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nt)
                   / (CAST(srr AS DOUBLE)
                      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nt), 6)
           END AS h_stat
    FROM tot, fold
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["n_groups"] >= 2 and row["h_stat"] is not None
    assert row["h_stat"] >= 0.0
    release_intermediates()


def test_kruskal_wallis_known_cases(spark):
    """Closed-form pins: identical group distributions → H ≈ 0-ish is
    data-dependent, so pin the DEGENERATE contracts instead: all values
    tied → NULL (zero total rank variance), single group → NULL, and a
    perfectly separated 2-group case equals the hand-computed H."""
    from osmapreduceproject_spark.operators.stats import kruskal_wallis
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    const = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", 5.0)] * 4, "g string, v double"
    )
    assert kruskal_wallis(const, "g", "v").first()["h_stat"] is None
    release_intermediates()
    one = spark.createDataFrame([("a", float(i)) for i in range(6)], "g string, v double")
    r = kruskal_wallis(one, "g", "v").first()
    assert r["n_groups"] == 1 and r["h_stat"] is None
    release_intermediates()
    # perfect separation, no ties: a={1,2,3}, b={4,5,6} → ranks sums
    # 6 and 15; H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 12/42·87 − 21 ≈ 3.857143
    sep = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    assert kruskal_wallis(sep, "g", "v").first()["h_stat"] == pytest.approx(
        3.857143, abs=1e-6
    )
    release_intermediates()


def test_anova_oneway_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import anova_oneway

    got = anova_oneway(_events(spark), "event_type", "value")
    sql = """
    WITH pool AS (
      SELECT event_type AS g,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS xq
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    per AS (SELECT g, COUNT(*) AS n, SUM(xq) AS s, SUM(xq * xq) AS ss
            FROM pool GROUP BY g),
    tot AS (SELECT SUM(n) AS nt, COUNT(*) AS k, SUM(s) AS sr, SUM(ss) AS srr
            FROM per),
    fold AS (SELECT list_reduce(list_concat([CAST(0 AS DOUBLE)],
               list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n ORDER BY g)),
               (a, b) -> a + b) AS sb
             FROM per)
    SELECT CAST(tot.nt AS BIGINT) AS n, CAST(tot.k AS BIGINT) AS n_groups,
           CAST(tot.k - 1 AS BIGINT) AS dof_between,
           CAST(tot.nt - tot.k AS BIGINT) AS dof_within,
           CASE WHEN tot.k >= 2 AND tot.nt > tot.k
                     AND CAST(srr AS DOUBLE) - fold.sb > 0 THEN
             round(((fold.sb - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nt)
                    / (tot.k - 1))
                   / ((CAST(srr AS DOUBLE) - fold.sb) / (tot.nt - tot.k)), 6)
           END AS f_stat
    FROM tot, fold
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["f_stat"] is not None and row["f_stat"] >= 0.0


def test_anova_oneway_degenerate(spark):
    """Constant groups (zero within-group mass) → NULL F, not inf."""
    from osmapreduceproject_spark.operators.stats import anova_oneway

    df = spark.createDataFrame(
        [("a", 1.0)] * 4 + [("b", 2.0)] * 4, "g string, v double"
    )
    row = anova_oneway(df, "g", "v").first()
    assert row["n"] == 8 and row["n_groups"] == 2 and row["f_stat"] is None


def test_cohens_d_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import cohens_d

    got = cohens_d(_events(spark), "event_type", "value", "view", "purchase")
    sql = """
    WITH pool AS (
      SELECT event_type AS g,
             CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS xq
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    s AS (SELECT
            SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN g = 'view' THEN xq END) AS sa,
            SUM(CASE WHEN g = 'view' THEN xq*xq END) AS ssa,
            SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS nb,
            SUM(CASE WHEN g = 'purchase' THEN xq END) AS sb,
            SUM(CASE WHEN g = 'purchase' THEN xq*xq END) AS ssb
          FROM pool),
    m AS (SELECT *,
            CAST(sa AS DOUBLE) / na / 1000000 AS mean_a,
            CAST(sb AS DOUBLE) / nb / 1000000 AS mean_b,
            CAST(na * ssa - sa * sa AS DOUBLE) / na AS ssd_a,
            CAST(nb * ssb - sb * sb AS DOUBLE) / nb AS ssd_b
          FROM s),
    f AS (SELECT *,
            (ssd_a + ssd_b) / (na + nb - 2) / 1000000000000.0 AS sp2
          FROM m)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           CASE WHEN sp2 > 0 THEN round(sqrt(sp2), 6) END AS pooled_sd,
           CASE WHEN sp2 > 0 THEN
             round((mean_b - mean_a) / sqrt(sp2), 6)
           END AS cohens_d
    FROM f
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["pooled_sd"] is not None and row["pooled_sd"] > 0


def test_cohens_d_known_cases(spark):
    """Pins: equal-mean groups → d = 0; a one-SD shift → d = 1 on the
    hand-computable fixture {0,2}×n vs {1,3}×n (pooled sd = 1... use
    exact small case: a={1,1,3,3}, b={2,2,4,4}: means 2,3; each group
    SS=4, sp²=(4+4)/6=4/3, d=1/sqrt(4/3)≈0.866025); zero spread → NULL."""
    from osmapreduceproject_spark.operators.stats import cohens_d

    eq = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
    )
    assert cohens_d(eq, "g", "v", "a", "b").first()["cohens_d"] == 0.0
    ab = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 3.0), ("a", 3.0),
         ("b", 2.0), ("b", 2.0), ("b", 4.0), ("b", 4.0)],
        "g string, v double",
    )
    assert cohens_d(ab, "g", "v", "a", "b").first()["cohens_d"] == pytest.approx(
        0.866025, abs=1e-6
    )
    const = spark.createDataFrame(
        [("a", 2.0)] * 3 + [("b", 2.0)] * 3, "g string, v double"
    )
    assert cohens_d(const, "g", "v", "a", "b").first()["cohens_d"] is None


def test_collocation_llr_oracle(spark, duck):
    """Dunning LLR bigram collocations, bits convention, bigram-space
    margins, top-20 with the (llr DESC, a, b) tiebreak."""
    from osmapreduceproject_spark.operators.text import collocation_llr

    got = collocation_llr(_docs(spark), min_count=5, top_k=20)
    xlx = "CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE) * log2(CAST({k} AS DOUBLE)) ELSE 0.0 END"
    sql = f"""
    WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
    prs AS (
      SELECT unnest(list_transform(range(1, len(w)), i -> [w[i], w[i+1]])) AS p
      FROM w WHERE len(w) >= 2),
    pair_counts AS (SELECT p[1] AS a, p[2] AS b, COUNT(*) AS c_ab
                    FROM prs GROUP BY 1, 2),
    m AS (SELECT a, b, c_ab,
                 SUM(c_ab) OVER (PARTITION BY a) AS r1,
                 SUM(c_ab) OVER (PARTITION BY b) AS c1
          FROM pair_counts),
    nn AS (SELECT SUM(c_ab) AS n FROM pair_counts),
    sc AS (
      SELECT a, b, c_ab, CAST(r1 AS BIGINT) AS n_a_first,
             CAST(c1 AS BIGINT) AS n_b_second,
             round(2.0 * ({xlx.format(k="c_ab")}
                          + {xlx.format(k="(r1 - c_ab)")}
                          + {xlx.format(k="(c1 - c_ab)")}
                          + {xlx.format(k="(nn.n - r1 - c1 + c_ab)")}
                          - {xlx.format(k="r1")}
                          - {xlx.format(k="(nn.n - r1)")}
                          - {xlx.format(k="c1")}
                          - {xlx.format(k="(nn.n - c1)")}
                          + {xlx.format(k="nn.n")}), 6) AS llr_bits
      FROM m, nn WHERE c_ab >= 5)
    SELECT a, b, c_ab, n_a_first, n_b_second, llr_bits
    FROM sc ORDER BY llr_bits DESC, a, b LIMIT 20
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = got.collect()
    assert len(rows) == 20
    # LLR of an observed-above-expectation pair is positive
    assert rows[0]["llr_bits"] > 0


def test_inter_event_stats_oracle(spark, duck):
    """Per-user gap distribution: lag gaps in integer µs, exact mean
    sum, discrete median — all replayed in SQL; <2-event users absent."""
    from osmapreduceproject_spark.operators.events import inter_event_stats

    got = inter_event_stats(_events(spark), key="user_id", ts="ts")
    sql = """
    WITH e AS (SELECT user_id AS k, epoch_us(ts) AS e FROM events),
    g AS (SELECT k, e - lag(e) OVER (PARTITION BY k ORDER BY e) AS gap
          FROM e),
    gaps AS (SELECT k, gap FROM g WHERE gap IS NOT NULL),
    agg AS (SELECT k, COUNT(*) AS n_gaps, SUM(gap) AS s,
                   MIN(gap) AS mn, MAX(gap) AS mx,
                   quantile_disc(gap, 0.5) AS med
            FROM gaps GROUP BY k)
    SELECT k AS user_id, CAST(n_gaps + 1 AS BIGINT) AS n_events,
           n_gaps,
           round(CAST(s AS DOUBLE) / n_gaps / 1000000.0, 6) AS mean_gap_s,
           round(CAST(mn AS DOUBLE) / 1000000.0, 6) AS min_gap_s,
           round(CAST(mx AS DOUBLE) / 1000000.0, 6) AS max_gap_s,
           round(CAST(med AS DOUBLE) / 1000000.0, 6) AS median_gap_s
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.min_gap_s <= pdf.median_gap_s).all()
    assert (pdf.median_gap_s <= pdf.max_gap_s).all()


def test_series_extrema_oracle(spark, duck):
    """Strict peaks/troughs over the resampled grid, lag/lead replayed
    in SQL with the identical plateau-excluding convention."""
    from osmapreduceproject_spark.operators.windows import series_extrema

    got = series_extrema(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=3600,
    )
    sql = """
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e,
                        CAST(value AS DOUBLE) AS v
                 FROM events),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / 3600000000.0) * 3600000000 AS BIGINT),
        CAST(floor(hi / 3600000000.0) * 3600000000 AS BIGINT) + 1,
        3600000000)) AS e
      FROM spans),
    resampled AS (
      SELECT g.k, g.e // 1000000 AS slot_epoch, o.v AS value
      FROM grid g ASOF JOIN obs o ON g.k = o.k AND o.e <= g.e),
    lagged AS (
      SELECT k, slot_epoch, value,
             lag(value) OVER w AS pv, lead(value) OVER w AS nv
      FROM resampled WINDOW w AS (PARTITION BY k ORDER BY slot_epoch))
    SELECT k AS user_id, slot_epoch, value,
           CASE WHEN value > pv AND value > nv THEN 'peak'
                ELSE 'trough' END AS kind
    FROM lagged
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND ((value > pv AND value > nv) OR (value < pv AND value < nv))
    """
    assert compare(got, duck.execute(sql).df()) == []
    kinds = {r["kind"] for r in got.select("kind").distinct().collect()}
    assert kinds <= {"peak", "trough"} and kinds


def test_cluster_size_stats_oracle(spark, duck):
    """Cluster-size distribution over q92's CC machinery: the oracle is
    the recursive min-label closure + two groupBys."""
    from osmapreduceproject_spark.operators.dedup import cluster_size_stats
    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import _jaccard_pairs_sql

    got = cluster_size_stats(_docs(spark), threshold=0.8)
    sql = f"""
    WITH RECURSIVE
    {_jaccard_pairs_sql(None)},
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    walk AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.src AS node, w.label FROM edges e JOIN walk w ON w.node = e.dst),
    labels AS (SELECT node, MIN(label) AS cluster_id FROM walk GROUP BY node),
    csizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
               FROM labels GROUP BY cluster_id)
    SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
    FROM csizes GROUP BY cluster_size
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.n_docs == pdf.cluster_size * pdf.n_clusters).all()
    # total docs across the distribution equals the corpus
    assert int(pdf.n_docs.sum()) == _docs(spark).count()
    release_intermediates()


def test_epsilon_band_join_oracle(spark, duck):
    """Purchases paired with clicks within ±5 s (keyless): the grid
    path equals the naive inequality join, exactly once per pair."""
    from osmapreduceproject_spark.operators.joins import epsilon_band_join

    ev = _events(spark)
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("p_sec"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.floor(F.unix_micros("ts") / 1_000_000).alias("c_sec"),
    )
    got = epsilon_band_join(purch, clicks, "p_sec", "c_sec", eps=5)
    sql = """
    WITH p AS (SELECT event_id AS p_id, epoch_us(ts) // 1000000 AS p_sec
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS c_id, epoch_us(ts) // 1000000 AS c_sec
          FROM events WHERE event_type = 'click')
    SELECT p.p_id, p.p_sec, c.c_id, c.c_sec
    FROM p JOIN c ON abs(p.p_sec - c.c_sec) <= 5
    """
    assert compare(got, duck.execute(sql).df()) == []
    n = got.count()
    assert n == got.dropDuplicates(["p_id", "c_id"]).count()
    assert n > 0


def test_epsilon_band_join_rejects_outer_and_bad_eps(spark):
    import pytest as _pytest

    from osmapreduceproject_spark.operators.joins import epsilon_band_join

    l = spark.createDataFrame([(1, 10)], "lid int, lv long")
    r = spark.createDataFrame([(2, 12)], "rid int, rv long")
    for bad in ("left", "right", "full", "left_semi", "left_anti"):
        with _pytest.raises(ValueError, match="cell-exploded|exactly-once"):
            epsilon_band_join(l, r, "lv", "rv", 5, how=bad)
    with _pytest.raises(ValueError, match="positive integer"):
        epsilon_band_join(l, r, "lv", "rv", 0)
    # boundary inclusivity: |l-r| == eps qualifies; eps+1 does not
    assert epsilon_band_join(l, r, "lv", "rv", 2).count() == 1
    assert epsilon_band_join(l, r, "lv", "rv", 1).count() == 0


def test_audio_clipping_report_oracle(spark, duck):
    """Planted-clipping PCM clips: rail counts, exact frac, and the
    longest clipped run all replayed closed-form (islands in SQL)."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_audio_clipped,
        audio_clipping_report,
    )

    clips = arith_raw_audio_clipped(spark, n=32, n_samples=2048)
    got = audio_clipping_report(clips)
    sql = """
    WITH t AS (SELECT unnest(range(32)) AS m),
    s AS (SELECT m, unnest(range(2048)) AS i FROM t),
    v AS (SELECT m, i,
            CASE WHEN i >= 512 AND i < 768 THEN 255
                 WHEN i >= 1536 AND i < 1664 THEN 0
                 ELSE (17*m + 11*i + (i*i) % 89) % 253 + 1 END AS val
          FROM s),
    c AS (SELECT m, i FROM v WHERE val = 0 OR val = 255),
    isl AS (SELECT m, i,
              CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > 1
                   THEN 1 ELSE 0 END AS nw
            FROM c WINDOW w AS (PARTITION BY m ORDER BY i)),
    grp AS (SELECT m, i, SUM(nw) OVER (PARTITION BY m ORDER BY i) AS island
            FROM isl),
    runs AS (SELECT m, island, COUNT(*) AS run_len FROM grp GROUP BY 1, 2),
    per AS (SELECT m, SUM(run_len) AS n_clipped, MAX(run_len) AS longest
            FROM runs GROUP BY m)
    SELECT CAST(t.m AS BIGINT) AS media_id, CAST(2048 AS BIGINT) AS n_samples,
           CAST(COALESCE(per.n_clipped, 0) AS BIGINT) AS n_clipped,
           round(CAST(COALESCE(per.n_clipped, 0) AS DOUBLE) / 2048, 6) AS clip_frac,
           CAST(COALESCE(per.longest, 0) AS BIGINT) AS longest_clipped_run
    FROM t LEFT JOIN per ON per.m = t.m
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    assert all(
        rows[m]["n_clipped"] == 384 and rows[m]["longest_clipped_run"] == 256
        for m in range(32)
    )


def test_image_border_uniformity_oracle(spark, duck):
    """Letterbox detection over the bordered RAW8 fixture: even images
    (planted uniform border) score 1.0; odd images replay the pixel
    formula's border grays exactly."""
    from osmapreduceproject_spark.operators.multimodal import (
        arith_raw_images_bordered,
        image_border_uniformity,
    )

    imgs = arith_raw_images_bordered(spark, n=64, width=16, height=12)
    got = image_border_uniformity(imgs, tol=0)
    g = ("(((31*m + 7*((r*16 + c)*3 + 0) + (((r*16 + c)*3 + 0)*((r*16 + c)*3 + 0)) % 251) % 256)"
         " + ((31*m + 7*((r*16 + c)*3 + 1) + (((r*16 + c)*3 + 1)*((r*16 + c)*3 + 1)) % 251) % 256)"
         " + ((31*m + 7*((r*16 + c)*3 + 2) + (((r*16 + c)*3 + 2)*((r*16 + c)*3 + 2)) % 251) % 256)) // 3")
    sql = f"""
    WITH mm AS (SELECT unnest(range(64)) AS m),
    horiz AS (SELECT r.r, c.c
              FROM (SELECT unnest([0, 11]) AS r) r,
                   (SELECT unnest(range(16)) AS c) c),
    vert AS (SELECT r.r, c.c
             FROM (SELECT unnest(range(1, 11)) AS r) r,
                  (SELECT unnest([0, 15]) AS c) c),
    coords AS (SELECT * FROM horiz UNION ALL SELECT * FROM vert),
    gray AS (
      SELECT mm.m, coords.r, coords.c,
             CASE WHEN mm.m % 2 = 0 THEN 200 ELSE {g} END AS gv
      FROM mm, coords),
    corner AS (SELECT m, gv AS cg FROM gray WHERE r = 0 AND c = 0),
    per AS (
      SELECT g2.m, COUNT(*) AS n_border,
             SUM(CASE WHEN g2.gv = corner.cg THEN 1 ELSE 0 END) AS n_match
      FROM gray g2 JOIN corner ON corner.m = g2.m
      GROUP BY g2.m)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(n_border AS BIGINT) AS n_border_px,
           CAST(n_match AS BIGINT) AS n_matching,
           round(CAST(n_match AS DOUBLE) / n_border, 6) AS border_uniform_frac,
           CAST(n_match AS DOUBLE) / n_border >= 0.95 AS is_letterboxed
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["media_id"]: r for r in got.collect()}
    assert all(rows[m]["is_letterboxed"] for m in range(0, 64, 2))
    assert all(
        rows[m]["border_uniform_frac"] < 0.95 for m in range(1, 64, 2)
    )
    assert rows[0]["n_border_px"] == 2 * 16 + 2 * 12 - 4


import os as _os


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (2M x 2M band join)",
)
def test_epsilon_band_join_scale_smoke(spark):
    """2M × 2M keyless band join — 4·10¹² naive comparisons; the grid
    path finds EXACTLY the 2M planted pairs (left i at 100i, right i at
    100i+40 with eps=40 — neighbors are 60/140 away) once each."""
    from osmapreduceproject_spark.operators.joins import epsilon_band_join

    n = 2_000_000
    left = spark.range(n).select(
        F.col("id").alias("lid"), (F.col("id") * 100).alias("lv")
    )
    right = spark.range(n).select(
        F.col("id").alias("rid"), (F.col("id") * 100 + 40).alias("rv")
    )
    j = epsilon_band_join(left, right, "lv", "rv", eps=40)
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lid") == F.col("rid")).cast("int")).alias("self_pairs"),
    ).first()
    assert agg["n"] == n and agg["self_pairs"] == n


@pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (10M rows through the KW midrank machinery)",
)
def test_kruskal_wallis_scale_smoke(spark):
    """10M rows, 4 groups on a shared 1000-value grid with one group
    shifted — evidences the doubled-midrank machinery (broadcast-offset
    prefix sums, no single-partition window) and the bounded per-group
    collect at a volume where a global rank window would funnel 10M
    rows through one task. H must be large (one group clearly shifted)
    and finite; the identical-groups control must sit near 0."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.stats import kruskal_wallis
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (
            (F.col("id") / 4).cast("bigint") % 1000
            + F.when(F.col("id") % 4 == 3, F.lit(500)).otherwise(F.lit(0))
        ).cast("double").alias("v"),
    )
    row = kruskal_wallis(df, "g", "v").first()
    assert row["n"] == n and row["n_groups"] == 4
    assert row["h_stat"] is not None and row["h_stat"] > 100_000
    release_intermediates()
    same = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        ((F.col("id") / 4).cast("bigint") % 1000).cast("double").alias("v"),
    )
    row2 = kruskal_wallis(same, "g", "v").first()
    assert row2["h_stat"] is not None and row2["h_stat"] < 10.0
    release_intermediates()
