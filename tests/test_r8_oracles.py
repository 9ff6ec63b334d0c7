"""Cross-engine (DuckDB) parity for the r8-ready operators — the q178+
declarations, proven against their oracles BEFORE they enter the catalog
(SURVEY.md §8 round-7: operators ship a round ahead of their grades; this
file is what makes the r8 declaration a copy-paste, and what guarantees
no r8-ready operator carries an unverifiable contract).

Each test is (future Spark query body, future oracle SQL, driver-identical
compare) at sf0.01 — the same comparison tests/test_oracle_parity.py runs
for declared queries.
"""

from __future__ import annotations

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


def test_resample_ffill_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import resample_ffill

    got = resample_ffill(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP,
    )
    sql = f"""
    WITH {_RESAMPLE_CTE}
    SELECT k AS user_id, slot_epoch, value, staleness_s FROM resampled
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_series_anomalies_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import series_anomalies

    got = series_anomalies(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP, k=3.0,
    )
    sql = f"""
    WITH {_RESAMPLE_CTE},
    med AS (SELECT k, quantile_disc(value, 0.5) AS m FROM resampled GROUP BY k),
    dev AS (SELECT r.*, m.m, abs(r.value - m.m) AS adev
            FROM resampled r JOIN med m ON m.k = r.k),
    mad AS (SELECT k, quantile_disc(adev, 0.5) AS d FROM dev GROUP BY k)
    SELECT dev.k AS user_id, dev.slot_epoch, dev.value, dev.staleness_s,
           dev.m AS median,
           dev.m - 3.0 * 1.4826 * mad.d AS fence_lo,
           dev.m + 3.0 * 1.4826 * mad.d AS fence_hi,
           (dev.value < dev.m - 3.0 * 1.4826 * mad.d
            OR dev.value > dev.m + 3.0 * 1.4826 * mad.d) AS is_anomaly
    FROM dev JOIN mad ON mad.k = dev.k
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_zipf_fit_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import zipf_fit
    from osmapreduceproject_spark.queries import _t

    got = zipf_fit(_t(spark, SF_CORRECT, "documents"), top_n=100)
    sql = """
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    counts AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    ranked AS (
      SELECT source,
             log2(CAST(ROW_NUMBER() OVER
                       (PARTITION BY source ORDER BY c DESC, tok ASC) AS DOUBLE)) AS x,
             log2(CAST(c AS DOUBLE)) AS y,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, tok ASC) AS rk
      FROM counts QUALIFY rk <= 100),
    sums AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM ranked GROUP BY source)
    SELECT source, CAST(n AS BIGINT) AS n_words,
           round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
           round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept,
           round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
    FROM sums
    """
    assert compare(got, duck.execute(sql).df()) == []


_DOT = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def test_cluster_drift_oracle(spark, duck):
    from osmapreduceproject_spark.operators.similarity import cluster_drift
    from osmapreduceproject_spark.queries import _t

    emb = _t(spark, SF_CORRECT, "embeddings")
    newer = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") < 50,
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(0.05)).cast("float")),
                F.slice("embedding", 2, 63),
            ),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    got = cluster_drift(emb, newer, n_centroids=16)
    assign = """
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({dot}, 6) DESC, c.cid DESC) AS rn
        FROM {src} e CROSS JOIN cents c) t WHERE rn = 1"""
    dims = """
      SELECT cid, CAST(j AS INT) AS dim,
             SUM(CAST(round(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) * 1000000)
                      AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM {src}, (SELECT unnest(range(64)) AS j)
      GROUP BY 1, 2"""
    sql = f"""
    WITH newsnap AS (
      SELECT vec_id,
             CASE WHEN vec_id < 50
                  THEN list_concat([CAST(embedding[1] + 0.05 AS FLOAT)], embedding[2:64])
                  ELSE embedding END AS embedding
      FROM embeddings),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    a_old AS ({assign.format(dot=_DOT.format(a="e.embedding", b="c.cvec"), src="embeddings")}),
    a_new AS ({assign.format(dot=_DOT.format(a="e.embedding", b="c.cvec"), src="newsnap")}),
    d_old AS ({dims.format(src="a_old")}),
    d_new AS ({dims.format(src="a_new")}),
    j AS (
      SELECT COALESCE(o.cid, n.cid) AS cid, COALESCE(o.dim, n.dim) AS dim,
             o.s AS s_old, o.n AS n_old, n.s AS s_new, n.n AS n_new
      FROM d_old o FULL OUTER JOIN d_new n ON o.cid = n.cid AND o.dim = n.dim),
    per AS (
      SELECT cid,
             MAX(COALESCE(n_old, 0)) AS n_old, MAX(COALESCE(n_new, 0)) AS n_new,
             list((CAST(s_new AS DOUBLE)/n_new - CAST(s_old AS DOUBLE)/n_old)
                  * (CAST(s_new AS DOUBLE)/n_new - CAST(s_old AS DOUBLE)/n_old)
                  ORDER BY dim) AS d2s
      FROM j GROUP BY cid)
    SELECT cid, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           CASE WHEN n_old > 0 AND n_new > 0 THEN
             round(sqrt(list_reduce(list_concat([CAST(0.0 AS DOUBLE)], d2s),
                                    (x, y) -> x + y)) / 1000000, 6)
           END AS centroid_drift
    FROM per
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_equi_depth_buckets_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import equi_depth_buckets
    from osmapreduceproject_spark.queries import _t

    o = _t(spark, SF_CORRECT, "orders")
    got = (
        equi_depth_buckets(o, "o_totalprice", 8)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("o_totalprice").cast("double")).alias("min_val"),
            F.max(F.col("o_totalprice").cast("double")).alias("max_val"),
        )
    )
    bounds = ", ".join(
        f"(SELECT quantile_disc(CAST(o_totalprice AS DOUBLE), {i}/8.0) FROM orders) AS b{i}"
        for i in range(1, 8)
    )
    case = " ".join(
        f"WHEN CAST(o_totalprice AS DOUBLE) <= b{i} THEN {i}" for i in range(1, 8)
    )
    sql = f"""
    WITH b AS (SELECT {bounds}),
    assigned AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v,
             CASE {case} ELSE 8 END AS bucket
      FROM orders, b)
    SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n_rows,
           MIN(v) AS min_val, MAX(v) AS max_val
    FROM assigned GROUP BY bucket
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_series_correlation_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import series_correlation

    e = _events(spark)
    got = series_correlation(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "click"),
        key="user_id", ts="ts", value_col="value", step_seconds=STEP,
    )
    one_side = f"""
      obs_{{side}} AS (
        SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_type = '{{etype}}'),
      spans_{{side}} AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs_{{side}} GROUP BY k),
      grid_{{side}} AS (
        SELECT k, unnest(range(
          CAST(ceil(lo / {STEP_US}.0) * {STEP_US} AS BIGINT),
          CAST(floor(hi / {STEP_US}.0) * {STEP_US} AS BIGINT) + 1,
          {STEP_US})) AS e
        FROM spans_{{side}}),
      rs_{{side}} AS (
        SELECT g.k, g.e // 1000000 AS slot_epoch, o.v
        FROM grid_{{side}} g ASOF JOIN obs_{{side}} o ON g.k = o.k AND o.e <= g.e)"""
    sql = f"""
    WITH {one_side.format(side="a", etype="view")},
    {one_side.format(side="b", etype="click")},
    j AS (
      SELECT a.k, a.v AS x, b.v AS y
      FROM rs_a a JOIN rs_b b ON a.k = b.k AND a.slot_epoch = b.slot_epoch),
    sums AS (
      SELECT k, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM j GROUP BY k)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n_slots,
           CASE WHEN n >= 2 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
             round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
           END AS corr
    FROM sums
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_multi_touch_attribution_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import multi_touch_attribution

    got = multi_touch_attribution(
        _events(spark), conversion_type="purchase",
        touch_types=("view", "click"), lookback_seconds=86400,
    )
    sql = """
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cts,
             CAST(value AS DOUBLE) AS cval
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id AS u, event_type AS channel, epoch_us(ts) AS tts
      FROM events WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT c.cid, c.cval, t.channel,
             COUNT(*) OVER (PARTITION BY c.cid) AS cnt
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE t.tts < c.cts AND t.tts >= c.cts - CAST(86400 AS BIGINT) * 1000000)
    SELECT channel, COUNT(*) AS n_touches,
           round(SUM(1.0 / cnt), 6) AS credited_conversions,
           round(SUM(cval / cnt), 6) AS credited_value
    FROM j GROUP BY channel
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_refresh_vocab_deltas_oracle(spark, duck):
    from osmapreduceproject_spark.pipelines import refresh_report
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    old = d.where(F.col("doc_id") % 10 != 7)
    new = d.where(F.col("doc_id") % 10 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    got = dict(refresh_report(old, new))["vocab_deltas"]
    vh = """
      vh_{side} AS (
        WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM {src}),
        counts AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        SELECT source,
               round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
               round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS hapax,
               round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS topshare
        FROM counts GROUP BY source)"""
    sql = f"""
    WITH oldsnap AS (SELECT * FROM documents WHERE doc_id % 10 != 7),
    newsnap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 1 THEN text || ' [edited]' ELSE text END AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 10 != 3),
    {vh.format(side="o", src="oldsnap")},
    {vh.format(side="n", src="newsnap")}
    SELECT COALESCE(o.source, n.source) AS source,
           round(n.ttr - o.ttr, 6) AS ttr_delta,
           round(n.hapax - o.hapax, 6) AS hapax_delta,
           round(n.topshare - o.topshare, 6) AS top_share_delta
    FROM vh_o o FULL OUTER JOIN vh_n n ON o.source = n.source
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_pagerank_dup_graph_oracle(spark, duck):
    from osmapreduceproject_spark.operators.dedup import ngram_jaccard_pairs, pagerank
    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import _jaccard_pairs_sql, _t

    d = _t(spark, SF_CORRECT, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.8).select(
        F.col("a_doc_id").alias("a_id"), F.col("b_doc_id").alias("b_id")
    )
    got = pagerank(d.select("doc_id"), pairs, iters=5, damping=0.85)
    n_sql = "(SELECT COUNT(*) FROM documents)"
    steps = []
    for k in range(1, 6):
        p = f"r{k-1}"
        steps.append(f"""
    d{k} AS (SELECT COALESCE(SUM(r), 0.0) AS dang FROM {p}
             WHERE node NOT IN (SELECT src FROM deg)),
    c{k} AS (SELECT e.dst AS node, SUM(p.r / g.deg) AS inc
             FROM edges e JOIN deg g ON g.src = e.src
             JOIN {p} p ON p.node = e.src GROUP BY e.dst),
    r{k} AS (
      SELECT b.node,
             round((1 - 0.85) / {n_sql} + 0.85 * (COALESCE(c.inc, 0.0)
                   + d.dang / {n_sql}), 12) AS r
      FROM (SELECT doc_id AS node FROM documents) b
      LEFT JOIN c{k} c ON c.node = b.node CROSS JOIN d{k} d)""")
    sql = f"""
    WITH {_jaccard_pairs_sql(None)},
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT doc_id AS node, 1.0 / {n_sql} AS r FROM documents),
    {",".join(steps)}
    SELECT node, round(r, 6) AS rank FROM r5
    """
    issues = compare(got, duck.execute(sql).df())
    release_intermediates()
    assert issues == []


def test_weighted_sample_oracle(spark, duck):
    from osmapreduceproject_spark.functions.hashing import md5_int_sql
    from osmapreduceproject_spark.operators.sampling import weighted_sample
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    got = weighted_sample(d, "n_chars", 50).select("doc_id", "source")
    bucket = md5_int_sql("'wsample|' || CAST(doc_id AS VARCHAR)") + " % 1000000"
    sql = f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             -ln(CAST({bucket} + 1 AS DOUBLE) / 1000001.0)
               / CAST(n_chars AS DOUBLE) AS wr
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
    ORDER BY wr ASC, doc_id ASC LIMIT 50
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_parquet_zone_map_oracle(spark, duck):
    from osmapreduceproject_spark.sources.io import parquet_zone_map

    got = parquet_zone_map(spark, f"{SF_CORRECT}/documents.parquet",
                           ["doc_id", "n_chars"])
    sql = f"""
    SELECT string_split(filename, '/')[-1] AS file,
           COUNT(*) AS n_rows,
           MIN(doc_id) AS doc_id_min, MAX(doc_id) AS doc_id_max,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_nulls,
           MIN(n_chars) AS n_chars_min, MAX(n_chars) AS n_chars_max,
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_nulls
    FROM read_parquet('{SF_CORRECT}/documents.parquet', filename=true)
    GROUP BY 1
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_winsorized_stats_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import winsorized_stats
    from osmapreduceproject_spark.queries import _t

    got = winsorized_stats(_t(spark, SF_CORRECT, "orders"), "o_totalprice",
                           0.01, 0.99)
    sql = """
    WITH b AS (
      SELECT quantile_disc(CAST(o_totalprice AS DOUBLE), 0.01) AS lo,
             quantile_disc(CAST(o_totalprice AS DOUBLE), 0.99) AS hi
      FROM orders)
    SELECT lo AS lo_bound, hi AS hi_bound, COUNT(*) AS n,
           CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_lo,
           CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_hi,
           CAST(SUM(CAST(least(greatest(CAST(o_totalprice AS DOUBLE), lo), hi)
                         AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS winsorized_mean
    FROM orders, b
    GROUP BY lo, hi
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_series_rolling_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import series_rolling

    got = series_rolling(_events(spark), key="user_id", ts="ts",
                         value_col="value", step_seconds=STEP, window_slots=12)
    sql = f"""
    WITH {_RESAMPLE_CTE}
    SELECT k AS user_id, slot_epoch, value,
           round(AVG(value) OVER w, 6) AS rolling_mean,
           MIN(value) OVER w AS rolling_min,
           MAX(value) OVER w AS rolling_max,
           COUNT(value) OVER w AS n_slots_in_window
    FROM resampled
    WINDOW w AS (PARTITION BY k ORDER BY slot_epoch
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_asof_forward_nearest_oracle(spark, duck):
    from osmapreduceproject_spark.operators.joins import asof_join

    e = _events(spark)
    purch = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts", "value")

    base = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    b AS (SELECT event_id, value AS bv, vts AS bt FROM (
            SELECT p.event_id, v.value, v.ts AS vts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY v.ts DESC) AS rn
            FROM p JOIN events v ON v.user_id = p.user_id
                 AND v.event_type = 'view' AND v.ts <= p.ts) t WHERE rn = 1),
    f AS (SELECT event_id, value AS fv, vts AS ft FROM (
            SELECT p.event_id, v.value, v.ts AS vts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY v.ts ASC) AS rn
            FROM p JOIN events v ON v.user_id = p.user_id
                 AND v.event_type = 'view' AND v.ts >= p.ts) t WHERE rn = 1)
    """

    fwd = asof_join(
        purch, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], direction="forward",
    ).select("event_id", F.col("value_asof"))
    sql_fwd = base + """
    SELECT p.event_id, f.fv AS value_asof
    FROM p LEFT JOIN f USING (event_id)
    """
    assert compare(fwd, duck.execute(sql_fwd).df()) == []

    near = asof_join(
        purch, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], direction="nearest",
    ).select("event_id", F.col("value_asof"))
    sql_near = base + """
    SELECT p.event_id,
           CASE WHEN f.ft IS NOT NULL AND (b.bt IS NULL
                     OR (epoch_us(f.ft) - epoch_us(p.ts))
                        < (epoch_us(p.ts) - epoch_us(b.bt)))
                THEN f.fv ELSE b.bv END AS value_asof
    FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    """
    assert compare(near, duck.execute(sql_near).df()) == []


def test_interval_union_duration_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import interval_union_duration

    e = _events(spark)
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    got = interval_union_duration(iv, key="user_id", start="s", end="e")
    sql = """
    WITH iv AS (
      SELECT user_id AS k, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS e
      FROM events),
    m AS (SELECT k, s, e,
                 MAX(e) OVER (PARTITION BY k ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pme
          FROM iv),
    fl AS (SELECT k, s, e,
                  CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nw
           FROM m),
    isl AS (SELECT k, s, e,
                   SUM(nw) OVER (PARTITION BY k ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
            FROM fl),
    pi AS (SELECT k, island, COUNT(*) AS n, MAX(e) - MIN(s) AS span
           FROM isl GROUP BY 1, 2)
    SELECT k AS user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
           COUNT(*) AS n_islands,
           CAST(SUM(span) // 1000000 AS BIGINT) AS covered_s
    FROM pi GROUP BY k
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_corr_matrix_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import corr_matrix
    from osmapreduceproject_spark.queries import _t

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = corr_matrix(_t(spark, SF_CORRECT, "lineitem"), cols)
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            parts.append(f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             AS corr
    FROM (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(xq) AS sx, SUM(yq) AS sy,
             SUM(xq*xq) AS sxx, SUM(yq*yq) AS syy, SUM(xq*yq) AS sxy
      FROM (
        SELECT CAST(round(CAST({a} AS DOUBLE) * 1000000) AS HUGEINT) AS xq,
               CAST(round(CAST({b} AS DOUBLE) * 1000000) AS HUGEINT) AS yq
        FROM lineitem
        WHERE {a} IS NOT NULL AND {b} IS NOT NULL))""")
    sql = "\nUNION ALL".join(parts)
    assert compare(got, duck.execute(sql).df()) == []


def test_funnel_step_latencies_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import funnel_step_latencies

    got = funnel_step_latencies(
        _events(spark), steps=("view", "click", "purchase")
    )
    sql = """
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS m1,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS m2,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS m3
      FROM events GROUP BY user_id)
    SELECT 'view' AS step_from, 'click' AS step_to,
           COUNT(*) AS n_converted,
           CAST(SUM(epoch_us(m2) - epoch_us(m1)) AS DOUBLE)
             / (COUNT(*) * 1000000.0) AS avg_latency_s,
           CAST(MIN(epoch_us(m2) - epoch_us(m1)) // 1000000 AS BIGINT) AS min_latency_s,
           CAST(MAX(epoch_us(m2) - epoch_us(m1)) // 1000000 AS BIGINT) AS max_latency_s
    FROM m WHERE m1 IS NOT NULL AND m2 IS NOT NULL
          AND epoch_us(m2) - epoch_us(m1) >= 0
    UNION ALL
    SELECT 'click', 'purchase', COUNT(*),
           CAST(SUM(epoch_us(m3) - epoch_us(m2)) AS DOUBLE)
             / (COUNT(*) * 1000000.0),
           CAST(MIN(epoch_us(m3) - epoch_us(m2)) // 1000000 AS BIGINT),
           CAST(MAX(epoch_us(m3) - epoch_us(m2)) // 1000000 AS BIGINT)
    FROM m WHERE m2 IS NOT NULL AND m3 IS NOT NULL
          AND epoch_us(m3) - epoch_us(m2) >= 0
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_gopher_rules_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import gopher_rules
    from osmapreduceproject_spark.queries import _t

    # Fixture-suited stopwords (DEFAULT_STOPWORDS): the synthetic vocab
    # carries only 'the'/'a' from Gopher's published list, so the
    # published list would drop every doc on no_stopwords — this list
    # gives the graded query a real keep/drop mix (293 keeps / 500).
    got = gopher_rules(
        _t(spark, SF_CORRECT, "documents"), min_words=30,
        stopwords=["the", "a", "of", "and", "to", "in"],
    )
    sql = """
    WITH feats AS (
      SELECT doc_id,
             string_split(text, ' ') AS ws,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis
      FROM documents),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                   / len(ws), 6) AS mean_word_len,
             round((n_hash + n_ellipsis) / len(ws), 6) AS symbol_ratio,
             round(CAST(len(list_filter(lines,
                     l -> starts_with(l, '- ') OR starts_with(l, '* ')
                          OR starts_with(l, chr(8226) || ' '))) AS DOUBLE)
                   / len(lines), 6) AS bullet_ratio,
             round(CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
                   / len(lines), 6) AS ellipsis_ratio,
             round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(ws), 6) AS alpha_word_ratio,
             len(list_filter(['the','a','of','and','to','in'],
                             s -> list_contains(ws, s))) AS stopword_hits
      FROM feats),
    r AS (
      SELECT *,
             list_filter([
               CASE WHEN n_words < 30 THEN 'too_few_words' END,
               CASE WHEN n_words > 100000 THEN 'too_many_words' END,
               CASE WHEN mean_word_len < 3.0 THEN 'short_words' END,
               CASE WHEN mean_word_len > 10.0 THEN 'long_words' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_heavy' END,
               CASE WHEN bullet_ratio > 0.9 THEN 'bullet_heavy' END,
               CASE WHEN ellipsis_ratio > 0.3 THEN 'ellipsis_heavy' END,
               CASE WHEN alpha_word_ratio < 0.8 THEN 'non_alpha' END,
               CASE WHEN stopword_hits < 2 THEN 'no_stopwords' END
             ], x -> x IS NOT NULL) AS rl
      FROM m)
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
           ellipsis_ratio, alpha_word_ratio, stopword_hits,
           COALESCE(list_aggregate(rl, 'string_agg', ','), '') AS reasons,
           len(rl) = 0 AS keep
    FROM r
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_ab_significance_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import ab_significance
    from osmapreduceproject_spark.functions.hashing import md5_int_sql

    got = ab_significance(_events(spark))
    sql = f"""
    WITH assigned AS (
      SELECT *, CASE WHEN {md5_int_sql("'ab|' || CAST(user_id AS VARCHAR)")} % 2 = 0
                     THEN 'A' ELSE 'B' END AS variant
      FROM events),
    per_user AS (
      SELECT variant, user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS m1,
             min(CASE WHEN event_type = 'click' THEN ts END) AS m2,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS m3
      FROM assigned GROUP BY variant, user_id),
    v AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(CASE WHEN m1 IS NOT NULL AND m2 IS NOT NULL AND m2 >= m1
                            AND m3 IS NOT NULL AND m3 >= m2
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM per_user GROUP BY variant),
    one AS (
      SELECT CAST(SUM(CASE WHEN variant = 'A' THEN n END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 'A' THEN x END) AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN variant = 'B' THEN n END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 'B' THEN x END) AS BIGINT) AS conv_b
      FROM v),
    c AS (
      SELECT *,
             CAST(conv_a AS DOUBLE) / n_a AS p_a,
             CAST(conv_b AS DOUBLE) / n_b AS p_b,
             CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS p
      FROM one)
    SELECT n_a, conv_a, n_b, conv_b,
           round(p_a, 6) AS rate_a, round(p_b, 6) AS rate_b,
           round(p_b - p_a, 6) AS lift,
           round((p_b - p_a) / sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)), 6)
             AS z_score,
           abs((p_b - p_a) / sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)))
             > 1.959964 AS significant
    FROM c
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_containment_pairs_oracle(spark, duck):
    from osmapreduceproject_spark.operators.dedup import containment_pairs
    from osmapreduceproject_spark.queries import _jaccard_toks_sql, _t

    got = containment_pairs(
        _t(spark, SF_CORRECT, "documents"), threshold=0.5, max_df=5
    )
    sql = f"""
    WITH {_jaccard_toks_sql(5)},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    c AS (
      SELECT i.a_id AS a_doc_id, i.b_id AS b_doc_id,
             CAST(i.n_common AS BIGINT) AS n_common,
             CAST(sa.set_size AS BIGINT) AS a_size,
             CAST(sb.set_size AS BIGINT) AS b_size,
             round(CAST(i.n_common AS DOUBLE) / sa.set_size, 6) AS containment_a,
             round(CAST(i.n_common AS DOUBLE) / sb.set_size, 6) AS containment_b,
             round(CAST(i.n_common AS DOUBLE)
                   / (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a_id
      JOIN sizes sb ON sb.doc_id = i.b_id)
    SELECT * FROM c WHERE containment_a >= 0.5 OR containment_b >= 0.5
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() > 0


def test_cms_heavy_hitters_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import cms_heavy_hitters
    from osmapreduceproject_spark.functions.hashing import seeded_hash_sql

    got = cms_heavy_hitters(
        _events(spark), "user_id", depth=4, width=256, min_share=0.005
    )
    per_seed = "\nUNION ALL\n".join(
        f"""SELECT {s} AS seed,
               {seeded_hash_sql('CAST(user_id AS VARCHAR)', s)} % 256 AS bucket,
               COUNT(*) AS bucket_count
        FROM events GROUP BY 1, 2"""
        for s in range(4)
    )
    cand_seed = "\nUNION ALL\n".join(
        f"""SELECT __k, exact_count, {s} AS seed,
               {seeded_hash_sql('__k', s)} % 256 AS bucket
        FROM exact"""
        for s in range(4)
    )
    sql = f"""
    WITH sketch AS ({per_seed}),
    exact AS (SELECT CAST(user_id AS VARCHAR) AS __k, COUNT(*) AS exact_count
              FROM events GROUP BY 1),
    cand AS ({cand_seed}),
    est AS (
      SELECT c.__k, c.exact_count, MIN(s.bucket_count) AS cms_estimate
      FROM cand c JOIN sketch s ON s.seed = c.seed AND s.bucket = c.bucket
      GROUP BY 1, 2),
    tot AS (SELECT SUM(exact_count) AS t FROM exact)
    SELECT est.__k AS user_id,
           CAST(est.exact_count AS BIGINT) AS exact_count,
           CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(est.cms_estimate - est.exact_count AS BIGINT) AS overestimate,
           round(CAST(est.cms_estimate AS DOUBLE) / tot.t, 6) AS est_share
    FROM est, tot WHERE est.cms_estimate >= 0.005 * tot.t
    """
    assert compare(got, duck.execute(sql).df()) == []
    out = got.toPandas()
    assert len(out) > 0 and (out.overestimate >= 0).all()


def test_key_skew_report_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import key_skew_report
    from osmapreduceproject_spark.functions.hashing import md5_int_sql

    got = key_skew_report(_events(spark), "user_id", n_partitions=200)
    sql = f"""
    WITH counts AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS c
                    FROM events GROUP BY 1),
    parts AS (SELECT {md5_int_sql('k')} % 200 AS p, SUM(c) AS pr
              FROM counts GROUP BY 1),
    t AS (SELECT SUM(c) AS n_rows, COUNT(*) AS n_keys, MAX(c) AS mx FROM counts),
    q AS (SELECT quantile_disc(c, 0.5) AS q50, quantile_disc(c, 0.9) AS q90,
                 quantile_disc(c, 0.99) AS q99 FROM counts),
    mp AS (SELECT MAX(pr) AS m FROM parts)
    SELECT CAST(t.n_rows AS BIGINT) AS n_rows,
           CAST(t.n_keys AS BIGINT) AS n_keys,
           CAST(t.mx AS BIGINT) AS max_key_count,
           round(CAST(t.mx AS DOUBLE) / t.n_rows, 6) AS top1_share,
           CAST(q.q50 AS BIGINT) AS p50_key_count,
           CAST(q.q90 AS BIGINT) AS p90_key_count,
           CAST(q.q99 AS BIGINT) AS p99_key_count,
           round(CAST(mp.m AS DOUBLE) / t.n_rows, 6) AS max_partition_share,
           round(CAST(mp.m AS DOUBLE) / t.n_rows * 200, 6) AS skew_factor
    FROM t, q, mp
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_bloom_prejoin_report_oracle(spark, duck):
    from osmapreduceproject_spark.operators.joins import bloom_prejoin_report
    from osmapreduceproject_spark.queries import _t
    from osmapreduceproject_spark.functions.hashing import seeded_hash_sql

    fact = _t(spark, SF_CORRECT, "orders")
    dim = _t(spark, SF_CORRECT, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    got = bloom_prejoin_report(
        fact, dim, "o_custkey", "c_custkey", n_bits=2048, n_hashes=3
    )
    bit_sql = "\nUNION\n".join(
        f"SELECT DISTINCT {seeded_hash_sql('CAST(k AS VARCHAR)', s)} % 2048 AS b FROM dimk"
        for s in range(3)
    )
    pos_sql = "\nUNION ALL\n".join(
        f"""SELECT o_orderkey,
               {seeded_hash_sql('CAST(o_custkey AS VARCHAR)', s)} % 2048 AS b
        FROM orders"""
        for s in range(3)
    )
    sql = f"""
    WITH dimk AS (SELECT DISTINCT c_custkey AS k FROM customer
                  WHERE c_mktsegment = 'BUILDING'),
    bits AS ({bit_sql}),
    pos AS ({pos_sql}),
    pass AS (
      SELECT o_orderkey FROM pos JOIN bits USING (b)
      GROUP BY o_orderkey HAVING COUNT(*) = 3),
    stats AS (
      SELECT (SELECT COUNT(*) FROM orders) AS n_fact,
             (SELECT COUNT(*) FROM pass) AS n_pass_bloom,
             (SELECT COUNT(*) FROM pass p JOIN orders o USING (o_orderkey)
              WHERE EXISTS (SELECT 1 FROM dimk d WHERE d.k = o.o_custkey))
               AS n_true_match)
    SELECT CAST(n_fact AS BIGINT) AS n_fact,
           CAST(n_pass_bloom AS BIGINT) AS n_pass_bloom,
           CAST(n_true_match AS BIGINT) AS n_true_match,
           CAST(n_pass_bloom - n_true_match AS BIGINT) AS n_false_pos,
           round(CAST(n_pass_bloom - n_true_match AS DOUBLE) / n_pass_bloom, 6)
             AS false_pos_rate,
           round(1.0 - CAST(n_pass_bloom AS DOUBLE) / n_fact, 6) AS pruned_frac
    FROM stats
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.toPandas().iloc[0]
    assert row.n_pass_bloom < row.n_fact          # it actually prunes
    assert row.n_true_match <= row.n_pass_bloom   # one-sided error only


def test_series_trend_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import series_trend

    got = series_trend(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP,
    )
    sql = f"""
    WITH {_RESAMPLE_CTE},
    xy AS (
      SELECT k,
             CAST((slot_epoch - MIN(slot_epoch) OVER (PARTITION BY k))
                  / {STEP} AS DOUBLE) AS x,
             CAST(value AS DOUBLE) AS y
      FROM resampled),
    s AS (
      SELECT k, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM xy GROUP BY k)
    SELECT k AS user_id, CAST(n AS BIGINT) AS n_slots,
           CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
                THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) END
             AS slope_per_step,
           CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
                THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) END
             AS intercept,
           CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                THEN round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                           / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END
             AS r2
    FROM s
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_chi2_independence_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import chi2_independence
    from osmapreduceproject_spark.queries import _t

    got = chi2_independence(_t(spark, SF_CORRECT, "documents"), "lang", "source")
    sql = """
    WITH cont AS (SELECT lang AS a, source AS b, COUNT(*) AS o
                  FROM documents GROUP BY 1, 2),
    cells AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS rt,
             SUM(o) OVER (PARTITION BY b) AS ct
      FROM cont),
    agg AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS INT) AS levels_a,
             CAST(COUNT(DISTINCT b) AS INT) AS levels_b,
             SUM(CAST(o AS DOUBLE) * o / (rt * ct)) AS s
      FROM cells)
    SELECT n, levels_a, levels_b,
           CAST((levels_a - 1) * (levels_b - 1) AS BIGINT) AS dof,
           round(n * s - n, 6) AS chi2,
           CASE WHEN n > 0 AND least(levels_a - 1, levels_b - 1) > 0
                THEN round(sqrt((n * s - n)
                                / (n * least(levels_a - 1, levels_b - 1))), 6)
           END AS cramers_v
    FROM agg
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_rfm_segmentation_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import rfm_segmentation

    got = rfm_segmentation(_events(spark))
    score = (
        "CASE WHEN {v} <= {q}[1] THEN 1 WHEN {v} <= {q}[2] THEN 2 "
        "WHEN {v} <= {q}[3] THEN 3 ELSE 4 END"
    )
    sql = f"""
    WITH per_user AS (
      SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
             SUM(CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
               / 1000000.0 AS monetary
      FROM events GROUP BY 1),
    anchor AS (SELECT MAX(last_ts) AS now FROM per_user),
    base AS (
      SELECT p.user_id, p.frequency, p.monetary,
             CAST(floor((epoch_us(a.now) - epoch_us(p.last_ts))
                        / 86400000000) AS BIGINT) AS recency_days
      FROM per_user p, anchor a),
    b2 AS (SELECT *, -CAST(recency_days AS DOUBLE) AS neg_rec FROM base),
    q AS (SELECT quantile_disc(neg_rec, [0.25, 0.5, 0.75]) AS qr,
                 quantile_disc(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS qf,
                 quantile_disc(monetary, [0.25, 0.5, 0.75]) AS qm
          FROM b2),
    scored AS (
      SELECT b.user_id, b.recency_days, b.frequency,
             round(b.monetary, 6) AS monetary,
             CAST({score.format(v='b.neg_rec', q='q.qr')} AS INT) AS r_score,
             CAST({score.format(v='CAST(b.frequency AS DOUBLE)', q='q.qf')} AS INT)
               AS f_score,
             CAST({score.format(v='b.monetary', q='q.qm')} AS INT) AS m_score
      FROM b2 b, q)
    SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
              || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """
    assert compare(got, duck.execute(sql).df()) == []
    seg = got.toPandas()
    assert seg.r_score.between(1, 4).all() and seg.segment.str.len().eq(3).all()


def test_ewma_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import ewma

    got = ewma(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP, alpha=0.3,
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
      FROM numbered n JOIN walk w ON n.k = w.k AND n.ord = w.ord + 1)
    SELECT k AS user_id, slot_epoch, value, eq / 1000000.0 AS ewma FROM walk
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_hashing_vectorizer_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import hashing_vectorizer
    from osmapreduceproject_spark.queries import _t
    from osmapreduceproject_spark.functions.hashing import md5_int_sql, seeded_hash_sql

    got = hashing_vectorizer(_t(spark, SF_CORRECT, "documents"), dim=1024)
    sql = f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
    SELECT doc_id, {md5_int_sql('tok')} % 1024 AS bucket,
           CAST(SUM(CASE WHEN {seeded_hash_sql('tok', 1)} % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM toks GROUP BY 1, 2
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_welch_ttest_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import welch_ttest

    got = welch_ttest(_events(spark), "event_type", "value", "view", "purchase")
    xq = (
        "CASE WHEN event_type = '{g}' AND value IS NOT NULL "
        "AND NOT isnan(CAST(value AS DOUBLE)) "
        "THEN CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) END"
    )
    sql = f"""
    WITH s AS (
      SELECT COUNT({xq.format(g='view')}) AS n_a,
             SUM({xq.format(g='view')}) AS sx_a,
             SUM({xq.format(g='view')} * {xq.format(g='view')}) AS sxx_a,
             COUNT({xq.format(g='purchase')}) AS n_b,
             SUM({xq.format(g='purchase')}) AS sx_b,
             SUM({xq.format(g='purchase')} * {xq.format(g='purchase')}) AS sxx_b
      FROM events),
    m AS (
      SELECT *,
             CAST(sx_a AS DOUBLE) / n_a / 1000000 AS mean_a,
             CAST(sx_b AS DOUBLE) / n_b / 1000000 AS mean_b,
             CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)
               / (n_a * (n_a - 1)) / 1000000000000.0 / n_a AS vn_a,
             CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)
               / (n_b * (n_b - 1)) / 1000000000000.0 / n_b AS vn_b
      FROM s)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_b - mean_a) / sqrt(vn_a + vn_b), 6) AS t_stat,
           round((vn_a + vn_b) * (vn_a + vn_b)
                 / (vn_a * vn_a / (n_a - 1) + vn_b * vn_b / (n_b - 1)), 6)
             AS welch_dof
    FROM m
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_readability_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import readability
    from osmapreduceproject_spark.queries import _t

    got = readability(_t(spark, SF_CORRECT, "documents"))
    sql = """
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1)
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, CAST(n_sentences AS INT) AS n_sentences, n_syllables,
           round(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
                 - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             AS flesch
    FROM m
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_quality_report_sections_oracle(spark, duck):
    """The future pipeline grade (q166 delegate pattern): the graded
    query will call pipelines.quality_report and publish sections —
    gopher_summary and readability_by_source verified cross-engine
    here against the composed SQL."""
    from osmapreduceproject_spark.pipelines import quality_report
    from osmapreduceproject_spark.queries import _t

    sections = dict(quality_report(_t(spark, SF_CORRECT, "documents")))
    g_sql = """
    WITH feats AS (
      SELECT doc_id,
             string_split(text, ' ') AS ws,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis
      FROM documents),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                   / len(ws), 6) AS mean_word_len,
             round((n_hash + n_ellipsis) / len(ws), 6) AS symbol_ratio,
             round(CAST(len(list_filter(lines,
                     l -> starts_with(l, '- ') OR starts_with(l, '* ')
                          OR starts_with(l, chr(8226) || ' '))) AS DOUBLE)
                   / len(lines), 6) AS bullet_ratio,
             round(CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
                   / len(lines), 6) AS ellipsis_ratio,
             round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(ws), 6) AS alpha_word_ratio,
             len(list_filter(['the','a','of','and','to','in'],
                             s -> list_contains(ws, s))) AS stopword_hits
      FROM feats),
    r AS (
      SELECT list_filter([
               CASE WHEN n_words < 30 THEN 'too_few_words' END,
               CASE WHEN n_words > 100000 THEN 'too_many_words' END,
               CASE WHEN mean_word_len < 3.0 THEN 'short_words' END,
               CASE WHEN mean_word_len > 10.0 THEN 'long_words' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_heavy' END,
               CASE WHEN bullet_ratio > 0.9 THEN 'bullet_heavy' END,
               CASE WHEN ellipsis_ratio > 0.3 THEN 'ellipsis_heavy' END,
               CASE WHEN alpha_word_ratio < 0.8 THEN 'non_alpha' END,
               CASE WHEN stopword_hits < 2 THEN 'no_stopwords' END
             ], x -> x IS NOT NULL) AS rl
      FROM m),
    ex AS (
      SELECT unnest(CASE WHEN len(rl) = 0 THEN ['__kept'] ELSE rl END) AS rule
      FROM r)
    SELECT rule, COUNT(*) AS n_docs FROM ex GROUP BY rule
    """
    assert compare(sections["gopher_summary"], duck.execute(g_sql).df()) == []
    r_sql = """
    WITH m AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_words,
             greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS n_sent,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents),
    f AS (
      SELECT source,
             round(CAST(206.835 AS DOUBLE)
                   - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sent)
                   - CAST(84.6 AS DOUBLE) * (CAST(n_syll AS DOUBLE) / n_words), 6)
               AS flesch
      FROM m)
    SELECT source, COUNT(*) AS n_docs,
           round(SUM(CAST(round(flesch * 1000000) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6) AS mean_flesch,
           MIN(flesch) AS min_flesch, MAX(flesch) AS max_flesch
    FROM f GROUP BY source
    """
    assert compare(sections["readability_by_source"], duck.execute(r_sql).df()) == []
    assert sections["length_histogram"].count() > 0


def test_resample_interpolate_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import resample_interpolate

    got = resample_interpolate(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP,
    )
    sql = f"""
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
                 FROM events),
    obs2 AS (SELECT k, e, MAX(v) AS v FROM obs GROUP BY 1, 2),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / {STEP_US}.0) * {STEP_US} AS BIGINT),
        CAST(floor(hi / {STEP_US}.0) * {STEP_US} AS BIGINT) + 1,
        {STEP_US})) AS e
      FROM spans),
    b AS (SELECT g.k, g.e, o.v AS pv, o.e AS pe
          FROM grid g ASOF JOIN obs2 o ON g.k = o.k AND o.e <= g.e),
    f AS (SELECT g.k, g.e, o.v AS nv, o.e AS ne
          FROM grid g ASOF JOIN obs2 o ON g.k = o.k AND o.e >= g.e)
    SELECT b.k AS user_id, b.e // 1000000 AS slot_epoch,
           round(CASE WHEN f.ne = b.pe THEN b.pv
                      ELSE b.pv + (f.nv - b.pv)
                           * (CAST(b.e - b.pe AS DOUBLE) / (f.ne - b.pe))
                 END, 6) AS value,
           (b.e - b.pe) // 1000000 AS prev_gap_s,
           (f.ne - b.e) // 1000000 AS next_gap_s
    FROM b JOIN f ON f.k = b.k AND f.e = b.e
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_psi_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import psi
    from osmapreduceproject_spark.queries import _t

    o = _t(spark, SF_CORRECT, "orders")
    got = psi(o, o.where(F.col("o_orderpriority") == "1-URGENT"),
              "o_totalprice", n_bins=10)
    case = " ".join(
        f"WHEN v <= q[{i}] THEN {i}" for i in range(1, 10)
    )
    sql = f"""
    WITH q AS (SELECT quantile_disc(CAST(o_totalprice AS DOUBLE),
                 [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q FROM orders),
    r AS (SELECT CASE {case} ELSE 10 END AS bin, COUNT(*) AS n_ref
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders), q
          GROUP BY 1),
    c AS (SELECT CASE {case} ELSE 10 END AS bin, COUNT(*) AS n_cur
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                WHERE o_orderpriority = '1-URGENT'), q
          GROUP BY 1),
    bins AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
    j AS (SELECT b.bin, COALESCE(r.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
          FROM bins b LEFT JOIN r ON r.bin = b.bin LEFT JOIN c ON c.bin = b.bin),
    t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM j)
    SELECT j.bin, CAST(j.n_ref AS BIGINT) AS n_ref, CAST(j.n_cur AS BIGINT) AS n_cur,
           round(greatest(CAST(j.n_ref AS DOUBLE) / t.tr, CAST(1e-6 AS DOUBLE)), 6)
             AS p_ref,
           round(greatest(CAST(j.n_cur AS DOUBLE) / t.tc, CAST(1e-6 AS DOUBLE)), 6)
             AS p_cur,
           round((greatest(CAST(j.n_cur AS DOUBLE) / t.tc, CAST(1e-6 AS DOUBLE))
                  - greatest(CAST(j.n_ref AS DOUBLE) / t.tr, CAST(1e-6 AS DOUBLE)))
                 * ln(greatest(CAST(j.n_cur AS DOUBLE) / t.tc, CAST(1e-6 AS DOUBLE))
                      / greatest(CAST(j.n_ref AS DOUBLE) / t.tr, CAST(1e-6 AS DOUBLE))), 6)
             AS psi_term
    FROM j, t
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() == 10


def _hll_sql(table, key, m=1024):
    from osmapreduceproject_spark.functions.hashing import md5_int_sql

    shift, rest_mod = 60 - 10, 1 << 50
    scale = 1 << (shift + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    const = alpha * m * m * float(scale)
    return f"""
    WITH hv AS (SELECT {md5_int_sql(f'CAST({key} AS VARCHAR)')} AS h
                FROM {table} WHERE {key} IS NOT NULL),
    regs AS (
      SELECT h >> {shift} AS r,
             MAX(CASE WHEN h % {rest_mod} = 0 THEN {shift + 1}
                      ELSE {shift + 1} - length(bin(h % {rest_mod})) END) AS m
      FROM hv GROUP BY 1),
    s AS (SELECT COUNT(*) AS n_present,
                 SUM(CAST(pow(2.0, {shift + 1} - m) AS BIGINT)) AS sp
          FROM regs),
    ex AS (SELECT COUNT(DISTINCT {key}) AS exact_distinct
           FROM {table} WHERE {key} IS NOT NULL),
    c AS (
      SELECT s.n_present, ex.exact_distinct,
             CAST({const!r} AS DOUBLE)
               / (s.sp + ({m} - s.n_present) * CAST({scale} AS BIGINT)) AS raw,
             {m} - s.n_present AS zeros
      FROM s, ex),
    e AS (
      SELECT *, CASE WHEN zeros > 0 AND raw <= {2.5 * m!r}
                     THEN CAST({float(m)!r} AS DOUBLE)
                          * ln(CAST({float(m)!r} AS DOUBLE) / zeros)
                     ELSE raw END AS est
      FROM c)
    SELECT {m} AS n_registers, CAST(n_present AS BIGINT) AS n_present,
           round(est, 6) AS hll_estimate,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round((est - exact_distinct) / exact_distinct, 6) AS rel_error
    FROM e
    """


def test_hll_estimate_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import hll_estimate
    from osmapreduceproject_spark.queries import _t

    # 150 distinct users → linear-counting branch
    got = hll_estimate(_events(spark), "user_id")
    assert compare(got, duck.execute(_hll_sql("events", "user_id")).df()) == []
    row = got.first()
    assert abs(row["rel_error"]) < 0.25

    # ~15k distinct order keys → raw harmonic branch
    got2 = hll_estimate(_t(spark, SF_CORRECT, "lineitem"), "l_orderkey")
    assert compare(got2, duck.execute(_hll_sql("lineitem", "l_orderkey")).df()) == []
    row2 = got2.first()
    assert row2["n_present"] > 900          # registers saturated → raw branch
    assert abs(row2["rel_error"]) < 0.15    # ~3.25%/sqrt(m) expected


def test_chunk_documents_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import chunk_documents
    from osmapreduceproject_spark.queries import _t

    got = chunk_documents(
        _t(spark, SF_CORRECT, "documents"), chunk_tokens=40, stride=20
    )
    sql = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    k AS (SELECT doc_id, ws,
                 unnest(range(CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS chunk_id
          FROM w)
    SELECT doc_id, chunk_id,
           CAST(len(ws[chunk_id * 20 + 1 : chunk_id * 20 + 40]) AS INT) AS n_tokens,
           array_to_string(ws[chunk_id * 20 + 1 : chunk_id * 20 + 40], ' ')
             AS chunk_text
    FROM k
    """
    assert compare(got, duck.execute(sql).df()) == []
    # overlap: consecutive chunks share chunk_tokens - stride tokens
    one = got.where(F.col("doc_id") == 1).orderBy("chunk_id").collect()
    if len(one) >= 2:
        a, b = one[0]["chunk_text"].split(" "), one[1]["chunk_text"].split(" ")
        assert a[20:] == b[: len(a) - 20]


def test_negative_pairs_oracle(spark, duck):
    from osmapreduceproject_spark.operators.sampling import negative_pairs
    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import _t
    from osmapreduceproject_spark.functions.hashing import md5_int_sql

    got = negative_pairs(_t(spark, SF_CORRECT, "documents"), k=3)
    h = md5_int_sql("'neg|' || CAST(doc_id AS VARCHAR) || '|' || CAST(t AS VARCHAR)")
    sql = f"""
    WITH idx AS (SELECT doc_id,
                        ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
                 FROM documents),
    n AS (SELECT COUNT(*) AS n FROM idx),
    drawn AS (
      SELECT idx.doc_id AS anchor_id, CAST(t AS INT) AS neg_rank,
             {h} % (n.n - 1) AS j0, idx.i
      FROM idx, n, (SELECT unnest(range(1, 4)) AS t)
      WHERE n.n >= 2),
    mapped AS (
      SELECT anchor_id, neg_rank,
             CASE WHEN j0 < i THEN j0 ELSE j0 + 1 END AS j
      FROM drawn)
    SELECT m.anchor_id, m.neg_rank, idx.doc_id AS negative_id
    FROM mapped m JOIN idx ON idx.i = m.j
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert len(pdf) == 3 * 500
    assert (pdf.anchor_id != pdf.negative_id).all()   # skip-self holds
    release_intermediates()


def test_bootstrap_mean_ci_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import (
        _POIS1_CDF,
        bootstrap_mean_ci,
    )
    from osmapreduceproject_spark.functions.hashing import md5_int_sql

    B = 16
    got = bootstrap_mean_ci(_events(spark), "value", n_resamples=B)
    w_case = "CASE " + " ".join(
        f"WHEN u{{b}} < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    ) + " ELSE 8 END"
    cols, sums = [], []
    # one md5 feeds three resamples: 20-bit lanes of the 60-bit hash
    for g in range((B + 2) // 3):
        h = md5_int_sql(
            "'boot|' || CAST(CAST(value AS DOUBLE) AS VARCHAR) || '|" + str(g) + "'"
        )
        cols.append(f"{h} AS h{g}")
    for b in range(B):
        g, lane = b // 3, b % 3
        cols.append(
            f"CAST((h{g} >> {20 * lane}) % 1048576 AS DOUBLE) / 1048576.0 AS u{b}"
        )
        sums.append(
            f"SUM(CAST({w_case.format(b=b)} AS HUGEINT) * xq) AS swx_{b}, "
            f"SUM(CAST({w_case.format(b=b)} AS HUGEINT)) AS sw_{b}"
        )
    mean_list = ", ".join(
        f"CAST(swx_{b} AS DOUBLE) / sw_{b} / 1000000" for b in range(B)
    )
    sql = f"""
    WITH base AS (
      SELECT CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) AS xq,
             {', '.join(cols)}
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    s AS (SELECT COUNT(*) AS n, SUM(xq) AS sx, {', '.join(sums)} FROM base),
    means AS (
      SELECT s.n, s.sx, unnest([{mean_list}]) AS m FROM s),
    ranked AS (
      SELECT n, sx, m,
             ROW_NUMBER() OVER (ORDER BY m) AS rk,
             COUNT(*) OVER () AS nb
      FROM means WHERE m IS NOT NULL)
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(sx AS DOUBLE) / n / 1000000, 6) AS mean,
           round(MAX(CASE WHEN rk = greatest(1, CAST(ceil(0.025 * nb) AS BIGINT))
                          THEN m END), 6) AS ci_lo,
           round(MAX(CASE WHEN rk = greatest(1, CAST(ceil(0.975 * nb) AS BIGINT))
                          THEN m END), 6) AS ci_hi,
           {B} AS n_resamples
    FROM ranked GROUP BY n, sx
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]


def test_windowed_funnel_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import (
        funnel_counts,
        windowed_funnel,
    )

    W = 21600  # 6h — tight enough to bite on the fixture
    got = windowed_funnel(_events(spark), within_seconds=W)
    wus = W * 1_000_000
    sql = f"""
    WITH a1 AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS a FROM events
                WHERE event_type = 'view' GROUP BY 1),
    a2 AS (SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS a
           FROM events e JOIN a1 ON a1.u = e.user_id
           WHERE e.event_type = 'click'
             AND epoch_us(e.ts) > a1.a AND epoch_us(e.ts) <= a1.a + {wus}
           GROUP BY 1),
    a3 AS (SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS a
           FROM events e JOIN a2 ON a2.u = e.user_id
           WHERE e.event_type = 'purchase'
             AND epoch_us(e.ts) > a2.a AND epoch_us(e.ts) <= a2.a + {wus}
           GROUP BY 1)
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           (SELECT COUNT(*) FROM a1) AS n_users
    UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM a2)
    UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM a3)
    """
    assert compare(got, duck.execute(sql).df()) == []
    # the window must actually constrain vs the unbounded funnel
    rows = {r["step"]: r["n_users"] for r in got.collect()}
    unbounded = {
        r["step"]: r["n_users"] for r in funnel_counts(_events(spark)).collect()
    }
    assert rows[1] == unbounded[1]          # step-1 anchor is identical
    assert rows[2] <= rows[1] and rows[3] <= rows[2]


def test_cusum_changepoints_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import cusum_changepoints

    got = cusum_changepoints(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP,
    )
    z = "CAST(round((b.value - b.mu) / b.sigma * 1000000) AS BIGINT)"
    sql = f"""
    WITH RECURSIVE {_RESAMPLE_CTE},
    mu AS (SELECT k, SUM(CAST(round(value * 1000000) AS BIGINT))
                    / (COUNT(*) * 1000000.0) AS mu
           FROM resampled GROUP BY k),
    med AS (SELECT k, quantile_disc(value, 0.5) AS med FROM resampled GROUP BY k),
    mad AS (SELECT r.k, quantile_disc(abs(r.value - med.med), 0.5) AS mad
            FROM resampled r JOIN med USING (k) GROUP BY r.k),
    b AS (SELECT r.k, r.slot_epoch, r.value, mu.mu,
                 mad.mad * CAST(1.4826 AS DOUBLE) AS sigma,
                 ROW_NUMBER() OVER (PARTITION BY r.k ORDER BY r.slot_epoch) AS ord
          FROM resampled r JOIN mu USING (k) JOIN mad USING (k)
          WHERE mad.mad > 0),
    walk AS (
      SELECT k, ord, slot_epoch, value,
             greatest(CAST(0 AS BIGINT), {z} - 500000) AS up,
             greatest(CAST(0 AS BIGINT), -{z} - 500000) AS dn
      FROM b WHERE ord = 1
      UNION ALL
      SELECT b.k, b.ord, b.slot_epoch, b.value,
             greatest(CAST(0 AS BIGINT),
               (CASE WHEN w.up > 5000000 THEN 0 ELSE w.up END) + {z} - 500000),
             greatest(CAST(0 AS BIGINT),
               (CASE WHEN w.dn > 5000000 THEN 0 ELSE w.dn END) - {z} - 500000)
      FROM b JOIN walk w ON w.k = b.k AND b.ord = w.ord + 1)
    SELECT k AS user_id, slot_epoch, value,
           CASE WHEN up > 5000000 THEN 'up' ELSE 'down' END AS side,
           round((CASE WHEN up > 5000000 THEN up ELSE dn END) / 1000000.0, 6)
             AS cusum_stat
    FROM walk WHERE up > 5000000 OR dn > 5000000
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_target_encode_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import target_encode
    from osmapreduceproject_spark.queries import _t

    got = target_encode(
        _t(spark, SF_CORRECT, "orders"), "o_orderpriority", "o_totalprice"
    )
    sql = """
    WITH base AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_totalprice IS NOT NULL
                   AND NOT isnan(CAST(o_totalprice AS DOUBLE))
                  THEN CAST(round(CAST(o_totalprice AS DOUBLE) * 1000000)
                            AS HUGEINT) END AS yq
      FROM orders),
    per AS (SELECT category, COUNT(yq) AS n, SUM(yq) AS sy
            FROM base GROUP BY 1),
    tot AS (SELECT SUM(n) AS tn, SUM(sy) AS tsy FROM per)
    SELECT per.category, CAST(per.n AS BIGINT) AS n,
           round(CAST(per.sy AS DOUBLE) / per.n / 1000000, 6) AS category_mean,
           round((CAST(per.sy AS DOUBLE) / 1000000
                  + CAST(10.0 AS DOUBLE)
                    * (CAST(tot.tsy AS DOUBLE) / tot.tn / 1000000))
                 / (per.n + CAST(10.0 AS DOUBLE)), 6) AS encoding,
           round(CAST(tot.tsy AS DOUBLE) / tot.tn / 1000000, 6) AS prior
    FROM per, tot
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_expect_report_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import expect_report
    from osmapreduceproject_spark.queries import _t

    rules = [
        {"col": "l_quantity", "check": "min", "arg": 1},
        {"col": "l_quantity", "check": "max", "arg": 30},
        {"col": "l_shipdate", "check": "not_null"},
        {"col": "l_returnflag", "check": "in_set", "arg": ["A", "N"]},
        {"col": "l_linestatus", "check": "regex", "arg": "^O$"},
        {"col": "l_orderkey", "check": "unique"},
    ]
    got = expect_report(_t(spark, SF_CORRECT, "lineitem"), rules)
    sql = """
    WITH s AS (
      SELECT COUNT(*) AS n,
        SUM(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 1
                 THEN 1 ELSE 0 END) AS v0,
        SUM(CASE WHEN l_quantity IS NOT NULL AND l_quantity > 30
                 THEN 1 ELSE 0 END) AS v1,
        SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v2,
        SUM(CASE WHEN l_returnflag IS NOT NULL
                  AND l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END) AS v3,
        SUM(CASE WHEN l_linestatus IS NOT NULL
                  AND NOT regexp_matches(CAST(l_linestatus AS VARCHAR), '^O$')
                 THEN 1 ELSE 0 END) AS v4,
        COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS v5
      FROM lineitem),
    r AS (
      SELECT * FROM (VALUES
        (0, 'l_quantity', 'min'), (1, 'l_quantity', 'max'),
        (2, 'l_shipdate', 'not_null'), (3, 'l_returnflag', 'in_set'),
        (4, 'l_linestatus', 'regex'), (5, 'l_orderkey', 'unique'))
        AS t(rule_id, col, "check"))
    SELECT CAST(r.rule_id AS INT) AS rule_id, r.col, r."check",
           CAST(s.n AS BIGINT) AS n_rows,
           CAST(CASE r.rule_id WHEN 0 THEN s.v0 WHEN 1 THEN s.v1
                WHEN 2 THEN s.v2 WHEN 3 THEN s.v3 WHEN 4 THEN s.v4
                ELSE s.v5 END AS BIGINT) AS n_violations,
           CASE WHEN s.n > 0 THEN
             round(CAST(CASE r.rule_id WHEN 0 THEN s.v0 WHEN 1 THEN s.v1
                        WHEN 2 THEN s.v2 WHEN 3 THEN s.v3 WHEN 4 THEN s.v4
                        ELSE s.v5 END AS DOUBLE) / s.n, 6) END AS violation_rate
    FROM r, s
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas().set_index("rule_id")
    assert pdf.loc[1, "n_violations"] > 0     # quantities above 30 exist
    assert pdf.loc[5, "n_violations"] > 0     # orderkey repeats in lineitem


def test_benford_check_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import benford_check
    from osmapreduceproject_spark.queries import _t

    got = benford_check(_t(spark, SF_CORRECT, "orders"), "o_totalprice")
    sql = """
    WITH base AS (
      SELECT CAST(substr(CAST(CAST(round(abs(CAST(o_totalprice AS DOUBLE)) * 100)
                               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))
        AND CAST(round(abs(CAST(o_totalprice AS DOUBLE)) * 100) AS BIGINT) >= 1),
    counts AS (SELECT digit, COUNT(*) AS n FROM base GROUP BY 1),
    fl AS (
      SELECT d.digit, COALESCE(c.n, 0) AS n
      FROM (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit) d
      LEFT JOIN counts c ON c.digit = d.digit),
    t AS (SELECT SUM(n) AS t FROM fl)
    SELECT f.digit, CAST(f.n AS BIGINT) AS n,
           round(CAST(f.n AS DOUBLE) / t.t, 6) AS observed_share,
           round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / f.digit), 6)
             AS benford_share,
           round((CAST(f.n AS DOUBLE) / t.t
                  - log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / f.digit))
                 * (CAST(f.n AS DOUBLE) / t.t
                    - log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / f.digit))
                 / log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / f.digit)
                 * t.t, 6) AS chi2_term
    FROM fl f, t
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() == 9


def test_recall_at_k_oracle(spark, duck):
    """recall_at_k's join/count logic verified cross-engine over pinned
    inputs (exact vs IVF top-k on the embeddings fixture — the future
    graded query composes the q34/q66 oracle replicas the same way)."""
    from osmapreduceproject_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        recall_at_k,
    )
    from osmapreduceproject_spark.queries import _t

    emb = _t(spark, SF_CORRECT, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, qs, k=10)
    approx = ivf_topk(emb, qs, k=10, n_centroids=16, nprobe=4)
    got = recall_at_k(exact, approx)
    duck.register("__exact", exact.toPandas())
    duck.register("__approx", approx.toPandas())
    sql = """
    WITH e AS (SELECT query_id, neighbor_id FROM __exact),
    a AS (SELECT query_id, neighbor_id FROM __approx),
    hits AS (SELECT e.query_id, COUNT(*) AS n_hit
             FROM e JOIN a ON a.query_id = e.query_id
                          AND a.neighbor_id = e.neighbor_id
             GROUP BY 1),
    t AS (SELECT query_id, COUNT(*) AS n_expected FROM e GROUP BY 1)
    SELECT t.query_id, CAST(t.n_expected AS BIGINT) AS n_expected,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_expected, 6) AS recall
    FROM t LEFT JOIN hits h ON h.query_id = t.query_id
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert len(pdf) == 10 and (pdf.recall > 0).all()
    assert pdf.recall.mean() > 0.5  # nprobe=4/16 recovers most neighbors
    duck.unregister("__exact")
    duck.unregister("__approx")


def test_activity_streaks_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import activity_streaks

    got = activity_streaks(_events(spark))
    sql = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events),
    isl AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
      FROM days),
    runs AS (
      SELECT user_id, g, COUNT(*) AS len, MAX(d) AS e
      FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(max_by(len, e) AS BIGINT) AS current_streak
    FROM runs GROUP BY user_id
    """
    assert compare(got, duck.execute(sql).df()) == []
    pdf = got.toPandas()
    assert (pdf.longest_streak >= pdf.current_streak).all()
    assert (pdf.n_active_days >= pdf.longest_streak).all()


def test_mutual_information_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import mutual_information
    from osmapreduceproject_spark.queries import _t

    got = mutual_information(_t(spark, SF_CORRECT, "documents"), "lang", "source")
    sql = """
    WITH cont AS (SELECT lang AS a, source AS b, COUNT(*) AS o
                  FROM documents GROUP BY 1, 2),
    tot AS (SELECT SUM(o) AS n FROM cont),
    ra AS (SELECT a, SUM(o) AS rt FROM cont GROUP BY 1),
    rb AS (SELECT b, SUM(o) AS ct FROM cont GROUP BY 1),
    mi AS (
      SELECT MAX(t.n) AS n,
             SUM((CAST(o AS DOUBLE) / t.n)
                 * ln(CAST(o AS DOUBLE) * t.n / (ra.rt * rb.ct))) AS mi
      FROM cont JOIN ra USING (a) JOIN rb USING (b), tot t),
    ha AS (SELECT SUM(-(CAST(rt AS DOUBLE) / t.n)
                      * ln(CAST(rt AS DOUBLE) / t.n)) AS h_a
           FROM ra, tot t),
    hb AS (SELECT SUM(-(CAST(ct AS DOUBLE) / t.n)
                      * ln(CAST(ct AS DOUBLE) / t.n)) AS h_b
           FROM rb, tot t)
    SELECT CAST(mi.n AS BIGINT) AS n, round(mi.mi, 6) AS mi_nats,
           round(ha.h_a, 6) AS h_a, round(hb.h_b, 6) AS h_b,
           CASE WHEN least(ha.h_a, hb.h_b) > 0
                THEN round(mi.mi / least(ha.h_a, hb.h_b), 6) END AS normalized_mi
    FROM mi, ha, hb
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    assert 0 <= row["normalized_mi"] <= 1 or abs(row["mi_nats"]) < 1e-5


def test_seasonal_profile_oracle(spark, duck):
    from osmapreduceproject_spark.operators.windows import seasonal_profile

    got = seasonal_profile(
        _events(spark), key="user_id", ts="ts", value_col="value",
        step_seconds=STEP, period_slots=24,
    )
    sql = f"""
    WITH {_RESAMPLE_CTE},
    base AS (
      SELECT k, CAST((slot_epoch // {STEP}) % 24 AS INT) AS season_pos,
             CAST(round(value * 1000000) AS BIGINT) AS vq
      FROM resampled),
    per_pos AS (SELECT k, season_pos, COUNT(*) AS n_slots, SUM(vq) AS s
                FROM base GROUP BY 1, 2),
    per_key AS (SELECT k, COUNT(*) AS kn, SUM(vq) AS ks FROM base GROUP BY 1)
    SELECT p.k AS user_id, p.season_pos, CAST(p.n_slots AS BIGINT) AS n_slots,
           round(CAST(p.s AS DOUBLE) / p.n_slots / 1000000, 6) AS pos_mean,
           round(CAST(p.s AS DOUBLE) / p.n_slots / 1000000
                 - CAST(g.ks AS DOUBLE) / g.kn / 1000000, 6) AS seasonal_index
    FROM per_pos p JOIN per_key g ON g.k = p.k
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_temporal_split_oracle(spark, duck):
    from osmapreduceproject_spark.operators.sampling import temporal_split

    got = (
        temporal_split(_events(spark), "ts", train_frac=0.8)
        .groupBy("split", "cutoff_epoch_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.unix_micros("ts")).alias("max_e"),
            F.min(F.unix_micros("ts")).alias("min_e"),
        )
    )
    sql = """
    WITH e AS (SELECT epoch_us(ts) AS e FROM events WHERE ts IS NOT NULL),
    c AS (SELECT quantile_disc(e, 0.8) AS cutoff FROM e)
    SELECT CASE WHEN e.e <= c.cutoff THEN 'train' ELSE 'eval' END AS split,
           c.cutoff AS cutoff_epoch_us,
           COUNT(*) AS n, MAX(e.e) AS max_e, MIN(e.e) AS min_e
    FROM e, c GROUP BY 1, 2
    """
    assert compare(got, duck.execute(sql).df()) == []
    rows = {r["split"]: r for r in got.collect()}
    # no leakage: every train row precedes every eval row
    assert rows["train"]["max_e"] <= rows["eval"]["min_e"]
    assert rows["train"]["n"] >= rows["eval"]["n"]


def test_ewma_events_batch_oracle(spark, duck):
    """Oracle for the future streaming-twin grade (q164 pattern: the
    graded query runs the batch twin; stream equivalence is asserted in
    tests/test_streaming.py)."""
    from osmapreduceproject_spark.streaming.stateful import ewma_events_batch

    got = ewma_events_batch(_events(spark))
    sql = """
    WITH RECURSIVE obs AS (
      SELECT user_id AS k, epoch_us(ts) AS e, event_id AS i,
             CAST(value AS DOUBLE) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS ord
      FROM events),
    walk AS (
      SELECT k, ord, CAST(round(v * 1000000) AS BIGINT) AS eq
      FROM obs WHERE ord = 1
      UNION ALL
      SELECT o.k, o.ord,
             CAST(round(CAST(0.3 AS DOUBLE) * round(o.v * 1000000)
                        + CAST(0.7 AS DOUBLE) * w.eq) AS BIGINT)
      FROM obs o JOIN walk w ON w.k = o.k AND o.ord = w.ord + 1),
    fin AS (
      SELECT k, MAX(ord) AS n_events,
             max_by(eq, ord) AS eq
      FROM walk GROUP BY k)
    SELECT k AS user_id, CAST(n_events AS BIGINT) AS n_events,
           eq / 1000000.0 AS ewma
    FROM fin
    """
    assert compare(got, duck.execute(sql).df()) == []


def test_vocab_divergence_oracle(spark, duck):
    from osmapreduceproject_spark.operators.text import vocab_divergence
    from osmapreduceproject_spark.queries import _t

    d = _t(spark, SF_CORRECT, "documents")
    got = vocab_divergence(
        d.where(F.col("source") < "src5"), d.where(F.col("source") >= "src5")
    )
    sql = """
    WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents
                WHERE source < 'src5'),
    tb AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents
           WHERE source >= 'src5'),
    ca AS (SELECT tok, COUNT(*) AS na FROM ta GROUP BY 1),
    cb AS (SELECT tok, COUNT(*) AS nb FROM tb GROUP BY 1),
    j AS (SELECT COALESCE(ca.na, 0) AS na, COALESCE(cb.nb, 0) AS nb
          FROM ca FULL OUTER JOIN cb ON cb.tok = ca.tok),
    t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM j),
    w AS (
      SELECT j.na, j.nb,
             CAST(j.na AS DOUBLE) / t.ta AS p,
             CAST(j.nb AS DOUBLE) / t.tb AS q
      FROM j, t)
    SELECT (SELECT CAST(MAX(ta) AS BIGINT) FROM t) AS n_words_a,
           (SELECT CAST(MAX(tb) AS BIGINT) FROM t) AS n_words_b,
           CAST(SUM(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
           CAST(SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
           CAST(SUM(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS vocab_shared,
           round(SUM(
             (CASE WHEN na > 0 THEN p * ln(p / ((p + q) / 2)) / 2 ELSE 0 END)
             + (CASE WHEN nb > 0 THEN q * ln(q / ((p + q) / 2)) / 2 ELSE 0 END)
           ), 6) AS jsd_nats
    FROM w
    """
    assert compare(got, duck.execute(sql).df()) == []
    row = got.first()
    import math
    assert 0.0 <= row["jsd_nats"] <= math.log(2) + 1e-9


def test_bot_detection_oracle(spark, duck):
    from osmapreduceproject_spark.operators.events import bot_detection

    # thresholds loose enough that the organic fixture produces rows
    got = bot_detection(
        _events(spark), burst_window_s=3600, max_burst=3,
        min_events=5, max_gap_cv=2.0,
    )
    sql = """
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS e, event_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                            RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
               AS burst
      FROM events),
    pu AS (
      SELECT user_id, COUNT(*) AS n_events, COUNT(gap) AS ng,
             SUM(CAST(gap AS HUGEINT)) AS sg,
             SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sgg,
             MAX(burst) AS max_burst
      FROM base GROUP BY 1),
    s AS (
      SELECT user_id, n_events, max_burst,
             round(CAST(sg AS DOUBLE) / ng / 1000000.0, 6) AS mean_gap_s,
             CASE WHEN ng >= 2 AND CAST(sg AS DOUBLE) / ng > 0 THEN
               round(sqrt(CAST(ng * sgg - sg * sg AS DOUBLE)
                          / CAST(ng * (ng - 1) AS DOUBLE))
                     / (CAST(sg AS DOUBLE) / ng), 6)
             END AS gap_cv
      FROM pu),
    r AS (
      SELECT *,
             list_filter([
               CASE WHEN n_events >= 5 AND gap_cv IS NOT NULL AND gap_cv < 2.0
                    THEN 'metronomic' END,
               CASE WHEN max_burst > 3 THEN 'burst_rate' END
             ], x -> x IS NOT NULL) AS rl
      FROM s)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events, mean_gap_s, gap_cv,
           CAST(max_burst AS BIGINT) AS max_burst,
           list_aggregate(rl, 'string_agg', ',') AS reasons
    FROM r WHERE len(rl) > 0
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() > 0


def test_group_percentiles_oracle(spark, duck):
    from osmapreduceproject_spark.operators.stats import group_percentiles
    from osmapreduceproject_spark.queries import _t

    got = group_percentiles(
        _t(spark, SF_CORRECT, "orders"), "o_orderpriority", "o_totalprice"
    )
    sql = """
    WITH v AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS x
               FROM orders
               WHERE o_totalprice IS NOT NULL
                 AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    q AS (SELECT g, quantile_disc(x, [0.5, 0.9, 0.99]) AS qs FROM v GROUP BY g)
    SELECT g AS o_orderpriority,
           ([0.5, 0.9, 0.99])[i] AS p,
           qs[i] AS value
    FROM q, (SELECT unnest(range(1, 4)) AS i) t
    """
    assert compare(got, duck.execute(sql).df()) == []
    assert got.count() == 5 * 3  # five priorities x three ranks
