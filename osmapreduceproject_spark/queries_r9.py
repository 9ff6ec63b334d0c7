"""Round-9 catalog tranche: the staged-operator declarations (q213–q240).

Every entry here was pre-verified a round early — its Spark body and
oracle SQL are the same (body, SQL) pair its parity test ran green
before declaration (tests/test_r8_oracles.py holdovers q213–q229,
tests/test_r9_oracles.py wave q230–q240; SURVEY.md §8 staging
discipline, same as the r8 tranche). Split out of queries.py only for
file hygiene; the registration decorator, fixture readers, and
cross-engine float rules (see queries.py module docstring) are shared.

Imported by queries.py immediately before the verdict-window rotation,
so these entries participate in the same QUERIES dict, the same
tests/test_oracle_parity.py sweep, and the same driver grading.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import md5_int_sql
from .operators import dedup, similarity, text, windows
from .operators.events import funnel_step_latencies, multi_touch_attribution
from .operators.joins import asof_join, interval_overlap_join
from .operators.sampling import rebalance_to_mix, weighted_sample
from .operators.stats import (
    auc_roc,
    calibration_bins,
    corr_matrix,
    equi_depth_buckets,
    gini_concentration,
    hist_quantile_audit,
    ks_test,
    winsorized_stats,
)
from .queries import DRIVER_GRADE_SF_DIR, _jaccard_pairs_sql, _t, q

# Series-family grid constants — the exact parameters the staged parity
# tests verified (tests/test_r8_oracles.py STEP/STEP_US/_RESAMPLE_CTE).
_STEP = 3600
_STEP_US = _STEP * 1_000_000

_RESAMPLE_CTE = f"""
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
      SELECT g.k, g.e // 1000000 AS slot_epoch, o.v AS value,
             (g.e - o.e) // 1000000 AS staleness_s
      FROM grid g ASOF JOIN obs o ON g.k = o.k AND o.e <= g.e)"""


@q(
    "q213_resample_ffill",
    f"""
    WITH {_RESAMPLE_CTE}
    SELECT k AS user_id, slot_epoch, value, staleness_s FROM resampled
    """,
    "Time-series regularization (operators/windows.py resample_ffill): "
    "per-key fixed-interval grid aligned to absolute epoch multiples, "
    "forward-filled with the last observation at-or-before each slot "
    "plus its staleness — the step that turns irregular event streams "
    "into joinable regular series. No as-of join: grid rows union with "
    "observations and ONE per-key window last(ignorenulls) fills; both "
    "exchanges hash on the key, grid volume is span/step per key, so a "
    "key's series never funnels through a global sort.",
)
def q213(spark, sf_dir):
    return windows.resample_ffill(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP,
    )


@q(
    "q214_series_anomalies",
    f"""
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
    """,
    "Per-key robust anomaly fences over the regularized grid "
    "(operators/windows.py series_anomalies): exact discrete median + "
    "MAD (the q172 machinery) scaled by 1.4826 give 3σ-equivalent "
    "fences immune to the outliers they hunt. Every exchange hashes on "
    "the key; medians are exact per-key order statistics, not sketches.",
)
def q214(spark, sf_dir):
    return windows.series_anomalies(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP, k=3.0,
    )


@q(
    "q215_zipf_fit",
    """
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
    """,
    "Zipf law fit per corpus source (operators/text.py zipf_fit): OLS "
    "of log2(count) on log2(rank) over each source's top-100 tokens — "
    "a natural-language corpus slopes near −1; a templated/synthetic "
    "one doesn't, making the slope a corpus-health scalar. One token "
    "explode + groupBy, a per-source top-k window (WindowGroupLimit "
    "keeps k rows per partition pre-shuffle), closed-form regression "
    "from first/second moments — no iterative fitting.",
)
def q215(spark, sf_dir):
    return text.zipf_fit(_t(spark, sf_dir, "documents"), top_n=100)


_DOT = (
    "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
    "list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def _cluster_drift_oracle() -> str:
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
    return f"""
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


@q(
    "q216_cluster_drift",
    _cluster_drift_oracle(),
    "Embedding-space drift report (operators/similarity.py "
    "cluster_drift): assign OLD and NEW snapshots to the same shared "
    "centroids (broadcast, deterministic cid-DESC tiebreak), then "
    "per-cluster membership counts and centroid-mean L2 displacement "
    "in integer micro-unit sums — the retraining tripwire an embedding "
    "pipeline watches between model refreshes. Fixture drift: the "
    "first 50 vectors shift +0.05 in dim 1. Nothing all-pairs; both "
    "assignment passes broadcast the 16 centroids.",
)
def q216(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
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
    return similarity.cluster_drift(emb, newer, n_centroids=16)


def _equi_depth_oracle(n: int = 8) -> str:
    bounds = ", ".join(
        f"(SELECT quantile_disc(CAST(o_totalprice AS DOUBLE), {i}/{n}.0) FROM orders) AS b{i}"
        for i in range(1, n)
    )
    case = " ".join(
        f"WHEN CAST(o_totalprice AS DOUBLE) <= b{i} THEN {i}" for i in range(1, n)
    )
    return f"""
    WITH b AS (SELECT {bounds}),
    assigned AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v,
             CASE {case} ELSE {n} END AS bucket
      FROM orders, b)
    SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n_rows,
           MIN(v) AS min_val, MAX(v) AS max_val
    FROM assigned GROUP BY bucket
    """


@q(
    "q217_equi_depth_buckets",
    _equi_depth_oracle(8),
    "Equi-depth bucketing (operators/stats.py equi_depth_buckets): "
    "assign each row the bucket of its exact quantile interval — the "
    "range-partitioner / histogram primitive behind balanced splits. "
    "Bounds come from exact discrete quantiles (q171's bounded "
    "multi-pass machinery), then ONE broadcast of 7 bounds tags every "
    "row — no per-row sort, no global window. Graded as per-bucket "
    "(count, min, max), which pins both assignment and bounds.",
)
def q217(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        equi_depth_buckets(o, "o_totalprice", 8)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("o_totalprice").cast("double")).alias("min_val"),
            F.max(F.col("o_totalprice").cast("double")).alias("max_val"),
        )
    )


def _series_corr_oracle() -> str:
    one_side = f"""
      obs_{{side}} AS (
        SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_type = '{{etype}}'),
      spans_{{side}} AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs_{{side}} GROUP BY k),
      grid_{{side}} AS (
        SELECT k, unnest(range(
          CAST(ceil(lo / {_STEP_US}.0) * {_STEP_US} AS BIGINT),
          CAST(floor(hi / {_STEP_US}.0) * {_STEP_US} AS BIGINT) + 1,
          {_STEP_US})) AS e
        FROM spans_{{side}}),
      rs_{{side}} AS (
        SELECT g.k, g.e // 1000000 AS slot_epoch, o.v
        FROM grid_{{side}} g ASOF JOIN obs_{{side}} o ON g.k = o.k AND o.e <= g.e)"""
    return f"""
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


@q(
    "q218_series_correlation",
    _series_corr_oracle(),
    "Cross-series Pearson correlation per key (operators/windows.py "
    "series_correlation): regularize BOTH series onto the shared "
    "absolute-epoch grid (resample_ffill twice), equi-join on (key, "
    "slot), and the per-key correlation from one pass of first/second "
    "moments — how a feature pipeline correlates two event streams "
    "without ever aligning raw timestamps. Degenerate keys (constant "
    "series, <2 shared slots) emit NULL, not NaN.",
)
def q218(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return windows.series_correlation(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "click"),
        key="user_id", ts="ts", value_col="value", step_seconds=_STEP,
    )


@q(
    "q219_multi_touch_attribution",
    """
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
    """,
    "Linear multi-touch attribution (operators/events.py "
    "multi_touch_attribution): each conversion's credit splits evenly "
    "across its lookback-window touches, aggregated per channel. The "
    "conversion-touch pairing is a user-keyed equi-join with a time "
    "range predicate (bounded by the 24h lookback), credit counts via "
    "one per-conversion window — user-keyed exchanges only, per-user "
    "fan-out bounded by touches-in-window.",
)
def q219(spark, sf_dir):
    return multi_touch_attribution(
        _t(spark, sf_dir, "events"), conversion_type="purchase",
        touch_types=("view", "click"), lookback_seconds=86400,
    )


def _vocab_deltas_oracle() -> str:
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
    return f"""
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


@q(
    "q220_refresh_vocab_deltas",
    _vocab_deltas_oracle(),
    "Corpus-refresh vocab-health deltas (pipelines.py refresh_report's "
    "vocab_deltas section — the THIRD pipeline-level delegate grade "
    "after q177/q191): per-source type-token ratio, hapax share, and "
    "top-token share computed on the old and new snapshots (built from "
    "deterministic doc_id slices, the q149 convention) and differenced "
    "through a full outer join — the drift report a training-data "
    "refresh gates on. Each side is one token explode + two groupBys; "
    "sources join at per-source granularity (tiny).",
)
def q220(spark, sf_dir):
    from .pipelines import refresh_report

    d = _t(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 10 != 7)
    new = d.where(F.col("doc_id") % 10 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    return dict(refresh_report(old, new))["vocab_deltas"]


def _pagerank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    n_sql = "(SELECT COUNT(*) FROM documents)"
    steps = []
    for k in range(1, iters + 1):
        p = f"r{k-1}"
        steps.append(f"""
    d{k} AS (SELECT COALESCE(SUM(r), 0.0) AS dang FROM {p}
             WHERE node NOT IN (SELECT src FROM deg)),
    c{k} AS (SELECT e.dst AS node, SUM(p.r / g.deg) AS inc
             FROM edges e JOIN deg g ON g.src = e.src
             JOIN {p} p ON p.node = e.src GROUP BY e.dst),
    r{k} AS (
      SELECT b.node,
             round((1 - {damping}) / {n_sql} + {damping} * (COALESCE(c.inc, 0.0)
                   + d.dang / {n_sql}), 12) AS r
      FROM (SELECT doc_id AS node FROM documents) b
      LEFT JOIN c{k} c ON c.node = b.node CROSS JOIN d{k} d)""")
    return f"""
    WITH {_jaccard_pairs_sql(None)},
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT doc_id AS node, 1.0 / {n_sql} AS r FROM documents),
    {",".join(steps)}
    SELECT node, round(r, 6) AS rank FROM r{iters}
    """


@q(
    "q221_pagerank_dup_graph",
    _pagerank_oracle(),
    "PageRank over the duplicate graph (operators/dedup.py pagerank, "
    "edges = q30's n-gram Jaccard pairs at 0.8): 5 power-iteration "
    "rounds with dangling-mass redistribution and per-round 12-decimal "
    "rounding so the iteration replays bit-identically in a recursive "
    "SQL oracle — ranking template clusters by centrality tells a "
    "curation pipeline WHICH duplicate family dominates. Each round is "
    "one src-keyed join + dst-keyed groupBy; the rank frame is "
    "checkpoint-truncated per round (the q92 CC discipline) so the "
    "plan stays constant-size across iterations.",
)
def q221(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.8).select(
        F.col("a_doc_id").alias("a_id"), F.col("b_doc_id").alias("b_id")
    )
    return dedup.pagerank(d.select("doc_id"), pairs, iters=5, damping=0.85)


@q(
    "q222_weighted_sample",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             -ln(CAST({md5_int_sql("'wsample|' || CAST(doc_id AS VARCHAR)")} % 1000000 + 1
                      AS DOUBLE) / 1000001.0)
               / CAST(n_chars AS DOUBLE) AS wr
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
    ORDER BY wr ASC, doc_id ASC LIMIT 50
    """,
    "Weighted sampling without replacement (operators/sampling.py "
    "weighted_sample, Efraimidis–Spirakis): key = -ln(u)/w with u from "
    "the cross-engine md5 hash, keep the n smallest — deterministic, "
    "seedable, and ONE TakeOrderedAndProject (per-partition heap of n, "
    "driver merge of n·partitions) instead of a global sort. The "
    "length-weighted document sample a curation pipeline draws for "
    "human eval.",
)
def q222(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return weighted_sample(d, "n_chars", 50).select("doc_id", "source")


@q(
    "q223_parquet_zone_map",
    f"""
    SELECT string_split(filename, '/')[-1] AS file,
           COUNT(*) AS n_rows,
           MIN(doc_id) AS doc_id_min, MAX(doc_id) AS doc_id_max,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_nulls,
           MIN(n_chars) AS n_chars_min, MAX(n_chars) AS n_chars_max,
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_nulls
    FROM read_parquet('{DRIVER_GRADE_SF_DIR}/documents.parquet', filename=true)
    GROUP BY 1
    """,
    "Per-file zone map (sources/io.py parquet_zone_map): file-level "
    "min/max/null-count stats per column — the skipping index that "
    "tells a planner (and q140's z-order layout audit) which files a "
    "predicate can prune. Computed as one grouped scan over "
    "input_file_name(); at scale this reads footer statistics instead. "
    "The oracle pins the driver's correctness fixture "
    "(/root/testdata/sf0.01 — the one sf the driver grades at), since "
    "SQL strings can't take the sf_dir parameter.",
)
def q223(spark, sf_dir):
    from .sources.io import parquet_zone_map

    return parquet_zone_map(
        spark, f"{sf_dir}/documents.parquet", ["doc_id", "n_chars"]
    )


@q(
    "q224_winsorized_stats",
    """
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
    """,
    "Winsorized statistics (operators/stats.py winsorized_stats): clamp "
    "to exact p1/p99 bounds and report the robust mean + clamp counts — "
    "the outlier-tolerant summary a feature pipeline uses where a raw "
    "mean would chase the tail. Exact quantile bounds broadcast (2 "
    "scalars), clamp is a narrow map, mean in DECIMAL(28,6) exact "
    "arithmetic then one shared IEEE division.",
)
def q224(spark, sf_dir):
    return winsorized_stats(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.01, 0.99
    )


@q(
    "q225_series_rolling",
    f"""
    WITH {_RESAMPLE_CTE}
    SELECT k AS user_id, slot_epoch, value,
           round(AVG(value) OVER w, 6) AS rolling_mean,
           MIN(value) OVER w AS rolling_min,
           MAX(value) OVER w AS rolling_max,
           COUNT(value) OVER w AS n_slots_in_window
    FROM resampled
    WINDOW w AS (PARTITION BY k ORDER BY slot_epoch
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    """,
    "Rolling window statistics over the regularized grid "
    "(operators/windows.py series_rolling, 12-slot trailing window): "
    "mean/min/max/count per slot — the dashboard smoothing layer. "
    "Because the grid is REGULAR, a 12-ROW frame IS a 12-hour window "
    "(no range frame needed); one per-key window over the resampled "
    "series, O(1) state per row.",
)
def q225(spark, sf_dir):
    return windows.series_rolling(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP, window_slots=12,
    )


_ASOF_BASE = """
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


@q(
    "q226_asof_forward_nearest",
    _ASOF_BASE + """
    SELECT p.event_id, f.fv AS value_forward,
           CASE WHEN f.ft IS NOT NULL AND (b.bt IS NULL
                     OR (epoch_us(f.ft) - epoch_us(p.ts))
                        < (epoch_us(p.ts) - epoch_us(b.bt)))
                THEN f.fv ELSE b.bv END AS value_nearest
    FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    """,
    "As-of join, forward and nearest directions (operators/joins.py "
    "asof_join — q24 graded backward; this closes the direction "
    "matrix): each purchase picks the first view at-or-after it "
    "(forward) and the closer of backward/forward (nearest, "
    "forward-wins ties broken by strict <). Union-then-window "
    "implementation: one user-keyed exchange, last/first over ordered "
    "frames — never a per-row range scan.",
)
def q226(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purch = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    fwd = asof_join(
        purch, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], direction="forward",
    ).select("event_id", F.col("value_asof").alias("value_forward"))
    near = asof_join(
        purch, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], direction="nearest",
    ).select("event_id", F.col("value_asof").alias("value_nearest"))
    return fwd.join(near, "event_id")


@q(
    "q227_interval_union_duration",
    """
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
    """,
    "Interval union / coverage duration per key (operators/windows.py "
    "interval_union_duration): merge overlapping [start, end) intervals "
    "into islands via the classic running-max gap test (one per-key "
    "ordered window), then per-key island counts and total covered "
    "seconds — 'how long was this user actually active' over "
    "overlapping activity spans. Two windows + one groupBy, all "
    "exchanges on the key.",
)
def q227(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.floor(F.col("value")).cast("bigint") * 1_000_000
        ).alias("e"),
    )
    return windows.interval_union_duration(iv, key="user_id", start="s", end="e")


def _corr_matrix_oracle(cols: list[str]) -> str:
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
    return "\nUNION ALL".join(parts)


@q(
    "q228_corr_matrix",
    _corr_matrix_oracle(["l_quantity", "l_extendedprice", "l_discount"]),
    "Pairwise Pearson correlation matrix (operators/stats.py "
    "corr_matrix) over lineitem numerics: every pair from ONE pass of "
    "quantized integer first/second moments (micro-unit bigints summed "
    "exactly — no float-association drift), divisions at the end — the "
    "feature-redundancy screen before model training. One aggregation "
    "scan regardless of pair count; never a per-pair shuffle.",
)
def q228(spark, sf_dir):
    return corr_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@q(
    "q229_funnel_step_latencies",
    """
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
    """,
    "Funnel step latencies (operators/events.py funnel_step_latencies, "
    "companion to q198's windowed funnel): per-user first-touch times "
    "via ONE conditional-min groupBy, then per-transition count and "
    "avg/min/max latency over users whose steps are ordered. Exact "
    "integer-µs sums into one IEEE division; a single user-keyed "
    "exchange feeding a 2-row report.",
)
def q229(spark, sf_dir):
    return funnel_step_latencies(
        _t(spark, sf_dir, "events"), steps=("view", "click", "purchase")
    )


@q(
    "q230_gopher_repetition",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws,
                         string_split(text, chr(10)) AS lines
                  FROM documents),
    lf AS (
      SELECT doc_id, len(lines) AS n_lines,
             round(CAST(1.0 AS DOUBLE)
                   - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines), 6)
               AS dup_line_frac,
             round(CAST(list_sum(list_transform(lines,
                     l -> CASE WHEN len(list_filter(lines, y -> y = l)) > 1
                               THEN length(l) ELSE 0 END)) AS DOUBLE)
                   / greatest(list_sum(list_transform(lines, l -> length(l))), 1),
                   6) AS dup_line_char_frac,
             len(ws) AS n_tokens
      FROM base),
    g AS (
      SELECT doc_id, ns.n,
             unnest(list_transform(range(0, greatest(len(ws) - ns.n + 1, 0)),
                    i -> array_to_string(ws[i + 1 : i + ns.n], ' '))) AS gram
      FROM base, (SELECT unnest([2, 3, 4]) AS n) ns),
    cnt AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
    top AS (SELECT doc_id, n, MAX(c) AS top_c FROM cnt GROUP BY 1, 2),
    piv AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 2 THEN top_c END) AS t2,
             MAX(CASE WHEN n = 3 THEN top_c END) AS t3,
             MAX(CASE WHEN n = 4 THEN top_c END) AS t4
      FROM top GROUP BY doc_id),
    feats AS (
      SELECT lf.doc_id, lf.n_lines, lf.dup_line_frac, lf.dup_line_char_frac,
             lf.n_tokens,
             round(CAST(COALESCE(piv.t2, 0) AS DOUBLE) * 2
                   / greatest(lf.n_tokens, 1), 6) AS top2_share,
             round(CAST(COALESCE(piv.t3, 0) AS DOUBLE) * 3
                   / greatest(lf.n_tokens, 1), 6) AS top3_share,
             round(CAST(COALESCE(piv.t4, 0) AS DOUBLE) * 4
                   / greatest(lf.n_tokens, 1), 6) AS top4_share
      FROM lf LEFT JOIN piv ON piv.doc_id = lf.doc_id),
    r AS (
      SELECT *,
             list_filter([
               CASE WHEN dup_line_frac > 0.30 THEN 'dup_lines' END,
               CASE WHEN dup_line_char_frac > 0.20 THEN 'dup_line_chars' END,
               CASE WHEN top2_share > 0.20 THEN 'top_2gram' END,
               CASE WHEN top3_share > 0.18 THEN 'top_3gram' END,
               CASE WHEN top4_share > 0.16 THEN 'top_4gram' END
             ], x -> x IS NOT NULL) AS rl
      FROM feats)
    SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac, n_tokens,
           top2_share, top3_share, top4_share,
           COALESCE(list_aggregate(rl, 'string_agg', ','), '') AS reasons,
           len(rl) = 0 AS keep
    FROM r
    """,
    "Gopher REPETITION rules (operators/text.py gopher_repetition — "
    "the other half of Rae et al. 2021 §A1.1, complementing q178's "
    "quality rules): duplicate-line count/char fractions plus top "
    "{2,3,4}-gram token shares against the published thresholds. All "
    "three n-gram sizes ride ONE doc-keyed exchange (n is a dimension "
    "of the exploded frame, not three passes); line stats are per-doc "
    "array ops, no shuffle. Built with per-n lambda FACTORIES — "
    "F.transform gives a 2-parameter lambda (element, index), so the "
    "default-arg closure idiom silently rebinds n to the index.",
)
def q230(spark, sf_dir):
    return text.gopher_repetition(_t(spark, sf_dir, "documents"))


@q(
    "q231_ks_drift",
    """
    WITH pool AS (
      SELECT CAST(value AS DOUBLE) AS v,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('view', 'purchase')
        AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    n AS (SELECT SUM(a) AS na, SUM(1 - a) AS nb FROM pool),
    pv AS (SELECT v, SUM(a) AS ca, SUM(1 - a) AS cb FROM pool GROUP BY v),
    cum AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cuma,
                   SUM(cb) OVER (ORDER BY v) AS cumb
            FROM pv),
    d AS (SELECT cum.v,
                 abs(CAST(cuma AS DOUBLE) / n.na - CAST(cumb AS DOUBLE) / n.nb)
                   AS d
          FROM cum, n)
    SELECT (SELECT CAST(na AS BIGINT) FROM n) AS n_a,
           (SELECT CAST(nb AS BIGINT) FROM n) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           round(MAX(d), 6) AS d_stat,
           (SELECT MIN(v) FROM d WHERE d.d = (SELECT MAX(d) FROM d))
             AS d_at_value
    FROM d
    """,
    "Two-sample Kolmogorov–Smirnov drift test (operators/stats.py "
    "ks_test, view vs purchase value distributions): the supremum ECDF "
    "gap D and where it occurs — the distribution-shift gate a data "
    "pipeline runs between snapshots. ECDF prefix sums use the "
    "ranked_sort broadcast-offset technique (per-partition local "
    "cumsums + broadcast partition offsets), so NO single-partition "
    "window anywhere; exact integer cumulative counts into IEEE "
    "divisions. One-class inputs return NULL stats, not errors. "
    "Scale-smoked at 10M rows with a planted exact-0.25 shift.",
)
def q231(spark, sf_dir):
    return ks_test(
        _t(spark, sf_dir, "events"), "event_type", "value", "view", "purchase"
    )


@q(
    "q232_gini_concentration",
    """
    WITH c AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
    r AS (SELECT k, c, ROW_NUMBER() OVER (ORDER BY c, k) AS i FROM c),
    s AS (SELECT COUNT(*) AS nk, SUM(c) AS sx,
                 SUM(CAST(i AS HUGEINT) * c) AS six, MAX(c) AS mx
          FROM r)
    SELECT CAST(nk AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS n_rows,
           round(CAST(2.0 AS DOUBLE) * CAST(six AS DOUBLE)
                 / (CAST(nk AS DOUBLE) * CAST(sx AS DOUBLE))
                 - CAST(nk + 1 AS DOUBLE) / CAST(nk AS DOUBLE), 6) AS gini,
           round(CAST(mx AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS top1_share
    FROM s
    """,
    "Gini concentration of per-key event counts (operators/stats.py "
    "gini_concentration): the corpus-domination scalar summarizing "
    "q183's key-skew report — 0 means uniform contribution, →1 means "
    "one key owns the corpus. Ranks via ranked_sort (sample-sort range "
    "partitioning + broadcast offsets, no single-partition window), "
    "rank-weighted moment in DECIMAL(38,0) exact arithmetic. "
    "Scale-smoked against the closed form (k−1)/(3k) on counts 1..k.",
)
def q232(spark, sf_dir):
    return gini_concentration(_t(spark, sf_dir, "events"), "user_id")


@q(
    "q233_hist_quantile_audit",
    """
    WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
               WHERE o_totalprice IS NOT NULL
                 AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n,
                  (MAX(v) - MIN(v)) / 64 AS w
           FROM v),
    b AS (SELECT least(CAST(floor((v.v - mm.lo) / mm.w) AS INT), 63) AS b
          FROM v, mm),
    hist AS (SELECT b, COUNT(*) AS cnt FROM b GROUP BY 1),
    cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM hist),
    ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p,
                  unnest([1, 2, 3]) AS pi),
    tgt AS (SELECT p, pi, greatest(1, CAST(ceil(p * mm.n) AS BIGINT)) AS rank,
                   mm.n, mm.lo, mm.w
            FROM ps, mm),
    sel AS (SELECT t.p, t.pi, t.n, t.lo, t.w, MIN(c.b) AS bin
            FROM tgt t JOIN cum c ON c.cum >= t.rank
            GROUP BY 1, 2, 3, 4, 5),
    ex AS (SELECT quantile_disc(v, [0.5, 0.9, 0.99]) AS qs FROM v)
    SELECT s.p, CAST(s.n AS BIGINT) AS n,
           s.lo + s.bin * s.w AS hist_estimate,
           ex.qs[s.pi] AS exact_value,
           abs(ex.qs[s.pi] - (s.lo + s.bin * s.w)) AS abs_error,
           s.w AS bin_width
    FROM sel s, ex
    """,
    "Histogram-quantile audit (operators/stats.py hist_quantile_audit "
    "— the THIRD sketch audit after q180 CMS and q194 HLL, retiring "
    "the q90 approx-quantile rows-only class): a 64-bin equi-width "
    "histogram estimates p50/p90/p99 via cumulative bin counts, and "
    "the EXACT quantile is joined alongside with the error and the "
    "±bin_width guarantee machine-checked. The histogram is one "
    "groupBy over 64 keys (the 100 TB path: one narrow agg); the "
    "exact side reuses q171's bounded multi-pass machinery for the "
    "audit column.",
)
def q233(spark, sf_dir):
    return hist_quantile_audit(
        _t(spark, sf_dir, "orders"), "o_totalprice",
        percentiles=[0.5, 0.9, 0.99], n_bins=64,
    )


def _holt_oracle(alpha: float = 0.3, beta: float = 0.1) -> str:
    lq_next = (
        f"CAST(round(CAST({alpha} AS DOUBLE) * round(n.value * 1000000)"
        f" + CAST({1 - alpha} AS DOUBLE) * (w.lq + w.bq)) AS BIGINT)"
    )
    return f"""
    WITH RECURSIVE {_RESAMPLE_CTE},
    numbered AS (
      SELECT k, slot_epoch, value,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY slot_epoch) AS ord
      FROM resampled),
    walk AS (
      SELECT k, ord, slot_epoch, value,
             CAST(round(value * 1000000) AS BIGINT) AS lq,
             CAST(0 AS BIGINT) AS bq
      FROM numbered WHERE ord = 1
      UNION ALL
      SELECT n.k, n.ord, n.slot_epoch, n.value,
             {lq_next},
             CAST(round(CAST({beta} AS DOUBLE) * ({lq_next} - w.lq)
                        + CAST({1 - beta} AS DOUBLE) * w.bq) AS BIGINT)
      FROM numbered n JOIN walk w ON n.k = w.k AND n.ord = w.ord + 1)
    SELECT k AS user_id, slot_epoch, value,
           lq / 1000000.0 AS level, bq / 1000000.0 AS trend,
           (lq + bq) / 1000000.0 AS forecast_next
    FROM walk
    """


@q(
    "q234_holt_linear",
    _holt_oracle(0.3, 0.1),
    "Holt double-exponential smoothing (operators/windows.py "
    "holt_linear): per-key level+trend recurrence over the regularized "
    "grid, seeded l₀=v₀, b₀=0 — the series family's drift-aware step "
    "past q187's EWMA, emitting the one-step forecast alerting "
    "compares against. Two coupled INTEGER micro-unit state cells "
    "(every step rounds to a bigint) make the recurrence replay "
    "bit-identically in a recursive-CTE oracle. Ordered per-key array "
    "fold, parallel across keys, max_slots-guarded.",
)
def q234(spark, sf_dir):
    return windows.holt_linear(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP, alpha=0.3, beta=0.1,
    )


@q(
    "q235_interval_overlap_join",
    """
    WITH l AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             MIN(epoch_us(ts) // 1000000) AS l_lo,
             MAX(epoch_us(ts) // 1000000) + 1 AS l_hi
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_id AS win_id, epoch_us(ts) // 1000000 AS r_lo,
             epoch_us(ts) // 1000000 + 7200 AS r_hi
      FROM events WHERE event_type = 'purchase')
    SELECT l.user_id, l.day, l.l_lo, l.l_hi, r.win_id, r.r_lo, r.r_hi
    FROM l JOIN r ON l.l_lo < r.r_hi AND r.r_lo < l.l_hi
    """,
    "Grid-decomposed big-big interval overlap join (operators/joins.py "
    "interval_overlap_join): per-(user, day) activity spans vs the 2h "
    "windows each purchase opens. Each interval explodes into covered "
    "grid cells; a pair emits ONLY at the cell containing the later "
    "start, so output is exactly-once WITHOUT a dedup shuffle; empty "
    "[x,x) ranges drop before explosion. The naive inequality join is "
    "a cartesian (plan-asserted absent); scale-smoked at 2M×2M "
    "intervals (4·10¹² naive pairs → exactly the 2M planted overlaps).",
)
def q235(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    left = (
        ev.groupBy(
            "user_id",
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).alias("day"),
        )
        .agg(
            F.floor(F.min(F.unix_micros("ts")) / 1_000_000).alias("l_lo"),
            (F.floor(F.max(F.unix_micros("ts")) / 1_000_000) + 1).alias("l_hi"),
        )
    )
    right = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("win_id"),
            F.floor(F.unix_micros("ts") / 1_000_000).alias("r_lo"),
            (F.floor(F.unix_micros("ts") / 1_000_000) + 7200).alias("r_hi"),
        )
    )
    return interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", grid=3600
    ).select("user_id", "day", "l_lo", "l_hi", "win_id", "r_lo", "r_hi")


@q(
    "q236_auc_roc",
    """
    WITH pool AS (
      SELECT CAST(value AS DOUBLE) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    pv AS (SELECT v, SUM(p) AS cp, COUNT(*) AS cn FROM pool GROUP BY v),
    r AS (SELECT cp, cn,
                 2 * (SUM(cn) OVER (ORDER BY v) - cn) + cn + 1 AS r2
          FROM pv),
    s AS (SELECT SUM(CAST(cp AS HUGEINT) * r2) AS rs2, SUM(cp) AS np,
                 SUM(cn - cp) AS nn, COUNT(*) AS nv
          FROM r)
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           CAST(nv AS BIGINT) AS n_values,
           round((CAST(rs2 AS DOUBLE) / 2.0
                  - CAST(np AS DOUBLE) * CAST(np + 1 AS DOUBLE) / 2.0)
                 / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc,
           round(CAST(2.0 AS DOUBLE)
                 * ((CAST(rs2 AS DOUBLE) / 2.0
                     - CAST(np AS DOUBLE) * CAST(np + 1 AS DOUBLE) / 2.0)
                    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)))
                 - CAST(1.0 AS DOUBLE), 6) AS gini_coef
    FROM s
    """,
    "Exact AUC-ROC via the Mann–Whitney rank-sum with midranks for "
    "ties (operators/stats.py auc_roc, scoring 'value predicts "
    "purchase'): the ranking-quality gate for classifier-based data "
    "filters (quality scorers, toxicity filters) — AUC says the "
    "RANKING is right; q237 says the probabilities are. Doubled "
    "midranks keep the rank-sum moment in exact integer arithmetic "
    "(DECIMAL(38,0)); ranks via the ranged prefix-sum machinery, no "
    "single-partition window; closed-form pins at 1.0 (perfect) and "
    "0.5 (all tied) unit-tested. One-class inputs → NULL, not errors.",
)
def q236(spark, sf_dir):
    return auc_roc(
        _t(spark, sf_dir, "events"), "value", F.col("event_type") == "purchase"
    )


@q(
    "q237_calibration_bins",
    """
    WITH pool AS (
      SELECT CAST(value AS DOUBLE) - floor(CAST(value AS DOUBLE)) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
    base AS (SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin,
                    CAST(round(s * 1000000) AS BIGINT) AS vq, p
             FROM pool),
    per AS (SELECT bin, COUNT(*) AS n, SUM(vq) AS sv, SUM(p) AS np
            FROM base GROUP BY 1)
    SELECT bin, round(CAST(bin AS DOUBLE) / 10, 6) AS bin_lo, n,
           round(CAST(sv AS DOUBLE) / n / 1000000, 6) AS mean_score,
           round(CAST(np AS DOUBLE) / n, 6) AS positive_rate,
           round(CAST(np AS DOUBLE) / n - CAST(sv AS DOUBLE) / n / 1000000, 6)
             AS calibration_gap
    FROM per
    """,
    "Reliability-diagram calibration bins (operators/stats.py "
    "calibration_bins, fractional part of value as the [0,1) score): "
    "per equi-width bin, exact mean score vs observed positive rate "
    "and the gap — q236's companion: AUC grades the ranking, this "
    "grades the probabilities a filtering threshold actually consumes. "
    "One narrow map + one 10-key groupBy with integer micro-unit "
    "score sums; trivially 100 TB-safe.",
)
def q237(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    scored = ev.where(v.isNotNull() & ~F.isnan(v)).select(
        (v - F.floor(v)).alias("score"),
        F.col("event_type"),
    )
    return calibration_bins(scored, "score", F.col("event_type") == "purchase")


@q(
    "q238_mix_rebalance",
    f"""
    WITH tgt AS (SELECT * FROM (VALUES ('en', CAST(0.5 AS DOUBLE)),
                                        ('de', CAST(0.3 AS DOUBLE)),
                                        ('fr', CAST(0.2 AS DOUBLE))) t(lang, t)),
    counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
    q0 AS (SELECT c.lang, c.n, tgt.t FROM counts c JOIN tgt USING (lang)),
    f AS (SELECT MIN(floor(n / t)) AS ft FROM q0 WHERE t > 0),
    quotas AS (SELECT lang, CAST(floor(q0.t * f.ft) AS BIGINT) AS q FROM q0, f),
    ranked AS (
      SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, qs.q,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY {md5_int_sql("'mix|' || lang || '|' || CAST(doc_id AS VARCHAR)")},
                                         d.doc_id) AS r
      FROM documents d JOIN quotas qs USING (lang))
    SELECT doc_id, text, lang, source, n_chars FROM ranked WHERE r <= q
    """,
    "Corpus mix rebalancing (operators/sampling.py rebalance_to_mix): "
    "materialize the LARGEST subset matching a target language mix — "
    "the physical companion to q110's loss-side mixing weights. The "
    "binding stratum sets the scale factor (min over n/t), per-stratum "
    "quotas fill by deterministic md5 rank (seeded, reproducible "
    "draws); an infeasible target (a stratum with no rows) yields "
    "EMPTY, never a silent renormalization. Per-stratum top-q via one "
    "lang-keyed window; quotas broadcast.",
)
def q238(spark, sf_dir):
    return rebalance_to_mix(
        _t(spark, sf_dir, "documents"), "lang",
        {"en": 0.5, "de": 0.3, "fr": 0.2},
    )


def _scene_hash_sql(w: int, h: int, n_bytes: int) -> str:
    """HUGEINT SQL dHash of arith_video_frames pixels: the
    arith_raw_images closed form over column ``m`` (the per-frame base
    image id) plus per-frame motion ``+f`` on bytes < n_bytes — same
    9×8 grid and bit order as multimodal.dhash_images."""
    rr = [(r * h) // 8 for r in range(8)]
    cc = [(c * w) // 9 for c in range(9)]

    def g(R: int, C: int) -> str:
        terms = []
        for k in range(3):
            i = (R * w + C) * 3 + k
            ci = 7 * i + (i * i) % 251
            extra = " + f" if i < n_bytes else ""
            terms.append(f"((31*m + {ci}{extra}) % 256)")
        return f"(({' + '.join(terms)}) // 3)"

    bit_terms = []
    for r in range(8):
        for c in range(8):
            bit = r * 8 + c
            bit_terms.append(
                f"CASE WHEN {g(rr[r], cc[c])} < {g(rr[r], cc[c + 1])} "
                f"THEN CAST({1 << bit} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
            )
    return "(" + "\n             + ".join(bit_terms) + ")"


def _scene_changes_oracle(
    nv: int = 24, nf: int = 12, cut: int = 6, w: int = 16, h: int = 12,
    n_bytes: int = 12, max_hamming: int = 10,
) -> str:
    return f"""
    WITH frames AS (
      SELECT v.vid, f.f,
             CASE WHEN f.f < {cut} THEN v.vid ELSE v.vid + 500 END AS m
      FROM (SELECT unnest(range({nv})) AS vid) v,
           (SELECT unnest(range({nf})) AS f) f),
    hh AS (SELECT vid, f, {_scene_hash_sql(w, h, n_bytes)} AS hv FROM frames),
    signed AS (
      SELECT vid, f,
             CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
                       THEN hv - CAST('18446744073709551616' AS HUGEINT)
                       ELSE hv END AS BIGINT) AS dhash
      FROM hh),
    lagged AS (
      SELECT vid, f, dhash,
             LAG(dhash) OVER (PARTITION BY vid ORDER BY f) AS ph,
             LAG(f) OVER (PARTITION BY vid ORDER BY f) AS pf
      FROM signed)
    SELECT CAST(vid AS BIGINT) AS media_id,
           CAST(pf AS INTEGER) AS from_frame,
           CAST(f AS INTEGER) AS to_frame,
           CAST(bit_count(xor(dhash, ph)) AS BIGINT) AS hamming
    FROM lagged
    WHERE ph IS NOT NULL AND bit_count(xor(dhash, ph)) > {max_hamming}
    """


@q(
    "q239_scene_changes",
    _scene_changes_oracle(),
    "Video scene-cut detection (operators/multimodal.py scene_changes "
    "— the operator SURVEY listed as the last rows-only candidate, now "
    "fully value-oracled via the q132 RAW8 precedent applied along "
    "time): dHash every frame (the SAME value-oracled perceptual hash "
    "as q132/q133) and flag adjacent-frame hamming > 10 in a per-video "
    "lag window. Fixture: 24 closed-form videos × 12 frames with "
    "per-frame motion (+f on the first 12 bytes, moves ≤1 gradient "
    "bit — measured) and a planted hard cut at frame 6 (base image "
    "swaps, hamming ≥27) — the oracle regenerates every hash from the "
    "pixel formula, so any drift in decode, grid, bit packing, or the "
    "lag logic mismatches. Frame payloads never shuffle — only "
    "(video, idx, hash) triplets enter the window.",
)
def q239(spark, sf_dir):
    from .operators.multimodal import arith_video_frames, scene_changes

    frames = arith_video_frames(
        spark, n_videos=24, n_frames=12, cut_at=6, width=16, height=12,
        delta_bytes=12,
    )
    return scene_changes(frames, max_hamming=10)


@q(
    "q240_upsert_replay_compaction",
    """
    WITH log AS (
      SELECT doc_id, md5(text) AS h, 1 AS version FROM documents
      UNION ALL
      SELECT doc_id, md5(text || ' v2'), 2 FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, md5(text || ' v3'), 3 FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id, h, version FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
      FROM log) t WHERE rn = 1
    """,
    "Streaming upsert-sink replay contract, graded relationally "
    "(streaming/upsert.py stream_upsert_sink's per-batch merge, the "
    "q212 pattern: grade the relational core of a filesystem-contract "
    "member): the Spark side folds THREE change batches through "
    "view = compact_latest(view ∪ batch) exactly as foreachBatch does, "
    "WITH BATCH 2 APPLIED TWICE — the standard restart window (batch "
    "written, checkpoint not committed). The oracle is the ONE-SHOT "
    "latest-version-wins over the change log, so the grade pins the "
    "idempotence claim: max-version compaction gives identical winners "
    "whether a replayed batch merges once or twice. Each merge is one "
    "key-partitioned row_number (the q176 shape); with a lake format "
    "this is MERGE INTO paying only for touched files.",
)
def q240(spark, sf_dir):
    from .operators.windows import compact_latest

    d = _t(spark, sf_dir, "documents")
    b1 = d.select(
        "doc_id", F.md5("text").alias("h"), F.lit(1).alias("version")
    )
    b2 = d.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("h"),
        F.lit(2).alias("version"),
    )
    b3 = d.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.md5(F.concat(F.col("text"), F.lit(" v3"))).alias("h"),
        F.lit(3).alias("version"),
    )
    view = compact_latest(b1, ["doc_id"], "version")
    for batch in (b2, b2, b3):  # b2 replayed: the restart window
        view = compact_latest(view.unionByName(batch), ["doc_id"], "version")
    return view
