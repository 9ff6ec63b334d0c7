"""Round-8 catalog tranche: the staged-operator declarations (q178–q212).

Every entry here was pre-verified a round early — its Spark body and
oracle SQL are the same (body, SQL) pair its parity test in
tests/test_r8_oracles.py ran green before declaration (SURVEY.md §8
round-7 staging discipline). Split out of queries.py only for file
hygiene; the registration decorator, fixture readers, and cross-engine
float rules (see queries.py module docstring) are shared.

Imported by queries.py immediately before the verdict-window rotation,
so these entries participate in the same QUERIES dict, the same
tests/test_oracle_parity.py sweep, and the same driver grading.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import md5_int_sql, seeded_hash_sql
from .operators import dedup, similarity, text, windows
from .operators.events import (
    ab_significance,
    activity_streaks,
    bot_detection,
    rfm_segmentation,
    windowed_funnel,
)
from .operators.joins import bloom_prejoin_report
from .operators.sampling import negative_pairs, temporal_split
from .operators.stats import (
    _POIS1_CDF,
    benford_check,
    bootstrap_mean_ci,
    chi2_independence,
    cms_heavy_hitters,
    expect_report,
    group_percentiles,
    hll_estimate,
    key_skew_report,
    mutual_information,
    psi,
    target_encode,
    welch_ttest,
)
from .queries import (
    _cosine_sql,
    _ivf_topk_oracle,
    _jaccard_toks_sql,
    _t,
    q,
)

# Series-family grid constants — the exact parameters the r8 parity tests
# verified (tests/test_r8_oracles.py STEP/STEP_US/_RESAMPLE_CTE).
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

_GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


@q(
    "q178_gopher_rules",
    """
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
    """,
    "Gopher-style quality rules (operators/text.py gopher_rules — Rae et "
    "al. 2021 §A1.1 repetition/quality heuristics re-expressed as one "
    "narrow scan): per-document word/symbol/bullet/ellipsis/stopword "
    "features → keep/drop verdict with machine-readable reasons. The "
    "stopword list is fixture-suited (the synthetic vocab carries only "
    "'the'/'a' from Gopher's published list); the operator takes the "
    "published list by default. Zero joins, zero shuffles at any scale.",
)
def q178(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return text.gopher_rules(d, min_words=30, stopwords=_GOPHER_STOPWORDS)


@q(
    "q179_containment_pairs",
    f"""
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
    """,
    "Containment near-dup pairs (operators/dedup.py containment_pairs): "
    "|A∩B|/|A| and /|B| alongside Jaccard — catches the quote/subset "
    "relation Jaccard misses when one doc is much longer (Broder 1997's "
    "containment vs resemblance distinction). Same max_df-capped "
    "inverted-index candidate generation as q30/q113 (hot shingles "
    "anti-filtered before the self-join), so candidates stay "
    "O(|index|·max_df) at any corpus size.",
)
def q179(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, threshold=0.5, max_df=5)


def _cms_oracle(depth: int = 4, width: int = 256, min_share: float = 0.005) -> str:
    per_seed = "\nUNION ALL\n".join(
        f"""SELECT {s} AS seed,
               {seeded_hash_sql('CAST(user_id AS VARCHAR)', s)} % {width} AS bucket,
               COUNT(*) AS bucket_count
        FROM events GROUP BY 1, 2"""
        for s in range(depth)
    )
    cand_seed = "\nUNION ALL\n".join(
        f"""SELECT __k, exact_count, {s} AS seed,
               {seeded_hash_sql('__k', s)} % {width} AS bucket
        FROM exact"""
        for s in range(depth)
    )
    return f"""
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
    FROM est, tot WHERE est.cms_estimate >= {min_share} * tot.t
    """


@q(
    "q180_cms_heavy_hitters",
    _cms_oracle(depth=4, width=256, min_share=0.005),
    "Count-Min-Sketch heavy hitters WITH a full value oracle (operators/"
    "stats.py cms_heavy_hitters — Cormode & Muthukrishnan 2005): the "
    "sketch is depth×width bucket counts (seeded cross-engine hash "
    "family), estimates are min-over-rows, and the audit joins the exact "
    "per-key counts so the one-sided overestimate guarantee is "
    "machine-checked per key. First sketch in the catalog graded on "
    "VALUES, not rows (retires the q51-class rows-only residue for CMS). "
    "At 100 TB the sketch aggregation is depth×width cells per partition "
    "— partial-combined, never key-cardinality-sized.",
)
def q180(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return cms_heavy_hitters(e, "user_id", depth=4, width=256, min_share=0.005)


@q(
    "q181_ab_significance",
    f"""
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
    """,
    "A/B conversion significance (operators/events.py ab_significance): "
    "deterministic hash-bucketed variant assignment, per-user ordered "
    "view→click→purchase funnel conversion, two-proportion pooled z-test "
    "with the exact 1.96 critical value — the experiment readout q135's "
    "per-variant metrics feed. One user-keyed aggregation then scalar "
    "finalization; nothing grows with event count past the per-user agg.",
)
def q181(spark, sf_dir):
    return ab_significance(_t(spark, sf_dir, "events"))


def _bloom_oracle(n_bits: int = 2048, n_hashes: int = 3) -> str:
    bit_sql = "\nUNION\n".join(
        f"SELECT DISTINCT {seeded_hash_sql('CAST(k AS VARCHAR)', s)} % {n_bits} AS b FROM dimk"
        for s in range(n_hashes)
    )
    pos_sql = "\nUNION ALL\n".join(
        f"""SELECT o_orderkey,
               {seeded_hash_sql('CAST(o_custkey AS VARCHAR)', s)} % {n_bits} AS b
        FROM orders"""
        for s in range(n_hashes)
    )
    return f"""
    WITH dimk AS (SELECT DISTINCT c_custkey AS k FROM customer
                  WHERE c_mktsegment = 'BUILDING'),
    bits AS ({bit_sql}),
    pos AS ({pos_sql}),
    pass AS (
      SELECT o_orderkey FROM pos JOIN bits USING (b)
      GROUP BY o_orderkey HAVING COUNT(*) = {n_hashes}),
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


@q(
    "q182_bloom_prejoin",
    _bloom_oracle(n_bits=2048, n_hashes=3),
    "Bloom-filter pre-join calibration report (operators/joins.py "
    "bloom_prejoin_report): build a seeded k-hash Bloom set over the "
    "filtered dim keys (broadcast, n_bits bits), probe the fact side, "
    "and report pass/true-match/false-positive/pruned-fraction — the "
    "sizing audit run BEFORE trusting a runtime filter to prune a 100 TB "
    "fact scan (Spark's own InjectRuntimeFilter does this invisibly; "
    "this makes the false-positive trade measurable). One-sided error "
    "asserted in its parity test: every true match passes.",
)
def q182(spark, sf_dir):
    fact = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return bloom_prejoin_report(
        fact, dim, "o_custkey", "c_custkey", n_bits=2048, n_hashes=3
    )


@q(
    "q183_key_skew_report",
    f"""
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
    """,
    "Shuffle-key skew pre-flight (operators/stats.py key_skew_report): "
    "per-key counts, their p50/p90/p99 distribution, and the SIMULATED "
    "hash-partition load (cross-engine hash mod n_partitions) — the "
    "report that decides between plain shuffle, salting (q63), and AQE "
    "skew splitting before a 100 TB join, completing q128's top-N view "
    "with the partition-level story. Key-keyed agg with map-side "
    "combine; everything downstream is key-cardinality-scale.",
)
def q183(spark, sf_dir):
    return key_skew_report(_t(spark, sf_dir, "events"), "user_id", n_partitions=200)


@q(
    "q184_series_trend",
    f"""
    WITH {_RESAMPLE_CTE},
    xy AS (
      SELECT k,
             CAST((slot_epoch - MIN(slot_epoch) OVER (PARTITION BY k))
                  / {_STEP} AS DOUBLE) AS x,
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
    """,
    "Per-key least-squares trend over the regularized grid (operators/"
    "windows.py series_trend): slope/intercept/R² from the five "
    "partial-summable moments — one key-keyed aggregation after the "
    "shared resample (q184/q187/q192/q199/q205 all ride the same "
    "grid-union-window machinery and its single user-keyed exchange). "
    "Degenerate series (n<2 or zero variance) report NULLs, never NaN "
    "division.",
)
def q184(spark, sf_dir):
    return windows.series_trend(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP,
    )


@q(
    "q185_chi2_independence",
    """
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
    """,
    "Chi-squared independence + Cramér's V between lang and source "
    "(operators/stats.py chi2_independence): the identity "
    "χ² = n·Σ o²/(rt·ct) − n needs only OBSERVED contingency cells, so "
    "the whole test is one (a,b)-keyed count, two windows over the "
    "cell table (metadata-scale), and a scalar finalization — exact "
    "closed-form integer arithmetic, no p-value approximation to "
    "diverge across engines.",
)
def q185(spark, sf_dir):
    return chi2_independence(_t(spark, sf_dir, "documents"), "lang", "source")


_RFM_SCORE = (
    "CASE WHEN {v} <= {q}[1] THEN 1 WHEN {v} <= {q}[2] THEN 2 "
    "WHEN {v} <= {q}[3] THEN 3 ELSE 4 END"
)


@q(
    "q186_rfm_segmentation",
    f"""
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
             CAST({_RFM_SCORE.format(v='b.neg_rec', q='q.qr')} AS INT) AS r_score,
             CAST({_RFM_SCORE.format(v='CAST(b.frequency AS DOUBLE)', q='q.qf')} AS INT)
               AS f_score,
             CAST({_RFM_SCORE.format(v='b.monetary', q='q.qm')} AS INT) AS m_score
      FROM b2 b, q)
    SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
              || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
    "RFM customer segmentation (operators/events.py rfm_segmentation): "
    "per-user recency/frequency/monetary, quartile scores via exact "
    "discrete quartile boundaries (recency negated so 'recent' scores "
    "high under the shared <=-boundary rule), concatenated into the "
    "classic 3-digit segment. One user-keyed agg + a broadcast 3×3 "
    "boundary row — user-cardinality exchanges only.",
)
def q186(spark, sf_dir):
    return rfm_segmentation(_t(spark, sf_dir, "events"))


@q(
    "q187_ewma_grid",
    f"""
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
    """,
    "Exponentially-weighted moving average over the regularized grid "
    "(operators/windows.py ewma, α=0.3): the smoothing recurrence folds "
    "micro-quantized integers per key in slot order — exact, "
    "partition-order-free, and replicated by a recursive-CTE walk on the "
    "oracle side. The fold is a per-key sequential scan inside one "
    "key-partitioned window — the per-key series length is the operator's "
    "documented bound (grids, not raw events).",
)
def q187(spark, sf_dir):
    return windows.ewma(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP, alpha=0.3,
    )


@q(
    "q188_feature_hashing",
    f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
    SELECT doc_id, {md5_int_sql('tok')} % 1024 AS bucket,
           CAST(SUM(CASE WHEN {seeded_hash_sql('tok', 1)} % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM toks GROUP BY 1, 2
    """,
    "Feature hashing / hashing-trick vectorizer (operators/text.py "
    "hashing_vectorizer — Weinberger et al. 2009): tokens hash to a "
    "fixed dim-bucket space with a second seeded hash supplying the ±1 "
    "sign that keeps collisions unbiased. Vocabulary-free by "
    "construction — no dictionary build, no OOV path, the exact "
    "property that matters when the corpus is 100 TB and the vocab "
    "won't fit anywhere. One explode + (doc, bucket) agg.",
)
def q188(spark, sf_dir):
    return text.hashing_vectorizer(_t(spark, sf_dir, "documents"), dim=1024)


_WELCH_XQ = (
    "CASE WHEN event_type = '{g}' AND value IS NOT NULL "
    "AND NOT isnan(CAST(value AS DOUBLE)) "
    "THEN CAST(round(CAST(value AS DOUBLE) * 1000000) AS HUGEINT) END"
)


@q(
    "q189_welch_ttest",
    f"""
    WITH s AS (
      SELECT COUNT({_WELCH_XQ.format(g='view')}) AS n_a,
             SUM({_WELCH_XQ.format(g='view')}) AS sx_a,
             SUM({_WELCH_XQ.format(g='view')} * {_WELCH_XQ.format(g='view')}) AS sxx_a,
             COUNT({_WELCH_XQ.format(g='purchase')}) AS n_b,
             SUM({_WELCH_XQ.format(g='purchase')}) AS sx_b,
             SUM({_WELCH_XQ.format(g='purchase')} * {_WELCH_XQ.format(g='purchase')}) AS sxx_b
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
    """,
    "Welch's unequal-variance t-test between two groups' metric values "
    "(operators/stats.py welch_ttest): means/variances from exact "
    "integer-quantized conditional sums in ONE scan (no per-group "
    "shuffle), t statistic and Welch–Satterthwaite dof in closed form — "
    "the continuous-metric companion to q181's proportion z-test. "
    "Partial→final combine all the way; scalar output.",
)
def q189(spark, sf_dir):
    return welch_ttest(
        _t(spark, sf_dir, "events"), "event_type", "value", "view", "purchase"
    )


@q(
    "q190_readability",
    """
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
    """,
    "Flesch reading-ease scoring (operators/text.py readability): "
    "sentence count from terminal-punctuation runs, syllables from "
    "vowel-group runs (the standard cheap proxy), the published "
    "206.835/1.015/84.6 coefficients pinned as exact doubles on both "
    "engines. Pure narrow map — zero shuffles at any corpus size; the "
    "quality-scoring complement to q178's rule filter.",
)
def q190(spark, sf_dir):
    return text.readability(_t(spark, sf_dir, "documents"))


@q(
    "q191_quality_report",
    """
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
    """,
    "Corpus quality-report pipeline grade (pipelines.py quality_report — "
    "the q177 delegate pattern: the graded query CALLS the pipeline and "
    "publishes its gopher_summary section, per-rule drop counts plus the "
    "__kept bucket). The pipeline's other sections ride machinery graded "
    "elsewhere: readability_by_source is q190's operator aggregated "
    "per-source, length_histogram is q120's. Sections share one scan of "
    "the corpus; the summary is a rule-cardinality aggregation.",
)
def q191(spark, sf_dir):
    from .pipelines import quality_report

    sections = dict(quality_report(_t(spark, sf_dir, "documents")))
    return sections["gopher_summary"]


@q(
    "q192_resample_interpolate",
    f"""
    WITH obs AS (SELECT user_id AS k, epoch_us(ts) AS e, CAST(value AS DOUBLE) AS v
                 FROM events),
    obs2 AS (SELECT k, e, MAX(v) AS v FROM obs GROUP BY 1, 2),
    spans AS (SELECT k, MIN(e) AS lo, MAX(e) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(range(
        CAST(ceil(lo / {_STEP_US}.0) * {_STEP_US} AS BIGINT),
        CAST(floor(hi / {_STEP_US}.0) * {_STEP_US} AS BIGINT) + 1,
        {_STEP_US})) AS e
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
    """,
    "Linear-interpolation resampling (operators/windows.py "
    "resample_interpolate): each grid slot takes the straight line "
    "between its bracketing observations (backward + forward as-of in "
    "one pass over the shared grid-union machinery), with the "
    "prev/next gap distances exposed so consumers can discount "
    "long-gap interpolations. Same single user-keyed exchange as "
    "q184/q187; 10M-event gated smoke covers the scale path.",
)
def q192(spark, sf_dir):
    return windows.resample_interpolate(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP,
    )


def _psi_oracle(n_bins: int = 10) -> str:
    case = " ".join(f"WHEN v <= q[{i}] THEN {i}" for i in range(1, n_bins))
    qlist = ",".join(f"{i / n_bins:.1f}" for i in range(1, n_bins))
    return f"""
    WITH q AS (SELECT quantile_disc(CAST(o_totalprice AS DOUBLE),
                 [{qlist}]) AS q FROM orders),
    r AS (SELECT CASE {case} ELSE {n_bins} END AS bin, COUNT(*) AS n_ref
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders), q
          GROUP BY 1),
    c AS (SELECT CASE {case} ELSE {n_bins} END AS bin, COUNT(*) AS n_cur
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                WHERE o_orderpriority = '1-URGENT'), q
          GROUP BY 1),
    bins AS (SELECT CAST(unnest(range(1, {n_bins + 1})) AS INT) AS bin),
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


@q(
    "q193_psi_drift",
    _psi_oracle(n_bins=10),
    "Population-stability-index drift report (operators/stats.py psi): "
    "reference-quantile equi-depth bins (exact discrete deciles), both "
    "populations bucketed against the SAME boundaries, per-bin PSI "
    "terms with the standard 1e-6 floor — the feature-drift gate "
    "between training snapshots. Boundaries are a broadcast 9-value "
    "row; both bucketings are narrow maps + bin-keyed (≤10-row) aggs.",
)
def q193(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return psi(
        o, o.where(F.col("o_orderpriority") == "1-URGENT"),
        "o_totalprice", n_bins=10,
    )


def _hll_oracle(table: str, key: str, m: int = 1024) -> str:
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


@q(
    "q194_hll_audit",
    _hll_oracle("lineitem", "l_orderkey"),
    "HyperLogLog distinct-count audit with a FULL value oracle "
    "(operators/stats.py hll_estimate — Flajolet et al. 2007, m=1024 "
    "registers over the cross-engine md5 hash): register maxima, "
    "bias-corrected harmonic estimate, linear-counting small-range "
    "branch, and the exact distinct joined alongside so the relative "
    "error is machine-checked — retires the q51 approx-distinct "
    "rows-only class (this entry exercises the saturated raw-harmonic "
    "branch; the linear-counting branch is parity-tested on events). "
    "The sketch is 1024 register rows regardless of input size.",
)
def q194(spark, sf_dir):
    return hll_estimate(_t(spark, sf_dir, "lineitem"), "l_orderkey")


@q(
    "q195_rag_chunker",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    k AS (SELECT doc_id, ws,
                 unnest(range(CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS chunk_id
          FROM w)
    SELECT doc_id, chunk_id,
           CAST(len(ws[chunk_id * 20 + 1 : chunk_id * 20 + 40]) AS INT) AS n_tokens,
           array_to_string(ws[chunk_id * 20 + 1 : chunk_id * 20 + 40], ' ')
             AS chunk_text
    FROM k
    """,
    "Sliding-window RAG chunker (operators/text.py chunk_documents, "
    "chunk=40 tokens, stride=20): each doc explodes into overlapping "
    "chunks whose consecutive texts share chunk−stride tokens (the "
    "overlap invariant is property-tested against a Python replica). "
    "Pure narrow map — tokenize once, slice per chunk index, zero "
    "shuffles; chunk count per doc is ceil(len/stride) so output size "
    "is linear in corpus tokens at any scale.",
)
def q195(spark, sf_dir):
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=40, stride=20
    )


@q(
    "q196_negative_sampling",
    f"""
    WITH idx AS (SELECT doc_id,
                        ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
                 FROM documents),
    n AS (SELECT COUNT(*) AS n FROM idx),
    drawn AS (
      SELECT idx.doc_id AS anchor_id, CAST(t AS INT) AS neg_rank,
             {md5_int_sql("'neg|' || CAST(doc_id AS VARCHAR) || '|' || CAST(t AS VARCHAR)")}
               % (n.n - 1) AS j0, idx.i
      FROM idx, n, (SELECT unnest(range(1, 4)) AS t)
      WHERE n.n >= 2),
    mapped AS (
      SELECT anchor_id, neg_rank,
             CASE WHEN j0 < i THEN j0 ELSE j0 + 1 END AS j
      FROM drawn)
    SELECT m.anchor_id, m.neg_rank, idx.doc_id AS negative_id
    FROM mapped m JOIN idx ON idx.i = m.j
    """,
    "Deterministic negative sampling for contrastive training "
    "(operators/sampling.py negative_pairs, k=3): candidate t for "
    "anchor i is md5(salt∥id∥t) mod (n−1) with the classic skip-self "
    "index shift, so self-pairs are impossible by construction and the "
    "training negatives are reproducible data, not a runtime accident. "
    "Indexing rides ranked_sort (sample-sort, no single-partition "
    "window); negatives resolve via one equi-join on the dense index — "
    "k multiplies only the slim (anchor, index) frame, never bodies.",
)
def q196(spark, sf_dir):
    return negative_pairs(_t(spark, sf_dir, "documents"), k=3)


def _bootstrap_oracle(B: int = 16) -> str:
    w_case = "CASE " + " ".join(
        f"WHEN u{{b}} < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    ) + " ELSE 8 END"
    cols, sums = [], []
    # one md5 feeds three resamples: 20-bit lanes of the 60-bit hash
    # (mirrors stats.bootstrap_mean_ci's hash-cost reduction)
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
    return f"""
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


@q(
    "q197_bootstrap_ci",
    _bootstrap_oracle(B=16),
    "Poisson-bootstrap confidence interval for a mean (operators/stats.py "
    "bootstrap_mean_ci, B=16): every row draws B Poisson(1) weights from "
    "a seeded content hash (Chamandy et al. 2012's streaming bootstrap — "
    "no per-resample pass, no row replication), all B weighted sums fold "
    "in ONE scan, and the 2.5/97.5 empirical percentiles come off the "
    "B-row mean table. Exact integer quantization keeps both engines "
    "bit-equal; scale cost is a single pass regardless of B.",
)
def q197(spark, sf_dir):
    return bootstrap_mean_ci(_t(spark, sf_dir, "events"), "value", n_resamples=16)


@q(
    "q198_windowed_funnel",
    """
    WITH a1 AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS a FROM events
                WHERE event_type = 'view' GROUP BY 1),
    a2 AS (SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS a
           FROM events e JOIN a1 ON a1.u = e.user_id
           WHERE e.event_type = 'click'
             AND epoch_us(e.ts) > a1.a AND epoch_us(e.ts) <= a1.a + 21600000000
           GROUP BY 1),
    a3 AS (SELECT e.user_id AS u, MIN(epoch_us(e.ts)) AS a
           FROM events e JOIN a2 ON a2.u = e.user_id
           WHERE e.event_type = 'purchase'
             AND epoch_us(e.ts) > a2.a AND epoch_us(e.ts) <= a2.a + 21600000000
           GROUP BY 1)
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           (SELECT COUNT(*) FROM a1) AS n_users
    UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM a2)
    UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM a3)
    """,
    "Time-constrained conversion funnel (operators/events.py "
    "windowed_funnel, 6 h per step): each step counts users whose "
    "first qualifying event lands within the window AFTER their "
    "previous step's anchor — the product-analytics semantics q122's "
    "unbounded funnel can't express (its step-1 anchor is asserted "
    "identical in the parity test). Per-user min-anchors fold in one "
    "user-keyed agg per step over the SAME exchange; output is one "
    "row per step.",
)
def q198(spark, sf_dir):
    return windowed_funnel(_t(spark, sf_dir, "events"), within_seconds=21600)


@q(
    "q199_cusum_changepoints",
    f"""
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
             greatest(CAST(0 AS BIGINT),
               CAST(round((b.value - b.mu) / b.sigma * 1000000) AS BIGINT)
               - 500000) AS up,
             greatest(CAST(0 AS BIGINT),
               -CAST(round((b.value - b.mu) / b.sigma * 1000000) AS BIGINT)
               - 500000) AS dn
      FROM b WHERE ord = 1
      UNION ALL
      SELECT b.k, b.ord, b.slot_epoch, b.value,
             greatest(CAST(0 AS BIGINT),
               (CASE WHEN w.up > 5000000 THEN 0 ELSE w.up END)
               + CAST(round((b.value - b.mu) / b.sigma * 1000000) AS BIGINT)
               - 500000),
             greatest(CAST(0 AS BIGINT),
               (CASE WHEN w.dn > 5000000 THEN 0 ELSE w.dn END)
               - CAST(round((b.value - b.mu) / b.sigma * 1000000) AS BIGINT)
               - 500000)
      FROM b JOIN walk w ON w.k = b.k AND b.ord = w.ord + 1)
    SELECT k AS user_id, slot_epoch, value,
           CASE WHEN up > 5000000 THEN 'up' ELSE 'down' END AS side,
           round((CASE WHEN up > 5000000 THEN up ELSE dn END) / 1000000.0, 6)
             AS cusum_stat
    FROM walk WHERE up > 5000000 OR dn > 5000000
    """,
    "Two-sided CUSUM changepoint detection over the regularized grid "
    "(operators/windows.py cusum_changepoints — Page 1954; k=0.5σ "
    "slack, h=5σ threshold, σ from the robust MAD·1.4826 estimate): "
    "the cumulative-sum recurrences fold micro-quantized integers per "
    "key in slot order (reset after each alarm), replicated by a "
    "recursive-CTE walk on the oracle side. Shares the series family's "
    "single user-keyed exchange; 10M-event gated smoke covers scale.",
)
def q199(spark, sf_dir):
    return windows.cusum_changepoints(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP,
    )


@q(
    "q200_target_encoding",
    """
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
    """,
    "Smoothed target encoding (operators/stats.py target_encode, "
    "smoothing=10 — Micci-Barreca 2001): per-category mean shrunk "
    "toward the global prior by the additive-smoothing rule "
    "(Σy + s·prior)/(n + s), the leakage-prone-if-naive feature "
    "transform done engine-side with exact integer sums. One "
    "category-keyed agg + a broadcast scalar prior; output is "
    "category-cardinality rows.",
)
def q200(spark, sf_dir):
    return target_encode(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


_EXPECT_RULES = [
    {"col": "l_quantity", "check": "min", "arg": 1},
    {"col": "l_quantity", "check": "max", "arg": 30},
    {"col": "l_shipdate", "check": "not_null"},
    {"col": "l_returnflag", "check": "in_set", "arg": ["A", "N"]},
    {"col": "l_linestatus", "check": "regex", "arg": "^O$"},
    {"col": "l_orderkey", "check": "unique"},
]


@q(
    "q201_expect_report",
    """
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
    """,
    "Declarative data-quality expectations (operators/stats.py "
    "expect_report — the expectations-framework shape, engine-native): "
    "min/max/not_null/in_set/regex/unique rules compile into ONE "
    "conditional-sum scan (uniqueness via count−count distinct), so N "
    "rules cost one pass, not N. The contract-check layer a production "
    "table runs before publishing; violation counts per rule with "
    "rates. Scalar-row output regardless of table size.",
)
def q201(spark, sf_dir):
    return expect_report(_t(spark, sf_dir, "lineitem"), _EXPECT_RULES)


@q(
    "q202_benford_audit",
    """
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
    """,
    "Benford first-digit audit (operators/stats.py benford_check): "
    "leading digit via exact integer quantization (×100 then first "
    "decimal digit — no float-format round-trips), observed vs the "
    "log10(1+1/d) law, per-digit χ² contributions for the anomaly "
    "readout. The classic synthetic-data / fraud screen; one narrow "
    "map + a 9-bucket agg, zero joins on the data path.",
)
def q202(spark, sf_dir):
    return benford_check(_t(spark, sf_dir, "orders"), "o_totalprice")


_RECALL_EXACT_CTE = f"""
    qs AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
    escored AS (
      SELECT qs.query_id, e.vec_id AS neighbor_id,
             round({_cosine_sql('qs.qe', 'e.embedding')}, 6) AS sim
      FROM embeddings e, qs
      WHERE e.vec_id != qs.query_id),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM escored) t
      WHERE rank <= 10)"""


@q(
    "q203_ann_recall_gate",
    f"""
    WITH {_RECALL_EXACT_CTE},
    approx AS (
      SELECT query_id, neighbor_id
      FROM ({_ivf_topk_oracle(k=10, n_centroids=16, nprobe=4, query_pred="vec_id < 10")}) iv),
    hits AS (SELECT e.query_id, COUNT(*) AS n_hit
             FROM exact e JOIN approx a ON a.query_id = e.query_id
                          AND a.neighbor_id = e.neighbor_id
             GROUP BY 1),
    t AS (SELECT query_id, COUNT(*) AS n_expected FROM exact GROUP BY 1)
    SELECT t.query_id, CAST(t.n_expected AS BIGINT) AS n_expected,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_expected, 6) AS recall
    FROM t LEFT JOIN hits h ON h.query_id = t.query_id
    """,
    "ANN recall@k quality gate (operators/similarity.py recall_at_k): "
    "per-query overlap of IVF top-10 (n_centroids=16, nprobe=4) against "
    "the exact cosine top-10 — the acceptance test run before trusting "
    "an approximate index at scale. Set semantics (both sides "
    "distinct-projected before the join, so duplicate pairs can never "
    "push recall past 1.0); the oracle composes the q34 exact and q66 "
    "IVF SQL replicas, so the FULL approximate pipeline is "
    "value-checked end-to-end, not just the ratio arithmetic.",
)
def q203(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, qs, k=10)
    approx = similarity.ivf_topk(emb, qs, k=10, n_centroids=16, nprobe=4)
    return similarity.recall_at_k(exact, approx)


@q(
    "q204_mutual_information",
    """
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
    """,
    "Mutual information + normalized MI between lang and source "
    "(operators/stats.py mutual_information): the dependence STRENGTH "
    "measure next to q185's χ² significance — MI needs only observed "
    "contingency cells, marginals come from partitionBy windows over "
    "the cell table (null-safe by construction — NULL categories count "
    "as levels, the r7-advice fix), entropies normalize to [0,1]. "
    "Cell-table arithmetic is metadata-scale after one (a,b) count.",
)
def q204(spark, sf_dir):
    return mutual_information(_t(spark, sf_dir, "documents"), "lang", "source")


@q(
    "q205_seasonal_profile",
    f"""
    WITH {_RESAMPLE_CTE},
    base AS (
      SELECT k, CAST((slot_epoch // {_STEP}) % 24 AS INT) AS season_pos,
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
    """,
    "Hour-of-day seasonal profile (operators/windows.py seasonal_profile, "
    "period=24 hourly slots): per-(key, cycle-position) means and their "
    "deviation from the key's overall mean — the additive seasonal "
    "index that separates daily rhythm from level. Position is "
    "pmod(slot, period) (sign-safe for pre-1970 data, the r7-advice "
    "fix); two bounded aggs over the shared resample grid, exchanges "
    "keyed by user like the whole series family.",
)
def q205(spark, sf_dir):
    return windows.seasonal_profile(
        _t(spark, sf_dir, "events"), key="user_id", ts="ts",
        value_col="value", step_seconds=_STEP, period_slots=24,
    )


@q(
    "q206_temporal_split",
    """
    WITH e AS (SELECT epoch_us(ts) AS e FROM events WHERE ts IS NOT NULL),
    c AS (SELECT quantile_disc(e, 0.8) AS cutoff FROM e)
    SELECT CASE WHEN e.e <= c.cutoff THEN 'train' ELSE 'eval' END AS split,
           c.cutoff AS cutoff_epoch_us,
           COUNT(*) AS n, MAX(e.e) AS max_e, MIN(e.e) AS min_e
    FROM e, c GROUP BY 1, 2
    """,
    "Leakage-safe temporal train/eval split (operators/sampling.py "
    "temporal_split, train_frac=0.8): rows at or before the EXACT 0.8 "
    "quantile of epoch-µs go to train — the split anything with "
    "temporal structure needs where a hash split would let the model "
    "peek at the future. Graded as the per-split summary (count + "
    "time-range extremes) so the no-leakage invariant train.max ≤ "
    "eval.min is literally a graded value; the cutoff rides the "
    "bounded multi-pass exact-percentile machinery (no sort).",
)
def q206(spark, sf_dir):
    split = temporal_split(_t(spark, sf_dir, "events"), "ts", train_frac=0.8)
    return split.groupBy("split", "cutoff_epoch_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.unix_micros("ts")).alias("max_e"),
        F.min(F.unix_micros("ts")).alias("min_e"),
    )


@q(
    "q207_activity_streaks",
    """
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
    """,
    "Consecutive-day activity streaks (operators/events.py "
    "activity_streaks): distinct active days → gaps-and-islands "
    "(day − row_number is constant within a run) → per-user "
    "longest/current/total — the engagement metric that needs run "
    "structure, not just counts. One user-keyed window over the "
    "deduped DAY table (≤ span days per user, not events), then a "
    "bounded per-user agg.",
)
def q207(spark, sf_dir):
    return activity_streaks(_t(spark, sf_dir, "events"))


@q(
    "q208_ewma_stream_twin",
    """
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
    """,
    "Streaming EWMA state twin (streaming/stateful.py ewma_events_batch "
    "— the q164 twin pattern: the graded query runs the BATCH twin of "
    "the transformWithStateInPandas fold; stream ↔ batch equivalence "
    "and the ordering contract are asserted in tests/test_streaming.py, "
    "including the shuffled-replay divergence test that pins the "
    "event-time-order requirement machine-visibly). State is one "
    "integer cell per key (α=0.3 micro-quantized recurrence), so a "
    "100 TB replay carries key-cardinality state, not history.",
)
def q208(spark, sf_dir):
    from .streaming.stateful import ewma_events_batch

    return ewma_events_batch(_t(spark, sf_dir, "events"))


@q(
    "q209_vocab_divergence",
    """
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
    """,
    "Jensen–Shannon vocabulary divergence between two corpus halves "
    "(operators/text.py vocab_divergence): unigram distributions from "
    "token-keyed counts, full-outer-joined on token, JSD in nats "
    "(bounded by ln 2, asserted in its parity test) plus "
    "vocab-size/overlap counts — the distribution-shift readout for "
    "corpus mixing decisions. Everything after the two token counts is "
    "vocab-cardinality, never corpus-cardinality.",
)
def q209(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return text.vocab_divergence(
        d.where(F.col("source") < "src5"), d.where(F.col("source") >= "src5")
    )


@q(
    "q210_bot_detection",
    """
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
    """,
    "Behavioral bot detection over event timing (operators/events.py "
    "bot_detection): inter-event gap coefficient-of-variation (low CV = "
    "metronomic automation) and max events in any sliding 1 h window "
    "(burst rate), with machine-readable trigger reasons — thresholds "
    "loosened for the organic fixture so the grade exercises both "
    "rules. One user-keyed window pass (lag + range frame share the "
    "exchange), then a bounded per-user agg.",
)
def q210(spark, sf_dir):
    return bot_detection(
        _t(spark, sf_dir, "events"), burst_window_s=3600, max_burst=3,
        min_events=5, max_gap_cv=2.0,
    )


@q(
    "q211_group_percentiles",
    """
    WITH v AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS x
               FROM orders
               WHERE o_totalprice IS NOT NULL
                 AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    q AS (SELECT g, quantile_disc(x, [0.5, 0.9, 0.99]) AS qs FROM v GROUP BY g)
    SELECT g AS o_orderpriority,
           ([0.5, 0.9, 0.99])[i] AS p,
           qs[i] AS value
    FROM q, (SELECT unnest(range(1, 4)) AS i) t
    """,
    "Per-group exact discrete percentiles (operators/stats.py "
    "group_percentiles, p50/p90/p99 of order totals by priority): "
    "exact order statistics per group in one window pass — the "
    "documented contract is per-source/per-tenant groups (each group "
    "sorts within one window partition; the docstring bound is "
    "asserted in its unit test), with q171's bounded multi-pass "
    "machinery as the unbounded-group alternative. Five groups × three "
    "percentiles out.",
)
def q211(spark, sf_dir):
    return group_percentiles(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


@q(
    "q212_merged_schema_read",
    """
    SELECT r_regionkey, r_name,
           CAST(NULL AS INTEGER) AS n_nationkey,
           CAST(NULL AS VARCHAR) AS n_name,
           CAST(NULL AS INTEGER) AS n_regionkey
    FROM region
    UNION ALL
    SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
           n_nationkey, n_name, n_regionkey
    FROM nation
    """,
    "Schema-evolution parquet read (sources/io.py read_parquet_merged — "
    "the graded representative of the I/O protocol surface, per the r7 "
    "verdict: the one relationally-expressible member of the "
    "dead-letter/incremental/upsert family): mergeSchema unions every "
    "footer's schema and rows surface NULLs in columns their file "
    "predates. Fixture stand-in: two footers with disjoint schemas "
    "(region + nation read through one glob); the oracle is the exact "
    "NULL-padded UNION ALL semantics. At 100 TB pin the merged schema "
    "in a catalog once known — footer listing is metadata-bound.",
)
def q212(spark, sf_dir):
    from .sources.io import read_parquet_merged

    return read_parquet_merged(spark, f"{sf_dir}/{{region,nation}}.parquet")
