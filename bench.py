#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query wall times.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query executes to
completion through the noop sink (full computation, no driver-side
materialization cost), mirroring how a cluster job would terminate in a
write. Includes the two reference conformance programs (seeded sort /
max — /root/reference/parallel_sort.cpp, max_aggregation.cpp) at the
reference's own sizes so BENCH is comparable to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: relational core + windows + temporal + dedup + similarity.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_global_sort",
    "q03_top_revenue_orders",
    "q05_region_revenue",
    "q09_window_funcs",
    "q16_distinct_agg",
    "q21_topk_per_group",
    "q24_asof_join",
    "q25_sessionize",
    "q26_tumbling_window",
    "q29_dedup_exact_keep_first",
    "q31_minhash_lsh_pairs",
    "q102_minhash_xxhash",  # q31 on the production hash family (xxhash64)
    "q32_simhash",
    "q34_cosine_topk",
    "q35_embedding_neardup",
    "q54_grouped_map",
    "q61_tfidf",
    "q63_salted_join",
    "q66_ivf_topk",
    "q77_min_cost_supplier",
    "q83_doc_chunks",
    "q107_boilerplate_removal",  # r4: corpus-derived stoplist, broadcast apply
    "q108_unigram_logprob",  # r4: LM-proxy scoring, broadcast model
    # r5 additions (VERDICT r4 #4): the r4-new operators that joined the
    # catalog without a headline timing — subtract these six for
    # like-for-like totals vs r04.
    "q109_word_entropy",  # partial-summable entropy, two narrow aggs
    "q110_mixing_weights",  # broadcast rate table
    "q113_corpus_report",  # one-row corpus summary composition
    "q114_dedup_clusters_star",  # large-star/small-star components (iterative)
    "q115_training_shuffle",  # second ranked_sort consumer
    "q116_filter_report",  # per-document filter audit
    # r5 mid-round additions: the operators that joined the catalog after
    # the first r5 bench record — subtract for like-for-like vs earlier
    # r05 history entries.
    "q117_cross_decontamination",  # cross-side banded-MinHash buckets
    "q119_dup_ngram_fraction",  # shingle df join-back
    "q121_quality_quartiles",  # per-stratum parallel NTILE
    "q122_event_funnel",  # user-keyed conditional mins + scalar final
    "q124_retention_cohorts",  # distinct (user,week) + cohort join
    "q125_pq_topk",  # PQ encode + ADC lookup join
    "q126_dup_spans",  # positional shingles + gaps-and-islands window
    "q128_skew_report",  # heavy-hitter pre-flight over lineitem
    "q130_integrity_audit",  # anti-join FK checks over the full schema
    "q134_bpe_pair_counts",  # adjacent-pair explode + top-20
    # r6 additions (VERDICT r5 #3): the r5-new heavy operators that joined
    # the catalog after the headline set was last widened — subtract these
    # eight for like-for-like totals vs r05.
    "q132_image_dhash_dedup",  # RAW8 decode → dHash → hash-keyed groups
    "q133_image_neardup",  # banded hamming near-dup over dHash
    "q136_audio_fingerprint",  # PCM energy fingerprint, hash-keyed
    "q143_pmi_collocations",  # bigram explode + two broadcast totals
    "q150_dedup_keep_best",  # cluster join + quality argmax per cluster
    "q156_chunk_dedup",  # chunk explode + md5 groupBy
    "q157_dedup_threshold_curve",  # capped exact-Jaccard, threshold 0.0
    "q158_source_overlap_matrix",  # capped exact-Jaccard + source joins
    # r7 additions (VERDICT r6 #5): the r6-new queries q159-q168 join the
    # headline set — subtract these ten for like-for-like totals vs r06.
    "q159_stream_dedup_twin",  # chained stateful dedup→count batch twin
    "q160_split_leakage",  # cross-split capped-Jaccard audit
    "q161_event_transitions",  # user-partitioned lead + bounded-key agg
    "q162_vocab_health",  # per-source type/token aggregation
    "q163_delta_dedup",  # batch-vs-corpus keyed hash join
    "q164_running_totals_twin",  # running-totals window twin
    "q165_chunk_neardup",  # chunk-keyed full MinHash/LSH pipeline
    "q166_ivf_balance",  # IVF assign + cid-keyed balance report
    "q167_late_supplier_blame",  # Q21-shape orderkey-partitioned agg
    "q168_minhash_calibration",  # signature-vs-exact estimator QA
    # r7-new queries (graded this round — VERDICT r6 #1/#4): subtract
    # these nine too for like-for-like totals vs r06.
    "q169_semantic_dedup",  # cluster-blocked cosine near-dup
    "q170_fuzzy_entity_match",  # blocked Levenshtein + max_block cap
    "q171_exact_percentiles",  # batched bucket-counting order stats
    "q172_mad_outlier_fences",  # two exact medians + fence arithmetic
    "q173_bigram_quality",  # pruned bigram LM scoring join
    "q174_lang_consistency",  # per-chunk lang-ID rollup
    "q175_event_paths",  # sessionized length-3 path mining
    "q176_cdc_compaction",  # change-log latest-version compaction
    "q177_curation_funnel",  # end-to-end curate_corpus survival report
    # r8 additions (VERDICT r7 #3): the 35 r8-new declarations join the
    # headline set the round they land — subtract these for like-for-like
    # totals vs r07.
    "q178_gopher_rules",  # rule-filter narrow scan
    "q179_containment_pairs",  # max_df-capped containment/Jaccard pairs
    "q180_cms_heavy_hitters",  # CMS sketch + exact-count audit join
    "q181_ab_significance",  # hash-bucketed funnel z-test
    "q182_bloom_prejoin",  # seeded Bloom build + fact probe report
    "q183_key_skew_report",  # per-key counts + simulated partition load
    "q184_series_trend",  # least-squares moments over the resample grid
    "q185_chi2_independence",  # contingency windows + scalar finalize
    "q186_rfm_segmentation",  # user agg + broadcast quartile boundaries
    "q187_ewma_grid",  # per-key quantized EWMA fold on the grid
    "q188_feature_hashing",  # hashing-trick explode + (doc,bucket) agg
    "q189_welch_ttest",  # one-scan conditional moments, scalar out
    "q190_readability",  # Flesch narrow map, zero shuffles
    "q191_quality_report",  # pipeline delegate: gopher_summary section
    "q192_resample_interpolate",  # backward+forward as-of on the grid
    "q193_psi_drift",  # equi-depth reference bins + per-bin PSI
    "q194_hll_audit",  # HLL registers + exact-distinct audit
    "q195_rag_chunker",  # sliding-window chunk explode
    "q196_negative_sampling",  # ranked_sort index + skip-self hash draw
    "q197_bootstrap_ci",  # B=16 Poisson weights folded in one scan
    "q198_windowed_funnel",  # per-step windowed min-anchors
    "q199_cusum_changepoints",  # per-key CUSUM fold over the grid
    "q200_target_encoding",  # category agg + broadcast prior
    "q201_expect_report",  # 6 rules compiled into one scan
    "q202_benford_audit",  # first-digit quantize + 9-bucket agg
    "q203_ann_recall_gate",  # exact vs IVF top-k overlap
    "q204_mutual_information",  # contingency cells + window marginals
    "q205_seasonal_profile",  # pmod cycle position over the grid
    "q206_temporal_split",  # exact-percentile cutoff + split summary
    "q207_activity_streaks",  # gaps-and-islands over distinct days
    "q208_ewma_stream_twin",  # per-event EWMA batch twin
    "q209_vocab_divergence",  # token counts + full-outer JSD
    "q210_bot_detection",  # gap CV + sliding burst window
    "q211_group_percentiles",  # per-group exact discrete percentiles
    "q212_merged_schema_read",  # mergeSchema footer-union read
    # r9 additions (VERDICT r8 #3): the 28 r9-new declarations join the
    # headline set the round they land — subtract these for like-for-like
    # totals vs r08. Expected-expensive newcomers: q221 (5 pagerank
    # rounds over the Jaccard dup graph), q214/q213 (full resample
    # grids), q234 (Holt grid fold — the q187/q199 family), q218 (two
    # resample grids + per-key moments), q235 (grid-decomposed interval
    # join over per-(user,day) spans × purchase windows).
    "q213_resample_ffill",  # grid union + per-key last(ignorenulls) fill
    "q214_series_anomalies",  # exact per-key median/MAD fences on the grid
    "q215_zipf_fit",  # token explode + per-source top-100 OLS
    "q216_cluster_drift",  # two broadcast centroid assigns + dim agg
    "q217_equi_depth_buckets",  # exact bounds broadcast + 8-key agg
    "q218_series_correlation",  # two grids + slot equi-join + moments
    "q219_multi_touch_attribution",  # lookback join + per-conversion window
    "q220_refresh_vocab_deltas",  # two vocab-health passes + outer join
    "q221_pagerank_dup_graph",  # 5 checkpoint-truncated power iterations
    "q222_weighted_sample",  # Efraimidis–Spirakis TakeOrdered heap
    "q223_parquet_zone_map",  # per-file min/max/null grouped scan
    "q224_winsorized_stats",  # exact p1/p99 bounds + decimal mean
    "q225_series_rolling",  # 12-slot trailing window on the grid
    "q226_asof_forward_nearest",  # two as-of directions + event_id join
    "q227_interval_union_duration",  # islands via running-max window
    "q228_corr_matrix",  # one-pass quantized pairwise moments
    "q229_funnel_step_latencies",  # conditional-min groupBy, 2-row out
    "q230_gopher_repetition",  # dup-line arrays + one 3-n gram exchange
    "q231_ks_drift",  # ranged-prefix ECDF sup-gap
    "q232_gini_concentration",  # ranked_sort rank moment, scalar out
    "q233_hist_quantile_audit",  # 64-bin histogram + exact audit join
    "q234_holt_linear",  # coupled level+trend integer fold on the grid
    "q235_interval_overlap_join",  # grid-cell explode + canonical-cell join
    "q236_auc_roc",  # midrank Mann–Whitney, scalar out
    "q237_calibration_bins",  # 10-bin reliability diagram
    "q238_mix_rebalance",  # per-stratum quota fill by md5 rank
    "q239_scene_changes",  # per-frame dHash + per-video lag window
    "q240_upsert_replay_compaction",  # 4 compaction folds incl. replay
    # r10 additions (VERDICT r9 #6): the 11 r10-new declarations join the
    # headline set the round they land — subtract these for like-for-like
    # totals vs r09. Expected-expensive newcomers: q241 (grid-cell
    # explode + cell equi-join over per-(user,day) spans), q245 (two
    # distinct-gram explodes + gram-keyed membership join), q246 (full
    # resample grid + 3-lag window + per-(key,lag) moments).
    "q241_point_in_interval_join",  # interval cell explode + point cell join
    "q242_audio_silence_segments",  # PCM frame mass + silent-run islands
    "q243_cohens_kappa",  # 4-cell contingency + broadcast marginals
    "q244_brown_forsythe",  # exact medians + one conditional moment scan
    "q245_ngram_novelty",  # distinct-gram explode + reference membership
    "q246_series_autocorrelation",  # grid + 3-lag window + quantized moments
    "q247_group_kfold",  # narrow hash map + 5-key agg
    "q248_video_keyframe_select",  # dHash + lag segmentation + middle pick
    "q249_spearman_corr",  # doubled midranks + rank-moment scan
    "q250_mcnemar",  # one conditional-sum scan, scalar out
    "q251_interval_gaps",  # running-max window, gap filter
    # r11 additions (VERDICT r10 #4): the 23 r11-new declarations join
    # the headline set the round they land — subtract these for
    # like-for-like totals vs r10. Expected-expensive newcomers: q266
    # (ε-band candidates + per-left kNN rank window over every
    # purchase×click pair within ±30 s), q264 (the conversion×touch
    # 24 h-lookback pairing + three per-conversion windows), q268/q260/
    # q261 (fixture decode + per-media reductions are cheap, but each
    # pays the mapInPandas Arrow spin-up), q252 (doubled-midrank
    # machinery: per-distinct-value counts + ranged prefix sums), q274
    # (≤30× contribution explode on the collapsed user-day frame).
    "q252_kruskal_wallis",  # doubled midranks + per-group rank moments
    "q253_anova_oneway",  # one groupBy to quantized per-group moments
    "q254_cohens_d",  # one conditional moment scan, scalar out
    "q255_collocation_llr",  # bigram explode + margin windows + top-k heap
    "q256_inter_event_stats",  # per-key lag gaps, persisted, + gap median
    "q257_series_extrema",  # resample grid + one lag/lead window
    "q258_cluster_size_stats",  # CC to fixpoint + two bounded groupBys
    "q259_epsilon_band_join",  # 3-cell explode + cell equi-join
    "q260_audio_clipping",  # PCM rail scan + clipped-run islands (Arrow)
    "q261_image_border_uniformity",  # border gray reduce in-batch (Arrow)
    "q262_weighted_quantiles",  # per-value weights + ranged prefix sums
    "q263_quantile_shift",  # two per-group exact quantile sets + align
    "q264_attribution_models",  # lookback pairing + 3 per-conversion windows
    "q265_weekly_churn",  # distinct (user,week) + shifted full-outer align
    "q266_knn_band_join",  # band candidates + per-left kNN rank window
    "q267_char_class_report",  # five regex strips, pure narrow map
    "q268_video_motion_profile",  # per-frame dHash + lag hamming (Arrow)
    "q269_mann_kendall",  # per-key all-pairs S + Sen median (bounded)
    "q270_wilson_ci",  # one conditional-count groupBy, closed form
    "q271_cluster_cohesion",  # broadcast centroids + top-2 margin agg
    "q272_late_arrival_report",  # ranged prefix-max watermark + window agg
    "q273_distribution_shape",  # one quantized 4-moment scan, scalar out
    "q274_active_user_rollup",  # user-day collapse + bounded horizon explode
    # r12 additions (SURVEY §8 r12 map): the 12 r12-new declarations join
    # the headline set the round they land — subtract these for
    # like-for-like totals vs r11. Expected-expensive newcomers: q280/
    # q281 (full resample grid + per-position moments / 3-lag ACF — the
    # q246 family), q282 (interval cell explode + anti cell join), q283
    # (16-centroid broadcast scoring over every embedding), q287-family
    # rank machinery in q275's pool scan is cheap (documents-scale).
    "q275_odds_ratio",  # one conditional-count scan, closed-form CI
    "q276_chi2_gof",  # one count groupBy + DECIMAL moment, scalar out
    "q277_trimmed_mean",  # exact percentile cuts + conditional scan
    "q278_group_diversity",  # (group,cat) count + quantized entropy terms
    "q279_max_concurrency",  # endpoint explode + per-key running sum
    "q280_seasonal_decompose",  # grid + per-position moments + bounded fold
    "q281_ljung_box",  # grid + 3-lag ACF + quantized term sum
    "q282_coverage_gap_join",  # interval cell explode + anti cell join
    "q283_silhouette_report",  # broadcast centroids + per-vector top-2
    "q284_audio_snr",  # PCM frame mass + floor/signal split (Arrow)
    "q285_image_exposure",  # luma histogram + entropy terms in-batch (Arrow)
    "q286_tokenizer_fertility",  # three narrow counters + per-source agg
    # r13 additions (SURVEY §8 r13 map): the 12 r13-new declarations join
    # the headline set the round they land — subtract these for
    # like-for-like totals vs r12. Expected-expensive newcomers: q291
    # (TWO resample grids + slot join + one 7-lag window — roughly 2×
    # the q246/q281 grid cost), q288 (per-block k×k cell compare),
    # q297 (brute all-pairs cosine rank over the 640-vector sf0.1
    # embeddings — the q34 shape); q292 is a full token explode;
    # q294–q296 are fixture-scale Arrow spin-up; q287/q289/q290/q293
    # are value-level rank/cumsum or histogram-cell scans.
    "q287_mann_whitney_u",  # distinct-value midranks + tie term, scalar out
    "q288_friedman_test",  # per-block integer rank compare + exact Q
    "q289_benjamini_hochberg",  # value-level ranged cumsum + integer step-up
    "q290_hellinger_matrix",  # 30-bucket histogram cells + pair join
    "q291_lagged_crosscorr",  # 2 LOCF grids + slot join + 7-lag window
    "q292_token_burstiness",  # token explode + two map-side-combined groupBys
    "q293_heaps_law_fit",  # token explode + 20-point quantized OLS
    "q294_channel_balance",  # per-channel exact sums in-batch (Arrow)
    "q295_freeze_detect",  # frame checksums in-batch + island windows (Arrow)
    "q296_envelope_periodicity",  # envelope in-batch + 8-lag ACF (Arrow)
    "q297_knn_graph_stats",  # brute top-k edges + reciprocity self-join
    "q298_lsh_bucket_stats",  # band-bucket groupBy over LSH signatures
    # r14 additions (SURVEY §8 r14 map): the 19 r14-new declarations +
    # the VERDICT-r13-#2 closer q338 join the headline set the round
    # they land — subtract these twenty for like-for-like totals vs
    # r13. Expected-expensive newcomers: q304/q312/q316 (each rides a
    # full per-user resample grid — the q246 family; q312 adds 4×
    # block-sized rows on top), q300 (per-user k×k Arrow pair compare),
    # q308 (the banded-LSH cluster path under the weights); q309/q310/
    # q314 are fixture-scale Arrow spin-up; q299/q301/q302/q311/q313/
    # q315/q317 are value-level scans/cumsums; q338 is the LSH bucket
    # join + n·k graph stats — expected FAR below q297's brute 35 s.
    "q299_kaplan_meier",  # two ranged cumsums over duration cells
    "q300_kendall_tau",  # bounded per-user Arrow pair compare
    "q301_dispersion_index",  # hourly cell counts + global span
    "q302_grubbs_test",  # one quantized-moment groupBy, closed form
    "q303_markov_stationary",  # bounded transition matrix + 8 int steps
    "q304_periodogram",  # resample grid + 6 quantized trig terms/slot
    "q305_centroid_similarity",  # posexplode agg + label-pair join
    "q306_mojibake_report",  # strip-and-subtract length deltas, one agg
    "q307_bigram_cond_entropy",  # bigram explode + two vocab groupBys
    "q308_soft_dedup_weights",  # banded clusters + size join + source agg
    "q309_image_blur_score",  # Laplacian moments in-batch (Arrow)
    "q310_video_black_frames",  # luma sums in-batch + island windows
    "q311_partial_correlation",  # one 9-moment HUGEINT scan, scalar out
    "q312_hurst_exponent",  # grid + (key,w,block) windows + 4-pt OLS
    "q313_embedding_exact_dedup",  # quantized md5 signatures, one agg
    "q314_audio_dynamic_range",  # peak + sum-of-squares in-batch (Arrow)
    "q315_bootstrap_diff_ci",  # 16 Poisson replicates in ONE scan
    "q316_forecast_backtest",  # grid + integer EWMA walk + lag window
    "q317_cohort_ltv",  # cohort cells + cohort-partitioned running sum
    "q338_knn_graph_ann",  # LSH bucket-join edges + n·k graph stats
    # r15 additions (SURVEY §8 r15 map): the 20 r15-new declarations
    # join the headline set the round they land — subtract these
    # twenty for like-for-like totals vs r14. Expected-expensive
    # newcomers: q331 (per-user LOCF resample grid — the q246 family),
    # q329 (TWO brute pair rankings over the embeddings), q335 (the
    # codebook-encode broadcast join); q326/q327/q328/q334/q337 are
    # fixture-scale Arrow spin-up; the stats/text entries are
    # value-level cell scans or narrow regex maps.
    "q318_mood_median_test",  # exact rank median + 2×k quantized terms
    "q319_cochran_q",  # cell collapse + exact integer row/col moments
    "q320_contingency_residuals",  # one count agg + window marginals
    "q321_nelson_aalen",  # two ranged cumsums over duration cells
    "q322_mean_excess",  # one conditional-moment groupBy (DECIMAL mass)
    "q323_concurrency_profile",  # ±1 endpoint sweep, per-key windows
    "q324_template_prefixes",  # 5-token slices + per-source top-1 windows
    "q325_code_detect",  # two regex densities in one narrow codegen map
    "q326_image_colorfulness",  # opponent integer moments in-batch (Arrow)
    "q327_audio_zero_crossing",  # sign-diff reduction in-batch (Arrow)
    "q328_video_loop_detect",  # frame checksums in-batch + gap windows
    "q329_dim_truncation",  # two brute pair rankings + overlap join
    "q330_runs_test",  # per-key median + flip window, closed moments
    "q331_step_change",  # LOCF grid + prefix-sum split argmax
    "q332_cooccurrence_lift",  # distinct scopes + scope-keyed pair join
    "q333_vocab_coverage",  # count-of-counts + ranged cumsum
    "q334_image_symmetry",  # mirror-pair integer masses in-batch (Arrow)
    "q335_pq_reconstruction",  # codebook broadcast encode, kept distance
    "q336_jonckheere_terpstra",  # value cells + asof cumulative probes
    "q337_video_shot_stats",  # dHash in-batch + island shot windows
    "conf_sort_seeded",
    "conf_max_seeded",
]


def _jvm_gc_ms(spark) -> int:
    """Cumulative stop-the-world GC milliseconds of the (single, local)
    JVM — driver = executor on local[N], so this is the whole story."""
    beans = (
        spark._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return int(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def _jvm_heap_mb(spark) -> int:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / 1_048_576)


def _n_persistent_rdds(spark) -> int:
    """Leaked-persist detector: release_intermediates() should return
    this to ~0 between queries; a monotone climb is bookkeeping debt."""
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def pressure_probe(spark, sf_dir: str, queries) -> float:
    """One fixed q01 warm execution — the in-suite pressure probe
    (VERDICT r13 #5): re-timed every ~25 suite positions, so a
    MONOTONE CLIMB across the suite = accumulating JVM/block-manager
    pressure, while a FLAT trajectory with an inflated suite total =
    suite-external interference (host load, page cache). q01 is the
    scan-agg ground canary: narrow codegen, no persist, no Python."""
    t0 = time.perf_counter()
    queries["q01_pricing_summary"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def sched_floor_probe(spark, chains: int = 3, shuffles_per_chain: int = 8) -> float:
    """Time a fixed synthetic pipeline of tiny shuffle stages (~100 rows
    per exchange) — pure scheduler + stage-launch overhead, no data.

    Motivation (VERDICT r9 finding #2 / next-round #4): the
    q182/q61/q183 rerun minima sat 20–35%% above their r8 records across
    three sessions on bit-identical plans, identical testdata, and a
    quiet host — a host-level PER-STAGE overhead shift is the leading
    hypothesis (those queries run 8–11 exchanges over fixture-scale
    data, so a few ms per stage moves their totals double-digit
    percent while big-scan queries barely notice). This probe makes
    that attributable mechanically: recorded in every bench run, so a
    round-over-round uniform offset on many-small-stage queries can be
    checked against the probe's delta instead of re-arguing from plan
    censuses. 3 chains × 8 shuffles = 24 exchanges of ~97 rows.
    """
    from pyspark.sql import functions as F

    base = spark.range(0, 10_000, 1, 8)

    def _chain():
        d = base
        for _ in range(shuffles_per_chain):
            d = (
                d.groupBy((F.col("id") % 97).alias("id"))
                .agg(F.count(F.lit(1)).alias("c"))
                .select((F.col("id") + F.col("c")).alias("id"))
            )
        d.write.format("noop").mode("overwrite").save()

    _chain()  # untimed warm-up: codegen compile is not stage overhead
    t0 = time.perf_counter()
    for _ in range(chains):
        _chain()
    return round(time.perf_counter() - t0, 3)


def rerun_protocol(spark, name: str, runs: int = 6) -> dict:
    """The q05/q01 flag-closing protocol (BENCH_r03+ notes), callable
    in-session: one cold run, ``runs`` timed warm runs releasing operator
    caches between them, plus the physical plan's join/exchange census so
    a plan change is visible alongside the timings. bench.py auto-invokes
    this for every >20%% warm flag at the end of a run (VERDICT r6 #6:
    every flag carries its own rerun evidence in the record — a loaded
    session can never again leave flags closed by prose alone);
    tools/rerun_query.py wraps the same function for manual use."""
    import re

    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import QUERIES

    fn = QUERIES[name].fn
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    release_intermediates()
    runs_s = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs_s.append(round(time.perf_counter() - t0, 3))
        release_intermediates()
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    census = {
        k: len(re.findall(k, plan))
        for k in ("BroadcastHashJoin", "SortMergeJoin", "Exchange", "SinglePartition")
    }
    ts = sorted(runs_s)
    return {
        "runs": runs_s,
        "min": ts[0],
        "median": ts[len(ts) // 2],
        "max": ts[-1],
        "plan_census": census,
    }


def reference_timings() -> dict:
    """Re-run the reference programs on this machine (SURVEY.md §6: the
    honest comparison is same-hardware). Compiles both C++ sources from
    the read-only snapshot into a temp dir; any failure degrades to an
    empty dict rather than breaking the bench.

    Note for interpretation: these are single-shot in-memory C++ runs at
    the reference's own sizes (131k sort / 1M max). The engine's
    conf_sort_seeded / conf_max_seeded run the same workloads through
    Spark — the delta is JVM+scheduler overhead that amortizes away at
    the data sizes Spark exists for.
    """
    import re
    import shutil
    import subprocess
    import tempfile

    out: dict[str, int] = {}
    tmp = tempfile.mkdtemp(prefix="refbin_")
    try:
        for prog in ("parallel_sort", "max_aggregation"):
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-pthread", "-o", f"{tmp}/{prog}",
                 f"/root/reference/{prog}.cpp"],
                check=True, capture_output=True, timeout=120,
            )
        r = subprocess.run(
            [f"{tmp}/parallel_sort", "--mode", "thread", "--workers", "8",
             "--size", "131072"],
            capture_output=True, text=True, timeout=60, check=True,
        )
        m = re.search(r"Total time \(ms\): (\d+)", r.stdout)
        if m:
            out["ref_sort_total_ms"] = int(m.group(1))
        r = subprocess.run(
            [f"{tmp}/max_aggregation", "--mode", "thread", "--workers", "8",
             "--size", "1000000"],
            capture_output=True, text=True, timeout=60, check=True,
        )
        m = re.search(r"Map time \(ms\): (\d+)", r.stdout)
        if m:
            out["ref_max_map_ms"] = int(m.group(1))
    except Exception:
        pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _repo_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _latest_driver_round() -> int:
    """Highest N among the driver's BENCH_r{N}.json artifacts (0 if none)."""
    import glob
    import re

    rounds = []
    for f in glob.glob(os.path.join(_repo_dir(), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds, default=0)


def history_path(round_n: int) -> str:
    return os.path.join(_repo_dir(), "bench_history", f"r{round_n:02d}.json")


def write_history(out: dict, round_n: int) -> str | None:
    """Persist the COMPLETE bench output in-repo (VERDICT r4 #1): the
    driver's BENCH_r{N}.json front-truncates its "tail" to a byte budget
    with no completeness guarantee, so regression flagging must never
    depend on it. Only written at the driver's per-round config (sf0.1)
    so local sf0.01 iteration runs can't poison the comparison base."""
    if out.get("sf") != 0.1:
        return None
    path = history_path(round_n)
    os.makedirs(os.path.join(_repo_dir(), "bench_history"), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    return path


def _warm_from_truncated_tail(tail: str) -> dict[str, float]:
    """Recover queries_warm from the driver's front-truncated tail.

    The driver cuts the tail at an ARBITRARY byte offset from the front —
    r03's cut landed before the "queries_warm" key (key survives, object
    matchable); r04's landed *inside* the object (key gone, first entry's
    key half-eaten). Handle both, in order of how much survives.
    """
    import re

    # Key survives: the warm object is flat (no nested braces) — match it.
    m = re.search(r'"queries_warm":\s*(\{[^{}]*\})', tail)
    if m:
        try:
            return json.loads(m.group(1))
        except Exception:
            pass
    # Key cut away: everything between the tail start and "total_warm" is
    # (the surviving suffix of) the warm object, because the bench line's
    # key order is fixed: queries, queries_warm, total_warm, ... Scan
    # complete '"name": float' pairs; a first pair whose key was half-eaten
    # by the cut has no opening quote and drops out naturally. A cut that
    # lands before queries_warm leaves the key intact (handled above), and
    # one that lands after it leaves no pairs before total_warm — so this
    # path never mixes in cold-times or scalar fields.
    idx = tail.find('"total_warm"')
    if idx == -1:
        return {}
    frag = tail[:idx]
    pairs = re.findall(r'"([A-Za-z_]\w*)":\s*([0-9]+(?:\.[0-9]+)?)', frag)
    return {k: float(v) for k, v in pairs if k not in ("queries", "queries_warm")}


def previous_round_warm() -> dict[str, float]:
    """Warm per-query times of the previous round, for >20%% round-over-round
    regression flagging.

    Preference order (VERDICT r3 #1 and r4 #1 — this has been blind twice):
      1. bench_history/r{N}.json for the latest driver round N — the
         complete record bench.py itself wrote during that round.
      2. The driver's BENCH_r{N}.json: its "parsed" field, a top-level
         queries_warm, or recovery from the front-truncated "tail"
         (including a cut landing inside the queries_warm object).
    """
    import glob

    n = _latest_driver_round()
    if n:
        try:
            hist = json.load(open(history_path(n)))
            if isinstance(hist.get("queries_warm"), dict) and hist["queries_warm"]:
                return hist["queries_warm"]
        except Exception:
            pass
    files = sorted(glob.glob(os.path.join(_repo_dir(), "BENCH_r*.json")))
    if not files:
        return {}
    try:
        doc = json.load(open(files[-1]))
        if "queries_warm" in doc:
            return doc["queries_warm"]
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and "queries_warm" in parsed:
            return parsed["queries_warm"]
        return _warm_from_truncated_tail(doc.get("tail", ""))
    except Exception:
        pass
    return {}


def compact_record(out: dict, budget: int = 1800) -> dict:
    """Last-line summary sized for the driver's ~2000-byte stdout tail.

    The driver's BENCH_r{N}.json keeps only the final ~2000 bytes of
    bench stdout and json-parses the last line; the complete record's
    single line has exceeded that since r02 (every BENCH_r{02..11}.json
    shows "parsed": null), so the judge-visible artifact carried no
    usable numbers and everyone fell back to bench_history/. bench.py
    now prints the complete line FIRST (tail recovery and the in-repo
    history keep the full per-query record) and this compact line LAST:
    headline totals + as many slowest-first per-query timings as fit the
    byte budget, plus a pointer to the complete history file.
    """
    warm = out.get("queries_warm", {})
    rec = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {},
        # same subset of keys, warm timings — keeps _warm_from_truncated_tail
        # returning a VALID (partial) warm object if it ever runs on this
        # line's tail, instead of scraping cold times and scalar fields.
        "queries_warm": {},
        "total_warm": out.get("total_warm"),
        "sf": out["sf"],
        "cpus": out.get("cpus"),
        "n_queries": len(out.get("queries", {})),
        # 3-digit placeholder so the sizing loop reserves its width
        "queries_omitted": 999,
        "queries_note": "slowest-first subset; complete per-query record in history_file",
        "reference": out.get("reference", {}),
        "sched_floor_s": out.get("sched_floor_s"),
        # the two smallest VERDICT-r13-#5 pressure signals ride the
        # compact line; the full per-query gc/heap record stays in the
        # history file
        "probe_traj_s": (out.get("pressure") or {}).get("probe_traj_s"),
        "gc_total_s": (out.get("pressure") or {}).get("gc_total_s"),
    }
    if "history_file" in out:
        rec["history_file"] = out["history_file"]
    items = sorted(out.get("queries", {}).items(), key=lambda kv: (-kv[1], kv[0]))
    for k, v in items:
        rec["queries"][k] = v
        if k in warm:
            rec["queries_warm"][k] = warm[k]
        if len(json.dumps(rec)) > budget:
            del rec["queries"][k]
            rec["queries_warm"].pop(k, None)
            break
    rec["queries_omitted"] = rec["n_queries"] - len(rec["queries"])
    return rec


def main() -> None:
    from osmapreduceproject_spark.queries import QUERIES
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)
    # Warm the JVM + file listing once so per-query numbers measure the
    # queries, not first-touch costs.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    from osmapreduceproject_spark.plans.inspect import release_intermediates

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    # VERDICT r13 #5 instrumentation: the in-suite warm inflation has
    # recurred two rounds (suite geomean ~1.1× while every isolated
    # rerun minimum sits at baseline on unchanged censuses). These
    # counters separate the hypotheses mechanically: a climbing probe
    # trajectory / GC share / persistent-RDD count = pressure
    # accumulating ACROSS the suite; flat counters + inflated totals =
    # suite-external (host) interference.
    gc_ms: dict[str, int] = {}
    probe_traj: list[float] = []
    heap_traj: list[int] = []
    rdd_traj: list[int] = []
    gc0_run = _jvm_gc_ms(spark)
    for qi, name in enumerate(BENCH_QUERIES):
        # probe at qi % 25 == 1, not 0: a probe at position 0 executes
        # q01 immediately before q01's own cold measurement and warms
        # page cache/JIT under the cold canary (ADVICE r14)
        if qi % 25 == 1:
            probe_traj.append(pressure_probe(spark, SF_DIR, QUERIES))
            heap_traj.append(_jvm_heap_mb(spark))
            rdd_traj.append(_n_persistent_rdds(spark))
        gc0 = _jvm_gc_ms(spark)
        fn = QUERIES[name].fn
        # cold: includes plan build + codegen compile (what a one-shot job pays)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        release_intermediates()
        # warm: steady-state execution (what the Nth run of a recurring
        # job pays) — min of two runs, damping same-machine load jitter
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # reclaim executor storage between queries: persisted operator
            # intermediates (LSH buckets, sorted runs, token sets) are
            # per-invocation, not cross-query state
            release_intermediates()
        warm[name] = round(best, 3)
        gc_ms[name] = _jvm_gc_ms(spark) - gc0
    probe_traj.append(pressure_probe(spark, SF_DIR, QUERIES))
    heap_traj.append(_jvm_heap_mb(spark))
    rdd_traj.append(_n_persistent_rdds(spark))
    gc_total_s = round((_jvm_gc_ms(spark) - gc0_run) / 1000.0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    prev = previous_round_warm()
    import glob as _glob

    have_prev_bench = bool(
        _glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))
    )
    # Self-check (VERDICT r3 finding #1): a prior BENCH file with an empty
    # parse means the regression flagger is blind — surface it, don't mask it.
    prev_parse_ok = bool(prev) or not have_prev_bench
    regressions = {
        name: {"warm": warm[name], "prev_warm": prev[name]}
        for name in warm
        if name in prev
        and prev[name] > 0.2
        and warm[name] > prev[name] * 1.2
        and warm[name] - prev[name] > 0.3  # damp sub-second jitter
    }
    # Close every flag with recorded evidence, not prose (VERDICT r6 #6):
    # each flagged query gets the 6-run isolated protocol in THIS session
    # and the result is embedded next to the flag. Interpretation key:
    # rerun.min at/below prev_warm with an unchanged census = load;
    # rerun.min persistently above on a changed census = real.
    for name in regressions:
        regressions[name]["rerun"] = rerun_protocol(spark, name, runs=6)
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_warm": warm,
        "total_warm": round(sum(warm.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "warm_regressions_vs_prev_round": regressions,
        "prev_round_warm_parse_ok": prev_parse_ok,
        "prev_round_warm_count": len(prev),
        "notes": (
            "warm times since r02 release per-invocation operator caches between "
            "runs (plans.inspect.release_intermediates), so every run recomputes "
            "honestly; r01 'warm' numbers for cache-using queries (q31, conf_sort) "
            "reused blocks leaked by the cold run and understate steady-state cost. "
            "q02's warm increase is the range-partitioned ranked sort replacing the "
            "single-partition window (scale-safe plan, more fixture-scale overhead). "
            "q05's r02 flag (1.56->2.03s) was investigated r03: 6 back-to-back runs "
            "span 1.64-1.95s with an unchanged all-broadcast plan (4 "
            "BroadcastHashJoin, 0 SortMergeJoin) - same-machine load jitter, not a "
            "plan change. q01's r03 flag (1.078->1.422s, masked by the then-broken "
            "tail parser, fixed r04) was investigated r04 with the same protocol "
            "(tools/rerun_query.py): 6 back-to-back runs span 0.893-1.345s (min "
            "BELOW the r02 number) on the unchanged scan->partial-agg->final plan "
            "(1 Exchange, 0 joins, 0 SinglePartition) - load jitter, closed. "
            "q102_minhash_xxhash is q31 on the production xxhash64 "
            "hash family; the md5/xxhash64 delta is the cross-engine oracle "
            "determinism tax q31 pays. r04 added q107/q108 to the headline set; "
            "r05 adds q109, q110, q113, q114 (star components - the new "
            "iterative path), q115 (second ranked_sort consumer), and q116 - "
            "subtract those six for like-for-like totals vs r04. r05 "
            "investigation (same protocol as q01/q05): a q31/q102 uptick in one "
            "r05 run was re-checked with tools/rerun_query.py - 6 back-to-back "
            "q31 runs span 1.51-2.49s with min at the r04 level on an unchanged "
            "plan census (3 BroadcastHashJoin, 0 SortMergeJoin, 0 "
            "SinglePartition; an earlier same-code r05 run measured 1.49s) - "
            "load jitter, closed. q116's r05 8.2s first timing was REAL (narrow "
            "signal map ran on one partition) and was fixed by fan_out: 1.5s. "
            "Second r05 investigation after the headline set grew to 40 "
            "queries: q83/q107/q102 upticks in the longer run all returned to "
            "their baseline mins on 6 isolated reruns (q83 0.74, q107 0.87, "
            "q102 1.62) with unchanged plan censuses - cross-query cache/GC "
            "interference in the longer suite, not plan regressions. Final r05 record: per-run flags see-saw across different queries while 6-run isolated minima stay at baseline on unchanged plan censuses every time (q31 1.32, q34 0.50, q63 0.71, q61 1.03, q119 1.22). "
            "r06 adds q132/q133/q136/q143/q150/q156-q158 to the headline set "
            "(VERDICT r5 #3) - subtract those eight for like-for-like totals "
            "vs r05. r06 also threads the max_df=5 hot-shingle cap through "
            "q113/q157/q158: their pair machinery now anti-filters "
            "boilerplate shingles before the inverted-index self-join, so "
            "small deltas on those three are a plan change (capped "
            "candidates), not jitter. r06 investigation: q113's first capped "
            "timing (3.3-4.1s vs 1.76 r5) was REAL - the df groupBy + "
            "anti-join re-ran per index consumer - fixed by persisting the "
            "capped index (6-run median 2.6s, min 1.98s); the residual over "
            "r5 is the cap's one extra index aggregation, the price of the "
            "100TB safety bound, not a regression. Remaining r06 flags "
            "(q31/q102/q32/q61/q66) were re-checked with 6-run isolated "
            "minima: q31 1.70, q102 1.86, q32 1.30, q61 1.32, q66 1.04 - "
            "all near r5 levels on unchanged plan censuses (q66's census "
            "verified bit-identical before/after the ivf_assign refactor); "
            "a uniform few-hundred-ms session-wide offset, load not plans. "
            "Final r06 record flags (q02/q108/q117): q02 6-run min 0.686s "
            "is BELOW r5's 0.844 (jitter, closed); q117's census was "
            "diffed against the pre-round dedup.py (6 BroadcastHashJoin, "
            "0 SortMergeJoin, identical) - the offset is the same session "
            "noise, corroborated by the reference C++ re-timing this "
            "session (see the reference field of the r06 record: "
            "ref_sort_total_ms 23 in the final driver run) vs 3ms in r5 "
            "on identical binaries. "
            "r07 adds q159-q168 (the r6-new cohort, VERDICT r6 #5) and the "
            "nine r7-new queries q169-q177 to the headline set - subtract "
            "those nineteen for like-for-like totals vs r06. q177 is the "
            "end-to-end curate_corpus pipeline (MinHash pairs + iterative "
            "connected components + six stage counts in one timing) - "
            "expect it among the most expensive entries by construction; "
            "q171 runs the multi-pass exact-percentile protocol (driver-"
            "side histogram loop), so its timing counts several small "
            "jobs, not one query. Since r07, every >20% warm flag carries "
            "an embedded 'rerun' block (6-run isolated minima + plan "
            "census) generated in-session by bench.rerun_protocol - flags "
            "are closed by recorded evidence, not prose (VERDICT r6 #6). "
            "Late-r7 plan change: the connected-components convergence "
            "probe folded into the label-update pass (one fewer "
            "label-frame join per iteration) - small deltas on the CC "
            "lineage (q92/q111/q150/q177) are that change, not jitter. "
            "r08 adds the 35 r8-new declarations q178-q212 to the "
            "headline set (VERDICT r7 #3) - subtract those thirty-five "
            "for like-for-like totals vs r07. Expected-expensive by "
            "construction among them: q199 (CUSUM fold over the full "
            "resample grid), q203 (exact + IVF top-k, two retrieval "
            "pipelines in one timing), q196 (ranked_sort index build), "
            "q179 (capped pair generation). q206 runs the multi-pass "
            "exact-percentile cutoff like q171 - several small jobs in "
            "one timing. "
            "r09 adds the 28 r9-new declarations q213-q240 to the "
            "headline set (VERDICT r8 #3) - subtract those twenty-eight "
            "for like-for-like totals vs r08. Expected-expensive by "
            "construction among them: q221 (5 pagerank rounds over the "
            "Jaccard dup graph - edge generation + iteration in one "
            "timing), q213/q214 (full resample grids; q214 adds two "
            "exact per-key medians), q234 (Holt fold, the q187/q199 "
            "family), q218 (two resample grids + slot join), q235 "
            "(grid-decomposed interval join), q226 (two as-of passes "
            "joined). q239/q240 are sub-second narrow pipelines. The "
            "series-family folds gained a max_slots guard this round - "
            "a scalar assert in the fold input, no plan-shape change; "
            "q187/q199/q208 deltas beyond jitter would be real. q133 is "
            "under explicit watch (VERDICT r8 finding #2): if its 6-run "
            "minimum exceeds 1.97s again on an unchanged census, treat "
            "as a real banded-hamming regression, not load. "
            "r10 adds the 11 r10-new declarations q241-q251 to the "
            "headline set (VERDICT r9 #6) - subtract those eleven for "
            "like-for-like totals vs r09. r10 root-cause pass on the "
            "persistent-minimum set (VERDICT r9 #4, quiet host, load "
            "~1.0, unchanged testdata/plans/code): q116 min 1.655 AT its "
            "r8 1.636 (closed); q117 min 2.445 (+14%, inside jitter); "
            "q183 SEE-SAWS across sessions (r9 rerun min 0.949 at "
            "baseline, r10 quiet-host min 1.579) - classic host-state, "
            "closed; q61 min 1.333 (+21% vs r8 warm 1.105) and q182 min "
            "1.939 (+34% vs r8 1.45, third consecutive session above "
            "1.9) PERSIST on bit-identical censuses with reference C++ "
            "re-timing unchanged and ~0.6% avg steal - consistent with a "
            "host-level per-stage overhead shift that taxes "
            "many-small-stage fixture queries (q182 runs 11 exchanges + "
            "5 one-row calibration stages) and is invisible to big-scan "
            "entries. The sched_floor_s probe (this round) records a "
            "fixed 24-tiny-stage pipeline per run so future offsets of "
            "this class are attributed against the probe's delta, not "
            "re-argued; q182/q61 stay on watch - a census change or a "
            "drift WITHOUT a matching probe drift is real. "
            "r11 adds the 23 r11-new declarations q252-q274 to the "
            "headline set (VERDICT r10 #4) - subtract those twenty-three "
            "for like-for-like totals vs r10. Expected-expensive by "
            "construction among them: q266 (band candidates + per-left "
            "kNN rank window over every purchase-click pair within 30s), "
            "q264 (conversion-touch lookback pairing + three "
            "per-conversion windows), q252 (doubled-midrank machinery "
            "like q249), q258 (connected components to fixpoint), q274 "
            "(bounded horizon explode on the collapsed user-day frame); "
            "the three multimodal QC entries (q260/q261/q268) and q247 "
            "are fixture-scale - their timings are mostly Arrow "
            "mapInPandas spin-up, not data. "
            "r12 adds the 12 r12-new declarations q275-q286 to the "
            "headline set (SURVEY r12 map) - subtract those twelve for "
            "like-for-like totals vs r11. Expected-expensive by "
            "construction among them: q280/q281 (full resample grid + "
            "per-position moments / 3-lag quantized ACF - the q246 "
            "family), q282 (interval cell explode + anti cell join, the "
            "q241 machinery), q283 (16-centroid broadcast scoring over "
            "every embedding + per-vector top-2); q284/q285 are "
            "fixture-scale Arrow spin-up; q275-q278/q286 are "
            "single-scan scalar reports. "
            "r12 watch-list closure (VERDICT r10 item, quiet-host run): "
            "q182 1.562 / q61 1.095 (AT its r8 1.105 baseline) / "
            "q214 1.363 / q216 1.02 / q35 3.583 - all at-or-below r11 "
            "warm; the r9-r11 'persistent minimum' class closes as "
            "host-state. q113_corpus_report: r11's 1.696 was the FAST "
            "outlier (r10 record 2.6-2.7; both r12 runs 2.32-2.36 rerun "
            "minima) on a bit-identical census (7 BroadcastHashJoin / 26 "
            "Exchange / 2 one-row SinglePartition) - returned to the r10 "
            "baseline, closed. Method note: an r12 first pass started "
            "minutes after a 27-min pytest suite ended and read geomean "
            "1.096 vs r11; the quiet rerun reads 1.035 with every flag's "
            "6-run minimum at-or-below its r11 warm except the q113 case "
            "above - suite-adjacent load, not plans. The sched_floor "
            "probe itself swung 1.304/1.968 across the two r12 runs "
            "(r11: 1.716): treat single-probe deltas under ~50% as noise; "
            "only a probe shift CORROBORATED by many-small-stage queries "
            "moving together is evidence. "
            "r13 adds the 12 r13-new declarations q287-q298 to the "
            "headline set (SURVEY r13 map) - subtract those twelve for "
            "like-for-like totals vs r12. Expected-expensive by "
            "construction among them: q291 (TWO LOCF resample grids "
            "joined on the slot lattice + one 7-lag per-user window - "
            "roughly double the q246/q281 grid cost), q288 (per-block "
            "k-by-k integer cell compare), q297 (brute all-pairs cosine "
            "rank - the q34 shape at 640 sf0.1 vectors), q292/q293 "
            "(full token explodes); q294/q295/q296 are fixture-scale "
            "Arrow spin-up; q287/q289/q290 are value-level scans. "
            "r13 watch-list disposition (VERDICT r12 #6): q132/q113 "
            "closed as host-state if their quiet minima return to "
            "2.3/2.25 on unchanged censuses without a matching "
            "sched_floor drift; see this run's rerun blocks. "
            "r14 adds the 19 r14-new declarations q299-q317 plus the "
            "VERDICT-r13-#2 closer q338_knn_graph_ann to the headline "
            "set (SURVEY r14 map) - subtract those twenty for "
            "like-for-like totals vs r13. Expected-expensive by "
            "construction among them: q304/q312/q316 (full per-user "
            "resample grids - the q246 family; q312 stacks 4 block "
            "sizes on the grid), q300 (bounded per-user Arrow pair "
            "compare), q308 (the banded-LSH cluster path). q338 is the "
            "DIRECT comparator for q297: same graph stats, LSH bucket "
            "edges instead of brute all-pairs. "
            "r15 contains q297's standing cost (VERDICT r14 #4): the "
            "brute baseline now grades over the documented vec_id%3==0 "
            "sub-corpus (~1/9 the pair work - expect ~35 s -> low "
            "single digits, NOT a host effect), the r15 window adds the "
            "20 staged declarations q318-q337 (subtract those for "
            "like-for-like vs r14; the Arrow multimodal six are "
            "fixture-scale spin-up, q329/q335 are the brute-pair and "
            "codebook-encode embedding scans, the rest are value-level "
            "cell scans), and the first pressure probe moved from suite "
            "position 0 to 1 so the q01 cold canary is no longer "
            "probe-warmed (ADVICE r14 - expect a one-time q01 cold "
            "step-up vs r14, not a regression)."
        ),
        "reference": reference_timings(),
        "sched_floor_s": sched_floor_probe(spark),
        # VERDICT r13 #5: the in-suite pressure counters. probe_traj is
        # a fixed q01 warm run timed every 25 suite positions (plus one
        # final) — flat trajectory + inflated totals = suite-external
        # interference; a monotone climb = accumulating JVM pressure
        # (then read gc_ms_per_query / heap_mb_traj / persistent_rdd_traj
        # for the mechanism).
        "pressure": {
            "probe_traj_s": probe_traj,
            "heap_mb_traj": heap_traj,
            "persistent_rdd_traj": rdd_traj,
            "gc_total_s": gc_total_s,
            "gc_ms_per_query": gc_ms,
        },
    }
    # Complete in-repo record for next round's flagger (never truncated).
    this_round = _latest_driver_round() + 1
    hist_path = write_history(out, this_round)
    if hist_path:
        out["history_file"] = os.path.relpath(hist_path, _repo_dir())
    # Complete record first (recoverable from the tail + mirrored in the
    # history file), then the compact line LAST so the driver's truncated
    # tail parse finally succeeds (see compact_record's docstring).
    print(json.dumps(out))
    print(json.dumps(compact_record(out)))
    spark.stop()


if __name__ == "__main__":
    main()
