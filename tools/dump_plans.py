#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The 100 TB argument is made on plans, not vibes — this artifact lets a
reviewer see pushed filters, pruned schemas, broadcast exchanges, partial
aggregation, and the absence of single-partition funnels without running
anything. Regenerate after plan-affecting changes:

    python tools/dump_plans.py            # writes PLANS.md at repo root

Plans are ANALYZED (not executed); AQE runtime re-plans are therefore not
shown — tests/test_plans.py asserts those live.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Queries whose plan shape carries the scale argument.
PLAN_QUERIES = [
    "q01_pricing_summary",   # partial agg before exchange, pushed filter
    "q02_global_sort",       # rangepartitioning + broadcast offsets, NO SinglePartition
    "q04_filter_project",    # PushedFilters + pruned ReadSchema
    "q05_region_revenue",    # broadcast dims
    "q21_topk_per_group",    # WindowGroupLimit
    "q24_asof_join",         # union+window, no nested loop
    "q31_minhash_lsh_pairs", # equi-join candidates, persisted buckets
    "q35_embedding_neardup", # LSH buckets, no cartesian
    "q77_min_cost_supplier", # decorrelated min-over-window, broadcast dims
    "q95_sequence_packing",  # sharded window, no global sort
    "q107_boilerplate_removal",  # derived stoplist applied as broadcast array row
    "q108_unigram_logprob",  # broadcast unigram model, corpus shuffles once
    "q113_corpus_report",    # two aggregations joined as broadcast single rows
    "q117_cross_decontamination",  # cross-side band-bucket equi-joins, no corpus x probe
    "q118_source_caps",      # WindowGroupLimit: local top-cap before the exchange
    "q116_filter_report",    # fanned signal map + broadcast contamination probe
    "q121_quality_quartiles",  # per-stratum parallel NTILE, no global sort
    "q124_retention_cohorts",  # user-keyed agg + join reusing the same partitioning
    "q125_pq_topk",          # broadcast codebook encode + ADC lookup join, no all-pairs
    "q126_dup_spans",        # positional shingle df join-back + per-doc islands window
    "q157_dedup_threshold_curve",  # max_df cap: broadcast anti-join before the pair join
    "q160_split_leakage",    # capped pair machinery + split-label joins, <=6-row final
    "q165_chunk_neardup",    # chunk reassembly + banded LSH equi-joins, no all-pairs
    "q167_late_supplier_blame",  # Q21 shape as one orderkey pipeline, TakeOrdered final
    "q168_minhash_calibration",  # one persisted signature frame banded + scalar final
    # r7 additions — the declared r7-ready operators with a plan story
    "q169_semantic_dedup",   # cid equi-join pairs from broadcast quantizer, no all-pairs
    "q170_fuzzy_entity_match",  # broadcast anti-join hot-block cap before the self-join
    "q173_bigram_quality",   # pruned bigram model join; unigram/total broadcast
    "q174_lang_consistency", # narrow array-slice chunking, bounded (doc,lang) aggs
    "q175_event_paths",      # sessionize + lead chain share one user exchange; TakeOrdered
    "q176_cdc_compaction",   # one key-partitioned row_number, no join back
    # r8 additions — the declared r8 tranche's plan stories
    "q179_containment_pairs",  # max_df broadcast anti-join cap before the pair join
    "q180_cms_heavy_hitters",  # depth x width sketch broadcast into the audit join
    "q182_bloom_prejoin",    # one-row bitset via BroadcastNestedLoop, fact never shuffles
    "q184_series_trend",     # grid-union resample + one user-keyed moment agg
    "q194_hll_audit",        # 1024 register rows; partial-combined register maxima
    "q196_negative_sampling",  # ranked_sort range shuffle + dense-index equi-join
    "q203_ann_recall_gate",  # exact + IVF pipelines joined on query_id, no all-pairs
    "q212_merged_schema_read",  # two-footer union read, metadata-bound listing
    # r9 additions — the declared r9 tranche's plan stories
    "q213_resample_ffill",   # grid union + ONE key-partitioned fill window
    "q221_pagerank_dup_graph",  # per-round src join + dst agg, persisted rank vector
    "q222_weighted_sample",  # Efraimidis-Spirakis TakeOrderedAndProject heap
    "q231_ks_drift",         # ECDF prefix sums via broadcast offsets, no 1-partition sort
    "q233_hist_quantile_audit",  # 64-key histogram agg + exact-quantile audit join
    "q235_interval_overlap_join",  # cell-explode equi join, NO cartesian
    "q239_scene_changes",    # Arrow dHash map; only (video,idx,hash) enter the window
    "q240_upsert_replay_compaction",  # chained key-partitioned row_number folds
    # r10 tranche plan-shape carriers:
    "q241_point_in_interval_join",  # interval cell-explode + point-cell EQUI join
    "q245_ngram_novelty",    # distinct-gram sides, gram-keyed membership join
    "q246_series_autocorrelation",  # ONE key window for all lags, no self-join
    "q249_spearman_corr",    # doubled-midrank maps, broadcast-offset prefix sums
    # r11 tranche plan-shape carriers:
    "q259_epsilon_band_join",  # 3-cell explode, EQUI hash join — no cartesian
    "q266_knn_band_join",    # band candidates + per-left bounded rank window
    "q272_late_arrival_report",  # ranged prefix-max watermark, no single partition
    "q274_active_user_rollup",  # user-day collapse BEFORE the horizon explode
    # r12 tranche plan-shape carriers:
    "q279_max_concurrency",  # endpoint explode + per-key running sum, no global sort
    "q282_coverage_gap_join",  # grid-bucketed LEFT ANTI, no cartesian
    "q283_silhouette_report",  # broadcast 16-row centroid frame, narrow scoring
    "q280_seasonal_decompose",  # per-(key,pos) moment collapse + bounded fold
    "q289_benjamini_hochberg",  # value-level ranged cumsum, NO global sort
    "q291_lagged_crosscorr",  # two LOCF grids + ONE 7-lag per-key window
    "q295_freeze_detect",  # Arrow checksum decode; only triplets shuffle
    "q297_knn_graph_stats",  # broadcast brute scoring + bounded per-query rank
    "q298_lsh_bucket_stats",  # band-bucket groupBy over LSH signatures
    # r14 tranche plan-shape carriers:
    "q299_kaplan_meier",  # TWO ranged cumsums, no data-carrying single partition
    "q304_periodogram",  # resample grid + quantized trig terms, key-partitioned
    "q311_partial_correlation",  # ONE 9-moment scan, no join/window
    "q312_hurst_exponent",  # (key,w,block)-partitioned windows + 4-pt OLS
    "q315_bootstrap_diff_ci",  # 16 replicates in ONE scan node
    "q317_cohort_ltv",  # cohort-level cells + cohort-partitioned window
    "q338_knn_graph_ann",  # LSH bucket equi-join edges — NO cartesian/NLJ
]


def main() -> None:
    from osmapreduceproject_spark.plans.inspect import explain_str, release_intermediates
    from osmapreduceproject_spark.queries import QUERIES
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", cpus=4, shuffle_partitions=8)
    out = [
        "# PLANS — headline physical plans (generated)",
        "",
        f"Generated by `python tools/dump_plans.py` at sf_dir=`{SF_DIR}`.",
        "Do not edit by hand; regenerate after plan-affecting changes.",
        "",
        "Reading the scale invariant: `Exchange SinglePartition` is a",
        "defect only when it carries DATA (a global sort or unaggregated",
        "rows through one task — none here, see q02's range-partitioned",
        "sort). Every occurrence below is the partial →",
        "final step of global aggregates building single-row results: the",
        "exchange moves one pre-aggregated row per input partition, the",
        "correct and unavoidable shape for a scalar/one-row output.",
        "This reclassification is ENFORCED, not just asserted in prose:",
        "generation fails (and tests/test_plans.py fails) if any headline",
        "plan gains a SinglePartition exchange whose child is not a",
        "partial aggregate (plans.inspect.data_carrying_single_partitions).",
        "",
    ]
    from osmapreduceproject_spark.plans.inspect import data_carrying_single_partitions

    for name in PLAN_QUERIES:
        spec = QUERIES[name]
        df = spec.fn(spark, SF_DIR)
        plan = explain_str(df, "formatted")
        bad = data_carrying_single_partitions(df)
        release_intermediates()
        if bad:
            raise RuntimeError(
                f"{name}: data-carrying Exchange SinglePartition (child={bad}) — "
                "fix the plan before regenerating PLANS.md"
            )
        out += [f"## {name}", "", spec.doc.strip(), "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print(f"wrote PLANS.md ({len(PLAN_QUERIES)} plans)")


if __name__ == "__main__":
    main()
