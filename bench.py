"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization,
no column-pruning shortcut a bare count() would allow). One warmup query
first so JVM/codegen startup isn't billed to the first entry.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Full per-query artifact (stdout carries only the compact aggregate
# line — see main()); module-level so tests can redirect it to a tmp dir.
BENCH_FULL_PATH = Path(__file__).resolve().parent / "BENCH_FULL.json"

HEADLINE = [
    "words_pipeline",
    "words_total_tokens",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "part_supplier_join",
    "window_top3_orders",
    "events_sessionize",
    "events_tumbling_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_lsh_banded",
    "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
    "sim_topk_sq8",
    "sim_topk_sq8_ivf",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    "sim_knn_classify",
    "sim_neardup_cosine",
    "training_mix_by_lang",
    "training_pack_chunks",
    "training_pack_greedy",
    "curation_repetition_signals",
    "decontaminate_train_eval",
    "text_quality",
    "text_lang_id",
    "multimodal_features",
    "asof_click_to_view",
    "range_join_close_events",
    "udaf_median_acctbal",
    "dq_check_orders",
    "calendar_month_order_counts",
    "stats_price_histogram",
    "global_index_orders",
    # round-4 layout/graph/analytics additions
    "zorder_lineitem_layout",
    "bloom_filtered_join",
    "dedup_edit_distance_blocked",
    "events_funnel_conversion",
    "events_hierarchical_rollup",
    "curation_pagerank_quality",
    "events_props_variant",
    "stats_top_types_sketch",
    # continuation-session additions: LM-gate upgrade, path analytics,
    # weighted sampling, graph census, layout evidence, hybrid retrieval
    "curation_bigram_logprob",
    "events_transition_matrix",
    "events_top_session_paths",
    "events_time_decayed_value",
    "training_weighted_sample",
    "graph_triangle_copurchase",
    "dedup_prefix_filter_jaccard",
    "dedup_source_overlap",
    "dedup_incremental_novelty",
    "stats_ab_ttest",
    "events_anomaly_zscore",
    "text_vocab_coverage",
    "training_contrastive_pairs",
    "layout_skipping_stats",
    "sim_hybrid_rrf",
    "dedup_winnow_pairs",
    "text_pmi_collocations",
    "text_bpe_merges",
    "sim_pca_project",
    "sim_jl_project",
    "events_linear_trend",
    "events_incremental_merge",
    "events_mad_outliers",
    "stats_psi_drift",
    "split_kfold_assign",
    "udaf_trimmed_mean_price",
    "asof_click_to_nearest_view",
    "bloom_pruned_urgent_revenue",
    "sessions_overlap_pairs",
    "cdc_snapshot_asof",
    # round-5 additions: real PPM decode, PII redaction gate, eval metrics
    "multimodal_decode_ppm",
    "curation_pii_redact",
    "eval_langid_f1",
    # late-r5 additions: privacy audit, Gopher gate, cross-corpus
    # duplicated-ngram fraction
    "privacy_k_anonymity",
    "curation_gopher_gate",
    "curation_dup_ngram_fraction",
    "training_shard_manifest",
    "eval_dedup_pr",
    "text_unigram_vocab",
    "text_unigram_fertility",
    # continuation-session additions: binary-quantized ANN, trained
    # classifier gate, MMR serving selection, semantic dedup, DP release
    "sim_topk_binary",
    "curation_quality_classifier",
    "sim_mmr_diversify",
    "dedup_semantic",
    "privacy_dp_noised_counts",
    "eval_tokenizer_compare",
    "corpus_datasheet",
    "stats_countmin_heavy_hitters",
    "stats_hll_portable",
    "eval_binary_recall",
    "eval_ivf_recall",
    "training_domain_reweight",
    # this session's additions: real WAV decode, RAG chunking,
    # substring-span dedup, CCNet tiers, DSIR weights, isotropy panel,
    # attrition report, LPA communities
    "multimodal_decode_wav",
    "text_chunk_sliding",
    "dedup_substring_spans",
    "curation_ccnet_tiers",
    "training_dsir_weights",
    "stats_embedding_isotropy",
    "curation_filter_attrition",
    "graph_community_labelprop",
    # fourth-continuation additions: CF recommender pair, Poisson
    # bootstrap, BFS + link prediction on the co-purchase graph, graded
    # ranking eval, short-time audio features, Holt forecasting, RFM
    "recsys_item_similar_topk",
    "recsys_user_recommend",
    "stats_bootstrap_ci",
    "graph_bfs_levels",
    "graph_link_prediction",
    "eval_ranking_ndcg",
    "multimodal_audio_frames",
    "events_forecast_holt",
    "events_rfm_segmentation",
    "dedup_keep_best_per_cluster",
    "stats_gini_concentration",
    "text_keyphrase_rake",
    "privacy_l_diversity",
    "stats_benford_firstdigit",
    "events_ltv_cohorts",
    "graph_kcore",
    "events_markov_stationary",
    "sim_ivf_incremental_add",
    "events_funnel_latency",
    "events_changepoint_cusum",
    "events_frequent_sequences",
    "events_autocorrelation",
    "events_seasonality_profile",
    "sim_topk_graph_refined",
    "events_attribution_shapley",
    "stats_ks_two_sample",
    "sim_topk_filtered",
    "stats_mannwhitney_u",
    "stats_spearman_corr",
    "dedup_containment",
    "stats_pareto_cutoffs",
    "curation_badwords_gate",
    "events_survival_km",
    "stats_mutual_information",
    "dedup_cluster_size_report",
    "multimodal_resize_ppm",
    "curation_active_learning",
    "recsys_eval_coverage",
    "events_theilsen_trend",
    # r7 additions
    "multimodal_image_ahash_neardup",
    "eval_sq8_ivf_recall",
    "privacy_t_closeness",
    "stats_quantile_sketch",
    "streaming_quantile_monitor",
    "text_heaps_law",
    "eval_minhash_calibration",
    "recsys_eval_hitrate_loo",
    "events_interarrival_profile",
    "dq_expectations_panel",
    # r8 additions: the Expand-free wide-panel scale path and the
    # IVF-fed MMR composition (VERDICT r7 asks #5-#6)
    "dq_expectations_panel_approx",
    "sim_mmr_from_ivf",
    "source_xml_roundtrip",
    # streaming_click_view_left_join is correctness-gated (parity +
    # window) but NOT benched: its 22 s/repeat is fixture re-staging
    # (corpus rewrite + 3 staged micro-batches), not engine work — the
    # same reason most streaming queries stay out of HEADLINE
    "events_hll_sliding_users",
    "split_temporal_holdout",
    "events_velocity_gate",
    # r9 additions: the fifth real image decoder (IFD walk + strips),
    # the baseline-JPEG codec (first lossy decode path), and the MP3
    # frame walker; the PSI drift monitor's batch anchor already
    # benches via the stats family and streaming_psi_monitor stays out
    # of HEADLINE like the other fixture-staging streaming twins
    "multimodal_decode_tiff",
    "multimodal_decode_jpeg",
    "multimodal_mp3_frame_walk",
    "source_zip_shards",
    "source_tar_shards",
    "source_targz_shards",
    "multimodal_mp4_box_walk",
    # r10 additions: the sampled-cutoff scale variants (map-side
    # scoring against broadcast sample-derived quantile cutoffs — the
    # 100 TB form of the two global-NTILE queries; their exact-NTILE
    # siblings already bench via the stats/curation families). The
    # tar.gz streaming twin stays out of HEADLINE like the other
    # fixture-staging streaming queries.
    "events_rfm_segmentation_sampled",
    "curation_ccnet_tiers_sampled",
    # r10: the subsampled-JPEG decode (4:2:0/4:2:2 corpus) and the
    # DCT-domain perceptual near-dup (aHash's spectral sibling)
    "multimodal_decode_jpeg_sub",
    "multimodal_image_phash_neardup",
    "multimodal_audio_snippet_match",
    "multimodal_video_shot_boundaries",
    "eval_mrl_truncation_recall",
    "training_budget_select",
    # r11 additions: the sampled budget-select sibling (broadcast
    # quality-cutoff, the 100 TB form of the exact budget cut) and the
    # MP3 Layer III side-info decode (bit-level, map-only). The
    # incremental pHash twin stays out of HEADLINE like the other
    # fixture-staging streaming queries.
    "training_budget_select_sampled",
    "multimodal_mp3_sideinfo_walk",
    "multimodal_mp3_scalefac_walk",
    "multimodal_decode_png_adam7",
    "source_warc_shards",
    "source_warcgz_shards",
    "curation_url_normalize",
    "curation_robots_gate",
    "crawl_wet_pipeline",
    "text_wordpiece_merges",
    # r12 additions
    "multimodal_mp3_huffman_walk",
    "text_wordpiece_encode",
    "crawl_link_graph",
    "text_bm25_topk",
]

# Queries whose CONFIG deliberately changed this round for quality (not a
# perf regression): bench_compare.py classifies their deltas separately so
# round-over-round diffs distinguish regressions from tradeoffs.
CONFIG_CHANGED: set[str] = {
    # r5: IVF_KMEANS_CFG moved 128 lists/nprobe 32 -> 192/24 — the
    # latency-recall knee from the r5 sweep (SCALE.md): recall@3 0.95
    # held at a 12.5% scan fraction (was 25%), ~11% faster at sf0.1.
    # All three share the config, so all three timings shift together.
    "sim_topk_ivf_kmeans",
    "sim_topk_sq8_ivf",
    "sim_topk_ivfpq",
    # r5: negative draw redesigned from anchors×corpus md5-slice to a
    # broadcast-sized deterministic pool (different negatives by design)
    "training_contrastive_pairs",
    # r11: the last three global-rank stages rewired through
    # with_global_index (bucketed parallel sort + broadcast offsets).
    # The bucketed form runs 3 extra BOUNDED jobs (quantile cuts, bucket
    # stats, eager materialization) — ~1-2 s of fixed overhead at sf0.1,
    # purchased deliberately for the no-SinglePartition-window shape
    # that survives 100 TB (plan-pinned in test_scale_plans.py).
    "stats_gini_concentration",
    "stats_pareto_cutoffs",
    "training_budget_select",
    # r12: the last five unpartitioned-window sites rewired —
    # text_vocab_coverage through with_global_index's bucketed
    # rank+cumsum (same ~1-2 s bounded-jobs overhead as the r11 trio,
    # newly benched this round), text_bm25_topk /
    # stats_countmin_heavy_hitters / events_top_session_paths through
    # orderBy().limit() (TakeOrderedAndProject — expected neutral or
    # faster). Plan-pinned in test_scale_plans.py + the registry-wide
    # guard in test_window_guard.py.
    "text_vocab_coverage",
    "text_bm25_topk",
    "stats_countmin_heavy_hitters",
    "events_top_session_paths",
}


def run_one(spark, name: str, repeats: int = 3, heavy_repeats: int = 5) -> dict:
    """Steady-state timing: median (and min) of `repeats` full
    materializations — the first run on a cold page cache / fresh code
    path can be 2x the steady state, and single-sample deltas proved too
    noisy to compare round-over-round (three sub-second ±11–38% swings in
    r03 were all unreplicated), so the headline number is the median.

    r6 calibrated the 3-repeat noise band at roughly ±30% on IDENTICAL
    code (dedup_containment +29% with a zero diff), so queries whose
    median exceeds 2 s — the ones whose absolute swing dominates the
    round-over-round total — escalate to `heavy_repeats` samples; the
    extra two medians-of-5 measurably tighten the tail without re-timing
    the ~100 sub-second queries."""
    fn = REGISTRY[name].fn
    times = []

    def timed_run() -> float:
        # r12 measurement fix: queries that persist() intermediates
        # leave entries in the SQL CacheManager that are never released
        # (unpersist can't be called on a lazily returned frame, and
        # ContextCleaner does not collect CacheManager entries). Spark
        # plan-matches caches, so a REPEAT rebuilding the identical
        # subtree — or a LATER query sharing one — silently reads the
        # previous run's materialized cache instead of the parquet
        # inputs. Clearing the cache before every timed run guarantees
        # each sample computes end-to-end from parquet (the
        # no-cross-run-caching contract) and keeps the CacheManager from
        # accreting across the 191-query session (plan-match lookups
        # scan every registered entry; storage-memory eviction churn hit
        # late-list queries). Old numbers kept: BENCH_FULL_r12_baseline
        # predates this fix.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _ in range(repeats):
        times.append(timed_run())
    if sorted(times)[len(times) // 2] > 2.0:
        for _ in range(heavy_repeats - repeats):
            times.append(timed_run())
    times.sort()
    return {
        "median": round(times[len(times) // 2], 3),
        "min": round(times[0], 3),
        "n_samples": len(times),
    }


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Console progress bars write \r-frames to stdout that land in the
    # driver's tail capture; keep the tail clean so the final JSON line
    # is the last thing on the stream.
    spark = get_spark(
        app_name="pmb-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in REGISTRY]
    # warmup: small query to absorb JVM/codegen startup
    try:
        REGISTRY[names[0]].fn(spark, SF_DIR).limit(1).collect()
    except Exception:  # noqa: BLE001 — warmup failure is the query's to report
        pass

    # One broken query must never zero the whole artifact (BENCH_r02
    # died entirely on a single AnalysisException): isolate per query,
    # record the error, and ALWAYS emit the JSON line.
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            r = run_one(spark, name)
            timings[name] = r["median"]
            mins[name] = r["min"]
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query map goes to an in-repo artifact: at 73 queries the
    # single JSON line outgrew the driver's ~2 KB tail-capture buffer
    # (BENCH_r04 `parsed: null`, 13 timings truncated away), so stdout
    # carries ONLY a compact aggregate line — printed last and alone —
    # and BENCH_FULL.json keeps the round-over-round comparison data.
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": mins,
        "sf": sf_val,
        "config_changed": sorted(CONFIG_CHANGED & set(timings)),
    }
    if errors:
        full["errors"] = errors
    BENCH_FULL_PATH.write_text(json.dumps(full, indent=1) + "\n")

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_errors": len(errors),
        # r13: the per-query medians are BACK in the one-line JSON — the
        # r11 `"queries": {}` emission blinded the driver's per-query
        # round-over-round and scaling comparisons (PERF_r12 n_common=0,
        # geomean null). 2-decimal rounding + compact separators keep the
        # line ~5.6 KB; full precision (3dp medians + mins + config
        # notes) stays in BENCH_FULL.json.
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "queries_full_artifact": "BENCH_FULL.json",
    }
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
