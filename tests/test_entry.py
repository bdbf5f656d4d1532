"""Driver-contract smoke tests: entry() runs, every queries() entry returns
a DataFrame at sf0.001, and oracle_sql() keys are a subset of queries()."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e
from tests.conftest import SF_DIR


def test_entry_smoke(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "word",
        "word_len",
        "word_truncated",
        "file_path",
        "file_words_count",
    ]


def test_oracle_keys_subset():
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 24


def test_checked_window_is_curated():
    # the driver's correctness gate checks the FIRST 50 registry entries;
    # this pins the curated window (every family driver-verified) so a
    # refactor can't silently push the LLM-pipeline surface past the cap
    from python_multiproc_bigdata_spark.registry import CHECKED_FIRST

    q = list(e.queries())
    assert len(CHECKED_FIRST) == 50
    assert q[:50] == list(CHECKED_FIRST)
    must_be_checked = {
        # the permanent anchor: the reference's flagship ETL spine
        "words_pipeline",
        # round-7 rotation (r6 went 50/50 green, so all 49 non-anchor
        # slots rotated out — every demotion is r6-green on record in
        # CORRECTNESS_r06.json — and 49 never-driver-checked queries
        # entered; swap log in registry/__init__.py)
        "q4_order_priority_exists", "q6_forecast_revenue",
        "q10_returned_items", "q11_important_stock",
        "q12_priority_lines", "q13_customer_distribution",
        "q14_promo_revenue", "q16_supplier_part_counts",
        "q19_discounted_revenue", "q22_global_sales_opportunity",
        "events_attribution_shapley", "events_markov_stationary",
        "events_funnel_latency", "events_changepoint_cusum",
        "events_frequent_sequences", "events_autocorrelation",
        "events_seasonality_profile", "events_survival_km",
        "events_theilsen_trend",
        "stats_ks_two_sample", "stats_mannwhitney_u",
        "stats_spearman_corr", "stats_mutual_information",
        "stats_benford_firstdigit", "stats_psi_drift",
        "text_unigram_vocab", "text_bpe_encode_stats",
        "dedup_cdc_chunks", "dedup_containment", "eval_dedup_pr",
        "sim_topk_graph_refined", "sim_ivf_incremental_add",
        "eval_pq_recall", "eval_binary_recall", "eval_sq8_ivf_recall",
        "func_array_library", "func_string_library",
        "func_null_safe_chain", "func_basename_backwards",
        "func_truncate_flags", "func_format_result",
        "graph_kcore", "recsys_item_similar_topk", "recsys_eval_coverage",
        "curation_gopher_gate", "curation_pii_redact",
        "privacy_l_diversity", "multimodal_resize_ppm",
        "streaming_first_event",
    }
    assert must_be_checked <= set(CHECKED_FIRST)
    # every demoted name must carry a prior driver-green record — the
    # rotation invariant (checked against the committed CORRECTNESS
    # files by tools/parity_ledger.py; spot-pinned here for r6)
    r6_demotions = {
        "func_arabic_tokenize",
        "dedup_keep_best_per_cluster",
        # round-3 promotions (swap log in registry/__init__.py)
        
        
        # round-4 promotions: never-driver-checked tail + the composed
        # SQ8-over-IVF scale plan (sim_topk_ivf / sim_topk_sq8 demoted —
        # their surfaces now carry through sim_topk_ivf_kmeans /
        # sim_topk_sq8_ivf, both full-hash-checked)
        
        
        # late-round-4 promotions (new capability classes; demoted
        # sim_neardup_cosine / quota_sample_per_lang /
        # curation_repetition_signals / training_temperature_mix /
        # dedup_exact are all multiply-driver-green with in-window
        # family siblings — swap log in registry/__init__.py)
        # continuation-session promotions (new capability classes;
        # demoted words_first_position / q1_pricing_summary /
        # events_sessionize / stats_lineitem_moments /
        # training_mix_by_lang are all multiply-driver-green with
        # in-window family siblings — swap log in registry/__init__.py)
        
        
        
        # second-continuation promotions (6 new capability classes;
        # demoted words_duplicate_occurrences / text_quality /
        # streaming_click_view_join / sim_topk_bruteforce /
        # udaf_median_acctbal / dedup_minhash_lsh are all r03-green with
        # in-window family siblings — swap log in registry/__init__.py)
        
        
        # end-of-round-4 promotions (8 never-checked capability classes;
        # demoted profile_documents / sim_knn_classify /
        # training_pack_chunks / decontaminate_train_eval /
        # asof_click_to_view / range_join_close_events /
        # cdc_upsert_customers / semantic_only_neardups are all
        # r03-green with in-window family siblings — swap log in
        # registry/__init__.py)
        "layout_skipping_hilbert",

        # round-5 promotions (16 never-driver-checked queries + the new
        # real-decode class; demotions are all r4-green with in-window
        # family siblings — swap log in registry/__init__.py)
        "q7_volume_shipping", "q9_product_profit", "q15_top_supplier",
        "q20_potential_promotion", "sim_topk_ivfpq",
        "training_contrastive_pairs", "cdc_scd2_user_state",
        "events_session_window", "events_gapfill_hourly",
        "skew_salted_event_counts", "streaming_words_doc_frequency",
        "text_bm25_topk", "multimodal_frame_sample",
        "basket_association_rules", "stats_chi_square_independence",
        "multimodal_decode_ppm",
        # late-r5 continuation rotation: 12 NEW capability classes in,
        # demotions all r04-green with in-window family siblings
        # (cube_orders / curation_bigram_logprob / events_ewma_value /
        # text_pmi_collocations / dedup_edit_distance_blocked /
        # sim_pca_project / calendar_month_order_counts /
        # udaf_trimmed_mean_price / layout_skipping_stats /
        # bloom_pruned_urgent_revenue / events_funnel_conversion /
        # dedup_minhash_lsh_materialized — swap log in
        # registry/__init__.py)
        "sim_topk_binary", "curation_quality_classifier",
        "dedup_semantic", "sim_mmr_diversify",
        "privacy_dp_noised_counts", "eval_tokenizer_compare",
        "corpus_datasheet", "eval_ivf_recall",
        "training_domain_reweight", "streaming_classifier_serving",
        "stats_countmin_heavy_hitters", "stats_hll_portable",
        # third-continuation rotation: 8 NEW capability classes in,
        # demotions all r04-green with in-window family siblings
        # (graph_triangle_copurchase / dedup_winnow_pairs /
        # streaming_transition_counts / text_bpe_merges /
        # sim_topk_sq8_ivf / training_pack_greedy /
        # curation_pagerank_quality / dq_check_orders — swap log in
        # registry/__init__.py)
        "graph_community_labelprop", "dedup_substring_spans",
        "multimodal_decode_wav", "text_chunk_sliding",
        "stats_embedding_isotropy", "training_dsir_weights",
        "curation_ccnet_tiers", "curation_filter_attrition",
        # fourth-continuation rotation: 10 NEW capability classes in;
        # demotions all r04-green (the IVF serving tier's signal now
        # flows through eval_ivf_recall + eval_ranking_ndcg, which
        # compose the identical centroid chain — swap log in
        # registry/__init__.py)
        "recsys_user_recommend", "eval_ranking_ndcg",
        "stats_bootstrap_ci", "graph_bfs_levels",
        "graph_link_prediction", "events_forecast_holt",
        "multimodal_audio_frames", "events_rfm_segmentation",
        "stats_gini_concentration", "text_keyphrase_rake",
    }
    import json
    import os

    r6 = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r06.json"))
    )
    for name in r6_demotions:
        rec = r6.get(name)
        assert rec and rec["rows_match"], f"demoted without driver-green: {name}"


def test_all_queries_run_sf0001(spark):
    for name, fn in e.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_oracle_sql_isolates_generator_failure(monkeypatch):
    # a generated oracle that cannot build must degrade ITS query to
    # rows-only (omitted from the map) without sinking the other oracles
    from python_multiproc_bigdata_spark.registry import REGISTRY
    from python_multiproc_bigdata_spark.registry.common import QuerySpec

    def boom():
        raise RuntimeError("no testdata here")

    spec = REGISTRY["sim_topk_ivf_kmeans"]
    monkeypatch.setitem(REGISTRY, "sim_topk_ivf_kmeans", QuerySpec(spec.fn, boom))
    o = e.oracle_sql()
    assert "sim_topk_ivf_kmeans" not in o
    assert "q1_pricing_summary" in o and len(o) > 100


def test_no_accidental_shared_oracles():
    """A module-level SQL constant defined twice silently swaps oracles
    between queries (bit us with SQL_FUNNEL: two funnel queries ended up
    checked against one SQL). Identical oracle text is only legitimate
    for batch/streaming twins that share semantics by design."""
    from collections import defaultdict

    from python_multiproc_bigdata_spark.registry import REGISTRY

    allowed = {
        frozenset({"streaming_session_counts", "events_session_window"}),
        frozenset({"events_tumbling_window", "streaming_tumbling_counts"}),
        frozenset({"events_sliding_window", "streaming_sliding_counts"}),
        # deliberate: the PPJoin prefix filter is checked against the
        # ALL-PAIRS oracle — sharing the SQL is the point (an
        # algebraic-equivalence proof that prefix filtering is lossless)
        frozenset({"dedup_ngram_jaccard", "dedup_prefix_filter_jaccard"}),
        # deliberate: the materialized-signature LSH serves the SAME
        # answer from a bucketed table — sharing the one-shot oracle IS
        # the materialization-changes-the-plan-not-the-answer proof
        frozenset({"dedup_minhash_lsh", "dedup_minhash_lsh_materialized"}),
        # deliberate: the streaming monitor merges micro-batch partial
        # histograms cell-wise; reading back bit-identically to the
        # one-shot batch sketch IS the mergeability proof
        frozenset({"stats_quantile_sketch", "streaming_quantile_monitor"}),
    }
    by_oracle = defaultdict(list)
    for n, s in REGISTRY.items():
        if isinstance(s.oracle, str):
            by_oracle[s.oracle.strip()].append(n)
    shared = {frozenset(v) for v in by_oracle.values() if len(v) > 1}
    assert shared <= allowed, f"unexpected shared oracles: {shared - allowed}"


def test_rows_only_queries_are_the_documented_exceptions():
    """Every registry query must carry an oracle unless it's one of the
    documented sketch-based exceptions (HLL values are engine-specific;
    the driver's weaker rows-only check is intentional there). A new
    oracle-less query should be a deliberate decision, not a missed
    field."""
    from python_multiproc_bigdata_spark.registry import REGISTRY

    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only == {"approx_distinct_stats", "stats_hll_users_per_type"}


def test_no_shadowed_registry_module_constants():
    """A module-level constant defined TWICE silently replaces the
    first (bit us in r7: a new SQL_INTERARRIVAL clobbered an existing
    query's oracle — the full gate caught the value drift, this catches
    it at test time). Parse each registry module and reject duplicate
    top-level simple assignments."""
    import ast
    import pathlib

    import python_multiproc_bigdata_spark.registry as reg

    pkg = pathlib.Path(reg.__file__).parent
    for f in sorted(pkg.glob("*.py")):
        tree = ast.parse(f.read_text())
        seen: dict = {}
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        assert t.id not in seen, (
                            f"{f.name}:{node.lineno} redefines {t.id} "
                            f"(first at line {seen[t.id]})"
                        )
                        seen[t.id] = node.lineno
