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
        # round-8 rotation (r7 went 48/50: the 47 green non-anchor slots
        # rotated out — every demotion is r7-green on record in
        # CORRECTNESS_r07.json, asserted below — the two r7 REDS stay to
        # prove their hash-stable fixes, and 45 never-driver-checked
        # queries entered; swap log in registry/__init__.py)
        "func_array_library", "stats_psi_drift",
        "sim_mmr_from_ivf", "dq_expectations_panel_approx",
        "dq_expectations_panel", "events_velocity_gate",
        "split_temporal_holdout", "privacy_t_closeness",
        "stats_quantile_sketch", "multimodal_image_ahash_neardup",
        "text_heaps_law", "eval_minhash_calibration",
        "recsys_eval_hitrate_loo", "events_hll_sliding_users",
        "source_xml_roundtrip",
        "streaming_click_view_left_join", "streaming_sliding_counts",
        "streaming_tumbling_counts", "streaming_quantile_monitor",
        "streaming_topk_serving", "streaming_enriched_counts",
        "events_attribution_touch", "events_max_concurrency",
        "events_transition_matrix", "events_top_session_paths",
        "events_time_decayed_value", "events_interarrival_profile",
        "events_anomaly_zscore", "events_linear_attribution",
        "events_props_variant", "events_hierarchical_rollup",
        "events_incremental_merge", "events_mad_outliers",
        "events_daily_active_users", "events_ltv_cohorts",
        "split_stratified_eval", "split_kfold_assign",
        "split_leakage_safe",
        "training_shard_manifest", "training_length_batches",
        "training_source_caps", "training_chunk_windows",
        "training_weighted_sample",
        "text_context_trim", "text_unigram_fertility",
        "text_vocab_coverage", "text_token_entropy",
        "eval_langid_f1", "dedup_source_overlap",
    }
    assert must_be_checked <= set(CHECKED_FIRST)
    # every name demoted in the r8 rotation must carry an r7 driver-green
    # record — the rotation invariant (checked across ALL committed
    # CORRECTNESS files by tools/parity_ledger.py; pinned here for r8)
    r8_demotions = {
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
        "stats_benford_firstdigit",
        "text_unigram_vocab", "text_bpe_encode_stats",
        "dedup_cdc_chunks", "dedup_containment", "eval_dedup_pr",
        "sim_topk_graph_refined", "sim_ivf_incremental_add",
        "eval_pq_recall", "eval_binary_recall", "eval_sq8_ivf_recall",
        "func_string_library",
        "func_null_safe_chain", "func_basename_backwards",
        "func_truncate_flags", "func_format_result",
        "graph_kcore", "recsys_item_similar_topk", "recsys_eval_coverage",
        "curation_gopher_gate", "curation_pii_redact",
        "privacy_l_diversity", "multimodal_resize_ppm",
        "streaming_first_event",
    }
    import json
    import os

    r7 = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r07.json"))
    )
    for name in r8_demotions:
        rec = r7.get(name)
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
