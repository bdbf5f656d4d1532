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
        # round-9 rotation (r8 went 49/50: every green non-anchor slot
        # except five deliberate keepers rotated out — each demotion is
        # r8-green on record in CORRECTNESS_r08.json, asserted below.
        # stats_psi_drift stays a THIRD round carrying the r9 forensic
        # fix: the oracle's bare sum(CASE...) was a DuckDB HUGEINT,
        # float64 under a pandas/arrow driver fetch vs Spark's int64 —
        # now CAST AS BIGINT, and tools/gate.py scans every oracle for
        # the class. All 28 remaining never-driver-checked queries
        # enter, so a green r9 completes 293/293 driver-checked-ever.)
        "stats_psi_drift",
        # the four r8 real decoders
        "multimodal_decode_png", "multimodal_decode_gif",
        "multimodal_decode_bmp", "multimodal_decode_avi",
        # never-checked tails
        "sim_topk_filtered", "sim_cluster_profile", "sim_jl_project",
        "dedup_cluster_size_report", "dedup_incremental_novelty",
        "asof_click_to_next_view",
        # the two r9 sketch promotions (rows-only → portable oracles)
        "approx_distinct_stats", "stats_hll_users_per_type",
        "stats_pareto_cutoffs", "stats_ab_ttest",
        "stats_top_types_sketch", "stats_price_histogram",
        "stats_argminmax_orders", "global_index_orders",
        "map_status_counts", "privacy_k_anonymity",
        "curation_badwords_gate", "curation_line_dedup",
        "curation_dup_ngram_fraction", "curation_active_learning",
        "curation_unigram_logprob", "curation_boilerplate_ngrams",
        "corpus_version_diff", "decontaminate_fraction",
        # re-confirmation slots: r9 oracle-CAST edits + code-touched
        # compositions + the sketch family + diverse representatives
        "text_bpe_encode_stats", "privacy_dp_noised_counts",
        "dq_expectations_panel_approx", "sim_mmr_from_ivf",
        "words_total_tokens", "stats_hll_portable",
        # the nine queries BORN in r9 (never-checked queries enter the
        # window the round they are born, keeping the parity story
        # complete; they displaced nine driver-green re-confirms —
        # q18, eval_ranking_ndcg, multimodal_image_ahash_neardup
        # r8-green, curation_gopher_gate r7+r8-green,
        # streaming_dedup_watermark r4+r8-green, dedup_minhash_lsh
        # multi-round-green, stats_quantile_sketch r5+r8-green,
        # events_hll_sliding_users r8-green, and text_quality
        # multi-round-green; multimodal keeps nine in-window siblings,
        # curation six, dedup two, streaming two, sketches three, text
        # keeps text_bpe_encode_stats)
        "streaming_psi_monitor", "streaming_zip_ingest",
        "multimodal_decode_tiff",
        "multimodal_decode_jpeg", "multimodal_mp3_frame_walk",
        "multimodal_mp4_box_walk",
        "source_zip_shards", "source_tar_shards",
        "source_targz_shards",
        "q1_pricing_summary",
        "training_pack_greedy",
        "graph_kcore",
        "recsys_item_similar_topk",
        "func_arabic_tokenize",
    }
    assert must_be_checked <= set(CHECKED_FIRST)
    # every name demoted in the r9 rotation must carry an r8 driver-green
    # record — the rotation invariant (checked across ALL committed
    # CORRECTNESS files by tools/parity_ledger.py; pinned here for r9)
    r9_demotions = {
        "func_array_library", "dq_expectations_panel",
        "events_velocity_gate", "split_temporal_holdout",
        "privacy_t_closeness", "text_heaps_law",
        "eval_minhash_calibration", "recsys_eval_hitrate_loo",
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
    import json
    import os

    r8 = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r08.json"))
    )
    for name in r9_demotions:
        rec = r8.get(name)
        assert rec and rec["rows_match"] and rec["hash_match"], (
            f"demoted without driver-green: {name}"
        )


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
        # same mergeability proof for the PSI drift monitor (r9)
        frozenset({"stats_psi_drift", "streaming_psi_monitor"}),
    }
    by_oracle = defaultdict(list)
    for n, s in REGISTRY.items():
        if isinstance(s.oracle, str):
            by_oracle[s.oracle.strip()].append(n)
    shared = {frozenset(v) for v in by_oracle.values() if len(v) > 1}
    assert shared <= allowed, f"unexpected shared oracles: {shared - allowed}"


def test_rows_only_queries_are_the_documented_exceptions():
    """Every registry query must carry an oracle. r9 promoted the last
    two rows-only entries (approx_distinct_stats,
    stats_hll_users_per_type) onto the portable md5-HLL / fixed-grid
    histogram sketches, so the registry is now 100% oracle-backed; the
    native-sketch forms live on as unregistered *_native twins. A new
    oracle-less query should be a deliberate decision, not a missed
    field."""
    from python_multiproc_bigdata_spark.registry import REGISTRY

    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only == set()


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
