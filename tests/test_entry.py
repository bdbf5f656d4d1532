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
    # this pins the curated window so a refactor can't silently reorder
    # the registry past the cap
    from python_multiproc_bigdata_spark.registry import CHECKED_FIRST

    q = list(e.queries())
    assert len(CHECKED_FIRST) == 50
    assert q[:50] == list(CHECKED_FIRST)
    must_be_checked = {
        # the permanent anchor: the reference's flagship ETL spine
        "words_pipeline",
        # born in r11 (never-checked queries enter the window the round
        # they are born)
        "training_budget_select_sampled", "multimodal_mp3_sideinfo_walk",
        "multimodal_mp3_scalefac_walk", "streaming_phash_neardup",
        "streaming_audio_snippet_match", "multimodal_decode_png_adam7",
        "source_warc_shards", "source_warcgz_shards",
        "streaming_warcgz_ingest", "curation_url_normalize",
        "curation_robots_gate", "crawl_wet_pipeline",
        "text_wordpiece_merges",
        # rewired in r11 to with_global_index's bucketed rank/cumsum —
        # code-touched queries re-confirm the round they change
        "stats_gini_concentration", "stats_pareto_cutoffs",
        "training_budget_select",
        # round-11 rotation: the entire r3-latest-green cohort (the
        # stalest records after r10 re-greened the r1/r2 block) ...
        "cdc_latest_per_key", "cdc_upsert_customers",
        "curation_repetition_signals", "decontaminate_train_eval",
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
        "events_from_json_struct", "events_tumbling_window",
        "grouping_sets_orders", "profile_documents",
        "quota_sample_per_lang", "range_join_close_events",
        "semantic_only_neardups", "sim_knn_classify",
        "sim_neardup_cosine", "sim_topk_ivf", "sim_topk_sq8",
        "stats_lineitem_moments", "stats_price_percentiles",
        "text_tfidf_top_terms", "training_mix_by_lang",
        "training_pack_chunks", "training_temperature_mix",
        "udaf_median_acctbal", "words_doc_frequency",
        "words_duplicate_occurrences", "words_first_position",
        # ... and 5 family-diverse members of the r4 cohort
        "asof_click_to_nearest_view", "bloom_filtered_join",
        "calendar_month_order_counts",
        "dedup_components_canonical",
        "dq_check_orders",
    }
    assert must_be_checked <= set(CHECKED_FIRST)
    # every name demoted in the r11 rotation must carry an r10
    # driver-green record — the rotation invariant (checked across ALL
    # committed CORRECTNESS files by tools/parity_ledger.py); r11
    # demotes every r10 slot except the anchor, so assert against the
    # whole r10 artifact
    import json
    import os

    r10 = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r10.json"))
    )
    assert len(r10) == 50
    for name, rec in r10.items():
        assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"], (
            f"r11 demotion without r10 driver-green: {name}"
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
        # deliberate (r10): the subsampled-JPEG corpus is constructed so
        # its LUMA stats are bit-identical to the 4:4:4 corpus —
        # matching the same arithmetic oracle IS the proof that the
        # 4:2:0/4:2:2 pipeline reproduces the same luma values
        frozenset({"multimodal_decode_jpeg", "multimodal_decode_jpeg_sub"}),
        # deliberate (r11): warc.gz wraps each record in a verified gzip
        # member — content is unchanged through the compression layer,
        # so matching the same byte-exact page/extraction oracle IS the
        # proof (the zip/targz md5-oracle pattern)
        frozenset({"source_warc_shards", "source_warcgz_shards"}),
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
