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
        # born in r12 (never-checked queries enter the window the round
        # they are born)
        "multimodal_mp3_huffman_walk", "text_wordpiece_encode",
        "crawl_link_graph", "streaming_crawl_admission",
        # code-touched in r12 — re-confirm the round they change: the
        # five unpartitioned-window rewires, the url-normalize RFC
        # fixes (corpus+oracle grew the new cases), the
        # with_global_index persist-ownership change, the html_to_text
        # raw-text close-tag fix, the narrowed store-read catch
        "text_vocab_coverage", "text_bm25_topk",
        "stats_countmin_heavy_hitters", "events_top_session_paths",
        "graph_bfs_levels", "curation_url_normalize",
        "stats_gini_concentration", "stats_pareto_cutoffs",
        "training_budget_select", "source_warc_shards",
        "crawl_wet_pipeline", "streaming_phash_neardup",
        # round-12 rotation: 33 of the 41-member r4-latest-green cohort
        # (the stalest records after r11 re-greened the r3 block)
        "bloom_pruned_urgent_revenue", "cdc_snapshot_asof",
        "cube_orders", "curation_bigram_logprob",
        "curation_pagerank_quality", "dedup_edit_distance_blocked",
        "dedup_prefix_filter_jaccard", "dedup_winnow_pairs",
        "events_ewma_value", "events_funnel_conversion",
        "events_linear_trend", "events_retention_cohorts",
        "events_trailing_1h", "graph_triangle_copurchase",
        "layout_skipping_stats", "multimodal_features",
        "q21_suppliers_kept_waiting", "q8_market_share",
        "sessions_overlap_pairs", "sim_hybrid_rrf", "sim_pca_project",
        "sim_topk_lsh_banded", "sim_topk_pq",
        "stats_price_quartiles_ntile", "streaming_cdc_merge",
        "streaming_dedup_watermark", "streaming_funnel_stages",
        "streaming_transition_counts", "text_bpe_merges",
        "text_lang_id", "text_pmi_collocations",
        "training_corpus_pipeline", "udaf_trimmed_mean_price",
    }
    assert must_be_checked <= set(CHECKED_FIRST)
    # every name demoted in the r12 rotation must carry an r11
    # driver-green record — the rotation invariant (checked across ALL
    # committed CORRECTNESS files by tools/parity_ledger.py); r12
    # demotes every r11 slot except the anchor and the touched
    # re-confirms, so assert against the whole r11 artifact
    import json
    import os

    r11 = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r11.json"))
    )
    assert len(r11) == 50
    for name, rec in r11.items():
        assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"], (
            f"r12 demotion without r11 driver-green: {name}"
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
