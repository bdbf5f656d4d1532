"""Dump the FORMATTED physical plans of the architecture-defining
queries to PLANS.md — direct evidence for the plan-shape claims the
docstrings and tests make (pushed filters, pruned schemas, broadcast
sides, no cartesian pair spaces). Regenerate after plan-affecting
changes:  python tools/plans_report.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

# query -> the property its plan is meant to demonstrate
SHOWCASE: dict[str, str] = {
    "q3_shipping_priority": "dim filters pushed to the parquet scan; both small sides broadcast (no SortMergeJoin)",
    "words_pipeline": "scan reads only (doc_id, text); per-file count carried through an AQE broadcast join",
    "q1_pricing_summary": "map-side partial aggregation before the single exchange",
    "dedup_minhash_lsh": "banded posting-list candidates: one aggregation shuffle, signature arrays kept out of the band exchange",
    "sim_topk_lsh_banded": "bounded query side's band keys broadcast onto corpus bands — zero corpus shuffle for candidates",
    "sim_topk_ivfpq": "composed ANN: centroid broadcasts only; candidates from probe_label equi-join, no cartesian pair space",
    "events_trailing_1h": "per-user RANGE frame — bounded window state, partition-parallel",
    "training_source_caps": "1-row total broadcast fan-out + per-source prefix sum + partial-agg rollup",
    "bloom_filtered_join": "runtime bloom filter (might_contain) injected into the fact scan BEFORE the join shuffle",
    "zorder_lineitem_layout": "Morton bit-interleave as pure integer expressions inside WholeStageCodegen; one groupBy exchange",
    "dedup_edit_distance_blocked": "LSH-band candidate generation (one aggregation shuffle) feeding JVM levenshtein verify — no cartesian pair space",
    "dedup_prefix_filter_jaccard": "lossless PPJoin: candidates only from rarest-prefix posting lists; exact verify join restricted to candidates",
    "graph_triangle_copurchase": "degree-oriented wedge join (outdeg bounded O(sqrt m)) after support-2 edge pruning; no unoriented self-join",
    "sim_hybrid_rrf": "sparse tower = query-bounded inverted-index join; dense tower = bounded crossJoin; fusion on ranks only",
    "layout_skipping_stats": "value-range blocks, map-side only — no global sort or single-partition window anywhere in the plan",
    "events_ewma_value": "ArrowEvalPython/FlatMapGroupsInPandas per-key fold — the only Python stage; everything around it stays JVM",
    "dedup_winnow_pairs": "map-only fingerprint extraction (no window shuffle; md5 transform evaluated once per row), posting-pair aggregation with hot-fingerprint cap",
    "sim_pca_project": "trained components as an 8-row broadcast table; dot products on array columns in codegen — no literal trees, no corpus shuffle",
    "text_pmi_collocations": "array self-zip bigrams (adjacency never leaves the row); two map-side-combined count aggs; vocabulary-side broadcast joins",
    "events_linear_trend": "grouped OLS from exact-integer algebraic sums — two partial-agg groupBys, broadcast min-hour rebase",
    "curation_pagerank_quality": "integer node keys through 3 lazily-chained join+agg rounds — one job, no per-round materialization",
    "asof_click_to_nearest_view": "backward+forward as-of over ONE exchange — two sorts share the same hash partitioning, no second shuffle",
    "bloom_pruned_urgent_revenue": "hand-built bitmap semi-join: fact rows die at a BroadcastHashJoin probe BEFORE any fact-side exchange",
    "sessions_overlap_pairs": "interval-interval overlap as a bucket EQUI-join (hash) — no nested-loop inequality join in the plan",
    "sim_topk_binary": "256-row hyperplane table broadcast (never literal trees); Hamming stage = 8 xor+bit_count integer ops in WholeStageCodegen; repartition pin on the CPU-heavy signature fold",
    "curation_quality_classifier": "trained 256-weight model as a broadcast join; scan reads only (doc_id, text); zero Python stages — training happened driver-side before the plan existed",
    "dedup_semantic": "centroid-broadcast argmax assignment; candidate pairs ONLY from the cid equi-join (cluster-bounded pair space, no cartesian)",
    "stats_countmin_heavy_hitters": "sketch build = distributive partial-agg groupBy onto 1024 cells; probe joins a broadcast of the sketch",
    "recsys_user_recommend": "items²-bounded similarity relation broadcast onto (custkey, brand)-partitioned interactions; owned-item removal is a LeftAnti on the same keys; integer micro-unit score sums",
    "stats_bootstrap_ci": "64× replicate explode AFTER a repartition pin (CPU-heavy md5 stage never inherits single-file partitioning); groups×B partial sums are the only shuffle payload",
    "graph_link_prediction": "wedge self-join on the middle node + cn≥2 floor pruning the quadratic tail; degree attach via broadcast; existing edges removed by LeftAnti",
    "events_frequent_sequences": "gapped follower set from 5 lead() columns over ONE per-user sort — no events self-join anywhere in the plan",
    "text_keyphrase_rake": "phrase splitting = running stopword count window (no UDF); word stats collapse map-side to |vocab| rows; word scores broadcast back",
    "multimodal_image_ahash_neardup": "band relation localCheckpointed (decode runs once, not 4x); candidates + verify are equi-joins only (no cartesian/nested-loop), pair space bounded by equal-band buckets",
    "stats_quantile_sketch": "sketch build = distributive partial-agg groupBy onto <=256 cells after a 1-row min/max broadcast; readback is |buckets|x|probes| rows",
    "events_hll_sliding_users": "per-day register relation built once; trailing windows merge registers by cell-wise MAX over a days-dimension broadcast — events never rescanned per window",
    "dq_expectations_panel": "one aggregate pass per table (multi-distinct plans through Expand); output is |tables|x|columns| rows",
    # r10 sampled-cutoff scale variants: cutoffs computed in separate
    # bounded jobs, so the FINAL plan is the scored scan alone
    "events_rfm_segmentation_sampled": "quintile scoring as literal predicates over one partial-agg groupBy - no Window, no SinglePartition exchange anywhere in the plan",
    "curation_ccnet_tiers_sampled": "per-language tercile bucketing via a broadcast cutoff table - Window-free full-corpus plan, BroadcastHashJoin only",
    # r11: the last three single-task global-rank stages rewired to
    # with_global_index (bucketed parallel sort + broadcast offsets)
    "stats_gini_concentration": "global revenue rank via with_global_index: every window partitioned by the range bucket - no unpartitioned row_number over |customers|",
    "stats_pareto_cutoffs": "global rank AND running revenue sum via with_global_index's cumsum split (within-bucket windows + broadcast per-bucket sum offsets) - no unpartitioned window",
    "training_budget_select": "global budget cut = bucketed running token sum; per-source cap stays a source-partitioned window - no unpartitioned window",
    "training_budget_select_sampled": "budget cut as ONE broadcast literal tuple from the md5-sample job - final plan keeps only the source-partitioned cap window",
    "multimodal_mp3_sideinfo_walk": "bit-level side-info decode is map-only mapInPandas - zero shuffle, one Arrow stage",
    # r11 crawl-ingest family
    "source_warc_shards": "WARC pack = one bounded groupBy(shard); walk+extract = map-only Arrow stage - two stages, no driver involvement",
    "crawl_wet_pipeline": "crawl->WET->gate->rollup composition stays within the pack shuffle + per-source rollup; no cartesian anywhere",
    "curation_url_normalize": "RFC 3986 normalization fully JVM-side - the dot-segment fold is an aggregate HOF inside codegen, zero Python nodes",
    "curation_robots_gate": "rule matching = broadcast join of the tiny per-host rule dim + max_by argmax; no shuffle keyed on host",
    # r12: the final five unpartitioned-window sites rewired; the
    # registry-wide guard (tests/test_window_guard.py) now forbids the
    # debt class outright
    "text_vocab_coverage": "global rank + cumulative coverage sum via with_global_index's cumsum split - the vocabulary never crosses a single-partition window",
    "text_bm25_topk": "top-20 query terms via TakeOrderedAndProject (per-partition heaps); remaining windows are term-partitioned",
    "events_top_session_paths": "top-20 paths via TakeOrderedAndProject; rk re-derived over the 20-row post-limit relation only",
    "crawl_link_graph": "href walk = map-only Arrow stage after the pack shuffle; normalize = JVM exprs; per-host rollup + TakeOrderedAndProject top-12",
    "multimodal_mp3_huffman_walk": "bit-level Huffman decode is map-only mapInPandas - zero shuffle, one Arrow stage",
}


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plans-report", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans of the showcase queries",
        "",
        f"Generated by tools/plans_report.py at {sf_dir} (regenerate after",
        "plan-affecting changes). Each plan demonstrates the scale property",
        "named above it; tests/test_scale_plans.py pins these properties",
        "regression-style.",
        "",
    ]
    for name, claim in SHOWCASE.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Demonstrates:** {claim}")
        out.append("")
        out.append("```")
        out.append(formatted_plan(spark, df).rstrip())
        out.append("```")
        out.append("")
    path = Path(__file__).resolve().parent.parent / "PLANS.md"
    path.write_text("\n".join(out) + "\n")
    print(f"wrote {path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
