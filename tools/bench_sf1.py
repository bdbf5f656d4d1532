"""sf1 scaling point (VERDICT r9 ask #7): run the most expensive
headline queries at sf0.1 AND the synthesized sf1 (tools/make_sf1.py —
10x data) in one warm session and append the measured third decade to
SCALING.md, turning the "survives 100x" argument from plan-shape
reasoning into a measured 1x/10x/100x/1000x curve for the queries whose
absolute cost dominates the bench.

Run:  python tools/bench_sf1.py        (builds /tmp/pmb_sf1 if missing)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark
from tools.make_sf1 import build

SF01 = "/root/testdata/sf0.1"

# the 15 most expensive committed-bench queries (BENCH_FULL r9),
# deduplicated by family so the sweep covers the panel/eval/ANN/dedup/
# recsys/training shapes that dominate total bench time
QUERIES = [
    "dq_expectations_panel",
    "dq_expectations_panel_approx",
    "recsys_eval_coverage",
    "recsys_eval_hitrate_loo",
    "eval_dedup_pr",
    "eval_sq8_ivf_recall",
    "eval_ranking_ndcg",
    "sim_topk_ivfpq",
    "sim_topk_pq",
    "sim_topk_sq8_ivf",
    "sim_topk_filtered",
    "sim_topk_graph_refined",
    "sim_mmr_from_ivf",
    "dedup_cluster_size_report",
    "training_contrastive_pairs",
    # r13 additions: the current heaviest not already covered
    "text_wordpiece_encode",
    "dedup_winnow_pairs",
    "graph_bfs_levels",
    "eval_binary_recall",
    "text_bpe_merges",
    "dedup_incremental_novelty",
]

MARK_BEGIN = "<!-- sf1-sweep-begin -->"
MARK_END = "<!-- sf1-sweep-end -->"


def median3(fn, spark, sf) -> float:
    times = []
    for _ in range(3):
        # r13: mirror bench.py's clean-cache fix — persisted subtrees
        # from a previous repeat must not serve this one.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return sorted(times)[1]


def main() -> None:
    spark = get_spark(
        app_name="pmb-bench-sf1",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build(spark)
    rows = []
    for name in QUERIES:
        fn = REGISTRY[name].fn
        t01 = median3(fn, spark, SF01)
        t1 = median3(fn, spark, sf1)
        ratio = t1 / t01 if t01 else float("inf")
        rows.append((name, t01, t1, ratio))
        print(f"{name}: sf0.1 {t01:.2f}s  sf1 {t1:.2f}s  r1000 {ratio:.1f}x", flush=True)

    lines = [
        MARK_BEGIN,
        "",
        "## sf1 sweep — the measured third decade (r10, re-run r13)",
        "",
        "tools/bench_sf1.py on the 15 most expensive bench queries:",
        "sf1 = 10x sf0.1 (tools/make_sf1.py — key-shifted,",
        "content-perturbed replication; 6M lineitem / 50k docs / 20k",
        "embeddings). `r1000` = t(sf1)/t(sf0.1), one more 10x data",
        "step on top of the 1x/10x/100x table above — a ratio well",
        "under 10 means fixed overhead still amortizes; above 10 would",
        "flag superlinear work.",
        "",
        "| query | sf0.1 s | sf1 s | r1000 |",
        "|---|---|---|---|",
    ]
    for name, t01, t1, ratio in rows:
        lines.append(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.1f}x |")
    lines += ["", MARK_END]
    block = "\n".join(lines)

    p = Path(__file__).resolve().parent.parent / "SCALING.md"
    text = p.read_text()
    if MARK_BEGIN in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END) :]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    p.write_text(text)
    print(f"wrote sf1 sweep into {p}")


if __name__ == "__main__":
    main()
