"""Recall floors for the approximate similarity paths, pinned from
measurement (tools/recall_report.py) — a quantizer or banding regression
fails here loudly instead of silently shipping worse recall.

Measured at build time (sf0.001 / sf0.1):
  ivf_kmeans nprobe=2/8 lists   : 0.61 / 0.50   (floor 0.45)
  ivf_kmeans nprobe=24/192 lists: 0.92 / 0.95   (floor 0.90; the
    registered config from the r5 latency-recall sweep — lowest scan
    fraction (12.5%) holding recall >= 0.95 at sf0.1; pareto in
    SCALE.md: 128/32 = 0.97 at 25% scan, 64/32 = 0.953 at 50% scan)
  sq8_ivf composed (same cfg)   : 0.92 / 0.95   (floor 0.90)
  ivf_minid  nprobe=2           : 0.21 / 0.17   (kmeans must beat it)
  banded near-dup pair recall   : 62/66 / 878/920  (floor 0.90)
  banded LSH top-k recall@3     : 0.93 / 0.94   (floor 0.85)
  PQ 8sub×64codes rerank=50     : 0.92 / 0.77   (floor 0.85 at test SF;
    code count is the knob — 256 codes reaches 0.93 at sf0.1)
  IVF+PQ composed (same cfgs)   : 0.92 / 0.90   (floor 0.85; beats PQ
    alone — pruning cleans the approx pool before the rerank cut)

Floors sit below the measured values because k-means assignment can flip
on float-sum near-ties across partitionings; the MARGIN is the
non-determinism budget, the FLOOR is the regression alarm."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from recall_report import _topk_sets, recall_at_k  # noqa: E402

from python_multiproc_bigdata_spark.operators.similarity import (  # noqa: E402
    neardup_pairs_banded,
    neardup_pairs_cosine,
    topk_bruteforce,
    topk_ivf,
    topk_ivf_kmeans,
    topk_lsh,
    topk_lsh_banded,
)
from tests.conftest import SF_DIR  # noqa: E402


def test_ivf_kmeans_recall_floor_and_beats_label_lists(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    r_kmeans = recall_at_k(topk_ivf_kmeans(q, emb, k=3, nprobe=2, n_lists=8), exact)
    r_minid = recall_at_k(topk_ivf(q, emb, k=3, nprobe=2), exact)
    assert r_kmeans >= 0.45, r_kmeans
    assert r_kmeans > r_minid, (r_kmeans, r_minid)
    # the registered config (IVF_KMEANS_CFG, 192 lists / nprobe 24 —
    # the r5 sweep knee): measured 0.923 @ sf0.001, 0.95 @ sf0.1 at a
    # 12.5% scan fraction; floor 0.9 budgets assignment near-tie flips
    r_fine = recall_at_k(topk_ivf_kmeans(q, emb, k=3, nprobe=24, n_lists=192, max_iter=3), exact)
    assert r_fine >= 0.9, r_fine
    assert r_fine > r_kmeans, (r_fine, r_kmeans)


def test_lsh_banded_recall_floor_and_beats_single_table(spark):
    # ANY-of-16 4-bit bands: measured 0.93 @ sf0.001 / 0.94 @ sf0.1;
    # floor 0.85 leaves margin for band-boundary float flips. Must
    # dominate the single-bucket form by construction (its candidate
    # set is a superset whenever the full 8-bit prefix agrees).
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    r_banded = recall_at_k(topk_lsh_banded(q, emb, k=3), exact)
    r_single = recall_at_k(topk_lsh(q, emb, k=3, bits=8), exact)
    assert r_banded >= 0.85, r_banded
    assert r_banded > r_single, (r_banded, r_single)


def test_neardup_banded_pair_recall_floor(spark):
    # banded verification is exact, so banded pairs must be a strict
    # subset of the exact crossJoin pairs; the floor pins the measured
    # recall (62/66 at sf0.001 — cosine 0.4 is the weakest regime for
    # sign-LSH, so this is data-pinned regression, not theory)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {tuple(r) for r in neardup_pairs_cosine(emb, 0.4).collect()}
    banded = {tuple(r) for r in neardup_pairs_banded(emb, 0.4).collect()}
    assert banded <= exact
    assert len(exact) > 0
    assert len(banded) / len(exact) >= 0.90, (len(banded), len(exact))


def test_sq8_rerank_recall_floor(spark):
    """int8 quantize + rerank=10: measured 1.0 at sf0.1 (rerank re-scores
    exactly, so only a candidate missing the top-10 approx cut can cost
    recall). Floor 0.95 budgets quantization-boundary flips at other
    data scales."""
    from python_multiproc_bigdata_spark.operators.similarity import topk_sq8

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    r = recall_at_k(topk_sq8(q, emb, k=3, rerank=10), exact)
    assert r >= 0.95, r


def test_sq8_ivf_composed_recall_floor(spark):
    """The composed SQ8-over-IVF plan at the registered config must not
    lose recall vs plain kmeans-IVF (rerank=10 re-scores exactly, so
    quantization only costs recall if a true top-3 misses the top-10
    quantized cut — measured: it doesn't; 0.92 @ sf0.001, 0.95 @ sf0.1,
    identical to the unquantized IVF path)."""
    from python_multiproc_bigdata_spark.operators.similarity import topk_sq8_ivf
    from python_multiproc_bigdata_spark.registry.similarity import IVF_KMEANS_CFG

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    c = IVF_KMEANS_CFG
    r = recall_at_k(
        topk_sq8_ivf(
            q, emb, k=3, nprobe=c["nprobe"], n_lists=c["n_lists"],
            max_iter=c["max_iter"], rerank=10,
        ),
        exact,
    )
    assert r >= 0.9, r


def test_pq_recall_floor(spark):
    """PQ at the registered config (8 sub x 64 codes, rerank=50):
    measured 0.92 @ sf0.001 / 0.77 @ sf0.1 (rerank covers 10% vs 2.5%
    of the corpus — the sweep in RECALL.json shows code count is the
    recall knob: 256 codes reaches 0.93 at sf0.1). Floor 0.85 at the
    test SF budgets codebook-boundary flips; uniform synthetic
    embeddings are PQ's worst case, so real corpora sit above this."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        pq_book_sq,
        topk_pq,
        train_pq_codebooks_driver,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    books = train_pq_codebooks_driver(emb, n_sub=8, n_codes=64, max_iter=3)
    r = recall_at_k(topk_pq(q, emb, books, pq_book_sq(books), k=3, rerank=50), exact)
    assert r >= 0.85, r


def test_ivfpq_recall_floor(spark):
    """IVF+PQ at the registered configs (IVF_KMEANS_CFG lists/nprobe +
    8 sub x 64 codes, rerank=50): measured 0.92 @ sf0.001 / 0.90 @
    sf0.1 (at 192/24) --
    HIGHER than PQ alone (0.77 at sf0.1): list pruning removes
    out-of-list junk from the approx candidate pool before the rerank
    cut, so the top-50 holds more true neighbors. Floor 0.85."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        pq_book_sq,
        topk_ivfpq,
        train_pq_codebooks_driver,
        train_spherical_kmeans_driver,
    )
    from python_multiproc_bigdata_spark.registry.similarity import IVF_KMEANS_CFG

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    c = IVF_KMEANS_CFG
    cents = train_spherical_kmeans_driver(emb, n_lists=c["n_lists"], max_iter=c["max_iter"])
    books = train_pq_codebooks_driver(emb, n_sub=8, n_codes=64, max_iter=3)
    r = recall_at_k(
        topk_ivfpq(
            q, emb, cents, books, pq_book_sq(books), k=3, nprobe=c["nprobe"], rerank=50
        ),
        exact,
    )
    assert r >= 0.85, r


def test_binary_hamming_recall_floor(spark):
    """256-bit hyperplane binary quantization at the registered config
    (rerank=100): measured 0.97 @ sf0.001 / 0.89 @ sf0.1. Raw per-dim
    sign bits measured 0.22 at sf0.1 on this near-isotropic corpus —
    the hyperplane redesign is what makes the tier usable (sweep in
    RECALL.json). Floor 0.90 at the test SF (sf0.001)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_binary_hamming,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    r = recall_at_k(topk_binary_hamming(q, emb, k=3, rerank=100), exact)
    assert r >= 0.90, r


def test_binary_hamming_exhaustive_rerank_is_exact(spark):
    """With rerank covering the whole corpus the binary path must equal
    the exact brute-force ranking — quantization only orders the
    CANDIDATE stage; the re-rank tail is exact (the topk_sq8 law)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_binary_hamming,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    a = {
        (r.query_id, r.rk): r.neighbor_id
        for r in topk_bruteforce(q, emb, k=3).collect()
    }
    b = {
        (r.query_id, r.rk): r.neighbor_id
        for r in topk_binary_hamming(q, emb, k=3, rerank=n).collect()
    }
    assert a == b


def test_ranking_ndcg_floor(spark):
    """The registered IVF tier must rank well, not just recall well:
    mean NDCG@10 vs the exact top-10 (graded 10..1) stays above 0.8 and
    MRR@10 above 0.9 at the test SF (measured 0.899 / 1.0 at sf0.01;
    floors budget quantizer near-tie flips)."""
    from python_multiproc_bigdata_spark.registry.similarity import (
        eval_ranking_ndcg,
    )

    row = eval_ranking_ndcg(spark, SF_DIR).collect()[0]
    assert row.n_queries == 100
    assert row.ndcg_at_10 >= 0.8, row
    assert row.mrr_at_10 >= 0.9, row
    assert row.ndcg_at_10 <= 1.0 and row.mrr_at_10 <= 1.0


def test_ivf_incremental_equals_one_shot_any_split(spark):
    """assign(base) ∪ assign(delta) == assign(full): the incremental
    serving path returns the IDENTICAL top-k as the one-shot build for
    an arbitrary split point (here 50/50 by parity of vec_id — a
    different split than the registered query's md5 rule)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_ivf_kmeans,
        topk_ivf_kmeans_incremental,
        train_spherical_kmeans_driver,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    cents = train_spherical_kmeans_driver(emb, n_lists=8, max_iter=3, sample_size=512)
    inc = topk_ivf_kmeans_incremental(
        q,
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        cents,
        k=3,
        nprobe=2,
    )
    one = topk_ivf_kmeans(q, emb, k=3, nprobe=2, n_lists=8, max_iter=3, train_sample=512)
    a = {(r.query_id, r.neighbor_id, r.rk) for r in inc.collect()}
    b = {(r.query_id, r.neighbor_id, r.rk) for r in one.collect()}
    assert a == b and a


def test_graph_refined_beats_plain_ivf(spark):
    """The NN-descent round must help: recall@3 of graph-refined search
    strictly exceeds plain IVF at the same coarse config (8 lists,
    nprobe 2 — plain measures ~0.45 here), and never returns worse
    candidates (exact re-rank over a superset)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf_graph_refined,
        topk_ivf_kmeans,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)
    exact = _topk_sets(topk_bruteforce(q, emb, k=3))
    plain = recall_at_k(
        topk_ivf_kmeans(q, emb, k=3, nprobe=2, n_lists=8, max_iter=3), exact
    )
    refined = recall_at_k(
        topk_ivf_graph_refined(q, emb, k=3, nprobe=2, n_lists=8, max_iter=3),
        exact,
    )
    assert refined > plain, (refined, plain)
    assert refined >= 0.6, refined


def test_filtered_search_respects_label_constraint(spark):
    """Every filtered result shares its query's label, never the query
    itself, and within-label exact top-1 agreement stays high (the
    probe set is geometric; the label filter only removes candidates)."""
    from python_multiproc_bigdata_spark.registry.similarity import (
        sim_topk_filtered,
    )

    rows = sim_topk_filtered(spark, SF_DIR).collect()
    assert rows
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert emb[r.neighbor_id] == r.label == emb[r.query_id]
        assert 1 <= r.rk <= 3
