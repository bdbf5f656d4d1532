"""Unit tests for the item-based collaborative-filtering family on
hand-built interaction fixtures — the parity harness checks the TPC-H
corpus; these pin the cosine math, symmetry, and ranking semantics on
inputs small enough to hand-trace."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.recsys import (
    _sims_from_interactions,
)


def _sims(spark, rows):
    inter = spark.createDataFrame(rows, "custkey long, brand string")
    return {
        (r.brand, r.neighbor): r
        for r in _sims_from_interactions(inter).collect()
    }


def test_item_sims_hand_cosine(spark):
    # A: customers {1,2,3}; B: {1,2}; C: {3,4}
    # co(A,B)=2 -> cos = 2/sqrt(3*2); co(A,C)=1 -> 1/sqrt(3*2); B,C disjoint
    rows = [(1, "A"), (2, "A"), (3, "A"), (1, "B"), (2, "B"), (3, "C"), (4, "C")]
    got = _sims(spark, rows)
    assert set(got) == {("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")}
    ab = got[("A", "B")]
    assert ab.n_co == 2
    assert ab.sim_micro == round(2 / math.sqrt(3 * 2) * 1e6)
    # symmetric: both directions carry the identical count and score
    ba = got[("B", "A")]
    assert (ba.n_co, ba.sim_micro) == (ab.n_co, ab.sim_micro)
    ac = got[("A", "C")]
    assert ac.n_co == 1
    assert ac.sim_micro == round(1 / math.sqrt(3 * 2) * 1e6)


def test_item_sims_never_self_pairs(spark):
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B")]
    got = _sims(spark, rows)
    assert all(b != n for b, n in got)
    # perfectly correlated items: cosine == 1.0 exactly
    assert got[("A", "B")].sim_micro == 1_000_000


def test_registered_queries_on_corpus(spark):
    """Serving-table invariants at sf0.001: dense ranks 1..k per key,
    no self-neighbors, scores positive and non-increasing in rank."""
    from python_multiproc_bigdata_spark.registry.recsys import (
        recsys_item_similar_topk,
        recsys_user_recommend,
    )

    sf = "/root/testdata/sf0.001"
    by_brand: dict[str, list] = {}
    for r in recsys_item_similar_topk(spark, sf).collect():
        assert r.brand != r.neighbor
        assert 0.0 < r.cosine <= 1.0
        by_brand.setdefault(r.brand, []).append(r)
    for brand, rs in by_brand.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.cosine >= b.cosine for a, b in zip(rs, rs[1:])), brand

    recs = recsys_user_recommend(spark, sf).collect()
    assert recs
    owned_pairs = {
        (r.custkey, r.candidate)
        for r in recs
    }
    # recommendations exclude owned brands: re-derive ownership
    from python_multiproc_bigdata_spark.registry.common import prep
    from python_multiproc_bigdata_spark.registry.recsys import _interactions

    inter = {
        (r.custkey, r.brand) for r in _interactions(prep(spark), sf).collect()
    }
    assert not (owned_pairs & inter)
    for r in recs:
        assert 1 <= r.rank <= 3 and r.score > 0


def test_eval_coverage_bounds_and_consistency(spark):
    """Coverage and diversity live in [0,1]; coverage equals the
    recomputed distinct-recommended-brands ratio."""
    from python_multiproc_bigdata_spark.registry.recsys import (
        recsys_eval_coverage,
        recsys_user_recommend,
    )

    sf = "/root/testdata/sf0.001"
    r = recsys_eval_coverage(spark, sf).collect()[0]
    assert 0 < r.coverage <= 1 and 0 <= r.avg_intra_diversity <= 1
    recs = recsys_user_recommend(spark, sf)
    assert r.n_users == recs.select("custkey").distinct().count()
    got_cov = recs.select("candidate").distinct().count() / r.n_brands
    assert abs(r.coverage - round(got_cov, 6)) < 1e-6


def test_hitrate_loo_protocol(spark):
    """Leave-last-out protocol invariants at sf0.001: metrics bounded
    (n_hit <= n_eval, MRR <= hit-rate since each hit contributes at
    most 1/1 to the numerator), and the holdout construction recomputed
    row-by-row — latest first-purchase date per eligible customer,
    ties to the LOWER brand, never present in the train relation."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.common import prep, table
    from python_multiproc_bigdata_spark.registry.recsys import (
        recsys_eval_hitrate_loo,
    )

    sf = "/root/testdata/sf0.001"
    [row] = recsys_eval_hitrate_loo(spark, sf).collect()
    assert 0 <= row.n_hit <= row.n_eval
    assert 0.0 <= row.mrr_at_10 <= row.hit_rate_at_10 <= 1.0

    s = prep(spark)
    li = table(s, sf, "lineitem").select("l_orderkey", "l_partkey")
    o = table(s, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    pt = table(s, sf, "part").select("p_partkey", "p_brand")
    firsts = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("custkey"), F.col("p_brand").alias("brand")
        )
        .agg(F.min("o_orderdate").alias("first_dt"))
        .collect()
    )
    by_user: dict = {}
    for r in firsts:
        by_user.setdefault(r.custkey, []).append((r.first_dt, r.brand))
    n_eval = 0
    for ck, pairs in by_user.items():
        if len(pairs) < 2:
            continue
        import hashlib

        if hashlib.md5(str(ck).encode()).hexdigest() >= "4":
            continue
        n_eval += 1
        # latest first_dt, ties to the LOWER brand
        latest = max(p[0] for p in pairs)
        held_brand = min(b for d, b in pairs if d == latest)
        train_brands = {b for d, b in pairs if b != held_brand}
        assert held_brand not in train_brands
        assert len(train_brands) == len(pairs) - 1
    assert n_eval == row.n_eval
