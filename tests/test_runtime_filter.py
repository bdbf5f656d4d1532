"""Broadcast bitmap semi-filter: prune-then-exact-join equivalence and
the no-fact-side-shuffle plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.runtime_filter import bloom_semi_filter


def _frames(spark):
    big = spark.createDataFrame(
        [(k, k * 10) for k in range(1000)], ["k", "payload"]
    )
    dim = spark.createDataFrame([(k,) for k in range(0, 1000, 50)], ["dk"])
    return big, dim


def test_prune_then_join_equals_plain_join(spark):
    big, dim = _frames(spark)
    pruned = bloom_semi_filter(big, "k", dim, "dk")
    got = sorted(
        (r.k, r.payload) for r in pruned.join(dim, pruned.k == dim.dk).collect()
    )
    want = sorted((r.k, r.payload) for r in big.join(dim, big.k == dim.dk).collect())
    assert got == want and len(want) == 20


def test_tiny_filter_false_positives_are_removed_by_exact_join(spark):
    # 64 bits for 20 keys → heavy false positives; composed result must
    # STILL equal the plain join (the prune may only over-keep).
    big, dim = _frames(spark)
    pruned = bloom_semi_filter(big, "k", dim, "dk", num_bits=64)
    kept = pruned.count()
    assert kept >= 20  # never under-keeps
    got = {r.k for r in pruned.join(dim, pruned.k == dim.dk).collect()}
    assert got == set(range(0, 1000, 50))


def test_no_fact_side_shuffle(spark):
    big, dim = _frames(spark)
    plan = (
        bloom_semi_filter(big, "k", dim, "dk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one shuffle — the tiny dim-side word aggregation; the fact
    # side reaches its BroadcastHashJoin probe without an Exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("BroadcastExchange") == 1
