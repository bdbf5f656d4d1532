"""Bucketing demo (SURVEY §4 / guide: co-located joins without a shuffle):
write both join sides bucketed on the key, then assert the join plan has
NO shuffle exchange — the physical property the 100 TB design leans on."""

from __future__ import annotations

import pytest


@pytest.fixture()
def warehouse_spark(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    return spark


def test_bucketed_join_has_no_shuffle(warehouse_spark, tmp_path):
    spark = warehouse_spark
    from pyspark.sql import functions as F

    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 50_000).select(
        (F.col("id") % 10_000).alias("o_key"), F.col("id").alias("l_val")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (
        orders.write.bucketBy(8, "o_key").sortBy("o_key")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lines.write.bucketBy(8, "o_key").sortBy("o_key")
        .option("path", str(tmp_path / "b_lines"))
        .mode("overwrite").saveAsTable("b_lines")
    )
    # force the non-broadcast path so the assertion tests bucketing, not
    # the broadcast threshold
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lines"), "o_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed scan on both sides → SortMergeJoin with NO Exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 50_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_signature_lsh_matches_oneshot_and_avoids_sig_shuffle(
    warehouse_spark, tmp_path
):
    """materialize_signatures + lsh_pairs_from_signatures must (a) return
    exactly the pairs the one-shot minhash_lsh_pairs returns and (b) join
    the bucketed signature table without an Exchange on the signature
    side — the 'one write, N reads' property SCALE.md promises."""
    spark = warehouse_spark
    from python_multiproc_bigdata_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expected = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    )

    sig = D.materialize_signatures(
        docs, "sig_docs", str(tmp_path / "sig_docs"), buckets=8
    )
    got_df = D.lsh_pairs_from_signatures(sig, threshold=0.8)
    got = sorted((r.doc_a, r.doc_b, r.jaccard) for r in got_df.collect())
    assert got == expected and len(got) > 0

    # plan shape: force SMJ (no broadcast) and check the verification
    # joins read bucketed scans; the only hashpartitioning exchanges
    # left belong to the slim candidate side (posting-list groupBys /
    # dropDuplicates), never to a signature-table scan.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            D.lsh_pairs_from_signatures(sig, threshold=0.8)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    for chunk in plan.split("Exchange hashpartitioning")[1:]:
        keys = chunk[:60]
        # id_a/id_b: slim candidate list aligning to the sig buckets;
        # key/_bk: the band-bucket groupBy (the one candidate shuffle)
        assert any(k in keys for k in ("id_a", "id_b", "key", "_bk")), keys
    spark.sql("DROP TABLE IF EXISTS sig_docs")
