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
