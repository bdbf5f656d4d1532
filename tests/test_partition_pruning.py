"""Partition pruning (static + dynamic) — the remaining Catalyst
free-lunch features of SURVEY §4 not already pinned by
test_scale_plans.py. At 100 TB, partitioned layout + DPP is the
difference between scanning a shard and scanning the lake."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_static_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    q = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the lang filter becomes a PartitionFilters entry, not a data filter
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    en_rows = q.count()
    assert en_rows == docs.filter("lang = 'en'").count()


def test_dynamic_partition_pruning(spark, tmp_path):
    """DPP: fact partitioned on the join key; the dim-side filter prunes
    fact partitions at runtime (dynamicpruning subquery in the scan)."""
    out = str(tmp_path / "fact_by_k")
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("v")
    )
    fact.write.mode("overwrite").partitionBy("k").parquet(out)
    dim = spark.createDataFrame(
        [(k, "keep" if k < 3 else "drop") for k in range(20)], ["k", "tag"]
    )
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    q = (
        spark.read.parquet(out)
        .join(dim.filter(F.col("tag") == "keep"), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = {(r.k, r.n) for r in q.collect()}
    assert got == {(0, 1000), (1, 1000), (2, 1000)}
