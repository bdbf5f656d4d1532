"""Compaction + incremental partition processing (operators/maintenance).

The compaction test writes a deliberately fragmented dataset and checks
the rewrite shrinks the file count without touching row content. The
incremental tests check the high-water state advances exactly once per
partition and that the increment's scan is partition-pruned (the
100 TB property: a daily run reads one directory, not the history).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators import maintenance as M


def test_compact_parquet_shrinks_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 13).alias("k")
    )
    df.repartition(40).write.parquet(path)
    assert M.data_file_count(path) >= 40
    before = spark.read.parquet(path).groupBy().agg(
        F.count("*").alias("n"), F.sum("id").alias("s")
    ).collect()[0]

    n_after = M.compact_parquet(spark, path, target_file_mb=128, sort_within_by=["k"])

    assert n_after < 40
    after = spark.read.parquet(path).groupBy().agg(
        F.count("*").alias("n"), F.sum("id").alias("s")
    ).collect()[0]
    assert (before.n, before.s) == (after.n, after.s)


def test_compact_parquet_keeps_hive_partitioning(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(0, 3_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("day")
    )
    df.repartition(10).write.partitionBy("day").parquet(path)
    M.compact_parquet(spark, path, target_file_mb=128, partition_by=["day"])
    assert sorted(M.list_partition_values(path, "day")) == ["0", "1", "2"]
    assert spark.read.parquet(path).count() == 3_000


def test_compact_parquet_splits_oversized_partition(spark, tmp_path):
    # one hive partition much larger than target_file_mb must split into
    # multiple files (the salt in the shuffle key) — without it, hashing
    # on the partition column alone collapses each day into ONE file
    path = str(tmp_path / "skewed")
    big = spark.range(0, 120_000).select(
        F.lit("hot").alias("day"),
        F.md5(F.col("id").cast("string")).alias("a"),
        F.md5((F.col("id") * 7).cast("string")).alias("b"),
    )
    small = spark.range(0, 100).select(
        F.lit("cold").alias("day"),
        F.md5(F.col("id").cast("string")).alias("a"),
        F.md5((F.col("id") * 7).cast("string")).alias("b"),
    )
    big.unionAll(small).write.partitionBy("day").parquet(path)
    M.compact_parquet(spark, path, target_file_mb=1, partition_by=["day"])
    hot_files = M.data_file_count(str(tmp_path / "skewed" / "day=hot"))
    cold_files = M.data_file_count(str(tmp_path / "skewed" / "day=cold"))
    assert hot_files >= 2, hot_files
    assert cold_files >= 1
    assert spark.read.parquet(path).count() == 120_100


def test_incremental_processes_each_partition_once(spark, tmp_path):
    src = str(tmp_path / "events_by_day")
    state = str(tmp_path / "state.json")
    out: list[int] = []

    def write_day(day: str, n: int) -> None:
        spark.range(0, n).select(
            F.col("id"), F.lit(day).alias("day")
        ).write.mode("append").partitionBy("day").parquet(src)

    write_day("2026-01-01", 100)
    write_day("2026-01-02", 200)

    done = M.process_new_partitions(
        spark, src, "day", state, lambda df: out.append(df.count())
    )
    assert done == ["2026-01-01", "2026-01-02"]
    assert sum(out) == 300

    # no new data -> nothing processed, fn not called
    assert M.process_new_partitions(
        spark, src, "day", state, lambda df: out.append(df.count())
    ) == []
    assert sum(out) == 300

    # one new partition -> only it is read
    write_day("2026-01-03", 50)
    done = M.process_new_partitions(
        spark, src, "day", state, lambda df: out.append(df.count())
    )
    assert done == ["2026-01-03"]
    assert out[-1] == 50
    assert set(json.load(open(state))["processed"]) == {
        "2026-01-01", "2026-01-02", "2026-01-03"
    }


def test_incremental_handles_hive_escaped_partition_values(spark, tmp_path):
    # values with ':' / ' ' are %-escaped in directory names; the listing
    # must unescape them or the isin() filter silently matches nothing
    src = str(tmp_path / "escaped")
    state = str(tmp_path / "state.json")
    vals = ["2026-01-01 00:00:00", "2026-01-01 01:00:00"]
    for v in vals:
        spark.range(0, 40).select(F.col("id"), F.lit(v).alias("hour")).write.mode(
            "append"
        ).partitionBy("hour").parquet(src)

    assert M.list_partition_values(src, "hour") == vals
    seen: list[int] = []
    done = M.process_new_partitions(spark, src, "hour", state, lambda df: seen.append(df.count()))
    assert done == vals and sum(seen) == 80


def test_incremental_scan_is_partition_pruned(spark, tmp_path):
    src = str(tmp_path / "pruned")
    spark.range(0, 1_000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("day")
    ).write.partitionBy("day").parquet(src)

    df = spark.read.parquet(src).filter(F.col("day").isin(["2", "3"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the IN-list lands in PartitionFilters -> only day=2/day=3 dirs read
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    assert df.count() == 500
