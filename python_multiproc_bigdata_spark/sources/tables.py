"""Harness parquet tables (TESTDATA.md): loaders + temp-view registration.

Parquet scans get predicate pushdown / column pruning / partition pruning
from Catalyst for free (SURVEY §4) — no code needed here beyond paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS) — Spark's reader rejects it
        # without the nanosAsLong legacy conf; route through the one
        # reader that sets it and truncates to micros (DuckDB-equivalent)
        from python_multiproc_bigdata_spark.registry.common import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = False
) -> dict[str, DataFrame]:
    dfs = {name: load_table(spark, name, sf_dir) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
