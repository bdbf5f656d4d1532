"""Shared plumbing for registry queries."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only correctness check


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime confs the oracle comparison depends on, regardless of
    how the caller built the session (the driver uses its own)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects. Read the raw int64 nanos (legacy.parquet.nanosAsLong) and
    truncate to microseconds with integer division — exactly DuckDB's
    TIMESTAMP_NS → TIMESTAMP truncation, keeping the oracle comparable.
    (Float division would lose precision: epoch-nanos ≈ 1.7e18 exceeds a
    double's 53-bit integer range.)
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
