"""Streaming queries (SURVEY §7 M5), driven to completion through a memory
sink so the driver's batch-style harness can compare them to the DuckDB
oracle. The streaming result of a complete-mode aggregation over the
bounded events file equals the batch aggregation — which is the point:
the same engine semantics, unbounded-ready."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep
from python_multiproc_bigdata_spark.streaming.windows import (
    first_event_per_key,
    run_to_memory,
    sliding_counts,
    stream_events,
    tumbling_counts,
)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(tumbling_counts(ev), mode="complete")


SQL_STREAM_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def streaming_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(first_event_per_key(ev), mode="complete")


SQL_STREAM_FIRST = """
SELECT user_id, event_type, min(event_id) AS first_event_id
FROM events GROUP BY 1, 2
"""


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(sliding_counts(ev), mode="complete")


SQL_STREAM_SLIDING = """
SELECT window_start, count(*) AS n FROM (
  SELECT unnest([
    time_bucket(INTERVAL '30 minutes', ts),
    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  ]) AS window_start
  FROM events
) GROUP BY 1
"""


REGISTRY = {
    "streaming_tumbling_counts": QuerySpec(streaming_tumbling_counts, SQL_STREAM_TUMBLING),
    "streaming_first_event": QuerySpec(streaming_first_event, SQL_STREAM_FIRST),
    "streaming_sliding_counts": QuerySpec(streaming_sliding_counts, SQL_STREAM_SLIDING),
}
