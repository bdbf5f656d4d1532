"""SparkSession factory.

Replaces the reference's hand-rolled execution substrate (RAM admission
control, worker counts, queue sizes — /root/reference/v2/main.py:201-338)
with Spark conf: AQE re-plans at runtime, shuffle partitions are sized to
the local harness, and the session timezone is pinned to UTC so results
compare bit-for-bit against the DuckDB oracle (naive-UTC timestamps).

At cluster scale the same code runs unchanged: only master/partition
settings move to spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "python-multiproc-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime shuffle coalescing + skew-join handling stand in for
      the reference's hand-tuned stage widths (v2/main.py:223,231).
    - shuffle.partitions defaults to the harness CPU count — at 100 TB this
      would be set to ~2-3x total executor cores instead; AQE coalesces
      either way.
    - Arrow enabled: every Pandas-UDF path (custom reducers, multimodal
      feature extraction) moves data in columnar batches, never per row.
    """
    cpus = int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Post-shuffle coalescing mode (guide §2.2). parallelismFirst
        # stays at Spark's default TRUE locally: an earlier r12 attempt
        # set it false so AQE honors the advisory size (collapsing
        # small/mid shuffles to few tasks, -22% on a 12-query
        # overhead-bound subset), but a broader interleaved A/B over a
        # 24-query slice showed that coalescing-by-size collapses
        # byte-light FLOP-DENSE stages onto one core — winnowing's
        # posting pipeline -41%, audio landmark matching -49%, pHash
        # banding -43% when parallelism-first was restored, and even the
        # overhead-bound queries preferred it (B_total 99.1 s vs 119.5 s
        # — tools/ab_conf.py, 4 interleaved passes). Bytes systematically
        # under-state compute at bench scale, so parallelism wins. At
        # cluster scale (100 MB–1 GB partitions, guide §9) set
        # SPARK_GRAFT_COALESCE_PARALLELISM_FIRST=false plus
        # SPARK_GRAFT_ADVISORY_PARTITION=256m — parameterised, not baked
        # in; compute-dense operators additionally pin their parallelism
        # explicitly with repartition(n, keys), which AQE respects.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_COALESCE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
