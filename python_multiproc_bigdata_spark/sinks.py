"""Sinks (SURVEY §2.5 L1–L9).

The reference's loaders are hand-buffered, acked, reconnecting sink
workers over queues (csv files.py:11-101, mysql.py:10-135,
cassandra.py:11-112, load balancer loadbalancer.py:16-163). In Spark a
sink is a `DataFrameWriter` call: buffering, batching, parallelism and
retries belong to the writer/connector, so each mapping here is thin by
design — the *capability* is what carries over, not the machinery.

Every sink is a `DataFrame -> None` callable composing with
plans.pipeline.Pipeline (multi-sink fan-out = persist + N writes, L8).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

Sink = Callable[[DataFrame], None]


def noop_sink() -> Sink:
    """L2 NoopLoader: execute fully, write nothing (also the bench's
    full-materialization trick)."""

    def _write(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    return _write


def conditional_sink(condition: bool | Callable[[], bool], sink: Sink) -> Sink:
    """L3 ConditionalLoader: gate a wrapped sink on a bool/callable
    (reference v2/core/loaders/commons.py:67-109). Driver-side branch —
    the condition is a query-level decision, not a row filter."""

    def _write(df: DataFrame) -> None:
        if condition() if callable(condition) else condition:
            sink(df)

    return _write


def csv_sink(path: str, sep: str = ";", n_files: int | None = None, mode: str = "append") -> Sink:
    """L4 CSV_FileLoader: ';'-separated files (reference files.py:11-101).
    The reference's single-writer buffer (1000 rows) becomes distributed
    part-files; `n_files` stands in for its writer count."""

    def _write(df: DataFrame) -> None:
        out = df.coalesce(n_files) if n_files else df
        out.write.mode(mode).option("sep", sep).option("header", "true").csv(path)

    return _write


def parquet_sink(path: str, partition_by: Sequence[str] = (), mode: str = "overwrite") -> Sink:
    """The engine-native columnar sink (no reference equivalent — the
    upgrade path from L4)."""

    def _write(df: DataFrame) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return _write


def jdbc_sink(
    url: str,
    dbtable: str,
    batchsize: int = 10_000,
    num_partitions: int = 4,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> Sink:
    """L5/L7 MySQL_DBLoader + LoadBalanceLoader: JDBC writes with the
    reference's tuned constants as defaults — batch 10,000 rows
    (v2/main.py:210 'optimal') and 4 parallel writers (main.py:231
    '4 optimal') via numPartitions. Requires a JDBC driver jar on the
    classpath at runtime."""

    def _write(df: DataFrame) -> None:
        w = (
            df.repartition(num_partitions)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", dbtable)
            .option("batchsize", str(batchsize))
            .mode(mode)
        )
        for k, v in (properties or {}).items():
            w = w.option(k, v)
        w.save()

    return _write


def cassandra_sink(keyspace: str, table: str, mode: str = "append") -> Sink:
    """L6 Cassandra_DBLoader: needs the spark-cassandra-connector jar
    (not in this image — import-gated, raises a clear error if absent)."""

    def _write(df: DataFrame) -> None:
        try:
            (
                df.write.format("org.apache.spark.sql.cassandra")
                .options(keyspace=keyspace, table=table)
                .mode(mode)
                .save()
            )
        except Exception as exc:  # connector jar missing in this image
            raise RuntimeError(
                "cassandra sink requires the spark-cassandra-connector jar "
                "on the classpath"
            ) from exc

    return _write


def batchedstore_sink(path: str, buffer_size: int = 500, mode: str = "overwrite") -> Sink:
    """L6's SPI-proven twin: the reference Cassandra loader's contract —
    lazy connect, `buffer_size`-bounded batch execution, residual flush,
    driver-side finalize (reference cassandra.py:11-112) — implemented
    as a REGISTERED Spark 4 Python Data Source (sources/pydatasource.py)
    rather than a construction-only stub. The live-Cassandra gap remains
    (no server in this image; cassandra_sink above carries the jar-gated
    real path); what this proves is the engine's custom-connector SPI:
    write → two-phase commit → partition-parallel read-back."""

    def _write(df: DataFrame) -> None:
        from python_multiproc_bigdata_spark.sources.pydatasource import (
            BatchedStoreDataSource,
        )

        spark = df.sparkSession
        spark.dataSource.register(BatchedStoreDataSource)
        (
            df.write.format("batchedstore")
            .option("path", path)
            .option("buffer_size", str(buffer_size))
            .mode(mode)
            .save()
        )

    return _write


def multi_sink(*sinks: Sink) -> Sink:
    """L8 fan-out: every row to every sink (reference replicates items to
    all loader queues, pipline.py:127-135). Caller should persist first —
    plans.pipeline.Pipeline does this automatically for >1 sink."""

    def _write(df: DataFrame) -> None:
        for s in sinks:
            s(df)

    return _write


def jsonl_sink(path: str, mode: str = "overwrite") -> Sink:
    """L-series extension: JSONL corpus sink (see sources/files.py
    read_jsonl — the LLM-corpus interchange format)."""

    def _write(df: DataFrame) -> None:
        df.write.mode(mode).json(path)

    return _write


def xml_sink(path: str, row_tag: str = "doc", mode: str = "overwrite") -> Sink:
    """XML sink (Spark 4 built-in format) — the interchange hop for
    systems that still speak XML feeds; one file per partition, so the
    read side stays parallel (XML is not splittable within a file)."""

    def _write(df: DataFrame) -> None:
        (
            df.write.format("xml")
            .option("rowTag", row_tag)
            .mode(mode)
            .save(path)
        )

    return _write
