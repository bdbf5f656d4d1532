"""Integration smoke for the JDBC write path (L5/L7): Spark ships the
embedded Derby driver (it backs the Hive metastore), so the full
df.write.jdbc roundtrip — 4 parallel writers, batched inserts — is
provable in-image without a DB server. MySQL specifics (dialect,
retry/rollback) stay construction-only as documented in sinks.py."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.sinks import jdbc_sink

DERBY_URL = "jdbc:derby:/tmp/spark_graft_derby_test;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_sink_roundtrip(spark):
    shutil.rmtree("/tmp/spark_graft_derby_test", ignore_errors=True)
    df = spark.range(0, 1000).select("id", (F.col("id") % 7).alias("k"))
    jdbc_sink(
        DERBY_URL, "t_smoke", num_partitions=4, mode="overwrite",
        properties=DERBY_PROPS,
    )(df)
    back = (
        spark.read.format("jdbc")
        .option("url", DERBY_URL)
        .option("dbtable", "t_smoke")
        .option("driver", DERBY_PROPS["driver"])
        .load()
    )
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 499500
    # load-balanced write: numPartitions governs writer parallelism (L7)
    assert back.select("k").distinct().count() == 7


def test_jdbc_partitioned_parallel_read(spark):
    """The scale-side JDBC READ shape: partitionColumn/lowerBound/
    upperBound/numPartitions splits the table into N range-predicate
    queries that execute in parallel — the only way a JDBC source feeds
    a large cluster without funneling through one connection."""
    shutil.rmtree("/tmp/spark_graft_derby_read", ignore_errors=True)
    url = "jdbc:derby:/tmp/spark_graft_derby_read;create=true"
    df = spark.range(0, 10000).select("id", (F.col("id") * 2).alias("v"))
    jdbc_sink(url, "t_part", num_partitions=2, mode="overwrite", properties=DERBY_PROPS)(df)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "t_part")
        .option("driver", DERBY_PROPS["driver"])
        .option("partitionColumn", "id")
        .option("lowerBound", 0)
        .option("upperBound", 10000)
        .option("numPartitions", 8)
        .load()
    )
    assert back.rdd.getNumPartitions() == 8  # range-split parallel scan
    assert back.count() == 10000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10000))
    # predicate pushdown reaches the JDBC source
    plan = back.filter(F.col("id") < 100)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(id,100)" in plan


def test_batchedstore_python_datasource_roundtrip(spark, tmp_path):
    """L6 SPI proof (r5): the batchedstore Python Data Source — lazy
    connect, buffer_size-bounded batch files, two-phase commit manifest,
    partition-parallel read-back — roundtrips values, batches correctly,
    and ignores uncommitted staging garbage."""
    import json
    import os

    from python_multiproc_bigdata_spark.sinks import batchedstore_sink
    from python_multiproc_bigdata_spark.sources.pydatasource import (
        MANIFEST,
        BatchedStoreDataSource,
    )

    path = str(tmp_path / "store")
    rows = [(i, f"name-{i}", float(i) / 4) for i in range(57)]
    df = spark.createDataFrame(rows, ["id", "name", "score"]).repartition(4)
    batchedstore_sink(path, buffer_size=10)(df)

    # manifest exists and names only committed batch files
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["files"], "no batch files committed"
    # buffer_size=10 over 4 partitions of 57 rows → every batch ≤ 10 rows
    for name in manifest["files"]:
        with open(os.path.join(path, name)) as f:
            assert sum(1 for _ in f) <= 10

    # uncommitted garbage in the directory must be invisible to the read
    with open(os.path.join(path, "batch-orphan.jsonl"), "w") as f:
        f.write(json.dumps([999, "ghost", 0.0]) + "\n")

    spark.dataSource.register(BatchedStoreDataSource)
    back = spark.read.format("batchedstore").option("path", path).load()
    assert back.schema.simpleString() == df.schema.simpleString()
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got == sorted(rows)
    # parallel read: one partition per committed batch file
    assert back.rdd.getNumPartitions() == len(manifest["files"])


def test_batchedstore_stream_reader_incremental(spark, tmp_path):
    """Streaming half of the connector SPI: the batchedstore manifest
    consumed as an append log. Pass 1 (availableNow) reads the initial
    batches; after more files are committed, pass 2 FROM THE SAME
    CHECKPOINT reads only the new ones (offset = files consumed)."""
    import json
    import os

    from python_multiproc_bigdata_spark.sinks import batchedstore_sink
    from python_multiproc_bigdata_spark.sources.pydatasource import (
        MANIFEST,
        BatchedStoreDataSource,
    )

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)], ["id", "name", "score"]
    ).coalesce(1)
    batchedstore_sink(path, buffer_size=100)(df)

    spark.dataSource.register(BatchedStoreDataSource)
    ckpt = str(tmp_path / "ckpt")

    def drain(_name):
        got: set = set()
        q = (
            spark.readStream.format("batchedstore")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda bdf, _bid: got.update(r.id for r in bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    assert drain("bs_pass1") == set(range(20))

    # commit a second batch file by hand (append to the manifest — the
    # writer's own append path would also work; the reader contract is
    # the on-disk layout)
    extra = "batch-extra.jsonl"
    with open(os.path.join(path, extra), "w") as f:
        for i in range(20, 25):
            f.write(json.dumps([i, f"n{i}", float(i)]) + "\n")
    with open(os.path.join(path, MANIFEST)) as f:
        m = json.load(f)
    m["files"].append(extra)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(m, f)

    # same checkpoint → only the new file's rows arrive in pass 2
    assert drain("bs_pass2") == set(range(20, 25))


def test_batchedstore_append_commit_is_append_only(tmp_path):
    """Regression (r6 advisory, medium): append-mode commit() used to
    rewrite the manifest as sorted(prev | new). Stream offsets are a
    consumed-file COUNT over that list, so a new uuid-named file sorting
    BEFORE consumed ones re-emitted a consumed file and permanently
    skipped the new one. The manifest must be append-only: prior entries
    keep their positions, new files land strictly at the end."""
    import json
    import os

    from pyspark.sql.types import IntegerType, StructField, StructType

    from python_multiproc_bigdata_spark.sources.pydatasource import (
        MANIFEST,
        BatchedStoreDataSource,  # noqa: F401 — import parity with siblings
        BatchFilesCommit,
        BatchedStoreWriter,
    )

    path = str(tmp_path / "store")
    os.makedirs(path)
    schema = StructType([StructField("id", IntegerType())])
    # a consumed manifest whose only entry sorts AFTER any new name
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({"files": ["batch-zz-consumed.jsonl"], "schema": schema.json()}, f)

    writer = BatchedStoreWriter({"path": path}, schema, overwrite=False)
    writer.commit([BatchFilesCommit(["batch-aa-new.jsonl"])])

    with open(os.path.join(path, MANIFEST)) as f:
        files = json.load(f)["files"]
    # old code produced ["batch-aa-new.jsonl", "batch-zz-consumed.jsonl"]
    assert files == ["batch-zz-consumed.jsonl", "batch-aa-new.jsonl"]
    # idempotent re-commit of the same message must not duplicate
    writer.commit([BatchFilesCommit(["batch-aa-new.jsonl"])])
    with open(os.path.join(path, MANIFEST)) as f:
        assert json.load(f)["files"] == ["batch-zz-consumed.jsonl", "batch-aa-new.jsonl"]


def test_batchedstore_stream_survives_writer_append(spark, tmp_path):
    """End-to-end half of the same regression: consume the store, then
    append MORE ROWS THROUGH THE WRITER'S OWN APPEND PATH (not by hand),
    with the initial committed file renamed so any uuid-named appendee
    would sort before it. The resumed stream must emit exactly the new
    rows — no re-emit of consumed files, no skip of the new one."""
    import json
    import os

    from python_multiproc_bigdata_spark.sinks import batchedstore_sink
    from python_multiproc_bigdata_spark.sources.pydatasource import (
        MANIFEST,
        BatchedStoreDataSource,
    )

    path = str(tmp_path / "store")
    df1 = spark.createDataFrame([(i, f"n{i}") for i in range(10)], ["id", "name"]).coalesce(1)
    batchedstore_sink(path, buffer_size=100)(df1)

    # rename the committed file to sort after every batch-<uuid> name —
    # makes the old sorted(prev|new) bug deterministic, not a coin flip
    with open(os.path.join(path, MANIFEST)) as f:
        m = json.load(f)
    assert len(m["files"]) == 1
    os.rename(os.path.join(path, m["files"][0]), os.path.join(path, "batch-zzzz.jsonl"))
    m["files"] = ["batch-zzzz.jsonl"]
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(m, f)

    spark.dataSource.register(BatchedStoreDataSource)
    ckpt = str(tmp_path / "ckpt")

    def drain():
        got: set = set()
        q = (
            spark.readStream.format("batchedstore")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda bdf, _bid: got.update(r.id for r in bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    assert drain() == set(range(10))

    df2 = spark.createDataFrame([(i, f"n{i}") for i in range(10, 14)], ["id", "name"]).coalesce(1)
    batchedstore_sink(path, buffer_size=100, mode="append")(df2)

    with open(os.path.join(path, MANIFEST)) as f:
        files = json.load(f)["files"]
    assert files[0] == "batch-zzzz.jsonl", f"consumed file moved: {files}"
    assert drain() == set(range(10, 14))
