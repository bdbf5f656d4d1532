"""Custom connector SPI via the Spark 4 Python Data Source API: the
`batchedstore` format — a batched, two-phase-commit writer plus a
partition-parallel reader over a local directory of batch files.

This exercises the ESSENCE of the reference's Cassandra loader
(reference v2/core/loaders/cassandra.py:11-112) without a Cassandra
server: that loader is a custom connector that (a) opens its connection
LAZILY on first flush, (b) buffers rows and executes them as
`buffer_size`-bounded prepared-statement batches, and (c) flushes the
residual buffer on close. Here each flushed batch becomes one JSONL
batch file (the stand-in for one batch execution against a store), the
"connection" is the lazily-created staging directory, and Spark's
two-phase commit protocol replaces the reference's close() flush:

  executor  write(iterator)  → stage batch files, return their names
  driver    commit(messages) → publish a _MANIFEST.json naming exactly
                               the committed files (+ schema DDL)
  driver    abort(messages)  → staged files stay orphaned and invisible
                               (the manifest is the source of truth)

The reader plans ONE InputPartition PER BATCH FILE from the manifest, so
reads parallelize like the JDBC partitioned reader (sinks.py L5) and
never list the directory (uncommitted garbage is ignored by design).

At 100 TB the same shape holds: batch files become key-ranges/tokens,
the manifest becomes the store's own metadata, and the lazy-connect +
bounded-batch + two-phase-commit contract is exactly what a real
Cassandra/DynamoDB writer needs. Binary columns are not supported by
the JSONL encoding (use parquet for blobs); this format's job is the
connector SPI, not a storage engine.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

MANIFEST = "_MANIFEST.json"


class BatchFilesCommit(WriterCommitMessage):
    """Names the batch files one task staged (picklable)."""

    def __init__(self, files: list[str]) -> None:
        self.files = files


class BatchedStoreWriter(DataSourceWriter):
    """Buffered batch writer: rows accumulate to `buffer_size`, then each
    flush writes ONE batch file — the analogue of one prepared-statement
    batch execution. The staging dir is created lazily on the first
    flush (the reference's lazy _connect)."""

    def __init__(self, options: dict[str, str], schema: StructType, overwrite: bool) -> None:
        self.path = options["path"]
        self.buffer_size = int(options.get("buffer_size", "500"))
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> BatchFilesCommit:
        buffer: list[list[Any]] = []
        files: list[str] = []
        connected = False

        def flush() -> None:
            nonlocal connected
            if not buffer:
                return
            if not connected:  # lazy connect, once per task
                os.makedirs(self.path, exist_ok=True)
                connected = True
            name = f"batch-{uuid.uuid4().hex}.jsonl"
            with open(os.path.join(self.path, name), "w") as f:
                for row in buffer:
                    f.write(json.dumps(row) + "\n")
            files.append(name)
            buffer.clear()

        for row in iterator:
            buffer.append(list(row))
            if len(buffer) >= self.buffer_size:
                flush()
        flush()  # residual buffer — the reference's close() flush
        return BatchFilesCommit(files)

    def commit(self, messages: Sequence[BatchFilesCommit]) -> None:
        files = sorted(f for m in messages if m is not None for f in m.files)
        os.makedirs(self.path, exist_ok=True)
        manifest = {"files": files, "schema": self.schema.json()}
        if not self.overwrite and os.path.exists(os.path.join(self.path, MANIFEST)):
            with open(os.path.join(self.path, MANIFEST)) as f:
                prev = json.load(f)
            # APPEND-ONLY: stream offsets are a consumed-file COUNT over
            # this list (BatchedStoreStreamReader), so already-published
            # entries must keep their positions — new files go strictly
            # at the end. A global re-sort could slot a new uuid-named
            # file BEFORE already-consumed ones, making the stream
            # re-emit a consumed file and permanently skip the new one.
            seen = set(prev["files"])
            manifest["files"] = prev["files"] + [f for f in files if f not in seen]
        tmp = os.path.join(self.path, f".{MANIFEST}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, MANIFEST))  # atomic publish

    def abort(self, messages: Sequence[BatchFilesCommit]) -> None:
        # staged files are invisible (not in the manifest); best-effort GC
        for m in messages:
            if m is None:
                continue
            for name in m.files:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass


class BatchedStoreReader(DataSourceReader):
    """Manifest-driven reader: one InputPartition per committed batch
    file — parallel, and blind to uncommitted staging garbage."""

    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        with open(os.path.join(self.path, MANIFEST)) as f:
            manifest = json.load(f)
        return [InputPartition(name) for name in manifest["files"]]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        with open(os.path.join(self.path, partition.value)) as f:
            for line in f:
                yield tuple(json.loads(line))


class BatchedStoreDataSource(DataSource):
    """spark.dataSource.register(BatchedStoreDataSource); then
    df.write.format("batchedstore").option("path", p).save() and
    spark.read.format("batchedstore").option("path", p).load()."""

    @classmethod
    def name(cls) -> str:
        return "batchedstore"

    def schema(self) -> StructType:
        with open(os.path.join(self.options["path"], MANIFEST)) as f:
            return StructType.fromJson(json.loads(json.load(f)["schema"]))

    def reader(self, schema: StructType) -> BatchedStoreReader:
        return BatchedStoreReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> BatchedStoreWriter:
        return BatchedStoreWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType) -> "BatchedStoreStreamReader":
        return BatchedStoreStreamReader(self.options)


class BatchedStoreStreamReader:
    """SimpleDataSourceStreamReader over the batchedstore layout: the
    manifest is an append-only log of committed batch files; the stream
    offset is HOW MANY of them have been consumed, so each micro-batch
    emits exactly the files that appeared since the last trigger and a
    crash replays deterministically from the checkpointed offset
    (exactly-once at the file granularity — the same contract Spark's
    own file source keeps). This is the streaming half of the custom
    connector SPI: a store written in bounded batches (the reference's
    Cassandra-loader shape) consumed as a CDC-ish append stream.

    read(start) never blocks: an unchanged manifest yields an empty
    batch with the same offset. Uncommitted staging files stay
    invisible — the manifest remains the only source of truth."""

    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"files_consumed": 0}

    def _manifest_files(self) -> list[str]:
        mpath = os.path.join(self.path, MANIFEST)
        if not os.path.exists(mpath):
            return []
        with open(mpath) as f:
            return json.load(f)["files"]

    def read(self, start: dict):
        files = self._manifest_files()
        rows: list[tuple] = []
        # a LIST, not a generator: the simple-reader protocol pickles the
        # prefetched records to cache them for replay between offsets
        for name in files[start["files_consumed"] :]:
            with open(os.path.join(self.path, name)) as f:
                rows.extend(tuple(json.loads(line)) for line in f)
        return rows, {"files_consumed": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._manifest_files()
        for name in files[start["files_consumed"] : end["files_consumed"]]:
            with open(os.path.join(self.path, name)) as f:
                for line in f:
                    yield tuple(json.loads(line))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to GC here
