"""Dataset maintenance: small-file compaction and incremental
partition processing.

No reference equivalent — the reference (a single-node queue framework)
never owns a dataset long enough to need housekeeping. At 100 TB these
are the jobs that keep the engine's own outputs scannable:

- **Compaction**: streaming/CDC/append sinks accumulate small files;
  a scan of 10^6 × 1 MB files spends more time in task scheduling and
  footer reads than in I/O. Compaction rewrites a dataset to
  ~`target_file_mb` files using the same write-to-tmp + directory-swap
  crash posture as streaming.foreach_batch_cdc_apply.
- **Incremental processing**: a daily pipeline must not rescan 100 TB
  to process yesterday's partition. `new_partition_values` diffs the
  partition listing against a persisted high-water state; callers read
  only those partitions (partition-pruned scan — the filter lands in
  PartitionFilters, verified in tests/test_maintenance.py).
"""

from __future__ import annotations

import json
import math
import os
import shutil
from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dataset_bytes(path: str) -> int:
    """Total bytes of data files under `path` (driver-side listing; a
    cluster deployment would use the FileSystem API / catalog stats —
    same number, different listing call)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    """Number of data files under `path` (ignores _SUCCESS/dotfiles)."""
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: Sequence[str] = (),
    sort_within_by: Sequence[str] = (),
) -> int:
    """Rewrite the parquet dataset at `path` into ~target_file_mb files;
    returns the new data-file count.

    Sizing is estimated from the CURRENT on-disk bytes (already
    compressed, so the estimate is conservative in the right
    direction — recompacted files land at or under target). The rewrite
    goes to `path + ".tmp"` first and the directory is swapped only
    after the write commits, so a mid-compaction crash leaves the
    original dataset intact.

    `sort_within_by` orders rows inside each output file (no shuffle —
    sortWithinPartitions) which clusters similar values for better
    column compression and tighter min/max zone maps on those columns.
    """
    n_files = max(1, math.ceil(_dataset_bytes(path) / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files, *partition_by) if partition_by else df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + ".tmp"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return data_file_count(path)


def list_partition_values(spark: SparkSession, path: str, partition_col: str) -> list[str]:
    """Distinct hive-style partition values present under `path`,
    read from the directory layout (metadata-only — no data scan)."""
    prefix = partition_col + "="
    vals = sorted(
        p.name[len(prefix):]
        for p in Path(path).iterdir()
        if p.is_dir() and p.name.startswith(prefix)
    )
    return vals


def new_partition_values(
    spark: SparkSession, path: str, partition_col: str, state_path: str
) -> list[str]:
    """Partition values present on disk but not yet recorded in the
    JSON state file — the increment a scheduled run should process."""
    seen: set[str] = set()
    if os.path.exists(state_path):
        with open(state_path) as fh:
            seen = set(json.load(fh)["processed"])
    return [v for v in list_partition_values(spark, path, partition_col) if v not in seen]


def mark_processed(state_path: str, values: Sequence[str]) -> None:
    """Append `values` to the processed set (write-tmp + rename so a
    crash never truncates the state; at cluster scale this file lives
    on the shared FS or in a catalog table)."""
    seen: set[str] = set()
    if os.path.exists(state_path):
        with open(state_path) as fh:
            seen = set(json.load(fh)["processed"])
    seen.update(values)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"processed": sorted(seen)}, fh)
    os.replace(tmp, state_path)


def process_new_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    state_path: str,
    fn: Callable[[DataFrame], None],
) -> list[str]:
    """Incremental run: apply `fn` to ONLY the not-yet-processed
    partitions, then advance the state. The read filters on the
    partition column with an IN-list of literal values, so the scan is
    partition-pruned — Spark lists and reads just those directories
    (PartitionFilters in the plan; the 100 TB history is never touched).

    State advances AFTER fn returns: a crash mid-run reprocesses the
    same increment next time (at-least-once; fn should write
    idempotently, e.g. mode("overwrite") into per-partition output).
    Returns the partition values processed this run.
    """
    todo = new_partition_values(spark, path, partition_col, state_path)
    if not todo:
        return []
    df = spark.read.parquet(path).filter(F.col(partition_col).isin(todo))
    fn(df)
    mark_processed(state_path, todo)
    return todo
