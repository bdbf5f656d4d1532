"""Dataset maintenance: small-file compaction and incremental
partition processing.

No reference equivalent — the reference (a single-node queue framework)
never owns a dataset long enough to need housekeeping. At 100 TB these
are the jobs that keep the engine's own outputs scannable:

- **Compaction**: streaming/CDC/append sinks accumulate small files;
  a scan of 10^6 × 1 MB files spends more time in task scheduling and
  footer reads than in I/O. Compaction rewrites a dataset to
  ~`target_file_mb` files using a rename-based swap (see
  `_swap_directories`) so readers never observe a half-written state.
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
import urllib.parse
from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tree_bytes(path: str) -> int:
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


def _swap_directories(path: str, tmp: str) -> None:
    """Replace the dataset at `path` with the one at `tmp` using two
    renames: path→path.old, tmp→path, then delete path.old. Renames are
    instant, so the only unreadable window is between the two renames
    (microseconds) — never during the long rmtree of the old data,
    which now happens AFTER the new dataset is live. A crash mid-swap
    leaves the data recoverable at path.old or path.tmp. On a real
    deployment this is an atomic catalog/table-format commit
    (Delta/Iceberg); the rename pair is the filesystem approximation."""
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


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
    direction — recompacted files land at or under target). For a
    hive-partitioned dataset the shuffle key is (partition columns +
    a hash salt bounded by the LARGEST partition's own file budget):
    without the salt every hive partition hashes to a single task and
    writes one file regardless of size; with it a 10 GB day still
    splits into ~ceil(10 GB / target) files while small days stay at
    one. The rewrite lands at `path + ".tmp"` and goes live via a
    rename swap (`_swap_directories`) — readers never see a partial
    dataset and a crash leaves the data recoverable.

    `sort_within_by` orders rows inside each output file (no shuffle —
    sortWithinPartitions) which clusters similar values for better
    column compression and tighter min/max zone maps on those columns.
    """
    target_bytes = target_file_mb * 1024 * 1024
    n_files = max(1, math.ceil(_tree_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    if partition_by:
        part_dirs = [
            os.path.join(path, p.name)
            for p in Path(path).iterdir()
            if p.is_dir() and not p.name.startswith((".", "_"))
        ]
        biggest = max((_tree_bytes(p) for p in part_dirs), default=0)
        per_part_files = max(1, math.ceil(biggest / target_bytes))
        salt = F.pmod(
            F.xxhash64(*[c for c in df.columns if c not in partition_by]),
            F.lit(per_part_files),
        )
        out = df.repartition(n_files, *[F.col(c) for c in partition_by], salt)
    else:
        out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + ".tmp"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    _swap_directories(path, tmp)
    return data_file_count(path)


def list_partition_values(path: str, partition_col: str) -> list[str]:
    """Distinct hive-style partition values present under `path`, read
    from the directory layout (metadata-only — no data scan). Directory
    names are hive-UNESCAPED (%3A → ':', etc.) so the returned values
    compare equal to the column values — an escaped name fed to an
    isin() filter would match zero rows and silently skip the
    partition."""
    prefix = partition_col + "="
    return sorted(
        urllib.parse.unquote(p.name[len(prefix):])
        for p in Path(path).iterdir()
        if p.is_dir() and p.name.startswith(prefix)
    )


def _read_state(state_path: str) -> set[str]:
    if os.path.exists(state_path):
        with open(state_path) as fh:
            return set(json.load(fh)["processed"])
    return set()


def new_partition_values(path: str, partition_col: str, state_path: str) -> list[str]:
    """Partition values present on disk but not yet recorded in the
    JSON state file — the increment a scheduled run should process."""
    seen = _read_state(state_path)
    return [v for v in list_partition_values(path, partition_col) if v not in seen]


def mark_processed(state_path: str, values: Sequence[str]) -> None:
    """Append `values` to the processed set (write-tmp + rename so a
    crash never truncates the state; at cluster scale this file lives
    on the shared FS or in a catalog table)."""
    seen = _read_state(state_path) | set(values)
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
    todo = new_partition_values(path, partition_col, state_path)
    if not todo:
        return []
    df = spark.read.parquet(path).filter(F.col(partition_col).isin(todo))
    fn(df)
    mark_processed(state_path, todo)
    return todo
