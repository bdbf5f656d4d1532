"""Shared plumbing for registry queries."""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None → rows-only correctness check. A zero-arg callable
    # defers generation to first use (e.g. the kmeans-IVF oracle retrains
    # its deterministic centroids from parquet and embeds them as
    # literals) — resolve with `resolve_oracle`.
    oracle: str | Callable[[], str] | None

    def resolve_oracle(self) -> str | None:
        return self.oracle() if callable(self.oracle) else self.oracle


_PKG_ZIP: str | None = None
_PKG_ZIP_LOCK = threading.Lock()


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    The driver imports us from an arbitrary cwd via __spark_entry__'s
    sys.path patch — but executor Python workers have their own sys.path,
    so any cloudpickled closure referencing module-level functions (e.g.
    mapInPandas feature extraction) would die with ModuleNotFoundError.
    A zip of the package on every worker's sys.path fixes the whole class.

    Thread-safe: queries that build independent towers from a driver
    thread pool (guide §2.6, e.g. eval_tokenizer_compare) call prep()
    concurrently, and a double addPyFile of a zip being concurrently
    rebuilt is a JVM error — the lock makes the build+add a critical
    section, the flag keeps the common path lock-free-after-first.
    """
    global _PKG_ZIP
    sc = spark.sparkContext
    if getattr(sc, "_pmb_pyfiles_added", False):
        return
    with _PKG_ZIP_LOCK:
        if getattr(sc, "_pmb_pyfiles_added", False):
            return
        if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
            pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            tmp = tempfile.mkdtemp(prefix="pmb_pyfiles_")
            _PKG_ZIP = shutil.make_archive(
                os.path.join(tmp, "python_multiproc_bigdata_spark"),
                "zip",
                root_dir=os.path.dirname(pkg_dir),
                base_dir="python_multiproc_bigdata_spark",
            )
        sc.addPyFile(_PKG_ZIP)
        sc._pmb_pyfiles_added = True


def fixture_root(name: str, sf_dir: str) -> str:
    """Stable, self-cleaning staging dir for queries that must
    materialize fixtures (streaming micro-batch inputs, CDC targets,
    LSH signature tables). A fresh mkdtemp per invocation leaks a
    corpus copy every run — bench executes headline queries 3-5x per
    round — so instead the path is deterministic per (query, sf_dir)
    and each invocation removes the previous run's tree before
    recreating it. Removing the whole root also resets any streaming
    checkpoint inside it, so every run reprocesses from scratch (which
    is what the fixture queries intend)."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"pmb_fix_{name}_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    return root


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime confs the oracle comparison depends on, regardless of
    how the caller built the session (the driver uses its own), and make
    the package importable on executor Python workers."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ensure_pyfiles(spark)
    return spark


# (sf_dir, table) -> StructType. Schema METADATA only — the catalog /
# metastore role (guide §6: manifest metadata beats re-deriving layout
# per read): a bare read.parquet() re-infers the schema from file
# footers on EVERY call, measured ~200 ms per table at bench scale,
# paid again for every bench repeat. Caching the schema (never data,
# never results — each invocation still scans parquet and computes)
# turns that into a one-time cost per (sf_dir, table). The corpus
# files are immutable inputs; a changed sf_dir keys a fresh entry.
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}

# (appId, sf_dir, table) -> DataFrame. The resolved RELATION, not data:
# a DataFrame is an immutable logical plan + file-index snapshot, so
# handing the same object to every consumer is exactly what a catalog
# `spark.table("name")` does — no rows, no results, every action still
# scans parquet. Saves the ~80–120 ms relation-resolution round trip
# the schema cache alone cannot remove. Keyed by applicationId so a
# fresh session never sees another session's plan objects.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _DF_CACHE.get(key)
    if df is not None:
        return df
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        path = f"{sf_dir}/{name}.parquet"
        sch = _SCHEMA_CACHE.get((sf_dir, name))
        if sch is None:
            df = spark.read.parquet(path)
            _SCHEMA_CACHE[(sf_dir, name)] = df.schema
        else:
            df = spark.read.schema(sch).parquet(path)
    _DF_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with a normalized TIMESTAMP `ts` column,
    adapting to how the generator stored it:

    - TIMESTAMP(NANOS): Spark's reader rejects it, so read the raw int64
      nanos (legacy.parquet.nanosAsLong) and truncate to microseconds
      with integer division — exactly DuckDB's TIMESTAMP_NS → TIMESTAMP
      truncation, keeping the oracle comparable. (Float division would
      lose precision: epoch-nanos ≈ 1.7e18 exceeds a double's 53-bit
      integer range.)
    - timestamp[us] (no tz): Spark infers TIMESTAMP_NTZ; cast to the
      session-local TIMESTAMP (session tz is pinned UTC in prep()) so the
      wall-clock values and downstream window/date arithmetic match what
      DuckDB computes on its naive TIMESTAMP.
    """
    from pyspark.sql import functions as F

    # Scoped, not leaked: the scan binds its schema when spark.read
    # .parquet() resolves the relation (verified: a nanos file read with
    # the flag set still executes after the flag is restored), so a host
    # app sharing this session never inherits the legacy flag.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        # same schema-metadata cache as table(): skip per-call footer
        # inference once the layout is known (the flag stays set either
        # way — the nanos→long mapping is checked at scan time too)
        sch = _SCHEMA_CACHE.get((sf_dir, "events"))
        reader = spark.read.schema(sch) if sch is not None else spark.read
        raw = reader.parquet(f"{sf_dir}/events.parquet")
        raw.schema  # force relation resolution inside the scoped window
        _SCHEMA_CACHE[(sf_dir, "events")] = raw.schema
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if ts_type != "timestamp":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw
