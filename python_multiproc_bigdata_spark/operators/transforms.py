"""Per-row transforms (SURVEY §2.2 T1–T10).

The reference's transformer contract — extract a key path, map it, carry
selected values through, drop keys, skip ignored results
(v2/core/transformers/commons.py:10-61) — is exactly the
select/withColumn/filter spine of a DataFrame plan. Each helper below is a
documented `DataFrame -> DataFrame` so user pipelines compose the same way
the reference's operator trees did, while Catalyst still sees one flat
declarative plan (function composition ≡ flatMapApply, T7,
v2/core/commons.py:46-56).

Key paths: the reference addresses nested dicts by key-path lists
(dict_deep_get, v2/core/commons.py:29-44). Spark nested structs use the
same dotted reference (`F.col("a.b.c")`), so a key path ['a','b','c'] is
just "a.b.c" here.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_scan(
    df: DataFrame,
    *key_cols: str,
    min_parts: int | None = None,
    per_part_bytes: int | None = None,
) -> DataFrame:
    """Guarantee a FLOP-dense downstream stage at least `min_parts`-way
    parallelism (default: the cluster's defaultParallelism) — r12,
    guide §2.5 "input skew: one huge unsplittable file".

    A small parquet file is one scan split, so everything mapped over it
    (from-spec decoders in mapInPandas, 64-dim cosine folds) runs on ONE
    core no matter the cluster width; bytes-based AQE coalescing cannot
    help because no exchange exists below the map. When the input
    relation already fans out >= min_parts partitions — the 100 TB case,
    where a scan has thousands of splits — this is a NO-OP and the plan
    carries no extra exchange; otherwise it hash-repartitions on the
    given key columns (deterministic under task retries, unlike
    round-robin — guide §2.5 / SPARK-38388). Results are unaffected:
    every consumer is either per-row or keyed/rank-stable.

    Streaming inputs pass through untouched (their micro-batch
    parallelism is the source's).

    Probe cost: the obvious probe (`df.rdd.getNumPartitions()`) runs the
    FULL physical planning of the subtree on the driver and throws it
    away — measured ~0.4 s per call on the 9-table dq panels, which
    swamped the win it was buying. The probe below stays on the already-
    analyzed logical plan: any shuffle-introducing operator in the
    lineage means the relation is `spark.sql.shuffle.partitions` wide
    (sized >= cores by session contract) — no-op; a pure narrow-over-
    files plan gets its split count estimated from the file listing the
    scan already holds (Spark's own packing formula: files are charged
    `openCostInBytes` and packed into `maxPartitionBytes` splits). Only
    odd shapes (limits, samples, local relations) fall back to the
    `.rdd` probe.

    `per_part_bytes` makes the target width data-proportional instead of
    unconditional: fan to ceil(scan_bytes / per_part_bytes) partitions,
    capped at the cluster width. Use it when per-row work tracks row
    BYTES (relational aggregates, hashing) so a 2 KB dimension table
    never pays an exchange + 32-task stage for nothing; leave it unset
    where tiny rows carry heavy compute (decoder ids, vector folds) and
    full width is wanted regardless of input size."""
    if df.isStreaming:
        return df
    n = min_parts or df.sparkSession.sparkContext.defaultParallelism
    cur, scan_bytes = _estimated_parts(df)
    if cur is None:
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001 — parallelism probe is best-effort
            return df
    if per_part_bytes and scan_bytes is not None:
        n = min(n, max(1, -(-scan_bytes // per_part_bytes)))
    # No-op already at a QUARTER of target parallelism, not just at the
    # target: operators apply this to their own input, which may be a
    # post-shuffle relation (shuffle.partitions-wide) rather than a raw
    # scan — re-exchanging 16 partitions into 32 buys ~nothing, while
    # the 1-split scan case this helper exists for still fans out.
    if cur * 4 >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in key_cols])


# Logical operators whose output is shuffle.partitions wide (or wider):
# seeing any of these in the analyzed plan means the input is already
# fanned out, so the probe can skip both planning and file listing.
_WIDE_PLAN_NODES = (
    "Join",
    "Aggregate",
    "Repartition",  # also matches RepartitionByExpression
    "Rebalance",
    "Window",
    "Deduplicate",
    "Sort",
    "Expand",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
)

# Operators that SHRINK partitioning below the scan's split count
# (GlobalLimit collapses to one partition); the cheap file-based
# estimate would overstate parallelism, so punt to the .rdd probe.
_NARROWING_PLAN_NODES = ("Limit", "Sample", "Offset", "Tail")


def _parse_bytes(v: str) -> int:
    """Spark size conf string ('134217728b', '128m', '1g') → bytes."""
    s = v.strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("b", 1), ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    return int(s) * mult


def _estimated_parts(df: DataFrame) -> tuple[int | None, int | None]:
    """(partition-count estimate, scan bytes) from the analyzed plan +
    file listing, without physical planning. (None, None) = can't tell
    cheaply (caller falls back to the .rdd probe); bytes are None
    whenever the input is not a pure narrow-over-files plan."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(k in plan for k in _NARROWING_PLAN_NODES):
            return None, None
        if any(k in plan for k in _WIDE_PLAN_NODES):
            # post-shuffle width; session contract keeps
            # shuffle.partitions >= defaultParallelism, so report the
            # target itself (always a no-op under the quarter rule).
            return df.sparkSession.sparkContext.defaultParallelism, None
        files = df.inputFiles()
        if not files:
            return None, None  # LocalRelation / in-memory seeds
        spark = df.sparkSession
        maxpb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
        opencost = _parse_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4m")
        )
        # Packing lower bound: n_files * openCost alone already filling
        # the needed splits means no-op without touching the filesystem.
        n = df.sparkSession.sparkContext.defaultParallelism
        if len(files) * opencost >= n * maxpb:
            return n, None
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            total += fs.getFileStatus(p).getLen()
        # Spark packs small files together (each charged openCost), so
        # the split count is the packed total over maxPartitionBytes.
        return max(1, -(-(total + len(files) * opencost) // maxpb)), total
    except Exception:  # noqa: BLE001 — probe is best-effort
        return None, None


def keypath(path: Sequence[str] | str) -> str:
    """Reference key-path list → Spark nested-field reference."""
    return path if isinstance(path, str) else ".".join(path)


def static_values(df: DataFrame, assignments: dict[str, object]) -> DataFrame:
    """T3 (`static_values_1`): set constant columns
    (one_to_one.py:34-36) ≡ `withColumn(c, lit(v))`."""
    out = df
    for col, val in assignments.items():
        out = out.withColumn(col, F.lit(val))
    return out


def _compose(col: Column, fns: Sequence[Callable[[Column], Column]]) -> Column:
    """Function-composition chain over a column, null-safe: the reference
    skips the mapper chain entirely when the value is null
    (one_to_one.py:41-44 guards, mapper never sees null)."""
    expr = col
    for fn in fns:
        expr = fn(expr)
    # Typed-null branch: putting `col` itself in the null arm would force
    # CASE branch-type unification with the mapper output (string vs
    # array<string> fails analysis); a bare null coerces to the output type.
    return F.when(col.isNull(), F.lit(None)).otherwise(expr)


def trans_values(
    df: DataFrame, rules: Sequence[tuple[str, Sequence[Callable[[Column], Column]]]]
) -> DataFrame:
    """T4 (`trans_values_3`): in-place rewrite of columns through composed
    column functions, null-preserving (one_to_one.py:38-46)."""
    out = df
    for col, fns in rules:
        out = out.withColumn(col, _compose(F.col(col), fns))
    return out


def derive_values(
    df: DataFrame,
    rules: Sequence[tuple[str, str, Sequence[Callable[[Column], Column]]]],
) -> DataFrame:
    """T5 (`derived_values_2`): new column = composed functions of another
    column (one_to_one.py:48-56). Rules are (in_col, out_col, [fn...])."""
    out = df
    for in_col, out_col, fns in rules:
        out = out.withColumn(out_col, _compose(F.col(in_col), fns))
    return out


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """T6: `remove_key_paths` ≡ df.drop (one_to_one.py:59-61)."""
    return df.drop(*cols)


def filter_tokens(
    df: DataFrame,
    col: str = "word",
    min_len: int | None = None,
    max_len: int | None = None,
    drop_blank: bool = True,
) -> DataFrame:
    """T10: the reference's word filters — `ignore_word_fn=str.isspace`
    drops whitespace tokens (v2/main.py:103,132) and v1 keeps
    `1 < len(word) < 16` (v1/utils.py:266-269). Bounds are exclusive to
    match v1."""
    out = df
    if drop_blank:
        out = out.filter(~F.col(col).rlike(r"^\s*$"))
    if min_len is not None:
        out = out.filter(F.length(col) > min_len)
    if max_len is not None:
        out = out.filter(F.length(col) < max_len)
    return out


def project_values_path(
    df: DataFrame, values_path: Sequence[tuple[str, str, bool]]
) -> DataFrame:
    """T8 + schema materialization: the loader-side `values_path` contract
    — ordered (column_name, key_path, required) triples; the whole row is
    dropped when a required value is null (v2/core/loaders/commons.py:55-62).

    ≡ na.drop(subset=required) + select with aliases. This is where the
    reference's schemaless stream becomes a schema'd relation (§1.3).
    """
    selected = df.select(
        *[F.col(keypath(path)).alias(name) for name, path, _req in values_path]
    )
    required = [name for name, _path, req in values_path if req]
    return selected.na.drop(subset=required) if required else selected


def with_global_index(
    df: DataFrame,
    order_by,
    out_col: str = "idx",
    n_buckets: int = 32,
    cumsum: "dict[str, str] | None" = None,
) -> DataFrame:
    """Global 0-based dense index by a unique orderable key WITHOUT a
    single-partition sort (the scalable zipWithIndex: training-shard
    sample numbering, stable row addressing).

    `orderBy + row_number over ()` funnels 100 TB through ONE task; this
    splits the sort: (1) approxQuantile learns ~n_buckets range
    boundaries (driver gets n_buckets doubles, never data), (2) rows
    rank within their range bucket (parallel shuffle-by-bucket sort),
    (3) bucket counts — n_buckets rows — cumsum into offsets broadcast
    back as a literal map. idx = offset[bucket] + rank - 1. Boundaries
    only steer bucket sizes; any boundary skew changes parallelism, not
    correctness.

    `order_by` is a column name or a LIST of names forming the total
    order, all ascending (pre-negate a numeric column for DESC legs).
    The FIRST column must be NUMERIC (approxQuantile learns cuts on it;
    ties on it are fine — equal values land in one bucket) and the full
    tuple must be UNIQUE (ties across the whole key would make ranks
    retry-unstable).

    `cumsum` optionally maps value-column → output-column: each gets
    the running INCLUSIVE sum in the same global order, by the same
    split (within-bucket window sum + broadcast per-bucket sum offsets)
    — the scalable form of `sum().over(orderBy(...).rowsBetween(
    unboundedPreceding, 0))` for Pareto/coverage curves.

    Two jobs read the bucketed frame (the bucket count/sum stats and
    the final ranked materialization — the quantiles run on `df` before
    it exists, and the cuts only steer bucket SIZES, never
    correctness), so it is persisted while both run: on a
    non-deterministic input (sample(), re-read mutable source) separate
    recomputations could disagree between offsets and ranks, breaking
    the density/uniqueness guarantee. The RESULT is persisted and
    eagerly materialized (still inside the bucketed cache's lifetime),
    then the internal cache is released — so the operator leaks nothing
    the caller can't free: unpersist the RETURNED frame when done with
    it. Inputs must still be deterministic BETWEEN calls."""
    from pyspark.sql import Window

    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    key = cols[0]
    cums = dict(cumsum or {})
    # Cache the INPUT before the quantile job: approxQuantile is its own
    # action, and without this an expensive upstream (an LM-scoring
    # tower, a multi-join) is computed twice — once for the cuts, once
    # for the bucketed frame. If the caller already cached df, reuse
    # that cache and do NOT release it on exit — unpersisting an input
    # we didn't persist would silently consume the caller's cache.
    lvl = df.storageLevel
    caller_cached = lvl.useMemory or lvl.useDisk
    src = df if caller_cached else df.persist()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(set(src.approxQuantile(key, qs, 0.001)))
    bucket = F.lit(0)
    for i, c in enumerate(cuts):
        bucket = F.when(F.col(key) > F.lit(c), i + 1).otherwise(bucket)
    b = src.withColumn("_gb", bucket).persist()
    w = Window.partitionBy("_gb").orderBy(*[F.asc(c) for c in cols])
    ranked = b.withColumn("_rk", F.row_number().over(w))
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    for val, out in cums.items():
        ranked = ranked.withColumn(f"_cs_{out}", F.sum(val).over(running))
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(val).alias(f"_s_{out}") for val, out in cums.items()
    ]
    stats = sorted(
        (r["_gb"], r) for r in b.groupBy("_gb").agg(*aggs).collect()
    )
    offsets: dict[int, int] = {}
    sum_offsets: dict[str, dict[int, int]] = {out: {} for out in cums.values()}
    acc = 0
    sum_acc = {out: 0 for out in cums.values()}
    for gb, row in stats:
        offsets[gb] = acc
        acc += row["_n"]
        for out in cums.values():
            sum_offsets[out][gb] = sum_acc[out]
            sum_acc[out] += row[f"_s_{out}"] or 0
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    result = ranked.withColumn(
        out_col,
        (F.element_at(omap, F.col("_gb")) + F.col("_rk") - 1).cast("long"),
    )
    for out in cums.values():
        smap = F.create_map(
            *[F.lit(x) for kv in sum_offsets[out].items() for x in kv]
        )
        result = result.withColumn(
            out, F.element_at(smap, F.col("_gb")) + F.col(f"_cs_{out}")
        ).drop(f"_cs_{out}")
    result = result.drop("_gb", "_rk").persist()
    result.count()  # materialize while b's cache is live → consistent
    b.unpersist()
    if not caller_cached:
        src.unpersist()
    return result
