"""Data-layout operators: Z-order (Morton) clustering and runtime
bloom-filter join pruning.

No reference equivalent (the reference — a single-node queue framework,
v2/core/transformers.py — never controls file layout); these are the two
layout levers that matter most at 100 TB:

- **Z-order clustering** interleaves the bits of two normalized sort
  keys so that sorting by the combined value co-locates rows that are
  close in BOTH dimensions. Parquet keeps per-row-group min/max stats;
  after a Z-order rewrite a predicate on EITHER column prunes most
  row groups (a plain single-column sort only prunes on that column).
  The whole computation is integer column arithmetic — JVM-side,
  whole-stage-codegen, no UDF — and the identical arithmetic runs in
  DuckDB for the correctness oracle.

- **Runtime bloom-filter pruning** is Spark's own InjectRuntimeFilter
  optimization: when a fact table shuffle-joins a dim side that carries
  a selective filter, Spark builds `bloom_filter_agg` over the dim join
  keys and injects `might_contain(...)` into the fact scan, discarding
  non-joining rows BEFORE the shuffle. We expose it as an operator that
  scopes the thresholds (at 100 TB the defaults fire on their own; at
  test scale they must be lowered) and forces optimization inside the
  scoped window so the session confs never leak.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# 16→32-bit "interleave with zero" spreading masks (public-domain
# bit-twiddling identity: x = (x | x<<8) & 0x00FF00FF ... | x<<1 &
# 0x55555555 places the 16 input bits at even positions).
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread the low 16 bits of `c` to the even bit positions of a
    32-bit value (long arithmetic throughout — no overflow: max
    intermediate is < 2^33)."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def spread_bits_sql(expr: str) -> str:
    """The DuckDB twin of `_spread_bits` as a SQL expression string —
    same shifts, same masks, BIGINT operators."""
    x = f"({expr} & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def normalize_16bit(c: Column, cmin: Column, cmax: Column) -> Column:
    """Scale integral `c` from [cmin, cmax] to [0, 65535]:
    floor((c - cmin) * 65535 / span). Matches DuckDB's integer `//`
    bit-for-bit: numerator and span are exact integers far below 2^53,
    and a correctly-rounded double quotient can only miss the floor at
    distances < 1/span from an integer, which exact integer ratios
    never produce (they are either exactly integral or ≥ 1/span away).
    """
    span = F.greatest(cmax - cmin, F.lit(1))
    return F.floor(((c - cmin) * 65535) / span).cast("long")


def z_value(x: Column, y: Column) -> Column:
    """Morton/Z-order value of two 16-bit-normalized coordinates: bits
    of `x` at even positions, bits of `y` at odd positions (32-bit
    result). Pure column math — stays inside whole-stage codegen."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def z_value_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB twin of `z_value` (expression string)."""
    return f"({spread_bits_sql(x_expr)} | ({spread_bits_sql(y_expr)} << 1))"


def with_z_value(
    df: DataFrame, cols: Sequence[str], out_col: str = "z"
) -> DataFrame:
    """Attach a Z-order column over two integral columns, min/max
    normalized to 16 bits each. Bounds come from one tiny global
    aggregate broadcast back onto every row (1-row crossJoin(broadcast)
    — the established scalar fan-out pattern, no shuffle of `df`
    itself). The input must be deterministic: bounds and values are
    computed in one plan, but a non-deterministic source re-read could
    still disagree across partitions.
    """
    if len(cols) != 2:
        raise ValueError(f"z-order needs exactly 2 columns, got {list(cols)}")
    cx, cy = cols
    bounds = df.agg(
        F.min(cx).alias("_xmin"),
        F.max(cx).alias("_xmax"),
        F.min(cy).alias("_ymin"),
        F.max(cy).alias("_ymax"),
    )
    nx = normalize_16bit(F.col(cx), F.col("_xmin"), F.col("_xmax"))
    ny = normalize_16bit(F.col(cy), F.col("_ymin"), F.col("_ymax"))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, z_value(nx, ny))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    target_files: int,
) -> None:
    """Rewrite `df` as `target_files` parquet files clustered on the
    Z-order of `cols`: range-partition on the z-value (contiguous,
    non-overlapping z-ranges per file — a hash repartition would send
    every z-range to every file and destroy the min/max stats), then
    sort within each file so row groups inside a file are tight too.
    The z column itself is dropped from the output — it is layout, not
    data; a reader filtering on either source column gets the pruning
    via parquet min/max stats without schema changes.

    At 100 TB this is the same job shape as `compact_parquet`: one
    range shuffle + write. repartitionByRange samples the z
    distribution for balanced file sizes (skewed key regions get more
    files, which is what you want).
    """
    zdf = with_z_value(df, cols, out_col="_z")
    (
        zdf.repartitionByRange(target_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# Confs that make InjectRuntimeFilter fire at test scale. At production
# scale only autoBroadcastJoinThreshold matters (the scenario is "dim
# side too large to broadcast"); the two size thresholds are already
# crossed by any 100 TB fact scan.
_BLOOM_CONFS: dict[str, str] = {
    # fact side: always consider the scan large enough to protect
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # dim side may not broadcast — broadcast joins don't need blooms
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def bloom_pruned_join(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    finish: "Callable[[DataFrame], DataFrame] | None" = None,
) -> "DataFrame":
    """Shuffle-join `fact` to the (pre-filtered, selective) `dim` with
    Spark's runtime bloom filter injected into the fact scan. Returns a
    DataFrame whose OPTIMIZED plan already contains the
    `might_contain(bloom_filter_agg(...))` fact-side filter.

    Implementation note: InjectRuntimeFilter is a logical-optimizer
    rule, so it reads the session confs when the plan is OPTIMIZED —
    not when this function is called. We set the scoped confs, force
    optimization (`executedPlan`), and restore in a finally block: the
    caller's session never observes the changed confs, and the returned
    DataFrame's cached QueryExecution keeps the injected filter. (Same
    scoped-resolution pattern as common.load_events.)

    CRITICAL composition caveat — hence `finish`: any transformation
    applied to the RETURNED frame builds a NEW QueryExecution that
    re-optimizes from scratch under the restored confs, silently
    dropping the bloom filter (caught when PLANS.md showed the
    registered aggregate without might_contain). Build the ENTIRE
    downstream query inside the window by passing it as `finish`;
    tests/test_layout.py pins might_contain on a finished plan.
    """
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        out = fact.join(dim, on)
        if finish is not None:
            out = finish(out)
        out._jdf.queryExecution().executedPlan()  # optimize inside the window
    finally:
        for k, prev in saved.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)
    return out


def with_hilbert_value(
    df: DataFrame, cols: Sequence[str], out_col: str = "h"
) -> DataFrame:
    """Attach a Hilbert-curve index over two 16-bit-normalized integral
    columns — the locality-preserving upgrade over Z-order (Morton):
    Hilbert has no long diagonal jumps, so value-range blocks over it
    are tighter per clustered column (measured in layout_skipping_hilbert).

    Classic xy2d (Wikipedia's public-domain formulation), unrolled into
    16 column projections of pure integer bit math — everything stays in
    whole-stage codegen, and the identical arithmetic replays in SQL
    (hilbert_sql_ctes). Per-iteration state (x, y, d) is re-projected to
    named columns; x/y are referenced several times per step, which
    keeps CollapseProject from inlining the chain."""
    if len(cols) != 2:
        raise ValueError(f"hilbert needs exactly 2 columns, got {list(cols)}")
    cx, cy = cols
    bounds = df.agg(
        F.min(cx).alias("_xmin"),
        F.max(cx).alias("_xmax"),
        F.min(cy).alias("_ymin"),
        F.max(cy).alias("_ymax"),
    )
    nx = normalize_16bit(F.col(cx), F.col("_xmin"), F.col("_xmax"))
    ny = normalize_16bit(F.col(cy), F.col("_ymin"), F.col("_ymax"))
    base = list(df.columns)
    cur = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            *base,
            nx.alias("_hx"),
            ny.alias("_hy"),
            F.lit(0).cast("long").alias("_hd"),
        )
    )
    for i in range(15, -1, -1):
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        d2 = F.col("_hd") + F.shiftleft((F.lit(3) * rx).bitwiseXOR(ry), 2 * i)
        # rot: when ry==0, reflect (if rx==1) then swap x/y
        nx2 = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(65535) - F.col("_hy")).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny2 = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(65535) - F.col("_hx")).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        cur = cur.select(
            *base, nx2.alias("_hx"), ny2.alias("_hy"), d2.alias("_hd")
        )
    return cur.select(*base, F.col("_hd").alias(out_col))


def hilbert_sql_ctes(
    source_cte: str, nx_expr: str, ny_expr: str, keep: str
) -> str:
    """DuckDB twin of with_hilbert_value: a chain of 16 CTEs applying
    the identical per-bit rotation/accumulation, starting from
    `source_cte` (which must expose `keep` columns plus the normalized
    nx/ny expressions). Returns SQL text defining CTEs h16..h0; the
    final relation h0 has (keep..., hd)."""
    out = [
        f"h16 AS (SELECT {keep}, {nx_expr} AS hx, {ny_expr} AS hy,"
        f" 0::BIGINT AS hd FROM {source_cte})"
    ]
    prev = "h16"
    for i in range(15, -1, -1):
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        d2 = f"(hd + (xor(3 * {rx}, {ry})::BIGINT << {2 * i}))"
        nx2 = (
            f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN 65535 - hy"
            f" ELSE hy END ELSE hx END)"
        )
        ny2 = (
            f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN 65535 - hx"
            f" ELSE hx END ELSE hy END)"
        )
        name = f"h{i}"
        out.append(
            f"{name} AS (SELECT {keep}, {nx2} AS hx, {ny2} AS hy,"
            f" {d2} AS hd FROM {prev})"
        )
        prev = name
    return ",\n".join(out)
