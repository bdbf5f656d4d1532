"""Portable sketch primitives — sketches whose state is defined by
engine-agnostic column math (md5 over canonical strings), so a DuckDB
oracle can replay them bit-for-bit. This is what upgrades sketch queries
from rows-only checks to full value checks: approx_count_distinct's
JVM-internal xxhash can never be replayed outside Spark, a p=8 md5-HLL
can.

Reference parity anchor: the reference's dedup/count surface
(v2/core/transformers.py ReduceItemTransformer / UniqueFilterTransformer)
is exact; these sketches are the beyond-reference scale tier for
cardinality at 100 TB (SURVEY §2 A-family extension).

Shared by stats_hll_portable, events_hll_sliding_users (inline twins of
this arithmetic, kept verbatim there with their committed oracles) and
dq_expectations_panel_approx.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8  # 2^8 = 256 registers; standard error ~1.04/sqrt(256) = 6.5%
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_bucket_rho(val_col: str) -> tuple[Column, Column]:
    """(bucket, rho) of a string column under the portable p=8 md5-HLL:
    bucket = first two md5 hex digits, rho = leading-zero count of the
    next 48 bits + 1 (49 − length(bin(v)); the all-zero word pins
    rho = 49). Hex→int goes through ONE conv() per field (Spark
    conv(x, 16, 10) ≡ DuckDB ('0x' || x)::BIGINT — verified equal),
    not the 14-digit instr/substring ladder the first HLL queries
    used: that ladder evaluated md5 per digit and measured ~2x slower
    at panel width (the values are bit-identical either way, so the
    older queries' committed digit-sum oracles still match)."""
    h = F.md5(val_col)
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(v)))
    return bucket, rho


def hll_registers(df: DataFrame, group_cols: list[str], val_col: str) -> DataFrame:
    """Per-group register relation: (group_cols..., bucket, m) with
    m = max(rho). Distributive — partial-aggregates map-side like any
    max, so the shuffle is bounded by |groups| x 256 rows per partition
    regardless of input size (the reason this scales where exact
    count_distinct must move every distinct value). Duplicates need NOT
    be pre-distinct'd: max(rho) is idempotent over repeats."""
    bucket, rho = hll_bucket_rho(val_col)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Collapse a register relation to (group_cols..., hll_est double):
    raw = α·m²/Σ2^(−M_j) with empty buckets contributing 2^0, then the
    standard linear-counting small-range correction (raw ≤ 2.5m with
    empty buckets → m·ln(m/empties)). An EMPTY group (no registers)
    estimates 0 via the correction — callers seeding groups must
    coalesce (_s, _nb) to (0.0, 0)."""
    filled = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    return filled.select(*group_cols, hll_corrected_estimate().alias("hll_est"))


def hll_corrected_estimate(
    s_col: str = "_s", nb_col: str = "_nb"
) -> Column:
    """The estimate column over (_s = Σ2^(−M_j) of FILLED buckets,
    _nb = filled-bucket count) — exposed separately so callers that seed
    empty groups can apply it after a coalesce."""
    m = HLL_M
    raw = F.lit(HLL_ALPHA * m * m) / (
        F.col(s_col) + (F.lit(m) - F.col(nb_col)) * F.lit(1.0)
    )
    empties = F.lit(m) - F.col(nb_col)
    return F.when(
        (raw <= 2.5 * m) & (empties > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empties),
    ).otherwise(raw)


def sql_hll_v_expr(val_expr: str) -> str:
    """DuckDB expression for the 48-bit hash word `v` over md5 of
    `val_expr` — the oracle-side twin of hll_bucket_rho."""
    return f"(('0x' || substr(md5({val_expr}), 3, 12))::BIGINT)"


def sql_hll_bucket_expr(val_expr: str) -> str:
    """DuckDB expression for the p=8 bucket over md5 of `val_expr`."""
    return f"(('0x' || substr(md5({val_expr}), 1, 2))::INTEGER)"
