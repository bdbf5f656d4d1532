"""Aggregations (SURVEY §2.4 A1–A7).

The reference's two aggregation operators are a per-item fold
(ReduceItemTransformer, aggregators.py:13-64) and a scoped distinct with
value normalizers and an inverse mode (UniqueFilterTransformer,
aggregators.py:71-132), both backed by a lock-guarded bag-set state store
(ConcurrentKeyBagSet, commons.py:237-309). In Spark the state store
vanishes: shuffle-based groupBy gives map-side partial aggregation
(HashAggregate(partial) → Exchange → HashAggregate(final)) automatically,
which is the scalable form of the reference's per-worker accumulation.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def count_per_key(df: DataFrame, keys: Sequence[str], out_col: str = "count") -> DataFrame:
    """A1/A2 fast path — the reference's only built-in reducer is count
    (aggregators.py:66-67); the beam variant is the same CombinePerKey(sum)
    shape (py-beam/main.py:111-112)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))


def with_count_per_key(
    df: DataFrame, keys: Sequence[str], out_col: str = "count"
) -> DataFrame:
    """A1 carry-through form: per-key count attached to every row (the
    canonical pipeline needs file_words_count ON each word row,
    v2/main.py:84-107). Implemented as groupBy + equi-join rather than a
    window: the partial-aggregated count side is tiny (one row per key) so
    AQE broadcast-joins it, and no single partition ever has to hold a
    whole key group the way Window.partitionBy would at 100 TB."""
    counts = count_per_key(df, keys, out_col)
    # Null-safe join keys: groupBy counts the null group, and a plain
    # equi-join (null != null) would silently drop those rows instead of
    # carrying their count through.
    renamed = counts
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_ck_{k}")
    cond = None
    for k in keys:
        clause = df[k].eqNullSafe(renamed[f"_ck_{k}"])
        cond = clause if cond is None else (cond & clause)
    return df.join(renamed, cond, "inner").drop(*[f"_ck_{k}" for k in keys])


def reduce_per_key(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    merge: Callable[[Column, Column], Column],
    out_col: str = "reduced",
    initial: object = None,
) -> DataFrame:
    """A1 general form: arbitrary fold per key
    (reducer(acc, x) from initial_value, aggregators.py:19,58-61).

    Spark-first: `F.reduce` over `collect_list` keeps the fold declarative
    and JVM-side. Suits non-commutative reducers on bounded groups (the
    reference's groups are per-file); for huge groups prefer a real
    algebraic aggregate (sum/count/min/max) which Spark partial-aggregates.
    """
    init = F.lit(initial) if initial is not None else F.lit(0)
    return df.groupBy(*keys).agg(
        F.reduce(F.collect_list(value_col), init, merge).alias(out_col)
    )


def distinct_per_key(
    df: DataFrame,
    bag_keys: Sequence[str],
    unique_col: str,
    normalizers: Sequence[Callable[[Column], Column]] = (),
    keep: str = "min",
) -> DataFrame:
    """A3: scoped distinct — dedup `unique_col` *within* each bag_keys
    group, comparing on the normalized value but emitting an original
    value (UniqueFilterTransformer, aggregators.py:71-132; normalizers
    e.g. lower+strip at v2/main.py:111).

    The reference keeps the first occurrence in queue order — an order
    Spark deliberately does not have. We keep a deterministic
    representative instead (min/max of the original value), which matches
    the reference under order-insensitive comparison (SURVEY §7 notes the
    oracle must compare normalized sets).
    """
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    norm = F.col(unique_col)
    for fn in normalizers:
        norm = fn(norm)
    agg = F.min(unique_col) if keep == "min" else F.max(unique_col)
    other_cols = [
        c for c in df.columns if c != unique_col and c not in bag_keys
    ]
    # Carry the other columns of the SAME row as the kept representative
    # (min_by/max_by must follow `keep`, or the output would mix columns
    # from two different source rows).
    carry_by = F.min_by if keep == "min" else F.max_by
    carries = [carry_by(F.struct(*other_cols), F.col(unique_col)).alias("_carry")] if other_cols else []
    out = df.groupBy(*bag_keys, norm.alias("_norm")).agg(
        agg.alias(unique_col), *carries
    )
    if other_cols:
        out = out.select(*bag_keys, unique_col, "_carry.*")
    return out.drop("_norm")


def duplicates_per_key(
    df: DataFrame,
    bag_keys: Sequence[str],
    unique_col: str,
    normalizers: Sequence[Callable[[Column], Column]] = (),
) -> DataFrame:
    """A3 inverse mode (`yield_unique_values=False`, XOR at
    aggregators.py:127): emit only rows whose normalized value has already
    been seen in the bag — i.e. every occurrence after the first.

    row_number over (bag, normalized) > 1; ordered by the original value
    for determinism (SURVEY §7's scoped-distinct note).
    """
    norm = F.col(unique_col)
    for fn in normalizers:
        norm = fn(norm)
    w = Window.partitionBy(*[F.col(k) for k in bag_keys], norm).orderBy(
        F.col(unique_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )


def sum_over_distinct(
    df: DataFrame, distinct_cols: Sequence[str], sum_col: str, out_col: str = "total"
) -> DataFrame:
    """A7: `SUM(x)` over a `SELECT DISTINCT` subquery — the reference's
    corpus-wide token count recovery (v2/readme.md:55-60)."""
    return (
        df.select(*distinct_cols)
        .dropDuplicates()
        .agg(F.sum(sum_col).alias(out_col))
    )


def group_having(
    df: DataFrame,
    key_expr: Column,
    key_name: str = "grp",
    min_count: int = 2,
) -> DataFrame:
    """A7: GROUP BY expr HAVING count >= min_count — the reference's
    duplicate-detection probe (v2/readme.md:61-68)."""
    return (
        df.groupBy(key_expr.alias(key_name))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
