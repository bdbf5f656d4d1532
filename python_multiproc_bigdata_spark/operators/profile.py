"""Dataset profiling (beyond-reference, training-data QA): per-column
null/distinct/row counts in long form — the pre-flight a 100 TB ingest
runs before training. One pass over the data: every metric is an
algebraic aggregate in a single groupBy-less agg, then unpivoted."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """Long-form profile: (col_name, n_rows, n_nulls, n_distinct).

    Distinct counts are approx_count_distinct (HyperLogLog++, rsd=0.01)
    by DEFAULT: N exact countDistinct aggregates in one agg plan an
    Expand that multiplies the scanned rows by N — the wrong pre-flight
    for the table sizes this operator is billed for. `exact=True` opts
    into the exact form (used by the profile_documents oracle check at
    small SF, where the gate needs bit-equal counts)."""
    cols = columns or df.columns
    distinct = (
        F.countDistinct if exact else (lambda c: F.approx_count_distinct(c, rsd=0.01))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}" for c in cols
    )
    return row.selectExpr(
        "_n_rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")
