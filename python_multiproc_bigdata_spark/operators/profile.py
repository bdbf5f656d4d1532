"""Dataset profiling (beyond-reference, training-data QA): per-column
null/distinct/row counts in long form — the pre-flight a 100 TB ingest
runs before training. One pass over the data: every metric is an
algebraic aggregate in a single groupBy-less agg, then unpivoted."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form profile: (col_name, n_rows, n_nulls, n_distinct).

    Exact distincts — swap `approx_count_distinct` in at scale (the
    engine exposes both; see approx_distinct_stats).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}" for c in cols
    )
    return row.selectExpr(
        "_n_rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")
