"""Data-quality expectation checks (beyond-reference): declarative
constraints over a DataFrame, evaluated in ONE aggregation pass and
reported one row per constraint — the pre-flight a 100 TB ingest runs
before committing a partition (dbt-test / Deequ shape, minus the JVM
dependency).

The reference validated its loads manually with SQL probes after the
fact (v2/readme.md:41-69 — row counts, the `GROUP BY concat(word,
file_path) HAVING cnt>1` zero-dupes probe); this operator is that
practice made a first-class, engine-checked step.

Scale: all violation counters are conditional sums folded into a single
partial-aggregated `agg` — one scan, no shuffle beyond the 1-row final
merge. Uniqueness is exact `count - countDistinct` (distinct shuffles
once per keyset); at 100 TB swap `approx_count_distinct` in via
`unique_approx=True` for a scan-only estimate.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    violated_when: Mapping[str, Column],
    unique_keys: Mapping[str, Sequence[str]] | None = None,
    unique_approx: bool = False,
) -> DataFrame:
    """One row per named constraint: (check_name, n_violations, n_rows,
    passed). `violated_when[name]` is the VIOLATION predicate (true =
    bad row); `unique_keys[name]` checks key-set uniqueness as
    count(*) - count(distinct keys).

    Check names become column aliases inside a stack() expression, so
    they must be plain identifiers (letters/digits/underscore, not
    starting with a digit) — a quote or backtick in a name would inject
    into the generated SQL. `_n_rows` is reserved for the internal
    row-count alias. Both are rejected up front."""
    import re

    names_all = list(violated_when) + list(unique_keys or {})
    for n in names_all:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n):
            raise ValueError(f"check name must be a plain identifier: {n!r}")
        if n == "_n_rows":
            raise ValueError("check name '_n_rows' is reserved")
    if len(set(names_all)) != len(names_all):
        raise ValueError("duplicate check names across violated_when/unique_keys")
    distinct_fn = F.approx_count_distinct if unique_approx else F.countDistinct
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in violated_when.items()
    ]
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (F.count(F.lit(1)) - distinct_fn(*[F.col(k) for k in keys]))
            .cast("long")
            .alias(name)
        )
    aggs.append(F.count(F.lit(1)).alias("_n_rows"))
    wide = df.agg(*aggs)
    names = list(violated_when) + list(unique_keys or {})
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack})").alias("check_name", "n_violations"),
        F.col("_n_rows").alias("n_rows"),
    ).withColumn("passed", F.col("n_violations") == 0)
