"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship words-ETL query on sf0.001 (SURVEY §7 M1).
queries()      — every implemented operator/query (SURVEY §2 + M4 ops),
                 backed by python_multiproc_bigdata_spark.registry.
oracle_sql()   — matching DuckDB SQL per query (omitted only for
                 genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from python_multiproc_bigdata_spark.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["words_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            out[name] = spec.resolve_oracle()
        except Exception:  # noqa: BLE001
            # A generated oracle (deterministic quantizer retraining from
            # parquet) that cannot build here degrades THAT query to the
            # rows-only check instead of sinking every other oracle.
            continue
    return out
