"""Relational operator layer (SURVEY §2.2–§2.4) plus the beyond-reference
training-data operators (dedup, similarity, multimodal)."""

from python_multiproc_bigdata_spark.operators.transforms import (
    derive_values,
    drop_columns,
    filter_tokens,
    project_values_path,
    static_values,
    trans_values,
)
from python_multiproc_bigdata_spark.operators.aggregates import (
    count_per_key,
    distinct_per_key,
    duplicates_per_key,
    reduce_per_key,
)

__all__ = [
    "count_per_key",
    "derive_values",
    "distinct_per_key",
    "drop_columns",
    "duplicates_per_key",
    "filter_tokens",
    "project_values_path",
    "reduce_per_key",
    "static_values",
    "trans_values",
]
