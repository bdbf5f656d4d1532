"""Query registry: every implemented operator/query from SURVEY.md §2 (plus
the beyond-reference training-data ops) as a named pair of

  spark_fn : (SparkSession, sf_dir) -> DataFrame
  oracle   : equivalent DuckDB ANSI SQL (None → rows-only check for
             genuinely non-SQL-expressible ops)

The driver consumes this via __spark_entry__.queries() / oracle_sql().
Column names are aliased identically on both sides (the correctness gate
hashes values under name-sorted columns).
"""

from __future__ import annotations

from python_multiproc_bigdata_spark.registry.common import QuerySpec

from python_multiproc_bigdata_spark.registry import words as _words
from python_multiproc_bigdata_spark.registry import tpch as _tpch
from python_multiproc_bigdata_spark.registry import events as _events
from python_multiproc_bigdata_spark.registry import text as _text
from python_multiproc_bigdata_spark.registry import dedup as _dedup
from python_multiproc_bigdata_spark.registry import similarity as _similarity
from python_multiproc_bigdata_spark.registry import funcs as _funcs
from python_multiproc_bigdata_spark.registry import advanced as _advanced
from python_multiproc_bigdata_spark.registry import streaming as _streaming
from python_multiproc_bigdata_spark.registry import multimodal as _multimodal
from python_multiproc_bigdata_spark.registry import stats as _stats
from python_multiproc_bigdata_spark.registry import training as _training

REGISTRY: dict[str, QuerySpec] = {}
for mod in (_words, _tpch, _events, _text, _dedup, _similarity, _funcs, _advanced, _streaming, _multimodal, _stats, _training):
    overlap = REGISTRY.keys() & mod.REGISTRY.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(mod.REGISTRY)

__all__ = ["REGISTRY", "QuerySpec"]
