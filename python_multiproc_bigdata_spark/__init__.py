"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL framework (enimiste/python-multiproc-bigdata).

Brand-new, Spark-first design: the reference's operator tree
(EXTRACTORS |> TRANSFORMERS |> LOADERS over multiprocessing queues,
/root/reference/v2/core/pipline.py) is re-expressed as declarative
DataFrame plans so Catalyst/Tungsten own optimization and physical
execution. Nothing here is a translation of the reference's process /
queue / affinity machinery — Spark replaces that substrate entirely.

Layout (SURVEY.md §7):
  session    — SparkSession factory tuned for the local[32] harness
  sources/   — scans (S1–S6): file listing, text corpus, parquet tables
  functions/ — scalar/column function library (X1–X7, tokenizers F3–F7,
               text analysis, vector math)
  operators/ — relational operator layer (T/A families), dedup,
               similarity, multimodal plumbing
  plans/     — declarative Pipeline runner replacing ThreadedPipeline
  streaming/ — Structured Streaming variants (windows, watermark dedup)
"""

from python_multiproc_bigdata_spark.session import get_spark

__all__ = ["get_spark"]
