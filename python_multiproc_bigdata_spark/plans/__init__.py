"""Declarative pipeline runner + the canonical words-ETL plan."""

from python_multiproc_bigdata_spark.plans.pipeline import Pipeline
from python_multiproc_bigdata_spark.plans.words import words_pipeline

__all__ = ["Pipeline", "words_pipeline"]
