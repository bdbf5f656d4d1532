"""Sources (SURVEY §2.1): file-corpus scans and the harness parquet tables."""

from python_multiproc_bigdata_spark.sources.files import (
    list_files,
    read_text_files,
    read_text_lines,
    read_whole_files,
)
from python_multiproc_bigdata_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "list_files",
    "load_table",
    "load_tables",
    "read_text_files",
    "read_text_lines",
    "read_whole_files",
]
