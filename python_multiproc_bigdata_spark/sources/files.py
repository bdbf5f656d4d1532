"""File-corpus sources (SURVEY §2.1 S1/S2/S4/S6, §2.3 F1/F2).

The reference walks directory trees in the driver and fans file paths out
to worker processes (FilesListExtractor, v2/core/extractors/files.py:7-49;
v1 corpus walker, v1/corpus_main_script.py:15-146). Spark's file sources
replace all of it: split planning distributes files across executors, and
`maxPartitionBytes` handles the chunking the reference did with
`split_list` (v1/utils.py:51-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_files(
    spark: SparkSession,
    *dirs: str,
    pattern: str = "*.txt",
    recursive: bool = True,
) -> DataFrame:
    """S1/S2: one row per matching file — `(file_path, length,
    modification_time)` — without reading contents.

    `binaryFile` with a path-glob gives the listing distributed; passing
    several dirs is the reference's FoldersFilesListExtractor (S2).
    """
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(list(dirs))
    return df.select(
        F.col("path").alias("file_path"),
        F.col("length").alias("file_size"),
        F.col("modificationTime").alias("modification_time"),
    )


def read_text_lines(spark: SparkSession, *dirs: str, pattern: str = "*.txt") -> DataFrame:
    """F1: one row per line with its source file —
    `(file_path, line)`, blanks filtered (reference
    FileToTextLinesTransformer skips blank lines, files.py:50-52)."""
    df = (
        spark.read.option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .text(list(dirs))
    )
    return df.select(
        F.input_file_name().alias("file_path"), F.col("value").alias("line")
    ).filter(F.length(F.trim("line")) > 0)


def read_whole_files(spark: SparkSession, *dirs: str, pattern: str = "*.txt") -> DataFrame:
    """F2: one row per file with full content — `(file_path, content)`
    (reference FileTextReaderTransformer, files.py:56-88). The reference
    documents a RAM-vs-time tradeoff between F1/F2 (v2/main.py:89); in
    Spark the per-line variant is almost always right at scale since
    splits stream — this exists for semantic parity."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(list(dirs))
    )
    return df.select(
        F.input_file_name().alias("file_path"), F.col("value").alias("content")
    )


def read_text_files(
    spark: SparkSession,
    *dirs: str,
    pattern: str = "*.txt",
    whole: bool = False,
) -> DataFrame:
    """Convenience switch between F1 (per line) and F2 (whole file)."""
    if whole:
        return read_whole_files(spark, *dirs, pattern=pattern)
    return read_text_lines(spark, *dirs, pattern=pattern)


def with_path_taxonomy(df: DataFrame, levels: list[str], path_col: str = "file_path") -> DataFrame:
    """S4: the v1 corpus walker's 4-level dir taxonomy
    (corpus/base/domain/period, v1/corpus_main_script.py:15-146) as derived
    columns: `levels[i]` = i-th path segment from the end, skipping the
    filename itself."""
    # drop empty segments (an absolute path's leading '/' splits to '')
    parts = F.filter(F.split(F.col(path_col), "/"), lambda p: F.length(p) > 0)
    n = F.size(parts)
    out = df
    for i, name in enumerate(levels):
        idx = n - (len(levels) - i)  # 1-based; the filename is parts[n]
        # Shallow paths: a missing taxonomy level is null — element_at
        # would throw on index 0 and silently wrap on negatives.
        out = out.withColumn(
            name, F.when(idx >= 1, F.element_at(parts, idx)).otherwise(F.lit(None))
        )
    return out


DOCUMENT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_jsonl(
    spark: SparkSession,
    *paths: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL corpus source — the interchange format LLM training corpora
    actually ship in (one JSON object per line, splittable, appendable).

    An EXPLICIT schema is required at scale: without one Spark runs a
    full sampling pass over the input just to infer types — a second
    read of 100 TB before the first real job. Defaults to the harness
    document schema. PERMISSIVE mode routes malformed lines into
    `corrupt_col` instead of failing the job (a web-scale crawl always
    contains broken lines); callers split on `corrupt_col IS NULL` to
    quarantine them, and drop the column on the clean branch.

    Caveat (enforced by Spark as QUERY_ONLY_CORRUPT_RECORD_COLUMN): a
    query over the raw scan may not prune down to ONLY the corrupt
    column — e.g. `df.filter(corrupt.isNotNull()).count()`. Either
    persist() the parsed frame before splitting (what the test does —
    correct for a bounded quarantine pass) or, at 100 TB, split in ONE
    write by partitioning the output on `corrupt_col IS NULL` instead
    of counting the branches separately."""
    full_schema = (schema or DOCUMENT_SCHEMA) + f", {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(list(paths))
    )


def jsonl_sink_write(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL corpus sink (one object per line; gzip-free so downstream
    readers can split files). Pair of read_jsonl."""
    df.write.mode(mode).json(path)


def read_xml(
    spark: SparkSession,
    *paths: str,
    row_tag: str = "doc",
    schema: str | None = None,
) -> DataFrame:
    """XML corpus source (Spark 4's built-in `xml` format — the
    spark-xml package folded into core): one DataFrame row per
    `row_tag` element. Like read_jsonl, an EXPLICIT schema matters at
    scale — inference runs a full extra pass over the input; unlike
    JSONL, XML is NOT line-splittable, so at 100 TB the input should be
    many moderate files (the writer below emits one file per partition)
    rather than one giant document."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        reader = reader.schema(schema)
    return reader.load(list(paths) if len(paths) > 1 else paths[0])
