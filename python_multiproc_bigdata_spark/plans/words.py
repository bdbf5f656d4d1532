"""The canonical words-ETL query (SURVEY §7 M1) — the reference's flagship
pipeline (v2/main.py:71-199) as one declarative DataFrame plan:

  tokenize → per-file total token count → per-file distinct (normalized
  compare, original value kept) → word_len (after diacritic removal) →
  word_truncated (len > 255) → truncate to 254 → path to last-5-segments.

Output contract (v2/readme.md:14-20, values_path at v2/main.py:226-230):
  (word, word_len, word_truncated, file_path, file_words_count)

Scale notes:
- token explode + two groupBys; the per-file count side is one row per
  file, so AQE broadcasts it back onto the distinct words (no wide
  shuffle of the carry-through join at any SF).
- everything is built-in expressions — the whole plan is one
  WholeStageCodegen span per stage, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.arabic import remove_diacritics
from python_multiproc_bigdata_spark.functions.strings import (
    basename_backwards,
    len_gt,
    truncate_str,
)
from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE


def words_pipeline(
    corpus: DataFrame,
    file_col: str = "file_path",
    text_col: str = "content",
    tokenizer: F.Column | None = None,
    normalize_path: bool = True,
) -> DataFrame:
    """corpus(file_col, text_col) → the words output contract.

    `tokenizer` is an array<string> column expression; default whitespace
    split (F4). Pass `arabic_tokenize(text_col)` for the Arabic path (F5).
    """
    tokens_arr = tokenizer if tokenizer is not None else F.split(F.col(text_col), WHITESPACE_RE)
    tokens = (
        corpus.select(F.col(file_col).alias("file_path"), F.explode(tokens_arr).alias("word"))
        .filter(F.length(F.trim("word")) > 0)
    )

    # A1/A2: per-file TOTAL token count (pre-dedup, v2/main.py:84-107).
    counts = tokens.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("file_words_count")
    )

    # A3: per-file distinct on lower(trim(word)) (normalizers at
    # v2/main.py:111), emitting a deterministic original representative.
    dedup = tokens.groupBy(
        "file_path", F.lower(F.trim("word")).alias("_norm")
    ).agg(F.min("word").alias("word"))

    # Carry-through join (the reference carried words_count on every item
    # via copy_values_key_paths, v2/main.py:108-144). counts is 1 row/file
    # → broadcast-joined by AQE.
    out = dedup.drop("_norm").join(counts, "file_path")

    # Derivations (v2/main.py:137-146): word_len AFTER diacritic removal,
    # truncated flag BEFORE truncation, then truncate; path → last 5
    # segments truncated to 269.
    out = (
        out.withColumn("word_len", F.length(remove_diacritics("word")))
        .withColumn("word_truncated", len_gt("word", 255))
        .withColumn("word", truncate_str("word", 255))
    )
    if normalize_path:
        out = out.withColumn(
            "file_path", truncate_str(basename_backwards("file_path", 5), 270)
        )
    return out.select(
        "word", "word_len", "word_truncated", "file_path", "file_words_count"
    )


def words_from_documents(documents: DataFrame) -> DataFrame:
    """The harness `documents` table as the corpus: doc_id (as string) is
    the file identity, `text` the content. Paths aren't real here so the
    last-5-segments normalization is skipped."""
    corpus = documents.select(
        F.col("doc_id").cast("string").alias("file_path"), F.col("text").alias("content")
    )
    return words_pipeline(corpus, normalize_path=False)
