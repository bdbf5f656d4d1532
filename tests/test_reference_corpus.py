"""Integration test on the REFERENCE'S OWN fixture corpus
(/root/reference/sample_data — 21 Gutenberg books + arabic.txt, ~13 MB,
read-only): the full words pipeline from real files through the file
sources, validated against the reference's manual SQL invariants
(SURVEY §5 / reference v2/readme.md:41-69) computed independently in
DuckDB over the same files."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.arabic import arabic_tokenize
from python_multiproc_bigdata_spark.plans.words import words_pipeline
from python_multiproc_bigdata_spark.sources.files import read_whole_files

SAMPLE = "/root/reference/sample_data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference corpus not present"
)


def test_words_pipeline_on_gutenberg_corpus(spark):
    corpus = read_whole_files(spark, f"{SAMPLE}/books", pattern="*.txt")
    out = words_pipeline(corpus, text_col="content").cache()

    n_files = len([f for f in os.listdir(f"{SAMPLE}/books") if f.endswith(".txt")])

    # distinct_files: every input file produced tokens
    assert out.select("file_path").distinct().count() == n_files

    # no_dupes: per-file normalized distinct holds
    dupes = (
        out.groupBy("word", "file_path").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0

    # truncated_iff: word_truncated ⇔ pre-truncation len > 255; stored ≤ 254
    bad = out.filter(
        (F.col("word_truncated") != (F.col("word_len") > 255))
        | (F.length("word") > 254)
    ).count()
    assert bad == 0

    # total_tokens: SUM over DISTINCT (file, count) equals an independent
    # DuckDB tokenization of the same files
    got = (
        out.select("file_path", "file_words_count")
        .distinct()
        .agg(F.sum("file_words_count"))
        .collect()[0][0]
    )
    expected = duckdb.sql(
        rf"""
        SELECT count(*) FROM (
          SELECT unnest(string_split_regex(content, '\s+')) AS w
          FROM read_text('{SAMPLE}/books/*.txt') AS t(filename, content))
        WHERE length(trim(w)) > 0
        """
    ).fetchone()[0]
    assert got == expected

    # path normalization kept the last segments only
    assert all(
        not r.file_path.startswith("file:/") and "sample_data" in r.file_path
        for r in out.select("file_path").distinct().collect()
    )


def test_arabic_pipeline_on_reference_arabic_fixture(spark):
    corpus = read_whole_files(spark, SAMPLE, pattern="arabic.txt")
    out = words_pipeline(
        corpus, text_col="content", tokenizer=arabic_tokenize("content")
    ).cache()
    rows = out.collect()
    assert len(rows) > 0
    # every token is purely Arabic-class chars, non-blank, within length contract
    words = [r.word for r in rows]
    assert all(w and not w.isspace() and len(w) <= 254 for w in words)
    # the diacritic-stripped length never exceeds the raw length
    assert all(r.word_len <= len(r.word) for r in rows)
    # per-file distinct invariant
    assert len(set(words)) == len(words)
