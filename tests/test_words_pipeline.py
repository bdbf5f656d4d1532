"""Unit tests for the canonical words pipeline (SURVEY §5 invariants) on a
hand-built micro corpus covering the FIXTURES.md §3 edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.plans.words import words_pipeline
from python_multiproc_bigdata_spark.functions.arabic import arabic_tokenize

LONG = "x" * 300
ARABIC = "كِتَاب كتاب قلَم"  # two spellings of 'book' differing by diacritics


def corpus(spark):
    rows = [
        ("/a/b/c/d/e/f1.txt", f"Hello hello WORLD {LONG} one one"),
        ("/a/b/c/d/e/f2.txt", "hello  tab\tsep\r\nlines"),
        ("/short.txt", "solo"),
        ("/a/b/c/d/e/empty.txt", "   \t  "),
        ("/a/b/c/d/e/arabic.txt", ARABIC),
    ]
    return spark.createDataFrame(rows, ["file_path", "content"])


def test_contract_and_invariants(spark):
    out = words_pipeline(corpus(spark)).cache()
    rows = {(r.file_path, r.word): r for r in out.collect()}

    # no_dupes: per-file normalized distinct
    assert len(rows) == out.count()
    f1 = [r for (fp, _), r in rows.items() if fp.endswith("f1.txt")]
    # Hello/hello collapse to one (min → 'Hello'), one+one collapse, LONG, WORLD
    f1_words = sorted(r.word for r in f1)
    assert f1_words == sorted(["Hello", "WORLD", LONG[:254], "one"])
    # file_words_count is the PRE-dedup total (6 tokens in f1)
    assert all(r.file_words_count == 6 for r in f1)

    # truncated_iff_len_gt_255 + word_len is pre-truncation length
    long_row = next(r for r in f1 if r.word == LONG[:254])
    assert long_row.word_truncated is True
    assert long_row.word_len == 300
    assert all(len(r.word) <= 254 for r in rows.values())

    # empty file yields no rows
    assert not any("empty" in fp for (fp, _) in rows)

    # path normalization: last 5 segments kept, short path untouched
    paths = {fp for (fp, _) in rows}
    assert "b/c/d/e/f1.txt" in paths
    # reference basename_backwards consumes '/' into empty basenames that
    # os.path.join drops, so the short ABSOLUTE path loses its leading slash
    assert "short.txt" in paths


def test_arabic_tokenizer_pipeline(spark):
    df = corpus(spark).filter(F.col("file_path").contains("arabic"))
    out = words_pipeline(df, tokenizer=arabic_tokenize("content")).collect()
    words = sorted(r.word for r in out)
    # 3 tokens; the two 'book' spellings differ pre-normalization (diacritics
    # are not case), so they do NOT collapse; word_len strips diacritics.
    assert len(words) == 3
    by_word = {r.word: r for r in out}
    assert by_word["كِتَاب"].word_len == 4  # 6 chars - 2 diacritics
    assert all(r.file_words_count == 3 for r in out)


def test_duplicates_inverse_mode(spark):
    from python_multiproc_bigdata_spark.operators.aggregates import duplicates_per_key

    df = spark.createDataFrame(
        [("f", "A"), ("f", "a"), ("f", "b"), ("g", "a")], ["fp", "w"]
    )
    dups = duplicates_per_key(df, ["fp"], "w", normalizers=[F.lower]).collect()
    # Only the second occurrence of normalized 'a' within f ('a' sorts after 'A')
    assert [(r.fp, r.w) for r in dups] == [("f", "a")]
