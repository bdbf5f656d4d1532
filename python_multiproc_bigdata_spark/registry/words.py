"""Words-ETL query family (SURVEY §2.4 A7, §5 invariants) over the
`documents` table: the canonical pipeline output plus the reference's
manual SQL validation queries (v2/readme.md:41-69) as named queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE
from python_multiproc_bigdata_spark.plans.words import words_from_documents
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table

# Shared oracle CTE: the words pipeline in DuckDB SQL. Mirrors
# plans/words.py stage by stage (tokenize → non-blank filter → per-file
# count → per-file normalized distinct → derive/truncate).
WORDS_CTE = r"""
WITH tok AS (
    SELECT CAST(doc_id AS VARCHAR) AS file_path,
           unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS word
    FROM documents
), tok_nb AS (
    SELECT file_path, word FROM tok WHERE length(trim(word)) > 0
), counts AS (
    SELECT file_path, count(*) AS file_words_count FROM tok_nb GROUP BY file_path
), dedup AS (
    SELECT file_path, lower(trim(word)) AS norm, min(word) AS word
    FROM tok_nb GROUP BY file_path, lower(trim(word))
), words AS (
    SELECT substr(d.word, 1, 254) AS word,
           length(translate(d.word, 'ًٌٍَُِّْ', '')) AS word_len,
           length(d.word) > 255 AS word_truncated,
           d.file_path,
           c.file_words_count
    FROM dedup d JOIN counts c USING (file_path)
)
"""
# word_len strips the 8 Arabic diacritics exactly as the engine does
# (plans/words.py: length(remove_diacritics(word))) — the fixture has no
# diacritics today, but the oracle must mirror the pipeline, not the data.


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return words_from_documents(table(prep(spark), sf_dir, "documents"))


def q_words_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 flagship: the full output contract."""
    return _words(spark, sf_dir)


def q_words_total_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant `total_tokens` (v2/readme.md:55-60): SUM(file_words_count)
    over the DISTINCT (file_path, count) pairs recovers the corpus-wide
    token count."""
    return (
        _words(spark, sf_dir)
        .select("file_path", "file_words_count")
        .dropDuplicates()
        .agg(F.sum("file_words_count").alias("total_tokens"))
    )


def q_words_distinct_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant `distinct_files` (v2/readme.md:52-54)."""
    return _words(spark, sf_dir).agg(
        F.countDistinct("file_path").alias("distinct_files")
    )


def q_words_no_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant `no_dupes` (v2/readme.md:61-68): GROUP BY (word,
    file_path) HAVING cnt>1 must return 0 rows."""
    w = _words(spark, sf_dir)
    return (
        w.groupBy(F.concat_ws("|", "word", "file_path").alias("wf"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def q_words_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 GROUP BY … HAVING over the output: words present in >100 docs."""
    return (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > 100)
    )


def q_words_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + LIMIT (A7; the reference only has LIMIT, v2/readme.md:63-66).
    Deterministic tie-break on word so the top-20 cut is engine-stable."""
    return (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("word"))
        .limit(20)
    )


def q_words_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 inverse mode (`yield_unique_values=False`, reference
    aggregators.py:127): emit every occurrence AFTER the first of each
    normalized word within its doc — the duplicates the dedup would drop."""
    from python_multiproc_bigdata_spark.operators.aggregates import duplicates_per_key

    d = table(prep(spark), sf_dir, "documents")
    tokens = (
        d.select(
            F.col("doc_id").cast("string").alias("file_path"),
            F.explode(F.split("text", WHITESPACE_RE)).alias("word"),
        )
        .filter(F.length(F.trim("word")) > 0)
    )
    dups = duplicates_per_key(
        tokens, ["file_path"], "word", normalizers=[lambda c: F.lower(F.trim(c))]
    )
    return dups.groupBy("file_path", "word").agg(F.count(F.lit(1)).alias("n_extra"))


SQL_WORDS_DUPLICATES = r"""
WITH tok AS (
    SELECT CAST(doc_id AS VARCHAR) AS file_path,
           unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS word
    FROM documents
), tok_nb AS (
    SELECT file_path, word FROM tok WHERE length(trim(word)) > 0
), numbered AS (
    SELECT file_path, word,
           row_number() OVER (PARTITION BY file_path, lower(trim(word))
                              ORDER BY word) AS rn
    FROM tok_nb
)
SELECT file_path, word, count(*) AS n_extra
FROM numbered WHERE rn > 1 GROUP BY 1, 2
"""


def q_words_v1_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v1 pipeline's token length gate 1 < len < 16 (reference
    v1/utils.py:266-269) applied to the words output."""
    w = _words(spark, sf_dir)
    return w.filter((F.length("word") > 1) & (F.length("word") < 16)).groupBy(
        "file_path"
    ).agg(F.count(F.lit(1)).alias("kept_words"))


SQL_WORDS_V1_FILTER = (
    WORDS_CTE
    + """SELECT file_path, count(*) AS kept_words FROM words
         WHERE length(word) > 1 AND length(word) < 16 GROUP BY file_path"""
)


def q_words_first_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: 1-based position of the first occurrence of each
    distinct token within its doc (UDTF-with-ordinality shape)."""
    d = table(prep(spark), sf_dir, "documents")
    toks = F.filter(F.split("text", WHITESPACE_RE), lambda w: F.length(w) > 0)
    posed = d.select(
        F.col("doc_id"), F.posexplode(toks).alias("pos", "word")
    )
    return posed.groupBy("doc_id", "word").agg(
        (F.min("pos") + 1).cast("long").alias("first_pos")
    )


SQL_WORDS_FIRST_POS = r"""
WITH posed AS (
  SELECT doc_id, unnest(toks) AS word, generate_subscripts(toks, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks
        FROM documents)
)
SELECT doc_id, word, min(pos) AS first_pos
FROM posed GROUP BY doc_id, word
"""


REGISTRY = {
    "words_first_position": QuerySpec(q_words_first_position, SQL_WORDS_FIRST_POS),
    "words_duplicate_occurrences": QuerySpec(q_words_duplicates, SQL_WORDS_DUPLICATES),
    "words_v1_length_filter": QuerySpec(q_words_v1_length_filter, SQL_WORDS_V1_FILTER),
    "words_pipeline": QuerySpec(
        q_words_pipeline,
        WORDS_CTE + "SELECT word, word_len, word_truncated, file_path, file_words_count FROM words",
    ),
    "words_total_tokens": QuerySpec(
        q_words_total_tokens,
        WORDS_CTE
        + """SELECT CAST(sum(file_words_count) AS BIGINT) AS total_tokens
             FROM (SELECT DISTINCT file_path, file_words_count FROM words)""",
    ),
    "words_distinct_files": QuerySpec(
        q_words_distinct_files,
        WORDS_CTE + "SELECT count(DISTINCT file_path) AS distinct_files FROM words",
    ),
    "words_no_dupes": QuerySpec(
        q_words_no_dupes,
        WORDS_CTE
        + """SELECT wf, cnt FROM (
               SELECT concat_ws('|', word, file_path) AS wf, count(*) AS cnt
               FROM words GROUP BY 1) WHERE cnt > 1""",
    ),
    "words_doc_frequency": QuerySpec(
        q_words_doc_frequency,
        WORDS_CTE
        + """SELECT word, count(*) AS doc_freq FROM words
             GROUP BY word HAVING count(*) > 100""",
    ),
    "words_top20": QuerySpec(
        q_words_top20,
        WORDS_CTE
        + """SELECT word, count(*) AS doc_freq FROM words
             GROUP BY word ORDER BY doc_freq DESC, word ASC LIMIT 20""",
    ),
}
