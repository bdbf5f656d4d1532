"""Scalar-function parity queries (SURVEY §2.6 X1–X7, §2.3 F5) on literal
VALUES fixtures — character-exact checks of the function library against
DuckDB, covering the FIXTURES.md §3 edge cases (short paths, >255-char
words, Arabic diacritics, × chars, whitespace runs).

The Spark side builds the same literals with createDataFrame; the oracle
uses a VALUES table. Regex syntax differs (java.util.regex \\u vs RE2
\\x{…}) — both sides express the reference's Arabic class in their own
dialect and must produce identical tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.arabic import (
    ARABIC_TOKEN_RE_DUCKDB,
    arabic_tokenize,
    remove_diacritics,
)
from python_multiproc_bigdata_spark.functions.strings import (
    basename_backwards,
    format_result,
    len_gt,
    truncate_str,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep

# ---- fixtures ------------------------------------------------------------

PATHS = [
    (1, "/a/b/c/d/e/f/file.txt"),
    (2, "/a/b/file.txt"),
    (3, "file.txt"),
    (4, "/x/file.txt"),
    (5, "/1/2/3/4/5/6/7/8/9/file.txt"),
]

LONG_WORD = "w" * 300
EXACT_255 = "y" * 255
EXACT_256 = "z" * 256
WORDS = [(1, "short"), (2, LONG_WORD), (3, EXACT_255), (4, EXACT_256), (5, "")]

ARABIC_TEXTS = [
    (1, "قَرَأَ الطالِبُ الكِتابَ في المَكتَبة"),  # diacritized sentence
    (2, "hello كتاب world قلم 123"),               # mixed script
    (3, "ـتطويلـ and ءامن"),                        # tatweel + hamza forms
    (4, "no arabic here at all"),
    (5, "كِتَاب×قلم كتاب"),                          # × splits the char class run
]


def _values_sql(rows: list[tuple], cols: str) -> str:
    vals = ", ".join(
        "(" + ", ".join(
            str(v) if isinstance(v, int) else "'" + str(v).replace("'", "''") + "'"
            for v in row
        ) + ")"
        for row in rows
    )
    return f"(VALUES {vals}) AS t({cols})"


# ---- queries -------------------------------------------------------------

def func_basename_backwards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: last-5-segments path normalization incl. the short-path
    early-break (reference v2/core/commons.py:138-161)."""
    df = prep(spark).createDataFrame(PATHS, ["id", "path"])
    return df.select("id", basename_backwards("path", 5).alias("norm_path"))


# Reference-exact: trailing min(5, n) NON-EMPTY segments, no leading '/'
# (the reference's basename/dirname walk consumes '/' into empty
# basenames that os.path.join drops — functions/strings.py docstring).
SQL_BASENAME = f"""
SELECT id,
       array_to_string(
         CASE WHEN len(ne) <= 5 THEN ne ELSE ne[-5:] END, '/') AS norm_path
FROM (SELECT id, list_filter(string_split(path, '/'), p -> p != '') AS ne
      FROM {_values_sql(PATHS, "id, path")})
"""


def func_truncate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2: truncate-to-254 with its deliberate off-by-one, plus the
    len>255 flag (reference v2/core/commons.py:163-173)."""
    df = prep(spark).createDataFrame(WORDS, ["id", "w"])
    return df.select(
        "id",
        truncate_str("w", 255).alias("w_trunc"),
        F.length(truncate_str("w", 255)).alias("trunc_len"),
        len_gt("w", 255).alias("truncated"),
    )


SQL_TRUNCATE = f"""
SELECT id, substr(w, 1, 254) AS w_trunc, length(substr(w, 1, 254)) AS trunc_len,
       length(w) > 255 AS truncated
FROM {_values_sql(WORDS, "id, w")}
"""


def func_arabic_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+X4: the reference Arabic tokenizer char class and diacritic
    strip (v2/arabic_transformers.py:20,27-30), exploded to one row per
    token with its diacritic-free form and length."""
    df = prep(spark).createDataFrame(ARABIC_TEXTS, ["id", "txt"])
    return (
        df.select("id", F.explode(arabic_tokenize("txt")).alias("word"))
        .filter(F.length(F.trim("word")) > 0)
        .select(
            "id",
            "word",
            remove_diacritics("word").alias("word_clean"),
            F.length(remove_diacritics("word")).alias("word_len"),
        )
    )


SQL_ARABIC = f"""
WITH tok AS (
  SELECT id, unnest(regexp_extract_all(txt, '{ARABIC_TOKEN_RE_DUCKDB}')) AS word
  FROM {_values_sql(ARABIC_TEXTS, "id, txt")}
)
SELECT id, word,
       translate(word, 'ًٌٍَُِّْ', '') AS word_clean,
       length(translate(word, 'ًٌٍَُِّْ', '')) AS word_len
FROM tok WHERE length(trim(word)) > 0
"""


def func_format_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: the beam variant's '%s; %s; %s' formatting (py-beam/main.py:99-102)."""
    rows = [(1, "word", 42, "file.txt"), (2, "كتاب", 7, "a/b.txt")]
    df = prep(spark).createDataFrame(rows, ["id", "w", "n", "f"])
    return df.select("id", format_result("w", "n", "f").alias("line"))


SQL_FORMAT = f"""
SELECT id, printf('%s; %s; %s', w, n::VARCHAR, f) AS line
FROM {_values_sql([(1, "word", 42, "file.txt"), (2, "كتاب", 7, "a/b.txt")], "id, w, n, f")}
"""


def func_null_safe_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 null semantics (reference one_to_one.py:41-44): the mapper chain
    is skipped entirely for null inputs — null in, null out, composed
    functions never see the null."""
    from python_multiproc_bigdata_spark.operators.transforms import trans_values

    df = prep(spark).createDataFrame(
        [(1, "ok"), (2, None), (3, " pad ")], ["id", "s"]
    )
    out = trans_values(
        df, [("s", [F.trim, F.upper, lambda c: F.concat(c, F.lit("!"))])]
    )
    return out.select("id", "s")


SQL_NULL_CHAIN = """
SELECT id, CASE WHEN s IS NULL THEN NULL ELSE upper(trim(s)) || '!' END AS s
FROM (VALUES (1, 'ok'), (2, NULL), (3, ' pad ')) AS t(id, s)
"""


STRINGS = [(1, "Hello World"), (2, "  padded  "), (3, "a;b;c;d"), (4, ""), (5, "κλμ")]


def func_string_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitchen-sink string-function parity: pad/trim/replace/position/
    reverse/repeat/case over edge inputs (empty, multibyte, delimiters)."""
    df = prep(spark).createDataFrame(STRINGS, ["id", "s"])
    return df.select(
        "id",
        F.lpad("s", 15, "*").alias("lpadded"),
        F.rpad("s", 15, "*").alias("rpadded"),
        F.ltrim("s").alias("ltrimmed"),
        F.rtrim("s").alias("rtrimmed"),
        F.instr("s", "l").cast("long").alias("pos_l"),
        F.regexp_replace("s", "[aeiou]", "_").alias("devoweled"),
        F.reverse("s").alias("reversed"),
        F.repeat("s", 2).alias("doubled"),
        F.upper("s").alias("uppered"),
        F.substring("s", 2, 3).alias("sub23"),
        F.length("s").cast("long").alias("len"),
    )


SQL_STRING_LIB = f"""
SELECT id,
       lpad(s, 15, '*') AS lpadded,
       rpad(s, 15, '*') AS rpadded,
       ltrim(s) AS ltrimmed,
       rtrim(s) AS rtrimmed,
       strpos(s, 'l') AS pos_l,
       regexp_replace(s, '[aeiou]', '_', 'g') AS devoweled,
       reverse(s) AS reversed,
       repeat(s, 2) AS doubled,
       upper(s) AS uppered,
       substr(s, 2, 3) AS sub23,
       length(s) AS len
FROM {_values_sql(STRINGS, "id, s")}
"""


def func_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function parity over orders: year/month/day/quarter
    extraction and month truncation. (Day-of-week deliberately mapped:
    Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday.)"""
    from python_multiproc_bigdata_spark.registry.common import table as _t

    o = _t(prep(spark), sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("y"),
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.month("o_orderdate").cast("long").alias("m"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
        )
        .groupBy("y", "q", "m", "dow_sun0", "month_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_DATETIME = """
SELECT year(o_orderdate) AS y,
       quarter(o_orderdate) AS q,
       month(o_orderdate) AS m,
       dayofweek(o_orderdate) % 7 AS dow_sun0,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       count(*) AS n
FROM orders GROUP BY 1, 2, 3, 4, 5
"""


ARR_ROWS = [(1, [3, 1, 2], [2, 4]), (2, [], [1]), (3, [5, 5], [5])]


def func_array_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function parity: sort/distinct/union/intersect/except/
    contains/size over edge inputs (empty arrays, duplicates).

    Array results are emitted as comma-joined strings, not array<int>
    cells: the driver's canonicalizer hashes rows through a pandas sort
    that cannot factorize list cells (r7 red: "unhashable type: 'list'").
    The arrays are order-canonicalized by array_sort first, so the join
    is lossless for the comparison."""
    df = prep(spark).createDataFrame(ARR_ROWS, "id int, a array<int>, b array<int>")
    as_str = lambda c: F.array_join(c.cast("array<string>"), ",")
    return df.select(
        "id",
        as_str(F.sort_array("a")).alias("sorted_a"),
        # sorted: Spark's array_distinct keeps first-occurrence order while
        # DuckDB's list_distinct does not guarantee any order
        as_str(F.array_sort(F.array_distinct("a"))).alias("distinct_a"),
        as_str(F.array_sort(F.array_union("a", "b"))).alias("union_ab"),
        as_str(F.array_sort(F.array_intersect("a", "b"))).alias("inter_ab"),
        as_str(F.array_sort(F.array_except("a", "b"))).alias("except_ab"),
        F.array_contains("a", 2).alias("has_2"),
        F.size("a").cast("long").alias("n_a"),
    )


# DuckDB list_sort etc.; set semantics of Spark's union/intersect/except
# (distinct results) are reproduced with list_distinct. The VALUES clause
# is derived from ARR_ROWS so fixture and oracle cannot drift.
_ARR_VALUES = ", ".join(f"({i}, {a}, {b})" for i, a, b in ARR_ROWS)
SQL_ARRAY_LIB = f"""
SELECT id,
       coalesce(array_to_string(list_sort(a), ','), '') AS sorted_a,
       coalesce(array_to_string(list_sort(list_distinct(a)), ','), '') AS distinct_a,
       coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS union_ab,
       coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ','), '') AS inter_ab,
       coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_ab,
       list_contains(a, 2) AS has_2,
       len(a) AS n_a
FROM (VALUES {_ARR_VALUES}) AS t(id, a, b)
"""


def func_udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python UDTF surface (operators/udfs.py:char_ngrams_udtf) under
    the driver gate: LATERAL-apply the Arrow-batched table function to a
    bounded document slice, yielding (doc_id, pos, ngram) char trigrams.
    Completes the UDF/UDAF/UDTF trio of the reference's callable slots
    (SURVEY §2.7) with a value-checked row: the oracle regenerates the
    same trigrams with substr over generated positions.

    The trigram EXPLODE itself would ship as explode(sequence(...)) on
    the fast path (JVM-side, like the tokenizers); the UDTF exists to
    prove the generality escape hatch works end-to-end — and is why the
    input here is a bounded slice, not the corpus."""
    from python_multiproc_bigdata_spark.operators.udfs import char_ngrams_udtf

    s = prep(spark)
    s.udtf.register("pmb_char_ngrams", char_ngrams_udtf())
    s.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 10
    ).createOrReplaceTempView("_udtf_docs")
    return s.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM _udtf_docs d, LATERAL pmb_char_ngrams(d.text) g
        ORDER BY d.doc_id, g.pos
        """
    )


SQL_UDTF_NGRAMS = r"""
WITH pos AS (
  SELECT doc_id, unnest(range(0, greatest(0, length(text) - 2))) AS pos, text
  FROM documents WHERE doc_id < 10
)
SELECT doc_id, pos, substr(text, pos + 1, 3) AS ngram
FROM pos ORDER BY doc_id, pos
"""


REGISTRY = {
    "func_array_library": QuerySpec(func_array_library, SQL_ARRAY_LIB),
    "func_udtf_char_ngrams": QuerySpec(func_udtf_char_ngrams, SQL_UDTF_NGRAMS),
    "func_string_library": QuerySpec(func_string_library, SQL_STRING_LIB),
    "func_datetime_parts": QuerySpec(func_datetime_parts, SQL_DATETIME),
    "func_null_safe_chain": QuerySpec(func_null_safe_chain, SQL_NULL_CHAIN),
    "func_basename_backwards": QuerySpec(func_basename_backwards, SQL_BASENAME),
    "func_truncate_flags": QuerySpec(func_truncate_flags, SQL_TRUNCATE),
    "func_arabic_tokenize": QuerySpec(func_arabic_tokenize, SQL_ARABIC),
    "func_format_result": QuerySpec(func_format_result, SQL_FORMAT),
}
