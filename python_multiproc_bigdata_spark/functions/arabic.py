"""Arabic text functions (SURVEY §2.3 F5/F6, §2.6 X4).

The reference tokenizes Arabic with ``re.findall`` over a positive
character class of Arabic letters + 8 diacritics + tatweel
(reference v2/arabic_transformers.py:20, v1/utils.py:204), then strips
``×`` and splits on whitespace (both no-ops for the positive class — the
class can match neither), keeping non-blank tokens. ``remove_diac`` strips
the 8 diacritic codepoints via chained ``str.replace``
(v2/arabic_transformers.py:27-30).

Here: one ``regexp_extract_all`` (JVM regex, codegen) for tokenization and
one ``translate`` for diacritic removal — not 8 regex passes, and no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 8 diacritics the reference strips: fathatan, dammatan, kasratan,
# fatha, damma, kasra, shadda, sukun (U+064B..U+0652).
ARABIC_DIACRITICS = "ًٌٍَُِّْ"

# Positive token class = the reference's literal class, expressed as
# codepoint ranges: the 8 diacritics (U+064B-0652), tatweel (U+0640),
# hamza forms ء آ أ ؤ إ ئ ا (U+0621-0627), and the enumerated letters
# ب (U+0628), ت..غ (U+062A-063A), ف..ي (U+0641-064A).
# NOT a contiguous U+0621-064A run: the reference's class omits
# ة teh marbuta (U+0629) and the rare U+063B-063F letters — a contiguous
# range would tokenize 'مكتبة' as one token where the reference splits
# it at the ة (property-tested against Python re in
# tests/test_tokenizer_property.py with ة in the generator alphabet).
_TOKEN_CLASS = "[ً-ْـء-ابت-غف-ي]"
ARABIC_TOKEN_RE_JAVA = f"{_TOKEN_CLASS}+"  # java.util.regex (Spark side)
ARABIC_TOKEN_RE_DUCKDB = (
    "[\\x{064b}-\\x{0652}\\x{0640}\\x{0621}-\\x{0628}"
    "\\x{062a}-\\x{063a}\\x{0641}-\\x{064a}]+"
)  # RE2


def remove_diacritics(col: Column | str) -> Column:
    """X4: strip the 8 Arabic diacritic marks in a single ``translate``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ARABIC_DIACRITICS, "")


def arabic_tokenize(col: Column | str) -> Column:
    """F5: array of Arabic tokens (runs of the reference's char class).

    Returns an ``array<string>``; explode + blank-filter downstream. The
    reference's post-split on whitespace and ``×`` strip are provably
    no-ops (neither char is in the positive class), so a single
    ``regexp_extract_all`` is semantically exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(ARABIC_TOKEN_RE_JAVA), F.lit(0))


def explode_arabic_tokens(
    df: DataFrame, text_col: str, out_col: str = "word"
) -> DataFrame:
    """F5 as a table transform: one row per Arabic token of ``text_col``."""
    return df.withColumn(out_col, F.explode(arabic_tokenize(text_col))).filter(
        F.length(F.trim(out_col)) > 0
    )
