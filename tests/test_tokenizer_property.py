"""Property test for Arabic tokenizer fidelity (SURVEY §7 names the
java.util.regex vs Python `re` char-class gap as the hardest correctness
risk): generate adversarial strings mixing Arabic letters, diacritics,
tatweel, hamza forms, Latin, digits, ×, and whitespace; assert Spark's
regexp_extract_all tokenization equals the reference's Python
`re.findall` semantics (v2/arabic_transformers.py:17-25) example-for-
example, in one batched Spark job."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.arabic import (
    ARABIC_DIACRITICS,
    ARABIC_TOKEN_RE_JAVA,
    arabic_tokenize,
    remove_diacritics,
)

# The reference's literal char class (v2/arabic_transformers.py:20).
REF_CLASS = r"[َُِْـًٌٍّؤائءآىإأبتثجحخدذرزسشصضطظعغفقكلمنهـوي]+"

ARABIC_LETTERS = "ءآأؤإئابتثجحخدذرزسشصضطظعغفقكلمنهوي"
# Chars NEAR the class ranges but OUTSIDE the reference's enumerated set:
# ة teh marbuta (U+0629, splits words like مكتبة), the rare U+063B-063F
# letters, and alef wasla U+0671 — these catch over-broad range encodings.
NEAR_MISSES = "ة" + "".join(chr(c) for c in range(0x063B, 0x0640)) + "ٱ"
FILLERS = " \t\r\n×xX1!،؟.é-" + NEAR_MISSES


def reference_tokenize(text: str) -> list[str]:
    """The reference's exact semantics: findall runs, strip ×, split on
    whitespace variants, keep non-blank."""
    out = []
    for run in re.findall(REF_CLASS, text):
        for w in (
            run.replace("×", "").replace(" ", "\n").replace("\r", "\n").replace("\t", "\n").split("\n")
        ):
            if w and w.strip():
                out.append(w)
    return out


def gen_string(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 40)):
        roll = rng.random()
        if roll < 0.5:
            parts.append(rng.choice(ARABIC_LETTERS))
        elif roll < 0.7:
            parts.append(rng.choice(ARABIC_DIACRITICS))
        elif roll < 0.75:
            parts.append("ـ")  # tatweel
        else:
            parts.append(rng.choice(FILLERS))
    return "".join(parts)


def test_arabic_tokenizer_matches_reference_semantics(spark):
    rng = random.Random(20260813)
    cases = [gen_string(rng) for _ in range(500)]
    cases += [
        "",
        "ـ",
        "×",
        "كتاب×قلم",
        ARABIC_DIACRITICS,
        "a" + ARABIC_LETTERS + "b",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "txt"])
    got_rows = (
        df.select("i", arabic_tokenize("txt").alias("toks"))
        .collect()
    )
    got = {r.i: [w for w in r.toks if w and w.strip()] for r in got_rows}
    for i, c in enumerate(cases):
        assert got[i] == reference_tokenize(c), f"case {i}: {c!r}"


def test_remove_diacritics_matches_reference(spark):
    def ref_remove(text: str) -> str:  # v2/arabic_transformers.py:27-30
        for d in "َِّ ُ ْ ً ٌ ٍ".replace(" ", ""):
            text = text.replace(d, "")
        return text

    rng = random.Random(42)
    cases = [gen_string(rng) for _ in range(200)]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "txt"])
    got = {r.i: r.clean for r in df.select("i", remove_diacritics("txt").alias("clean")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == ref_remove(c), f"case {i}: {c!r}"