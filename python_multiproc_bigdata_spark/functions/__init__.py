"""Column-function library — the reference's scalar callables (SURVEY §2.6)
re-expressed as Catalyst expressions (JVM-side, codegen-friendly; no Python
UDFs in any hot path)."""

from python_multiproc_bigdata_spark.functions.strings import (
    basename_backwards,
    format_result,
    len_gt,
    truncate_str,
)
from python_multiproc_bigdata_spark.functions.arabic import (
    ARABIC_DIACRITICS,
    ARABIC_TOKEN_RE_JAVA,
    arabic_tokenize,
    remove_diacritics,
)
from python_multiproc_bigdata_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count_bpeish,
    tokenize,
)
from python_multiproc_bigdata_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "ARABIC_DIACRITICS",
    "ARABIC_TOKEN_RE_JAVA",
    "arabic_tokenize",
    "basename_backwards",
    "cosine_similarity",
    "doc_fingerprint",
    "dot",
    "format_result",
    "l2_norm",
    "language_id",
    "len_gt",
    "quality_score",
    "remove_diacritics",
    "token_count_bpeish",
    "tokenize",
    "truncate_str",
]
