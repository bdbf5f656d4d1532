"""Generic text analysis functions — tokenization (SURVEY §2.3 F3/F4) plus
the beyond-reference text-pipeline ops (language-ID, quality scoring, token
counting, fingerprinting) a training-data pipeline needs at scale.

Everything is built-in column expressions (JVM, whole-stage codegen); at
100 TB these run inside the scan stage with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Explicit class, NOT \s: java.util.regex counts U+000B vertical tab as
# whitespace while the oracles' RE2 does not — an explicit class keeps the
# two engines tokenizing identically on any input.
WHITESPACE_RE = r"[ \t\n\r\f\x0B]+"
# BPE-ish pretokenizer: word runs OR single non-word-non-space chars —
# the standard GPT-2-style pretokenization shape, ASCII-class for
# engine-portable semantics.
BPEISH_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\x0B]"

# Tiny fixed stopword lists per language for the n-gram/stopword
# language-ID heuristic and stopword-ratio quality signal.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "les"],
    "es": ["el", "la", "de", "y", "los"],
    "de": ["der", "die", "das", "und", "zu"],
}


def tokenize(col: Column | str, pattern: str = WHITESPACE_RE) -> Column:
    """F4: regex-split tokenization (reference v2/core/transformers/text.py:43-71
    uses ``re.split``). Returns array<string>; blanks NOT yet filtered —
    compose with ``F.filter`` or explode+filter, mirroring the reference's
    ``ignore_word_fn`` stage (text.py:36)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, pattern)


def explode_tokens(
    df: DataFrame, text_col: str, out_col: str = "word", pattern: str = WHITESPACE_RE
) -> DataFrame:
    """F3/F4 as a table transform: one row per non-blank token."""
    return df.withColumn(out_col, F.explode(tokenize(text_col, pattern))).filter(
        F.length(F.trim(out_col)) > 0
    )


def token_count_bpeish(col: Column | str) -> Column:
    """Token count under the BPE-ish pretokenizer (beyond-reference)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPEISH_TOKEN_RE), F.lit(0)))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Portable across engines
    (DuckDB md5 produces the identical hex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), WHITESPACE_RE, " "))


def _ratio(n: Column, d: Column) -> Column:
    return F.when(d > 0, n.cast("double") / d.cast("double")).otherwise(F.lit(0.0))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals per document (beyond-reference): token count, mean
    token length, alpha ratio, stopword ratio, plus a blended 0-1 score.

    All pure column math — survives any scale as a map-only stage.
    """
    c = F.col(text_col)
    # project the token array once — the four token-derived measures would
    # otherwise each re-run the tokenization (inline-HOF recompute trap)
    df = df.withColumn(
        "_q_toks", F.filter(F.split(c, WHITESPACE_RE), lambda w: F.length(w) > 0)
    )
    toks = F.col("_q_toks")
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS["en"]))
    )
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn(
            "mean_token_len",
            F.round(_ratio(F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)).cast("double"), n_tokens), 4),
        )
        .withColumn("alpha_ratio", F.round(_ratio(alpha_chars, n_chars), 4))
        .withColumn("stopword_ratio", F.round(_ratio(stop_hits, n_tokens), 4))
    )
    # Weights 0.4/0.4/0.2 over 4-decimal inputs keep the blend's 5th
    # decimal even, so round(…, 4) never sits on a half-boundary (where
    # engines' rounding of the nearest-double representation can differ).
    return out.withColumn(
        "quality_score",
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0)) * F.lit(0.4)
            + F.col("alpha_ratio") * F.lit(0.4)
            + F.least(F.lit(1.0), F.col("stopword_ratio") * F.lit(5.0)) * F.lit(0.2),
            4,
        ),
    ).drop("_q_toks")


def with_language_id(df: DataFrame, text_col: str, out_col: str = "predicted") -> DataFrame:
    """DataFrame-level language-ID: projects the token array to a named
    column first so the per-language scoring references it instead of
    re-tokenizing 4x (the inline-HOF recompute trap; see
    operators/dedup.py:word_shingles for the same fix, measured there)."""
    toks_expr = F.filter(
        F.split(F.lower(F.col(text_col)), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    out = df.withColumn("_lang_toks", toks_expr).withColumn(
        out_col, language_id_from_tokens(F.col("_lang_toks"))
    )
    return out.drop("_lang_toks")


def language_id(col: Column | str) -> Column:
    """Heuristic language-ID (beyond-reference): scores each candidate
    language by stopword hits over the token array and returns the argmax
    (ties → lexicographically first language; 'und' when no hits).

    Pure column expressions — at scale this is a map-only stage; a real
    model would slot in as a Pandas UDF with the same signature.
    Prefer `with_language_id` on a DataFrame: it tokenizes once instead
    of once per candidate language.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), WHITESPACE_RE), lambda w: F.length(w) > 0)
    return language_id_from_tokens(toks)


def language_id_from_tokens(toks: Column) -> Column:
    """language_id over an already-materialized token array column."""

    def hits(stopwords: list[str]) -> Column:
        # NB: capture via factory, not a default arg — a two-parameter
        # lambda makes F.filter pass the element index as the 2nd arg.
        return F.size(F.filter(toks, lambda w: w.isin(*stopwords)))

    scored = F.array(
        *[
            F.struct(hits(sw).alias("hits"), F.lit(lang).alias("lang"))
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(
        F.filter(scored, lambda s: s["hits"] > 0)
    )  # max on struct = (hits, then lang) lexicographic; null if empty
    # On hits ties array_max prefers the lexicographically LAST lang, so
    # invert: keep max hits, then min lang among those with max hits.
    max_hits = best["hits"]
    winners = F.filter(scored, lambda s: s["hits"] == max_hits)
    return F.when(best.isNull(), F.lit("und")).otherwise(
        F.array_min(winners)["lang"]
    )


def sliding_chunks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
):
    """RAG-style sliding-window chunking: split each document into
    overlapping `chunk_tokens`-token windows every `stride` tokens
    (overlap = chunk_tokens - stride), keyed by chunk index and start
    offset. Emits the chunk digest (md5 of the space-joined slice), not
    the text, so the output stays narrow; a real pipeline would carry
    the slice itself into an embedding stage.

    Chunk count is 1 + ceil(max(n - chunk_tokens, 0) / stride) — every
    document yields at least one chunk (possibly short or empty), and
    the final chunk always reaches the last token.

    Scale: map-only (tokenize → sequence → explode → slice), no shuffle;
    ~n/stride output rows per document. `_toks` is referenced twice
    (size + slice) so CollapseProject cannot inline the tokenizer into
    the per-chunk slice (the measured O(n²) trap — SCALE.md). Integer
    ceil-division on both engines: no float in the chunk-count path.
    """
    from pyspark.sql import functions as F

    d = (
        df.select(
            F.col(id_col),
            F.filter(
                F.split(F.col(text_col), WHITESPACE_RE), lambda x: F.length(x) > 0
            ).alias("_toks"),
        )
        .withColumn("_n", F.size("_toks").cast("long"))
        .withColumn(
            "_nc",
            F.expr(
                f"1 + (greatest(_n - {chunk_tokens}, 0) + {stride - 1}) div {stride}"
            ),
        )
    )
    d = d.withColumn("_ci", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)))
    start = F.col("_ci") * stride
    return d.select(
        F.col(id_col),
        F.col("_ci").alias("chunk_idx"),
        start.alias("start_tok"),
        F.least(F.lit(chunk_tokens).cast("long"), F.col("_n") - start).alias(
            "n_chunk_tokens"
        ),
        F.md5(
            F.array_join(F.slice("_toks", start + 1, chunk_tokens), " ")
        ).alias("chunk_digest"),
    )
