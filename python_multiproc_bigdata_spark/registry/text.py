"""Text-analysis query family (beyond-reference, north-star M4): quality
scoring, language-ID, BPE-ish token counting, fingerprinting — each a pure
column-expression plan over `documents` (map-only at any scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import (
    WHITESPACE_RE,
    doc_fingerprint,
    language_id,
    quality_score,
    sliding_chunks,
    token_count_bpeish,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return quality_score(d, "text").select(
        "doc_id", "n_tokens", "mean_token_len", "alpha_ratio",
        "stopword_ratio", "quality_score",
    )


SQL_QUALITY = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         round(CASE WHEN len(toks) > 0 THEN
             list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
           ELSE 0 END, 4) AS mean_token_len,
         round(CASE WHEN n_chars > 0 THEN alpha_chars * 1.0 / n_chars ELSE 0 END, 4) AS alpha_ratio,
         round(CASE WHEN len(toks) > 0 THEN
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to'))) * 1.0 / len(toks)
           ELSE 0 END, 4) AS stopword_ratio
  FROM base
)
SELECT doc_id, n_tokens, mean_token_len, alpha_ratio, stopword_ratio,
       round(least(1.0, n_tokens / 100.0) * 0.4
             + alpha_ratio * 0.4
             + least(1.0, stopword_ratio * 5.0) * 0.2, 4) AS quality_score
FROM m
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix style rollup: labeled lang × predicted lang."""
    from python_multiproc_bigdata_spark.functions.text import with_language_id

    d = table(prep(spark), sf_dir, "documents")
    return (
        with_language_id(d, "text")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_LANG_ID = r"""
WITH scored AS (
  SELECT lang,
         len(list_filter(toks, x -> x IN ('der','die','das','und','zu'))) AS de_hits,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to')))   AS en_hits,
         len(list_filter(toks, x -> x IN ('el','la','de','y','los')))    AS es_hits,
         len(list_filter(toks, x -> x IN ('le','la','de','et','les')))   AS fr_hits
  FROM (SELECT lang,
               list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks
        FROM documents)
), pred AS (
  SELECT lang,
         CASE WHEN de_hits = 0 AND en_hits = 0 AND es_hits = 0 AND fr_hits = 0 THEN 'und'
              WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
              WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
              WHEN es_hits >= fr_hits THEN 'es'
              ELSE 'fr' END AS predicted
  FROM scored
)
SELECT lang, predicted, count(*) AS n FROM pred GROUP BY 1, 2
"""


def eval_langid_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation metrics at scale: per-class precision / recall /
    F1 of the lang-id heuristic against the gold `lang` column — the
    classifier-eval rollup every labeling pipeline needs before trusting
    a model's output as a filter. Plan: one small groupBy builds the
    confusion matrix, two aggregations over that TINY relation derive
    per-class tp / support / predicted-count, and a full-outer join
    covers classes that appear only as gold or only as prediction.
    Everything after the first groupBy operates on ≤ |classes|² rows —
    free at any corpus scale. Exact integer counts; ratios rounded to 4
    (the repo-wide float posture)."""
    from python_multiproc_bigdata_spark.functions.text import with_language_id

    d = table(prep(spark), sf_dir, "documents")
    cm = (
        with_language_id(d, "text")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gold = cm.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("n").alias("n_gold"),
        F.sum(
            F.when(F.col("predicted") == F.col("lang"), F.col("n")).otherwise(F.lit(0))
        ).alias("tp"),
    )
    pred = cm.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    j = gold.join(pred, "cls", "full_outer").select(
        "cls",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return j.select(
        "cls",
        "tp",
        "n_gold",
        "n_pred",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )


# Extends SQL_LANG_ID's prediction CTE with the confusion-matrix →
# per-class metric derivation (identical unrounded ratios, then round 4).
SQL_EVAL_LANGID_F1 = r"""
WITH scored AS (
  SELECT lang,
         len(list_filter(toks, x -> x IN ('der','die','das','und','zu'))) AS de_hits,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to')))   AS en_hits,
         len(list_filter(toks, x -> x IN ('el','la','de','y','los')))    AS es_hits,
         len(list_filter(toks, x -> x IN ('le','la','de','et','les')))   AS fr_hits
  FROM (SELECT lang,
               list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks
        FROM documents)
), pred AS (
  SELECT lang,
         CASE WHEN de_hits = 0 AND en_hits = 0 AND es_hits = 0 AND fr_hits = 0 THEN 'und'
              WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
              WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
              WHEN es_hits >= fr_hits THEN 'es'
              ELSE 'fr' END AS predicted
  FROM scored
), cm AS (
  SELECT lang, predicted, count(*) AS n FROM pred GROUP BY 1, 2
), gold AS (
  SELECT lang AS cls,
         CAST(sum(n) AS BIGINT) AS n_gold,
         CAST(sum(CASE WHEN predicted = lang THEN n ELSE 0 END) AS BIGINT) AS tp
  FROM cm GROUP BY 1
), prd AS (
  SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1
), joined AS (
  SELECT coalesce(g.cls, p.cls) AS cls,
         coalesce(g.tp, 0) AS tp,
         coalesce(g.n_gold, 0) AS n_gold,
         coalesce(p.n_pred, 0) AS n_pred
  FROM gold g FULL OUTER JOIN prd p ON g.cls = p.cls
)
SELECT cls, tp, n_gold, n_pred,
       round(CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0 END, 4) AS precision,
       round(CASE WHEN n_gold > 0 THEN tp * 1.0 / n_gold ELSE 0 END, 4) AS recall,
       round(CASE WHEN n_pred > 0 AND n_gold > 0 AND (tp * 1.0 / n_pred + tp * 1.0 / n_gold) > 0
             THEN 2 * (tp * 1.0 / n_pred) * (tp * 1.0 / n_gold)
                  / (tp * 1.0 / n_pred + tp * 1.0 / n_gold)
             ELSE 0 END, 4) AS f1
FROM joined
"""


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional quality signal: per-doc Shannon entropy (bits)
    over lowercased whitespace tokens, plus type-token ratio — the
    Gopher-family repetition gates catch copies of ONE phrase, entropy
    catches low-diversity text generally (a doc of 5 tokens uniformly
    repeated scores log2(5) regardless of which tokens). Identity used:
    H = log2(n) − (Σ c·log2 c)/n over per-token counts c — one
    explode + two groupBys, word-count shaped, no window. Rounded to 4
    (repo float posture: Σ c·log2 c is an order-dependent double sum)."""
    d = table(prep(spark), sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), WHITESPACE_RE),
                lambda w: F.length(w) > 0,
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("c") * F.log2("c")).alias("_clogc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            F.round(
                F.log2("n_tokens") - F.col("_clogc") / F.col("n_tokens"), 4
            ).alias("entropy_bits"),
            F.round(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        )
    )


SQL_TOKEN_ENTROPY = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
           x -> length(x) > 0)) AS tok
  FROM documents
), counts AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(log2(CAST(sum(c) AS DOUBLE)) - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy_bits,
       round(count(*) * 1.0 / sum(c), 4) AS ttr
FROM counts
GROUP BY doc_id
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per doc, validated against the
    table's own n_chars column."""
    d = table(prep(spark), sf_dir, "documents")
    ws = F.size(
        F.filter(F.split("text", WHITESPACE_RE), lambda w: F.length(w) > 0)
    )
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        token_count_bpeish("text").alias("bpeish_tokens"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_ok"),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0)) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\x0B]')) AS bpeish_tokens,
       length(text) = n_chars AS n_chars_ok
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 fingerprint over normalized text (the primitive
    behind exact dedup)."""
    d = table(prep(spark), sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fingerprint
FROM documents
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the corpus: tf = term count in doc, idf = ln(N/df);
    top-3 terms per doc by rounded score (tie-break on term). Two
    groupBys + one broadcast join (df table is one row per distinct term)."""
    from pyspark.sql import Window

    d = table(prep(spark), sf_dir, "documents")
    tokens = (
        d.select(
            "doc_id", F.explode(F.split("text", WHITESPACE_RE)).alias("term")
        )
        .filter(F.length(F.trim("term")) > 0)
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # driver-side scalar: one number, not data
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


SQL_TFIDF = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS term FROM documents
), tok_nb AS (
  SELECT doc_id, term FROM tok WHERE length(trim(term)) > 0
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok_nb GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, round(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored)
WHERE rk <= 3
"""


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profile of the documents table. exact=True
    because the oracle needs bit-equal distinct counts at small SF; the
    operator's DEFAULT is approx (HLL++) — see operators/profile.py and
    test_operators.py::test_profile_approx_default for that path."""
    from python_multiproc_bigdata_spark.operators.profile import profile

    d = table(prep(spark), sf_dir, "documents")
    return profile(d, exact=True)


SQL_PROFILE = """
SELECT col_name, n_rows, n_nulls, n_distinct FROM (
  SELECT 'doc_id' AS col_name, count(*) AS n_rows,
         count(CASE WHEN doc_id IS NULL THEN 1 END) AS n_nulls,
         count(DISTINCT doc_id) AS n_distinct FROM documents
  UNION ALL
  SELECT 'text', count(*), count(CASE WHEN text IS NULL THEN 1 END),
         count(DISTINCT text) FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(CASE WHEN lang IS NULL THEN 1 END),
         count(DISTINCT lang) FROM documents
  UNION ALL
  SELECT 'source', count(*), count(CASE WHEN source IS NULL THEN 1 END),
         count(DISTINCT source) FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(CASE WHEN n_chars IS NULL THEN 1 END),
         count(DISTINCT n_chars) FROM documents
)
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_QUERIES = 20
BM25_TOP_K = 5


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Okapi/Lucene form, k1=1.2 b=0.75): the
    ranking function a corpus-scale search/retrieval pass uses where
    TF-IDF stops — length-normalized, saturating term weight. The query
    set is the corpus's own top-20 document-frequent terms (fully
    deterministic — ties to the lexicographically first term), each
    scored against every containing doc; top-5 docs per query term.

    Plan: tokenize once, two partial-agg groupBys (tf per doc-term, dl
    per doc), a term-level df rollup whose top-20 slice is picked by
    orderBy().limit() (TakeOrderedAndProject — per-partition top-k
    heaps, NO unpartitioned window over the Heaps-law vocabulary) and
    broadcast, a 1-row corpus-stats broadcast (N, avgdl), one
    row_number cut per term (term-partitioned). idf =
    ln((N-df+0.5)/(df+0.5) + 1) keeps the Lucene non-negativity fix.
    Arithmetic parenthesization mirrors the oracle exactly so the
    rounded scores are bit-equal."""
    d = table(prep(spark), sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", WHITESPACE_RE)).alias("term")
    ).filter(F.length(F.trim("term")) > 0)
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # top-20 query terms via orderBy().limit() → TakeOrderedAndProject
    # (per-partition top-k + driver merge of 20-row heaps): rank-equal
    # to the old row_number cut under the deterministic (df, term)
    # tiebreak, but never funnels the Heaps-law vocabulary (1e8+ terms
    # at 100 TB) through one unpartitioned-window task
    queries = df_.orderBy(F.desc("df"), F.asc("term")).limit(BM25_TOP_QUERIES)
    scored = (
        tf.join(F.broadcast(queries), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    score = F.round(idf * F.col("tf") * (BM25_K1 + 1) / denom, 4)
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BM25_TOP_K)
        .select("term", "doc_id", "tf", "score", "rk")
    )


SQL_BM25 = rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS term FROM documents
), tok_nb AS (
  SELECT doc_id, term FROM tok WHERE length(trim(term)) > 0
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok_nb GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM tok_nb GROUP BY 1
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), queries AS (
  SELECT term, df FROM (
    SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS qr FROM df)
  WHERE qr <= {BM25_TOP_QUERIES}
), scored AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf
               * {BM25_K1 + 1}
               / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)), 4) AS score
  FROM tf JOIN queries USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT term, doc_id, tf, score, rk FROM (
  SELECT term, doc_id, tf, score,
         row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id ASC) AS rk
  FROM scored) WHERE rk <= {BM25_TOP_K}
"""


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-sizing metric: what
    fraction of the corpus token stream is covered by the top-K
    frequency-ranked vocabulary, at K in {5, 10, 20, 100}
    (plus the full vocab size as the last row's n_vocab). Drives the
    classic vocab-size/OOV-rate tradeoff decision before training a
    tokenizer.

    One tokenize+groupBy builds (term, freq); the global rank AND the
    cumulative prefix-sum both run through with_global_index's bucketed
    split (operators/transforms.py — quantile range buckets, within-
    bucket windows, broadcast count/sum offsets), so a 100M-term web
    vocabulary never funnels through a single-partition window; the K
    cuts read 4 rows from the ranked frame. Ratio rounded to 6."""
    d = table(prep(spark), sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("term")
    ).filter(F.length(F.trim("term")) > 0)
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # global rank + running-sum in desc-frequency order through
    # with_global_index's bucketed split (quantile range buckets +
    # broadcast offsets — the cumsum option exists for exactly this
    # coverage-curve shape): no single-partition window ever sees the
    # full vocabulary. DESC legs pre-negate (the primitive sorts ASC);
    # (c, term) is unique so ranks are stable.
    from python_multiproc_bigdata_spark.operators.transforms import (
        with_global_index,
    )

    ranked = (
        with_global_index(
            freq.withColumn("negc", -F.col("c")),
            ["negc", "term"],
            out_col="i0",
            cumsum={"c": "cum"},
        )
        .select("c", (F.col("i0") + 1).cast("int").alias("rk"), "cum")
    )
    total = toks.agg(F.count(F.lit(1)).alias("t"))
    nv = freq.agg(F.count(F.lit(1)).alias("n_vocab"))
    mx = ranked.agg(F.max("rk").alias("max_rk"))
    # cut rows: the K marks that exist plus the last vocab row (for K
    # beyond the vocabulary) — a broadcast-filtered handful of rows, so
    # everything after the ranked window is driver-printable size
    cuts = ranked.crossJoin(F.broadcast(mx)).filter(
        F.col("rk").isin(5, 10, 20, 100)
        | (F.col("rk") == F.col("max_rk"))
    )
    ks = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(k) for k in (5, 10, 20, 100)])).alias("k")
    )
    return (
        ks.join(
            cuts,
            (F.col("rk") == F.col("k"))
            | ((F.col("k") >= F.col("max_rk")) & (F.col("rk") == F.col("max_rk"))),
        )
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(nv))
        .select(
            F.least(F.col("k"), F.col("max_rk")).alias("top_k"),
            F.round(F.col("cum") / F.col("t"), 6).alias("coverage"),
            F.col("n_vocab"),
        )
        .distinct()
        .orderBy("top_k")
    )


SQL_VOCAB_COVERAGE = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                            x -> length(trim(x)) > 0)) AS term
  FROM documents
), freq AS (
  SELECT term, count(*) AS c FROM toks GROUP BY term
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rk,
         sum(c) OVER (ORDER BY c DESC, term ASC ROWS UNBOUNDED PRECEDING) AS cum
  FROM freq
), total AS (
  SELECT count(*) AS t FROM toks
), nv AS (
  SELECT count(*) AS n_vocab, max(1) FROM freq
), mx AS (
  SELECT max(rk) AS max_rk FROM ranked
)
SELECT DISTINCT least(k, max_rk) AS top_k,
       round(cum * 1.0 / t, 6) AS coverage,
       n_vocab
FROM (VALUES (5), (10), (20), (100)) ks(k), ranked, total, nv, mx
WHERE rk = k OR (k >= max_rk AND rk = max_rk)
ORDER BY top_k
"""


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the classic
    corpus-statistics step (Church & Hanks 1990) behind multi-word-token
    discovery and phrase vocabularies for tokenizer training:
    pmi(x,y) = ln( P(xy) / (P(x)·P(y)) ) over adjacent token bigrams,
    reported for bigrams seen >= 5 times with pmi > 0.

    Plan: bigrams come from zipping each doc's token array with its own
    tail (slice+arrays_zip, JVM-side — adjacency never leaves the array,
    so no positional self-join); one groupBy each for unigram and bigram
    counts; the two total counts are 1-row broadcast fan-outs. At 100 TB
    this is word-count-shaped: two map-side-combined aggregations over
    the token stream, and the count tables join on the bigram's words —
    the unigram side is vocabulary-bounded, so AQE broadcasts it."""
    d = table(prep(spark), sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), WHITESPACE_RE), lambda x: F.length(F.trim(x)) > 0
    )
    td = d.select(toks.alias("toks"))
    uni = td.select(F.explode("toks").alias("w"))
    cx = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.count(F.lit(1)).alias("nu"))
    bg = (
        td.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                    F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cxy = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    nb = bg.agg(F.count(F.lit(1)).alias("nb"))
    raw_pmi = F.log(
        F.col("c_xy") * F.lit(1.0) * F.col("nu") * F.col("nu")
        / (F.col("nb") * F.col("ca") * F.col("cb"))
    )
    return (
        cxy.join(cx.select(F.col("w").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(cx.select(F.col("w").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .filter((F.col("c_xy") >= 5) & (raw_pmi > 0))
        .select("w1", "w2", "c_xy", F.round(raw_pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


SQL_PMI = r"""
WITH td AS (
  SELECT list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(trim(x)) > 0) AS toks
  FROM documents
), uni AS (
  SELECT unnest(toks) AS w FROM td
), cx AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
nu AS (SELECT count(*) AS n FROM uni),
bg AS (
  SELECT unnest(list_transform(range(greatest(len(toks) - 1, 0)),
         i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS b
  FROM td WHERE len(toks) >= 2
), cxy AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
nb AS (SELECT count(*) AS n FROM bg)
SELECT w1, w2, c_xy,
       round(ln(c_xy * 1.0 * nu.n * nu.n / (nb.n * a.c * b.c)), 4) AS pmi
FROM cxy JOIN cx a ON cxy.w1 = a.w JOIN cx b ON cxy.w2 = b.w, nu, nb
WHERE c_xy >= 5 AND ln(c_xy * 1.0 * nu.n * nu.n / (nb.n * a.c * b.c)) > 0
ORDER BY pmi DESC, w1, w2
"""


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 BPE merges learned from the corpus (operators/bpe.py:
    bpe_train_merges) — the tokenizer-training step of the LLM data
    pipeline. One corpus-scale word-count shuffle; every iteration after
    runs on the vocabulary relation (corpus-size-independent) with an
    O(1)-row argmax collect per merge, k-means-loop style. The result
    relation is O(n_merges) scalars, so building it driver-side is the
    same bounded pattern as the trained-centroid literals."""
    from python_multiproc_bigdata_spark.operators.bpe import bpe_train_merges

    d = table(prep(spark), sf_dir, "documents")
    merges = bpe_train_merges(d, "text", n_merges=10, lowercase=True)
    return spark.createDataFrame(
        merges, schema="merge_rank int, left_sym string, right_sym string, pair_freq long"
    )


def make_bpe_oracle() -> str:
    """Generate the text_bpe_merges oracle by replaying BPE training in
    an INDEPENDENT single-node Python implementation (dict/Counter, no
    Spark) over the same parquet, then embedding the learned merge table
    as a VALUES literal — the same generated-oracle pattern as the
    k-means centroid literals (registry/similarity.py). Shares
    _bpe_replay with the encode-stats oracle."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    merges, _, _ = _bpe_replay(sf_dir)

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    values = ",\n".join(
        f"({r}, {q(a)}, {q(b)}, {c})" for r, a, b, c in merges
    )
    return (
        "SELECT merge_rank, left_sym, right_sym, pair_freq\n"
        f"FROM (VALUES {values}) AS t(merge_rank, left_sym, right_sym, pair_freq)\n"
        "ORDER BY merge_rank"
    )


def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE side (train's consumer): learn the 10 merges, replay
    them over the DISTINCT vocabulary (operators/bpe.py:
    bpe_symbol_counts — fold work is vocab-bounded, never per-token),
    then join the per-word symbol counts back onto the token stream
    (vocab-sized build side, AQE-broadcast) and roll up per language:
    token count, post-merge symbol count, and mean symbols/token — the
    fertility metric tokenizer teams actually track per language. The
    oracle replays training AND encoding in the independent single-node
    Python implementation and embeds the 5-row result."""
    from python_multiproc_bigdata_spark.operators.bpe import (
        bpe_symbol_counts,
        bpe_train_merges,
        word_frequencies,
    )

    d = table(prep(spark), sf_dir, "documents")
    # r12 (guide §1.2): train + encode share one persisted word-count
    # pass instead of re-tokenizing the corpus per stage.
    wf = word_frequencies(d, "text", lowercase=True).persist()
    merges = bpe_train_merges(d, "text", n_merges=10, lowercase=True, wf=wf)
    counts = bpe_symbol_counts(d, merges, "text", lowercase=True, wf=wf)
    toks = d.select(
        "lang", F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("word")
    ).filter(F.length(F.trim("word")) > 0)
    return (
        toks.join(counts, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_symbols"),
            F.round(F.sum("n_syms") / F.count(F.lit(1)), 4).alias("syms_per_token"),
        )
        .orderBy("lang")
    )


def _bpe_replay(sf_dir: str):
    """Shared independent single-node BPE replay (training + per-word
    symbol counts) for the generated oracles."""
    import re
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        f"SELECT lang, lower(text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wf: Counter = Counter()
    per_lang_tokens: list[tuple[str, str]] = []
    for lang, t in rows:
        for w in re.split("[ \t\n\r\f\x0b]+", t):
            if w.strip():
                wf[w] += 1
                per_lang_tokens.append((lang, w))
    syms = {w: tuple(w) for w in wf}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, 11):
        pc: Counter = Counter()
        for w, f in wf.items():
            sq = syms[w]
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, c))
        for w, sq in syms.items():
            out: list[str] = []
            i = 0
            while i < len(sq):
                if i + 1 < len(sq) and sq[i] == a and sq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms, per_lang_tokens


def text_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 WORDPIECE merges learned from the corpus (operators/
    bpe.py:wordpiece_train_merges) — the likelihood-scored third member
    of the tokenizer-training family (BPE counts, unigram-LM prunes,
    WordPiece maximizes count(ab)/(count(a)·count(b))). Words split as
    [c0, ##c1, ...]; the argmax runs on the QUANTIZED integer score
    q = (c·10¹²) div (ca·cb) so both engines compare exact integers
    (the determinism contract, stated in the operator docstring). Same
    scale shape as BPE: one corpus shuffle, vocab-bounded rounds, 1-row
    argmax collects."""
    from python_multiproc_bigdata_spark.operators.bpe import wordpiece_train_merges

    d = table(prep(spark), sf_dir, "documents")
    merges = wordpiece_train_merges(d, "text", n_merges=8, lowercase=True)
    return prep(spark).createDataFrame(
        merges,
        schema="merge_rank int, left_sym string, right_sym string, "
        "pair_freq long, score_q long",
    )


def make_wordpiece_oracle() -> str:
    """Generate the text_wordpiece_merges oracle by replaying WordPiece
    training in an INDEPENDENT single-node Python implementation
    (dict/Counter, '##' continuation splitting, the same quantized
    integer score via // — no Spark, no shared code) and embedding the
    learned table as a VALUES literal."""
    import os
    import re
    from collections import Counter

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT lower(text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wf: Counter = Counter()
    for (t,) in rows:
        for w in re.split("[ \t\n\r\f\x0b]+", t):
            if w.strip():
                wf[w] += 1
    syms = {w: tuple([w[0]] + ["##" + ch for ch in w[1:]]) for w in wf}
    merges: list[tuple[int, str, str, int, int]] = []
    for rank in range(1, 9):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, f in wf.items():
            sq = syms[w]
            for s in sq:
                sc[s] += f
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] += f
        if not pc:
            break
        best = min(
            (
                (-((c * 10**12) // (sc[a] * sc[b])), a, b, c)
                for (a, b), c in pc.items()
            ),
        )
        qv, a, b, c = -best[0], best[1], best[2], best[3]
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((rank, a, b, c, qv))
        for w, sq in syms.items():
            out: list[str] = []
            i = 0
            while i < len(sq):
                if i + 1 < len(sq) and sq[i] == a and sq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            syms[w] = tuple(out)

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    values = ",\n".join(
        f"({r}, {q(a)}, {q(b)}, {c}, {qv})" for r, a, b, c, qv in merges
    )
    return (
        "SELECT merge_rank, left_sym, right_sym, pair_freq, score_q\n"
        f"FROM (VALUES {values}) AS t(merge_rank, left_sym, right_sym, pair_freq, score_q)\n"
        "ORDER BY merge_rank"
    )


def text_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece ENCODE side (r12, text_wordpiece_merges' consumer —
    the BPE-encode twin for the likelihood-trained family): learn the
    8 merges, induce the vocabulary (training alphabet + merged
    symbols, operators/bpe.py:wordpiece_vocab), then segment the
    DISTINCT vocabulary with the greedy longest-match-first inference
    rule as a pure JVM fold (wordpiece_encode_counts — maximal munch
    via an ascending length when-chain, apply_merge's sibling) and
    roll the piece counts up per language off the token-stream join
    (vocab-sized build side, AQE-broadcast). An unmatchable word maps
    to ONE [UNK] piece, the standard serving rule; same-corpus encode
    yields zero UNKs (every training character is in the vocab) and
    the n_unk_tokens column proves it. The oracle replays training AND
    greedy inference in independent single-node Python."""
    from python_multiproc_bigdata_spark.operators.bpe import (
        word_frequencies,
        wordpiece_encode_counts,
        wordpiece_train_merges,
        wordpiece_vocab,
    )

    d = table(prep(spark), sf_dir, "documents")
    # r12 (guide §1.2): train, vocab induction, and encode all consume
    # the (word, freq) relation — persist ONE word-count pass and share
    # it instead of re-tokenizing the corpus three times.
    # r13 NOTE: deriving wf from a persisted per-(lang, word) relation
    # (one tokenization total, final rollup joined at (lang, word)
    # scale) was tried and measured SLOWER — 5.8/5.3 vs 5.2/5.0 s
    # medians, interleaved — because the wider (lang, word) aggregate
    # plus the derived-wf rollup sit on the training loop's critical
    # path, while the corpus explode it saves overlaps the cheap tail.
    # Kept as two passes.
    wf = word_frequencies(d, "text", lowercase=True).persist()
    merges = wordpiece_train_merges(d, "text", n_merges=8, lowercase=True, wf=wf)
    vocab = wordpiece_vocab(d, merges, "text", lowercase=True, wf=wf)
    counts = wordpiece_encode_counts(d, vocab, "text", lowercase=True, wf=wf)
    toks = d.select(
        "lang", F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("word")
    ).filter(F.length(F.trim("word")) > 0)
    pieces = F.when(F.col("is_unk"), F.lit(1)).otherwise(F.col("n_pieces"))
    return (
        toks.join(counts, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(pieces).alias("n_pieces"),
            F.sum(F.when(F.col("is_unk"), 1).otherwise(0)).alias(
                "n_unk_tokens"
            ),
            F.round(F.sum(pieces) / F.count(F.lit(1)), 4).alias(
                "pieces_per_token"
            ),
        )
        .orderBy("lang")
    )


def make_wordpiece_encode_oracle() -> str:
    """Replay WordPiece training (same independent implementation as
    make_wordpiece_oracle) plus GREEDY LONGEST-MATCH inference in
    plain Python (while-loop maximal munch, nothing shared with the
    Spark fold) and embed the per-language rollup as VALUES."""
    import os
    import re
    from collections import Counter, defaultdict

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT lang, lower(text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wf: Counter = Counter()
    per_lang_tokens: list[tuple[str, str]] = []
    for lang, t in rows:
        for w in re.split("[ \t\n\r\f\x0b]+", t):
            if w.strip():
                wf[w] += 1
                per_lang_tokens.append((lang, w))
    syms = {w: tuple([w[0]] + ["##" + ch for ch in w[1:]]) for w in wf}
    vocab = set()
    for sq in syms.values():
        vocab.update(sq)
    for _rank in range(1, 9):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, f in wf.items():
            sq = syms[w]
            for s in sq:
                sc[s] += f
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] += f
        if not pc:
            break
        best = min(
            (-((c * 10**12) // (sc[a] * sc[b])), a, b)
            for (a, b), c in pc.items()
        )
        a, b = best[1], best[2]
        merged = a + (b[2:] if b.startswith("##") else b)
        vocab.add(merged)
        for w, sq in syms.items():
            out: list[str] = []
            i = 0
            while i < len(sq):
                if i + 1 < len(sq) and sq[i] == a and sq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            syms[w] = tuple(out)

    def encode_len(w: str) -> tuple[int, bool]:
        i, n_p = 0, 0
        while i < len(w):
            best_j = -1
            for j in range(len(w), i, -1):
                piece = w[i:j] if i == 0 else "##" + w[i:j]
                if piece in vocab:
                    best_j = j
                    break
            if best_j < 0:
                return 1, True
            n_p += 1
            i = best_j
        return n_p, False

    enc = {w: encode_len(w) for w in wf}
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for lang, w in per_lang_tokens:
        n_p, unk = enc[w]
        a = agg[lang]
        a[0] += 1
        a[1] += n_p
        a[2] += 1 if unk else 0
    values = ",\n".join(
        f"('{lang}', {n}, {s}, {u}, {round(s / n, 4)})"
        for lang, (n, s, u) in sorted(agg.items())
    )
    return (
        "SELECT lang, n_tokens, n_pieces, n_unk_tokens,"
        " CAST(pieces_per_token AS DOUBLE) AS pieces_per_token\n"
        f"FROM (VALUES {values}) AS t(lang, n_tokens, n_pieces,"
        " n_unk_tokens, pieces_per_token)\nORDER BY lang"
    )


def make_bpe_encode_oracle() -> str:
    import os
    from collections import defaultdict

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    _, syms, per_lang_tokens = _bpe_replay(sf_dir)
    agg: dict = defaultdict(lambda: [0, 0])
    for lang, w in per_lang_tokens:
        a = agg[lang]
        a[0] += 1
        a[1] += len(syms[w])
    values = ",\n".join(
        f"('{lang}', {n}, {s}, {round(s / n, 4)})"
        for lang, (n, s) in sorted(agg.items())
    )
    # CAST: a bare VALUES literal like 1.2345 binds as DECIMAL in DuckDB,
    # which a pandas/arrow driver fetch may canonicalize differently from
    # Spark's double (the stats_psi_drift HUGEINT lesson, r9)
    return (
        "SELECT lang, n_tokens, n_symbols,"
        " CAST(syms_per_token AS DOUBLE) AS syms_per_token\n"
        f"FROM (VALUES {values}) AS t(lang, n_tokens, n_symbols, syms_per_token)\n"
        "ORDER BY lang"
    )


UNIGRAM_CFG = dict(max_piece_len=4, seed_size=200, vocab_size=80, em_iters=3)
# bounded-by-construction collect: the trainer sees at most this many
# (word, freq) rows, cut deterministically by (freq DESC, word ASC) —
# at web scale the tail words beyond the cut still get segmented by the
# single-char floor, they just don't vote in the EM
UNIGRAM_MAX_VOCAB_ROWS = 4096


def _unigram_word_counts_spark(spark: SparkSession, sf_dir: str):
    from python_multiproc_bigdata_spark.operators.bpe import word_frequencies

    d = table(prep(spark), sf_dir, "documents")
    wf = (
        word_frequencies(d, "text", lowercase=True)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(UNIGRAM_MAX_VOCAB_ROWS)
    )
    return [(r["word"], int(r["freq"])) for r in wf.collect()]


def text_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece, Kudo 2018) tokenizer vocabulary —
    BPE's sibling subword trainer (operators/unigram.py). ONE
    corpus-scale shuffle (the word-frequency groupBy), then hard-EM
    Viterbi training driver-side over the bounded top-4096 word-count
    table (same O(vocab)-not-O(data) discipline as bpe_train_merges and
    the k-means centroid trainer). Output: the final 80-piece vocabulary
    with integer occurrence counts and 6-rounded log-probs. The oracle
    generator re-derives word counts INDEPENDENTLY with DuckDB and runs
    the same deterministic trainer, so any divergence in the distributed
    aggregation changes the embedded literals and fails the hash."""
    from python_multiproc_bigdata_spark.operators.unigram import unigram_train

    vocab = unigram_train(
        sorted(_unigram_word_counts_spark(spark, sf_dir)), **UNIGRAM_CFG
    )
    return spark.createDataFrame(
        vocab, schema="piece_rank int, piece string, piece_count long, logprob double"
    )


def _unigram_replay(sf_dir: str):
    """Word counts re-derived independently of Spark (DuckDB scan +
    Python split — same independence as _bpe_replay), then the shared
    deterministic trainer."""
    import re
    from collections import Counter

    import duckdb

    from python_multiproc_bigdata_spark.operators.unigram import (
        unigram_train,
        word_piece_counts,
    )

    rows = duckdb.sql(
        f"SELECT lang, lower(text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wf: Counter = Counter()
    per_lang_tokens: list[tuple[str, str]] = []
    for lang, t in rows:
        for w in re.split("[ \t\n\r\f\x0b]+", t):
            if w.strip():
                wf[w] += 1
                per_lang_tokens.append((lang, w))
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:UNIGRAM_MAX_VOCAB_ROWS]
    vocab = unigram_train(sorted(top), **UNIGRAM_CFG)
    pieces = word_piece_counts(
        [w for w, _ in top], vocab, UNIGRAM_CFG["max_piece_len"]
    )
    return vocab, pieces, per_lang_tokens


def make_unigram_vocab_oracle() -> str:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    vocab, _, _ = _unigram_replay(sf_dir)

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    values = ",\n".join(
        f"({r}, {q(p)}, {c}, {lp!r})" for r, p, c, lp in vocab
    )
    return (
        # DuckDB types bare float literals in VALUES as DECIMAL — cast
        # back to DOUBLE so the value hash matches Spark's double column
        "SELECT piece_rank, piece, piece_count, CAST(logprob AS DOUBLE) AS logprob\n"
        f"FROM (VALUES {values}) AS t(piece_rank, piece, piece_count, logprob)\n"
        "ORDER BY piece_rank"
    )


def text_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM ENCODE side: segment the bounded vocabulary under the
    trained pieces (Viterbi over the VOCAB, never per-token — the same
    encode-scale property as bpe_symbol_counts), broadcast the per-word
    piece counts back onto the token stream, and roll up per-language
    fertility (pieces per token) — the metric tokenizer teams compare
    across languages. At web scale the per-word map stays vocab-sized;
    out-of-vocab tail words would be segmented in a mapInPandas pass
    with the piece log-probs broadcast."""
    from python_multiproc_bigdata_spark.operators.unigram import (
        unigram_train,
        word_piece_counts,
    )

    wc = _unigram_word_counts_spark(spark, sf_dir)
    vocab = unigram_train(sorted(wc), **UNIGRAM_CFG)
    pieces = word_piece_counts([w for w, _ in wc], vocab, UNIGRAM_CFG["max_piece_len"])
    counts_df = spark.createDataFrame(
        sorted(pieces.items()), schema="word string, n_pieces int"
    )
    d = table(prep(spark), sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("word")
    ).filter(F.length(F.trim("word")) > 0)
    return (
        toks.join(F.broadcast(counts_df), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(F.sum("n_pieces") / F.count(F.lit(1)), 4).alias(
                "pieces_per_token"
            ),
        )
        .orderBy("lang")
    )


def make_unigram_fertility_oracle() -> str:
    """End-to-end SQL twin: the word→n_pieces map (trained + segmented in
    the independent replay) joins the corpus token stream IN SQL, so the
    distributed join + rollup is checked by DuckDB itself, not by
    embedded aggregates."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    _, pieces, _ = _unigram_replay(sf_dir)

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    values = ",\n".join(f"({q(w)}, {n})" for w, n in sorted(pieces.items()))
    return rf"""
WITH map(word, n_pieces) AS (VALUES {values}),
tok AS (
  SELECT lang, unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
           x -> length(trim(x)) > 0)) AS word
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       round(sum(n_pieces) * 1.0 / count(*), 4) AS pieces_per_token
FROM tok JOIN map USING (word)
GROUP BY lang
ORDER BY lang
"""


def eval_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-selection eval: per-language fertility of the two
    trained subword tokenizers side by side — BPE (10 merges) vs
    unigram-LM (80 pieces) — with the winner (lower symbols/token,
    tie → 'tie'). This is the comparison a tokenizer team runs before
    freezing a vocab; both towers are the already-registered encode
    paths, joined on language (a |langs|-row join, trivial at any
    scale; the corpus-scale work is the two token-stream joins the
    towers already do).

    r12 (guide §2.6 overlap independent jobs): both towers run EAGER
    training during build — BPE's batched merge rounds are a sequential
    driver loop of small jobs that leaves most of the cluster idle, and
    the unigram tower's word-count collect + local EM is independent of
    it. Building the two towers from a 2-thread pool lets each tower's
    jobs back-fill the other's idle capacity; the trained artifacts
    (and so the result) are bit-identical — only the schedule changes."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_bpe = pool.submit(text_bpe_encode_stats, spark, sf_dir)
        f_uni = pool.submit(text_unigram_fertility, spark, sf_dir)
        bpe_df, uni_df = f_bpe.result(), f_uni.result()
    bpe = bpe_df.select("lang", F.col("syms_per_token").alias("bpe_spt"))
    uni = uni_df.select("lang", F.col("pieces_per_token").alias("unigram_spt"))
    return (
        bpe.join(uni, "lang")
        .select(
            "lang",
            "bpe_spt",
            "unigram_spt",
            F.when(F.col("bpe_spt") < F.col("unigram_spt"), F.lit("bpe"))
            .when(F.col("unigram_spt") < F.col("bpe_spt"), F.lit("unigram"))
            .otherwise(F.lit("tie"))
            .alias("winner"),
        )
        .orderBy("lang")
    )


def make_tokenizer_compare_oracle() -> str:
    """Compose both independent replays: BPE per-lang fertility from
    _bpe_replay, unigram per-lang fertility recomputed IN SQL from the
    replayed word→n_pieces map joined to the corpus token stream."""
    import os
    from collections import defaultdict

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    _, syms, per_lang_tokens = _bpe_replay(sf_dir)
    agg: dict = defaultdict(lambda: [0, 0])
    for lang, w in per_lang_tokens:
        a = agg[lang]
        a[0] += 1
        a[1] += len(syms[w])
    bpe_values = ",\n".join(
        f"('{lang}', {round(s / n, 4)!r})" for lang, (n, s) in sorted(agg.items())
    )
    _, pieces, _ = _unigram_replay(sf_dir)

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    map_values = ",\n".join(f"({q(w)}, {n})" for w, n in sorted(pieces.items()))
    return rf"""
WITH bpe(lang, bpe_spt) AS (VALUES {bpe_values}),
map(word, n_pieces) AS (VALUES {map_values}),
tok AS (
  SELECT lang, unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
           x -> length(trim(x)) > 0)) AS word
  FROM documents
),
uni AS (
  SELECT lang, round(sum(n_pieces) * 1.0 / count(*), 4) AS unigram_spt
  FROM tok JOIN map USING (word) GROUP BY lang
)
SELECT lang, CAST(bpe_spt AS DOUBLE) AS bpe_spt,
       CAST(unigram_spt AS DOUBLE) AS unigram_spt,
       CASE WHEN bpe_spt < unigram_spt THEN 'bpe'
            WHEN unigram_spt < bpe_spt THEN 'unigram'
            ELSE 'tie' END AS winner
FROM bpe JOIN uni USING (lang)
ORDER BY lang
"""


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window chunking: 32-token chunks every 24 tokens
    (8-token overlap), each keyed by (doc_id, chunk_idx, start_tok) with
    the md5 digest of its space-joined token slice — the window
    construction an embedding/retrieval stage consumes at 100 TB.
    Map-only: tokenize → integer chunk count → sequence-explode → slice;
    no shuffle anywhere in the plan."""
    d = table(prep(spark), sf_dir, "documents")
    return sliding_chunks(d, "text", "doc_id", chunk_tokens=32, stride=24)


# Integer ceil-div (// with the +23 bias) mirrors Spark's `div` exactly;
# list_slice is 1-based inclusive like Spark's slice; md5('') for empty
# docs matches on both engines.
SQL_CHUNK_SLIDING = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), dims AS (
  SELECT doc_id, toks, len(toks) AS n,
         1 + (greatest(len(toks) - 32, 0) + 23) // 24 AS nc
  FROM base
), ch AS (
  SELECT doc_id, toks, n, unnest(range(nc)) AS ci FROM dims
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * 24 AS BIGINT) AS start_tok,
       CAST(least(32, n - ci * 24) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, ci * 24 + 1, ci * 24 + 32), ' ')) AS chunk_digest
FROM ch
"""


def text_context_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window trimming at whole-turn boundaries — the chat/SFT
    prep step that keeps the longest SUFFIX of turns fitting a token
    budget (here turn = non-blank line, budget = 64 whitespace tokens):
    a conversation is truncated from the front, never mid-turn. Per
    doc: turn count, total tokens, kept turns, kept tokens.

    Plan: posexplode_outer the turn array (explode_outer + null filter —
    the InferFiltersFromGenerate guard, so the line-split is not cloned
    into an inferred size()>0 filter), then ONE window per doc ordered
    by turn index DESC with a running token sum; the suffix-within-
    budget is exactly the rows whose running sum ≤ budget (monotone, so
    contiguous by construction). One exchange on doc_id, no arrays
    re-scanned."""
    BUDGET = 64
    d = table(prep(spark), sf_dir, "documents")
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    t = (
        d.select("doc_id", F.posexplode_outer(lines).alias("idx", "line"))
        .where(F.col("idx").isNotNull())
        .withColumn(
            "tc",
            F.size(
                F.filter(F.split("line", WHITESPACE_RE), lambda x: F.length(x) > 0)
            ).cast("long"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("runsum", F.sum("tc").over(w))
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("tc").alias("total_tokens"),
        F.sum((F.col("runsum") <= BUDGET).cast("long")).alias("n_kept_turns"),
        F.coalesce(
            F.max(F.when(F.col("runsum") <= BUDGET, F.col("runsum"))), F.lit(0)
        ).alias("kept_tokens"),
    )


SQL_CONTEXT_TRIM = r"""
WITH turns AS (
  SELECT doc_id, idx, ln
  FROM (SELECT doc_id,
               generate_subscripts(lines, 1) - 1 AS idx,
               unnest(lines) AS ln
        FROM (SELECT doc_id,
                     list_filter(string_split(text, chr(10)),
                                 x -> length(trim(x)) > 0) AS lines
              FROM documents))
), tc AS (
  SELECT doc_id, idx,
         CAST(len(list_filter(string_split_regex(ln, '[ \t\n\r\f\x0B]+'),
                              x -> length(x) > 0)) AS BIGINT) AS tc
  FROM turns
), rs AS (
  SELECT doc_id, tc,
         sum(tc) OVER (PARTITION BY doc_id ORDER BY idx DESC
                       ROWS UNBOUNDED PRECEDING) AS runsum
  FROM tc
)
SELECT doc_id,
       count(*) AS n_turns,
       CAST(sum(tc) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN runsum <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_turns,
       CAST(coalesce(max(CASE WHEN runsum <= 64 THEN runsum END), 0) AS BIGINT) AS kept_tokens
FROM rs
GROUP BY doc_id
"""


# RAKE stopword delimiter set (fixed, shared with the oracle verbatim)
RAKE_STOPWORDS = (
    "the", "a", "of", "and", "to", "be", "that", "have", "with",
    "in", "is", "it", "for", "on", "as",
)
_RAKE_MAX_LEN = 4
_RAKE_TOPK = 20


def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs (capped at 4
    words), each scored by the sum of its words' degree/frequency
    ratios — degree(w) = Σ phrase_len over occurrences, freq(w) =
    occurrence count, both computed over ALL candidate phrases
    corpus-wide. Top-20 phrases by score.

    Plan: one tokenize+posexplode, a per-doc running stopword count
    (window on (doc, pos)) assigns each non-stopword its phrase id —
    the classic split-on-delimiter-without-UDF idiom; phrase assembly
    is one (doc, phrase_id) groupBy ordered by pos; word stats are one
    corpus-wide groupBy of the phrase-word relation (map-side combined:
    |vocab| rows out). Word scores are INTEGER micro-ratios
    (round(1e6·deg/freq)) so phrase scores sum exactly — identical
    phrase text ⇒ identical score by construction, letting the final
    rollup group by phrase string alone. Ranking is total
    (score_micro DESC, phrase ASC)."""
    d = table(prep(spark), sf_dir, "documents")
    return rake_topk(d)


def rake_topk(d: DataFrame, topk: int = _RAKE_TOPK) -> DataFrame:
    """RAKE core over any (doc_id, text) frame — see
    text_keyphrase_rake for semantics and the scale shape."""
    toks = d.select(
        "doc_id",
        F.posexplode_outer(
            F.filter(
                F.split(F.lower(F.col("text")), WHITESPACE_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("pos", "w"),
    ).filter(F.col("w").isNotNull())
    stop = F.col("w").isin(*RAKE_STOPWORDS)
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    marked = toks.select(
        "doc_id",
        "pos",
        "w",
        F.sum(stop.cast("int")).over(wdoc).alias("phrase_id"),
        stop.alias("is_stop"),
    ).filter(~F.col("is_stop"))
    phrases = (
        marked.groupBy("doc_id", "phrase_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ).alias("ws")
        )
        .filter(F.size("ws") <= _RAKE_MAX_LEN)
        .select(
            "doc_id",
            "phrase_id",
            F.concat_ws(" ", F.col("ws")).alias("phrase"),
            F.size("ws").alias("plen"),
            "ws",
        )
    )
    pw = phrases.select(
        "phrase", "plen", F.explode("ws").alias("w")
    )
    wstats = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    wscore = wstats.select(
        "w",
        F.round(
            F.col("deg").cast("double") / F.col("freq").cast("double") * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("w_micro"),
    )
    pscore = (
        pw.join(F.broadcast(wscore), "w")
        .groupBy("phrase")
        .agg(
            F.sum("w_micro").alias("all_micro"),
            F.count(F.lit(1)).alias("n_words_total"),
        )
    )
    # all_micro summed every occurrence of the phrase: normalize to the
    # per-occurrence score via the occurrence count (exact integer
    # division is safe: all_micro = n_occ * per_occ by construction)
    per_phrase = (
        phrases.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .join(pscore, "phrase")
        .select(
            "phrase",
            "n_occ",
            (F.col("all_micro") / F.col("n_occ")).cast("bigint").alias("score_micro"),
        )
    )
    return (
        per_phrase.orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(topk)
        .select(
            "phrase",
            "n_occ",
            F.round(F.col("score_micro") / F.lit(1000000.0), 6).alias("score"),
        )
    )


def _rake_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), pos0 AS (
  SELECT doc_id, toks, unnest(range(len(toks))) AS pos FROM base
), pos AS (
  SELECT doc_id, pos, toks[pos + 1] AS w FROM pos0
), marked AS (
  SELECT doc_id, pos, w,
         sum(CASE WHEN w IN ({stop_list}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id,
         w IN ({stop_list}) AS is_stop
  FROM pos
), phrases AS (
  SELECT doc_id, phrase_id,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM marked WHERE NOT is_stop
  GROUP BY doc_id, phrase_id
  HAVING count(*) <= {_RAKE_MAX_LEN}
), pw AS (
  SELECT m.doc_id, m.phrase_id, p.phrase, p.plen, m.w
  FROM marked m JOIN phrases p USING (doc_id, phrase_id)
  WHERE NOT m.is_stop
), wscore AS (
  SELECT w,
         CAST(round(CAST(sum(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS w_micro
  FROM pw GROUP BY w
), pscore AS (
  SELECT pw.phrase, sum(ws.w_micro) AS all_micro
  FROM pw JOIN wscore ws USING (w)
  GROUP BY pw.phrase
), per_phrase AS (
  SELECT p.phrase, CAST(count(*) AS BIGINT) AS n_occ,
         CAST(ANY_VALUE(s.all_micro) // count(*) AS BIGINT) AS score_micro
  FROM phrases p JOIN pscore s USING (phrase)
  GROUP BY p.phrase
)
SELECT phrase, n_occ, round(score_micro / 1000000.0, 6) AS score
FROM per_phrase
ORDER BY score_micro DESC, phrase ASC
LIMIT {_RAKE_TOPK}
"""


SQL_KEYPHRASE_RAKE = _rake_sql()


HEAPS_CHECKPOINTS = 10


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit — the corpus-linguistics
    diagnostic (V(n) = K·n^beta) a tokenizer-budget or dedup-progress
    analysis reads before committing to a vocab size: cumulative
    distinct-vocabulary vs cumulative tokens at 10 doc_id-ordered
    checkpoints, plus the log-log OLS fit (beta, K) as columns.

    The scalable trick: cumulative vocabulary at EVERY checkpoint comes
    from ONE pass — each type's FIRST-APPEARANCE doc (min(doc_id) per
    token, a word-count-shaped groupBy), then V(t) = count(types with
    first_doc <= t); cumulative tokens likewise from per-doc counts.
    Both checkpoint rollups are conditional aggregates over broadcast
    thresholds (stack of 10 CASE sums — no 10x fan-out join, no BNL,
    no re-scan per checkpoint). Checkpoint counts and token/vocab sums
    are exact integers; only the 10-point OLS is floating (rounded 4,
    the NMI posture for order-jittered double sums).

    Saturation is a first-class answer: on a CLOSED vocabulary (the
    synthetic testdata corpus holds exactly 31 types) cum_vocab is flat
    from checkpoint 1 and beta == 0 — the diagnostic correctly reports
    'no vocabulary growth'; the crafted-corpus test recovers beta ~ 0.5
    on a sqrt-growth vocabulary."""
    d = table(prep(spark), sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), WHITESPACE_RE),
                lambda w: F.length(w) > 0,
            )
        ).alias("tok"),
    )
    # per-doc token count is pure map-side size() — no second tokenize+
    # explode+shuffle of the corpus (docs with 0 tokens contribute 0 to
    # every cumulative sum, so including them is value-neutral)
    per_doc = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), WHITESPACE_RE),
                lambda w: F.length(w) > 0,
            )
        )
        .cast("long")
        .alias("n_tok"),
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    maxd = d.agg(F.max("doc_id").alias("maxd"))
    ks = range(1, HEAPS_CHECKPOINTS + 1)
    tok_row = per_doc.crossJoin(F.broadcast(maxd)).agg(
        *[
            F.sum(F.when(F.expr(f"doc_id <= maxd * {k} DIV 10"), F.col("n_tok")))
            .cast("long")
            .alias(f"ct{k}")
            for k in ks
        ]
    )
    voc_row = first.crossJoin(F.broadcast(maxd)).agg(
        *[
            F.sum(F.when(F.expr(f"first_doc <= maxd * {k} DIV 10"), 1))
            .cast("long")
            .alias(f"cv{k}")
            for k in ks
        ]
    )
    tok_pts = tok_row.select(
        F.expr(
            "stack({}, {}) as (k, cum_tokens)".format(
                len(ks), ", ".join(f"{k}, ct{k}" for k in ks)
            )
        )
    )
    voc_pts = voc_row.select(
        F.expr(
            "stack({}, {}) as (k, cum_vocab)".format(
                len(ks), ", ".join(f"{k}, cv{k}" for k in ks)
            )
        )
    )
    pts = (
        tok_pts.join(voc_pts, "k")
        .withColumn("x", F.log(F.col("cum_tokens").cast("double")))
        .withColumn("y", F.log(F.col("cum_vocab").cast("double")))
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "k",
            "cum_tokens",
            "cum_vocab",
            # + 0.0 collapses IEEE -0.0 to +0.0 on both engines: on the
            # closed-vocabulary corpus the OLS numerator is sum-order
            # jitter around zero, and round() keeps the sign (r7's
            # stats_psi_drift driver-red failure mode, caught here by
            # the r8 strict ±0 window scan before the driver could)
            (F.round(beta, 4) + F.lit(0.0)).alias("heaps_beta"),
            F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 4).alias(
                "heaps_k"
            ),
        )
        .orderBy("k")
    )


# The oracle reproduces the first-appearance construction and mirrors
# the OLS arithmetic shape exactly (same sub-expression order) so the
# 4dp-rounded doubles agree; the checkpoint rollup uses the equivalent
# 10x fan-out form — identical integers, oracle-side simplicity.
SQL_HEAPS_LAW = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
           x -> length(x) > 0)) AS tok
  FROM documents
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1
), first AS (
  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY 1
), mx AS (
  SELECT max(doc_id) AS maxd FROM documents
), cps(k) AS (
  VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)
), tokcum AS (
  SELECT k, CAST(sum(CASE WHEN doc_id <= maxd * k // 10 THEN n_tok END) AS BIGINT)
           AS cum_tokens
  FROM per_doc CROSS JOIN mx CROSS JOIN cps GROUP BY k
), voccum AS (
  SELECT k, CAST(sum(CASE WHEN first_doc <= maxd * k // 10 THEN 1 END) AS BIGINT)
           AS cum_vocab
  FROM first CROSS JOIN mx CROSS JOIN cps GROUP BY k
), pts AS (
  SELECT k, cum_tokens, cum_vocab,
         ln(CAST(cum_tokens AS DOUBLE)) AS x,
         ln(CAST(cum_vocab AS DOUBLE)) AS y
  FROM tokcum JOIN voccum USING (k)
), fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT k, cum_tokens, cum_vocab,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0 AS heaps_beta,
       round(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n), 4)
         AS heaps_k
FROM pts CROSS JOIN fit
ORDER BY k
"""


REGISTRY = {
    "text_keyphrase_rake": QuerySpec(text_keyphrase_rake, SQL_KEYPHRASE_RAKE),
    "text_context_trim": QuerySpec(text_context_trim, SQL_CONTEXT_TRIM),
    "text_chunk_sliding": QuerySpec(text_chunk_sliding, SQL_CHUNK_SLIDING),
    "eval_tokenizer_compare": QuerySpec(
        eval_tokenizer_compare, make_tokenizer_compare_oracle
    ),
    "text_unigram_vocab": QuerySpec(text_unigram_vocab, make_unigram_vocab_oracle),
    "text_unigram_fertility": QuerySpec(
        text_unigram_fertility, make_unigram_fertility_oracle
    ),
    "profile_documents": QuerySpec(profile_documents, SQL_PROFILE),
    "text_pmi_collocations": QuerySpec(text_pmi_collocations, SQL_PMI),
    "text_bpe_merges": QuerySpec(text_bpe_merges, make_bpe_oracle),
    "text_wordpiece_merges": QuerySpec(text_wordpiece_merges, make_wordpiece_oracle),
    "text_wordpiece_encode": QuerySpec(
        text_wordpiece_encode, make_wordpiece_encode_oracle
    ),
    "text_bpe_encode_stats": QuerySpec(text_bpe_encode_stats, make_bpe_encode_oracle),
    "text_vocab_coverage": QuerySpec(text_vocab_coverage, SQL_VOCAB_COVERAGE),
    "text_bm25_topk": QuerySpec(text_bm25_topk, SQL_BM25),
    "text_tfidf_top_terms": QuerySpec(text_tfidf_top_terms, SQL_TFIDF),
    "text_quality": QuerySpec(text_quality, SQL_QUALITY),
    "text_lang_id": QuerySpec(text_lang_id, SQL_LANG_ID),
    "eval_langid_f1": QuerySpec(eval_langid_f1, SQL_EVAL_LANGID_F1),
    "text_token_entropy": QuerySpec(text_token_entropy, SQL_TOKEN_ENTROPY),
    "text_heaps_law": QuerySpec(text_heaps_law, SQL_HEAPS_LAW),
    "text_token_count": QuerySpec(text_token_count, SQL_TOKEN_COUNT),
    "text_fingerprint": QuerySpec(text_fingerprint, SQL_FINGERPRINT),
}
