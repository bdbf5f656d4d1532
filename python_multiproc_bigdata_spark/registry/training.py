r"""Training-data pipeline composition queries (beyond-reference): the
end-to-end "training mix" — quality filter → exact dedup → token count →
per-language stats — and deterministic per-language quota sampling.

These compose the individually-tested primitives (functions/text.py,
operators/dedup.py) into the shapes a 100 TB corpus pipeline actually
runs. Everything is map-side column math plus one groupBy per stage;
the dedup keep-set join is an equi-join on (fingerprint, doc_id) that
AQE broadcasts when the duplicate groups are few.

Parity note: per-language aggregates are integer sums and min/max only —
both are order-independent, so Spark and DuckDB produce the identical
double/long before rounding. Avoid avg() over float columns here:
summation order differs per engine and a 4-decimal round can land on a
half-boundary (see memory of q-score weight choice in quality_score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import (
    WHITESPACE_RE,
    doc_fingerprint,
    quality_score,
    token_count_bpeish,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table
from python_multiproc_bigdata_spark.registry.similarity import (
    SQL_NEARDUP_BANDED_CTE as _SQL_NEARDUP_BANDED_CTE,
)
from python_multiproc_bigdata_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)
from python_multiproc_bigdata_spark.registry.dedup import SQL_SHINGLES_CTE

QUALITY_MIN = 0.5
QUOTA_PER_LANG = 40


def training_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus-curation pipeline as one logical plan:
    score quality → drop low-quality docs → exact-dedup (keep the min
    doc_id per fingerprint) → count tokens → per-language mix report."""
    d = table(prep(spark), sf_dir, "documents")
    scored = quality_score(d, "text").filter(F.col("quality_score") >= QUALITY_MIN)
    fp = scored.withColumn("fp", doc_fingerprint("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = fp.join(keep, ["fp", "doc_id"])
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_ws_tokens"),
        F.sum(token_count_bpeish("text")).alias("total_bpeish_tokens"),
        F.round(F.min("quality_score"), 4).alias("min_quality"),
        F.round(F.max("quality_score"), 4).alias("max_quality"),
    )


SQL_TRAINING_MIX = r"""
WITH base AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM documents
), m AS (
  SELECT doc_id, lang, text, len(toks) AS n_tokens,
         round(CASE WHEN n_chars > 0 THEN alpha_chars * 1.0 / n_chars ELSE 0 END, 4) AS alpha_ratio,
         round(CASE WHEN len(toks) > 0 THEN
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to'))) * 1.0 / len(toks)
           ELSE 0 END, 4) AS stopword_ratio
  FROM base
), s AS (
  SELECT doc_id, lang, text, n_tokens,
         round(least(1.0, n_tokens / 100.0) * 0.4
               + alpha_ratio * 0.4
               + least(1.0, stopword_ratio * 5.0) * 0.2, 4) AS quality_score
  FROM m
), filt AS (
  SELECT *, md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp
  FROM s WHERE quality_score >= 0.5
), keep AS (
  SELECT fp, min(doc_id) AS doc_id FROM filt GROUP BY fp
), kept AS (
  SELECT f.* FROM filt f JOIN keep k USING (fp, doc_id)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\x0B]'))) AS BIGINT) AS total_bpeish_tokens,
       round(min(quality_score), 4) AS min_quality,
       round(max(quality_score), 4) AS max_quality
FROM kept GROUP BY lang
"""


def quota_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: at most QUOTA_PER_LANG docs
    per language, chosen by md5(doc_id) order (a seedless shuffle both
    engines reproduce; doc_id tie-break for identical hashes). This is
    the quota/rebalancing primitive of a training-mix builder — at
    100 TB the window sort runs per language partition, and a hot
    language can be pre-filtered by the same hash before the sort."""
    d = table(prep(spark), sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= QUOTA_PER_LANG)
    )


SQL_QUOTA_SAMPLE = """
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents)
WHERE rn <= 40
"""


def training_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling without replacement: per language,
    keep the WEIGHTED_SAMPLE_N documents with the smallest
    key = h / n_chars, where h is a 48-bit uniform integer derived
    from md5(doc_id). Longer (heavier) documents get proportionally
    smaller keys, so the sample is biased toward them — the
    deterministic analogue of the Efraimidis–Spirakis priority sample
    that every training-mix builder uses to upweight by quality/length.

    Why uniform/weight instead of the textbook u^(1/w) (equivalently
    -ln(u)/w exponential race): pow/ln are libm-dependent and can
    differ in the last ulp across engines, which would make the
    selected SET itself nondeterministic at rank boundaries; plain
    integer-from-md5 division is IEEE-exact-rounded and bit-identical
    everywhere. The race is still weight-monotone (doubling a doc's
    weight halves its key) — the exact win-probability law differs
    from E-S, which the docstring owns rather than hides.

    Plan: map-side key computation (no join), one per-lang window sort
    — identical shuffle shape to quota_sample_per_lang; at 100 TB
    pre-filter each language by a key threshold estimated from the
    quota/|lang| ratio before the sort (same trick as quota's hash
    pre-filter)."""
    d = table(prep(spark), sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    key = h / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy("key", "doc_id")
    return (
        d.select(
            "lang",
            "doc_id",
            F.col("n_chars").alias("weight"),
            key.alias("key"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WEIGHTED_SAMPLE_N)
        # key is emitted RAW: the long/long division is IEEE-exact, so the
        # bits (and repr) already agree across engines, while round(x, 4)
        # on a ~1e11 double does NOT (Spark rounds the exact decimal
        # HALF_UP, DuckDB rounds in float arithmetic — observed flipping
        # the last digit at sf0.01).
        .select("lang", "doc_id", "weight", "key", "rn")
    )


WEIGHTED_SAMPLE_N = 40

SQL_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT lang, doc_id, n_chars AS weight,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT * 1.0 / n_chars AS key
  FROM documents
), ranked AS (
  SELECT lang, doc_id, weight, key,
         row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, weight, key, rn
FROM ranked WHERE rn <= 40
"""


def training_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: positives are near-dup pairs
    (3-gram Jaccard >= 0.8, both orientations — each member anchors
    once), negatives are 2 deterministic md5-drawn non-near-dup docs
    per anchor — the (anchor, positive, negatives) triplet feed of
    embedding/contrastive training (SimCSE/E5-style), with hard-random
    negatives replayable by the oracle.

    The negative draw (r5 redesign — was the bench ceiling at 4.8 s)
    ranks a BROADCAST-SIZED deterministic negative pool per anchor
    instead of the full corpus: the pool is the 64 docs with the
    smallest md5(doc_id) — one TakeOrderedAndProject over the corpus,
    O(pool) bytes broadcast — and each anchor picks its 2 smallest
    md5(anchor:doc) pool members that are not its near-dups. This is
    the shape that survives 100 TB (anchors × 64, not anchors ×
    corpus; the r4 md5-slice form still computed a hash per
    anchor-corpus pair). Pool ≫ near-dup degree + 2, and both engines
    draw from the IDENTICAL pool, so the oracle replays the draw
    bit-for-bit. Measured 4.8 → 4.5 s at sf0.1 — modest HERE because
    the corpus is small and positive mining dominates (the prefix-filter
    pair stage is ~3.0 s of the 4.5; the negative stage is what the
    redesign bounds): the r4 form's anchors×corpus hash work grew
    linearly in corpus size, the pool form's does not."""
    d = table(prep(spark), sf_dir, "documents")
    # pos is referenced FOUR times below (anchors, the anti-join
    # relation, and the final union) and its subtree is the whole
    # prefix-filter pipeline — materialize the pair-count-sized relation
    # once instead of re-running candidate generation per reference
    # (measured 8.6 s -> ~3 s at sf0.1).
    # r13: checkpoint PAIRS, not pos — pos is a union of two selects of
    # pairs, so eagerly checkpointing pos ran the whole prefix-filter
    # pipeline TWICE (once per union arm) and materialized 2x the rows.
    # Interleaved A/B at sf0.1: checkpoint-pairs 4.09 s med vs
    # checkpoint-pos 6.34 s vs lazy-persist-pos 6.48 s end-to-end.
    pairs = (
        prefix_filter_jaccard_pairs(d, threshold_num=4, threshold_den=5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    pos = pairs.select(
        F.col("doc_a").alias("anchor"), F.col("doc_b").alias("other")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("anchor"), F.col("doc_a").alias("other"))
    )
    anchors = pos.select("anchor").distinct()
    dup_rel = pos.withColumnRenamed("other", "doc_id")  # (anchor, near-dup doc)
    # negative pool: the 64 md5(doc_id)-smallest docs — a deterministic
    # pseudo-random corpus sample, one TakeOrderedAndProject job, always
    # broadcast-sized. Each anchor then ranks ONLY the pool by
    # md5(anchor:doc), anti-joined against its near-dups. An anchor
    # whose near-dups covered 63+ of the pool could get <2 negatives,
    # but both engines draw from the identical pool so parity holds
    # unconditionally; at P(64 of 64 pool docs near-dup) this is a
    # corpus of clones, not a training set.
    pool = (
        d.select("doc_id")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(64)
    )
    cand = (
        anchors.crossJoin(F.broadcast(pool))
        .filter(F.col("doc_id") != F.col("anchor"))
        .join(dup_rel, ["anchor", "doc_id"], "left_anti")
        .withColumn(
            "nk", F.md5(F.concat_ws(":", F.col("anchor"), F.col("doc_id")))
        )
    )
    wn = Window.partitionBy("anchor").orderBy("nk", "doc_id")
    neg = (
        cand.withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") <= 2)
        .select("anchor", F.col("doc_id").alias("other"))
    )
    return pos.withColumn("label", F.lit("pos")).unionByName(
        neg.withColumn("label", F.lit("neg"))
    )


SQL_CONTRASTIVE = SQL_SHINGLES_CTE + r"""
, inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
), p AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
), pos AS (
  SELECT id_a AS anchor, id_b AS other FROM p
  UNION ALL SELECT id_b, id_a FROM p
), anchors AS (
  SELECT DISTINCT anchor FROM pos
), pool AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  LIMIT 64
), cand AS (
  SELECT a.anchor, d.doc_id
  FROM anchors a, pool d
  WHERE d.doc_id != a.anchor
    AND NOT EXISTS (SELECT 1 FROM pos
                    WHERE pos.anchor = a.anchor AND pos.other = d.doc_id)
), neg AS (
  SELECT anchor, doc_id AS other FROM (
    SELECT anchor, doc_id,
           row_number() OVER (PARTITION BY anchor
             ORDER BY md5(anchor::VARCHAR || ':' || doc_id::VARCHAR), doc_id) AS rk
    FROM cand) WHERE rk <= 2
)
SELECT anchor, other, label FROM (
  SELECT anchor, other, 'pos' AS label FROM pos
  UNION ALL SELECT anchor, other, 'neg' FROM neg)
ORDER BY anchor, label, other
"""


def semantic_only_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup audit: pairs whose EMBEDDINGS say near-duplicate
    (cosine ≥ 0.4) but whose normalized text fingerprints differ — the
    semantic dups exact dedup cannot catch. Joins the embeddings table
    to documents on vec_id = doc_id (the harness tables are 1:1). The
    fingerprint relation is slim (id, 32-char fp, lang) so both
    enrichment joins broadcast; pair generation is the BANDED sign-LSH
    candidate path (neardup_pairs_banded — equi-joins only, no
    crossJoin), and the oracle reproduces the same bands."""
    from python_multiproc_bigdata_spark.operators.similarity import neardup_pairs_banded

    spark = prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fp"), "lang"
    )
    pairs = neardup_pairs_banded(emb, threshold=0.4, bits_per_band=4, n_bands=16)
    fa = docs.select(
        F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"), F.col("lang").alias("lang_a")
    )
    fb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"), F.col("lang").alias("lang_b")
    )
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(F.col("fp_a") != F.col("fp_b"))
        .select(
            "id_a", "id_b", "score",
            (F.col("lang_a") == F.col("lang_b")).alias("same_lang"),
        )
    )


SQL_SEMANTIC_ONLY = _SQL_NEARDUP_BANDED_CTE + r"""
, fps AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp,
         lang
  FROM documents
)
SELECT s.id_a, s.id_b, s.score, fa.lang = fb.lang AS same_lang
FROM verified s
JOIN fps fa ON fa.doc_id = s.id_a
JOIN fps fb ON fb.doc_id = s.id_b
WHERE s.score >= 0.4 AND fa.fp != fb.fp
"""


def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline as ONE logical plan — what a user
    of this engine actually runs to build a training corpus:

      1. split: doc_id % 10 == 0 is the held-out benchmark slice, the
         rest is candidate training data
      2. quality-filter the candidates (score >= 0.5, map-side math)
      3. exact-dedup survivors (min doc_id per fingerprint)
      4. DECONTAMINATE: drop any training doc sharing a 13-gram with a
         benchmark doc (anti-join on the contaminated id set)
      5. quota-sample at most 40 docs per language (md5-deterministic)
      6. report the final per-language mix (doc/token counts, quality
         range — integer sums and min/max only, order-independent)

    Every stage is a primitive tested on its own elsewhere in the
    registry; this query pins their COMPOSITION, oracle-checked
    end-to-end. Shuffle ledger: dedup groupBy, gram equi-join (eval side
    broadcasts at scale), quota window per lang, final groupBy — nothing
    quadratic, nothing driver-side."""
    from python_multiproc_bigdata_spark.operators.curation import (
        decontaminate_overlap,
    )

    d = table(prep(spark), sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 10 == 0)
    tr = d.filter(F.col("doc_id") % 10 != 0)
    scored = quality_score(tr, "text").filter(F.col("quality_score") >= QUALITY_MIN)
    fp = scored.withColumn("fp", doc_fingerprint("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = fp.join(keep, ["fp", "doc_id"])
    contaminated = (
        decontaminate_overlap(kept, ev, n=13).select("train_id").distinct()
    )
    clean = kept.join(
        contaminated, kept.doc_id == contaminated.train_id, "left_anti"
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sampled = clean.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= QUOTA_PER_LANG
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_ws_tokens"),
        F.round(F.min("quality_score"), 4).alias("min_quality"),
        F.round(F.max("quality_score"), 4).alias("max_quality"),
    )


SQL_CORPUS_PIPELINE = r"""
WITH base AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM documents WHERE doc_id % 10 != 0
), m AS (
  SELECT doc_id, lang, text, toks, len(toks) AS n_tokens,
         round(CASE WHEN n_chars > 0 THEN alpha_chars * 1.0 / n_chars ELSE 0 END, 4) AS alpha_ratio,
         round(CASE WHEN len(toks) > 0 THEN
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to'))) * 1.0 / len(toks)
           ELSE 0 END, 4) AS stopword_ratio
  FROM base
), s AS (
  SELECT doc_id, lang, text, toks, n_tokens,
         round(least(1.0, n_tokens / 100.0) * 0.4
               + alpha_ratio * 0.4
               + least(1.0, stopword_ratio * 5.0) * 0.2, 4) AS quality_score
  FROM m
), filt AS (
  SELECT *, md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp
  FROM s WHERE quality_score >= 0.5
), keep AS (
  SELECT fp, min(doc_id) AS doc_id FROM filt GROUP BY fp
), kept AS (
  SELECT f.* FROM filt f JOIN keep k USING (fp, doc_id)
), tgrams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(greatest(len(toks) - 12, 0)),
           i -> array_to_string(toks[i+1:i+13], ' '))) AS g
    FROM kept)
), egrams AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(greatest(len(toks) - 12, 0)),
           i -> array_to_string(toks[i+1:i+13], ' '))) AS g
    FROM (SELECT list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
                             x -> length(x) > 0) AS toks
          FROM documents WHERE doc_id % 10 = 0))
), contaminated AS (
  SELECT DISTINCT doc_id FROM tgrams JOIN egrams USING (g)
), clean AS (
  SELECT k.* FROM kept k ANTI JOIN contaminated c USING (doc_id)
), sampled AS (
  SELECT * FROM (
    SELECT lang, doc_id, n_tokens, quality_score,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
    FROM clean)
  WHERE rn <= 40
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens,
       round(min(quality_score), 4) AS min_quality,
       round(max(quality_score), 4) AS max_quality
FROM sampled GROUP BY lang
"""


PACK_BUDGET = 256


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, doc_id, n_tokens): the slim metadata relation packing runs
    on — whitespace token counts, same tokenization as text_token_count."""
    d = table(prep(spark), sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", WHITESPACE_RE), lambda w: F.length(w) > 0))
    return d.select("lang", "doc_id", ws.alias("n_tokens"))


SQL_DOC_TOKENS = r"""
  SELECT lang, doc_id,
         len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0)) AS n_tokens
  FROM documents
"""


def training_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing per language: each doc's start
    offset in the shard's concatenated token stream and the
    context-window bin that offset falls in (docs may straddle a cut —
    the semantics of concat-and-chunk pretraining loaders). Pure window
    prefix-sum — see operators/packing.py."""
    from python_multiproc_bigdata_spark.operators.packing import chunk_pack

    return chunk_pack(_doc_tokens(spark, sf_dir), PACK_BUDGET, by="lang")


SQL_PACK_CHUNKS = (
    "WITH toks AS (" + SQL_DOC_TOKENS + r"""
), c AS (
  SELECT lang, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens AS off
  FROM toks
)
SELECT lang, doc_id, n_tokens, CAST(off AS BIGINT) AS offset,
       CAST(off // 256 AS BIGINT) AS bin_id
FROM c
"""
)


def training_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-sequential packing per language: a new bin starts when
    the next doc would overflow the 256-token budget, so no doc
    straddles and no bin exceeds the budget (unless a single doc does).
    The per-shard fold is an applyInPandas pass over (id, count)
    metadata; the oracle replays the identical fold as a recursive CTE
    stepping one row_number at a time."""
    from python_multiproc_bigdata_spark.operators.packing import greedy_pack

    return greedy_pack(_doc_tokens(spark, sf_dir), PACK_BUDGET, by="lang")


SQL_PACK_GREEDY = (
    "WITH RECURSIVE toks AS (" + SQL_DOC_TOKENS + r"""
), ordered AS (
  SELECT lang, doc_id, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM toks
), pack AS (
  SELECT lang, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.doc_id, o.n_tokens, o.rn,
         CASE WHEN p.fill + o.n_tokens <= 256 THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.fill + o.n_tokens <= 256 THEN p.fill + o.n_tokens ELSE o.n_tokens END
  FROM pack p JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT lang, doc_id, n_tokens, bin_id FROM pack
"""
)


CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # < size → 16-token overlap between consecutive windows


def training_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token windows every 48
    tokens): the context-window construction step between curation and
    packing — each token lands in ≥1 chunk, consecutive chunks overlap
    by 16 tokens. Map-only explode; see operators/packing.py
    chunk_documents."""
    from python_multiproc_bigdata_spark.operators.packing import chunk_documents

    d = table(prep(spark), sf_dir, "documents")
    return chunk_documents(d, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


SQL_CHUNK_WINDOWS = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), s AS (
  SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS start
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       array_to_string(t[start + 1:start + {CHUNK_SIZE}], ' ') AS chunk_text,
       CAST(least({CHUNK_SIZE}, len(t) - start) AS BIGINT) AS n_tokens
FROM s
"""


TEMPERATURE_BUDGET = 1_000_000  # token budget the α-weights allocate


def training_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language re-weighting — the standard multilingual
    training-mix primitive (sampling weights ∝ p_l^α): natural language
    shares p_l from corpus token counts, α = 0.5 flattens them toward
    uniform, and a fixed token budget is allocated by the tempered
    weights. High-resource languages are down-weighted, low-resource
    up-weighted, exactly the mixture a 100 TB multilingual pretraining
    corpus is drawn with.

    One groupBy(lang) plus two scalar whole-frame windows over the
    ~|languages| rows — map-side token counting dominates; the window
    stage is O(langs), broadcast-trivial at any corpus size.

    Engine-parity note: α is fixed at 0.5 so the tempering is sqrt() —
    IEEE-exact on both engines, unlike pow() which libm may round
    differently at the last ulp. Shares divide exact integer sums; only
    the final 4-decimal rounds touch accumulated float error."""
    d = table(prep(spark), sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.sum(token_count_bpeish("text")).alias("total_tokens")
    )
    whole = Window.partitionBy()
    grand = F.sum("total_tokens").over(whole)
    sq = F.sqrt(F.col("total_tokens") / grand)
    z = F.sum(sq).over(whole)
    return counts.select(
        "lang",
        "total_tokens",
        F.round(F.col("total_tokens") / grand, 4).alias("p_lang"),
        F.round(sq / z, 4).alias("w_temp"),
        F.round(sq / z * TEMPERATURE_BUDGET).cast("bigint").alias("alloc_tokens"),
    )


SQL_TEMPERATURE_MIX = r"""
WITH counts AS (
  SELECT lang,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\x0B]'))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, total_tokens,
         total_tokens * 1.0 / (sum(total_tokens * 1.0) OVER ()) AS p,
         sqrt(total_tokens * 1.0 / (sum(total_tokens * 1.0) OVER ())) AS sq
  FROM counts
)
SELECT lang, total_tokens,
       round(p, 4) AS p_lang,
       round(sq / (sum(sq) OVER ()), 4) AS w_temp,
       CAST(round(sq / (sum(sq) OVER ()) * 1000000) AS BIGINT) AS alloc_tokens
FROM w
"""


LENGTH_BATCH_SIZE = 32


def training_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report (operators/packing.py:
    length_bucketed_batches): docs grouped into power-of-two token-count
    classes (bit-length buckets — integer ops, no float log2 boundary
    flakes) and batched 32-per-batch within a class; each batch row
    carries its own max length and the padding fraction it pays — the
    dynamic-batching padding-efficiency view of the corpus."""
    from python_multiproc_bigdata_spark.operators.packing import (
        length_bucketed_batches,
    )

    return length_bucketed_batches(
        _doc_tokens(spark, sf_dir), batch_size=LENGTH_BATCH_SIZE
    )


SQL_LENGTH_BATCHES = (
    "WITH toks AS (" + SQL_DOC_TOKENS + rf"""
), b AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= 0 THEN 0
              ELSE length(bin(n_tokens)) END AS bucket
  FROM toks
), r AS (
  SELECT bucket, doc_id, n_tokens,
         CAST((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
              // {LENGTH_BATCH_SIZE} AS BIGINT) AS batch_id
  FROM b
)
SELECT bucket, batch_id, count(*) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CASE WHEN max(n_tokens) > 0
            THEN round(1.0 - sum(n_tokens) / (count(*) * max(n_tokens)), 4)
            ELSE 0.0 END AS pad_frac
FROM r GROUP BY bucket, batch_id
"""
)


SOURCE_CAP_FRAC = 0.3


def training_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source token-share capping (operators/curation.py:
    cap_source_share): no source may exceed 30% of the corpus's
    whitespace tokens; docs admitted in id order until the cap. One
    summary row per source with kept/total docs and tokens."""
    from python_multiproc_bigdata_spark.operators.curation import cap_source_share

    d = table(prep(spark), sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", WHITESPACE_RE), lambda w: F.length(w) > 0))
    toks = d.select("source", "doc_id", ws.alias("n_tokens"))
    return cap_source_share(toks, cap_frac=SOURCE_CAP_FRAC)


SQL_SOURCE_CAPS = rf"""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0)) AS n_tokens
  FROM documents
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM toks
), r AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS run,
         -- floor, not bare CAST: DuckDB rounds double->BIGINT while
         -- Spark's cast truncates
         CAST(floor(t.total * {SOURCE_CAP_FRAC}) AS BIGINT) AS budget
  FROM toks, tot t
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN run <= budget THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN run <= budget THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       max(budget) AS cap_tokens
FROM r GROUP BY source
"""


BUDGET_FRAC = 0.25  # token budget as a fraction of the corpus
BUDGET_SRC_FRAC = 0.4  # per-source cap as a fraction of the budget


def _budget_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared front of the budget-select pair: quality-scored tokenized
    docs with broadcast budget/src_cap literals, gated by the
    per-source running-token cap (source-PARTITIONED window — scales;
    the two variants differ only in how the global budget cut runs)."""
    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    perdoc = bigram_logprob_score(d)
    ws = F.size(F.filter(F.split("text", WHITESPACE_RE), lambda w: F.length(w) > 0))
    toks = d.select("doc_id", "source", ws.alias("n_tokens")).join(perdoc, "doc_id")
    total = toks.agg(F.sum("n_tokens").alias("_tot"))
    t = toks.crossJoin(F.broadcast(total)).select(
        "*",
        F.floor(F.col("_tot") * F.lit(BUDGET_FRAC)).cast("long").alias("budget"),
        F.floor(F.col("_tot") * F.lit(BUDGET_FRAC) * F.lit(BUDGET_SRC_FRAC))
        .cast("long")
        .alias("src_cap"),
    )
    w_src = Window.partitionBy("source").orderBy(F.asc("xent2_nats"), F.asc("doc_id"))
    return t.withColumn("src_run", F.sum("n_tokens").over(w_src)).filter(
        F.col("src_run") <= F.col("src_cap")
    )


def training_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data selection under a TOKEN BUDGET (r10) — the
    decision a data team actually makes ('we can afford 25% of the
    corpus this run: which docs?'): docs are taken in quality order
    (bigram-LM cross entropy ASC — the CCNet 'head' discipline, doc_id
    tiebreak) through two deterministic gates: (1) a per-source cap
    (no source may contribute more than BUDGET_SRC_FRAC of the budget
    — the diversity guard, applied FIRST so one fluent source cannot
    monopolize), then (2) the global budget cut over the capped set.
    One summary row per source: kept docs/tokens and the kept-quality
    envelope (min/max xent — order-exact, no float summation).

    Composes the oracle-checked LM tower; the quality rank and both
    running sums use (xent, doc_id) total orders, so both engines walk
    the identical greedy. Scale note: the per-source running sum is a
    source-partitioned window; the global running sum goes through
    with_global_index's bucketed split (quantile cuts on xent,
    within-bucket window sums + broadcast per-bucket sum offsets) — no
    single-task window. Exact budget adherence still serializes the
    ORDER logically; for approximate adherence at extreme scale see
    training_budget_select_sampled (broadcast sample-derived cutoff)."""
    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    capped = _budget_capped(spark, sf_dir)
    kept = with_global_index(
        capped,
        ["xent2_nats", "doc_id"],
        out_col="_gi",
        cumsum={"n_tokens": "glob_run"},
    ).filter(F.col("glob_run") <= F.col("budget"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.min("xent2_nats").alias("min_xent"),
        F.max("xent2_nats").alias("max_xent"),
        F.max("budget").alias("budget_tokens"),
        F.max("src_cap").alias("src_cap_tokens"),
    )


_BUDGET_CAPPED_SQL = rf"""toks AS (
  SELECT d.doc_id, d.source, p.xent2_nats,
         len(list_filter(string_split_regex(d.text, '[ \t\n\r\f\x0B]+'),
             x -> length(x) > 0)) AS n_tokens
  FROM documents d JOIN perdoc p USING (doc_id)
), tot AS (
  SELECT sum(n_tokens) AS t FROM toks
), lim AS (
  SELECT CAST(floor(t * {BUDGET_FRAC}) AS BIGINT) AS budget,
         CAST(floor(t * {BUDGET_FRAC} * {BUDGET_SRC_FRAC}) AS BIGINT) AS src_cap
  FROM tot
), capped AS (
  SELECT toks.*, lim.budget, lim.src_cap
  FROM toks, lim
  QUALIFY sum(n_tokens) OVER (PARTITION BY source
                              ORDER BY xent2_nats, doc_id) <= lim.src_cap
)"""

_BUDGET_SUMMARY_SQL = """SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
       min(xent2_nats) AS min_xent,
       max(xent2_nats) AS max_xent,
       max(budget) AS budget_tokens,
       max(src_cap) AS src_cap_tokens
FROM kept GROUP BY source
"""


def _budget_select_sql() -> str:
    from python_multiproc_bigdata_spark.registry.curation import SQL_BIGRAM_LOGPROB

    return (
        "WITH perdoc AS (\n" + SQL_BIGRAM_LOGPROB + "\n), "
        + _BUDGET_CAPPED_SQL
        + """, kept AS (
  SELECT * FROM capped
  QUALIFY sum(n_tokens) OVER (ORDER BY xent2_nats, doc_id) <= budget
)
"""
        + _BUDGET_SUMMARY_SQL
    )


def training_budget_select_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """training_budget_select's 100 TB form — the one its own docstring
    prescribes (the events_rfm_segmentation_sampled pattern): the
    global budget cut becomes a broadcast QUALITY CUTOFF derived from a
    bounded deterministic sample, so no ordered pass over the full
    capped relation ever runs — exact budget adherence traded for a
    sample-estimated one (±sampling error on the kept-token total; the
    exact sibling stays registered as the oracle anchor).

    Sample = capped docs whose md5(doc_id) hex starts with '0' (a
    deterministic ~1/16 slice, engine-portable like every md5 sample in
    this repo). The sample is walked in quality order (xent ASC, doc_id
    tiebreak) with a running token sum s; the cutoff is the LAST sample
    tuple with 16·s ≤ budget — a TUPLE (xent, doc_id), not a bare
    value, so the keep predicate is tie-free on both engines. Kept =
    capped docs lexicographically ≤ the cutoff; same per-source summary
    as the exact form.

    Scale shape: the full relation is touched by the source-PARTITIONED
    cap window and one map-side filter + partial-agg groupBy; the only
    ordered pass is over the 1/16 sample (a 100 TB deployment tightens
    the prefix to 2+ hex chars for 1/256 etc.); cutoff collection is
    ONE row to the driver, embedded as a literal predicate — the kept
    scan carries no unpartitioned window (pinned in
    test_scale_plans.py)."""
    capped = _budget_capped(spark, sf_dir)
    samp = capped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    w_s = Window.orderBy(F.asc("xent2_nats"), F.asc("doc_id"))
    run = samp.withColumn("s", F.sum("n_tokens").over(w_s))
    cut = (
        run.filter(F.col("s") * 16 <= F.col("budget"))
        .agg(F.max(F.struct("xent2_nats", "doc_id")).alias("c"))
        .collect()[0]["c"]
    )  # bounded: ONE row to the driver
    if cut is None:
        keep = F.lit(False)
    else:
        cx, cd = float(cut["xent2_nats"]), int(cut["doc_id"])
        keep = (F.col("xent2_nats") < F.lit(cx)) | (
            (F.col("xent2_nats") == F.lit(cx)) & (F.col("doc_id") <= F.lit(cd))
        )
    kept = capped.filter(keep)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.min("xent2_nats").alias("min_xent"),
        F.max("xent2_nats").alias("max_xent"),
        F.max("budget").alias("budget_tokens"),
        F.max("src_cap").alias("src_cap_tokens"),
    )


def _budget_select_sampled_sql() -> str:
    from python_multiproc_bigdata_spark.registry.curation import SQL_BIGRAM_LOGPROB

    return (
        "WITH perdoc AS (\n" + SQL_BIGRAM_LOGPROB + "\n), "
        + _BUDGET_CAPPED_SQL
        + """, samp AS (
  SELECT * FROM capped
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
), run AS (
  SELECT xent2_nats, doc_id, budget,
         sum(n_tokens) OVER (ORDER BY xent2_nats, doc_id) AS s
  FROM samp
), cut AS (
  SELECT xent2_nats AS cx, doc_id AS cd FROM run
  WHERE s * 16 <= budget
  ORDER BY xent2_nats DESC, doc_id DESC LIMIT 1
), kept AS (
  SELECT c.* FROM capped c, cut
  WHERE c.xent2_nats < cut.cx
     OR (c.xent2_nats = cut.cx AND c.doc_id <= cut.cd)
)
"""
        + _BUDGET_SUMMARY_SQL
    )


def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard planning manifest: assign every document to one of
    16 shards by hash-mod (shard = md5(doc_id) first 4 hex chars mod
    16 — deterministic, so re-runs and both engines agree) and report
    per-shard doc/char/token totals plus each shard's share of the
    corpus in basis points. This is the writer-planning step before a
    100 TB export: hash sharding balances shards WITHOUT a global sort
    or range-partition sampling pass, and the manifest is what the
    downstream loader validates against (doc counts per file).

    Plan: one scan, map-side token count (size of the split array — no
    explode), one 16-row groupBy, corpus total joined back by broadcast
    crossJoin. Everything after the scan is |shards|-sized."""
    d = table(prep(spark), sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 16
    ).cast("int")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"[ \t\n\r\f\x0B]+"), lambda w: F.length(w) > 0)
    )
    per_shard = (
        d.select(shard.alias("shard"), "n_chars", n_tokens.alias("_nt"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per_shard.agg(F.sum("n_docs").alias("_total"))
    return (
        per_shard.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "n_chars",
            "n_tokens",
            (F.col("n_docs") * 10000 / F.col("_total")).cast("bigint").alias("share_bp"),
        )
        .orderBy("shard")
    )


SQL_SHARD_MANIFEST = r"""
WITH assigned AS (
  SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 16)::INT AS shard,
         n_chars,
         len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
             x -> length(x) > 0)) AS nt
  FROM documents
), per_shard AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY shard
), tot AS (SELECT sum(n_docs) AS total FROM per_shard)
SELECT shard, n_docs, n_chars, n_tokens,
       CAST(n_docs * 10000 // total AS BIGINT) AS share_bp
FROM per_shard CROSS JOIN tot
ORDER BY shard
"""


def training_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023) of every raw
    document against the `lang='en'` target slice — hashed-unigram
    target/raw models, add-one smoothing, per-doc Σ ln(p_t/p_r).
    See operators/dsir.py for the scale shape (one tokenize+hash pass,
    256-row models, broadcast scoring join)."""
    from python_multiproc_bigdata_spark.operators.dsir import dsir_log_weights

    d = table(prep(spark), sf_dir, "documents")
    return dsir_log_weights(d, target_lang="en")


SQL_DSIR_WEIGHTS = r"""
WITH tok AS (
  SELECT doc_id, lang,
         (16 * (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1)
             + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1)) % 256
           AS bucket
  FROM (SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                                  x -> length(x) > 0)) AS w
        FROM documents)
), model AS (
  SELECT bucket, count(*) AS cr,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM tok GROUP BY bucket
), tot AS (
  SELECT sum(cr) AS tcr, sum(ct) AS tct FROM model
), lw AS (
  SELECT bucket,
         ln((ct + 1.0) / (t.tct + 256)) - ln((cr + 1.0) / (t.tcr + 256)) AS lwb
  FROM model CROSS JOIN tot t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(lwb), 4) AS dsir_logw
FROM tok JOIN lw USING (bucket)
GROUP BY doc_id
"""


REGISTRY = {
    "training_dsir_weights": QuerySpec(training_dsir_weights, SQL_DSIR_WEIGHTS),
    "training_shard_manifest": QuerySpec(
        training_shard_manifest, SQL_SHARD_MANIFEST
    ),
    "training_mix_by_lang": QuerySpec(training_mix_by_lang, SQL_TRAINING_MIX),
    "training_length_batches": QuerySpec(
        training_length_batches, SQL_LENGTH_BATCHES
    ),
    "training_source_caps": QuerySpec(training_source_caps, SQL_SOURCE_CAPS),
    "training_budget_select": QuerySpec(training_budget_select, _budget_select_sql),
    "training_budget_select_sampled": QuerySpec(
        training_budget_select_sampled, _budget_select_sampled_sql
    ),
    "training_temperature_mix": QuerySpec(
        training_temperature_mix, SQL_TEMPERATURE_MIX
    ),
    "training_chunk_windows": QuerySpec(training_chunk_windows, SQL_CHUNK_WINDOWS),
    "training_pack_chunks": QuerySpec(training_pack_chunks, SQL_PACK_CHUNKS),
    "training_pack_greedy": QuerySpec(training_pack_greedy, SQL_PACK_GREEDY),
    "training_corpus_pipeline": QuerySpec(
        training_corpus_pipeline, SQL_CORPUS_PIPELINE
    ),
    "quota_sample_per_lang": QuerySpec(quota_sample_per_lang, SQL_QUOTA_SAMPLE),
    "training_weighted_sample": QuerySpec(
        training_weighted_sample, SQL_WEIGHTED_SAMPLE
    ),
    "training_contrastive_pairs": QuerySpec(
        training_contrastive_pairs, SQL_CONTRASTIVE
    ),
    "semantic_only_neardups": QuerySpec(semantic_only_neardups, SQL_SEMANTIC_ONLY),
}
