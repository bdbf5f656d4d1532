"""Corpus-curation query family (beyond-reference, training-data
pipeline): repetition signals, eval-set decontamination, duplicate-
cluster canonicalization. DuckDB oracles reproduce every value exactly
(md5/id-deterministic, integer outputs, recursive-CTE closure)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.curation import (
    boilerplate_ngrams,
    connected_components,
    decontaminate_overlap,
    decontamination_fraction,
    duplicated_ngram_counts,
    gopher_quality_gate,
    repetition_signals,
)
from python_multiproc_bigdata_spark.operators.classifier import (
    score_quality_lr,
    train_quality_lr_driver,
)
from python_multiproc_bigdata_spark.operators.dedup import minhash_lsh_pairs
from python_multiproc_bigdata_spark.operators.graph import pagerank
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table
from python_multiproc_bigdata_spark.registry.dedup import SQL_MINHASH_LSH


def curation_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style per-document repetition counters (integers only —
    ratios are the caller's division, keeping the gate hash-exact)."""
    d = table(prep(spark), sf_dir, "documents")
    return repetition_signals(d)


SQL_REPETITION = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), ln -> length(trim(ln)) > 0) AS lines,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), linec AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(sum(c) - count(*) AS BIGINT) AS n_dup_lines,
         max(c) AS max_line_repeats
  FROM (SELECT doc_id, ln, count(*) AS c
        FROM (SELECT doc_id, unnest(lines) AS ln FROM base) GROUP BY doc_id, ln)
  GROUP BY doc_id
), tokc AS (
  SELECT doc_id, count(*) AS n_distinct_tokens, max(c) AS top_token_count
  FROM (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS w FROM base) GROUP BY doc_id, w)
  GROUP BY doc_id
), bg AS (
  SELECT doc_id, max(c) AS top_bigram_count
  FROM (SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id, unnest(list_transform(range(greatest(len(t) - 1, 0)),
                 i -> t[i+1] || ' ' || t[i+2])) AS g
          FROM base) GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(l.n_lines, 0) AS n_lines,
       coalesce(l.n_dup_lines, 0) AS n_dup_lines,
       coalesce(l.max_line_repeats, 0) AS max_line_repeats,
       len(b.t) AS n_tokens,
       coalesce(k.n_distinct_tokens, 0) AS n_distinct_tokens,
       coalesce(k.top_token_count, 0) AS top_token_count,
       coalesce(g.top_bigram_count, 0) AS top_bigram_count
FROM base b
LEFT JOIN linec l USING (doc_id)
LEFT JOIN tokc k USING (doc_id)
LEFT JOIN bg g USING (doc_id)
"""


EVAL_MOD = 10  # doc_id % 10 == 0 → the held-out "benchmark" slice
DECON_N = 13  # the published 13-gram decontamination rule


def decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents table: the eval set
    is the deterministic doc_id % 10 == 0 slice, training is the rest;
    emit (train_id, eval_id, n_shared_grams) for every training doc
    sharing a 13-gram with an eval doc. At 100 TB the eval side is a
    benchmark suite (MBs): its gram set broadcasts and this becomes a
    map-side join over the training scan."""
    d = table(prep(spark), sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    tr = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    return decontaminate_overlap(tr, ev, n=DECON_N)


SQL_DECONTAMINATE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(greatest(len(t) - {DECON_N - 1}, 0)),
           i -> array_to_string(t[i+1:i+{DECON_N}], ' '))) AS g
    FROM toks)
), ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
   tr AS (SELECT doc_id AS train_id, g FROM grams WHERE doc_id % {EVAL_MOD} != 0)
SELECT train_id, eval_id, count(*) AS n_shared_grams
FROM tr JOIN ev USING (g)
GROUP BY train_id, eval_id
"""

DECON_FLAG_THRESHOLD = 0.05


def decontaminate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional contamination per training doc (operators/curation.py:
    decontamination_fraction): the share of each doc's 13-grams that
    appear anywhere in the eval slice, flagged at >=5% — the published
    drop-if-X%-covered rule, complementing decontaminate_train_eval's
    per-pair evidence. Same eval split (doc_id % 10 == 0)."""
    d = table(prep(spark), sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    tr = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    return decontamination_fraction(
        tr, ev, n=DECON_N, flag_threshold=DECON_FLAG_THRESHOLD
    )


SQL_DECONTAMINATE_FRACTION = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(greatest(len(t) - {DECON_N - 1}, 0)),
           i -> array_to_string(t[i+1:i+{DECON_N}], ' '))) AS g
    FROM toks)
), ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
   tr AS (SELECT doc_id, g FROM grams WHERE doc_id % {EVAL_MOD} != 0),
   totals AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY doc_id),
   hits AS (
     SELECT doc_id, count(*) AS n_contaminated
     FROM tr WHERE g IN (SELECT g FROM ev) GROUP BY doc_id
   )
SELECT t.doc_id AS train_id, t.n_grams,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(coalesce(h.n_contaminated, 0) / t.n_grams, 4) AS contamination_frac,
       round(coalesce(h.n_contaminated, 0) / t.n_grams, 4)
         >= {DECON_FLAG_THRESHOLD} AS flagged
FROM totals t LEFT JOIN hits h USING (doc_id)
"""


def dedup_components_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over the
    MinHash-LSH near-dup pair graph (threshold 0.8), labeling every
    clustered doc with its cluster's min doc_id — the keep-list step
    between "pairs exist" and "deduplicated corpus" (keep rows where
    doc_id == component). Iterative min-label propagation, O(diameter)
    rounds; the oracle computes the same closure with a recursive CTE."""
    d = table(prep(spark), sf_dir, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    return connected_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )


# Reuse the full MinHash-LSH pipeline SQL as a CTE, then close over the
# pair graph with a recursive CTE (closure is tiny: |pairs| ~ dup rate).
_LSH_PAIRS_CTE = SQL_MINHASH_LSH.replace("WITH ", "WITH RECURSIVE ", 1).replace(
    "\nSELECT id_a AS doc_a, id_b AS doc_b,",
    ", pairs AS (\nSELECT id_a AS doc_a, id_b AS doc_b,",
).rstrip() + "\n)"

_COMPONENTS_BODY = r"""
, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT n.id AS doc_id, least(n.id, min(r.b)) AS component
  FROM (SELECT DISTINCT a AS id FROM edges) n
  JOIN reach r ON r.a = n.id
  GROUP BY n.id
)
"""

SQL_COMPONENTS = _LSH_PAIRS_CTE + _COMPONENTS_BODY + """
SELECT doc_id, component FROM comp
"""


def dedup_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: instead of keeping each dup
    cluster's MIN doc_id (dedup_components_canonical above — C4's
    keep-first rule), keep its LONGEST member (n_chars, doc_id
    tiebreak) — the "keep the most complete copy" policy better
    pipelines use. One row per cluster: size, kept doc, kept length.

    Deterministic by construction: the ranking key (n_chars DESC,
    doc_id ASC) is an integer total order — no float compare at the
    argmax boundary. Plan: the same iterative min-label components pass,
    one join onto the (tiny, dup-rate-sized) clustered relation to
    attach lengths, one row_number per cluster, one rollup."""
    d = table(prep(spark), sf_dir, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    j = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = j.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("keep_n_chars"),
    )


SQL_KEEP_BEST = _LSH_PAIRS_CTE + _COMPONENTS_BODY + """
, ranked AS (
  SELECT c.component, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT component,
       count(*) AS n_members,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
       max(CASE WHEN rn = 1 THEN n_chars END) AS keep_n_chars
FROM ranked GROUP BY component
"""


def dedup_cluster_size_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the report every dedup run is
    sanity-checked against BEFORE deleting anything: one row per
    cluster size with the number of clusters, total docs bound in them,
    and the redundant-doc mass (size−1 per cluster) as a share of the
    corpus. A runaway max size here means a boilerplate shingle or LSH
    band is gluing the corpus together (the failure the posting-list
    caps exist for). Composes the same components pass as the
    canonical-selection family; the rollup is |distinct sizes| rows."""
    d = table(prep(spark), sf_dir, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).alias("docs_bound"),
            F.round(
                ((F.col("size") - 1) * F.col("n_clusters")).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("redundant_share"),
        )
    )


SQL_CLUSTER_SIZES = _LSH_PAIRS_CTE + _COMPONENTS_BODY + """
, csizes AS (
  SELECT component, count(*) AS size FROM comp GROUP BY 1
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(size * count(*) AS BIGINT) AS docs_bound,
       round(CAST((size - 1) * count(*) AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS redundant_share
FROM csizes CROSS JOIN tot
GROUP BY size, n_docs
"""


def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe ~80/20 split (GroupShuffleSplit semantics): the split
    hash is taken over each doc's near-dup CLUSTER canonical id, not the
    doc id, so two near-duplicates can never land on opposite sides of a
    train/test boundary — the held-out set stays honest. Docs outside
    any cluster group as themselves. Same md5-hex rule as
    split_train_test_documents; emits (doc_id, group_key, split).

    Plan: the components pass (iterative min-label propagation over the
    LSH pair graph — O(dup-cluster diameter) rounds) + one left join of
    the tiny clustered-doc relation back onto the corpus (broadcasts at
    scale: |clustered| ~ dup rate) + a map-side hash. The invariant
    (no group straddles splits) is pinned in tests/test_curation.py."""
    d = table(prep(spark), sf_dir, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    g = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").cast("long").alias("group_key"),
    )
    split = F.when(
        F.substring(F.md5(F.col("group_key").cast("string")), 1, 2) < "cd", "train"
    ).otherwise("test")
    return g.select("doc_id", "group_key", split.alias("split"))


SQL_SPLIT_LEAKAGE_SAFE = _LSH_PAIRS_CTE + _COMPONENTS_BODY + """
SELECT d.doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS group_key,
       CASE WHEN substring(md5(coalesce(c.component, d.doc_id)::VARCHAR), 1, 2) < 'cd'
            THEN 'train' ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


BP_N = 5  # boilerplate gram width (3-grams are dedup's unit; 5 is C4-ish)


def curation_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most document-frequent 5-grams (doc_freq ≥ 2) — the
    boilerplate mining pass whose output calibrates the dedup frequency
    caps. Deterministic cut: doc_freq desc, gram asc."""
    d = table(prep(spark), sf_dir, "documents")
    return boilerplate_ngrams(d, n=BP_N, min_doc_freq=2, top_k=50)


SQL_BOILERPLATE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(greatest(len(t) - {BP_N - 1}, 0)),
           i -> array_to_string(t[i+1:i+{BP_N}], ' '))) AS g
    FROM toks)
)
SELECT g AS gram, count(*) AS doc_freq
FROM grams
GROUP BY g
HAVING count(*) >= 2
ORDER BY doc_freq DESC, gram ASC
LIMIT 50
"""


def curation_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross entropy under the corpus's own unigram LM (nats) —
    the CCNet-style perplexity quality gate with a dependency-free LM.
    See operators/curation.py:unigram_logprob_score."""
    from python_multiproc_bigdata_spark.operators.curation import (
        unigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    return unigram_logprob_score(d)


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
), model AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT count(*) AS t FROM toks
)
SELECT doc_id, round(-avg(ln(c * 1.0 / t)), 4) AS xent_nats,
       count(*) AS n_tokens
FROM toks JOIN model USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


def curation_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross entropy under the corpus's own bigram LM (nats) —
    one LM order up from curation_unigram_logprob, the next rung on
    the CCNet/KenLM perplexity-gate ladder.
    See operators/curation.py:bigram_logprob_score."""
    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    return bigram_logprob_score(d)


SQL_BIGRAM_LOGPROB = r"""
WITH docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS gram
  FROM docs WHERE len(ws) >= 2
), model AS (
  SELECT gram, count(*) AS c2 FROM grams GROUP BY gram
), ctx AS (
  SELECT split_part(gram, ' ', 1) AS w1, sum(c2) AS c1 FROM model GROUP BY w1
)
SELECT doc_id,
       round(-avg(ln(c2 * 1.0 / c1)), 4) AS xent2_nats,
       count(*) AS n_bigrams
FROM grams
JOIN model USING (gram)
JOIN ctx ON split_part(gram, ' ', 1) = ctx.w1
GROUP BY doc_id
"""


def curation_ccnet_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per-language head/middle/tail
    terciles of the bigram-LM cross entropy (Wenzek et al., "CCNet" —
    head = most-fluent third, the slice kept for LM pretraining).
    Composes the independently-oracle-checked LM tower
    (curation_bigram_logprob) with an NTILE(3) window per language;
    ties broken by doc_id so the tercile assignment is total on both
    engines.

    Scale: the LM tower is two bounded groupBys; the NTILE needs a
    per-language sort (one window exchange on lang — range-partitioned
    within language at cluster scale). At 100 TB one would instead
    broadcast sample-derived perplexity CUTOFFS (CCNet's actual recipe)
    and bucket map-side; the exact-NTILE form here is the
    deterministic, oracle-checkable twin of that plan."""
    from pyspark.sql import Window

    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    perdoc = bigram_logprob_score(d)
    j = perdoc.join(d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("xent2_nats", "doc_id")
    t = F.ntile(3).over(w)
    return j.select(
        "doc_id",
        "lang",
        "xent2_nats",
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail").alias("tier"),
    )


SQL_CCNET_TIERS = (
    "WITH perdoc AS (\n" + SQL_BIGRAM_LOGPROB + "\n)"
    + r"""
SELECT p.doc_id, d.lang, p.xent2_nats,
       CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY p.xent2_nats, p.doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
FROM perdoc p JOIN documents d USING (doc_id)
"""
)


def curation_ccnet_tiers_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_ccnet_tiers' 100 TB form — CCNet's ACTUAL recipe
    (Wenzek et al. §3.2 bucket the corpus by perplexity cutoffs
    computed once, not by sorting every shard): per-language tercile
    CUTOFFS derived from a bounded deterministic sample and broadcast,
    bucketing map-side, so no per-language sort of the full corpus
    runs. The exact-NTILE sibling stays registered as the oracle
    anchor (the dq_panel / dq_panel_approx pairing).

    Sample = docs whose md5(doc_id) hex starts with '0' (~1/16,
    engine-portable md5 slice); each language's 2 cutoffs are the
    (xent2_nats, doc_id) tuples at rank ceil(q·n/3) of its ASC-sorted
    sample — tuples preserve the exact form's total order, so tiering
    is tie-free on both engines. tier = tail if beyond cutoff 2,
    middle if beyond cutoff 1, else head; a language absent from the
    sample has NULL cutoffs and everything lands in head (both engines
    COALESCE the comparison to false).

    Scale shape: the LM tower is unchanged (two bounded groupBys); the
    only window runs over the md5-filtered sample; cutoffs collect as
    ≤ 2·|languages| rows and re-enter as a broadcast-joined literal
    table, so the full-corpus plan is Window-free with a
    BroadcastHashJoin (pinned in test_scale_plans.py)."""
    from pyspark.sql import Window

    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    perdoc = bigram_logprob_score(d)
    j = perdoc.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "xent2_nats"
    )
    samp = j.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    w = Window.partitionBy("lang").orderBy(F.asc("xent2_nats"), F.asc("doc_id"))
    ranked = samp.select(
        "lang",
        "xent2_nats",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    cut_rows = (
        ranked.withColumn("q", F.explode(F.array(F.lit(1), F.lit(2))))
        .filter(F.expr("rn = (q * n + 2) div 3"))
        .select("lang", "q", "xent2_nats", "doc_id")
        .collect()  # bounded: ≤ 2 × |languages|
    )
    by_lang: dict[str, dict[int, tuple[float, int]]] = {}
    for r in cut_rows:
        by_lang.setdefault(r.lang, {})[int(r.q)] = (float(r.xent2_nats), int(r.doc_id))
    cut_df = F.broadcast(
        j.sparkSession.createDataFrame(
            [
                (
                    lang,
                    qs.get(1, (None, None))[0],
                    qs.get(1, (None, None))[1],
                    qs.get(2, (None, None))[0],
                    qs.get(2, (None, None))[1],
                )
                for lang, qs in sorted(by_lang.items())
            ],
            "lang string, c1x double, c1d bigint, c2x double, c2d bigint",
        )
    )

    def beyond(cx: str, cd: str):
        return F.coalesce(
            (F.col("xent2_nats") > F.col(cx))
            | ((F.col("xent2_nats") == F.col(cx)) & (F.col("doc_id") > F.col(cd))),
            F.lit(False),
        )

    return j.join(cut_df, "lang", "left").select(
        "doc_id",
        "lang",
        "xent2_nats",
        F.when(beyond("c2x", "c2d"), "tail")
        .when(beyond("c1x", "c1d"), "middle")
        .otherwise("head")
        .alias("tier"),
    )


SQL_CCNET_TIERS_SAMPLED = (
    "WITH perdoc AS (\n" + SQL_BIGRAM_LOGPROB + "\n)"
    + r""", j AS (
  SELECT p.doc_id, d.lang, p.xent2_nats FROM perdoc p JOIN documents d USING (doc_id)
), samp AS (
  SELECT * FROM j WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
), ranked AS (
  SELECT lang, xent2_nats, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY xent2_nats, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM samp
), cuts AS (
  SELECT lang, q, xent2_nats AS cx, doc_id AS cd
  FROM ranked, (SELECT unnest(range(1, 3)) AS q) qs
  WHERE rn = (q * n + 2) // 3
), cutp AS (
  SELECT lang,
         max(CASE WHEN q = 1 THEN cx END) AS c1x,
         max(CASE WHEN q = 1 THEN cd END) AS c1d,
         max(CASE WHEN q = 2 THEN cx END) AS c2x,
         max(CASE WHEN q = 2 THEN cd END) AS c2d
  FROM cuts GROUP BY lang
)
SELECT j.doc_id, j.lang, j.xent2_nats,
       CASE WHEN COALESCE(j.xent2_nats > c.c2x
                 OR (j.xent2_nats = c.c2x AND j.doc_id > c.c2d), FALSE) THEN 'tail'
            WHEN COALESCE(j.xent2_nats > c.c1x
                 OR (j.xent2_nats = c.c1x AND j.doc_id > c.c1d), FALSE) THEN 'middle'
            ELSE 'head' END AS tier
FROM j LEFT JOIN cutp c USING (lang)
"""
)


def curation_pagerank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph quality signal: 3-iteration PageRank over the
    symmetrized part↔supplier bipartite graph (stand-in for a web-crawl
    host graph — rank mass marks well-referenced nodes, a classic
    crawl-curation prior). Symmetrizing guarantees every node has
    out-edges, so no dangling-mass term and the DuckDB oracle can
    replay the exact fixed-iteration recurrence; ranks rounded to 8 dp
    to absorb float-sum order (values ~5e-4, double error ~1e-16 —
    eight decimals is 1e8× the noise floor, far finer than the
    signal)."""
    li = table(prep(spark), sf_dir, "lineitem")
    # integer node keys through the loop (p<k> -> 2k, s<k> -> 2k+1):
    # three join+agg rounds shuffle the edge relation, and 8-byte longs
    # hash/compare/ship ~3x lighter than "p123"-style strings (the same
    # bytes-through-the-shuffle doctrine as the xxhash64 posting keys);
    # labels are re-attached AFTER the loop on the |nodes|-sized result.
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    out = pagerank(edges, iterations=3)
    label = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("p"), F.expr("node DIV 2"))
    ).otherwise(F.concat(F.lit("s"), F.expr("(node - 1) DIV 2")))
    res = out.select(label.alias("node"), F.round("rank", 8).alias("rank")).orderBy("node")
    # break the lineage into the persisted loop state before handing the
    # frame out, then release the cache (operator contract). r12 re-A/B:
    # dropping this checkpoint measured 4.15 -> 4.95 s median (the lazy
    # recompute fans into 14 AQE jobs the checkpointed form avoids) —
    # kept.
    rows = res.localCheckpoint(eager=True)
    out.unpersist()
    return rows


_PR_ITER = """
  SELECT e.dst AS node,
         0.15 / (SELECT cnt FROM n) + 0.85 * sum(r.rank / deg.deg) AS rank
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg ON e.src = deg.src
  GROUP BY e.dst
"""

SQL_PAGERANK = f"""
WITH fwd AS (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
), edges AS (
  SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), n AS (
  SELECT count(*) AS cnt FROM deg
), r0 AS (
  SELECT src AS node, 1.0 / (SELECT cnt FROM n) AS rank FROM deg
), r1 AS ({_PR_ITER.format(prev="r0")}
), r2 AS ({_PR_ITER.format(prev="r1")}
), r3 AS ({_PR_ITER.format(prev="r2")}
)
SELECT CASE WHEN node % 2 = 0 THEN 'p' || (node // 2)
            ELSE 's' || ((node - 1) // 2) END AS node,
       round(rank, 8) AS rank
FROM r3 ORDER BY 1
"""


def graph_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts sharing an
    order are linked; triangles mark cohesive product clusters — the
    graph-cohesion signal recommender and community pipelines start
    from). Edges require SUPPORT >= 2 (co-purchased in at least two
    orders) — the standard market-basket noise cut, and the step that
    makes the census scale: one-off co-occurrence is combinatorial
    noise that grows quadratically with basket count (measured 1.196M
    raw pair rows -> 3 853 support-2 edges at sf0.1; the unpruned wedge
    space made this the slowest headline query at 13 s, the pruned form
    is sub-second). Edge build is a lineitem self-join on l_orderkey
    (co-partitioned equi-join) + one HAVING groupBy, then the
    degree-oriented wedge-closure plan in
    operators/graph.py:triangle_count."""
    from python_multiproc_bigdata_spark.operators.graph import triangle_count

    li = table(prep(spark), sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("src", "dst")
    )
    return triangle_count(pairs)


SQL_TRIANGLES = """
WITH pairs AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), deg AS (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs) GROUP BY n
), o AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND a < b)
              THEN a ELSE b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND a < b)
              THEN b ELSE a END AS v
  FROM pairs JOIN deg da ON da.n = a JOIN deg db ON db.n = b
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM o e1 JOIN o e2 ON e1.v = e2.u
  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, count(*) AS n_triangles
FROM (SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY node
"""


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-over-release corpus diff — the audit table a versioned
    dataset publishes with each release (what was added, removed,
    edited). Two releases are derived deterministically from one
    snapshot by md5(doc_id) slice so both engines see identical
    versions: ~1/16 of docs exist only in v1 (removed), ~1/16 only in
    v2 (added), ~1/16 have edited text in v2 (changed), the rest are
    unchanged. The diff itself is the production shape: FULL OUTER
    JOIN of the two (doc_id, content-fingerprint) relations + a CASE —
    one shuffle on doc_id, no text comparison (fingerprints only).
    Output: per-doc (doc_id, status) plus the v1/v2 fingerprint
    presence flags."""
    d = table(prep(spark), sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    base = d.select("doc_id", "text", h.alias("h"))
    v1 = base.where(F.col("h") != "e").select(
        "doc_id", F.md5("text").alias("fp1")
    )
    v2 = base.where(F.col("h") != "d").select(
        "doc_id",
        F.md5(
            F.when(F.col("h") == "c", F.concat(F.col("text"), F.lit(" rev2"))).otherwise(
                F.col("text")
            )
        ).alias("fp2"),
    )
    j = v1.join(v2, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.col("fp1").isNotNull().alias("in_v1"),
        F.col("fp2").isNotNull().alias("in_v2"),
        F.when(F.col("fp1").isNull(), "added")
        .when(F.col("fp2").isNull(), "removed")
        .when(F.col("fp1") == F.col("fp2"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


SQL_VERSION_DIFF = """
WITH base AS (
  SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
  FROM documents
), v1 AS (
  SELECT doc_id, md5(text) AS fp1 FROM base WHERE h <> 'e'
), v2 AS (
  SELECT doc_id,
         md5(CASE WHEN h = 'c' THEN text || ' rev2' ELSE text END) AS fp2
  FROM base WHERE h <> 'd'
)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       (fp1 IS NOT NULL) AS in_v1,
       (fp2 IS NOT NULL) AS in_v2,
       CASE WHEN fp1 IS NULL THEN 'added'
            WHEN fp2 IS NULL THEN 'removed'
            WHEN fp1 = fp2 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""


def graph_community_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-purchase graph via 3-round
    synchronous label propagation (operators/graph.py:label_propagation)
    — the cluster-assignment sibling of the triangle census above: same
    support-≥2 edge build, but the output is a (node, label) community
    map, the grouping a curation pipeline uses to diversify or
    cap-by-cluster. Deterministic (count DESC, label ASC tie order), so
    the oracle replays all three rounds as nested CTE stages."""
    from python_multiproc_bigdata_spark.operators.graph import label_propagation

    li = table(prep(spark), sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(edges, iterations=3)


def _lpa_oracle(iterations: int = 3) -> str:
    """Nested-CTE replay of the synchronous LPA recurrence — one
    (neighbor-count, argmin-tie row_number) stage pair per round, the
    k-stage oracle pattern from sim_mmr_diversify."""
    parts = [
        """WITH pairs AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b, a FROM pairs
), l0 AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
)"""
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""", n{k} AS (
  SELECT e.src AS v, l.label, count(*) AS c
  FROM edges e JOIN l{k - 1} l ON e.dst = l.node
  GROUP BY 1, 2
), l{k} AS (
  SELECT v AS node, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
    FROM n{k})
  WHERE rn = 1
)"""
        )
    parts.append(f"\nSELECT node, label FROM l{iterations}")
    return "".join(parts)


SQL_LABELPROP = _lpa_oracle(3)


def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances over the part co-purchase graph
    (same support-≥2 edge build as the triangle census / LPA above):
    (node, level) for every part within 4 hops of the graph's
    MAX-DEGREE hub (ties broken by min partkey) — the reachability /
    ego-network primitive graph-exploration and influence pipelines
    start from. Source selection is a one-row distributed plan (degree
    groupBy + max_by aggregate, no global window) derived INSIDE bfs_levels from the
    materialized edge list, so the expensive support-2 pair build runs
    exactly once; each BFS round is frontier⋈edges + distinct +
    anti-join vs visited (operators/graph.py:bfs_levels). The oracle
    replays the 4 level-synchronous rounds as nested CTEs."""
    from python_multiproc_bigdata_spark.operators.graph import bfs_levels

    li = table(prep(spark), sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("src", "dst")
    )
    return bfs_levels(pairs, max_hops=4)


def _bfs_oracle(max_hops: int = 4) -> str:
    parts = [
        """WITH pairs AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b, a FROM pairs
), v0 AS (
  SELECT node, 0 AS level FROM (
    SELECT src AS node FROM edges
    GROUP BY src ORDER BY count(*) DESC, src ASC LIMIT 1)
), l0 AS (SELECT * FROM v0)"""
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f""", f{k} AS (
  SELECT DISTINCT e.dst AS node
  FROM l{k - 1} l JOIN edges e ON l.node = e.src
), l{k} AS (
  SELECT f.node, {k} AS level FROM f{k} f
  ANTI JOIN v{k - 1} v ON f.node = v.node
), v{k} AS (SELECT * FROM v{k - 1} UNION ALL SELECT * FROM l{k})"""
        )
    parts.append(f"\nSELECT node, level FROM v{max_hops}")
    return "".join(parts)


SQL_BFS_LEVELS = _bfs_oracle(4)


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph: for every
    NON-adjacent pair with at least 2 common neighbors, the Jaccard
    neighborhood overlap |N(a)∩N(b)| / |N(a)∪N(b)| — the classic
    common-neighbors predictor (Liben-Nowell & Kleinberg) a recommender
    uses to propose missing edges. Top-50 predictions by score.

    Plan: one wedge self-join of the undirected edge list on the shared
    middle node (the same shuffle shape as the triangle census), one
    (a, b) count groupBy, a broadcast degree attach, an anti-join
    against the existing edges, and one global top-50 — ranked on the
    INTEGER micro-Jaccard with (a, b) tiebreak so both engines order
    identically. The cn >= 2 floor prunes the quadratic one-shared-
    neighbor tail exactly like the census's support cut."""
    li = table(prep(spark), sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("src", "dst")
    )
    und = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    w1 = und.select(F.col("dst").alias("a"), F.col("src").alias("x"))
    w2 = und.select(F.col("src").alias("x"), F.col("dst").alias("b"))
    cn = (
        w1.join(w2, "x")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= 2)
    )
    fresh = cn.join(
        pairs.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    scored = (
        fresh.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")).cast("double")
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("j_micro"),
        )
    )
    return (
        scored.orderBy(F.desc("j_micro"), F.asc("a"), F.asc("b"))
        .limit(50)
        .select(
            "a",
            "b",
            "cn",
            F.round(F.col("j_micro") / F.lit(1000000.0), 6).alias("jaccard"),
        )
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round k-core peel (k=3) of the part co-purchase graph — the
    cohesion filter that keeps only parts embedded in a dense
    co-purchase neighborhood (operators/graph.py:kcore), the subgraph a
    recommender trusts over one-off co-occurrences. Same support-≥2
    edge build as the census/LPA/BFS family; the oracle replays the 3
    peel rounds as nested CTEs."""
    from python_multiproc_bigdata_spark.operators.graph import kcore

    li = table(prep(spark), sf_dir, "lineitem")
    l1 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        l1.join(l2, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("src", "dst")
    )
    return kcore(pairs, k=3, rounds=3)


def _kcore_oracle(k: int = 3, rounds: int = 3) -> str:
    parts = [
        """WITH pairs AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), e0 AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b, a FROM pairs
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", k{r} AS (
  SELECT src FROM e{r - 1} GROUP BY src HAVING count(*) >= {k}
), e{r} AS (
  SELECT e.src, e.dst FROM e{r - 1} e
  SEMI JOIN k{r} ks ON e.src = ks.src
  SEMI JOIN k{r} kd ON e.dst = kd.src
)"""
        )
    parts.append(
        f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
FROM e{rounds} GROUP BY src"""
    )
    return "".join(parts)


SQL_KCORE = _kcore_oracle(3, 3)


SQL_LINK_PREDICTION = """
WITH pairs AS (
  SELECT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), und AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
), deg AS (
  SELECT src AS node, count(*) AS deg FROM und GROUP BY 1
), cn AS (
  SELECT w1.dst AS a, w2.dst AS b, count(*) AS cn
  FROM und w1 JOIN und w2 ON w1.src = w2.src AND w1.dst < w2.dst
  GROUP BY 1, 2 HAVING count(*) >= 2
), fresh AS (
  SELECT c.* FROM cn c
  ANTI JOIN pairs p ON c.a = p.src AND c.b = p.dst
), scored AS (
  SELECT f.a, f.b, f.cn,
         CAST(round(CAST(f.cn AS DOUBLE)
                    / CAST(da.deg + db.deg - f.cn AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS j_micro
  FROM fresh f
  JOIN deg da ON f.a = da.node
  JOIN deg db ON f.b = db.node
)
SELECT a, b, cn, round(j_micro / 1000000.0, 6) AS jaccard
FROM scored
ORDER BY j_micro DESC, a ASC, b ASC
LIMIT 50
"""


def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-order brand sets:
    support / confidence / lift for brand pairs, the frequent-itemset
    (Apriori k=2) step recommender and assortment pipelines start from.

    Scale shape: ONE basket shuffle. lineitem joins the broadcast part
    dim, collect_set builds each order's brand basket (TPC-H baskets
    are <=7 lines; brand space is 25, so baskets stay tiny), and the
    unordered pairs expand MAP-SIDE from the sorted array via nested
    transform+slice — no lineitem self-join shuffle, unlike the
    triangle census above which needs the raw pair multiset. Brand
    totals and the order count are re-derived from the same baskets
    and broadcast back; all divisions are double-cast identically to
    the oracle. `_bs` is referenced via size() in the pair expression
    so CollapseProject cannot inline the collect_set into the lambda
    (the O(n^2) re-eval trap — see SCALE.md).

    Reference scope: extends the reference's per-key counting to
    co-occurrence statistics; same public Apriori semantics as
    pyspark.ml.fpm.FPGrowth's first level, kept in plain DataFrame ops
    so the DuckDB twin can replay it exactly."""
    s = prep(spark)
    li = table(s, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = table(s, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("_bs"))
    )
    pair_expr = F.expr(
        """
        flatten(transform(_bs, (x, i) ->
          transform(slice(_bs, i + 2, greatest(size(_bs) - i - 1, 1)),
                    y -> struct(x AS brand_a, y AS brand_b))))
        """
    )
    pairs = (
        baskets.select(F.explode_outer(pair_expr).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= 5)
    )
    singles = (
        baskets.select(F.explode("_bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("bo"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pd_ = F.col("pair_orders").cast("double")
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("brand").alias("brand_a"),
                                       F.col("bo").alias("oa"))), "brand_a")
        .join(
            F.broadcast(singles.select(F.col("brand").alias("brand_b"),
                                       F.col("bo").alias("ob"))), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(pd_ / F.col("n_orders").cast("double"), 6).alias("support"),
            F.round(pd_ / F.col("oa").cast("double"), 6).alias("confidence"),
            F.round(
                pd_ * F.col("n_orders").cast("double")
                / (F.col("oa").cast("double") * F.col("ob").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


# independent formulation: distinct + self-join (no basket arrays)
SQL_BASKET_RULES = """
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS pair_orders
  FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2 HAVING count(*) >= 5
), singles AS (
  SELECT brand, count(*) AS bo FROM items GROUP BY brand
), tot AS (
  SELECT count(DISTINCT okey) AS n_orders FROM items
)
SELECT brand_a, brand_b, pair_orders,
       round(CAST(pair_orders AS DOUBLE) / CAST(n_orders AS DOUBLE), 6)
         AS support,
       round(CAST(pair_orders AS DOUBLE) / CAST(sa.bo AS DOUBLE), 6)
         AS confidence,
       round(CAST(pair_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(sa.bo AS DOUBLE) * CAST(sb.bo AS DOUBLE)), 4) AS lift
FROM pairs
JOIN singles sa ON sa.brand = brand_a
JOIN singles sb ON sb.brand = brand_b
CROSS JOIN tot
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
"""


def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anonymization gate (operators/curation.py:redact_pii) given a
    corpus-wide value check: the harness corpus contains no digits, so
    the query first INJECTS deterministic PII — an email for doc_id%7,
    a phone for %11, a dotted-quad IP for %13, all pure string
    arithmetic a SQL oracle replays — then runs the real redaction
    chain. Output = per-doc counts + md5 of the redacted text, so the
    oracle pins the exact spans every regex matched (a residual '@' or
    digit run anywhere flips the hash). Map-only, no shuffle; the
    patterns live in the Java-regex ∩ RE2 common dialect."""
    from python_multiproc_bigdata_spark.operators.curation import redact_pii

    d = table(prep(spark), sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call +1 (555) 010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = redact_pii(injected, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5("redacted").alias("redacted_md5"),
    )


# Replays the injection arithmetic, then the IDENTICAL count + redact
# chain (email -> ipv4 -> phone, same order as PII_PATTERNS) with the
# 'g' flag (Spark's regexp_replace is global by default; DuckDB's isn't).
SQL_PII_REDACT = r"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.0.' || (doc_id % 256) || '.1'
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '\+?[0-9][0-9() \-]{6,}[0-9]')) AS BIGINT) AS n_phone,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g'),
           '\+?[0-9][0-9() \-]{6,}[0-9]', '<PHONE>', 'g')
       ) AS redacted_md5
FROM injected
"""



def curation_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-corpus duplicated 5-gram counters (the RefinedWeb /
    Gopher duplicated-n-gram filter's input): of each document's
    distinct word 5-grams, how many occur in >= 2 documents. Integers
    only — the thresholding ratio is the caller's division."""
    d = table(prep(spark), sf_dir, "documents")
    return duplicated_ngram_counts(d, n=5).orderBy("doc_id")


SQL_DUP_NGRAM = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 5 THEN list_transform(range(len(t) - 4),
             i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5])
           ELSE [] END)) AS gram
  FROM base
), dupg AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), tot AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_grams FROM grams GROUP BY doc_id
), dup AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_dup_grams
  FROM grams JOIN dupg USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(tot.n_grams, 0) AS n_grams,
       coalesce(dup.n_dup_grams, 0) AS n_dup_grams
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN dup USING (doc_id)
ORDER BY doc_id
"""


# C4-style blocklist (stand-in list — the mechanism is the capability;
# swap the production list in). Shared verbatim with the oracle.
BADWORDS = ("slow", "error", "broken", "junk")


def curation_badwords_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 drop any page with a
    "bad word"): per doc, the count of blocklisted TOKENS and the keep
    verdict, plus the rate — the first, cheapest filter every web-scale
    curation cascade runs (the Gopher gate below is the quality
    sibling; this is the content-policy one). Map-only: one tokenize,
    one array_intersect-free size(filter(...)) count — runs at scan
    speed; the blocklist is a literal (a broadcast table at real list
    sizes)."""
    from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE

    d = table(prep(spark), sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), WHITESPACE_RE), lambda x: F.length(x) > 0
    )
    bad = F.size(F.filter(toks, lambda x: x.isin(*BADWORDS)))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        bad.alias("n_bad"),
        (bad == 0).alias("keep"),
    )


def _badwords_sql() -> str:
    lst = ", ".join(f"'{w}'" for w in BADWORDS)
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(t) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(t, x -> x IN ({lst}))) AS INTEGER) AS n_bad,
       len(list_filter(t, x -> x IN ({lst}))) = 0 AS keep
FROM base
"""


SQL_BADWORDS_GATE = _badwords_sql()


def curation_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality gate (Rae et al. 2021 App. A, public
    default thresholds): per-doc rule booleans + conjunctive keep.
    Map-only column math — the gate runs at scan speed."""
    d = table(prep(spark), sf_dir, "documents")
    return gopher_quality_gate(d).orderBy("doc_id")


SQL_GOPHER_GATE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS t
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(t) AS INT) AS n_words,
         CAST(coalesce(list_sum(list_transform(t, w -> length(w))), 0) AS BIGINT) AS total_chars,
         CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS INT) AS n_alpha,
         CAST(len(list_intersect(list_distinct(t),
              ['the','be','to','of','and','that','have','with'])) AS INT) AS n_stop
  FROM base
)
SELECT doc_id, n_words,
       (n_words BETWEEN 50 AND 100000) AS ok_word_count,
       (total_chars >= 3.0 * n_words AND total_chars <= 10.0 * n_words) AS ok_mean_word_len,
       (n_alpha * 100 >= 80 * n_words) AS ok_alpha_words,
       (n_stop >= 2) AS ok_stopwords,
       ((n_words BETWEEN 50 AND 100000)
        AND total_chars >= 3.0 * n_words AND total_chars <= 10.0 * n_words
        AND n_alpha * 100 >= 80 * n_words
        AND n_stop >= 2) AS keep
FROM m
ORDER BY doc_id
"""


def curation_filter_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition report for the Gopher rule cascade — the
    observability table every production curation pipeline publishes
    alongside its output (how many documents each gate dropped, in
    order). Rules run in the fixed order word_count → mean_word_len →
    alpha_words → stopwords; stage k's population is the survivors of
    stages 1..k-1, so `dropped` attributes each document to the FIRST
    rule that rejects it.

    Scale: one map-only gate pass + ONE single-row aggregate of prefix-
    conjunction counters; the 4-row report is exploded from that row —
    no per-stage scans, no shuffle beyond the global agg."""
    from python_multiproc_bigdata_spark.operators.curation import (
        gopher_quality_gate,
    )

    d = table(prep(spark), sf_dir, "documents")
    g = gopher_quality_gate(d)
    ok1, ok2, ok3, ok4 = (
        F.col("ok_word_count"),
        F.col("ok_mean_word_len"),
        F.col("ok_alpha_words"),
        F.col("ok_stopwords"),
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(ok1.cast("long")).alias("n1"),
        F.sum((ok1 & ok2).cast("long")).alias("n2"),
        F.sum((ok1 & ok2 & ok3).cast("long")).alias("n3"),
        F.sum((ok1 & ok2 & ok3 & ok4).cast("long")).alias("n4"),
    )
    names = ["word_count", "mean_word_len", "alpha_words", "stopwords"]
    stages = F.array(
        *[
            F.struct(
                F.lit(k + 1).alias("stage"),
                F.lit(names[k]).alias("rule"),
                F.col(f"n{k}").alias("docs_in"),
                (F.col(f"n{k}") - F.col(f"n{k + 1}")).alias("dropped"),
                F.col(f"n{k + 1}").alias("docs_out"),
            )
            for k in range(4)
        ]
    )
    return agg.select(F.explode(stages).alias("s")).select("s.*")


SQL_FILTER_ATTRITION = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS t
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(t) AS INT) AS n_words,
         CAST(coalesce(list_sum(list_transform(t, w -> length(w))), 0) AS BIGINT) AS total_chars,
         CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS INT) AS n_alpha,
         CAST(len(list_intersect(list_distinct(t),
              ['the','be','to','of','and','that','have','with'])) AS INT) AS n_stop
  FROM base
), f AS (
  SELECT (n_words BETWEEN 50 AND 100000) AS ok1,
         (total_chars >= 3.0 * n_words AND total_chars <= 10.0 * n_words) AS ok2,
         (n_alpha * 100 >= 80 * n_words) AS ok3,
         (n_stop >= 2) AS ok4
  FROM m
), a AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN ok1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN ok1 AND ok2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN ok1 AND ok2 AND ok3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN ok1 AND ok2 AND ok3 AND ok4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM f
)
SELECT 1 AS stage, 'word_count' AS rule, n0 AS docs_in, n0 - n1 AS dropped, n1 AS docs_out FROM a
UNION ALL SELECT 2, 'mean_word_len', n1, n1 - n2, n2 FROM a
UNION ALL SELECT 3, 'alpha_words', n2, n2 - n3, n3 FROM a
UNION ALL SELECT 4, 'stopwords', n3, n3 - n4, n4 FROM a
"""


def curation_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained model-based quality gate (operators/classifier.py) — the
    fastText/CCNet-style stage after the heuristic gates: logistic
    regression over 64 hashed token buckets, trained driver-side on a
    bounded `ORDER BY md5(doc_id) LIMIT 256` sample against the weak
    heuristic label, applied to the full corpus as one explode + one
    64-row broadcast join + one groupBy. The generated oracle RETRAINS
    from the same parquet through the same shared Python core
    (train_from_rows — the kmeans_core discipline), embeds the
    bit-identical weights, and replays the scoring in SQL."""
    docs = table(prep(spark), sf_dir, "documents")
    w, b = train_quality_lr_driver(docs)
    return score_quality_lr(docs, w, b)


def _classifier_scored_sql() -> str:
    """The retrain-and-score CTE chain shared by the classifier gate and
    the active-learning selection: retrain via the SHARED core from the
    same parquet (duckdb read in the identical md5 sample order), embed
    weights/bias as literals, replay feature hashing (strpos hex
    arithmetic), scoring, and the weak label — ending at `scored`."""
    import os

    import duckdb

    from python_multiproc_bigdata_spark.operators.classifier import (
        N_BUCKETS,
        SAMPLE_N,
        STOPWORD_RATIO_MIN,
        STOPWORDS,
        train_from_rows,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"""SELECT doc_id, text
            FROM read_parquet('{sf_dir}/documents.parquet')
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {SAMPLE_N}"""
    ).fetchall()
    w, b = train_from_rows([(int(d), t) for d, t in rows])
    weight_values = ",\n".join(f"({i}, {wi!r})" for i, wi in enumerate(w))
    return rf"""
WITH wt(bucket, w) AS (VALUES {weight_values}),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                            x -> length(x) > 0)) AS token
  FROM documents
), bucketed AS (
  SELECT doc_id, token,
         CAST((16 * (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1)
               + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1))
              % {N_BUCKETS} AS INTEGER) AS bucket
  FROM tok
), agg AS (
  SELECT bk.doc_id, count(*) AS n_tokens, sum(wt.w) AS sw,
         sum(CASE WHEN token IN {STOPWORDS!r} THEN 1 ELSE 0 END) AS nstop
  FROM bucketed bk JOIN wt USING (bucket)
  GROUP BY bk.doc_id
), scored AS (
  SELECT d.doc_id,
         COALESCE(a.n_tokens, 0) AS n_tokens,
         round(1.0 / (1.0 + exp(-({b!r} + COALESCE(a.sw / a.n_tokens, 0.0)))), 4)
           AS score,
         COALESCE(CAST(a.nstop AS DOUBLE) / a.n_tokens, 0.0)
           >= {STOPWORD_RATIO_MIN} AS weak
  FROM documents d LEFT JOIN agg a USING (doc_id)
)"""


def make_quality_classifier_oracle() -> str:
    return _classifier_scored_sql() + """
SELECT doc_id, n_tokens, score, (score >= 0.5) AS pred, weak,
       ((score >= 0.5) = weak) AS agree
FROM scored
ORDER BY doc_id
"""


def curation_active_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for a labeling budget: the 50 documents the
    trained quality classifier is LEAST sure about (smallest
    |score − 0.5|, doc_id tiebreak) — the standard active-learning
    selection that spends human labels where the model's decision
    boundary actually is, instead of on easy cases. Composes the SAME
    trained model (and the oracle the same retrained literals), so the
    driver-gated claim covers training, scoring, AND the margin
    ranking. Margin ranks on the 4dp-ROUNDED score (the score the gate
    exports), keeping the order identical across engines."""
    docs = table(prep(spark), sf_dir, "documents")
    w, b = train_quality_lr_driver(docs)
    scored = score_quality_lr(docs, w, b)
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            "score",
            F.round(F.abs(F.col("score") - F.lit(0.5)), 4).alias("margin"),
        )
        .orderBy(F.asc("margin"), F.asc("doc_id"))
        .limit(50)
    )


def make_active_learning_oracle() -> str:
    return _classifier_scored_sql() + """
SELECT doc_id, n_tokens, score,
       round(abs(score - 0.5), 4) AS margin
FROM scored
ORDER BY round(abs(score - 0.5), 4) ASC, doc_id ASC
LIMIT 50
"""


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source datasheet a corpus release publishes (Datasheets
    for Datasets / Dolma-style): doc and token counts, language-mix
    entropy, quality-gate pass rate (the classifier's stopword-ratio
    rule, so the datasheet and the trained gate agree on 'quality'),
    and exact-duplicate rate. ALL per-document signals are map-side
    column math (size/filter over the split token array — no explode),
    followed by two bounded groupBys (|sources| and |sources|×|langs|
    keys); the output is |sources| rows at any corpus scale."""
    from python_multiproc_bigdata_spark.functions.text import (
        WHITESPACE_RE,
        doc_fingerprint,
    )
    from python_multiproc_bigdata_spark.operators.classifier import (
        STOPWORD_RATIO_MIN,
        STOPWORDS,
    )

    d = table(prep(spark), sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), WHITESPACE_RE), lambda x: F.length(x) > 0
    )
    per_doc = d.select(
        "source",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
        doc_fingerprint("text").alias("fp"),
    )
    base = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.round(
            F.avg(
                F.when(
                    (F.col("n_tok") > 0)
                    & (
                        F.col("n_stop").cast("double") / F.col("n_tok")
                        >= STOPWORD_RATIO_MIN
                    ),
                    1.0,
                ).otherwise(0.0)
            ),
            4,
        ).alias("quality_pass_rate"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("exact_dup_rate"),
    )
    lang_counts = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    ent = (
        lang_counts.withColumn(
            "n", F.sum("c").over(Window.partitionBy("source"))
        )
        .groupBy("source")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") / F.col("n"))
                    * F.log(F.col("c") / F.col("n"))
                ),
                4,
            ).alias("lang_entropy")
        )
    )
    return base.join(ent, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "avg_tokens",
        "quality_pass_rate",
        "exact_dup_rate",
        "lang_entropy",
    ).orderBy("source")


SQL_DATASHEET = r"""
WITH per_doc AS (
  SELECT source, lang,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                         x -> length(x) > 0)) AS n_tok,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                         x -> length(x) > 0 AND x IN ('the', 'a'))) AS n_stop,
         md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp
  FROM documents
), base AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         round(avg(n_tok), 4) AS avg_tokens,
         round(avg(CASE WHEN n_tok > 0
                         AND CAST(n_stop AS DOUBLE) / n_tok >= 0.06
                        THEN 1.0 ELSE 0.0 END), 4) AS quality_pass_rate,
         round((count(*) - count(DISTINCT fp)) * 1.0 / count(*), 4)
           AS exact_dup_rate
  FROM per_doc GROUP BY source
), lc AS (
  SELECT source, lang, count(*) AS c FROM per_doc GROUP BY 1, 2
), ent AS (
  SELECT source,
         round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 4) AS lang_entropy
  FROM (SELECT source, lang, c, sum(c) OVER (PARTITION BY source) AS n FROM lc)
  GROUP BY source
)
SELECT b.source, b.n_docs, b.total_tokens, b.avg_tokens,
       b.quality_pass_rate, b.exact_dup_rate, e.lang_entropy
FROM base b JOIN ent e USING (source)
ORDER BY b.source
"""


def training_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (one excess-loss round): score
    every source by its token-weighted bigram-LM cross entropy, compute
    each source's EXCESS loss over the corpus mean, and reweight
    w_s ∝ share_s · exp(excess_s) — harder-than-average domains get
    upsampled, the published DoReMi direction (T=1). Composes the
    existing per-doc LM relation (curation_bigram_logprob), so the
    scoring tower stays independently oracle-checked; everything after
    it is a |sources|-row rollup.

    Determinism: source entropy is the n-weighted mean of the per-doc
    4dp-ROUNDED xents, itself rounded to 4dp, and the excess/weight
    arithmetic runs on those rounded values on both engines — the
    only cross-engine float risk left is exp()'s last ulp, absorbed by
    the final 4dp round."""
    from python_multiproc_bigdata_spark.operators.curation import (
        bigram_logprob_score,
    )

    d = table(prep(spark), sf_dir, "documents")
    perdoc = bigram_logprob_score(d)
    j = perdoc.join(d.select("doc_id", "source"), "doc_id")
    src = j.groupBy("source").agg(
        F.sum("n_bigrams").alias("n_bigrams"),
        F.round(
            F.sum(F.col("xent2_nats") * F.col("n_bigrams")) / F.sum("n_bigrams"),
            4,
        ).alias("xent_nats"),
    )
    tot = src.agg(
        F.sum("n_bigrams").alias("_tn"),
        F.round(
            F.sum(F.col("xent_nats") * F.col("n_bigrams")) / F.sum("n_bigrams"),
            4,
        ).alias("_mean_x"),
    )
    w = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_bigrams") / F.col("_tn"))
        .withColumn("excess_nats", F.round(F.col("xent_nats") - F.col("_mean_x"), 4))
        .withColumn("_raw", F.col("share") * F.exp(F.col("excess_nats")))
    )
    wsum = w.agg(F.sum("_raw").alias("_ws"))
    return (
        w.crossJoin(F.broadcast(wsum))
        .select(
            "source",
            "n_bigrams",
            "xent_nats",
            "excess_nats",
            F.round(F.col("_raw") / F.col("_ws"), 4).alias("weight"),
        )
        .orderBy("source")
    )


SQL_DOMAIN_REWEIGHT = (
    "WITH perdoc AS (\n" + SQL_BIGRAM_LOGPROB + "\n)"
    + r"""
, src AS (
  SELECT d.source, CAST(sum(p.n_bigrams) AS BIGINT) AS n_bigrams,
         round(sum(p.xent2_nats * p.n_bigrams) / sum(p.n_bigrams), 4)
           AS xent_nats
  FROM perdoc p JOIN documents d USING (doc_id)
  GROUP BY d.source
), tot AS (
  SELECT sum(n_bigrams) AS tn,
         round(sum(xent_nats * n_bigrams) / sum(n_bigrams), 4) AS mean_x
  FROM src
), w AS (
  SELECT s.source, s.n_bigrams, s.xent_nats,
         round(s.xent_nats - t.mean_x, 4) AS excess_nats,
         (s.n_bigrams * 1.0 / t.tn) * exp(round(s.xent_nats - t.mean_x, 4))
           AS raw
  FROM src s CROSS JOIN tot t
)
SELECT source, n_bigrams, xent_nats, excess_nats,
       round(raw / (SELECT sum(raw) FROM w), 4) AS weight
FROM w
ORDER BY source
"""
)


LINE_DEDUP_MAX_FREQ = 3  # C4's "discard lines occurring >= 3 times"


def curation_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style CORPUS-LEVEL line deduplication: any
    non-blank line occurring >= 3 times across the whole corpus is
    boilerplate (nav bars, footers, licenses) and is dropped from every
    document; the cleaned text is re-assembled in original line order.
    Blank/whitespace-only lines are dropped from the reconstruction too
    (documented — they carry no content and C4 strips them).

    Output: (doc_id, n_lines, n_dropped, cleaned_md5) — the md5 stands
    in for the cleaned text so the gate hash-checks the RECONSTRUCTION
    (order included) without shipping megabytes through the compare.
    Plan: posexplode lines (order rides along as data), one corpus-wide
    line-frequency groupBy (the only corpus-scale shuffle — the
    word-count shape), order-preserving re-assembly via
    sort_array(collect_list(struct(pos, line)))."""
    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    lines = d.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).filter(F.length(F.trim("line")) > 0)
    freq = lines.groupBy("line").agg(F.count(F.lit(1)).alias("n_occ"))
    marked = lines.join(freq, "line")
    stats = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("n_occ") >= LINE_DEDUP_MAX_FREQ, 1).otherwise(0)
        ).alias("n_dropped"),
    )
    kept = marked.filter(F.col("n_occ") < LINE_DEDUP_MAX_FREQ)
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("cleaned")
    )
    return (
        d.select("doc_id")
        .join(stats, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


SQL_LINE_DEDUP = r"""
WITH lines AS (
  SELECT doc_id, t.pos, t.line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
       unnest(list_transform(range(1, len(ls) + 1),
              i -> {'pos': i, 'line': ls[i]})) AS u(t)
  WHERE length(trim(t.line)) > 0
), freq AS (
  SELECT line, count(*) AS n_occ FROM lines GROUP BY line
), marked AS (
  SELECT l.doc_id, l.pos, l.line, f.n_occ FROM lines l JOIN freq f USING (line)
), stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN n_occ >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped
  FROM marked GROUP BY doc_id
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned
  FROM marked WHERE n_occ < 3 GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_lines, 0) AS n_lines,
       COALESCE(s.n_dropped, 0) AS n_dropped,
       md5(COALESCE(r.cleaned, '')) AS cleaned_md5
FROM documents d
LEFT JOIN stats s USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
ORDER BY d.doc_id
"""



def curation_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization for crawl dedup (r11) — the step BEFORE text
    dedup in a crawl pipeline (identical pages hide behind differently-
    written URLs): RFC 3986 syntax-based normalization implemented as
    pure JVM column expressions (operators/curation.py:normalize_url —
    case normalization, scheme default-port removal, §5.2.4
    dot-segment removal via an F.aggregate push/pop fold that stays in
    codegen, empty path → '/'), plus sorted query parameters and
    fragment drop (the conventional crawl-dedup extras). The synthetic
    URL corpus cycles mixed-case schemes/hosts, default and non-default
    ports, five path shapes including '.'/'..' segments and trailing
    dots, unsorted query strings, and fragments — every normalization
    rule is on the checked path — including percent-escapes (reserved
    %2f kept but uppercased, unreserved %7e/%41 decoded), §5.2.4
    empty-segment preservation ('/a//./b' → '/a//b'), and a '?' inside
    the fragment ('#x?fake=1') that must be dropped with the fragment,
    never parsed as a query. The oracle
    CASE-replays the expected output per residue class, so it shares NO
    normalization logic with the engine. Map-only; zero Python in the
    plan."""
    from python_multiproc_bigdata_spark.operators.curation import normalize_url

    d = table(prep(spark), sf_dir, "documents").select("doc_id")
    m = F.col("doc_id")
    url = F.concat(
        F.when(m % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Site"), (m % 7).cast("string"), F.lit(".ExAmple.COM"),
        F.when(m % 5 == 0, F.lit(":80"))
        .when(m % 5 == 1, F.lit(":443"))
        .when(m % 5 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(m % 6 == 0, F.lit(""))
        .when(m % 6 == 1, F.lit("/a/b"))
        .when(m % 6 == 2, F.lit("/a//./b"))
        .when(m % 6 == 3, F.lit("/a/b/../c"))
        .when(m % 6 == 4, F.lit("/a%2fb/%7euser/b%41d/"))
        .otherwise(F.lit("/x/./../y/.")),
        F.when(m % 4 == 1, F.lit("?b=2&a=1"))
        .when(m % 4 == 2, F.lit("?z=9"))
        .when(m % 4 == 3, F.lit("?b=2&a=1&c=3"))
        .otherwise(F.lit("")),
        F.when(m % 3 == 1, F.lit("#frag"))
        .when(m % 3 == 2, F.lit("#x?fake=1"))
        .otherwise(F.lit("")),
    )
    out = d.select("doc_id", url.alias("url"), normalize_url(url).alias("n"))
    return out.select(
        "doc_id", "url", F.col("n.norm_url").alias("norm_url"),
        F.col("n.host").alias("host"),
    )


# CASE-replay of the expected normalization per residue class — no
# shared logic with normalize_url (the engine must EARN each rule).
SQL_URL_NORMALIZE = """
SELECT doc_id,
  concat(
    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END,
    '://WWW.Site', CAST(doc_id % 7 AS VARCHAR), '.ExAmple.COM',
    CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
         WHEN 2 THEN ':8080' ELSE '' END,
    CASE doc_id % 6 WHEN 0 THEN '' WHEN 1 THEN '/a/b' WHEN 2 THEN '/a//./b'
         WHEN 3 THEN '/a/b/../c' WHEN 4 THEN '/a%2fb/%7euser/b%41d/'
         ELSE '/x/./../y/.' END,
    CASE doc_id % 4 WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?z=9'
         WHEN 3 THEN '?b=2&a=1&c=3' ELSE '' END,
    CASE doc_id % 3 WHEN 1 THEN '#frag' WHEN 2 THEN '#x?fake=1' ELSE '' END
  ) AS url,
  concat(
    CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END,
    '://www.site', CAST(doc_id % 7 AS VARCHAR), '.example.com',
    -- port survives only when non-default FOR the scheme
    CASE WHEN doc_id % 5 = 2 THEN ':8080'
         WHEN doc_id % 5 = 0 AND doc_id % 2 = 1 THEN ':80'
         WHEN doc_id % 5 = 1 AND doc_id % 2 = 0 THEN ':443'
         ELSE '' END,
    CASE doc_id % 6 WHEN 0 THEN '/' WHEN 1 THEN '/a/b' WHEN 2 THEN '/a//b'
         WHEN 3 THEN '/a/c' WHEN 4 THEN '/a%2Fb/~user/bAd/' ELSE '/y/' END,
    CASE doc_id % 4 WHEN 1 THEN '?a=1&b=2' WHEN 2 THEN '?z=9'
         WHEN 3 THEN '?a=1&b=2&c=3' ELSE '' END
  ) AS norm_url,
  concat('www.site', CAST(doc_id % 7 AS VARCHAR), '.example.com') AS host
FROM documents
"""



ROBOTS_G0 = """# fallback group only
User-agent: *
Disallow: /a
Allow: /a/b
"""

ROBOTS_G1 = """User-agent: pmb-bot
Disallow: /
Allow: /a

User-agent: *
Allow: /
"""

ROBOTS_G2 = """User-agent: foo-bot
User-agent: pmb-bot
Disallow: /a/b$
"""


def curation_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt admission gate (r11) — RFC 9309, the decision a
    crawler makes BEFORE a fetch ever reaches the WARC: per-host robots
    bodies are parsed in Arrow batches (operators/warc.py:parse_robots
    — comment stripping, consecutive User-agent lines sharing a group,
    exact-agent group preferred over '*', empty-Disallow = no rule),
    then every (host, path) URL row gets the RFC verdict JVM-side
    (operators/warc.py:robots_gate — broadcast rules join, longest
    pattern wins, allow wins ties, '$' end anchor, no-match = allow).
    The synth corpus exercises all three group-selection shapes (star
    fallback, specific-beats-star, a shared two-agent group) and both
    precedence rules. The oracle CASE-replays the expected verdict per
    residue class — no shared logic with the parser or matcher."""
    from python_multiproc_bigdata_spark.operators.warc import (
        robots_gate,
        robots_rules,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id")
    m = F.col("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("www.site"), (m % 7).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.when(m % 5 == 0, F.lit("/"))
        .when(m % 5 == 1, F.lit("/a/b"))
        .when(m % 5 == 2, F.lit("/a/c"))
        .when(m % 5 == 3, F.lit("/a/b/"))
        .otherwise(F.lit("/y/"))
        .alias("path"),
    )
    hid = F.col("hid")
    hosts = (
        d.select((m % 7).alias("hid"))
        .distinct()
        .select(
            F.concat(
                F.lit("www.site"), hid.cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.when(hid % 3 == 0, F.lit(ROBOTS_G0))
            .when(hid % 3 == 1, F.lit(ROBOTS_G1))
            .otherwise(F.lit(ROBOTS_G2))
            .alias("robots_txt"),
        )
    )
    rules = robots_rules(hosts, agent="pmb-bot")
    return robots_gate(urls, rules)


# Expected verdicts per (host-group, path) residue class, derived by
# hand from RFC 9309 precedence — shares nothing with the engine:
#   group 0 ('*': Disallow /a, Allow /a/b): only '/a/c' blocked
#   group 1 (specific: Disallow /, Allow /a): only '/a/...' allowed
#   group 2 (shared group: Disallow /a/b$): only exactly '/a/b' blocked
SQL_ROBOTS_GATE = """
SELECT doc_id,
  concat('www.site', CAST(doc_id % 7 AS VARCHAR), '.example.com') AS host,
  CASE doc_id % 5 WHEN 0 THEN '/' WHEN 1 THEN '/a/b' WHEN 2 THEN '/a/c'
       WHEN 3 THEN '/a/b/' ELSE '/y/' END AS path,
  CASE (doc_id % 7) % 3
    WHEN 0 THEN doc_id % 5 != 2
    WHEN 1 THEN doc_id % 5 IN (1, 2, 3)
    ELSE doc_id % 5 != 1
  END AS allowed
FROM documents
"""


REGISTRY = {
    "curation_line_dedup": QuerySpec(curation_line_dedup, SQL_LINE_DEDUP),
    "corpus_datasheet": QuerySpec(corpus_datasheet, SQL_DATASHEET),
    "training_domain_reweight": QuerySpec(
        training_domain_reweight, SQL_DOMAIN_REWEIGHT
    ),
    "curation_quality_classifier": QuerySpec(
        curation_quality_classifier, make_quality_classifier_oracle
    ),
    "curation_dup_ngram_fraction": QuerySpec(
        curation_dup_ngram_fraction, SQL_DUP_NGRAM
    ),
    "curation_gopher_gate": QuerySpec(curation_gopher_gate, SQL_GOPHER_GATE),
    "curation_filter_attrition": QuerySpec(
        curation_filter_attrition, SQL_FILTER_ATTRITION
    ),
    "curation_pii_redact": QuerySpec(curation_pii_redact, SQL_PII_REDACT),
    "basket_association_rules": QuerySpec(
        basket_association_rules, SQL_BASKET_RULES
    ),
    "curation_pagerank_quality": QuerySpec(curation_pagerank_quality, SQL_PAGERANK),
    "graph_triangle_copurchase": QuerySpec(graph_triangle_copurchase, SQL_TRIANGLES),
    "graph_community_labelprop": QuerySpec(graph_community_labelprop, SQL_LABELPROP),
    "graph_bfs_levels": QuerySpec(graph_bfs_levels, SQL_BFS_LEVELS),
    "graph_link_prediction": QuerySpec(graph_link_prediction, SQL_LINK_PREDICTION),
    "graph_kcore": QuerySpec(graph_kcore, SQL_KCORE),
    "corpus_version_diff": QuerySpec(corpus_version_diff, SQL_VERSION_DIFF),
    "dedup_keep_best_per_cluster": QuerySpec(
        dedup_keep_best_per_cluster, SQL_KEEP_BEST
    ),
    "curation_badwords_gate": QuerySpec(curation_badwords_gate, SQL_BADWORDS_GATE),
    "dedup_cluster_size_report": QuerySpec(dedup_cluster_size_report, SQL_CLUSTER_SIZES),
    "curation_active_learning": QuerySpec(curation_active_learning, make_active_learning_oracle),
    "curation_repetition_signals": QuerySpec(
        curation_repetition_signals, SQL_REPETITION
    ),
    "curation_unigram_logprob": QuerySpec(
        curation_unigram_logprob, SQL_UNIGRAM_LOGPROB
    ),
    "curation_ccnet_tiers": QuerySpec(curation_ccnet_tiers, SQL_CCNET_TIERS),
    "curation_ccnet_tiers_sampled": QuerySpec(
        curation_ccnet_tiers_sampled, SQL_CCNET_TIERS_SAMPLED
    ),
    "curation_bigram_logprob": QuerySpec(
        curation_bigram_logprob, SQL_BIGRAM_LOGPROB
    ),
    "curation_boilerplate_ngrams": QuerySpec(
        curation_boilerplate_ngrams, SQL_BOILERPLATE
    ),
    "decontaminate_train_eval": QuerySpec(
        decontaminate_train_eval, SQL_DECONTAMINATE
    ),
    "decontaminate_fraction": QuerySpec(
        decontaminate_fraction, SQL_DECONTAMINATE_FRACTION
    ),
    "dedup_components_canonical": QuerySpec(
        dedup_components_canonical, SQL_COMPONENTS
    ),
    "split_leakage_safe": QuerySpec(split_leakage_safe, SQL_SPLIT_LEAKAGE_SAFE),
    "curation_url_normalize": QuerySpec(curation_url_normalize, SQL_URL_NORMALIZE),
    "curation_robots_gate": QuerySpec(curation_robots_gate, SQL_ROBOTS_GATE),
}
