"""Dedup query family (beyond-reference M4) over `documents`, each with a
DuckDB oracle that reproduces the same md5-based hashing bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import doc_fingerprint
from python_multiproc_bigdata_spark.operators.dedup import (
    MINHASH_K,
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    semantic_dedup,
    simhash16,
    winnow_pairs,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table

# DuckDB twin of operators/dedup.py:word_shingles (3-gram, distinct per doc).
SQL_SHINGLES_CTE = r"""
WITH sh AS (
  SELECT DISTINCT id, sh FROM (
    SELECT doc_id AS id,
           unnest(list_transform(range(greatest(len(toks) - 2, 0)),
                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0) AS toks
          FROM documents))
), sizes AS (
  SELECT id, count(*) AS n FROM sh GROUP BY id
)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: corpus size, distinct fingerprints, dup groups.
    (One row — the harness corpus has no exact dupes; the counts prove it.)"""
    d = table(prep(spark), sf_dir, "documents")
    fp = d.select(doc_fingerprint("text").alias("fp"))
    return fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_redundant"),
    )


SQL_EXACT = r"""
SELECT count(*) AS n_docs,
       count(DISTINCT fp) AS n_distinct,
       count(*) - count(DISTINCT fp) AS n_redundant
FROM (SELECT md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp FROM documents)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.8)


SQL_NGRAM_JACCARD = SQL_SHINGLES_CTE + r"""
, inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a AS doc_a, id_b AS doc_b,
       round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment
    C(A→B) = |A∩B| / |A| ≥ 0.9 — catches "doc A is a quote/excerpt of
    doc B", which symmetric Jaccard misses whenever the containing doc
    is much longer (J = |A|/|B| stays low while C(A→B) = 1). The output
    is DIRECTED: (contained, container, containment, jaccard) — both
    directions of a pair can appear when sizes are close.

    Plan: the same shared-shingle intersection groupBy as the Jaccard
    family (one shuffle), sizes broadcast back, the per-direction
    division on the INTEGER micro scale. At 100 TB the guardrail is the
    same posting-list cap as ngram_jaccard_capped — containment
    inherits it unchanged."""
    from python_multiproc_bigdata_spark.operators.dedup import word_shingles

    d = table(prep(spark), sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", 3)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    joined = inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    c_micro = (
        F.round(F.col("i").cast("double") / F.col("na").cast("double") * F.lit(1000000.0))
        .cast("bigint")
    )
    return (
        joined.select(
            F.col("id_a").alias("contained"),
            F.col("id_b").alias("container"),
            c_micro.alias("c_micro"),
            "i",
            "na",
            "nb",
        )
        .filter(F.col("c_micro") >= 900000)
        .select(
            "contained",
            "container",
            F.round(F.col("c_micro") / F.lit(1000000.0), 6).alias("containment"),
            F.round(
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


SQL_CONTAINMENT = SQL_SHINGLES_CTE + r"""
, inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id != b.id
  GROUP BY 1, 2
), scored AS (
  SELECT id_a AS contained, id_b AS container, i, sa.n AS na, sb.n AS nb,
         CAST(round(CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE) * 1000000.0)
              AS BIGINT) AS c_micro
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
)
SELECT contained, container,
       round(c_micro / 1000000.0, 6) AS containment,
       round(CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE), 6) AS jaccard
FROM scored WHERE c_micro >= 900000
"""


def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.8 pairs via AllPairs/PPJoin prefix filtering —
    candidates come only from each doc's rarest |d|-ceil(0.8|d|)+1
    shingles, so boilerplate posting lists never explode and NOTHING is
    lost (same output as dedup_ngram_jaccard; the oracle IS the plain
    all-pairs SQL, making the driver check an algebraic-equivalence
    proof). See operators/dedup.py:prefix_filter_jaccard_pairs."""
    d = table(prep(spark), sf_dir, "documents")
    return prefix_filter_jaccard_pairs(d, threshold_num=4, threshold_den=5)


def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (3-gram Jaccard
    >= 0.8, the prefix-filter path) rolled up by unordered source pair —
    the curation report that tells you WHICH feeds are mirroring each
    other before you pay for corpus-wide dedup. Matrix size is
    |sources|^2, so the rollup after pair generation is trivial at any
    scale."""
    d = table(prep(spark), sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(d, threshold_num=4, threshold_den=5)
    src = d.select("doc_id", "source")
    return (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")),
            "doc_b",
        )
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


SQL_SOURCE_OVERLAP = SQL_SHINGLES_CTE + r"""
, inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_dup_pairs
FROM pairs
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
GROUP BY 1, 2
"""


def dedup_incremental_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot-over-snapshot ingest gate: classify every document of
    the incoming batch (source 'src0') against the ALREADY-ACCEPTED
    corpus (every other source) as exact_dup (fingerprint seen before),
    near_dup (3-gram Jaccard >= 0.8 with an accepted doc), or novel —
    what Dolma/RedPajama-style pipelines run between crawl snapshots so
    retrained models never re-ingest yesterday's corpus.

    Plan: the exact arm is a fingerprint left-semi join (corpus side is
    a distinct hash set — at 100 TB this is the bloom/bucketed-join
    shape); the near arm (r13) uses ASYMMETRIC prefix-filter candidate
    generation (operators/dedup.py:incremental_prefix_filter_pairs):
    the frequency model and prefixes are still built over the full
    union (the lossless guarantee is unchanged), but posting buckets
    emit only incoming x accepted combinations — the candidate space is
    incoming x all instead of the r12 form's all x all followed by a
    boundary-crossing filter, and the two pair-scale source joins are
    gone (the slice flag rides the shingle id struct).
    Verdict precedence exact > near > novel."""
    from python_multiproc_bigdata_spark.functions.text import doc_fingerprint
    from python_multiproc_bigdata_spark.operators.dedup import (
        incremental_prefix_filter_pairs,
    )

    d = table(prep(spark), sf_dir, "documents")
    incoming = d.filter(F.col("source") == "src0")
    accepted = d.filter(F.col("source") != "src0")
    exact_ids = (
        incoming.select("doc_id", doc_fingerprint("text").alias("fp"))
        .join(
            accepted.select(doc_fingerprint("text").alias("fp")).distinct(),
            "fp",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("_exact", F.lit(1))
    )
    pairs = incremental_prefix_filter_pairs(
        d, F.col("source") == "src0", threshold_num=4, threshold_den=5
    )
    # doc_a is the incoming side by construction — no source joins, no
    # crossing filter.
    crossing = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("_near", F.lit(1))
    )
    return (
        incoming.select("doc_id")
        .join(exact_ids, "doc_id", "left")
        .join(crossing, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact") == 1, "exact_dup")
            .when(F.col("_near") == 1, "near_dup")
            .otherwise("novel")
            .alias("verdict"),
        )
    )


SQL_INCREMENTAL_NOVELTY = SQL_SHINGLES_CTE + r"""
, inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
), fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp
  FROM documents
), exact_ids AS (
  SELECT DISTINCT i.doc_id
  FROM fp i JOIN fp c ON i.fp = c.fp
  WHERE i.source = 'src0' AND c.source != 'src0'
), near_ids AS (
  SELECT DISTINCT CASE WHEN da.source = 'src0' THEN id_a ELSE id_b END AS doc_id
  FROM pairs
  JOIN documents da ON da.doc_id = id_a
  JOIN documents db ON db.doc_id = id_b
  WHERE (da.source = 'src0') != (db.source = 'src0')
)
SELECT d.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS verdict
FROM documents d
LEFT JOIN exact_ids e ON e.doc_id = d.doc_id
LEFT JOIN near_ids n ON n.doc_id = d.doc_id
WHERE d.source = 'src0'
"""


def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB guardrail path of ngram_jaccard_pairs: posting lists for
    shingles shared by more than `max_shingle_freq` docs are dropped BEFORE
    pair generation (a boilerplate shingle shared by f docs contributes
    f·(f−1)/2 pairs — quadratic blowup with ~no Jaccard signal). cap=4
    actually bites on this corpus (151 shingles with f in 5..7 at sf0.01
    are excluded), so this exercises the frequency filter, not a no-op."""
    d = table(prep(spark), sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.8, max_shingle_freq=4)


# Same cap applied oracle-side: shingle corpus frequency ≤ 4 before pairing.
SQL_NGRAM_JACCARD_CAPPED = SQL_SHINGLES_CTE + r"""
, freq AS (
  SELECT sh, count(*) AS f FROM sh GROUP BY sh
), shc AS (
  SELECT s.id, s.sh FROM sh s JOIN freq USING (sh) WHERE f <= 4
), csizes AS (
  SELECT id, count(*) AS n FROM shc GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM shc a JOIN shc b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a AS doc_a, id_b AS doc_b,
       round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN csizes sa ON sa.id = id_a
JOIN csizes sb ON sb.id = id_b
WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
"""


def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return minhash_signatures(d).withColumnRenamed("id", "doc_id")


# DuckDB twin of operators/dedup.py:minhash_exprs — 8-hex-char substrings
# of md5(sh) and md5('x'||sh).
_SIG_COLS = ", ".join(
    "min(substr(md5({src}), {start}, 8)) AS h{i}".format(
        src="sh" if i < 4 else "'x' || sh", start=(i % 4) * 8 + 1, i=i
    )
    for i in range(MINHASH_K)
)
SQL_MINHASH_SIG = SQL_SHINGLES_CTE + f"""
SELECT id AS doc_id, {_SIG_COLS} FROM sh GROUP BY id
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.8)


def dedup_minhash_lsh_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME LSH pipeline served from a MATERIALIZED bucketed
    signature table (operators/dedup.py:materialize_signatures — the
    'one write, N reads' deployment shape SCALE.md prescribes for
    repeated dedup runs at 100 TB): signatures are written bucketed on
    id, and both candidate-verification reads join them with no
    Exchange on the signature side (plan pinned in tests/
    test_bucketing.py). Shares the one-shot query's oracle, so the
    driver check is a two-implementations-one-oracle equivalence proof
    that materialization changes the PLAN, never the answer."""
    from python_multiproc_bigdata_spark.operators.dedup import (
        lsh_pairs_from_signatures,
        materialize_signatures,
    )
    from python_multiproc_bigdata_spark.registry.common import fixture_root

    d = table(prep(spark), sf_dir, "documents")
    tmp = fixture_root("sig", sf_dir)
    sig = materialize_signatures(
        d, table="pmb_sig_registry", path=f"{tmp}/sig", id_col="doc_id"
    )
    return lsh_pairs_from_signatures(sig, threshold=0.8)


def eval_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration eval for the MinHash estimator — the recall
    evals' dedup-side sibling: on every banded-LSH candidate pair, the
    SIGNATURE estimate of Jaccard (matching minhash components / k,
    granularity 1/8 at k=8) next to the exact set Jaccard and the
    absolute error. This is the number that justifies trusting k=8
    signatures to rank near-dups at 100 TB — the estimator's bias on
    REAL candidate pairs (not the textbook uniform bound) becomes a
    value-checked row instead of folklore. Candidates and both lookups
    are the shared LSH machinery (operators/dedup.py); the exact side
    is a per-pair array_intersect on the already-collected shingle
    sets, never a second corpus shuffle."""
    from python_multiproc_bigdata_spark.operators.dedup import (
        MINHASH_K,
        _banded_candidates,
        _signature_relation,
    )

    d = table(prep(spark), sf_dir, "documents")
    sig = _signature_relation(d, "doc_id", "text", 3).localCheckpoint(eager=True)
    cand = _banded_candidates(sig)
    a = sig.select(
        F.col("id").alias("id_a"),
        F.col("shs").alias("shs_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_K)],
    )
    b = sig.select(
        F.col("id").alias("id_b"),
        F.col("shs").alias("shs_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_K)],
    )
    m = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    union = F.size("shs_a") + F.size("shs_b") - inter
    est = F.round(m / float(MINHASH_K), 4)
    jac = F.round(inter / union, 4)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            est.alias("est_jaccard"),
            jac.alias("jaccard"),
            F.round(F.abs(est - jac), 4).alias("abs_err"),
        )
    )


_MATCH_SQL = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_K)
)


_BANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT id, {b} AS band, h{2*b} || '|' || h{2*b+1} AS key FROM sig"
    for b in range(MINHASH_K // 2)
)
def _minhash_pairs_sql(threshold: float) -> str:
    """MinHash-LSH near-dup pairs SQL at a given Jaccard threshold
    (doc_a, doc_b, jaccard) — shared by the 0.8 registry query and the
    0.5-candidate edit-distance verify below."""
    return SQL_SHINGLES_CTE + f"""
, sig AS (SELECT id, {_SIG_COLS} FROM sh GROUP BY id),
bands AS ({_BANDS_SQL}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.key = r.key AND l.id < r.id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT id_a AS doc_a, id_b AS doc_b,
       round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= {threshold}
"""


SQL_MINHASH_LSH = _minhash_pairs_sql(0.8)


# Calibration oracle: same shingle/signature/band chain; candidates that
# share a band but ZERO shingles (minhash collisions across different
# shingles) must still appear with jaccard 0 — LEFT JOIN the
# intersection, COALESCE to 0 (Spark computes the intersection inline
# via array_intersect, so it never drops them).
SQL_MINHASH_CALIBRATION = SQL_SHINGLES_CTE + f"""
, sig AS (SELECT id, {_SIG_COLS} FROM sh GROUP BY id),
bands AS ({_BANDS_SQL}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.key = r.key AND l.id < r.id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT c.id_a AS doc_a, c.id_b AS doc_b,
       round(({_MATCH_SQL}) / {MINHASH_K}.0, 4) AS est_jaccard,
       round(COALESCE(i.i, 0) * 1.0
             / (sa.n + sb.n - COALESCE(i.i, 0)), 4) AS jaccard,
       round(abs(round(({_MATCH_SQL}) / {MINHASH_K}.0, 4)
                 - round(COALESCE(i.i, 0) * 1.0
                         / (sa.n + sb.n - COALESCE(i.i, 0)), 4)), 4) AS abs_err
FROM cand c
JOIN sig a ON a.id = c.id_a
JOIN sig b ON b.id = c.id_b
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.id = c.id_a
JOIN sizes sb ON sb.id = c.id_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return simhash16(d).withColumnRenamed("id", "doc_id")


_VOTES = ", ".join(
    "sum(CASE WHEN substr(h, {j1}, 1) IN ('8','9','a','b','c','d','e','f') "
    "THEN 1 ELSE -1 END) AS v{j}".format(j1=j + 1, j=j)
    for j in range(16)
)
_BITS = " || ".join(f"(CASE WHEN v{j} >= 0 THEN '1' ELSE '0' END)" for j in range(16))
SQL_SIMHASH = rf"""
WITH toks AS (
  SELECT doc_id AS id, md5(w) AS h FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> length(x) > 0)) AS w
    FROM documents)
), votes AS (
  SELECT id, {_VOTES} FROM toks GROUP BY id
)
SELECT id AS doc_id, {_BITS} AS simhash FROM votes
"""


def dedup_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER-style fuzzy dedup, LSH-banded blocking: candidates from the
    MinHash band join at Jaccard ≥ 0.5, verified with Levenshtein ≤ 20
    over a 64-char prefix (JVM-side DP; DuckDB's levenshtein replays it
    exactly).

    Why banding and not length blocking: on a length-homogeneous corpus
    the (lang, length-bucket) key degenerates into a handful of
    mega-blocks whose within-block pair count is quadratic — measured
    28.8 s at just 5 000 docs (sf0.1) vs 1.5 s for this form. Banded
    candidates stay bounded by band selectivity regardless of the
    length distribution, which is the property that survives 100 TB.
    The pure length-blocked operator
    (operators/dedup.py:blocked_edit_distance_pairs) remains for
    corpora where length actually discriminates."""
    d = table(prep(spark), sf_dir, "documents")
    cand = minhash_lsh_pairs(d, threshold=0.5)
    px = d.select("doc_id", F.substring("text", 1, 64).alias("px"))
    return (
        cand.join(
            px.select(F.col("doc_id").alias("doc_a"), F.col("px").alias("pa")), "doc_a"
        )
        .join(px.select(F.col("doc_id").alias("doc_b"), F.col("px").alias("pb")), "doc_b")
        .withColumn("dist", F.levenshtein("pa", "pb").cast("long"))
        .filter(F.col("dist") <= 20)
        .select("doc_a", "doc_b", "dist")
        .orderBy("doc_a", "doc_b")
    )


SQL_EDIT_DISTANCE = f"""
SELECT c.doc_a, c.doc_b,
       levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64)) AS dist
FROM ({_minhash_pairs_sql(0.5)}) c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
WHERE levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64)) <= 20
ORDER BY c.doc_a, c.doc_b
"""


def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprint overlap (operators/dedup.py:
    winnow_pairs): char-8-gram md5 hashes, window-4 minima, pairs sharing
    containment >= 0.5 after the hot-fingerprint cap (f <= 100).
    Substring-level containment detection — catches shared boilerplate /
    quotations that whole-doc and bag-of-shingles dedup both miss.
    Map-side gram hashing; the per-doc window shuffle is bounded by doc
    length; pairs via one posting-list aggregation."""
    d = table(prep(spark), sf_dir, "documents")
    return winnow_pairs(
        d, id_col="doc_id", text_col="text", k=8, w=4,
        min_containment=0.5, max_fp_freq=100,
    ).orderBy("doc_a", "doc_b")


# Replays the identical gram hashing (md5 16-hex prefix, lexicographic
# window min) so values match bit-for-bit.
SQL_WINNOW_PAIRS = r"""
WITH d AS (
  SELECT doc_id AS id,
         regexp_replace(lower(trim(text)), '[ \t\n\r\f\x0B]+', ' ', 'g') AS norm
  FROM documents
), dd AS (
  SELECT id, norm, length(norm) - 7 AS ng FROM d WHERE length(norm) >= 11
), g AS (
  SELECT id, ng, unnest(range(1, ng + 1)) AS pos, norm FROM dd
), fp AS (
  SELECT id, ng, pos, substr(md5(substr(norm, pos, 8)), 1, 16) AS h FROM g
), sel AS (
  SELECT DISTINCT id, wmin AS h FROM (
    SELECT id, ng, pos,
           min(h) OVER (PARTITION BY id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
    FROM fp)
  WHERE pos <= ng - 3
), sizes AS (
  SELECT id, count(*) AS sz FROM sel GROUP BY id
), freq AS (
  SELECT h, count(*) AS f FROM sel GROUP BY h
), kept AS (
  SELECT s.id, s.h FROM sel s JOIN freq USING (h) WHERE f <= 100
), pairs AS (
  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS n_shared
  FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       round(p.n_shared * 1.0 / least(sa.sz, sb.sz), 4) AS containment
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.id
JOIN sizes sb ON p.doc_b = sb.id
WHERE round(p.n_shared * 1.0 / least(sa.sz, sb.sz), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


def eval_dedup_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality eval: precision/recall of the raw MinHash-LSH
    banded candidate generator against EXACT Jaccard >= 0.5 ground
    truth (prefix-filter all-pairs — lossless, so the truth side is
    itself exact at any scale). This is the measurement behind every
    'our dedup catches X% of near-dups' claim: banding at 4 bands x 2
    rows has P[candidate] = 1-(1-j^2)^4, so borderline-0.5 pairs are
    expected to be missed at a known rate — the eval makes that rate a
    pinned, regression-checked number instead of folklore.

    Plan: two bounded pair relations (prefix-filter truth, banded
    candidates) joined on the pair key, then three 1-row counts
    crossJoin-broadcast together — nothing after pair generation
    exceeds |pairs|."""
    from python_multiproc_bigdata_spark.operators.dedup import word_shingles

    d = table(prep(spark), sf_dir, "documents")
    # r12: BOTH towers consume the same (id, sh) shingle stream — share
    # one persisted relation so the corpus tokenizes/shingles once
    # instead of once per tower (guide §1.2); pair generation and
    # verification below are unchanged.
    sh = word_shingles(d, "doc_id", "text", 3).persist()
    truth = prefix_filter_jaccard_pairs(
        d, threshold_num=1, threshold_den=2, shingles=sh
    ).select("doc_a", "doc_b")
    cand = lsh_candidate_pairs(d, shingles=sh)
    # r12: ONE full-outer join + ONE aggregate replaces the r8 shape
    # (three aggregate subtrees + two eager checkpoints). All three
    # counts fall out of the joined relation — n_cand = candidate-side
    # rows, n_true = truth-side rows, n_hit = rows present on both — so
    # each pair tower is evaluated exactly once WITHOUT materialization
    # jobs (the checkpoints existed only because the towers fed two
    # consumers each; now they feed one). Counts are identical: top-pair
    # relations are unique per (doc_a, doc_b) on both sides.
    m = cand.withColumn("_c", F.lit(1)).join(
        truth.withColumn("_t", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return m.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(
            F.sum(F.when(F.col("_c").isNotNull() & F.col("_t").isNotNull(), 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_hit"),
    ).select(
        "n_true",
        "n_cand",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_cand"), 4).alias("precision"),
        F.round(F.col("n_hit") / F.col("n_true"), 4).alias("recall"),
    )


SQL_EVAL_DEDUP_PR = SQL_SHINGLES_CTE + f"""
, sig AS (SELECT id, {{sig_cols}} FROM sh GROUP BY id),
bands AS ({{bands_sql}}),
cand AS (
  SELECT DISTINCT l.id AS doc_a, r.id AS doc_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.key = r.key AND l.id < r.id
),
truth AS (
  SELECT x.id_a AS doc_a, x.id_b AS doc_b
  FROM (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY 1, 2) x
  JOIN sizes sa ON sa.id = x.id_a
  JOIN sizes sb ON sb.id = x.id_b
  WHERE round(x.i * 1.0 / (sa.n + sb.n - x.i), 4) >= 0.5
),
hit AS (SELECT count(*) AS n_hit FROM cand JOIN truth USING (doc_a, doc_b)),
nt AS (SELECT count(*) AS n_true FROM truth),
nc AS (SELECT count(*) AS n_cand FROM cand)
SELECT CAST(n_true AS BIGINT) AS n_true, CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(n_hit * 1.0 / n_cand, 4) AS precision,
       round(n_hit * 1.0 / n_true, 4) AS recall
FROM nt CROSS JOIN nc CROSS JOIN hit
""".format(sig_cols=_SIG_COLS, bands_sql=_BANDS_SQL)


SEMDEDUP_CFG = dict(n_lists=16, max_iter=3, train_sample=4096, threshold=0.4)


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup — embedding-space semantic deduplication
    (operators/dedup.py:semantic_dedup): spherical-k-means clusters
    bound the pair search, keep-first within cluster at cosine >= 0.4
    (the sim_neardup threshold, so the two dedup views agree on what
    'near' means). Deterministic trainer → the oracle retrains the
    identical 16 centroids (shared _centroid_values_literal) and
    replays assignment, within-cluster pair scoring, and the
    keep-first rule."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        train_spherical_kmeans_driver,
    )

    spark = prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    cfg = SEMDEDUP_CFG
    cents = train_spherical_kmeans_driver(
        emb,
        n_lists=cfg["n_lists"],
        max_iter=cfg["max_iter"],
        sample_size=cfg["train_sample"],
    )
    return semantic_dedup(emb, cents, threshold=cfg["threshold"])


def make_semantic_dedup_oracle() -> str:
    """Centroid-literal assignment (the make_ivf_kmeans_oracle CTEs) +
    within-cluster lower-id pair check."""
    from python_multiproc_bigdata_spark.registry.similarity import (
        _centroid_values_literal,
    )

    cfg = SEMDEDUP_CFG
    centroid_values = _centroid_values_literal(
        n_lists=cfg["n_lists"],
        max_iter=cfg["max_iter"],
        sample_size=cfg["train_sample"],
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
), cents(cid, c) AS (
  VALUES {centroid_values}
), cn AS (
  SELECT vec_id, CASE WHEN nrm > 0 THEN list_transform(e, x -> x / nrm)
                      ELSE e END AS u
  FROM emb
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT cn.vec_id, cents.cid,
           row_number() OVER (PARTITION BY cn.vec_id
                              ORDER BY list_dot_product(cn.u, cents.c) DESC,
                                       cents.cid ASC) AS ar
    FROM cn CROSS JOIN cents) WHERE ar = 1
), withv AS (
  SELECT a.vec_id, a.cid, e.e, e.nrm
  FROM assign a JOIN emb e ON e.vec_id = a.vec_id
), dropped AS (
  SELECT DISTINCT a.vec_id
  FROM withv a JOIN withv b ON a.cid = b.cid AND b.vec_id < a.vec_id
  WHERE round(CASE WHEN a.nrm > 0 AND b.nrm > 0
              THEN list_dot_product(a.e, b.e) / (a.nrm * b.nrm)
              ELSE 0.0 END, 4) >= {cfg["threshold"]!r}
)
SELECT s.vec_id, s.cid, (d.vec_id IS NULL) AS kept
FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
ORDER BY s.vec_id
"""


CDC_WINDOW = 8  # rolling-window width (chars)
CDC_ANCHOR_HEX = "0"  # anchor where md5(window) starts with this → ~1/16 rate


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync family): chunk
    boundaries are set by CONTENT (positions whose 8-char window hashes
    into the anchor class, ~1/16 of positions), not by offset — so an
    insertion early in a document shifts only the chunk it lands in,
    and identical passages chunk identically in every document. The
    storage-dedup primitive under every chunk store.

    Per doc: (doc_id, n_chunks, n_shared_chunks, shared_frac) where a
    chunk is 'shared' if its md5 appears in ≥2 distinct docs. Pure
    relational: one position explode for anchor detection (O(chars),
    map-side), per-doc boundary array assembly (sort_array over ≤
    chars/16 anchors), chunk hashing via a transform HOF, one
    chunk-hash groupBy. Min/max chunk-size gating (real FastCDC) is a
    filter at the anchor stage — omitted here to keep the oracle
    replay 1:1. DuckDB replays every stage (1-based substr on both
    engines)."""
    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    pos = d.select(
        "doc_id",
        F.col("text"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("text") - (CDC_WINDOW - 1), F.lit(1)),
            )
        ).alias("p"),
    )
    anchors = pos.filter(
        F.substring(F.md5(F.substring(F.col("text"), F.col("p"), CDC_WINDOW)), 1, 1)
        == CDC_ANCHOR_HEX
    ).filter(F.col("p") > 1)
    bounds = anchors.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("p")).alias("cuts")
    )
    withb = (
        d.join(bounds, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.concat(
                F.array(F.lit(1)),
                F.coalesce("cuts", F.array()),
                F.array(F.length("text") + 1),
            ).alias("b"),
        )
    )
    chunks = withb.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("b") - 1),
                lambda i: F.md5(
                    F.substring(
                        F.col("text"),
                        F.element_at(F.col("b"), i),
                        F.element_at(F.col("b"), i + 1)
                        - F.element_at(F.col("b"), i),
                    )
                ),
            )
        ).alias("ch"),
    )
    docfreq = chunks.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("df")
    )
    per_doc = (
        chunks.join(docfreq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias(
                "n_shared_chunks"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_shared_chunks",
        F.round(F.col("n_shared_chunks") / F.col("n_chunks"), 4).alias(
            "shared_frac"
        ),
    ).orderBy("doc_id")


SQL_CDC_CHUNKS = r"""
WITH d AS (
  SELECT doc_id, text FROM documents
), anchors AS (
  SELECT doc_id, list_sort(list_filter(
           list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                          p -> CASE WHEN substr(md5(substr(text, p, 8)), 1, 1) = '0'
                                     AND p > 1
                               THEN p ELSE NULL END),
           x -> x IS NOT NULL)) AS cuts
  FROM d
), withb AS (
  SELECT d.doc_id, d.text,
         list_concat(list_concat([1], a.cuts), [length(d.text) + 1]) AS b
  FROM d JOIN anchors a USING (doc_id)
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(b)),
                i -> md5(substr(text, b[i], b[i+1] - b[i])))) AS ch
  FROM withb
), docfreq AS (
  SELECT ch, count(DISTINCT doc_id) AS df FROM chunks GROUP BY ch
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       round(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS shared_frac
FROM chunks c JOIN docfreq f USING (ch)
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (Lee et al. window-granular semantics):
    maximal runs of 8-token windows whose fingerprints occur in ≥2
    distinct documents — the spans a trainer cuts before packing. One
    algebraic fingerprint groupBy + a semi-join of flagged positions +
    a doc-partitioned island merge; windowing itself is map-only."""
    from python_multiproc_bigdata_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    d = table(prep(spark), sf_dir, "documents")
    return duplicated_substring_spans(d, "doc_id", "text", window_tokens=8)


SQL_SUBSTRING_SPANS = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), pos AS (
  SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS p
  FROM base WHERE len(toks) >= 8
), w AS (
  SELECT doc_id, p,
         md5(array_to_string(list_slice(toks, p + 1, p + 8), ' ')) AS fp
  FROM pos
), dup AS (
  SELECT fp FROM w GROUP BY fp HAVING min(doc_id) <> max(doc_id)
), flagged AS (
  SELECT doc_id, p FROM w WHERE fp IN (SELECT fp FROM dup)
), isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM flagged
)
SELECT doc_id,
       CAST(min(p) AS BIGINT) AS span_start,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(max(p) - min(p) + 8 AS BIGINT) AS span_len_tokens
FROM isl
GROUP BY doc_id, g
"""


REGISTRY = {
    "dedup_substring_spans": QuerySpec(dedup_substring_spans, SQL_SUBSTRING_SPANS),
    "dedup_cdc_chunks": QuerySpec(dedup_cdc_chunks, SQL_CDC_CHUNKS),
    "dedup_semantic": QuerySpec(dedup_semantic, make_semantic_dedup_oracle),
    "eval_dedup_pr": QuerySpec(eval_dedup_pr, SQL_EVAL_DEDUP_PR),
    "dedup_exact": QuerySpec(dedup_exact, SQL_EXACT),
    "dedup_edit_distance_blocked": QuerySpec(
        dedup_edit_distance_blocked, SQL_EDIT_DISTANCE
    ),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, SQL_NGRAM_JACCARD),
    "dedup_containment": QuerySpec(dedup_containment, SQL_CONTAINMENT),
    "dedup_prefix_filter_jaccard": QuerySpec(
        dedup_prefix_filter_jaccard, SQL_NGRAM_JACCARD
    ),
    "dedup_source_overlap": QuerySpec(dedup_source_overlap, SQL_SOURCE_OVERLAP),
    "dedup_incremental_novelty": QuerySpec(
        dedup_incremental_novelty, SQL_INCREMENTAL_NOVELTY
    ),
    "dedup_ngram_jaccard_capped": QuerySpec(
        dedup_ngram_jaccard_capped, SQL_NGRAM_JACCARD_CAPPED
    ),
    "dedup_winnow_pairs": QuerySpec(dedup_winnow_pairs, SQL_WINNOW_PAIRS),
    "dedup_minhash_signatures": QuerySpec(dedup_minhash_signatures, SQL_MINHASH_SIG),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, SQL_MINHASH_LSH),
    "eval_minhash_calibration": QuerySpec(
        eval_minhash_calibration, SQL_MINHASH_CALIBRATION
    ),
    "dedup_minhash_lsh_materialized": QuerySpec(
        dedup_minhash_lsh_materialized, SQL_MINHASH_LSH
    ),
    "dedup_simhash": QuerySpec(dedup_simhash, SQL_SIMHASH),
}
