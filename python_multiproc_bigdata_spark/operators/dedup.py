"""Deduplication operators (beyond-reference, north-star M4): exact,
n-gram Jaccard, MinHash+LSH, SimHash — the scoped-distinct generalization
of the reference's UniqueFilterTransformer (SURVEY §2.4 A3) to corpus-level
near-duplicate detection.

Engine-portability note: every hash here is md5-based (not Spark's
xxhash/murmur) so the DuckDB oracle can reproduce values bit-for-bit.
MinHash uses the *lexicographic min of seeded md5 hex digests* — a valid
minwise scheme (P[min equal] = Jaccard) that needs no integer conversion.

Scale notes (100 TB):
- shingling/minhash/simhash are map-side only (per-doc expressions or a
  single groupBy doc_id with algebraic aggregates).
- candidate generation joins on (band, key) — selectivity = Jaccard^rows
  per band, so buckets stay tiny when the corpus isn't mostly dupes;
  verification touches candidates only, never the full pair space.
- exact jaccard-all-pairs (ngram_jaccard_pairs) shuffles on shingle —
  use only when shingle frequencies are bounded (salt hot shingles or cap
  with a frequency filter at larger scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE, doc_fingerprint
from python_multiproc_bigdata_spark.operators.transforms import fan_out_scan

MINHASH_K = 8  # k hashes → 4 bands of 2
HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")  # high bit of a nibble


def minhash_exprs(sh_col: str = "sh") -> list:
    """The k=8 minwise hash functions: 8-hex-char (32-bit) substrings of
    two md5 digests (md5(sh), md5('x'‖sh)) — 2 md5 evaluations per shingle
    instead of 8 seeded ones (hashing dominated the signature scan at
    sf0.1). Lexicographic min of fixed-width hex = numeric min; each
    disjoint substring is an independent uniform hash, which is all
    minwise hashing needs."""
    from pyspark.sql import functions as F

    h1, h2 = F.md5(F.col(sh_col)), F.md5(F.concat(F.lit("x"), F.col(sh_col)))
    return [
        F.min(F.substring(h1 if i < 4 else h2, (i % 4) * 8 + 1, 8)).alias(f"h{i}")
        for i in range(MINHASH_K)
    ]


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via fingerprint groupBy: one row per duplicate group
    (fingerprint, keeper = min id, n_copies)."""
    return (
        df.groupBy(doc_fingerprint(text_col).alias("fingerprint"))
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh). Map-side only."""
    # Two performance constraints, both measured at sf0.1:
    # 1. project the token array to a named column FIRST — referencing the
    #    filter(...) expression inside the transform lambda re-evaluates
    #    the whole tokenization per element access (O(n²) per row);
    # 2. index with element_at, not slice(toks, i, n) — a per-element
    #    slice re-copies the array (~13x slower for shingle generation).
    toks_expr = F.filter(
        F.split(F.col(text_col), WHITESPACE_RE), lambda w: F.length(w) > 0
    )
    # Tokenize+shingle is the FLOP-dense map of every minhash/Jaccard
    # pipeline; a single-split corpus scan would run it on one core
    # (r12, guide §2.5). No-op when the scan already fans out, and the
    # downstream groupBy("id") reuses this partitioning (alias-aware),
    # so no second exchange appears.
    df = fan_out_scan(df, id_col)
    t = df.select(F.col(id_col).alias("id"), toks_expr.alias("_toks"))
    toks = F.col("_toks")
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array())
    return t.select("id", F.explode(F.array_distinct(sh)).alias("sh"))


def _posting_pairs(
    df: DataFrame, key: F.Column, partitions: int | None = None
) -> DataFrame:
    """Candidate pairs from a posting-list relation: group rows by `key`,
    sort each bucket's id list, and emit the id-combinations JVM-side
    (sorted, so id_a < id_b by construction) — ONE aggregation shuffle
    instead of a bucket self-join (which shuffles the relation twice and
    re-evaluates its subtree per side). Emits one row per (bucket, pair);
    callers dedupe or count as needed. Posting lists must be bounded
    (frequency-cap hot buckets upstream at larger scales).

    The keyed repartition pins the pair-GENERATION stage's parallelism
    (default: defaultParallelism; pass `partitions` to override). AQE
    sizes the aggregation's shuffle by input BYTES, but each posting row
    fans out to O(list²) pair rows — output-heavy, byte-light, so AQE
    coalesced the explode stage to 1 partition at sf0.1 (measured
    3.2 s → 2.0 s for ngram-Jaccard with the pin). Hash-partitioning by
    the group key is the distribution the groupBy needs, so no second
    exchange appears; collect_list gains nothing from map-side partial
    aggregation, so pre-shuffling costs nothing either."""
    nparts = partitions or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(nparts, key)
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        df.groupBy(key.alias("_bk"))
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )


def _jaccard_from_shingles(shingles: DataFrame) -> DataFrame:
    """All-pairs Jaccard from a (id, sh) relation via _posting_pairs.

    Groups on xxhash64(sh), not the shingle string: the 8-byte key
    shuffles ~3x fewer bytes (measured 2.8s → 2.0s at sf0.1). A hash
    collision would merge two posting lists — P ≈ n²/2⁶⁴, irrelevant —
    and this key never reaches the output, so the oracle is unaffected."""
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        _posting_pairs(shingles, F.xxhash64("sh"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # sizes is one row per DOCUMENT — let AQE pick the join strategy (a
    # forced broadcast would OOM at corpus scale, contradicting the
    # module's own 100 TB posture; AQE still broadcasts it at small SFs).
    sa = sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a")
    sb = sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4
            ),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (the brute-force oracle path).

    `max_shingle_freq` is the 100 TB guardrail: a shingle shared by f docs
    contributes f·(f−1)/2 candidate pairs, so one boilerplate shingle
    (license header, template text) can blow the pair space quadratically.
    Capping drops posting lists longer than the cap BEFORE pair
    generation — standard practice (such shingles carry ~no Jaccard
    signal); leave None for exact semantics (the oracle-checked default).
    """
    shingles = word_shingles(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq = shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("_f"))
        shingles = (
            shingles.join(freq.filter(F.col("_f") <= max_shingle_freq), "sh")
            .drop("_f")
        )
    pairs = _jaccard_from_shingles(shingles)
    return pairs.filter(F.col("jaccard") >= threshold).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature (see minhash_exprs for the hash scheme).
    One groupBy with k algebraic min aggregates — partial-aggregated
    map-side, scales like a word count."""
    sh = word_shingles(df, id_col, text_col, n)
    return sh.groupBy("id").agg(*minhash_exprs())


def _signature_relation(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shs, h0..h7): minhash signature + the doc's shingle set in
    one aggregation — the relation LSH verification needs (shared by the
    one-shot and materialized paths)."""
    sh = word_shingles(df, id_col, text_col, n)
    return sh.groupBy("id").agg(F.collect_set("sh").alias("shs"), *minhash_exprs())


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the k=8 signature into 4 bands of
    2, bucket-join per band for candidates, then verify candidates with
    exact Jaccard (intersection via double shingle join on candidates
    only). P[banded together] = 1−(1−j²)⁴ ≈ 1 for j ≥ 0.8."""
    # The signature aggregation also collects the doc's shingle set, and
    # verification joins the (tiny) candidate list back to it — a per-pair
    # array_intersect instead of a second shuffle over all shingles.
    # Banding + verification are lsh_pairs_from_signatures (ONE body for
    # the one-shot and materialized paths — they can't drift apart).
    return lsh_pairs_from_signatures(
        _signature_relation(df, id_col, text_col, n), threshold
    )


def materialize_signatures(
    df: DataFrame,
    table: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    buckets: int = 8,
) -> DataFrame:
    """Write the (id, shingle-set, minhash) signature relation as a
    parquet table BUCKETED on id — the SCALE.md 'one write, N reads'
    fix: every downstream join keyed on id (candidate verification
    reads it twice; repeated LSH runs at different thresholds read it
    again) scans pre-partitioned buckets instead of recomputing
    shingling + re-shuffling the widest relation in the pipeline per
    read. At 100 TB the signature build is the dominant map cost — pay
    it once. Returns the bucketed table as a DataFrame."""
    spark = df.sparkSession
    sig = _signature_relation(df, id_col, text_col, n)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        sig.write.bucketBy(buckets, "id").sortBy("id")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return spark.table(table)


def _banded_candidates(sig: DataFrame) -> DataFrame:
    """Banding stage of MinHash-LSH: (id_a, id_b) candidate pairs from
    the 4×2 band bucket join over a (id, h0..h7) signature relation —
    shared by lsh_pairs_from_signatures (which verifies them) and
    lsh_candidate_pairs (which exposes them raw for the recall eval)."""
    band_arr = F.array(
        *[
            F.concat_ws("|", F.lit(str(b)), f"h{2 * b}", f"h{2 * b + 1}")
            for b in range(MINHASH_K // 2)
        ]
    )
    bands = sig.select("id", F.explode(band_arr).alias("key"))
    # keyed repartition = dropDuplicates' distribution in one exchange,
    # with pinned parallelism for the array_intersect verification stage
    # (AQE would size it by the two-longs-per-row candidate bytes; the
    # work is per-pair set intersection — see _posting_pairs docstring)
    nparts = sig.sparkSession.sparkContext.defaultParallelism
    return (
        _posting_pairs(bands, F.col("key"))
        .repartition(nparts, F.col("id_a"), F.col("id_b"))
        .dropDuplicates()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Raw banded MinHash-LSH candidate pairs BEFORE exact verification
    (doc_a, doc_b) — the relation whose precision/recall the
    eval_dedup_pr query measures against exact-Jaccard ground truth.

    `shingles` optionally supplies a prebuilt (id, sh) relation (caller
    persists it) so an eval composing several shingle consumers
    tokenizes the corpus once — r12, guide §1.2.

    Raw candidates never verify, so the signature aggregation here is
    the k algebraic mins ONLY — collecting the shingle sets alongside
    (the verified path's relation) pushed every shingle through the
    groupBy for a column no consumer read; the mins partial-aggregate
    map-side (r12, guide §2.3 'aggregate before you shuffle')."""
    sh = shingles if shingles is not None else word_shingles(df, id_col, text_col, n)
    sig = sh.groupBy("id").agg(*minhash_exprs())
    cand = _banded_candidates(sig)
    return cand.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )


def lsh_pairs_from_signatures(sig: DataFrame, threshold: float = 0.8) -> DataFrame:
    """MinHash-LSH banding + exact verification over a (id, shs, h0..h7)
    signature relation — THE single implementation behind both
    minhash_lsh_pairs (one-shot) and the materialized-table path.

    Candidates are generated from bands WITHOUT the shingle arrays:
    exploding bands with the set attached would push ~2x the corpus
    through the band shuffle per side (measured 2.5x slower at sf0.1).
    Per-band buckets go through _posting_pairs (one shuffle of the slim
    (id, band-key) relation) rather than a band self-join. When `sig`
    is a bucketed table (materialize_signatures), the two verification
    reads join on its bucket key with no Exchange on the signature side
    (plan asserted in tests/test_bucketing.py)."""
    cand = _banded_candidates(sig)
    siga = sig.select(F.col("id").alias("id_a"), F.col("shs").alias("shs_a"))
    sigb = sig.select(F.col("id").alias("id_b"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    union = F.size("shs_a") + F.size("shs_b") - inter
    return (
        cand.join(siga, "id_a")
        .join(sigb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document as a bitstring column `simhash`.

    Bit j comes from the sign of Σ_tokens (±1), where the token votes +1
    iff hex digit j of md5(token) has its high nibble-bit set. Tokens are
    counted with multiplicity (weight = term frequency). Pure
    explode+groupBy — algebraic, partial-aggregated. The md5-per-token
    map is fanned out when the input is a single-split scan (r12)."""
    df = fan_out_scan(df, id_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), WHITESPACE_RE), lambda w: F.length(w) > 0)
        ).alias("w"),
    ).withColumn("h", F.md5("w"))
    votes = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
    )
    return agg.select("id", bits.alias("simhash"))


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    prefix_len: int = 64,
    bucket_width: int = 32,
    max_dist: int = 20,
) -> DataFrame:
    """Entity-resolution-style fuzzy dedup: candidate pairs via BLOCKING
    (same language, adjacent length buckets), verified with Levenshtein
    edit distance over a fixed-length prefix.

    Classic ER recipe: all-pairs edit distance is O(n²·L²) — the
    blocking key bounds the candidate space to same-block pairs, and
    the prefix cap bounds the per-pair DP cost to prefix_len². Length
    blocking is SOUND for this predicate: edit distance ≥ |len(a) −
    len(b)|, so with max_dist < bucket_width a qualifying pair's
    lengths differ by < bucket_width and land in the same or adjacent
    buckets — probing {bucket, bucket+1} from one side finds every such
    pair (same two-bucket trick as joins.range_join_bucketed). Each
    pair is seen once or twice (a→b and b→a when buckets differ);
    least/greatest + distinct canonicalizes.

    At 100 TB: per-block self-join — block sizes are bounded by
    (lang × length-bucket) cardinality of the corpus; cap or salt hot
    blocks the same way ngram_jaccard_pairs caps hot shingles if a
    single (lang, length) dominates. Levenshtein runs JVM-side
    (built-in), never Python.

    MEASURED LIMIT: on a length-homogeneous corpus the blocks
    degenerate (28.8 s at 5 000 sf0.1 docs — quadratic within
    mega-blocks). The registered query
    (registry/dedup.dedup_edit_distance_blocked) therefore blocks with
    MinHash LSH bands instead; prefer this form only when the length
    distribution actually discriminates."""
    if max_dist >= bucket_width:
        raise ValueError(
            f"max_dist ({max_dist}) must be < bucket_width ({bucket_width}): "
            "length blocking only probes adjacent buckets, so a wider "
            "distance could pair docs two buckets apart and be missed"
        )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lg"),
        F.substring(F.col(text_col), 1, prefix_len).alias("px"),
        (F.length(text_col) / bucket_width).cast("long").alias("bk"),
    )
    probe = base.withColumn("pb", F.explode(F.array(F.col("bk"), F.col("bk") + 1)))
    cand = probe.alias("a").join(
        base.alias("b"),
        (F.col("a.lg") == F.col("b.lg"))
        & (F.col("a.pb") == F.col("b.bk"))
        & (F.col("a.id") != F.col("b.id")),
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("a.px"), F.col("b.px")))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("doc_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("doc_b"),
            "dist",
        )
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via prefix filtering (the
    AllPairs/PPJoin candidate-generation family): each document only
    posts its RAREST `|d| - ceil(t*|d|) + 1` shingles (global
    frequency-ascending order), because two sets with Jaccard >= t must
    share at least one token inside both prefixes. Same output as
    ngram_jaccard_pairs, different scale story: the hot boilerplate
    shingles that make all-pairs posting lists quadratic sit at the END
    of the frequency order, so they never enter candidate generation —
    lossless, unlike the max_shingle_freq cap (which drops signal) and
    unlike MinHash-LSH banding (which drops recall).

    The threshold is a RATIONAL (num/den): prefix length and the size
    filter use exact integer ceil `(num*sz + den - 1) div den` — a
    float 0.8*|d| rounds up one shingle short at |d| multiples of 5,
    silently truncating the prefix below the no-miss guarantee.

    Plan: shingle scan -> frequency groupBy -> per-doc rank window ->
    posting pairs on the (small) prefix relation -> integer size filter
    -> exact intersection verify restricted to candidates.

    Verify strategy (r13, guide §2.3): two shapes compute the SAME
    intersection count. At high thresholds the candidate set is sparse
    and the classic expansion — candidates x shingles through two
    joins + a groupBy count — is cheapest. At LOW thresholds the
    prefix is most of every doc and candidates are dense (t=0.5 at
    sf0.1: 310 k pairs, x52 avg shingles = ~16 M expanded rows through
    two shuffles and a wide groupBy); attaching each doc's shingle
    ARRAY at candidate scale (one collect_list that reuses the shingle
    stream's per-id partitioning) and counting via array_intersect
    ships similar bytes in 50x fewer rows and no pair-scale aggregate.
    Interleaved A/B: t=0.5 tower 11.0 vs 14.7 s median (5.2 vs 6.9 min)
    for arrays; t=0.8 tower prefers joins (2.6 vs 3.1 s). The switch is
    threshold < 2/3 — the candidate-density regime, not a tuned local
    constant."""
    from pyspark.sql import Window

    # the shingle relation feeds FIVE distinct subtrees (sizes, the
    # frequency model, the prefix build, and both sides of the verify
    # join) — persist it or each reference re-tokenizes and re-shingles
    # the corpus. The cache lives as long as the returned (lazy) frame;
    # it is the corpus's (id, sh) stream, the same relation an indexed
    # deployment would materialize to a table once. A caller composing
    # several shingle consumers passes its own persisted relation via
    # `shingles` (r12) so the corpus tokenizes once across towers.
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, id_col, text_col, n).persist()
    )
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    # Per-doc shingle count rides the SAME partitionBy(id) exchange the
    # prefix-rank window already needs (unsorted count frame + sorted
    # rank frame, one shuffle), instead of a separate groupBy("id")
    # aggregate joined back twice at pair scale (r12: 2 joins + 1
    # aggregate pass removed; doc partitions are bounded by doc length,
    # so no skew — unlike a window count over partitionBy("sh"), which a
    # hot boilerplate shingle would funnel through one task).
    wid = Window.partitionBy("id")
    w = Window.partitionBy("id").orderBy("f", "sh")
    ceil_t = (threshold_num * F.col("sz") + threshold_den - 1).cast("long") / threshold_den
    prefix_len = F.col("sz") - F.floor(ceil_t).cast("long") + 1
    prefix = (
        sh.join(freq, "sh")
        .withColumn("sz", F.count(F.lit(1)).over(wid))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= prefix_len)
        # pack sz into the posting id so the pair stage carries both
        # docs' sizes without re-joining a sizes relation (ids are
        # unique, so struct order == id order inside _posting_pairs)
        .select(F.struct("id", "sz").alias("id"), "sh")
    )
    cand = (
        _posting_pairs(prefix, F.xxhash64("sh"))
        .distinct()
        .select(
            F.col("id_a.id").alias("id_a"),
            F.col("id_a.sz").alias("sa"),
            F.col("id_b.id").alias("id_b"),
            F.col("id_b.sz").alias("sb"),
        )
        .filter(
            (threshold_den * F.col("sb") >= threshold_num * F.col("sa"))
            & (threshold_den * F.col("sa") >= threshold_num * F.col("sb"))
        )
    )
    if 3 * threshold_num < 2 * threshold_den:  # t < 2/3: dense candidates
        arrs = sh.groupBy("id").agg(F.collect_list("sh").alias("shs"))
        inter = (
            cand.join(
                arrs.select(F.col("id").alias("id_a"), F.col("shs").alias("_a")),
                "id_a",
            )
            .join(
                arrs.select(F.col("id").alias("id_b"), F.col("shs").alias("_b")),
                "id_b",
            )
            .withColumn("i", F.size(F.array_intersect("_a", "_b")))
            .drop("_a", "_b")
        )
    else:
        inter = (
            cand.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
            .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
            .groupBy("id_a", "id_b", "sa", "sb")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    jac = F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 4)
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold_num / threshold_den)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
        )
    )


def incremental_prefix_filter_pairs(
    df: DataFrame,
    incoming,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """ASYMMETRIC prefix-filter near-dup pairs for snapshot-over-snapshot
    ingest (r13, the dedup_incremental_novelty arm): EXACT Jaccard >= t
    pairs (incoming doc, accepted doc) where `incoming` is a boolean
    Column over `df` marking the incoming slice. Same prefix relation as
    prefix_filter_jaccard_pairs — the frequency model and every prefix
    are computed over the FULL union, so the no-miss guarantee is the
    symmetric operator's verbatim — but candidate GENERATION emits only
    incoming x accepted combinations from each posting list instead of
    all C(n,2) pairs: the candidate space is incoming x all, not
    all x all, which is the shape that survives a 100 TB accepted corpus
    receiving a small snapshot. Output = the boundary-crossing subset of
    prefix_filter_jaccard_pairs' output, with doc_a ALWAYS the incoming
    side ((doc_a, doc_b, jaccard) rows, one per crossing pair).

    The incoming flag rides the shingle stream packed inside the id
    struct (1 byte/row), so the split costs no join and no second
    evaluation of the prefix pipeline: one aggregation shuffle groups
    the posting lists, and the inc x acc cross product is emitted
    JVM-side per bucket (the _posting_pairs shape, restricted
    emission)."""
    from pyspark.sql import Window

    # (id = struct{id, inc}, sh): the flag is constant per doc, so the
    # per-doc windows partition exactly as the symmetric operator's.
    keyed = df.select(
        F.struct(
            F.col(id_col).alias("id"), incoming.alias("inc")
        ).alias("_kid"),
        F.col(text_col).alias("_ktext"),
    )
    sh = word_shingles(keyed, "_kid", "_ktext", n).persist()
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    wid = Window.partitionBy("id")
    w = Window.partitionBy("id").orderBy("f", "sh")
    ceil_t = (
        threshold_num * F.col("sz") + threshold_den - 1
    ).cast("long") / threshold_den
    prefix_len = F.col("sz") - F.floor(ceil_t).cast("long") + 1
    prefix = (
        sh.join(freq, "sh")
        .withColumn("sz", F.count(F.lit(1)).over(wid))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= prefix_len)
        # doc id FIRST so struct order == id order in the sorted posting
        # list; sz and the slice flag ride along (ids are unique, so the
        # extra fields never tie-break).
        .select(
            F.struct(
                F.col("id.id").alias("id"), "sz", F.col("id.inc").alias("inc")
            ).alias("id"),
            "sh",
        )
    )
    # One aggregation shuffle: bucket the prefix postings by shingle and
    # emit ONLY incoming x accepted combinations per bucket (never
    # inc x inc or acc x acc — the crossing filter the symmetric form
    # paid two source joins and a pair-scale filter for).
    nparts = df.sparkSession.sparkContext.defaultParallelism
    ids = F.col("ids")
    cross = F.flatten(
        F.transform(
            F.filter(ids, lambda x: x["inc"]),
            lambda x: F.transform(
                F.filter(ids, lambda y: ~y["inc"]),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        prefix.repartition(nparts, F.xxhash64("sh"))
        .groupBy(F.xxhash64("sh").alias("_bk"))
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(cross).alias("p"))
        .select(
            F.col("p.id_a.id").alias("id_a"),
            F.col("p.id_a.sz").alias("sa"),
            F.col("p.id_b.id").alias("id_b"),
            F.col("p.id_b.sz").alias("sb"),
        )
        .distinct()
        .filter(
            (threshold_den * F.col("sb") >= threshold_num * F.col("sa"))
            & (threshold_den * F.col("sa") >= threshold_num * F.col("sb"))
        )
    )
    flat = sh.select(F.col("id.id").alias("id"), "sh")
    inter = (
        cand.join(flat.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(flat.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 4)
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold_num / threshold_den)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the public
    local document-fingerprinting algorithm): hash every char k-gram of
    the normalized text, slide a w-gram window over the hash sequence,
    and keep each window's minimum — guaranteeing any shared substring of
    length >= k + w - 1 contributes at least one shared fingerprint,
    while storing only ~2/(w+1) of the gram hashes. The distinct set of
    window-minima per doc is the fingerprint set (position-free variant).

    Generalizes the reference's whole-doc fingerprint (its exact-dup
    primitive, v2 UniqueFilterTransformer keyed on normalized text —
    aggregators.py:156) to SUBSTRING-level containment: shared boilerplate
    or quoted passages surface even when the documents differ elsewhere.

    Hashes are 16-hex-char md5 prefixes compared lexicographically —
    engine-portable (same convention as MinHash above), no int casts.

    Scale shape: ENTIRELY map-side. The gram-hash sequence is built as an
    array column per doc and the window minima are array ops over it
    (array_min over w-wide slices) — no per-doc window shuffle at all;
    the first exchange in a winnowing pipeline is whatever the CALLER
    does with the fingerprints (here: the posting-list aggregation).
    The hash array is projected to a named column before the window-min
    transform indexes it — inlining it would re-evaluate the whole
    sequence per window (the measured O(n²) HOF trap, see module notes).
    Per-doc work is O(len·w) with w=4. Docs shorter than k + w - 1
    normalized chars (no full window) yield no fingerprints by
    construction."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WHITESPACE_RE, " ")
    # The gram-hash stage is CPU-heavy (len(norm) md5 calls per doc) on a
    # byte-light input — a small parquet reads as ONE partition and the
    # whole corpus hashes on one core (measured 10.6 s → 3.4 s at sf0.1
    # with the pin). Same discipline as _posting_pairs: repartition to
    # defaultParallelism so the input-split count never serializes a
    # compute-bound map stage.
    nparts = df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.select(F.col(id_col).alias("id"), norm.alias("norm"))
        .filter(F.length("norm") >= k + w - 1)
        .repartition(nparts)
        .select("id", "norm", (F.length("norm") - F.lit(k - 1)).alias("ng"))
    )
    # greatest() guards keep the sequence/slice expressions total even
    # for rows the length filter removes: Catalyst does NOT guarantee a
    # Filter shields a Project's expressions from short rows (operator
    # reordering / eager local-relation evaluation), so an unguarded
    # sequence(1, ng-3) would go descending through 0 and crash slice.
    hashed = d.select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.col("ng"), F.lit(1))),
            lambda pos: F.substring(F.md5(F.substring("norm", pos, k)), 1, 16),
        ).alias("hs"),
    )
    # The window bound derives from size(hs), NOT the ng column: with hs
    # referenced only once, CollapseProject would inline the whole md5
    # transform into every window's slice — re-evaluating the full hash
    # array per window, the O(n²) HOF trap (measured: minutes instead of
    # seconds at sf0.01). The second reference makes the alias
    # non-inlinable, so hs materializes once per row.
    sel = hashed.select(
        "id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("hs") - (w - 1), F.lit(1))
                ),
                lambda i: F.array_min(F.slice("hs", i, w)),
            )
        ).alias("fps"),
    )
    # explode_OUTER, not explode: InferFiltersFromGenerate would add a
    # size(fps) > 0 pre-filter for a plain explode and push it below the
    # projections with the ALIASES SUBSTITUTED BACK IN — re-running the
    # full O(n·w·len) fingerprint expression a second time per row inside
    # the Filter (observed: the optimized plan's Filter carried the
    # doubly-inlined md5 transform; same minutes-not-seconds blowup).
    # Surviving docs always have >= 1 fingerprint, so the null-drop
    # filter on the GENERATED column is a no-op that can't be pushed
    # below the Generate.
    return (
        sel.select("id", F.explode_outer("fps").alias("h"))
        .filter(F.col("h").isNotNull())
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_containment: float = 0.5,
    max_fp_freq: int | None = 100,
) -> DataFrame:
    """Document pairs by winnowing-fingerprint CONTAINMENT —
    n_shared / min(|fp_a|, |fp_b|) — the substring-overlap score
    winnowing was designed for (plagiarism / quotation / boilerplate
    detection): high when one doc's content largely appears inside
    another, even if the larger doc differs elsewhere.

    Pairs come from fingerprint posting lists via _posting_pairs (one
    aggregation shuffle, no self-join); `max_fp_freq` is the same 100 TB
    guardrail as max_shingle_freq in ngram_jaccard_pairs — a fingerprint
    appearing in f docs emits O(f²) pairs, and corpus-hot fingerprints
    (licence headers, navigation chrome, shared templates) carry no
    pairwise signal. Containment is computed against the UNCAPPED
    per-doc fingerprint count, so the cap only prunes candidate
    generation volume, it never inflates the score."""
    # the fingerprint relation feeds THREE subtrees (per-doc sizes, the
    # corpus frequency cap, and the posting-pair generation) — persist it
    # or each reference re-hashes every gram of the corpus (the
    # prefix-filter family's shingle-relation discipline).
    sel = winnow_fingerprints(df, id_col, text_col, k=k, w=w).persist()
    sizes = sel.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    kept = sel
    if max_fp_freq is not None:
        freq = sel.groupBy("h").agg(F.count(F.lit(1)).alias("_f"))
        kept = sel.join(freq.filter(F.col("_f") <= max_fp_freq), "h").select("id", "h")
    shared = (
        _posting_pairs(kept, F.xxhash64("h"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    contain = F.round(
        F.col("n_shared") / F.least(F.col("sz_a"), F.col("sz_b")), 4
    )
    return (
        shared.join(
            sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a"
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b"
        )
        .withColumn("containment", contain)
        .filter(F.col("containment") >= min_containment)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "n_shared",
            "containment",
        )
    )


def semantic_dedup(
    corpus: DataFrame, cents: list[list[float]], threshold: float = 0.4
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space semantic
    deduplication — cluster the corpus with spherical k-means, then
    WITHIN each cluster drop every vector that has a lower-id neighbor
    with cosine >= threshold (keep-first rule; no connected components
    needed — the survivor set is exactly the ids with no smaller
    near-duplicate, deterministic and order-free).

    Returns (vec_id, cid, kept). The cluster pass is what makes this
    scale: candidate pairs exist only within a cluster, so pair work is
    sum(c_i^2) not n^2 — at 100 TB n_lists grows with the corpus
    (n_lists ∝ √n, the IVF sizing rule) to keep cluster sizes bounded.
    Cross-cluster near-dups are deliberately out of scope (the SemDeDup
    approximation; the boundary loss is the banded-LSH path's job).
    Plan: broadcast-centroid argmax assignment (the IVF building block)
    + one within-cluster self-join + one distinct + one left_anti —
    assignment is the only corpus-scale pass and it is map-side."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        _assign_clusters,
        _centroid_table,
        _corpus_with_unit,
        _score,
        _with_norm,
        dot,
    )

    spark = corpus.sparkSession
    _, cnormed = _corpus_with_unit(corpus)
    assign = _assign_clusters(cnormed, _centroid_table(spark, cents))
    withv = assign.join(_with_norm(corpus, "vec_id", "emb", "nrm"), "vec_id")
    a = withv.select(
        "cid",
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = withv.select(
        "cid",
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("b_id") < F.col("a_id"))
        .withColumn(
            "cs", _score(dot("a_emb", "b_emb"), F.col("a_nrm"), F.col("b_nrm"))
        )
        .filter(F.col("cs") >= threshold)
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )
    kept_flag = assign.join(
        dropped.withColumn("_dropped", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "cid",
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
    )
    return kept_flag.orderBy("vec_id")


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
) -> DataFrame:
    """Exact-substring dedup at window granularity (the Spark-shaped
    answer to suffix-array substring dedup à la Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): fingerprint every
    `window_tokens`-token window, keep windows whose fingerprint appears
    in ≥2 DISTINCT documents, and merge runs of consecutive duplicated
    positions into maximal spans per document — the spans a trainer would
    cut before packing.

    Output: (doc_id, span_start, n_windows, span_len_tokens) where the
    span covers tokens [span_start, span_start + span_len_tokens).

    Scale (100 TB): windowing is map-only (tokenize once, sequence-explode
    positions, slice+md5 per window). Cross-doc detection is ONE groupBy
    on the fingerprint with algebraic min/max(doc) — no distinct-count
    state — followed by a semi-join that AQE can broadcast when the dup
    set is small. The island merge shuffles only FLAGGED positions (dup
    mass, not corpus mass) partitioned by doc. A true suffix array would
    need a global sort of every suffix; this is the bounded-window
    approximation that parallelizes with no global order.

    Totality guards: sequence upper bound is greatest(n-W, 0) (sequence
    args must be total even under a later filter — Catalyst may evaluate
    project expressions on rows a Filter would drop), then positions
    beyond n-W are filtered.
    """
    from pyspark.sql import Window

    W = window_tokens
    d = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), WHITESPACE_RE), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks").cast("long"))
    pos = (
        d.withColumn(
            "_p",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.greatest(F.col("_n") - W, F.lit(0).cast("long"))
                )
            ),
        )
        .where(F.col("_p") <= F.col("_n") - W)
        .select(
            F.col(id_col),
            F.col("_p"),
            F.md5(F.array_join(F.slice("_toks", F.col("_p") + 1, W), " ")).alias("_fp"),
        )
    )
    dup_fps = (
        pos.groupBy("_fp")
        .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
        .select("_fp")
    )
    flagged = pos.join(dup_fps, "_fp", "left_semi")
    w = Window.partitionBy(id_col).orderBy("_p")
    islands = flagged.withColumn("_g", F.col("_p") - F.row_number().over(w))
    return islands.groupBy(id_col, "_g").agg(
        F.min("_p").alias("span_start"),
        F.count(F.lit(1)).alias("n_windows"),
        (F.max("_p") - F.min("_p") + W).alias("span_len_tokens"),
    ).drop("_g")
