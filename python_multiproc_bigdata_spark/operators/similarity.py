"""Similarity search over embedding columns (beyond-reference M4).

Two paths:
- brute-force cosine top-k — the exactness baseline; crossJoin of a
  bounded query set against the corpus, all JVM-side higher-order-function
  math (functions/vectors.py), no UDF.
- sign-LSH bucketed top-k — the scale path: quantize the leading dims'
  signs into a bucket key (random-hyperplane LSH with axis-aligned
  hyperplanes — deterministic and engine-portable), then search within
  the bucket only. At 100 TB the bucket key becomes the shuffle/partition
  key and each query touches 1/2^bits of the corpus.

Scores are rounded to 4 decimals BEFORE ranking so top-k cuts are stable
across engines; ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.vectors import dot, l2_norm


def _with_norm(df: DataFrame, id_alias: str, emb_alias: str, norm_alias: str) -> DataFrame:
    """Precompute the L2 norm once per row — computing it per PAIR inside
    the crossJoin re-folds the array O(|corpus|) times per vector
    (measured ~3x slower at sf0.1). The formula stays dot/(nq*nc), so the
    rounded score is bit-identical to the per-pair form."""
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(emb_alias),
        l2_norm("embedding").alias(norm_alias),
    )


def _score(dot_col: Column, nq: Column, nc: Column) -> Column:
    return F.round(
        F.when((nq > 0) & (nc > 0), dot_col / (nq * nc)).otherwise(F.lit(0.0)), 4
    )


def _scored_pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    c = _with_norm(corpus, "neighbor_id", "c_emb", "c_norm")
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm")),
        )
    )


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, score, rk)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        _scored_pairs(queries, corpus)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def sign_bucket(col: F.Column | str, bits: int = 8) -> F.Column:
    """LSH bucket key: concatenated signs of the first `bits` dims.

    Precondition: vectors must have >= `bits` dimensions (the harness
    embeddings are fixed 64-dim). A shorter vector's missing dims read as
    null → '0', conflating absent with negative — validate upstream if
    variable-length vectors are possible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        *[
            F.when(F.element_at(c, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


def topk_lsh(
    queries: DataFrame, corpus: DataFrame, k: int = 3, bits: int = 8
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.
    Equi-join on the bucket key replaces the crossJoin — this is the part
    that survives scale."""
    q = _with_norm(queries, "query_id", "q_emb", "q_norm").withColumn(
        "bucket", sign_bucket("q_emb", bits)
    )
    c = _with_norm(corpus, "neighbor_id", "c_emb", "c_norm").withColumn(
        "bucket", sign_bucket("c_emb", bits)
    )
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def topk_lsh_multiprobe(
    queries: DataFrame, corpus: DataFrame, k: int = 3, bits: int = 8
) -> DataFrame:
    """Multi-probe variant of topk_lsh: each query also searches the
    `bits` neighboring buckets that differ in exactly one sign bit —
    recovering neighbors that fall just across a hyperplane. Cost grows
    (bits+1)x on the query side only; the corpus is still hashed once.
    This is the recall knob for the LSH scale path."""
    c = _with_norm(corpus, "neighbor_id", "c_emb", "c_norm").withColumn(
        "bucket", sign_bucket("c_emb", bits)
    )
    base = _with_norm(queries, "query_id", "q_emb", "q_norm").withColumn(
        "bucket", sign_bucket("q_emb", bits)
    )
    # probe buckets: the exact bucket + each one-bit flip
    def flip(bucket: Column, i: int) -> Column:
        flipped = F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1")
        return F.concat(
            F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, bits - i - 1)
        )

    probes = F.array(F.col("bucket"), *[flip(F.col("bucket"), i) for i in range(bits)])
    q = base.withColumn("bucket", F.explode(probes))
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def topk_lsh_banded(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    bits_per_band: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """Multi-table (banded) LSH top-k: candidates are pairs sharing ANY of
    `n_bands` disjoint sign-bit bands, verified with exact rounded cosine
    and ranked per query — the classical L-hash-tables LSH design, and the
    recall fix for the single-table paths (one 8-bit bucket measures
    recall@3 0.007, +multiprobe 0.09 at sf0.1 in RECALL.json, because a
    cosine-0.4 neighbor rarely agrees on ALL leading sign bits; ANY-of-16
    4-bit bands agree with prob 1−(1−p⁴)¹⁶ ≈ 0.94 at p≈0.63).

    Scale shape: the bounded query side explodes to |queries|·L band keys
    and BROADCASTS onto the corpus's band keys — candidate generation is
    map-side (zero shuffle on the corpus), then one dropDuplicates + two
    id equi-joins for verification. The corpus is hashed once; band
    width/count trade candidate rate for recall exactly as in
    neardup_pairs_banded (same defaults, same measured regime)."""
    b, n = bits_per_band, n_bands

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        sig = df.select(
            F.col("vec_id").alias(id_alias),
            sign_bucket("embedding", b * n).alias("bits"),
        )
        keys = F.array(
            *[
                F.concat_ws(":", F.lit(str(l)), F.substring("bits", l * b + 1, b))
                for l in range(n)
            ]
        )
        return sig.select(id_alias, F.explode(keys).alias("key"))

    # keyed repartition with a pinned count: serves dropDuplicates'
    # required distribution (no extra exchange) while keeping the
    # FLOP-bound verify stage parallel — AQE would coalesce the
    # two-longs-per-row candidate relation to near-1 partition by bytes
    # (same reasoning as neardup_pairs_banded's verify_partitions)
    nparts = corpus.sparkSession.sparkContext.defaultParallelism
    cand = (
        F.broadcast(banded(queries, "query_id"))
        .join(banded(corpus, "neighbor_id"), "key")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .repartition(nparts, F.col("query_id"), F.col("neighbor_id"))
        .dropDuplicates()
    )
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    c = _with_norm(corpus, "neighbor_id", "c_emb", "c_norm")
    pairs = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    return _rank_topk(pairs, k)


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    label_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer partitions the corpus
    into inverted lists; each query ranks the list representatives by cosine
    and searches only the top-`nprobe` lists.

    The inverted-list assignment is the `label_col` column (at 100 TB this is
    the table's partition key, so probing becomes partition pruning — each
    query scans nprobe/n_lists of the corpus instead of all of it). The
    representative per list is the embedding of the MINIMUM vec_id — a
    deterministic medoid proxy chosen so the oracle reproduces it exactly; a
    production deployment would precompute k-means centroids offline and
    broadcast them the same way. Probe ranking rounds to 4 decimals before
    row_number (ties -> label asc) so the probed set is engine-stable."""
    reps = F.broadcast(
        corpus.groupBy(F.col(label_col).alias("probe_label"))
        .agg(F.min_by("embedding", "vec_id").alias("rep"))
        .withColumn("rep_norm", l2_norm("rep"))
    )
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("probe_score"), F.asc("probe_label")
    )
    probed = (
        q.crossJoin(reps)
        .withColumn(
            "probe_score", _score(dot("q_emb", "rep"), F.col("q_norm"), F.col("rep_norm"))
        )
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", "q_norm", "probe_label")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("probe_label"),
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("c_norm"),
    )
    pairs = (
        probed.join(c, "probe_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def train_spherical_kmeans(
    corpus: DataFrame,
    n_lists: int = 8,
    max_iter: int = 5,
    dims: int = 64,
) -> list[list[float]]:
    """Spherical k-means (Lloyd's on the unit sphere) for IVF coarse
    quantization. Returns n_lists unit centroids as plain Python lists.

    Each iteration is one corpus pass: broadcast the current centroids as
    literal arrays, assign every vector to its max-cosine centroid
    (JVM-side HOF math), then groupBy cluster and element-wise-average
    via posexplode — and collect ONLY the n_lists×dims centroid matrix to
    the driver (O(n_lists·d) per iteration, never O(data); this is the
    same driver/executor split MLlib's KMeans uses). Init is the
    n_lists lowest-vec_id vectors — deterministic, so re-runs agree up
    to float-sum ordering inside the mean (ulp-level; assignments only
    flip on exact ties).

    At 100 TB: train on a hash-sample (WHERE xxhash64(id) % m = 0) — the
    quantizer needs thousands of points per centroid, not the corpus —
    then assign the full corpus once and WRITE the assignment as the
    table's partition key, making nprobe search partition pruning."""
    # project the norm to a named column BEFORE dividing inside the
    # transform lambda — an inline fold there re-evaluates per element
    norm = (
        corpus.select("vec_id", "embedding", l2_norm("embedding").alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x / F.col("_n")).alias("e"),
        )
    )
    # every Lloyd's iteration re-reads this relation — persist it for the
    # loop (scan+normalize once, not max_iter+1 times), release it after
    norm = norm.persist()
    cents = [
        list(r.e)
        for r in norm.orderBy("vec_id").limit(n_lists).collect()
    ]
    spark = corpus.sparkSession
    for _ in range(max_iter):
        # assignment via a broadcast join against the tiny centroid table,
        # NOT a literal expression tree: embedding n_lists×dims literals
        # into the plan makes Catalyst re-analyze a ~512-node tree every
        # iteration (measured: the literal form spent more time planning
        # than executing — 16 s → 4 s for the registered query at sf0.1)
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid int, c array<double>"
        )
        assigned = _assign_clusters(norm, cent_df).join(norm, "vec_id")
        means = (
            assigned.select("cid", F.posexplode("e").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        new = {r.cid: list(r.c) for r in means}
        # renormalize to the sphere; empty clusters keep their centroid
        import math

        for ci in range(len(cents)):
            if ci in new:
                n2 = math.sqrt(sum(v * v for v in new[ci]))
                if n2 > 0:
                    cents[ci] = [v / n2 for v in new[ci]]
    norm.unpersist()
    return cents


def kmeans_core(x, n_lists: int, max_iter: int):
    """The NumPy Lloyd's loop shared by the driver-side trainer AND the
    DuckDB oracle generator (registry/similarity.py:make_ivf_kmeans_oracle)
    — one implementation, so Spark-trained and oracle-replayed centroids
    are bit-identical by construction. `x` is the (n, d) unit-vector
    sample sorted by vec_id; init = the first n_lists rows; assign to
    max-cosine centroid with ties to the lowest cid (np.argmax takes the
    first maximum); mean + renormalize; empty clusters keep their
    centroid."""
    import numpy as np

    cents = x[:n_lists].copy()
    for _ in range(max_iter):
        assign = np.argmax(x @ cents.T, axis=1)
        for ci in range(len(cents)):
            members = x[assign == ci]
            if len(members):
                m = members.mean(axis=0)
                n2 = float(np.sqrt((m * m).sum()))
                if n2 > 0:
                    cents[ci] = m / n2
    return cents


def kmeans_l2_core(x, k: int, max_iter: int):
    """Plain-L2 Lloyd's (no renormalization) — the PQ sub-codebook
    trainer, shared by the Spark-side trainer and the oracle generator
    exactly like kmeans_core. Init = first k rows; assignment by min
    squared distance with ties to the lowest code (np.argmin takes the
    first minimum); empty codes keep their centroid."""
    import numpy as np

    cents = x[:k].copy()
    for _ in range(max_iter):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for ci in range(len(cents)):
            members = x[assign == ci]
            if len(members):
                cents[ci] = members.mean(axis=0)
    return cents


_UNIT_SAMPLE_SPARK_CACHE: dict = {}


def collect_unit_sample(corpus: DataFrame, sample_size: int = 4096):
    """The deterministic md5-lowest unit-vector sample every driver-side
    quantizer trainer uses (spherical k-means, PQ codebooks, PCA): one
    bounded collect of O(sample_size × dims), ordered by vec_id for
    stable init. Engine-portable by construction — the oracle generators
    replay the identical sample from parquet via hashlib md5.

    Session-cached by the corpus plan's semanticHash: the sample is a
    pure deterministic function of the input relation, and quantizer
    TRAINING is a build step, not a per-query step (FAISS never retrains
    per search) — without the cache every registered quantizer query
    paid a redundant ~0.9 s sample-collect job per run (two for IVF+PQ).
    semanticHash keys on the resolved plan, so a filtered/different
    corpus never aliases a cached sample.

    Caveats: semanticHash is plan-STRUCTURAL, not content-based — if the
    parquet at the same path is rewritten within a session, the cached
    sample goes stale (the oracle, which retrains from current file
    contents, would then disagree); restart the session or clear
    _UNIT_SAMPLE_SPARK_CACHE after rewriting inputs. The cached array is
    returned read-only (writeable=False) so a mutating caller cannot
    poison later consumers."""
    import numpy as np

    key = None
    try:
        key = (
            corpus._jdf.queryExecution().optimizedPlan().semanticHash(),
            sample_size,
        )
    except Exception:  # noqa: BLE001 — cache is best-effort
        key = None
    if key is not None and key in _UNIT_SAMPLE_SPARK_CACHE:
        return _UNIT_SAMPLE_SPARK_CACHE[key]

    norm = (
        corpus.select("vec_id", "embedding", l2_norm("embedding").alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x / F.col("_n")).alias("e"),
        )
    )
    pdf = (
        norm.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sample_size)
        .toPandas()  # Arrow batch transfer — measured 1.3 s → 0.3 s vs
        # row collect; the "lowest-vec_id first" init sort happens
        # driver-side on the bounded sample (one Spark sort, not two)
    )
    pdf = pdf.sort_values("vec_id")
    x = np.asarray([list(e) for e in pdf["e"]], dtype=np.float64)
    x.flags.writeable = False  # shared across callers — guard against mutation
    if key is not None:
        _UNIT_SAMPLE_SPARK_CACHE[key] = x
    return x


def train_spherical_kmeans_driver(
    corpus: DataFrame,
    n_lists: int = 8,
    max_iter: int = 5,
    sample_size: int = 4096,
) -> list[list[float]]:
    """Spherical k-means trained DRIVER-SIDE on a bounded deterministic
    hash-sample — the FAISS-style coarse-quantizer split: the quantizer
    needs O(n_lists) * a-few-hundred points, never the corpus, so the
    collect moves O(sample_size * dims) bytes NO MATTER the corpus size
    (4096 * 64 doubles = 2 MB at 100 TB as at 1 GB). Training then runs
    as `max_iter` NumPy matmuls with zero Spark jobs — versus the
    distributed trainer's ~4 shuffles per Lloyd's iteration, which at
    this sample scale is pure scheduling overhead (measured 4.5 s → by
    removing the per-iteration round-trips at sf0.1). The full-corpus
    work — assignment and search — stays distributed in the caller.

    Same semantics as train_spherical_kmeans: unit-normalize (drop zero
    vectors), init = n_lists lowest-vec_id unit vectors, then kmeans_core.
    The sample is the md5(vec_id)-lowest rows — a deterministic
    pseudo-random subset, stable across runs and partitionings, and
    engine-portable (md5 over the decimal string is identical in Spark,
    DuckDB, and hashlib) so the DuckDB oracle generator replays the
    IDENTICAL sample and therefore the identical centroids."""
    x = collect_unit_sample(corpus, sample_size)
    return [[float(v) for v in c] for c in kmeans_core(x, n_lists, max_iter)]


def train_pq_codebooks_driver(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    max_iter: int = 3,
    sample_size: int = 4096,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the embedding splits into `n_sub`
    contiguous subspaces and each subspace gets its own plain-L2 k-means
    codebook of `n_codes` centroids, trained driver-side on the shared
    md5-sample of UNIT vectors (cosine-PQ: normalize first, then
    quantize -- the FAISS recipe for inner-product/cosine metrics).
    Returns codebooks[sub][code] = centroid (n_sub x n_codes x
    dims/n_sub -- 8x16x8 doubles here, ~8 KB: broadcast-sized at any
    corpus scale). Deterministic end-to-end, so the oracle generator
    retrains bit-identical books (registry/similarity.py:
    make_pq_oracle)."""
    x = collect_unit_sample(corpus, sample_size)
    return pq_books_from_sample(x, n_sub, n_codes, max_iter)


def pq_books_from_sample(x, n_sub: int, n_codes: int, max_iter: int):
    """The subspace-slicing + per-subspace kmeans_l2_core loop, shared by
    the Spark trainer and the oracle generator so codebooks cannot
    drift."""
    d = x.shape[1]
    if d % n_sub:
        raise ValueError(f"dims {d} not divisible by n_sub {n_sub}")
    w = d // n_sub
    books = []
    for s in range(n_sub):
        sub = x[:, s * w : (s + 1) * w].copy()
        cents = kmeans_l2_core(sub, n_codes, max_iter)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_book_sq(books: list[list[list[float]]]) -> list[list[float]]:
    """Per-code squared norms via the sequential left fold — ONE
    implementation, so the constant bits embedded in the Spark plan and
    in the generated oracle are identical."""
    out = []
    for cb in books:
        row = []
        for c in cb:
            acc = 0.0
            for v in c:
                acc += v * v
            row.append(acc)
        out.append(row)
    return out


def _assign_clusters(vecs: DataFrame, cent_df: DataFrame) -> DataFrame:
    """(vec_id, cid): each vector's max-cosine centroid, via a broadcast
    crossJoin against the n_lists-row centroid table + max_by argmax.
    Ties break to the LOWEST cid (struct key orders by score, then -cid).
    `vecs` must carry unit vectors in column `e`."""
    scored = (
        vecs.crossJoin(F.broadcast(cent_df))
        .select(
            "vec_id",
            "cid",
            dot_arrays(F.col("e"), F.col("c")).alias("s"),
        )
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("s"), (-F.col("cid")).cast("int"))).alias("cid")
    )


def dot_arrays(a: Column, b: Column) -> Column:
    """Elementwise dot of two array columns (JVM HOF, codegen-adjacent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _centroid_table(spark, cents: list[list[float]], label: str = "cid") -> DataFrame:
    """The tiny (label, centroid) relation — n_lists rows, always
    broadcast-sized. ONE schema for training, assignment and probing."""
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], f"{label} int, c array<double>"
    )


def _corpus_with_unit(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vec_id, embedding, c_norm) plus its (vec_id, e) unit-vector view
    (zero vectors pass through unnormalized — they score 0 against
    everything). Shared by the per-call k-means search and the offline
    index build so assignment semantics cannot drift between them."""
    cvec = corpus.select("vec_id", "embedding", l2_norm("embedding").alias("c_norm"))
    cnormed = cvec.select(
        "vec_id",
        F.when(
            F.col("c_norm") > 0, F.transform("embedding", lambda x: x / F.col("c_norm"))
        )
        .otherwise(F.col("embedding"))
        .alias("e"),
    )
    return cvec, cnormed


def _probe_lists(
    queries: DataFrame, cents: list[list[float]], nprobe: int, label: str = "cid"
) -> DataFrame:
    """(query_id, q_emb, q_norm, <label>): each query's top-nprobe
    centroids by ROUNDED cosine, ties to the lowest centroid id — the
    one probe-ranking policy both IVF serving paths share."""
    spark = queries.sparkSession
    cent_df = F.broadcast(
        _centroid_table(spark, cents, "probe_label").withColumn(
            "rep_norm", l2_norm("c")
        )
    )
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("probe_score"), F.asc("probe_label")
    )
    return (
        q.crossJoin(cent_df)
        .withColumn(
            "probe_score",
            _score(dot("q_emb", "c"), F.col("q_norm"), F.col("rep_norm")),
        )
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", "q_norm", F.col("probe_label").alias(label))
    )


def _rank_topk(pairs: DataFrame, k: int) -> DataFrame:
    """row_number top-k on (score desc, neighbor_id asc) — the shared
    ranking tail of the IVF search paths."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def topk_ivf_kmeans(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    n_lists: int = 8,
    max_iter: int = 5,
    train_sample: int | None = 4096,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """IVF top-k with spherical-k-means centroids (the recall fix for
    topk_ivf's label lists: the harness `label` column does not follow
    cosine geometry, so probing label lists ≈ random sampling — measured
    0.17 recall@3 at nprobe=2/8 lists in RECALL.json; k-means lists
    follow the geometry by construction).

    Search is identical in shape to topk_ivf: broadcast the (tiny)
    centroid table, rank lists per query by rounded cosine, equi-join the
    top-nprobe lists against the centroid-assigned corpus, verify with
    exact cosine. Training defaults to the bounded driver-side sample
    trainer (train_spherical_kmeans_driver — zero Spark jobs per Lloyd's
    iteration); pass train_sample=None to train distributed on the full
    corpus instead (only worth it when the quantizer genuinely needs
    more points than fit on the driver, i.e. huge n_lists). Pass `cents`
    to serve from an already-trained quantizer (the offline-index
    shape — training is deterministic, so callers over an immutable
    corpus may memoize it; see registry/similarity.py)."""
    if cents is None:
        if train_sample:
            cents = train_spherical_kmeans_driver(
                corpus, n_lists=n_lists, max_iter=max_iter, sample_size=train_sample
            )
        else:
            cents = train_spherical_kmeans(corpus, n_lists=n_lists, max_iter=max_iter)
    spark = corpus.sparkSession
    # corpus→list assignment through the same broadcast-join argmax used
    # in training (no giant literal tree; at scale this assignment runs
    # ONCE and its cid becomes the table's partition key — build_ivf_index
    # IS that run, sharing _corpus_with_unit/_centroid_table/_probe_lists
    # so per-call and offline semantics cannot drift)
    cvec, cnormed = _corpus_with_unit(corpus)
    assign_df = _assign_clusters(cnormed, _centroid_table(spark, cents))
    c = cvec.join(assign_df, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "c_norm",
        F.col("cid").alias("probe_label"),
    )
    probed = _probe_lists(queries, cents, nprobe, label="probe_label")
    pairs = (
        probed.join(c, "probe_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    return _rank_topk(pairs, k)


def topk_by_group_agg(
    scored: DataFrame, group_col: str, score_col: str, id_col: str, k: int
) -> DataFrame:
    """Top-k per group WITHOUT a window sort: collect (score, id) structs
    per group, sort the small per-group array, slice k. One partial-
    aggregated groupBy instead of a full partition sort — preferable when
    groups are numerous and k is small (the ANN case). Emits
    (group, id, score, rk) like the window form, preserving the id
    column's type (the SCORE is negated for the ascending struct sort,
    never the id, so string/any ids work)."""
    pair = F.struct(
        (-F.col(score_col)).alias("negs"), F.col(id_col).alias("i")
    )
    agg = scored.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_list(pair)), 1, k).alias("top")
    )
    exploded = agg.select(
        group_col, F.posexplode("top").alias("rk0", "p")
    )
    return exploded.select(
        group_col,
        F.col("p.i").alias(id_col),
        (-F.col("p.negs")).alias(score_col),
        (F.col("rk0") + 1).alias("rk"),
    )


def topk_bruteforce_np(
    queries: DataFrame, corpus: DataFrame, k: int = 5, max_corpus_rows: int = 2_000_000
) -> DataFrame:
    """NumPy-vectorized exact top-k: the corpus is broadcast as a dense
    matrix and each Arrow batch of queries does one BLAS matmul against
    it (mapInPandas). This is the 'Python, but vectorized' scale path —
    preferable to the HOF fold when per-pair arithmetic dominates; keep
    the JVM form (topk_bruteforce) for oracle checks since BLAS blocked
    summation differs from a sequential fold at ulp scale.

    Corpus must fit in executor memory as float64 (rows x dims x 8B) —
    shard the corpus and merge per-shard top-k above that. The
    `max_corpus_rows` guard makes that contract loud: a corpus above
    the bound raises instead of silently collecting gigabytes to the
    driver (raise the bound explicitly if the deployment has the RAM)."""
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, neighbor_id long, score double, rk int"
    spark = corpus.sparkSession
    # One scan, not two: collect the projection with a limit one past
    # the bound — an oversize corpus is detected from the collected
    # length without a separate count() action over the full corpus.
    rows = corpus.select("vec_id", "embedding").limit(max_corpus_rows + 1).collect()
    if len(rows) > max_corpus_rows:
        raise ValueError(
            f"topk_bruteforce_np collects the corpus to the driver: "
            f">{max_corpus_rows} rows (max_corpus_rows={max_corpus_rows}); use "
            f"topk_bruteforce (distributed HOF fold) or an ANN tier, or "
            f"raise max_corpus_rows deliberately"
        )
    if not rows:  # 1-D np.array([]) would break axis=1 norms
        return spark.createDataFrame([], out_schema)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.inf  # zero vectors score 0 everywhere
    b = spark.sparkContext.broadcast((ids, mat, norms))

    def round_half_up(a, decimals):
        # mirror Spark's F.round (HALF_UP, away from zero) — np.round is
        # half-to-even and would diverge on exactly-representable halves
        f = 10.0**decimals
        return np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f

    def batches(it):
        c_ids, c_mat, c_norms = b.value
        for pdf in it:
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            q_norms = np.linalg.norm(q_mat, axis=1)
            q_norms[q_norms == 0] = np.inf
            scores = (q_mat @ c_mat.T) / q_norms[:, None] / c_norms[None, :]
            out = {"query_id": [], "neighbor_id": [], "score": [], "rk": []}
            for qi, qid in enumerate(q_ids):
                # drop self BEFORE ranking (masking with -inf would leak a
                # bogus self-row whenever corpus size <= k)
                keep = c_ids != qid
                n_ids = c_ids[keep]
                # rank on the ROUNDED score (ties → id asc), matching
                # topk_bruteforce's ordering policy
                s_r = round_half_up(scores[qi][keep], 4)
                order = np.lexsort((n_ids, -s_r))[:k]
                for rk, j in enumerate(order, 1):
                    out["query_id"].append(qid)
                    out["neighbor_id"].append(n_ids[j])
                    out["score"].append(float(s_r[j]))
                    out["rk"].append(rk)
            yield pd.DataFrame(out)

    return queries.select("vec_id", "embedding").mapInPandas(batches, out_schema)


def neardup_pairs_cosine(corpus: DataFrame, threshold: float) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, score ≥ threshold) —
    the EXACT all-pairs form. crossJoin: O(n²) compute AND an unbounded
    nested-loop join at cluster scale, so this is deliberately NOT
    registered as a query; it exists as the exactness baseline that
    tools/recall_report.py measures the banded path against, and as the
    small-SF oracle for tests."""
    a = _with_norm(corpus, "id_a", "e_a", "n_a")
    b = _with_norm(corpus, "id_b", "e_b", "n_b")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", _score(dot("e_a", "e_b"), F.col("n_a"), F.col("n_b")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def neardup_pairs_banded(
    corpus: DataFrame,
    threshold: float,
    bits_per_band: int = 4,
    n_bands: int = 16,
    verify_partitions: int | None = None,
) -> DataFrame:
    """Banded embedding near-dup: sign-LSH candidate generation + exact
    cosine verification — the scale path that replaces the crossJoin.

    Each vector's first bits_per_band·n_bands dimension signs are split
    into n_bands disjoint bands; two vectors are CANDIDATES iff some band
    matches exactly. Candidates come from _posting_pairs (one aggregation
    shuffle of the slim (id, band-key) relation — no self-join, no
    cartesian), then only candidates are verified with the exact rounded
    cosine. The plan is scan → explode → groupBy → explode → two id
    equi-joins: every join is hash/equi, nothing nested-loop.

    Recall is governed by P[band match] = p^b with p = 1 − θ/π per sign
    bit: at production near-dup thresholds (cosine ≥ 0.9, p ≈ 0.86)
    b=8/L=4 keeps recall ≥ 0.999 while admitting ~1/256 of random pairs
    per band. The harness corpus only has pairs near cosine 0.4 (p ≈
    0.63, the weakest regime for LSH — no sublinear method prunes hard
    there); the b=4/L=16 default measures 0.95–1.0 recall vs the exact
    form with a 0.65 candidate rate at sf0.001–0.1
    (tools/recall_report.py keeps this measured, not assumed).

    Posting lists must stay bounded: a degenerate band key shared by f
    vectors contributes f·(f−1)/2 candidate rows — frequency-cap hot
    buckets upstream at larger scales exactly as ngram_jaccard does.

    `verify_partitions` pins the parallelism of the verification stage
    (default: the cluster's defaultParallelism). AQE right-sizes shuffle
    partitions by BYTES, but the candidate relation is two longs per row
    while verifying each row costs a 64-dim fold — byte-sized partitions
    under-parallelize the FLOP-bound stage (measured: AQE coalesced the
    2M-candidate dedup to 8 partitions at sf0.1, 3.4 s → 2.5 s with 32).
    The keyed repartition is FREE: hash-partitioning by (id_a, id_b) is
    exactly the distribution dropDuplicates needs, so Catalyst plans no
    second exchange — same shuffle count as plain dropDuplicates, with a
    pinned instead of byte-derived partition count."""
    from python_multiproc_bigdata_spark.operators.dedup import _posting_pairs

    b, n = bits_per_band, n_bands
    sig = corpus.select(
        F.col("vec_id").alias("id"), sign_bucket("embedding", b * n).alias("bits")
    )
    band_keys = F.array(
        *[
            F.concat_ws(":", F.lit(str(l)), F.substring("bits", l * b + 1, b))
            for l in range(n)
        ]
    )
    bands = sig.select("id", F.explode(band_keys).alias("key"))
    nparts = verify_partitions or corpus.sparkSession.sparkContext.defaultParallelism
    cand = (
        _posting_pairs(bands, F.col("key"))
        .repartition(nparts, F.col("id_a"), F.col("id_b"))
        .dropDuplicates()
    )
    ea = _with_norm(corpus, "id_a", "e_a", "n_a")
    eb = _with_norm(corpus, "id_b", "e_b", "n_b")
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("score", _score(dot("e_a", "e_b"), F.col("n_a"), F.col("n_b")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_lists: int = 8,
    max_iter: int = 5,
    sample_mod: int | None = None,
    train_sample: int | None = 4096,
) -> list[list[float]]:
    """Offline IVF index build — the amortization every per-call
    topk_ivf_kmeans docstring promises: train the coarse quantizer ONCE
    (driver-side on a bounded hash-sample by default — see
    train_spherical_kmeans_driver; sample_mod pre-thins the candidate
    pool distributed first: WHERE xxhash64(vec_id) % sample_mod = 0 —
    the quantizer needs thousands of points per centroid, not the
    corpus), assign every vector ONCE, and write the corpus
    hive-partitioned by its list id (cid=...). Returns the
    n_lists×dims centroid matrix (caller stores it next to the index;
    it is O(KB)). After this, nprobe search is partition pruning — see
    topk_ivf_partitioned."""
    train_on = (
        corpus.filter(F.xxhash64("vec_id") % sample_mod == 0)
        if sample_mod
        else corpus
    )
    if train_sample:
        cents = train_spherical_kmeans_driver(
            train_on, n_lists=n_lists, max_iter=max_iter, sample_size=train_sample
        )
    else:
        cents = train_spherical_kmeans(train_on, n_lists=n_lists, max_iter=max_iter)
    cvec, cnormed = _corpus_with_unit(corpus)
    assign_df = _assign_clusters(cnormed, _centroid_table(corpus.sparkSession, cents))
    (
        cvec.join(assign_df, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )
    return cents


def topk_ivf_partitioned(
    queries: DataFrame,
    index_path: str,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """Serve ANN top-k from a build_ivf_index layout. Per query, rank
    centroids by cosine and keep the top-nprobe list ids; the UNION of
    probed ids across the (bounded) query batch is collected driver-side
    (≤ n_lists ints) and applied as a STATIC IN-filter on the partition
    column — the scan lists and reads only those cid= directories
    (PartitionFilters; asserted in tests/test_scale_plans.py). The
    unprobed (1 − nprobe/n_lists) of a 100 TB corpus is never touched.
    Exact cosine verification + rounded-score ranking within the probed
    lists, identical to topk_ivf_kmeans search semantics."""
    spark = queries.sparkSession
    # r13: persist the probe ranking — it feeds TWO actions (the
    # partition-set collect below and the main serving plan), and each
    # execution pays the queries-x-centroids rank job plus re-codegen
    # of the centroid literal table. The relation is |queries| x nprobe
    # rows (query-batch-bounded at any scale). Interleaved A/B on
    # sim_mmr_from_ivf: med 6.14 s vs 7.63, min 5.21 vs 5.90.
    probed = _probe_lists(queries, centroids, nprobe, label="cid").persist()
    # the collect moves ≤ n_lists ints to the driver.
    cids = sorted({r.cid for r in probed.select("cid").distinct().collect()})
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("cid").isin(cids))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            "c_norm",
            "cid",
        )
    )
    pairs = (
        probed.join(c, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm")),
        )
    )
    return _rank_topk(pairs, k)


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor label prediction by plurality vote (the
    classifier a labeled embedding store gives you for free — the batch
    form of 'label this new corpus by its nearest curated exemplars').

    Exact cosine top-k per query (topk_bruteforce), then the neighbors'
    labels vote; ties break deterministically on (more votes, smaller
    label). Emits (query_id, predicted_label, votes, true_label,
    correct).

    Scale: the vote/argmax stages are one groupBy over |queries| x k
    rows — negligible next to the candidate search, which is pluggable:
    swap topk_bruteforce for topk_ivf_kmeans / topk_lsh_banded at 100 TB
    (identical downstream shape). The neighbor->label join broadcasts
    the top-k side (bounded |queries| x k), so the corpus is never
    shuffled.
    """
    labels = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col(label_col).alias("nb_label")
    )
    topk = topk_bruteforce(queries, corpus, k=k)
    # broadcast the small (|queries| x k) side into the corpus-label join
    votes = (
        labels.join(F.broadcast(topk), "neighbor_id")
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nb_label"))
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("nb_label").alias("predicted_label"), "votes")
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "predicted_label",
        "votes",
        "true_label",
        (F.col("predicted_label") == F.col("true_label")).alias("correct"),
    )


def _sq8(df: DataFrame, id_alias: str, p: str) -> DataFrame:
    """Per-vector int8 scalar quantization: scale = 127/max|x| (1.0 for
    the zero vector), q[i] = round(x[i]*scale) — plus the true L2 norm
    (one double per row) for cosine reconstruction. Named projections
    per stage so each derived array is computed once, not per use."""
    d = df.select(
        F.col("vec_id").alias(id_alias),
        F.transform("embedding", lambda x: x.cast("double")).alias("_e"),
    )
    d = d.withColumn("_maxabs", F.array_max(F.transform("_e", F.abs)))
    d = d.withColumn(
        p + "_scale",
        F.when(F.col("_maxabs") > 0, F.lit(127.0) / F.col("_maxabs")).otherwise(
            F.lit(1.0)
        ),
    )
    return d.select(
        id_alias,
        p + "_scale",
        F.transform(
            "_e", lambda x: F.round(x * F.col(p + "_scale")).cast("int")
        ).alias(p + "_q"),
        F.sqrt(
            F.aggregate("_e", F.lit(0.0), lambda a, v: a + v * v)
        ).alias(p + "_norm"),
    )


def _approx_cut(approx: DataFrame, rerank: int) -> DataFrame:
    """Shared candidate cut: keep the top-`rerank` (query_id, neighbor_id)
    pairs by rounded approx_score, ties to the lowest neighbor — the one
    policy every quantized ANN path uses, so a tie-break tweak cannot
    desync one path from the oracles that replay it."""
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc("neighbor_id")
    )
    return (
        approx.withColumn("ark", F.row_number().over(wa))
        .filter(F.col("ark") <= rerank)
        .select("query_id", "neighbor_id")
    )


def _rerank_exact(
    cand: DataFrame, queries: DataFrame, corpus: DataFrame, k: int
) -> DataFrame:
    """Shared exact re-rank tail: score the candidate pairs on the FULL
    vectors (touching rerank x |queries| rows, never the corpus) and keep
    top-k — one implementation for SQ8, SQ8-over-IVF, PQ, and IVF+PQ."""
    qf = _with_norm(queries, "query_id", "q_emb", "q_norm")
    cf = _with_norm(corpus, "neighbor_id", "c_emb", "c_norm")
    exact = (
        cand.join(qf, "query_id")
        .join(cf, "neighbor_id")
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    return _rank_topk(exact, k)


def _pq_reconstructed(
    corpus: DataFrame,
    books: list[list[list[float]]],
    book_sq: list[list[float]],
) -> DataFrame:
    """(vec_id, r, r_norm): the PQ-encoded-then-reconstructed corpus —
    the shared encode path of topk_pq and topk_ivfpq. Encoding = argmin
    squared distance per subspace via the expanded form
    d2 = e.e - 2 e.c + cc (ties -> lowest code), one broadcast join
    against the n_sub*n_codes-row codebook + one groupBy argmin; at
    100 TB the codes are computed once and stored (build_ivf_index
    pattern) and the scan reads codes, not vectors."""
    spark = corpus.sparkSession
    n_sub = len(books)
    w = len(books[0][0])
    book_rows = [
        (s, i, c, book_sq[s][i])
        for s, cb in enumerate(books)
        for i, c in enumerate(cb)
    ]
    book_df = F.broadcast(
        spark.createDataFrame(book_rows, "sub int, cid int, c array<double>, cc double")
    )
    _, cnormed = _corpus_with_unit(corpus)
    subs = cnormed.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub"),
        "e",
    ).select(
        "vec_id", "sub", F.slice("e", F.col("sub") * w + 1, w).alias("es")
    )
    # argmin of d2 = e.e - 2 e.c + cc over codes: e.e is constant within
    # the (vec, sub) group, so the ranking key drops it — cc - 2 e.c —
    # halving the per-candidate HOF folds (the encode join is the plan's
    # hottest stage: |corpus| x n_sub x n_codes rows). The oracle orders
    # by the SAME reduced key so float near-ties cannot diverge.
    d2 = F.col("cc") - 2 * dot_arrays(F.col("es"), F.col("c"))
    codes = (
        subs.join(book_df, "sub")
        .select("vec_id", "sub", "cid", d2.alias("d2"))
        .groupBy("vec_id", "sub")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    )
    recon = (
        codes.join(book_df.select("sub", "cid", "c"), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "c"))),
                    lambda s: s["c"],
                )
            ).alias("r")
        )
    )
    return recon.select(
        "vec_id", "r", F.sqrt(dot_arrays(F.col("r"), F.col("r"))).alias("r_norm")
    )


def topk_sq8_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    n_lists: int = 16,
    max_iter: int = 3,
    rerank: int = 10,
    train_sample: int | None = 4096,
) -> DataFrame:
    """SQ8-over-IVF: the composed ANN plan you'd actually run at 100 TB —
    IVF k-means lists cut the CANDIDATE COUNT to ~nprobe/n_lists of the
    corpus (partition pruning once the cid is the table's partition key,
    see build_ivf_index), int8 scalar quantization cuts the candidate
    SCAN BANDWIDTH ~4x, and an exact re-rank on the top `rerank` full
    vectors restores accuracy (the FAISS IVF+SQ recipe). topk_sq8 alone
    quantizes but scans every candidate; topk_ivf_kmeans alone prunes
    but scores full vectors — this composes both halves, sharing their
    building blocks (_sq8 quantization, _assign_clusters,
    _probe_lists) so the pieces cannot drift from the forms the oracles
    already verify.

    Fully deterministic (driver-trained md5-sample centroids, rounded
    scores, id tiebreaks), so the generated DuckDB oracle replays the
    entire pipeline — candidates, quantized ranking, exact re-rank —
    value-exact (registry/similarity.py:make_sq8_ivf_oracle)."""
    if train_sample:
        cents = train_spherical_kmeans_driver(
            corpus, n_lists=n_lists, max_iter=max_iter, sample_size=train_sample
        )
    else:
        cents = train_spherical_kmeans(corpus, n_lists=n_lists, max_iter=max_iter)
    spark = corpus.sparkSession
    _, cnormed = _corpus_with_unit(corpus)
    assign_df = _assign_clusters(cnormed, _centroid_table(spark, cents))
    # int8-quantized corpus carrying its inverted-list id: the only
    # full-corpus relations in the plan are this (int8 + 2 doubles/row)
    # and the assignment — never a full-corpus float crossJoin
    cq = _sq8(corpus, "neighbor_id", "b").join(
        assign_df.select(
            F.col("vec_id").alias("neighbor_id"), F.col("cid").alias("probe_label")
        ),
        "neighbor_id",
    )
    qq = _sq8(queries, "query_id", "a")
    probed = _probe_lists(queries, cents, nprobe, label="probe_label").select(
        "query_id", "probe_label"
    )
    approx = (
        probed.join(qq, "query_id")
        .join(cq, "probe_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "approx_score",
            F.round(
                F.when(
                    (F.col("a_norm") > 0) & (F.col("b_norm") > 0),
                    (dot("a_q", "b_q") / (F.col("a_scale") * F.col("b_scale")))
                    / (F.col("a_norm") * F.col("b_norm")),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )
    return _rerank_exact(_approx_cut(approx, rerank), queries, corpus, k)


def topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    books: list[list[list[float]]],
    book_sq: list[list[float]],
    k: int = 3,
    rerank: int = 10,
) -> DataFrame:
    """Product-quantization ADC top-k: the corpus collapses to n_sub
    small integer codes per vector (8 codes here -- 8 BYTES per vector
    against 256 for float32, the deepest compression tier after SQ8's
    4x), approximate scores come from the code-reconstructed vectors,
    and an exact re-rank on the top `rerank` restores accuracy. Scoring
    against the reconstruction is mathematically the classic per-query
    ADC lookup-table sum (the dot distributes over the concatenated
    sub-centroids); expressing it as one reconstructed dot keeps the
    whole plan in JVM higher-order functions.

    `books[sub][code]` are the per-subspace centroids, `book_sq[sub]
    [code]` their precomputed squared norms (passed in, not recomputed,
    so the Spark plan and the generated oracle share the identical
    constant bits). Encoding = argmin squared distance per subspace via
    the expanded form d2 = e.e - 2 e.c + cc (ties -> lowest code), ONE
    broadcast join against the n_sub*n_codes-row codebook + one groupBy
    argmin -- at 100 TB the codes are computed once and stored like the
    IVF assignment (build_ivf_index pattern), and the scan reads codes,
    not vectors. Candidate generation here is the bounded-query scan
    (the bruteforce shape); compose with IVF lists for row pruning
    exactly like topk_sq8_ivf."""
    cr = _pq_reconstructed(corpus, books, book_sq).select(
        F.col("vec_id").alias("neighbor_id"), "r", "r_norm"
    )
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    approx = (
        q.crossJoin(cr)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "approx_score",
            _score(dot("q_emb", "r"), F.col("q_norm"), F.col("r_norm")),
        )
    )
    return _rerank_exact(_approx_cut(approx, rerank), queries, corpus, k)


def topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    cents: list[list[float]],
    books: list[list[list[float]]],
    book_sq: list[list[float]],
    k: int = 3,
    nprobe: int = 32,
    rerank: int = 50,
) -> DataFrame:
    """IVF+PQ: the full FAISS serving recipe in one plan -- k-means
    inverted lists prune ROWS to ~nprobe/n_lists of the corpus, PQ codes
    cut BYTES to 8 per candidate, and an exact re-rank on the top
    `rerank` restores accuracy. (Simplification vs textbook IVFPQ:
    codes quantize the vectors directly, not the per-list residuals --
    an IVFFlat+PQ hybrid -- which keeps one global codebook broadcast
    and, more importantly here, keeps encode semantics identical to
    topk_pq so both oracles share the replay machinery. Residual
    codebooks would add ~1 bit/dim of effective precision at the cost
    of n_lists codebooks.)

    Trained centroids and codebooks are passed in (both deterministic,
    driver-trained on the shared md5 sample), so the generated oracle
    embeds BOTH literal sets and replays list assignment, probing, PQ
    encoding, reconstruction, candidate ranking, and re-rank
    value-exact."""
    spark = corpus.sparkSession
    # inverted-list assignment (shared argmax) + PQ encode (shared with
    # topk_pq via _pq_reconstructed, so the two paths cannot drift)
    _, cnormed = _corpus_with_unit(corpus)
    assign_df = _assign_clusters(cnormed, _centroid_table(spark, cents))
    cr = _pq_reconstructed(corpus, books, book_sq).join(assign_df, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "r",
        "r_norm",
        F.col("cid").alias("probe_label"),
    )
    probed = _probe_lists(queries, cents, nprobe, label="probe_label")
    approx = (
        probed.join(cr, "probe_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "approx_score",
            _score(dot("q_emb", "r"), F.col("q_norm"), F.col("r_norm")),
        )
    )
    return _rerank_exact(_approx_cut(approx, rerank), queries, corpus, k)


def topk_sq8(
    queries: DataFrame, corpus: DataFrame, k: int = 3, rerank: int = 10
) -> DataFrame:
    """Cosine top-k over int8 SCALAR-QUANTIZED vectors with exact re-rank
    — the memory-scale path: at 100 TB the float32 corpus becomes int8 +
    two doubles per row (~4x less scan bandwidth), and the exact re-rank
    touches only `rerank` full vectors per query.

    Stage 1 ranks by reconstructed cosine dot_int(qa,qb)/(sa*sb)/(na*nb)
    (rounded to 4dp, ties on neighbor id) and keeps the top `rerank`
    candidates; stage 2 re-scores those exactly on the full vectors and
    keeps top k. Candidate generation here is the bounded-query
    crossJoin (the bruteforce shape); at scale SQ8 composes with
    IVF/banded-LSH candidates — quantization cuts bandwidth, not the
    candidate count."""
    q = _sq8(queries, "query_id", "a")
    c = _sq8(corpus, "neighbor_id", "b")
    approx = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "approx_score",
            F.round(
                F.when(
                    (F.col("a_norm") > 0) & (F.col("b_norm") > 0),
                    (dot("a_q", "b_q") / (F.col("a_scale") * F.col("b_scale")))
                    / (F.col("a_norm") * F.col("b_norm")),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )
    return _rerank_exact(_approx_cut(approx, rerank), queries, corpus, k)


N_BINARY_BITS = 256  # hyperplane count; 8 x 32-bit words = 32-byte codes
_BINARY_WORDS = N_BINARY_BITS // 32


def binary_hyperplanes(n_bits: int = N_BINARY_BITS, dim: int = 64):
    """Deterministic Gaussian sign-LSH hyperplanes shared by the Spark
    signature computation AND the DuckDB oracle generator (the
    kmeans_core one-implementation discipline) — entries rounded to 4
    decimals so the oracle's embedded literals are the exact doubles the
    engine broadcasts, not a re-serialization.

    Raw per-dim sign bits are useless on this corpus — the embeddings
    are near-isotropic (per-dim means within ±0.007), so 64 raw signs
    measured recall@3 = 0.22 at sf0.1. 256 random hyperplanes lift the
    Hamming↔cosine correlation to recall 0.89 (rerank=100) / 0.98
    (rerank=200) — see RECALL.json."""
    import numpy as np

    r = np.random.RandomState(42).standard_normal((n_bits, dim))
    return [[float(round(v, 4)) for v in row] for row in r]


def binary_signature(df: DataFrame, id_alias: str, p: str) -> DataFrame:
    """(id, p_w0..p_w7): 256 hyperplane sign bits — bit b = 1 iff
    dot(embedding, plane_b) >= 0 — packed into eight 32-bit words held
    in BIGINTs. 32 bytes of code per vector vs 256 bytes of float32:
    the 8x bandwidth cut of binary quantization.

    32-bit words so neither engine ever sums 2^63 into a signed
    accumulator: each word's fold stays below 2^32 and each bit is a
    distinct power of two, so plain SUM packs the word (no bit_or agg
    needed). The plane table ships as a BROADCAST 256-row join — not
    256x64 literal expression trees, the measured planning-time trap —
    and the pack is ONE groupBy with 8 conditional sums. At 100 TB the
    signature is computed once at ingest and stored (build_ivf_index
    pattern); the per-query stage reads only the 8 code words."""
    spark = df.sparkSession
    planes = binary_hyperplanes()
    hyp = F.broadcast(
        spark.createDataFrame(
            [(i, row) for i, row in enumerate(planes)],
            "bit_id int, r array<double>",
        )
    )
    # byte-light / CPU-heavy stage (|rows| x 256 HOF dot folds): pin the
    # parallelism — a single-file parquet reads as 1-2 partitions and
    # AQE coalesces by bytes, not CPU (the winnow/ngram-jaccard lesson;
    # measured 5.5 s -> 2.8 s median at sf0.1 for the full binary query)
    bits = (
        df.select(F.col("vec_id").alias(id_alias), F.col("embedding").alias("_e"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .join(hyp)
        .select(
            id_alias,
            F.expr("bit_id div 32").alias("_w"),
            F.when(
                dot("_e", "r") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit_id % 32 AS INT))"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("_b"),
        )
    )
    return bits.groupBy(id_alias).agg(
        *[
            F.sum(F.when(F.col("_w") == w, F.col("_b")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"{p}_w{w}")
            for w in range(_BINARY_WORDS)
        ]
    )


def topk_binary_hamming(
    queries: DataFrame, corpus: DataFrame, k: int = 3, rerank: int = 100
) -> DataFrame:
    """Cosine top-k over 1-bit BINARY-QUANTIZED vectors with exact
    re-rank — the extreme end of the quantization ladder this engine
    ships (float32 → SQ8 int8 → PQ 8-byte codes → 32-byte sign
    bitmaps). Candidates rank by binary similarity 256 − Hamming(q, c)
    (integer — no float rounding to desync from the oracle; ties →
    lowest neighbor_id via the shared _approx_cut policy), then the top
    `rerank` re-score exactly on full vectors via the shared
    _rerank_exact tail — the oversample-then-rescore recipe binary
    quantization always ships with.

    Scale shape: the Hamming stage reads 64 bytes/pair and is eight
    xors + eight popcounts — pure whole-stage-codegen integer math,
    memory-bound at the scan. Candidate generation here is the
    bounded-query crossJoin (the bruteforce shape, |queries| <= 100);
    at 100 TB the bitmaps are ingest-time columns and the stage
    composes with IVF list pruning exactly like topk_sq8_ivf."""
    q = binary_signature(queries, "query_id", "a")
    c = binary_signature(corpus, "neighbor_id", "b")
    ham = None
    for w in range(_BINARY_WORDS):
        t = F.bit_count(F.col(f"a_w{w}").bitwiseXOR(F.col(f"b_w{w}")))
        ham = t if ham is None else ham + t
    approx = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("approx_score", F.lit(N_BINARY_BITS) - ham)
    )
    return _rerank_exact(_approx_cut(approx, rerank), queries, corpus, k)


def mmr_diversify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-rank — the serving-side
    selection every retrieval stack runs after ANN: from each query's
    top-`pool` cosine candidates, greedily pick `k` maximizing
    mmr = λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s), so near-duplicate
    neighbors don't crowd the result list.

    Execution: the brute-force pool feeds mmr_from_candidates, which
    since r9 runs the whole greedy selection as ONE applyInPandas pass
    over query_id groups (per-query state is bounded: pool rels + pool
    embeddings → ≤ pool² pair sims) — see that function's docstring for
    the job-count rationale and the parity discipline (4dp-rounded
    scores, ties → lowest neighbor_id, Python re-walking the JVM fold
    order exactly so the k-stage CTE oracle matches bit-for-bit).

    Scale shape: the expensive part is candidate generation (any ANN
    tier); the greedy stage touches pool rows + pool² pair sims per
    query — constant in corpus size."""
    cand = topk_bruteforce(queries, corpus, k=pool).select(
        "query_id", "neighbor_id", F.col("score").alias("rel")
    )
    return mmr_from_candidates(cand, corpus, k=k, lam=lam)


def mmr_from_candidates(
    cand: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """The greedy MMR stage alone, with the candidate pool INJECTED —
    the composed serving shape: any ANN tier (IVF, LSH, binary sketch)
    produces (query_id, neighbor_id, rel) and this stage diversifies
    it. `rel` must be the 4dp-rounded cosine (the shared _score), so
    every tier feeds comparable relevance and an oracle can replay the
    greedy path exactly. mmr_diversify is this with a brute-force pool
    (the exactness anchor); sim_mmr_from_ivf in the registry is this
    over trained-IVF candidates (the 100 TB shape — candidate cost
    drops from full-scan to nprobe/n_lists of the corpus while the
    greedy loop stays constant-size).

    Greedy execution (r9): the per-query state is bounded (pool rels +
    pool embeddings → ≤ pool² pair sims), so the whole selection runs
    in ONE applyInPandas pass over query_id groups instead of the r8
    form's k−1 chained join/window jobs plus a pairsim self-join and
    three eager checkpoints — each extra job paid ~1 s of fixed
    overhead at sf0.1 (measured: the greedy stage alone fell 4.7 s →
    ~0.5 s; the candidate tier is now the whole cost). The single
    Spark-side step is a broadcast join attaching each candidate's
    embedding (cand is bounded by |queries|·pool — ALWAYS the broadcast
    side; the corpus streams, never collects).

    Parity discipline — Python re-walks the JVM arithmetic exactly:
    pair sims use the same sequential left-fold the zip_with/aggregate
    expressions execute (functions/vectors.py pins the fold order;
    float→double widening is exact, CPython does no FMA), the zero-norm
    guard matches _score, λ and (1−λ) are the same Python doubles Spark
    embeds as literals, and rounding uses _round_like_spark: Spark's
    F.round on a double is BigDecimal.valueOf(x) — Java's SHORTEST-repr
    string, the same string CPython's repr produces — quantized
    HALF_UP, which CPython's round() does NOT reproduce (round() is
    correctly-rounded on the exact binary value: for the boundary
    double 0.14945, shortest repr "0.14945" but exact binary
    0.1494499…, Spark/DuckDB say 0.1495, round() says 0.1494; caught by
    the parity gate on sim_mmr_from_ivf's query 86 before commit). So
    the k-stage CTE oracle replays the identical greedy path."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd  # local imports: keep the module JVM-side-first

    from pyspark.sql import types as T

    one_minus = 1.0 - lam  # the EXACT double Spark/DuckDB embed as a literal
    quantum = Decimal(1).scaleb(-4)

    def _round_like_spark(x: float) -> float:
        # BigDecimal.valueOf(double) == Decimal(repr(double)): both are
        # the shortest round-trip decimal string; then HALF_UP at 4dp
        return float(Decimal(repr(x)).quantize(quantum, rounding=ROUND_HALF_UP))

    grouped = corpus.select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    ).join(F.broadcast(cand.select("query_id", "neighbor_id", "rel")), "neighbor_id")

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("rel", T.DoubleType()),
            T.StructField("mmr_rank", T.IntegerType()),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rels: dict[int, float] = {}
        embs: dict[int, list[float]] = {}
        norms: dict[int, float] = {}
        for n, r, e in zip(pdf["neighbor_id"], pdf["rel"], pdf["embedding"]):
            n = int(n)
            rels[n] = float(r)
            v = [float(x) for x in e]  # float32 → double widening, exact
            embs[n] = v
            acc = 0.0
            for x in v:  # l2_norm's sequential left fold
                acc = acc + x * x
            norms[n] = math.sqrt(acc)

        ps_memo: dict[tuple[int, int], float] = {}

        def ps(n: int, s: int) -> float:
            key = (n, s) if n < s else (s, n)  # dot is order-symmetric
            hit = ps_memo.get(key)
            if hit is None:
                if norms[n] > 0 and norms[s] > 0:
                    va, vb = embs[n], embs[s]
                    acc = 0.0
                    for i in range(len(va)):  # dot's sequential left fold
                        acc = acc + va[i] * vb[i]
                    hit = _round_like_spark(acc / (norms[n] * norms[s]))
                else:
                    hit = 0.0  # _score's zero-norm guard
                ps_memo[key] = hit
            return hit

        remaining = sorted(rels)
        selected: list[int] = []
        rows = []
        for step in range(1, k + 1):
            if not remaining:
                break
            if not selected:
                # rank 1: highest rel, ties -> lowest neighbor_id
                best = min(remaining, key=lambda n: (-rels[n], n))
            else:
                best = min(
                    remaining,
                    key=lambda n: (
                        -_round_like_spark(
                            lam * rels[n]
                            - one_minus * max(ps(n, s) for s in selected)
                        ),
                        n,
                    ),
                )
            selected.append(best)
            remaining.remove(best)
            rows.append((qid, best, rels[best], step))
        return pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "rel", "mmr_rank"]
        )

    return (
        grouped.groupBy("query_id")
        .applyInPandas(greedy, out_schema)
        .orderBy("query_id", "mmr_rank")
    )


def pca_core(x, n_components: int = 8):
    """Shared NumPy PCA used by BOTH the Spark-side trainer
    (train_pca_driver) and the DuckDB oracle generator
    (registry/similarity.py:make_pca_oracle) — one implementation, so
    the two trainings are bit-identical by construction (the kmeans_core
    discipline). `x` is the (n, d) unit-vector sample sorted by vec_id.

    Mean-center, covariance eigendecomposition (np.linalg.eigh —
    symmetric, ascending eigenvalues), top `n_components` by descending
    eigenvalue; each component's sign is fixed so its
    largest-|coefficient| entry is positive (eigenvector sign is
    otherwise arbitrary). Returns (mu: [d], comps: [n_components][d])."""
    import numpy as np

    mu = x.mean(axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / len(x)
    _, v = np.linalg.eigh(cov)
    comps = []
    for i in range(1, n_components + 1):
        c = v[:, -i]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append([float(t) for t in c])
    return [float(t) for t in mu], comps


def pca_mudots(mu: list[float], comps: list[list[float]]) -> list[float]:
    """mu·v_k per component, as ONE shared sequential Python fold so the
    Spark query and the oracle generator embed the identical double."""
    return [sum(m * c for m, c in zip(mu, comp)) for comp in comps]


def train_pca_driver(
    corpus: DataFrame, n_components: int = 8, sample_size: int = 4096
):
    """PCA trained driver-side on the same bounded deterministic
    md5-hash unit-vector sample as the k-means / PQ quantizers
    (collect_unit_sample): the principal subspace needs O(sample × d)
    data, never the corpus — a 2 MB collect at 100 TB as at 1 GB — and
    training is one d×d eigendecomposition (64×64 here), zero Spark
    jobs. The full-corpus work (projection) stays distributed."""
    x = collect_unit_sample(corpus, sample_size)
    return pca_core(x, n_components)


def project_pca(
    corpus: DataFrame,
    mu: list[float],
    comps: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed projection onto the trained principal components —
    LONG format (vec_id, pc_id, value): value = u·v_k − mu·v_k over the
    unit-normalized embedding, rounded to 4.

    The components ship as a BROADCAST 8-row table and the dot product
    runs on two array COLUMNS via zip_with/aggregate — not as 8×64
    literal expression trees, which is the planning-time trap the
    k-means assignment already measured (16 s → 4 s when switched to a
    broadcast join). Long format also avoids a pivot shuffle; consumers
    needing wide columns pivot the 8-row-per-vec result themselves."""
    spark = corpus.sparkSession
    mud = pca_mudots(mu, comps)
    ctab = spark.createDataFrame(
        [(k + 1, comps[k], float(mud[k])) for k in range(len(comps))],
        schema="pc_id int, comp array<double>, mudot double",
    )
    norm = corpus.select(
        id_col,
        l2_norm(emb_col).alias("_n"),
        F.col(emb_col).alias("_e"),
    ).select(
        id_col,
        F.when(
            F.col("_n") > 0,
            F.transform("_e", lambda x: x.cast("double") / F.col("_n")),
        )
        .otherwise(F.transform("_e", lambda x: x.cast("double")))
        .alias("u"),
    )
    return norm.join(F.broadcast(ctab)).select(
        id_col,
        "pc_id",
        F.round(dot("u", "comp") - F.col("mudot"), 4).alias("value"),
    )


def topk_ivf_kmeans_incremental(
    queries: DataFrame,
    base: DataFrame,
    delta: DataFrame,
    cents: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search over an INCREMENTALLY maintained index: `base` was
    assigned to the coarse quantizer `cents` at build time, `delta` is
    a later ingest batch assigned with the SAME centroids — no retrain,
    no reassignment of old rows. Because assignment is element-wise,
    assign(base) ∪ assign(delta) ≡ assign(base ∪ delta), so serving
    over the union is EXACTLY the one-shot index — the invariant every
    100 TB vector store's ingest path rests on (you re-quantize rarely
    and append daily). The registry checks this equivalence against the
    one-shot oracle chain (two implementations, one oracle — the
    dedup_prefix_filter_jaccard proof pattern).

    Both slices run the same shared helpers as topk_ivf_kmeans /
    build_ivf_index, so per-call and incremental semantics cannot
    drift."""
    spark = queries.sparkSession
    cent_df = _centroid_table(spark, cents)
    parts = []
    for sl in (base, delta):
        cvec, cnormed = _corpus_with_unit(sl)
        a = _assign_clusters(cnormed, cent_df)
        parts.append(cvec.join(a, "vec_id"))
    indexed = parts[0].unionByName(parts[1]).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "c_norm",
        F.col("cid").alias("probe_label"),
    )
    probed = _probe_lists(queries, cents, nprobe, label="probe_label")
    pairs = (
        probed.join(indexed, "probe_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    return _rank_topk(pairs, k)


def topk_ivf_graph_refined(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    n_lists: int = 8,
    max_iter: int = 5,
    train_sample: int | None = 4096,
) -> DataFrame:
    """Graph-refined IVF search (one NN-descent round): run the IVF
    search for the queries, then AGAIN for the distinct neighbors it
    returned, and exact-re-rank each query over the UNION of its own
    candidates and its neighbors' candidates — "my neighbor's neighbor
    is probably my neighbor", the expansion DiskANN/NN-descent builds
    on. Recovers true neighbors that sit in lists the query never
    probed but its near-neighbors did, WITHOUT raising nprobe for every
    query: the second pass is bounded by |queries|·k distinct nodes,
    not the corpus.

    Both passes share the deterministic trainer, so an oracle replays
    the whole composition from the same centroid literals. Exact
    re-rank keeps the output a strict improvement in expectation —
    candidates only grow."""
    if train_sample:
        cents = train_spherical_kmeans_driver(
            corpus, n_lists=n_lists, max_iter=max_iter, sample_size=train_sample
        )
    else:
        cents = train_spherical_kmeans(corpus, n_lists=n_lists, max_iter=max_iter)
    spark = corpus.sparkSession
    cvec, cnormed = _corpus_with_unit(corpus)
    assign_df = _assign_clusters(cnormed, _centroid_table(spark, cents))
    # BOTH IVF passes (r1 eager, r2 in the final plan) consume the
    # assigned corpus; without a persist the full corpus is re-scanned
    # and re-assigned per pass (separate jobs — ReuseExchange cannot
    # span them). r12 rejected this persist, but that A/B predates the
    # clean-cache bench fix (the un-persisted r2 pass was being served
    # by stale CacheManager entries, hiding the recompute): re-measured
    # r13 under clearCache-per-sample it wins decisively — med 4.12 s
    # vs 6.35 s, min 3.56 vs 5.34. At scale this is the IVF index
    # materialization itself (the serving tier writes exactly this
    # relation to disk — _serving_ivf_index); MEMORY_AND_DISK persist
    # spills rather than OOMs.
    indexed = (
        cvec.join(assign_df, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            "c_norm",
            F.col("cid").alias("probe_label"),
        )
        .persist()
    )

    def ivf_pass(qdf: DataFrame) -> DataFrame:
        probed = _probe_lists(qdf, cents, nprobe, label="probe_label")
        pairs = (
            probed.join(indexed, "probe_label")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "score",
                _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm")),
            )
        )
        return _rank_topk(pairs, k).select("query_id", "neighbor_id")

    r1 = ivf_pass(queries).localCheckpoint(eager=True)
    nbr_ids = r1.select(F.col("neighbor_id").alias("vec_id")).distinct()
    q2 = corpus.join(nbr_ids, "vec_id").select("vec_id", "embedding")
    r2 = ivf_pass(q2)
    expanded = r1.select(
        F.col("query_id"), F.col("neighbor_id").alias("cand")
    ).unionByName(
        r1.join(
            r2.select(
                F.col("query_id").alias("neighbor_id"),
                F.col("neighbor_id").alias("cand"),
            ),
            "neighbor_id",
        ).select("query_id", "cand")
    )
    cand = (
        expanded.filter(F.col("query_id") != F.col("cand"))
        .select("query_id", F.col("cand").alias("neighbor_id"))
        .distinct()
    )
    qn = _with_norm(queries, "query_id", "q_emb", "q_norm")
    scored = (
        cand.join(qn, "query_id")
        .join(
            cvec.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"),
                "c_norm",
            ),
            "neighbor_id",
        )
        .withColumn(
            "score", _score(dot("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm"))
        )
    )
    return _rank_topk(scored, k)
