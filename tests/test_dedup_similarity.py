"""Unit tests: dedup operators (exact/jaccard/minhash/simhash), similarity
search, multimodal plumbing, streaming windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
    word_shingles,
)
from python_multiproc_bigdata_spark.operators.multimodal import (
    attach_binary,
    decode_media,
    extract_features,
    fake_decode,
)
from python_multiproc_bigdata_spark.operators.similarity import (
    neardup_pairs_cosine,
    topk_bruteforce,
    topk_lsh,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different text about spark engines here"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "tiny"),  # < 3 tokens → no shingles
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicate_groups(spark, docs):
    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].keeper == 1 and groups[0].n_copies == 2


def test_shingles_and_jaccard(spark, docs):
    sh = word_shingles(docs).collect()
    assert not any(r.id == 5 for r in sh)  # too short → none
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0  # exact dup
    assert 0.5 <= pairs[(1, 2)] < 1.0  # near dup
    assert (1, 3) not in pairs


def test_minhash_lsh_finds_neardups(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs


def test_simhash_properties(spark, docs):
    sh = {r.id: r.simhash for r in simhash16(docs).collect()}
    assert sh[1] == sh[4]  # identical text → identical simhash
    assert all(len(v) == 16 and set(v) <= {"0", "1"} for v in sh.values())
    ham_12 = sum(a != b for a, b in zip(sh[1], sh[2]))
    ham_13 = sum(a != b for a, b in zip(sh[1], sh[3]))
    assert ham_12 < ham_13  # near-dup closer than unrelated


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0, 0.0], 0),
    (2, [0.0, 1.0, 0.0, 0.0], 1),
    (3, [-1.0, 0.0, 0.0, 0.0], 1),
    (4, [0.0, 0.0, 0.0, 0.0], 2),  # zero vector
]


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int"
    )


def test_topk_bruteforce(spark, vecs):
    out = topk_bruteforce(vecs.filter("vec_id = 0"), vecs, k=2).collect()
    assert [(r.neighbor_id, r.rk) for r in out] == [(1, 1), (2, 2)]
    assert out[0].score > 0.99


def test_zero_vector_cosine_is_zero(spark, vecs):
    out = topk_bruteforce(vecs.filter("vec_id = 4"), vecs, k=4).collect()
    assert all(r.score == 0.0 for r in out)


def test_topk_lsh_bucket_restricts(spark, vecs):
    # bits=1: bucket on sign of dim 0 → vec 0's bucket {0,1,2,4} (>=0)
    out = topk_lsh(vecs.filter("vec_id = 0"), vecs, k=4, bits=1).collect()
    assert {r.neighbor_id for r in out} == {1, 2, 4}  # 3 is in the '0' bucket


def test_topk_ivf_probes_top_lists(spark, vecs):
    from python_multiproc_bigdata_spark.operators.similarity import topk_ivf

    # reps (min vec_id per label): label0→vec0, label1→vec2, label2→vec4.
    # query 0 scores reps: label0=1.0, label1=0.0, label2=0.0 (zero norm).
    q = vecs.filter("vec_id = 0")
    one = {r.neighbor_id for r in topk_ivf(q, vecs, k=4, nprobe=1).collect()}
    assert one == {1}  # only label 0's list searched (self excluded)
    # nprobe=2: 0.0-tie between labels 1 and 2 breaks to the lower label
    two = {r.neighbor_id for r in topk_ivf(q, vecs, k=4, nprobe=2).collect()}
    assert two == {1, 2, 3}


def test_neardup_cosine(spark, vecs):
    pairs = {(r.id_a, r.id_b) for r in neardup_pairs_cosine(vecs, 0.9).collect()}
    assert pairs == {(0, 1)}


def test_multiprobe_recovers_cross_hyperplane_neighbor(spark):
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_lsh,
        topk_lsh_multiprobe,
    )

    # q and n are near-identical but dim0's sign differs → different bucket
    rows = [
        (0, [0.01, 1.0, 1.0, 1.0], 0),
        (1, [-0.01, 1.0, 1.0, 1.0], 0),
        (2, [1.0, -1.0, -1.0, -1.0], 1),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = vecs.filter("vec_id = 0")
    plain = {r.neighbor_id for r in topk_lsh(q, vecs, k=3, bits=2).collect()}
    probed = {r.neighbor_id for r in topk_lsh_multiprobe(q, vecs, k=3, bits=2).collect()}
    assert 1 not in plain  # lost across the hyperplane
    assert 1 in probed     # recovered by the one-bit probe


def test_topk_numpy_matches_jvm(spark):
    """The BLAS-vectorized path must agree with the exact JVM fold on
    neighbor sets and rank order (scores may differ at ulp scale)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        topk_bruteforce,
        topk_bruteforce_np,
    )
    from python_multiproc_bigdata_spark.registry.common import prep, table

    emb = table(prep(spark), "/root/testdata/sf0.001", "embeddings")
    q = emb.filter("vec_id < 20")
    jvm = {(r.query_id, r.rk): (r.neighbor_id, r.score) for r in topk_bruteforce(q, emb, k=3).collect()}
    np_ = {(r.query_id, r.rk): (r.neighbor_id, r.score) for r in topk_bruteforce_np(q, emb, k=3).collect()}
    assert jvm.keys() == np_.keys()
    for key in jvm:
        assert jvm[key][0] == np_[key][0], key  # same neighbor
        assert abs(jvm[key][1] - np_[key][1]) < 1e-3, key  # score within tol


def test_topk_agg_matches_window(spark, vecs):
    from python_multiproc_bigdata_spark.operators.similarity import (
        _scored_pairs,
        topk_by_group_agg,
    )

    scored = _scored_pairs(vecs, vecs)
    via_agg = {
        (r.query_id, r.neighbor_id, r.score, r.rk)
        for r in topk_by_group_agg(scored, "query_id", "score", "neighbor_id", 2).collect()
    }
    via_window = {
        (r.query_id, r.neighbor_id, r.score, r.rk)
        for r in topk_bruteforce(vecs, vecs, k=2).collect()
    }
    assert via_agg == via_window


def test_multimodal_plumbing(spark, docs):
    feats = extract_features(attach_binary(docs, "text")).collect()
    assert len(feats) == len(DOCS)
    by_id = {r.doc_id: r for r in feats}
    assert by_id[1].digest == by_id[4].digest  # same bytes → same digest
    assert by_id[1].n_bytes == len(DOCS[0][1].encode())
    assert 0 <= by_id[1].width < 1024 and 0 <= by_id[1].height < 1024
    w, h = fake_decode(DOCS[0][1].encode())
    assert (by_id[1].width, by_id[1].height) == (w, h)
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes")


def test_streaming_session_and_dedup(spark, tmp_path):
    """Session windows + watermark dedup on a small parquet stream."""
    from python_multiproc_bigdata_spark.streaming.windows import (
        dedup_within_watermark,
        run_to_memory,
        session_counts,
        stream_events,
    )

    # two users; user 1 has two sessions (gap > 30 min); one dup event_id
    rows = [
        (1, 1_000_000_000_000_000_000, 1, "view", 1.0, "{}"),
        (2, 1_000_000_060_000_000_000, 1, "view", 1.0, "{}"),
        (3, 1_000_010_000_000_000_000, 1, "click", 1.0, "{}"),
        (4, 1_000_000_000_000_000_000, 2, "view", 1.0, "{}"),
        (4, 1_000_000_000_000_000_000, 2, "view", 1.0, "{}"),
    ]
    # single parquet FILE named events.parquet (matching the harness layout
    # stream_events globs for), not a Spark-written directory
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.int64()),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    ev = stream_events(spark, str(tmp_path))

    dedup = run_to_memory(
        dedup_within_watermark(ev, ["event_id"]), mode="append"
    )
    assert dedup.count() == 4  # the duplicate event_id collapsed

    # append mode would withhold the final sessions until the watermark
    # passes them (needs future data); complete mode emits every session.
    sess = session_counts(ev, gap="30 minutes", watermark="0 seconds")
    got = run_to_memory(sess, mode="complete").collect()
    from python_multiproc_bigdata_spark.streaming.windows import running_user_totals

    totals = run_to_memory(running_user_totals(ev), mode="update").collect()
    by_user = {r.user_id: (r.n_events, r.total_value) for r in totals}
    assert by_user == {1: (3, 3.0), 2: (2, 2.0)}

    # the transformWithStateInPandas twin must agree row-for-row.
    # The TWS state server speaks protobuf; this container's protobuf is
    # broken (ImportError on google.protobuf.descriptor), so skip there.
    try:
        from google.protobuf import descriptor  # noqa: F401

        _has_protobuf = True
    except ImportError:
        _has_protobuf = False
    if _has_protobuf:
        from python_multiproc_bigdata_spark.streaming.windows import (
            running_user_totals_tws,
            use_rocksdb_state_store,
        )

        # RocksDB provider is an explicit session-wide opt-in now (the
        # operator no longer mutates the session); restore afterwards
        prev = use_rocksdb_state_store(ev.sparkSession)
        try:
            tws = run_to_memory(running_user_totals_tws(ev), mode="update").collect()
            assert {r.user_id: (r.n_events, r.total_value) for r in tws} == by_user
        finally:
            key = "spark.sql.streaming.stateStore.providerClass"
            if prev is None:
                ev.sparkSession.conf.unset(key)
            else:
                ev.sparkSession.conf.set(key, prev)

    # foreachBatch multi-sink: one micro-batch fanned out to two sinks
    from python_multiproc_bigdata_spark.streaming.windows import (
        foreach_batch_multi_sink,
    )

    seen = {"a": 0, "b": 0}

    def sink_a(df):
        seen["a"] += df.count()

    def sink_b(df):
        seen["b"] += df.count()

    q = foreach_batch_multi_sink(ev, [sink_a, sink_b])
    q.processAllAvailable()
    q.stop()
    assert seen == {"a": 5, "b": 5}
    per_user = {}
    for r in got:
        per_user.setdefault(r.user_id, 0)
        per_user[r.user_id] += 1
    assert per_user[1] == 2  # two sessions for user 1
    assert per_user[2] == 1


def test_streaming_cdc_apply_version_wins_over_arrival_order(spark, tmp_path):
    # a LATE-arriving OLD version must not clobber a newer row: files are
    # named so version 2 streams in the FIRST micro-batch and version 1
    # in the second — the version-aware merge must still keep version 2
    import os

    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.streaming.windows import (
        foreach_batch_cdc_apply,
    )

    target = str(tmp_path / "target")
    changes = tmp_path / "changes"
    changes.mkdir()
    base = spark.createDataFrame(
        [(k, 0.0, 0) for k in range(5)], "k long, v double, version int"
    )
    base.write.parquet(target)
    newer = spark.createDataFrame([(1, 2.0, 2)], "k long, v double, version int")
    older = spark.createDataFrame([(1, 1.0, 1), (3, 3.0, 1)], "k long, v double, version int")
    for name, df in (("00.parquet", newer), ("01.parquet", older)):
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), str(changes / name))
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(changes))
    )
    q = foreach_batch_cdc_apply(
        stream, target, ["k"], "version", checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {r.k: (r.v, r.version) for r in spark.read.parquet(target).collect()}
    assert got == {0: (0.0, 0), 1: (2.0, 2), 2: (0.0, 0), 3: (3.0, 1), 4: (0.0, 0)}


def test_multimodal_resize_and_frame_sample(spark):
    import hashlib

    from python_multiproc_bigdata_spark.operators.multimodal import (
        FRAME_BYTES,
        attach_binary,
        resize_media,
        sample_frames,
    )

    texts = [
        (1, "x" * (FRAME_BYTES * 7 + 10)),  # 8 chunks → sampled idx 0,2,4,6
        (2, "short"),                        # 1 chunk → idx 0 only
        (3, ""),                             # empty → no frames
    ]
    media = attach_binary(spark.createDataFrame(texts, ["doc_id", "text"]))

    frames = sample_frames(media, every_n=2, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 2, 4, 6]
    # last sampled frame of doc 1 is the partial 10-byte tail? idx 6 is
    # full; the 8th chunk (idx 7, 10 bytes) is skipped by every_n=2
    assert all(r.n_frame_bytes == FRAME_BYTES for r in by_doc[1])
    assert [r.frame_idx for r in by_doc[2]] == [0]
    assert by_doc[2][0].n_frame_bytes == 5
    assert by_doc[2][0].frame_digest == hashlib.md5(b"short").hexdigest()
    assert 3 not in by_doc

    resized = {r.doc_id: r for r in resize_media(media, 64, 64).collect()}
    cap = 64 * 64 // 64
    assert resized[1].n_bytes == cap  # truncated to the fake-resize cap
    assert resized[2].n_bytes == 5    # smaller payload passes through
    assert bytes(resized[2].media) == b"short"
    assert resized[1].digest == hashlib.md5(b"x" * cap).hexdigest()


def test_knn_classify_self_consistent(spark):
    """Each query's prediction carries 1..k votes and matches the
    plurality label of its exact top-5 neighbors."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.similarity import (
        knn_classify,
        topk_bruteforce,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    out = knn_classify(queries, emb, k=5).collect()
    assert len(out) == 20
    assert all(1 <= r.votes <= 5 for r in out)
    labels = {r.vec_id: r.label for r in emb.collect()}
    topk = topk_bruteforce(queries, emb, k=5).collect()
    from collections import Counter, defaultdict

    by_q = defaultdict(list)
    for r in topk:
        by_q[r.query_id].append(labels[r.neighbor_id])
    for r in out:
        counts = Counter(by_q[r.query_id])
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r.predicted_label, r.votes) == best


def test_sq8_rerank_matches_exact_topk(spark):
    """With rerank covering the whole corpus-side candidate pool the SQ8
    path must equal the exact brute-force ranking (quantization only
    reorders the CANDIDATE stage; the re-rank is exact)."""
    from python_multiproc_bigdata_spark.operators.similarity import topk_sq8

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    exact = topk_bruteforce(queries, emb, k=3)
    sq = topk_sq8(queries, emb, k=3, rerank=n)
    a = {(r.query_id, r.rk): r.neighbor_id for r in exact.collect()}
    b = {(r.query_id, r.rk): r.neighbor_id for r in sq.collect()}
    assert a == b


def test_salted_count_equals_plain_count(spark):
    from python_multiproc_bigdata_spark.operators.skew import salted_count_per_key

    df = spark.range(0, 5000).select((F.col("id") % 7).alias("k"))
    # make key 0 hot: union 5000 extra rows of the same key
    hot = spark.range(0, 5000).select(F.lit(0).alias("k"))
    df = df.union(hot)
    out = {r.k: r.n for r in salted_count_per_key(df, ["k"], out_col="n").collect()}
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == plain


def test_edit_distance_blocking_finds_cross_bucket_pair(spark):
    # lengths 31 and 33 land in buckets 0 and 1 — only the adjacent-
    # bucket probe can pair them; dist = 2 (two appended chars)
    a = "x" * 31
    b = a + "yz"
    df = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en"), (3, "q" * 200, "en")],
        "doc_id long, text string, lang string",
    )
    from python_multiproc_bigdata_spark.operators.dedup import (
        blocked_edit_distance_pairs,
    )

    rows = blocked_edit_distance_pairs(
        df, prefix_len=64, bucket_width=32, max_dist=20
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in rows] == [(1, 2, 2)]


def test_edit_distance_blocking_rejects_unsound_config(spark):
    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.dedup import (
        blocked_edit_distance_pairs,
    )

    df = spark.createDataFrame([(1, "a", "en")], "doc_id long, text string, lang string")
    with _pytest.raises(ValueError, match="bucket_width"):
        blocked_edit_distance_pairs(df, bucket_width=16, max_dist=16)


def test_hybrid_rrf_bounds_and_shape(spark):
    """Fusion invariants at sf0.001: exactly 5 ranked rows per query,
    rrf bounded by the two-tower maximum 2/(60+1), and every fused
    score is a sum of at most two reciprocal-rank terms (so the
    smallest possible value is 1/(60+10))."""
    from python_multiproc_bigdata_spark.registry.similarity import (
        sim_hybrid_rrf,
    )

    rows = sim_hybrid_rrf(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 20
    for q, rs in by_q.items():
        assert sorted(r.rk for r in rs) == [1, 2, 3, 4, 5], q
        for r in rs:
            assert 1 / 70 - 1e-9 <= r.rrf <= 2 / 61 + 1e-9, (q, r)


def test_prefix_filter_jaccard_equals_all_pairs(spark):
    """The PPJoin prefix filter must be LOSSLESS: identical pair set and
    jaccard values as the all-pairs path at sf0.001, plus a crafted
    10-shingle near-dup pair (|d| a multiple of 5 — the float-ceil trap
    the rational threshold math exists for)."""
    from python_multiproc_bigdata_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r.doc_a, r.doc_b, r.jaccard) for r in ngram_jaccard_pairs(docs, 0.8).collect()}
    b = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, 4, 5).collect()
    }
    assert a == b and len(b) > 0

    # crafted: 12 tokens -> 10 trigram shingles; drop-one-word twin gives
    # 9/11-ish overlap... make overlap exactly >= 0.8: share 9 of 10
    words = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb"
    twin = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa XX"
    tiny = spark.createDataFrame(
        [(1, words), (2, twin), (3, "zz yy xx ww vv uu")], ["doc_id", "text"]
    )
    ta = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(tiny, 0.8).collect()}
    tb = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_jaccard_pairs(tiny, 4, 5).collect()
    }
    assert ta == tb == {(1, 2)}


def test_incremental_novelty_exact_arm(spark, tmp_path):
    """The harness corpus has no exact cross-source dups, so the exact
    arm is exercised on a crafted snapshot: src0 carries one verbatim
    copy (whitespace-normalized) of an accepted doc, one near-dup, and
    one novel doc."""
    from python_multiproc_bigdata_spark.registry.dedup import (
        dedup_incremental_novelty,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "en", "src1", len(base)),
        (2, "totally different text with unrelated words entirely", "en", "src2", 10),
        (10, "  ALPHA beta gamma delta epsilon zeta eta theta iota kappa ", "en", "src0", 10),
        (11, base + " lambda", "en", "src0", 10),   # near-dup of doc 1
        (12, "qq ww ee rr tt yy uu ii oo pp", "en", "src0", 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / "snap"
    df.write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r.verdict for r in dedup_incremental_novelty(spark, str(d)).collect()}
    assert got[10] == "exact_dup"
    assert got[11] == "near_dup"
    assert got[12] == "novel"


def test_incremental_prefix_filter_matches_crossing_subset(spark):
    """r13: the asymmetric candidate generator must return EXACTLY the
    boundary-crossing subset of the symmetric prefix-filter pairs (same
    full-union frequency model, same threshold), with doc_a always the
    incoming side — including incoming docs near-duplicating EACH OTHER
    (must NOT pair) and accepted-accepted near-dups (must not pair)."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.dedup import (
        incremental_prefix_filter_pairs,
        prefix_filter_jaccard_pairs,
    )

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb"
    rows = [
        # accepted corpus: 1-2 near-dup each other, 3 unrelated
        (1, base, "srcA"),
        (2, base.replace("wb", "XX"), "srcA"),
        (3, "zz yy xx ww vv uu tt ss rr qq pp oo", "srcB"),
        # incoming: 10 near-dups accepted 1/2; 11+12 near-dup EACH
        # OTHER only; 13 novel
        (10, base.replace("w0", "Y0"), "src0"),
        (11, "k0 k1 k2 k3 k4 k5 k6 k7 k8 k9 ka kb", "src0"),
        (12, "k0 k1 k2 k3 k4 k5 k6 k7 k8 k9 ka KX", "src0"),
        (13, "n0 n1 n2 n3 n4 n5 n6 n7 n8 n9", "src0"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sym = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(df, 4, 5).collect()
    }
    # crossing subset, re-oriented so the src0 side leads
    src = {r.doc_id: r.source for r in df.select("doc_id", "source").collect()}
    want = {
        ((a, b, j) if src[a] == "src0" else (b, a, j))
        for a, b, j in sym
        if (src[a] == "src0") != (src[b] == "src0")
    }
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_prefix_filter_pairs(
            df, F.col("source") == "src0", 4, 5
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture exercises the crossing arm
    assert (11, 12) not in {(a, b) for a, b, _ in got}  # inc x inc excluded
    assert all(src[a] == "src0" and src[b] != "src0" for a, b, _ in got)


def test_ppm_decode_real_parser(spark):
    """The REAL decode path (r5): decode_ppm must parse bytes it did not
    synthesize — a hand-written P6 with multi-digit dims, a comment, and
    known channel sums — and reject malformed payloads loudly."""
    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_ppm,
        decode_ppm,
        decode_ppm_features,
        synth_ppm,
    )

    # hand-written 2x2 image: pixels (R,G,B) = (10,20,30) (40,50,60)
    # (70,80,90) (100,110,120); comment between dims and maxval
    raw = b"P6\n2 2\n# a comment\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )
    assert decode_ppm(raw) == (2, 2, 255, 4, 220, 260, 300)

    with _pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)
    with _pytest.raises(ValueError, match="truncated raster"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11)
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)

    # synth → decode roundtrip agrees with direct arithmetic
    for doc_id in (0, 3, 17):
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        got = decode_ppm(synth_ppm(doc_id))
        exp = [0, 0, 0]
        for i in range(3 * w * h):
            exp[i % 3] += (doc_id * 31 + i * 7) % 256
        assert got == (w, h, 255, w * h, *exp)

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_ppm_features(attach_ppm(df)).collect()}
    assert rows[9].width == 4 + 9 % 5 and rows[9].height == 3 + 9 % 4
    assert rows[1].n_pixels == rows[1].width * rows[1].height


def test_bmp_decode_real_parser(spark):
    """The BMP decoder (r8) must un-do the format's real quirks —
    bottom-up rows, BGR byte order, 4-byte stride padding, and the
    top-down negative-height variant — on bytes it did not synthesize,
    and reject malformed payloads loudly."""
    import struct

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_bmp,
        bmp_raster,
        decode_bmp,
        decode_bmp_features,
        synth_bmp,
    )

    def hand_bmp(w, h, pixels_rgb, top_down=False):
        stride = (3 * w + 3) // 4 * 4
        pad = b"\x00" * (stride - 3 * w)
        ys = range(h) if top_down else range(h - 1, -1, -1)
        raster = b"".join(
            b"".join(
                bytes(pixels_rgb[y * w + x][::-1]) for x in range(w)
            )
            + pad
            for y in ys
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
            len(raster), 2835, 2835, 0, 0,
        )
        return struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54) + info + raster

    # hand-written 2x2: known pixels, known channel sums — and the
    # stride pad (3*2=6 -> stride 8) is exercised
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    assert decode_bmp(hand_bmp(2, 2, px)) == (2, 2, 4, 220, 260, 300)
    # top-down negative-height storage decodes to the SAME image
    w, h, arr = bmp_raster(hand_bmp(2, 2, px, top_down=True))
    assert [tuple(int(v) for v in arr[i // 2][i % 2]) for i in range(4)] == px

    with _pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with _pytest.raises(ValueError, match="file-size"):
        decode_bmp(hand_bmp(2, 2, px) + b"\x00")
    short = bytearray(hand_bmp(2, 2, px))
    struct.pack_into("<i", short, 22, 3)  # claim h=3, raster only has 2 rows
    with _pytest.raises(ValueError, match="truncated raster"):
        decode_bmp(bytes(short))
    bad_bpp = bytearray(hand_bmp(2, 2, px))
    struct.pack_into("<H", bad_bpp, 28, 32)
    with _pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad_bpp))

    # synth → decode roundtrip agrees with direct arithmetic, across
    # every stride-pad case (w cycles 3..7 -> pad 3/0/1/2/3)
    for doc_id in (0, 1, 2, 3, 4, 11):
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        exp = [
            sum((doc_id * 17 + i * 5 + o) % 256 for i in range(w * h))
            for o in (0, 3, 6)
        ]
        assert decode_bmp(synth_bmp(doc_id)) == (w, h, w * h, *exp)

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_bmp_features(attach_bmp(df)).collect()}
    assert rows[9].width == 3 + 9 % 5 and rows[9].height == 2 + 9 % 4
    assert rows[1].n_pixels == rows[1].width * rows[1].height


def test_png_decode_real_codec(spark):
    """The PNG decoder (r8) is a real codec path: CRC-verified chunk
    walk, zlib DEFLATE, and per-row reverse filtering. To break
    encoder/decoder bug SYMMETRY, the filtered stream for a known 2x2
    image is built BY HAND here (filter algebra worked out manually
    from RFC 2083, not via synth_png) and must decode to the intended
    pixels; malformed payloads must be rejected loudly."""
    import struct
    import zlib

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        _paeth,
        attach_png,
        decode_png,
        decode_png_features,
        png_raster,
        synth_png,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    def png_of(stream, w=2, h=2):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )

    # intended image: row0 = (10,20,30)(40,50,60), row1 = (70,80,90)(100,110,120)
    # row0 uses Sub (f=1): first pixel literal, second = delta from left:
    #   40-10=30, 50-20=30, 60-30=30
    # row1 uses Up (f=2): deltas from row0: 70-10, 80-20, 90-30, 100-40...= 60 each
    stream = bytes(
        [1, 10, 20, 30, 30, 30, 30]
        + [2, 60, 60, 60, 60, 60, 60]
    )
    assert decode_png(png_of(stream)) == (2, 2, 4, 220, 260, 300)

    # Average (f=3) and Paeth (f=4) rows, deltas hand-computed:
    # row0 Average: pred = (left + up)//2 with up=0 → (0+0)//2=0 for px0,
    #   (10+0)//2=5, (20)//2=10, (30)//2=15 → deltas 10,20,30, 35,40,45
    # row1 Paeth: px0 pred = paeth(0, up, 0) = up → delta = cur-up;
    #   px1 pred = paeth(left, up, upleft)
    r0 = [10, 20, 30, 40, 50, 60]
    r1 = [70, 80, 90, 100, 110, 120]
    avg_deltas = [
        (r0[i] - ((r0[i - 3] if i >= 3 else 0) + 0) // 2) % 256 for i in range(6)
    ]
    paeth_deltas = [
        (r1[i] - _paeth(r1[i - 3] if i >= 3 else 0, r0[i], r0[i - 3] if i >= 3 else 0))
        % 256
        for i in range(6)
    ]
    stream2 = bytes([3] + avg_deltas + [4] + paeth_deltas)
    assert decode_png(png_of(stream2)) == (2, 2, 4, 220, 260, 300)

    # Paeth cases (RFC 2083 order left → up → up-left). A left/up tie
    # with a != b is algebraically unreachable (|a-c|=|b-c|, a != b
    # forces pc = 0), so the observable branches are: strict left win,
    # the up-over-up-left TIE (pb == pc < pa, e.g. b-c = -2(a-c)), and
    # a strict up-left win.
    assert _paeth(5, 1, 1) == 5
    assert _paeth(3, 0, 2) == 0
    assert _paeth(1, 3, 2) == 2
    assert _paeth(10, 10, 10) == 10

    # malformed payloads
    with _pytest.raises(ValueError, match="magic"):
        decode_png(b"\x89PNX\r\n\x1a\n" + b"\x00" * 30)
    good = png_of(stream)
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip a bit inside IHDR body
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad_crc))
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 18))
            + chunk(b"IEND", b"")
        )
    with _pytest.raises(ValueError, match="decompressed size"):
        decode_png(png_of(stream[:-1]))
    with _pytest.raises(ValueError, match="bad filter"):
        decode_png(png_of(bytes([9]) + stream[1:]))

    # synth → decode roundtrip agrees with direct arithmetic; doc_ids
    # chosen so every filter type appears as some row's type
    for doc_id in (0, 1, 2, 3, 4, 7, 13):
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        exp = [
            sum((doc_id * 23 + i * 11 + o) % 256 for i in range(w * h))
            for o in (0, 5, 10)
        ]
        assert decode_png(synth_png(doc_id)) == (w, h, w * h, *exp)
    # raster content (not just sums) survives the codec for a Paeth doc
    w, h, px = png_raster(synth_png(4))  # h=2: rows use filters 4 and 0
    assert int(px[1][2][1]) == (4 * 23 + (1 * w + 2) * 11 + 5) % 256

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_png_features(attach_png(df)).collect()}
    assert rows[9].width == 3 + 9 % 5 and rows[9].height == 2 + 9 % 4
    assert rows[1].n_pixels == rows[1].width * rows[1].height


def test_gif_decode_real_codec(spark):
    """The GIF decoder (r8) implements LZW from the spec. To break
    encoder/decoder bug symmetry, two bitstreams are PACKED BY HAND
    here (variable-width codes worked out on paper, LSB-first): a
    plain stream whose width grows 3→4 mid-stream, and a KwKwK stream
    (code == next slot). Property coverage (30k-symbol streams to
    12-bit widths) lives in the operator roundtrip below; malformed
    payloads must be rejected loudly."""
    import random
    import struct

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_gif,
        decode_gif,
        decode_gif_features,
        lzw_decode_gif,
        lzw_encode_gif,
        synth_gif,
    )

    # hand-packed (mcs=2: clear=4, end=5, width starts 3):
    # codes 4,1,2,2 @3 bits — after the 3rd data code the decoder's
    # next slot hits 8, so END is read @4 bits → bytes 0x8C 0x54
    assert lzw_decode_gif(bytes([0x8C, 0x54]), 2, 3) == bytes([1, 2, 2])
    # hand-packed KwKwK: codes 4,1,6,5 @3 bits — code 6 IS the next
    # slot (entry [1,1] the decoder hasn't built yet) → bytes 0x8C 0x0B
    assert lzw_decode_gif(bytes([0x8C, 0x0B]), 2, 3) == bytes([1, 1, 1])

    # property: roundtrip over random index streams, both starting
    # widths, including runs that stress the KwKwK path
    rnd = random.Random(7)
    for mcs in (2, 3):
        for n in (1, 7, 300):
            data = bytes(rnd.randrange(1 << mcs) for _ in range(n))
            assert lzw_decode_gif(lzw_encode_gif(data, mcs), mcs, n) == data
        run = bytes([1] * 100)
        assert lzw_decode_gif(lzw_encode_gif(run, mcs), mcs, 100) == run

    # long streams (ADVICE r8: the short cases above never leave width
    # 9): 30k random symbols emit >4k codes, driving the width through
    # 10..12 bits AND across the 4096-entry table freeze; the 120k
    # single-symbol run exercises monotone phrase growth over the width
    # ladder. Both at the smallest and largest starting widths.
    for mcs in (2, 8):
        data = bytes(rnd.randrange(1 << mcs) for _ in range(30000))
        assert (
            lzw_decode_gif(lzw_encode_gif(data, mcs), mcs, len(data)) == data
        )
        run = bytes([1]) * 120000
        assert lzw_decode_gif(lzw_encode_gif(run, mcs), mcs, len(run)) == run

    # malformed payloads
    with _pytest.raises(ValueError, match="magic"):
        decode_gif(b"JIF87a" + b"\x00" * 30)
    good = bytearray(synth_gif(3))
    with _pytest.raises(ValueError, match="trailer"):
        decode_gif(bytes(good[:-1]))
    bad = bytearray(good)
    bad[6:8] = struct.pack("<H", 100)  # widen the screen: raster short
    with _pytest.raises(ValueError, match="unsupported GIF layout"):
        decode_gif(bytes(bad))
    # corrupt a byte inside the LZW sub-block → decode must not return
    # silently-wrong pixels: any of the decoder's validations may fire
    corrupt = bytearray(synth_gif(9))
    corrupt[-4] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_gif(bytes(corrupt))

    # synth → decode roundtrip agrees with direct arithmetic (both
    # palette sizes / starting code widths)
    for doc_id in (0, 1, 6, 13):
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        ps = 1 << (2 + doc_id % 2)
        pal = [
            (
                (doc_id * 29 + j * 37) % 256,
                (doc_id * 29 + j * 37 + 9) % 256,
                (doc_id * 29 + j * 37 + 18) % 256,
            )
            for j in range(ps)
        ]
        idx = [(doc_id * 13 + i * 7) % ps for i in range(w * h)]
        exp = (
            w, h, ps, w * h,
            sum(pal[i][0] for i in idx),
            sum(pal[i][1] for i in idx),
            sum(pal[i][2] for i in idx),
        )
        assert decode_gif(synth_gif(doc_id)) == exp

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_gif_features(attach_gif(df)).collect()}
    assert rows[9].width == 3 + 9 % 5 and rows[9].palette_size == 1 << (2 + 9 % 2)
    assert rows[1].n_pixels == rows[1].width * rows[1].height


def test_avi_decode_real_parser(spark):
    """The AVI decoder (r8) must walk nested RIFF LISTs with the
    odd-size pad rule, cross-check avih vs strf, and recover bottom-up
    BGR stride-padded frames — and reject malformed payloads loudly."""
    import struct

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_avi,
        avi_frames,
        decode_avi,
        decode_avi_features,
        synth_avi,
    )

    # roundtrip vs direct arithmetic over every (pad, frame-count) case
    for doc_id in (0, 1, 2, 3, 4, 5, 11):
        w, h, nf = 3 + doc_id % 5, 2 + doc_id % 4, 2 + doc_id % 3
        exp = [0, 0, 0]
        for f in range(nf):
            for i in range(w * h):
                base = doc_id * 19 + f * 13 + i * 5
                for c, o in enumerate((0, 7, 14)):
                    exp[c] += (base + o) % 256
        assert decode_avi(synth_avi(doc_id)) == (w, h, nf, w * h * nf, *exp)

    # frame CONTENT (not just sums) comes back in image order/RGB
    w, h, frames = avi_frames(synth_avi(3))
    base = 3 * 19 + 1 * 13 + (1 * w + 2) * 5  # frame 1, pixel (y=1, x=2)
    assert tuple(int(v) for v in frames[1][1][2]) == (
        base % 256, (base + 7) % 256, (base + 14) % 256,
    )

    # malformed payloads
    good = synth_avi(5)
    with _pytest.raises(ValueError, match="magic"):
        decode_avi(b"XIFF" + good[4:])
    bad = bytearray(good)
    struct.pack_into("<I", bad, 4, 5)
    with _pytest.raises(ValueError, match="RIFF size"):
        decode_avi(bytes(bad))
    # drop the last frame chunk (fixing only the RIFF size): the movi
    # LIST now claims bytes past the end → the walker must refuse
    w5, h5 = 3 + 5 % 5, 2 + 5 % 4
    stride = (3 * w5 + 3) // 4 * 4
    frame_chunk = 8 + stride * h5 + (stride * h5) % 2
    cut = bytearray(good[:-frame_chunk])
    struct.pack_into("<I", cut, 4, len(cut) - 8)  # RIFF size
    with _pytest.raises(ValueError, match="truncated"):
        decode_avi(bytes(cut))

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_avi_features(attach_avi(df)).collect()}
    assert rows[9].n_frames == 2 + 9 % 3 and rows[9].width == 3 + 9 % 5
    assert rows[1].n_pixels == rows[1].width * rows[1].height * rows[1].n_frames


def test_mmr_rank1_is_top1_and_reduces_redundancy(spark):
    """Greedy MMR must (a) keep the single most-relevant neighbor as
    rank 1, and (b) not select a MORE mutually-similar set than plain
    top-k (the whole point of the diversity penalty)."""
    from python_multiproc_bigdata_spark.operators.similarity import (
        mmr_diversify,
        topk_bruteforce,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    top = topk_bruteforce(q, emb, k=5)
    mmr = mmr_diversify(q, emb, k=5, pool=20, lam=0.7)
    top1 = {r.query_id: r.neighbor_id for r in top.collect() if r.rk == 1}
    mmr1 = {r.query_id: r.neighbor_id for r in mmr.collect() if r.mmr_rank == 1}
    assert top1 == mmr1

    import numpy as np

    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}

    def set_redundancy(sel: dict[int, list[int]]) -> float:
        tot = n = 0
        for ids in sel.values():
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    va, vb = vecs[a], vecs[b]
                    tot += float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                    n += 1
        return tot / n

    def collect_sets(df, rank_col):
        out: dict[int, list[int]] = {}
        for r in df.collect():
            out.setdefault(r.query_id, []).append(r.neighbor_id)
        return out

    red_top = set_redundancy(collect_sets(top, "rk"))
    red_mmr = set_redundancy(collect_sets(mmr, "mmr_rank"))
    assert red_mmr <= red_top + 1e-9, (red_mmr, red_top)


def test_semantic_dedup_keep_first_invariant(spark):
    """Within a cluster, any near-dup pair (cosine >= threshold) must
    have its HIGHER id dropped; the lowest vec_id in the corpus can
    never be dropped; kept+dropped partitions the corpus."""
    from python_multiproc_bigdata_spark.operators.dedup import semantic_dedup
    from python_multiproc_bigdata_spark.operators.similarity import (
        neardup_pairs_cosine,
        train_spherical_kmeans_driver,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_spherical_kmeans_driver(emb, n_lists=16, max_iter=3)
    out = semantic_dedup(emb, cents, threshold=0.4).collect()
    cid = {r.vec_id: r.cid for r in out}
    kept = {r.vec_id: r.kept for r in out}
    assert len(out) == emb.count()
    assert kept[min(kept)] is True
    pairs = neardup_pairs_cosine(emb, 0.4).collect()
    same_cluster = [
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in pairs
        if cid[r.id_a] == cid[r.id_b]
    ]
    assert same_cluster, "fixture should contain same-cluster near-dups"
    for lo, hi in same_cluster:
        assert kept[hi] is False, (lo, hi)


def test_cdc_chunks_shift_invariance():
    """The property that makes content-defined chunking worth having:
    prepending a byte shifts every OFFSET but almost no chunk — only
    the prefix chunk (up to the first anchor) may change, because
    boundaries are content-derived. Verified on the oracle's own chunk
    arithmetic (engine parity is the driver gate's job)."""
    import duckdb

    base = duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "ORDER BY doc_id LIMIT 1"
    ).fetchone()[0]
    chunk_sql = """
    WITH d(text) AS (VALUES (?)),
    anchors AS (
      SELECT list_sort(list_filter(
               list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                              p -> CASE WHEN substr(md5(substr(text, p, 8)), 1, 1) = '0'
                                         AND p > 1
                                   THEN p ELSE NULL END),
               x -> x IS NOT NULL)) AS cuts, text
      FROM d
    )
    SELECT unnest(list_transform(range(1, len(b)),
                  i -> md5(substr(text, b[i], b[i+1] - b[i])))) AS ch
    FROM (SELECT text,
                 list_concat(list_concat([1], cuts), [length(text) + 1]) AS b
          FROM anchors)
    """
    a = [r[0] for r in duckdb.sql(chunk_sql, params=[base]).fetchall()]
    b = [r[0] for r in duckdb.sql(chunk_sql, params=["X" + base]).fetchall()]
    assert len(a) > 3, "fixture doc too short to exercise chunking"
    from collections import Counter

    shared = sum((Counter(a) & Counter(b)).values())
    # everything except the (changed) prefix chunk must survive the shift
    assert shared >= len(a) - 1, (len(a), len(b), shared)


def test_duplicated_substring_spans_semantics(spark):
    """Cross-doc windows merge into maximal spans; within-doc-only
    repeats are NOT flagged; shorter-than-window docs are ignored."""
    from python_multiproc_bigdata_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    docs = [
        (1, f"{shared} alpha beta gamma"),
        (2, f"delta {shared} epsilon"),
        # doc 3: an 8-token phrase repeated twice WITHIN the doc only
        (3, " ".join(f"r{i}" for i in range(8)) + " x " + " ".join(f"r{i}" for i in range(8))),
        (4, "too short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(
        duplicated_substring_spans(df, window_tokens=8).collect(),
        key=lambda r: (r.doc_id, r.span_start),
    )
    # docs 1 and 2: the 10 shared tokens give 3 consecutive dup windows
    # (positions where the full 8-window sits inside the shared run)
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1, 2}
    assert (by_doc[1].span_start, by_doc[1].n_windows, by_doc[1].span_len_tokens) == (0, 3, 10)
    assert (by_doc[2].span_start, by_doc[2].n_windows, by_doc[2].span_len_tokens) == (1, 3, 10)


def test_containment_detects_excerpt_asymmetrically(spark):
    """A short doc fully quoted inside a long doc: containment(short →
    long) = 1.0 while Jaccard stays low — the asymmetric case the
    symmetric near-dup family misses."""
    from python_multiproc_bigdata_spark.registry import dedup as dd

    short = "alpha beta gamma delta epsilon"
    long = (
        "intro words here now " + short + " plus much more trailing content "
        "that keeps going with extra unique tokens one two three four five"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely unrelated text body")],
        "doc_id long, text string",
    )
    orig = dd.table
    dd.table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
    try:
        rows = {
            (r.contained, r.container): r
            for r in dd.dedup_containment(spark, "unused").collect()
        }
    finally:
        dd.table = orig
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r.containment == 1.0 and r.jaccard < 0.5
    assert (2, 1) not in rows  # the long doc is NOT contained in the short


def test_image_ahash_banded_join_is_lossless(spark):
    """aHash near-dup (r7): the 4x16-bit banded Hamming join must find
    EXACTLY the brute-force all-pairs Hamming<=3 set (pigeonhole: 3
    differing bits touch at most 3 of 4 bands), and images synthesized
    1280 doc_ids apart (the synth arithmetic's period) must come back
    as exact duplicates (hamming 0)."""
    import numpy as np

    from python_multiproc_bigdata_spark.operators.multimodal import (
        ahash_bands,
        ahash_neardup_pairs,
        attach_ppm,
        ppm_raster,
        synth_ppm,
    )
    from python_multiproc_bigdata_spark.registry.multimodal import AHASH_HAMMING_MAX

    def ahash_bits(doc_id: int) -> np.ndarray:
        w, h, _m, px = ppm_raster(synth_ppm(doc_id))
        xs, ys = np.arange(8), np.arange(8)
        resized = px[np.ix_((ys * h) // 8, (xs * w) // 8)].astype(np.int64)
        g = (resized.sum(axis=2) // 3).reshape(-1)
        return (64 * g > int(g.sum())).astype(np.int64)

    doc_ids = list(range(120)) + [7 + 1280, 42 + 1280]  # two exact dups
    # brute-force truth
    bits = {d: ahash_bits(d) for d in doc_ids}
    truth = {
        (a, b): int(np.sum(bits[a] != bits[b]))
        for i, a in enumerate(doc_ids)
        for b in doc_ids[i + 1 :]
        if int(np.sum(bits[a] != bits[b])) <= AHASH_HAMMING_MAX
    }
    assert truth[(7, 7 + 1280)] == 0 and truth[(42, 42 + 1280)] == 0

    df = spark.createDataFrame([(d,) for d in doc_ids], ["doc_id"])
    bands = ahash_bands(attach_ppm(df)).localCheckpoint(eager=True)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ahash_neardup_pairs(bands, max_hamming=AHASH_HAMMING_MAX).collect()
    }
    assert got == truth

    # band packing shape: 4 rows per image, 16-bit values
    three = ahash_bands(attach_ppm(df.limit(3))).collect()
    assert len(three) == 12
    assert all(0 <= r.band_val < (1 << 16) for r in three)


def test_minhash_calibration_estimator_semantics(spark, tmp_path):
    """The k=8 signature estimate must be exactly m/8-granular, equal 1
    with zero error on an exact-duplicate pair, and abs_err must be the
    |est - jaccard| of the emitted columns on every candidate pair."""
    from python_multiproc_bigdata_spark.registry.dedup import (
        eval_minhash_calibration,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "src0", len(base)),
        (2, base, "en", "src0", len(base)),  # exact dup of 1
        (3, base + " with a different tail entirely", "en", "src0", 99),
        (4, "completely unrelated text about spark physical plans", "en", "src0", 52),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / "cal"
    df.write.parquet(str(d / "documents.parquet"))

    got = {(r.doc_a, r.doc_b): r for r in eval_minhash_calibration(spark, str(d)).collect()}
    assert (1, 2) in got
    r12 = got[(1, 2)]
    assert r12.est_jaccard == 1.0 and r12.jaccard == 1.0 and r12.abs_err == 0.0
    for r in got.values():
        assert round(r.est_jaccard * 8, 6) == int(round(r.est_jaccard * 8))
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.jaccard), 4)) < 1e-9
        assert 0.0 <= r.jaccard <= 1.0


def test_tiff_decode_real_parser(spark):
    """The TIFF decoder (r9) must WALK the IFD — typed tags, inline
    values when they fit 4 bytes, offset values when they don't — and
    assemble multi-strip rasters. The hand-built file here places the
    IFD directly AFTER the header with the raster at the END (the
    REVERSE of synth_tiff's layout), so a decoder that assumed the
    synth layout instead of following offsets fails immediately; it
    must also reject malformed payloads loudly."""
    import struct

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_tiff,
        decode_tiff,
        decode_tiff_features,
        synth_tiff,
        tiff_raster,
    )

    def hand_tiff(w, h, pixels_rgb, rps):
        strips = []
        flat = b"".join(bytes(p) for p in pixels_rgb)
        for y0 in range(0, h, rps):
            rows = min(rps, h - y0)
            strips.append(flat[y0 * w * 3 : (y0 + rows) * w * 3])
        n = len(strips)
        ifd_off = 8
        ifd_size = 2 + 12 * 9 + 4
        bps_off = ifd_off + ifd_size
        pos = bps_off + 6
        if n > 1:
            so_off, pos = pos, pos + 4 * n
            sc_off, pos = pos, pos + 4 * n
        offs = []
        for s in strips:
            offs.append(pos)
            pos += len(s)

        def entry(tag, typ, count, vbytes):
            return struct.pack("<HHI", tag, typ, count) + vbytes.ljust(4, b"\x00")

        entries = [
            entry(256, 4, 1, struct.pack("<I", w)),
            entry(257, 4, 1, struct.pack("<I", h)),
            entry(258, 3, 3, struct.pack("<I", bps_off)),
            entry(259, 3, 1, struct.pack("<H", 1)),
            entry(262, 3, 1, struct.pack("<H", 2)),
            entry(273, 4, n, struct.pack("<I", offs[0] if n == 1 else so_off)),
            entry(277, 3, 1, struct.pack("<H", 3)),
            entry(278, 4, 1, struct.pack("<I", rps)),
            entry(279, 4, n,
                  struct.pack("<I", len(strips[0]) if n == 1 else sc_off)),
        ]
        out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
        out += struct.pack("<H", 9) + b"".join(entries) + struct.pack("<I", 0)
        out += struct.pack("<HHH", 8, 8, 8)
        if n > 1:
            out += struct.pack(f"<{n}I", *offs)
            out += struct.pack(f"<{n}I", *(len(s) for s in strips))
        out += b"".join(strips)
        return bytes(out)

    # hand-written 2x2 single strip (inline StripOffsets/ByteCounts)
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    assert decode_tiff(hand_tiff(2, 2, px, rps=2)) == (2, 2, 1, 4, 220, 260, 300)
    # same image as THREE strips (rps=1 -> external offset arrays);
    # raster identical, only the storage layout changes
    w, h, n_strips, arr = tiff_raster(hand_tiff(2, 2, px, rps=1))
    assert (w, h, n_strips) == (2, 2, 2)
    assert [tuple(int(v) for v in arr[i // 2][i % 2]) for i in range(4)] == px

    with _pytest.raises(ValueError, match="TIFF"):
        decode_tiff(b"MM" + b"\x00" * 60)  # big-endian: not this reader
    with _pytest.raises(ValueError, match="unsupported field type"):
        bad = bytearray(hand_tiff(2, 2, px, rps=2))
        struct.pack_into("<H", bad, 8 + 2 + 2, 5)  # RATIONAL type
        decode_tiff(bytes(bad))
    with _pytest.raises(ValueError, match="unsupported TIFF variant"):
        bad = bytearray(hand_tiff(2, 2, px, rps=2))
        struct.pack_into("<H", bad, 8 + 2 + 12 * 3 + 8, 5)  # Compression=LZW
        decode_tiff(bytes(bad))
    with _pytest.raises(ValueError, match="strip bytes"):
        bad = bytearray(hand_tiff(2, 2, px, rps=2))
        # shrink the single inline StripByteCount: raster short
        struct.pack_into("<I", bad, 8 + 2 + 12 * 8 + 8, 9)
        decode_tiff(bytes(bad))
    with _pytest.raises(ValueError, match="missing required TIFF tag"):
        bad = bytearray(hand_tiff(2, 2, px, rps=2))
        struct.pack_into("<H", bad, 8 + 2 + 12 * 5, 999)  # retag StripOffsets
        decode_tiff(bytes(bad))

    # synth → decode roundtrip agrees with direct arithmetic across the
    # full strip-count cycle (h = 2..5 -> 1/2/2/3 strips)
    for doc_id in (0, 1, 2, 3, 4, 13):
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        exp = [
            sum((doc_id * 19 + i * 7 + o) % 256 for i in range(w * h))
            for o in (0, 4, 8)
        ]
        assert decode_tiff(synth_tiff(doc_id)) == (
            w, h, (h + 1) // 2, w * h, *exp,
        )

    # distributed shape: two mapInPandas stages, decoder sees only bytes
    df = spark.createDataFrame([(1,), (3,), (9,)], ["doc_id"])
    rows = {r.doc_id: r for r in decode_tiff_features(attach_tiff(df)).collect()}
    assert rows[9].width == 3 + 9 % 5 and rows[9].height == 2 + 9 % 4
    assert rows[3].n_strips == (2 + 3 % 4 + 1) // 2
    assert rows[1].n_pixels == rows[1].width * rows[1].height


def test_image_phash_properties_and_banded_join(spark):
    """pHash near-dup (r10): the fixed-point DCT signature must (a)
    mark exact duplicates hamming 0 through the banded join, (b) be
    invariant to a global brightness shift in every non-DC bit (the
    63 AC coefficients of a shifted image are IDENTICAL integers —
    only the DC bit may flip), and (c) find exactly the brute-force
    Hamming<=3 pair set (same 4-band pigeonhole as aHash)."""
    import numpy as np

    from python_multiproc_bigdata_spark.operators.multimodal import (
        AHASH_BAND_BITS,
        AHASH_BANDS,
        attach_ppm,
        ahash_neardup_pairs,
        dct32_int,
        phash_bands,
        ppm_raster,
        synth_ppm,
    )
    from python_multiproc_bigdata_spark.registry.multimodal import AHASH_HAMMING_MAX

    c8 = np.array(dct32_int(), dtype=np.int64)[:8]

    def phash_bits(px: np.ndarray) -> np.ndarray:
        h, w = px.shape[:2]
        xs, ys = np.arange(32), np.arange(32)
        g = px[np.ix_((ys * h) // 32, (xs * w) // 32)].astype(np.int64).sum(axis=2) // 3
        d8 = (c8 @ g @ c8.T).reshape(-1)
        thr = int(np.sort(d8[1:])[31])
        return (d8 > thr).astype(np.int64)

    # (b) brightness shift: +24 on every channel flips at most the DC
    # bit (halve first so the shift cannot clip — clipping would be a
    # real image change, not a brightness shift)
    _w, _h, _m, px = ppm_raster(synth_ppm(11))
    dim = (px // 2).astype(np.uint8)
    base = phash_bits(dim)
    shifted = phash_bits((dim.astype(np.int64) + 24).astype(np.uint8))
    assert (base[1:] == shifted[1:]).all()

    # (a)+(c): banded join equals brute force; periodic dups at hamming 0
    doc_ids = list(range(100)) + [5 + 1280, 33 + 1280]
    bits = {}
    for d in doc_ids:
        _, _, _m2, p = ppm_raster(synth_ppm(d))
        bits[d] = phash_bits(p)
    truth = {
        (a, b): int(np.sum(bits[a] != bits[b]))
        for i, a in enumerate(doc_ids)
        for b in doc_ids[i + 1 :]
        if int(np.sum(bits[a] != bits[b])) <= AHASH_HAMMING_MAX
    }
    assert truth[(5, 5 + 1280)] == 0 and truth[(33, 33 + 1280)] == 0
    df = spark.createDataFrame([(d,) for d in doc_ids], ["doc_id"])
    bands = phash_bands(attach_ppm(df)).localCheckpoint(eager=True)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ahash_neardup_pairs(bands, max_hamming=AHASH_HAMMING_MAX).collect()
    }
    assert got == truth
    # band packing: 4 bands x 16 bits reassemble the bit vector
    rows = bands.filter(F.col("doc_id") == 5).collect()
    assert sorted(r.band_idx for r in rows) == list(range(AHASH_BANDS))
    packed = 0
    for r in rows:
        packed |= int(r.band_val) << (r.band_idx * AHASH_BAND_BITS)
    want = int((bits[5] << np.arange(64, dtype=object)).sum())
    assert packed == want


def test_png_adam7_hand_built_and_malformed():
    """Adam7 de-interlace (r11) checked against a HAND-laid-out 2x2
    interlaced stream (pass membership worked out manually from the
    PNG spec §8.2 grid — pass 1 holds (0,0), pass 6 holds (1,0),
    pass 7 holds the y=1 row; passes 2-5 are EMPTY and must emit no
    bytes), so a synth/decoder-symmetric pass-table bug cannot hide.
    Trailing bytes after the last pass and a truncated pass raise."""
    import struct
    import zlib

    import pytest as _pytest

    from python_multiproc_bigdata_spark.operators.multimodal import png_raster

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    def png_of(stream, w=2, h=2):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )

    # intended: (0,0)=(10,20,30) (1,0)=(40,50,60)
    #           (0,1)=(70,80,90) (1,1)=(100,110,120)
    # pass1: one row [(10,20,30)], filter None
    # pass6: one row [(40,50,60)], filter Sub (first px → literal)
    # pass7: one row [(70,80,90),(100,110,120)], filter Up with a FRESH
    #        zero prev row (per-pass reset — the spec subtlety): deltas
    #        are the raw bytes themselves
    stream = bytes(
        [0, 10, 20, 30]
        + [1, 40, 50, 60]
        + [2, 70, 80, 90, 100, 110, 120]
    )
    w, h, px = png_raster(png_of(stream))
    assert (w, h) == (2, 2)
    assert px.tolist() == [
        [[10, 20, 30], [40, 50, 60]],
        [[70, 80, 90], [100, 110, 120]],
    ]
    with _pytest.raises(ValueError, match="trailing"):
        png_raster(png_of(stream + b"\x00"))
    with _pytest.raises(ValueError, match="truncated"):
        png_raster(png_of(stream[:-2]))


def test_png_adam7_synth_roundtrip_and_weighted_sums(spark):
    """synth→decode parity with direct arithmetic for docs covering
    empty AND full pass sets; the weighted sums differ from what a
    row-major MISREAD of the interlaced stream would produce (the
    permutation-sensitivity claim), and the distributed stage is
    shuffle-free."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_png_i7,
        decode_png_adam7,
        decode_png_adam7_features,
        synth_png_i7,
    )

    for d in (0, 1, 5, 9, 12, 27, 40):
        w, h = 3 + d % 8, 3 + d % 7
        n = w * h
        got = decode_png_adam7(synth_png_i7(d))
        want = (
            w, h, n,
            sum((d * 29 + i * 13) % 256 for i in range(n)),
            sum((d * 29 + i * 13 + 7) % 256 for i in range(n)),
            sum((d * 29 + i * 13 + 14) % 256 for i in range(n)),
            sum((i + 1) * ((d * 29 + i * 13) % 256) for i in range(n)),
            sum((i + 1) * ((d * 29 + i * 13 + 7) % 256) for i in range(n)),
            sum((i + 1) * ((d * 29 + i * 13 + 14) % 256) for i in range(n)),
        )
        assert got == want, (d, got, want)
        # permutation sensitivity: interlaced pixel order != raster
        # order for these sizes, so weights over the PASS order differ
        perm = []
        from python_multiproc_bigdata_spark.operators.multimodal import ADAM7_PASSES
        for x0, y0, dx, dy in ADAM7_PASSES:
            for y in range(y0, h, dy):
                for x in range(x0, w, dx):
                    perm.append(y * w + x)
        wsum_pass_order = sum(
            (k + 1) * ((d * 29 + perm[k] * 13) % 256) for k in range(n)
        )
        assert wsum_pass_order != got[6]

    df = spark.createDataFrame([(0,), (9,), (27,)], ["doc_id"])
    out = decode_png_adam7_features(attach_png_i7(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[27].width == 3 + 27 % 8 and rows[27].n_pixels == rows[27].width * rows[27].height
