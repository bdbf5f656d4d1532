"""Structured Streaming checkpoint recovery: the property every
production streaming pipeline depends on — a RESTARTED query resumes
from the checkpointed source offsets and does not reprocess committed
micro-batches. The reference's queue framework loses in-flight state on
worker death (SURVEY §4); this is the Spark-native answer, proven by
test rather than asserted.

Protocol: two single-file micro-batches are processed under
checkpoint C, the query stops, a THIRD file arrives, and a new query
starts under the SAME C. If offset tracking works, the restarted query
emits batch 3 only; the foreachBatch sink appends blindly (no dedup),
so any reprocessing would surface as duplicate rows and fail the
exact-multiset assertion.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _run_available(spark, schema, src, sink_dir, ckpt):
    def write_batch(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(sink_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)


def test_restart_resumes_from_checkpoint_no_reprocessing(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    slices = [docs.filter(F.col("doc_id") % 3 == m) for m in range(3)]
    for s in slices[:2]:
        s.coalesce(1).write.mode("append").parquet(src)

    _run_available(spark, docs.schema, src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    assert n_first == slices[0].count() + slices[1].count()

    # third file lands AFTER the first query stopped; same checkpoint
    slices[2].coalesce(1).write.mode("append").parquet(src)
    _run_available(spark, docs.schema, src, out, ckpt)

    got = (
        spark.read.parquet(out)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # exactly-once across the restart: every doc exactly once — a
    # reprocessed batch would show n == 2 for its doc_ids
    assert len(got) == docs.count()
    assert all(r.n == 1 for r in got), sorted(
        (r.doc_id, r.n) for r in got if r.n != 1
    )[:5]
    assert os.path.isdir(ckpt)


def test_stream_stream_left_outer_emits_unmatched(spark):
    """The left-outer interval join must emit null-padded rows for
    clicks with no view in the lookback — and exactly the ones the
    batch LEFT JOIN produces (the sentinel-staged watermark flush in
    registry/streaming.py is what makes them surface on a bounded
    replay)."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.common import prep, table
    from python_multiproc_bigdata_spark.registry.streaming import (
        streaming_click_view_left_join,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_click_view_left_join(spark, sf).collect()
    streamed = {(r.click_id, r.user_id, r.view_id) for r in got}
    assert any(v is None for _, _, v in streamed), "no null-padded rows emitted"

    e = table(prep(spark), sf, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    batch = {
        (r.click_id, r.user_id, r.view_id)
        for r in c.join(
            v,
            (F.col("user_id") == F.col("vu"))
            & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 hour"))
            & (F.col("vts") <= F.col("cts")),
            "left_outer",
        )
        .select("click_id", "user_id", "view_id")
        .collect()
    }
    assert streamed == batch


def test_phash_neardup_restart_no_reprocessing(spark, tmp_path):
    """Checkpoint recovery for the incremental perceptual matcher
    (streaming_phash_neardup): wave 1 is matched under checkpoint C,
    the query stops, wave 2 lands, a NEW query resumes under the SAME
    C. Exactly-once across the restart means (a) the pair union equals
    the one-shot batch answer value-for-value, and (b) the signature
    store holds each image's 4 bands exactly once — a reprocessed
    epoch would double wave 1's bands and corrupt later Hamming sums."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_ppm,
        phash_bands,
    )
    from python_multiproc_bigdata_spark.registry.multimodal import AHASH_HAMMING_MAX
    from python_multiproc_bigdata_spark.registry.streaming import phash_epoch_matcher

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    imgs = attach_ppm(docs)
    src = str(tmp_path / "imgs")
    store = str(tmp_path / "bands")
    pdir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema(imgs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(phash_epoch_matcher(spark, store, pdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    imgs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    run()
    n_epochs_first = len(
        spark.read.parquet(store).select("epoch").distinct().collect()
    )
    imgs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    run()

    # (b) store integrity: every doc's bands exactly once
    band_counts = (
        spark.read.parquet(store).groupBy("doc_id").count().collect()
    )
    assert len(band_counts) == docs.count()
    assert all(r["count"] == 4 for r in band_counts)
    assert n_epochs_first == 1  # wave 1 was one epoch, not re-run

    # (a) pair union equals the one-shot batch answer
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.read.parquet(pdir).select("doc_a", "doc_b", "hamming").collect()
    )
    bands = phash_bands(imgs).localCheckpoint(eager=True)
    want = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in ahash_neardup_pairs(bands, max_hamming=AHASH_HAMMING_MAX).collect()
    )
    assert got == want and len(want) > 0


def test_phash_epoch_matcher_retry_idempotent(spark, tmp_path):
    """The at-least-once contract, exercised directly: re-running the
    SAME epoch (a foreachBatch retry after a mid-epoch crash — even one
    that already wrote the store) must leave byte-identical pairs and
    an unduplicated band store, because both writes are epoch-keyed
    overwrites and the store read excludes the current epoch."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.multimodal import attach_ppm
    from python_multiproc_bigdata_spark.registry.streaming import phash_epoch_matcher

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    imgs = attach_ppm(docs)
    store = str(tmp_path / "bands")
    pdir = str(tmp_path / "pairs")
    match = phash_epoch_matcher(spark, store, pdir)

    wave0 = imgs.filter(F.col("doc_id") % 2 == 0)
    wave1 = imgs.filter(F.col("doc_id") % 2 == 1)
    match(wave0, 0)
    match(wave1, 1)
    first = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.read.parquet(pdir).select("doc_a", "doc_b", "hamming").collect()
    )
    # retry epoch 1 AFTER its store write already landed — the worst case
    match(wave1, 1)
    second = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.read.parquet(pdir).select("doc_a", "doc_b", "hamming").collect()
    )
    assert second == first and len(first) > 0
    counts = spark.read.parquet(store).groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)


def test_crawl_admission_restart_no_reprocessing(spark, tmp_path):
    """Checkpoint recovery for the streaming crawl-admission gate
    (streaming_crawl_admission): wave 1 is gated under checkpoint C,
    the query stops, wave 2 lands, a NEW query resumes under the SAME
    C. Exactly-once across the restart means every URL has EXACTLY one
    verdict row across all epochs and the union equals the one-shot
    batch answer (normalize + robots_gate run directly) — a
    reprocessed epoch would duplicate wave 1's rows."""
    from python_multiproc_bigdata_spark.operators.curation import normalize_url
    from python_multiproc_bigdata_spark.operators.warc import (
        robots_gate,
        robots_rules,
    )
    from python_multiproc_bigdata_spark.registry.curation import (
        ROBOTS_G0,
        ROBOTS_G1,
    )
    from python_multiproc_bigdata_spark.registry.streaming import (
        crawl_admission_matcher,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    m = F.col("doc_id")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Host"), (m % 2).cast("string"), F.lit(".Example.COM:80"),
            F.when(m % 3 == 0, F.lit("/a/./b")).otherwise(F.lit("/c/d/..")),
        ).alias("url"),
    )
    hosts = spark.createDataFrame(
        [("host0.example.com", ROBOTS_G0), ("host1.example.com", ROBOTS_G1)],
        ["host", "robots_txt"],
    )
    rules = robots_rules(hosts, agent="pmb-bot").localCheckpoint(eager=True)

    src = str(tmp_path / "urls")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(crawl_admission_matcher(rules, out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    raw.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    run()
    n_first = spark.read.parquet(out).count()
    raw.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(out).select("doc_id", "url", "host", "path", "allowed")
    n_docs = docs.count()
    assert n_first == got.filter(F.col("doc_id") % 2 == 0).count()
    assert got.count() == n_docs  # exactly one verdict per URL, no replays
    # union equals the one-shot batch answer
    n = normalize_url(F.col("url"))
    rows = (
        raw.select("doc_id", "url", n.alias("_n"))
        .select(
            "doc_id", "url",
            F.col("_n.norm_url").alias("norm_url"),
            F.col("_n.host").alias("host"),
        )
        .withColumn(
            "path",
            F.regexp_extract("norm_url", r"^[a-z0-9+.\-]+://[^/]*(/[^?#]*)", 1),
        )
    )
    want = sorted(
        (r.doc_id, r.url, r.host, r.path, r.allowed)
        for r in robots_gate(rows, rules)
        .select("doc_id", "url", "host", "path", "allowed")
        .collect()
    )
    assert sorted(tuple(r) for r in got.collect()) == want and len(want) > 0
