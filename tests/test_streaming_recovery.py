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
