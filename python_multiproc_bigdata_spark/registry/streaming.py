"""Streaming queries (SURVEY §7 M5), driven to completion through a memory
sink so the driver's batch-style harness can compare them to the DuckDB
oracle. The streaming result of a complete-mode aggregation over the
bounded events file equals the batch aggregation — which is the point:
the same engine semantics, unbounded-ready."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE
from python_multiproc_bigdata_spark.registry.common import (
    QuerySpec,
    fixture_root,
    prep,
    table,
)
from python_multiproc_bigdata_spark.registry.similarity import make_ivf_kmeans_oracle
from python_multiproc_bigdata_spark.streaming.windows import (
    first_event_per_key,
    stream_stream_click_view_join,
    stream_stream_click_view_left_join,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    transition_counts_stateful,
    tumbling_counts,
)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(tumbling_counts(ev), mode="complete")


SQL_STREAM_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def streaming_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(first_event_per_key(ev), mode="complete")


SQL_STREAM_FIRST = """
SELECT user_id, event_type, min(event_id) AS first_event_id
FROM events GROUP BY 1, 2
"""


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(sliding_counts(ev), mode="complete")


SQL_STREAM_SLIDING = """
SELECT window_start, count(*) AS n FROM (
  SELECT unnest([
    time_bucket(INTERVAL '30 minutes', ts),
    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  ]) AS window_start
  FROM events
) GROUP BY 1
"""


def streaming_words_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship words pipeline as an incremental corpus stream:
    readStream over documents → tokenize → per-word doc frequency
    (complete mode). Same engine semantics as the batch
    words_doc_frequency — which is the whole M5 point."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = prep(spark)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tokens = (
        docs.select(
            F.col("doc_id").cast("string").alias("file_path"),
            F.explode(F.split("text", WHITESPACE_RE)).alias("word"),
        )
        .filter(F.length(F.trim("word")) > 0)
        .dropDuplicates(["file_path", "word"])
    )
    freq = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq")).filter(
        F.col("doc_freq") > 100
    )
    return run_to_memory(freq, mode="complete")


SQL_STREAM_WORDS = r"""
WITH tok AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS file_path,
         unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS word
  FROM documents
)
SELECT word, count(*) AS doc_freq FROM tok
WHERE length(trim(word)) > 0
GROUP BY word HAVING count(*) > 100
"""


def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: streaming events enriched with the static
    customer dim (broadcast per micro-batch), counts per market segment."""
    from pyspark.sql import functions as F

    spark = prep(spark)
    ev = stream_events(spark, sf_dir)
    customers = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(customers), "user_id")
    counts = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return run_to_memory(counts, mode="complete")


SQL_STREAM_ENRICHED = """
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark (A4's bounded-state streaming dedup)
    over event_id; the harness events are already unique so the output is
    the full projection — which the oracle verifies exactly."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.streaming.windows import dedup_within_watermark

    ev = stream_events(prep(spark), sf_dir)
    deduped = dedup_within_watermark(ev, ["event_id"], watermark="1 hour")
    return run_to_memory(
        deduped.select("event_id", "user_id", "event_type"), mode="append"
    )


SQL_STREAM_DEDUP = """
SELECT event_id, user_id, event_type FROM events
"""


def streaming_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: a 2-epoch change feed (maxFilesPerTrigger=1
    forces two micro-batches) merged into a parquet target by highest
    version per key via foreach_batch_cdc_apply. Epoch 1 bumps every
    custkey%10==0 balance by 100 (version 1); epoch 2 bumps custkey%20==0
    by 200 from base (version 2, superseding half of epoch 1's rows).
    The final target state is deterministic AND micro-batch-order-
    independent (version-aware merge), so the oracle is a closed-form
    CASE over the customer table."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.streaming.windows import (
        foreach_batch_cdc_apply,
    )

    spark = prep(spark)
    base = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit(0).alias("version"),
    )
    root = fixture_root("cdc_merge", sf_dir)
    target = os.path.join(root, "target")
    changes = os.path.join(root, "changes")
    os.makedirs(changes)
    base.write.mode("overwrite").parquet(target)
    epochs = [
        base.filter(F.col("c_custkey") % 10 == 0).select(
            "c_custkey", (F.col("bal") + 100).alias("bal"), F.lit(1).alias("version")
        ),
        base.filter(F.col("c_custkey") % 20 == 0).select(
            "c_custkey", (F.col("bal") + 200).alias("bal"), F.lit(2).alias("version")
        ),
    ]
    for i, df in enumerate(epochs):
        tmp = os.path.join(root, f"e{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.copy(os.path.join(tmp, part), os.path.join(changes, f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes)
    )
    q = foreach_batch_cdc_apply(
        stream, target, ["c_custkey"], "version",
        checkpoint_dir=os.path.join(root, "ckpt"),
    )
    q.awaitTermination()
    return spark.read.parquet(target)


SQL_STREAM_CDC = """
SELECT c_custkey,
       CASE WHEN c_custkey % 20 = 0 THEN round(c_acctbal, 2) + 200
            WHEN c_custkey % 10 = 0 THEN round(c_acctbal, 2) + 100
            ELSE round(c_acctbal, 2) END AS bal,
       CASE WHEN c_custkey % 20 = 0 THEN 2
            WHEN c_custkey % 10 = 0 THEN 1
            ELSE 0 END AS version
FROM customer
"""


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows over the event stream (update mode; the
    bounded single-file source arrives in one micro-batch, so each
    finalized session is emitted exactly once — see
    streaming/windows.py:session_counts)."""
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(session_counts(ev), mode="complete")


# identical sessions to the batch session_window oracle: integer-micros
# gap >= 30 min starts a session; end = last event + gap
SQL_STREAM_SESSION = """
WITH gaps AS (
  SELECT user_id, ts, value, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM sess GROUP BY user_id, sid
"""


def streaming_click_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/windows.py:
    stream_stream_click_view_join) driven to completion; append mode —
    a stream-stream inner join emits rows as both sides arrive."""
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(stream_stream_click_view_join(ev), mode="append")


SQL_STREAM_SS_JOIN = """
SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
FROM events c
JOIN events v
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND v.ts >= c.ts - INTERVAL '1 hour' AND v.ts <= c.ts
"""


def streaming_click_view_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join driven to completion —
    the null-padding semantics milestone the inner join can't express:
    clicks with no view in the lookback emit (click_id, user_id, NULL),
    but ONLY after the global watermark proves no match can arrive, and
    the emission itself happens one micro-batch after eviction becomes
    possible. On a bounded replay that means the watermark must keep
    advancing after the real data ends, so the input is staged as THREE
    files consumed one per micro-batch (maxFilesPerTrigger=1, mtimes
    pinned ascending): the corpus, then two sentinel click/view pairs
    ever further in the future (negative ids, impossible user). Batch 2
    advances the global watermark past every real click; batch 3 runs
    with that watermark and evicts+emits all real unmatched rows; the
    sentinels themselves stay trapped in state (their own watermark
    never passes them) and are filtered by id anyway. The oracle is the
    plain batch LEFT JOIN — streamed union == batch answer, the
    streaming_topk_serving twin discipline."""
    import glob as _glob
    import os
    from datetime import timedelta

    s = prep(spark)
    e = table(s, sf_dir, "events")
    max_ts = e.agg(F.max("ts").alias("m")).collect()[0].m  # 1-row driver read
    root = fixture_root("ssoj", sf_dir)
    data_dir = os.path.join(root, "in")
    os.makedirs(data_dir)

    def _stage(df: DataFrame, name: str, mtime: int) -> None:
        stage = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        [part] = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(data_dir, name)
        os.rename(part, dst)
        os.utime(dst, (mtime, mtime))  # file source consumes oldest-first

    _stage(e, "a_events.parquet", 1_000_000_000)

    def _sentinels(h_click: int, h_view: int, id_click: int, id_view: int):
        return s.createDataFrame(
            [
                (id_click, max_ts + timedelta(hours=h_click), -999, "click", 0.0, "{}"),
                (id_view, max_ts + timedelta(hours=h_view), -999, "view", 0.0, "{}"),
            ],
            e.schema,
        )

    _stage(_sentinels(10, 20, -1, -2), "b_flush1.parquet", 1_000_000_100)
    _stage(_sentinels(30, 40, -3, -4), "c_flush2.parquet", 1_000_000_200)

    raw = (
        s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(data_dir)
    )
    out = run_to_memory(stream_stream_click_view_left_join(raw), mode="append")
    return out.filter(F.col("click_id") >= 0)


SQL_STREAM_SS_LEFT_JOIN = """
SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = c.user_id
 AND v.ts >= c.ts - INTERVAL '1 hour' AND v.ts <= c.ts
"""


def streaming_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Markov transition counts from the event stream via the
    remember-last-per-key stateful processor
    (streaming/windows.py:transition_counts_stateful). Batch twin: the
    lead() window + groupBy — the oracle below — which must agree
    row-for-row because the processor sorts each user's slice by the
    same (ts, event_id) order the window uses."""
    ev = stream_events(prep(spark), sf_dir)
    return run_to_memory(transition_counts_stateful(ev), mode="update")


SQL_STREAM_TRANSITIONS = """
WITH pairs AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id, cur, nxt, count(*) AS n
FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
"""


def streaming_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered-funnel stage distribution from the event STREAM
    (streaming/windows.py:funnel_stage_stateful — first view / first
    click strictly after / first purchase strictly after, stitched
    across micro-batches through per-user state), rolled up to
    (stage, n_users) after the memory sink. Batch twin: the same
    first-after chain the batch funnel uses, graded per user into the
    stage it reached — the oracle below."""
    from python_multiproc_bigdata_spark.streaming.windows import (
        funnel_stage_stateful,
    )

    ev = stream_events(prep(spark), sf_dir)
    staged = run_to_memory(funnel_stage_stateful(ev), mode="update")
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


SQL_STREAM_FUNNEL_STAGES = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
), u AS (SELECT DISTINCT user_id FROM events)
SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS stage,
       count(*) AS n_users
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
GROUP BY 1 ORDER BY 1
"""


def streaming_topk_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector serving: query embeddings arrive as a stream
    (two micro-batches via maxFilesPerTrigger=1) and each batch is
    served IVF top-k against the STATIC corpus inside foreachBatch —
    the online-serving shape of sim_topk_ivf_kmeans. Per-query top-k is
    batch-partition-invariant (each query's result depends only on that
    query and the corpus), and centroid training is deterministic, so
    the union of per-batch results equals the one-shot batch answer and
    the SAME generated centroid-literal oracle checks this query at
    full value level — a streaming query with a hash-exact oracle.

    Scale: the static side would be the materialized IVF index
    (build_ivf_index) with centroids broadcast once per batch; each
    micro-batch costs O(|batch| × nprobe/n_lists × corpus-scan), the
    same serving math as the batch tier."""
    import os

    from python_multiproc_bigdata_spark.operators.similarity import topk_ivf_kmeans
    from python_multiproc_bigdata_spark.registry.similarity import (
        IVF_KMEANS_CFG,
        N_QUERIES,
    )

    spark = prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    root = fixture_root("topk_serve", sf_dir)
    qdir = os.path.join(root, "queries")
    odir = os.path.join(root, "out")
    # two single-file appends -> maxFilesPerTrigger=1 yields two real
    # micro-batches, so the test exercises multi-batch serving
    for m in (0, 1):
        qs.filter(F.col("vec_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(qdir)
    cfg = IVF_KMEANS_CFG

    def serve(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        topk_ivf_kmeans(
            batch_df,
            emb,
            k=cfg["k"],
            nprobe=cfg["nprobe"],
            n_lists=cfg["n_lists"],
            max_iter=cfg["max_iter"],
            train_sample=cfg["train_sample"],
        ).write.mode("append").parquet(odir)

    q = (
        spark.readStream.schema(qs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(qdir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return spark.read.parquet(odir)


def streaming_classifier_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-model serving in Structured Streaming: documents arrive
    as a stream (two micro-batches via maxFilesPerTrigger=1) and each
    batch is scored by the quality classifier inside foreachBatch — the
    online form of curation_quality_classifier. The model is trained
    ONCE on the static corpus before the stream starts (the offline-
    train / online-score split every serving stack uses); per-doc score
    depends only on that doc and the broadcast weights, so the streamed
    union equals the one-shot batch answer and the SAME generated
    retraining oracle checks this query hash-exact.

    Scale: weights are 256 doubles broadcast once per batch; each
    micro-batch costs O(|batch| tokens) map-side work — the streaming
    twin inherits the batch plan's whole-stage-codegen scoring."""
    import os

    from python_multiproc_bigdata_spark.operators.classifier import (
        score_quality_lr,
        train_quality_lr_driver,
    )

    spark = prep(spark)
    docs = table(spark, sf_dir, "documents")
    w, b = train_quality_lr_driver(docs)
    root = fixture_root("clf_serve", sf_dir)
    ddir = os.path.join(root, "docs")
    odir = os.path.join(root, "out")
    for m in (0, 1):
        docs.filter(F.col("doc_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(ddir)

    def serve(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        score_quality_lr(batch_df, w, b).write.mode("append").parquet(odir)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ddir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return spark.read.parquet(odir).orderBy("doc_id")


def _classifier_serving_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.curation import (
        make_quality_classifier_oracle,
    )

    return make_quality_classifier_oracle()


def streaming_quantile_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch's streaming twin — the live proof of the
    sketch's MERGEABILITY contract (registry/stats.py:
    stats_quantile_sketch): event values arrive in micro-batches
    (maxFilesPerTrigger=1), each batch emits its PARTIAL 256-bucket
    histogram inside foreachBatch (never raw rows), and the monitor's
    answer is the interpolated readback over the cell-wise SUM of the
    partial sketches. Histogram counts are distributive, so the merged
    sketch is bit-identical to the one-shot batch sketch and the SAME
    oracle checks both (the streaming_topk_serving twin pattern).

    The grid (min/max cents) is registered ONCE before the stream from
    the static corpus — a 1-row driver read, the sketch-configuration
    analogue of broadcasting trained centroids; a production monitor
    pins the grid from history for exactly this mergeability reason.
    Scale: each micro-batch ships <=256 cells, the merge is a
    256-row groupBy — state never grows with stream length."""
    import os

    from python_multiproc_bigdata_spark.registry.stats import (
        quantile_sketch_readback,
    )

    spark = prep(spark)
    e = table(spark, sf_dir, "events")
    c = e.select(F.round(F.col("value") * 100).cast("long").alias("cents"))
    minc, maxc, n_total = c.agg(
        F.min("cents"), F.max("cents"), F.count(F.lit(1))
    ).collect()[0]

    root = fixture_root("qmon", sf_dir)
    cdir = os.path.join(root, "cents")
    hdir = os.path.join(root, "hist")
    for m in (0, 1):  # two micro-batches
        c.filter(F.col("cents") % 2 == m).coalesce(1).write.mode("append").parquet(cdir)

    span = maxc - minc + 1

    def sketch_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: a retried micro-batch must not
        # double its partial sketch into the cell-wise sum. Epoch-keyed
        # overwrite makes the write idempotent — a retry replaces its
        # own epoch dir instead of appending a second copy.
        if batch_df.isEmpty():
            return
        (
            batch_df.select(
                F.expr(
                    f"CAST((cents - {minc}L) * 256 DIV {span}L AS INT)"
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(os.path.join(hdir, f"epoch={epoch_id}"))
        )

    q = (
        spark.readStream.schema(c.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(cdir)
        .writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    # merge the partial sketches: cell-wise sum (partition discovery
    # over hdir yields an `epoch` column; the merge ignores it)
    merged = (
        spark.read.parquet(hdir)
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    mm = spark.createDataFrame(
        [(int(minc), int(maxc), int(n_total))], ["minc", "maxc", "n_total"]
    )
    return quantile_sketch_readback(spark, sf_dir, merged, mm)


def _quantile_monitor_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.stats import SQL_QUANTILE_SKETCH

    return SQL_QUANTILE_SKETCH


def streaming_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats_psi_drift's streaming twin (r9) — the live drift monitor a
    training pipeline actually deploys: events arrive in micro-batches
    (maxFilesPerTrigger=1), each batch emits its PARTIAL per-bucket
    (na, nb) slice counts inside foreachBatch (never raw rows,
    epoch-keyed overwrite so at-least-once retries stay idempotent),
    and the monitor's answer is the PSI readback over the cell-wise SUM
    of the partials (registry/stats.py:psi_readback — the exact
    arithmetic of the batch query, shared by construction). Counts are
    distributive, so the merged table is bit-identical to the one-shot
    groupBy and the SAME oracle value-checks both — the
    streaming_quantile_monitor mergeability pattern applied to drift.
    Scale: each micro-batch ships ≤10 bucket cells; merge state never
    grows with stream length."""
    import os

    from python_multiproc_bigdata_spark.registry.stats import psi_readback

    spark = prep(spark)
    e = table(spark, sf_dir, "events")
    rows = e.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias(
            "bucket"
        ),
        (
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8"
        ).alias("a"),
    )

    root = fixture_root("psimon", sf_dir)
    rdir = os.path.join(root, "rows")
    cdir = os.path.join(root, "cnt")
    for m in (0, 1):  # two micro-batches
        rows.filter(F.col("event_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(rdir)

    def count_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.groupBy("bucket")
            .agg(
                F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("na"),
                F.sum(F.when(~F.col("a"), 1).otherwise(0)).alias("nb"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(cdir, f"epoch={epoch_id}"))
        )

    q = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(rdir)
        .writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    merged = (
        spark.read.parquet(cdir)
        .groupBy("bucket")
        .agg(
            F.sum("na").cast("long").alias("na"),
            F.sum("nb").cast("long").alias("nb"),
        )
    )
    return psi_readback(merged)


def _psi_monitor_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.stats import SQL_PSI_DRIFT

    return SQL_PSI_DRIFT


def streaming_zip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source_zip_shards' streaming twin (r9) — archive shards arriving
    continuously, the realistic 100 TB ingest: binary ZIP shards land
    as a stream (maxFilesPerTrigger=1 → two micro-batches), each batch
    WALKS its archives inside foreachBatch (operators/archives.py:
    walk_zip_shards — the full APPNOTE walk with CRC verification) and
    writes the per-member integrity rows epoch-keyed, so at-least-once
    retries stay idempotent. The walk is map-only and per-member rows
    are micro-batch-invariant, so the unioned result equals the batch
    query value-for-value and the SAME md5 oracle checks both — the
    streaming_topk_serving invariance pattern applied to the ingest
    surface. Scale: per-batch state is the batch's own members; nothing
    accumulates, nothing touches the driver."""
    import os

    from python_multiproc_bigdata_spark.operators.archives import (
        pack_zip_shards,
        walk_zip_shards,
    )

    spark = prep(spark)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_zip_shards(d)

    root = fixture_root("zipingest", sf_dir)
    sdir = os.path.join(root, "shards")
    mdir = os.path.join(root, "members")
    for m in (0, 1):  # two arrival waves
        shards.filter(F.col("shard_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    def walk_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        walk_zip_shards(batch_df).write.mode("overwrite").parquet(
            os.path.join(mdir, f"epoch={epoch_id}")
        )

    q = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(walk_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(mdir).select(
        "shard_id", "doc_id", "method", "n_bytes", "crc_ok", "content_md5"
    )


def _zip_ingest_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.advanced import SQL_ZIP_SHARDS

    return SQL_ZIP_SHARDS


def streaming_targz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source_targz_shards' streaming twin (r10) — the SECOND archive
    family promoted to batch+streaming parity, completing the pairing
    streaming_zip_ingest started: tar.gz shards (gzip unwrap with
    CRC/ISIZE trailer verification, then the checksum-verified ustar
    walk) arrive as a two-wave stream and each micro-batch walks its
    archives inside foreachBatch, writing per-member integrity rows
    epoch-keyed so at-least-once retries stay idempotent. Per-member
    rows are micro-batch-invariant, so the unioned result equals the
    batch query value-for-value and the SAME md5 oracle checks both.
    Scale: per-batch state is the batch's own members; nothing
    accumulates, nothing touches the driver."""
    import os

    from python_multiproc_bigdata_spark.operators.archives import (
        pack_targz_shards,
        walk_targz_shards,
    )

    spark = prep(spark)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_targz_shards(d)

    root = fixture_root("targzingest", sf_dir)
    sdir = os.path.join(root, "shards")
    mdir = os.path.join(root, "members")
    for m in (0, 1):  # two arrival waves
        shards.filter(F.col("shard_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    def walk_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        walk_targz_shards(batch_df).write.mode("overwrite").parquet(
            os.path.join(mdir, f"epoch={epoch_id}")
        )

    q = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(walk_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(mdir).select(
        "shard_id", "doc_id", "method", "n_bytes", "crc_ok", "content_md5"
    )


def _targz_ingest_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.advanced import SQL_TARGZ_SHARDS

    return SQL_TARGZ_SHARDS


def phash_epoch_matcher(spark: SparkSession, store: str, pdir: str):
    """Build the foreachBatch closure of streaming_phash_neardup — one
    incremental epoch of the banded perceptual matcher: pHash-band the
    batch, candidate-join NEW bands vs (store ∪ new) on equal bands
    (never store×store), XOR-popcount verify, then land pairs AND the
    batch's bands epoch-keyed (overwrite per epoch; store read excludes
    the current epoch) so at-least-once retries are idempotent.
    Module-level so the checkpoint-recovery test drives the identical
    logic the registry query runs."""
    import os

    from python_multiproc_bigdata_spark.operators.multimodal import phash_bands
    from python_multiproc_bigdata_spark.registry.multimodal import AHASH_HAMMING_MAX

    def match_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_b = phash_bands(batch_df).localCheckpoint(eager=True)
        from pyspark.errors import AnalysisException

        try:
            old_b = (
                spark.read.parquet(store)
                .filter(F.col("epoch") < epoch_id)
                .select("doc_id", "band_idx", "band_val")
            )
        except AnalysisException as e:
            # ONLY the missing-path case means "first epoch"; a
            # corrupted or unreadable store must fail loudly, not
            # silently drop all historical signatures from matching
            if "PATH_NOT_FOUND" not in str(e) and "does not exist" not in str(e):
                raise
            old_b = spark.createDataFrame([], new_b.schema)
        all_b = new_b.withColumn("is_new", F.lit(True)).unionByName(
            old_b.withColumn("is_new", F.lit(False))
        )
        a = new_b.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_val")
        b = all_b.select(
            F.col("doc_id").alias("doc_b"), "band_idx", "band_val", "is_new"
        )
        cand = (
            a.join(b, ["band_idx", "band_val"])
            .filter((~F.col("is_new")) | (F.col("doc_a") < F.col("doc_b")))
            .filter(F.col("doc_a") != F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        x = all_b.select(
            F.col("doc_id").alias("doc_a"), "band_idx", F.col("band_val").alias("va")
        )
        y = all_b.select(
            F.col("doc_id").alias("doc_b"), "band_idx", F.col("band_val").alias("vb")
        )
        pairs = (
            cand.join(x, "doc_a")
            .join(y, ["doc_b", "band_idx"])
            .groupBy("doc_a", "doc_b")
            .agg(
                F.sum(F.bit_count(F.col("va").bitwiseXOR(F.col("vb"))))
                .cast("int")
                .alias("hamming")
            )
            .filter(F.col("hamming") <= AHASH_HAMMING_MAX)
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
                "hamming",
            )
        )
        pairs.write.mode("overwrite").parquet(os.path.join(pdir, f"epoch={epoch_id}"))
        new_b.write.mode("overwrite").parquet(os.path.join(store, f"epoch={epoch_id}"))

    return match_batch


def streaming_warcgz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source_warcgz_shards' streaming twin (r11) — crawl archives
    arriving continuously, the THIRD archive family at batch+streaming
    parity (after zip and tar.gz): warc.gz shards land as a two-wave
    stream, each micro-batch splits the per-record gzip members
    (CRC/ISIZE verified), walks the ISO 28500 records, extracts the
    HTML text, and writes per-record integrity+extraction rows
    epoch-keyed so at-least-once retries stay idempotent. Per-record
    rows are micro-batch-invariant, so the unioned result equals the
    batch query value-for-value and the SAME byte-exact oracle checks
    both. Per-batch state is the batch's own records; nothing
    accumulates, nothing touches the driver."""
    import os

    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warcgz_shards,
        walk_warcgz_shards,
    )

    spark = prep(spark)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_warcgz_shards(d)

    root = fixture_root("warcgzingest", sf_dir)
    sdir = os.path.join(root, "shards")
    mdir = os.path.join(root, "records")
    for m in (0, 1):  # two arrival waves
        shards.filter(F.col("shard_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    def walk_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        walk_warcgz_shards(batch_df).write.mode("overwrite").parquet(
            os.path.join(mdir, f"epoch={epoch_id}")
        )

    q = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(walk_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(mdir).select(
        "shard_id", "doc_id", "n_bytes", "content_md5", "text_md5", "n_chars"
    )


def _warcgz_ingest_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.advanced import SQL_WARC_SHARDS

    return SQL_WARC_SHARDS


def crawl_admission_matcher(rules: DataFrame, outdir: str):
    """foreachBatch body for the streaming crawl-admission gate:
    normalize each raw URL with the RFC 3986 JVM normalizer, derive
    (host, path), apply the RFC 9309 robots verdict against the
    broadcast `rules` dimension, and write the batch's verdict rows
    under epoch={id} with mode('overwrite') — a retried epoch rewrites
    its own directory (at-least-once → idempotent), never appends.
    Stateless per row, so rows are micro-batch-invariant and the
    unioned result equals the one-shot batch answer. Module-level so
    the checkpoint-recovery test drives the identical logic."""
    import os

    from python_multiproc_bigdata_spark.operators.curation import normalize_url
    from python_multiproc_bigdata_spark.operators.warc import robots_gate

    def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        n = normalize_url(F.col("url"))
        rows = (
            batch_df.select("doc_id", "url", n.alias("_n"))
            .select(
                "doc_id",
                "url",
                F.col("_n.norm_url").alias("norm_url"),
                F.col("_n.host").alias("host"),
            )
            .withColumn(
                "path",
                F.regexp_extract(
                    "norm_url", r"^[a-z0-9+.\-]+://[^/]*(/[^?#]*)", 1
                ),
            )
        )
        robots_gate(rows, rules).select(
            "doc_id", "url", "host", "path", "allowed"
        ).write.mode("overwrite").parquet(
            os.path.join(outdir, f"epoch={epoch_id}")
        )

    return gate_batch


def streaming_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming crawl admission (r12) — the incremental twin of
    curation_url_normalize ∘ curation_robots_gate, completing the
    streaming crawl story beside the WARC.gz ingest and pHash twins:
    raw frontier URLs (mixed-case scheme/host, scheme-default ports,
    './'+'..' dot segments, fragments) arrive as a two-wave stream;
    each micro-batch normalizes them JVM-side, derives (host, path) —
    the five path shapes normalize EXACTLY onto the robots corpus's
    five checked classes — and gates them against the static per-host
    RFC 9309 rules dimension (parsed once, eagerly materialized,
    broadcast per batch). Verdict rows land epoch-keyed with per-epoch
    overwrite, so at-least-once retries are idempotent and the union
    equals the batch answer value-for-value. The oracle CASE-replays
    raw URL, normalized (host, path), and verdict per residue class —
    no shared logic with normalizer, parser, or matcher."""
    import os

    from python_multiproc_bigdata_spark.operators.warc import robots_rules
    from python_multiproc_bigdata_spark.registry.curation import (
        ROBOTS_G0,
        ROBOTS_G1,
        ROBOTS_G2,
    )

    spark = prep(spark)
    d = table(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id")
    raw = d.select(
        "doc_id",
        F.concat(
            F.when(m % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
            F.lit("://WWW.Site"), (m % 7).cast("string"), F.lit(".ExAmple.COM"),
            F.when(m % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
            F.when(m % 5 == 0, F.lit(""))
            .when(m % 5 == 1, F.lit("/a/./b"))
            .when(m % 5 == 2, F.lit("/a/x/../c"))
            .when(m % 5 == 3, F.lit("/a/b/."))
            .otherwise(F.lit("/y/z/..")),
            F.when(m % 3 == 1, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
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
    rules = robots_rules(hosts, agent="pmb-bot").localCheckpoint(eager=True)

    root = fixture_root("crawladmission", sf_dir)
    sdir = os.path.join(root, "urls")
    mdir = os.path.join(root, "verdicts")
    for w in (0, 1):  # two arrival waves
        raw.filter(F.col("doc_id") % 2 == w).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    q = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(crawl_admission_matcher(rules, mdir))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(mdir).select(
        "doc_id", "url", "host", "path", "allowed"
    )


# CASE-replays the raw URL concat, the normalized (host, path) — the
# five raw path shapes fold onto the robots corpus's five classes —
# and the RFC 9309 verdict per residue class (same hand-derived
# precedence table as SQL_ROBOTS_GATE).
SQL_CRAWL_ADMISSION = """
SELECT doc_id,
  concat(
    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END,
    '://WWW.Site', CAST(doc_id % 7 AS VARCHAR), '.ExAmple.COM',
    CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END,
    CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/a/./b'
         WHEN 2 THEN '/a/x/../c' WHEN 3 THEN '/a/b/.' ELSE '/y/z/..' END,
    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END
  ) AS url,
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


def streaming_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal_image_phash_neardup's INCREMENTAL twin (r11) — what a
    live image-ingest pipeline actually runs: images arrive in waves
    and each micro-batch is matched against the ACCUMULATED signature
    store (the dedup_incremental_novelty posture on the perceptual
    surface), so yesterday's corpus is never re-paired.

    Per foreachBatch epoch: (1) pHash-band the batch's images
    (operators/multimodal.py:phash_bands), (2) candidates from the
    equal-band equi-join of NEW bands vs (store ∪ new) — never
    store×store, so per-epoch join work tracks the batch, not history;
    within-batch pairs keep doc_a < doc_b, cross-batch pairs keep the
    new-vs-old orientation, so every unordered pair is emitted EXACTLY
    once, in the epoch its later member arrives, (3) exact XOR-popcount
    verify (Hamming ≤ 3, complete under the 4×16-bit band pigeonhole),
    (4) results AND the batch's bands land epoch-keyed (overwrite per
    epoch; the store read excludes the current epoch), so at-least-once
    retries stay idempotent for both the output and the store. The
    union across epochs therefore equals the batch query
    value-for-value and the SAME generated pure-Python replay oracle
    (make_phash_oracle) checks both. Recovery is exercised in
    tests/test_streaming_recovery.py. Scale: state = the band store
    (4 rows/image, partition-pruned by epoch), per-epoch shuffle keyed
    on (band_idx, band_val) — the posting-list shape, never all-pairs."""
    import os

    from python_multiproc_bigdata_spark.operators.multimodal import attach_ppm

    spark = prep(spark)
    d = table(spark, sf_dir, "documents")
    imgs = attach_ppm(d)

    root = fixture_root("phashstream", sf_dir)
    sdir = os.path.join(root, "images")
    store = os.path.join(root, "bands")
    pdir = os.path.join(root, "pairs")
    for m in (0, 1):  # two arrival waves
        imgs.filter(F.col("doc_id") % 2 == m).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    match_batch = phash_epoch_matcher(spark, store, pdir)

    q = (
        spark.readStream.schema(imgs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(pdir).select("doc_a", "doc_b", "hamming")


def _phash_stream_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.multimodal import make_phash_oracle

    return make_phash_oracle()


def streaming_audio_snippet_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal_audio_snippet_match's streaming twin (r11) — query
    clips arriving continuously against the MATERIALIZED landmark index
    (the streaming_topk_serving posture on the audio surface; the
    corpus landmark relation IS the inverted index a deployment keeps
    hot): snippet WAVs land in two waves, each foreachBatch epoch cuts
    its snippets' landmarks and runs the landmark-key join +
    time-offset voting against the static corpus relation, writing
    per-snippet winners epoch-keyed so at-least-once retries stay
    idempotent. Each snippet's winner depends only on its own landmarks
    vs the corpus — micro-batch-INVARIANT — so the epoch union equals
    the batch answer value-for-value and the SAME generated
    pure-Python replay oracle (make_audio_snippet_oracle) checks both.
    Scale: per-epoch work = |batch snippets| broadcast onto the corpus
    posting lists; nothing accumulates."""
    import os

    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_wav_fp,
        audio_landmarks,
        audio_match_snippets,
    )

    spark = prep(spark)
    d = table(spark, sf_dir, "documents")
    corpus_lm = audio_landmarks(attach_wav_fp(d)).localCheckpoint(eager=True)
    snip_wavs = attach_wav_fp(d.filter(F.col("doc_id") % 5 == 0))

    root = fixture_root("audiosnipstream", sf_dir)
    sdir = os.path.join(root, "snippets")
    mdir = os.path.join(root, "matches")
    for m in (0, 1):  # two arrival waves
        snip_wavs.filter((F.col("doc_id") % 10 == 5 * m)).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)

    def match_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snips = audio_landmarks(batch_df, snippet=True)
        audio_match_snippets(snips, corpus_lm, min_votes=2).write.mode(
            "overwrite"
        ).parquet(os.path.join(mdir, f"epoch={epoch_id}"))

    q = (
        spark.readStream.schema(snip_wavs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
        .writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    return spark.read.parquet(mdir).select(
        "snippet_id", "matched_doc", "dt", "votes"
    )


def _audio_snippet_stream_oracle() -> str:
    from python_multiproc_bigdata_spark.registry.multimodal import (
        make_audio_snippet_oracle,
    )

    return make_audio_snippet_oracle()


REGISTRY = {
    # same generated centroid-literal oracle as sim_topk_ivf_kmeans:
    # per-query top-k is micro-batch-invariant, so the streamed union
    # must equal the one-shot batch answer value-for-value
    "streaming_topk_serving": QuerySpec(
        streaming_topk_serving, make_ivf_kmeans_oracle
    ),
    # same generated retraining oracle as curation_quality_classifier:
    # per-doc scores are micro-batch-invariant
    "streaming_classifier_serving": QuerySpec(
        streaming_classifier_serving, _classifier_serving_oracle
    ),
    "streaming_cdc_merge": QuerySpec(streaming_cdc_merge, SQL_STREAM_CDC),
    # same generated pure-Python pHash replay as the batch near-dup:
    # every unordered pair is emitted exactly once (in its later
    # member's epoch), so the epoch union equals the batch answer
    "streaming_phash_neardup": QuerySpec(
        streaming_phash_neardup, _phash_stream_oracle
    ),
    # micro-batch-invariant serving twin: same generated replay oracle
    # as the batch snippet matcher
    "streaming_audio_snippet_match": QuerySpec(
        streaming_audio_snippet_match, _audio_snippet_stream_oracle
    ),
    # third archive family at batch+streaming parity: same byte-exact
    # page/extraction oracle as the batch warc.gz walk
    "streaming_warcgz_ingest": QuerySpec(
        streaming_warcgz_ingest, _warcgz_ingest_oracle
    ),
    # incremental URL-normalize + robots gate: the streaming front of
    # the crawl family (r12)
    "streaming_crawl_admission": QuerySpec(
        streaming_crawl_admission, SQL_CRAWL_ADMISSION
    ),
    "streaming_transition_counts": QuerySpec(
        streaming_transition_counts, SQL_STREAM_TRANSITIONS
    ),
    "streaming_funnel_stages": QuerySpec(
        streaming_funnel_stages, SQL_STREAM_FUNNEL_STAGES
    ),
    "streaming_session_counts": QuerySpec(streaming_session_counts, SQL_STREAM_SESSION),
    "streaming_dedup_watermark": QuerySpec(streaming_dedup_watermark, SQL_STREAM_DEDUP),
    "streaming_tumbling_counts": QuerySpec(streaming_tumbling_counts, SQL_STREAM_TUMBLING),
    "streaming_first_event": QuerySpec(streaming_first_event, SQL_STREAM_FIRST),
    "streaming_sliding_counts": QuerySpec(streaming_sliding_counts, SQL_STREAM_SLIDING),
    "streaming_words_doc_frequency": QuerySpec(streaming_words_doc_frequency, SQL_STREAM_WORDS),
    "streaming_enriched_counts": QuerySpec(streaming_enriched_counts, SQL_STREAM_ENRICHED),
    "streaming_click_view_join": QuerySpec(streaming_click_view_join, SQL_STREAM_SS_JOIN),
    "streaming_click_view_left_join": QuerySpec(
        streaming_click_view_left_join, SQL_STREAM_SS_LEFT_JOIN
    ),
    # same oracle as stats_quantile_sketch: histogram cells are
    # distributive, so the micro-batch-merged sketch must read back
    # bit-identically to the one-shot batch sketch
    # same shared-readback proof as the quantile monitor: merged partial
    # PSI counts read back bit-identically to the one-shot batch query
    "streaming_targz_ingest": QuerySpec(
        streaming_targz_ingest, _targz_ingest_oracle
    ),
    "streaming_zip_ingest": QuerySpec(
        streaming_zip_ingest, _zip_ingest_oracle
    ),
    "streaming_psi_monitor": QuerySpec(
        streaming_psi_monitor, _psi_monitor_oracle
    ),
    "streaming_quantile_monitor": QuerySpec(
        streaming_quantile_monitor, _quantile_monitor_oracle
    ),
}
