"""Structured Streaming variants (SURVEY §7 M5) of the engine's
aggregations over the `events` stream table.

The reference's pipeline is a bounded stream with an end-of-data flag
protocol (v2/core/pipline.py:66-70,95-104) — Structured Streaming is the
unbounded generalization: watermarks replace the completion flags,
windows replace whole-input aggregation, and
`dropDuplicatesWithinWatermark` is the streaming form of the
ConcurrentKeyBagSet dedup state store (SURVEY §2.4 A3/A4).

For tests/driver runs the parquet file drives the stream to completion
synchronously (memory sink + processAllAvailable) — the guide's pattern.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_sink_ids = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of the events table: readStream over the parquet
    file with `ts` normalized to a TIMESTAMP exactly like the batch
    loader (registry/common.py:load_events), so streaming and batch
    aggregations agree row-for-row.

    readStream needs an explicit schema, so probe the file's batch
    schema (driver-side metadata read, no data scan) and mirror the
    batch loader's type adaptation: int64 → nanos truncated to micros;
    TIMESTAMP_NTZ → session-local TIMESTAMP (session tz pinned UTC).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if ts_type != "timestamp":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds") -> DataFrame:
    """Per-user session aggregation with Spark-native session windows —
    the streaming generalization of the batch islands sessionization
    (merge-on-overlap state instead of a lag window).

    With the bounded single-file harness source the whole table arrives
    in ONE micro-batch (availableNow + one parquet file), so
    complete-mode output equals the batch session_window aggregation.
    In production a nonzero watermark delay bounds late-event merging
    and append mode emits each session once its window closes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def first_event_per_key(events: DataFrame) -> DataFrame:
    """Streaming scoped-distinct (A3's streaming form, deterministic):
    min event per (user, type) — complete-mode aggregation rather than
    dropDuplicates so the 'first' doesn't depend on partition order."""
    return events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming dedup
    (the A4 bag-set replacement)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count and value sum, one output row per user per
    micro-batch (the streaming generalization of the reference's
    accumulating reducer state, SURVEY §2.4 A1/A4).

    State is a (count, total) pair per user — O(users) state, Arrow
    batches in and out, no per-row Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 4)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def use_rocksdb_state_store(spark) -> str | None:
    """Explicit opt-in to the RocksDB state store provider (required by
    transformWithState). Session-wide and read at query START, so it is
    deliberately NOT set inside operator builders — switching providers
    mid-session invalidates existing HDFS-backed streaming checkpoints.
    Returns the previous provider value (None if unset) so a harness can
    restore it after its query stops."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return prev


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals on the transformWithStateInPandas API (the
    Spark 4 successor to applyInPandasWithState): identical semantics —
    per-user running (count, value-sum), one row per user per
    micro-batch — with typed ValueState instead of a raw tuple. Kept as
    a twin so both stateful APIs stay exercised; new stateful operators
    should start from this one (state schema evolution, TTL, and timers
    only exist here).

    Requires the RocksDB state store provider — a Spark requirement for
    transformWithState, and a SESSION-WIDE conf read at query start, so
    this operator does NOT set it implicitly (a silent provider switch
    can invalidate existing HDFS-backed checkpoints of unrelated queries
    in the same session): callers opt in via use_rocksdb_state_store()
    before starting the query. Also needs a working `google.protobuf`
    (the TWS state-server wire protocol): this container ships a broken
    protobuf, so the twin test skips here and the applyInPandasWithState
    form (running_user_totals) carries the tested stateful path."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id long, n_events long, total_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, round(total, 4)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def foreach_batch_multi_sink(
    stream: DataFrame, sinks: list, checkpoint_dir: str | None = None
):
    """L8's streaming form: exactly-once multi-sink fan-out via
    foreachBatch — each micro-batch is persisted once and written to every
    sink (the streaming equivalent of Pipeline.run's persist+writes;
    reference replicated items to all loader queues, pipline.py:127-135).

    Returns the started StreamingQuery; caller stops it.
    """
    from pyspark import StorageLevel

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for sink in sinks:
                sink(batch_df)
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def foreach_batch_cdc_apply(
    changes: DataFrame,
    target_path: str,
    keys: list[str],
    version_col: str,
    checkpoint_dir: str | None = None,
):
    """Streaming MERGE INTO emulation without a table format: every
    micro-batch of the change feed is merged into the parquet target by
    HIGHEST VERSION per key (operators/cdc.latest_per_key over
    target ∪ batch) — read, merge, write-to-tmp, swap. Version-aware
    apply makes the result independent of micro-batch arrival order
    (an unconditional upsert would let a late-arriving old version
    clobber a newer row); versions must be unique per key.

    The tmp-write materializes the merge BEFORE the old target is
    replaced, then the rename-pair swap (maintenance._swap_directories)
    makes it live — a mid-write crash leaves the previous target
    intact, and the unreadable window is two renames, not an rmtree;
    foreachBatch gives per-epoch exactly-once on top. This is precisely
    what Delta/Iceberg MERGE does with a transactional commit instead of
    the directory swap — same logical plan, swap the sink when a table
    format is available. Returns the started StreamingQuery.
    """
    spark = changes.sparkSession

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        from python_multiproc_bigdata_spark.operators.cdc import latest_per_key
        from python_multiproc_bigdata_spark.operators.maintenance import (
            _swap_directories,
        )

        target = spark.read.parquet(target_path)
        merged = latest_per_key(
            target.unionByName(batch_df.select(*target.columns)),
            keys,
            version_col,
        )
        tmp = target_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)  # full read of old target
        _swap_directories(target_path, tmp)

    writer = changes.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_stream_click_view_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER interval join: each click pairs with the same
    user's views in the preceding `lookback` (attribution, both sides
    unbounded). Watermarks on BOTH sides plus the time-interval join
    condition are what let Spark evict join state — without them the
    buffered sides grow forever; with them state is bounded by
    watermark + lookback per user. The bounded harness file arrives in
    one micro-batch, so append-mode output equals the batch interval
    join the oracle runs."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return clicks.join(
        views,
        (F.col("user_id") == F.col("view_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).select("click_id", "user_id", "view_id")


def stream_stream_click_view_left_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the null-padding
    semantics the inner variant above cannot express: a click with NO
    view in its lookback window is still emitted (view_id NULL), but
    only once the watermark proves no matching view can still arrive.
    State stays bounded exactly as in the inner join; the NEW mechanics
    are on the output side — unmatched rows surface at state EVICTION,
    i.e. one micro-batch after the global watermark passes them, so a
    bounded replay must keep advancing the watermark after the real
    data ends (see registry/streaming.py:streaming_click_view_left_join
    for the staged sentinel-flush pattern)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return clicks.join(
        views,
        (F.col("user_id") == F.col("view_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "left_outer",
    ).select("click_id", "user_id", "view_id")


def run_to_memory(df: DataFrame, mode: str = "complete") -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion through a
    memory sink; returns the materialized result as a batch DataFrame."""
    name = f"stream_out_{os.getpid()}_{next(_sink_ids)}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return df.sparkSession.table(name)


def stitch_transitions(pdf, last_type, counts) -> str | None:
    """The pure per-batch fold of transition_counts_stateful: sort one
    user's batch slice by (ts, event_id), count (last>current)
    transitions into `counts` (in place, including the pair that spans
    the previous batch via `last_type`), return the new last event
    type. Module-level so the cross-batch stitching contract is unit-
    testable without a streaming harness."""
    pdf = pdf.sort_values(["ts", "event_id"])
    for et in pdf["event_type"]:
        if last_type is not None:
            k = last_type + ">" + et
            counts[k] = counts.get(k, 0) + 1
        last_type = et
    return last_type


def transition_counts_stateful(events: DataFrame) -> DataFrame:
    """Streaming Markov transition counter — the remember-last-per-key
    stateful pattern: per user, state carries the LAST event seen
    (so a transition spanning two micro-batches is still counted) plus
    the accumulated (cur>nxt) counts; each batch emits the user's full
    updated transition counts (update mode). This is the streaming twin
    of the batch lead() transition matrix — the batch form re-sorts
    history, the streaming form pays O(1) state per user.

    State is a flat struct (last event fields + a JSON counts blob):
    applyInPandasWithState state structs are fixed-schema, and the
    per-user alphabet is |event_types|^2-bounded, so the blob stays
    tiny. The inner loop is per-row Python over ONE user's batch slice
    (bounded by per-user activity per trigger); at higher volume,
    compute within-batch transitions vectorized (shift+concat) and only
    stitch the batch-boundary pair through state."""
    import json

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, cur string, nxt string, n long"
    state_schema = "last_type string, counts string"

    def update(key, pdf_iter, state):
        if state.exists:
            last_type, cjson = state.get
            counts = json.loads(cjson)
            last_type = last_type or None
        else:
            last_type, counts = None, {}
        for pdf in pdf_iter:
            last_type = stitch_transitions(pdf, last_type, counts)
        state.update((last_type or "", json.dumps(counts, sort_keys=True)))
        if counts:
            rows = [
                (key[0], *k.split(">"), n) for k, n in sorted(counts.items())
            ]
            yield pd.DataFrame(rows, columns=["user_id", "cur", "nxt", "n"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_funnel_stage(pdf, tv: float, tc: float, tp: float):
    """The pure per-batch fold of funnel_stage_stateful: sort one user's
    batch slice by (ts, event_id) and advance the (t_view, t_click,
    t_purchase) epoch state (-1 = unset) under the strict first-after
    rule. Module-level so the cross-batch stitching contract is
    unit-testable without a streaming harness (the stitch_transitions
    discipline)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    for et, ts in zip(pdf["event_type"], pdf["ts"]):
        t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
        if et == "view" and tv < 0:
            tv = t
        elif et == "click" and tv >= 0 and t > tv and tc < 0:
            tc = t
        elif et == "purchase" and tc >= 0 and t > tc and tp < 0:
            tp = t
    return tv, tc, tp


def funnel_stage_stateful(events: DataFrame) -> DataFrame:
    """Streaming ordered-funnel tracker — per user, state carries the
    first view, the first click STRICTLY AFTER it, and the first
    purchase strictly after that (the exact rule of the batch
    events_funnel_conversion), each as an epoch-seconds double (-1 =
    unset; micro-precision epochs are exact in float64). Each batch
    folds its slice in (ts, event_id) order, stitching across batches
    through the state, and emits the user's current stage (0-3) in
    update mode.

    Event-time caveat (shared with the transition counter): a stage
    event arriving in a LATER batch than a logically-later event is
    folded in arrival order per batch — with the availableNow file
    source (one batch) the fold equals the batch plan row-for-row,
    which is what the oracle checks."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, stage int"
    state_schema = "t_view double, t_click double, t_purchase double"

    def update(key, pdf_iter, state):
        tv, tc, tp = state.get if state.exists else (-1.0, -1.0, -1.0)
        for pdf in pdf_iter:
            tv, tc, tp = fold_funnel_stage(pdf, tv, tc, tp)
        state.update((tv, tc, tp))
        stage = 3 if tp >= 0 else 2 if tc >= 0 else 1 if tv >= 0 else 0
        yield pd.DataFrame([(key[0], stage)], columns=["user_id", "stage"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
