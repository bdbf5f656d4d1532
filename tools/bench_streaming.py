"""Streaming throughput bench: drive the events parquet through the
Structured Streaming pipelines (tumbling window agg, watermark dedup,
CDC merge-per-batch) in bounded micro-batches and report rows/sec.

The reference's only streaming story is its bounded queue pipeline
(v2/core/pipline.py) whose published rate is the 1.95 MB/s words ETL
(BASELINE.md); this harness measures the Structured Streaming
equivalent end-to-end — source listing, micro-batch planning, stateful
agg, sink — not just the map work. `maxFilesPerTrigger` is 1 and the
input is one parquet file per run, so each query pays at least one full
micro-batch cycle; multi-batch behavior is covered by the functional
tests (tests/test_operators.py streaming cases).

Usage: python tools/bench_streaming.py   (env: SPARK_GRAFT_SF_DIR)
Prints ONE JSON line: {"metric": "streaming_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry.common import load_events
from python_multiproc_bigdata_spark.session import get_spark
from python_multiproc_bigdata_spark.streaming import windows as W


def _drain(df, mode: str) -> None:
    q = (
        df.writeStream.outputMode(mode)
        .format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pmb-spark-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    n_rows = load_events(spark, sf_dir).count()  # nanos-safe read

    cases = {
        "tumbling_counts": lambda: (
            _drain(W.tumbling_counts(W.stream_events(spark, sf_dir)), "complete")
        ),
        "sliding_counts": lambda: (
            _drain(W.sliding_counts(W.stream_events(spark, sf_dir)), "complete")
        ),
        "watermark_dedup": lambda: (
            _drain(
                W.dedup_within_watermark(
                    W.stream_events(spark, sf_dir), ["user_id", "event_type"]
                ),
                "append",
            )
        ),
        "stream_stream_join": lambda: (
            _drain(
                W.stream_stream_click_view_join(W.stream_events(spark, sf_dir)),
                "append",
            )
        ),
    }

    # warmup absorbs JVM/codegen/stream-planner startup
    cases["tumbling_counts"]()

    timings: dict[str, float] = {}
    for name, run in cases.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "value": round(len(cases) * n_rows / total),
                "unit": "rows/sec",
                "input_rows": n_rows,
                "queries_sec": timings,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
