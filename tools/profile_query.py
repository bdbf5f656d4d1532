"""Per-query profiler for the r12 optimization round (guide §1).

For each named query: N timed noop-sink materializations plus, on the
last run, the Spark job/stage count consumed (statusTracker id deltas)
— the direct measure of scheduling-overhead-bound queries at sf0.1 —
and optionally the formatted plan written to plans/r12/.

Usage: python tools/profile_query.py [--plans DIR] [--repeats N] name...
       python tools/profile_query.py --top K   (K slowest from BENCH_FULL.json)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def profile_one(spark, name: str, repeats: int, plans_dir: str | None) -> dict:
    fn = REGISTRY[name].fn
    sc = spark.sparkContext
    times = []
    jobs = stages = 0
    for i in range(repeats):
        sc.setJobDescription(f"profile:{name}")
        # mirror bench.py's r12 measurement fix: a persisted subtree from
        # the previous repeat would otherwise serve this one via
        # CacheManager plan matching
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        j0 = sc.statusTracker().getJobIdsForGroup(None)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times.append(dt)
        if i == repeats - 1:
            # job ids are monotonically increasing; count ids issued
            # between build and now by re-listing all jobs
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            jobs = len(set(j1) - set(j0))
            if plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        sc.setJobDescription(None)
    times.sort()
    return {
        "name": name,
        "median": round(times[len(times) // 2], 3),
        "min": round(times[0], 3),
        "build_s": round(t_build, 3),
        "jobs_last_run": jobs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        full = json.load(open(Path(__file__).resolve().parent.parent / "BENCH_FULL.json"))
        ranked = sorted(full["queries"].items(), key=lambda x: -x[1])
        names += [k for k, _ in ranked[: args.top]]

    conf = {"spark.ui.showConsoleProgress": "false"}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        conf[k] = v
    spark = get_spark(app_name="pmb-profile", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    try:
        REGISTRY[names[0]].fn(spark, SF_DIR).limit(1).collect()
    except Exception:
        pass
    out = []
    for n in names:
        try:
            r = profile_one(spark, n, args.repeats, args.plans)
        except Exception as e:  # noqa: BLE001
            r = {"name": n, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(r), flush=True)
        out.append(r)
    tot = sum(r.get("median", 0) for r in out)
    print(json.dumps({"total_median": round(tot, 3), "n": len(out)}))


if __name__ == "__main__":
    main()
