"""Within-session interleaved A/B of runtime SQL confs (guide §1).

Runs the named queries alternately under conf set A and conf set B in
ONE session (so JIT/codegen warmup and page cache are shared), several
passes each, and reports per-query medians per arm. Only runtime-settable
confs (spark.sql.*) can be A/B'd this way.

Usage:
  python tools/ab_conf.py --a k=v[,k=v...] --b k=v[,k=v...] \
      [--passes 4] name...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def parse_confs(s: str) -> dict[str, str]:
    out = {}
    for kv in s.split(","):
        if kv:
            k, _, v = kv.partition("=")
            out[k] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--passes", type=int, default=4)
    args = ap.parse_args()
    conf_a, conf_b = parse_confs(args.a), parse_confs(args.b)

    spark = get_spark(app_name="pmb-ab",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # thorough warmup: run every query once un-timed (JIT + codegen)
    for n in args.names:
        try:
            REGISTRY[n].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in args.names
    }
    for p in range(args.passes):
        for arm, conf in (("A", conf_a), ("B", conf_b)):
            for k, v in conf.items():
                spark.conf.set(k, v)
            for n in args.names:
                t0 = time.perf_counter()
                REGISTRY[n].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                results[n][arm].append(time.perf_counter() - t0)
        print(f"pass {p + 1}/{args.passes} done", file=sys.stderr, flush=True)

    tot_a = tot_b = 0.0
    for n in args.names:
        ma = statistics.median(results[n]["A"])
        mb = statistics.median(results[n]["B"])
        tot_a += ma
        tot_b += mb
        print(json.dumps({
            "name": n, "A_median": round(ma, 3), "B_median": round(mb, 3),
            "delta_pct": round((mb - ma) / ma * 100, 1),
            "A_all": [round(x, 2) for x in results[n]["A"]],
            "B_all": [round(x, 2) for x in results[n]["B"]],
        }))
    print(json.dumps({"A_total": round(tot_a, 3), "B_total": round(tot_b, 3)}))


if __name__ == "__main__":
    main()
