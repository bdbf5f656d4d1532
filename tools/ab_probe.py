"""A/B timing probe for bench-mover adjudication: run the named
queries N times each (noop-sink forced, bench.py's materialization
discipline) in one warm session and print per-query samples +
median/min as ONE JSON line. Run on an idle box in a worktree at the
old commit and on HEAD; compare medians.

Usage: python tools/ab_probe.py q1 [q2 ...] [--n 5] [--sf DIR]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    sf = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--n":
            n = int(sys.argv[1:][i + 1])
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
    names = [a for a in args if a in REGISTRY]
    spark = get_spark(app_name="ab-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM/codegen startup not billed to the first sample
    REGISTRY["q1_pricing_summary"].fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, dict] = {}
    for name in names:
        ts: list[float] = []
        for _ in range(n):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 2))
        s = sorted(ts)
        out[name] = {"samples": ts, "median": s[len(s) // 2], "min": s[0]}
    print(json.dumps({"sf_dir": sf, "results": out}))


if __name__ == "__main__":
    raise SystemExit(main())
