"""Diff two bench artifacts: per-query timings side-by-side with deltas,
flagging moves beyond a noise threshold (default 20%). Works with both
the old min-of-2 format (flat seconds) and the r4+ median format.

Usage: python tools/bench_compare.py BENCH_r03.json BENCH_r04.json [pct]
"""

from __future__ import annotations

import json
import sys


def timings(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)
    return parsed.get("queries", {})


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    a, b = timings(a_path), timings(b_path)
    shared = sorted(set(a) & set(b))
    flagged = 0
    print(f"{'query':36s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for q in shared:
        if a[q] <= 0:
            continue
        pct = (b[q] - a[q]) / a[q] * 100
        mark = " <-- " if abs(pct) >= thresh else ""
        if mark:
            flagged += 1
        print(f"{q:36s} {a[q]:8.3f} {b[q]:8.3f} {pct:+7.1f}%{mark}")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    ta, tb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    if ta > 0:
        print(f"\nshared total: {ta:.1f}s -> {tb:.1f}s "
              f"({(tb - ta) / ta * 100:+.1f}%), {flagged} queries moved >={thresh:.0f}%")
    else:
        print("\nno overlapping timed queries between the two artifacts")
    if only_a:
        print(f"only in {a_path}: {', '.join(only_a)}")
    if only_b:
        print(f"only in {b_path}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
