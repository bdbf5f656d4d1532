"""Sweep EVERY registered query's optimized plan for unpartitioned
Window operators with no Limit bound (plans/guard.py) — the judge's
global guard, runnable standalone. Prints one line per offender and a
summary; tests/test_window_guard.py asserts the same sweep against the
documented whitelist.

Usage: python tools/window_guard_report.py [sf_dir]
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.plans.guard import unbounded_global_windows
from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="window-guard", shuffle_partitions=8)
    offenders: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if name.startswith("streaming_"):
            # a streaming query RUNS its pipeline at construction and
            # returns a read of the sink — the returned plan carries no
            # window logic to audit (the batch twins are audited here)
            continue
        print(f"... {name}", flush=True)
        try:
            bad = unbounded_global_windows(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errors[name] = f"{type(e).__name__}: {e}"[:160]
            traceback.print_exc()
            continue
        if bad:
            offenders[name] = len(bad)
            print(f"WINDOW {name}: {len(bad)} unbounded global window(s)")
    print(f"\n{len(offenders)} offender(s), {len(errors)} error(s) "
          f"of {len(REGISTRY)} queries at {sf_dir}")
    for n, e in errors.items():
        print(f"ERROR {n}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
