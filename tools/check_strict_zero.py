"""Driver-strict ±0.0 exposure scan over the CHECKED_FIRST window.

tools/check_parity.py deliberately collapses -0.0/+0.0 to "0" (norm_cell)
— but the driver's value hash does NOT, which is exactly how
stats_psi_drift went rows+schema-green / hash-red in round 7: a
sum-order-jittered double rounded to -0.0 on one engine and +0.0 on the
other. This scan re-runs every window query with EXACT repr() on floats
(no zero collapse, native fetchall types on the DuckDB side — pandas
fetchdf coerces ints to floats and fabricates false diffs) and reports
any strict mismatch before the driver can find it.

Caught in r8: text_heaps_law's OLS beta (-0.0 on DuckDB's closed-
vocabulary corpus). Fix pattern: `round(x, 4) + 0.0` on BOTH engines —
IEEE addition collapses -0.0 to +0.0 without moving any nonzero value —
or integer micro-units for sum-shaped columns (the psi fix).

Run:  python tools/check_strict_zero.py   (window queries, sf0.01)

SUPERSEDED for full-registry runs by tools/gate.py (r9), which adds the
divergence class this tool cannot see: DuckDB results re-fetched via
pandas, where HUGEINT/DECIMAL output columns coerce to float64 ('5.0'
vs Spark's '5') — the actual stats_psi_drift r7/r8 red. Kept for quick
window-subset strict scans.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from python_multiproc_bigdata_spark.registry import CHECKED_FIRST, REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def strict(v) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # ±0.0 NOT collapsed — the driver-strict view
    return str(v)


def main() -> int:
    names = sys.argv[1:] or list(CHECKED_FIRST)
    spark = get_spark(app_name="strict-zero-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    failures = []
    for name in names:
        spec = REGISTRY[name]
        try:
            oracle = spec.oracle() if callable(spec.oracle) else spec.oracle
            if oracle is None:
                print(f"- {name}: rows-only, skipped")
                continue
            sdf = spec.fn(spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(strict(r[c]) for c in cols) for r in sdf.collect()
            )
            orows = sorted(
                tuple(strict(v) for v in row)
                for row in con.execute(
                    f"SELECT {', '.join(cols)} FROM ({oracle}) q"
                ).fetchall()
            )
            if srows == orows:
                print(f"✓ {name}: strict-equal")
            else:
                failures.append(name)
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
                print(f"✗ {name}: STRICT DIFF {diffs}")
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"✗ {name}: ERR {str(ex).splitlines()[0][:100]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} strict-equal")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
