"""Local mirror of the driver's correctness gate: run each registry query
on Spark and its oracle on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_parity.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 / 0.0; otherwise EXACT repr — the driver's value
        # hash may be bit-strict, so the local gate must be too
        if v == 0:
            return "0"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark(app_name="parity-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    full_run = not sys.argv[1:]
    record: dict[str, dict] = {}
    failures = []
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if spec.oracle is None:
                print(f"  {name}: rows-only ({len(srows)} rows) OK")
                record[name] = {"ok": True, "rows": len(srows), "mode": "rows_only"}
                continue
            res = con.execute(spec.resolve_oracle())
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"✗ {name}: ERROR {type(e).__name__}: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_vals = ns == nd
        record[name] = {"ok": ok_cols and ok_vals, "rows": len(srows), "mode": "oracle"}
        if ok_cols and ok_vals:
            print(f"✓ {name}: {len(srows)} rows match")
        else:
            failures.append(name)
            print(f"✗ {name}: cols spark={sorted(scols)} duck={sorted(dcols)} "
                  f"rows spark={len(srows)} duck={len(drows)}")
            if ok_cols:
                diff_s = [r for r in ns if r not in set(map(tuple, nd))][:3]
                diff_d = [r for r in nd if r not in set(map(tuple, ns))][:3]
                print(f"   spark-only: {diff_s}\n   duck-only:  {diff_d}")
    print(f"\n{len(names) - len(failures)}/{len(names)} match")
    # Persist results so the parity ledger (tools/parity_ledger.py) can
    # prove which queries have a local value-check on record, not just a
    # driver-round row. Subset runs MERGE into the existing artifact;
    # a full run rewrites it wholesale.
    out = Path(__file__).resolve().parent.parent / "PARITY_FULL.json"
    if not full_run and out.exists():
        merged = json.loads(out.read_text()).get("results", {})
        merged.update(record)
        record = merged
    out.write_text(json.dumps(
        {"generated_unix": int(time.time()), "sf_dir": SF_DIR,
         "results": record}, indent=1) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
