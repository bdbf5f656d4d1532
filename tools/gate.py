"""One-command driver-strict correctness gate (VERDICT r8 ask #7).

Merges every divergence class that has ever produced (or could produce) a
driver hash-red that the older per-class tools missed:

  1. column-name parity        (check_parity class)
  2. row-count parity          (check_parity class)
  3. strict value parity, fetchall view — EXACT float repr, NO ±0.0
     collapse (check_strict_zero class; caught text_heaps_law's -0.0)
  4. strict value parity, PANDAS view — DuckDB results re-fetched via
     fetchdf(), so engine-side integer types that pandas coerces to
     float64 (HUGEINT from a bare sum(CASE...), DECIMAL literals) show
     up as '5.0' vs '5' exactly the way a pandas/arrow-hashing driver
     would see them. THIS is the class that kept stats_psi_drift red in
     r7+r8 while every fetchall-based local gate passed: fetchall gives
     Python int for HUGEINT, fetchdf gives float64.
  5. oracle output-dtype scan — DESCRIBE every oracle and flag any
     emitted column typed HUGEINT/UHUGEINT/DECIMAL/unsigned, i.e. types
     with no Spark twin that a pandas/arrow fetch canonicalizes lossily.
     Catches the class statically even for queries too slow to re-run.

Plan pins (no-Expand / no-cartesian / broadcast assertions) stay in
tests/test_scale_plans.py; pass --plans to run that suite as part of the
gate via pytest.

Usage:
  python tools/gate.py                  # dtype scan + strict parity, ALL queries
  python tools/gate.py q1 q2 ...        # subset
  python tools/gate.py --dtype-only     # fast static scan (no Spark)
  python tools/gate.py --plans          # also run the plan-pin pytest suite
  python tools/gate.py --dump NAME      # forensic: write both engines' exact
                                        # rows (all 3 views) to GATE_DUMP_NAME.txt

Artifact: GATE.json at the repo root (per-query verdict per class).
"""

from __future__ import annotations

import json
import math
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb

from python_multiproc_bigdata_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB output types with no faithful pandas/Spark twin: pandas fetchdf
# coerces HUGEINT->float64 and DECIMAL->float64/object; Spark has neither.
BAD_DUCK_TYPES = (
    "HUGEINT",
    "UHUGEINT",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "DECIMAL",
)
# Nested output types crash the driver's value canonicalizer (the r7
# func_array_library lesson: array<int> cells err the whole row hash).
# Scalar-render (array_join / to_json) before emitting instead.
NESTED_DUCK_MARKERS = ("[]", "STRUCT(", "MAP(")


def _connect() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def strict(v) -> str:
    """Driver-strict cell repr: exact float repr, ±0.0 NOT collapsed.

    Temporal values normalize to a canonical string with any midnight
    time component trimmed — DuckDB DATE fetches as pandas
    datetime64[ns] ('1995-01-01 00:00:00') while Spark gives
    datetime.date ('1995-01-01'); four date-emitting queries with
    driver-green history prove the driver canonicalizes this, so the
    gate must not flag it."""
    import datetime

    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    # numpy scalars out of fetchdf: unwrap so int64(5) prints like 5
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        return strict(v.item())
    if isinstance(v, datetime.datetime):  # includes pandas Timestamp
        s = v.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


DUCK_INT_TYPES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")


def strict_pd(v, duck_type: str) -> str:
    """Pandas-view cell repr with the two NULL-coercion classes that
    the driver provably tolerates normalized away (each has driver-green
    precedent — r8's streaming_click_view_left_join carries NULL ints):

    - a NULLABLE integer column fetches as float64; render NaN as None
      and integral floats as ints, so '657.0'/'nan' don't false-flag
      against Spark's '657'/'None'. Genuine value drift still flags:
      a WRONG integer is wrong in any dtype.
    - NaT (null timestamp) renders as None.

    HUGEINT/DECIMAL float64-coercion (the real psi-red class) is NOT
    masked by this: those are flagged statically by dtype_scan, and
    integer-typed columns here are keyed on the DuckDB DESCRIBE type,
    not the pandas dtype."""
    import pandas as pd

    try:
        if pd.isna(v):
            # NULL of any type fetches as NaN/NaT in pandas; render as
            # None to match fetchall/Spark NULLs. A genuine (non-NULL)
            # NaN double is indistinguishable here — the fetchall view
            # still covers that parity, and the caller maps the Spark
            # side's 'nan' to 'None' for THIS view only.
            return "None"
    except (TypeError, ValueError):
        pass
    if (
        isinstance(v, float)
        and any(t == duck_type.upper() for t in DUCK_INT_TYPES)
        and v.is_integer()
    ):
        return str(int(v))
    return strict(v)


def dtype_scan(con, names) -> dict[str, list]:
    """DESCRIBE every oracle; flag emitted HUGEINT/DECIMAL/unsigned cols."""
    hits: dict[str, list] = {}
    for name in names:
        spec = REGISTRY[name]
        try:
            oracle = spec.resolve_oracle()
        except Exception as ex:  # noqa: BLE001
            hits[name] = [("<resolve-error>", str(ex)[:120])]
            continue
        if oracle is None:
            continue
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle}) q").fetchall()
        except Exception as ex:  # noqa: BLE001
            hits[name] = [("<describe-error>", str(ex).splitlines()[0][:120])]
            continue
        bad = [
            (c, t)
            for c, t, *_ in desc
            if any(b in t.upper() for b in BAD_DUCK_TYPES)
            or any(m in t.upper() for m in NESTED_DUCK_MARKERS)
        ]
        if bad:
            hits[name] = bad
    return hits


def duck_views(con, oracle: str, cols: list[str]):
    """Return (fetchall-view rows, pandas-view rows) under strict repr.
    Column names are double-quoted — an oracle may legitimately emit a
    reserved word like `offset` (training_pack_chunks does)."""
    sel = ", ".join(f'"{c}"' for c in cols)
    q = f"SELECT {sel} FROM ({oracle}) q"
    fa = sorted(tuple(strict(v) for v in row) for row in con.execute(q).fetchall())
    dtypes = {
        d[0]: d[1] for d in con.execute(f"DESCRIBE {q}").fetchall()
    }
    pdf = con.execute(q).fetchdf()
    pd_rows = sorted(
        tuple(strict_pd(pdf[c].iloc[i], dtypes.get(c, "")) for c in cols)
        for i in range(len(pdf))
    )
    return fa, pd_rows


def spark_rows(spark, spec, cols):
    sdf = spec.fn(spark, SF_DIR)
    return sorted(tuple(strict(r[c]) for c in cols) for r in sdf.collect())


def run_gate(names, do_plans: bool, dtype_only: bool) -> int:
    con = _connect()
    print(f"== class 5: oracle output-dtype scan ({len(names)} queries) ==")
    dhits = dtype_scan(con, names)
    for n, bad in dhits.items():
        print(f"  ✗ {n}: {bad}")
    print(f"  {len(dhits)} dtype hits")

    record: dict[str, dict] = {n: {} for n in names}
    for n, bad in dhits.items():
        record[n]["dtype_hits"] = [list(b) for b in bad]

    failures = set(dhits)
    if not dtype_only:
        from python_multiproc_bigdata_spark.session import get_spark

        spark = get_spark(app_name="gate", shuffle_partitions=16)
        print(f"== classes 1-4: strict parity, fetchall + pandas views ==")
        for i, name in enumerate(names):
            spec = REGISTRY[name]
            rec = record[name]
            try:
                sdf = spec.fn(spark, SF_DIR)
                cols = sorted(sdf.columns)
                s = sorted(
                    tuple(strict(r[c]) for c in cols) for r in sdf.collect()
                )
                oracle = spec.resolve_oracle()
                if oracle is None:
                    rec.update(mode="rows_only", rows=len(s), ok=True)
                    print(f"  - {name}: rows-only ({len(s)} rows)")
                    continue
                ocols = [
                    d[0]
                    for d in con.execute(
                        f"DESCRIBE SELECT * FROM ({oracle}) q"
                    ).fetchall()
                ]
                if sorted(ocols) != cols:
                    rec.update(ok=False, cols_spark=cols, cols_oracle=sorted(ocols))
                    failures.add(name)
                    print(f"  ✗ {name}: COLUMN MISMATCH {cols} vs {sorted(ocols)}")
                    continue
                fa, pd_rows = duck_views(con, oracle, cols)
                # pandas view: NULLs of every type render 'None' (see
                # strict_pd); align the Spark side's NaN rendering for
                # this view only — fetchall keeps 'nan' vs 'None' strict
                s_pd = [
                    tuple("None" if c == "nan" else c for c in r) for r in s
                ]
                ok_fa, ok_pd = s == fa, s_pd == pd_rows
                rec.update(
                    mode="oracle",
                    rows=len(s),
                    strict_fetchall=ok_fa,
                    strict_pandas=ok_pd,
                    ok=ok_fa and ok_pd and len(s) == len(fa),
                )
                if rec["ok"]:
                    print(f"  ✓ {name}: strict-equal both views ({len(s)} rows)")
                else:
                    failures.add(name)
                    bad_view = fa if not ok_fa else pd_rows
                    base = s if not ok_fa else s_pd
                    diffs = [(a, b) for a, b in zip(base, bad_view) if a != b][:2]
                    print(
                        f"  ✗ {name}: fetchall={'OK' if ok_fa else 'DIFF'}"
                        f" pandas={'OK' if ok_pd else 'DIFF'} {diffs}"
                    )
            except Exception as ex:  # noqa: BLE001
                failures.add(name)
                rec.update(ok=False, error=str(ex).splitlines()[0][:200])
                print(f"  ✗ {name}: ERR {str(ex).splitlines()[0][:120]}")

    plans_rc = None
    if do_plans:
        print("== plan pins (tests/test_scale_plans.py) ==")
        plans_rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_scale_plans.py", "-q"],
            cwd=ROOT,
        )
        if plans_rc:
            failures.add("<plan-pins>")

    out = ROOT / "GATE.json"
    # subset runs merge into the standing artifact (full runs rewrite it),
    # mirroring check_parity.py's PARITY_FULL.json convention
    if len(names) < len(REGISTRY) and out.exists():
        prior = json.loads(out.read_text()).get("results", {})
        prior.update(record)
        record = prior
    out.write_text(
        json.dumps(
            {
                "generated_unix": int(time.time()),
                "sf_dir": SF_DIR,
                "n_queries": len(record),
                "n_failures": len(failures),
                "failures": sorted(failures),
                "plan_pins_rc": plans_rc,
                "results": record,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"\n{len(names) - len(failures & set(names))}/{len(names)} gate-clean"
          f" -> GATE.json")
    return 1 if failures else 0


def dump(name: str) -> int:
    """Forensic artifact: both engines' exact rows under all views."""
    con = _connect()
    from python_multiproc_bigdata_spark.session import get_spark

    spark = get_spark(app_name="gate-dump", shuffle_partitions=16)
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    s = spark_rows(spark, spec, cols)
    lines = [f"query: {name}", f"columns (sorted): {cols}", ""]
    lines += [f"spark[{i}]: {r}" for i, r in enumerate(s)]
    oracle = spec.resolve_oracle()
    if oracle is None:
        lines.append("oracle: None (rows-only)")
    else:
        fa, pd_rows = duck_views(con, oracle, cols)
        q = f"SELECT {', '.join(cols)} FROM ({oracle}) q"
        desc = con.execute(f"DESCRIBE {q}").fetchall()
        lines.append("")
        lines.append(f"duckdb types: {[(d[0], d[1]) for d in desc]}")
        pdf = con.execute(q).fetchdf()
        lines.append(f"pandas dtypes: {dict(pdf.dtypes.astype(str))}")
        lines += [f"duck.fetchall[{i}]: {r}" for i, r in enumerate(fa)]
        lines += [f"duck.pandas[{i}]:  {r}" for i, r in enumerate(pd_rows)]
        s_pd = [tuple("None" if c == "nan" else c for c in r) for r in s]
        lines.append("")
        lines.append(f"strict fetchall: {'EQUAL' if s == fa else 'DIFF'}")
        lines.append(f"strict pandas:   {'EQUAL' if s_pd == pd_rows else 'DIFF'}")
    out = ROOT / f"GATE_DUMP_{name}.txt"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv[:1] == ["--dump"]:
        return dump(argv[1])
    do_plans = "--plans" in argv
    dtype_only = "--dtype-only" in argv
    names = [a for a in argv if not a.startswith("--")] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    return run_gate(names, do_plans, dtype_only)


if __name__ == "__main__":
    raise SystemExit(main())
