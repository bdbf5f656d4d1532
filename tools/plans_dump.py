"""Dump `explain("formatted")` for named queries to a directory — plan
evidence for the r12 optimization round (guide §7.2). Build-only: no
query execution beyond what registry build functions themselves run
(e.g. driver-side k-means training jobs).

Usage: python tools/plans_dump.py OUTDIR SUFFIX name [name...]
       python tools/plans_dump.py OUTDIR SUFFIX --module registry.similarity
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.registry import REGISTRY
from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    if names and names[0] == "--module":
        mod = names[1]
        names = [
            n for n, spec in REGISTRY.items() if spec.fn.__module__.endswith(mod)
        ]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="pmb-plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in names:
        try:
            df = REGISTRY[n].fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            txt = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{n}{suffix}.txt"), "w") as f:
            f.write(txt)
        print(n, "ok" if not txt.startswith("ERROR") else "ERROR", flush=True)


if __name__ == "__main__":
    main()
