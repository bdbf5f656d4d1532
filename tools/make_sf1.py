"""Synthesize an sf1-scale dataset (10x sf0.1) for the scaling sweep.

/root/testdata is driver-generated and read-only, and no generator ships
with it — so sf1 is built by REPLICATION with content perturbation, the
standard way to scale a benchmark corpus when the generator is absent:

- every table is unioned 10x with ALL entity keys shifted by
  replica * KEY_SHIFT (one shift for orderkey/custkey/partkey/suppkey/
  doc_id/vec_id/user_id/event_id alike, so referential integrity holds
  WITHIN each replica and replica 0 is the original data bit-for-bit —
  queries that bound their work by absolute ids, e.g. `vec_id <
  N_QUERIES` ANN query sets, keep the same query workload against a
  10x corpus, which is exactly the scaling question);
- document TEXT gets a per-replica lowercase-alphabet rotation
  (F.translate — whitespace/digits/punctuation untouched), so token
  lengths, word boundaries, and the zipf shape survive but shingles
  differ across replicas: dedup/similarity queries see 10x mostly-novel
  content instead of 10 exact copies (which would measure quadratic
  OUTPUT growth, not engine scaling);
- EMBEDDINGS get a per-replica cyclic dimension rotation —
  norm-preserving, so score distributions stay realistic while
  directions differ across replicas;
- dimension tables region/nation are copied once, unshifted (they are
  fixed-size in TPC-H at every sf; nationkey/regionkey references stay
  valid in all replicas).

Deterministic by construction (no RNG), ~6M lineitem rows. Output dir
defaults to /tmp/pmb_sf1 ($SPARK_GRAFT_SF1_DIR to override); the build
is skipped when a _SUCCESS marker table set already exists.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/pmb_sf1")
REPLICAS = 10
KEY_SHIFT = 100_000_000  # far above any key in sf0.1

ALPHA = "abcdefghijklmnopqrstuvwxyz"

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, name: str) -> DataFrame:
    parts = []
    for i in range(REPLICAS):
        r = df
        for k in KEY_COLS[name]:
            r = r.withColumn(k, (F.col(k) + F.lit(i * KEY_SHIFT)).cast("long"))
        if name == "documents" and i:
            rot = ALPHA[i:] + ALPHA[:i]
            r = r.withColumn("text", F.translate("text", ALPHA, rot))
        if name == "embeddings" and i:
            n = 64  # sf corpus dims; rotation is a no-op fallback otherwise
            r = r.withColumn(
                "embedding",
                F.when(
                    F.size("embedding") == n,
                    F.concat(
                        F.slice("embedding", i + 1, n - i),
                        F.slice("embedding", 1, i),
                    ),
                ).otherwise(F.col("embedding")),
            )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build(spark: SparkSession, dst: str = DST) -> str:
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")
    for name, _keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        _replicate(df, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    Path(marker).touch()
    return dst


if __name__ == "__main__":
    from python_multiproc_bigdata_spark.session import get_spark

    s = get_spark(app_name="make-sf1")
    s.sparkContext.setLogLevel("ERROR")
    print(build(s))
