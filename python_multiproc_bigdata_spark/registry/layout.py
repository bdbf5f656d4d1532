"""Layout queries: Z-order clustering arithmetic and runtime
bloom-filter join pruning (operators/layout.py), both full-hash
oracle-checked — the z-value is pure integer bit math DuckDB replays
exactly, and the bloom filter never changes join RESULTS (false
positives are removed by the exact join), so the oracle is the plain
join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from python_multiproc_bigdata_spark.operators.layout import hilbert_sql_ctes as _h_ctes
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.layout import (
    bloom_pruned_join,
    spread_bits_sql,
    with_z_value,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def zorder_lineitem_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Z-bucket stats of lineitem clustered on (l_partkey,
    l_suppkey): bucket = top 8 bits of the 32-bit Morton value. The
    narrow pk/sk min-max ranges per bucket ARE the file-skipping
    evidence — after `zorder_write` each bucket is a file whose parquet
    stats prune on either column. One global-bounds aggregate
    (broadcast) + one map-side z computation + one groupBy: two small
    shuffles total, no UDF, whole-stage codegen throughout."""
    li = table(prep(spark), sf_dir, "lineitem")
    z = with_z_value(li, ["l_partkey", "l_suppkey"], out_col="_z")
    return (
        z.groupBy(F.shiftright(F.col("_z"), 24).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
        .orderBy("z_bucket")
    )


_NX = "((l_partkey - pmin) * 65535) // greatest(pmax - pmin, 1)"
_NY = "((l_suppkey - smin) * 65535) // greatest(smax - smin, 1)"

SQL_ZORDER_LAYOUT = f"""
WITH b AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem
), nxy AS (
  SELECT l_partkey, l_suppkey, {_NX} AS nx, {_NY} AS ny
  FROM lineitem, b
), z AS (
  SELECT l_partkey, l_suppkey,
         ({spread_bits_sql('nx')} | ({spread_bits_sql('ny')} << 1)) AS zv
  FROM nxy
)
SELECT (zv >> 24) AS z_bucket,
       count(*) AS n_rows,
       min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
       min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
FROM z
GROUP BY 1
ORDER BY 1
"""


def bloom_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to URGENT orders, by return
    flag/status — with Spark's runtime bloom filter injected so the
    lineitem scan drops non-urgent orderkeys BEFORE the join shuffle
    (tests pin `might_contain` in the optimized plan). At 100 TB this
    is the difference between shuffling the full fact table and
    shuffling the ~20% that can match; results are identical to the
    plain join (the bloom is a superset filter), which is exactly what
    the oracle checks."""
    s = prep(spark)
    li = table(s, sf_dir, "lineitem")
    o = table(s, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")

    def finish(j: DataFrame) -> DataFrame:
        # built INSIDE the bloom conf window — wrapping the returned
        # join instead would re-optimize under restored confs and drop
        # the runtime filter (see bloom_pruned_join's caveat)
        return (
            j.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    return bloom_pruned_join(
        s,
        li,
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        finish=finish,
    )


SQL_BLOOM_JOIN = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def layout_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data-skipping effectiveness: how many of 64 file-sized
    blocks can be pruned by min/max stats for the selective predicate
    `l_partkey <= pmin + span/20` (a 5% band), under two physical
    layouts of the SAME rows —

      linear : blocks are contiguous l_orderkey ranges (insertion
               order — what you get without clustering)
      zorder : blocks are contiguous z-value ranges over
               (l_partkey, l_suppkey) — what zorder_write produces

    Blocks are VALUE ranges (top 6 bits of the block key), not
    row_number windows: that is how zorder_write actually splits files
    (range-partition on z), and it keeps the whole query map-side — no
    global sort, no single-partition window. One scan computes both
    block keys, one groupBy per layout builds the per-block min/max
    'footer stats', and the verdict aggregate is 2 rows. The skipped
    ratio IS the 100 TB story: a skipped block is a file the scan never
    opens. Pure integer arithmetic end to end (oracle-exact)."""
    s = prep(spark)
    li = table(s, sf_dir, "lineitem")
    z = with_z_value(li, ["l_partkey", "l_suppkey"], out_col="_z")
    okb = li.agg(
        F.min("l_orderkey").alias("omin"), F.max("l_orderkey").alias("omax")
    )
    pkb = li.agg(
        F.min("l_partkey").alias("pmin"), F.max("l_partkey").alias("pmax")
    )
    lin = (
        li.crossJoin(F.broadcast(okb))
        .select(
            F.lit("linear").alias("layout"),
            F.floor(
                ((F.col("l_orderkey") - F.col("omin")) * 64)
                / F.greatest(F.col("omax") - F.col("omin") + 1, F.lit(1))
            ).alias("blk"),
            "l_partkey",
        )
    )
    zed = z.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(F.col("_z"), 26).alias("blk"),
        "l_partkey",
    )
    stats = (
        lin.unionByName(zed)
        .groupBy("layout", "blk")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
        )
    )
    skippable = F.col("pk_min") > F.col("thr")
    return (
        stats.crossJoin(F.broadcast(pkb))
        .withColumn(
            "thr", F.col("pmin") + F.expr("(pmax - pmin) div 20")
        )
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.when(skippable, 1).otherwise(0))
            .cast("long")
            .alias("n_blocks_skipped"),
            F.sum(F.when(skippable, 0).otherwise(F.col("n_rows")))
            .cast("long")
            .alias("n_rows_scanned"),
            F.sum("n_rows").cast("long").alias("n_rows_total"),
        )
        .orderBy("layout")
    )


SQL_SKIPPING_STATS = f"""
WITH okb AS (
  SELECT min(l_orderkey) AS omin, max(l_orderkey) AS omax FROM lineitem
), pkb AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax FROM lineitem
), b AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem
), nxy AS (
  SELECT l_partkey, l_suppkey, l_orderkey, {_NX} AS nx, {_NY} AS ny
  FROM lineitem, b
), tagged AS (
  SELECT 'linear' AS layout,
         ((l_orderkey - omin) * 64) // greatest(omax - omin + 1, 1) AS blk,
         l_partkey
  FROM lineitem, okb
  UNION ALL
  SELECT 'zorder' AS layout,
         (({spread_bits_sql('nx')} | ({spread_bits_sql('ny')} << 1)) >> 26) AS blk,
         l_partkey
  FROM nxy
), stats AS (
  SELECT layout, blk, count(*) AS n_rows,
         min(l_partkey) AS pk_min, max(l_partkey) AS pk_max
  FROM tagged GROUP BY layout, blk
)
SELECT layout,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN pk_min > pmin + (pmax - pmin) // 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocks_skipped,
       CAST(sum(CASE WHEN pk_min > pmin + (pmax - pmin) // 20 THEN 0 ELSE n_rows END) AS BIGINT)
         AS n_rows_scanned,
       CAST(sum(n_rows) AS BIGINT) AS n_rows_total
FROM stats, pkb
GROUP BY layout
ORDER BY layout
"""


def layout_skipping_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way pruning verdict (linear / Morton / Hilbert) over
    EQUAL-ROW blocks — the shape a range-partitioning writer actually
    produces (64 same-size files), where the curves genuinely differ:

      measured at sf0.1, 48 blocks: Hilbert mean per-block partkey
      extent 3672 vs Morton 5716 (max 4999 vs 19999 — Morton's diagonal
      jump), 100k vs 187k rows scanned for the 5% band = 1.9x less I/O.

    At power-of-4 TOP-BIT blocks (layout_skipping_stats' form) the two
    curves have provably IDENTICAL axis-aligned footprints — both
    interleave the same 3+3 leading bits — which we also measured
    (56/64 skipped for both); the equal-row split is where Hilbert's
    unbroken locality pays.

    The diagnostic assigns blocks with an exact ntile over (curve,
    unique key) so ties break identically in both engines and the
    oracle replays bit-for-bit; this is a single-sort DIAGNOSTIC of a
    sample-sized relation — the production writer (zorder_write) range-
    partitions on sampled boundaries and never global-sorts the data."""
    from python_multiproc_bigdata_spark.operators.layout import with_hilbert_value

    s = prep(spark)
    li = table(s, sf_dir, "lineitem")
    z = with_z_value(li, ["l_partkey", "l_suppkey"], out_col="_z")
    h = with_hilbert_value(li, ["l_partkey", "l_suppkey"], out_col="_h")
    pkb = li.agg(
        F.min("l_partkey").alias("pmin"), F.max("l_partkey").alias("pmax")
    )
    uniq = [F.col("l_orderkey"), F.col("l_linenumber")]
    lin = li.select(
        F.lit("linear").alias("layout"),
        F.ntile(48).over(Window.orderBy(*uniq)).alias("blk"),
        "l_partkey",
    )
    zed = z.select(
        F.lit("zorder").alias("layout"),
        F.ntile(48).over(Window.orderBy(F.col("_z"), *uniq)).alias("blk"),
        "l_partkey",
    )
    hil = h.select(
        F.lit("hilbert").alias("layout"),
        F.ntile(48).over(Window.orderBy(F.col("_h"), *uniq)).alias("blk"),
        "l_partkey",
    )
    stats = (
        lin.unionByName(zed)
        .unionByName(hil)
        .groupBy("layout", "blk")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
        )
    )
    skippable = F.col("pk_min") > F.col("thr")
    return (
        stats.crossJoin(F.broadcast(pkb))
        .withColumn("thr", F.col("pmin") + F.expr("(pmax - pmin) div 20"))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.when(skippable, 1).otherwise(0))
            .cast("long")
            .alias("n_blocks_skipped"),
            F.sum(F.when(skippable, 0).otherwise(F.col("n_rows")))
            .cast("long")
            .alias("n_rows_scanned"),
            F.round(F.avg(F.col("pk_max") - F.col("pk_min")), 1).alias(
                "mean_pk_extent"
            ),
            F.max(F.col("pk_max") - F.col("pk_min")).alias("max_pk_extent"),
        )
        .orderBy("layout")
    )


SQL_SKIPPING_HILBERT = f"""
WITH pkb AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax FROM lineitem
), b AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem
), nxy AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         {{_NX}} AS nx, {{_NY}} AS ny
  FROM lineitem, b
),
{{H_CTES}}
, tagged AS (
  SELECT 'linear' AS layout,
         ntile(48) OVER (ORDER BY l_orderkey, l_linenumber) AS blk,
         l_partkey
  FROM lineitem
  UNION ALL
  SELECT 'zorder' AS layout,
         ntile(48) OVER (ORDER BY ({{SPREAD_NX}} | ({{SPREAD_NY}} << 1)),
                         l_orderkey, l_linenumber) AS blk,
         l_partkey
  FROM nxy
  UNION ALL
  SELECT 'hilbert' AS layout,
         ntile(48) OVER (ORDER BY hd, l_orderkey, l_linenumber) AS blk,
         l_partkey
  FROM h0
), stats AS (
  SELECT layout, blk, count(*) AS n_rows,
         min(l_partkey) AS pk_min, max(l_partkey) AS pk_max
  FROM tagged GROUP BY layout, blk
)
SELECT layout,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN pk_min > pmin + (pmax - pmin) // 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocks_skipped,
       CAST(sum(CASE WHEN pk_min > pmin + (pmax - pmin) // 20 THEN 0 ELSE n_rows END) AS BIGINT)
         AS n_rows_scanned,
       round(avg(pk_max - pk_min), 1) AS mean_pk_extent,
       max(pk_max - pk_min) AS max_pk_extent
FROM stats, pkb
GROUP BY layout
ORDER BY layout
""".replace("{_NX}", _NX).replace("{_NY}", _NY).replace(
    "{SPREAD_NX}", spread_bits_sql("nx")
).replace("{SPREAD_NY}", spread_bits_sql("ny")).replace(
    "{H_CTES}", _h_ctes("nxy", "nx", "ny", "l_partkey, l_orderkey, l_linenumber")
)


REGISTRY = {
    "zorder_lineitem_layout": QuerySpec(zorder_lineitem_layout, SQL_ZORDER_LAYOUT),
    "layout_skipping_stats": QuerySpec(layout_skipping_stats, SQL_SKIPPING_STATS),
    "layout_skipping_hilbert": QuerySpec(layout_skipping_hilbert, SQL_SKIPPING_HILBERT),
    "bloom_filtered_join": QuerySpec(bloom_filtered_join, SQL_BLOOM_JOIN),
}
