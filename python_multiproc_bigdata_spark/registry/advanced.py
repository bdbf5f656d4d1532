"""Advanced relational surface: as-of join, bucketized range join, the
Pandas-UDAF general reducer, CUBE grouping sets, and approximate
aggregates (rows-only — approx algorithms differ per engine by design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.joins import asof_join, range_join_bucketed
from python_multiproc_bigdata_spark.operators.transforms import fan_out_scan
from python_multiproc_bigdata_spark.operators.runtime_filter import bloom_semi_filter
from python_multiproc_bigdata_spark.operators.skew import salted_count_per_key
from python_multiproc_bigdata_spark.operators.quality import expectations_report
from python_multiproc_bigdata_spark.operators.udfs import median_by_group
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click event, the most recent prior-or-same view by the
    same user (classic attribution as-of join). Right side pre-aggregated
    to unique (user, ts) so tied timestamps are deterministic."""
    e = table(prep(spark), sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(clicks, views, on="ts", by="user_id", right_payload=["view_event_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("asof.view_event_id").alias("view_event_id"),  # null if no prior view
    )


SQL_ASOF = """
SELECT c.event_id, c.user_id, v.view_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
    SELECT user_id, ts, max(event_id) AS view_event_id
    FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def asof_click_to_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each click, the EARLIEST same-or-later view
    by the same user (time-to-conversion attribution — the mirror of
    asof_click_to_view). Same one-shuffle union+window plan, scanned
    descending."""
    e = table(prep(spark), sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        clicks, views, on="ts", by="user_id",
        right_payload=["view_event_id"], direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof.view_event_id").alias("next_view_event_id"),
    )


SQL_ASOF_FWD = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     v AS (SELECT user_id, ts, max(event_id) AS view_event_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
       (SELECT v.view_event_id FROM v
         WHERE v.user_id = c.user_id AND v.ts >= c.ts
         ORDER BY v.ts ASC LIMIT 1) AS next_view_event_id
FROM c
"""


def asof_click_to_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: for each click, the view by the same user
    closest in time in EITHER direction (ties → the earlier view, pandas'
    merge_asof tie rule). Distances are compared in exact integer
    microseconds (unix_micros) — doubles near epoch magnitude can't
    resolve 1 µs, so a double-based distance would flake the tie-break."""
    e = table(prep(spark), sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.unix_micros("ts").alias("ts_us"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        clicks, views, on="ts_us", by="user_id",
        right_payload=["view_event_id"], direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof.view_event_id").alias("nearest_view_event_id"),
    )


SQL_ASOF_NEAREST = """
WITH c AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events WHERE event_type = 'click'),
     v AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                  max(event_id) AS view_event_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
       (SELECT v.view_event_id FROM v
         WHERE v.user_id = c.user_id
         ORDER BY abs(v.ts_us - c.ts_us) ASC, (v.ts_us > c.ts_us) ASC
         LIMIT 1) AS nearest_view_event_id
FROM c
"""


def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of events by the same user within 120 s of each other
    (0 < later − earlier ≤ 120). Bucketized equi-join, exact filter."""
    e = table(prep(spark), sf_dir, "events")
    base = e.select("event_id", "user_id", F.col("ts").cast("double").alias("tsec"))
    l = base.select(F.col("event_id").alias("id_a"), "user_id", "tsec")
    r = base.select(F.col("event_id").alias("id_b"), "user_id", "tsec")
    out = range_join_bucketed(l, r, on="tsec", by="user_id", max_gap=120.0)
    return out.filter(F.col("id_a") != F.col("id_b")).select(
        "id_a", "id_b", F.round(F.col("_ron") - F.col("_lon"), 6).alias("gap_sec")
    )


SQL_RANGE = """
SELECT a.event_id AS id_a, b.event_id AS id_b,
       round(epoch(b.ts) - epoch(a.ts), 6) AS gap_sec
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch(b.ts) - epoch(a.ts) > 0
 AND epoch(b.ts) - epoch(a.ts) <= 120
 AND a.event_id != b.event_id
"""


def bloom_pruned_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of 1-URGENT orders, with lineitem pruned MAP-SIDE
    by a broadcast bitmap semi-filter over the selected order keys before
    the exact join (operators/runtime_filter.py). The bloom prune changes
    the plan (fact rows die before the join exchange), never the result —
    false positives are removed by the exact join, so the oracle is the
    plain join SQL. At sf0.01 the prune passes ~20% of lineitem; at
    100 TB this pre-exchange kill is the difference between shuffling
    600 GB and shuffling 120 GB.

    Deliberate sibling of bloom_filtered_join (registry/layout.py:72),
    which gets the same prune from Spark's own InjectRuntimeFilter rule:
    that form depends on optimizer confs and its cost model firing (and
    silently vanishes if a later transformation re-optimizes — see
    bloom_pruned_join's caveat); this one is a plain composable operator
    with the filter guaranteed in the plan wherever it's placed."""
    o = table(prep(spark), sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf_dir, "lineitem")
    pruned = bloom_semi_filter(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey",
        o.select("o_orderkey"),
        "o_orderkey",
    )
    return (
        pruned.join(o, pruned.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("month")
    )


SQL_BLOOM_PRUNED = """
SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
ORDER BY 1
"""


def udaf_median_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general-reducer (A1) surface as a Pandas UDAF: exact per-segment
    median of customer balances."""
    c = table(prep(spark), sf_dir, "customer")
    return median_by_group(
        c.select("c_mktsegment", "c_acctbal"), ["c_mktsegment"], "c_acctbal"
    )


SQL_UDAF_MEDIAN = """
SELECT c_mktsegment, round(median(c_acctbal), 4) AS median, count(*) AS n
FROM customer GROUP BY c_mktsegment
"""


def udaf_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE pandas GROUPED_AGG UDAF surface (Series -> scalar,
    registrable in SQL and usable over windows) — distinct from the
    applyInPandas general reducer above: per-priority 10%-trimmed mean
    of order totals, an aggregate with no built-in. The fold is exact
    (math.fsum) so the oracle's position-trimmed AVG replays it to
    within the rounding guard."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _trimmed_mean(v):
        s = v.sort_values().to_numpy()
        k = len(s) // 10
        kept = s[k : len(s) - k] if len(s) > 2 * k else s
        return float(math.fsum(kept) / len(kept))

    # this module uses `from __future__ import annotations`, which turns
    # hints into strings the UDAF type-inferencer can't resolve — attach
    # REAL type objects so pandas_udf infers GROUPED_AGG (Series→scalar)
    _trimmed_mean.__annotations__ = {"v": pd.Series, "return": float}
    trimmed_mean = pandas_udf(_trimmed_mean, "double")

    o = table(prep(spark), sf_dir, "orders")
    # grouped-agg pandas UDFs can't share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides a separate
    # aggregation joined back on the tiny group key
    tm = o.groupBy("o_orderpriority").agg(
        F.round(trimmed_mean("o_totalprice"), 4).alias("trimmed_mean")
    )
    cn = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return tm.join(cn, "o_orderpriority").orderBy("o_orderpriority")


SQL_UDAF_TRIMMED = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rk,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       round(avg(o_totalprice), 4) AS trimmed_mean,
       max(n) AS n_orders
FROM r
WHERE rk > n // 10 AND rk <= n - n // 10
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status) — all 4 grouping sets."""
    o = table(prep(spark), sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


SQL_CUBE = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for the 100 TB path, per event type:
    distinct users via the PORTABLE p=8 md5-HLL (operators/sketches.py)
    and p50/p95/p99 value quantiles via the mergeable fixed-grid
    histogram sketch (the stats_quantile_sketch arithmetic, partitioned
    by type) — promoted r9 from rows-only to a FULL value check: both
    sketches are engine-portable column math, so the DuckDB oracle
    replays them bit-for-bit. The native-sketch twin
    (approx_count_distinct + percentile_approx, JVM-internal hash and
    t-digest that no oracle can replay) is kept unregistered below.
    Scale shape: HLL registers partial-aggregate map-side to
    ≤256·|types| rows; the histogram to ≤256·|types| cells; the
    readback is |types|×3 rows — nothing downstream of the two
    map-side-combining groupBys depends on input size."""
    from python_multiproc_bigdata_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    e = table(prep(spark), sf_dir, "events")
    base = e.select("event_type", F.col("user_id").cast("string").alias("uid"))
    regs = hll_registers(base, ["event_type"], "uid")
    users = hll_estimate_from_registers(regs, ["event_type"]).select(
        "event_type", F.round("hll_est", 1).alias("approx_users")
    )
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    mm = c.groupBy("event_type").agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.count(F.lit(1)).alias("n_total"),
    )
    hist = (
        c.join(F.broadcast(mm), "event_type")
        .select(
            "event_type",
            F.expr("CAST((cents - minc) * 256 DIV (maxc - minc + 1) AS INT)").alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    probes = spark.createDataFrame([(0.5,), (0.95,), (0.99,)], "p double")
    ranks = mm.crossJoin(F.broadcast(probes)).withColumn(
        "r", F.col("p") * (F.col("n_total") - 1)
    )
    pick = ranks.join(cum, "event_type").filter(
        (F.col("cum_before") <= F.col("r"))
        & (F.col("r") < F.col("cum_before") + F.col("n"))
    )
    frac = (F.col("r") - F.col("cum_before")) / F.col("n")
    span = F.col("maxc") - F.col("minc") + 1
    est_usd = F.round(
        (F.col("minc") + (F.col("bucket") + frac) * span / 256.0) / 100.0, 4
    )
    quant = (
        pick.select("event_type", "p", est_usd.alias("q"))
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("p") == 0.5, F.col("q"))).alias("q50_usd"),
            F.max(F.when(F.col("p") == 0.95, F.col("q"))).alias("q95_usd"),
            F.max(F.when(F.col("p") == 0.99, F.col("q"))).alias("q99_usd"),
        )
    )
    return users.join(quant, "event_type").orderBy("event_type")


def approx_distinct_stats_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNREGISTERED native-sketch twin: approx_count_distinct (HLL++,
    JVM xxhash) + percentile_approx (t-digest) — the production choice
    when no cross-engine replay is needed. Quantiles ship as a joined
    string, not array<double>: the harness canonicalizer cannot hash
    list cells (the r7 func_array_library lesson)."""
    e = table(prep(spark), sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.array_join(
            F.transform(
                F.percentile_approx("value", [0.5, 0.95, 0.99], 10000),
                lambda v: F.round(v, 4).cast("string"),
            ),
            ",",
        ).alias("value_quantiles"),
    )


SQL_APPROX_DISTINCT_STATS = rf"""
WITH base AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS uid FROM events
), hashed AS (
  SELECT event_type,
         ('0x' || substr(md5(uid), 1, 2))::INTEGER AS bucket,
         ('0x' || substr(md5(uid), 3, 12))::BIGINT AS v
  FROM base
), regs AS (
  SELECT event_type, bucket,
         max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS m
  FROM hashed GROUP BY 1, 2
), agg AS (
  SELECT event_type, sum(power(2.0, -m)) AS s, count(*) AS nb
  FROM regs GROUP BY 1
), users AS (
  SELECT event_type,
         round(CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
                    THEN 256.0 * ln(256.0 / (256 - nb))
                    ELSE raw END, 1) AS approx_users
  FROM (
    SELECT event_type,
           CAST({0.7213 / (1.0 + 1.079 / 256)!r} AS DOUBLE) * 65536
             / (s + (256 - nb) * 1.0) AS raw,
           nb
    FROM agg)
), c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), mm AS (
  SELECT event_type, min(cents) AS minc, max(cents) AS maxc,
         CAST(count(*) AS BIGINT) AS n_total
  FROM c GROUP BY 1
), hist AS (
  SELECT c.event_type,
         CAST((cents - minc) * 256 // (maxc - minc + 1) AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM c JOIN mm USING (event_type) GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket, n,
         CAST(COALESCE(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM hist
), probes(p) AS (
  VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE)), (CAST(0.99 AS DOUBLE))
), ranks AS (
  SELECT event_type, p, p * (n_total - 1) AS r, minc, maxc
  FROM mm CROSS JOIN probes
), pick AS (
  SELECT rk.event_type, rk.p,
         round((rk.minc + (cm.bucket + (rk.r - cm.cum_before) / cm.n)
                * (rk.maxc - rk.minc + 1) / 256.0) / 100.0, 4) AS q
  FROM ranks rk JOIN cum cm
    ON cm.event_type = rk.event_type
   AND cm.cum_before <= rk.r AND rk.r < cm.cum_before + cm.n
), quant AS (
  SELECT event_type,
         max(CASE WHEN p = 0.5 THEN q END) AS q50_usd,
         max(CASE WHEN p = 0.95 THEN q END) AS q95_usd,
         max(CASE WHEN p = 0.99 THEN q END) AS q99_usd
  FROM pick GROUP BY 1
)
SELECT u.event_type, u.approx_users, q.q50_usd, q.q95_usd, q.q99_usd
FROM users u JOIN quant q USING (event_type)
ORDER BY event_type
"""


def cdc_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: apply a derived change set (every customer
    with acctbal < 0 moves to segment 'COLLECTIONS') onto the customer
    table; count the result by segment to keep the output compact."""
    from python_multiproc_bigdata_spark.operators.cdc import upsert

    c = table(prep(spark), sf_dir, "customer")
    updates = c.filter(F.col("c_acctbal") < 0).withColumn(
        "c_mktsegment", F.lit("COLLECTIONS")
    )
    merged = upsert(c, updates, ["c_custkey"])
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


SQL_CDC_UPSERT = """
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         'COLLECTIONS' AS c_mktsegment
  FROM customer WHERE c_acctbal < 0
), merged AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
  UNION ALL
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM updates
)
SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM merged GROUP BY c_mktsegment
"""


def cdc_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change feed: each user's
    event stream becomes versioned state rows with half-open validity
    intervals [valid_from, valid_to) — valid_to = next version's start,
    NULL on the current row. This is the dimension-table shape a
    warehouse keeps so point-in-time joins (fact.ts inside the
    interval) reproduce history exactly; the interval build is one
    lead() window per user, the same bounded per-key partitioning every
    events query here shuffles on."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("vf", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.col("ts").cast("double").alias("vf"),
            "value",
        )
        .withColumn("version", F.row_number().over(w))
        .withColumn("vt", F.lead("vf").over(w))
        .select(
            "user_id",
            "version",
            "event_id",
            F.round("value", 4).alias("value"),
            F.col("vf").alias("valid_from"),
            F.col("vt").alias("valid_to"),
            F.col("vt").isNull().alias("is_current"),
        )
    )


SQL_SCD2 = """
SELECT user_id, version, event_id, round(value, 4) AS value,
       vf AS valid_from, vt AS valid_to, vt IS NULL AS is_current
FROM (
  SELECT user_id, event_id, epoch(ts) AS vf, value,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch(ts), event_id) AS version,
         lead(epoch(ts)) OVER (PARTITION BY user_id ORDER BY epoch(ts), event_id) AS vt
  FROM events)
"""


def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log compaction: treating events as a change feed keyed by
    (user_id, event_type) with event_id as the version, keep each key's
    latest row."""
    from python_multiproc_bigdata_spark.operators.cdc import latest_per_key

    e = table(prep(spark), sf_dir, "events")
    latest = latest_per_key(
        e.select("user_id", "event_type", "event_id", "value"),
        ["user_id", "event_type"],
        "event_id",
    )
    return latest.select(
        "user_id", "event_type", "event_id", F.round("value", 4).alias("value")
    )


SQL_CDC_LATEST = """
SELECT user_id, event_type, event_id, round(value, 4) AS value
FROM (SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) snapshot reconstruction from a change
    log: per-user state as of 2024-03-01, treating events as an
    upsert/delete feed — 'error' is a tombstone (user absent from the
    snapshot unless a later in-range change resurrects them), anything
    else upserts the user's state. The missing third of the CDC surface:
    upsert (cdc_upsert_customers), compaction (cdc_latest_per_key), and
    now AS OF T reconstruction — what Delta/Iceberg time travel computes,
    expressed on a raw log without a table format.

    Plan: pushed-down ts<=T filter → one per-key window (latest change
    wins) → tombstone filter. At 100 TB, partition the log by day so the
    as-of filter prunes partitions, and compact periodically so the
    window reads checkpoints + a tail, not all history."""
    e = table(prep(spark), sf_dir, "events")
    t0 = F.lit("2024-03-01 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.filter(F.col("ts") <= t0)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            "event_id",
            F.round("value", 4).alias("value"),
        )
    )


SQL_CDC_SNAPSHOT = """
SELECT user_id, event_type AS last_event_type, event_id, round(value, 4) AS value
FROM (SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-03-01 00:00:00')
WHERE rn = 1 AND event_type != 'error'
"""


def skew_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted GROUP BY count per event_type
    (operators/skew.py:salted_count_per_key, salt_buckets=16) — the
    mitigation for a single hot key melting one reducer at 100 TB.
    Results are salt-invariant (counts are algebraic), so the plain
    GROUP BY oracle checks the rewrite is lossless while the plan
    carries the two-stage shuffle."""
    e = table(prep(spark), sf_dir, "events")
    return salted_count_per_key(
        e, ["event_type"], out_col="n_events", salt_buckets=16
    )


SQL_SKEW_SALTED = """
SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type
"""


def dq_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders
    (operators/quality.py:expectations_report): positive price, status
    domain, non-null date, unique orderkey — one scan, one row per
    check. The oracle recomputes each counter as a conditional
    aggregate."""
    o = table(prep(spark), sf_dir, "orders")
    return expectations_report(
        o,
        violated_when={
            "positive_totalprice": ~(F.col("o_totalprice") > 0),
            "status_in_domain": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "orderdate_not_null": F.col("o_orderdate").isNull(),
        },
        unique_keys={"unique_orderkey": ["o_orderkey"]},
    )


SQL_DQ_ORDERS = """
SELECT check_name, n_violations, n_rows, n_violations = 0 AS passed FROM (
  SELECT 'positive_totalprice' AS check_name,
         CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         count(*) AS n_rows
  FROM orders
  UNION ALL
  SELECT 'status_in_domain',
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT),
         count(*)
  FROM orders
  UNION ALL
  SELECT 'orderdate_not_null',
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(*)
  FROM orders
  UNION ALL
  SELECT 'unique_orderkey',
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
         count(*)
  FROM orders)
"""


def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML connector proof, end-to-end: write the documents profile
    through the XML sink (Spark 4's built-in `xml` format, one file per
    partition so the read side stays parallel — XML is not splittable
    within a file), read it back with an explicit schema (inference
    would re-scan the corpus), and aggregate. The oracle computes the
    SAME aggregate straight from parquet, so the driver check is the
    materialization-changes-the-plan-never-the-answer proof (the
    dedup_minhash_lsh_materialized pattern) applied to a source format.
    Text stays out of the hop: XML escaping is the format's own concern;
    the connector claim is schema+values fidelity for scalar columns.

    The staging dir is a stable per-sf_dir path (overwritten by the
    sink, not mkdtemp'd fresh): bench runs this query 3-5x per round
    and a fresh dir per call would accumulate XML copies of the corpus
    in /tmp."""
    import hashlib
    import tempfile

    from python_multiproc_bigdata_spark.sinks import xml_sink
    from python_multiproc_bigdata_spark.sources.files import read_xml

    s = prep(spark)
    d = table(s, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/pmb_xml_{tag}/docs"
    xml_sink(path)(d)
    back = read_xml(
        s,
        path,
        schema="doc_id bigint, lang string, source string, n_chars bigint",
    )
    return (
        back.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("doc_id").cast("long").alias("n_unique"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


SQL_XML_ROUNDTRIP = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_unique,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def source_zip_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-shard ingest round trip (r9): pack the documents corpus
    into ZIP shards (one bounded applyInPandas group per 16 docs, both
    STORE and raw-DEFLATE members in every shard), then WALK the
    archives per the public APPNOTE spec — EOCD backward scan through a
    nonempty comment, central-directory iteration, local-header offset
    follow, inflate, CRC-32 + size verification — and emit per-member
    integrity rows (operators/archives.py; stdlib struct + zlib, the
    zipfile module deliberately unused so the walk is evidence the
    format is actually parsed). The oracle recomputes each member's
    md5 straight from the parquet text, so the packed→inflated content
    is value-checked byte-for-byte: one flipped bit in the DEFLATE
    stream, a wrong directory offset, or a skipped CRC check and the
    hashes move. At 100 TB both stages are embarrassingly parallel —
    shards are bounded groups, the walk is 1-blob-in → n-rows-out,
    nothing touches the driver."""
    from python_multiproc_bigdata_spark.operators.archives import (
        pack_zip_shards,
        walk_zip_shards,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    return walk_zip_shards(pack_zip_shards(d))


# Replays the shard/member layout from the parquet: shard = doc_id//16,
# method alternates DEFLATE(8)/STORE(0) on parity, n_bytes = utf-8
# octet length, content md5 recomputed on the raw text (DuckDB's md5
# hashes the VARCHAR's utf-8 bytes, same as hashlib on text.encode()).
SQL_ZIP_SHARDS = """
SELECT doc_id // 16 AS shard_id,
       doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 0 END AS BIGINT) AS method,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       TRUE AS crc_ok,
       md5(text) AS content_md5
FROM documents
"""


def source_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSIX-ustar sibling of source_zip_shards (r9): same bounded
    pack/walk shape, different framing family — 512-byte headers with
    octal size fields, the header CHECKSUM verified per spec (summed
    with the chksum field read as spaces), block padding, and the
    two-zero-block terminator (operators/archives.py:pack_tar /
    tar_members; the tarfile module deliberately unused). The oracle
    recomputes member md5s from parquet, value-checking content
    byte-for-byte through the framing."""
    from python_multiproc_bigdata_spark.operators.archives import (
        pack_tar_shards,
        walk_tar_shards,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    return walk_tar_shards(pack_tar_shards(d))


# Same layout replay as SQL_ZIP_SHARDS, method = -1 (tar has none).
SQL_TAR_SHARDS = """
SELECT doc_id // 16 AS shard_id,
       doc_id,
       CAST(-1 AS BIGINT) AS method,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       TRUE AS crc_ok,
       md5(text) AS content_md5
FROM documents
"""


def source_targz_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tar.gz shard round trip (r9) — the archive format training
    corpora most commonly ship as, composing BOTH from-spec layers:
    RFC 1952 gzip framing (FNAME/FCOMMENT optional-field skipping on
    every shard, raw-DEFLATE body, CRC-32 + ISIZE trailer VERIFIED)
    around the checksum-verified ustar walk
    (operators/archives.py:gzip_wrap / gzip_unwrap / tar_members; the
    gzip and tarfile modules deliberately unused in product code). Same
    bounded two-stage shape and md5 value check as the zip/tar
    siblings; one flipped bit in either layer moves the hashes."""
    from python_multiproc_bigdata_spark.operators.archives import (
        pack_targz_shards,
        walk_targz_shards,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    return walk_targz_shards(pack_targz_shards(d))


# Same layout replay; method = 8 (the gzip DEFLATE layer).
SQL_TARGZ_SHARDS = """
SELECT doc_id // 16 AS shard_id,
       doc_id,
       CAST(8 AS BIGINT) AS method,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       TRUE AS crc_ok,
       md5(text) AS content_md5
FROM documents
"""


def source_warc_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive ingest + HTML text extraction round trip
    (r11) — the web-crawl front door (operators/warc.py): the corpus
    is packed into ISO 28500 WARC shards (warcinfo + request records
    lead each shard so the non-response SKIP path is always checked,
    then one response record per doc whose payload is a deterministic
    HTML page full of extractor traps — raw-text script/style bodies
    with fake tags, a quoted attribute value containing '>', comments
    with '--' runs, named + decimal + hex character references), then
    WALKED: version line, header fields, Content-Length framing, the
    record terminator — and each response payload runs through the
    from-spec strict HTML→text extractor (WET convention: tags
    stripped, raw-text elements dropped, entities decoded, whitespace
    collapsed). The oracle rebuilds BOTH the exact page bytes and the
    closed-form expected extraction in SQL, so one wrong byte in the
    framing OR one mis-parsed entity moves a hash. Two bounded stages:
    applyInPandas pack per 16 docs, mapInPandas walk — embarrassingly
    parallel, nothing on the driver."""
    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warc_shards,
        walk_warc_shards,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    return walk_warc_shards(pack_warc_shards(d))


# Rebuilds synth_html's exact bytes (dollar-quoted literal segments +
# doc_id + text) and expected_extraction's closed form, then hashes
# both — operators/warc.py cites these as the replayed arithmetic.
SQL_WARC_SHARDS = """
WITH page AS (
  SELECT doc_id,
    concat(
      $s$<!DOCTYPE html>
<html><head><title>Doc $s$, CAST(doc_id AS VARCHAR), $s$ &amp; friends</title>
<style>body { color: #fff; } /* a > b < c */</style>
<script>if (a < b && c > d) { s = "<p>not text</p>"; }</script>
</head><body>
<nav><a href="/h?a=1&amp;b=2" data-x='q>u'>Home &gt; Index</a></nav>
<!-- hidden <em>markup</em> -- $s$, CAST(doc_id AS VARCHAR), $s$ -->
<h1 id="t$s$, CAST(doc_id AS VARCHAR), $s$">Doc &#72;eading &#x21;</h1>
<p>$s$, text, $s$</p>
<footer>&quot;fin&quot; &lt;eof&gt;</footer>
</body></html>
$s$) AS payload,
    trim(regexp_replace(
      concat('Doc ', CAST(doc_id AS VARCHAR), ' & friends Home > Index Doc Heading ! ',
             text, ' "fin" <eof>'),
      '[ \t\n\r]+', ' ', 'g')) AS extracted
  FROM documents
)
SELECT doc_id // 16 AS shard_id,
       doc_id,
       CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
       md5(payload) AS content_md5,
       md5(extracted) AS text_md5,
       CAST(length(extracted) AS BIGINT) AS n_chars
FROM page
"""


def crawl_wet_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl→WET→curation composition (r11) — the whole
    front half of a training-data pipeline as ONE lazy DataFrame: pack
    the corpus into WARC shards, walk the records, run the strict HTML
    extraction (operators/warc.py:warc_texts — the WET stage handing
    TEXT downstream, not just integrity hashes), token-count the
    extracted text JVM-side, apply a length-window quality gate (the
    Gopher-style bounds discipline on the post-extraction token count),
    and roll up per source: docs seen / kept, kept tokens, kept chars.
    Every stage is a bounded group or map-only; the one shuffle pair is
    the pack's groupBy(shard) and the final per-source rollup. The
    oracle composes the closed-form extraction (SQL_WARC_SHARDS' page
    replay) with the same token arithmetic — so a mis-parsed entity or
    a dropped record moves the per-source sums."""
    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warc_shards,
        warc_texts,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text", "source")
    texts = warc_texts(pack_warc_shards(d.select("doc_id", "text")))
    toks = texts.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    gated = toks.withColumn(
        "kept", F.col("n_tokens").between(40, 90)
    ).join(d.select("doc_id", "source"), "doc_id")
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(F.lit(0))).alias(
            "kept_tokens"
        ),
        F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(F.lit(0))).alias(
            "kept_chars"
        ),
    )


# Composes the closed-form extraction with the same token arithmetic:
# the extracted text is 'Doc {id} & friends Home > Index Doc Heading !
# {collapsed doc text} "fin" <eof>' — 12 template tokens around the
# doc's own whitespace tokens.
SQL_CRAWL_WET = r"""
WITH ex AS (
  SELECT doc_id, source,
    trim(regexp_replace(
      concat('Doc ', CAST(doc_id AS VARCHAR), ' & friends Home > Index Doc Heading ! ',
             text, ' "fin" <eof>'),
      '[ 	
]+', ' ', 'g')) AS extracted
  FROM documents
), toks AS (
  SELECT doc_id, source,
    len(list_filter(string_split(extracted, ' '), x -> length(x) > 0)) AS n_tokens,
    length(extracted) AS n_chars
  FROM ex
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN n_tokens BETWEEN 40 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN n_tokens BETWEEN 40 AND 90 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
  CAST(sum(CASE WHEN n_tokens BETWEEN 40 AND 90 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM toks GROUP BY source
"""


def crawl_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl link-graph extraction (r12) — the edge-list stage between
    WET extraction and the PageRank/robots curation family: pack the
    corpus into WARC shards whose pages carry a deterministic outbound
    link block (operators/warc.py:synth_html_links — mixed-case
    schemes/hosts, default + non-default ports, dot segments, an
    entity-coded unsorted query, fragments, plus two page-RELATIVE
    hrefs), walk every <a href> with the strict from-spec attribute
    parser (quoted '>' honored, entities decoded with the loud
    unknown-entity gate), normalize absolute links with the RFC 3986
    JVM normalizer (relative hrefs group under '(relative)' — counted,
    never silently dropped), and roll up per target host: in-degree,
    distinct normalized pages, distinct linking docs, top-12 by
    in-degree via orderBy().limit() (TakeOrderedAndProject — the host
    relation is web-scale at 100 TB, so no unpartitioned window may
    rank it; rk re-derived post-limit). The oracle replays the closed
    normalized form per residue class — shared logic: none."""
    from python_multiproc_bigdata_spark.operators.curation import normalize_url
    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warc_shards,
        synth_html_links,
        warc_links,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    links = warc_links(pack_warc_shards(d, page_fn=synth_html_links))
    is_abs = F.col("href").rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    norm = normalize_url(F.col("href"))
    rows = links.select(
        "doc_id",
        F.when(is_abs, norm["host"]).otherwise(F.lit("(relative)")).alias("host"),
        F.when(is_abs, norm["norm_url"]).otherwise(F.col("href")).alias(
            "norm_url"
        ),
    )
    w = Window.orderBy(F.desc("n_edges"), F.asc("host"))
    return (
        rows.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("norm_url").alias("n_pages"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_edges"), F.asc("host"))
        .limit(12)
        .withColumn("rk", F.row_number().over(w))
    )


# CASE-replays synth_html_links' closed normalized form: per doc,
# 2 + doc_id%3 absolute links to host t{(doc_id·7+k·13)%10}.example.org
# (scheme by (doc_id+k)%2, ':8080' kept only when (doc_id+k)%3=1 —
# default :80/:443 drop, path /l{k}/d{doc_id%5}/p after dot-segment
# removal, sorted query on even k, fragment dropped) plus two relative
# hrefs per page under '(relative)'.
SQL_CRAWL_LINK_GRAPH = """
WITH ks AS (
  SELECT doc_id, unnest(range(2 + doc_id % 3)) AS k FROM documents
), abs_links AS (
  SELECT doc_id,
    't' || CAST((doc_id*7 + k*13) % 10 AS VARCHAR) || '.example.org' AS host,
    concat(
      CASE WHEN (doc_id + k) % 2 = 0 THEN 'http' ELSE 'https' END,
      '://t', CAST((doc_id*7 + k*13) % 10 AS VARCHAR), '.example.org',
      CASE WHEN (doc_id + k) % 3 = 1 THEN ':8080' ELSE '' END,
      '/l', CAST(k AS VARCHAR), '/d', CAST(doc_id % 5 AS VARCHAR), '/p',
      CASE WHEN k % 2 = 0 THEN '?a=1&b=2' ELSE '' END
    ) AS norm_url
  FROM ks
), rel_links AS (
  SELECT doc_id, '(relative)' AS host, href AS norm_url
  FROM documents, (VALUES ('/h?a=1&b=2'), ('/local')) AS r(href)
), al AS (
  SELECT * FROM abs_links UNION ALL SELECT * FROM rel_links
), per_host AS (
  SELECT host, count(*) AS n_edges, count(DISTINCT norm_url) AS n_pages,
         count(DISTINCT doc_id) AS n_docs
  FROM al GROUP BY host
)
SELECT host, CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_pages AS BIGINT) AS n_pages,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(row_number() OVER (ORDER BY n_edges DESC, host ASC) AS INT) AS rk
FROM per_host
ORDER BY rk LIMIT 12
"""


def source_warcgz_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """warc.gz round trip (r11) — the format Common Crawl actually
    ships: ONE gzip member per WARC record (RFC 1952 multi-member
    concatenation, seekable by construction), composed entirely from
    this repo's from-spec layers — gzip_wrap framing with CRC-32/ISIZE
    trailers per member, the multi-member splitter
    (operators/archives.py:gzip_members, every member's trailer
    VERIFIED), the ISO 28500 record walk, and the strict HTML→text
    extraction. Content is unchanged through the compression layer, so
    the SAME byte-exact oracle as source_warc_shards checks it — one
    flipped bit in any member's DEFLATE stream moves a hash."""
    from python_multiproc_bigdata_spark.operators.warc import (
        pack_warcgz_shards,
        walk_warcgz_shards,
    )

    d = table(prep(spark), sf_dir, "documents").select("doc_id", "text")
    return walk_warcgz_shards(pack_warcgz_shards(d))


# One shared spec drives BOTH the Spark panel and its oracle, so the
# two can never drift: per table, the primary key (composite allowed)
# and the profiled columns. Only string/integer/date columns are
# profiled — float min/max would hash-compare via engine-specific
# string formatting. Values are emitted as strings (dates render
# 'YYYY-MM-DD' identically on both engines).
DQ_PANEL_SPEC: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    # table: (pk columns, profiled columns)
    "region": (("r_regionkey",), ("r_name",)),
    "nation": (("n_nationkey",), ("n_name", "n_regionkey")),
    "customer": (("c_custkey",), ("c_nationkey", "c_mktsegment")),
    "supplier": (("s_suppkey",), ("s_nationkey",)),
    "part": (("p_partkey",), ("p_brand", "p_type")),
    "orders": (("o_orderkey",), ("o_custkey", "o_orderdate", "o_orderpriority")),
    "lineitem": (
        ("l_orderkey", "l_linenumber"),
        ("l_shipdate", "l_returnflag", "l_linestatus"),
    ),
    "documents": (("doc_id",), ("lang", "source", "n_chars")),
    "embeddings": (("vec_id",), ("label",)),
}


def dq_expectations_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide data-quality expectation panel — the
    Great-Expectations shape generalizing dq_check_orders from one
    table's rules to every table's profile: per table a row_count and a
    pk_duplicates check (rows minus distinct PK tuples — composite keys
    supported), and per profiled column null_count / n_distinct /
    min / max as canonical strings. One scan + one aggregate per table
    (every metric is a conditional/distinct aggregate in the same
    groupBy-less pass; the distinct-PK check is its own count-distinct
    pass), |tables|x|columns| rows out at any scale — the nightly
    freshness/contract report a 100 TB lakehouse runs per layer.

    Scale note: multiple exact count_distinct aggregates in one pass
    plan through an Expand node (input multiplied by the number of
    distinct columns). Fine at profile widths like these; a VERY wide
    panel at 100 TB swaps n_distinct to approx_count_distinct (one
    HLL per column, no Expand) and keeps the exact PK-duplicates check
    as its own pass."""
    s = prep(spark)
    frames = []
    for tbl, (pk, cols) in DQ_PANEL_SPEC.items():
        # r12 (guide §2.5 input skew): each table is one scan split at
        # bench scale, so the Expand×(distinct cols) partial-aggregate
        # stage ran on ONE core per table; fan out on the PK so the
        # expand/partial work spreads. Bytes-proportional (1 MiB/part):
        # per-row cost here tracks row bytes, so a 2 KB dimension table
        # skips the exchange while lineitem fans wide (no-op at 100 TB
        # where the scan already has thousands of splits).
        t = fan_out_scan(table(s, sf_dir, tbl), *pk, per_part_bytes=1 << 20)
        # \x01 separator matches the oracle's chr(1) join — a bare
        # concat would make ('1','23') collide with ('12','3').
        # NULL components are encoded explicitly as \x02 on BOTH engine
        # sides: concat_ws silently skips NULLs (('a',NULL) would
        # collide with ('a','')) while the oracle's || propagates them
        # (dropping the whole tuple from count DISTINCT) — the two
        # engines would disagree the moment a nullable PK enters the
        # spec.
        # Expressions are assembled as SQL STRINGS, one F.expr per
        # relational step (r12): the Column-by-Column form built ~50
        # py4j-backed Column objects per table (~2–3 s of driver chatter
        # per panel build, re-paid every bench repeat); a string is ONE
        # round trip and parses JVM-side. chr(1)/chr(2) are the same
        # \x01 separator and \x02 NULL sentinel as before.
        pk_sql = ", ".join(f"coalesce(CAST({c} AS STRING), chr(2))" for c in pk)
        aggs = [
            "CAST(count(1) AS BIGINT) AS _rows",
            f"CAST(count(DISTINCT concat_ws(chr(1), {pk_sql})) AS BIGINT)"
            " AS _pk_distinct",
        ]
        for c in cols:
            aggs += [
                f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS _null_{c}",
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS _nd_{c}",
                f"CAST(min({c}) AS STRING) AS _min_{c}",
                f"CAST(max({c}) AS STRING) AS _max_{c}",
            ]
        row = t.agg(*[F.expr(a) for a in aggs])
        metrics = [
            ("_table_", "row_count", "CAST(_rows AS STRING)"),
            ("_table_", "pk_duplicates", "CAST(_rows - _pk_distinct AS STRING)"),
        ]
        for c in cols:
            metrics += [
                (c, "null_count", f"CAST(_null_{c} AS STRING)"),
                (c, "n_distinct", f"CAST(_nd_{c} AS STRING)"),
                (c, "min", f"_min_{c}"),
                (c, "max", f"_max_{c}"),
            ]
        structs = ", ".join(
            f"named_struct('tbl', '{tbl}', 'col', '{col}', 'metric', '{metric}',"
            f" 'value', {val})"
            for col, metric, val in metrics
        )
        frames.append(
            row.select(F.expr(f"explode(array({structs})) AS m")).select(
                "m.tbl", "m.col", "m.metric", "m.value"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("tbl", "col", "metric")


def dq_expectations_panel_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide-panel SCALE path dq_expectations_panel's docstring
    prescribes, shipped as code: NO exact count_distinct in the profile
    pass (multiple exact distincts plan through an Expand node — input
    multiplied by the number of distinct columns — the exact panel's
    honest 100 TB cost), three Expand-free passes per table instead:

    1. profile pass — row_count + per-column null_count/min/max plus
       the ONE exact pk-distinct count (the dup check must stay exact —
       an approximate uniqueness gate is useless): a SINGLE distinct
       aggregate plans through planAggregateWithOneDistinct (four
       chained HashAggregates), never an Expand — Expand appears only
       with MULTIPLE distinct groups, which is what this variant
       removes;
    2. per-column cardinality via the PORTABLE md5-HLL
       (operators/sketches.py, the stats_hll_portable arithmetic):
       explode (tbl, col, val), registers = groupBy(tbl, col,
       bucket).max(rho) — the explode multiplies rows like Expand does,
       but HLL registers partial-aggregate map-side to ≤ 256·|cols|
       rows per partition before the shuffle, which exact distinct
       cannot (it must move every distinct value). Emitted as metric
       'n_distinct_hll', rounded to the nearest integer — and because
       the sketch is engine-portable, the oracle replays it EXACTLY,
       so this panel is full value-checked, not rows+bounds.

    r9 fusion (VERDICT r8 ask #4): the nine per-table HLL pipelines
    (each its own explode → groupBy → seed-join, ~27 small jobs at
    sf0.1) are UNIONED into ONE kv relation tagged with tbl before the
    register groupBy — one shuffle keyed (tbl, col, bucket), one filled
    aggregate, one seed join for all 9 tables. Same registers, same
    estimates (the sketch state is per-(tbl, col) either way); only the
    fixed per-job overhead collapses.

    Plan pin: tests/test_scale_plans.py asserts no Expand node in the
    full panel plan."""
    from python_multiproc_bigdata_spark.operators.sketches import (
        hll_corrected_estimate,
        hll_registers,
    )

    s = prep(spark)
    frames = []
    kv_frames = []
    for tbl, (pk, cols) in DQ_PANEL_SPEC.items():
        # r12: same bytes-proportional fan-out as the exact panel —
        # parallelizes the profile pass and the kv-explode feeding the
        # fused HLL register aggregate (md5 per value) where the table
        # is big enough to pay for the exchange.
        t = fan_out_scan(table(s, sf_dir, tbl), *pk, per_part_bytes=1 << 20)
        # pass 1: profile aggregates + the single exact pk distinct.
        # SQL-string expression assembly (one F.expr round trip per
        # step instead of ~40 py4j Column builds per table) — same
        # chr(1)/chr(2) separator/NULL-sentinel convention as the exact
        # panel, values unchanged.
        pk_sql = ", ".join(f"coalesce(CAST({c} AS STRING), chr(2))" for c in pk)
        aggs = [
            "CAST(count(1) AS BIGINT) AS _rows",
            f"CAST(count(DISTINCT concat_ws(chr(1), {pk_sql})) AS BIGINT)"
            " AS _pk_distinct",
        ]
        for c in cols:
            aggs += [
                f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS _null_{c}",
                f"CAST(min({c}) AS STRING) AS _min_{c}",
                f"CAST(max({c}) AS STRING) AS _max_{c}",
            ]
        row = t.agg(*[F.expr(a) for a in aggs])
        metrics = [
            ("_table_", "row_count", "CAST(_rows AS STRING)"),
            ("_table_", "pk_duplicates", "CAST(_rows - _pk_distinct AS STRING)"),
        ]
        for c in cols:
            metrics += [
                (c, "null_count", f"CAST(_null_{c} AS STRING)"),
                (c, "min", f"_min_{c}"),
                (c, "max", f"_max_{c}"),
            ]
        structs = ", ".join(
            f"named_struct('tbl', '{tbl}', 'col', '{col}', 'metric', '{metric}',"
            f" 'value', {val})"
            for col, metric, val in metrics
        )
        profile = row.select(F.expr(f"explode(array({structs})) AS m")).select(
            "m.tbl", "m.col", "m.metric", "m.value"
        )
        frames.append(profile)
        # pass 2 feed: (tbl, col, val) kv rows for the FUSED HLL pass
        kv_structs = ", ".join(
            f"named_struct('tbl', '{tbl}', 'col', '{c}',"
            f" 'val', CAST({c} AS STRING))"
            for c in cols
        )
        kv_frames.append(
            t.select(F.expr(f"explode(array({kv_structs})) AS kv"))
            .select("kv.tbl", "kv.col", "kv.val")
            .filter(F.col("val").isNotNull())
        )
    # pass 2: ONE portable-HLL pipeline over all tables — union the kv
    # relations, ONE register groupBy keyed (tbl, col, bucket), one
    # filled aggregate, one seed join (vs 9 of each pre-fusion)
    kv = kv_frames[0]
    for f in kv_frames[1:]:
        kv = kv.unionByName(f)
    regs = hll_registers(kv, ["tbl", "col"], "val")
    filled = regs.groupBy("tbl", "col").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    # seed every profiled (tbl, col) so an all-NULL column still emits
    # an estimate row (0 via linear counting) on both engines
    seed = s.createDataFrame(
        [(tbl, c) for tbl, (_pk, cols) in DQ_PANEL_SPEC.items() for c in cols],
        "tbl string, col string",
    )
    est = (
        seed.join(filled, ["tbl", "col"], "left")
        .select(
            "tbl",
            "col",
            F.coalesce("_s", F.lit(0.0)).alias("_s"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
        )
        .select(
            "tbl",
            "col",
            F.lit("n_distinct_hll").alias("metric"),
            F.round(hll_corrected_estimate())
            .cast("long")
            .cast("string")
            .alias("value"),
        )
    )
    frames.append(est)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("tbl", "col", "metric")


def _dq_panel_approx_oracle() -> str:
    from python_multiproc_bigdata_spark.operators.sketches import (
        HLL_ALPHA,
        sql_hll_bucket_expr,
        sql_hll_v_expr,
    )

    parts = []
    for tbl, (pk, cols) in DQ_PANEL_SPEC.items():
        pk_expr = " || chr(1) || ".join(
            f"coalesce(CAST({c} AS VARCHAR), chr(2))" for c in pk
        )
        parts.append(
            f"SELECT '{tbl}' AS tbl, '_table_' AS col, 'row_count' AS metric,\n"
            f"       CAST(count(*) AS VARCHAR) AS value FROM {tbl}"
        )
        parts.append(
            f"SELECT '{tbl}', '_table_', 'pk_duplicates',\n"
            f"       CAST(count(*) - count(DISTINCT {pk_expr}) AS VARCHAR) FROM {tbl}"
        )
        for c in cols:
            parts.append(
                f"SELECT '{tbl}', '{c}', 'null_count',\n"
                f"       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS VARCHAR)"
                f" FROM {tbl}"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'min', CAST(min({c}) AS VARCHAR) FROM {tbl}"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'max', CAST(max({c}) AS VARCHAR) FROM {tbl}"
            )
            # portable md5-HLL replay — identical arithmetic to
            # operators/sketches.py, so the estimate value-matches
            parts.append(f"""SELECT '{tbl}', '{c}', 'n_distinct_hll',
       CAST(CAST(round(
         CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE raw END) AS BIGINT) AS VARCHAR)
FROM (
  SELECT CAST({HLL_ALPHA!r} AS DOUBLE) * 65536 / (s + (256 - nb) * 1.0) AS raw, nb
  FROM (
    SELECT coalesce(sum(power(2.0, -m)), 0.0) AS s, count(*) AS nb
    FROM (
      SELECT bucket,
             max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS m
      FROM (
        SELECT {sql_hll_bucket_expr("val")} AS bucket,
               {sql_hll_v_expr("val")} AS v
        FROM (SELECT CAST({c} AS VARCHAR) AS val FROM {tbl}
              WHERE {c} IS NOT NULL)
      ) GROUP BY bucket
    )
  )
)""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY tbl, col, metric"


def _dq_panel_oracle() -> str:
    parts = []
    for tbl, (pk, cols) in DQ_PANEL_SPEC.items():
        pk_expr = " || chr(1) || ".join(
            f"coalesce(CAST({c} AS VARCHAR), chr(2))" for c in pk
        )
        parts.append(
            f"SELECT '{tbl}' AS tbl, '_table_' AS col, 'row_count' AS metric,\n"
            f"       CAST(count(*) AS VARCHAR) AS value FROM {tbl}"
        )
        parts.append(
            f"SELECT '{tbl}', '_table_', 'pk_duplicates',\n"
            f"       CAST(count(*) - count(DISTINCT {pk_expr}) AS VARCHAR) FROM {tbl}"
        )
        for c in cols:
            parts.append(
                f"SELECT '{tbl}', '{c}', 'null_count',\n"
                f"       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS VARCHAR)"
                f" FROM {tbl}"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'n_distinct',\n"
                f"       CAST(count(DISTINCT {c}) AS VARCHAR) FROM {tbl}"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'min', CAST(min({c}) AS VARCHAR) FROM {tbl}"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'max', CAST(max({c}) AS VARCHAR) FROM {tbl}"
            )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY tbl, col, metric"


REGISTRY = {
    "cdc_upsert_customers": QuerySpec(cdc_upsert_customers, SQL_CDC_UPSERT),
    "cdc_latest_per_key": QuerySpec(cdc_latest_per_key, SQL_CDC_LATEST),
    "cdc_snapshot_asof": QuerySpec(cdc_snapshot_asof, SQL_CDC_SNAPSHOT),
    "cdc_scd2_user_state": QuerySpec(cdc_scd2_user_state, SQL_SCD2),
    "asof_click_to_view": QuerySpec(asof_click_to_view, SQL_ASOF),
    "asof_click_to_next_view": QuerySpec(asof_click_to_next_view, SQL_ASOF_FWD),
    "asof_click_to_nearest_view": QuerySpec(asof_click_to_nearest_view, SQL_ASOF_NEAREST),
    "range_join_close_events": QuerySpec(range_join_close_events, SQL_RANGE),
    "bloom_pruned_urgent_revenue": QuerySpec(bloom_pruned_urgent_revenue, SQL_BLOOM_PRUNED),
    "udaf_median_acctbal": QuerySpec(udaf_median_acctbal, SQL_UDAF_MEDIAN),
    "udaf_trimmed_mean_price": QuerySpec(udaf_trimmed_mean_price, SQL_UDAF_TRIMMED),
    "cube_orders": QuerySpec(cube_orders, SQL_CUBE),
    "approx_distinct_stats": QuerySpec(
        approx_distinct_stats, SQL_APPROX_DISTINCT_STATS
    ),
    "skew_salted_event_counts": QuerySpec(skew_salted_event_counts, SQL_SKEW_SALTED),
    "dq_check_orders": QuerySpec(dq_check_orders, SQL_DQ_ORDERS),
    "dq_expectations_panel": QuerySpec(dq_expectations_panel, _dq_panel_oracle),
    "dq_expectations_panel_approx": QuerySpec(
        dq_expectations_panel_approx, _dq_panel_approx_oracle
    ),
    "source_xml_roundtrip": QuerySpec(source_xml_roundtrip, SQL_XML_ROUNDTRIP),
    "source_zip_shards": QuerySpec(source_zip_shards, SQL_ZIP_SHARDS),
    "source_tar_shards": QuerySpec(source_tar_shards, SQL_TAR_SHARDS),
    "source_targz_shards": QuerySpec(source_targz_shards, SQL_TARGZ_SHARDS),
    "source_warc_shards": QuerySpec(source_warc_shards, SQL_WARC_SHARDS),
    "source_warcgz_shards": QuerySpec(source_warcgz_shards, SQL_WARC_SHARDS),
    "crawl_wet_pipeline": QuerySpec(crawl_wet_pipeline, SQL_CRAWL_WET),
    "crawl_link_graph": QuerySpec(crawl_link_graph, SQL_CRAWL_LINK_GRAPH),
}
