"""Statistical / grouping-surface parity queries (beyond-reference):
moments (stddev/var/covar/corr), exact interpolated percentiles,
GROUPING SETS, map-function parity, and a deterministic hash-based
train/test split (the held-out-split primitive of a training-data
pipeline — engine-portable because the bucket comes from md5, not a
seeded RNG).

All double aggregates are rounded per the repo parity rule (2 money,
4 ratios/moments). Moments/percentiles are algebraic or sort-based
aggregates — partial-aggregated map-side, no extra shuffles beyond the
groupBy itself, so they scale like a word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def stats_lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag second-moment panel over lineitem: sample stddev /
    variance of quantity, sample covariance and correlation of
    (quantity, extendedprice). One algebraic groupBy."""
    li = table(prep(spark), sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


SQL_MOMENTS = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS qty_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag
"""


def stats_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (ANSI percentile_cont
    semantics) of extendedprice per returnflag, plus the median. Exact
    percentiles sort within the group; at 100 TB swap in
    percentile_approx (see approx_distinct_stats) — kept exact here
    because it is the oracle-checkable form."""
    li = table(prep(spark), sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 2).alias("price_p25"),
        F.round(F.median("l_extendedprice"), 2).alias("price_p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 2).alias("price_p75"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 2) AS price_p25,
       round(quantile_cont(l_extendedprice, 0.50), 2) AS price_p50,
       round(quantile_cont(l_extendedprice, 0.75), 2) AS price_p75
FROM lineitem GROUP BY l_returnflag
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status, priority), (status), ()) over orders with
    grouping() flags disambiguating the null superaggregate rows —
    the general form of the cube/rollup queries (SURVEY §2.4 A7
    generalization)."""
    o = table(prep(spark), sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """)


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def map_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function parity: per priority, build a status→count map
    (map_from_entries over collected structs), then read it back with
    element_at / map_keys / size. The ORACLE computes the same scalars
    with conditional aggregates — the gate checks values, proving the
    map round-trip is lossless."""
    o = table(prep(spark), sf_dir, "orders")
    counted = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = counted.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_map")
    )
    return m.select(
        "o_orderpriority",
        F.size("status_map").alias("n_statuses"),
        F.coalesce(F.element_at("status_map", "F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.element_at("status_map", "O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.element_at("status_map", "P"), F.lit(0)).alias("n_p"),
        F.array_join(F.map_keys("status_map"), ",").alias("statuses"),
    )


SQL_MAP_COUNTS = """
SELECT o_orderpriority,
       count(DISTINCT o_orderstatus) AS n_statuses,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders GROUP BY o_orderpriority
"""


def split_train_test_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test split of documents by md5 of the
    doc id (no RNG — re-runs and engines agree; the standard way to hold
    out an eval set in a 100 TB corpus is exactly this hash-mod). Split
    membership = first two hex chars of md5(doc_id) < 'cd' (205/256 ≈
    80.1% expected). Emits per-split counts and length stats."""
    d = table(prep(spark), sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd", "train"
    ).otherwise("test")
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


SQL_SPLIT = """
SELECT CASE WHEN substring(md5(doc_id::VARCHAR), 1, 2) < 'cd'
            THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY 1
"""


N_BUCKETS = 20
PRICE_LO = 0.0
PRICE_HI = 120000.0  # covers TPC-H extendedprice (~900..105k) with headroom


def stats_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice: 20 fixed buckets over
    [0, 120000). The bucket index is plain double arithmetic written
    identically in the oracle (floor((v-lo)/(hi-lo)*n), clamped), so the
    cut points are bit-identical across engines. One partial-aggregated
    groupBy on a derived int key — word-count shaped, scales flat. Fixed
    bounds (vs data-driven min/max) keep it single-pass; at 100 TB a
    data-driven variant first runs a cheap min/max agg and broadcasts
    the bounds."""
    li = table(prep(spark), sf_dir, "lineitem")
    width = (PRICE_HI - PRICE_LO) / N_BUCKETS
    idx = F.floor(
        (F.col("l_extendedprice") - PRICE_LO) / (PRICE_HI - PRICE_LO) * N_BUCKETS
    ).cast("int")
    bucket = F.least(F.lit(N_BUCKETS - 1), F.greatest(F.lit(0), idx))
    return (
        li.select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .withColumn("bucket_lo", F.round(F.col("bucket") * width, 2))
        .withColumn("bucket_hi", F.round((F.col("bucket") + 1) * width, 2))
    )


SQL_HISTOGRAM = f"""
SELECT bucket,
       count(*) AS n_items,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(bucket * CAST({(PRICE_HI - PRICE_LO) / N_BUCKETS} AS DOUBLE), 2) AS bucket_lo,
       round((bucket + 1) * CAST({(PRICE_HI - PRICE_LO) / N_BUCKETS} AS DOUBLE), 2) AS bucket_hi
FROM (
  SELECT least({N_BUCKETS - 1}, greatest(0,
           CAST(floor((l_extendedprice - {PRICE_LO})
                      / ({PRICE_HI} - {PRICE_LO}) * {N_BUCKETS}) AS INTEGER)
         )) AS bucket,
         l_extendedprice
  FROM lineitem)
GROUP BY bucket
"""


def stats_argminmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by surface: per order-priority, the orderkey carrying
    the extreme totalprice. The ordering value is a (price, orderkey)
    STRUCT so the extreme is unique — max_by on a bare price would be
    nondeterministic under ties, across engines AND across Spark task
    retries. The oracle replays the same tuple ordering with window
    ranks."""
    o = table(prep(spark), sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by(
            "o_orderkey", F.struct("o_totalprice", "o_orderkey")
        ).alias("max_price_orderkey"),
        F.min_by(
            "o_orderkey", F.struct("o_totalprice", "o_orderkey")
        ).alias("min_price_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


SQL_ARGMINMAX = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
  FROM orders)
SELECT mx.o_orderpriority,
       mx.o_orderkey AS max_price_orderkey,
       mn.o_orderkey AS min_price_orderkey,
       round(mx.o_totalprice, 2) AS max_price,
       round(mn.o_totalprice, 2) AS min_price
FROM (SELECT * FROM ranked WHERE rmax = 1) mx
JOIN (SELECT * FROM ranked WHERE rmin = 1) mn USING (o_orderpriority)
"""


def stats_price_quartiles_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile bucketing of orders by totalprice within each
    priority — the percentile-bucket surface. The ntile ordering key is
    the unique (price, orderkey) pair, so bucket boundaries are
    deterministic across engines and retries."""
    o = table(prep(spark), sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


SQL_NTILE = """
SELECT o_orderpriority, quartile,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo_price,
       round(max(o_totalprice), 2) AS hi_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders)
GROUP BY o_orderpriority, quartile
"""


def stats_hll_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-event-type user HLLs,
    estimated, PLUS a register-wise union across types proving the
    merge path — the 100 TB story is exactly that partial sketches
    merge across partitions/days without rescanning (incremental daily
    uniques = union of daily sketches; union = cell-wise max of
    registers). Runs on the PORTABLE p=8 md5-HLL
    (operators/sketches.py), so the oracle replays the sketch
    bit-for-bit and this is a FULL value check — promoted r9 from
    rows-only (the native Apache DataSketches twin, whose JVM-internal
    hash no oracle can replay, is kept unregistered below)."""
    from python_multiproc_bigdata_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    e = table(prep(spark), sf_dir, "events")
    base = e.select("event_type", F.col("user_id").cast("string").alias("uid"))
    # per-type register relation feeds BOTH the per-type estimates and
    # the ALL union row; persist so the merge path merges registers
    # instead of rescanning events (the whole point of mergeable sketches)
    regs = hll_registers(base, ["event_type"], "uid").persist()
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "m")
    )
    ests = hll_estimate_from_registers(regs.unionByName(merged), ["event_type"])
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    total = counts.agg(
        F.lit("ALL").alias("event_type"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    return (
        ests.join(counts.unionByName(total), "event_type")
        .select(
            "event_type",
            F.round("hll_est", 1).alias("approx_users"),
            "n_events",
        )
        .orderBy("event_type")
    )


def stats_hll_users_per_type_native(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNREGISTERED native-sketch twin (Apache DataSketches HLL, native
    in Spark 4): same shape as stats_hll_users_per_type but on
    hll_sketch_agg/hll_union_agg — the production choice when no
    cross-engine replay is needed (binary sketch state is storable and
    mergeable across days). Kept out of the registry because its
    estimates are engine-specific by design; the registered portable
    form is the value-checked twin."""
    e = table(prep(spark), sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    ).persist()
    total = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("approx_users"),
            "n_events",
        )
        .unionByName(total)
    )


SQL_HLL_USERS_PER_TYPE = rf"""
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
), allregs AS (
  SELECT event_type, bucket, m FROM regs
  UNION ALL
  SELECT 'ALL', bucket, max(m) FROM regs GROUP BY bucket
), agg AS (
  SELECT event_type, sum(power(2.0, -m)) AS s, count(*) AS nb
  FROM allregs GROUP BY 1
), est AS (
  SELECT event_type,
         CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE raw END AS hll_est
  FROM (
    SELECT event_type,
           CAST({0.7213 / (1.0 + 1.079 / 256)!r} AS DOUBLE) * 65536
             / (s + (256 - nb) * 1.0) AS raw,
           nb
    FROM agg)
), counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(count(*) AS BIGINT) FROM events
)
SELECT e.event_type, round(e.hll_est, 1) AS approx_users, c.n_events
FROM est e JOIN counts c USING (event_type)
ORDER BY event_type
"""


def global_index_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable global dense index over orders by orderkey
    (operators/transforms.py:with_global_index — bucketed parallel sort,
    no single-partition funnel). The oracle is the single-sort
    row_number() the operator replaces, proving the distributed form
    computes the identical total order."""
    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    o = table(prep(spark), sf_dir, "orders")
    return with_global_index(
        o.select("o_orderkey", "o_totalprice"), "o_orderkey", out_col="idx"
    )


SQL_GLOBAL_INDEX = """
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx
FROM orders
"""


def calendar_month_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly order counts via a RECURSIVE CTE (Spark 4
    WITH RECURSIVE): generate the full month series from min to max
    orderdate, left-join counts so empty months report 0 — the
    time-series densification a naive GROUP BY month silently skips.
    Recursion depth = months spanned (~80 here), under Spark's
    cteRecursionLevelLimit; the series is O(months) rows, the join is
    one broadcast of that tiny series against the scan.

    The date bounds are resolved FIRST with one 2-value aggregate and
    embedded as literals: a scalar subquery inside the recursive step's
    WHERE would rescan orders once PER ITERATION (measured 11 s vs
    ~0.5 s at sf0.1 — and ~80 full scans of a 100 TB table). The
    recursion then touches no base table at all. (sequence() + explode
    generates the same series in one expression; this query exists to
    exercise WITH RECURSIVE.)"""
    o = table(prep(spark), sf_dir, "orders")
    o.createOrReplaceTempView("orders_rcte")
    lo, hi = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).first()
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
          SELECT to_date(date_trunc('MONTH', DATE '{lo}'))
          UNION ALL
          SELECT add_months(m, 1) FROM months
          WHERE m < to_date(date_trunc('MONTH', DATE '{hi}'))
        )
        SELECT m AS month_start,
               CAST(coalesce(count(o.o_orderkey), 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN orders_rcte o
          ON to_date(date_trunc('MONTH', o.o_orderdate)) = months.m
        GROUP BY m
    """)


SQL_CALENDAR_MONTHS = """
WITH RECURSIVE months(m) AS (
  SELECT date_trunc('month', min(o_orderdate))::DATE FROM orders
  UNION ALL
  SELECT (m + INTERVAL 1 MONTH)::DATE FROM months
  WHERE m < (SELECT date_trunc('month', max(o_orderdate))::DATE FROM orders)
)
SELECT m AS month_start,
       CAST(coalesce(count(o.o_orderkey), 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders o
  ON date_trunc('month', o.o_orderdate)::DATE = months.m
GROUP BY m
"""


def stats_top_types_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the DataSketches-backed approx_top_k — exact
    below tracking capacity (maxItemsTracked=10000 ≫ 5 distinct event
    types), which is what makes a full-hash oracle legitimate here:
    the sketch only approximates once cardinality exceeds capacity, and
    tests/test_stats_queries pins that regime too. At 100 TB this is
    the one-pass mergeable top-k you run instead of a full groupBy+sort
    when the domain is huge (URLs, tokens) — partial sketches merge
    associatively map-side."""
    e = table(prep(spark), sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 50, 10000)").alias("t"))
    return (
        topk.select(F.explode("t").alias("x"))
        .select(
            F.col("x.item").alias("event_type"),
            F.col("x.count").cast("long").alias("n_events"),
        )
        .orderBy("event_type")
    )


SQL_TOP_TYPES = """
SELECT event_type, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def stats_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into control/treatment by
    id parity (the deterministic stand-in for an assignment table),
    Welch's two-sample t statistic on event value per event_type — the
    unequal-variance test every experimentation platform reports
    (pooled-variance Student's t assumes homoscedasticity you can't
    check at ingest).

    One scan, one (event_type, variant) groupBy with algebraic
    count/avg/var_samp partials, then a variant self-pivot at
    |event_types| rows — the verdict math runs on a frame the driver
    could print. t rounded to 4 (float-sum posture); welch_df left
    unrounded is irrational too, so it is rounded the same."""
    e = table(prep(spark), sf_dir, "events")
    g = (
        e.withColumn("variant", (F.col("user_id") % 2).cast("int"))
        .groupBy("event_type", "variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = g.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    b = g.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("v").alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (F.col("v_a") / F.col("n_a")) * (F.col("v_a") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (F.col("v_b") / F.col("n_b")) * (F.col("v_b") / F.col("n_b"))
        / (F.col("n_b") - 1)
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(dfw, 2).alias("welch_df"),
    )


SQL_AB_TTEST = """
WITH g AS (
  SELECT event_type, (user_id % 2)::INT AS variant,
         count(*) AS n, avg(value) AS m, var_samp(value) AS v
  FROM events GROUP BY 1, 2
), a AS (
  SELECT event_type, n AS n_a, m AS m_a, v AS v_a FROM g WHERE variant = 0
), b AS (
  SELECT event_type, n AS n_b, m AS m_b, v AS v_b FROM g WHERE variant = 1
)
SELECT event_type, n_a, n_b,
       round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
       round(((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b))
             / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 2) AS welch_df
FROM a JOIN b USING (event_type)
"""


def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two deterministic
    md5-halves of the event stream — the standard ML-ops check that a
    new data slice still follows the reference distribution (PSI < 0.1
    stable, > 0.25 action). Fixed-width value buckets (10 x 50 over the
    known 0–500 value domain), ONE scan: per-bucket counts for both
    slices come from a single groupBy with conditional sums (word-count
    shaped); totals are 1-row broadcast fan-outs; proportions clamp at
    1e-6 so an empty bucket contributes a finite penalty. Per-bucket
    rows with the PSI contribution; sum over psi_term_micros / 1e6 is
    the index. The term ships as integer micro-units (the project's
    float-sum convention, cf. Theil-Sen / NDCG / CUSUM). Driver-red
    r7+r8 root cause (found r9): the oracle's bare ``sum(CASE...)`` is
    a DuckDB HUGEINT, which a pandas/arrow fetch coerces to float64
    (``5.0``) while Spark's BIGINT stays int64 (``5``) — a value-hash
    mismatch invisible to fetchall()-based local gates (both fetch as
    Python int there). Fix: ``CAST(... AS BIGINT)`` in the oracle's cnt
    CTE; tools/gate.py now scans every oracle for HUGEINT/DECIMAL
    output columns so this divergence class is caught pre-driver."""
    e = table(prep(spark), sf_dir, "events")
    in_a = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8"
    bucket = F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9))
    cnt = e.select(bucket.alias("bucket"), in_a.alias("a")).groupBy("bucket").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)).alias("nb"),
    )
    return psi_readback(cnt)


def psi_readback(cnt: DataFrame) -> DataFrame:
    """Shared PSI arithmetic over a (bucket, na, nb) count relation —
    used by the one-shot batch query above and the micro-batch-merged
    streaming twin (registry/streaming.py:streaming_psi_monitor), so
    'the merged counts read back identically' is enforced by
    construction (the quantile_sketch_readback pattern). Per-bucket
    counts are distributive, so the merged sketch is bit-identical to
    the one-shot groupBy and the SAME oracle value-checks both."""
    tot = cnt.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    pa = F.greatest(F.col("na") / F.col("ta"), F.lit(1e-6))
    pb = F.greatest(F.col("nb") / F.col("tb"), F.lit(1e-6))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "na",
            "nb",
            F.round((pa - pb) * F.log(pa / pb) * 1e6)
            .cast("bigint")
            .alias("psi_term_micros"),
        )
        .orderBy("bucket")
    )


SQL_PSI_DRIFT = """
WITH cnt AS (
  SELECT least(floor(value / 50)::INT, 9) AS bucket,
         CAST(sum(CASE WHEN substr(md5(event_id::VARCHAR), 1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN substr(md5(event_id::VARCHAR), 1, 1) < '8' THEN 0 ELSE 1 END) AS BIGINT) AS nb
  FROM events GROUP BY 1
), tot AS (
  SELECT sum(na) AS ta, sum(nb) AS tb FROM cnt
)
SELECT bucket, na, nb,
       CAST(round((greatest(na * 1.0 / ta, 1e-6) - greatest(nb * 1.0 / tb, 1e-6))
             * ln(greatest(na * 1.0 / ta, 1e-6) / greatest(nb * 1.0 / tb, 1e-6)) * 1e6)
            AS BIGINT) AS psi_term_micros
FROM cnt, tot
ORDER BY bucket
"""


def split_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split — the eval protocol for event data
    (random splits leak the future into training; k-fold and the
    stratified/leakage-safe splits cover exchangeable rows, this covers
    time series): one global cutoff at the 80th percentile of event
    time, then per user the train/test event counts and the boundary
    timestamps (max train us / min test us — integer microseconds, so
    the no-leakage property max_train <= cutoff < min_test is a
    checkable fact per row, not a claim). One percentile pass + one
    user-partitioned conditional aggregate; |users| rows out at any
    scale. Spark's exact percentile interpolates identically to
    DuckDB's quantile_cont on the same integer multiset, so the cutoff
    double is bit-identical on both engines."""
    e = table(prep(spark), sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    cut = e.agg(F.expr("percentile(unix_micros(ts), 0.8D)").alias("cut"))
    t = F.col("t")
    return (
        e.select("user_id", us.alias("t"))
        .crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(t <= F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(t > F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
            F.max(F.when(t <= F.col("cut"), t)).alias("max_train_us"),
            F.min(F.when(t > F.col("cut"), t)).alias("min_test_us"),
        )
        .select(
            "user_id",
            "n_train",
            "n_test",
            "max_train_us",
            "min_test_us",
            ((F.col("n_train") > 0) & (F.col("n_test") > 0)).alias("has_both"),
        )
        .orderBy("user_id")
    )


SQL_TEMPORAL_HOLDOUT = """
WITH c AS (SELECT quantile_cont(epoch_us(ts), 0.8) AS cut FROM events),
t AS (SELECT user_id, epoch_us(ts) AS t FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN t <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN t > cut THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       max(CASE WHEN t <= cut THEN t END) AS max_train_us,
       min(CASE WHEN t > cut THEN t END) AS min_test_us,
       sum(CASE WHEN t <= cut THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN t > cut THEN 1 ELSE 0 END) > 0 AS has_both
FROM t CROSS JOIN c
GROUP BY user_id
ORDER BY user_id
"""


def events_velocity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based abuse/bot gate — the velocity check fraud and API
    rate-limiting pipelines run, complementing the VALUE-based anomaly
    family (z-score/MAD/CUSUM detect unusual amounts; this detects
    unusual FREQUENCY): per user, the peak events-per-5-minute tumbling
    bucket, the total active buckets, and the mean in-bucket rate,
    flagging users whose peak exceeds the threshold. Two exact integer
    groupBys (user x bucket counts, then per-user rollup) — word-count
    shaped, |users| rows out at any scale; bucketing is integer
    floor-div on epoch microseconds, so both engines bucket
    identically (no timestamp-truncation dialect risk)."""
    e = table(prep(spark), sf_dir, "events")
    # integer DIV, not float-divide-then-cast: a double quotient just
    # under an integer can round UP before truncation (off-by-one bucket)
    bucket = F.expr("unix_micros(ts) DIV 300000000")
    per_bucket = (
        e.select("user_id", bucket.alias("b"))
        .groupBy("user_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_bucket.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("peak_per_5min"),
            F.count(F.lit(1)).cast("long").alias("active_buckets"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            "peak_per_5min",
            "active_buckets",
            "n_events",
            F.round(F.col("n_events") / F.col("active_buckets"), 4).alias(
                "mean_rate"
            ),
            (F.col("peak_per_5min") > 5).alias("flagged"),
        )
        .orderBy("user_id")
    )


SQL_VELOCITY_GATE = """
WITH pb AS (
  SELECT user_id, epoch_us(ts) // 300000000 AS b, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS peak_per_5min,
       CAST(count(*) AS BIGINT) AS active_buckets,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(n) * 1.0 / count(*), 4) AS mean_rate,
       max(n) > 5 AS flagged
FROM pb GROUP BY user_id ORDER BY user_id
"""


def split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment by hash-mod
    (fold = md5(doc_id) first 4 hex chars mod 5 — no RNG, engines and
    re-runs agree; the split_train_test hash-mod generalized to k
    folds). Emits per-(fold, lang) counts — the stratification report
    that catches a fold/language imbalance before a CV run."""
    d = table(prep(spark), sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 5
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("fold", "lang")
    )


SQL_KFOLD = """
SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 5)::INT AS fold,
       lang, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY fold, lang
"""


def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic between event type and a
    deterministic user cohort (md5-parity of user_id) — the categorical
    counterpart of the Welch t-test / PSI drift checks: does event-type
    mix differ by cohort? One contingency groupBy (|types|×2 cells),
    margins via two tiny re-aggregations broadcast back, then
    chi2 = Σ (obs − exp)²/exp over the cells. The statistic is reported
    with its degrees of freedom; p-value lookup needs the chi-square CDF
    (no SQL-portable closed form) and belongs to the caller's stats lib.
    Everything after the one scan is cell-count-sized."""
    e = table(prep(spark), sf_dir, "events")
    cohort = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "a"
    ).otherwise("b")
    cells = e.select("event_type", cohort.alias("cohort")).groupBy(
        "event_type", "cohort"
    ).agg(F.count(F.lit(1)).alias("obs"))
    row_m = cells.groupBy("event_type").agg(F.sum("obs").alias("row_n"))
    col_m = cells.groupBy("cohort").agg(F.sum("obs").alias("col_n"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = F.col("row_n") * F.col("col_n") / F.col("n")
    contrib = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    joined = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "cohort")
        .crossJoin(F.broadcast(tot))
    )
    nr = row_m.agg(F.count(F.lit(1)).alias("nr"))
    nc = col_m.agg(F.count(F.lit(1)).alias("nc"))
    return (
        joined.agg(F.round(F.sum(contrib), 6).alias("chi2"))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            "chi2", ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof")
        )
    )


SQL_CHI_SQUARE = """
WITH cells AS (
  SELECT event_type,
         CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
              THEN 'a' ELSE 'b' END AS cohort,
         count(*) AS obs
  FROM events GROUP BY 1, 2
), row_m AS (SELECT event_type, sum(obs) AS row_n FROM cells GROUP BY 1),
col_m AS (SELECT cohort, sum(obs) AS col_n FROM cells GROUP BY 1),
tot AS (SELECT sum(obs) AS n FROM cells),
nr AS (SELECT count(*) AS nr FROM row_m),
nc AS (SELECT count(*) AS nc FROM col_m)
SELECT round(sum((obs - row_n * col_n * 1.0 / n)
              * (obs - row_n * col_n * 1.0 / n)
              / (row_n * col_n * 1.0 / n)), 6) AS chi2,
       max((nr - 1) * (nc - 1)) AS dof
FROM cells
JOIN row_m USING (event_type)
JOIN col_m USING (cohort), tot, nr, nc
"""


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: k-anonymity over a quasi-identifier tuple —
    (lang, source, length decile) on documents — reporting, per
    equivalence class below the k=5 floor, its size and share of the
    corpus. Releasing rows whose quasi-identifier combination is rare
    re-identifies individuals; this is the audit every training-data
    release runs before publishing metadata. Plan: one groupBy over the
    quasi-id tuple (the only corpus-scale pass), a 1-row total joined
    by crossJoin broadcast — at 100 TB the class table is
    |distinct quasi-ids|-sized, tiny. The length decile uses
    width_bucket-style integer math (n_chars / 100), not ntile, so no
    global sort and the oracle replays it exactly."""
    d = table(prep(spark), sf_dir, "documents")
    classes = (
        d.select(
            "lang",
            "source",
            (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        classes.crossJoin(F.broadcast(total))
        .filter(F.col("class_size") < 5)
        .select(
            "lang",
            "source",
            "len_bucket",
            "class_size",
            F.round(F.col("class_size") / F.col("n_total"), 6).alias("at_risk_share"),
        )
        .orderBy("lang", "source", "len_bucket")
    )


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The l-diversity companion to the k-anonymity audit above:
    k-anonymity bounds re-identification, but a class whose SENSITIVE
    attribute is homogeneous still leaks it (Machanavajjhala et al.) —
    here quasi-id = (source, length decile), sensitive = lang; per
    class, size and distinct-l, flagging classes below l=3. Same scale
    shape as the k-anonymity audit: one groupBy over the quasi-id+lang
    marginal (map-side combined), then a tiny per-class rollup —
    distinct-l comes from counting the marginal's rows, NOT a
    count(DISTINCT) over raw rows, so no per-class distinct state."""
    d = table(prep(spark), sf_dir, "documents")
    marginal = (
        d.select(
            "source",
            (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
            "lang",
        )
        .groupBy("source", "len_bucket", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        marginal.groupBy("source", "len_bucket")
        .agg(
            F.sum("n").alias("class_size"),
            F.count(F.lit(1)).alias("l_distinct"),
        )
        .select(
            "source",
            "len_bucket",
            "class_size",
            "l_distinct",
            (F.col("l_distinct") >= 3).alias("diverse"),
        )
    )


SQL_L_DIVERSITY = """
WITH marginal AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket, lang,
         count(*) AS n
  FROM documents GROUP BY 1, 2, 3
)
SELECT source, len_bucket,
       CAST(sum(n) AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS l_distinct,
       count(*) >= 3 AS diverse
FROM marginal GROUP BY 1, 2
"""


QUANTILE_PROBES = (0.5, 0.9, 0.99, 0.999)


def stats_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch, value-checked — completing the sketch
    family (count-min heavy hitters, portable HLL, now quantiles: the
    three classic one-pass summaries a 100 TB pipeline monitors with):
    a two-pass fixed-grid histogram over the integer-cents event-value
    domain — pass 1 is a 1-row min/max/count, pass 2 a 256-bucket count
    histogram whose per-bucket COUNTs are distributive (partial
    aggregates merge map-side, and two shards' sketches merge by
    cell-wise sum — the same mergeability contract as the CMS) — then
    interpolated readback of p50/p90/p99/p999 next to the EXACT
    percentile and the error in cents. The estimate is within one
    bucket width of truth by construction; the err column makes that a
    checked fact, not a claim.

    Everything through the histogram is integer (cents, floor-div
    bucketing — no float boundary flips between engines); readback
    division order is mirrored exactly in the oracle so even the double
    arithmetic is bit-identical before rounding. Readback itself is
    |buckets|x|probes| rows — driver-free and trivially small."""
    spark = prep(spark)
    e = table(spark, sf_dir, "events")
    c = e.select(F.round(F.col("value") * 100).cast("long").alias("cents"))
    mm = c.agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.count(F.lit(1)).alias("n_total"),
    )
    hist = (
        c.crossJoin(F.broadcast(mm))
        .select(
            F.expr("CAST((cents - minc) * 256 DIV (maxc - minc + 1) AS INT)").alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return quantile_sketch_readback(spark, sf_dir, hist, mm)


def quantile_sketch_readback(
    spark: SparkSession, sf_dir: str, hist: DataFrame, mm: DataFrame
) -> DataFrame:
    """Interpolated probe readback over a (bucket, n) histogram sketch +
    the exact-percentile comparison column — shared by the one-shot
    batch sketch above and the micro-batch-merged streaming twin
    (registry/streaming.py:streaming_quantile_monitor), so 'the merged
    sketch reads back identically' is enforced by construction."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    probes = spark.createDataFrame(
        [(float(p), i) for i, p in enumerate(QUANTILE_PROBES)], ["p", "idx"]
    )
    ranks = probes.crossJoin(F.broadcast(mm)).withColumn(
        "r", F.col("p") * (F.col("n_total") - 1)
    )
    pick = ranks.join(
        cum,
        (F.col("cum_before") <= F.col("r"))
        & (F.col("r") < F.col("cum_before") + F.col("n")),
    )
    frac = (F.col("r") - F.col("cum_before")) / F.col("n")
    span = F.col("maxc") - F.col("minc") + 1
    est_c = F.col("minc") + (F.col("bucket") + frac) * span / 256.0
    exact = table(prep(spark), sf_dir, "events").agg(
        F.expr(
            "percentile(CAST(round(value * 100) AS BIGINT), array({}))".format(
                ", ".join(f"{p}D" for p in QUANTILE_PROBES)
            )
        ).alias("q")
    ).select(F.posexplode("q").alias("idx", "exact_c"))
    return (
        pick.join(exact, "idx")
        .select(
            "p",
            F.round(est_c / 100.0, 4).alias("est_usd"),
            F.round(F.col("exact_c") / 100.0, 4).alias("exact_usd"),
            F.round(F.abs(est_c - F.col("exact_c")), 2).alias("abs_err_cents"),
            F.round(span / 256.0, 2).alias("bucket_width_cents"),
        )
        .orderBy("p")
    )


# The oracle mirrors the two-pass sketch and the readback arithmetic in
# the SAME expression order (so doubles are bit-identical pre-round) and
# checks it against DuckDB's exact quantile_cont — which matches Spark's
# exact percentile() on identical multisets. Bare float literals parse
# as DECIMAL in DuckDB: CAST every probe to DOUBLE.
SQL_QUANTILE_SKETCH = """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
), mm AS (
  SELECT min(cents) AS minc, max(cents) AS maxc,
         CAST(count(*) AS BIGINT) AS n_total FROM c
), hist AS (
  SELECT CAST((cents - minc) * 256 // (maxc - minc + 1) AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM c CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT bucket, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM hist
), probes(p, idx) AS (
  VALUES (CAST(0.5 AS DOUBLE), 0), (CAST(0.9 AS DOUBLE), 1),
         (CAST(0.99 AS DOUBLE), 2), (CAST(0.999 AS DOUBLE), 3)
), ranks AS (
  SELECT p, idx, p * (n_total - 1) AS r, minc, maxc
  FROM probes CROSS JOIN mm
), pick AS (
  SELECT rk.p, rk.idx, rk.r, rk.minc, rk.maxc, cm.bucket, cm.n, cm.cum_before
  FROM ranks rk JOIN cum cm
    ON cm.cum_before <= rk.r AND rk.r < cm.cum_before + cm.n
), ex AS (
  SELECT 0 AS idx, quantile_cont(cents, CAST(0.5 AS DOUBLE)) AS exact_c FROM c
  UNION ALL
  SELECT 1, quantile_cont(cents, CAST(0.9 AS DOUBLE)) FROM c
  UNION ALL
  SELECT 2, quantile_cont(cents, CAST(0.99 AS DOUBLE)) FROM c
  UNION ALL
  SELECT 3, quantile_cont(cents, CAST(0.999 AS DOUBLE)) FROM c
)
SELECT p,
       round((minc + (bucket + (r - cum_before) / n) * (maxc - minc + 1) / 256.0)
             / 100.0, 4) AS est_usd,
       round(exact_c / 100.0, 4) AS exact_usd,
       round(abs((minc + (bucket + (r - cum_before) / n) * (maxc - minc + 1)
                  / 256.0) - exact_c), 2) AS abs_err_cents,
       round((maxc - minc + 1) / 256.0, 2) AS bucket_width_cents
FROM pick JOIN ex USING (idx)
ORDER BY p
"""


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the anonymity triad (k-anonymity
    bounds re-identification, l-diversity bounds homogeneity, but a
    class whose sensitive-attribute DISTRIBUTION skews far from the
    corpus-wide one still leaks — Li et al. 2007): per quasi-id class
    (source, length decile), the total-variation distance between the
    class's lang distribution and the global lang distribution,
    flagging classes with TVD > 0.2.

    Exact integer core: TVD = (1/2)·Σ_lang |n_cl·G − g_l·N_c| /
    (N_c·G) — the numerator is cross-multiplied BIGINT arithmetic and
    the leaky flag compares the NUMERATOR against 0.4·N_c·G (never a
    rounded float), only the reported ratio is a rounded double. Langs
    ABSENT from a class still contribute
    |0 − g_l·N_c|, so the per-class sum runs over the full class×lang
    grid — built by crossJoin with the GLOBAL lang marginal, which is
    |langs| rows (tiny, broadcast) — left-joined against the class
    marginal. Scale shape: one map-side-combined groupBy over the
    (class, lang) marginal, then everything downstream is
    |classes|×|langs| rows — never corpus-sized."""
    d = table(prep(spark), sf_dir, "documents")
    marg = (
        d.select(
            "source",
            (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
            "lang",
        )
        .groupBy("source", "len_bucket", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cls = marg.groupBy("source", "len_bucket").agg(
        F.sum("n").cast("long").alias("class_size")
    )
    glob = marg.groupBy("lang").agg(F.sum("n").cast("long").alias("g"))
    gtot = glob.agg(F.sum("g").cast("long").alias("n_total"))
    grid = cls.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(gtot))
    return (
        grid.join(marg, ["source", "len_bucket", "lang"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
        .groupBy("source", "len_bucket", "class_size", "n_total")
        .agg(
            F.sum(
                F.abs(F.col("n") * F.col("n_total") - F.col("g") * F.col("class_size"))
            )
            .cast("long")
            .alias("tvd_num")
        )
        .select(
            "source",
            "len_bucket",
            "class_size",
            F.round(
                F.col("tvd_num") / (2.0 * F.col("class_size") * F.col("n_total")), 6
            ).alias("tvd"),
            (
                F.col("tvd_num")
                > 0.4 * F.col("class_size") * F.col("n_total")
            ).alias("leaky"),
        )
    )


# TVD numerator is exact cross-multiplied integer arithmetic; the 0.2
# threshold is applied on the numerator (tvd_num > 0.4*Nc*G) so the flag
# never depends on float rounding. DuckDB sums promote to HUGEINT —
# cast back to BIGINT.
SQL_T_CLOSENESS = """
WITH marginal AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket, lang,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3
), cls AS (
  SELECT source, len_bucket, CAST(sum(n) AS BIGINT) AS class_size
  FROM marginal GROUP BY 1, 2
), langs AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS g FROM marginal GROUP BY 1
), gtot AS (
  SELECT CAST(sum(g) AS BIGINT) AS n_total FROM langs
), grid AS (
  SELECT c.source, c.len_bucket, c.class_size, t.n_total, l.lang, l.g,
         COALESCE(m.n, 0) AS n
  FROM cls c CROSS JOIN langs l CROSS JOIN gtot t
  LEFT JOIN marginal m
    ON m.source = c.source AND m.len_bucket = c.len_bucket AND m.lang = l.lang
)
SELECT source, len_bucket, class_size,
       round(CAST(sum(abs(n * n_total - g * class_size)) AS BIGINT)
             / (2.0 * class_size * n_total), 6) AS tvd,
       CAST(sum(abs(n * n_total - g * class_size)) AS BIGINT)
         > 0.4 * class_size * n_total AS leaky
FROM grid GROUP BY source, len_bucket, class_size, n_total
"""


SQL_K_ANONYMITY = """
WITH classes AS (
  SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS class_size
  FROM documents
  GROUP BY 1, 2, 3
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents
)
SELECT lang, source, len_bucket, class_size,
       round(class_size * 1.0 / n_total, 6) AS at_risk_share
FROM classes CROSS JOIN tot
WHERE class_size < 5
ORDER BY lang, source, len_bucket
"""


def privacy_dp_noised_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, ε=1,
    sensitivity=1) over the (lang, source) marginal of documents — the
    noised datasheet a corpus release publishes instead of exact
    counts. The noise here is SEEDED (md5 of the group key → uniform in
    (−1/2, 1/2) → inverse-CDF Laplace −(1/ε)·sgn(u)·ln(1−2|u|)) so the
    release is reproducible and oracle-checkable; a production ε-DP
    release must draw FRESH randomness per publication — the docstring
    states this honestly; the MECHANISM arithmetic is what this query
    pins.

    The uniform comes from the first 12 md5 hex digits of
    md5(lang || '|' || source) as a BIGINT via digit-wise strpos
    arithmetic (exact integers — the same portable-hash trick as the
    classifier's feature hash; no CONV()); concat is the
    NULL-propagating form on both engines, so a null quasi-id nulls the
    noise identically.
    Plan: one groupBy over the marginal, then pure column math — at
    100 TB the released relation is |langs|×|sources| rows."""
    d = table(prep(spark), sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("true_n"))
    digits = [
        (
            F.expr(
                f"CAST(instr('0123456789abcdef', substring(md5(concat(lang, '|', source)), {i + 1}, 1)) - 1 AS BIGINT)"
            )
            * F.lit(16 ** (11 - i)).cast("long")
        )
        for i in range(12)
    ]
    u_int = digits[0]
    for t in digits[1:]:
        u_int = u_int + t
    u = (u_int.cast("double") / F.lit(float(16**12))) - F.lit(0.5)
    absu = F.abs(u)
    noise = -F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * absu)
    return (
        counts.select(
            "lang",
            "source",
            "true_n",
            F.round(F.col("true_n") + noise, 4).alias("noised_n"),
            F.lit(1.0).alias("epsilon"),
        )
        .orderBy("lang", "source")
    )


def _dp_sql() -> str:
    digit_terms = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(md5(lang || '|' || source), {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (11 - i)})"
        for i in range(12)
    )
    return f"""
WITH counts AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS true_n
  FROM documents GROUP BY 1, 2
), noised AS (
  SELECT lang, source, true_n,
         (CAST({digit_terms} AS DOUBLE) / {float(16**12)!r}) - 0.5 AS u
  FROM counts
)
SELECT lang, source, true_n,
       round(true_n + (-sign(u) * ln(1.0 - 2.0 * abs(u))), 4) AS noised_n,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM noised
ORDER BY lang, source
"""


SQL_DP_NOISED = _dp_sql()


EVAL_PER_STRATUM = 5


def split_stratified_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified eval-set construction: exactly min(N, |stratum|) docs
    per (lang, length-decile) stratum, selected by md5(doc_id) rank —
    the balanced held-out suite a benchmark team builds so rare
    languages and length tails are represented instead of swamped by
    the head. No RNG (md5 rank is the repo's sampling convention:
    engine-portable, re-runs agree); the length decile is integer math
    (n_chars // 100), not ntile, so no global sort. Plan: one window
    row_number per stratum over the md5 key — partition-parallel; the
    output is ≤ N·|strata| rows at any corpus scale."""
    d = table(prep(spark), sf_dir, "documents")
    strat = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
    )
    w = Window.partitionBy("lang", "len_bucket").orderBy("_h", "doc_id")
    return (
        strat.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= EVAL_PER_STRATUM)
        .select("lang", "len_bucket", "doc_id", "pick")
        .orderBy("lang", "len_bucket", "pick")
    )


SQL_STRATIFIED_EVAL = f"""
SELECT lang, len_bucket, doc_id, pick FROM (
  SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket, doc_id,
         row_number() OVER (
           PARTITION BY lang, n_chars // 100
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
  FROM documents)
WHERE pick <= {EVAL_PER_STRATUM}
ORDER BY lang, len_bucket, pick
"""


CMS_ROWS = 4
CMS_WIDTH = 256
CMS_TOPK = 20


def stats_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters with an EXACT oracle — the
    mergeable-sketch class done deterministically: 4 md5-derived hash
    rows × 256 buckets (the distributive-aggregate shape — each
    executor's partial sketch merges by cell-wise SUM, exactly like a
    partial count), then the true top-20 tokens' estimates read back as
    min over rows, with the CMS ≥-truth guarantee surfaced as a column.
    Unlike RNG-seeded sketch libraries, md5 hashing makes the whole
    sketch bit-replayable in SQL, so the driver gate value-checks a
    SKETCH — complementing the rows-only approx_count_distinct entries.

    Plan: one token explode feeding (a) the exact counts groupBy and
    (b) the 4×-amplified sketch groupBy onto a 1024-cell relation; the
    readback joins 20×4 rows. At 100 TB the sketch build is the only
    corpus-scale pass and it partial-aggregates map-side."""
    from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE

    d = table(prep(spark), sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("token")
    ).filter(F.length("token") > 0)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    # true top-20 via orderBy().limit() (TakeOrderedAndProject: per-
    # partition heaps, no unpartitioned window over the token
    # vocabulary); rk is re-derived AFTER the cut, so its window runs
    # over a 20-row bounded relation
    wtop = Window.orderBy(F.desc("true_n"), F.asc("token"))
    top = (
        exact.orderBy(F.desc("true_n"), F.asc("token"))
        .limit(CMS_TOPK)
        .withColumn("rk", F.row_number().over(wtop))
        .select("token", "true_n", "rk")
    )
    rows = toks.select(
        "token", F.explode(F.sequence(F.lit(0), F.lit(CMS_ROWS - 1))).alias("r")
    )
    d1 = F.expr(
        "instr('0123456789abcdef', substring(md5(concat('cms', r, '|', token)), 1, 1)) - 1"
    )
    d2 = F.expr(
        "instr('0123456789abcdef', substring(md5(concat('cms', r, '|', token)), 2, 1)) - 1"
    )
    cms = (
        rows.select("r", ((F.lit(16) * d1 + d2) % CMS_WIDTH).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    probe = top.select(
        "token",
        "true_n",
        "rk",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_ROWS - 1))).alias("r"),
    ).select(
        "token",
        "true_n",
        "rk",
        "r",
        ((F.lit(16) * d1 + d2) % CMS_WIDTH).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("token", "true_n", "rk")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select(
        "token",
        "true_n",
        "cms_est",
        (F.col("cms_est") >= F.col("true_n")).alias("is_overestimate"),
    ).orderBy(F.asc("rk"))


SQL_COUNTMIN = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                x -> length(x) > 0)) AS token
  FROM documents
), exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_n FROM toks GROUP BY token
), top AS (
  SELECT token, true_n, rk FROM (
    SELECT token, true_n,
           row_number() OVER (ORDER BY true_n DESC, token ASC) AS rk
    FROM exact) WHERE rk <= 20
), amp AS (
  SELECT token, r FROM toks CROSS JOIN range(4) t(r)
), cms AS (
  SELECT r,
         (16 * (strpos('0123456789abcdef',
                       substr(md5('cms' || r || '|' || token), 1, 1)) - 1)
          + (strpos('0123456789abcdef',
                    substr(md5('cms' || r || '|' || token), 2, 1)) - 1)) % 256
           AS bucket,
         CAST(count(*) AS BIGINT) AS cell
  FROM amp GROUP BY 1, 2
), probe AS (
  SELECT t.token, t.true_n, t.rk, r.r,
         (16 * (strpos('0123456789abcdef',
                       substr(md5('cms' || r.r || '|' || t.token), 1, 1)) - 1)
          + (strpos('0123456789abcdef',
                    substr(md5('cms' || r.r || '|' || t.token), 2, 1)) - 1)) % 256
           AS bucket
  FROM top t CROSS JOIN range(4) r(r)
)
SELECT p.token, p.true_n, min(c.cell) AS cms_est,
       min(c.cell) >= p.true_n AS is_overestimate
FROM probe p JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
GROUP BY p.token, p.true_n, p.rk
ORDER BY p.rk ASC
"""


HLL_P = 8  # 256 buckets; standard error ~1.04/sqrt(256) = 6.5%


def stats_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog implemented PORTABLY in column math with an exact
    oracle — upgrading the sketch class from rows-only
    (approx_count_distinct, whose JVM-internal xxhash the oracle cannot
    replay) to value-checked: bucket = first 2 md5 hex digits (p=8),
    rho = leading-zero count of the next 48 bits + 1 (via 49 −
    length(bin(v)), the zero word pinning rho = 49), registers = per-
    bucket MAX(rho) (distributive — partial-aggregates map-side like
    any max), raw estimate = α·m²/Σ2^(−M_j) with empty buckets
    contributing 2^0, then the standard linear-counting small-range
    correction (raw ≤ 2.5m with empty buckets → m·ln(m/empties)) —
    applied identically on both engines. Emits the estimate next to the exact
    distinct count and the relative error; the 6.5%-σ bound is pinned
    in tests."""
    from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE

    from python_multiproc_bigdata_spark.operators.sketches import (
        hll_corrected_estimate,
        hll_registers,
    )

    d = table(prep(spark), sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.lower("text"), WHITESPACE_RE)).alias("token"))
        .filter(F.length("token") > 0)
        .select("token")
        .distinct()  # HLL state depends only on the distinct hash set
    )
    regs = hll_registers(toks, [], "token")
    filled = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    exact = toks.agg(F.count(F.lit(1)).alias("exact_distinct"))
    corrected = hll_corrected_estimate()
    return (
        filled.crossJoin(exact)
        .select(
            "exact_distinct",
            F.round(corrected, 1).alias("hll_estimate"),
        )
        .select(
            "exact_distinct",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_error"),
        )
    )


SQL_HLL_PORTABLE = rf"""
WITH toks AS (
  SELECT DISTINCT unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
           x -> length(x) > 0)) AS token
  FROM documents
), hashed AS (
  SELECT token,
         CAST((strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1)
              AS INTEGER) AS bucket,
         CAST({" + ".join(
             f"(strpos('0123456789abcdef', substr(md5(token), {i + 1}, 1)) - 1)"
             f" * {16 ** (13 - i)}"
             for i in range(2, 14)
         )} AS BIGINT) AS v
  FROM toks
), regs AS (
  SELECT bucket,
         max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS m
  FROM hashed GROUP BY bucket
), agg AS (
  SELECT sum(power(2.0, -m)) AS s, count(*) AS nb FROM regs
), ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM toks
)
SELECT exact_distinct,
       round(est, 1) AS hll_estimate,
       round(abs(round(est, 1) - exact_distinct) / exact_distinct, 4)
         AS rel_error
FROM (
  SELECT exact_distinct,
         CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE raw END AS est
  FROM (
    SELECT exact_distinct, nb,
           CAST({0.7213 / (1.0 + 1.079 / 256)!r} AS DOUBLE) * 256 * 256
             / (s + (256 - nb) * 1.0) AS raw
    FROM agg CROSS JOIN ex))
"""


def events_hll_sliding_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users via MERGEABLE portable-HLL registers
    — the sketch-over-time-windows composition that makes trailing
    distinct counts affordable at 100 TB: per day, build the p=8 HLL
    register relation ONCE (bucket = 2 md5 hex digits of the user key,
    rho = leading-zero count, per-(day, bucket) MAX — the same portable
    sketch as stats_hll_portable); each day's trailing-window estimate
    then merges the last 7 days' registers by cell-wise MAX — never
    re-scanning events per window, the whole point of a mergeable
    sketch (recounting distinct users per sliding window rescans the
    corpus |window| times; merging register relations touches
    |days| x 256 rows). Emits the exact trailing distinct next to the
    estimate and the relative error, so the sketch's accuracy is a
    value-checked column per window (exact side is the eval — a 100 TB
    deployment drops it)."""
    from python_multiproc_bigdata_spark.operators.sketches import (
        hll_corrected_estimate,
        hll_registers,
    )

    e = table(prep(spark), sf_dir, "events")
    du = (
        e.select(
            F.to_date("ts").alias("day"),
            F.col("user_id").cast("string").alias("u"),
        )
        .distinct()
    )
    regs = hll_registers(du, ["day"], "u")
    days = regs.select("day").distinct()
    win = (
        days.select(F.col("day").alias("wday"))
        .join(
            regs,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday", "bucket")
        .agg(F.max("m").alias("m"))
    )
    agg = win.groupBy("wday").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    exact = (
        days.select(F.col("day").alias("wday"))
        .join(
            du,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday")
        .agg(F.count_distinct("u").cast("long").alias("exact_users"))
    )
    est = hll_corrected_estimate()
    return (
        agg.join(exact, "wday")
        .select(
            F.col("wday").alias("day"),
            "exact_users",
            F.round(est, 1).alias("hll_estimate"),
            F.round(
                F.abs(F.round(est, 1) - F.col("exact_users")) / F.col("exact_users"), 4
            ).alias("rel_error"),
        )
        .orderBy("day")
    )


SQL_HLL_SLIDING = rf"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, CAST(user_id AS VARCHAR) AS u
  FROM events
), hashed AS (
  SELECT day,
         CAST((strpos('0123456789abcdef', substr(md5(u), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(u), 2, 1)) - 1)
              AS INTEGER) AS bucket,
         CAST({" + ".join(
             f"(strpos('0123456789abcdef', substr(md5(u), {i + 1}, 1)) - 1)"
             f" * {16 ** (13 - i)}"
             for i in range(2, 14)
         )} AS BIGINT) AS v
  FROM du
), regs AS (
  SELECT day, bucket,
         max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS m
  FROM hashed GROUP BY day, bucket
), days AS (SELECT DISTINCT day FROM regs),
win AS (
  SELECT d.day AS wday, r.bucket, max(r.m) AS m
  FROM days d JOIN regs r ON r.day <= d.day AND r.day >= d.day - 6
  GROUP BY 1, 2
), agg AS (
  SELECT wday, sum(power(2.0, -m)) AS s, count(*) AS nb FROM win GROUP BY wday
), ex AS (
  SELECT d.day AS wday, CAST(count(DISTINCT u2.u) AS BIGINT) AS exact_users
  FROM days d JOIN du u2 ON u2.day <= d.day AND u2.day >= d.day - 6
  GROUP BY 1
)
SELECT wday AS day, exact_users,
       round(est, 1) AS hll_estimate,
       round(abs(round(est, 1) - exact_users) / exact_users, 4) AS rel_error
FROM (
  SELECT a.wday, e.exact_users,
         CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
              THEN 256.0 * ln(256.0 / (256 - nb))
              ELSE raw END AS est
  FROM (
    SELECT wday, nb,
           CAST({0.7213 / (1.0 + 1.079 / 256)!r} AS DOUBLE) * 256 * 256
             / (s + (256 - nb) * 1.0) AS raw
    FROM agg) a JOIN ex e ON a.wday = e.wday)
ORDER BY day
"""


def stats_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy diagnostics — the health panel run before
    trusting an embedding column for dedup/ANN: corpus size, dimension,
    mean vector norm, and the EXACT average pairwise cosine of the
    unit-normalized vectors via the moment identity

        avg_{a≠b} cos(a,b) = (‖Σ v̂‖² − n) / (n(n−1))

    — one pass + a 64-row rollup instead of O(n²) pairs (a near-1 value
    means collapsed/anisotropic embeddings; near-0 means spread).

    Scale: the per-dim sums are an algebraic groupBy on dim index
    (map-side combine reduces each partition to `dim` rows before the
    shuffle); everything after is O(dim). No pair joins anywhere."""
    e = table(prep(spark), sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    ).withColumn(
        "nrm", F.sqrt(F.aggregate("e", F.lit(0.0), lambda a, v: a + v * v))
    )
    unit = e.select(F.posexplode("e").alias("i", "v"), "nrm").select(
        "i",
        F.when(F.col("nrm") > 0, F.col("v") / F.col("nrm")).otherwise(F.lit(0.0)).alias("v"),
    )
    dims = unit.groupBy("i").agg(F.sum("v").alias("s"))
    tot = dims.agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    base = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("e")).cast("long").alias("dim"),
        F.avg("nrm").alias("mnrm"),
    )
    return base.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_vecs"),
        "dim",
        F.round("mnrm", 4).alias("mean_norm"),
        F.round(
            (F.col("s2") - F.col("n")) / (F.col("n") * (F.col("n") - F.lit(1.0))), 6
        ).alias("avg_pairwise_cos"),
    )


SQL_EMBEDDING_ISOTROPY = """
WITH emb AS (
  SELECT embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
), idx AS (
  SELECT e, nrm, unnest(range(len(e))) AS i FROM emb
), unit AS (
  SELECT i, CASE WHEN nrm > 0 THEN e[CAST(i + 1 AS INTEGER)] / nrm ELSE 0.0 END AS v
  FROM idx
), dims AS (
  SELECT i, sum(v) AS s FROM unit GROUP BY i
), tot AS (
  SELECT sum(s * s) AS s2 FROM dims
), base AS (
  SELECT count(*) AS n, CAST(max(len(e)) AS BIGINT) AS dim, avg(nrm) AS mnrm
  FROM emb
)
SELECT CAST(n AS BIGINT) AS n_vecs, dim,
       round(mnrm, 4) AS mean_norm,
       round((t.s2 - n) / (n * (n - 1.0)), 6) AS avg_pairwise_cos
FROM base CROSS JOIN tot t
"""


# Poisson(1) inverse-CDF cutoffs as EXACT INTEGERS on the 48-bit md5
# uniform (c_k = ceil(CDF_k * 16^12)): weight = #{k: u_int >= c_k}.
# Pure integer compares — no float randomness ever exists, so both
# engines agree bit-for-bit with no rounding convention at all.
_POIS_CUTS = (
    103548857136061,
    207097714272122,
    258872142840153,
    276130285696163,
    280444821410165,
    281307728552966,
)
_N_BOOT = 64


def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the mean order
    price per order priority — THE resampling scheme for uncertainty at
    100 TB scale (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams", Google 2012): instead of materializing B resampled
    datasets, each row independently draws a Poisson(1) multiplicity
    per replicate, so the whole bootstrap is ONE pass with map-side
    partial aggregation; the shuffle carries |groups| × B partial sums,
    never data.

    Determinism/parity: the replicate weight comes from the first 12
    md5 hex digits of (orderkey, ':', b) compared against precomputed
    INTEGER inverse-CDF cutoffs (see _POIS_CUTS) — no float randomness
    exists on either engine. Weighted sums run in exact integer cents
    (o_totalprice is 2-decimal by construction), so every per-replicate
    mean is one identical double division. The CI is order-statistics
    based: replicate means ranked (mean ASC, b ASC), rank 2 of 64 is
    the 2.5% bound, rank 63 the 97.5% (Efron percentile method at
    B=64). A group whose resample weight-sum hits 0 would divide by
    zero — probability e^-n, impossible beyond toy groups.

    Reference scope: beyond-reference statistics capability (the
    reference has no uncertainty estimation); the per-key partial-sum
    shape is the same as its ReduceItemTransformer counting."""
    o = table(prep(spark), sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # byte-light/CPU-heavy stage pin (SCALE.md): the 64× replicate
    # explode + per-replicate md5 run in the SCAN's partitioning — a
    # single parquet file would serialize ~10M hash evaluations into a
    # few tasks (measured 20.2 s -> 2.5 s at sf0.1 with the pin)
    o = o.repartition(spark.sparkContext.defaultParallelism)
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    b = F.explode(F.sequence(F.lit(0), F.lit(_N_BOOT - 1))).alias("b")
    rows = o.select("o_orderpriority", cents.alias("cents"), "o_orderkey", b)
    digits = [
        (
            F.expr(
                "CAST(instr('0123456789abcdef', substring("
                f"md5(concat(CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))), {i + 1}, 1)) - 1 AS BIGINT)"
            )
            * F.lit(16 ** (11 - i)).cast("long")
        )
        for i in range(12)
    ]
    u_int = digits[0]
    for t in digits[1:]:
        u_int = u_int + t
    rows = rows.select("o_orderpriority", "cents", "b", u_int.alias("u_int"))
    w = None
    for c in _POIS_CUTS:
        term = (F.col("u_int") >= F.lit(c)).cast("bigint")
        w = term if w is None else w + term
    rep = (
        rows.select("o_orderpriority", "cents", "b", w.alias("w"))
        .groupBy("o_orderpriority", "b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).alias("sum_cents"),
        )
        .select(
            "o_orderpriority",
            "b",
            F.round(
                F.col("sum_cents").cast("double")
                / (F.col("n_eff").cast("double") * F.lit(100.0)),
                4,
            ).alias("mean_b"),
        )
    )
    rk = Window.partitionBy("o_orderpriority").orderBy(F.asc("mean_b"), F.asc("b"))
    ranked = rep.withColumn("rk", F.row_number().over(rk))
    ci = ranked.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rk") == 2, F.col("mean_b"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == _N_BOOT - 1, F.col("mean_b"))).alias("ci_hi"),
    )
    point = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(cents).cast("double") / (F.count(F.lit(1)).cast("double") * F.lit(100.0)),
            4,
        ).alias("mean_price"),
    )
    return point.join(ci, "o_orderpriority").select(
        "o_orderpriority", "n_orders", "mean_price", "ci_lo", "ci_hi"
    )


def _bootstrap_sql() -> str:
    digit_terms = " + ".join(
        "(CAST(strpos('0123456789abcdef', substr("
        f"md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (11 - i)})"
        for i in range(12)
    )
    w_terms = " + ".join(
        f"CAST(u_int >= {c} AS BIGINT)" for c in _POIS_CUTS
    )
    return f"""
WITH reps AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
         o_orderkey, b
  FROM orders, (SELECT unnest(range(0, {_N_BOOT})) AS b)
), uints AS (
  SELECT o_orderpriority, cents, b, ({digit_terms}) AS u_int FROM reps
), weighted AS (
  SELECT o_orderpriority, cents, b, ({w_terms}) AS w FROM uints
), rep_means AS (
  SELECT o_orderpriority, b,
         round(CAST(sum(w * cents) AS DOUBLE)
               / (CAST(sum(w) AS DOUBLE) * 100.0), 4) AS mean_b
  FROM weighted GROUP BY 1, 2
), ranked AS (
  SELECT o_orderpriority, b, mean_b,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY mean_b ASC, b ASC) AS rk
  FROM rep_means
), ci AS (
  SELECT o_orderpriority,
         max(CASE WHEN rk = 2 THEN mean_b END) AS ci_lo,
         max(CASE WHEN rk = {_N_BOOT - 1} THEN mean_b END) AS ci_hi
  FROM ranked GROUP BY 1
), point AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
         round(CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 100.0), 4) AS mean_price
  FROM orders GROUP BY 1
)
SELECT p.o_orderpriority, p.n_orders, p.mean_price, c.ci_lo, c.ci_hi
FROM point p JOIN ci c USING (o_orderpriority)
"""


SQL_BOOTSTRAP_CI = _bootstrap_sql()


def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing rollup: per customer, days since last order
    (relative to the corpus max order date), order count, and lifetime
    spend; each scored into quintiles (5 = best) and rolled up per
    (r, f, m) cell with customer count and average spend.

    Determinism/parity: every NTILE runs over a TOTAL order (metric,
    custkey) so bucket boundaries cannot flake across engines; spend is
    summed in exact integer cents and divided once at export. All three
    quintiles order ASC worst-first (stalest / fewest / cheapest get
    ntile 1), so score 5 = best on every axis.

    Scale note (100 TB): the customer relation after the per-custkey
    partial agg is |customers|-sized; the global NTILEs here are
    single-task sorts over it — at real scale you broadcast
    sample-derived quintile cutoffs instead (exactly the
    curation_ccnet_tiers pattern) and score map-side; the aggregation
    shape is unchanged."""
    o = table(prep(spark), sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("cents"),
    )
    w_r = Window.orderBy(F.asc("last_date"), F.asc("custkey"))
    w_f = Window.orderBy(F.asc("n_orders"), F.asc("custkey"))
    w_m = Window.orderBy(F.asc("cents"), F.asc("custkey"))
    scored = per_cust.select(
        "custkey",
        "cents",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("cents").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100.0)),
            4,
        ).alias("avg_spend"),
    )


SQL_RFM = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(CAST(o_orderdate AS DATE)) AS last_date,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT custkey, cents,
         ntile(5) OVER (ORDER BY last_date ASC, custkey ASC) AS r_score,
         ntile(5) OVER (ORDER BY n_orders ASC, custkey ASC) AS f_score,
         ntile(5) OVER (ORDER BY cents ASC, custkey ASC) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_spend
FROM scored GROUP BY 1, 2, 3
"""


def events_rfm_segmentation_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_rfm_segmentation's 100 TB form — the one its own
    docstring prescribes: quintile CUTOFFS derived from a bounded
    deterministic sample and broadcast, scoring map-side, so NO global
    NTILE sort over the full |customers| relation ever runs (the
    dq_panel / dq_panel_approx pairing applied to segmentation; the
    exact-NTILE sibling stays registered as the oracle anchor).

    Sample = customers whose md5(custkey) hex starts with '0' (a
    deterministic ~1/16 slice, engine-portable like every md5 sample in
    this repo). Each metric's 4 cutoffs are the (value, custkey) tuples
    at rank ceil(q·n/5) of the ASC-sorted sample — TUPLES, not bare
    values, so the total (metric, custkey) order the exact NTILE uses
    is preserved and scoring is tie-free on both engines. Scores are
    1 + #{cutoffs strictly below the customer's tuple}; duplicate
    cutoff positions (tiny n) count once per q on both sides.

    Scale shape: the full relation is touched by ONE partial-agg
    groupBy; the only sorts are windows over the md5-filtered sample
    (|customers|/16 — and a 100 TB deployment tightens the prefix to 2+
    hex chars for 1/256 etc.); cutoff collection is ≤12 rows to the
    driver, embedded as literal score predicates — the scored scan is
    Window-free and exchange-free (pinned in test_scale_plans.py).
    Dates are compared as integer days-since-epoch (identical on both
    engines); spend stays exact integer cents."""
    o = table(prep(spark), sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("cents"),
    )
    vals = per_cust.select(
        "custkey",
        "cents",
        F.datediff(F.col("last_date"), F.to_date(F.lit("1970-01-01")))
        .cast("bigint")
        .alias("r_val"),
        F.col("n_orders").cast("bigint").alias("f_val"),
        F.col("cents").alias("m_val"),
    )
    samp = vals.filter(
        F.substring(F.md5(F.col("custkey").cast("string")), 1, 1) == "0"
    )
    melt = samp.select(
        "custkey",
        F.expr("stack(3, 'r', r_val, 'f', f_val, 'm', m_val) AS (metric, value)"),
    )
    w = Window.partitionBy("metric").orderBy(F.asc("value"), F.asc("custkey"))
    ranked = melt.select(
        "metric",
        "value",
        "custkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("metric")).alias("n"),
    )
    cut_rows = (
        ranked.withColumn("q", F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])))
        .filter(F.expr("rn = (q * n + 4) div 5"))
        .select("metric", "q", "value", "custkey")
        .collect()  # bounded: ≤ 3 metrics × 4 quantiles
    )
    cuts: dict[str, list[tuple[int, int]]] = {"r": [], "f": [], "m": []}
    for r in cut_rows:
        cuts[r.metric].append((int(r.value), int(r.custkey)))

    def score(val_col: str, metric: str):
        e = F.lit(1)
        for v, ck in cuts[metric]:
            e = e + (
                (F.col(val_col) > F.lit(v))
                | ((F.col(val_col) == F.lit(v)) & (F.col("custkey") > F.lit(ck)))
            ).cast("int")
        return e.cast("int")

    scored = vals.select(
        "custkey",
        "cents",
        score("r_val", "r").alias("r_score"),
        score("f_val", "f").alias("f_score"),
        score("m_val", "m").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("cents").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100.0)),
            4,
        ).alias("avg_spend"),
    )


def _rfm_sampled_score_sql(metric: str, val: str) -> str:
    return f"""1 + (SELECT count(*) FROM cuts c WHERE c.metric = '{metric}'
         AND (v.{val} > c.value OR (v.{val} = c.value AND v.custkey > c.custkey)))"""


SQL_RFM_SAMPLED = f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(CAST(o_orderdate AS DATE)) AS last_date,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), vals AS (
  SELECT custkey, cents,
         CAST(last_date - DATE '1970-01-01' AS BIGINT) AS r_val,
         CAST(n_orders AS BIGINT) AS f_val,
         CAST(cents AS BIGINT) AS m_val
  FROM per_cust
), samp AS (
  SELECT * FROM vals WHERE substr(md5(CAST(custkey AS VARCHAR)), 1, 1) = '0'
), melt AS (
  SELECT 'r' AS metric, r_val AS value, custkey FROM samp
  UNION ALL SELECT 'f', f_val, custkey FROM samp
  UNION ALL SELECT 'm', m_val, custkey FROM samp
), ranked AS (
  SELECT metric, value, custkey,
         row_number() OVER (PARTITION BY metric ORDER BY value, custkey) AS rn,
         count(*) OVER (PARTITION BY metric) AS n
  FROM melt
), cuts AS (
  SELECT metric, q, value, custkey
  FROM ranked, (SELECT unnest(range(1, 5)) AS q) qs
  WHERE rn = (q * n + 4) // 5
), scored AS (
  SELECT v.custkey, v.cents,
    CAST({_rfm_sampled_score_sql("r", "r_val")} AS INTEGER) AS r_score,
    CAST({_rfm_sampled_score_sql("f", "f_val")} AS INTEGER) AS f_score,
    CAST({_rfm_sampled_score_sql("m", "m_val")} AS INTEGER) AS m_score
  FROM vals v
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_spend
FROM scored GROUP BY 1, 2, 3
"""


def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration panel over customer lifetime spend: the
    Gini coefficient plus the top-1% / top-10% revenue shares — the
    inequality metrics a marketplace-health or data-source-diversity
    report leads with (for corpora: how concentrated is the token mass
    across sources).

    Exactness: spend is integer cents; the rank-weighted Gini sums
    Σ i·xᵢ run in DECIMAL(38,0) on Spark and HUGEINT on DuckDB (a
    BIGINT Σ i·xᵢ overflows once n·x̄·n/2 passes 9.2e18 — at ~1e7
    customers of ~$1e4), so numerator and denominator are EXACT
    integers and each exported ratio is one identical double division
    (IEEE int→double conversion is deterministic on both engines).
    Gini = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over cents ranked ASC
    with custkey tiebreak. Top-k% cutoffs use k = ceil(n·pct) worst-case
    integer arithmetic ((n + 99) // 100), never float thresholds.

    Scale note: the global rank runs through with_global_index
    (operators/transforms.py — bucketed parallel sort + broadcast
    offsets, NO single-partition window), ordered (cents, custkey) with
    quantile cuts on cents; the sums are partial-aggregated either
    way."""
    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    o = table(prep(spark), sf_dir, "orders").select("o_custkey", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents).alias("cents")
    )
    ranked = with_global_index(
        per_cust, ["cents", "custkey"], out_col="i0"
    ).select("cents", (F.col("i0") + 1).alias("i"))
    dec = "decimal(38,0)"
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s0"),
        F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec)).alias("s1"),
    )
    # top-k% shares: rank DESC cutoffs k = ceil(n/100), ceil(n/10)
    topk = ranked.crossJoin(F.broadcast(sums.select("n"))).select(
        "cents",
        (F.col("i") > F.col("n") - ((F.col("n") + 99) / 100).cast("long")).alias(
            "in_top1"
        ),
        (F.col("i") > F.col("n") - ((F.col("n") + 9) / 10).cast("long")).alias(
            "in_top10"
        ),
    )
    shares = topk.agg(
        F.sum(F.when(F.col("in_top1"), F.col("cents")).otherwise(F.lit(0))).alias(
            "c1"
        ),
        F.sum(F.when(F.col("in_top10"), F.col("cents")).otherwise(F.lit(0))).alias(
            "c10"
        ),
    )
    two = F.lit(2).cast(dec)
    return sums.crossJoin(shares).select(
        F.col("n").alias("n_customers"),
        F.round(
            (two * F.col("s1") - (F.col("n") + 1).cast(dec) * F.col("s0"))
            .cast("double")
            / (F.col("n").cast(dec) * F.col("s0")).cast("double"),
            6,
        ).alias("gini"),
        F.round(F.col("c1").cast("double") / F.col("s0").cast("double"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("c10").cast("double") / F.col("s0").cast("double"), 6).alias(
            "top10_share"
        ),
    )


SQL_GINI = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, custkey ASC) AS i
  FROM per_cust
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(cents AS HUGEINT)) AS s0,
         sum(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS s1
  FROM ranked
), shares AS (
  SELECT
    sum(CASE WHEN i > n - (n + 99) // 100 THEN cents ELSE 0 END) AS c1,
    sum(CASE WHEN i > n - (n + 9) // 10 THEN cents ELSE 0 END) AS c10
  FROM ranked CROSS JOIN sums
)
SELECT n AS n_customers,
       round(CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * s0 AS DOUBLE), 6) AS gini,
       round(CAST(c1 AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS top1_share,
       round(CAST(c10 AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS top10_share
FROM sums CROSS JOIN shares
"""


import math as _math

# Benford P(d) = log10(1 + 1/d) as shared repr literals
_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def stats_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic audit of order totals: the distribution of
    first significant digits vs log10(1+1/d) — the data-quality /
    fraud screen auditors run on financial columns (fabricated numbers
    rarely follow Benford). One map-side digit extraction + one 9-row
    groupBy; the first digit comes from the CENTS INTEGER's decimal
    string (×100 shifts the decimal point, never the leading digit), so
    no float log10 whose libm rounding could misbin at powers of ten.
    Expected probabilities are shared repr() literals; obs_share and
    diff are each one double division."""
    o = table(prep(spark), sf_dir, "orders").select("o_totalprice")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    digits = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    total = digits.agg(F.count(F.lit(1)).alias("n_total"))
    p_expr = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)" for d in range(1, 10)
    ) + " END"
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n_total").cast("double"), 6).alias(
            "obs_share"
        ),
        F.round(F.expr(p_expr), 6).alias("benford_p"),
        F.round(
            F.col("n_obs").cast("double") / F.col("n_total").cast("double")
            - F.expr(p_expr),
            6,
        ).alias("diff"),
    )


def _benford_sql() -> str:
    p_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)" for d in range(1, 10)
    ) + " END"
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY 1
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM digits)
SELECT digit, n_obs,
       round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
       round({p_case}, 6) AS benford_p,
       round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) - {p_case}, 6) AS diff
FROM counts CROSS JOIN tot
"""


SQL_BENFORD = _benford_sql()


def events_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves per acquisition cohort: customers
    cohorted by first-order month, revenue accumulated by cohort age in
    months — the monetary sibling of events_retention_cohorts (which
    counts activity; this sums value). Per (cohort_month, age_month):
    cohort size, that month's revenue, and the running cumulative
    average LTV per cohort member.

    Exactness: months are (year·12 + month) integers (no date-diff
    float), revenue is integer cents, the cumulative sum is a window
    over the tiny (cohorts × ages) relation, and avg_cum_ltv is ONE
    double division at export. Scale: one per-customer min groupBy +
    one broadcast join back + one (cohort, age) partial agg — the
    events-scale passes all shuffle on custkey or collapse map-side."""
    o = table(prep(spark), sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mon = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mon")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    om = o.select(F.col("o_custkey").alias("custkey"), mon, cents.alias("cents"))
    first = om.groupBy("custkey").agg(F.min("mon").alias("cohort_mon"))
    sizes = first.groupBy("cohort_mon").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    aged = om.join(F.broadcast(first), "custkey").select(
        "cohort_mon", (F.col("mon") - F.col("cohort_mon")).alias("age_month"), "cents"
    )
    per_cell = aged.groupBy("cohort_mon", "age_month").agg(
        F.sum("cents").alias("rev_cents")
    )
    # avg_cum_ltv in exact integer 1e-4 dollars (floor division): the
    # double-divide-then-round(4) form measured a 1-ulp round-boundary
    # flake on 2 of 1845 cells — integer floor-div is boundary-free
    return (
        per_cell.join(F.broadcast(sizes), "cohort_mon")
        .select(
            "cohort_mon",
            "age_month",
            "n_customers",
            F.round(F.col("rev_cents") / F.lit(100.0), 2).alias("revenue"),
            (
                F.expr(
                    "(sum(rev_cents) OVER (PARTITION BY cohort_mon ORDER BY age_month"
                    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100)"
                    " div n_customers"
                )
                / F.lit(10000.0)
            ).alias("avg_cum_ltv"),
        )
    )


SQL_LTV_COHORTS = """
WITH om AS (
  SELECT o_custkey AS custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS mon,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT custkey, min(mon) AS cohort_mon FROM om GROUP BY 1
), sizes AS (
  SELECT cohort_mon, CAST(count(*) AS BIGINT) AS n_customers
  FROM first GROUP BY 1
), per_cell AS (
  SELECT f.cohort_mon, om.mon - f.cohort_mon AS age_month,
         sum(om.cents) AS rev_cents
  FROM om JOIN first f USING (custkey)
  GROUP BY 1, 2
)
SELECT p.cohort_mon, p.age_month, s.n_customers,
       round(CAST(p.rev_cents AS DOUBLE) / 100.0, 2) AS revenue,
       CAST((sum(p.rev_cents) OVER (PARTITION BY p.cohort_mon
                                    ORDER BY p.age_month
                                    ROWS UNBOUNDED PRECEDING) * 100)
            // s.n_customers AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS avg_cum_ltv
FROM per_cell p JOIN sizes s USING (cohort_mon)
"""


def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the URGENT and LOW
    order-price distributions — the nonparametric "did the distribution
    change?" companion to the mean-level Welch t (stats_ab_ttest): the
    statistic D = sup|ECDF_a − ECDF_b| sees shape/tail shifts a t-test
    misses.

    Exactness: ECDFs are evaluated at DISTINCT values (the only points
    where either step function jumps — correct under ties), cumulative
    counts come from one window, and D is the max of the integer
    |i·m − j·n| (multiply-through — no per-point division); the two
    exported doubles (d_stat, the asymptotic λ = D·√(nm/(n+m))) are
    single identical expressions. Scale: one (value, group) partial
    agg + one window over |distinct prices| rows."""
    o = table(prep(spark), sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    ab = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
        cents.alias("v"),
    )
    per_v = ab.groupBy("v").agg(
        F.sum("is_a").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("ca").over(w).alias("i"),
        F.sum("cb").over(w).alias("j"),
    )
    tot = ab.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).alias("n_b"),
    )
    dmax = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.abs(F.col("i") * F.col("n_b") - F.col("j") * F.col("n_a")).alias(
                "dscaled"
            ),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("dscaled").alias("dmax"))
    )
    nm = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    d = F.col("dmax").cast("double") / nm
    return dmax.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("d_stat"),
        F.round(
            d
            * F.sqrt(
                nm / (F.col("n_a").cast("double") + F.col("n_b").cast("double"))
            ),
            6,
        ).alias("ks_lambda"),
    )


SQL_KS_TWO_SAMPLE = """
WITH ab AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), per_v AS (
  SELECT v, sum(is_a) AS ca, sum(1 - is_a) AS cb FROM ab GROUP BY v
), cum AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS i,
         sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS j
  FROM per_v
), tot AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
         CAST(sum(1 - is_a) AS BIGINT) AS n_b
  FROM ab
), dm AS (
  SELECT n_a, n_b, max(abs(i * n_b - j * n_a)) AS dmax
  FROM cum CROSS JOIN tot GROUP BY n_a, n_b
)
SELECT n_a, n_b,
       round(CAST(dmax AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d_stat,
       round(CAST(dmax AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))), 6)
         AS ks_lambda
FROM dm
"""


def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test between the URGENT and LOW price
    distributions — the median-shift sibling of the KS sup-gap above
    (KS sees any shape change; U asks specifically "does one group
    stochastically dominate?").

    Exactness: tied values get AVERAGE ranks, which are half-integers —
    so the rank sum is carried as 2·R (Σ ca·(2·before + t + 1), exact
    BIGINT from one cumulative window over distinct values), U derives
    as an exact half-integer, and the tie-corrected normal z =
    (U − n₁n₂/2) / √(n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1)))) is one
    double expression over integer aggregates (tie term Σ(t³−t) exact).
    Scale: same shapes as the KS query — one (value, group) partial agg
    + one window over distinct values."""
    o = table(prep(spark), sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    ab = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
        cents.alias("v"),
    )
    per_v = ab.groupBy("v").agg(
        F.sum("is_a").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    staged = per_v.select(
        "ca",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)).alias("before"),
    )
    sums = staged.agg(
        F.sum(F.col("ca") * (2 * F.col("before") + F.col("t") + 1)).alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
        F.sum("ca").alias("n_a"),
        F.sum(F.col("t") - F.col("ca")).alias("n_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nn = na + nb
    # U1 = n_a·n_b + n_a(n_a+1)/2 − R_a, with R_a = r2a/2 (exact halves)
    u1 = na * nb + na * (na + 1) / F.lit(2.0) - F.col("r2a").cast("double") / F.lit(2.0)
    sigma2 = (
        na * nb / F.lit(12.0)
        * ((nn + 1) - F.col("ties").cast("double") / (nn * (nn - 1)))
    )
    return sums.select(
        "n_a",
        "n_b",
        F.round(u1, 2).alias("u_stat"),
        F.round((u1 - na * nb / F.lit(2.0)) / F.sqrt(sigma2), 6).alias("z"),
    )


SQL_MANNWHITNEY = """
WITH ab AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), per_v AS (
  SELECT v, sum(is_a) AS ca, sum(1 - is_a) AS cb FROM ab GROUP BY v
), staged AS (
  SELECT ca, ca + cb AS t,
         coalesce(sum(ca + cb) OVER (ORDER BY v
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS before
  FROM per_v
), sums AS (
  SELECT CAST(sum(ca * (2 * before + t + 1)) AS BIGINT) AS r2a,
         CAST(sum(t * t * t - t) AS BIGINT) AS ties,
         CAST(sum(ca) AS BIGINT) AS n_a,
         CAST(sum(t - ca) AS BIGINT) AS n_b
  FROM staged
)
SELECT n_a, n_b,
       round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             + CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0
             - CAST(r2a AS DOUBLE) / 2.0, 2) AS u_stat,
       round((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              + CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0
              - CAST(r2a AS DOUBLE) / 2.0
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
             / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                    * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
                       - CAST(ties AS DOUBLE)
                         / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1)))),
             6) AS z
FROM sums
"""


def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and discount
    — the robust (monotonic, outlier-immune) companion to the Pearson
    moments in stats_lineitem_moments: Pearson on the tie-averaged
    RANKS instead of the raw values.

    Exactness: ranks are carried as 2·rank integers (tie-average ranks
    are half-integers — rank2(v) = 2·cum_before + t + 1, one cumulative
    window per variable over its distinct values, broadcast back); the
    Pearson sums over (2rx, 2ry) run in DECIMAL(38,0) / HUGEINT (rank
    products reach n³ — BIGINT dies near 2M rows), so ρ is exact
    integers until ONE double expression. Scale: two distinct-value
    windows (|distinct| rows each) + two broadcast joins + one
    partial-agg sum pass; at 100 TB the rank attach is a sort-merge on
    value instead of broadcast — same algebra."""
    li = table(prep(spark), sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * F.lit(100.0)).cast("bigint").alias("y"),
    )

    def rank2_map(col: str) -> DataFrame:
        per_v = li.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per_v.select(
            col,
            (
                2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1
            ).alias(f"r2_{col}"),
        )

    ranked = li.join(F.broadcast(rank2_map("x")), "x").join(
        F.broadcast(rank2_map("y")), "y"
    )
    dec = "decimal(38,0)"
    rx = F.col("r2_x").cast(dec)
    ry = F.col("r2_y").cast(dec)
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx).alias("sx"),
        F.sum(ry).alias("sy"),
        F.sum(rx * ry).alias("sxy"),
        F.sum(rx * rx).alias("sxx"),
        F.sum(ry * ry).alias("syy"),
    )
    nd = F.col("n").cast(dec)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        "n", F.round(num / F.sqrt(dx * dy), 6).alias("spearman_rho")
    )


SQL_SPEARMAN = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100.0) AS BIGINT) AS y
  FROM lineitem
), rx AS (
  SELECT x, 2 * coalesce(sum(t) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + t + 1 AS r2_x
  FROM (SELECT x, count(*) AS t FROM li GROUP BY x)
), ry AS (
  SELECT y, 2 * coalesce(sum(t) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + t + 1 AS r2_y
  FROM (SELECT y, count(*) AS t FROM li GROUP BY y)
), ranked AS (
  SELECT li.x, li.y, rx.r2_x, ry.r2_y
  FROM li JOIN rx USING (x) JOIN ry USING (y)
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(r2_x AS HUGEINT)) AS sx,
         sum(CAST(r2_y AS HUGEINT)) AS sy,
         sum(CAST(r2_x AS HUGEINT) * CAST(r2_y AS HUGEINT)) AS sxy,
         sum(CAST(r2_x AS HUGEINT) * CAST(r2_x AS HUGEINT)) AS sxx,
         sum(CAST(r2_y AS HUGEINT) * CAST(r2_y AS HUGEINT)) AS syy
  FROM ranked
)
SELECT n,
       round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)), 6)
         AS spearman_rho
FROM sums
"""


def stats_pareto_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) cutoffs: for each revenue-coverage threshold
    {50%, 80%, 90%, 99%}, the MINIMUM number of top customers whose
    combined spend reaches it — the concentration curve's named points
    (the Gini panel above summarizes the whole curve; these are the
    actionable cuts). Exactness: customers ranked by (cents DESC,
    custkey), a running cents sum, and the threshold test
    cum·100 ≥ thr·total on exact integers — the cutoff is the MIN rank
    passing it (one min-agg per threshold). Scale note: both the global
    rank AND the running revenue sum run through with_global_index's
    bucketed split (cents DESC expressed as ascending −cents; cumsum
    via within-bucket window sums + broadcast per-bucket sum offsets) —
    no single-task window anywhere in the plan."""
    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    o = table(prep(spark), sf_dir, "orders").select("o_custkey", "o_totalprice")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("bigint")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents).alias("cents")
    )
    ranked = with_global_index(
        per_cust.withColumn("neg_cents", -F.col("cents")),
        ["neg_cents", "custkey"],
        out_col="i0",
        cumsum={"cents": "cum"},
    ).select((F.col("i0") + 1).alias("rk"), "cum")
    tot = per_cust.agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n_customers")
    )
    thr = ranked.crossJoin(F.broadcast(tot)).select(
        "rk",
        "cum",
        "total",
        "n_customers",
        F.explode(F.array(*[F.lit(t) for t in (50, 80, 90, 99)])).alias("threshold_pct"),
    )
    hit = thr.filter(F.col("cum") * 100 >= F.col("threshold_pct") * F.col("total"))
    return hit.groupBy("threshold_pct", "n_customers").agg(
        F.min("rk").alias("top_customers_needed")
    ).select(
        "threshold_pct",
        "top_customers_needed",
        "n_customers",
        F.round(
            F.col("top_customers_needed").cast("double")
            / F.col("n_customers").cast("double"),
            6,
        ).alias("customer_share"),
    )


SQL_PARETO = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT row_number() OVER (ORDER BY cents DESC, custkey ASC) AS rk,
         sum(cents) OVER (ORDER BY cents DESC, custkey ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM per_cust
), tot AS (
  SELECT sum(cents) AS total, CAST(count(*) AS BIGINT) AS n_customers
  FROM per_cust
), thr AS (
  SELECT r.rk, r.cum, t.total, t.n_customers, u.threshold_pct
  FROM ranked r CROSS JOIN tot t
  CROSS JOIN (SELECT unnest([50, 80, 90, 99]) AS threshold_pct) u
)
SELECT threshold_pct,
       CAST(min(rk) AS BIGINT) AS top_customers_needed,
       n_customers,
       round(CAST(min(rk) AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
         AS customer_share
FROM thr WHERE cum * 100 >= threshold_pct * total
GROUP BY threshold_pct, n_customers
"""


def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) over documents, with the
    normalized variant (I/min(H(lang), H(source))) — the dependence
    measure feature selection and leakage audits use where chi-square
    (stats_chi_square_independence) only tests significance: MI
    QUANTIFIES how much knowing the source tells you about the
    language. One row: n, I in nats, both marginal entropies, NMI.

    Exactness: all probabilities are integer-count ratios; each cell
    contributes (c/n)·ln(c·n/(ra·cb)) written with the SAME operand
    order on both engines (ln of a ratio of exact integers — the
    bigram-LM precedent), summed and rounded at 4dp (repo posture for
    ln-bearing aggregates; the sum order differs across engines so the
    rounding absorbs ulp noise — cells are |langs|×|sources|, few
    enough that 4dp is orders above the float jitter). Scale: one
    (lang, source) partial-agg marginal; everything after is
    cells-sized algebra."""
    d = table(prep(spark), sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    ra = cells.groupBy("lang").agg(F.sum("c").alias("ra"))
    cb = cells.groupBy("source").agg(F.sum("c").alias("cb"))
    tot = cells.agg(F.sum("c").alias("n"))
    j = (
        cells.join(F.broadcast(ra), "lang")
        .join(F.broadcast(cb), "source")
        .crossJoin(F.broadcast(tot))
    )
    cd = F.col("c").cast("double")
    nd = F.col("n").cast("double")
    mi_term = (cd / nd) * F.log(
        cd * nd / (F.col("ra").cast("double") * F.col("cb").cast("double"))
    )
    hx_term = -(F.col("ra").cast("double") / nd) * F.log(
        F.col("ra").cast("double") / nd
    )
    hy_term = -(F.col("cb").cast("double") / nd) * F.log(
        F.col("cb").cast("double") / nd
    )
    mi = j.agg(F.sum(mi_term).alias("mi"))
    hx = ra.crossJoin(F.broadcast(tot)).agg(F.sum(hx_term).alias("h_lang"))
    hy = cb.crossJoin(F.broadcast(tot)).agg(F.sum(hy_term).alias("h_source"))
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.round("mi", 4).alias("mi_nats"),
            F.round("h_lang", 4).alias("h_lang"),
            F.round("h_source", 4).alias("h_source"),
            F.round(
                F.col("mi") / F.least(F.col("h_lang"), F.col("h_source")), 4
            ).alias("nmi"),
        )
    )


SQL_MUTUAL_INFO = """
WITH cells AS (
  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2
), ra AS (SELECT lang, sum(c) AS ra FROM cells GROUP BY 1),
cb AS (SELECT source, sum(c) AS cb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
mi AS (
  SELECT sum((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))) AS mi
  FROM cells JOIN ra USING (lang) JOIN cb USING (source) CROSS JOIN tot
), hx AS (
  SELECT sum(-(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))) AS h_lang
  FROM ra CROSS JOIN tot
), hy AS (
  SELECT sum(-(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))) AS h_source
  FROM cb CROSS JOIN tot
)
SELECT n, round(mi, 4) AS mi_nats, round(h_lang, 4) AS h_lang,
       round(h_source, 4) AS h_source,
       round(mi / least(h_lang, h_source), 4) AS nmi
FROM tot CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
"""


REGISTRY = {
    "stats_bootstrap_ci": QuerySpec(stats_bootstrap_ci, SQL_BOOTSTRAP_CI),
    "events_rfm_segmentation": QuerySpec(events_rfm_segmentation, SQL_RFM),
    "events_rfm_segmentation_sampled": QuerySpec(
        events_rfm_segmentation_sampled, SQL_RFM_SAMPLED
    ),
    "stats_gini_concentration": QuerySpec(stats_gini_concentration, SQL_GINI),
    "stats_ks_two_sample": QuerySpec(stats_ks_two_sample, SQL_KS_TWO_SAMPLE),
    "stats_mannwhitney_u": QuerySpec(stats_mannwhitney_u, SQL_MANNWHITNEY),
    "stats_spearman_corr": QuerySpec(stats_spearman_corr, SQL_SPEARMAN),
    "stats_pareto_cutoffs": QuerySpec(stats_pareto_cutoffs, SQL_PARETO),
    "stats_mutual_information": QuerySpec(stats_mutual_information, SQL_MUTUAL_INFO),
    "stats_benford_firstdigit": QuerySpec(stats_benford_firstdigit, SQL_BENFORD),
    "events_ltv_cohorts": QuerySpec(events_ltv_cohorts, SQL_LTV_COHORTS),
    "stats_embedding_isotropy": QuerySpec(
        stats_embedding_isotropy, SQL_EMBEDDING_ISOTROPY
    ),
    "split_stratified_eval": QuerySpec(split_stratified_eval, SQL_STRATIFIED_EVAL),
    "stats_hll_portable": QuerySpec(stats_hll_portable, SQL_HLL_PORTABLE),
    "stats_countmin_heavy_hitters": QuerySpec(
        stats_countmin_heavy_hitters, SQL_COUNTMIN
    ),
    "privacy_dp_noised_counts": QuerySpec(privacy_dp_noised_counts, SQL_DP_NOISED),
    "privacy_k_anonymity": QuerySpec(privacy_k_anonymity, SQL_K_ANONYMITY),
    "privacy_l_diversity": QuerySpec(privacy_l_diversity, SQL_L_DIVERSITY),
    "privacy_t_closeness": QuerySpec(privacy_t_closeness, SQL_T_CLOSENESS),
    "stats_quantile_sketch": QuerySpec(stats_quantile_sketch, SQL_QUANTILE_SKETCH),
    "events_hll_sliding_users": QuerySpec(events_hll_sliding_users, SQL_HLL_SLIDING),
    "split_temporal_holdout": QuerySpec(split_temporal_holdout, SQL_TEMPORAL_HOLDOUT),
    "events_velocity_gate": QuerySpec(events_velocity_gate, SQL_VELOCITY_GATE),
    "stats_lineitem_moments": QuerySpec(stats_lineitem_moments, SQL_MOMENTS),
    "stats_ab_ttest": QuerySpec(stats_ab_ttest, SQL_AB_TTEST),
    "stats_top_types_sketch": QuerySpec(stats_top_types_sketch, SQL_TOP_TYPES),
    "stats_hll_users_per_type": QuerySpec(
        stats_hll_users_per_type, SQL_HLL_USERS_PER_TYPE
    ),
    "global_index_orders": QuerySpec(global_index_orders, SQL_GLOBAL_INDEX),
    "calendar_month_order_counts": QuerySpec(
        calendar_month_order_counts, SQL_CALENDAR_MONTHS
    ),
    "stats_price_histogram": QuerySpec(stats_price_histogram, SQL_HISTOGRAM),
    "stats_argminmax_orders": QuerySpec(stats_argminmax_orders, SQL_ARGMINMAX),
    "stats_price_quartiles_ntile": QuerySpec(stats_price_quartiles_ntile, SQL_NTILE),
    "stats_price_percentiles": QuerySpec(stats_price_percentiles, SQL_PERCENTILES),
    "grouping_sets_orders": QuerySpec(grouping_sets_orders, SQL_GROUPING_SETS),
    "map_status_counts": QuerySpec(map_status_counts, SQL_MAP_COUNTS),
    "split_train_test_documents": QuerySpec(split_train_test_documents, SQL_SPLIT),
    "split_kfold_assign": QuerySpec(split_kfold_assign, SQL_KFOLD),
    "stats_psi_drift": QuerySpec(stats_psi_drift, SQL_PSI_DRIFT),
    "stats_chi_square_independence": QuerySpec(stats_chi_square_independence, SQL_CHI_SQUARE),
}
