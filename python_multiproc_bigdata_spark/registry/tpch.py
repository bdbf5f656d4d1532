"""Relational query surface over the TPC-H-ish harness tables (SURVEY §7
M3). The reference has no joins/windows/sorts (§2.7 declares them absent);
this family exercises the full relational surface the new engine gets from
Spark — joins (broadcast + shuffle), windows, set ops, rollup, pivot,
scalar subqueries — with a DuckDB oracle for each.

Double aggregates are rounded (2 for money sums, 4 for ratios) on BOTH
sides: FP summation order differs across engines at ulp scale; rounding
makes the hash comparison stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter (pushed to parquet) + 8 aggregates
    over 2 group keys. Catalyst plans partial→final HashAggregate; at
    100 TB this is one scan + one narrow shuffle of ~6 groups."""
    l = table(prep(spark), sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim filter first), grouped revenue,
    top-10. customer is small → AQE broadcasts it; lineitem↔orders is the
    one real shuffle, on the join key. Revenue rounded before the
    order/limit so the cut is engine-stable (tie-break o_orderkey)."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through region→nation→customer→orders→
    lineitem. The three dims are broadcast; only fact↔orders shuffles."""
    spark = prep(spark)
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim chain (SURVEY §2.7: joins are new
    surface): customers per region."""
    spark = prep(spark)
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


SQL_BROADCAST = """
SELECT r_name, count(*) AS customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def window_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number (the primitive that implements the
    reference's A3 inverse mode, SURVEY §2.7). Deterministic ordering:
    totalprice desc then orderkey."""
    o = table(prep(spark), sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rk")
    )


SQL_WINDOW_TOP3 = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders)
WHERE rk <= 3
"""


def count_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 COUNT(DISTINCT …) — exact; at 100 TB swap in
    approx_count_distinct, kept exact here for the oracle."""
    c = table(prep(spark), sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("nations"),
        F.count(F.lit(1)).alias("customers"),
    )


SQL_COUNT_DISTINCT = """
SELECT c_mktsegment, count(DISTINCT c_nationkey) AS nations, count(*) AS customers
FROM customer GROUP BY c_mktsegment
"""


def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in the reference, §2.7)."""
    o = table(prep(spark), sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


SQL_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, statuses as columns. Explicit value list keeps
    the plan single-pass (no distinct-values pre-scan) — at scale always
    pin pivot values."""
    o = table(prep(spark), sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


SQL_PIVOT = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set ops absent in reference, §2.7): customers who ordered,
    minus customers with any finished ('F') order."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders")
    ordered = o.select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract = EXCEPT DISTINCT, matching the SQL EXCEPT semantics.
    return ordered.subtract(finished).withColumnRenamed("o_custkey", "custkey")


SQL_EXCEPT = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open ('O') order."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


SQL_SEMI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above 1.5× the global average.
    The 1-row aggregate side is crossJoin-broadcast — no shuffle of orders."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("_avg"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


SQL_SCALAR_SUBQ = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
"""


def part_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact↔fact equi-join on two keys (lineitem↔part, lineitem↔supplier):
    revenue by part brand and supplier nation."""
    spark = prep(spark)
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
    )


SQL_PART_SUPP = """
SELECT p_brand, n_name, count(*) AS line_count,
       round(sum(l_extendedprice), 2) AS gross
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
"""


def in_subquery_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via spark.sql (Catalyst rewrites to a left-semi join):
    customers in ASIA nations."""
    spark = prep(spark)
    table(spark, sf_dir, "customer").createOrReplaceTempView("_c")
    table(spark, sf_dir, "nation").createOrReplaceTempView("_n")
    table(spark, sf_dir, "region").createOrReplaceTempView("_r")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _c
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM _n
            WHERE n_regionkey IN (SELECT r_regionkey FROM _r WHERE r_name = 'ASIA'))
        """
    )


SQL_IN_SUBQ = """
SELECT c_custkey, c_name FROM customer
WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation
    WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
"""


def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who placed both an 'O' and an 'F' order."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin).withColumnRenamed("o_custkey", "custkey")


SQL_INTERSECT = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q2_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated min subquery): parts priced at their
    brand's minimum. Window-min beats a correlated re-scan: one shuffle."""
    p = table(prep(spark), sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("_minp", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("_minp"))
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"))
    )


SQL_Q2 = """
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
FROM (SELECT p_brand, p_partkey, p_retailprice,
             min(p_retailprice) OVER (PARTITION BY p_brand) AS minp
      FROM part)
WHERE p_retailprice = minp
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose order-value total clears a
    threshold (grouped HAVING), joined back for names. The HAVING side is
    one row per big customer → broadcast."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
        .filter(F.col("total_spend") > 1_500_000)
    )
    return (
        c.join(F.broadcast(big), c.c_custkey == big.o_custkey)
        .select("c_custkey", "c_name", "total_spend")
    )


SQL_Q18 = """
SELECT c_custkey, c_name, total_spend
FROM customer
JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
      FROM orders GROUP BY o_custkey
      HAVING round(sum(o_totalprice), 2) > 1500000) ON c_custkey = o_custkey
"""


def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/ntile over customer balances per
    segment — the ranking-window family in one query. Deterministic
    ordering: acctbal desc then custkey."""
    c = table(prep(spark), sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rnk") <= 25)
    )


SQL_WINDOW_RANKS = """
SELECT c_mktsegment, c_custkey, rnk, drnk, prnk, quartile FROM (
  SELECT c_mktsegment, c_custkey,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         round(percent_rank() OVER w, 6) AS prnk,
         ntile(4) OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC))
WHERE rnk <= 25
"""


def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nations per region as a sorted
    comma-joined list (collect_list → sort_array → array_join)."""
    spark = prep(spark)
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


SQL_STRING_AGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): melt the lineitem money measures into
    (measure, total) long form."""
    l = table(prep(spark), sf_dir, "lineitem")
    melted = l.selectExpr(
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
        "'discount', l_discount) AS (measure, v)"
    )
    return melted.groupBy("measure").agg(F.round(F.sum("v"), 2).alias("total"))


SQL_UNPIVOT = """
SELECT measure, round(sum(v), 2) AS total
FROM (SELECT l_quantity AS quantity, l_extendedprice AS extendedprice,
             l_discount AS discount
      FROM lineitem)
UNPIVOT (v FOR measure IN (quantity, extendedprice, discount))
GROUP BY measure
"""


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS subquery → left-semi join): orders with at
    least one lineitem shipped after the order date, counted per
    priority. Catalyst rewrites EXISTS to a semi join — the harness
    tables lack commit/receipt dates, so shipped-after-order stands in
    for Q4's late-commit predicate (same plan shape)."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    o_alias = o.alias("o")
    return (
        o_alias.join(
            late.select("l_orderkey").distinct(),
            F.col("o.o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single selective scan, every predicate pushed to
    parquet (PushedFilters carries all four), one global agg — the
    pushdown litmus query. At 100 TB this reads only row groups whose
    min/max straddle the predicate."""
    l = table(prep(spark), sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


SQL_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, top 20.
    customer+nation broadcast; the fact↔orders join is the only real
    shuffle. Revenue rounded before the cut (tie-break c_custkey)."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-sum pivot inside an aggregate (urgent vs
    other order priority per return flag; the harness has no shipmode
    column, so returnflag is the group key — same conditional-agg
    plan). Integer CASE sums are cast BIGINT in the oracle (DuckDB
    sum(int) → HUGEINT breaks the typed value-hash)."""
    spark = prep(spark)
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a one-year slice,
    part broadcast. One scan, one broadcast join, scalar output."""
    spark = prep(spark)
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


SQL_Q14 = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate. The shared
    l_partkey = p_partkey conjunct is what Catalyst extracts as the
    equi-join key (CNF extraction); the brand/size/quantity disjunction
    stays as a post-join filter and its common p_partkey-independent
    parts push to the scans. A naive engine would nested-loop this."""
    spark = prep(spark)
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, size_hi))
        & (F.col("l_quantity").between(q_lo, q_hi))
    )
    return joined.filter(
        arm("Brand#12", 15, 1, 11) | arm("Brand#15", 25, 10, 20) | arm("Brand#18", 35, 20, 30)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


SQL_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two independent nation lookups (supplier side and
    customer side) on the same fact row, a disjunctive nation-pair
    filter, yearly revenue per directed pair. Both nation dims and the
    supplier/customer dims broadcast; the only shuffle is
    lineitem↔orders on the join key, then the narrow 3-key groupBy."""
    spark = prep(spark)
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the share of ASIA's PROMO
    part revenue supplied by NATION_5, per order year. The conditional
    numerator (CASE inside sum over the same rows) is the signature;
    ratio rounded to 4 on both engines. Customer-side region filter
    prunes through three broadcast dims before the fact shuffle."""
    spark = prep(spark)
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_c = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


SQL_Q8 = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in the harness, so
    p_retailprice * quantity stands in for ps_supplycost * quantity as
    the cost term): profit per supplier nation per year over parts whose
    name contains 'gear'. Part + supplier + nation broadcast; the
    lineitem↔orders shuffle dominates, then a 2-key groupBy."""
    spark = prep(spark)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


SQL_Q9 = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join customer→orders (keeping zero-order
    customers — the reason this can't be an inner join), count orders
    per customer, then the distribution of those counts. The priority
    exclusion stands in for the NOT LIKE comment filter. Two narrow
    groupBys; the left join shuffles on custkey once."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue "view" (supplier revenue over one
    quarter) consumed twice — once for the global max (scalar subquery →
    broadcast 1-row join), once for the equality filter. Revenue rounded
    BEFORE the max/equality so the cut is engine-stable."""
    spark = prep(spark)
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — lineitems whose
    quantity is under 20% of their part's average quantity, for one
    brand. The correlated subquery becomes a per-part aggregate joined
    back to the fact (Catalyst does the same de-correlation to the SQL
    form). The threshold is rounded to 4 on BOTH sides before the
    comparison so an ulp of float-sum divergence can't flip a row."""
    spark = prep(spark)
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    avg_q = lp.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.round(F.avg("l_quantity") * 0.2, 4).alias("q_threshold")
    )
    return (
        lp.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("q_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_Q17 = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), thresholds AS (
  SELECT l_partkey AS ap, round(avg(l_quantity) * 0.2, 4) AS q_threshold
  FROM lp GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lp JOIN thresholds ON l_partkey = ap
WHERE l_quantity < q_threshold
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp table in the harness, so
    per-part "stock value" = sum(p_retailprice * l_quantity) over lines
    shipped by suppliers of one nation stands in for
    sum(ps_supplycost * ps_availqty)): grouped value per part, kept only
    where value > fraction * total. The total is a scalar subquery over
    the SAME grouped relation — Catalyst broadcasts the 1-row side; the
    lineitem scan happens twice unless cached, but both are
    partial-aggregated shuffles on l_partkey (narrow at 100 TB: #parts
    rows, not #lines).

    Reference parity note: reference has no join/HAVING surface at all
    (SURVEY §2.7); this is new-engine surface with a DuckDB oracle.
    """
    spark = prep(spark)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    value = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("p_retailprice") * F.col("l_quantity")), 2).alias(
                "stock_value"
            )
        )
    )
    threshold = value.agg(
        F.round(F.sum("stock_value") * 0.002, 2).alias("thr")
    )
    return (
        value.join(F.broadcast(threshold), F.col("stock_value") > F.col("thr"))
        .select(F.col("l_partkey").alias("ps_partkey"), "stock_value")
    )


SQL_Q11 = """
WITH value AS (
  SELECT l_partkey, round(sum(p_retailprice * l_quantity), 2) AS stock_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part     ON l_partkey = p_partkey
  WHERE s_nationkey = 7
  GROUP BY l_partkey)
SELECT l_partkey AS ps_partkey, stock_value
FROM value
WHERE stock_value > (SELECT round(sum(stock_value) * 0.002, 2) FROM value)
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: distinct (l_partkey, l_suppkey) pairs
    from lineitem stand in for partsupp; suppliers with negative acctbal
    stand in for 'complaints' suppliers): distinct-supplier count per
    (brand, type, size) over a filtered part universe, excluding a NOT IN
    supplier set. The exclusion list is tiny → broadcast anti-join; the
    only real shuffle is the partial-aggregated distinct on part attrs."""
    spark = prep(spark)
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: 'supplier shipped > 120 units of some
    gear part in 1996' stands in for 'availqty > half of what was
    ordered'): nested IN — suppliers IN (per-(supp,part) grouped HAVING
    over a part-filtered lineitem year slice) AND from one nation. The
    inner aggregate shuffles on (l_suppkey, l_partkey) partial-first;
    the final IN is a semi-join against the small supplier dim."""
    spark = prep(spark)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


SQL_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey = 3
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%gear%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50)
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates in the harness,
    so 'late' = shipped more than 60 days after the order date): for
    multi-supplier 'F' orders, count per supplier the orders where it was
    the ONLY late supplier — EXISTS (another supplier on the order) via a
    semi-join, NOT EXISTS (another LATE supplier) via an anti-join, both
    non-equi self-joins of lineitem on l_orderkey with l_suppkey <>. The
    two self-join shuffles co-partition on l_orderkey (one exchange
    reused); supplier+nation broadcast. Top-100 by count, name tiebreak
    (s_name is unique → the LIMIT cut is deterministic)."""
    spark = prep(spark)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 2)
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(late)
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SQL_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE s_nationkey = 2
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no c_phone in the harness, so
    cntrycode = c_nationkey % 10 stands in for substring(c_phone,1,2)):
    customers from a code list with above-average balance and no RECENT
    orders (the synthetic harness gives every customer at least one
    order, so 'no orders since 1999' stands in for 'no orders' — same
    anti-join shape, non-degenerate result) — scalar subquery (avg over
    positive balances in the code list, broadcast 1-row join) +
    anti-join against orders, then a tiny groupBy per code. The
    anti-join shuffles on custkey; at 100 TB the orders side is the big
    relation and the join key is its natural distribution — no skew
    (custkey is near-unique)."""
    spark = prep(spark)
    c = table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("string")
    )
    codes = c.filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    avg_bal = codes.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        codes.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


SQL_Q22 = """
WITH coded AS (
  SELECT *, CAST(c_nationkey % 10 AS VARCHAR) AS cntrycode FROM customer),
codes AS (
  SELECT * FROM coded WHERE cntrycode IN ('1', '3', '5', '7', '9'))
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM codes
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM codes WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
"""


REGISTRY = {
    "window_rank_functions": QuerySpec(window_rank_functions, SQL_WINDOW_RANKS),
    "string_agg_nations": QuerySpec(string_agg_nations, SQL_STRING_AGG),
    "unpivot_lineitem_measures": QuerySpec(unpivot_lineitem_measures, SQL_UNPIVOT),
    "q2_cheapest_part_per_brand": QuerySpec(q2_cheapest_part_per_brand, SQL_Q2),
    "q18_large_volume_customers": QuerySpec(q18_large_volume_customers, SQL_Q18),
    "in_subquery_customers": QuerySpec(in_subquery_customers, SQL_IN_SUBQ),
    "setop_intersect_customers": QuerySpec(setop_intersect_customers, SQL_INTERSECT),
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, SQL_Q1),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, SQL_Q3),
    "q5_region_revenue": QuerySpec(q5_region_revenue, SQL_Q5),
    "broadcast_dim_join": QuerySpec(broadcast_dim_join, SQL_BROADCAST),
    "window_top3_orders": QuerySpec(window_top3_orders, SQL_WINDOW_TOP3),
    "count_distinct_segments": QuerySpec(count_distinct_segments, SQL_COUNT_DISTINCT),
    "rollup_order_priority": QuerySpec(rollup_order_priority, SQL_ROLLUP),
    "pivot_status_by_priority": QuerySpec(pivot_status_by_priority, SQL_PIVOT),
    "setop_except_customers": QuerySpec(setop_except_customers, SQL_EXCEPT),
    "anti_join_customers": QuerySpec(anti_join_customers, SQL_ANTI),
    "semi_join_customers": QuerySpec(semi_join_customers, SQL_SEMI),
    "scalar_subquery_above_avg": QuerySpec(scalar_subquery_above_avg, SQL_SCALAR_SUBQ),
    "part_supplier_join": QuerySpec(part_supplier_join, SQL_PART_SUPP),
    "q4_order_priority_exists": QuerySpec(q4_order_priority_exists, SQL_Q4),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, SQL_Q6),
    "q10_returned_items": QuerySpec(q10_returned_items, SQL_Q10),
    "q12_priority_lines": QuerySpec(q12_priority_lines, SQL_Q12),
    "q14_promo_revenue": QuerySpec(q14_promo_revenue, SQL_Q14),
    "q19_discounted_revenue": QuerySpec(q19_discounted_revenue, SQL_Q19),
    "q7_volume_shipping": QuerySpec(q7_volume_shipping, SQL_Q7),
    "q8_market_share": QuerySpec(q8_market_share, SQL_Q8),
    "q9_product_profit": QuerySpec(q9_product_profit, SQL_Q9),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, SQL_Q13),
    "q15_top_supplier": QuerySpec(q15_top_supplier, SQL_Q15),
    "q17_small_quantity_revenue": QuerySpec(q17_small_quantity_revenue, SQL_Q17),
    "q11_important_stock": QuerySpec(q11_important_stock, SQL_Q11),
    "q16_supplier_part_counts": QuerySpec(q16_supplier_part_counts, SQL_Q16),
    "q20_potential_promotion": QuerySpec(q20_potential_promotion, SQL_Q20),
    "q21_suppliers_kept_waiting": QuerySpec(q21_suppliers_kept_waiting, SQL_Q21),
    "q22_global_sales_opportunity": QuerySpec(q22_global_sales_opportunity, SQL_Q22),
}
