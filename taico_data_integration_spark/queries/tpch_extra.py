"""Additional TPC-H-shaped relational coverage (adapted to the fixture
schema): semi-join EXISTS aggregation, conditional-share aggregates,
NOT-IN exclusion with distinct counting, HAVING-subquery top groups, and
complex OR predicates. Money math per the DECIMAL strategy (queries/_util).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import T, as_double, dec2, one

# ---------------------------------------------------------------------------
# Q4-style: order counts by priority where at least one lineitem shipped
# after the order date's year start (semi-join).


def q4_priority_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    shipped = T(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return (
        o.join(shipped, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# Q14-style: promo revenue share — ratio of two exact-decimal sums.


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    p = T(spark, sf_dir, "part")
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(4,2)"))).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT ROUND(
  CAST(100.0 AS DOUBLE)
  * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
             ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
"""

# ---------------------------------------------------------------------------
# Q16-style: supplier variety per (brand, type, size-bucket), excluding one
# brand via NOT IN and counting distinct suppliers.


def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").where(~F.col("p_brand").isin("Brand#1", "Brand#2"))
    l = T(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return (
        j.groupBy("p_brand", "p_type", (F.col("p_size") % 5).cast("bigint").alias("size_bucket"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size % 5 AS BIGINT) AS size_bucket,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# Q18-style: large-volume orders — HAVING-filtered subquery feeding a join.


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(as_double(F.sum(dec2("l_quantity"))).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"), "total_qty")
    )


Q18_SQL = """
SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, total_qty
FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) b
JOIN orders ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

# ---------------------------------------------------------------------------
# Q19-style: disjunctive multi-attribute predicate (brand x quantity bands).


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#9") & F.col("l_quantity").between(10, 25))
        | ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(20, 35))
    )
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    return j.where(cond).agg(
        as_double(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 10 AND 25)
   OR (p_type = 'PROMO' AND l_quantity BETWEEN 20 AND 35)
"""

# ---------------------------------------------------------------------------
# Q2-style: correlated scalar subquery — cheapest supplier per part.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    cost = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(as_double(F.min(dec2("l_extendedprice"))).alias("min_price"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("min_price").alias("best_price"))
    return (
        cost.join(best, "l_partkey")
        .where(F.col("min_price") == F.col("best_price"))
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .select("l_partkey", "l_suppkey", "s_name", "min_price")
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
  FROM lineitem GROUP BY 1, 2)
SELECT l_partkey, l_suppkey, s_name, min_price
FROM cost
JOIN supplier ON l_suppkey = s_suppkey
WHERE min_price = (SELECT MIN(min_price) FROM cost c2 WHERE c2.l_partkey = cost.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q6-style: fully-pushed-down filtered aggregate (no joins, no groups).


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    rev = dec2("l_extendedprice") * dec2("l_discount", 4)
    return l.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-01-01")))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(as_double(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n_items"))


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# ---------------------------------------------------------------------------
# Q10-style: returned-item losses by customer (top 20).


def q10_returned_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(as_double(F.sum(rev)).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_losses": q10_returned_losses,
    "q4_priority_with_shipments": q4_priority_with_shipments,
    "q14_promo_share": q14_promo_share,
    "q16_part_supplier_variety": q16_part_supplier_variety,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
}

ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_losses": Q10_SQL,
    "q4_priority_with_shipments": Q4_SQL,
    "q14_promo_share": Q14_SQL,
    "q16_part_supplier_variety": Q16_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
}
