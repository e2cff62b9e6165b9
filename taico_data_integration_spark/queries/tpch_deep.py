"""Deep TPC-H-shaped relational coverage (q7/q8/q9/q12/q13/q15/q17/q20/q21/q22
adapted to the fixture schema — no partsupp/shipmode/commitdate columns exist,
so those queries keep their *shape* (join topology, subquery structure,
exists/not-exists semantics) over the columns we have).

These exercise the planner surfaces the reference never stresses (SURVEY.md §4:
the reference delegates all planning to BigQuery): multi-way join ordering,
correlated scalar subqueries as two-phase aggregates, bidirectional
EXISTS/NOT EXISTS, left-outer count distributions, and scalar-threshold
cross joins. Money math per the DECIMAL strategy in queries/_util.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import T, as_double, dec2, one

# ---------------------------------------------------------------------------
# Q7-style: volume shipping between two nations, by direction and year.


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
            )
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(as_double(F.sum(rev)).alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

# ---------------------------------------------------------------------------
# Q8-style: market share of one supplier nation inside a customer region,
# per order year. Ratio = double division of exact sums, round 6.


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nc = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    ns = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .where(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("volume"),
            F.col("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(4,2)")
    return j.groupBy("o_year").agg(
        F.round(
            as_double(F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)))
            / as_double(F.sum(F.col("volume"))),
            6,
        ).alias("mkt_share")
    )


Q8_SQL = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""

# ---------------------------------------------------------------------------
# Q9-style: product-line profit by supplier nation and year. No partsupp
# table in the fixtures, so supply cost is modeled as 0.8 * retailprice *
# quantity — same join topology (lineitem x part x supplier x nation x orders).


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = T(spark, sf_dir, "supplier")
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    cost = (
        F.lit("0.8").cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
    )
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    return (
        j.select(F.col("nation"), F.year("o_orderdate").alias("o_year"), (rev - cost).alias("amount"))
        .groupBy("nation", "o_year")
        .agg(as_double(F.sum("amount")).alias("sum_profit"))
    )


Q9_SQL = """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         - CAST(0.8 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(8,2)) AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n ON s_nationkey = n.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""

# ---------------------------------------------------------------------------
# Q12-style: priority class counts per line status (shipmode column absent;
# l_linestatus plays its role) for one ship year.


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""

# ---------------------------------------------------------------------------
# Q13-style: customer order-count distribution (left outer join + two-level
# aggregation — the only left-outer-into-histogram shape in TPC-H).


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""

# ---------------------------------------------------------------------------
# Q15-style: top supplier(s) by quarterly revenue — scalar-max subquery
# against a derived revenue view.


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    s = T(spark, sf_dir, "supplier")
    rev = dec2("l_extendedprice") * (one() - dec2("l_discount", 4))
    revenue = l.groupBy("l_suppkey").agg(as_double(F.sum(rev)).alias("total_revenue"))
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

# ---------------------------------------------------------------------------
# Q17-style: small-quantity-order revenue — correlated avg-quantity subquery
# per part, as a two-phase aggregate (exact decimal sum -> double avg).


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    l = T(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (as_double(F.sum(dec2("l_quantity", 8))) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        lp.join(avg_q, lp.l_partkey == avg_q.a_partkey)
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(as_double(F.sum(dec2("l_extendedprice"))) / F.lit(7.0), 6).alias("avg_yearly")
        )
    )


Q17_SQL = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'),
avg_q AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lp GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lp JOIN avg_q ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
"""

# ---------------------------------------------------------------------------
# Q20-style: suppliers with significant shipped volume of a part family —
# nested semi-join chain (part-name filter -> per-(supp,part) volume
# threshold -> supplier semi-join).


def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey")
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    s = T(spark, sf_dir, "supplier")
    qualifying = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(as_double(F.sum(dec2("l_quantity", 8))).alias("shipped_qty"))
        .where(F.col("shipped_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) > 50)
"""

# ---------------------------------------------------------------------------
# Q21-style: sole-returning supplier on multi-supplier orders — EXISTS
# (another supplier on the order) + NOT EXISTS (another supplier who also
# returned). Commit/receipt dates absent; returnflag='R' plays "late".


def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan, SINGLE-SHUFFLE formulation: one explicit repartition by
    l_orderkey feeds (a) the (order, supplier, #R-lines) pair aggregation —
    HashPartitioning(l_orderkey) satisfies the (l_orderkey, l_suppkey)
    clustering, so the groupBy adds no exchange — and (b) the per-order
    EXISTS / NOT EXISTS counts, computed as window aggregates over the same
    partitioning instead of the old per_order groupBy + self-join (which
    cost three more shuffles: per-order agg, and a re-shuffle of each join
    side back onto l_orderkey). Results are identical: the window sees
    exactly the pair rows of its order, so n_supp/n_r_supp match the
    aggregate-join values row for row. Skew-safe: window groups are bounded
    by per-order line counts (~7), not data volume."""
    from pyspark.sql import Window

    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    pair = (
        l.select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_r_lines")
        )
    )
    w = Window.partitionBy("l_orderkey")
    stats = pair.select(
        "l_orderkey",
        "l_suppkey",
        "n_r_lines",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum(F.when(F.col("n_r_lines") > 0, 1).otherwise(0)).over(w).alias("n_r_supp"),
    )
    waiting = stats.where(
        (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1) & (F.col("n_r_lines") > 0)
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q22-style: high-balance customers with no orders, grouped by a name-derived
# code — global scalar AVG threshold (exact sum -> double) + NOT EXISTS.


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01")))
        .select("o_custkey")
    )
    pos = c.where(F.col("c_acctbal") > 0)
    thr = pos.agg(
        (as_double(F.sum(dec2("c_acctbal", 12))) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 16, 3).alias("cust_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            as_double(F.sum(dec2("c_acctbal", 12))).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT SUBSTRING(c_name, 16, 3) AS cust_code,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1
"""


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_volume_suppliers": q20_volume_suppliers,
    "q21_sole_returning_supplier": q21_sole_returning_supplier,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLE = {
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q12_priority_by_linestatus": Q12_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q20_volume_suppliers": Q20_SQL,
    "q21_sole_returning_supplier": Q21_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
