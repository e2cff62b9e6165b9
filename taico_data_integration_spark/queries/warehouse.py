"""Warehouse lifecycle queries: SCD Type 2, CDC changelog collapse,
time-series resample+ffill, unpivot.

These generalize the reference's dimension/incremental surface
(include/scripts/sync_data.py mirror sync = SCD1; dbt incremental models =
keyed merge, SURVEY.md §2.9 M2/M5) to the history-preserving and
changelog-driven forms a production warehouse needs. All four are
oracle-checked against DuckDB on the shared fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ops.cdc import cdc_collapse
from ..ops.survivorship import golden_record
from ..ops.timeseries import resample_ffill
from ._util import T, as_double, dec2

# ---------------------------------------------------------------------------
# SCD Type 2: customer order-activity dimension across two snapshot dates.
# Snapshot 1 = activity before 1996-01-01; snapshot 2 = all time. Customers
# whose numbers grew get a closed historical version + a new current one;
# customers with all activity before the cutoff stay untouched; customers
# whose first order is after the cutoff appear as new keys.

_CUT = "1996-01-01"
_T0 = "1995-01-01"
_T1 = "1999-01-01"


def scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused single-shuffle formulation: both snapshots derive from the SAME
    fact table, so one conditional groupBy computes (before-cutoff, all-time)
    pairs per key and the SCD2 full-outer join disappears — the three output
    branches are filters over one reused exchange (1 shuffle vs 6 for the
    generic two-frame path). Use `ops.scd.scd2_apply` (unit-tested in
    tests/test_warehouse.py) when the snapshots come from different systems;
    use this shape when both are cuts of one fact at different watermarks."""
    o = T(spark, sf_dir, "orders")
    before = F.col("o_orderdate") < F.to_timestamp(F.lit(_CUT))
    both = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.when(before, F.lit(1))).alias("n1"),
        F.sum(F.when(before, dec2("o_totalprice"))).alias("t1"),
        F.count(F.lit(1)).alias("n2"),
        F.sum(dec2("o_totalprice")).alias("t2"),
    )
    in1 = F.col("n1") > 0
    changed = (F.col("n1") != F.col("n2")) | (F.col("t1") != F.col("t2"))

    def row(n, t, vf: str, vt: str | None, cur: bool):
        return [
            F.col("c_custkey"),
            F.col(n).alias("n_orders"),
            as_double(F.col(t)).alias("total_spent"),
            F.lit(vf).cast("date").alias("valid_from"),
            (F.lit(vt).cast("date") if vt else F.lit(None).cast("date")).alias("valid_to"),
            F.lit(cur).alias("is_current"),
        ]

    kept = both.where(in1 & ~changed).select(*row("n1", "t1", _T0, None, True))
    closed = both.where(in1 & changed).select(*row("n1", "t1", _T0, _T1, False))
    opened = both.where(~in1 | changed).select(*row("n2", "t2", _T1, None, True))
    return kept.unionByName(closed).unionByName(opened)


SCD2_SQL = f"""
WITH s1 AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT} 00:00:00' GROUP BY o_custkey
), s2 AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT s1.c_custkey AS k1, s1.n_orders AS n1, s1.total AS t1,
         s2.c_custkey AS k2, s2.n_orders AS n2, s2.total AS t2
  FROM s1 FULL OUTER JOIN s2 ON s1.c_custkey = s2.c_custkey
)
SELECT k1 AS c_custkey, n1 AS n_orders, CAST(t1 AS DOUBLE) AS total_spent,
       DATE '{_T0}' AS valid_from, CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
FROM j WHERE k1 IS NOT NULL AND k2 IS NOT NULL AND n1 = n2 AND t1 = t2
UNION ALL
SELECT k1, n1, CAST(t1 AS DOUBLE), DATE '{_T0}', DATE '{_T1}', FALSE
FROM j WHERE k1 IS NOT NULL AND (k2 IS NULL OR n1 <> n2 OR t1 <> t2)
UNION ALL
SELECT k2, n2, CAST(t2 AS DOUBLE), DATE '{_T1}', CAST(NULL AS DATE), TRUE
FROM j WHERE k2 IS NOT NULL AND (k1 IS NULL OR n1 <> n2 OR t1 <> t2)
"""

# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup: each fact row joined to the dimension VERSION
# valid at its event time — the query SCD2 exists to serve. Equi-join on the
# key plus a validity-interval predicate; each key has at most two versions
# partitioning time, so every order matches at most one (orders before the
# first version's start get NULLs — honest pre-history).


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = scd2_customer_orders(spark, sf_dir)
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cond = (
        (o["o_custkey"] == dim["c_custkey"])
        & (o["o_orderdate"] >= F.col("valid_from").cast("timestamp"))
        & (F.col("valid_to").isNull() | (o["o_orderdate"] < F.col("valid_to").cast("timestamp")))
    )
    return o.join(dim, cond, "left").select(
        "o_orderkey",
        "o_custkey",
        "n_orders",
        "total_spent",
        F.date_format("valid_from", "yyyy-MM-dd").alias("version_from"),
    )


SCD2_PIT_SQL = f"""
WITH dim AS ({SCD2_SQL})
SELECT o.o_orderkey, o.o_custkey, d.n_orders, d.total_spent,
       strftime(d.valid_from, '%Y-%m-%d') AS version_from
FROM orders o
LEFT JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= CAST(d.valid_from AS TIMESTAMP)
 AND (d.valid_to IS NULL OR o.o_orderdate < CAST(d.valid_to AS TIMESTAMP))
"""


# ---------------------------------------------------------------------------
# Largest-remainder allocation: prorate a per-order rebate (2% of the order
# total, floored to a cent) across its line items proportionally to their
# extended price, with the remainder pennies assigned to the largest
# fractional parts — so the per-order allocations sum EXACTLY to the rebate
# (the invariant every billing system needs, and naive per-row rounding
# violates). Pure integer arithmetic end-to-end: bit-identical across
# engines, partitionings, and row orders.


def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.round(dec2("l_extendedprice", 12) * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("l_orderkey")
    l = l.withColumn("tot", F.sum("cents").over(w)).withColumn(
        "rebate", F.expr("tot div 50")
    )
    l = l.withColumn("base", F.expr("(rebate * cents) div tot")).withColumn(
        "frac", F.expr("(rebate * cents) % tot")
    )
    # total-order tie-break: the fixture's (l_orderkey, l_linenumber) is NOT
    # unique, and equal fracs on the same linenumber with different cents
    # made the +1 row engine-dependent (caught by the sf1 sweep, round 4) —
    # cents completes the key; rows tying on all three are interchangeable
    # (same base -> same alloc), so the output multiset is deterministic.
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.desc("frac"), "l_linenumber", "cents"
    )
    l = (
        l.withColumn("short", F.col("rebate") - F.sum("base").over(w))
        .withColumn("rk", F.row_number().over(wr))
        .withColumn(
            "alloc_cents", F.col("base") + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
        )
    )
    return l.select("l_orderkey", "l_linenumber", "rebate", "alloc_cents")


LARGEST_REMAINDER_SQL = """
WITH b AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
  FROM lineitem),
t AS (
  SELECT l_orderkey, l_linenumber, cents,
         SUM(cents) OVER (PARTITION BY l_orderkey) AS tot
  FROM b),
x AS (
  SELECT l_orderkey, l_linenumber, cents, tot,
         tot // 50 AS rebate,
         ((tot // 50) * cents) // tot AS base,
         ((tot // 50) * cents) % tot AS frac
  FROM t),
y AS (
  SELECT l_orderkey, l_linenumber, rebate, base,
         rebate - SUM(base) OVER (PARTITION BY l_orderkey) AS short,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY frac DESC, l_linenumber, cents) AS rk
  FROM x)
SELECT l_orderkey, l_linenumber, CAST(rebate AS BIGINT) AS rebate,
       CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc_cents
FROM y
"""


# ---------------------------------------------------------------------------
# CDC: a deterministic changelog derived from orders (insert everything,
# update keys ≡3 mod 7 with a 5% price bump, delete keys ≡5 mod 7), then
# latest-op-wins collapse. All decimal arithmetic exact (scale-4 product,
# no rounding anywhere); DOUBLE only at the output edge.


def cdc_orders_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    amt = dec2("o_totalprice")
    ins = o.select(
        "o_orderkey",
        F.lit("I").alias("op"),
        F.lit(1).cast("bigint").alias("seq"),
        F.col("o_orderstatus").alias("status"),
        amt.cast("decimal(24,4)").alias("amount"),
    )
    upd = o.where(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit(2).cast("bigint").alias("seq"),
        F.col("o_orderstatus").alias("status"),
        (amt * F.lit("1.05").cast("decimal(3,2)")).cast("decimal(24,4)").alias("amount"),
    )
    dels = o.where(F.col("o_orderkey") % 7 == 5).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(3).cast("bigint").alias("seq"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("decimal(24,4)").alias("amount"),
    )
    log = ins.unionByName(upd).unionByName(dels)
    final = cdc_collapse(log, ["o_orderkey"], seq_col="seq", op_col="op")
    return final.select(
        "o_orderkey",
        F.col("op").alias("last_op"),
        "status",
        as_double(F.col("amount")).alias("amount"),
    )


CDC_SQL = """
WITH log AS (
  SELECT o_orderkey, 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderstatus AS status,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(24,4)) AS amount
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'U', 2, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(24,4))
  FROM orders WHERE o_orderkey % 7 = 3
  UNION ALL
  SELECT o_orderkey, 'D', 3, CAST(NULL AS VARCHAR), CAST(NULL AS DECIMAL(24,4))
  FROM orders WHERE o_orderkey % 7 = 5
)
SELECT o_orderkey, op AS last_op, status, CAST(amount AS DOUBLE) AS amount
FROM log
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1 AND op <> 'D'
"""

# ---------------------------------------------------------------------------
# Time-series resample + forward fill over the events table (daily grain,
# max-per-day observation, per-user dense calendar). No arithmetic on the
# carried value — the filled double is bit-identical in both engines.


def resample_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return resample_ffill(e, "user_id", "ts", "value")


RESAMPLE_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, MAX(value) AS obs
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT g.user_id, g.day, d.obs IS NOT NULL AS observed,
       last_value(d.obs IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""

# ---------------------------------------------------------------------------
# UNPIVOT: wide per-nation supplier metrics melted to (nation, metric, value)
# rows — Spark's native `unpivot` (SURVEY.md §2.4 report shapes; the melt
# dual of the pivot query in queries/extended.py).


def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    wide = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            as_double(F.sum(dec2("s_acctbal"))).alias("sum_acctbal"),
            F.count(F.lit(1)).cast("double").alias("n_suppliers"),
            F.round(
                as_double(F.sum(dec2("s_acctbal"))) / F.count(F.lit(1)), 6
            ).alias("avg_acctbal"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["sum_acctbal", "n_suppliers", "avg_acctbal"],
        "metric",
        "value",
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT n_name,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
         CAST(COUNT(*) AS DOUBLE) AS n_suppliers,
         ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_acctbal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, 'sum_acctbal' AS metric, sum_acctbal AS value FROM wide
UNION ALL
SELECT n_name, 'n_suppliers', n_suppliers FROM wide
UNION ALL
SELECT n_name, 'avg_acctbal', avg_acctbal FROM wide
"""


# ---------------------------------------------------------------------------
# Golden record: one consolidated profile row per user from the events feed
# — latest field values (tie-safe ordering by ts, event_id) + lifetime
# aggregates, all over a single shuffle (see ops.survivorship).


def golden_record_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    out = golden_record(
        e,
        keys=["user_id"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
        latest_fields=["event_type", "value"],
        lifetime_aggs={
            "first_seen": F.min(F.date_trunc("day", F.col("ts")).cast("date")),
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum(dec2("value")),
        },
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        "first_seen",
        "n_events",
        as_double(F.col("total_value")).alias("total_value"),
    )


GOLDEN_SQL = """
SELECT user_id, event_type AS last_event_type, value AS last_value,
       first_seen, n_events, total_value
FROM (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         MIN(CAST(date_trunc('day', ts) AS DATE)) OVER (PARTITION BY user_id) AS first_seen,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE) AS total_value
  FROM events) t
WHERE rn = 1
"""


QUERIES = {
    "scd2_customer_orders": scd2_customer_orders,
    "scd2_point_in_time_join": scd2_point_in_time_join,
    "largest_remainder_allocation": largest_remainder_allocation,
    "golden_record_users": golden_record_users,
    "cdc_orders_final_state": cdc_orders_final_state,
    "resample_user_values": resample_user_values,
    "unpivot_nation_metrics": unpivot_nation_metrics,
}

ORACLE = {
    "scd2_customer_orders": SCD2_SQL,
    "scd2_point_in_time_join": SCD2_PIT_SQL,
    "largest_remainder_allocation": LARGEST_REMAINDER_SQL,
    "golden_record_users": GOLDEN_SQL,
    "cdc_orders_final_state": CDC_SQL,
    "resample_user_values": RESAMPLE_SQL,
    "unpivot_nation_metrics": UNPIVOT_SQL,
}
