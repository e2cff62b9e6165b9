"""Sync / lifecycle operator queries (SURVEY.md §2.9 M1-M8, §2.3 J7-J9,
§2.4 A4) expressed over the driver fixtures, exercising the real operator
library (ops.dims, ops.incremental)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ops.dims import distinct_extract, insert_if_not_exists, mint_ids, mirror_sync, validate_sync
from ..ops.incremental import incremental_new_rows, merge_upsert, promote_tenant
from ._util import T, as_double, dec2

# ---------------------------------------------------------------------------
# A4/M5: incremental watermark scan (main_taico_staging.sql:68-70).


def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    target = o.where(F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    return incremental_new_rows(o, target, "o_orderdate").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_date")
    )


WATERMARK_SQL = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
                     WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
"""

# ---------------------------------------------------------------------------
# M5: merge-on-composite-key upsert (dbt incremental unique_key semantics).


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    target = o.where(F.col("o_orderdate") < F.to_timestamp(F.lit("2000-01-01")))
    updates = o.where(F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(1.1).cast("double")
    )
    merged = merge_upsert(target, updates, ["o_orderkey"])
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice")


MERGE_UPSERT_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
                         WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
"""

# ---------------------------------------------------------------------------
# M4: tenant-scoped delete-then-insert swap (sync_data.py:281-309); scope
# compiles to a partition overwrite on partitioned storage.


def promote_scope_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    staging = o.withColumn("o_totalprice", F.col("o_totalprice") * F.lit(2).cast("double"))
    promoted = promote_tenant(o, staging, F.col("o_orderstatus") == "P")
    return promoted.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        as_double(F.sum(dec2("o_totalprice"))).alias("total_price"),
    )


PROMOTE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (
  SELECT o_orderstatus, o_totalprice FROM orders WHERE NOT (o_orderstatus = 'P')
  UNION ALL
  SELECT o_orderstatus, o_totalprice * CAST(2 AS DOUBLE) FROM orders WHERE o_orderstatus = 'P'
) z
GROUP BY o_orderstatus
"""

# ---------------------------------------------------------------------------
# M2: full mirror sync — keep/insert/delete with id stability
# (sync_data.py:224-273).


def mirror_sync_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = T(spark, sf_dir, "part").where(F.col("p_size") < 25).select("p_partkey", "p_name")
    incoming = (
        T(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.to_timestamp(F.lit("2001-01-01")))
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    kept, added = mirror_sync(existing, incoming, ["p_partkey"])
    return kept.select("p_partkey", "p_name", F.lit("kept").alias("sync_status")).unionByName(
        added.select(
            "p_partkey", F.lit(None).cast("string").alias("p_name"), F.lit("added").alias("sync_status")
        )
    )


MIRROR_SYNC_SQL = """
SELECT p_partkey, p_name, 'kept' AS sync_status FROM part
WHERE p_size < 25
  AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
UNION ALL
SELECT DISTINCT l_partkey AS p_partkey, CAST(NULL AS VARCHAR) AS p_name, 'added' AS sync_status
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
  AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size < 25)
"""

# ---------------------------------------------------------------------------
# J9: bidirectional sync validation (data_quality_checks.py:59-89).


def sync_diff_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = T(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("s_suppkey"))
    stored = T(spark, sf_dir, "supplier").where(F.col("s_suppkey") < 8)
    return validate_sync(extracted, stored, ["s_suppkey"])


SYNC_DIFF_SQL = """
SELECT 'extracted_not_stored' AS direction, CAST(COUNT(*) AS BIGINT) AS missing_count
FROM (SELECT DISTINCT l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 8)) a
UNION ALL
SELECT 'stored_not_extracted', CAST(COUNT(*) AS BIGINT)
FROM (SELECT s_suppkey FROM supplier WHERE s_suppkey < 8
      AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)) b
"""

# ---------------------------------------------------------------------------
# M1: insert-if-not-exists upsert (sync_data.py:331-359) — set-based.


def insert_if_absent_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    existing = n.where(F.col("n_nationkey") < 15).select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    )
    incoming = n.select(F.col("n_nationkey").alias("id"), F.col("n_name").alias("name"))
    return insert_if_not_exists(incoming, existing, ["name"])


INSERT_ABSENT_SQL = """
SELECT n_nationkey AS id, n_name AS name FROM nation WHERE n_nationkey < 15
UNION ALL
SELECT n_nationkey, n_name FROM nation
WHERE n_name NOT IN (SELECT n_name FROM nation WHERE n_nationkey < 15)
"""

# ---------------------------------------------------------------------------
# Deterministic id minting for new dimension values (SURVEY.md §7.4 hazard 2).


def mint_segment_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = distinct_extract(T(spark, sf_dir, "customer"), "c_mktsegment", out_name="name")
    # max_rows=None: distinct segment set is bounded by construction
    return mint_ids(segs, ["name"], start_at=100, max_rows=None).select(
        F.col("id").cast("bigint").alias("id"), "name"
    )


MINT_IDS_SQL = """
SELECT CAST(row_number() OVER (ORDER BY name) + 99 AS BIGINT) AS id, name
FROM (SELECT DISTINCT c_mktsegment AS name FROM customer WHERE c_mktsegment IS NOT NULL) t
"""


def mint_part_ids_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe id minting exercised on a fact-sized input: ids are dense
    and in global (p_name, p_partkey) order, yet no global-sort barrier
    exists — range partition + per-partition numbering + offset join
    (ops.dims.mint_ids_distributed). The ORACLE is a plain row_number: the
    operator's contract is exactly that its partitioned execution is
    indistinguishable from the single-partition form."""
    from ..ops.dims import mint_ids_distributed

    p = T(spark, sf_dir, "part").select("p_partkey", "p_name")
    out = mint_ids_distributed(p, ["p_name", "p_partkey"], num_partitions=8)
    return out.select(F.col("id").cast("bigint").alias("id"), "p_partkey", "p_name")


MINT_DISTRIBUTED_SQL = """
SELECT CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS id,
       p_partkey, p_name
FROM part
"""

# ---------------------------------------------------------------------------
# Stateful sessionization (streaming-adjacent; batch twin of
# applyInPandasWithState — here pure window functions, no Python).


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp") - F.lag("ts").over(w)
    new_sess = F.when(
        F.lag("ts").over(w).isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    with_flag = e.select("user_id", "event_id", "ts", new_sess.alias("new_sess"))
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessed = with_flag.withColumn("session_id", F.sum("new_sess").over(w2).cast("bigint"))
    return sessed.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


SESSIONIZE_SQL = """
WITH x AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, ts,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM y GROUP BY user_id, session_id
"""


QUERIES = {
    "watermark_incremental": watermark_incremental,
    "merge_upsert_orders": merge_upsert_orders,
    "promote_scope_swap": promote_scope_swap,
    "mirror_sync_parts": mirror_sync_parts,
    "sync_diff_suppliers": sync_diff_suppliers,
    "insert_if_absent_nations": insert_if_absent_nations,
    "mint_segment_ids": mint_segment_ids,
    "mint_part_ids_distributed": mint_part_ids_distributed,
    "events_sessionize": events_sessionize,
}

ORACLE = {
    "watermark_incremental": WATERMARK_SQL,
    "merge_upsert_orders": MERGE_UPSERT_SQL,
    "promote_scope_swap": PROMOTE_SQL,
    "mirror_sync_parts": MIRROR_SYNC_SQL,
    "sync_diff_suppliers": SYNC_DIFF_SQL,
    "insert_if_absent_nations": INSERT_ABSENT_SQL,
    "mint_segment_ids": MINT_IDS_SQL,
    "mint_part_ids_distributed": MINT_DISTRIBUTED_SQL,
    "events_sessionize": SESSIONIZE_SQL,
}
