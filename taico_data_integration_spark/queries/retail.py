"""Retail star-schema pipeline queries (SURVEY.md §3.3, entry point C) and
the media-relations bridge rebuild (M7), all over deterministic adapters of
the driver fixtures, with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dims import distinct_extract, mint_ids
from ..ops.relations import rebuild_relations
from ..ops.retail import (
    country_from_fixtures,
    dim_customer,
    dim_datetime,
    dim_product,
    fct_invoices,
    raw_invoices_from_fixtures,
    report_customer_invoices,
    report_product_invoices,
    report_year_invoices,
)
from ._util import T

_SK_NULL = "_dbt_utils_surrogate_key_null_"


def _sk(*exprs: str) -> str:
    parts = ", ".join(f"coalesce(CAST({e} AS VARCHAR), '{_SK_NULL}')" for e in exprs)
    return f"md5(concat_ws('-', {parts}))"


# DuckDB replica of ops.retail.raw_invoices_from_fixtures.
RAW_INVOICES_CTE = """
raw AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS InvoiceNo,
         CAST(l_partkey AS VARCHAR) AS StockCode,
         p_name AS Description,
         CAST(l_quantity AS INT) AS Quantity,
         CASE WHEN o_orderkey % 2 = 0 AND EXTRACT(YEAR FROM o_orderdate) >= 2000
           THEN concat(lpad(CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR), 2, '0'), '/',
                       lpad(CAST(EXTRACT(DAY FROM o_orderdate) AS VARCHAR), 2, '0'), '/',
                       lpad(CAST(EXTRACT(YEAR FROM o_orderdate) % 100 AS VARCHAR), 2, '0'), ' 10:15')
           ELSE concat(lpad(CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR), 2, '0'), '/',
                       lpad(CAST(EXTRACT(DAY FROM o_orderdate) AS VARCHAR), 2, '0'), '/',
                       CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR), ' 10:15')
         END AS InvoiceDate,
         CAST(floor(l_extendedprice / l_quantity * 100) / 100 AS DECIMAL(18,2)) AS UnitPrice,
         CASE WHEN c_custkey % 10 = 7 THEN NULL ELSE CAST(c_custkey AS VARCHAR) END AS CustomerID,
         n_name AS Country
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
)
"""


def retail_dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = raw_invoices_from_fixtures(spark, sf_dir)
    return dim_customer(raw, country_from_fixtures(spark, sf_dir))


RETAIL_DIM_CUSTOMER_SQL = f"""
WITH {RAW_INVOICES_CTE},
country AS (SELECT n_name AS nicename, r_name AS iso FROM nation JOIN region ON n_regionkey = r_regionkey)
SELECT customer_id, customer_code, country, iso
FROM (SELECT DISTINCT {_sk('CustomerID', 'Country')} AS customer_id,
             CustomerID AS customer_code, Country AS country
      FROM raw WHERE CustomerID IS NOT NULL) d
LEFT JOIN country ON d.country = country.nicename
"""


def retail_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_product(raw_invoices_from_fixtures(spark, sf_dir))


RETAIL_DIM_PRODUCT_SQL = f"""
WITH {RAW_INVOICES_CTE}
SELECT DISTINCT {_sk('StockCode', 'Description', 'UnitPrice')} AS product_id,
       StockCode AS stock_code, Description AS description,
       CAST(UnitPrice AS DOUBLE) AS price
FROM raw WHERE StockCode IS NOT NULL AND UnitPrice > 0
"""


def retail_dim_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_datetime(raw_invoices_from_fixtures(spark, sf_dir))


RETAIL_DIM_DATETIME_SQL = f"""
WITH {RAW_INVOICES_CTE},
d AS (SELECT DISTINCT InvoiceDate AS datetime_raw FROM raw WHERE InvoiceDate IS NOT NULL),
p AS (SELECT datetime_raw, {_sk('datetime_raw')} AS datetime_id,
        CASE WHEN length(datetime_raw) >= 16 THEN try_strptime(datetime_raw, '%m/%d/%Y %H:%M')
             ELSE try_strptime(datetime_raw, '%m/%d/%y %H:%M') END AS datetime
      FROM d)
SELECT datetime_id, datetime_raw, datetime,
  CAST(EXTRACT(YEAR FROM datetime) AS BIGINT) AS year,
  CAST(EXTRACT(MONTH FROM datetime) AS BIGINT) AS month,
  CAST(EXTRACT(DAY FROM datetime) AS BIGINT) AS day,
  CAST(EXTRACT(HOUR FROM datetime) AS BIGINT) AS hour,
  CAST(EXTRACT(MINUTE FROM datetime) AS BIGINT) AS minute,
  CAST(dayofweek(datetime) + 1 AS BIGINT) AS weekday
FROM p
"""


def retail_fct_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    fct = fct_invoices(raw_invoices_from_fixtures(spark, sf_dir))
    return fct.withColumn("total", F.col("total").cast("double"))


RETAIL_FCT_SQL = f"""
WITH {RAW_INVOICES_CTE}
SELECT {_sk('InvoiceNo', 'StockCode', 'CustomerID')} AS invoice_id,
       {_sk('InvoiceDate')} AS datetime_id,
       {_sk('StockCode', 'Description', 'UnitPrice')} AS product_id,
       {_sk('CustomerID', 'Country')} AS customer_id,
       CAST(Quantity AS BIGINT) AS quantity,
       CAST(CAST(Quantity AS DECIMAL(18,2)) * UnitPrice AS DOUBLE) AS total
FROM raw WHERE Quantity > 0
"""


def retail_report_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = raw_invoices_from_fixtures(spark, sf_dir)
    return report_customer_invoices(
        fct_invoices(raw), dim_customer(raw, country_from_fixtures(spark, sf_dir))
    )


RETAIL_REPORT_CUSTOMER_SQL = f"""
WITH {RAW_INVOICES_CTE},
fct AS (SELECT {_sk('InvoiceNo', 'StockCode', 'CustomerID')} AS invoice_id,
               {_sk('CustomerID', 'Country')} AS customer_id
        FROM raw WHERE Quantity > 0),
dimc AS (SELECT DISTINCT {_sk('CustomerID', 'Country')} AS customer_id, Country AS country
         FROM raw WHERE CustomerID IS NOT NULL)
SELECT country, COUNT(DISTINCT invoice_id) AS total_invoices
FROM fct JOIN dimc USING (customer_id)
GROUP BY country
"""


def retail_report_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = raw_invoices_from_fixtures(spark, sf_dir)
    return report_product_invoices(fct_invoices(raw), dim_product(raw))


RETAIL_REPORT_PRODUCT_SQL = f"""
WITH {RAW_INVOICES_CTE},
fct AS (SELECT {_sk('StockCode', 'Description', 'UnitPrice')} AS product_id,
               CAST(Quantity AS BIGINT) AS quantity
        FROM raw WHERE Quantity > 0),
dimp AS (SELECT DISTINCT {_sk('StockCode', 'Description', 'UnitPrice')} AS product_id,
                StockCode AS stock_code
         FROM raw WHERE StockCode IS NOT NULL AND UnitPrice > 0)
SELECT stock_code, CAST(SUM(quantity) AS BIGINT) AS total_quantity_sold
FROM fct JOIN dimp USING (product_id)
GROUP BY stock_code
"""


def retail_report_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = raw_invoices_from_fixtures(spark, sf_dir)
    return report_year_invoices(fct_invoices(raw), dim_datetime(raw))


RETAIL_REPORT_YEAR_SQL = f"""
WITH {RAW_INVOICES_CTE},
fct AS (SELECT {_sk('InvoiceNo', 'StockCode', 'CustomerID')} AS invoice_id,
               {_sk('InvoiceDate')} AS datetime_id
        FROM raw WHERE Quantity > 0),
dimd AS (SELECT DISTINCT {_sk('InvoiceDate')} AS datetime_id,
           CAST(EXTRACT(YEAR FROM CASE WHEN length(InvoiceDate) >= 16
                  THEN try_strptime(InvoiceDate, '%m/%d/%Y %H:%M')
                  ELSE try_strptime(InvoiceDate, '%m/%d/%y %H:%M') END) AS BIGINT) AS year
         FROM raw WHERE InvoiceDate IS NOT NULL)
SELECT year, COUNT(DISTINCT invoice_id) AS num_invoices
FROM fct JOIN dimd USING (datetime_id)
GROUP BY year
"""

# ---------------------------------------------------------------------------
# M7: media-relations bridge rebuild over fixture "dimensions".


# Byte threshold above which media_relations_rebuild stages the distinct
# combination table instead of re-deriving each dim from the joined fact.
# 1 GiB ~= the point where five rescans of the join output clearly cost more
# than one materialization; every bench/test fixture estimates far below it
# (sf0.1 fact estimate ~tens of MB), so the gated variant only runs at scale.
_MEDIA_FACT_STAGE_MIN_BYTES = 1 << 30


def media_relations_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 5-way combination rows -> 5 broadcast id-mapping joins ->
    dedup (sync_data.py:106-187 restated). Dimensions are minted
    deterministically from distinct values (SURVEY.md §7.4 hazard 2)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    fact = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
    )
    # Size-gated staging (r12 A/B + VERDICT r12 #8): deriving the four dims
    # + bridge from ONE materialized `fact.distinct()` is the single-scan
    # shape for a fact too big to rescan — but at bench scale it LOSES
    # (+0.3-0.4 s: the checkpoint barrier serializes branches that run
    # concurrently over a page-cached 2.6 MB scan, and each branch is a
    # cheap partial-agg distinct). Below the byte threshold the five
    # branches re-derive from the (page-cached) scan; above it the distinct
    # combination table is materialized once and every dim reads it —
    # rescanning a TB-scale 5-way join five times is the thing that does
    # not survive 100 TB. The gate reads the DRIVING TABLE's scan estimate
    # (file bytes — accurate), not the join output's (multiplicative
    # no-stats estimates read 10^14+ even at sf0.001), so the bench-scale
    # plan (and its numbers) are unchanged.
    from ..ops.dims import _estimated_plan_bytes

    est = _estimated_plan_bytes(o)
    if est is not None and est > _MEDIA_FACT_STAGE_MIN_BYTES:
        fact = fact.select(
            "order_year", "status", "priority", "segment", "nation"
        ).distinct().localCheckpoint(eager=False)
    dims = {
        # max_rows=None: inputs are distinct extracts of low-cardinality
        # dimension columns — bounded by construction, so skip the guard's
        # extra count job (it would recompute the distinct shuffle).
        col: mint_ids(distinct_extract(fact, col), ["name"], max_rows=None)
        for col in ("status", "priority", "segment", "nation")
    }
    out = rebuild_relations(fact, dims, keep_cols=["order_year"])
    return out.select(
        "order_year",
        *[F.col(f"{c}_id").cast("bigint").alias(f"{c}_id") for c in ("status", "priority", "segment", "nation")],
    )


MEDIA_RELATIONS_SQL = """
WITH fact AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
         o_orderstatus AS status, o_orderpriority AS priority,
         c_mktsegment AS segment, n_name AS nation
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
d_status AS (SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
             FROM (SELECT DISTINCT status AS name FROM fact WHERE status IS NOT NULL) t),
d_priority AS (SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
               FROM (SELECT DISTINCT priority AS name FROM fact WHERE priority IS NOT NULL) t),
d_segment AS (SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
              FROM (SELECT DISTINCT segment AS name FROM fact WHERE segment IS NOT NULL) t),
d_nation AS (SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
             FROM (SELECT DISTINCT nation AS name FROM fact WHERE nation IS NOT NULL) t)
SELECT DISTINCT order_year,
       s.id AS status_id, p.id AS priority_id, g.id AS segment_id, n.id AS nation_id
FROM (SELECT DISTINCT order_year, status, priority, segment, nation FROM fact) f
JOIN d_status s ON f.status = s.name
JOIN d_priority p ON f.priority = p.name
JOIN d_segment g ON f.segment = g.name
JOIN d_nation n ON f.nation = n.name
"""


QUERIES = {
    "retail_dim_customer": retail_dim_customer,
    "retail_dim_product": retail_dim_product,
    "retail_dim_datetime": retail_dim_datetime,
    "retail_fct_invoices": retail_fct_invoices,
    "retail_report_customer": retail_report_customer,
    "retail_report_product": retail_report_product,
    "retail_report_year": retail_report_year,
    "media_relations_rebuild": media_relations_rebuild,
}

ORACLE = {
    "retail_dim_customer": RETAIL_DIM_CUSTOMER_SQL,
    "retail_dim_product": RETAIL_DIM_PRODUCT_SQL,
    "retail_dim_datetime": RETAIL_DIM_DATETIME_SQL,
    "retail_fct_invoices": RETAIL_FCT_SQL,
    "retail_report_customer": RETAIL_REPORT_CUSTOMER_SQL,
    "retail_report_product": RETAIL_REPORT_PRODUCT_SQL,
    "retail_report_year": RETAIL_REPORT_YEAR_SQL,
    "media_relations_rebuild": MEDIA_RELATIONS_SQL,
}
