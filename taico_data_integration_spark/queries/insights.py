"""Product-analytics and profiling queries: cohort retention, moving
averages, histograms, column profiling, stratified mixture sampling.

These are the report shapes the reference's `report_*` dbt models gesture
at (include/dbt/models/report/, SURVEY.md §2.4 A7) generalized to the
standard analytics toolkit, plus the per-column profiling its Soda checks
imply (include/soda/checks/, §2.4 A6). All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ops.sampling import stratified_hash_sample
from ._util import T, as_double, dec2

# ---------------------------------------------------------------------------
# Cohort retention over events: cohort = first active day per user,
# retention counted in whole-week offsets. Scale shape: one shuffle by
# user (window min), one by (cohort, offset) with map-side combine; the
# distinct collapses user-grain before the final count.


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    )
    w = Window.partitionBy("user_id")
    acts = e.withColumn("cohort_day", F.min("day").over(w)).select(
        "user_id",
        "cohort_day",
        F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / F.lit(7)).alias(
            "week_offset"
        ),
    ).distinct()
    return acts.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


COHORT_SQL = """
WITH acts AS (
  SELECT DISTINCT user_id,
         MIN(CAST(date_trunc('day', ts) AS DATE)) OVER (PARTITION BY user_id) AS cohort_day,
         CAST(FLOOR(date_diff('day',
               MIN(CAST(date_trunc('day', ts) AS DATE)) OVER (PARTITION BY user_id),
               CAST(date_trunc('day', ts) AS DATE)) / 7) AS BIGINT) AS week_offset
  FROM events
)
SELECT cohort_day, week_offset, COUNT(*) AS n_users
FROM acts GROUP BY cohort_day, week_offset
"""

# ---------------------------------------------------------------------------
# 7-day moving average of daily order revenue — RANGE frame over an
# integer day number. Scale note: the window runs on the POST-aggregate
# series (O(days) rows), so the unpartitioned sort is trivially small; the
# heavy input is collapsed by the partial-agg groupBy first.


def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.sum(dec2("o_totalprice")).alias("rev"))
    daily = daily.withColumn("day_num", F.datediff(F.col("day"), F.lit("1992-01-01").cast("date")))
    from ..ops.dims import guarded_dimension_frame

    # the guard also materializes the day series, so the unpartitioned window
    # reads the post-aggregate frame instead of re-running the groupBy
    daily = guarded_dimension_frame(daily, label="moving_avg_daily_revenue day series")
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        as_double(F.col("rev")).alias("revenue"),
        F.round(as_double(F.sum("rev").over(w)) / F.count(F.lit(1)).over(w), 6).alias(
            "ma7"
        ),
    )


MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', o_orderdate) AS DATE)) AS day_num
  FROM orders GROUP BY 1, 3
)
SELECT day, CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS ma7
FROM daily
WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

# ---------------------------------------------------------------------------
# Fixed-width histogram of order values. Pure IEEE bucket arithmetic
# (floor of a double division) — bit-identical across engines; one
# map-side-combined groupBy.

_BUCKET_W = 50000.0


def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / F.lit(_BUCKET_W)).alias("bucket")
    return (
        o.groupBy(b)
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(_BUCKET_W)).alias("lo"),
            ((F.col("bucket") + 1) * F.lit(_BUCKET_W)).alias("hi"),
            "n_orders",
        )
    )


HISTOGRAM_SQL = f"""
SELECT bucket, CAST(bucket * {_BUCKET_W} AS DOUBLE) AS lo,
       CAST((bucket + 1) * {_BUCKET_W} AS DOUBLE) AS hi,
       COUNT(*) AS n_orders
FROM (SELECT CAST(FLOOR(o_totalprice / {_BUCKET_W}) AS BIGINT) AS bucket FROM orders) t
GROUP BY bucket
"""

# ---------------------------------------------------------------------------
# Column profiling: null count + exact distinct count per column of orders,
# ONE scan (Spark compiles multi-distinct aggregates into a single Expand
# pass; at 100 TB swap countDistinct for approx_count_distinct and drop the
# Expand). Long-format output like every profiler emits.

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = o.agg(*aggs)
    pairs = []
    for c in _PROFILE_COLS:
        pairs.extend([F.lit(c), F.col(f"__nn_{c}"), F.col(f"__nd_{c}")])
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.column", "p.n_nulls", "p.n_distinct")


PROFILE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS \"column\", COUNT(*) - COUNT({c}) AS n_nulls, "
    f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
    for c in _PROFILE_COLS
)

# ---------------------------------------------------------------------------
# Stratified mixture sampling of documents by source: per-source keep
# percentages (the training-mix weighting step). Map-side hash filter, no
# shuffle, content-stable membership.

_MIX = {"src0": 10.0, "src1": 50.0, "src2": 100.0, "src3": 25.0}

_BUCKET_CTE = """
  SELECT doc_id, source,
    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
   + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
   + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
   + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 100 AS b
  FROM (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents) z
"""


def stratified_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_hash_sample(d, "doc_id", "source", _MIX)


MIXTURE_SQL = f"""
SELECT doc_id, source FROM ({_BUCKET_CTE}) y
WHERE b < CASE source WHEN 'src0' THEN 10.0 WHEN 'src1' THEN 50.0
                      WHEN 'src2' THEN 100.0 WHEN 'src3' THEN 25.0 ELSE 0.0 END
"""


# ---------------------------------------------------------------------------
# Exact per-group percentiles (median / p90 of order value per priority).
# F.percentile is a full-sort-per-group aggregate — fine on bounded group
# counts; at 100 TB prefer approx_percentile (t-digest, mergeable partial
# states) and accept the documented error bound.


def percentile_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
    )


PERCENTILE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Inter-event gap statistics per user: lag window over exact microsecond
# epochs (never float seconds), aggregates per user. One shuffle by user;
# the lag and the aggregation share the partitioning.


def inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff is wall-clock arithmetic and accepts both TIMESTAMP and
    # TIMESTAMP_NTZ — unix_micros would reject the NTZ type a vanilla
    # session infers for parquet timestamps.
    g = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
        .where(F.col("gap_us").isNotNull())
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_us").alias("max_gap_us"),
        F.round(as_double(F.sum("gap_us")) / F.count(F.lit(1)), 6).alias("avg_gap_us"),
    )


INTER_EVENT_SQL = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps, MAX(gap_us) AS max_gap_us,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*), 6) AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# Top-N per group as an ORDERED list: each customer's top-3 order keys by
# spend. collect_list of (spend, key) structs -> sort desc -> slice -> join
# to a stable string (array renderings differ across engines; the joined
# string hashes identically). Single shuffle; the per-group sort is bounded
# by group size (use a pre-rank window filter first when groups are huge).


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    entry = F.struct(cents.alias("c"), F.col("o_orderkey").alias("k"))
    top3 = F.slice(F.reverse(F.array_sort(F.collect_list(entry))), 1, 3)
    return o.groupBy("o_custkey").agg(
        F.array_join(F.transform(top3, lambda s: s.getField("k").cast("string")), ",").alias(
            "top_orderkeys"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


TOP_ORDERS_SQL = """
SELECT o_custkey,
       list_aggr(list_transform(
           (list_sort(list((CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)), 'DESC'))[1:3],
           p -> CAST(p[2] AS VARCHAR)), 'string_agg', ',') AS top_orderkeys,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# Grouped OLS trend with EXACT integer accumulation. The naive formulation
# (covar_samp/var_samp, or float sums) is summation-order-dependent — results
# drift across partitionings and engines. Here x (day index) and y (cents)
# are integers, all five sufficient statistics are exact integer sums (one
# aggregation pass, partial-aggregatable, no UDF), and the float math is a
# fixed IEEE expression over those exact sums — bit-identical everywhere.


def revenue_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    x = F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), x.alias("x"), y.alias("y"))
    )
    d38 = "decimal(38,0)"
    sums = base.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("x").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("sxx"),
    )
    nd = F.col("n_orders").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    with_slope = sums.withColumn("slope", slope)
    return with_slope.select(
        "nation",
        "n_orders",
        F.round("slope", 6).alias("slope_cents_per_day"),
        F.round(
            (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n_orders").cast("double"), 6
        ).alias("intercept_cents"),
    )


TREND_SQL = """
WITH base AS (
  SELECT n_name AS nation,
         CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
sums AS (
  SELECT nation, COUNT(*) AS n_orders,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM base GROUP BY nation),
sloped AS (
  SELECT nation, n_orders, sx, sy,
         (CAST(n_orders AS DOUBLE) * sxy - sx * sy)
           / (CAST(n_orders AS DOUBLE) * sxx - sx * sx) AS slope
  FROM sums)
SELECT nation, n_orders,
       ROUND(slope, 6) AS slope_cents_per_day,
       ROUND((sy - slope * sx) / CAST(n_orders AS DOUBLE), 6) AS intercept_cents
FROM sloped
"""


QUERIES = {
    "cohort_retention": cohort_retention,
    "revenue_trend_by_nation": revenue_trend_by_nation,
    "percentile_price_by_priority": percentile_price_by_priority,
    "inter_event_gaps": inter_event_gaps,
    "top_orders_per_customer": top_orders_per_customer,
    "moving_avg_daily_revenue": moving_avg_daily_revenue,
    "histogram_order_values": histogram_order_values,
    "profile_orders_columns": profile_orders_columns,
    "stratified_mixture_sample": stratified_mixture_sample,
}

ORACLE = {
    "cohort_retention": COHORT_SQL,
    "revenue_trend_by_nation": TREND_SQL,
    "percentile_price_by_priority": PERCENTILE_SQL,
    "inter_event_gaps": INTER_EVENT_SQL,
    "top_orders_per_customer": TOP_ORDERS_SQL,
    "moving_avg_daily_revenue": MOVING_AVG_SQL,
    "histogram_order_values": HISTOGRAM_SQL,
    "profile_orders_columns": PROFILE_SQL,
    "stratified_mixture_sample": MIXTURE_SQL,
}
