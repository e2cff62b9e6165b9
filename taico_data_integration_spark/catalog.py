"""Source registry: table name -> DataFrame.

The reference's sources are BigQuery datasets, Postgres tables, CSV files,
Google Sheets and Airbyte connector outputs (SURVEY.md §2.1 S1-S16). Our
engine abstracts them behind a registry keyed by table name; the test
fixtures are the driver's parquet tables (TESTDATA.md). For real deployments
the same registry returns `spark.read.format("bigquery")` / `.jdbc(...)`
frames — the downstream operator code is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


RUNTIME_CONFS = {
    # The driver smoke/correctness runs may hand us a vanilla SparkSession;
    # these are runtime-settable and required for semantic parity:
    # - nanosAsLong: events carries TIMESTAMP(NANOS) parquet Spark rejects
    # - ansi off: NULL-on-garbage casts (oracle uses TRY_CAST)
    # - UTC: timestamp rendering parity with the DuckDB oracle
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # WITH RECURSIVE safety valve: Spark 4 aborts recursive CTEs at 1M total
    # rows by default — an order-chain closure over sf1's 1.5M orders trips
    # it (caught by the sf1 sweep, round 4). The level limit (100) stays as
    # the runaway guard; the row limit scales with data, not with bugs.
    "spark.sql.cteRecursionRowLimit": "1000000000",
    # Write timestamps as TIMESTAMP(MICROS), not the deprecated INT96:
    # INT96 columns get NO parquet min/max statistics, which silently
    # disables timestamp data skipping (TableStore.read_pruned) and
    # row-group pushdown for every engine reading our output.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp to TIMESTAMP (LTZ) whatever physical
    type the fixture generation produced:
    - bigint: TIMESTAMP(NANOS) parquet read under nanosAsLong — truncate to
      micros, the same semantics as DuckDB casting TIMESTAMP_NS -> TIMESTAMP;
    - timestamp_ntz: TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet under
      Spark 4's NTZ inference — reinterpret as an instant (sessions run UTC,
      so the wall clock is unchanged and oracle parity holds);
    - timestamp: already the canonical type.
    LTZ is required downstream by withWatermark / unix_* and keeps batch and
    streaming reads of the same fixture type-identical."""
    from pyspark.sql import functions as F

    t = dict(df.dtypes).get(col)
    if t == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Filters/projections applied by callers reach the scan
    via Catalyst pushdown (verified in tests/test_plans.py)."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view so spark.sql(...) works."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
