"""Connector-style sources and sinks (SURVEY.md §2.1 S1-S16).

The reference moves data between BigQuery, Postgres, CSV files, Google
Sheets and Airbyte connector outputs. This module is the engine's uniform
boundary for those: every source yields a DataFrame, every sink consumes
one; downstream operators never know the format.

| reference op | here |
|---|---|
| S1 BigQuery SQL scan        | `sql_source` (spark.sql over registered views; `spark.read.format('bigquery')` in a deployment) |
| S6 Postgres scan            | `jdbc_source` (predicate-pushing `spark.read.jdbc`) |
| S7/S8 Postgres sinks        | `jdbc_sink` (set-based `df.write.jdbc`, never row loops) |
| S10/S11 CSV scan/sink       | `read_csv` / `write_csv` |
| S12/S13 GCS/object storage  | same parquet/csv calls against `gs://` URIs |
| S14 Airbyte connector       | `fixture_source` (connector output stand-in) |

JDBC paths are tested end-to-end against Apache Derby (embedded RDBMS
shipped inside Spark's own jars): set-based write, filter-pushed read, and
predicate-partitioned parallel read — see tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .catalog import load_table


def fixture_source(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S14: connector output stand-in — the registry maps a connector name
    to its latest landed batch (here: the driver's parquet fixtures)."""
    return load_table(spark, sf_dir, name)


def sql_source(spark: SparkSession, query: str) -> DataFrame:
    """S1: SQL-string IR executed by the engine (the reference hands these
    to BigQuery; Spark SQL runs them nearly verbatim)."""
    return spark.sql(query)


def read_csv(spark: SparkSession, path: str, schema: StructType | None = None, header: bool = True) -> DataFrame:
    """S10: explicit schema preferred — inferSchema costs an extra pass and
    is unstable for oracle comparison."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """S11: distributed CSV sink (one file per partition; coalesce upstream
    if a single file is required)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-per-row text source (``value`` column); ``whole=True`` reads one
    row per file — the raw-document ingestion path for corpus pipelines."""
    reader = spark.read
    if whole:
        reader = reader.option("wholetext", "true")
    return reader.text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-string-column sink (Spark requires exactly one string col)."""
    df.write.mode(mode).text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Primary warehouse sink: partition by date/company for pruning
    (SURVEY.md §4 partitioning strategy)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """S6: parameterized, tenant-filtered reads (dags/etl.py:74-76) become
    predicate-pushed JDBC partitions — each predicate is one parallel read."""
    return spark.read.jdbc(url, table, predicates=predicates, properties=properties or {})


def jdbc_sink(df: DataFrame, url: str, table: str, mode: str = "append", properties: dict | None = None) -> None:
    """S7/S8: the reference's one-INSERT-per-row loops
    (include/scripts/sync_data.py:250-252) become one distributed write;
    pair with ops.dims.new_values for insert-if-not-exists semantics."""
    df.write.jdbc(url, table, mode=mode, properties=properties or {})
