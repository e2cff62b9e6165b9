"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001.
queries()     -> every implemented operator from SURVEY.md §2 + LLM ops.
oracle_sql()  -> DuckDB-equivalent SQL per query (hash-compared at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from taico_data_integration_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary on sf0.001."""
    from taico_data_integration_spark.queries.core import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
