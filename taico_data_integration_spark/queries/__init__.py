"""Query registry for the driver correctness gate.

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, sql]`` (DuckDB-runnable ANSI SQL over the same
fixture tables). Names without an ORACLE entry get the driver's weaker
rows-only check (genuinely non-SQL-expressible ops).

Hash-parity rules used throughout (see SURVEY.md §5, §7.4):
- Money aggregation in exact DECIMAL, cast to DOUBLE only at the output edge
  (IEEE decimal->double conversion is correctly rounded in both engines).
- Ratios = double division of exact values, then round(…, 6).
- Never output raw event timestamps (ns parquet vs µs Spark); format to
  seconds or truncate to date/hour.
- Every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    core,
    curation,
    extended,
    facebook,
    insights,
    llm,
    retail,
    sync,
    tpch_deep,
    tpch_extra,
    warehouse,
)

_MODULES = (
    core,
    tpch_extra,
    tpch_deep,
    sync,
    retail,
    facebook,
    extended,
    llm,
    curation,
    warehouse,
    insights,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _MODULES:
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
