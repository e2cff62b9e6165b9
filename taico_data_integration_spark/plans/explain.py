"""Physical-plan introspection helpers — the engine's `.explain` feedback
loop (SCALE.md ground rules). Used by tests/test_plans.py and
tools/plan_report.py to pin the plan properties that matter at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

JOIN_KINDS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved if executed) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def join_kinds(df: DataFrame) -> list[str]:
    return re.findall("|".join(JOIN_KINDS), executed_plan(df))


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale cost driver."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", executed_plan(df)))


def has_partial_aggregation(df: DataFrame) -> bool:
    return "partial" in executed_plan(df).lower()


def plan_summary(df: DataFrame) -> dict:
    return {
        "joins": join_kinds(df),
        "exchanges": exchange_count(df),
        "partial_agg": has_partial_aggregation(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
    }
