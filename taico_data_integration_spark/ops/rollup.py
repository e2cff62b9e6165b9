"""Cascading time-grain rollups (hypertable-style continuous aggregates).

The reference's only time handling is schedule-based micro-batch; at 100 TB
the right shape is: aggregate the raw stream ONCE at the finest grain, then
derive every coarser grain from the next-finer one (minute -> hour -> day).
Each cascade step reduces input by ~60x, so the day rollup reads the hour
rollup (tiny), never the raw events. Sums cascade exactly because values
are aggregated as DECIMAL (associative), not DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cascade_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dims: tuple[str, ...] = ("event_type",),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(minute, hour, day) rollups, each derived from the previous grain."""
    v = F.col(value_col).cast("decimal(18,2)")
    minute = (
        events.groupBy(
            F.date_trunc("minute", F.col(ts_col)).alias("minute_ts"), *dims
        ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(v).alias("total_value"))
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "minute_ts").alias("hour_ts"), *dims)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
            F.count(F.lit(1)).alias("n_active_minutes"),
        )
    )
    day = (
        hour.groupBy(F.to_date("hour_ts").alias("event_date"), *dims)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
    )
    return minute, hour, day
