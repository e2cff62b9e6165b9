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


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for additive rollups: fold a new
    micro-batch's partial aggregate into the stored rollup without touching
    historical input. Works because every metric is a SUM/COUNT over exact
    types (DECIMAL/LONG) — commutative and associative, so
    rollup(all) == merge_rollup(rollup(old), rollup(new)) exactly
    (asserted in tests/test_ops.py). At 100 TB this is the difference
    between re-aggregating the full history per batch and shuffling only
    the delta's key space (union's map side sees |delta| + |existing|
    rollup rows, never raw history)."""
    u = existing.select(*keys, *sum_cols).unionByName(delta.select(*keys, *sum_cols))
    return u.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in sum_cols])
