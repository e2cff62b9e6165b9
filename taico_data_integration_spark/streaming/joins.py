"""Stream-stream joins and streaming deduplication.

- interval_join: two watermarked streams equi-joined on a key with an
  event-time interval condition (the streaming form of the as-of/funnel
  correlations). State is bounded by the watermark + interval width.
- stream_dedup: watermarked dropDuplicates — the streaming twin of exact
  dedup; state holds one entry per key within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of `left` matched with `right` rows of the same key whose ts is
    within [left.ts - interval, left.ts]."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.ts >= l.ts - INTERVAL {interval} AND r.ts <= l.ts"
    )
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
    )
