"""Survivorship / golden-record consolidation.

The master-data step a data-integration platform needs once the same
entity arrives from several feeds: collapse all records of a key to ONE
row that keeps the most recent value of each tracked field plus lifetime
aggregates. The reference's mirror-sync keeps only latest-state rows
(include/scripts/sync_data.py:224-273); this preserves that contract while
adding the aggregate fields a profile table carries.

Scale notes (100 TB): ONE hash shuffle on the entity key. The latest-row
pick and every lifetime aggregate run as windows over the SAME partitioning
(Spark reuses the single sort/exchange), so adding aggregate fields is free
of extra shuffles — unlike the groupBy-plus-self-join formulation, which
shuffles twice and joins. Ordering must be made unique via tiebreak columns
(ts alone collides at scale; pass a monotonic id too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    latest_fields: list[str],
    lifetime_aggs: dict[str, Column],
) -> DataFrame:
    """One row per key: `latest_fields` taken from the top row under
    `order_by` (descending priority list, MUST be collision-free),
    `lifetime_aggs` computed over the whole key partition."""
    w_order = Window.partitionBy(*keys).orderBy(*order_by)
    w_all = Window.partitionBy(*keys)
    cols = [F.row_number().over(w_order).alias("__rn")]
    cols += [F.col(f) for f in latest_fields]
    cols += [expr.over(w_all).alias(name) for name, expr in lifetime_aggs.items()]
    out = df.select(*keys, *cols)
    return out.where(F.col("__rn") == 1).drop("__rn")
