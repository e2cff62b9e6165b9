"""Non-equi join strategies re-expressed as equi-joins.

Spark executes a raw theta join (|a.v - b.v| <= eps) as
BroadcastNestedLoopJoin — O(n*m) and a driver-killer at scale. The band
join here quantizes the join value into eps-width buckets and explodes one
side into its 3 candidate buckets (b-1, b, b+1): any pair within eps shares
a candidate bucket, so a hash equi-join on (bucket, *extra_keys) finds all
candidates and the exact predicate filters false positives. Cost drops
from O(n*m) to O(collisions-per-bucket) — the same binned-range-join
technique Databricks/Trino apply to interval joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    eps: float,
    extra_keys: list[str] | None = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs with |left.value - right.value| <= eps,
    optionally also equi-matched on `extra_keys`. Output columns are the
    left frame's renamed with suffixes[0] and right's with suffixes[1]
    (extra_keys emitted once, unsuffixed)."""
    extra_keys = extra_keys or []
    sl, sr = suffixes
    b = F.floor(F.col(value_col) / F.lit(eps)).cast("bigint")

    lhs = left.select(
        *[F.col(k) for k in extra_keys],
        F.explode(F.array(b - 1, b, b + 1)).alias("__bucket"),
        *[F.col(c).alias(f"{c}{sl}") for c in left.columns if c not in extra_keys],
    )
    rhs = right.select(
        *[F.col(k) for k in extra_keys],
        b.alias("__bucket"),
        *[F.col(c).alias(f"{c}{sr}") for c in right.columns if c not in extra_keys],
    )
    joined = lhs.join(rhs, on=["__bucket", *extra_keys]).drop("__bucket")
    exact: Column = (
        F.abs(F.col(f"{value_col}{sl}") - F.col(f"{value_col}{sr}")) <= F.lit(eps)
    )
    return joined.where(exact)
