"""Slowly-changing-dimension Type 2 maintenance.

The reference maintains dimensions as SCD Type 1 mirrors — insert missing
rows, delete departed rows, no history (include/scripts/sync_data.py:224-273).
This module is the history-preserving generalization every warehouse build
eventually needs: an SCD2 dimension keeps one row per (key, version) with
``valid_from`` / ``valid_to`` / ``is_current``, closing the old version and
opening a new one whenever a tracked attribute changes.

Scale notes (100 TB): ``scd2_apply`` is ONE full-outer shuffle join between
the current slice of the dimension and the incoming snapshot, both keyed on
the natural key — no driver-side diffing, no per-row lookups. History rows
(``is_current = false``) never join; they are unioned back untouched, so the
join size is bounded by live-key cardinality, not history length. Attribute
comparison is null-safe (`eqNullSafe`) and stays inside whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, keys: list[str], attrs: list[str], effective_from: str) -> DataFrame:
    """Seed an SCD2 dimension from a first snapshot: every row current."""
    return snapshot.select(
        *keys,
        *attrs,
        F.lit(effective_from).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _changed(cur_prefix: str, inc_prefix: str, attrs: list[str]) -> Column:
    """Null-safe any-attribute-differs predicate."""
    diffs = [
        ~F.col(f"{cur_prefix}{a}").eqNullSafe(F.col(f"{inc_prefix}{a}")) for a in attrs
    ]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective_ts: str,
) -> DataFrame:
    """Merge a new snapshot into an SCD2 dimension.

    Semantics per natural key:
    - current version attrs unchanged  -> row kept as-is
    - attrs changed                    -> current row closed at ``effective_ts``
                                          (is_current=false) + new current row
    - key absent from snapshot         -> current row closed (soft delete)
    - key new in snapshot              -> new current row opened
    - historical rows (is_current=false) pass through untouched.
    """
    ts = F.lit(effective_ts).cast("date")
    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    # Explicit presence markers rather than null-checks on the first key
    # column: a row whose natural key is NULL joins nothing (SQL equality),
    # and a key-based null-check would route it to neither branch, silently
    # dropping it. With markers it lands in closed (NULL-keyed current row)
    # or opened (NULL-keyed snapshot row) like any other unmatched key.
    c = cur.select(
        *[F.col(k).alias(f"ck_{k}") for k in keys],
        *[F.col(a).alias(f"ca_{a}") for a in attrs],
        "valid_from",
        F.lit(True).alias("__in_cur"),
    )
    s = snapshot.select(
        *[F.col(k).alias(f"sk_{k}") for k in keys],
        *[F.col(a).alias(f"sa_{a}") for a in attrs],
        F.lit(True).alias("__in_snap"),
    )
    cond = reduce(
        lambda a, b: a & b, [c[f"ck_{k}"] == s[f"sk_{k}"] for k in keys]
    )
    j = c.join(s, cond, "full_outer")

    in_cur = F.coalesce(F.col("__in_cur"), F.lit(False))
    in_snap = F.coalesce(F.col("__in_snap"), F.lit(False))
    changed = _changed("ca_", "sa_", attrs)

    kept = j.where(in_cur & in_snap & ~changed).select(
        *[F.col(f"ck_{k}").alias(k) for k in keys],
        *[F.col(f"ca_{a}").alias(a) for a in attrs],
        F.col("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = j.where(in_cur & (~in_snap | changed)).select(
        *[F.col(f"ck_{k}").alias(k) for k in keys],
        *[F.col(f"ca_{a}").alias(a) for a in attrs],
        F.col("valid_from"),
        ts.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.where(in_snap & (~in_cur | changed)).select(
        *[F.col(f"sk_{k}").alias(k) for k in keys],
        *[F.col(f"sa_{a}").alias(a) for a in attrs],
        ts.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.select(*keys, *attrs, *SCD_COLS).unionByName(kept).unionByName(closed).unionByName(opened)


def scd2_as_of(dim: DataFrame, as_of: str) -> DataFrame:
    """Point-in-time slice: the version valid at ``as_of`` for each key."""
    d = F.lit(as_of).cast("date")
    return dim.where(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )
