"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False) -> DataFrame:
    return load_table(spark, sf_dir, name, fan_out=fan_out)


def dec2(col: str | Column, precision: int = 18) -> Column:
    """Money double -> exact DECIMAL(p,2). Fixture money columns carry
    exactly 2 decimals, so this cast is lossless and both engines agree."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},2)")


def as_double(col: Column) -> Column:
    return col.cast("double")


def one() -> Column:
    """Literal 1 as DECIMAL(4,2) (built lazily — Columns need a live session)."""
    return F.lit(1).cast("decimal(4,2)")
