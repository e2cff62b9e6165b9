"""Grouped-map operators (SURVEY.md §2.11): the reference's per-DataFrame
pandas validators/transforms become either window expressions (preferred,
JVM-side) or Arrow-batched applyInPandas (escape hatch). Both forms of the
canonical example — per-group z-score normalization — live here; the test
suite asserts they agree, and the window form carries the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_window(df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore") -> DataFrame:
    """Per-group z-score via window aggregates — no Python in the path.
    Sample stddev (n-1 denominator) to match pandas' default."""
    w = Window.partitionBy(group_col)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.withColumn(out_col, F.round((F.col(value_col) - mean) / std, 6))


def zscore_apply_in_pandas(df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore") -> DataFrame:
    """Same semantics through applyInPandas (grouped map) — the shape used
    when the per-group logic needs real Python (model scoring, scipy, ...).
    Groups must fit in executor memory; at 100 TB that means grouping keys
    chosen with bounded fan-in (user, doc, session — not global)."""
    from pyspark.sql.types import StructType

    # copy before add(): StructType.add mutates in place, which would
    # corrupt df.schema itself
    out_schema = StructType(list(df.schema.fields)).add(out_col, "double")

    def _norm(pdf):
        v = pdf[value_col]
        std = v.std()  # pandas default ddof=1, matches stddev_samp
        pdf = pdf.copy()
        pdf[out_col] = ((v - v.mean()) / std).round(6)
        return pdf

    return df.groupBy(group_col).applyInPandas(_norm, schema=out_schema)


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """As-of join (strictly-before, backward) via cogroup + applyInPandas:
    both sides co-partition by ``key``, each key's two groups meet in one
    pandas ``merge_asof``. This is the API shape for per-key two-frame
    custom logic Spark lacks a built-in for; at scale the cost is one
    co-partitioning shuffle of each side, and per-key groups must fit in
    executor memory (same contract as applyInPandas).

    The window-carry formulation in queries/extended.py
    (asof_last_click_before_purchase) is the pure-JVM alternative when the
    right side's payload is small; this one generalizes to wide payloads
    and tolerance semantics via pandas.
    """
    from pyspark.sql.types import StructType

    # Lineage break: when both sides derive from the SAME plan (the common
    # "filter one scan two ways" shape), Spark's binary-node attribute
    # de-duplication rewrites one side's exprIds and the cogroup's Python
    # projection then drops every non-grouping column from that side
    # (observed: right pdf arriving with only the key column). An explicit
    # alias projection mints fresh output exprIds on each side, which keeps
    # the cogroup attribute mapping intact. Plan-only; no extra job.
    left = left.select(*[F.col(c).alias(c) for c in left.columns])
    right = right.select(*[F.col(c).alias(c) for c in right.columns])

    out_schema = StructType(list(left.schema.fields))
    for c in value_cols:
        out_schema = out_schema.add(c + suffix, right.schema[c].dataType)
    int_types = {"tinyint", "smallint", "int", "bigint"}
    int_cols = [
        c + suffix for c in value_cols if right.schema[c].dataType.simpleString() in int_types
    ]

    def _merge(lpdf, rpdf):
        import pandas as pd

        # cogroup hands an EMPTY, column-less frame for a key absent from
        # one side (keys live in the union of both sides) — guard both.
        if len(lpdf) == 0:
            return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
        assert ts_col in lpdf.columns and (len(rpdf) == 0 or ts_col in rpdf.columns), (
            f"cogroup column loss: left={list(lpdf.columns)} right={list(rpdf.columns)}"
        )
        lpdf = lpdf.sort_values(ts_col)
        if len(rpdf) == 0:
            out = lpdf.copy()
            for c in value_cols:
                out[c + suffix] = pd.Series([None] * len(out), index=out.index, dtype="object")
        else:
            rpdf = rpdf.sort_values(ts_col)[[ts_col, *value_cols]].rename(
                columns={c: c + suffix for c in value_cols}
            )
            out = pd.merge_asof(
                lpdf, rpdf, on=ts_col, direction="backward", allow_exact_matches=False
            )
        for c in int_cols:  # NaN-padded ints arrive as float64; restore nullable ints
            out[c] = out[c].astype("Int64")
        return out

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(_merge, schema=out_schema)
    )
