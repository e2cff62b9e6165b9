"""Change-data-capture changelog application.

The reference's incremental paths replay inserts one row at a time and
re-derive deletes by full diff (include/scripts/sync_data.py:242-273);
its merge path is insert-or-replace keyed on unique_key
(dbt incremental models, SURVEY.md §2.9 M5). This module is the general
form both reduce to: an ordered changelog of (op ∈ {I,U,D}, seq, key,
payload) collapsed to final table state — the same contract Debezium/JDBC
CDC feeds and Delta/Iceberg merge sinks use.

Scale notes (100 TB): collapsing is ONE hash shuffle on the key plus a
per-key sort over that key's changelog entries (window row_number). No
driver state; skewed keys only cost what their own entry count costs.
For streaming the same collapse runs per micro-batch through
``streaming.stream_merge_into`` (foreachBatch merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_collapse(
    changelog: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Latest-op-wins collapse of a CDC changelog to final state.

    Rows whose winning op is ``D`` disappear; otherwise the winning row's
    payload is the final row. ``seq_col`` must totally order each key's
    entries (commit LSN / binlog offset / kafka offset).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != F.lit("D")))
        .drop("__rn")
    )


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a collapsed changelog onto an existing base table.

    Base rows act as seq=-inf inserts: a changelog winner replaces the base
    row (U/I) or deletes it (D); untouched base rows pass through.
    """
    win = cdc_collapse(changelog, keys, seq_col, op_col)
    touched = changelog.select(*keys).distinct()
    untouched = base.join(touched, on=keys, how="left_anti")
    return untouched.unionByName(win.drop(seq_col, op_col), allowMissingColumns=False)
