"""Cross-table hard deletion (M8 generalized): remove every row belonging
to a set of subject keys from every table that carries them — the
GDPR-erasure shape of the reference's delete-by-predicate
(include/scripts/sync_data.py:159-164, :264-268).

Each table is rewritten as one left-anti join against the (small,
broadcast) key set and lands as a NEW TableStore version, so the erasure is
atomic per table and auditable/rollbackable. On date/tenant-partitioned
storage, add a partition predicate to touch only affected partitions.

For a SINGLE-column key on an unpartitioned TableStore table, prefer
``TableStore.delete_in`` (round 8): it finds the affected files with the
stats+bloom manifests and rewrites ONLY those, hard-linking every other
file into the new version — at 100 TB that is the difference between
rewriting the table and rewriting the handful of files the subjects
actually live in. This module remains the general path (multi-column
keys, partition-dir layouts, any TableFormat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .formats import TableFormat


def delete_keys(df: DataFrame, keys: DataFrame, key_cols: dict[str, str]) -> DataFrame:
    """Rows of df whose key (df column -> keys column mapping) is absent
    from `keys`. key_cols maps df columns to keys-frame columns."""
    cond = None
    for df_col, key_col in key_cols.items():
        c = df[df_col] == keys[key_col]
        cond = c if cond is None else cond & c
    return df.join(F.broadcast(keys), cond, "left_anti")


def erase_subjects(
    store: TableFormat,
    subject_keys: DataFrame,
    table_key_cols: dict[str, dict[str, str]],
) -> dict[str, dict]:
    """Erase subjects from every listed table. table_key_cols:
    {table: {df_col: keys_col}}. Returns per-table before/after counts."""
    report: dict[str, dict] = {}
    for table, mapping in table_key_cols.items():
        df = store.read(table)
        before = df.count()
        cleaned = delete_keys(df, subject_keys, mapping)
        store.write(table, cleaned)
        after = store.read(table).count()
        report[table] = {"before": before, "after": after, "deleted": before - after}
    return report
