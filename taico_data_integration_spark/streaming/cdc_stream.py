"""Streaming CDC apply: a changelog stream (op I/U/D + seq) folded into the
versioned table store per micro-batch.

Completes the CDC story from ops/cdc.py for streams — the shape a
Debezium/Kafka topic feeds: each micro-batch is collapsed latest-op-wins
FIRST (so a key churning within one batch costs one row), then applied to
the stored table: winners upsert, deletes remove. Replaying the same
batches yields the same table (idempotent per key+seq), which is what makes
checkpoint recovery safe.

Scale notes: the per-batch collapse shuffles only the batch (bounded by
trigger size); the apply is one anti-join + union against the current
version keyed on the entity id. With Delta this whole foreachBatch body is
`MERGE INTO ... WHEN MATCHED AND op='D' THEN DELETE`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.cdc import cdc_collapse
from ..ops.formats import TableFormat


def stream_cdc_apply(
    changelog: DataFrame,
    store: TableFormat,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """foreachBatch CDC fold into `store`/`table`. The stored table carries
    the payload columns (changelog minus op/seq)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        win = cdc_collapse(batch_df, keys, seq_col=seq_col, op_col=op_col)
        upserts = win.drop(seq_col, op_col)
        if not store.exists(table):
            store.write(table, upserts)
            return
        target = store.read(table)
        # remove every key the batch touched (updated, re-inserted, deleted)
        touched = batch_df.select(*keys).distinct()
        kept = target.join(touched, on=keys, how="left_anti")
        store.write(table, kept.unionByName(upserts.select(*target.columns)))

    q = (
        changelog.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
