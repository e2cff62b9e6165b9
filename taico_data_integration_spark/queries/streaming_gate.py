"""Driver-gated streaming entries (VERDICT r2 'Next round' #6).

The streaming operators were pytest-verified against batch twins but absent
from the oracle gate (DuckDB cannot run a stream). These entries close that
gap: each one executes a REAL Structured Streaming job (availableNow
trigger, bounded replay of the fixture) through the exact code paths in
``taico_data_integration_spark.streaming`` and returns the materialized
result, which the driver hash-compares against the same ANSI-SQL oracle as
the batch twin. The streaming plan, watermarking, memory/foreachBatch sinks
and checkpoint handling all run under the correctness gate — not just in
unit tests.

Determinism notes:
- ``stream_tumbling_events`` runs in complete mode over one bounded replay,
  so the watermark never drops rows and the result equals the batch window
  aggregation bit-for-bit.
- ``stream_merge_orders`` replays two micro-batches (base load, then the
  update slice) through the SAME checkpoint — the second availableNow run
  picks up only the new file, exercising checkpoint recovery — and merges
  each batch into a versioned TableStore via foreachBatch (M5 streaming
  form). Batch order is deterministic by construction (the update file does
  not exist during the first run).
- ``stream_dedup_events`` projects only the dedup keys: WHICH physical row
  survives a streaming dropDuplicates depends on arrival order, but the
  surviving key set does not.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.incremental_stream import (
    run_to_memory,
    stream_events,
    stream_merge_into,
    tumbling_counts,
)
from ._util import T


def _mem_name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:10]}"


def stream_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of queries.core.tumbling_events, executed as a real
    watermarked streaming aggregation (incremental_stream.tumbling_counts)
    into a memory sink."""
    name = _mem_name("stream_tumbling")
    run_to_memory(tumbling_counts(stream_events(spark, sf_dir)), name, output_mode="complete")
    return spark.table(name)


def stream_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming M5: foreachBatch merge replayed over two micro-batches ==
    the merge_upsert_orders oracle. Micro-batch 1 loads the base orders,
    micro-batch 2 (a second availableNow run on the same checkpoint) merges
    the repriced 1999+ slice on o_orderkey via streaming.stream_merge_into."""
    from ..ops.incremental import TableStore

    o = T(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = o.where(F.col("o_orderdate") < F.to_timestamp(F.lit("2000-01-01"))).select(*cols)
    updates = (
        o.where(F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01")))
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1).cast("double"))
        .select(*cols)
    )

    work = tempfile.mkdtemp(prefix="taico_stream_merge_")
    arrivals = os.path.join(work, "arrivals")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(arrivals)
    store = TableStore(spark, os.path.join(work, "store"))

    def _deliver(df: DataFrame, label: str) -> None:
        """Land df's parquet files FLAT in the arrivals dir (the file stream
        source does not recurse into non-partition subdirectories)."""
        import glob
        import shutil

        staging = os.path.join(work, f"stage_{label}")
        df.write.parquet(staging)
        for i, f in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
            shutil.move(f, os.path.join(arrivals, f"{label}_{i:04d}.parquet"))
        shutil.rmtree(staging)

    def _run_pass() -> None:
        stream = (
            spark.readStream.schema(base.schema).format("parquet").load(arrivals)
        )
        stream_merge_into(stream, store, "orders_merged", ["o_orderkey"], ckpt)

    _deliver(base, "batch0")
    _run_pass()
    _deliver(updates, "batch1")
    _run_pass()
    # two micro-batches -> two versions in the store (base load + merge);
    # a hard check (not assert) so -O runs still validate the replay shape
    n_versions = len(store.history("orders_merged"))
    if n_versions != 2:
        raise RuntimeError(
            f"stream_merge_orders: expected 2 micro-batch versions, got {n_versions}"
        )
    return store.read("orders_merged")


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates (streaming.joins.stream_dedup) over the
    events replay; the surviving (user_id, event_type) key set equals
    batch DISTINCT."""
    from ..streaming.joins import stream_dedup

    name = _mem_name("stream_dedup")
    out = stream_dedup(stream_events(spark, sf_dir), ["user_id", "event_type"])
    run_to_memory(out, name, output_mode="append")
    return spark.table(name).select("user_id", "event_type")


STREAM_TUMBLING_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""

STREAM_MERGE_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
                         WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
"""

STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""

QUERIES = {
    "stream_tumbling_events": stream_tumbling_events,
    "stream_merge_orders": stream_merge_orders,
    "stream_dedup_events": stream_dedup_events,
}

ORACLE = {
    "stream_tumbling_events": STREAM_TUMBLING_SQL,
    "stream_merge_orders": STREAM_MERGE_SQL,
    "stream_dedup_events": STREAM_DEDUP_SQL,
}
