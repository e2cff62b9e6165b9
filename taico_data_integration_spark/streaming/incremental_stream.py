"""Structured Streaming re-expression of the reference's incremental story
(SURVEY.md §2.10): the batch watermark merge (M5/A4,
main_taico_staging.sql:68-70) becomes readStream -> withWatermark ->
windowed aggregation / foreachBatch merge.

The reference has no true streaming — its 'real-time' is hourly Airflow
micro-batch; this module is the native-streaming upgrade path. At scale the
same code runs against Kafka/file-arrival sources; state lives in the
streaming state store, checkpointed.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_runtime_confs
from ..ops.formats import TableFormat
from ..ops.incremental import merge_upsert


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture. The parquet carries
    TIMESTAMP(NANOS) (read as long, converted to micros like the batch
    catalog), so batch and stream plans share dtypes."""
    ensure_runtime_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file stream source requires a directory; expose the read-only
    # fixture file through a symlink directory (a stand-in for the
    # arrival directory / Kafka topic a deployment would stream from).
    link_dir = os.path.join(
        tempfile.gettempdir(), "taico_stream", hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = spark.readStream.schema(static.schema).format("parquet").load(link_dir)
    from ..catalog import normalize_event_ts

    return normalize_event_ts(stream)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents fixture (same symlink-directory
    trick as stream_events) — stands in for the arrival feed of an
    ingestion pipeline."""
    ensure_runtime_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    link_dir = os.path.join(
        tempfile.gettempdir(), "taico_stream_docs", hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/documents.parquet", link)
    return spark.readStream.schema(static.schema).format("parquet").load(link_dir)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    queries.core.tumbling_events; late rows beyond the watermark drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Watermarked sliding-window aggregation — the streaming twin of
    queries.core.sliding_events (every event lands in window/slide
    overlapping windows; state is bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Execute with availableNow (bounded) into a memory sink; returns the
    finished query. Test/demo harness for bounded replays."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_merge_into(
    events: DataFrame,
    store: TableFormat,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
):
    """foreachBatch incremental merge: each micro-batch MERGEs into the
    versioned table store on `keys` — the streaming form of the dbt
    incremental model (M5). With Delta this is `MERGE INTO` per batch."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not store.exists(table):
            store.write(table, batch_df)
        else:
            target = store.read(table)
            store.write(table, merge_upsert(target, batch_df.select(*target.columns), keys))

    q = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
