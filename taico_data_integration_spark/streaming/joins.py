"""Stream-stream joins and streaming deduplication.

- interval_join: two watermarked streams equi-joined on a key with an
  event-time interval condition (the streaming form of the as-of/funnel
  correlations). State is bounded by the watermark + interval width.
- stream_dedup: watermarked dropDuplicates — the streaming twin of exact
  dedup; state holds one entry per key within the watermark horizon.
- stream_lsh_dedup_against_index: stream-STATIC join — arriving documents'
  MinHash band keys probe a static corpus band index. Stateless (no
  watermark needed for an inner stream-static join), so ingestion-time
  near-dup flagging scales with batch size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_lsh_dedup_against_index(
    doc_stream: DataFrame,
    corpus_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming twin of queries.llm.dedup_incremental_lsh: each micro-batch
    of arriving documents computes its own band keys (pure Column exprs, so
    the same minhash code runs on a streaming frame) and inner-joins the
    STATIC corpus band index. Emits (new_doc_id, corpus_doc_id, band_id)
    collision rows in append mode — a stateless stream-static join, no
    watermark or state store required. Downstream either verifies jaccard in
    foreachBatch or feeds a quarantine table."""
    from ..llm.dedup import minhash_band_keys_fast

    new_bands = minhash_band_keys_fast(
        doc_stream, text_col, id_col, k, num_hashes, bands, rows_per_band
    ).select(F.col(id_col).alias("new_doc_id"), "band_id", "band_key")
    corp = corpus_bands.select(
        F.col(id_col).alias("corpus_doc_id"), "band_id", "band_key"
    )
    return new_bands.join(corp, ["band_id", "band_key"]).select(
        "new_doc_id", "corpus_doc_id", "band_id"
    )


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of `left` matched with `right` rows of the same key whose ts is
    within [left.ts - interval, left.ts]."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.ts >= l.ts - INTERVAL {interval} AND r.ts <= l.ts"
    )
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
    )
