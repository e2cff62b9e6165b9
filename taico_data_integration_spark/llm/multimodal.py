"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a `modality` tag and a
metadata struct. Decode/resize/frame-sample are Arrow-batched mapInPandas
stages; the actual media codecs are NOT in this container, so decode is
stubbed (deterministic fake features / NotImplementedError), while the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested.

Scale notes: payloads stay in executors (never collected); repartition by a
content-hash prefix before the decode stage so batches are size-balanced
even when a few assets are huge.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: wrap document text bytes as a fake 'image' payload so
    the binary plumbing is exercised end-to-end without media libs."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column. Pure-python
    hashing stands in for a decode step; batch shape and schema are the real
    production contract."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(_extract, schema=META_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def fake_feature_extract(media: DataFrame) -> DataFrame:
    """Deterministic stand-in for an image/audio feature extractor: 8 floats
    derived from the payload's md5 — the REAL contract (Arrow batches in,
    fixed-dim float vectors out, schema stable) with a fake kernel. A
    deployment swaps the kernel for CLIP/whisper/etc; nothing else changes.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def vec(b):
                if b is None:
                    return None
                h = hashlib.md5(bytes(b)).digest()
                return [(h[2 * i] * 256 + h[2 * i + 1]) / 65535.0 for i in range(FEATURE_DIM)]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": pdf["payload"].map(vec),
                }
            )

    return media.mapInPandas(_feat, schema=FEATURE_SCHEMA)


def repartition_for_decode(media: DataFrame, parallelism: int) -> DataFrame:
    """Balance decode batches by a content-hash prefix so a handful of huge
    assets can't skew one task (SCALE.md multimodal note)."""
    from pyspark.sql import functions as F

    return media.repartition(parallelism, F.crc32(F.col("payload")) % parallelism)


def resize_image(media: DataFrame, width: int, height: int):
    """Resize stage stub — same mapInPandas shape as extract; needs PIL."""
    raise NotImplementedError("image resize requires PIL/opencv, not present in this container")


def sample_video_frames(media: DataFrame, every_n_seconds: float):
    """Frame-sampling stub — real impl shells to ffmpeg per Arrow batch."""
    raise NotImplementedError("video frame sampling requires ffmpeg, not present in this container")


def decode_image(media: DataFrame):
    """Decode stage stub: the container has no image/audio libs. The real
    implementation plugs a PIL/ffmpeg call into the same mapInPandas shape.
    """
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; extract_metadata demonstrates the mapInPandas contract"
    )
