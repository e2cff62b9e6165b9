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
    DoubleType,
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


# ---------------------------------------------------------------------------
# Real image codecs: 24-bit uncompressed BMP and binary PPM (P6), pure
# python/numpy — no PIL/opencv needed. These are genuine decoders (header
# parse, BMP 4-byte row padding, bottom-up row order), so the decode and
# resize stages below execute non-stubbed. Only video frame-sampling stays
# a stub (ffmpeg is genuinely absent from this container).


def encode_ppm(arr) -> bytes:
    """P6 PPM from an (h, w, 3) uint8 array."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr) -> bytes:
    """24-bit BI_RGB BMP from an (h, w, 3) uint8 RGB array — BGR pixel
    order, rows padded to 4 bytes, stored bottom-up (the classic quirks)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(a[y, :, ::-1].tobytes() + pad)  # RGB -> BGR
    pixels = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def decode_image_bytes(b: bytes):
    """(h, w, 3) uint8 array + format tag from BMP or PPM bytes."""
    import struct

    import numpy as np

    if b[:2] == b"BM":
        w, h = struct.unpack_from("<ii", b, 18)
        bpp, comp = struct.unpack_from("<HI", b, 28)
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
        (offset,) = struct.unpack_from("<I", b, 10)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=offset)
        img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
        return np.ascontiguousarray(img), "bmp"
    if b[:2] == b"P6":
        # header: magic, width, height, maxval — whitespace/comment tolerant
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":
                while b[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(b[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval: {maxval}")
        img = np.frombuffer(b, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)
        return img.copy(), "ppm"
    raise ValueError("unsupported image format (expected BMP or P6 PPM)")


DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def _decode_stats_batches(batches: Iterator[pd.DataFrame], resize_to=None) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("asset_id", "format", "width", "height", "n_channels", "mean_r", "mean_g", "mean_b")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            img, fmt = decode_image_bytes(bytes(payload))
            if resize_to is not None:
                tw, th = resize_to
                ys = (np.arange(th) * img.shape[0]) // th
                xs = (np.arange(tw) * img.shape[1]) // tw
                img = img[ys][:, xs]
            out["asset_id"].append(aid)
            out["format"].append(fmt)
            out["height"].append(img.shape[0])
            out["width"].append(img.shape[1])
            out["n_channels"].append(img.shape[2])
            means = img.reshape(-1, 3).mean(axis=0)
            out["mean_r"].append(float(means[0]))
            out["mean_g"].append(float(means[1]))
            out["mean_b"].append(float(means[2]))
        yield pd.DataFrame(out)


def decode_image(media: DataFrame) -> DataFrame:
    """Real decode stage: Arrow batches of BMP/PPM payloads -> per-asset
    dimensions and channel means. Same mapInPandas contract a PIL/CLIP
    deployment would use; only the kernel differs."""
    return media.mapInPandas(lambda it: _decode_stats_batches(it), schema=DECODED_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode + nearest-neighbor resize (pure numpy indexing), emitting the
    post-resize stats. Payloads never leave executors."""
    return media.mapInPandas(
        lambda it: _decode_stats_batches(it, resize_to=(width, height)), schema=DECODED_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n_seconds: float):
    """Frame-sampling stub — real impl shells to ffmpeg per Arrow batch;
    ffmpeg is not present in this container."""
    raise NotImplementedError("video frame sampling requires ffmpeg, not present in this container")


def documents_as_decodable_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: deterministic BMP/PPM images derived from doc_id
    (even ids -> BMP, odd -> PPM; dims and constant channel fills are pure
    doc_id arithmetic), so a SQL oracle can predict the decode output in
    closed form while the decoder genuinely parses bytes."""
    import numpy as np

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for d in pdf[id_col].astype(int):
                w, h = 8 + d % 9, 4 + d % 7
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[:, :, 0] = (d * 37) % 256
                arr[:, :, 1] = (d * 59) % 256
                arr[:, :, 2] = (d * 83) % 256
                if d % 2 == 0:
                    payloads.append(encode_bmp(arr))
                    mimes.append("image/bmp")
                else:
                    payloads.append(encode_ppm(arr))
                    mimes.append("image/x-portable-pixmap")
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    return df.select(id_col).mapInPandas(_render, schema=MEDIA_SCHEMA)
