"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a `modality` tag and a
metadata struct. Decode/resize/frame-sample are Arrow-batched mapInPandas
stages. Image decode (BMP/PPM) and video frame-sampling (YUV4MPEG2) are
REAL pure-numpy codecs — header parse, stride/padding, plane offsets —
because those formats are uncompressed; compressed codecs (JPEG/H.264)
would slot into the same kernels but need libs absent from this container.
The Spark-side plumbing — schema, batch iteration, partitioning — is the
production contract either way.

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
# resize stages below execute non-stubbed. Video frame-sampling is likewise
# real over YUV4MPEG2 (see encode_y4m/decode_y4m_bytes below).


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


def _decode_bmp(b: bytes):
    import struct

    import numpy as np

    w, h = struct.unpack_from("<ii", b, 18)
    bpp, comp = struct.unpack_from("<HI", b, 28)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
    (offset,) = struct.unpack_from("<I", b, 10)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    return np.ascontiguousarray(img)


def _decode_ppm(b: bytes):
    import numpy as np

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
    return img.copy()


# Codec-kernel registry: the seam a real deployment uses to plug in
# compressed codecs (JPEG via PIL/libjpeg, H.264 via ffmpeg) WITHOUT
# touching any Spark plumbing — the mapInPandas batching, output schema and
# content-hash partitioning are codec-agnostic. `sniff(bytes) -> bool`
# selects the codec (insertion order, first match wins); `decode(bytes) ->
# (h, w, 3) uint8 array` is the kernel. decode_image/resize_image snapshot
# the registry at plan-build time so runtime registrations reach executors
# through the serialized closure (module state on a fresh Python worker
# only has the built-ins).
_IMAGE_CODECS: dict[str, tuple] = {}


def register_image_codec(name: str, sniff, decode) -> None:
    _IMAGE_CODECS[name] = (sniff, decode)


def unregister_image_codec(name: str) -> None:
    _IMAGE_CODECS.pop(name, None)


def _decode_jpeg_kernel(b: bytes):
    from .jpeg import decode_jpeg

    return decode_jpeg(b)


register_image_codec("bmp", lambda b: b[:2] == b"BM", _decode_bmp)
register_image_codec("ppm", lambda b: b[:2] == b"P6", _decode_ppm)
# real compressed codec (pure-numpy baseline JPEG, llm/jpeg.py) — the
# round-2 "compressed media" gap, closed through the same registry seam
register_image_codec("jpeg", lambda b: b[:2] == b"\xff\xd8", _decode_jpeg_kernel)


def decode_image_bytes(b: bytes, codecs: dict | None = None):
    """(h, w, 3) uint8 array + format tag, dispatched via the codec
    registry (built-ins: 24-bit BMP, binary PPM)."""
    for name, (sniff, dec) in (codecs or _IMAGE_CODECS).items():
        if sniff(b):
            return dec(b), name
    raise ValueError("no registered image codec matched the payload")


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


def _decode_stats_batches(
    batches: Iterator[pd.DataFrame], resize_to=None, codecs: dict | None = None
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("asset_id", "format", "width", "height", "n_channels", "mean_r", "mean_g", "mean_b")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            img, fmt = decode_image_bytes(bytes(payload), codecs)
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
    """Real decode stage: Arrow batches of registered-codec payloads ->
    per-asset dimensions and channel means. Same mapInPandas contract a
    PIL/CLIP deployment would use; only the registered kernel differs."""
    codecs = dict(_IMAGE_CODECS)  # snapshot ships in the closure
    return media.mapInPandas(
        lambda it: _decode_stats_batches(it, codecs=codecs), schema=DECODED_SCHEMA
    )


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode + nearest-neighbor resize (pure numpy indexing), emitting the
    post-resize stats. Payloads never leave executors."""
    codecs = dict(_IMAGE_CODECS)
    return media.mapInPandas(
        lambda it: _decode_stats_batches(it, resize_to=(width, height), codecs=codecs),
        schema=DECODED_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Real video codec: YUV4MPEG2 (.y4m), the standard uncompressed video
# container (mjpegtools/ffmpeg interchange format). Header + raw YUV planes,
# so a genuine pure-numpy parser needs no ffmpeg. Supports C444 (full-res
# chroma) and C420 (2x2-subsampled chroma) colorspaces.


def encode_y4m(frames, fps=(5, 1), colorspace: str = "C444") -> bytes:
    """YUV4MPEG2 bytes from a list of (y, u, v) uint8 plane arrays. For C444
    all planes are (h, w); for C420 chroma planes are (h//2, w//2)."""
    import numpy as np

    y0 = np.asarray(frames[0][0], dtype=np.uint8)
    h, w = y0.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps[0], fps[1], colorspace.encode())]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, dtype=np.uint8).tobytes())
        out.append(np.asarray(u, dtype=np.uint8).tobytes())
        out.append(np.asarray(v, dtype=np.uint8).tobytes())
    return b"".join(out)


def decode_y4m_bytes(b: bytes):
    """Parse YUV4MPEG2 bytes -> (frames, fps) where frames is a list of
    (y, u, v) uint8 arrays and fps is a (num, den) tuple. Genuine container
    parse: tagged header params, per-frame FRAME markers (with optional
    frame parameters), plane sizes from the colorspace tag."""
    import numpy as np

    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    eol = b.index(b"\n")
    w = h = None
    fps = (25, 1)
    chroma = "C420"
    for tag in b[9:eol].split():
        key, val = tag[:1], tag[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C":
            chroma = tag.decode()
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if chroma.startswith("C444"):
        cw, ch = w, h
    elif chroma.startswith("C420"):
        cw, ch = w // 2, h // 2
    else:
        raise ValueError(f"unsupported y4m colorspace: {chroma}")
    y_sz, c_sz = w * h, cw * ch
    frames = []
    pos = eol + 1
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = b.index(b"\n", pos) + 1  # FRAME line may carry parameters
        y = np.frombuffer(b, dtype=np.uint8, count=y_sz, offset=pos).reshape(h, w)
        u = np.frombuffer(b, dtype=np.uint8, count=c_sz, offset=pos + y_sz).reshape(ch, cw)
        v = np.frombuffer(b, dtype=np.uint8, count=c_sz, offset=pos + y_sz + c_sz).reshape(ch, cw)
        frames.append((y, u, v))
        pos += y_sz + 2 * c_sz
    return frames, fps


# -- Motion-JPEG AVI: the compressed-video path. Each frame is a baseline
# JPEG (llm/jpeg.py) inside a minimal RIFF AVI container (hdrl with
# avih/strh/strf, movi with 00dc chunks) — the classic camera/webcam
# format. The decoder walks the RIFF tree, JPEG-decodes each 00dc/00db
# chunk and converts to (y, u, v) planes so the frame-sampling stage is
# codec-agnostic (decode_video_bytes dispatches y4m vs AVI by magic).


def encode_mjpeg_avi(frames_rgb, fps: int = 5, quality: int = 85) -> bytes:
    """RIFF AVI bytes with one baseline-JPEG '00dc' chunk per (h, w, 3)
    uint8 RGB frame."""
    import struct

    import numpy as np

    from .jpeg import encode_jpeg

    frames_rgb = [np.asarray(f, dtype=np.uint8) for f in frames_rgb]
    h, w, _ = frames_rgb[0].shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames_rgb]

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(payloads), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(payloads), 0, 0, -1)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi_bytes(b: bytes):
    """Parse RIFF AVI M-JPEG bytes -> (frames, fps) with frames as
    (y, u, v) uint8 plane tuples (BT.601 from the decoded RGB) and fps a
    (num, den) tuple — the same contract as decode_y4m_bytes."""
    import struct

    import numpy as np

    from .jpeg import decode_jpeg

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    fps = (25, 1)
    payloads: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps
        pos = start
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (sz,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + sz)
            elif cid == b"strh" and b[body_start : body_start + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", b, body_start + 20)
                if scale and rate:
                    fps = (rate, scale)
            elif cid[2:] in (b"dc", b"db"):
                payloads.append(b[body_start : body_start + sz])
            pos = body_start + sz + (sz & 1)

    walk(12, 8 + struct.unpack_from("<I", b, 4)[0])
    frames = []
    for p in payloads:
        rgb = decode_jpeg(p).astype(np.float64)
        r, g, bl = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = np.clip(0.299 * r + 0.587 * g + 0.114 * bl, 0, 255).round().astype(np.uint8)
        u = np.clip(-0.168736 * r - 0.331264 * g + 0.5 * bl + 128, 0, 255).round().astype(np.uint8)
        v = np.clip(0.5 * r - 0.418688 * g - 0.081312 * bl + 128, 0, 255).round().astype(np.uint8)
        frames.append((y, u, v))
    return frames, fps


def decode_video_bytes(b: bytes):
    """Codec dispatch for video payloads: YUV4MPEG2 (uncompressed) or
    RIFF/AVI M-JPEG (compressed) -> (frames as (y, u, v) tuples, fps)."""
    if b.startswith(b"YUV4MPEG2"):
        return decode_y4m_bytes(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return decode_mjpeg_avi_bytes(b)
    raise ValueError("unsupported video container (expected y4m or AVI)")


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_y", DoubleType(), True),
        StructField("mean_u", DoubleType(), True),
        StructField("mean_v", DoubleType(), True),
    ]
)


def sample_video_frames(media: DataFrame, every_n_seconds: float) -> DataFrame:
    """Real frame-sampling stage: Arrow batches of y4m payloads -> one row
    per sampled frame (every_n_seconds apart by the stream's own framerate)
    with per-plane means. Same mapInPandas contract an ffmpeg deployment
    would use; the y4m parse is genuine (header tags, FRAME markers, plane
    offsets). Payloads never leave executors; output is per-frame stats,
    orders of magnitude smaller than the input."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "frame_idx", "ts_ms", "width", "height", "mean_y", "mean_u", "mean_v")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames, (num, den) = decode_video_bytes(bytes(payload))
                stride = max(1, int(round(every_n_seconds * num / den)))
                for idx in range(0, len(frames), stride):
                    y, u, v = frames[idx]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(idx * 1000 * den // num)
                    out["height"].append(y.shape[0])
                    out["width"].append(y.shape[1])
                    out["mean_y"].append(float(y.mean()))
                    out["mean_u"].append(float(u.mean()))
                    out["mean_v"].append(float(v.mean()))
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real audio codec: RIFF/WAVE PCM (16-bit), pure python/numpy — uncompressed,
# so no audio libs needed. Genuine chunk-walk parser (fmt /data chunks in any
# order, unknown chunks skipped, word-aligned chunk sizes).


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE PCM bytes from an int16 array — (n,) mono or (n, channels)."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()  # interleaved little-endian int16
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_bytes(b: bytes):
    """Parse RIFF/WAVE bytes -> ((n, channels) int16 array, sample_rate).
    Walks the chunk list (chunks are word-aligned; unknown ones skipped), so
    files with LIST/INFO or cue chunks parse correctly. Handles PCM
    (format 1, 16-bit) and mono IMA ADPCM (format 0x11, 4-bit compressed —
    decoded via the shared step-prediction kernel; the fact chunk trims the
    final partial block to the true length)."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, channels, bits, data = 12, None, None, None, None
    audio_fmt, block_align, fact_samples = None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", b, pos + 8
            )
            if audio_fmt == 1 and bits == 16:
                pass
            elif audio_fmt == 0x11 and channels == 1:
                pass
            else:
                raise ValueError(f"unsupported WAV variant: fmt={audio_fmt} bits={bits}")
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", b, pos + 8)
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    if audio_fmt == 0x11:
        return _decode_adpcm_data(data, block_align, fact_samples), rate
    a = np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    return a, rate


# -- IMA/DVI ADPCM (WAV format tag 0x11): the standard 4:1 compressed-audio
# codec, pure python — step-size prediction with a 4-bit code per sample.
# encode_adpcm_wav produces blocked mono streams (4-byte block header:
# predictor seed + step index); decode_wav_bytes dispatches on the fmt tag
# so compressed WAVs flow through extract_audio_features unchanged.

_ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_ADPCM_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_reconstruct(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """Shared decode-side update (the encoder uses it too, so both sides
    track the identical predictor): returns (new_predictor, new_index)."""
    step = _ADPCM_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _ADPCM_INDEX_ADJ[nibble & 7]))
    return predictor, index


def encode_adpcm_wav(samples, sample_rate: int = 8000, block_align: int = 256) -> bytes:
    """Mono IMA-ADPCM WAV (format 0x11) from an int16 array — 4:1
    compression. Includes the fact chunk (true sample count) so partial
    final blocks decode to the exact original length."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    n = len(a)
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    predictor, index = (int(a[0]) if n else 0), 0
    blocks = bytearray()
    pos = 0
    while pos < n:
        chunk = a[pos : pos + spb]
        predictor = int(chunk[0])
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = _ADPCM_STEPS[index]
            diff = int(s) - predictor
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            nibbles.append(nib)
            predictor, index = _adpcm_reconstruct(predictor, index, nib)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))  # pad block
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))  # low nibble first
        pos += spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        sample_rate * block_align // spb if spb else sample_rate,
        block_align, 4, 2, spb,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_adpcm_data(data: bytes, block_align: int, n_samples: int | None):
    import struct

    import numpy as np

    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        predictor, index, _ = struct.unpack_from("<hBB", block, 0)
        index = max(0, min(88, index))
        out.append(predictor)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):  # low nibble first
                predictor, index = _adpcm_reconstruct(predictor, index, nib)
                out.append(predictor)
    if n_samples is not None:
        out = out[:n_samples]
    return np.asarray(out, dtype=np.int16).reshape(-1, 1)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("peak", LongType(), True),
        StructField("mean_abs", DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real audio feature stage: Arrow batches of WAV payloads -> per-asset
    duration, peak amplitude, and mean absolute amplitude (integer sums over
    int16 — exact in double well past any real clip length). Same
    mapInPandas contract a librosa/whisper front-end would use."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "sample_rate", "n_samples", "n_channels", "duration_ms", "peak", "mean_abs")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                a, rate = decode_wav_bytes(bytes(payload))
                n, ch = a.shape
                absa = np.abs(a.astype(np.int64))
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["n_channels"].append(ch)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak"].append(int(absa.max()))
                out["mean_abs"].append(float(absa.sum()) / (n * ch))
            yield pd.DataFrame(out)

    return media.mapInPandas(_feat, schema=AUDIO_FEATURE_SCHEMA)


def documents_as_audio_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: deterministic PCM clips from doc_id — sample i of doc
    d is ((d*13 + i*7) % 2048) - 1024, so a SQL oracle replays the exact
    waveform with generate_series while the parser genuinely walks RIFF
    chunks (a decoy LIST chunk is included to exercise chunk skipping)."""
    import numpy as np

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col].astype(int):
                n = 64 + 8 * (d % 9)
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 13 + i * 7) % 2048 - 1024).astype(np.int16)
                wav = encode_wav(samples, sample_rate=8000)
                # splice a decoy chunk between fmt and data: parser must skip it
                decoy = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
                fmt_end = wav.index(b"data")
                spliced = wav[:fmt_end] + decoy + wav[fmt_end:]
                riff_sz = (len(spliced) - 8).to_bytes(4, "little")
                payloads.append(spliced[:4] + riff_sz + spliced[8:])
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "modality": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    return df.select(id_col).mapInPandas(_render, schema=MEDIA_SCHEMA)


def documents_as_video_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: deterministic y4m clips derived from doc_id (frame
    count, dims, and constant plane fills are pure doc_id/frame arithmetic),
    so a SQL oracle can predict the sampled-frame output in closed form
    while the parser genuinely walks the container."""
    import numpy as np

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col].astype(int):
                w, h = 8 + 2 * (d % 5), 4 + 2 * (d % 3)
                frames = []
                for f in range(3 + d % 5):
                    y = np.full((h, w), (d * 31 + f * 17) % 256, dtype=np.uint8)
                    u = np.full((h, w), (d * 53 + f * 29) % 256, dtype=np.uint8)
                    v = np.full((h, w), (d * 71 + f * 13) % 256, dtype=np.uint8)
                    frames.append((y, u, v))
                payloads.append(encode_y4m(frames, fps=(5, 1), colorspace="C444"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "modality": "video",
                    "payload": payloads,
                    "mime": "video/x-yuv4mpeg",
                }
            )

    return df.select(id_col).mapInPandas(_render, schema=MEDIA_SCHEMA)


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
