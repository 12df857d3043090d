"""Multimodal (image/audio/video) column plumbing.

Design: media lives as an opaque ``binary`` column plus a typed
metadata struct; transforms run as Arrow-batched pandas functions over
``mapInPandas`` so each task decodes a batch at a time without ever
materializing the corpus on the driver.

Decode kernels: ``decode_png`` is a REAL pure-stdlib PNG decoder
(struct + zlib — works with no image libraries installed); formats
that need external codecs (JPEG, audio, video) are represented by the
deterministic sha256-derived fake decode, which also keeps the whole
pipeline oracle-checkable. A production deployment dispatches on magic
bytes to PIL/ffmpeg inside the same kernel; schema, partitioning, UDF
signature, and batch shape are identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the metadata struct carried next to every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def attach_media_meta(
    df: DataFrame, binary_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column.

    Width/height stay null until decode; n_bytes is computed JVM-side.
    """
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn(f"{binary_col}_meta", meta)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: derive (width, height, mean_luma)
    from the content hash. Stands in for decodes of formats that need
    external codecs (JPEG/video), and keeps the whole pipeline
    oracle-checkable."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """REAL image decode for PNG — pure stdlib (struct + zlib), no
    PIL/cv2 required: parses IHDR/IDAT, inflates, un-filters each
    scanline (filters 0-4 per the PNG spec), and returns
    (width, height, mean_luma) with luma = Rec.601 over the pixels,
    rounded 6dp. Supports 8-bit greyscale / grey+alpha / RGB / RGBA,
    non-interlaced — the shapes a training-data pipeline normalizes
    to anyway. Raises ValueError on non-PNG bytes and
    NotImplementedError on exotic variants (16-bit, palette,
    interlaced), which real deployments route to a PIL kernel."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    idat = b""
    width = height = None
    bit_depth = color_type = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
                raise NotImplementedError(
                    "only 8-bit non-interlaced grey/GA/RGB/RGBA PNGs"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels
    prev = bytearray(stride)
    out = bytearray()
    i = 0
    for _y in range(height):
        f = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if f == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = line
    n = width * height
    if channels == 1:
        luma = sum(out) / n
    elif channels == 2:
        luma = sum(out[0::2]) / n
    else:
        rs = sum(out[0::channels])
        gs = sum(out[1::channels])
        bs = sum(out[2::channels])
        luma = (0.299 * rs + 0.587 * gs + 0.114 * bs) / n
    return width, height, round(luma / 255.0, 6)


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Batch feature extraction over ``mapInPandas``.

    ``fake=False`` runs the REAL decode: ``decode_png`` (pure stdlib,
    works in this environment) — non-PNG payloads raise inside the
    task, where a production kernel would dispatch to PIL/ffmpeg by
    magic bytes. ``fake=True`` substitutes the deterministic
    sha256-derived stub (oracle-checkable end to end). Either way the
    Arrow batch shape, output schema, and partition parallelism are
    identical.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar batch construction: the per-payload work is
            # inherently row-wise (hash/decode), but each output column
            # is built as a plain list over the arrays (no iterrows —
            # pandas row materialization is ~10× slower)
            payloads = [bytes(p) for p in pdf[binary_col]]
            digests = [hashlib.sha256(p).digest() for p in payloads]
            if fake:
                dims = [
                    (16 + d[0] % 64, 16 + d[1] % 64, round(d[2] / 255.0, 6))
                    for d in digests
                ]
            else:
                dims = [decode_png(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "content_sha": [d.hex() for d in digests],
                    "width": [w for w, _, _ in dims],
                    "height": [h for _, h, _ in dims],
                    "mean_luma": [v for _, _, v in dims],
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str = "doc_id", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed). Shows the explode-side plumbing: frame
    counts derive from metadata; the decode kernel would consume
    (doc_id, frame_idx) batches."""
    n_frames = (F.length(F.col("content")) % 240 + 1).alias("n_frames")
    frames = df.select(F.col(id_col), n_frames)
    return frames.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
