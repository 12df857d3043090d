"""Multimodal (image/audio/video) column plumbing.

Design: media lives as an opaque ``binary`` column plus a typed
metadata struct; transforms run as Arrow-batched pandas functions over
``mapInPandas`` so each task decodes a batch at a time without ever
materializing the corpus on the driver. The decode kernels themselves
are STUBBED (no image/audio libs in this container): ``decode_image``
raises NotImplementedError unless ``fake=True``, which produces a
deterministic fake decode so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and testable.
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
    from the content hash. Stands in for a real PIL/ffmpeg decode."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Batch feature extraction over ``mapInPandas``.

    Real deployments plug a PIL/torchvision decode into the kernel; the
    Arrow batch shape, output schema, and partition parallelism are
    identical. ``fake=False`` raises NotImplementedError inside the
    task (no media libs in this environment — by design, see module
    docstring).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/cv2 — not available here; "
                    "pass fake=True for the deterministic stub"
                )
            # columnar batch construction: the sha256 is inherently
            # per-payload, but everything else derives from the digest,
            # so hash once per row and build each output column as a
            # plain list (no iterrows — pandas row materialization is
            # ~10× slower than iterating the underlying arrays)
            payloads = [bytes(p) for p in pdf[binary_col]]
            digests = [hashlib.sha256(p).digest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "content_sha": [d.hex() for d in digests],
                    "width": [16 + d[0] % 64 for d in digests],
                    "height": [16 + d[1] % 64 for d in digests],
                    "mean_luma": [round(d[2] / 255.0, 6) for d in digests],
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
