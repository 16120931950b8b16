"""Multimodal (image/audio/video) column plumbing.

[north-star training-data ops]. Media payloads are opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / resize / frame-sample
run as Arrow-batched mapInPandas stages. The actual codec step is STUBBED
(no image/audio libraries in this container — see the module-level
``DECODERS`` gate): the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested with the deterministic fake
decoder.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),   # image | audio | video
        StructField("n_bytes", LongType()),
        StructField("content_hash", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _real_image_decode(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "image decoding requires a codec library (PIL / libvips) that is not "
        "present in this container; install one and register it in DECODERS"
    )


def _fake_image_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake: 'decodes' a payload into an 8x8 grayscale patch
    derived from its bytes — stable stand-in for tests and benchmarks."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return 8, 8, arr.reshape(8, 8).astype(np.float32) / 255.0


DECODERS: dict[str, Callable] = {
    "image": _fake_image_decode,  # swap for _real_image_decode in production
}


def media_metadata(df: DataFrame, payload_col: str = "payload",
                   ref_col: str = "media_ref",
                   kind_col: str = "media_kind") -> DataFrame:
    """Typed metadata extraction — pure Catalyst (no decode)."""
    from ..kernels.hashes import xxh64

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "media_kind": pdf[kind_col],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                    "content_hash": [
                        (xxh64(bytes(b)) & 0x7FFF_FFFF_FFFF_FFFF) if b is not None else 0
                        for b in payloads
                    ],
                }
            )

    return df.select(ref_col, kind_col, payload_col).mapInPandas(
        meta, schema=MEDIA_META_SCHEMA
    )


def image_features(df: DataFrame, payload_col: str = "payload",
                   ref_col: str = "media_ref", n_features: int = 16) -> DataFrame:
    """decode -> downsample -> flat feature vector, Arrow-batched.

    The decode callable comes from DECODERS['image'] (fake here; real in
    production). Batch shape: one numpy (h, w) array per row, feature
    extraction vectorized per batch."""
    decode = DECODERS["image"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, feats = [], [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                if payload is None:
                    continue
                w, h, img = decode(bytes(payload))
                # resize-by-pooling to a fixed 4x4 grid, then flatten
                gh, gw = 4, 4
                pooled = img[: (h // gh) * gh, : (w // gw) * gw]
                pooled = pooled.reshape(gh, h // gh, gw, w // gw).mean(axis=(1, 3))
                v = pooled.reshape(-1).astype(np.float32)
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                feats.append([float(x) for x in v[:n_features]])
            yield pd.DataFrame(
                {"media_ref": refs, "width": ws, "height": hs, "features": feats}
            )

    return df.select(ref_col, payload_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, ref_col: str = "media_ref",
                      duration_col: str = "duration_sec",
                      fps: float = 0.5) -> DataFrame:
    """Video frame-sampling plan: (media_ref, frame_ts) rows — pure Catalyst
    sequence/explode; the decode of each frame is the stubbed step."""
    n_frames = F.greatest((F.col(duration_col) * fps).cast("int"), F.lit(1))
    return df.select(
        ref_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts", F.col("frame_idx") / fps)
