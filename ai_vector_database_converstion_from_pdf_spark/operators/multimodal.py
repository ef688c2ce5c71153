"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Training-data-pipeline extension (BASELINE.json north star). The decode
step is STUBBED (no image/audio libs in this container — see
`decode_image_stub`): the Spark-side plumbing — schema, partitioning,
UDF signatures, Arrow batch shapes — is real and tested; a production
deployment swaps the stub for pillow/ffmpeg calls inside the same
mapInPandas iterator.

Scale notes: binary payloads ride in their own column so column pruning
keeps metadata-only queries payload-free; decode/feature-extract is
mapInPandas (per-partition batches, no shuffle); payload-heavy stages
should repartition by size estimate to even out skew from mixed media.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque bytes
        StructField("width", IntegerType()),      # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media rows (payload = md5-seeded bytes) for
    exercising the plumbing end-to-end."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.md5(f"media-{i}".encode()).digest() * 8)[: 64 + i % 32]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + i % 5 if kind != "audio" else None,
                48 + i % 7 if kind != "audio" else None,
                1000 * (i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — a real deployment calls PIL.Image.open here
    (lib not present in this container). Produces a deterministic fake
    raster from the payload bytes so downstream stages are testable.
    Raises on non-positive dims like a real decoder would."""
    if not width or not height or width <= 0 or height <= 0:
        raise NotImplementedError(
            "decode requires valid dimensions; real decoder (PIL/ffmpeg) absent in container"
        )
    seed = np.frombuffer(hashlib.md5(payload or b"").digest(), dtype=np.uint8)
    reps = int(np.ceil(width * height * 3 / len(seed)))
    return np.tile(seed, reps)[: width * height * 3].reshape(height, width, 3)


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "mean_intensity double, aspect double, frames_sampled int"
)


def extract_features(media: DataFrame, frame_stride_ms: int = 5000) -> DataFrame:
    """Decode / feature-extract / frame-sample via mapInPandas. Images:
    mean raster intensity + aspect ratio; video: sampled frame count at
    the stride; audio: byte-level stats only. Payload column is pruned
    from the output (features only — the 100 TB anti-pattern is carrying
    payloads past the stage that needs them)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "sha1": [],
                "mean_intensity": [], "aspect": [], "frames_sampled": [],
            }
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                out["media_id"].append(r.media_id)
                out["kind"].append(r.kind)
                out["n_bytes"].append(len(payload))
                out["sha1"].append(hashlib.sha1(payload).hexdigest())
                if r.kind == "image" and r.width and r.height:
                    raster = decode_image_stub(payload, int(r.width), int(r.height))
                    out["mean_intensity"].append(float(raster.mean()))
                    out["aspect"].append(round(float(r.width) / float(r.height), 6))
                    out["frames_sampled"].append(1)
                elif r.kind == "video" and r.duration_ms is not None:
                    out["mean_intensity"].append(None)
                    aspect = (
                        round(float(r.width) / float(r.height), 6)
                        if r.width and r.height
                        else None
                    )
                    out["aspect"].append(aspect)
                    out["frames_sampled"].append(
                        max(1, int(r.duration_ms) // frame_stride_ms)
                    )
                else:
                    out["mean_intensity"].append(None)
                    out["aspect"].append(None)
                    out["frames_sampled"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(per_batch, FEATURE_SCHEMA)


def resize_images(media: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Resize plumbing: decode → nearest-neighbor downsample (numpy
    stride trick — the stub 'resize'; PIL.thumbnail in production) →
    re-encode as raw bytes. Demonstrates binary-out UDF shape."""
    tw, th = target

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "width": [], "height": []}
            for r in pdf.itertuples(index=False):
                if r.kind != "image" or not r.width or not r.height:
                    continue
                raster = decode_image_stub(bytes(r.payload), int(r.width), int(r.height))
                ys = np.linspace(0, raster.shape[0] - 1, th).astype(int)
                xs = np.linspace(0, raster.shape[1] - 1, tw).astype(int)
                small = raster[np.ix_(ys, xs)]
                rows["media_id"].append(r.media_id)
                rows["payload"].append(small.tobytes())
                rows["width"].append(tw)
                rows["height"].append(th)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        per_batch, "media_id long, payload binary, width int, height int"
    )
