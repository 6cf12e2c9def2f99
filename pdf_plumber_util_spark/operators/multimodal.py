"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side plumbing (schema, batching, partition sizing, Arrow transfer)
is real and tested; the actual codec step is stubbed deterministically
because no media libraries exist in this container — the stub documents
the exact UDF signature a real decoder drops into.

Scale notes: media rows are LARGE — the iterator-based mapInPandas keeps
only one Arrow batch in memory per task; `maxRecordsPerBatch` plus
`files.maxPartitionBytes` bound the per-task footprint, and the payload
column is pruned unless the decode stage is actually in the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload.tobytes(),
                        "width": int(rng.integers(16, 64)) if kind != "audio" else 0,
                        "height": int(rng.integers(16, 64)) if kind != "audio" else 0,
                        "sample_rate": 16000 if kind == "audio" else 0,
                        "n_frames": int(rng.integers(1, 30)) if kind == "video" else 1,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """REAL-DECODER SLOT. A production build replaces this with PIL /
    torchaudio / pyav. Here: deterministic 8-dim moment features of the
    raw bytes, so the distributed plumbing is exercised with stable
    values."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if a.size == 0:
        return np.zeros(8)
    halves = np.array_split(a, 4)
    return np.array(
        [a.mean(), a.std(), a.min(), a.max()] + [h.mean() for h in halves]
    )


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction over the opaque payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame index
    (decode stubbed; the explode/partition shape is the real part)."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"), "n_frames")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """REAL-RESIZER SLOT (production: PIL.Image.resize / cv2.resize).
    Deterministic fake: nearest-neighbor index sampling over the raw byte
    grid, so output size and batch shape behave exactly like a real
    resize (out_w*out_h bytes per image)."""
    a = np.frombuffer(payload, dtype=np.uint8)
    if a.size == 0 or w == 0 or h == 0:
        return bytes(out_w * out_h)
    # tile/truncate the byte stream to the declared w*h grid (payloads are
    # opaque fakes here; a real decoder yields the true pixel grid)
    grid = np.resize(a, w * h).reshape(h, w)
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return grid[np.ix_(ys, xs)].tobytes()


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image resize over the opaque payloads: iterator mapInPandas, one
    Arrow batch in memory per task, payload column pruned for non-image
    rows by the upstream filter (the standard multimodal preprocessing
    shape; decode/resize stubbed, plumbing real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_stub(p, w or 0, h or 0, out_w, out_h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "payload": out,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)
