"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north-star addition, BASELINE.json): media travels through the
engine as `binary` columns with a typed metadata struct alongside
(modality, format, width/height/duration, byte size). All heavy work --
decode, resize, feature-extract, frame-sample -- runs as Arrow-batched
Pandas functions over `mapInPandas`, so each executor processes whole
record batches and the bytes never round-trip through Python row by row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED: `decode_image_batch` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded by the content hash) produces stable
pixel-statistics so the Spark-side plumbing -- schemas, batch iteration,
partitioning, output contracts -- is fully real and testable. Swapping
in a real codec changes only the inner `_decode_one` function.

Scale notes: binary payloads dominate row size, so operators
(a) prune early -- metadata-only predicates never touch `content`;
(b) keep batches bounded via `spark.sql.execution.arrow.maxRecordsPerBatch`;
(c) avoid shuffling raw bytes -- feature extraction projects to small
vectors BEFORE any join/groupBy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = (
    "modality string, format string, width int, height int, "
    "duration_s double, n_bytes long"
)

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_r double, mean_g double, mean_b double, "
    "phash string"
)


def attach_binary_metadata(
    df: DataFrame, content_col: str, modality: str, fmt: str
) -> DataFrame:
    """Typed metadata struct next to the opaque payload. Pure JVM-side
    (no Python): metadata predicates stay pushdown/codegen friendly."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode_one(content: bytes) -> np.ndarray:
    """Deterministic fake decoder: a 8x8x3 'image' seeded by content hash.
    Stands in for PIL.Image.open until a real codec is available."""
    seed = int.from_bytes(hashlib.md5(content).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_image_batch(contents: pd.Series, fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of image payloads to HxWxC arrays.

    STUB: real decoding needs an image codec (PIL / libjpeg) that is not
    in this container; call with fake=True for the deterministic fake.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/libjpeg) are not available in this build; "
            "pass fake=True for the deterministic stub decoder"
        )
    return [_fake_decode_one(c) for c in contents]


def extract_image_features(
    df: DataFrame, id_col: str, content_col: str, fake: bool = True
) -> DataFrame:
    """Per-image features (channel means + a perceptual-hash stand-in)
    via mapInPandas: batch in, small feature rows out -- raw bytes are
    dropped before anything shuffles."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf[content_col], fake=fake)
            means = np.stack([img.reshape(-1, 3).mean(axis=0) for img in imgs])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": pdf[content_col].str.len().astype("int64"),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "phash": [
                        hashlib.md5(img.tobytes()).hexdigest()[:16] for img in imgs
                    ],
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        features, IMAGE_FEATURE_SCHEMA
    )


def resize_images(
    df: DataFrame, id_col: str, content_col: str, size: tuple[int, int] = (64, 64)
) -> DataFrame:
    """Resize stub: the real kernel is one PIL call inside the same
    mapInPandas shape as extract_image_features."""
    raise NotImplementedError(
        "resize requires an image codec; plumbing shape is "
        "extract_image_features with a resize kernel"
    )


def sample_video_frames(
    df: DataFrame, id_col: str, content_col: str, every_s: float = 1.0
) -> DataFrame:
    """Frame-sampling stub (ffmpeg not in this container). Output contract:
    one row per (id, frame_idx, frame_png binary)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg; output contract: "
        "(id, frame_idx long, frame binary)"
    )
