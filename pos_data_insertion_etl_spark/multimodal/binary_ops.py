"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north-star addition, BASELINE.json): media travels through the
engine as `binary` columns with a typed metadata struct alongside
(modality, format, width/height/duration, byte size). All heavy work --
decode, resize, feature-extract, frame-sample -- runs as Arrow-batched
Pandas functions over `mapInPandas`, so each executor processes whole
record batches and the bytes never round-trip through Python row by row.

Codecs: PNG and 16-bit PCM WAV decode/encode are REAL, implemented on
stdlib zlib/wave (`png_codec.py`, `wav_codec.py`) -- no PIL/ffmpeg in
this container, none needed for these formats. Video has no public
stdlib container, so the engine defines a minimal length-prefixed
PNG-frame container (`pack_video_frames`) and samples it for real;
swapping in ffmpeg changes only `_iter_frames`. Formats outside that
set (JPEG etc.) raise NotImplementedError naming the missing codec, or
use fake=True for the deterministic stub decoder in tests.

Scale notes: binary payloads dominate row size, so operators
(a) prune early -- metadata-only predicates never touch `content`;
(b) keep batches bounded via `spark.sql.execution.arrow.maxRecordsPerBatch`;
(c) avoid shuffling raw bytes -- feature extraction projects to small
vectors BEFORE any join/groupBy.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .png_codec import SIGNATURE as PNG_SIGNATURE
from .png_codec import decode_png, encode_png
from .wav_codec import decode_wav, encode_wav  # noqa: F401  (re-export)

METADATA_SCHEMA = (
    "modality string, format string, width int, height int, "
    "duration_s double, n_bytes long"
)

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_r double, mean_g double, mean_b double, "
    "phash string"
)

RESIZED_SCHEMA = "doc_id long, width int, height int, content binary"

FRAME_SCHEMA = "doc_id long, frame_idx long, frame binary"

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, duration_s double, "
    "peak long, sum_abs long, mean_abs double"
)

VIDEO_MAGIC = b"PNGV"


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
    Test stand-in for formats without a bundled codec (e.g. JPEG)."""
    seed = int.from_bytes(hashlib.md5(content).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_image_batch(contents: pd.Series, fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of image payloads to HxWxC uint8 arrays.

    PNG decodes for real (stdlib zlib codec). Other formats need a codec
    this build doesn't bundle -- they raise, or return the deterministic
    fake when ``fake=True``.
    """
    out = []
    for c in contents:
        b = bytes(c)
        if b[:8] == PNG_SIGNATURE:
            out.append(decode_png(b))
        elif fake:
            out.append(_fake_decode_one(b))
        else:
            raise NotImplementedError(
                "no bundled codec for this image format (PNG is supported; "
                "JPEG etc. need PIL/libjpeg); pass fake=True for the "
                "deterministic stub decoder"
            )
    return out


def extract_image_features(
    df: DataFrame, id_col: str, content_col: str, fake: bool = False
) -> DataFrame:
    """Per-image features (channel means + a perceptual-hash stand-in)
    via mapInPandas: batch in, small feature rows out -- raw bytes are
    dropped before anything shuffles."""

    def _channel_means(img: np.ndarray) -> np.ndarray:
        # Grayscale decodes (PNG color types 0/4) are HxWx1 or HxWx2;
        # replicate the luma channel so every image yields (r, g, b) and
        # batches mixing channel counts stack cleanly.
        m = img.reshape(-1, img.shape[-1]).mean(axis=0)
        return m[:3] if m.shape[0] >= 3 else np.repeat(m[:1], 3)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf[content_col], fake=fake)
            means = np.stack([_channel_means(img) for img in imgs])
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


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index math): out (w, h)."""
    out_w, out_h = size
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def resize_images(
    df: DataFrame, id_col: str, content_col: str, size: tuple[int, int] = (64, 64)
) -> DataFrame:
    """Real resize kernel: PNG decode -> nearest-neighbor -> PNG encode,
    inside one mapInPandas pass. Output: (doc_id, width, height, content)."""
    out_w, out_h = size

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf[content_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": out_w,
                    "height": out_h,
                    "content": [
                        encode_png(resize_nearest(img, size)) for img in imgs
                    ],
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        resize, RESIZED_SCHEMA
    )


def extract_audio_features(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Real WAV kernel (stdlib `wave`): per-clip sample stats. Integer
    sums (sum_abs, peak) keep the derivation exact for oracle checks;
    mean_abs is one double division of exact operands."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_wav(content)
                flat = np.abs(samples.astype(np.int64)).ravel()
                n = int(samples.shape[0])
                rows.append(
                    (
                        doc_id,
                        n,
                        rate,
                        n / rate,
                        int(flat.max(initial=0)),
                        int(flat.sum()),
                        float(flat.sum()) / len(flat) if len(flat) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "sample_rate",
                    "duration_s",
                    "peak",
                    "sum_abs",
                    "mean_abs",
                ],
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        features, AUDIO_FEATURE_SCHEMA
    )


def pack_video_frames(frames: list[bytes], fps: float = 1.0) -> bytes:
    """Minimal public video container: PNGV magic, frame count, fps,
    then length-prefixed PNG frames. Exists because no stdlib handles a
    real video codec; the sampling/decoding plumbing downstream is
    format-agnostic."""
    head = VIDEO_MAGIC + struct.pack(">Id", len(frames), fps)
    return head + b"".join(
        struct.pack(">I", len(f)) + f for f in frames
    )


def _iter_frames(data: bytes) -> tuple[float, Iterator[bytes]]:
    b = bytes(data)
    if b[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "unknown video container (PNGV supported; real codecs need ffmpeg)"
        )
    n, fps = struct.unpack_from(">Id", b, 4)

    def frames() -> Iterator[bytes]:
        pos = 16
        for _ in range(n):
            (length,) = struct.unpack_from(">I", b, pos)
            yield b[pos + 4 : pos + 4 + length]
            pos += 4 + length

    return fps, frames()


def sample_video_frames(
    df: DataFrame, id_col: str, content_col: str, every_s: float = 1.0
) -> DataFrame:
    """Real frame sampler over the PNGV container: one output row per
    sampled frame (doc_id, frame_idx, frame png bytes). The frame step
    derives from the container's fps and ``every_s``."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                fps, frames = _iter_frames(content)
                step = max(1, round(fps * every_s))
                for i, frame in enumerate(frames):
                    if i % step == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        payloads.append(frame)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": payloads}
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        sample, FRAME_SCHEMA
    )


def audio_frame_energy(
    df: DataFrame, id_col: str, content_col: str, frame_len: int = 250
) -> DataFrame:
    """Windowed audio analysis through the real WAV codec: decode each
    payload, split samples into fixed-length frames, emit one row per
    frame with its exact integer energy (sum of squared samples) and
    peak -- the spectrogram-proxy framing every audio-quality /
    silence-detection pipeline starts from (int16 squares * frame_len
    stay far inside int64).

    Same Arrow-batch contract as extract_audio_features: media bytes
    are decoded and reduced inside one mapInPandas pass; only
    (id, frame_idx, small ints) ever shuffle.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav_codec import decode_wav

        for pdf in batches:
            ids, idxs, ns, energies, peaks = [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                samples, _rate = decode_wav(bytes(content))
                arr = samples.astype(np.int64)
                for f in range(0, len(arr), frame_len):
                    w = arr[f : f + frame_len]
                    ids.append(doc_id)
                    idxs.append(f // frame_len)
                    ns.append(len(w))
                    energies.append(int((w * w).sum()))
                    peaks.append(int(np.abs(w).max()) if len(w) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_samples": ns,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        frames,
        "doc_id long, frame_idx long, n_samples long, energy long, peak long",
    )


def audio_zero_crossings(
    df: DataFrame, id_col: str, content_col: str, frame_len: int = 250
) -> DataFrame:
    """Per-frame zero-crossing counts through the real WAV codec --
    the voiced/unvoiced + noisiness proxy next to audio_frame_energy's
    loudness: speech segmentation and silence/music discrimination
    start from exactly this pair of framings.

    A crossing is a strictly sign-changing adjacent pair
    (s[i-1] * s[i] < 0 -- zeros never cross, so the count is exact
    integer with no epsilon), counted WITHIN frames only (pairs
    spanning a frame boundary belong to neither frame), making each
    frame's [n_pairs, crossings, zcr_fp = crossings * 1e6 div n_pairs]
    independently recomputable by a closed-form oracle.

    Same Arrow-batch contract as audio_frame_energy: decode + frame +
    reduce inside one mapInPandas pass; only small ints shuffle.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav_codec import decode_wav

        for pdf in batches:
            ids, idxs, pairs_n, crossings = [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                samples, _rate = decode_wav(bytes(content))
                arr = samples.astype(np.int64)
                for f in range(0, len(arr), frame_len):
                    w = arr[f : f + frame_len]
                    ids.append(doc_id)
                    idxs.append(f // frame_len)
                    if len(w) < 2:
                        pairs_n.append(0)
                        crossings.append(0)
                    else:
                        prod = w[:-1] * w[1:]
                        pairs_n.append(len(w) - 1)
                        crossings.append(int((prod < 0).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_pairs": pairs_n,
                    "crossings": crossings,
                }
            )

    out = df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        frames,
        schema="doc_id long, frame_idx long, n_pairs long, crossings long",
    )
    return out.select(
        "doc_id",
        "frame_idx",
        "n_pairs",
        "crossings",
        F.when(F.col("n_pairs") > 0, F.expr("(crossings * 1000000) div n_pairs"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("zcr_fp"),
    )


def image_value_histogram(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Per-image byte-value histogram through the REAL PNG chain:
    decode with the stdlib codec, count occurrences of each 0..255
    value across all channels, emit (id, value, count) rows -- the
    exact-integer substrate for entropy/contrast/posterization checks.

    The Python side does ONLY decode + integer counting (one
    np.bincount per image inside the Arrow batch); any floating-point
    scoring (entropy's ln) belongs downstream in JVM expressions where
    it hash-certifies like the q129 LM family. Output is <= 256 small
    rows per image -- bytes never shuffle.
    """

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png_codec import decode_png

        for pdf in batches:
            ids, vals, cnts = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                img = decode_png(bytes(content))
                counts = np.bincount(
                    np.asarray(img, dtype=np.uint8).reshape(-1),
                    minlength=256,
                )
                nz = np.nonzero(counts)[0]
                ids.extend([doc_id] * len(nz))
                vals.extend(int(v) for v in nz)
                cnts.extend(int(counts[v]) for v in nz)
            yield pd.DataFrame(
                {id_col: ids, "value": vals, "cnt": cnts}
            )

    return df.select(id_col, content_col).mapInPandas(
        hist, f"{id_col} long, value long, cnt long"
    )


def image_value_entropy(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Per-image Shannon entropy of byte values (nats, nano fixed
    point): H = -sum_v (c_v/N) ln(c_v/N) -- flat noise scores ln(256),
    posterized/synthetic frames score near 0. The real-codec analog of
    the q196 token-entropy gate.

    Exact contract (the q129/q241 convention): counts are exact
    integers from image_value_histogram; each ln is ONE JVM double op
    on an exact integer ratio, rounded to 1e-9 away from zero exactly
    as DuckDB rounds; the weighted sum is integer; one truncating div
    by N ends it. Output [id, n_bytes, n_values, entropy_nano].
    """
    from pyspark.sql.window import Window as W

    # Per-doc totals via a keyed window over the histogram rows, NOT a
    # groupBy + self-join back -- a self-join would re-run the decode
    # mapInPandas a second time (plan audit: every image decodes once).
    w = W.partitionBy(id_col)
    h = image_value_histogram(df, id_col, content_col).select(
        id_col,
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("n_bytes"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_values"),
    )
    lnr = F.round(
        F.log(F.col("cnt").cast("double") / F.col("n_bytes").cast("double"))
        * 1_000_000_000
    ).cast("long")
    return (
        h.select(
            id_col, "n_bytes", "n_values", (F.col("cnt") * lnr).alias("_t")
        )
        .groupBy(id_col, "n_bytes", "n_values")
        .agg(F.sum("_t").cast("long").alias("_num"))
        .select(
            id_col,
            "n_bytes",
            "n_values",
            F.expr("-(_num div n_bytes)").cast("long").alias("entropy_nano"),
        )
    )
