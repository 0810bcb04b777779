"""Multimodal queries with REAL codec round-trips, oracled in DuckDB.

DuckDB cannot decode PNG/WAV -- so each query generates its media
payload from a closed-form pixel/sample formula over doc_id, runs it
through the real encoder AND decoder (stdlib zlib/wave codecs,
multimodal/png_codec.py, wav_codec.py), and aggregates integer
statistics. The oracle computes the same statistics straight from the
formula. The two match only if encode→decode is the identity -- i.e.
the hash gate actually certifies the codec kernels, not a fake.

Formulas are chosen so sums are doc-dependent (image side 15 keeps the
per-channel position count at 225, not a full 256-residue cycle that
would collapse every doc to the same sum).

Scale shape: one mapInPandas projection per query -- media bytes are
created and consumed inside a single Arrow batch pass, only (id, small
ints) ever shuffle. This is the same prune-before-shuffle contract as
extract_image_features on external payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

IMG_SIDE = 15  # 15x15 RGB -> 675 bytes; 225 positions per channel
IMG_N = IMG_SIDE * IMG_SIDE * 3


def _img_pixels(doc_id: int, offset: int = 0) -> np.ndarray:
    vals = (doc_id * 7919 + offset + np.arange(IMG_N)) % 256
    return vals.reshape(IMG_SIDE, IMG_SIDE, 3).astype(np.uint8)


def _channel_stats(img: np.ndarray) -> tuple[int, int, int, int]:
    flat = img.reshape(-1, 3).astype(np.int64)
    s = flat.sum(axis=0)
    return int(s[0]), int(s[1]), int(s[2]), flat.shape[0]


@query(
    "q60_image_decode_stats",
    oracle=f"""
SELECT d.doc_id,
       {IMG_SIDE} AS width, {IMG_SIDE} AS height,
       CAST(SUM(CASE WHEN k % 3 = 0 THEN (d.doc_id * 7919 + k) % 256 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN k % 3 = 1 THEN (d.doc_id * 7919 + k) % 256 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN k % 3 = 2 THEN (d.doc_id * 7919 + k) % 256 END) AS BIGINT) AS sum_b,
       CAST(SUM(CASE WHEN k % 3 = 0 THEN (d.doc_id * 7919 + k) % 256 END) AS DOUBLE) / {IMG_N // 3} AS mean_r,
       CAST(SUM(CASE WHEN k % 3 = 1 THEN (d.doc_id * 7919 + k) % 256 END) AS DOUBLE) / {IMG_N // 3} AS mean_g,
       CAST(SUM(CASE WHEN k % 3 = 2 THEN (d.doc_id * 7919 + k) % 256 END) AS DOUBLE) / {IMG_N // 3} AS mean_b
FROM documents d CROSS JOIN range(0, {IMG_N}) t(k)
GROUP BY d.doc_id
""",
    tags=("multimodal", "image", "codec"),
)
def q60_image_decode_stats(spark, sf_dir):
    """Real PNG round-trip: encode the formula pixels, decode with the
    stdlib codec, aggregate channel sums. Matches the oracle only if the
    codec is the identity (multimodal/png_codec.py)."""
    from ..multimodal.binary_ops import decode_image_batch
    from ..multimodal.png_codec import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pngs = pd.Series(
                [encode_png(_img_pixels(int(d))) for d in pdf["doc_id"]]
            )
            rows = []
            for doc_id, img in zip(pdf["doc_id"], decode_image_batch(pngs)):
                sr, sg, sb, n = _channel_stats(img)
                rows.append(
                    (
                        doc_id,
                        img.shape[1],
                        img.shape[0],
                        sr,
                        sg,
                        sb,
                        float(sr) / n,
                        float(sg) / n,
                        float(sb) / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return docs.mapInPandas(
        stats,
        "doc_id long, width int, height int, sum_r long, sum_g long, "
        "sum_b long, mean_r double, mean_g double, mean_b double",
    )


@query(
    "q61_image_resize_stats",
    oracle=f"""
SELECT d.doc_id,
       8 AS width, 8 AS height,
       CAST(SUM(CASE WHEN j % 3 = 0 THEN (d.doc_id * 7919 +
            ((j // 24) * {IMG_SIDE} // 8) * {IMG_SIDE * 3} +
            (((j % 24) // 3) * {IMG_SIDE} // 8) * 3 + j % 3) % 256 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN j % 3 = 1 THEN (d.doc_id * 7919 +
            ((j // 24) * {IMG_SIDE} // 8) * {IMG_SIDE * 3} +
            (((j % 24) // 3) * {IMG_SIDE} // 8) * 3 + j % 3) % 256 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN j % 3 = 2 THEN (d.doc_id * 7919 +
            ((j // 24) * {IMG_SIDE} // 8) * {IMG_SIDE * 3} +
            (((j % 24) // 3) * {IMG_SIDE} // 8) * 3 + j % 3) % 256 END) AS BIGINT) AS sum_b
FROM documents d CROSS JOIN range(0, 192) t(j)
GROUP BY d.doc_id
""",
    tags=("multimodal", "image", "resize"),
)
def q61_image_resize_stats(spark, sf_dir):
    """Real resize kernel: encode 15x15 -> resize_images to 8x8
    (decode -> nearest-neighbor -> encode) -> decode -> channel sums.
    The oracle replays the nearest-neighbor index math ((y*15)//8) on
    the source formula."""
    from ..multimodal.binary_ops import resize_images
    from ..multimodal.png_codec import decode_png, encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def to_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_png(_img_pixels(int(d))) for d in pdf["doc_id"]
                    ],
                }
            )

    pngs = docs.mapInPandas(to_png, "doc_id long, content binary")
    resized = resize_images(pngs, "doc_id", "content", size=(8, 8))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h, content in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["content"]
            ):
                sr, sg, sb, _ = _channel_stats(decode_png(bytes(content)))
                rows.append((doc_id, w, h, sr, sg, sb))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return resized.mapInPandas(
        stats,
        "doc_id long, width int, height int, sum_r long, sum_g long, sum_b long",
    )


@query(
    "q62_audio_wav_stats",
    oracle="""
SELECT d.doc_id,
       CAST(1000 AS BIGINT) AS n_samples,
       8000 AS sample_rate,
       CAST(0.125 AS DOUBLE) AS duration_s,
       CAST(MAX(ABS(((d.doc_id * 31 + i * 17) % 4001) - 2000)) AS BIGINT) AS peak,
       CAST(SUM(ABS(((d.doc_id * 31 + i * 17) % 4001) - 2000)) AS BIGINT) AS sum_abs,
       CAST(SUM(ABS(((d.doc_id * 31 + i * 17) % 4001) - 2000)) AS DOUBLE) / 1000 AS mean_abs
FROM documents d CROSS JOIN range(0, 1000) t(i)
GROUP BY d.doc_id
""",
    tags=("multimodal", "audio", "codec"),
)
def q62_audio_wav_stats(spark, sf_dir):
    """Real WAV round-trip: formula samples -> stdlib wave encode ->
    extract_audio_features (wave decode + integer stats)."""
    from ..multimodal.binary_ops import extract_audio_features
    from ..multimodal.wav_codec import encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def to_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_wav(
                            (
                                ((int(d) * 31 + np.arange(1000) * 17) % 4001)
                                - 2000
                            ).astype(np.int16),
                            8000,
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    wavs = docs.mapInPandas(to_wav, "doc_id long, content binary")
    return extract_audio_features(wavs, "doc_id", "content")


@query(
    "q46_video_frame_stats",
    oracle="""
SELECT d.doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(SUM((d.doc_id * 7919 + f * 131 + k) % 256) AS BIGINT) AS sum_rgb,
       CAST(SUM((d.doc_id * 7919 + f * 131 + k) % 256) AS DOUBLE) / 192 AS mean_rgb
FROM documents d
CROSS JOIN (VALUES (0), (2), (4)) fs(f)
CROSS JOIN range(0, 192) t(k)
WHERE d.doc_id < 120
GROUP BY d.doc_id, f
""",
    tags=("multimodal", "video"),
)
def q46_video_frame_stats(spark, sf_dir):
    """Real frame sampling: pack 6 formula frames per doc into the PNGV
    container (fps=2), sample every 1 s -> frames 0/2/4, decode each
    sampled frame, aggregate its pixel sum."""
    from ..multimodal.binary_ops import pack_video_frames, sample_video_frames
    from ..multimodal.png_codec import decode_png, encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 120)
    )

    def to_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                frames = [
                    encode_png(
                        ((int(d) * 7919 + f * 131 + np.arange(192)) % 256)
                        .reshape(8, 8, 3)
                        .astype(np.uint8)
                    )
                    for f in range(6)
                ]
                payloads.append(pack_video_frames(frames, fps=2.0))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    videos = docs.mapInPandas(to_video, "doc_id long, content binary")
    sampled = sample_video_frames(videos, "doc_id", "content", every_s=1.0)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, idx, frame in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["frame"]
            ):
                total = int(decode_png(bytes(frame)).astype(np.int64).sum())
                rows.append((doc_id, idx, total, float(total) / 192))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "sum_rgb", "mean_rgb"]
            )

    return sampled.mapInPandas(
        stats, "doc_id long, frame_idx long, sum_rgb long, mean_rgb double"
    )


@query(
    "q98_image_phash_dedup",
    oracle=f"""
WITH px AS (
  SELECT d.doc_id, d.doc_id % 40 AS base, r.i, s.j
  FROM documents d, range(0, 8) r(i), range(0, 9) s(j)
),
gray AS (
  SELECT doc_id, i, j,
         (((base * 7919 + ((i * {IMG_SIDE} // 8) * {IMG_SIDE}
                           + (j * {IMG_SIDE} // 9)) * 3 + 0) % 200)
        + ((base * 7919 + ((i * {IMG_SIDE} // 8) * {IMG_SIDE}
                           + (j * {IMG_SIDE} // 9)) * 3 + 1) % 200)
        + ((base * 7919 + ((i * {IMG_SIDE} // 8) * {IMG_SIDE}
                           + (j * {IMG_SIDE} // 9)) * 3 + 2) % 200)) // 3 AS g
  FROM px
),
bits AS (
  SELECT a.doc_id, a.i, a.j,
         CASE WHEN a.g < b.g THEN '1' ELSE '0' END AS bit
  FROM gray a JOIN gray b
    ON b.doc_id = a.doc_id AND b.i = a.i AND b.j = a.j + 1
  WHERE a.j < 8
),
hashes AS (
  SELECT doc_id, STRING_AGG(bit, '' ORDER BY i, j) AS dhash
  FROM bits GROUP BY doc_id
)
SELECT dhash, MIN(doc_id) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_images
FROM hashes GROUP BY dhash
""",
    tags=("multimodal", "image", "dedup", "phash"),
)
def q98_image_phash_dedup(spark, sf_dir):
    """Perceptual image dedup via dHash over the REAL codec path: encode
    the formula pixels to PNG, decode, nearest-resize to 9x8, gray, and
    hash the 64 left<right gradient comparisons. Images share a base
    pattern per (doc_id % 40) but carry a per-doc brightness offset, so
    their BYTES differ while the gradient hash is identical -- exact
    dedup (q50) misses them, the perceptual hash buckets them. The
    oracle recomputes the hash from the pixel formula (offset-free: a
    uniform shift cancels in every comparison), so the match certifies
    decode -> resize -> hash end to end. Scale shape: one mapInPandas
    pass emits (id, 64-char hash); only those shuffle for the groupBy."""
    from ..multimodal.binary_ops import decode_image_batch, resize_nearest
    from ..multimodal.png_codec import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pngs = []
            for d in pdf["doc_id"]:
                d = int(d)
                base, offset = d % 40, (d // 40) % 5
                vals = (base * 7919 + np.arange(IMG_N)) % 200 + offset
                pngs.append(
                    encode_png(
                        vals.reshape(IMG_SIDE, IMG_SIDE, 3).astype(np.uint8)
                    )
                )
            rows = []
            for d, img in zip(pdf["doc_id"], decode_image_batch(pd.Series(pngs))):
                small = resize_nearest(img, (9, 8)).astype(np.int64)
                gray = small.sum(axis=2) // 3
                bits = (gray[:, :-1] < gray[:, 1:]).astype(int).flatten()
                rows.append((int(d), "".join(map(str, bits))))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash"])

    h = docs.mapInPandas(hashes, "doc_id long, dhash string")
    return h.groupBy("dhash").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_images"),
    )


@query(
    "q99_audio_fingerprint_dedup",
    oracle="""
WITH e AS (
  SELECT d.doc_id, t.i // 50 AS w,
         SUM(ABS(((d.doc_id % 30) * 31
                  + t.i * (17 + (d.doc_id % 30) % 7)) % 4001 - 2000)) AS en
  FROM documents d CROSS JOIN range(0, 1000) t(i)
  GROUP BY 1, 2
),
bits AS (
  SELECT a.doc_id, a.w,
         CASE WHEN b.en > a.en THEN '1' ELSE '0' END AS bit
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
),
fp AS (
  SELECT doc_id, STRING_AGG(bit, '' ORDER BY w) AS afp
  FROM bits GROUP BY doc_id
)
SELECT afp, MIN(doc_id) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_clips
FROM fp GROUP BY afp
""",
    tags=("multimodal", "audio", "dedup", "fingerprint"),
)
def q99_audio_fingerprint_dedup(spark, sf_dir):
    """Audio fingerprint dedup over the REAL codec path: clips share a
    base waveform per (doc_id % 30) (base-specific stride, so envelopes
    genuinely differ across bases) but carry a per-doc integer GAIN, so
    their samples (and WAV bytes) differ while the energy-envelope
    fingerprint -- the sign of consecutive 50-sample window-energy
    deltas, 19 bits -- is gain-invariant (positive gain scales every
    window energy uniformly, preserving each comparison). Encode with stdlib
    wave, decode, window, hash; the oracle recomputes the envelope from
    the gain-free formula, so the match certifies decode -> window ->
    fingerprint end to end. Only (id, 19-char fingerprint) shuffles."""
    from ..multimodal.wav_codec import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def fingerprints(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                base, gain = d % 30, 1 + (d // 30) % 4
                vals = (
                    ((base * 31 + np.arange(1000) * (17 + base % 7)) % 4001
                     - 2000) * gain
                ).astype(np.int16)
                samples, _rate = decode_wav(encode_wav(vals, 8000))
                en = (
                    np.abs(samples.astype(np.int64)).reshape(20, 50).sum(axis=1)
                )
                bits = (en[1:] > en[:-1]).astype(int)
                rows.append((d, "".join(map(str, bits))))
            yield pd.DataFrame(rows, columns=["doc_id", "afp"])

    fp = docs.mapInPandas(fingerprints, "doc_id long, afp string")
    return fp.groupBy("afp").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_clips"),
    )
