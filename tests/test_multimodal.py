"""Multimodal tier: real PNG/WAV codecs (stdlib zlib/wave), resize,
video-frame sampling, and the metadata/feature plumbing over mapInPandas."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.multimodal import (
    attach_binary_metadata,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    extract_audio_features,
    extract_image_features,
    pack_video_frames,
    resize_images,
    sample_video_frames,
)
from pos_data_insertion_etl_spark.multimodal.binary_ops import (
    decode_image_batch,
    resize_nearest,
)


@pytest.fixture(scope="module")
def binary_docs(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("content"))


@pytest.fixture(scope="module")
def png_docs(spark, sf_smoke):
    """Real PNG payloads: deterministic pixels derived from doc_id."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id").limit(20)

    def to_png(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_png(
                            ((int(d) * 7919 + np.arange(16 * 16 * 3)) % 256)
                            .reshape(16, 16, 3)
                            .astype(np.uint8)
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.mapInPandas(to_png, "doc_id long, content binary")


def test_png_roundtrip_shapes():
    rng = np.random.default_rng(42)
    for shape in [(5, 7, 3), (8, 8, 4), (3, 2, 1), (6, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(arr))
        want = arr if arr.ndim == 3 else arr[:, :, None]
        assert np.array_equal(got, want), shape


def _encode_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types --
    exercises the decoder's Sub/Up/Average/Paeth paths, which the
    engine's own encoder (always filter 0) never emits."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, f in zip(range(h), filters):
        raw.append(f)
        for x in range(stride):
            a = int(flat[y, x - ch]) if x >= ch else 0
            b = int(flat[y - 1, x]) if y > 0 else 0
            c = int(flat[y - 1, x - ch]) if y > 0 and x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
            raw.append((int(flat[y, x]) - pred) & 0xFF)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    data = _encode_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), arr)


def test_png_rejects_corruption():
    arr = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(data[4:]))
    data[40] ^= 0xFF  # flip a byte inside a chunk -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=100, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000
    assert np.array_equal(out, mono)
    stereo = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100
    assert np.array_equal(out, stereo)


def test_metadata_struct(spark, binary_docs):
    tagged = attach_binary_metadata(binary_docs, "content", "image", "png")
    row = tagged.select("doc_id", "media_meta.*").first()
    assert row["modality"] == "image"
    assert row["n_bytes"] > 0


def test_feature_extraction_real_png(spark, png_docs):
    """Channel means from the REAL decode match the closed-form pixel
    generator -- no fake path involved."""
    got = {
        r.doc_id: (r.mean_r, r.mean_g, r.mean_b)
        for r in extract_image_features(png_docs, "doc_id", "content").collect()
    }
    assert got
    for doc_id, (mr, mg, mb) in got.items():
        vals = (doc_id * 7919 + np.arange(16 * 16 * 3)) % 256
        exp = vals.reshape(-1, 3).mean(axis=0)
        assert (mr, mg, mb) == (exp[0], exp[1], exp[2])


def test_feature_extraction_fake_path(spark, binary_docs):
    """Non-PNG payloads still flow via the deterministic fake decoder."""
    f1 = {
        r.doc_id: (r.mean_r, r.phash)
        for r in extract_image_features(
            binary_docs, "doc_id", "content", fake=True
        ).collect()
    }
    assert len(f1) == binary_docs.count()
    assert all(0 <= v[0] <= 255 for v in f1.values())


def test_resize_images_real(spark, png_docs):
    """Resize runs the real decode->nearest->encode kernel; the resized
    pixels equal numpy indexing on the source."""
    out = {
        r.doc_id: bytes(r.content)
        for r in resize_images(png_docs, "doc_id", "content", size=(8, 8)).collect()
    }
    assert out
    for doc_id, png in out.items():
        src = ((doc_id * 7919 + np.arange(16 * 16 * 3)) % 256).reshape(
            16, 16, 3
        ).astype(np.uint8)
        assert np.array_equal(decode_png(png), resize_nearest(src, (8, 8)))


def test_video_frame_sampling(spark):
    """PNGV container: fps=2 and every_s=1 -> frames 0, 2, 4 sampled;
    sampled frames decode back to their source pixels."""
    frames = [
        np.full((4, 4, 3), 10 * i, np.uint8) for i in range(6)
    ]
    packed = pack_video_frames([encode_png(f) for f in frames], fps=2.0)
    df = spark.createDataFrame([(1, bytearray(packed))], "doc_id long, content binary")
    rows = sample_video_frames(df, "doc_id", "content", every_s=1.0).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    for r in rows:
        assert np.array_equal(decode_png(bytes(r.frame)), frames[r.frame_idx])


def test_audio_features_real(spark):
    clips = []
    for doc_id in range(3):
        samples = (((doc_id * 31 + np.arange(1000) * 17) % 4001) - 2000).astype(
            np.int16
        )
        clips.append((doc_id, bytearray(encode_wav(samples, 8000))))
    df = spark.createDataFrame(clips, "doc_id long, content binary")
    got = {r.doc_id: r for r in extract_audio_features(df, "doc_id", "content").collect()}
    for doc_id in range(3):
        samples = ((doc_id * 31 + np.arange(1000) * 17) % 4001) - 2000
        r = got[doc_id]
        assert r.n_samples == 1000
        assert r.sample_rate == 8000
        assert r.duration_s == 0.125
        assert r.peak == int(np.abs(samples).max())
        assert r.sum_abs == int(np.abs(samples).sum())


def test_unknown_format_raises_without_fake():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image_batch(pd.Series([b"\xff\xd8\xff\xe0 not a png"]))


# --- property-based codec checks (hypothesis) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.uint8
    )
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(2, 8),
    w=st.integers(2, 8),
    filters=st.lists(st.integers(0, 4), min_size=2, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_decode_random_filter_sequences(h, w, filters, seed):
    """Any mix of the five scanline filters must decode to the source
    pixels (our encoder emits only filter 0; foreign PNGs use them all)."""
    h = len(filters) if len(filters) <= h else h
    filters = filters[:h]
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_png(_encode_with_filters(arr, filters)), arr)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 44100]),
    stereo=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, stereo, seed):
    shape = (n, 2) if stereo else (n,)
    samples = np.random.default_rng(seed).integers(
        -32768, 32767, size=shape, dtype=np.int16
    )
    out, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


def test_feature_extraction_grayscale_and_mixed_channels(spark):
    """Grayscale PNGs (HxWx1 decode) and batches mixing channel counts
    must both yield valid mean_r/g/b (luma replicated for gray)."""
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    rgb = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) % 256
    rgba = np.arange(8 * 8 * 4, dtype=np.uint8).reshape(8, 8, 4) % 256
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(gray))),
         (2, bytearray(encode_png(rgb))),
         (3, bytearray(encode_png(rgba)))],
        "doc_id long, content binary",
    ).coalesce(1)  # one batch -> exercises mixed-channel np.stack
    feats = {
        r.doc_id: r
        for r in extract_image_features(df, "doc_id", "content").collect()
    }
    g = feats[1]
    assert g.mean_r == g.mean_g == g.mean_b == pytest.approx(gray.mean())
    c = feats[2]
    assert c.mean_r == pytest.approx(rgb[:, :, 0].mean())
    assert c.mean_b == pytest.approx(rgb[:, :, 2].mean())
    a = feats[3]
    assert a.mean_g == pytest.approx(rgba[:, :, 1].mean())
