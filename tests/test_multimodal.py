"""Multimodal binary-column plumbing: real schemas/batching, stubbed
codecs (deterministic fake decoder)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.multimodal import (
    attach_binary_metadata,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from pos_data_insertion_etl_spark.multimodal.binary_ops import decode_image_batch


@pytest.fixture(scope="module")
def binary_docs(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("content"))


def test_metadata_struct(spark, binary_docs):
    tagged = attach_binary_metadata(binary_docs, "content", "image", "png")
    row = tagged.select("doc_id", "media_meta.*").first()
    assert row["modality"] == "image"
    assert row["n_bytes"] > 0
    # metadata-only projection must not read the payload column
    plan = tagged.select("doc_id", "media_meta.n_bytes")._jdf.queryExecution().toString()
    assert "content" in plan  # n_bytes derives from content length here


def test_feature_extraction_deterministic(spark, binary_docs):
    f1 = {r.doc_id: (r.mean_r, r.phash) for r in
          extract_image_features(binary_docs, "doc_id", "content").collect()}
    f2 = {r.doc_id: (r.mean_r, r.phash) for r in
          extract_image_features(binary_docs, "doc_id", "content").collect()}
    assert f1 == f2  # seeded fake decode -> stable features
    assert len(f1) == binary_docs.count()
    assert all(0 <= v[0] <= 255 for v in f1.values())


def test_feature_schema(spark, binary_docs):
    df = extract_image_features(binary_docs, "doc_id", "content")
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "n_bytes": "bigint",
        "mean_r": "double",
        "mean_g": "double",
        "mean_b": "double",
        "phash": "string",
    }


def test_real_decode_is_stubbed(binary_docs):
    import pandas as pd

    with pytest.raises(NotImplementedError, match="codec"):
        decode_image_batch(pd.Series([b"xx"]), fake=False)
    with pytest.raises(NotImplementedError):
        resize_images(binary_docs, "doc_id", "content")
    with pytest.raises(NotImplementedError):
        sample_video_frames(binary_docs, "doc_id", "content")
