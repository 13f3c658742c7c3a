"""Multimodal plumbing: binary columns, Arrow-batched feature extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    documents_as_binary,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_binary(spark, sf_dir).cache()


def test_binary_payload_roundtrip(media, spark, sf_dir):
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    joined = media.join(docs, media.media_id == docs.doc_id).select(
        F.decode(F.col("content"), "utf-8").alias("roundtrip"), "text"
    )
    assert joined.where(F.col("roundtrip") != F.col("text")).count() == 0


def test_feature_extraction_deterministic(media):
    a = extract_features(media, fake=True).orderBy("media_id").collect()
    b = extract_features(media, fake=True).orderBy("media_id").collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]
    assert all(len(r["features"]) == FEATURE_DIM for r in a)
    assert all(0.0 <= v < 1.0 for r in a for v in r["features"])


def test_feature_bytes_match_utf8_length(media):
    feats = extract_features(media, fake=True)
    joined = feats.join(media, "media_id").select(
        "n_bytes", F.length("content").alias("blen")
    )
    assert joined.where(F.col("n_bytes") != F.col("blen")).count() == 0


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_rewrites_metadata(media):
    out = resize_images(media, 224, 224).select("meta.width", "meta.height")
    rows = out.distinct().collect()
    assert rows == [type(rows[0])(width=224, height=224)]


def test_sample_frames_explodes(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), ("video", "mp4", None, None, 3000, "u"))],
        schema="media_id long, content binary, "
        "meta struct<media_type string, format string, width int,"
        " height int, duration_ms long, source_uri string>",
    )
    rows = sample_frames(df, every_ms=1000).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
