"""Multimodal plumbing: payload columns, decode/feature/resize/frame
stages (Arrow-batched mapInPandas; kernels stubbed deterministically)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.multimodal import (
    DecoderRegistry, attach_media, extract_features, payload_stats,
    resize_images, sample_frames)


@pytest.fixture(scope="module")
def media(documents):
    return attach_media(documents.limit(50), "text", "doc_id",
                        media_type="image", fmt="raw")


def test_attach_and_stats(media):
    row = payload_stats(media).first()
    assert row["media_type"] == "image"
    assert row["n_items"] == 50 and row["total_bytes"] > 0


def test_extract_features_deterministic(media):
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(media).orderBy("media_id").collect()
    assert a == b
    assert len(a[0]["feature"]) == 8
    assert abs(sum(a[0]["feature"]) - 1.0) < 1e-6   # normalized histogram


def test_unregistered_media_type_raises(spark, documents):
    DecoderRegistry._decoders.pop("pdf", None)
    bad = attach_media(documents.limit(1), "text", "doc_id", media_type="pdf")
    with pytest.raises(Exception, match="no decoder registered"):
        extract_features(bad).collect()


def test_resize_updates_payload_and_meta(media):
    out = resize_images(media, 16, 4).collect()
    assert all(len(r["payload"]) == 64 for r in out)
    assert all(r["meta"]["width"] == 16 and r["meta"]["height"] == 4
               for r in out)


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    agg = (frames.groupBy("media_id")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("frame_idx").alias("max_idx")).collect())
    assert len(agg) == 50
    assert all(1 <= r["n"] <= 4 and r["max_idx"] == r["n"] - 1 for r in agg)
    row = frames.first()
    assert isinstance(row["frame"], (bytes, bytearray)) and len(row["frame"]) <= 64
