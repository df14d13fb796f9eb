"""Multimodal plumbing: Arrow binary round-trip, determinism under
repartitioning, stubbed decode behavior, frame plan correctness."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.multimodal import (
    byte_histogram_features,
    decode_image,
    frame_sample_plan,
    media_fingerprints,
    synthetic_media_from_documents,
)
from timing_explorer_spark.sources.tables import load


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    return synthetic_media_from_documents(load(spark, sf_smoke, "documents"))


def test_payload_survives_arrow_roundtrip(spark, media):
    """binary payload -> Python bytes -> md5 must equal md5 of the original text."""
    doc = load(spark, "/root/testdata/sf0.001", "documents").where(F.col("doc_id") == 0)
    text = doc.collect()[0]["text"]
    fp = media_fingerprints(media.where(F.col("media_id") == 0)).collect()[0]
    assert fp["fp_md5"] == hashlib.md5(text.encode()).hexdigest()
    assert fp["n_bytes"] == len(text.encode())


def test_features_partition_invariant(spark, media):
    """Feature extraction must not depend on Arrow batch boundaries."""
    one = {r.media_id: tuple(r.features) for r in byte_histogram_features(media.coalesce(1)).collect()}
    many = {
        r.media_id: tuple(r.features)
        for r in byte_histogram_features(media.repartition(13)).collect()
    }
    assert one == many
    sample = next(iter(one.values()))
    assert len(sample) == 16
    assert abs(sum(sample) - 1.0) < 1e-5  # normalized histogram


def test_decode_image_is_clean_stub(media):
    with pytest.raises(NotImplementedError) as ei:
        decode_image(media)
    assert "Pillow" in str(ei.value)


def test_frame_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.where(F.col("kind") == "video").select("media_id", "meta").collect()
    }
    assert rows and set(r["media_id"] for r in rows) == set(durations)
    for r in rows:
        assert r["count"] == durations[r["media_id"]] // 1000 + 1
