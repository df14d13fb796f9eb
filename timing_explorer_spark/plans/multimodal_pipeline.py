"""Multimodal query inventory — binary-payload processing shapes.

The synthetic media table derives deterministically from ``documents``
(payload = UTF-8 bytes of the text), so the Arrow-batched fingerprint pass
is DuckDB-checkable; the feature/frame queries are rows-only by nature
(numpy-defined outputs / plan-shaped outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary_ops import (
    byte_histogram_features,
    frame_sample_plan,
    media_fingerprints,
    synthetic_media_from_documents,
)
from ..sources.tables import load
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthetic_media_from_documents(load(spark, sf_dir, "documents"))


@register(
    "q_media_fingerprints",
    oracle="""
        SELECT doc_id AS media_id,
               strlen(text) AS n_bytes,
               MD5(text)    AS fp_md5
        FROM documents
    """,
    doc=(
        "Arrow-batched binary fingerprinting via mapInPandas (bytes in, "
        "md5+size out) — oracle-checkable because the synthetic payload is "
        "the document's UTF-8 bytes."
    ),
    tags=("multimodal", "binary", "pandas-udf"),
)
def q_media_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_fingerprints(_media(spark, sf_dir))


@register(
    "q_media_features",
    oracle=None,  # numpy-defined float32 histogram; determinism tested in pytest
    doc=(
        "Binary payload -> array<float> feature extraction (byte-histogram "
        "stand-in for an embedding model) via mapInPandas. Rows-only check; "
        "tests/test_multimodal.py asserts determinism and batch-shape "
        "invariance."
    ),
    tags=("multimodal", "binary", "pandas-udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_histogram_features(_media(spark, sf_dir))


@register(
    "q_media_frame_plan",
    oracle="""
        SELECT doc_id AS media_id,
               UNNEST(generate_series(0, n_chars * 10, 1000)) AS frame_ts_ms
        FROM documents
        WHERE doc_id % 3 = 2
    """,
    doc=(
        "Video frame-sampling plan: one row per frame timestamp computed "
        "distributively from metadata (kind='video' == doc_id%3=2 in the "
        "synthetic mapping; duration_ms = n_chars*10)."
    ),
    tags=("multimodal", "video"),
)
def q_media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample_plan(_media(spark, sf_dir))
