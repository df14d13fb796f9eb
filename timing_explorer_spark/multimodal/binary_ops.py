"""Multimodal (image/audio/video) column plumbing for a training-data pipeline.

Design: media travels as an opaque ``binary`` payload column + a typed
metadata struct; every transform is an Arrow-batched Pandas operation over
``mapInPandas`` (binary columns cross the Arrow boundary zero-copy as
``bytes``). Partitioning is inherited from the source — payloads never
shuffle unless a downstream group/join forces it, which is the property that
matters at 100 TB (decode happens where the bytes already live).

The actual codec work (JPEG decode, resampling, frame extraction) requires
libraries this container doesn't ship (PIL/ffmpeg/librosa), so the decode
kernels are STUBS behind import-guards that raise NotImplementedError with a
clear message — but everything Spark-side (schema, UDF signatures, Arrow
batch shapes, deterministic fallback features) is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture: the
    UTF-8 text bytes play the role of an encoded payload (same schema,
    partitioning and Arrow behavior as real media; only the codec is fake)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.lit("synthetic").alias("format"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def media_fingerprints(media: DataFrame) -> DataFrame:
    """Arrow-batched payload fingerprinting: (media_id, n_bytes, fp_md5).
    The canonical 'cheap pass over every blob' shape — dedup/virus-scan/
    integrity jobs all look like this. Python sees bytes objects; no decode."""

    def fp(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": b["payload"].map(len),
                    "fp_md5": b["payload"].map(lambda p: hashlib.md5(p).hexdigest()),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        fp, schema="media_id long, n_bytes long, fp_md5 string"
    )


def byte_histogram_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fallback 'feature extractor': normalized byte histogram
    folded to ``dim`` buckets — the stand-in for a real image/audio embedding
    model, with the exact UDF signature and batch shape a real one would
    have (binary in -> array<float> out, numpy inside)."""

    def feats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for b in batches:
            out = []
            for p in b["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                total = hist.sum()
                out.append((hist / total if total else hist).astype(np.float32))
            yield pd.DataFrame({"media_id": b["media_id"], "features": out})

    return media.select("media_id", "payload").mapInPandas(
        feats,
        schema=StructType(
            [
                StructField("media_id", LongType()),
                StructField("features", ArrayType(FloatType())),
            ]
        ),
    )


def decode_image(media: DataFrame, target_size: tuple[int, int] | None = None) -> DataFrame:
    """Real image decode (+ optional resize) -> (media_id, width, height,
    pixels binary). STUB: requires PIL, which this environment doesn't ship."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image needs Pillow, which is not available in this "
            "container. The Spark-side contract (binary payload in, "
            "(media_id, width, height, pixels) out via mapInPandas) is what "
            "byte_histogram_features exercises with a deterministic fake."
        ) from e
    raise NotImplementedError("real decode path unreached in this environment")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per frame timestamp from
    the metadata (decode itself would need ffmpeg — stubbed). This is the
    real scale pattern: compute the frame index distributively from metadata,
    ship only (media_id, frame_ts) to the decode stage."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long")
                )
            ).alias("frame_ts_ms"),
        )
    )
