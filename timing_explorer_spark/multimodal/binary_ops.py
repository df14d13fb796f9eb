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
    """Compressed-image decode (+ optional resize) -> (media_id, width,
    height, pixels binary). STUB for compressed codecs only (JPEG/PNG need
    PIL, which this environment doesn't ship); codec-FREE formats decode for
    real — see ``ppm_stats``/``wav_stats`` below (pure-numpy RIFF/P6 parsers
    in ``codecs.py``)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image needs Pillow for compressed codecs, which is not "
            "available in this container. Codec-free formats are decoded for "
            "real by ppm_stats/wav_stats (multimodal/codecs.py); "
            "byte_histogram_features covers the embedding-model UDF shape "
            "with a deterministic fake."
        ) from e
    raise NotImplementedError("real decode path unreached in this environment")


def synthetic_wav_media(docs: DataFrame) -> DataFrame:
    """Real WAV payloads fabricated deterministically from ``documents``:
    per doc, PCM16 mono samples from the closed form
    ``s(i) = ((doc_id*7919 + i*104729) % 65536) - 32768`` with
    ``n = 200 + doc_id % 57`` samples at ``rate = 8000 + (doc_id % 3)*4000``
    Hz, packed into spec-conforming RIFF bytes by the struct writer. The
    closed form is what makes the downstream DECODE query oracle-checkable:
    DuckDB regenerates the same samples via generate_series and must agree
    with features computed from the actual decoded bytes."""

    def enc(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import encode_wav_bytes

        for b in batches:
            payloads = []
            for doc_id in b["doc_id"]:
                n = 200 + int(doc_id) % 57
                rate = 8000 + (int(doc_id) % 3) * 4000
                i = np.arange(n, dtype=np.int64)
                s = ((int(doc_id) * 7919 + i * 104729) % 65536 - 32768).astype(np.int16)
                payloads.append(encode_wav_bytes(s, rate))
            yield pd.DataFrame({"media_id": b["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(enc, schema="media_id long, payload binary")


def wav_stats(media: DataFrame, on_error: str = "fail") -> DataFrame:
    """REAL audio decode: parse each RIFF payload (chunk walk + frombuffer),
    then integer sample-level features — rate/frames/duration from the
    header, amplitude sum, peak, and zero-crossing count from the decoded
    PCM. All-integer outputs hash-match a SQL oracle exactly. Arrow-batched
    mapInPandas: decode happens where the bytes live, nothing shuffles.

    ``on_error``: at 100 TB a corpus WILL contain corrupt blobs. "fail"
    (default) propagates the decoder's typed ValueError/NotImplementedError
    (correctness first); "skip" emits an extra boolean ``decode_ok`` column
    with NULL features for undecodable payloads — the job finishes, and the
    failure count is one filter away (the quarantine-table pattern)."""
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_wav_bytes

        for b in batches:
            out = {
                "media_id": b["media_id"],
                "sample_rate": [],
                "n_samples": [],
                "duration_ms": [],
                "sum_amp": [],
                "max_abs": [],
                "zero_crossings": [],
                "decode_ok": [],
            }
            for p in b["payload"]:
                try:
                    w = decode_wav_bytes(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "fail":
                        raise
                    for k in (
                        "sample_rate", "n_samples", "duration_ms",
                        "sum_amp", "max_abs", "zero_crossings",
                    ):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                s = w.samples[:, 0].astype(np.int64)  # mono feature pass
                out["sample_rate"].append(w.sample_rate)
                out["n_samples"].append(len(s))
                out["duration_ms"].append(len(s) * 1000 // w.sample_rate)
                out["sum_amp"].append(int(s.sum()))
                out["max_abs"].append(int(np.abs(s).max()) if len(s) else 0)
                out["zero_crossings"].append(int(np.sum(s[1:] * s[:-1] < 0)))
                out["decode_ok"].append(True)
            if on_error == "fail":
                del out["decode_ok"]
            yield pd.DataFrame(out)

    schema = (
        "media_id long, sample_rate int, n_samples long, duration_ms long, "
        "sum_amp long, max_abs long, zero_crossings long"
    )
    if on_error == "skip":
        schema += ", decode_ok boolean"
    return media.select("media_id", "payload").mapInPandas(stats, schema=schema)


def synthetic_ppm_media(docs: DataFrame) -> DataFrame:
    """Real binary-PPM payloads from ``documents``: per doc, a
    ``w = 8 + doc_id % 9`` by ``h = 6 + doc_id % 7`` RGB raster whose byte
    stream is ``b(j) = (doc_id*31 + j*13) % 256``, written as a
    spec-conforming P6 file (with a header comment, exercising the parser's
    comment handling)."""

    def enc(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for b in batches:
            payloads = []
            for doc_id in b["doc_id"]:
                w = 8 + int(doc_id) % 9
                h = 6 + int(doc_id) % 7
                j = np.arange(w * h * 3, dtype=np.int64)
                raster = ((int(doc_id) * 31 + j * 13) % 256).astype(np.uint8)
                payloads.append(
                    f"P6\n# synthetic fixture doc {int(doc_id)}\n{w} {h}\n255\n".encode()
                    + raster.tobytes()
                )
            yield pd.DataFrame({"media_id": b["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(enc, schema="media_id long, payload binary")


def synthetic_bmp_media(docs: DataFrame) -> DataFrame:
    """Real 24-bit BMP payloads from ``documents``: per doc, a
    ``w = 5 + doc_id % 11`` by ``h = 4 + doc_id % 5`` RGB image whose
    TOP-DOWN row-major RGB byte stream is ``b(j) = (doc_id*17 + j*7) % 256``
    — the encoder then applies the format's bottom-up order, BGR swap and
    row padding, all of which the decoder must undo, so the closed-form
    oracle stays a direct function of j."""

    def enc(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import encode_bmp_bytes

        for b in batches:
            payloads = []
            for doc_id in b["doc_id"]:
                w = 5 + int(doc_id) % 11
                h = 4 + int(doc_id) % 5
                j = np.arange(w * h * 3, dtype=np.int64)
                px = ((int(doc_id) * 17 + j * 7) % 256).astype(np.uint8)
                payloads.append(encode_bmp_bytes(px.reshape(h, w, 3)))
            yield pd.DataFrame({"media_id": b["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(enc, schema="media_id long, payload binary")


def ppm_stats(media: DataFrame, on_error: str = "fail") -> DataFrame:
    """REAL image decode: parse each P6 payload (header + raster view), then
    integer pixel-level features — dimensions from the header, per-channel
    sums and peak from the decoded raster. All-integer, oracle-checkable.
    ``on_error``: same contract as wav_stats — "fail" propagates the typed
    decode error, "skip" quarantines corrupt payloads as decode_ok=false
    rows with NULL features."""
    return _raster_stats(media, "ppm", on_error)


def bmp_stats(media: DataFrame, on_error: str = "fail") -> DataFrame:
    """REAL image decode for uncompressed 24-bit Windows BMP — same feature
    set and on_error contract as ppm_stats; the decoder undoes the format's
    bottom-up row order, 4-byte row padding and BGR channel order
    (multimodal/codecs.py::decode_bmp_bytes), so the emitted channel sums
    are over the LOGICAL top-down RGB raster, identical in meaning to the
    PPM path."""
    return _raster_stats(media, "bmp", on_error)


def _raster_stats(media: DataFrame, codec: str, on_error: str) -> DataFrame:
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_bmp_bytes, decode_ppm_bytes

        decoder = decode_ppm_bytes if codec == "ppm" else decode_bmp_bytes

        for b in batches:
            out = {
                "media_id": b["media_id"],
                "width": [],
                "height": [],
                "sum_r": [],
                "sum_g": [],
                "sum_b": [],
                "max_byte": [],
                "decode_ok": [],
            }
            for p in b["payload"]:
                try:
                    img = decoder(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "fail":
                        raise
                    for k in ("width", "height", "sum_r", "sum_g", "sum_b", "max_byte"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                px = img.pixels.astype(np.int64)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["max_byte"].append(int(px.max()))
                out["decode_ok"].append(True)
            if on_error == "fail":
                del out["decode_ok"]
            yield pd.DataFrame(out)

    schema = (
        "media_id long, width int, height int, sum_r long, sum_g long, "
        "sum_b long, max_byte long"
    )
    if on_error == "skip":
        schema += ", decode_ok boolean"
    return media.select("media_id", "payload").mapInPandas(stats, schema=schema)


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


def wav_spectral(media: DataFrame, on_error: str = "fail") -> DataFrame:
    """Real DSP feature extraction over decoded audio: per payload, the
    magnitude spectrum of the (mono) PCM via numpy's rFFT, reduced to the
    features an audio-curation pipeline filters on —

      dominant_freq_hz   argmax |S(f)| excluding DC (tie → lowest bin)
      spectral_centroid  Σ f·|S(f)| / Σ |S(f)| over the positive bins
      dc_fraction        |S(0)| / Σ |S(f)| (silence / offset detector)
      total_power        Σ s² (time domain; equals spectrum power by
                         Parseval — the identity the tests pin)

    Arrow-batched mapInPandas like the other decoders: the FFT runs where
    the bytes live, nothing shuffles, output is O(1) per payload. Closed-form
    pinned in tests with synthesized pure tones (dominant bin == the tone,
    centroid == the tone for a single component, Parseval to 1e-6 rel).
    ``on_error='skip'`` gives the same quarantine contract as wav_stats."""
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def feats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_wav_bytes

        cols = (
            "sample_rate", "n_samples", "dominant_freq_hz",
            "spectral_centroid_hz", "dc_fraction", "total_power",
        )
        for b in batches:
            out = {"media_id": b["media_id"], **{c: [] for c in cols}, "decode_ok": []}
            for p in b["payload"]:
                try:
                    w = decode_wav_bytes(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "fail":
                        raise
                    for c in cols:
                        out[c].append(None)
                    out["decode_ok"].append(False)
                    continue
                s = w.samples[:, 0].astype(np.float64)
                n = len(s)
                spec = np.abs(np.fft.rfft(s))
                freqs = np.fft.rfftfreq(n, d=1.0 / w.sample_rate)
                mag_sum = float(spec.sum())
                pos = spec[1:]
                dom = float(freqs[1 + int(np.argmax(pos))]) if len(pos) else 0.0
                centroid = (
                    float((freqs[1:] * pos).sum() / pos.sum()) if pos.sum() > 0 else 0.0
                )
                out["sample_rate"].append(w.sample_rate)
                out["n_samples"].append(n)
                out["dominant_freq_hz"].append(dom)
                out["spectral_centroid_hz"].append(centroid)
                out["dc_fraction"].append(float(spec[0]) / mag_sum if mag_sum else 0.0)
                out["total_power"].append(float((s * s).sum()))
                out["decode_ok"].append(True)
            if on_error == "fail":
                del out["decode_ok"]
            yield pd.DataFrame(out)

    schema = (
        "media_id long, sample_rate int, n_samples long, dominant_freq_hz double, "
        "spectral_centroid_hz double, dc_fraction double, total_power double"
    )
    if on_error == "skip":
        schema += ", decode_ok boolean"
    return media.select("media_id", "payload").mapInPandas(feats, schema=schema)
