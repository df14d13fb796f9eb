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


# ---------------------------------------------------------------- real codecs


def test_wav_roundtrip_against_stdlib_wave():
    """Our encoder's bytes must be readable by the stdlib wave module, and
    stdlib-written bytes must decode identically through our parser — mono
    and stereo, multiple rates. This is what makes the decode REAL: it
    interoperates with an independent implementation, not just itself."""
    import io
    import wave

    import numpy as np

    from timing_explorer_spark.multimodal.codecs import (
        decode_wav_bytes,
        encode_wav_bytes,
    )

    rng = np.random.default_rng(7)
    for channels, rate in [(1, 8000), (2, 44100), (1, 16000)]:
        samples = rng.integers(-32768, 32767, size=(311, channels), dtype=np.int16)
        payload = encode_wav_bytes(samples, rate)
        # stdlib reads ours
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getframerate() == rate
            assert w.getnchannels() == channels
            assert w.getsampwidth() == 2
            raw = w.readframes(w.getnframes())
        assert np.array_equal(np.frombuffer(raw, dtype="<i2").reshape(-1, channels), samples)
        # we read stdlib's
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        ours = decode_wav_bytes(buf.getvalue())
        assert ours.sample_rate == rate and ours.n_channels == channels
        assert np.array_equal(ours.samples, samples)


def test_wav_decoder_walks_foreign_chunks():
    """Spec conformance: decoders must skip unknown chunks (LIST/fact) and
    honor word alignment after odd-sized chunks — files from real encoders
    carry these."""
    import struct

    import numpy as np

    from timing_explorer_spark.multimodal.codecs import (
        decode_wav_bytes,
        encode_wav_bytes,
    )

    samples = np.arange(-5, 6, dtype=np.int16)
    base = encode_wav_bytes(samples, 8000)
    # splice an odd-sized LIST chunk (with pad byte) between fmt and data
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    doctored = base[:fmt_end] + foreign + base[fmt_end:]
    # fix RIFF size
    doctored = (
        doctored[:4] + struct.pack("<I", len(doctored) - 8) + doctored[8:]
    )
    out = decode_wav_bytes(doctored)
    assert np.array_equal(out.samples[:, 0], samples)


def test_wav_compressed_format_raises():
    import struct

    import numpy as np
    import pytest

    from timing_explorer_spark.multimodal.codecs import (
        decode_wav_bytes,
        encode_wav_bytes,
    )

    payload = bytearray(encode_wav_bytes(np.zeros(4, dtype=np.int16), 8000))
    struct.pack_into("<H", payload, 20, 85)  # fmt tag -> MP3
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_wav_bytes(bytes(payload))


def test_ppm_roundtrip_and_comments():
    import numpy as np
    import pytest

    from timing_explorer_spark.multimodal.codecs import (
        decode_ppm_bytes,
        encode_ppm_bytes,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = decode_ppm_bytes(encode_ppm_bytes(px))
    assert (out.width, out.height, out.maxval) == (3, 2, 255)
    assert np.array_equal(out.pixels, px)
    # comments + arbitrary whitespace in header
    raw = b"P6 # inline comment\n# full comment line\n 3\t2\n255\n" + px.tobytes()
    out2 = decode_ppm_bytes(raw)
    assert np.array_equal(out2.pixels, px)
    with pytest.raises(NotImplementedError):
        decode_ppm_bytes(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm_bytes(b"BM...")


def test_wav_stats_partition_invariant(spark, sf_smoke):
    """The decoded-feature pass must not depend on Arrow batch boundaries or
    partitioning — same rows from 1 partition and 13."""
    from timing_explorer_spark.multimodal.binary_ops import (
        synthetic_wav_media,
        wav_stats,
    )

    docs = load(spark, sf_smoke, "documents")
    one = {tuple(r) for r in wav_stats(synthetic_wav_media(docs.coalesce(1))).collect()}
    many = {
        tuple(r)
        for r in wav_stats(synthetic_wav_media(docs.repartition(13))).collect()
    }
    assert one == many and len(one) > 0


def test_property_codec_roundtrips():
    """Hypothesis: arbitrary PCM16 sample arrays and RGB rasters round-trip
    bit-exactly through the pure-numpy encoders/decoders."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from timing_explorer_spark.multimodal.codecs import (
        decode_ppm_bytes,
        decode_wav_bytes,
        encode_ppm_bytes,
        encode_wav_bytes,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        samples=arrays(
            np.int16, st.tuples(st.integers(0, 200), st.integers(1, 3))
        ),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def wav(samples, rate):
        out = decode_wav_bytes(encode_wav_bytes(samples, rate))
        assert out.sample_rate == rate
        assert out.n_channels == samples.shape[1]
        assert np.array_equal(out.samples, samples)

    @settings(max_examples=60, deadline=None)
    @given(
        px=arrays(
            np.uint8,
            st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
        )
    )
    def ppm(px):
        out = decode_ppm_bytes(encode_ppm_bytes(px))
        assert (out.height, out.width) == px.shape[:2]
        assert np.array_equal(out.pixels, px)

    wav()
    ppm()


def test_wav_decoder_rejects_malformed_with_typed_errors():
    """Robustness contract for corrupt blobs: random mutations of a valid
    WAV either still decode (mutation hit the payload, not structure) or
    raise ValueError/NotImplementedError — never IndexError/ZeroDivision/
    struct.error. A 100 TB corpus WILL contain garbage; typed errors are
    what lets the skip-mode operator quarantine it."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from timing_explorer_spark.multimodal.codecs import (
        decode_wav_bytes,
        encode_wav_bytes,
    )

    base = bytearray(encode_wav_bytes(np.arange(50, dtype=np.int16), 8000))

    @settings(max_examples=150, deadline=None)
    @given(
        pos=st.integers(0, len(base) - 1),
        val=st.integers(0, 255),
        trunc=st.integers(0, len(base)),
    )
    def run(pos, val, trunc):
        mutated = bytearray(base)
        mutated[pos] = val
        for payload in (bytes(mutated), bytes(mutated[:trunc])):
            try:
                decode_wav_bytes(payload)
            except (ValueError, NotImplementedError):
                pass  # the contract: malformed -> typed error

    run()


def test_wav_stats_skip_mode_quarantines_corrupt_payloads(spark):
    """on_error='skip': corrupt payloads become decode_ok=false rows with
    NULL features; good payloads keep exact features; default mode fails."""
    import pytest
    from pyspark.sql import Row

    from timing_explorer_spark.multimodal.binary_ops import wav_stats
    from timing_explorer_spark.multimodal.codecs import encode_wav_bytes

    import numpy as np

    good = encode_wav_bytes(np.array([1, -1, 2, -2], dtype=np.int16), 8000)
    media = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(good)),
            Row(media_id=2, payload=bytearray(b"not a wav at all")),
        ]
    )
    out = {r["media_id"]: r for r in wav_stats(media, on_error="skip").collect()}
    assert out[1]["decode_ok"] and out[1]["n_samples"] == 4
    assert out[1]["zero_crossings"] == 3
    assert not out[2]["decode_ok"] and out[2]["n_samples"] is None
    with pytest.raises(Exception):  # default: fail loudly
        wav_stats(media).collect()
    with pytest.raises(ValueError):
        wav_stats(media, on_error="bogus")


def test_ppm_stats_skip_mode(spark):
    import numpy as np
    from pyspark.sql import Row

    from timing_explorer_spark.multimodal.binary_ops import ppm_stats
    from timing_explorer_spark.multimodal.codecs import encode_ppm_bytes

    good = encode_ppm_bytes(np.full((2, 2, 3), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(good)),
            Row(media_id=2, payload=bytearray(b"P6\n-1 3\n255\n")),  # corrupt dims
        ]
    )
    out = {r["media_id"]: r for r in ppm_stats(media, on_error="skip").collect()}
    assert out[1]["decode_ok"] and out[1]["sum_r"] == 4 * 7
    assert not out[2]["decode_ok"] and out[2]["width"] is None


def test_bmp_roundtrip_padding_and_orientation():
    """BMP decode undoes BGR order, 4-byte row padding (w=5 -> 15-byte rows
    pad to 16) and bottom-up storage; negative height = top-down, no flip."""
    import numpy as np

    from timing_explorer_spark.multimodal.codecs import (
        decode_bmp_bytes,
        encode_bmp_bytes,
    )

    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    raw = encode_bmp_bytes(px)
    out = decode_bmp_bytes(raw)
    assert (out.width, out.height) == (5, 4)
    assert (out.pixels == px).all()
    # hand-build a TOP-DOWN variant (negative height): same logical image
    stride = (5 * 3 + 3) & ~3
    rows = np.zeros((4, stride), dtype=np.uint8)
    rows[:, : 5 * 3] = px[:, :, ::-1].reshape(4, 15)
    td = (
        raw[:22]
        + (-4).to_bytes(4, "little", signed=True)
        + raw[26:54]
        + rows.tobytes()
    )
    out2 = decode_bmp_bytes(td)
    assert (out2.pixels == px).all()


def test_bmp_typed_errors():
    import numpy as np
    import pytest as _pt

    from timing_explorer_spark.multimodal.codecs import (
        decode_bmp_bytes,
        encode_bmp_bytes,
    )

    raw = bytearray(encode_bmp_bytes(np.zeros((2, 2, 3), dtype=np.uint8)))
    with _pt.raises(ValueError):
        decode_bmp_bytes(b"PNG_not_bmp")
    with _pt.raises(ValueError):
        decode_bmp_bytes(bytes(raw[:40]))  # truncated header
    with _pt.raises(ValueError):
        decode_bmp_bytes(bytes(raw[:-3]))  # truncated raster
    bad = bytearray(raw)
    bad[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with _pt.raises(NotImplementedError):
        decode_bmp_bytes(bytes(bad))
    bad = bytearray(raw)
    bad[28:30] = (8).to_bytes(2, "little")  # palette depth
    with _pt.raises(NotImplementedError):
        decode_bmp_bytes(bytes(bad))


def test_property_bmp_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from timing_explorer_spark.multimodal.codecs import (
        decode_bmp_bytes,
        encode_bmp_bytes,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=17),
        h=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def roundtrip(w, h, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint16).astype(np.uint8)
        out = decode_bmp_bytes(encode_bmp_bytes(px))
        assert (out.pixels == px).all()

    roundtrip()


def test_bmp_stats_skip_mode(spark):
    import pandas as pd

    from timing_explorer_spark.multimodal.binary_ops import bmp_stats

    import numpy as np

    from timing_explorer_spark.multimodal.codecs import encode_bmp_bytes

    good = encode_bmp_bytes(np.full((2, 3, 3), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [good, b"BMgarbage"]})
    )
    rows = {r["media_id"]: r for r in bmp_stats(media, on_error="skip").collect()}
    assert rows[1]["decode_ok"] is True and rows[1]["sum_r"] == 7 * 6
    assert rows[2]["decode_ok"] is False and rows[2]["width"] is None
