"""FFT spectral features (multimodal/binary_ops.py::wav_spectral) — the
physics pinned: pure tones land in their exact bin, the centroid of a single
component equals that component, Parseval's identity ties the time- and
frequency-domain powers, DC-only signals report dc_fraction 1, and the
quarantine contract matches the other decoders.
"""

from __future__ import annotations

import numpy as np

from timing_explorer_spark.multimodal.binary_ops import wav_spectral
from timing_explorer_spark.multimodal.codecs import encode_wav_bytes
from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )


def _tone(freq_hz, rate=8000, n=800, amp=10000.0):
    i = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * freq_hz * i / rate)).astype(np.int16)


def test_pure_tone_hits_its_bin(spark):
    # n=800 @ 8000 Hz -> 10 Hz bins; 440 Hz = bin 44 exactly
    wav = encode_wav_bytes(_tone(440.0), 8000)
    (r,) = wav_spectral(_media(spark, [wav])).collect()
    assert r["dominant_freq_hz"] == 440.0
    # single component: centroid sits on the tone (spectral leakage ~0 at an
    # exact bin; rounding the int16 samples leaks a little)
    assert abs(r["spectral_centroid_hz"] - 440.0) < 5.0
    assert r["dc_fraction"] < 0.01


def test_parseval_identity(spark):
    rng = np.random.default_rng(5)
    s = rng.integers(-20000, 20000, size=512).astype(np.int16)
    wav = encode_wav_bytes(s, 16000)
    (r,) = wav_spectral(_media(spark, [wav])).collect()
    sf = s.astype(np.float64)
    # Parseval for rFFT: sum s^2 == (|S|^2 summed with conjugate-symmetric
    # doubling) / n
    spec = np.abs(np.fft.rfft(sf)) ** 2
    doubled = spec[0] + 2 * spec[1:-1].sum() + (spec[-1] if len(sf) % 2 == 0 else 2 * spec[-1])
    assert abs(r["total_power"] - (sf * sf).sum()) < 1e-6
    assert abs(r["total_power"] - doubled / len(sf)) < 1e-3 * r["total_power"]


def test_dc_only_signal(spark):
    s = np.full(256, 5000, dtype=np.int16)
    (r,) = wav_spectral(_media(spark, [encode_wav_bytes(s, 8000)])).collect()
    assert r["dc_fraction"] > 0.999
    assert r["spectral_centroid_hz"] == 0.0  # no positive-bin energy


def test_louder_tone_dominates_mixture(spark):
    mix = (_tone(300.0, amp=12000).astype(np.int32) + _tone(1200.0, amp=3000).astype(np.int32))
    wav = encode_wav_bytes(np.clip(mix, -32768, 32767).astype(np.int16), 8000)
    (r,) = wav_spectral(_media(spark, [wav])).collect()
    assert r["dominant_freq_hz"] == 300.0
    # centroid pulled between the two components, nearer the strong one
    assert 300.0 < r["spectral_centroid_hz"] < 1200.0


def test_quarantine_contract(spark):
    good = encode_wav_bytes(_tone(100.0), 8000)
    rows = wav_spectral(
        _media(spark, [good, b"RIFFgarbage"]), on_error="skip"
    ).collect()
    ok = {r["media_id"]: r["decode_ok"] for r in rows}
    assert ok == {0: True, 1: False}
    bad = [r for r in rows if not r["decode_ok"]][0]
    assert bad["dominant_freq_hz"] is None


def test_registered_query_on_fixture(spark, sf_smoke):
    out = SPECS["q_media_spectral"].build(spark, sf_smoke).collect()
    assert out
    for r in out:
        assert 0 <= r["dominant_freq_hz"] <= r["sample_rate"] / 2
        assert 0 <= r["dc_fraction"] <= 1
        assert r["total_power"] > 0
