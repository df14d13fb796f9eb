"""Audio perceptual fingerprint (multimodal/audio_fp.py): measured
invariance contract (re-level exact-ish, 1% noise near), cross-signal
separation, and the end-to-end near-dup join over WAV payloads."""

from __future__ import annotations

import numpy as np

from timing_explorer_spark.multimodal.audio_fp import (
    VARIANT_SHIFT,
    _melody,
    audio_fingerprint,
)

N_SIGNALS = 40


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _q(x: np.ndarray) -> np.ndarray:
    return (x * 20000).astype(np.int16)


def test_relevel_and_noise_bands():
    relevel, noise = [], []
    for i in range(N_SIGNALS):
        s, rng = _melody(i)
        f0 = audio_fingerprint(_q(s))
        relevel.append(_hamming(f0, audio_fingerprint(_q(s * 0.8))))
        nz = rng.normal(0.0, 0.01, size=len(s))
        noise.append(_hamming(f0, audio_fingerprint(_q(np.clip(s + nz, -1, 1)))))
    assert max(relevel) <= 6  # scale-invariant up to int16 quantization
    assert sum(1 for d in relevel if d <= 10) == N_SIGNALS
    assert sum(1 for d in noise if d <= 10) / N_SIGNALS >= 0.85
    assert max(noise) <= 16


def test_cross_signal_separation():
    fps = [audio_fingerprint(_q(_melody(i)[0])) for i in range(N_SIGNALS)]
    cross = [
        _hamming(fps[i], fps[j])
        for i in range(N_SIGNALS)
        for j in range(i + 1, N_SIGNALS)
    ]
    assert min(cross) > 10  # zero false positives at the join threshold


def test_stationary_signal_caveat_documented():
    """The fixture is non-stationary BY DESIGN: on a steady tone the
    time-difference bits are quantization coin flips (this is the measured
    caveat in the module docstring — assert it stays true so the docs can't
    rot)."""
    rng = np.random.default_rng(7)
    t = np.arange(4096, dtype=float)
    s = np.sin(2 * np.pi * 440.0 * t / 8000)
    f0 = audio_fingerprint(_q(s))
    nz = rng.normal(0.0, 0.02, size=len(s))
    d = _hamming(f0, audio_fingerprint(_q(np.clip(s + nz, -1, 1))))
    assert d > 10  # fragile on stationary input — documented, not hidden


def test_end_to_end_neardup_join(spark):
    from timing_explorer_spark.multimodal.audio_fp import (
        audio_neardup_pairs,
        media_audio_fingerprints,
        synthetic_toned_wav_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    fps = media_audio_fingerprints(synthetic_toned_wav_media(docs))
    assert fps.count() == 36
    pairs = audio_neardup_pairs(fps, max_hamming=10).collect()
    got = {(r["media_a"], r["media_b"]) for r in pairs}
    for i in range(12):
        assert (i, i + VARIANT_SHIFT) in got, f"re-leveled variant of {i} missed"
    noise_hits = sum(1 for i in range(12) if (i, i + 2 * VARIANT_SHIFT) in got)
    assert noise_hits >= 9
    for a, b in got:
        assert a % VARIANT_SHIFT == b % VARIANT_SHIFT, (a, b)
