"""Perceptual image hashing (multimodal/phash.py): invariance under
brightness shift / contrast scaling (exact by construction), the measured
minor-crop hamming band, cross-image separation, and the end-to-end
near-dup join over the labeled BMP fixture."""

from __future__ import annotations

import numpy as np

from timing_explorer_spark.multimodal.phash import (
    VARIANT_SHIFT,
    _DCT_C,
    _natural_field,
    _resize_area,
    dhash_gray,
    phash_gray,
)

N_FIELDS = 60


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dct_matrix_is_a_real_dct():
    # DCT of a pure cosine at frequency k concentrates in row k
    n = 32
    for k in (1, 3, 7):
        sig = np.cos(np.pi / n * (np.arange(n) + 0.5) * k)
        coef = _DCT_C @ sig
        assert np.argmax(np.abs(coef)) == k


def test_resize_area_shapes_and_means():
    g = np.arange(12, dtype=float).reshape(3, 4)
    assert np.allclose(_resize_area(g, 3, 4), g)  # identity when sizes match
    assert np.allclose(_resize_area(g, 1, 1), [[g.mean()]])
    up = _resize_area(g, 8, 9)  # upscale: nearest replication, no NaNs
    assert up.shape == (8, 9) and np.isfinite(up).all()


def test_brightness_and_contrast_invariance():
    """pHash excludes DC and thresholds on the median -> EXACTLY invariant
    to brightness shifts and positive contrast scaling; dHash compares
    neighbors -> same."""
    for i in (3, 11, 42):
        g = _natural_field(i)
        assert dhash_gray(g) == dhash_gray(g + 15.0)
        assert dhash_gray(g) == dhash_gray(g * 0.8)
        assert phash_gray(g) == phash_gray(g + 15.0)
        assert phash_gray(g) == phash_gray(g * 0.8)


def test_minor_crop_hamming_band_and_separation():
    """1-px reframing lands in a small hamming band (measured <= 16 over
    200 fields); DIFFERENT fields never come within the join threshold
    (measured min cross distance 12) — so threshold 10 has zero false
    positives while recovering most reframed copies."""
    ph = [phash_gray(_natural_field(i)) for i in range(N_FIELDS)]
    crop = [phash_gray(_natural_field(i)[:-1, :-1]) for i in range(N_FIELDS)]
    crop_d = [_hamming(a, b) for a, b in zip(ph, crop)]
    assert max(crop_d) <= 16
    recall_at_10 = sum(1 for d in crop_d if d <= 10) / N_FIELDS
    assert recall_at_10 >= 0.7
    cross = [
        _hamming(ph[i], ph[j])
        for i in range(N_FIELDS)
        for j in range(i + 1, N_FIELDS)
    ]
    assert min(cross) > 10  # zero false positives at the join threshold


def test_end_to_end_neardup_join(spark):
    from timing_explorer_spark.multimodal.phash import (
        media_perceptual_hashes,
        phash_neardup_pairs,
        synthetic_patterned_bmp_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = synthetic_patterned_bmp_media(docs)
    hashes = media_perceptual_hashes(media, codec="bmp")
    assert hashes.count() == 36  # 3 variants per doc
    pairs = phash_neardup_pairs(hashes, max_hamming=10).collect()
    got = {(r["media_a"], r["media_b"]) for r in pairs}
    # brightness variants are hamming-0: ALL must be recovered
    for i in range(12):
        assert (i, i + VARIANT_SHIFT) in got, f"bright variant of {i} missed"
    # crop variants: most recovered (join-threshold recall)
    crop_hits = sum(1 for i in range(12) if (i, i + 2 * VARIANT_SHIFT) in got)
    assert crop_hits >= 8
    # nothing crosses documents (measured zero false positives)
    for a, b in got:
        assert a % VARIANT_SHIFT == b % VARIANT_SHIFT, (a, b)
