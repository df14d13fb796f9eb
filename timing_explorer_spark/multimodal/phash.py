"""Perceptual image hashing (dHash / pHash) + hamming near-dup join.

Round-6 verdict task #4: image near-duplicate detection for the multimodal
corpus — the visual analog of the text SimHash family. Public algorithms:

  - dHash (difference hash, Krawetz 2013 "Kind of Like That"): area-resize
    the grayscale image to 9x8, bit = pixel brighter than its right
    neighbor — 64 bits robust to rescaling and global brightness shifts.
  - pHash (DCT hash, Zauner 2010 "Implementation and Benchmarking of
    Perceptual Image Hash Functions"): area-resize to 32x32, 2-D DCT-II,
    keep the top-left 8x8 low-frequency block, bit = coefficient above the
    median of the 63 non-DC coefficients (DC excluded -> brightness
    invariant by construction).

Spark shape — the multimodal family's decode-where-bytes-live contract
(multimodal/binary_ops.py): hashing runs in ONE Arrow-batched mapInPandas
over the payload column (pure-numpy decode from codecs.py + a closed-form
DCT matrix — no codec libs, no scipy); candidate pairing reuses the text
family's 64-bit hamming pigeonhole join (operators/dedup.py::hamming_pairs)
— equi-join on (block idx, block value), bit_count(XOR) verify, complete
for distance <= n_blocks-1. At 100 TB: hashing is map-only where the bytes
live; the join grain is (image, 16 blocks), never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grayscale(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w) float64 luma (ITU-R BT.601 weights)."""
    return px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114


def _resize_area(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize: when downscaling, rows/cols partition into
    near-equal bins (np.array_split) and each output pixel is the bin mean;
    when upscaling, nearest-index replication (array_split would produce
    empty bins -> NaN). Deterministic, any input size >= 1."""
    h, w = gray.shape
    if h >= out_h:
        gray = np.stack([r.mean(axis=0) for r in np.array_split(gray, out_h, axis=0)])
    else:
        gray = gray[(np.arange(out_h) * h) // out_h, :]
    if w >= out_w:
        gray = np.stack(
            [c.mean(axis=1) for c in np.array_split(gray, out_w, axis=1)], axis=1
        )
    else:
        gray = gray[:, (np.arange(out_w) * w) // out_w]
    return gray


def _bits_to_i64(bits: np.ndarray) -> int:
    """64 bools -> signed int64 (bit 63 is the sign bit, matching the
    two's-complement convention of dedup.simhash_sketches)."""
    v = 0
    for i, b in enumerate(bits.ravel()[:64]):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def dhash_gray(gray: np.ndarray) -> int:
    g = _resize_area(gray, 8, 9)
    return _bits_to_i64(g[:, 1:] > g[:, :-1])


_DCT_N = 32
# DCT-II basis (orthonormal scaling irrelevant for median thresholding):
# C[k, n] = cos(pi/N * (n + 0.5) * k); 2-D DCT = C @ G @ C.T
_DCT_C = np.cos(
    np.pi / _DCT_N * (np.arange(_DCT_N)[None, :] + 0.5) * np.arange(_DCT_N)[:, None]
)


def phash_gray(gray: np.ndarray) -> int:
    g = _resize_area(gray, _DCT_N, _DCT_N)
    d = _DCT_C @ g @ _DCT_C.T
    block = d[:8, :8].copy().ravel()
    med = np.median(block[1:])  # exclude DC -> brightness invariant
    bits = block > med
    bits[0] = False  # DC bit pinned
    return _bits_to_i64(bits)


def media_perceptual_hashes(
    media: DataFrame, codec: str = "bmp", on_error: str = "fail"
) -> DataFrame:
    """(media_id, dhash, phash) for a (media_id, payload) table of BMP or
    PPM payloads — one Arrow-batched mapInPandas, decode + hash where the
    bytes live. ``on_error='skip'`` drops undecodable payloads (quarantine
    semantics); 'fail' raises."""
    from .codecs import decode_bmp_bytes, decode_ppm_bytes

    decode = {"bmp": decode_bmp_bytes, "ppm": decode_ppm_bytes}[codec]

    def hashes(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            ids, dh, ph = [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    img = decode(bytes(payload))
                except Exception:
                    if on_error == "fail":
                        raise
                    continue
                gray = _grayscale(img.pixels.astype(np.float64))
                ids.append(mid)
                dh.append(dhash_gray(gray))
                ph.append(phash_gray(gray))
            yield pd.DataFrame({"media_id": ids, "dhash": dh, "phash": ph})

    return media.select("media_id", "payload").mapInPandas(
        hashes, schema="media_id long, dhash long, phash long"
    )


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 10,
    n_blocks: int = 16,
    hash_col: str = "phash",
) -> DataFrame:
    """Perceptual near-dup pairs: the SAME pigeonhole candidate join as the
    text SimHash family (operators/dedup.py::hamming_pairs), over dhash or
    phash. Returns (media_a, media_b, hamming)."""
    from ..operators.dedup import hamming_pairs

    return hamming_pairs(
        hashes,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        id_col="media_id",
        sketch_col=hash_col,
    ).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


VARIANT_SHIFT = 10_000_000  # media_id offsets for the perturbed copies


def _natural_field(i: int, w: int = 48, h: int = 36, kmax: int = 4, alpha: float = 1.6) -> np.ndarray:
    """A deterministic per-doc 1/f-spectrum grayscale field — the
    natural-image-like fixture perceptual hashes are designed for (random
    low-order Fourier components, amplitude ~ 1/(kx+ky)^alpha, seeded by
    doc id). Range [40, 215], so a +15 brightness shift never clips."""
    rng = np.random.default_rng(1000003 * (i + 1))
    x = np.arange(w)[None, :] / w
    y = np.arange(h)[:, None] / h
    g = np.zeros((h, w))
    for kx in range(kmax + 1):
        for ky in range(kmax + 1):
            if kx == ky == 0:
                continue
            amp = rng.normal() / (kx + ky) ** alpha
            g += amp * np.cos(2 * np.pi * (kx * x + ky * y) + rng.uniform(0, 2 * np.pi))
    g = (g - g.min()) / (g.max() - g.min())
    return 40.0 + 175.0 * g


def synthetic_patterned_bmp_media(docs: DataFrame) -> DataFrame:
    """Labeled BMP near-dup fixture for perceptual hashing (the noise
    rasters of synthetic_bmp_media have no low-frequency content for a DCT
    hash to see): per doc a 48x36 natural-like 1/f field, plus two labeled
    NEAR-DUPLICATE variants —

      media_id                 the original
      media_id + VARIANT_SHIFT brightness +15 (clip-free by construction)
      media_id + 2*SHIFT       1-px right+bottom crop (minor reframing)

    Measured contract at the default join threshold (hamming <= 10, N=200
    fields): brightness recall 1.0 (hamming 0 — DC exclusion makes pHash
    exactly brightness-invariant), crop recall ~0.77 (crop shifts every
    DCT phase; the 2-16 hamming band is the honest behavior of 64-bit
    perceptual hashes under reframing), cross-image false positives 0
    (min cross hamming 12)."""

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        from .codecs import encode_bmp_bytes

        for b in batches:
            ids, payloads = [], []
            for doc_id in b["doc_id"]:
                i = int(doc_id)
                base = _natural_field(i)
                variants = (
                    (i, base),
                    (i + VARIANT_SHIFT, base + 15.0),
                    (i + 2 * VARIANT_SHIFT, base[:-1, :-1]),
                )
                for mid, g in variants:
                    px = np.clip(g, 0, 255).astype(np.uint8)
                    rgb = np.stack([px, px, px], axis=-1)
                    ids.append(mid)
                    payloads.append(encode_bmp_bytes(rgb))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        enc, schema="media_id long, payload binary"
    )
