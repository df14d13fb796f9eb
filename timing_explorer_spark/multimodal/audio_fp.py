"""Perceptual AUDIO fingerprinting + hamming near-dup join.

The audio member of the perceptual-dedup family (images: phash.py; text:
operators/dedup.py SimHash): a 64-bit robust fingerprint in the style of
Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprinting System" —
frame the signal, take per-frame spectral band energies, and keep only the
SIGNS of the band-difference-over-time-difference:

    bit(t, b) = [ (E[t,b] - E[t,b+1]) - (E[t-1,b] - E[t-1,b+1]) > 0 ]

With 9 frames x 9 log-spaced bands that is exactly 8 x 8 = 64 bits. Signs
of energy differences are EXACTLY invariant to amplitude scaling (every
energy scales by c^2 > 0) and robust to additive noise; different signals
produce near-independent bits.

Spark shape: decode + fingerprint in ONE Arrow-batched mapInPandas over the
WAV payloads (pure-numpy RIFF walk from codecs.py + rfft — the
decode-where-bytes-live contract); candidate pairs reuse
operators/dedup.py::hamming_pairs (the 64-bit pigeonhole equi-join shared
with SimHash and pHash) — map-only hashing, never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phash import _bits_to_i64

N_FRAMES = 9
N_BANDS = 9


def _band_energies(frame: np.ndarray, n_bands: int) -> np.ndarray:
    """Log-spaced spectral band energies of one frame (rfft power). Band
    starts are made strictly increasing inside [1, n_bins) (skip DC), so
    reduceat always yields exactly n_bands segments."""
    spec = np.abs(np.fft.rfft(frame)) ** 2
    n = len(spec)
    starts = np.geomspace(1, n, n_bands + 1)[:-1].astype(int)
    for i in range(1, n_bands):  # enforce strict increase, stay in range
        starts[i] = max(starts[i], starts[i - 1] + 1)
    starts = np.minimum(starts, np.arange(n - n_bands, n))
    return np.add.reduceat(spec, starts)


def audio_fingerprint(samples: np.ndarray, n_frames: int = N_FRAMES, n_bands: int = N_BANDS) -> int:
    """64-bit fingerprint of a mono signal (any dtype; converted to float).
    Frames are equal splits of the signal; see module docstring."""
    x = np.asarray(samples, dtype=np.float64).ravel()
    if len(x) < n_frames * 2 * n_bands:
        x = np.pad(x, (0, n_frames * 2 * n_bands - len(x)))
    frames = np.array_split(x, n_frames)
    e = np.stack([_band_energies(f, n_bands) for f in frames])  # (t, b)
    d = e[:, :-1] - e[:, 1:]            # band differences     (t, b-1)
    bits = (d[1:] - d[:-1]) > 0         # time differences     (t-1, b-1)
    return _bits_to_i64(bits)


def media_audio_fingerprints(media: DataFrame, on_error: str = "fail") -> DataFrame:
    """(media_id, afp) for a (media_id, payload) table of WAV payloads —
    decode (channel-averaged to mono) + fingerprint where the bytes live."""
    from .codecs import decode_wav_bytes

    def fp(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            ids, fps = [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    wav = decode_wav_bytes(bytes(payload))
                except Exception:
                    if on_error == "fail":
                        raise
                    continue
                mono = wav.samples.astype(np.float64).mean(axis=1)
                ids.append(mid)
                fps.append(audio_fingerprint(mono))
            yield pd.DataFrame({"media_id": ids, "afp": fps})

    return media.select("media_id", "payload").mapInPandas(
        fp, schema="media_id long, afp long"
    )


def audio_neardup_pairs(
    fps: DataFrame, max_hamming: int = 10, n_blocks: int = 16
) -> DataFrame:
    """Same pigeonhole join as SimHash/pHash, over audio fingerprints."""
    from ..operators.dedup import hamming_pairs

    return hamming_pairs(
        fps, max_hamming=max_hamming, n_blocks=n_blocks,
        id_col="media_id", sketch_col="afp",
    ).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


VARIANT_SHIFT = 10_000_000


def _melody(i: int, n: int = 4096, rate: int = 8000, segs: int = N_FRAMES):
    """A doc-seeded NON-STATIONARY test signal: ``segs`` consecutive
    two-tone segments (a melody). Temporal structure is what the H-K
    time-difference bits measure — on stationary signals those differences
    are ~0 and the bits are quantization coin flips (measured: 2% noise
    flipped up to 28/64 bits on steady tones vs <=12 here). Returns
    (signal in [-1,1], the doc's rng for deterministic variant noise)."""
    rng = np.random.default_rng(7_000_003 * (i + 1))
    s = np.zeros(n)
    bounds = np.linspace(0, n, segs + 1).astype(int)
    for k in range(segs):
        t = np.arange(bounds[k], bounds[k + 1], dtype=np.float64)
        f1, f2 = rng.uniform(80.0, 3200.0, size=2)
        a2 = rng.uniform(0.2, 0.8)
        ph1, ph2 = rng.uniform(0, 2 * np.pi, size=2)
        s[bounds[k] : bounds[k + 1]] = np.sin(
            2 * np.pi * f1 * t / rate + ph1
        ) + a2 * np.sin(2 * np.pi * f2 * t / rate + ph2)
    s /= np.abs(s).max()
    return s, rng


def synthetic_toned_wav_media(docs: DataFrame) -> DataFrame:
    """Labeled WAV near-dup fixture: per doc a 9-segment two-tone melody
    (non-stationary — see _melody), plus two labeled near-dup variants —

      media_id                 the original
      media_id + VARIANT_SHIFT amplitude x0.8 (re-level)
      media_id + 2*SHIFT       +1% deterministic noise (re-encode artifact)

    Measured contract at join threshold hamming <= 10 (N=80 melodies):
    re-level recall 1.0 (max hamming 4 — sign bits survive scaling; the
    residual flips are int16 quantization on near-zero differences),
    1%-noise recall 0.94 (max 12), cross-signal min hamming 14 -> ZERO
    false positives at the threshold."""

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        from .codecs import encode_wav_bytes

        rate = 8000
        for b in batches:
            ids, payloads = [], []
            for doc_id in b["doc_id"]:
                i = int(doc_id)
                sig, rng = _melody(i, rate=rate)
                noise = rng.normal(0.0, 0.01, size=len(sig))
                variants = (
                    (i, sig),
                    (i + VARIANT_SHIFT, sig * 0.8),
                    (i + 2 * VARIANT_SHIFT, np.clip(sig + noise, -1, 1)),
                )
                for mid, s in variants:
                    ids.append(mid)
                    payloads.append(
                        encode_wav_bytes((s * 20000).astype(np.int16), rate)
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        enc, schema="media_id long, payload binary"
    )
