"""Pure-numpy decoders for codec-free media formats (WAV/PCM, PPM).

The container ships no media libraries (PIL/ffmpeg/librosa), but RIFF/WAVE
PCM and binary PPM (P6) need none: both are a parsed header plus a
``np.frombuffer`` view of raw samples. These are REAL decoders — they accept
any spec-conforming file (chunk walking, word-aligned chunk padding, header
comments), not just this repo's fixtures — so the multimodal pipeline's
"decode" stage is genuinely executable here, with ``NotImplementedError``
remaining only for genuinely compressed codecs (JPEG/MP3/H.264) that cannot
be decoded without a codec library.

Encoders are provided too (struct-packed writers) so tests can round-trip
against the stdlib ``wave`` module and fixtures can fabricate real payloads.

Reference parity note: the reference's sink accepts any numeric payload
(``InfluxDBSink.java:31`` — ``DataPoint<? extends Number>``); decoded PCM
samples / pixel values are exactly such numeric streams.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------------- WAV


@dataclass
class WavData:
    sample_rate: int
    n_channels: int
    bits_per_sample: int
    samples: np.ndarray  # shape (n_frames, n_channels), int16 or uint8


def decode_wav_bytes(payload: bytes) -> WavData:
    """Parse a RIFF/WAVE PCM file: walk chunks (tolerating extra chunks such
    as LIST/fact, and the spec's word-alignment padding after odd-sized
    chunks), read ``fmt ``, and view ``data`` as a numpy sample array.

    Supports PCM (format 1) at 8-bit unsigned and 16-bit signed, any channel
    count — the portable subset every WAV writer emits.
    """
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16 or len(body) < 16:
                raise ValueError("fmt chunk too small or truncated")
            audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"WAV audio format {audio_format} is compressed; only PCM "
                    "(format 1) is decodable without a codec library"
                )
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes are followed by a pad byte
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_channels, sample_rate, bits = fmt
    if n_channels == 0 or sample_rate == 0:
        raise ValueError("corrupt fmt chunk: zero channels or sample rate")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported (8/16 only)")
    n_frames = len(arr) // n_channels
    return WavData(
        sample_rate=sample_rate,
        n_channels=n_channels,
        bits_per_sample=bits,
        samples=arr[: n_frames * n_channels].reshape(n_frames, n_channels),
    )


def encode_wav_bytes(samples: np.ndarray, sample_rate: int) -> bytes:
    """Write a minimal PCM16 RIFF/WAVE file. ``samples`` is int16, shape
    (n_frames,) for mono or (n_frames, n_channels)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    data = arr.tobytes()
    block_align = n_channels * 2
    hdr = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack(
                "<IHHIIHH",
                16,
                1,
                n_channels,
                sample_rate,
                sample_rate * block_align,
                block_align,
                16,
            ),
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    return hdr + data


# --------------------------------------------------------------------------- PPM


@dataclass
class PpmData:
    width: int
    height: int
    maxval: int
    pixels: np.ndarray  # shape (height, width, 3), uint8


def decode_ppm_bytes(payload: bytes) -> PpmData:
    """Parse a binary PPM (P6): ASCII header of magic, width, height, maxval
    separated by whitespace with ``#`` comments, then one whitespace byte,
    then width*height*3 raw RGB bytes."""
    if payload[0:2] != b"P6":
        if payload[0:2] in (b"P1", b"P2", b"P3", b"P4", b"P5"):
            raise NotImplementedError("only binary PPM (P6) is supported")
        raise ValueError("not a PPM file")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comment lines between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0 or maxval <= 0:
        raise ValueError("corrupt PPM header: non-positive dimension/maxval")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = width * height * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return PpmData(
        width=width,
        height=height,
        maxval=maxval,
        pixels=np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3),
    )


def encode_ppm_bytes(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Write a binary PPM (P6). ``pixels`` is uint8 with shape (h, w, 3)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM is RGB: pixels must have shape (h, w, 3)")
    return f"P6\n{w} {h}\n{maxval}\n".encode() + arr.tobytes()


# --------------------------------------------------------------------------- BMP


@dataclass
class BmpData:
    width: int
    height: int
    pixels: np.ndarray  # shape (height, width, 3), uint8, RGB, top-down


def decode_bmp_bytes(payload: bytes) -> BmpData:
    """Parse an uncompressed 24-bit Windows BMP (BITMAPINFOHEADER or the
    larger V4/V5 headers): 14-byte file header ('BM', data offset at byte
    10), DIB header (size at byte 14; width/height i32le at 18/22; bit
    count u16le at 28; compression u32le at 30 — must be 0 = BI_RGB), then
    the raster — rows padded to 4-byte multiples, BGR byte order, stored
    bottom-up when height > 0 (top-down when negative, per the spec).
    Everything is derived from the public BMP format description;
    compressed (RLE/BITFIELDS) and palette depths raise typed errors."""
    if payload[0:2] != b"BM":
        raise ValueError("not a BMP file")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(payload[10:14], "little")
    dib_size = int.from_bytes(payload[14:18], "little")
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER (OS/2) BMP not supported")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bit_count = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    if bit_count != 24:
        raise NotImplementedError(f"{bit_count}-bit BMP not supported (24-bit only)")
    if width <= 0 or height == 0:
        raise ValueError("corrupt BMP header: bad dimensions")
    top_down = height < 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte multiples
    need = stride * h
    raster = payload[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, : width * 3]
    img = rows.reshape(h, width, 3)
    if not top_down:
        img = img[::-1]  # bottom-up storage -> top-down logical order
    return BmpData(width=width, height=h, pixels=img[:, :, ::-1].copy())  # BGR->RGB


def encode_bmp_bytes(pixels: np.ndarray) -> bytes:
    """Write an uncompressed 24-bit bottom-up BMP. ``pixels`` is uint8 RGB
    with shape (h, w, 3), top-down logical order."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP encoder takes RGB pixels of shape (h, w, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[:, :, ::-1].reshape(h, w * 3)  # RGB->BGR
    raster = rows[::-1].tobytes()  # bottom-up
    file_size = 54 + len(raster)
    hdr = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return hdr + raster
