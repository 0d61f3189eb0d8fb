"""Deterministic fake image codec.

Real decoders (Pillow/libjpeg) are not installed in this container, so
this module provides a self-describing byte format that lets every
payload check run end-to-end with REAL Spark plumbing and deterministic
results:

    header:  b"FIMG" | fmt(4s, padded) | w(uint16 BE) | h(uint16 BE)
    body:    w*h seeded pseudo-random grayscale pixel bytes
             (xorshift64* stream keyed by the image seed)

``decode_image`` raises ValueError on truncated/corrupt payloads —
standing in for a real decoder error. To swap in a real codec, replace
encode/decode here; all Spark-side code (schemas, Arrow UDF signatures,
batch shapes) is codec-agnostic. Checks that genuinely need a real
codec are marked with NotImplementedError in payload/image.py.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

MAGIC = b"FIMG"
HEADER = struct.Struct(">4s4sHH")


def _pixel_stream(seed: int, n: int) -> np.ndarray:
    """Deterministic pixel bytes via a vectorized counter-based PRF
    (splitmix64 finalizer over seed+index) — no sequential recurrence,
    so generating a 10^6-image table is numpy-bound, not Python-bound."""
    with np.errstate(over="ignore"):
        x = (
            np.uint64(seed * 2654435761 % (2**63) + 1)
            + np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x >> np.uint64(56)).astype(np.uint8)


def encode_image(seed: int, w: int, h: int, fmt: str) -> bytes:
    header = HEADER.pack(MAGIC, fmt.encode()[:4].ljust(4, b"\0"), w, h)
    return header + _pixel_stream(seed, w * h).tobytes()


def decode_image(payload: bytes) -> Tuple[str, int, int, np.ndarray]:
    """Return (fmt, w, h, pixels[h,w]); raises ValueError when corrupt."""
    if payload is None or len(payload) < HEADER.size:
        raise ValueError("truncated header")
    magic, fmt_b, w, h = HEADER.unpack(payload[: HEADER.size])
    if magic != MAGIC:
        raise ValueError("bad magic")
    body = payload[HEADER.size :]
    if len(body) != w * h:
        raise ValueError("truncated body")
    pixels = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
    return fmt_b.rstrip(b"\0").decode(), w, h, pixels


def phash64(payload: bytes) -> int:
    """Perceptual-hash stand-in: 64-bit signature of the 8x8
    mean-pooled pixel grid thresholded at the median — the same
    structure as a real pHash (DCT swapped for mean-pooling, which is
    deterministic and codec-independent here). Signed int64 for
    LongType columns."""
    fmt, w, h, px = decode_image(payload)
    return phash_from_pixels(px)


def phash_from_pixels(px: np.ndarray) -> int:
    """phash64 on already-decoded pixels (lets callers that hold the
    decoded array skip a second decode)."""
    h, w = px.shape
    # pool to 8x8
    if h % 8 == 0 and w % 8 == 0:
        # vectorized path: one reshape-mean instead of 64 slice-means
        # (identical arithmetic to the general path below — equal-size
        # blocks — but ~40x less Python/numpy dispatch overhead)
        grid = px.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = np.array_split(np.arange(h), 8)
        xs = np.array_split(np.arange(w), 8)
        grid = np.array(
            [[px[np.ix_(y, x)].mean() for x in xs] for y in ys]
        )
    med = np.median(grid)
    bits = (grid > med).ravel()
    # pack 64 bits in one numpy pass (MSB-first, matching the previous
    # shift loop), then wrap to signed 64-bit
    val = int.from_bytes(
        np.packbits(bits.astype(np.uint8)).tobytes(), "big"
    )
    if val >= 2**63:
        val -= 2**64
    return int(val)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (identical arrays → inf)."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
