"""Pure-numpy image codecs for the image+caption corpus (BASELINE.json input_hint).

The sandbox has no PIL/opencv, so the corpus carries two deterministic formats:

- ``raw``  — lossless: the uint8 grayscale pixel buffer, row-major (h × w).
- ``dctq`` — lossy: 8×8 block DCT-II (orthonormal matrix form), uniformly
  quantized with step Q=4 and stored as little-endian int16 coefficients.
  Uniform quantization error ≤ Q/2 per coefficient → MSE ≈ Q²/12 ≈ 1.33 →
  PSNR ≈ 46.8 dB, comfortably above the 40 dB per-row invariant
  (BASELINE.json: "decoded-pixel allclose, PSNR≥40dB for lossy").

All kernels are vectorized over whole images (block reshape + two matmuls);
decode of a batch is a Python loop over rows only because each row has its own
(w, h) — the per-row work is numpy matmuls, not scalar code.

phash: average-pool to 32×32 → 2-D DCT → top-left 8×8 low-frequency block
(skipping DC) → median threshold → 64-bit signature. Deterministic analog of
the classic pHash; used for the per-row ``phash`` integrity column.
"""

from __future__ import annotations

import numpy as np

Q_STEP = 4.0
_BLOCK = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)
_D32 = _dct_matrix(32)


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic uint8 (h × w) pixel field seeded by the image id.

    Smooth low-frequency base + mild noise so dctq compresses sensibly.
    """
    from .hashing import hash64_scalar

    seed = hash64_scalar(image_id) & 0xFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    yy, xx = np.mgrid[0:h, 0:w]
    fx, fy = rng.uniform(0.02, 0.2, size=2)
    phase = rng.uniform(0, 2 * np.pi)
    base = 127.5 + 100.0 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
    noise = rng.normal(0.0, 8.0, size=(h, w))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _pad_to_block(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % _BLOCK
    pw = (-w) % _BLOCK
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def _blockify(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    return img.reshape(h // _BLOCK, _BLOCK, w // _BLOCK, _BLOCK).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    bh, bw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(bh * _BLOCK, bw * _BLOCK)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "dctq":
        img = _pad_to_block(pixels.astype(np.float64) - 128.0)
        blocks = _blockify(img)
        coeffs = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8)
        q = np.round(coeffs / Q_STEP).astype(np.int16)
        return q.astype("<i2").tobytes()
    raise NotImplementedError(f"unknown corpus format: {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to uint8 (h × w). Raises NotImplementedError for foreign formats
    (jpeg/png/webp would plug in here in production — SURVEY.md §2 fetch stage)."""
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w)
    if fmt == "dctq":
        ph = h + ((-h) % _BLOCK)
        pw = w + ((-w) % _BLOCK)
        q = np.frombuffer(data, dtype="<i2").astype(np.float64).reshape(
            ph // _BLOCK, pw // _BLOCK, _BLOCK, _BLOCK
        )
        coeffs = q * Q_STEP
        blocks = np.einsum("ji,abjk,kl->abil", _D8, coeffs, _D8)
        img = _unblockify(blocks)[:h, :w] + 128.0
        return np.clip(np.round(img), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"unknown corpus format: {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, cap: float = 99.0) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images; lossless → cap."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse <= 0.0:
        return cap
    return min(cap, 10.0 * np.log10(255.0 * 255.0 / mse))


def _pool_to(img: np.ndarray, n: int = 32) -> np.ndarray:
    """Area-style downsample to n×n via bucketed means (deterministic, any dims)."""
    h, w = img.shape
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    area = np.maximum(area, 1)
    s = (
        csum[ys[1:], :][:, xs[1:]]
        - csum[ys[:-1], :][:, xs[1:]]
        - csum[ys[1:], :][:, xs[:-1]]
        + csum[ys[:-1], :][:, xs[:-1]]
    )
    return s / area


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an image; returns a signed int64-compatible int."""
    small = _pool_to(pixels, 32)
    coeffs = _D32 @ small @ _D32.T
    low = coeffs[:8, :8].copy().ravel()
    med = np.median(low[1:])  # skip DC for the threshold
    bits = (low > med).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = np.uint64((int(h) << 1) | int(b)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return int(h.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
