"""Mergeable sketches — HyperLogLog distinct counting (Flajolet et al. 2007,
with the standard bias-corrected estimator). The distributed pattern
(ray_guide "Aggregation at scale"): ONE sketch per batch emitted from
map_batches, merged in a tiny reduce — a count-distinct over any number of
rows moves only n_batches × 2^p bytes through the shuffle instead of the
key set itself. Registers are numpy uint8; merge = elementwise max.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        """Vectorized add of pre-hashed uint64 keys. Keys are re-mixed with a
        splitmix64 finalizer first: FNV-1a (the repo's key hash) avalanches
        poorly in its HIGH bits, which would concentrate register indices."""
        h = hashes.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        alive = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            bitset = (cur & mask) != 0
            done = alive & bitset
            alive &= ~bitset
            if not alive.any():
                break
            lz[alive] += 1
            cur = cur << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h
