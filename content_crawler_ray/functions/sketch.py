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


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
    estimates with the one-sided guarantee estimate >= true count and, w.h.p.,
    estimate <= true + (e/w)·N. Same distributed shape as HyperLogLog above:
    one sketch per batch, associative elementwise-sum merge, so a frequency
    table over any number of rows moves only n_batches × d·w·8 bytes."""

    # fixed per-row salts (splitmix64 outputs of 1..4) — deterministic runs
    _SEEDS = np.array(
        [
            0x910A2DEC89025CC1,
            0xBEEB8DA1658EEC67,
            0xF4DBDF2199689451,
            0x7773FBC8C80A2A94,
        ],
        dtype=np.uint64,
    )

    def __init__(self, w: int = 4096, d: int = 4):
        assert d <= len(self._SEEDS)
        self.w, self.d = w, d
        self.table = np.zeros((d, w), dtype=np.int64)

    @staticmethod
    def _mix(h: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return h ^ (h >> np.uint64(31))

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        return np.stack(
            [
                (self._mix(h ^ self._SEEDS[i]) % np.uint64(self.w)).astype(np.int64)
                for i in range(self.d)
            ]
        )

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray) -> "CountMinSketch":
        idx = self._indices(hashes)
        c = counts.astype(np.int64, copy=False)
        for i in range(self.d):
            np.add.at(self.table[i], idx[i], c)
        return self

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indices(hashes)
        return np.min(
            np.stack([self.table[i][idx[i]] for i in range(self.d)]), axis=0
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, w: int = 4096, d: int = 4) -> "CountMinSketch":
        if len(data) != d * w * 8:
            raise ValueError(
                f"CountMinSketch payload is {len(data)} bytes, expected d={d}×w={w}"
                "×8 — geometry mismatch would silently corrupt estimates"
            )
        s = cls(w, d)
        s.table = np.frombuffer(data, dtype=np.int64).reshape(d, w).copy()
        return s
