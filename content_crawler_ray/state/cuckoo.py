"""Cuckoo + Bloom filters over uint64 keys, numpy-backed, batch-oriented.

The engine's URL-seen set (SURVEY.md ST7) is layered:

  1. **Cuckoo filter** (this module) — the fast membership path: 4-slot
     buckets, 16-bit fingerprints, partial-key cuckoo hashing (Fan et al.,
    "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014). A negative
     answer is exact ("definitely never seen"), which is the overwhelmingly
     common case for a crawl frontier.
  2. **Exact tier** (state/seen.py) — confirms cuckoo positives, so the
     *engine's* seen-set semantics stay exact (the reference's ES ``_id``
     upsert is exact; golden-equality demands it).
  3. **Bloom spill tier** — when a shard's exact tier exceeds its memory
     budget it is frozen into a Bloom filter page (lossy, documented FP rate)
     and the cuckoo filter keeps absorbing inserts; production knob for the
     10^10-URL design point.

Membership tests are vectorized over uint64 batches; inserts loop only over
the novel keys (with bounded eviction kicks).
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    # splitmix64 finalizer — decorrelates bucket index from fingerprint
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


class CuckooFilter:
    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity * 1.05 / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.n_items = 0

    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix64(keys) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for "empty"

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = _mix64(fp.astype(np.uint64))
        return ((i1.astype(np.uint64) ^ h) & self.mask).astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool mask (no false negatives; ~2^-13 FP)."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._index2(i1, fp)
        b1 = self.table[i1]  # (n, SLOTS)
        b2 = self.table[i2]
        hit = (b1 == fp[:, None]).any(axis=1) | (b2 == fp[:, None]).any(axis=1)
        return hit

    def insert(self, keys: np.ndarray) -> None:
        """Insert keys (assumed novel); bounded-kick eviction per item."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._index2(i1, fp)
        for k in range(len(keys)):
            self._insert_one(int(i1[k]), int(i2[k]), np.uint16(fp[k]))
        self.n_items += len(keys)

    def _insert_one(self, i1: int, i2: int, f: np.uint16) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empt = np.nonzero(row == 0)[0]
            if len(empt):
                row[empt[0]] = f
                return
        idx = i1
        rng = np.random.Generator(np.random.PCG64(int(f)))  # deterministic kicks
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(0, _SLOTS))
            f, self.table[idx][slot] = self.table[idx][slot], f
            idx = int(self._index2(np.array([idx]), np.array([f], dtype=np.uint16))[0])
            row = self.table[idx]
            empt = np.nonzero(row == 0)[0]
            if len(empt):
                row[empt[0]] = f
                return
        raise RuntimeError("cuckoo filter over capacity — resize the shard")


class BloomFilter:
    """Spill-tier Bloom page: k derived double-hashing, vectorized batch ops."""

    def __init__(self, capacity: int, fp_rate: float = 1e-4):
        m = int(max(64, -capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = 1 << int(np.ceil(np.log2(m)))
        self.k = max(1, int(round(self.n_bits / max(capacity, 1) * np.log(2))))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)
        self.mask = np.uint64(self.n_bits - 1)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _mix64(keys.astype(np.uint64, copy=False))
        h2 = _mix64(h1 ^ _MIX)
        ks = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return ((h1[:, None] + ks * h2[:, None]) & self.mask).astype(np.int64)

    def insert(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = self.bits[pos >> 6]
        bit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return bit.astype(bool).all(axis=1)
