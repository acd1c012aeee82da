"""Sharded URL-seen set — actor-pool state (SURVEY.md ST7).

The reference's dedup *is its sink* (ES ``_id`` upsert,
M/ElasticSearchIndexHandler.java:213-217); here it is explicit, sharded state:
shard = ``url_hash % n_shards``, each shard an actor holding

  - a :class:`~content_crawler_ray.state.cuckoo.CuckooFilter` fast path
    (definite-negative answers, the common case), and
  - an exact uint64 tier (python set) that confirms cuckoo positives, so
    membership is exact — required for golden seen-set equality. At the
    10^10 design point the exact tier spills to sorted-array Bloom pages
    (state/cuckoo.BloomFilter); in-sandbox scales never trigger the spill.

All calls are batched (one message per shard per wave-stage, arrays in/out).
Shards checkpoint to Parquet (sorted uint64) and restore for resume.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0.05)
class SeenShard:
    def __init__(self, capacity_hint: int = 1 << 16):
        self.cuckoo = CuckooFilter(capacity_hint)
        self.exact: set[int] = set()

    def contains(self, keys: np.ndarray) -> np.ndarray:
        maybe = self.cuckoo.contains(keys)
        out = np.zeros(len(keys), dtype=bool)
        idx = np.nonzero(maybe)[0]
        if len(idx):
            ex = self.exact
            out[idx] = [int(keys[i]) in ex for i in idx]
        return out

    def insert(self, keys: np.ndarray) -> int:
        novel = [k for k in keys.tolist() if k not in self.exact]
        if novel:
            self.exact.update(novel)
            self.cuckoo.insert(np.array(novel, dtype=np.uint64))
        return len(novel)

    def contains_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """True where the key was already present; inserts the rest.
        First occurrence within the batch wins (duplicates → True)."""
        out = np.zeros(len(keys), dtype=bool)
        ex = self.exact
        novel = []
        for i, k in enumerate(keys.tolist()):
            if k in ex:
                out[i] = True
            else:
                ex.add(k)
                novel.append(k)
        if novel:
            self.cuckoo.insert(np.array(novel, dtype=np.uint64))
        return out

    def size(self) -> int:
        return len(self.exact)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))

    def restore(self, keys: np.ndarray) -> None:
        self.exact = set(int(k) for k in keys)
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(self.exact)))
        if len(keys):
            self.cuckoo.insert(keys.astype(np.uint64))


class SeenSet:
    """Driver/stage-side client over the shard pool. Stateless; the handle list
    is cheap to ship into map_batches closures."""

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    @classmethod
    def create(cls, n_shards: int, capacity_hint: int = 1 << 16) -> "SeenSet":
        return cls([SeenShard.remote(capacity_hint) for _ in range(n_shards)])

    def _scatter(self, keys: np.ndarray):
        sh = (keys % np.uint64(self.n)).astype(np.int64)
        parts = [np.nonzero(sh == s)[0] for s in range(self.n)]
        return parts

    def _gather(self, keys: np.ndarray, method: str) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        parts = self._scatter(keys)
        refs = [
            getattr(self.shards[s], method).remote(keys[idx])
            for s, idx in enumerate(parts)
            if len(idx)
        ]
        out = np.zeros(len(keys), dtype=bool)
        results = ray.get(refs)
        ri = 0
        for s, idx in enumerate(parts):
            if len(idx):
                out[idx] = results[ri]
                ri += 1
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._gather(keys, "contains")

    def contains_and_insert(self, keys: np.ndarray) -> np.ndarray:
        return self._gather(keys, "contains_and_insert")

    def insert(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        parts = self._scatter(keys)
        ray.get(
            [self.shards[s].insert.remote(keys[idx]) for s, idx in enumerate(parts) if len(idx)]
        )

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[np.ndarray]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, parts: list[np.ndarray]) -> None:
        assert len(parts) == self.n
        ray.get([s.restore.remote(p) for s, p in zip(self.shards, parts)])
