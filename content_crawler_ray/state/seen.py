"""Sharded URL-seen set — actor-pool state (SURVEY.md ST7).

The reference's dedup *is its sink* (ES ``_id`` upsert,
M/ElasticSearchIndexHandler.java:213-217); here it is explicit, sharded state:
shard = ``url_hash % n_shards``, each shard an actor holding

  - a :class:`~content_crawler_ray.state.cuckoo.CuckooFilter` fast path
    (definite-negative answers, the common case; rebuilt at 2× capacity on
    overflow), and
  - an exact uint64 tier (sorted base array + compacting delta array; every
    probe is a vectorized searchsorted) that confirms cuckoo positives, so
    membership is exact — required for golden seen-set equality. The
    ``spill_rows`` knob (the 10^10 design point) freezes the exact tier
    into Bloom pages past a memory budget — lossy (documented 1e-4 FP
    rate drops a URL), so golden-equality and checkpointed runs leave it
    off; the spill path is wired and tested
    (test_seen_shard_bloom_spill_bounds_memory).

All calls are batched (one message per shard per wave-stage, arrays in/out).
Shards checkpoint to Parquet (sorted uint64) and restore for resume.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import BloomFilter, CuckooFilter


def _in_sorted(arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` in a sorted uint64 array."""
    if not len(arr) or not len(keys):
        return np.zeros(len(keys), dtype=bool)
    pos = np.clip(np.searchsorted(arr, keys), 0, len(arr) - 1)
    return arr[pos] == keys


@ray.remote(num_cpus=0.05)
class SeenShard:
    """Exact tier = two sorted uint64 arrays (big ``base`` + small recent
    ``delta``, compacted when the delta grows) — every membership test is a
    vectorized searchsorted, never a per-key Python loop. The cuckoo filter
    screens definite negatives first (the common case) and REBUILDS at 2×
    capacity when an insert overflows, instead of aborting the crawl."""

    def __init__(self, capacity_hint: int = 1 << 16, spill_rows: int | None = None):
        self.cuckoo = CuckooFilter(capacity_hint)
        self._base = np.empty(0, dtype=np.uint64)
        self._delta = np.empty(0, dtype=np.uint64)
        self._compact_at = 1 << 16
        # Bloom spill tier (the 10^10 design point): when the exact base
        # array exceeds spill_rows, it freezes into a Bloom page (documented
        # FP rate 1e-4) and the arrays restart empty — shard memory is then
        # bounded by spill_rows + page bits instead of crawl size. Lossy:
        # a false positive drops a URL, so golden-equality runs and
        # checkpointed runs keep the default (None = never spill).
        self._spill_rows = spill_rows
        self._bloom_pages: list[BloomFilter] = []
        self._n_spilled = 0
        # replay-idempotence tags: (wave, bucket) → sorted keys this tag
        # inserted. A replayed grant task re-running contains_tagged treats
        # its OWN prior insertions as unseen, so the re-executed admission
        # equals the original one (grant math is otherwise deterministic).
        # Only the current wave's tags are retained (GC'd on wave advance),
        # so tag memory is bounded by one wave's novel keys.
        self._tags: dict[tuple[int, int], np.ndarray] = {}
        self._tag_wave = -1

    def _tag_gc(self, wave: int) -> None:
        if wave > self._tag_wave:
            self._tags = {k: v for k, v in self._tags.items() if k[0] >= wave}
            self._tag_wave = wave

    def _member(self, keys: np.ndarray) -> np.ndarray:
        # cuckoo screens the EXACT tiers only (a spill-time overflow rebuild
        # can no longer cover spilled keys); Bloom pages are filters in
        # their own right — no false negatives — so they answer directly
        # for whatever the exact tiers missed.
        out = np.zeros(len(keys), dtype=bool)
        idx = np.nonzero(self.cuckoo.contains(keys))[0]
        if len(idx):
            k = keys[idx]
            out[idx] = _in_sorted(self._base, k) | _in_sorted(self._delta, k)
        for page in self._bloom_pages:
            miss = np.nonzero(~out)[0]
            if not len(miss):
                break
            out[miss] = page.contains(keys[miss])
        return out

    def _insert_novel(self, novel: np.ndarray) -> None:
        """novel: sorted unique keys known absent from both tiers."""
        self._delta = np.union1d(self._delta, novel)
        if len(self._delta) >= max(self._compact_at, len(self._base) >> 3):
            self._base = np.union1d(self._base, self._delta)
            self._delta = np.empty(0, dtype=np.uint64)
        if (
            self._spill_rows is not None
            and len(self._base) + len(self._delta) >= self._spill_rows
        ):
            exact = np.union1d(self._base, self._delta)
            page = BloomFilter(len(exact))
            page.insert(exact)
            self._bloom_pages.append(page)
            self._n_spilled += len(exact)
            self._base = np.empty(0, dtype=np.uint64)
            self._delta = np.empty(0, dtype=np.uint64)
        try:
            self.cuckoo.insert(novel)
        except RuntimeError:
            all_keys = np.union1d(self._base, self._delta)
            cap = self.cuckoo.n_buckets * 4
            while True:
                cap *= 2
                rebuilt = CuckooFilter(cap)
                try:
                    rebuilt.insert(all_keys)
                    break
                except RuntimeError:
                    continue
            self.cuckoo = rebuilt

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._member(keys)

    def insert(self, keys: np.ndarray) -> int:
        u = np.unique(keys)
        novel = u[~self._member(u)]
        if len(novel):
            self._insert_novel(novel)
        return len(novel)

    def contains_tagged(self, keys: np.ndarray, wave: int, bucket: int) -> np.ndarray:
        """Membership that treats keys this (wave, bucket) tag itself inserted
        as UNSEEN — a replayed grant task gets the same admission verdicts as
        its first execution (keys other tags inserted still read as seen)."""
        self._tag_gc(wave)
        out = self._member(keys)
        own = self._tags.get((wave, bucket))
        if own is not None and len(own) and out.any():
            out &= ~_in_sorted(own, keys)
        return out

    def insert_tagged(self, keys: np.ndarray, wave: int, bucket: int) -> int:
        """Insert, recording which keys were novel under this (wave, bucket)
        tag. Idempotent under task replay: the second execution inserts
        nothing new and the tag set is unchanged (union of equal sets)."""
        self._tag_gc(wave)
        u = np.unique(keys)
        novel = u[~self._member(u)]
        if len(novel):
            self._insert_novel(novel)
        tag = (wave, bucket)
        prev = self._tags.get(tag)
        self._tags[tag] = novel if prev is None else np.union1d(prev, novel)
        return len(novel)

    def contains_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """True where the key was already present; inserts the rest.
        First occurrence within the batch wins (duplicates → True)."""
        u, first_idx, inv = np.unique(keys, return_index=True, return_inverse=True)
        present_u = self._member(u)
        out = present_u[inv]
        is_first = np.zeros(len(keys), dtype=bool)
        is_first[first_idx] = True
        out |= ~is_first
        novel = u[~present_u]
        if len(novel):
            self._insert_novel(novel)
        return out

    def size(self) -> int:
        return len(self._base) + len(self._delta) + self._n_spilled

    def snapshot(self) -> np.ndarray:
        if self._bloom_pages:
            # spilled keys are irrecoverable by design; checkpointing and
            # spill are mutually exclusive (run_crawl never enables both)
            raise RuntimeError("cannot snapshot a Bloom-spilled shard")
        return np.union1d(self._base, self._delta)

    def restore(self, keys: np.ndarray) -> None:
        self._base = np.unique(keys.astype(np.uint64))
        self._delta = np.empty(0, dtype=np.uint64)
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(self._base)))
        if len(self._base):
            self.cuckoo.insert(self._base)


class SeenSet:
    """Driver/stage-side client over the shard pool. Stateless; the handle list
    is cheap to ship into map_batches closures."""

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    @classmethod
    def create(
        cls, n_shards: int, capacity_hint: int = 1 << 16, spill_rows: int | None = None
    ) -> "SeenSet":
        return cls(
            [SeenShard.remote(capacity_hint, spill_rows) for _ in range(n_shards)]
        )

    def _scatter(self, keys: np.ndarray):
        sh = (keys % np.uint64(self.n)).astype(np.int64)
        parts = [np.nonzero(sh == s)[0] for s in range(self.n)]
        return parts

    def _gather(self, keys: np.ndarray, method: str, *args) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        parts = self._scatter(keys)
        refs = [
            getattr(self.shards[s], method).remote(keys[idx], *args)
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

    def contains_tagged(self, keys: np.ndarray, wave: int, bucket: int) -> np.ndarray:
        return self._gather(keys, "contains_tagged", wave, bucket)

    def contains_and_insert(self, keys: np.ndarray) -> np.ndarray:
        return self._gather(keys, "contains_and_insert")

    def insert(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        parts = self._scatter(keys)
        ray.get(
            [self.shards[s].insert.remote(keys[idx]) for s, idx in enumerate(parts) if len(idx)]
        )

    def insert_tagged(self, keys: np.ndarray, wave: int, bucket: int) -> None:
        keys = keys.astype(np.uint64, copy=False)
        parts = self._scatter(keys)
        ray.get(
            [
                self.shards[s].insert_tagged.remote(keys[idx], wave, bucket)
                for s, idx in enumerate(parts)
                if len(idx)
            ]
        )

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[np.ndarray]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, parts: list[np.ndarray]) -> None:
        assert len(parts) == self.n
        ray.get([s.restore.remote(p) for s, p in zip(self.shards, parts)])
