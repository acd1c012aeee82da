"""Cached lookup-service stage — the SpeciesService form of ST4
(M/clients/SpeciesService.java:28-43): the reference resolves taxa through a
remote species-match API behind a per-process Guava LRU cache, tolerating
misses (an unmatched name contributes nothing).

Ray shape: a callable CLASS for ``map_batches(..., concurrency=N)`` — the
LRU and the service client are built once per actor in ``__init__`` (never
per batch); ``__call__`` resolves each batch's DISTINCT keys through the
cache and explodes the ancestor chains. The pure vectorized form of the same
expansion lives in ``queries.q_st4_taxa_expand`` (exact oracle); this form
exists for lookups that genuinely need a remote service + cache (misses,
TTLs), with the service stubbed deterministic in-sandbox so both forms agree
row-for-row.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa


def _default_service(key: int) -> list[int]:
    """Deterministic stand-in for the species-match API: ancestor chain of a
    taxon key (same math as q_st4_taxa_expand); returns [] on a miss
    (key <= 0 — the reference's unmatched-name case)."""
    if key <= 0:
        return []
    return [t for t in (key, key // 10, key // 100, key // 1000) if t > 0]


class SpeciesLookupStage:
    """Actor-pool stage: (doc_id) → exploded (doc_id, taxon) rows through a
    per-actor LRU-cached lookup service."""

    def __init__(self, service=None, cache_size: int = 4096):
        self.service = service or _default_service
        self.cache: OrderedDict[int, list[int]] = OrderedDict()
        self.cache_size = cache_size
        self.service_calls = 0  # misses that actually hit the service

    def _lookup(self, key: int) -> list[int]:
        hit = self.cache.get(key)
        if hit is not None:
            self.cache.move_to_end(key)
            return hit
        self.service_calls += 1
        chain = self.service(key)
        self.cache[key] = chain
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)  # evict LRU
        return chain

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        keys = (doc % 997).astype(np.int64)
        # resolve each DISTINCT key once per batch (then once per actor
        # lifetime via the LRU), explode vectorized
        chains = {int(k): self._lookup(int(k)) for k in np.unique(keys)}
        lens = np.fromiter((len(chains[int(k)]) for k in keys), np.int64, count=len(keys))
        docs_rep = np.repeat(doc, lens)
        taxa = np.concatenate(
            [np.asarray(chains[int(k)], dtype=np.int64) for k in keys]
        ) if lens.sum() else np.array([], dtype=np.int64)
        out = pd.DataFrame({"doc_id": docs_rep, "taxon": taxa}).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema([("doc_id", pa.int64()), ("taxon", pa.int64())])
        )
