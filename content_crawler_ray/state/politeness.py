"""Per-host politeness + robots — actor-pool state (SURVEY.md ST8).

The reference enforces politeness implicitly: one request in flight per source
(sequential cursor chain, M/MendeleyPager.java:104-129) and an explicit
``RateLimiter.create(1)`` on restore (B/ContentfulRestore.java:46). The engine
makes the budget explicit: each host may be granted at most ``host_budget``
fetches per wave, and grants within a host follow (priority DESC, seed_rank
ASC) order — which reproduces the reference's per-source FIFO.

State is sharded by ``hash(host) % n_shards``. A shard holds, per host:
  - the running fetch-sequence counter (assigns golden ``fetch_seq`` ranges),
  - the token-bucket parameters (refill = host_budget per wave),
  - the robots verdict cache. In-sandbox the robots model is the deterministic
    rule "every host disallows ``/private/``" (shared with the simulator);
    in production ``RobotsCache.lookup`` would fetch/parse robots.txt once
    per host per TTL and the cache shards exactly the same way.

The grant *decision* is deterministic rank-vs-budget math computed in the
pipeline's per-host map_groups (no arrival-order dependence); the actor only
owns the cross-wave counters, via one ``reserve(host, n)`` call per host per
wave.
"""

from __future__ import annotations

import ray

from .robots import ROBOTS_DISALLOW  # single source of truth for the robots rule


def robots_allowed_mask(urls):
    """Vectorized robots verdicts for canonical URLs (pyarrow string array in)."""
    import pyarrow.compute as pc

    return pc.invert(pc.match_substring(urls, ROBOTS_DISALLOW))


@ray.remote(num_cpus=0.05)
class PolitenessShard:
    def __init__(self):
        self.fetch_seq: dict[str, int] = {}
        # host → (wave, base, n) of the latest reservation: a task-retry
        # replay of the same wave's reservation returns the SAME base
        # instead of advancing the counter (grant now runs inside shuffle
        # reduce tasks, which Ray may re-execute)
        self.last: dict[str, tuple[int, int, int]] = {}

    def reserve(self, host: str, n: int, wave: int | None = None) -> int:
        """Reserve n fetch-sequence slots for a host; returns the base seq.
        Idempotent per (host, wave) when ``wave`` is given."""
        if wave is not None:
            prev = self.last.get(host)
            if prev is not None and prev[0] == wave:
                return prev[1]
        base = self.fetch_seq.get(host, 0)
        self.fetch_seq[host] = base + n
        if wave is not None:
            self.last[host] = (wave, base, n)
        return base

    def reserve_many(
        self, hosts: list[str], counts: list[int], wave: int | None = None
    ) -> list[int]:
        """Batched reserve — one message per shard per wave."""
        return [self.reserve(h, n, wave) for h, n in zip(hosts, counts)]

    def snapshot(self) -> dict:
        return {"fetch_seq": dict(self.fetch_seq), "last": dict(self.last)}

    def restore(self, state: dict) -> None:
        if "fetch_seq" in state:
            self.fetch_seq = dict(state["fetch_seq"])
            self.last = {h: tuple(v) for h, v in state.get("last", {}).items()}
        else:  # legacy flat snapshot
            self.fetch_seq = dict(state)
            self.last = {}


class Politeness:
    """Client over the shard pool; host → shard by stable string hash."""

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    @classmethod
    def create(cls, n_shards: int) -> "Politeness":
        return cls([PolitenessShard.remote() for _ in range(n_shards)])

    def shard_for(self, host: str):
        from ..functions.hashing import hash64_scalar

        return self.shards[hash64_scalar(host) % self.n]

    def reserve(self, host: str, n: int, wave: int | None = None) -> int:
        return ray.get(self.shard_for(host).reserve.remote(host, n, wave))

    def reserve_many(
        self, hosts: list[str], counts: list[int], wave: int | None = None
    ) -> dict[str, int]:
        """Batched cross-shard reserve; returns host → base fetch_seq."""
        from ..functions.hashing import hash64_scalar

        by_shard: dict[int, tuple[list[str], list[int]]] = {}
        for h, n in zip(hosts, counts):
            s = hash64_scalar(h) % self.n
            by_shard.setdefault(s, ([], []))[0].append(h)
            by_shard[s][1].append(n)
        refs = {
            s: self.shards[s].reserve_many.remote(hs, ns, wave)
            for s, (hs, ns) in by_shard.items()
        }
        out: dict[str, int] = {}
        for s, (hs, _) in by_shard.items():
            for h, base in zip(hs, ray.get(refs[s])):
                out[h] = base
        return out

    def snapshot(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, states: list[dict]) -> None:
        ray.get([s.restore.remote(st) for s, st in zip(self.shards, states)])
