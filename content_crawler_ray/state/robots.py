"""robots.txt parsing + per-host cache — the robots half of ST8.

The reference has no robots handling (its sources are APIs); the north rule
requires it for the frontier engine. In-sandbox there is no network, so the
"fetch" of a host's robots.txt is a deterministic synthetic function (every
host serves ``Disallow: /private/`` — the single source of truth shared with
the simulator via ``ROBOTS_DISALLOW``), but the machinery is real: a minimal
robots.txt parser (User-agent: * groups, Disallow prefixes, blank Disallow =
allow all) and a per-host TTL-less cache of parsed rules, shard-partitioned
exactly like the politeness counters in production.
"""

from __future__ import annotations

ROBOTS_DISALLOW = "/private/"


def synthetic_robots_txt(host: str) -> str:
    """The deterministic robots.txt every synthetic host serves."""
    return f"User-agent: *\nDisallow: {ROBOTS_DISALLOW.rstrip('/')}/\n"


def parse_robots(text: str, agent: str = "*") -> list[str]:
    """Minimal parser → list of disallowed path prefixes for the agent.

    Honors ``User-agent`` grouping, ``Disallow:`` lines (empty value = allow
    all), ignores comments/unknown directives (Crawl-delay etc. would attach
    to the politeness budget in production).
    """
    disallows: list[str] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*" or val == agent
        elif key == "disallow" and applies:
            if val:
                disallows.append(val)
    return disallows


class RobotsCache:
    """Per-host parsed-rules cache. ``fetcher(host) -> str`` is the slot where
    a production implementation does the HTTP fetch (with politeness!)."""

    def __init__(self, fetcher=synthetic_robots_txt):
        self._fetcher = fetcher
        self._rules: dict[str, list[str]] = {}
        self.n_fetches = 0  # rules fetched (cache misses), for the 1/host/run contract

    def rules_for(self, host: str) -> list[str]:
        if host not in self._rules:
            self.n_fetches += 1
            self._rules[host] = parse_robots(self._fetcher(host))
        return self._rules[host]

    def allowed(self, host: str, path: str) -> bool:
        return not any(path.startswith(p) for p in self.rules_for(host))


class PrefetchedRobots:
    """Bucket-local read-only view over rules prefetched from the shared
    ``RobotsStore`` — the RobotsCache interface ``_robots_mask`` consumes,
    with zero fetches of its own (KeyError on an unprefetched host is a
    bug, not a fallback)."""

    def __init__(self, rules: dict[str, list[str]]):
        self._rules = rules

    def rules_for(self, host: str) -> list[str]:
        return self._rules[host]

    def allowed(self, host: str, path: str) -> bool:
        return not any(path.startswith(p) for p in self._rules[host])


def make_robots_store(fetcher=None):
    """Cluster-wide robots rules cache: ONE rules fetch per host per RUN,
    shared by every grant bucket of every wave. In-sandbox the fetch is the
    deterministic synthetic function so a per-task cold cache would be free,
    but in production robots.txt is network state — re-fetching it per
    (wave × bucket) re-hits every host's /robots.txt each wave. Grant tasks
    prefetch their bucket's distinct hosts in one round-trip
    (``rules_for_many``) and run the mask locally via PrefetchedRobots.

    Defined as a factory (ray.remote at call time) so importing this module
    never requires an initialized Ray.
    """
    import ray

    @ray.remote(num_cpus=0)
    class RobotsStore:
        def __init__(self):
            self._cache = RobotsCache(fetcher or synthetic_robots_txt)

        def rules_for_many(self, hosts: list[str]) -> dict[str, list[str]]:
            return {h: self._cache.rules_for(h) for h in hosts}

        def n_fetches(self) -> int:
            return self._cache.n_fetches

    return RobotsStore.remote()
