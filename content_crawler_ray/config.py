"""Engine configuration — the analog of the reference's YAML-driven
ContentCrawlConfiguration (conf/ContentCrawlConfiguration.java:44-302),
as a plain dataclass consumed by pipelines and the CLI."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CrawlConfig:
    wave_size: int = 10_000       # K — frontier rows admitted per wave (A7 top-k)
    host_budget: int = 4          # politeness: max fetches per host per wave (ST8)
    max_waves: int = 32           # bounded re-crawl, like the reference's full runs
    max_depth: int = 3            # link-discovery depth cap
    n_seen_shards: int = 8        # ST7 shard count (hash-partitioned seen set)
    n_politeness_shards: int = 4  # ST8 shard count (host-hash partitioned)
    fetch_concurrency: int = 4    # FetchDecode actor-pool size
    fetch_batch_size: int = 1024  # rows per fetch/decode batch (binary-heavy → small)
    resume: bool = False          # resume from the latest committed wave checkpoint
    checkpoint: bool = True       # write per-wave state + manifest


def load_config(path: str) -> tuple[CrawlConfig, dict]:
    """YAML pipeline spec → (CrawlConfig, extras) — the reference's
    configuration.yml surface (conf/ContentCrawlConfiguration.java:44-302,
    R/configuration.yml). Recognized top-level key ``crawl:`` maps onto
    CrawlConfig fields (lowerCamel or snake_case); everything else (paths,
    controlled tags, …) is returned verbatim in ``extras`` for the caller.
    Unknown crawl keys raise, like the reference's strict Jackson binding."""
    import re

    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    crawl = doc.pop("crawl", {}) or {}
    fields = {f for f in CrawlConfig.__dataclass_fields__}
    kwargs = {}
    for key, val in crawl.items():
        snake = re.sub(r"(?<!^)(?=[A-Z])", "_", str(key)).lower()
        if snake not in fields:
            raise KeyError(f"unknown crawl config key: {key!r}")
        kwargs[snake] = val
    return CrawlConfig(**kwargs), doc
