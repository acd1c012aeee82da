"""Sequential reference simulator — the correctness oracle (SURVEY.md §5b).

Replays, single-threaded and in one total order, the semantics the Ray engine
must reproduce (the reference's observable contract, generalized from its
1-element frontier: M/MendeleyPager.java:87-147 marker chain, ES ``_id``
seen-set M/ElasticSearchIndexHandler.java:213-217, 1-in-flight-per-host
politeness, config-order scheduling C/ContentfulCrawler.java:135-137):

The frontier is a **lazy-deletion priority queue**: it may hold several rows
per url_hash; the best one (priority DESC, seed_rank ASC) always sorts first,
so dedup happens at wave selection and stale duplicates are dropped when their
hash leaves with a wave — the standard frontier-PQ trick that avoids a
full-frontier dedup shuffle per wave in the distributed engine.

wave loop (must match pipelines/crawl.py step for step):
  1. sort frontier by (priority DESC, seed_rank ASC); wave = first K rows
     deduped by url_hash keeping the first in sort order (= global best);
     rest = remaining rows whose url_hash is NOT in the wave (lazy deletion)
  2. drop robots-disallowed rows (path contains /private/)
  3. admitted = wave rows whose url_hash ∉ seen
  4. politeness: per host, grant the first ``host_budget`` admitted rows in
     sort order; insert granted hashes into seen; assign per-host fetch_seq
  5. fetch granted against the corpus (200/404), decode, psnr, phash check
  6. extract ``href=`` links from captions of 200s; canonicalize; hash;
     priority = parent*0.5, depth+1, seed_rank = parent_rank*1000+j; cap at
     max_depth; self-dedup keep-best; drop links in the (post-wave) seen set
  7. frontier = rest ∪ denied ∪ links   (no global dedup — lazy deletion)

Outputs golden_order (host, fetch_seq, url_hash), golden_seen (sorted hashes)
and golden_fetched rows (FIXTURES.md F3).
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .functions import codecs
from .functions.hashing import hash64_scalar
from .functions.urls import canonicalize_scalar, image_id_of_scalar

from .state.robots import ROBOTS_DISALLOW, RobotsCache

LINK_RE = re.compile(r"href=(\S+)")
LINK_PRIORITY_DECAY = 0.5
LINK_RANK_BASE = 1000


@dataclass
class FrontierRow:
    url: str
    url_hash: int
    host: str
    priority: float
    depth: int
    seed_rank: int


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0].split(":", 1)[0].lower()


def _sort_key(r: FrontierRow):
    return (-r.priority, r.seed_rank)


def _dedup(rows: list[FrontierRow]) -> list[FrontierRow]:
    rows = sorted(rows, key=_sort_key)
    out, seen_h = [], set()
    for r in rows:
        if r.url_hash not in seen_h:
            seen_h.add(r.url_hash)
            out.append(r)
    return out


_ROBOTS = RobotsCache()


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return "/" + rest.split("/", 1)[1] if "/" in rest else "/"


def robots_allowed(url: str) -> bool:
    """robots.txt verdict via the shared parser/cache (state/robots.py);
    synthetic rule: every host disallows /private/ paths."""
    return _ROBOTS.allowed(_host_of(url), _path_of(url))


def simulate(
    seeds: pa.Table,
    corpus: pa.Table,
    wave_size: int = 10_000,
    host_budget: int = 4,
    max_waves: int = 32,
    max_depth: int = 3,
) -> dict:
    corpus_by_id = {}
    cid = corpus["image_id"].to_pylist()
    cb = corpus["bytes"].to_pylist()
    cw = corpus["w"].to_pylist()
    ch = corpus["h"].to_pylist()
    cf = corpus["fmt"].to_pylist()
    cc = corpus["caption"].to_pylist()
    cp = corpus["phash"].to_pylist()
    for i in range(len(cid)):
        corpus_by_id[cid[i]] = (cb[i], cw[i], ch[i], cf[i], cc[i], cp[i])

    frontier: list[FrontierRow] = []
    for url, pr, depth, rank in zip(
        seeds["url"].to_pylist(),
        seeds["priority"].to_pylist(),
        seeds["depth"].to_pylist(),
        seeds["seed_rank"].to_pylist(),
    ):
        canon = canonicalize_scalar(url)
        frontier.append(
            FrontierRow(canon, hash64_scalar(canon), _host_of(canon), float(np.float32(pr)), depth, rank)
        )

    seen: set[int] = set()
    host_seq: dict[str, int] = defaultdict(int)
    order: list[tuple[str, int, int]] = []
    fetched: list[dict] = []
    metrics: list[dict] = []
    wave = 0
    while frontier and wave < max_waves:
        frontier.sort(key=_sort_key)
        wave_raw = frontier[:wave_size]
        # dedup at selection: the best row of any hash in the top-K sorts first
        wavefront, wave_hashes = [], set()
        for r in wave_raw:
            if r.url_hash not in wave_hashes:
                wave_hashes.add(r.url_hash)
                wavefront.append(r)
        # lazy deletion: every row sharing a wave hash leaves the frontier
        rest = [r for r in frontier[wave_size:] if r.url_hash not in wave_hashes]
        allowed = [r for r in wavefront if robots_allowed(r.url)]
        admitted = [r for r in allowed if r.url_hash not in seen]
        granted, denied = [], []
        cnt: dict[str, int] = defaultdict(int)
        for r in admitted:
            if cnt[r.host] < host_budget:
                granted.append(r)
                cnt[r.host] += 1
            else:
                denied.append(r)
        discovered: list[FrontierRow] = []
        for r in granted:
            seen.add(r.url_hash)
            seq = host_seq[r.host]
            host_seq[r.host] += 1
            order.append((r.host, seq, r.url_hash))
            iid = image_id_of_scalar(r.url)
            crow = corpus_by_id.get(iid) if iid else None
            if crow is None:
                fetched.append(
                    dict(url=r.url, url_hash=r.url_hash, host=r.host, wave=wave,
                         fetch_seq=seq, depth=r.depth, status=404, image_id=iid,
                         caption=None, psnr=None, phash=None, phash_ok=None)
                )
                continue
            data, w, h, fmt, caption, phash = crow
            decoded = codecs.decode(data, w, h, fmt)
            orig = codecs.gen_pixels(iid, w, h)
            ps = codecs.psnr(decoded, orig)
            ph2 = codecs.phash64(decoded)
            fetched.append(
                dict(url=r.url, url_hash=r.url_hash, host=r.host, wave=wave,
                     fetch_seq=seq, depth=r.depth, status=200, image_id=iid,
                     caption=caption, psnr=ps, phash=ph2, phash_ok=(ph2 == phash))
            )
            if r.depth < max_depth:
                for j, link in enumerate(LINK_RE.findall(caption or "")):
                    canon = canonicalize_scalar(link)
                    discovered.append(
                        FrontierRow(canon, hash64_scalar(canon), _host_of(canon),
                                    float(np.float32(r.priority * LINK_PRIORITY_DECAY)),
                                    r.depth + 1, r.seed_rank * LINK_RANK_BASE + j)
                    )
        # links: self-dedup keep-best, then drop against the complete post-wave
        # seen set (matches the engine's grant-barrier-then-filter ordering)
        discovered = [d for d in _dedup(discovered) if d.url_hash not in seen]
        metrics.append(
            dict(wave=wave, wavefront=len(wavefront), robots_dropped=len(wavefront) - len(allowed),
                 admitted=len(admitted), granted=len(granted), denied=len(denied),
                 discovered=len(discovered), frontier_rest=len(rest))
        )
        frontier = rest + denied + discovered  # lazy deletion: no global dedup
        wave += 1

    return {
        "golden_order": sorted(order),
        "golden_seen": sorted(seen),
        "golden_fetched": fetched,
        "metrics": metrics,
        "n_waves": wave,
    }
