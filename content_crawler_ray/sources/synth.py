"""Deterministic synthetic corpus + seed generators (FIXTURES.md F1/F2/F6).

The engine's "network" is simulated against this corpus (SURVEY.md §2 J6): a
row exists per crawlable image+caption resource, and fetching a URL resolves
its ``img-<n>`` path tail against the corpus key. Everything is seeded
(seed=42 by default), no wall clock, no external data.

Traps exercised by the seed table (~30% of rows): mixed-case hosts, explicit
default ``:80`` ports, fragments, unsorted query params, and literal duplicate
URLs — all of which must collapse to one canonical URL / one url_hash.

Captions embed ``href=<url>`` tokens (~15% of rows) so the crawl discovers
depth>0 frontier work; ~2% of seed URLs hit a ``/private/`` path that
robots.txt disallows; ~3% point at missing corpus ids (the 404 path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import hash64_scalar

N_HOSTS = 50

_CAPTION_VOCAB = [
    "aurora", "basalt", "cobalt", "derecho", "ember", "fjord", "glacier",
    "harbor", "isthmus", "jetty", "kelp", "lagoon", "meadow", "nimbus",
    "obsidian", "prairie", "quartz", "reef", "sierra", "tundra", "naïve",
    "köln", "東京", "señal", "💧", "mañana", "zephyr", "willow", "xylem", "yonder",
]


def host_name(k: int) -> str:
    return f"host{k}.example.com"


def _host_probs(n_hosts: int = N_HOSTS) -> np.ndarray:
    """Zipf-ish host popularity — host0/host1 are the hot domains (skew path)."""
    p = 1.0 / np.arange(1, n_hosts + 1, dtype=np.float64)
    return p / p.sum()


def corpus_url(host_idx: int, corpus_id: int, private: bool = False) -> str:
    seg = "private" if private else "p"
    return f"http://{host_name(host_idx)}/{seg}/img-{corpus_id:012d}"


def make_caption(rng: np.random.Generator, n_corpus: int, hot: np.ndarray) -> str:
    if rng.random() < 0.02:
        return ""
    n_tok = int(rng.integers(3, 12))
    toks = list(rng.choice(_CAPTION_VOCAB, size=n_tok))
    if rng.random() < 0.15:
        n_links = int(rng.integers(1, 4))
        for _ in range(n_links):
            cid = int(rng.integers(0, n_corpus))
            hidx = int(rng.choice(len(hot), p=hot))
            toks.append(f"href={corpus_url(hidx, cid)}")
    return " ".join(toks)


def corpus_rows(
    start: int,
    stop: int,
    n_corpus: int,
    seed: int = 42,
    min_dim: int = 16,
    max_dim: int = 128,
) -> pa.Table:
    """Corpus rows [start, stop) — independently generatable per shard, so the
    corpus builds distributed (ray.data.range → map_batches(corpus_rows)).

    ``min_dim``/``max_dim`` size the images: small defaults keep unit tests
    fast; the bench tier uses realistic dims so the fetch/decode stage is
    compute-bound like a real image crawl. The default path draws the exact
    same RNG sequence as always (golden outputs are dim-stable)."""
    hot = _host_probs()
    span = max_dim - min_dim + 1
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(start, stop):
        image_id = f"img-{i:012d}"
        rng = np.random.Generator(np.random.PCG64((hash64_scalar(image_id) ^ seed) & 0xFFFFFFFF))
        w = int(min_dim + rng.integers(0, span) * (0.3 if rng.random() < 0.7 else 1.0))
        w = max(min_dim, min(max_dim, w))
        h = max(
            min_dim,
            min(max_dim, int(min_dim + rng.integers(0, span) * (0.3 if rng.random() < 0.7 else 1.0))),
        )
        fmt = "dctq" if rng.random() < 0.2 else "raw"
        pixels = codecs.gen_pixels(image_id, w, h)
        data = codecs.encode(pixels, fmt)
        # phash column is the hash of the *decoded* pixels, so the fetch stage's
        # recompute matches exactly (per-row integrity invariant)
        ph = codecs.phash64(codecs.decode(data, w, h, fmt))
        caption = make_caption(rng, n_corpus, hot)
        ids.append(image_id)
        blobs.append(data)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(caption)
        phs.append(ph)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        }
    )


def make_corpus(
    n_rows: int, seed: int = 42, min_dim: int = 16, max_dim: int = 128
) -> pa.Table:
    return corpus_rows(0, n_rows, n_rows, seed, min_dim, max_dim)


def make_seeds(n_urls: int, n_corpus: int, seed: int = 42, n_hosts: int = N_HOSTS) -> pa.Table:
    """Seed/frontier fixture (F2): raw (trap-laden) URLs + priority + seed_rank."""
    rng = np.random.Generator(np.random.PCG64(seed))
    probs = _host_probs(n_hosts)
    urls: list[str] = []
    for i in range(n_urls):
        r = rng.random()
        if r < 0.10 and urls:
            # literal or trap-variant duplicate of an earlier URL
            base = urls[int(rng.integers(0, len(urls)))]
            urls.append(_trapify(base, rng))
            continue
        hidx = int(rng.choice(n_hosts, p=probs))
        if rng.random() < 0.03:
            cid = n_corpus + int(rng.integers(0, max(1, n_corpus // 10)))  # 404
        else:
            cid = int(rng.integers(0, n_corpus))
        private = rng.random() < 0.02
        u = corpus_url(hidx, cid, private=private)
        if rng.random() < 0.30:
            u = _trapify(u, rng)
        urls.append(u)
    priority = rng.random(n_urls).astype(np.float32)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "priority": pa.array(priority, pa.float32()),
            "depth": pa.array(np.zeros(n_urls, dtype=np.int32), pa.int32()),
            "seed_rank": pa.array(np.arange(n_urls, dtype=np.int64), pa.int64()),
        }
    )


def _trapify(url: str, rng: np.random.Generator) -> str:
    """Apply 1-2 canonicalization traps that must NOT change the canonical form."""
    out = url
    picks = rng.choice(4, size=int(rng.integers(1, 3)), replace=False)
    for p in picks:
        if p == 0:  # mixed-case host
            scheme, rest = out.split("://", 1)
            host, _, tail = rest.partition("/")
            out = f"{scheme}://{host.upper()}/{tail}"
        elif p == 1 and "?" not in out and "#" not in out:  # default port
            scheme, rest = out.split("://", 1)
            host, _, tail = rest.partition("/")
            if ":" not in host:
                out = f"{scheme}://{host}:80/{tail}"
        elif p == 2 and "#" not in out:  # fragment
            out = out + "#frag" + str(int(rng.integers(0, 10)))
        elif p == 3 and "#" not in out:  # unsorted query params
            if "?" not in out:
                out = out + "?b=2&a=1"
    return out


# --- large-scale documents synthesis (curation/dedup benchmarks) ------------

_LANG_STEER = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def make_documents(n_docs: int, seed: int = 42) -> pa.Table:
    """Deterministic documents table at arbitrary scale (same schema as the
    driver testdata's fixed 500-row documents.parquet) for benchmarking the
    text/dedup/curation operators beyond toy size: Zipf token draws over a
    synthetic vocabulary, language steered by marker-word prefixes the
    langid kernel keys on (70/10/10/10 en/de/fr/es), ~1.5% planted exact
    duplicates and ~1.5% planted near duplicates (one mid-token mutated)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(4000)], dtype=object)
    # shifted-Zipf: heavy enough for realistic term skew, flat enough that
    # common-word 4-grams don't collide across unrelated docs (a pure 1/rank
    # head puts ~12% of all tokens on ONE word and decontamination would
    # flag half the corpus)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = 1.0 / (ranks + 50.0)
    p /= p.sum()
    lens = rng.integers(20, 200, size=n_docs)
    total = int(lens.sum())
    draws = vocab[rng.choice(len(vocab), size=total, p=p)]
    offs = np.cumsum(lens) - lens
    lang_idx = rng.choice(4, size=n_docs, p=[0.7, 0.1, 0.1, 0.1])
    lang_names = np.array(["en", "de", "fr", "es"])
    langs = lang_names[lang_idx]
    steer = {k: " ".join(v) for k, v in _LANG_STEER.items()}
    texts = [
        steer[langs[i]] + " " + " ".join(draws[offs[i] : offs[i] + lens[i]])
        for i in range(n_docs)
    ]
    kind = rng.random(n_docs)
    for i in range(1, n_docs):
        if kind[i] < 0.015:  # exact duplicate of the previous doc
            texts[i] = texts[i - 1]
        elif kind[i] < 0.03:  # near duplicate: one token mutated
            toks = texts[i - 1].split(" ")
            toks[len(toks) // 2] = "zzmut"
            texts[i] = " ".join(toks)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                np.where(rng.random(n_docs) < 0.5, "web", "book"), pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def ensure_documents(n_docs: int, seed: int = 42, cache_dir: str = "/tmp/ccray") -> str:
    """Write-once cached sf-tier-shaped dir holding documents.parquet."""
    import os

    import pyarrow.parquet as pq

    d = os.path.join(cache_dir, f"docs_{n_docs}_{seed}")
    path = os.path.join(d, "documents.parquet")
    # Row groups of ~4k rows make the file READ-splittable: a single-row-group
    # 100 MB file serializes the read task (and with it any pass whose plan
    # starts at the read), measured as the near-serial quality-threshold
    # pre-pass in curate@300k (BASELINE.md round-5 per-op scaling).
    rg = 4096
    if os.path.exists(path):
        try:
            md = pq.ParquetFile(path).metadata
            if md.num_rows > 2 * rg and md.num_row_groups <= 1:
                os.remove(path)  # stale single-row-group layout: rewrite
        except Exception:
            pass
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        pq.write_table(make_documents(n_docs, seed), path + ".tmp", row_group_size=rg)
        os.replace(path + ".tmp", path)
    return d
