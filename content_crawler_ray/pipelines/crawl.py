"""The wave-loop crawl driver (SURVEY.md §7.2) — flagship pipeline.

Replaces the reference's sequential cursor chain (M/MendeleyPager.java:87-147,
one URL in flight) with a distributed frontier. Split of responsibilities:

**Data plane — distributed Ray Data** (unbounded, streams through the object
store): the frontier table itself (sort/limit shuffle per wave, dedup groupby
on url_hash), the fetch+decode stage (actor-pool ``map_batches`` over
zero-copy Arrow), link extraction, and the per-wave Parquet output.

**Control plane — ALSO distributed** (``_grant_stage``): wave selection-dedup
runs in the sort shuffle's output blocks, and the whole grant (robots filter,
seen-set admission, per-host rank-vs-budget, politeness reservation, seen
insert) runs inside host-bucketed shuffle reduce tasks. The driver never
holds a wave row: per wave it receives only the per-bucket counters and the
wave's url_hash set (8 B/row) through the ``_WaveState`` actor, so driver
serial time is O(1) in ``wave_size``.

Determinism contract (verified against simulator.py): every scheduling
decision is a function of (priority, seed_rank, host, url_hash) — never of
block arrival order — so the same seed list + politeness budget reproduces
the reference's crawl ordering and URL-seen membership at any parallelism.

The frontier is a **lazy-deletion priority queue** (see simulator.py): it may
hold several rows per url_hash, dedup happens at wave selection (the best dup
always sorts first), and all rows sharing a wave hash leave the frontier with
that wave. This removes the naive design's full-frontier dedup shuffle per
wave — the only per-wave frontier-wide operations are ONE sort+limit and ONE
broadcast anti-join filter pass.

Wave steps (exactly mirrors simulator.simulate):
  1. wave  = frontier.sort(priority DESC, seed_rank ASC).limit(K)   [shuffle]
     → per-block keep-first dedup → host-bucketed grant shuffle
     (robots → seen → rank-vs-budget → politeness → seen insert),
     all in ONE materialize round; driver receives counters + hashes only
  2. rest  = frontier anti-joined on the K broadcast wave hashes    [lazy map]
  3. (folded into step 1 — see _grant_stage)
  4. granted → map_batches(FetchDecode, concurrency=N) → out/wave=<n>/
  5. links extracted/canonicalized/hashed, self-deduped keep-best,
     seen-filtered (after the grant barrier) — ALL as Dataset stages
     (_links_dedup_seen): link rows never reach the driver. Round 1 pulled
     the full discovery table to the driver per wave (O(K · branching) ≈
     multi-GB at K=1M × ~10 links/row); now driver link bytes/wave = 0,
     only the count crosses.
  6. frontier' = rest ∪ denied ∪ links                              [union]
  7. checkpoint frontier + seen shards + politeness counters, commit manifest

Skew note: hot hosts are bounded by host_budget per wave regardless of
frontier skew; the sort shuffle keys on priority (uniform) — host skew never
becomes partition skew.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import CrawlConfig
from ..functions.hashing import hash64_array
from ..runtime import n_buckets_for
from ..functions.urls import canonicalize_array, host_of_array
from ..sources import tableio
from ..stages.fetch import (
    count_rows,
    count_status,
    fetch_write_links_bucketed_fn,
    fetch_write_links_fn,
)
from ..stages.links import FRONTIER_SCHEMA
from ..state.politeness import Politeness
from ..state.robots import PrefetchedRobots, RobotsCache, make_robots_store
from ..state.seen import SeenSet

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]

# discovery sets at or below this size skip the bucketed dedup shuffle for a
# single coalesce+task (pure fixed-cost win; at 1M-row waves the bucketed
# path engages)
SMALL_LINKS_MAX = 500_000


def prepare_frontier(seeds: rd.Dataset) -> rd.Dataset:
    """Raw seed rows (url, priority, depth, seed_rank) → canonical frontier.
    No dedup here: the frontier is a lazy-deletion priority queue (duplicate
    hashes resolve at wave selection — the best dup always sorts first)."""

    def canon(batch: pa.Table) -> pa.Table:
        urls = canonicalize_array(batch["url"])
        return pa.table(
            {
                "url": urls,
                "url_hash": pa.array(hash64_array(urls), pa.uint64()),
                "host": host_of_array(urls),
                "priority": batch["priority"],
                "depth": batch["depth"],
                "seed_rank": batch["seed_rank"],
            }
        )

    return seeds.map_batches(canon, batch_format="pyarrow")


def _filter_not_in(ds: rd.Dataset, hashes_ref) -> rd.Dataset:
    """Drop rows whose url_hash is in the broadcast sorted uint64 array.
    Ships only the K wave hashes (ray.put once), never the frontier."""

    def fn(batch: pa.Table) -> pa.Table:
        sorted_hashes = ray.get(hashes_ref)
        if not len(sorted_hashes) or not len(batch):
            return batch
        h = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.clip(np.searchsorted(sorted_hashes, h), 0, len(sorted_hashes) - 1)
        return batch.filter(pa.array(sorted_hashes[pos] != h))

    return ds.map_batches(fn, batch_format="pyarrow")


def _collect(ds: rd.Dataset, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (bounded, control-plane) dataset to one Arrow table.

    materialize() FIRST: calling ``to_arrow_refs()`` on a lazy dataset
    executes the plan twice (observed on ray 2.49 — 2× side effects), which
    would double-run side-effecting stages like the fused fetch+spool."""
    blocks = ray.get(ds.materialize().to_arrow_refs())
    tbls = []
    for t in blocks:
        if isinstance(t, pd.DataFrame):  # empty/sort blocks may be pandas-backed
            if not len(t):
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            tbls.append(t)
    if not tbls:
        return (schema or FRONTIER_SCHEMA).empty_table()
    return pa.concat_tables(tbls, promote_options="default").combine_chunks()


def _robots_mask(wave: pa.Table, robots: RobotsCache) -> pa.Array:
    """Per-host robots.txt verdicts, vectorized per distinct host: parse/cache
    a host's rules once (state/robots.py), then one pc.starts_with pass per
    (host, prefix) over that host's paths."""
    import pyarrow.compute as pc

    urls = wave["url"]
    paths = pc.replace_substring_regex(
        urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", ""
    )
    hosts = np.asarray(wave["host"].to_pylist())
    mask = np.ones(len(hosts), dtype=bool)
    for host in set(hosts.tolist()):
        rules = robots.rules_for(host)
        if not rules:
            continue
        sel = hosts == host
        sub = paths.filter(pa.array(sel))
        bad = np.zeros(int(sel.sum()), dtype=bool)
        for prefix in rules:
            bad |= pc.starts_with(sub, prefix).to_numpy(zero_copy_only=False)
        idx = np.nonzero(sel)[0]
        mask[idx[bad]] = False
    return pa.array(mask)


@ray.remote(num_cpus=0)
class _WaveState:
    """Per-wave bookkeeping for lazily-executed distributed stages. Every
    report is keyed by (wave, bucket) and OVERWRITES that slot, so task
    retries and lineage re-execution stay idempotent (an additive counter
    would double-count on replay). Reports tagged with a wave other than the
    current one are DROPPED: a cross-wave lineage re-execution of a stale
    wave's lazy stage (e.g. lost-block recovery of a links dedup_filter after
    the wave advanced) must not write into the current wave's slots."""

    def __init__(self):
        self.wave = -1
        self.links: dict[int, int] = {}
        self.grants: dict[int, dict] = {}
        self.hashes: dict[int, bytes] = {}

    def report_links(self, wave: int, bucket: int, n: int) -> None:
        if wave == self.wave:
            self.links[bucket] = n

    def report_grant(self, wave: int, bucket: int, stats: dict, hashes: bytes) -> None:
        if wave == self.wave:
            self.grants[bucket] = stats
            self.hashes[bucket] = hashes

    def links_total(self) -> int:
        return sum(self.links.values())

    def grant_totals(self) -> dict:
        keys = ["wavefront", "robots_dropped", "admitted", "granted", "denied"]
        return {k: sum(g[k] for g in self.grants.values()) for k in keys}

    def wave_hashes(self) -> bytes:
        return b"".join(self.hashes[k] for k in sorted(self.hashes))

    def grant_buckets(self) -> dict[int, dict]:
        """Per-bucket grant counters — the observable for the skew-balance
        claim in the module docstring (hot hosts bounded by host_budget ⇒
        granted output per bucket stays balanced under Zipf frontier skew)."""
        return dict(self.grants)

    def reset(self, wave: int) -> None:
        self.wave = wave
        self.links = {}
        self.grants = {}
        self.hashes = {}


def _links_dedup_seen(
    links: rd.Dataset, seen: SeenSet, n_buckets: int | None = None, counter=None,
    wave_no: int = 0,
) -> rd.Dataset:
    """Self-dedup keep-best + seen-filter of discovered links as Dataset
    stages: bucket on url_hash, one vectorized pandas keep-best pass per
    shuffle bucket, then a batched ``seen.contains`` against the shard
    actors from INSIDE the reduce task. Link rows never reach the driver
    (previously O(wave_size · branching) pandas per wave there; now the
    driver holds only the plan). Deterministic: keep-best orders by
    (priority DESC, seed_rank ASC) and seed_ranks are unique per discovery
    (parent_rank*1000+j), so bucket-local dedup equals the global one."""
    n_buckets = n_buckets or n_buckets_for()

    def add_bucket(b: pa.Table) -> pa.Table:
        h = b["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "_b", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def dedup_filter(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["_b"].iloc[0]) if "_b" in g.columns and len(g) else 0
        g = g.sort_values(
            ["priority", "seed_rank"], ascending=[False, True], kind="mergesort"
        )
        g = g.drop_duplicates("url_hash")
        if "_b" in g.columns:
            g = g.drop(columns=["_b"])
        h = g["url_hash"].to_numpy().astype(np.uint64)
        out = g[~seen.contains(h)]
        if counter is not None:  # blocking get → report delivered before the
            ray.get(counter.report_links.remote(wave_no, bucket, len(out)))  # task completes
        return out

    to_schema = lambda b: b.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA)  # noqa: E731

    n_links = links.count()  # links is materialized by the caller — metadata-only
    if n_links <= SMALL_LINKS_MAX:
        # small discovery set: one coalesce + one task replace the whole
        # sort round (a bucketed shuffle is pure fixed cost here; its reduce
        # would see these rows in one bucket's worth of work anyway). Same
        # kernel, same determinism, still zero driver bytes.
        return (
            links.repartition(1)
            .map_batches(dedup_filter, batch_format="pandas", batch_size=None)
            .map_batches(to_schema, batch_format="pyarrow")
        )

    return (
        links.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(dedup_filter, batch_format="pandas")
        .map_batches(to_schema, batch_format="pyarrow")
    )


def _fused_small_wave(
    granted: rd.Dataset | pa.Table, stage_fn, seen: SeenSet, counter=None,
    wave_no: int = 0,
) -> rd.Dataset:
    """Tail-wave fast path: the granted set fits one block, so fetch+spool,
    global link dedup and the seen filter run as consecutive map stages of a
    single pipeline round — same kernels, same determinism (one block ⇒ the
    in-task dedup IS global), zero driver bytes."""

    def dedup_filter(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["priority", "seed_rank"], ascending=[False, True], kind="mergesort"
        ).drop_duplicates("url_hash")
        h = g["url_hash"].to_numpy().astype(np.uint64)
        out = g[~seen.contains(h)]
        if counter is not None:
            ray.get(counter.report_links.remote(wave_no, 0, len(out)))
        return out

    if isinstance(granted, pa.Table):
        granted = rd.from_arrow(granted)
    return (
        granted
        .map_batches(stage_fn, batch_format="pyarrow", batch_size=None)
        .map_batches(dedup_filter, batch_format="pandas", batch_size=None)
        .map_batches(
            lambda b: b.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA),
            batch_format="pyarrow",
        )
    )


def _grant_wave(
    wave: pa.Table, seen: SeenSet, politeness: Politeness, robots: RobotsCache,
    host_budget: int, wave_no: int, bucket: int = 0
) -> tuple[pa.Table, pa.Table, dict]:
    """Control-plane scheduling of one O(K) wave: robots → seen → politeness.

    Returns (granted ⊕ fetch_seq/wave cols, denied frontier rows, counters).
    Deterministic: pure rank math over (priority, seed_rank, host).
    Replay-idempotent: admission uses (wave, bucket)-tagged seen calls — a
    replayed task's own prior inserts read as unseen, so the re-executed
    admission (and hence the whole deterministic grant) equals the original.
    """
    n_wave = wave.num_rows
    allowed = wave.filter(_robots_mask(wave, robots))
    hashes = allowed["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    admitted = (
        allowed.filter(pa.array(~seen.contains_tagged(hashes, wave_no, bucket)))
        if len(hashes)
        else allowed
    )

    # pure numpy/Arrow grant math (this is serial driver time — at the high
    # parallelism leg it is an Amdahl term, so no pandas round trips):
    # stable order by (priority DESC, seed_rank ASC), per-host rank via
    # factorize + stable argsort offsets, politeness bases mapped by code.
    admitted = admitted.select(FRONTIER_COLS).combine_chunks()
    prio = admitted["priority"].to_numpy(zero_copy_only=False)
    srank = admitted["seed_rank"].to_numpy(zero_copy_only=False)
    order = np.lexsort((srank, -prio.astype(np.float64)))
    ordered = admitted.take(pa.array(order, pa.int64()))

    codes, uniq_hosts = pd.factorize(
        pd.Series(ordered["host"].to_numpy(zero_copy_only=False)), sort=False
    )
    n_adm = len(codes)
    counts_all = np.bincount(codes, minlength=len(uniq_hosts)) if n_adm else np.array([], np.int64)
    starts = np.zeros(len(uniq_hosts) + 1, dtype=np.int64)
    np.cumsum(counts_all, out=starts[1:])
    by_code = np.argsort(codes, kind="stable")
    rank = np.empty(n_adm, dtype=np.int64)
    rank[by_code] = np.arange(n_adm, dtype=np.int64) - np.repeat(starts[:-1], counts_all)
    granted_mask = rank < host_budget

    g_codes = codes[granted_mask]
    g_counts = np.bincount(g_codes, minlength=len(uniq_hosts))
    active = np.nonzero(g_counts)[0]
    bases_map = politeness.reserve_many(
        [uniq_hosts[i] for i in active], g_counts[active].tolist(), wave=wave_no
    )
    base_by_code = np.zeros(len(uniq_hosts), dtype=np.int64)
    for i in active:
        base_by_code[i] = bases_map[uniq_hosts[i]]

    gtbl = ordered.filter(pa.array(granted_mask))
    fetch_seq = rank[granted_mask] + base_by_code[g_codes]
    if gtbl.num_rows:
        seen.insert_tagged(
            gtbl["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            wave_no,
            bucket,
        )

    granted = gtbl.append_column(
        "fetch_seq", pa.array(fetch_seq, pa.int64())
    ).append_column(
        "wave", pa.array(np.full(gtbl.num_rows, wave_no, dtype=np.int32), pa.int32())
    ).cast(
        pa.schema(
            list(FRONTIER_SCHEMA) + [("fetch_seq", pa.int64()), ("wave", pa.int32())]
        )
    )
    denied = ordered.filter(pa.array(~granted_mask)).cast(FRONTIER_SCHEMA)
    counters = dict(
        wavefront=n_wave,
        robots_dropped=n_wave - allowed.num_rows,
        admitted=admitted.num_rows,
        granted=granted.num_rows,
        denied=denied.num_rows,
    )
    return granted, denied, counters


GRANT_SCHEMA = pa.schema(
    list(FRONTIER_SCHEMA)
    + [("fetch_seq", pa.int64()), ("wave", pa.int32()), ("granted", pa.bool_())]
)


def _grant_stage(
    sel: rd.Dataset,
    seen: SeenSet,
    politeness: Politeness,
    host_budget: int,
    wave_no: int,
    state,
    n_buckets: int | None = None,
    robots_store=None,
) -> rd.Dataset:
    """Distributed wave grant: the whole control plane (selection dedup,
    robots, seen admission, per-host rank-vs-budget, politeness reservation,
    seen insert) runs INSIDE host-bucketed shuffle reduce tasks — the driver
    never holds a wave row. Determinism holds because every duplicate of a
    url_hash shares its host (the hash determines the URL determines the
    host), so bucket-local keep-best dedup equals the global one; hosts are
    disjoint across buckets, so per-host rank math and per-(host,wave)
    politeness reservations are order-independent; seen shards are keyed by
    url_hash, so concurrent bucket inserts never interact. Politeness
    reservations are idempotent per (host, wave) and seen inserts are set
    unions, so task replay is safe. Each bucket reports its counters + wave
    hash set to ``state`` (idempotent per bucket) for the driver's rest
    filter and metrics."""
    n_buckets = n_buckets or n_buckets_for()

    def add_bucket(b: pa.Table) -> pa.Table:
        hb = (hash64_array(b["host"]) % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column("_b", pa.array(hb, pa.int64()))

    def grant_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return GRANT_SCHEMA.empty_table()
        bucket = int(t["_b"][0].as_py())
        t = t.drop_columns(["_b"])
        # bucket-global keep-best dedup (sort + keep-first)
        prio = t["priority"].to_numpy(zero_copy_only=False)
        srank = t["seed_rank"].to_numpy(zero_copy_only=False)
        order = np.lexsort((srank, -prio.astype(np.float64)))
        t = t.take(pa.array(order, pa.int64()))
        h = t["url_hash"].to_numpy(zero_copy_only=False)
        keep = ~pd.Series(h).duplicated().to_numpy()
        if not keep.all():
            t = t.filter(pa.array(keep))
        wave = t.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA)
        # robots rules come from the SHARED run-wide store (one fetch per
        # host per run): prefetch this bucket's distinct hosts in one
        # round-trip, mask locally. A per-task RobotsCache() fallback keeps
        # store-less callers (unit tests) working — in-sandbox the fetch is
        # a pure function, so the fallback is semantically identical.
        if robots_store is not None:
            hosts = sorted(set(wave["host"].to_pylist()))
            robots = PrefetchedRobots(ray.get(robots_store.rules_for_many.remote(hosts)))
        else:
            robots = RobotsCache()
        granted, denied, counters = _grant_wave(
            wave, seen, politeness, robots, host_budget, wave_no, bucket
        )
        # blocking get: the report lands before the task completes
        ray.get(
            state.report_grant.remote(
                wave_no,
                bucket,
                counters,
                wave["url_hash"]
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
                .tobytes(),
            )
        )
        gt = granted.append_column(
            "granted", pa.array(np.ones(granted.num_rows, dtype=bool))
        )
        dt = (
            denied.append_column(
                "fetch_seq", pa.array(np.full(denied.num_rows, -1, np.int64), pa.int64())
            )
            .append_column(
                "wave",
                pa.array(np.full(denied.num_rows, wave_no, np.int32), pa.int32()),
            )
            .append_column("granted", pa.array(np.zeros(denied.num_rows, dtype=bool)))
        )
        return pa.concat_tables([gt, dt]).cast(GRANT_SCHEMA)

    return (
        sel.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(grant_bucket, batch_format="pyarrow")
    )


def run_crawl(
    corpus_path: str,
    seeds: rd.Dataset | pa.Table,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    corpus_ref=None,
) -> dict:
    """Run the crawl to frontier exhaustion (or wave budget). Returns summary
    metrics; fetched rows land under ``out_dir/wave=<n>/``."""
    cfg = cfg or CrawlConfig()
    if isinstance(seeds, pa.Table):
        seeds = rd.from_arrow(seeds)
    os.makedirs(out_dir, exist_ok=True)

    seen = SeenSet.create(cfg.n_seen_shards)
    politeness = Politeness.create(cfg.n_politeness_shards)
    robots_store = make_robots_store()  # one rules fetch per host per RUN

    # Corpus access: a parquet FILE is broadcast ONCE via the object store
    # (zero-copy Arrow in plasma, shared by every fetch task of every wave);
    # a DIRECTORY is treated as a hash-bucketed corpus store (the 10^10-row
    # scale path: per-worker lazy bucket loads + LRU, stages/fetch.py).
    bucketed_corpus = os.path.isdir(corpus_path)
    if not bucketed_corpus and corpus_ref is None:
        import pyarrow.parquet as pq

        corpus_ref = ray.put(pq.read_table(corpus_path))

    # staging→publish protocol (E:137-183 analog): waves spool under
    # _staging/run_<id>/; the PUBLISHED pointer flips only when this call
    # returns, so readers never observe a partial run (tableio.publish_run)
    run_id, data_root = tableio.begin_run(out_dir, resume=cfg.resume)

    start_wave = 0
    frontier = None
    metrics: list[dict] = []
    if cfg.resume:
        last = tableio.latest_checkpoint(out_dir)
        if last is not None:
            manifest, fdir, seen_parts, pol_states = tableio.read_checkpoint(out_dir, last)
            frontier = (
                rd.read_parquet(fdir).materialize()
                if fdir
                else rd.from_arrow(FRONTIER_SCHEMA.empty_table())
            )
            seen.restore(seen_parts)
            politeness.restore(pol_states)
            start_wave = last + 1
            metrics = list(manifest["metrics"])
    if frontier is None:
        frontier = prepare_frontier(seeds).materialize()

    import pyarrow.compute as pc

    counter = _WaveState.remote()
    wave_no = start_wave
    while wave_no < cfg.max_waves:
        t0 = time.time()
        if frontier.count() == 0:  # metadata-only on a materialized dataset
            break
        ray.get(counter.reset.remote(wave_no))

        # ---- 1-3. selection + grant, fully distributed ---------------------
        # ONE round runs: frontier-wide sort+limit shuffle → per-block
        # keep-first dedup → host-bucketed grant shuffle (robots, seen
        # admission, per-host rank-vs-budget, politeness reservation, seen
        # insert — all inside the reduce tasks). The driver never holds a
        # wave row; it receives only the per-bucket counters and the wave's
        # url_hash set (8 B/row) from the wave-state actor.
        def _block_dedup(b: pa.Table) -> pa.Table:
            if b.num_rows < 2:
                return b
            h = b["url_hash"].to_numpy(zero_copy_only=False)
            keep = ~pd.Series(h).duplicated().to_numpy()
            return b if keep.all() else b.filter(pa.array(keep))

        sel = (
            frontier.sort(["priority", "seed_rank"], descending=[True, False])
            .limit(cfg.wave_size)
            .map_batches(_block_dedup, batch_format="pyarrow")
        )
        wave_all = _grant_stage(
            sel, seen, politeness, cfg.host_budget, wave_no, counter,
            robots_store=robots_store,
        ).materialize()
        counters = ray.get(counter.grant_totals.remote())
        n_granted = counters["granted"]
        wave_hashes = np.sort(
            np.frombuffer(ray.get(counter.wave_hashes.remote()), dtype=np.uint64)
        )
        # lazy deletion: every frontier row sharing a wave hash is dropped
        rest = _filter_not_in(frontier, ray.put(wave_hashes))
        t_sort = time.time() - t0
        t_grant = 0.0  # grant now rides the selection round

        def _granted_rows(b: pa.Table) -> pa.Table:
            return b.filter(b["granted"]).drop_columns(["granted"])

        def _denied_rows(b: pa.Table) -> pa.Table:
            return (
                b.filter(pc.invert(b["granted"]))
                .select(FRONTIER_COLS)
                .cast(FRONTIER_SCHEMA)
            )

        # ---- 4. data plane: fetch + decode (actor pool), spool wave --------
        links_ds = None
        n_discovered = 0
        ok_n = 0
        t_fetch = t_write = t_links = 0.0
        t1 = time.time()
        if n_granted:
            # fused streaming pass (task-form): fetch+decode each batch, spool
            # it straight to its own parquet part in the wave dir, and emit
            # ONLY the link rows — the 30 KB/row payloads never enter the
            # object store (see stages/fetch.py::fetch_write_links_fn)
            wdir = tableio.wave_data_dir(data_root, wave_no)
            if os.path.isdir(wdir):  # uncommitted partial from a crashed run
                shutil.rmtree(wdir)
            os.makedirs(wdir, exist_ok=True)
            n_blocks = max(1, n_granted // cfg.fetch_batch_size)
            stage_fn = (
                fetch_write_links_bucketed_fn(corpus_path, wdir, cfg.max_depth)
                if bucketed_corpus
                else fetch_write_links_fn(corpus_ref, wdir, cfg.max_depth)
            )
            granted_ds = wave_all.map_batches(_granted_rows, batch_format="pyarrow")
            if n_granted <= 2 * cfg.fetch_batch_size:
                # tail wave: coalesce the grant buckets to one block, then
                # fetch → in-task global dedup, all LAZY so the whole tail
                # wave (fetch+dedup+union) executes in ONE materialize round
                # with the frontier update below (each extra round costs
                # ~1 s of pure scheduling)
                links_ds = _fused_small_wave(
                    granted_ds.repartition(1), stage_fn, seen, counter, wave_no
                )
            else:
                raw_links = (
                    granted_ds.repartition(min(n_blocks, 4 * cfg.fetch_concurrency))
                    .map_batches(
                        stage_fn,
                        batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    )
                )
                # materialize the fetch output (side effect executes exactly
                # once, link rows stay in the object store): feeding the
                # fetch straight into an all-to-all lets that operator's
                # resource reservation throttle the fetch stage (measured
                # 2.5× wave slowdown at 4 CPUs). The dedup shuffle itself is
                # left LAZY — it executes inside the frontier-union round
                # below, saving a whole materialize round per steady wave.
                raw_links = raw_links.materialize()
                links_ds = _links_dedup_seen(
                    raw_links, seen, counter=counter, wave_no=wave_no
                )
            t_fetch = time.time() - t1

        # ---- 6. frontier update: rest ∪ denied ∪ links (no dedup shuffle —
        # lazy-deletion PQ; duplicates resolve at a later wave's selection).
        # ONE materialize round executes the rest-filter, the links dedup
        # shuffle (and for tail waves the fetch itself) concurrently. --------
        t1 = time.time()
        new_frontier = rest
        if counters["denied"]:
            new_frontier = new_frontier.union(
                wave_all.map_batches(_denied_rows, batch_format="pyarrow")
            )
        if links_ds is not None:
            new_frontier = new_frontier.union(links_ds)
        frontier = new_frontier.materialize()
        t_union_s = time.time() - t1

        if n_granted:
            # all link-dedup reduce tasks have reported (they block on the
            # report RPC before completing, and materialize() returned)
            n_discovered = ray.get(counter.links_total.remote())
            t1b = time.time()
            # column-pruned status scan of the spooled wave (metrics only)
            ok_n = count_status(wdir, 200)
            # A6 count reconciliation (the reference cross-checks the
            # Mendeley-Count total against what it indexed,
            # M/MendeleyPager.java:121-122, README.md:32-49): every granted
            # row must have been spooled exactly once
            spooled = count_rows(wdir)
            if spooled != n_granted:
                import logging

                logging.getLogger(__name__).warning(
                    "wave %d count mismatch: granted=%d spooled=%d",
                    wave_no, n_granted, spooled,
                )
            t_write = time.time() - t1b

        t_links = t_write  # discovery now fused into the fetch pass
        # block-count guard for long crawls: every wave appends rest blocks
        # + denied + link blocks, so a many-wave run accretes hundreds of
        # tiny blocks and the per-wave sort's task count grows with wave
        # number instead of data size. Compact (cheap coalesce, no shuffle
        # semantics — the wave sort re-orders anyway) when it runs away.
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        if frontier.num_blocks() > max(64, 4 * n_cpus):
            frontier = frontier.repartition(max(16, 2 * n_cpus)).materialize()

        m = dict(
            wave=wave_no,
            **counters,
            fetched_ok=ok_n,
            spooled=spooled if n_granted else 0,
            count_match=bool(spooled == n_granted) if n_granted else True,
            discovered=n_discovered,
            frontier_after=frontier.count(),
            seen_size=seen.size(),
            duration_s=round(time.time() - t0, 3),
            t_sort=round(t_sort, 3),
            t_grant=round(t_grant, 3),
            t_fetch=round(t_fetch, 3),
            t_write=round(t_write, 3),
            t_links=round(t_links, 3),
            t_union=round(t_union_s, 3),
        )
        metrics.append(m)

        # lineage/metrics side table (A6; north-rule "lineage + fetch
        # metrics"): one row per wave, append-only, readable as one dataset
        import pyarrow.parquet as _pq

        mdir = os.path.join(out_dir, "metrics")
        os.makedirs(mdir, exist_ok=True)
        _pq.write_table(
            pa.Table.from_pylist([{k: (float(v) if isinstance(v, float) else v) for k, v in m.items()}]),
            os.path.join(mdir, f"wave_{wave_no:05d}.parquet"),
        )

        # ---- 7. checkpoint + commit ---------------------------------------
        if cfg.checkpoint:
            fdir = tableio.frontier_dir(out_dir, wave_no)
            if os.path.isdir(fdir):
                shutil.rmtree(fdir)
            if m["frontier_after"] > 0:
                frontier.write_parquet(fdir)
            tableio.commit_wave(
                out_dir, wave_no, seen.snapshot(), politeness.snapshot(), metrics
            )
        wave_no += 1
        if m["frontier_after"] == 0:
            break

    # the run completed (frontier exhausted or wave budget reached): flip
    # the published pointer and clean up superseded staging runs
    tableio.publish_run(out_dir, run_id, wave_no)

    return {
        "out_dir": out_dir,
        "n_waves": wave_no - start_wave,
        "metrics": metrics,
        "seen_size": seen.size(),
        "run_id": run_id,
        # contract: ≤ one robots.txt fetch per distinct host per run
        "robots_fetches": ray.get(robots_store.n_fetches.remote()),
    }


def read_fetched(out_dir: str) -> rd.Dataset:
    """All fetched rows across waves of the PUBLISHED run (the crawl's
    product). Resolves through PUBLISHED.json, so an in-flight or crashed
    run's staging output is invisible; falls back to the legacy flat layout
    when no pointer exists."""
    import glob

    rid = tableio.published_run(out_dir)
    root = tableio.run_dir(out_dir, rid) if rid is not None else out_dir
    files = sorted(glob.glob(os.path.join(root, "wave=*", "*.parquet")))
    return rd.read_parquet(files)
