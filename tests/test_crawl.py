"""Engine-vs-simulator golden equality, resume, and fetch retry semantics."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from content_crawler_ray import simulator
from content_crawler_ray.config import CrawlConfig
from content_crawler_ray.sources import synth

N_CORPUS, N_SEEDS = 100, 200
CFG = dict(
    wave_size=50,
    host_budget=3,
    max_waves=16,
    n_seen_shards=3,
    n_politeness_shards=2,
    fetch_concurrency=2,
    fetch_batch_size=64,
)


@pytest.fixture(scope="module")
def corpus_and_seeds(tmp_path_factory):
    corpus = synth.make_corpus(N_CORPUS)
    seeds = synth.make_seeds(N_SEEDS, N_CORPUS)
    root = tmp_path_factory.mktemp("crawl")
    path = os.path.join(root, "corpus.parquet")
    pq.write_table(corpus, path)
    return corpus, seeds, path, str(root)


@pytest.fixture(scope="module")
def golden(corpus_and_seeds):
    corpus, seeds, _, _ = corpus_and_seeds
    return simulator.simulate(
        seeds, corpus, wave_size=CFG["wave_size"], host_budget=CFG["host_budget"],
        max_waves=CFG["max_waves"],
    )


def _run(corpus_path, seeds, out, **overrides):
    from content_crawler_ray.pipelines import crawl

    cfg = CrawlConfig(**{**CFG, **overrides})
    res = crawl.run_crawl(corpus_path, seeds, out, cfg)
    return res, crawl.read_fetched(out).to_pandas()


def test_engine_matches_simulator(ray_session, corpus_and_seeds, golden):
    corpus, seeds, corpus_path, root = corpus_and_seeds
    out = os.path.join(root, "out_main")
    shutil.rmtree(out, ignore_errors=True)
    res, fetched = _run(corpus_path, seeds, out, checkpoint=False)

    order = sorted(zip(fetched.host, fetched.fetch_seq, fetched.url_hash.astype("uint64").astype(object)))
    assert order == [tuple(x) for x in golden["golden_order"]]
    assert sorted(int(x) for x in fetched.url_hash.astype("uint64")) == golden["golden_seen"]

    ok = fetched[fetched.status == 200]
    assert (ok.psnr >= 40).all()  # decoded-pixel invariant incl. lossy dctq
    assert ok.phash_ok.all()

    simf = pd.DataFrame(golden["golden_fetched"]).sort_values("url_hash").reset_index(drop=True)
    engf = fetched.sort_values("url_hash").reset_index(drop=True)
    assert len(simf) == len(engf)
    for col in ["status", "wave", "fetch_seq", "depth", "caption"]:
        assert simf[col].tolist() == engf[col].tolist(), col

    # ST8 production contract: robots rules fetched from the shared
    # run-wide store — at most ONE fetch per distinct host per run (the
    # host universe is synth.N_HOSTS), not one per (wave × grant bucket)
    assert 0 < res["robots_fetches"] <= synth.N_HOSTS


def test_resume_equals_uninterrupted(ray_session, corpus_and_seeds, golden):
    _, seeds, corpus_path, root = corpus_and_seeds
    out_a = os.path.join(root, "out_resume")
    shutil.rmtree(out_a, ignore_errors=True)
    _run(corpus_path, seeds, out_a, max_waves=4)
    res2, fetched_a = _run(corpus_path, seeds, out_a, resume=True)
    simf = pd.DataFrame(golden["golden_fetched"])
    assert len(fetched_a) == len(simf)
    a = sorted(zip(fetched_a.host, fetched_a.fetch_seq, fetched_a.url_hash.astype("uint64").astype(object)))
    assert a == [tuple(x) for x in golden["golden_order"]]


def test_fetch_retry_504(ray_session, corpus_and_seeds):
    """The reference's 504-only bounded retry (M/MendeleyDocumentCrawler.java:72-87):
    transient failures retry then succeed; persistent ones land status=504 with
    the error recorded, never aborting the run."""
    import ray.data as rd

    from content_crawler_ray.stages.fetch import FetchDecode, TransientFetchError

    corpus, seeds, corpus_path, _ = corpus_and_seeds

    def flaky(image_id, attempts):
        if image_id and image_id.endswith("1") and attempts < 2:
            raise TransientFetchError("synthetic 504")
        if image_id and image_id.endswith("2"):
            raise TransientFetchError("permanent 504")

    batch = pa.table(
        {
            "url": pa.array(
                [f"http://h0.com/p/img-{i:012d}" for i in range(4)], pa.string()
            ),
            "url_hash": pa.array(np.arange(4, dtype=np.uint64), pa.uint64()),
        }
    )
    stage = FetchDecode(corpus_path, flaky=flaky, max_retries=3)
    out = stage(batch)
    st = out["status"].to_pylist()
    assert st[1] == 200  # retried through transient failures
    assert st[2] == 504  # exhausted retries → recorded, not raised
    assert out["error"].to_pylist()[2] == "permanent 504"
    assert st[0] == 200 and st[3] == 200


def test_bucketed_corpus_path_equals_broadcast(ray_session, corpus_and_seeds, golden):
    """The 10^10-scale corpus path (hash-bucketed store, per-worker LRU bucket
    loads) must produce the exact same crawl as the object-store broadcast."""
    import os

    from content_crawler_ray.stages.fetch import write_bucketed_corpus

    corpus, seeds, _, root = corpus_and_seeds
    bdir = os.path.join(root, "corpus_buckets")
    write_bucketed_corpus(corpus, bdir, n_buckets=8)
    out = os.path.join(root, "out_bucketed")
    shutil.rmtree(out, ignore_errors=True)
    _res, fetched = _run(bdir, seeds, out, checkpoint=False)
    order = sorted(
        zip(fetched.host, fetched.fetch_seq, fetched.url_hash.astype("uint64").astype(object))
    )
    assert order == [tuple(x) for x in golden["golden_order"]]
    ok = fetched[fetched.status == 200]
    assert (ok.psnr >= 40).all() and ok.phash_ok.all()


def test_fetch_retry_backoff_delay(ray_session, corpus_and_seeds):
    """Backoff = retryCount × delay on 504 (M/MendeleyDocumentCrawler.java:72-87);
    injectable sleep so the test records, not waits."""
    from content_crawler_ray.stages.fetch import FetchDecode, TransientFetchError

    _, _, corpus_path, _ = corpus_and_seeds
    sleeps: list[float] = []

    def flaky(image_id, attempts):
        if image_id and image_id.endswith("1") and attempts < 2:
            raise TransientFetchError("synthetic 504")

    batch = pa.table(
        {
            "url": pa.array([f"http://h0.com/p/img-{i:012d}" for i in range(2)]),
            "url_hash": pa.array(np.arange(2, dtype=np.uint64), pa.uint64()),
        }
    )
    stage = FetchDecode(
        corpus_path, flaky=flaky, max_retries=3, retry_delay=10.0, sleep=sleeps.append
    )
    out = stage(batch)
    assert out["status"].to_pylist() == [200, 200]
    assert sleeps == [10.0, 20.0]  # 1×t then 2×t, like the reference


def test_spool_part_names_deterministic(ray_session, corpus_and_seeds, tmp_path):
    """A retried fetch task overwrites its spool part (deterministic name
    from the batch's url_hash identity) instead of duplicating rows."""
    import os

    import pyarrow.parquet as pq

    from content_crawler_ray.stages.fetch import fetch_write_links_fn

    corpus, _, corpus_path, _ = corpus_and_seeds
    import ray as _ray

    ref = _ray.put(corpus)
    wdir = str(tmp_path / "w0")
    os.makedirs(wdir)
    fn = fetch_write_links_fn(ref, wdir, max_depth=3)
    batch = pa.table(
        {
            "url": pa.array([f"http://h0.com/p/img-{i:012d}" for i in range(3)]),
            "url_hash": pa.array(np.arange(3, dtype=np.uint64), pa.uint64()),
            "host": pa.array(["h0.com"] * 3),
            "priority": pa.array([1.0] * 3, pa.float32()),
            "depth": pa.array([0] * 3, pa.int32()),
            "seed_rank": pa.array([0, 1, 2], pa.int64()),
            "fetch_seq": pa.array([0, 1, 2], pa.int64()),
            "wave": pa.array([0] * 3, pa.int32()),
        }
    )
    fn(batch)
    fn(batch)  # simulated at-least-once replay of the same task
    parts = [f for f in os.listdir(wdir) if f.endswith(".parquet")]
    assert len(parts) == 1  # overwrote, not appended
    assert pq.read_table(os.path.join(wdir, parts[0])).num_rows == 3


def test_publish_pointer_hides_partial_runs(ray_session, corpus_and_seeds, tmp_path):
    """Staging→publish flip (E:137-183 analog): a completed run publishes
    atomically; a later run that dies between waves leaves the published
    output exactly as it was, and a completed rerun supersedes + cleans up."""
    import os

    from content_crawler_ray.config import CrawlConfig
    from content_crawler_ray.pipelines.crawl import read_fetched, run_crawl
    from content_crawler_ray.sources import tableio

    corpus, seeds, corpus_path, _ = corpus_and_seeds
    out = str(tmp_path / "out")
    cfg = CrawlConfig(
        wave_size=60, host_budget=3, max_waves=20, n_seen_shards=2,
        n_politeness_shards=2, fetch_concurrency=2, fetch_batch_size=64,
        checkpoint=False,
    )
    run_crawl(corpus_path, seeds, out, cfg)
    baseline = read_fetched(out).to_pandas().sort_values("url_hash").reset_index(drop=True)
    assert len(baseline) > 0
    published_before = tableio.published_run(out)

    # simulate a run killed between waves: a fresh staging run dir with a
    # partial wave spool and no publish flip
    rid, droot = tableio.begin_run(out, resume=False)
    assert rid != published_before
    os.makedirs(tableio.wave_data_dir(droot, 0), exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(corpus.slice(0, 1), os.path.join(tableio.wave_data_dir(droot, 0), "part-x.parquet"))

    # readers still resolve the published run — the partial run is invisible
    again = read_fetched(out).to_pandas().sort_values("url_hash").reset_index(drop=True)
    assert again.equals(baseline)

    # a completed rerun publishes a new run id and cleans up stale staging
    res = run_crawl(corpus_path, seeds, out, cfg)
    assert tableio.published_run(out) == res["run_id"]
    final = read_fetched(out).to_pandas().sort_values("url_hash").reset_index(drop=True)
    assert final.equals(baseline)  # same seeds → same product
    runs = [n for n in os.listdir(tableio.staging_root(out)) if n.startswith("run_")]
    assert runs == [f"run_{res['run_id']:04d}"]  # old runs removed


def test_grant_replay_idempotent(ray_session):
    """ADVICE r3 (medium): a Ray replay of a grant_bucket task must reproduce
    the ORIGINAL admission — its own first execution's seen inserts read as
    unseen via the (wave, bucket) tag, so no granted row is lost and no
    previously-denied row is granted with a recycled fetch_seq base."""
    import pyarrow as pa

    from content_crawler_ray.pipelines.crawl import FRONTIER_SCHEMA, _grant_wave
    from content_crawler_ray.state.politeness import Politeness
    from content_crawler_ray.state.robots import RobotsCache
    from content_crawler_ray.state.seen import SeenSet
    from content_crawler_ray.functions.hashing import hash64_array

    n = 40
    urls = pa.array([f"http://h{i % 4}.test/p/{i}" for i in range(n)])
    hashes = hash64_array(urls)
    wave = pa.table(
        {
            "url": urls,
            "url_hash": pa.array(hashes, pa.uint64()),
            "host": pa.array([f"h{i % 4}.test" for i in range(n)]),
            "priority": pa.array([float(i % 7) for i in range(n)], pa.float64()),
            "depth": pa.array([0] * n, pa.int32()),
            "seed_rank": pa.array(list(range(n)), pa.int64()),
        }
    ).cast(FRONTIER_SCHEMA)

    seen = SeenSet.create(2)
    pol = Politeness.create(2)
    # pre-seed some keys as if granted by an earlier wave
    seen.insert(hashes[:5].astype("uint64"))

    first = _grant_wave(wave, seen, pol, RobotsCache(), 3, wave_no=1, bucket=7)
    size_after_first = seen.size()
    replay = _grant_wave(wave, seen, pol, RobotsCache(), 3, wave_no=1, bucket=7)

    for a, b in zip(first[:2], replay[:2]):
        assert a.num_rows == b.num_rows
        assert a.column("url_hash").to_pylist() == b.column("url_hash").to_pylist()
    assert first[0].column("fetch_seq").to_pylist() == replay[0].column("fetch_seq").to_pylist()
    assert first[2] == replay[2]  # counters identical
    assert seen.size() == size_after_first  # replay inserted nothing new
    assert first[0].num_rows > 0 and first[2]["admitted"] < n  # pre-seen excluded

    # the NEXT wave must observe this wave's inserts (tags don't leak forward)
    g_hashes = first[0].column("url_hash").to_numpy(zero_copy_only=False).astype("uint64")
    assert seen.contains_tagged(g_hashes, 2, 7).all()


def test_wavestate_drops_stale_wave_reports(ray_session):
    """ADVICE r3 (low): cross-wave lineage re-execution of a stale wave's lazy
    stage must not write into the current wave's counter slots."""
    import ray as _ray

    from content_crawler_ray.pipelines.crawl import _WaveState

    st = _WaveState.remote()
    _ray.get(st.reset.remote(3))
    _ray.get(st.report_links.remote(3, 0, 10))
    _ray.get(st.report_links.remote(2, 1, 99))  # stale wave-2 replay → dropped
    assert _ray.get(st.links_total.remote()) == 10
    _ray.get(st.report_grant.remote(2, 0, {"granted": 99}, b""))  # stale → dropped
    _ray.get(
        st.report_grant.remote(
            3, 0,
            {"wavefront": 5, "robots_dropped": 0, "admitted": 5, "granted": 4, "denied": 1},
            b"\x00" * 8,
        )
    )
    totals = _ray.get(st.grant_totals.remote())
    assert totals["granted"] == 4 and totals["wavefront"] == 5


def test_hot_host_skew_bounded(ray_session, tmp_path):
    """Round-3 VERDICT #9 (stretch): a Zipf-extreme seed set (90% of URLs on
    ONE host) must neither break golden equality nor create a straggler fetch
    task: per-wave grants per host are capped by host_budget, and every spool
    part (one per fetch task batch) stays within fetch_batch_size rows — the
    hot host's rows are spread across tasks, not fetched by one."""
    import glob

    import pyarrow.parquet as pq_

    from content_crawler_ray import simulator
    from content_crawler_ray.pipelines import crawl
    from content_crawler_ray.sources import synth

    n_corpus = 80
    corpus = synth.make_corpus(n_corpus)
    cpath = str(tmp_path / "corpus.parquet")
    pq_.write_table(corpus, cpath)

    # 90% of seeds on host 0 (synth host index 0), rest spread
    import pyarrow as pa

    rows = []
    for r in range(300):
        hidx = 0 if r % 10 else (r // 10) % 6
        rows.append(
            {
                "url": synth.corpus_url(hidx, r % n_corpus),
                "priority": float((r * 7) % 13),
                "depth": 0,
                "seed_rank": r,
            }
        )
    seeds = pa.Table.from_pylist(rows)

    cfg_kw = dict(wave_size=64, host_budget=4, max_waves=12)
    golden = simulator.simulate(seeds, corpus, **cfg_kw)
    out = str(tmp_path / "out")
    res = crawl.run_crawl(
        cpath, seeds, out,
        CrawlConfig(**cfg_kw, n_seen_shards=2, n_politeness_shards=2,
                    fetch_concurrency=2, fetch_batch_size=16, checkpoint=False),
    )
    f = crawl.read_fetched(out).to_pandas()
    order = sorted(zip(f.host, f.fetch_seq, f.url_hash.astype("uint64").astype(object)))
    assert order == [tuple(x) for x in golden["golden_order"]]

    # per-(wave, host) grants never exceed host_budget — the hot host is
    # budget-bounded each wave no matter how skewed the frontier is
    per = f.groupby(["wave", "host"]).size()
    assert per.max() <= cfg_kw["host_budget"]

    # no straggler spool part: each part is one fetch task batch
    parts = glob.glob(os.path.join(out, "_staging", "run_*", "wave=*", "*.parquet"))
    assert parts
    assert max(pq_.read_metadata(p).num_rows for p in parts) <= 16


def test_hot_host_grant_bucket_balance(ray_session):
    """The module-docstring skew claim (crawl.py:48-50), asserted on the grant
    shuffle itself: a Zipf-extreme frontier (70% of rows on ONE host) makes
    grant-bucket INPUT wildly skewed, but because grants are capped at
    host_budget per host and hosts are spread hash-uniformly over buckets,
    the granted OUTPUT — which is what the expensive fetch stage consumes —
    stays balanced across reduce tasks (no straggler exceeds 3x the median).
    Also: the grant is bucketing-invariant (n_buckets=8 equals n_buckets=1
    row-for-row, fetch_seq included)."""
    import ray as _ray
    import ray.data as rd

    from content_crawler_ray.functions.hashing import hash64_array
    from content_crawler_ray.pipelines.crawl import (
        GRANT_SCHEMA,
        _collect,
        _grant_stage,
        _WaveState,
    )
    from content_crawler_ray.stages.links import FRONTIER_SCHEMA
    from content_crawler_ray.state.politeness import Politeness
    from content_crawler_ray.state.seen import SeenSet

    n = 4000
    hot_n = int(n * 0.7)
    rng = np.random.default_rng(11)
    hosts_idx = np.concatenate(
        [np.zeros(hot_n, dtype=np.int64), rng.integers(1, 64, n - hot_n)]
    )
    urls = pa.array(
        [f"http://host{k}.example.com/p/img-{i:012d}" for i, k in enumerate(hosts_idx)]
    )
    frontier = pa.table(
        {
            "url": urls,
            "url_hash": pa.array(hash64_array(urls), pa.uint64()),
            "host": pa.array([f"host{k}.example.com" for k in hosts_idx]),
            "priority": pa.array(rng.random(n).astype(np.float32), pa.float32()),
            "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            "seed_rank": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        }
    ).cast(FRONTIER_SCHEMA)

    def grant(n_buckets):
        seen = SeenSet.create(2)
        pol = Politeness.create(2)
        state = _WaveState.remote()
        _ray.get(state.reset.remote(0))
        out = _collect(
            _grant_stage(
                rd.from_arrow(frontier), seen, pol, host_budget=4, wave_no=0,
                state=state, n_buckets=n_buckets,
            ),
            GRANT_SCHEMA,
        )
        return out, _ray.get(state.grant_buckets.remote())

    out8, buckets8 = grant(8)
    wavefront = np.array([c["wavefront"] for c in buckets8.values()])
    granted = np.array([c["granted"] for c in buckets8.values()])
    # input IS skewed: the hot host's bucket dwarfs the median reduce input
    assert wavefront.max() >= 5 * np.median(wavefront)
    # output is NOT: granted rows per reduce task stay within 3x the median
    assert granted.max() <= 3 * max(1.0, np.median(granted))

    g8 = out8.filter(out8["granted"]).to_pandas()
    assert (g8.groupby("host").size() <= 4).all()  # per-host budget bound
    assert len(g8) == granted.sum()

    out1, _ = grant(1)
    g1 = out1.filter(out1["granted"]).to_pandas()
    key = ["url_hash", "fetch_seq", "host"]
    a = g8[key].sort_values(key).reset_index(drop=True)
    b = g1[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # bucketing-invariant, fetch_seq too
