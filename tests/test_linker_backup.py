"""A3 reverse-link merge-write and K6/K7 backup/restore."""

import pyarrow as pa

from content_crawler_ray.pipelines.backup import RateLimiter, backup_corpus, restore_corpus
from content_crawler_ray.pipelines.linker import merge_links_into_table
from content_crawler_ray.sources import synth
from content_crawler_ray.sources.tableio import read_upsert_table


def test_reverse_link_merge(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "targets")
    links1 = rd.from_arrow(
        pa.table(
            {
                "target_id": pa.array(["n1", "n1", "n2", "n1"], pa.string()),
                "tag_field": pa.array(["articleTag"] * 4, pa.string()),
                "source_id": pa.array(["a3", "a1", "a2", "a1"], pa.string()),
            }
        )
    )
    merge_links_into_table(links1, d)
    out = read_upsert_table(d).to_pandas().set_index(["target_id", "tag_field"])
    assert out.loc[("n1", "articleTag"), "sources"] == "a1,a3"
    assert out.loc[("n2", "articleTag"), "sources"] == "a2"

    # second pass: new source for n1, replay of a1 (idempotent union)
    links2 = rd.from_arrow(
        pa.table(
            {
                "target_id": pa.array(["n1", "n1"], pa.string()),
                "tag_field": pa.array(["articleTag", "newsTag"], pa.string()),
                "source_id": pa.array(["a9", "a1"], pa.string()),
            }
        )
    )
    merge_links_into_table(links2, d)
    out = read_upsert_table(d).to_pandas().set_index(["target_id", "tag_field"])
    assert out.loc[("n1", "articleTag"), "sources"] == "a1,a3,a9"
    assert out.loc[("n1", "newsTag"), "sources"] == "a1"
    assert out.loc[("n2", "articleTag"), "sources"] == "a2"


def test_backup_restore_roundtrip(ray_session, tmp_path):
    corpus = synth.make_corpus(30)
    d = str(tmp_path / "bk")
    r1 = backup_corpus(corpus, d)
    assert r1["written"] == 30 and r1["skipped"] == 0
    r2 = backup_corpus(corpus, d)  # re-run: all blobs skip-if-exists
    assert r2["written"] == 0 and r2["skipped"] == 30

    sleeps = []
    limiter = RateLimiter(1000.0, clock=lambda: 0.0, sleep=sleeps.append)
    restored = restore_corpus(d, limiter)
    assert restored.num_rows == 30
    a = corpus.sort_by("image_id").to_pydict()
    b = restored.sort_by("image_id").to_pydict()
    assert a == b
    assert len(sleeps) > 0  # limiter engaged (fake clock, no real sleeping)


def test_rate_limiter_spacing():
    t = {"now": 0.0}
    waits = []
    rl = RateLimiter(2.0, clock=lambda: t["now"], sleep=waits.append)
    rl.acquire()  # immediate
    rl.acquire()  # must wait 0.5
    rl.acquire()  # must wait 1.0
    assert waits == [0.5, 1.0]


def test_compose_fanout_two_sinks_and_rollback(ray_session, tmp_path):
    """ComposeHandler analog (M/ComposeHandler.java:28-75): ONE materialized
    fetch intermediate feeds an upsert-table sink AND a backup-dir sink; the
    publish pointer flips only when BOTH succeed. A failing sink leaves the
    staged run unpublished (rollback = absence of the flip)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from content_crawler_ray.pipelines.compose import (
        fan_out,
        published_sink_dir,
        sink_backup,
        sink_parquet,
        sink_upsert,
    )
    from content_crawler_ray.sources.tableio import read_upsert_table

    n = 40
    fetched = pa.table(
        {
            "image_id": pa.array([f"img-{i:03d}" for i in range(n)], pa.string()),
            "bytes": pa.array([bytes([i % 251]) * 64 for i in range(n)], pa.binary()),
            "w": pa.array(np.full(n, 8), pa.int64()),
            "h": pa.array(np.full(n, 8), pa.int64()),
            "fmt": pa.array(["raw"] * n, pa.string()),
            "caption": pa.array([f"cap {i}" for i in range(n)], pa.string()),
            "phash": pa.array(np.arange(n), pa.int64()),
        }
    )
    out = str(tmp_path / "fanout")
    ds = rd.from_arrow(fetched)

    res = fan_out(
        ds,
        {"table": sink_upsert(key="image_id"), "backup": sink_backup()},
        out,
    )
    assert res["table"] == n
    assert res["backup"]["written"] == len(set(fetched["bytes"].to_pylist()))

    tdir = published_sink_dir(out, "table")
    bdir = published_sink_dir(out, "backup")
    assert tdir and bdir
    got = read_upsert_table(tdir).to_pandas()
    assert len(got) == n and set(got.image_id) == set(fetched["image_id"].to_pylist())
    blobs = os.listdir(os.path.join(bdir, "blobs"))
    assert len(blobs) == res["backup"]["written"]

    # --- rollback: second run where one sink raises ------------------------
    def bad_sink(ds, sink_dir):
        raise RuntimeError("sink blew up")

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        fan_out(ds, {"table": sink_parquet(), "boom": bad_sink}, out)

    # pointer still names run 0: the failed run is staged but invisible
    assert published_sink_dir(out, "table") == tdir
    assert read_upsert_table(tdir).num_rows == n


def test_registry_phase_spool_reread_idempotent(ray_session, tmp_path):
    """Registry pass re-reads the published spool (M/MendeleyDocumentCrawler
    .java:140-150): every fetched host gets the collect-set of its fetched
    url_hashes; a replay of the phase changes nothing (idempotent merge)."""
    import pyarrow.parquet as pq

    from content_crawler_ray.config import CrawlConfig
    from content_crawler_ray.pipelines import crawl
    from content_crawler_ray.pipelines.linker import registry_update_from_spool
    from content_crawler_ray.sources import synth
    from content_crawler_ray.sources.tableio import read_upsert_table

    corpus = synth.make_corpus(60)
    seeds = synth.make_seeds(120, 60)
    cpath = str(tmp_path / "corpus.parquet")
    pq.write_table(corpus, cpath)
    out = str(tmp_path / "out")
    crawl.run_crawl(cpath, seeds, out, CrawlConfig(
        wave_size=40, host_budget=3, max_waves=6, n_seen_shards=2,
        n_politeness_shards=2, fetch_concurrency=2, fetch_batch_size=32))

    reg = str(tmp_path / "registry")
    n = registry_update_from_spool(out, reg)
    fetched = crawl.read_fetched(out).to_pandas()
    assert n == len(fetched) > 0

    got = read_upsert_table(reg).to_pandas()
    exp = (
        fetched.assign(src=fetched.url_hash.astype("uint64").astype(str))
        .groupby("host")["src"]
        .apply(lambda c: ",".join(sorted(set(c))))
    )
    assert set(got.target_id) == set(exp.index)
    for _, row in got.iterrows():
        assert row.sources == exp[row.target_id]

    registry_update_from_spool(out, reg)  # replay
    again = read_upsert_table(reg).to_pandas()
    assert again.sort_values(["target_id"]).reset_index(drop=True).equals(
        got.sort_values(["target_id"]).reset_index(drop=True)
    )
