"""TableIO — the checkpoint/commit storage seam (SURVEY.md §7.5, K4).

Production target is Lance (versioned tables, manifest pointer flip); the
sandbox has no lance wheel, so the same protocol is implemented over Parquet
directories:

  - every wave writes its state under ``state/wave_<n>/`` (frontier parquet,
    seen-set shard parquets, politeness counters json),
  - a ``MANIFEST.json`` is written to a temp name and atomically renamed LAST
    — the commit point (analog of the reference's staging-index + alias swap,
    E:137-183; rollback = absence of the manifest, so a crashed wave's partial
    state is invisible, like M/ElasticSearchIndexHandler.java:240-242),
  - resume = read the highest committed manifest and reload its state.

Output data lays out as ``out/_staging/run_<id>/wave=<n>/*.parquet`` — one
directory per wave so a resumed run skips finished waves (resumable-output
requirement); a completed run atomically flips ``out/PUBLISHED.json`` to its
run id and removes superseded runs (see the run-level publish section below),
so readers never observe a partial run.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "MANIFEST.json"


def wave_state_dir(out_dir: str, wave: int) -> str:
    # no '=' in state paths: hive-partition inference would inject a bogus
    # 'wave' column when the frontier parquet is read back on resume
    return os.path.join(out_dir, "state", f"wave_{wave}")


def wave_data_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, f"wave={wave}")


def frontier_dir(out_dir: str, wave: int) -> str:
    return os.path.join(wave_state_dir(out_dir, wave), "frontier")


def commit_wave(
    out_dir: str,
    wave: int,
    seen_parts: list[np.ndarray],
    politeness_states: list[dict],
    metrics: list[dict],
) -> None:
    """Commit a wave: the frontier parquet must already sit under
    ``frontier_dir(out_dir, wave)`` (written by the Dataset itself — the
    frontier is the one unbounded table and never funnels through the driver).
    The manifest rename below is the atomic commit point."""
    d = wave_state_dir(out_dir, wave)
    os.makedirs(d, exist_ok=True)
    for i, part in enumerate(seen_parts):
        pq.write_table(
            pa.table({"url_hash": pa.array(np.sort(part), pa.uint64())}),
            os.path.join(d, f"seen_shard={i}.parquet"),
        )
    with open(os.path.join(d, "politeness.json"), "w") as f:
        json.dump(politeness_states, f)
    manifest = {
        "wave": wave,
        "n_seen_shards": len(seen_parts),
        "n_politeness_shards": len(politeness_states),
        "metrics": metrics,
    }
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, MANIFEST))  # atomic commit point


def latest_checkpoint(out_dir: str) -> int | None:
    state = os.path.join(out_dir, "state")
    if not os.path.isdir(state):
        return None
    waves = []
    for name in os.listdir(state):
        if name.startswith("wave_") and os.path.exists(os.path.join(state, name, MANIFEST)):
            waves.append(int(name.removeprefix("wave_")))
    return max(waves) if waves else None


def read_checkpoint(out_dir: str, wave: int):
    d = wave_state_dir(out_dir, wave)
    with open(os.path.join(d, MANIFEST)) as f:
        manifest = json.load(f)
    fdir = frontier_dir(out_dir, wave)
    has_frontier = os.path.isdir(fdir) and any(
        f.endswith(".parquet") for f in os.listdir(fdir)
    )
    seen_parts = [
        pq.read_table(os.path.join(d, f"seen_shard={i}.parquet"))["url_hash"]
        .to_numpy()
        .astype(np.uint64)
        for i in range(manifest["n_seen_shards"])
    ]
    with open(os.path.join(d, "politeness.json")) as f:
        politeness_states = json.load(f)
    return manifest, (fdir if has_frontier else None), seen_parts, politeness_states


# --------------------------------------------------------------------------
# Keyed upsert sink — K2/K3 analog (the reference's ES bulk index with
# _id = document.id last-write-wins, M/ElasticSearchIndexHandler.java:200-232;
# C/ContentTypeCrawler.java:113-135). A bucketed Parquet table keyed on a
# column: hash-partitioned into B bucket files, upsert = per-bucket merge
# keeping the LAST write per key, written to a temp file and renamed
# (atomic per bucket, idempotent on replay).
# --------------------------------------------------------------------------


def _bucket_path(table_dir: str, bucket: int) -> str:
    return os.path.join(table_dir, f"bucket_{bucket:04d}.parquet")


def _bucket_ids_of(new_rows: pa.Table, key: str, n_buckets: int) -> np.ndarray:
    from ..functions.hashing import hash64_array

    kcol = new_rows[key]
    if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
        hashes = hash64_array(kcol)
    else:
        hashes = kcol.to_numpy(zero_copy_only=False).astype(np.uint64)
    return (hashes % np.uint64(n_buckets)).astype(np.int64)


def _merge_bucket(part: pa.Table, path: str, key: str) -> int:
    """Merge this call's rows for one bucket into its file (last-write-wins
    by row order within ``part``); atomic tmp+rename, idempotent on replay."""
    if os.path.exists(path):
        merged = pa.concat_tables([pq.read_table(path), part], promote_options="default")
    else:
        merged = part
    df = merged.to_pandas().drop_duplicates(key, keep="last")
    out = pa.Table.from_pandas(df, preserve_index=False).cast(merged.schema)
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return out.num_rows


def upsert_parquet(new_rows: pa.Table, table_dir: str, key: str, n_buckets: int = 16) -> None:
    """Merge-on-key upsert: later rows (within this call, input order) and this
    call's rows (vs existing) win. Per-bucket merges run as parallel Ray tasks
    over a bucket-id Dataset (each task touches exactly one bucket file, so
    they never contend); sequential fallback outside a Ray session.

    ``n_buckets`` is a persistent table-layout parameter (every upsert against
    a table must reuse the count it was created with — bucket files are keyed
    by ``hash % n_buckets``), NOT a transient shuffle knob; it must not float
    with cluster size the way runtime.n_buckets_for counts do."""
    import ray

    os.makedirs(table_dir, exist_ok=True)
    if new_rows.num_rows == 0:
        return
    buckets = _bucket_ids_of(new_rows, key, n_buckets)
    present = [int(b) for b in np.unique(buckets)]
    if not ray.is_initialized() or len(present) == 1:
        for b in present:
            part = new_rows.filter(pa.array(buckets == b))
            _merge_bucket(part, _bucket_path(table_dir, b), key)
        return

    # pre-split per bucket on the caller and ship each slice as its own task
    # argument: every merge task receives ONLY its bucket's rows (previously
    # the whole call batch was ray.put once and re-filtered in B tasks).
    # Raw tasks (not a Dataset) — one task per bucket FILE, a mutable-sink
    # shape the Dataset API doesn't express.
    merge_task = ray.remote(num_cpus=1)(_merge_bucket)
    ray.get(
        [
            merge_task.remote(
                new_rows.filter(pa.array(buckets == b)), _bucket_path(table_dir, b), key
            )
            for b in present
        ]
    )


def read_upsert_table(table_dir: str) -> pa.Table:
    files = sorted(
        os.path.join(table_dir, f) for f in os.listdir(table_dir) if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")


# --------------------------------------------------------------------------
# Run-level publish — the reference's staging-index + alias-swap + old-index
# cleanup (E:137-183): a run writes its wave output under
# ``out/_staging/run_<id>/wave=<n>/``; only a COMPLETED run flips the
# ``PUBLISHED.json`` pointer (tmp + atomic rename) and then removes stale
# run dirs. Readers resolve through the pointer, so a crashed/in-flight run
# is never observable — they keep seeing the previous published run.
# --------------------------------------------------------------------------

PUBLISHED = "PUBLISHED.json"
_CURRENT = "CURRENT"


def staging_root(out_dir: str) -> str:
    return os.path.join(out_dir, "_staging")


def run_dir(out_dir: str, run_id: int) -> str:
    return os.path.join(staging_root(out_dir), f"run_{run_id:04d}")


def begin_run(out_dir: str, resume: bool = False) -> tuple[int, str]:
    """Allocate a fresh staging run dir (or re-enter the in-flight one when
    resuming); records the in-flight id in ``_staging/CURRENT``."""
    root = staging_root(out_dir)
    os.makedirs(root, exist_ok=True)
    cur = os.path.join(root, _CURRENT)
    if resume and os.path.exists(cur):
        with open(cur) as f:
            rid = int(f.read().strip())
    else:
        existing = [
            int(n.removeprefix("run_"))
            for n in os.listdir(root)
            if n.startswith("run_")
        ]
        rid = max(existing, default=-1) + 1
        tmp = cur + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(rid))
        os.replace(tmp, cur)
    d = run_dir(out_dir, rid)
    os.makedirs(d, exist_ok=True)
    return rid, d


def publish_run(out_dir: str, run_id: int, n_waves: int | None = None) -> None:
    """Atomic staging→publish flip, then old-run cleanup (E:146-183).
    ``n_waves`` is recorded when the publisher has one (the crawl); pointer
    READERS must treat it as optional — compose runs publish without it.
    This is the ONLY writer of the pointer file (a second writer with a
    divergent payload is a drift hazard — round-3 ADVICE)."""
    import shutil

    payload = {"run": run_id}
    if n_waves is not None:
        payload["n_waves"] = n_waves
    tmp = os.path.join(out_dir, PUBLISHED + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(out_dir, PUBLISHED))  # the alias swap
    root = staging_root(out_dir)
    for name in os.listdir(root):
        if name.startswith("run_") and int(name.removeprefix("run_")) != run_id:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def published_run(out_dir: str) -> int | None:
    path = os.path.join(out_dir, PUBLISHED)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(json.load(f)["run"])
