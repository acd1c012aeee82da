"""Backup / restore — K6/K7 analogs (B/ContentfulBackup.java:98-208,
B/ContentfulRestore.java:46-181).

Backup is a streaming Ray pipeline: a ``map_batches`` stage writes each
batch's binary payloads as content-addressed blobs (``blobs/<blake2b64 of
the BYTES>.bin``) with skip-if-exists — true content addressing makes the
skip safe under re-runs even if an image's bytes changed (the id-hash
naming this replaced would silently keep the stale blob) and dedups
identical payloads. The same stage spools a metadata JSON-lines shard per
batch, named deterministically from the batch's id range so a retried task
overwrites instead of duplicating. No driver-side materialization of the
corpus in either direction.

Restore is the inverse pipeline: metadata shards → Dataset → a blob-fetch
``map_batches`` stage. The reference restores through a global 1 op/s rate
limit (B/ContentfulRestore.java:46); distributed, that is a shared
token-bucket ACTOR every fetch task acquires from — rate stays global no
matter how many workers fetch. The injectable-clock ``RateLimiter`` remains
for the sequential path / tests.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray
import ray.data as rd


class RateLimiter:
    """Token bucket: ``rate`` ops/sec, injectable clock/sleep for tests."""

    def __init__(self, rate: float, clock=None, sleep=None):
        import time

        self.rate = rate
        self._clock = clock or time.monotonic
        self._sleep = sleep if sleep is not None else time.sleep
        self._next_free = self._clock()

    def acquire(self) -> None:
        now = self._clock()
        wait = self._next_free - now
        self._next_free = max(now, self._next_free) + 1.0 / self.rate
        if wait > 0:
            self._sleep(wait)


@ray.remote(num_cpus=0)
class _SharedRateLimiter:
    """Global token bucket for distributed restore: grants ``n`` slots and
    returns how long the caller must sleep so the GLOBAL rate holds."""

    def __init__(self, rate: float):
        import time

        self.rate = rate
        self._next_free = time.monotonic()

    def acquire(self, n: int = 1) -> float:
        import time

        now = time.monotonic()
        start = max(now, self._next_free)
        self._next_free = start + n / self.rate
        return max(0.0, start - now)


def _blob_name(blob: bytes) -> str:
    return hashlib.blake2b(blob, digest_size=8).hexdigest() + ".bin"


def _backup_batch_fn(out_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks are legal in Ray Datasets
            return pa.table(
                {
                    "written": pa.array([0], pa.int64()),
                    "skipped": pa.array([0], pa.int64()),
                    "rows": pa.array([0], pa.int64()),
                }
            )
        blob_dir = os.path.join(out_dir, "blobs")
        os.makedirs(blob_dir, exist_ok=True)
        written = skipped = 0
        lines = []
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        phs = batch["phash"].to_pylist()
        for i, image_id in enumerate(ids):
            blob = blobs[i]
            blob_name = _blob_name(blob)
            blob_path = os.path.join(blob_dir, blob_name)
            if os.path.exists(blob_path):
                skipped += 1  # skip-if-exists (K6) — safe: name IS the content
            else:
                tmp = blob_path + f".tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, blob_path)
                written += 1
            lines.append(
                json.dumps(
                    {
                        "image_id": image_id,
                        "w": ws[i],
                        "h": hs[i],
                        "fmt": fmts[i],
                        "caption": caps[i],
                        "phash": phs[i],
                        "blob": blob_name,
                    },
                    ensure_ascii=False,
                )
            )
        # deterministic shard name from the batch's id range: a retried task
        # REPLACES its shard instead of adding a duplicate (at-least-once)
        shard = hashlib.blake2b(
            (min(ids) + "\x00" + max(ids) + "\x00" + str(len(ids))).encode(),
            digest_size=8,
        ).hexdigest()
        path = os.path.join(out_dir, f"meta_{shard}.jsonl")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
        return pa.table(
            {
                "written": pa.array([written], pa.int64()),
                "skipped": pa.array([skipped], pa.int64()),
                "rows": pa.array([len(ids)], pa.int64()),
            }
        )

    return fn


def backup_corpus(
    corpus: pa.Table | rd.Dataset, out_dir: str, batch_size: int = 256
) -> dict:
    """Streaming backup. Accepts a Dataset (scale path) or an in-memory Table
    (convenience; wrapped, not collected)."""
    os.makedirs(os.path.join(out_dir, "blobs"), exist_ok=True)
    ds = corpus
    if isinstance(corpus, pa.Table):
        nb = max(1, min(8, corpus.num_rows // max(1, batch_size)))
        ds = rd.from_arrow(corpus)
        if nb > 1:
            ds = ds.repartition(nb)
    stats = ds.map_batches(
        _backup_batch_fn(out_dir), batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    return {
        "written": int(stats["written"].sum()),
        "skipped": int(stats["skipped"].sum()),
        "rows": int(stats["rows"].sum()),
    }


def _meta_files(backup_dir: str) -> list[str]:
    return sorted(
        os.path.join(backup_dir, f)
        for f in os.listdir(backup_dir)
        if f.startswith("meta_") and f.endswith(".jsonl")
    )


_RESTORE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def restore_corpus_ds(backup_dir: str, rate: float | None = None) -> rd.Dataset:
    """Distributed restore: metadata shards → blob-fetch stage. ``rate``
    gates ALL fetch tasks through one shared token-bucket actor (global
    ops/sec, like the reference's single-process Guava limiter)."""
    files = _meta_files(backup_dir)
    limiter = _SharedRateLimiter.remote(rate) if rate else None

    def load(batch: pa.Table) -> pa.Table:
        import time

        rows = []
        for path in batch["path"].to_pylist():
            with open(path) as f:
                rows.extend(json.loads(ln) for ln in f if ln.strip())
        rows.sort(key=lambda r: r["image_id"])
        if limiter is not None and rows:
            time.sleep(ray.get(limiter.acquire.remote(len(rows))))
        blobs = []
        for r in rows:
            with open(os.path.join(backup_dir, "blobs", r["blob"]), "rb") as f:
                blobs.append(f.read())
        return pa.Table.from_arrays(
            [
                pa.array([r["image_id"] for r in rows], pa.string()),
                pa.array(blobs, pa.binary()),
                pa.array([r["w"] for r in rows], pa.int32()),
                pa.array([r["h"] for r in rows], pa.int32()),
                pa.array([r["fmt"] for r in rows], pa.string()),
                pa.array([r["caption"] for r in rows], pa.string()),
                pa.array([r["phash"] for r in rows], pa.int64()),
            ],
            schema=_RESTORE_SCHEMA,
        )

    return rd.from_items(
        [{"path": p} for p in files], override_num_blocks=max(1, len(files))
    ).map_batches(load, batch_format="pyarrow", batch_size=1)


def restore_corpus(backup_dir: str, limiter: RateLimiter | None = None) -> pa.Table:
    """Materialized restore (sorted by image_id). With an injected
    ``limiter`` (tests / strict sequential semantics) rows restore in one
    process through it; otherwise the distributed pipeline runs."""
    if limiter is not None:
        rows = []
        for path in _meta_files(backup_dir):
            with open(path) as f:
                rows.extend(json.loads(ln) for ln in f if ln.strip())
        rows.sort(key=lambda r: r["image_id"])
        blobs = []
        for r in rows:
            limiter.acquire()
            with open(os.path.join(backup_dir, "blobs", r["blob"]), "rb") as f:
                blobs.append(f.read())
        return pa.Table.from_arrays(
            [
                pa.array([r["image_id"] for r in rows], pa.string()),
                pa.array(blobs, pa.binary()),
                pa.array([r["w"] for r in rows], pa.int32()),
                pa.array([r["h"] for r in rows], pa.int32()),
                pa.array([r["fmt"] for r in rows], pa.string()),
                pa.array([r["caption"] for r in rows], pa.string()),
                pa.array([r["phash"] for r in rows], pa.int64()),
            ],
            schema=_RESTORE_SCHEMA,
        )
    if not _meta_files(backup_dir):
        return _RESTORE_SCHEMA.empty_table()
    ds = restore_corpus_ds(backup_dir).materialize()
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return _RESTORE_SCHEMA.empty_table()
    out = pa.concat_tables(tables, promote_options="default")
    return out.sort_by("image_id").combine_chunks()
