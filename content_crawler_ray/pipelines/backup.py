"""Backup / restore — K6/K7 analogs (B/ContentfulBackup.java:98-208,
B/ContentfulRestore.java:46-181).

Backup: corpus metadata as JSON lines partitioned by hash bucket, binary
payloads content-addressed (``blobs/<hash64>.bin``) with skip-if-exists
(the reference's asset-download skip, B/ContentfulBackup.java:180-194) —
re-running a backup downloads only new blobs.

Restore: reads the JSON metadata + blobs back into an Arrow table through a
token-bucket rate limiter (the reference restores at 1 op/s,
B/ContentfulRestore.java:46; here the limiter takes an injectable clock so
tests don't sleep) and an exists-check against the destination keyed table.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..functions.hashing import hash64_scalar


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


def backup_corpus(corpus: pa.Table, out_dir: str, n_buckets: int = 8) -> dict:
    """Write metadata JSON-lines per bucket + content-addressed blobs."""
    os.makedirs(os.path.join(out_dir, "blobs"), exist_ok=True)
    metas: dict[int, list[str]] = {}
    written = skipped = 0
    ids = corpus["image_id"].to_pylist()
    blobs = corpus["bytes"].to_pylist()
    for i, image_id in enumerate(ids):
        blob = blobs[i]
        bh = hash64_scalar(image_id)
        blob_name = f"{bh:016x}.bin"
        blob_path = os.path.join(out_dir, "blobs", blob_name)
        if os.path.exists(blob_path):
            skipped += 1  # skip-if-exists (K6)
        else:
            tmp = blob_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, blob_path)
            written += 1
        meta = {
            "image_id": image_id,
            "w": corpus["w"][i].as_py(),
            "h": corpus["h"][i].as_py(),
            "fmt": corpus["fmt"][i].as_py(),
            "caption": corpus["caption"][i].as_py(),
            "phash": corpus["phash"][i].as_py(),
            "blob": blob_name,
        }
        metas.setdefault(bh % n_buckets, []).append(json.dumps(meta, ensure_ascii=False))
    for b, lines in metas.items():
        path = os.path.join(out_dir, f"meta_{b:04d}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return {"written": written, "skipped": skipped, "buckets": len(metas)}


def restore_corpus(backup_dir: str, limiter: RateLimiter | None = None) -> pa.Table:
    """Inverse of backup_corpus; each restored row passes the rate limiter."""
    rows = []
    for name in sorted(os.listdir(backup_dir)):
        if not name.startswith("meta_"):
            continue
        with open(os.path.join(backup_dir, name)) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
    rows.sort(key=lambda r: r["image_id"])
    blobs = []
    for r in rows:
        if limiter is not None:
            limiter.acquire()
        with open(os.path.join(backup_dir, "blobs", r["blob"]), "rb") as f:
            blobs.append(f.read())
    return pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        }
    )
