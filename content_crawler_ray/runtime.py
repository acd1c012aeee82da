"""Cluster-size-aware runtime knobs shared by every bucketed shuffle.

Every grouped combine in this repo shuffles on a hash BUCKET of the real key
and processes one bucket per reduce task (pipelines/agg.py rationale). A
FIXED bucket count makes each bucket 1/n of the dataset in ONE task's
memory — fine at sf0.1, wrong at 100× (round-3 VERDICT "What's wrong #1").
``n_buckets_for`` derives the count from the cluster size (and, when known,
the row count), so reduce-task memory stays bounded as the cluster and the
data grow together.
"""

from __future__ import annotations

import logging
import os

import ray

log = logging.getLogger(__name__)


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs (the local machine's count when Ray is down)."""
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return os.cpu_count() or default


def n_buckets_for(
    rows: int | None = None,
    floor: int = 16,
    per_cpu: int = 2,
    rows_per_bucket: int = 250_000,
) -> int:
    """Shuffle-bucket count for a bucketed groupby("_b") combine.

    max(floor, per_cpu × cluster_cpus) so every core has reduce work and the
    count rises with cluster size; when the input row count is known it is
    additionally raised so the EXPECTED bucket stays under ``rows_per_bucket``
    rows (each bucket is one task's pandas working set). Keys never straddle
    buckets (bucket = f(key)), so the result is invariant to this count.
    """
    n = max(floor, per_cpu * cluster_cpus())
    if rows is not None and rows > 0:
        n = max(n, -(-rows // rows_per_bucket))
    return n


@ray.remote(num_cpus=0)
class SkipCounter:
    """Exact ledger of LSH band buckets skipped by the MAX_BUCKET hot guard
    (pipelines/hamming.py, pipelines/dedup.py). Reports are keyed by
    (stage, shuffle-bucket) and OVERWRITE that slot — the _WaveState pattern
    (crawl.py) — so a replayed reduce task re-reports the same deterministic
    numbers into the same slot instead of double-counting.
    """

    def __init__(self):
        self.slots: dict[tuple, tuple[int, int]] = {}

    def report(self, where: str, slot: int, buckets: int, rows: int) -> None:
        self.slots[(where, slot)] = (int(buckets), int(rows))

    def totals(self) -> dict:
        return {
            "skipped_buckets": sum(b for b, _ in self.slots.values()),
            "skipped_rows": sum(r for _, r in self.slots.values()),
        }


def report_skips(
    skip_counter, n_buckets: int, n_rows: int, where: str, slot: int = 0
) -> None:
    """Log (and optionally count) hot-bucket skips from inside a reduce task.
    A silent cap reads as full coverage — every skip must leave a trace.
    ``slot`` is the reduce task's shuffle-bucket id: the grant is
    deterministic per bucket, so an overwrite per (where, slot) makes the
    counter replay-exact."""
    if not n_buckets:
        return
    log.warning(
        "%s: skipped %d hot LSH bucket(s) (%d candidate rows) over MAX_BUCKET",
        where,
        n_buckets,
        n_rows,
    )
    if skip_counter is not None:
        ray.get(skip_counter.report.remote(where, int(slot), n_buckets, n_rows))



def read_docs_split(docs_path: str, columns: list[str]):
    """Column-pruned parquet read with a row-count-derived block count for
    small inputs (shared by the dedup pipelines and curate's stage A).

    Two failure modes this guards (both measured, BASELINE.md round-5
    per-op scaling):
      - Ray splits even a sub-MB file into 64+ blocks; with sort rounds
        downstream, per-task fixed overhead then dominates (2x at sf0.1).
      - A cpus-matched block count turns intra-file row-group skew into
        straggler wall (16 tasks of 10.2-24.2 s at 300k docs / 16 CPUs,
        the straggler = the wall). ~4 blocks/cpu lets the scheduler level
        the skew; a ~2.5k-row floor keeps per-task fixed costs amortized.
    Inputs >= cpus x 32 MB keep Ray's native size-based splitting - at
    cluster scale the override must not fire."""
    import glob as _glob

    import ray.data as rd

    nb = None
    try:
        files = (
            sorted(_glob.glob(os.path.join(docs_path, "*.parquet")))
            if os.path.isdir(docs_path)
            else [docs_path]
        )
        sz = sum(os.path.getsize(f) for f in files)
    except OSError:
        files, sz = [], None
    if sz is not None and ray.is_initialized():
        cpus = cluster_cpus()
        if sz < cpus * (32 << 20):
            try:
                import pyarrow.parquet as pq

                rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            except Exception:
                rows = None
            if rows is not None:
                nb = max(8, min(4 * cpus, rows // 2500))
            else:
                nb = max(8, min(cpus, 64))
    return rd.read_parquet(docs_path, columns=columns, override_num_blocks=nb)

from contextlib import contextmanager  # noqa: E402


@contextmanager
def no_op_reservation():
    """Scope that builds datasets with the streaming executor's per-operator
    resource reservation DISABLED.

    Ray 2.49's ReservationOpResourceAllocator splits the cluster between all
    eligible operators of a plan; in a multi-barrier plan (e.g. the MinHash
    pipeline's three Sort rounds) the ONLY runnable upstream map gets ~1/n_ops
    of the CPUs even though every other operator is blocked on its barrier —
    measured 37.5 s → 8.2 s (identical output) on minhash over 100k docs at
    16 CPUs (BASELINE.md round-5 per-op scaling). Barrier-dominated plans
    have at most one runnable map stage at a time, so free competition is
    safe there. The DataContext is captured per-dataset at CREATION time, so
    this scope affects exactly the datasets built inside it and nothing else
    in the session.
    """
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        ctx.op_resource_reservation_enabled = prev
