"""Fetch + decode stage — the engine's analog of the reference's page fetch
(S1 M/MendeleyPager.java:102-130) fused with response handling, over zero-copy
Arrow batches.

"Network" = lookup of the URL's ``img-<n>`` tail against the corpus table
(SURVEY.md J6). The corpus ships as ONE object-store broadcast (``ray.put``
on the driver, zero-copy ``ray.get`` per worker — Arrow buffers live in
plasma, shared across all workers on a node) and is memoized per WORKER
PROCESS in a module-level cache. The stage therefore runs as plain
``map_batches`` **tasks**, not an actor pool: Ray reuses worker processes
across waves, so the id→row index is built once per worker for the whole
crawl, while task scheduling reaches full parallelism instantly (an actor
pool would re-spawn + re-warm per wave and ramp up from 1). This is the
broadcast-join pattern from the Ray Data join guidance; the actor-pool
variant (``FetchDecode`` class below) remains for stages that must hold
non-shareable state (sessions, sockets, GPU handles).

At the 10^10 design point the broadcast becomes a corpus bucketed by
``hash(image_id) % B`` with per-worker lazy bucket loads (or a full hash
join when the probe side is comparable in size) — same batch kernel.

Per 200-row: decode via the pure-numpy codec, PSNR vs the deterministic
original (invariant: ≥ 40 dB for lossy ``dctq``), recompute phash and compare
with the corpus column (``phash_ok``). Retry semantics mirror the reference's
504-only policy (M/MendeleyDocumentCrawler.java:72-87): an injectable
``flaky`` hook raises TransientFetchError; retries up to ``max_retries`` then
records the failure in the ``error`` column (poison rows never abort the run
— SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs

FETCH_MAX_RETRIES = 3
RETRY_DELAY_S = 0.0  # production slot: 10 s (conf/ContentCrawlConfiguration.java:90-93)

# worker-process-local corpus cache: {object-ref bytes: (table, index)}
_WORKER_CORPUS_CACHE: dict = {}


class TransientFetchError(RuntimeError):
    """Analog of the reference's GatewayTimeoutException (504)."""


def _corpus_state(corpus_ref):
    import ray

    key = corpus_ref.binary()
    st = _WORKER_CORPUS_CACHE.get(key)
    if st is None:
        tbl = ray.get(corpus_ref).combine_chunks()  # zero-copy from plasma
        index = {s: i for i, s in enumerate(tbl["image_id"].to_pylist())}
        _WORKER_CORPUS_CACHE.clear()  # hold at most one corpus per worker
        _WORKER_CORPUS_CACHE[key] = st = (tbl, index)
    return st


def fetch_decode_fn(corpus_ref, max_retries: int = FETCH_MAX_RETRIES):
    """Task-form fetch stage: ``map_batches(fetch_decode_fn(ref))``."""

    def fetch(batch: pa.Table) -> pa.Table:
        tbl, index = _corpus_state(corpus_ref)
        return process_fetch_batch(batch, tbl, index, None, max_retries)

    return fetch


def process_fetch_batch(
    batch: pa.Table, tbl: pa.Table, index: dict, flaky, max_retries: int,
    retry_delay: float = RETRY_DELAY_S, sleep=None,
) -> pa.Table:
    from ..functions.urls import image_id_of_array

    if sleep is None:
        import time

        sleep = time.sleep

    def probe(image_id: str | None):
        attempts = 0
        while True:
            try:
                if flaky is not None:
                    flaky(image_id, attempts)
                row = index.get(image_id) if image_id else None
                return (row, 200, None) if row is not None else (None, 404, None)
            except TransientFetchError as e:
                attempts += 1
                if attempts > max_retries:
                    return (None, 504, str(e))
                if retry_delay > 0:
                    # reference policy: delay = retryCount x timeout on 504
                    # (M/MendeleyDocumentCrawler.java:72-87); sandbox default
                    # 0 s so tests/bench never sleep, hook injectable
                    sleep(attempts * retry_delay)

    image_ids = image_id_of_array(batch["url"]).to_pylist()
    n = len(batch)
    status = np.zeros(n, dtype=np.int32)
    errors: list[str | None] = [None] * n
    rows: list[int] = []
    hit_pos: list[int] = []
    for i, iid in enumerate(image_ids):
        row, st, err = probe(iid)
        status[i] = st
        errors[i] = err
        if row is not None:
            rows.append(row)
            hit_pos.append(i)

    # vectorized gather of all hit rows in one take
    hits = tbl.take(pa.array(rows, pa.int64()))
    hw = hits["w"].to_numpy(zero_copy_only=False)
    hh = hits["h"].to_numpy(zero_copy_only=False)
    hfmt = hits["fmt"].to_pylist()
    hbytes = hits["bytes"].to_pylist()
    hcap = hits["caption"].to_pylist()
    hphash = hits["phash"].to_numpy(zero_copy_only=False)

    blobs: list[bytes | None] = [None] * n
    ws = np.zeros(n, dtype=np.int32)
    hs = np.zeros(n, dtype=np.int32)
    fmts: list[str | None] = [None] * n
    caps: list[str | None] = [None] * n
    psnrs = np.full(n, np.nan)
    phashes = np.zeros(n, dtype=np.int64)
    phok = np.zeros(n, dtype=bool)
    for j, i in enumerate(hit_pos):
        w, h, fmt = int(hw[j]), int(hh[j]), hfmt[j]
        decoded = codecs.decode(hbytes[j], w, h, fmt)
        if fmt == "raw":
            # lossless: decoded buffer IS the original pixel field, so PSNR
            # is the cap by definition — identical to computing it the long
            # way (simulator does; values agree), ~30% less kernel work
            psnrs[i] = 99.0
        else:
            orig = codecs.gen_pixels(image_ids[i], w, h)
            psnrs[i] = codecs.psnr(decoded, orig)
        ph = codecs.phash64(decoded)
        phashes[i] = ph
        phok[i] = ph == int(hphash[j])
        blobs[i] = hbytes[j]
        ws[i], hs[i] = w, h
        fmts[i] = fmt
        caps[i] = hcap[j]

    out = batch
    for name, arr in (
        ("image_id", pa.array(image_ids, pa.string())),
        ("status", pa.array(status, pa.int32())),
        ("bytes", pa.array(blobs, pa.binary())),
        ("w", pa.array(ws, pa.int32())),
        ("h", pa.array(hs, pa.int32())),
        ("fmt", pa.array(fmts, pa.string())),
        ("caption", pa.array(caps, pa.string())),
        ("psnr", pa.array(psnrs, pa.float64())),
        ("phash", pa.array(phashes, pa.int64())),
        ("phash_ok", pa.array(phok, pa.bool_())),
        ("error", pa.array(errors, pa.string())),
    ):
        out = out.append_column(name, arr)
    return out


def _batch_part_name(batch: pa.Table) -> str:
    """Deterministic part name from the batch identity (min/xor of url_hash +
    row count): Ray tasks are at-least-once, so a task retried after its
    os.replace completed must OVERWRITE its part, not add a second one —
    uuid names double-counted those rows in read_fetched/count_status."""
    h = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    if not len(h):
        return "empty-0"
    return f"{int(h.min()):016x}-{int(np.bitwise_xor.reduce(h)):016x}-{len(h)}"


def fetch_write_links_fn(corpus_ref, wave_dir: str, max_depth: int,
                         max_retries: int = FETCH_MAX_RETRIES):
    """Fused streaming stage: fetch+decode a batch, spool it to its own
    Parquet part file in ``wave_dir`` (tmp + atomic rename, the K1 spool
    pattern — one file per block, exactly what Dataset.write_parquet does
    under the hood), and emit only the extracted link rows downstream.

    Fusing the three passes (fetch → write → link-extract) into one task
    keeps the image payloads OUT of the object store entirely — they go
    worker → disk once, and only the tiny link table flows on. This is the
    difference between moving ~30 KB/row through plasma three times and
    zero times; at 10^10 scale it is the difference between a crawl and a
    shuffle storm."""
    import os

    import pyarrow.parquet as pq

    from .links import ExtractLinks

    extract = ExtractLinks(max_depth)

    def fn(batch: pa.Table) -> pa.Table:
        tbl, index = _corpus_state(corpus_ref)
        fetched = process_fetch_batch(batch, tbl, index, None, max_retries)
        path = os.path.join(wave_dir, f"part-{_batch_part_name(batch)}.parquet")
        pq.write_table(fetched, path + ".tmp")
        os.replace(path + ".tmp", path)
        return extract(fetched)

    return fn


def count_rows(wave_dir: str) -> int:
    """Total spooled rows of a wave from parquet FOOTER metadata only (no
    column reads) — the cheap side of the count reconciliation (A6)."""
    import glob
    import os

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(wave_dir, "part-*.parquet"))
    )


def count_status(wave_dir: str, code: int = 200) -> int:
    """Column-pruned scan of the spooled wave (reads ONLY the status column);
    IO-bound, so the per-file reads run on a thread pool."""
    import glob
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(wave_dir, "part-*.parquet"))

    def one(f: str) -> int:
        t = pq.read_table(f, columns=["status"])
        return int(pc.sum(pc.equal(t["status"], code)).as_py() or 0)

    if not files:
        return 0
    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        return sum(ex.map(one, files))


class FetchDecode:
    """Actor-pool form of the stage (state warmed once per actor in __init__);
    used directly in tests and wherever flaky-injection / non-shareable state
    is needed. The crawl's hot path uses ``fetch_decode_fn`` tasks instead."""

    def __init__(
        self,
        corpus_path: str | None = None,
        corpus_ref=None,
        flaky=None,
        max_retries: int = FETCH_MAX_RETRIES,
        retry_delay: float = RETRY_DELAY_S,
        sleep=None,
    ):
        self._retry_delay = retry_delay
        self._sleep = sleep
        if corpus_ref is not None:
            import ray

            tbl = ray.get(corpus_ref)
        else:
            import pyarrow.parquet as pq

            tbl = pq.read_table(corpus_path)
        self._tbl = tbl.combine_chunks()
        self._index = {s: i for i, s in enumerate(self._tbl["image_id"].to_pylist())}
        self._flaky = flaky
        self._max_retries = max_retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        return process_fetch_batch(
            batch, self._tbl, self._index, self._flaky, self._max_retries,
            retry_delay=self._retry_delay, sleep=self._sleep,
        )


# --------------------------------------------------------------------------
# Bucketed corpus store — the 10^10-row scale path for the corpus probe
# (SURVEY.md J6). The corpus is hash-partitioned on image_id into B bucket
# files; each worker process lazily loads ONLY the buckets its batches touch
# and LRU-caches a bounded number of them. The object-store broadcast path
# above stays the fast path while the corpus fits in plasma (~10s of GB);
# this path removes that ceiling: memory per worker = lru_buckets × bucket
# size, independent of total corpus size.
# --------------------------------------------------------------------------

N_CORPUS_BUCKETS_DEFAULT = 64
_WORKER_BUCKET_CACHE: dict = {}  # {(corpus_dir, bucket): (table, index)}
_WORKER_BUCKET_LRU: list = []


def write_bucketed_corpus(corpus: pa.Table, out_dir: str, n_buckets: int = N_CORPUS_BUCKETS_DEFAULT) -> str:
    """Partition a corpus table into hash buckets (one parquet per bucket)."""
    import os

    import pyarrow.parquet as pq

    from ..functions.hashing import hash64_array

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_BUCKETS"), "w") as f:
        f.write(str(n_buckets))  # the store carries its own partitioning
    buckets = (hash64_array(corpus["image_id"]) % np.uint64(n_buckets)).astype(np.int64)
    for b in np.unique(buckets):
        part = corpus.filter(pa.array(buckets == b))
        path = os.path.join(out_dir, f"bucket_{int(b):04d}.parquet")
        pq.write_table(part, path + ".tmp")
        os.replace(path + ".tmp", path)
    return out_dir


def _bucket_state(corpus_dir: str, bucket: int, lru_buckets: int):
    import os

    import pyarrow.parquet as pq

    key = (corpus_dir, bucket)
    st = _WORKER_BUCKET_CACHE.get(key)
    if st is None:
        path = os.path.join(corpus_dir, f"bucket_{bucket:04d}.parquet")
        tbl = pq.read_table(path).combine_chunks() if os.path.exists(path) else None
        index = (
            {s: i for i, s in enumerate(tbl["image_id"].to_pylist())} if tbl is not None else {}
        )
        st = (tbl, index)
        _WORKER_BUCKET_CACHE[key] = st
        _WORKER_BUCKET_LRU.append(key)
        while len(_WORKER_BUCKET_LRU) > lru_buckets:
            old = _WORKER_BUCKET_LRU.pop(0)
            _WORKER_BUCKET_CACHE.pop(old, None)
    else:
        _WORKER_BUCKET_LRU.remove(key)
        _WORKER_BUCKET_LRU.append(key)
    return st


def read_bucket_count(corpus_dir: str) -> int:
    import os

    with open(os.path.join(corpus_dir, "_BUCKETS")) as f:
        return int(f.read().strip())


def fetch_decode_bucketed_fn(
    corpus_dir: str,
    n_buckets: int | None = None,
    lru_buckets: int = 16,
    max_retries: int = FETCH_MAX_RETRIES,
):
    """Task-form fetch against a bucketed corpus: batch ids grouped by bucket,
    one probe per touched bucket (per-worker LRU amortizes loads)."""
    from ..functions.hashing import hash64_scalar

    if n_buckets is None:
        n_buckets = read_bucket_count(corpus_dir)

    def fetch(batch: pa.Table) -> pa.Table:
        from ..functions.urls import image_id_of_array

        image_ids = image_id_of_array(batch["url"]).to_pylist()
        # composite index across the touched buckets for this batch
        tables: dict[int, pa.Table] = {}
        index: dict[str, tuple[int, int]] = {}
        for iid in set(i for i in image_ids if i):
            b = hash64_scalar(iid) % n_buckets
            if b not in tables:
                tbl, idx = _bucket_state(corpus_dir, b, lru_buckets)
                tables[b] = tbl
                for s, row in idx.items():
                    index[s] = (b, row)
        # delegate to the shared kernel via a per-batch virtual table:
        # ONE take per touched bucket (vectorized gather), not a per-row
        # slice+concat loop
        rows = [index[i] for i in image_ids if i in index]
        if rows:
            per_bucket: dict[int, list[int]] = {}
            for b, r in rows:
                per_bucket.setdefault(b, []).append(r)
            sub = pa.concat_tables(
                [tables[b].take(pa.array(rs, pa.int64())) for b, rs in per_bucket.items()],
                promote_options="default",
            ).combine_chunks()
            flat_index = {s: j for j, s in enumerate(sub["image_id"].to_pylist())}
        else:
            from ..sources.synth import make_corpus

            sub = make_corpus(0)
            flat_index = {}
        return process_fetch_batch(batch, sub, flat_index, None, max_retries)

    return fetch


def fetch_write_links_bucketed_fn(corpus_dir: str, wave_dir: str, max_depth: int,
                                  n_buckets: int | None = None):
    """Bucketed variant of the fused fetch→spool→links stage."""
    import os

    import pyarrow.parquet as pq

    from .links import ExtractLinks

    inner = fetch_decode_bucketed_fn(corpus_dir, n_buckets)
    extract = ExtractLinks(max_depth)

    def fn(batch: pa.Table) -> pa.Table:
        fetched = inner(batch)
        path = os.path.join(wave_dir, f"part-{_batch_part_name(batch)}.parquet")
        pq.write_table(fetched, path + ".tmp")
        os.replace(path + ".tmp", path)
        return extract(fetched)

    return fn
