"""Fetch + decode stage — the engine's analog of the reference's page fetch
(S1 M/MendeleyPager.java:102-130) fused with response handling, as an
actor-pool ``map_batches`` stage over zero-copy Arrow.

"Network" = lookup of the URL's ``img-<n>`` tail against the corpus table
(SURVEY.md J6). The corpus side is opened ONCE per actor in ``__init__``
(ST1-pattern: state per worker, not per batch); per batch the probe is a
vectorized hash-dict gather. At the 10^10 design point the corpus is bucketed
by ``hash(image_id) % B`` and an actor lazily loads + LRU-caches only the
buckets its batches touch; in-sandbox corpora fit in one shot.

Per 200-row: decode via the pure-numpy codec, PSNR vs the deterministic
original (invariant: ≥ 40 dB for lossy ``dctq``), recompute phash and compare
with the corpus column (``phash_ok``). Retry semantics mirror the reference's
504-only policy (M/MendeleyDocumentCrawler.java:72-87): an injectable
``flaky`` hook raises TransientFetchError; we retry up to ``max_retries``
then record the failure in the ``error`` column (poison rows never abort the
run — SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs

FETCH_MAX_RETRIES = 3


class TransientFetchError(RuntimeError):
    """Analog of the reference's GatewayTimeoutException (504)."""


class FetchDecode:
    """map_batches(FetchDecode, fn_constructor_kwargs=..., concurrency=N)."""

    def __init__(self, corpus_path: str, flaky=None, max_retries: int = FETCH_MAX_RETRIES):
        import pyarrow.parquet as pq

        tbl = pq.read_table(corpus_path)
        self._corpus = tbl
        ids = tbl["image_id"].to_pylist()
        self._index = {s: i for i, s in enumerate(ids)}
        self._bytes = tbl["bytes"].to_pylist()
        self._w = tbl["w"].to_numpy()
        self._h = tbl["h"].to_numpy()
        self._fmt = tbl["fmt"].to_pylist()
        self._caption = tbl["caption"].to_pylist()
        self._phash = tbl["phash"].to_numpy()
        self._flaky = flaky
        self._max_retries = max_retries

    def _fetch_one(self, image_id: str | None):
        """One corpus probe with the bounded 504-style retry loop."""
        attempts = 0
        while True:
            try:
                if self._flaky is not None:
                    self._flaky(image_id, attempts)
                if image_id is None or image_id not in self._index:
                    return None, 404, None
                return self._index[image_id], 200, None
            except TransientFetchError as e:
                attempts += 1
                if attempts > self._max_retries:
                    return None, 504, str(e)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.urls import image_id_of_array

        image_ids = image_id_of_array(batch["url"]).to_pylist()
        n = len(batch)
        status = np.zeros(n, dtype=np.int32)
        blobs: list[bytes | None] = [None] * n
        ws = np.zeros(n, dtype=np.int32)
        hs = np.zeros(n, dtype=np.int32)
        fmts: list[str | None] = [None] * n
        caps: list[str | None] = [None] * n
        psnrs = np.full(n, np.nan)
        phashes = np.zeros(n, dtype=np.int64)
        phok = np.zeros(n, dtype=bool)
        errors: list[str | None] = [None] * n
        for i, iid in enumerate(image_ids):
            row, st, err = self._fetch_one(iid)
            status[i] = st
            errors[i] = err
            if row is None:
                continue
            data = self._bytes[row]
            w, h, fmt = int(self._w[row]), int(self._h[row]), self._fmt[row]
            decoded = codecs.decode(data, w, h, fmt)
            orig = codecs.gen_pixels(iid, w, h)
            psnrs[i] = codecs.psnr(decoded, orig)
            ph = codecs.phash64(decoded)
            phashes[i] = ph
            phok[i] = ph == int(self._phash[row])
            blobs[i] = data
            ws[i], hs[i] = w, h
            fmts[i] = fmt
            caps[i] = self._caption[row]
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
