"""Generic hamming-LSH near-duplicate pairing over any 64-bit hash column —
shared engine for the image-phash and text-SimHash near-dup pipelines.

Band scheme: split the 64-bit hash into 4 × 16-bit bands; two hashes within
hamming distance r share at least one band whenever their differing bits
avoid some band (exact for r ≤ 3 by pigeonhole, probabilistic above).
Candidates = ids sharing any (band_idx, band_value) bucket; verify = exact
hamming ≤ threshold via a vectorized popcount over hashes that RIDE the band
rows (8 bytes/row) — no lookup table, no broadcast, no driver state.

Shuffle shape: band rows → bucketed groupby (one vectorized pandas pass per
shuffle bucket, never per group) → per-pair verify kernel → bucketed pair
dedup (the same pair can surface from several bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..runtime import n_buckets_for, report_skips

N_BANDS = 4
MAX_BUCKET = 256  # a band bucket this hot means near-constant inputs; skip O(n²)
# (never silently: skips are logged + counted via runtime.report_skips)

# vectorized popcount via byte-LUT (module-level: built once per worker)
_POPCNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def bands_of(hashes: np.ndarray) -> np.ndarray:
    """(n, N_BANDS) uint16 band values of int64 hashes."""
    u = hashes.astype(np.int64).view(np.uint64)
    return np.stack(
        [((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint16) for b in range(N_BANDS)],
        axis=1,
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise popcount(a ^ b) of two int64 hash arrays."""
    if not len(a):
        return np.array([], dtype=np.int64)
    x = a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64)
    return _POPCNT_LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def hamming_lsh_pairs(
    ds: rd.Dataset,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
    n_buckets: int | None = None,
    skip_counter=None,
) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs with hash distance ≤ threshold. The id
    column may be string or integer; output id columns keep its type."""
    n_buckets = n_buckets or n_buckets_for(floor=32)

    def band_rows(b: pa.Table) -> pa.Table:
        h = b[hash_col].to_numpy(zero_copy_only=False)
        bands = bands_of(h)
        n = len(h)
        ids = b[id_col].combine_chunks() if isinstance(b[id_col], pa.ChunkedArray) else b[id_col]
        idx = np.repeat(np.arange(n, dtype=np.int64), N_BANDS)
        band_idx = np.tile(np.arange(N_BANDS, dtype=np.int64), n)
        band_val = bands.ravel().astype(np.int64)
        bucket = ((band_idx * 65_537 + band_val) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "id": ids.take(pa.array(idx, pa.int64())),
                "h": pa.array(np.repeat(h, N_BANDS), pa.int64()),
                "band_idx": pa.array(band_idx, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "_b": pa.array(bucket, pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs per (band_idx, band_val) group; both hashes ride
        along so verify never needs a lookup table. Vectorized like the
        ngram pair kernel (queries.py::pairs_bucket): exact two-step
        factorize of the group key, one lexsort, one triu_indices template
        per DISTINCT eligible group size — no Python loop over groups."""
        ids_raw = g["id"].to_numpy()
        hs_raw = g["h"].to_numpy()
        bi = pd.factorize(g["band_idx"].to_numpy(), sort=False)[0]
        bv, bvu = pd.factorize(g["band_val"].to_numpy(), sort=False)
        key = bi.astype(np.int64) * len(bvu) + bv
        order = np.lexsort((ids_raw, key))  # by group, ids ascending within
        kk = key[order]
        ids = ids_raw[order]
        hs = hs_raw[order]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]]) if len(kk) else np.array([], np.int64)
        d = np.diff(np.r_[starts, len(kk)]) if len(kk) else np.array([], np.int64)
        hot = d > MAX_BUCKET
        n_skipped = int(hot.sum())
        rows_skipped = int(d[hot].sum())
        slot = int(g["_b"].iloc[0]) if len(g) else 0
        report_skips(skip_counter, n_skipped, rows_skipped, "hamming_lsh", slot=slot)
        elig = (d >= 2) & ~hot
        total = int((d[elig] * (d[elig] - 1) // 2).sum())
        idx_i = np.empty(total, np.int64)
        idx_j = np.empty(total, np.int64)
        pos = 0
        for dv in np.unique(d[elig]) if total else []:
            base = starts[elig & (d == dv)]
            iu, ju = np.triu_indices(int(dv), k=1)
            ii = (base[:, None] + iu[None, :]).ravel()
            jj = (base[:, None] + ju[None, :]).ravel()
            idx_i[pos : pos + len(ii)] = ii
            idx_j[pos : pos + len(jj)] = jj
            pos += len(ii)
        if total == 0:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=g["id"].dtype),
                    "id_b": pd.Series([], dtype=g["id"].dtype),
                    "ph_a": pd.Series([], dtype=np.int64),
                    "ph_b": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "id_a": ids[idx_i],
                "id_b": ids[idx_j],
                "ph_a": hs[idx_i],
                "ph_b": hs[idx_j],
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    def verify(b: pa.Table) -> pa.Table:
        ha = b["ph_a"].to_numpy(zero_copy_only=False)
        hb = b["ph_b"].to_numpy(zero_copy_only=False)
        ham = hamming64(ha, hb)
        keep = pa.array(ham <= max_hamming)
        return pa.table(
            {
                "id_a": pc.filter(b["id_a"], keep),
                "id_b": pc.filter(b["id_b"], keep),
                "hamming": pa.array(ham[ham <= max_hamming], pa.int64()),
            }
        )

    def pair_bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_any

        h = hash64_any(b["id_a"])
        return b.append_column(
            "_pb", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    return (
        pairs.map_batches(verify, batch_format="pyarrow")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["_pb"]),
            batch_format="pandas",
        )
    )
