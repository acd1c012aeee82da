"""Image near-duplicate detection by perceptual hash — the image-payload
counterpart of the text MinHash pipeline.

64-bit phash (functions/codecs.phash64) → hamming-LSH: split the hash into
4 × 16-bit bands; two images within hamming distance r share at least one
band whenever their differing bits avoid some band (exact for r ≤ 3 by
pigeonhole, probabilistic above). Candidates = images sharing any
(band_idx, band_value) bucket; verify = exact hamming ≤ threshold.

Shuffle shape mirrors dedup.py: band rows → bucketed groupby (one vectorized
pandas pass per shuffle bucket, never per group) → pair emit. The 8-byte
phash rides along each band row, so each candidate pair already carries both
hashes and the hamming verify is a pure per-batch numpy kernel — no driver
materialization and no broadcast of any id→hash map (a 10^10-row dict would
be ~1 TB of driver heap counting Python object overhead)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

N_BANDS = 4
MAX_BUCKET = 256  # a bucket this hot means near-constant images; skip O(n²)

# vectorized popcount via byte-LUT (module-level: built once per worker)
_POPCNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _bands_of(phash: np.ndarray) -> np.ndarray:
    """(n, N_BANDS) uint16 band values of int64 phashes."""
    u = phash.astype(np.int64).view(np.uint64)
    return np.stack(
        [((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint16) for b in range(N_BANDS)],
        axis=1,
    )


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise popcount(a ^ b) of two int64 hash arrays."""
    if not len(a):
        return np.array([], dtype=np.int64)
    x = a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64)
    return _POPCNT_LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def phash_neardup_pairs(
    corpus_path: str, max_hamming: int = 6, n_buckets: int = 32
) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs of images with phash distance ≤ threshold."""
    ds = rd.read_parquet(corpus_path, columns=["image_id", "phash"])

    def band_rows(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy(zero_copy_only=False)
        bands = _bands_of(ph)
        n = len(ph)
        ids = np.repeat(np.asarray(b["image_id"].to_pylist(), dtype=object), N_BANDS)
        band_idx = np.tile(np.arange(N_BANDS, dtype=np.int64), n)
        band_val = bands.ravel().astype(np.int64)
        bucket = ((band_idx * 65_537 + band_val) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(np.repeat(ph, N_BANDS), pa.int64()),
                "band_idx": pa.array(band_idx, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "_b": pa.array(bucket, pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs per (band_idx, band_val) group; both phashes ride
        along so downstream verify never needs a lookup table."""
        out_a, out_b, out_ha, out_hb = [], [], [], []
        for _, grp in g.groupby(["band_idx", "band_val"], sort=False):
            ids = grp["image_id"].to_numpy()
            phs = grp["phash"].to_numpy()
            if len(ids) < 2 or len(ids) > MAX_BUCKET:
                continue
            order = np.argsort(ids)
            ids, phs = ids[order], phs[order]
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
            out_ha.append(phs[a])
            out_hb.append(phs[b])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=str),
                    "id_b": pd.Series([], dtype=str),
                    "ph_a": pd.Series([], dtype=np.int64),
                    "ph_b": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "ph_a": np.concatenate(out_ha),
                "ph_b": np.concatenate(out_hb),
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
        ham = _hamming64(ha, hb)
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pc_filter_str(b["id_a"], keep),
                "id_b": pc_filter_str(b["id_b"], keep),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    # cross-bucket duplicate pairs (same pair from several bands) are removed
    # by a final bucketed dedup keyed on the pair
    def pair_bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_array

        h = hash64_array(b["id_a"])
        return b.append_column(
            "_pb", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    return (
        verified.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["_pb"]),
            batch_format="pandas",
        )
    )


def pc_filter_str(col: pa.ChunkedArray | pa.Array, mask: np.ndarray) -> pa.Array:
    """Filter a string column by a numpy bool mask (zero-copy Arrow path)."""
    import pyarrow.compute as pc

    return pc.filter(col, pa.array(mask)).combine_chunks()
