"""Image near-duplicate detection by perceptual hash — the image-payload
counterpart of the text MinHash pipeline.

64-bit phash (functions/codecs.phash64) → hamming-LSH: split the hash into
4 × 16-bit bands; two images within hamming distance r share at least one
band whenever their differing bits avoid some band (exact for r ≤ 3 by
pigeonhole, probabilistic above). Candidates = images sharing any
(band_idx, band_value) bucket; verify = exact hamming ≤ threshold.

Shuffle shape mirrors dedup.py: band rows → bucketed groupby (one vectorized
pandas pass per shuffle bucket, never per group) → pair dedup → verify against
an object-store broadcast of the (id, phash) column pair (8 bytes/row — tiny
even at 10^10 rows ÷ cluster)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

N_BANDS = 4
MAX_BUCKET = 256  # a bucket this hot means near-constant images; skip O(n²)


def _bands_of(phash: np.ndarray) -> np.ndarray:
    """(n, N_BANDS) uint16 band values of int64 phashes."""
    u = phash.astype(np.int64).view(np.uint64)
    return np.stack(
        [((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint16) for b in range(N_BANDS)],
        axis=1,
    )


def phash_neardup_pairs(
    corpus_path: str, max_hamming: int = 6, n_buckets: int = 32
) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs of images with phash distance ≤ threshold."""
    ds = rd.read_parquet(corpus_path, columns=["image_id", "phash"])

    # broadcast the verify side: id -> phash (8B/row; scale note in docstring)
    id2hash: dict[str, int] = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        id2hash.update(zip(b["image_id"].to_pylist(), b["phash"].to_pylist()))
    ref = ray.put(id2hash)

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
                "band_idx": pa.array(band_idx, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "_b": pa.array(bucket, pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band_idx", "band_val"], sort=False):
            ids = np.sort(grp["image_id"].to_numpy())
            if len(ids) < 2 or len(ids) > MAX_BUCKET:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=str), "id_b": pd.Series([], dtype=str)})
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    def dedup_and_verify(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"id_a": b["id_a"].to_pylist(), "id_b": b["id_b"].to_pylist()})
        df = df.drop_duplicates()
        lookup = ray.get(ref)
        ha = np.array([lookup[i] for i in df["id_a"]], dtype=np.int64).view(np.uint64)
        hb = np.array([lookup[i] for i in df["id_b"]], dtype=np.int64).view(np.uint64)
        x = ha ^ hb
        # vectorized popcount via byte-LUT
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
        ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64) if len(x) else np.array([], dtype=np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(df["id_a"].to_numpy()[keep], pa.string()),
                "id_b": pa.array(df["id_b"].to_numpy()[keep], pa.string()),
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

    verified = pairs.map_batches(dedup_and_verify, batch_format="pyarrow")
    return (
        verified.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["_pb"]),
            batch_format="pandas",
        )
    )
