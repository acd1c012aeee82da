"""64-bit key hashing for URL / content keys.

The reference dedups via the ES ``_id`` upsert (M/ElasticSearchIndexHandler.java:213-217);
our engine keys everything on a 64-bit hash of the canonical URL.  The production
design slot is xxhash64; in-sandbox (no ``xxhash`` wheel) we use FNV-1a 64-bit,
which has the two properties the engine needs: deterministic across processes /
cluster nodes, and vectorizable over an Arrow string column without a per-row
Python loop.  The hash is a pluggable seam (``hash64_scalar`` / ``hash64_column``)
— swapping in xxhash64 changes no call sites.

Vectorization strategy: gather the UTF-8 bytes of a string column into a padded
(n_rows × max_len) uint8 matrix straight from the Arrow buffers, then run the
FNV-1a byte recurrence over *columns* (max_len vectorized steps over all rows,
masked past each string's length).  For URL-sized strings this is ~100 numpy ops
per batch regardless of row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash64_scalar(s: str) -> int:
    """FNV-1a 64 of a single string (oracle / simulator path). Returns uint64 as int."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _padded_bytes_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(n × max_len) uint8 matrix of each string's bytes + per-row byte lengths.

    Zero-copy reads of the Arrow offsets/data buffers; the only allocation is
    the padded gather matrix.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    max_len = int(lengths.max()) if len(lengths) else 0
    if max_len == 0:
        return np.zeros((len(arr), 0), dtype=np.uint8), lengths
    idx = offsets[:-1].astype(np.int64)[:, None] + np.arange(max_len, dtype=np.int64)[None, :]
    np.clip(idx, 0, len(data) - 1, out=idx)
    mat = data[idx]
    return mat, lengths


def hash64_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a pyarrow string array → uint64 ndarray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mat, lengths = _padded_bytes_matrix(arr)
    n, max_len = mat.shape
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lengths > j
            hj = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(alive, hj, h)
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 ndarray — the integer-key
    analog of hash64_array (uniform bucket spread for sequential ids)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash64_any(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 hashes of a string OR integer Arrow column (join/bucket keys)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return hash64_array(arr)
    vals = arr.to_numpy(zero_copy_only=False)
    return splitmix64(vals.astype(np.int64).view(np.uint64))


def hash64_column(table: pa.Table, col: str, out: str = "url_hash") -> pa.Table:
    """Append a uint64 hash column of ``col`` to an Arrow table (map_batches body)."""
    h = hash64_array(table[col])
    return table.append_column(out, pa.array(h, type=pa.uint64()))


def bucket_of(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable shard/bucket assignment from uint64 hashes (hash-partitioning key)."""
    return (hashes % np.uint64(n_buckets)).astype(np.int64)
