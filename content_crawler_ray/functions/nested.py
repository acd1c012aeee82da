"""Nested-type flattening kernels — the REAL shapes of T7/T8/T9
(C/EsDocBuilder.java:80-237): struct columns flatten by field projection
(:96-118), ``list<struct>`` link/array fields project one child field per
element (:120-178), and ``map<locale, string>`` localized fields collapse to
one value with default-locale fallback (:81-93, 224-229).

Everything is zero-copy Arrow: struct projection via ``pc.struct_field``,
list projection via the list offsets + flat child projection, locale
collapse via two ``pc.map_lookup`` passes and an ``if_else``. No Python
loop touches rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _chunked(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def struct_project(arr: pa.Array | pa.ChunkedArray, field: str) -> pa.Array:
    """``struct.field`` → its own column (T7)."""
    return pc.struct_field(_chunked(arr), field)


def list_struct_project(arr: pa.Array | pa.ChunkedArray, field: str) -> pa.ListArray:
    """``list<struct>`` → ``list<child>`` keeping the per-row boundaries
    (T8: link/array field projection)."""
    arr = _chunked(arr)
    flat_vals = pc.struct_field(arr.flatten(), field)
    return pa.ListArray.from_arrays(arr.offsets, flat_vals)


def list_join(arr: pa.Array | pa.ChunkedArray, sep: str = ",") -> pa.Array:
    """``list<string>`` → one joined string per row."""
    return pc.binary_join(_chunked(arr), sep)


def list_sum_int(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``list<int>`` → per-row sum (vectorized segment sum over offsets)."""
    arr = _chunked(arr)
    v = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cs = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(v, out=cs[1:])
    return pa.array(cs[off[1:]] - cs[off[:-1]], pa.int64())


def collapse_locale_map(
    arr: pa.Array | pa.ChunkedArray, locale: str, default_locale: str = "en"
) -> pa.Array:
    """``map<locale, string>`` → the requested locale's value, falling back
    to the default locale, else null (T9 — EsDocBuilder :81-93)."""
    arr = _chunked(arr)
    want = pc.map_lookup(arr, query_key=locale, occurrence="first")
    fallback = pc.map_lookup(arr, query_key=default_locale, occurrence="first")
    return pc.if_else(pc.is_valid(want), want, fallback)
