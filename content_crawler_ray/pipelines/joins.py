"""Bucketed distributed equi-join built from groupby shuffles.

Why not ``Dataset.join``: ray 2.49's hash-shuffle join finalizes a partition
that received no shards of one side as a zero-column table, which
``pa.Table.join`` rejects ("No match or multiple matches ... on left side")
whenever a side's key space doesn't reach every partition — the normal case
for sparse candidate-pair tables. Its aggregator actors also reserve
``num_partitions × 0.125`` CPUs, which deadlocks small sessions when two
joins run concurrently. The bucketed form below (tag rows with their side,
bucket on hash64(key), one local Arrow hash-join per shuffle bucket) has
neither edge, reuses the proven groupby shuffle, and keeps every per-bucket
kernel vectorized.

Scale shape: ONE all-to-all shuffle keyed on a uniform hash bucket; each
reduce task joins a whole bucket with a single acero hash-join call. Skewed
join keys spread over buckets by hash; a genuinely hot single key still
lands in one bucket — ``skew_inner_join`` handles that profile by salting
hot left keys across ``n_salt`` buckets and replicating only the hot RIGHT
rows to each salt (the cold majority shuffles exactly as before).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import hash64_any
from ..runtime import n_buckets_for


def bucketed_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_schema: dict[str, pa.DataType],
    right_schema: dict[str, pa.DataType],
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Inner equi-join of two Datasets on a single key column.

    ``left_schema`` / ``right_schema`` list each side's columns (including its
    key) with their Arrow types; both sides are projected to the union schema
    with typed nulls so Dataset.union sees uniform blocks. Output columns:
    all left columns, then right columns minus the right key.
    """
    n_buckets = n_buckets or n_buckets_for(floor=32)
    left_cols = list(left_schema)
    right_cols = list(right_schema)
    union_fields = (
        [(c, left_schema[c]) for c in left_cols]
        + [(c, right_schema[c]) for c in right_cols if c not in left_schema]
        + [("_side", pa.int8()), ("_b", pa.int64())]
    )
    union_schema = pa.schema(union_fields)

    def _project(cols: list[str], key: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            bb = (hash64_any(b[key]) % np.uint64(n_buckets)).astype(np.int64)
            arrays = []
            for name, typ in union_fields[:-2]:
                if name in cols:
                    arrays.append(pc.cast(b[name], typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            arrays.append(pa.array(np.full(n, side, dtype=np.int8), pa.int8()))
            arrays.append(pa.array(bb, pa.int64()))
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return fn

    tagged = left.map_batches(_project(left_cols, left_on, 0), batch_format="pyarrow").union(
        right.map_batches(_project(right_cols, right_on, 1), batch_format="pyarrow")
    )

    merge = _bucket_merge_fn(left_on, right_on, left_schema, right_schema)
    return tagged.groupby("_b").map_groups(merge, batch_format="pyarrow")


def _bucket_merge_fn(
    left_on: str,
    right_on: str,
    left_schema: dict[str, pa.DataType],
    right_schema: dict[str, pa.DataType],
):
    """Per-bucket Arrow hash-join over a side-tagged shuffle group."""
    out_cols = list(left_schema) + [
        c for c in right_schema if c != right_on and c not in left_schema
    ]

    def merge(t: pa.Table) -> pa.Table:
        # groups that saw only one side can degrade the other side's typed
        # nulls to null-type columns through the shuffle — restore the types
        def _typed(sub: pa.Table, schema: dict[str, pa.DataType]) -> pa.Table:
            return pa.table({c: pc.cast(sub[c], schema[c]) for c in schema})

        lt = _typed(t.filter(pc.equal(t["_side"], 0)), left_schema)
        rt = _typed(t.filter(pc.equal(t["_side"], 1)), right_schema)
        joined = lt.join(
            rt, keys=[left_on], right_keys=[right_on], join_type="inner"
        )
        return joined.select(out_cols).combine_chunks()

    return merge


# a key whose left-side row count exceeds this overwhelms a single reduce
# task's memory/latency budget — route it through the salted path
HOT_KEY_THRESHOLD = 250_000


def skew_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_schema: dict[str, pa.DataType],
    right_schema: dict[str, pa.DataType],
    n_buckets: int | None = None,
    n_salt: int = 8,
    hot_threshold: int = HOT_KEY_THRESHOLD,
) -> rd.Dataset:
    """Bucketed inner equi-join that survives hot keys (Zipf-skewed joins).

    Pass 1 finds left keys with ≥ ``hot_threshold`` rows EXACTLY: per-batch
    value-count partials, one tiny bucketed combine, and only over-threshold
    keys reach the driver (bounded by rows/threshold — a handful, by
    construction). Pass 2 is the bucketed join with hot LEFT rows salted
    uniformly over ``n_salt`` buckets and hot RIGHT rows replicated once per
    salt; the cold majority shuffles exactly as ``bucketed_inner_join``.
    The salt a left row draws affects placement only, never the result set
    (every salt bucket holds the full hot right side), so output equals the
    unsalted join at any parallelism.
    """
    import ray

    from .agg import combine_partials

    n_buckets = n_buckets or n_buckets_for(floor=32)
    n_salt = max(1, min(n_salt, n_buckets))  # salts must map to distinct buckets

    def key_counts(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b[left_on])
        return pa.table(
            {
                left_on: vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hot_df = (
        combine_partials(
            left.map_batches(key_counts, batch_format="pyarrow"),
            [left_on],
            {"cnt": "sum"},
        )
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["cnt"], pa.scalar(hot_threshold))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    hot_keys = hot_df[left_on].to_numpy()
    hot_ref = ray.put(hot_keys)

    left_cols = list(left_schema)
    right_cols = list(right_schema)
    union_fields = (
        [(c, left_schema[c]) for c in left_cols]
        + [(c, right_schema[c]) for c in right_cols if c not in left_schema]
        + [("_side", pa.int8()), ("_b", pa.int64())]
    )
    union_schema = pa.schema(union_fields)

    def _emit(b: pa.Table, cols: list[str], side: int, bb: np.ndarray) -> pa.Table:
        n = b.num_rows
        arrays = []
        for name, typ in union_fields[:-2]:
            arrays.append(pc.cast(b[name], typ) if name in cols else pa.nulls(n, typ))
        arrays.append(pa.array(np.full(n, side, dtype=np.int8), pa.int8()))
        arrays.append(pa.array(bb, pa.int64()))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def project_left(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        h = hash64_any(b[left_on])
        is_hot = np.isin(b[left_on].to_numpy(zero_copy_only=False), hot)
        salt = np.arange(b.num_rows, dtype=np.uint64) % np.uint64(n_salt)
        bb = (np.where(is_hot, h + salt, h) % np.uint64(n_buckets)).astype(np.int64)
        return _emit(b, left_cols, 0, bb)

    def project_right(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        h = hash64_any(b[right_on])
        is_hot = np.isin(b[right_on].to_numpy(zero_copy_only=False), hot)
        cold_bb = (h[~is_hot] % np.uint64(n_buckets)).astype(np.int64)
        parts = [_emit(b.filter(pa.array(~is_hot)), right_cols, 1, cold_bb)]
        hot_b = b.filter(pa.array(is_hot))
        if hot_b.num_rows:
            hh = h[is_hot]
            for s in range(n_salt):
                bb = ((hh + np.uint64(s)) % np.uint64(n_buckets)).astype(np.int64)
                parts.append(_emit(hot_b, right_cols, 1, bb))
        return pa.concat_tables(parts)

    tagged = left.map_batches(project_left, batch_format="pyarrow").union(
        right.map_batches(project_right, batch_format="pyarrow")
    )
    merge = _bucket_merge_fn(left_on, right_on, left_schema, right_schema)
    return tagged.groupby("_b").map_groups(merge, batch_format="pyarrow")


# broadcast threshold: right side ships to every map task once (via the
# object store), so it must fit comfortably in a worker heap; rows is the
# proxy the planner can get for free from parquet metadata / count()
BROADCAST_MAX_ROWS = 2_000_000


def broadcast_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    right_cols: list[str],
) -> rd.Dataset:
    """Inner equi-join with the RIGHT side broadcast (ray.put once, read in
    every task — never re-shipped per batch). Output: left columns + right
    payload columns. Right key must be unique (dimension-table shape)."""
    import ray

    # payload Arrow types pinned from the right side's real schema: a batch
    # with ZERO key hits would otherwise append columns inferred from an
    # empty object ndarray (Arrow null type) and drift the block schema
    rschema = right.schema().base_schema
    rtypes = {n: rschema.field(n).type for n in right_cols}
    rt = right.to_pandas().set_index(right_on)
    assert rt.index.is_unique, "broadcast join right key must be unique"
    ref = ray.put((rt[right_cols], rtypes))

    def fn(b: pa.Table) -> pa.Table:
        import pandas as pd

        lookup, rtypes = ray.get(ref)
        keys = b[left_on].to_numpy(zero_copy_only=False)
        hit = pd.Index(keys).isin(lookup.index)
        b = b.filter(pa.array(hit))
        sub = lookup.loc[keys[hit]]
        out = b
        for c in right_cols:
            out = out.append_column(c, pa.Array.from_pandas(sub[c], type=rtypes[c]))
        return out

    return left.map_batches(fn, batch_format="pyarrow")


def auto_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_schema: dict[str, pa.DataType],
    right_schema: dict[str, pa.DataType],
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> rd.Dataset:
    """Strategy-picking join: broadcast the right side when its row count
    (free from parquet metadata) is under ``broadcast_max_rows`` — no
    shuffle touches the left side — else fall back to the bucketed
    all-to-all join. The J6 three-strategy choice, automated."""
    right = right.materialize()  # ONE execution: count() below is metadata,
    # and whichever strategy wins re-reads blocks, not the upstream plan
    n_right = right.count()
    right_payload = [c for c in right_schema if c != right_on]
    if n_right <= broadcast_max_rows:
        return broadcast_inner_join(
            left, right, left_on=left_on, right_on=right_on, right_cols=right_payload
        )
    return bucketed_inner_join(
        left,
        right,
        left_on=left_on,
        right_on=right_on,
        left_schema=left_schema,
        right_schema=right_schema,
    )
