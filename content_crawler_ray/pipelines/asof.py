"""Distributed as-of join — "facts as of event time" over two Datasets.

For every left row ``(key, t)`` find, among right rows with the same key and
``t_right <= t``: the latest right time (the as-of match) and how many right
rows precede the event. This is the temporal-join primitive a training-data
pipeline needs for point-in-time-correct feature attachment (no leakage from
the future), and the batch analog of the reference's look-up-current-registry
-state-at-crawl-time reads (reference: gbif/content-crawler
RegistryChangeService — each crawled item is interpreted against the registry
state in force at its crawl instant).

Scale shape: ONE all-to-all shuffle — both sides are tagged with a side bit,
projected to a union schema, and hash-bucketed on the key — then each bucket
runs a single vectorized sort-merge pass (sort by (key, time, side) with
right rows winning ties so ``<=`` semantics hold, grouped cumsum for the
prior-count, grouped forward-fill for the as-of time). No per-key dispatch,
no right-row fan-out (each right row ships exactly once, unlike the
range-join rewrite ``JOIN ON t_right <= t`` which is O(pairs)). Skewed keys
spread by hash; one genuinely hot key lands in one bucket — pre-salt at the
call site if that's the profile (see ann.py's hot-label treatment).

Ray Data cannot express this natively (no order-aware join); this is the
documented composition fallback: map_batches projection + groupby(bucket)
+ map_groups sort-merge. Partitioning assumption: all rows of a key fit one
reduce task — the same contract as every bucketed combine in this repo,
bounded by deriving n_buckets from cluster/input size (runtime.n_buckets_for).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import splitmix64
from ..runtime import n_buckets_for


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    left_time: str,
    right_key: str,
    right_time: str,
    carry: dict[str, pa.DataType],
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Inner as-of join: left rows with >=1 right row at ``t_right <= t``.

    ``carry`` names the left columns (with Arrow types) to keep on the
    output. Keys must be integer-typed; times must be timestamp columns.
    Output: carry columns + ``asof_us`` (epoch-µs of the latest matching
    right time, int64) + ``n_prior`` (count of right rows at or before the
    left time, int64).
    """
    n_buckets = n_buckets or n_buckets_for()
    carry_cols = list(carry)
    union_schema = pa.schema(
        [(c, carry[c]) for c in carry_cols]
        + [("_k", pa.int64()), ("_t", pa.int64()), ("_side", pa.int8()), ("_b", pa.int64())]
    )

    def _project(key: str, time: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = pc.cast(b[key], pa.int64()).to_numpy(zero_copy_only=False)
            t = pc.cast(b[time], pa.int64())  # timestamp[us] -> epoch micros
            arrays = [
                pc.cast(b[c], carry[c]) if side == 1 else pa.nulls(n, carry[c])
                for c in carry_cols
            ]
            arrays += [
                pa.array(k, pa.int64()),
                t,
                pa.array(np.full(n, side, dtype=np.int8), pa.int8()),
                pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
                    pa.int64(),
                ),
            ]
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return fn

    tagged = left.map_batches(
        _project(left_key, left_time, 1), batch_format="pyarrow"
    ).union(right.map_batches(_project(right_key, right_time, 0), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pa.Table:
        # right rows (_side=0) sort before left rows at equal (_k, _t): a
        # right row AT the left time counts and can be the as-of match (<=)
        g = g.sort_values(["_k", "_t", "_side"], kind="mergesort", ignore_index=True)
        is_r = (g["_side"] == 0).astype(np.int64)
        keys = g["_k"]
        g["n_prior"] = is_r.groupby(keys).cumsum()
        g["asof_us"] = g["_t"].where(is_r == 1).groupby(keys).ffill()
        out = g[(g["_side"] == 1) & (g["n_prior"] > 0)]
        # typed Arrow out: carry cols rode through pandas with right-side
        # nulls (int64 -> float64 degradation) — cast back to declared types
        return pa.table(
            {
                **{
                    c: pc.cast(pa.array(out[c]), carry[c], safe=False)
                    for c in carry_cols
                },
                "asof_us": pa.array(out["asof_us"].astype(np.int64), pa.int64()),
                "n_prior": pa.array(out["n_prior"].to_numpy(), pa.int64()),
            }
        )

    return tagged.groupby("_b").map_groups(merge, batch_format="pandas")
