"""Partial-then-combine aggregation (ray_guide "Aggregation at scale").

Every grouped aggregate in this repo follows: (1) a vectorized partial
aggregate inside map_batches (one row per key per batch — bounds any key's
row count by the block count), then (2) a combine of the partials.

The combine deliberately does NOT use ``Dataset.groupby().aggregate()``:
measured on ray 2.49, its sort-based implementation spent 118 core-seconds
combining 67k partial rows (see BASELINE.md notes) regardless of key type or
partition count. Instead the partials are hash-bucketed on the key
(deterministic FNV ``hash64_array``) and each bucket is combined with one
vectorized pandas groupby inside ``groupby(bucket).map_groups`` — n_buckets
distributed combines, ~4× faster here and linearly scalable (n_buckets is
derived from the cluster size via runtime.n_buckets_for; keys never
straddle buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash64_array
from ..runtime import n_buckets_for

AggSpec = dict[str, str]  # column -> "sum" | "min" | "max"

# Note on the "RefBundle with a different schema ... new schema: ." warnings
# some shuffles log: every UDF in this repo returns TYPED (possibly empty)
# tables, but ray 2.49's sort-based groupby emits schema-less EMPTY bundles
# for partitions that received no rows (streaming_executor_state.py:793
# fires on those internal bundles). Benign — downstream concat ignores
# zero-row bundles; verified by running the pipelines with typed-empty UDF
# outputs only and observing the warning persists on the Sort operator.


def combine_partials(
    partials: rd.Dataset,
    key_cols: list[str],
    aggs: AggSpec,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Combine partial-aggregate rows into one row per key."""
    n_buckets = n_buckets or n_buckets_for()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # hash64_array (FNV over the Arrow string buffer), NOT
        # pd.util.hash_pandas_object: pandas' hasher mis-hashes strings with
        # embedded NUL bytes (observed: distinct joined keys colliding AND
        # the same key hashing differently between batches), which split a
        # multi-column key across buckets and broke the combine invariant.
        key = (
            df[key_cols].astype(str).agg("\x00".join, axis=1)
            if len(key_cols) > 1
            else df[key_cols[0]].astype(str)
        )
        h = hash64_array(pa.array(key, pa.string()))
        df = df.copy()
        df["_b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_cols, as_index=False).agg(
            **{c: (c, op) for c, op in aggs.items()}
        )
        return out

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(combine, batch_format="pandas")
    )


def value_count_threshold(ds: rd.Dataset, batch_values_fn, pct: int) -> int:
    """The pct-th-percentile value of ``batch_values_fn(batch) -> int array``
    without sorting or collecting values: per-batch value-count partials
    (distinct values << rows), tiny driver combine, then DuckDB's
    ``quantile_disc`` order statistic k = ceil(pct·n/100) − 1. Shared by
    q_quality_filter and the curation pipeline."""
    import pyarrow as pa_

    def hist_partial(b) -> "pa_.Table":
        v, c = np.unique(batch_values_fn(b), return_counts=True)
        return pa_.table(
            {"v": pa_.array(v, pa_.int64()), "c": pa_.array(c, pa_.int64())}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("v")["c"]
        .sum()
        .sort_index()
    )
    n_total = int(hist.sum())
    if n_total == 0:
        return 0
    k = max(0, -(-pct * n_total // 100) - 1)
    return int(hist.index.to_numpy()[np.searchsorted(hist.cumsum().to_numpy(), k + 1)])
