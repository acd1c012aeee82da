"""Distributed ordered scans (prefix sum / running total).

The reference engine has no global-order scan — its Rx pipeline is
per-page — but a training-data pipeline needs one for sequence packing
(assigning documents to fixed token-budget bins in a deterministic global
order) and running-total style lineage counters. Ray Data has no built-in
window/scan operator, so this implements the classic two-pass
range-partitioned scan:

  pass 0  one cheap min/max aggregate over the key column (per-batch
          partials, tiny driver combine) fixes the key span;
  pass 1  rows are range-bucketed by key value (fixed-width ranges — the
          scan's order-preserving analogue of the hash buckets used by
          every combine in this repo); per-range partial SUMS (one row per
          range per batch) flow to the driver, which exclusive-cumsums the
          n_ranges totals into per-range offsets — the driver holds
          O(n_ranges) integers, never values;
  pass 2  each range sorts its own rows by key and cumsums them in one
          vectorized reduce task, adding its range offset.

Scale contract (same as agg.combine_partials): one RANGE's rows fit one
reduce task; n_ranges rises with cluster size via runtime.n_buckets_for.
Skewed key ranges (dense clusters in the key space) can unbalance ranges —
at production scale the range boundaries would come from the two-pass
quantile sketch (q_quantile_exact's histogram) instead of fixed widths;
fixed widths keep this module dependency-free and are exact regardless.

Values are int64 so the cumsum is exact (callers convert currency to
cents, token counts are already integral).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..runtime import n_buckets_for


def prefix_sum(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "running",
    n_ranges: int | None = None,
) -> rd.Dataset:
    """Inclusive prefix sum of ``val_col`` (int64) in ``key_col`` order.

    Keys must be unique int64 (the SQL twin is ``SUM(val) OVER (ORDER BY
    key)``, which is only well-defined for unique keys). Output columns:
    (key_col, val_col, out_col).
    """
    n_ranges = n_ranges or n_buckets_for()

    # pass 0 — key span (per-batch min/max partials, tiny driver combine)
    span = ds.map_batches(
        lambda b: pa.table(
            {
                "lo": pa.array([pc.min(b[key_col]).as_py()], pa.int64()),
                "hi": pa.array([pc.max(b[key_col]).as_py()], pa.int64()),
            }
        )
        if b.num_rows
        else pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()
    if span.empty:
        return ds.map_batches(
            lambda b: pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    val_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    lo, hi = int(span["lo"].min()), int(span["hi"].max())
    width = max(1, -(-(hi - lo + 1) // n_ranges))  # ceil div

    def add_range(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        r = (k - lo) // width
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                val_col: pa.array(v, pa.int64()),
                "_r": pa.array(r, pa.int64()),
            }
        )

    # materialize once: pass 1 (partials) and pass 2 (scan) both consume it,
    # and a lazy dataset would re-read + re-bucket the input for each. The
    # projection is three int64 columns — 24 B/row in the object store (with
    # spill), far cheaper than a second full input scan at scale.
    bucketed = ds.map_batches(add_range, batch_format="pyarrow").materialize()

    # pass 1 — per-range partial sums (one row per range per batch → tiny)
    def range_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"_r": b["_r"].to_numpy(zero_copy_only=False),
             "v": b[val_col].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("_r", as_index=False)["v"].sum()
        return pa.table(
            {
                "_r": pa.array(g["_r"].to_numpy(), pa.int64()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
            }
        )

    totals = (
        bucketed.map_batches(range_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("_r")["v"]
        .sum()
    )
    # driver-side exclusive cumsum over n_ranges integers (O(n_ranges) only)
    full = np.zeros(n_ranges, dtype=np.int64)
    full[totals.index.to_numpy()] = totals.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(full)[:-1]))

    # pass 2 — each range cumsums its own rows with its offset added
    def scan_range(g: pd.DataFrame) -> pa.Table:
        r = int(g["_r"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort")
        run = g[val_col].to_numpy().astype(np.int64).cumsum() + offsets[r]
        return pa.table(
            {
                key_col: pa.array(g[key_col].to_numpy(), pa.int64()),
                val_col: pa.array(g[val_col].to_numpy(), pa.int64()),
                out_col: pa.array(run, pa.int64()),
            }
        )

    return bucketed.groupby("_r").map_groups(scan_range, batch_format="pandas")


def pack_bins(
    run: rd.Dataset,
    budget: int,
    key_col: str = "doc_id",
    val_col: str = "n_tokens",
    run_col: str = "_run",
    bin_col: str = "bin",
) -> rd.Dataset:
    """Token-budget bin assignment over a ``prefix_sum`` output:
    bin = (inclusive_running − value) // budget (concat-then-split packing).
    Shared by q_pack_sequences and the curation pipeline so the mapping and
    its SQL twin can never drift apart."""

    def binify(b: pa.Table) -> pa.Table:
        r = b[run_col].to_numpy(zero_copy_only=False)
        v = b[val_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: b[key_col],
                val_col: b[val_col],
                bin_col: pa.array((r - v) // budget, pa.int64()),
            }
        )

    return run.map_batches(binify, batch_format="pyarrow")
