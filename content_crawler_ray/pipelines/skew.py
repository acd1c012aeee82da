"""Skew-aware salted aggregation (SURVEY.md §4) — the hot-key pattern.

A bare ``groupby(key)`` sends every row of a hot key to ONE reduce partition;
with Zipf-like key skew (hot hosts, hot n-grams) that partition becomes the
straggler. Salting splits each hot key into ``n_salt`` sub-keys for the first
(wide) aggregation, then merges the tiny salted partials in a second
aggregation — two shuffles over skew-free keys instead of one skewed shuffle.

For associative aggregates this repo mostly AVOIDS the problem entirely by
pre-aggregating inside map_batches (q_j1/q_a7/...: one partial row per key
per batch), which bounds any key's row count by the number of blocks. Salting
is the tool for the cases pre-aggregation can't cover: map_groups over raw
rows (windowing, top-k within key) where the hot group itself must be split
— documented here as a first-class, tested utility.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def salted_groupby_sum(
    ds: rd.Dataset, key: str, value: str, n_salt: int = 8, alias: str | None = None
) -> rd.Dataset:
    """SUM(value) GROUP BY key with hot-key salting: stage 1 groups by
    (key, salt), stage 2 merges the ≤ n_salt partials per key. The sum is
    associative, so the salt need not be content-derived — a block-local
    row index spreads even the canonical hot-key case where every row of
    the hot key carries the SAME value (a value-derived salt collapses
    those rows onto one salt and the straggler partition survives). The
    result is salt-invariant, so run-to-run block shapes don't matter."""
    alias = alias or f"sum_{value}"

    def add_salt(b: pa.Table) -> pa.Table:
        salt = (np.arange(b.num_rows, dtype=np.int64) % n_salt)
        return pa.table({key: b[key], "_salt": pa.array(salt), value: b[value]})

    from .agg import combine_partials

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        agg = df.groupby([key, "_salt"], as_index=False).agg(**{alias: (value, "sum")})
        return pa.Table.from_pandas(agg, preserve_index=False)

    stage1 = combine_partials(
        ds.map_batches(add_salt, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow"
        ),
        [key, "_salt"],
        {alias: "sum"},
    )
    return combine_partials(stage1, [key], {alias: "sum"})


def salted_top_values(
    ds: rd.Dataset, key: str, value: str, k: int = 3, n_salt: int = 8
) -> rd.Dataset:
    """Top-k values per key via salted map_groups: each hot group is split
    into ≤ n_salt sub-groups that compute local top-k; a second pass merges.
    (The non-associative case where plain pre-aggregation doesn't apply.)"""

    def add_salt(b: pa.Table) -> pa.Table:
        # block-local row index: spreads identical-value hot keys too (the
        # top-k merge is order-insensitive, so salt choice never shows)
        salt = (np.arange(b.num_rows, dtype=np.int64) % n_salt)
        return b.append_column("_salt", pa.array(salt))

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, value)[[key, value]]

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, value)

    return (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .map_groups(local_topk, batch_format="pandas")
        .groupby(key)
        .map_groups(merge_topk, batch_format="pandas")
    )
