"""Multi-sink fan-out — the ComposeHandler analog
(M/ComposeHandler.java:28-75): the reference fans every page to ALL handlers
(file spool + ES index + registry) and rolls all of them back together when
any one fails.

Ray-Data shape: the fetch intermediate is materialized ONCE (blocks pinned in
the object store), then each sink consumes the SAME materialized Dataset —
no sink re-executes the upstream pipeline. All sink output lands under a
staging run dir; only when EVERY sink succeeds does the ``PUBLISHED.json``
pointer flip (tableio.publish_run — the reference's finish/alias-swap,
E:137-183). A failed sink leaves the pointer untouched, so readers keep
seeing the previous run: rollback is the ABSENCE of the publish flip
(M/ComposeHandler.java:63-74's rollback broadcast collapses to one atomic
pointer in this design).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import ray.data as rd

from ..sources.tableio import begin_run, publish_run, published_run, run_dir

Sink = Callable[[rd.Dataset, str], Any]


def fan_out(
    ds: rd.Dataset,
    sinks: dict[str, Sink],
    out_dir: str,
) -> dict[str, Any]:
    """Run every sink over ONE materialized intermediate; publish atomically.

    Each sink gets ``(materialized_ds, its_staging_subdir)``. Raises the
    first sink failure after recording nothing — the run is left staged and
    unpublished (invisible to ``read_published``)."""
    ds = ds.materialize()  # single upstream execution; sinks share blocks
    rid, rdir = begin_run(out_dir)
    results: dict[str, Any] = {}
    for name, sink in sinks.items():
        sink_dir = os.path.join(rdir, name)
        os.makedirs(sink_dir, exist_ok=True)
        results[name] = sink(ds, sink_dir)  # any raise → no publish flip
    # one shared pointer writer (tableio.publish_run): same payload shape as
    # the crawl's publish (n_waves absent here) + superseded-staging cleanup
    publish_run(out_dir, rid)
    return results


def published_sink_dir(out_dir: str, sink_name: str) -> str | None:
    """Resolve a sink's directory through the publish pointer — staged but
    unpublished runs are invisible."""
    rid = published_run(out_dir)
    if rid is None:
        return None
    d = os.path.join(run_dir(out_dir, rid), sink_name)
    return d if os.path.isdir(d) else None


# --- stock sinks ------------------------------------------------------------


def sink_upsert(key: str, n_buckets: int = 16, order_col: str | None = None) -> Sink:
    """Keyed-table sink (K2 analog), fully distributed: ONE bucketed shuffle
    on the key hash, each reduce task merges exactly one bucket file (no two
    tasks touch the same file, no driver loop). Last-write-wins within the
    call is ordered by ``order_col`` when given (required for determinism if
    the input carries duplicate keys)."""

    def sink(ds: rd.Dataset, sink_dir: str) -> int:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from ..sources.tableio import _bucket_ids_of, _bucket_path, _merge_bucket

        def add_bucket(b: pa.Table) -> pa.Table:
            bb = _bucket_ids_of(b, key, n_buckets)
            return b.append_column("_b", pa.array(bb, pa.int64()))

        def merge_group(g: pd.DataFrame) -> pd.DataFrame:
            bucket = int(g["_b"].iloc[0])
            g = g.drop(columns=["_b"]).sort_values(
                order_col if order_col else key, kind="mergesort"
            )
            part = pa.Table.from_pandas(g, preserve_index=False)
            n = _merge_bucket(part, _bucket_path(sink_dir, bucket), key)
            return pd.DataFrame(
                {"bucket": pd.Series([bucket], dtype=np.int64),
                 "n_rows": pd.Series([n], dtype=np.int64)}
            )

        res = (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(merge_group, batch_format="pandas")
            .to_pandas()
        )
        return int(res["n_rows"].sum())

    return sink


def sink_backup(batch_size: int = 256) -> Sink:
    """Content-addressed blob backup sink (K6 analog)."""

    def sink(ds: rd.Dataset, sink_dir: str) -> dict:
        from .backup import backup_corpus

        return backup_corpus(ds, sink_dir, batch_size=batch_size)

    return sink


def sink_parquet() -> Sink:
    """Plain partitioned-parquet spool sink (K1 analog)."""

    def sink(ds: rd.Dataset, sink_dir: str) -> int:
        ds.write_parquet(sink_dir)
        return ds.count()

    return sink
