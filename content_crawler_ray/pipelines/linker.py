"""Reverse-link aggregation + merge-write — A3, the ESDocumentLinker analog
(C/ESDocumentLinker.java:37-122).

The reference updates each referenced News/Article document with a
``<type>Tag`` collect-set of referencing entry ids via racy per-doc painless
upserts (exists-check + retry_on_conflict 3). Re-expressed as a deterministic
grouped reduce: emit (target_id, tag_field, source_id) triples → ONE shuffle
keyed on a hash bucket of the merge key → per-bucket vectorized collect-set
(sorted, deduped) → per-bucket merge into the keyed target table, unioning
with any tag values already present (the reference's
exists-check-no-duplicate semantics, :41-45).

Scale shape: the shuffle buckets are ALIGNED with the upsert table's
bucketing (same hash64 % n_buckets of the merge key), so each reduce task
merges straight into exactly one bucket file — collect, union-with-existing
and the effectful write all happen in the same distributed task; nothing
funnels through the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash64_array
from ..sources.tableio import _bucket_path, _merge_bucket

# Persistent TABLE-LAYOUT constant, not a shuffle knob: the collect-set
# shuffle is deliberately aligned with the keyed table's on-disk bucket files
# (_bucket_path(table_dir, b)), which must stay stable across runs — unlike
# the transient shuffle buckets sized by runtime.n_buckets_for.
N_BUCKETS = 16


def _merge_key(target_id: pd.Series, tag_field: pd.Series) -> pd.Series:
    return target_id.astype(str) + "\x00" + tag_field.astype(str)


def _collect_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized collect-set of one shuffle bucket: every (target, field)
    group in one pandas pass — no per-group Python dispatch."""
    g = g.assign(source_id=g["source_id"].astype(str))
    g = g.drop_duplicates(["target_id", "tag_field", "source_id"])
    # lexicographic sort on the STRING form so first-write and the
    # merge-with-existing replay path agree byte-for-byte for numeric ids
    g = g.sort_values(["target_id", "tag_field", "source_id"])
    out = g.groupby(["target_id", "tag_field"], as_index=False, sort=False).agg(
        sources=("source_id", ",".join)
    )
    return out


def _add_bucket(b: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mk = pc.binary_join_element_wise(
        pc.cast(b["target_id"], pa.string()), pc.cast(b["tag_field"], pa.string()), "\x00"
    )
    h = hash64_array(mk)
    return b.append_column(
        "_b", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int64), pa.int64())
    )


def collect_links(links: rd.Dataset) -> rd.Dataset:
    """(target_id, tag_field, source_id) → one row per (target_id, tag_field)
    with the sorted-distinct source ids joined as a comma string."""
    return (
        links.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: _collect_bucket(g.drop(columns=["_b"])), batch_format="pandas"
        )
    )


def merge_links_into_table(
    links: rd.Dataset, table_dir: str, key: str = "target_id"
) -> None:
    """Merge collected reverse links into the keyed target table: existing tag
    values union with the new ones (idempotent — replay adds nothing). The
    collect-set AND the effectful per-bucket merge run inside the same
    shuffle reduce task (buckets aligned with the table's hash layout)."""
    import os

    os.makedirs(table_dir, exist_ok=True)

    def collect_and_merge(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        new = _collect_bucket(g.drop(columns=["_b"]))
        new["merge_key"] = _merge_key(new["target_id"], new["tag_field"])
        path = _bucket_path(table_dir, b)
        if os.path.exists(path):
            import pyarrow.parquet as pq

            existing = pq.read_table(path).to_pandas()
            both = pd.concat(
                [existing[["target_id", "tag_field", "sources", "merge_key"]], new]
            )
            new = both.groupby(
                ["target_id", "tag_field", "merge_key"], as_index=False, sort=False
            ).agg(
                sources=(
                    "sources",
                    lambda col: ",".join(
                        sorted({x for s in col for x in str(s).split(",") if x})
                    ),
                )
            )[["target_id", "tag_field", "sources", "merge_key"]]
        n = _merge_bucket(
            pa.Table.from_pandas(
                new[["target_id", "tag_field", "sources", "merge_key"]],
                preserve_index=False,
            ),
            path,
            "merge_key",
        )
        return pd.DataFrame({"bucket": [b], "n_rows": [np.int64(n)]})

    (
        links.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(collect_and_merge, batch_format="pandas")
        .materialize()
    )


def registry_update_from_spool(out_dir: str, registry_dir: str) -> int:
    """Registry phase as a SPOOL RE-READ — the reference's second pass over
    the crawl's target dir (M/MendeleyDocumentCrawler.java:140-150
    ``registryFiles``: after the crawl completes, every spooled response is
    re-read and fed to the UpdateRegistryHandler).

    Ray shape: ``read_fetched`` resolves the PUBLISHED run's spool, each
    fetched row contributes a (target=host, field='citedBy',
    source=url_hash) link, and the links flow through the same idempotent
    collect-set merge as J4 (`merge_links_into_table`) — re-running the
    phase adds nothing. Returns the number of fetched rows processed."""
    import pyarrow.compute as pc

    from .crawl import read_fetched

    fetched = read_fetched(out_dir).materialize()

    def to_links(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "target_id": b["host"],
                "tag_field": pa.array(["citedBy"] * b.num_rows, pa.string()),
                "source_id": pc.cast(b["url_hash"], pa.string()),
            }
        )

    links = fetched.map_batches(to_links, batch_format="pyarrow")
    merge_links_into_table(links, registry_dir)
    return fetched.count()
