"""Reverse-link aggregation + merge-write — A3, the ESDocumentLinker analog
(C/ESDocumentLinker.java:37-122).

The reference updates each referenced News/Article document with a
``<type>Tag`` collect-set of referencing entry ids via racy per-doc painless
upserts (exists-check + retry_on_conflict 3). Re-expressed as a deterministic
grouped reduce: emit (target_id, tag_field, source_id) triples →
``groupby(target_id, tag_field)`` collect-set (sorted, deduped) → merge into
the keyed target table through the idempotent upsert sink (tableio.upsert_parquet),
unioning with any tag values already present (the reference's
exists-check-no-duplicate semantics, :41-45)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.tableio import read_upsert_table, upsert_parquet


def collect_links(links: rd.Dataset) -> rd.Dataset:
    """(target_id, tag_field, source_id) → one row per (target_id, tag_field)
    with the sorted-distinct source ids joined as a comma string."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "target_id": [g["target_id"].iloc[0]],
                "tag_field": [g["tag_field"].iloc[0]],
                "sources": [",".join(sorted(set(g["source_id"].astype(str))))],
            }
        )

    return links.groupby(["target_id", "tag_field"]).map_groups(
        collect, batch_format="pandas"
    )


def merge_links_into_table(
    links: rd.Dataset, table_dir: str, key: str = "target_id"
) -> None:
    """Merge collected reverse links into the keyed target table: existing tag
    values union with the new ones (idempotent — replay adds nothing)."""
    new = collect_links(links).to_pandas()
    try:
        existing = read_upsert_table(table_dir).to_pandas()
    except (FileNotFoundError, ValueError):
        existing = pd.DataFrame({key: [], "tag_field": [], "sources": []})
    merged = pd.concat(
        [existing.rename(columns={key: "target_id"})[["target_id", "tag_field", "sources"]], new]
    )
    out = merged.groupby(["target_id", "tag_field"], as_index=False).agg(
        sources=(
            "sources",
            lambda col: ",".join(
                sorted({x for s in col for x in str(s).split(",") if x})
            ),
        )
    )
    out["merge_key"] = out["target_id"].astype(str) + "\x00" + out["tag_field"]
    upsert_parquet(
        pa.Table.from_pandas(out, preserve_index=False), table_dir, key="merge_key"
    )
