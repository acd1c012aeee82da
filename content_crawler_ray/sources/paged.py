"""Paged-source readers — the reference's pager family re-expressed.

- S2/S3 (ContentfulPager / ManagementPager, C/ContentfulPager.java:29-92):
  skip/limit pagers whose offsets are known up front → embarrassingly
  parallel: one page spec per row, fanned out with map_batches, each task
  reading only its key range (parquet predicate pushdown).
- S4 (PageableIterable, M/PageableIterable.java:25-64): the generic
  "supplier function → pages" shape is ``read_paged(fetch_page, n_pages)``.
- S1's sequential *cursor* chain (next URL only known after the previous
  response) is deliberately NOT a pager here — that is the crawl frontier
  (pipelines/crawl.py), the engine's central generalization.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def page_specs(n_rows: int, page_size: int) -> list[dict]:
    return [
        {"page": p, "lo": p * page_size, "hi": min((p + 1) * page_size, n_rows)}
        for p in range((n_rows + page_size - 1) // page_size)
    ]


def read_paged(
    fetch_page: Callable[[int, int, int], pa.Table], n_rows: int, page_size: int
) -> rd.Dataset:
    """Generic offset pager: ``fetch_page(page, lo, hi)`` runs as one Ray task
    per page (the S4 supplier shape, parallel because offsets are precomputed)."""
    specs_list = page_specs(n_rows, page_size)
    # from_items builds ONE block by default — pages would then run
    # sequentially in a single task; one block per page restores the
    # embarrassingly-parallel shape (ADVICE r1)
    specs = rd.from_items(specs_list, override_num_blocks=max(1, len(specs_list)))

    def fetch(batch) -> pa.Table:
        return fetch_page(int(batch["page"][0]), int(batch["lo"][0]), int(batch["hi"][0]))

    return specs.map_batches(fetch, batch_size=1, batch_format="pandas")


def read_key_paged(
    parquet_path: str, key: str, n_keys: int, page_size: int, columns: list[str] | None = None
) -> rd.Dataset:
    """Key-range pager over a parquet table: each page reads only its key
    range via predicate pushdown and tags rows with the page number."""

    def fetch(page: int, lo: int, hi: int) -> pa.Table:
        t = pq.read_table(
            parquet_path,
            columns=columns,
            filters=[(key, ">=", lo), (key, "<", hi)],
        )
        return t.append_column("page", pa.array([page] * t.num_rows, pa.int64()))

    return read_paged(fetch, n_keys, page_size)
