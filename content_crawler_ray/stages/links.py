"""Link extraction + frontier-row construction (the reference's next-URL
discovery, M/MendeleyPager.java:144-147, generalized to N links per fetched
resource).

Captions are scanned for ``href=<url>`` tokens. Only the (typically small)
subset of rows whose caption contains a link pays the per-row regex findall;
canonicalization / hashing / host extraction of the produced link rows is
fully vectorized (functions/urls, functions/hashing).

Discovered-row ordering contract (must match simulator.py):
  priority  = parent_priority * 0.5          (float32 math)
  depth     = parent_depth + 1               (dropped when > max_depth)
  seed_rank = parent_seed_rank * 1000 + j    (j = link index in the caption)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_array
from ..functions.urls import canonicalize_array, host_of_array
from ..simulator import LINK_PRIORITY_DECAY, LINK_RANK_BASE, LINK_RE

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
        ("seed_rank", pa.int64()),
    ]
)


def empty_frontier() -> pa.Table:
    return FRONTIER_SCHEMA.empty_table()


class ExtractLinks:
    """map_batches stage: fetched batch → frontier-candidate batch."""

    def __init__(self, max_depth: int = 3):
        self.max_depth = max_depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.equal(batch["status"], 200), pc.less(batch["depth"], self.max_depth)
        )
        cand = batch.filter(pc.fill_null(ok, False))
        caps = cand["caption"].to_pylist()
        prios = cand["priority"].to_numpy(zero_copy_only=False).astype(np.float32)
        depths = cand["depth"].to_numpy(zero_copy_only=False)
        ranks = cand["seed_rank"].to_numpy(zero_copy_only=False)
        urls, ps, ds, rs = [], [], [], []
        for i, cap in enumerate(caps):
            if not cap or "href=" not in cap:
                continue
            for j, link in enumerate(LINK_RE.findall(cap)):
                urls.append(link)
                ps.append(np.float32(prios[i] * np.float32(LINK_PRIORITY_DECAY)))
                ds.append(depths[i] + 1)
                rs.append(ranks[i] * LINK_RANK_BASE + j)
        if not urls:
            return empty_frontier()
        canon = canonicalize_array(pa.array(urls, pa.string()))
        return pa.table(
            {
                "url": canon,
                "url_hash": pa.array(hash64_array(canon), pa.uint64()),
                "host": host_of_array(canon),
                "priority": pa.array(np.array(ps, dtype=np.float32), pa.float32()),
                "depth": pa.array(np.array(ds, dtype=np.int32), pa.int32()),
                "seed_rank": pa.array(np.array(rs, dtype=np.int64), pa.int64()),
            }
        )
