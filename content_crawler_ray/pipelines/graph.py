"""Distributed PageRank — iterative link analysis over an edge Dataset, the
power-iteration analogue of cc.py's label propagation: each iteration is two
bucketed shuffles (ranks join edges on src → contribution messages keyed by
dst → sum-combine with the node set). Nothing ever gathers to the driver but
the node COUNT.

Arithmetic is integer fixed-point (rank scaled by 1e9, floor division at
every step, damping 85/100) so the result is bit-exact across engines and a
DuckDB twin with unrolled iterations verifies it value-for-value — the same
trick as the repo's e3/e6 oracle columns, extended to an iterative
algorithm. Dangling nodes use the "leaky" formulation (their mass is not
redistributed), the common simplification when rank ORDER is the product.

Scale contract: edges partition by hash(src) (one bucket = one reduce
task's pandas working set, n_buckets from runtime.n_buckets_for); rank rows
are 16 B/node. Skewed in-degree (viral dst) concentrates messages the same
way a hot groupby key would — the salting in skew.py applies if needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import splitmix64
from ..runtime import n_buckets_for

SCALE = 10**9
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    edges: rd.Dataset,
    n_iters: int = 3,
    col_src: str = "src",
    col_dst: str = "dst",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """(node, rank_e9) after ``n_iters`` exact fixed-point power iterations.

    r0 = SCALE // n;  r_{k+1}(v) = SCALE*15//100//n
                                   + (85 · Σ_{u→v} r_k(u) // outdeg(u)) // 100
    Edge rows are a multiset (parallel edges contribute repeatedly).
    """
    n_buckets = n_buckets or n_buckets_for()

    def _bucket(k: np.ndarray) -> pa.Array:
        return pa.array(
            (splitmix64(k.astype(np.int64).view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
            pa.int64(),
        )

    def canon(b: pa.Table) -> pa.Table:
        s = b[col_src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[col_dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "_b": _bucket(s),
            }
        )

    edges_b = edges.map_batches(canon, batch_format="pyarrow").materialize()

    # out-degree attach: all copies of a src share its bucket, so the count
    # and the merge happen inside one map_groups
    def attach_deg(g: pd.DataFrame) -> pa.Table:
        deg = g.groupby("src")["dst"].size()
        return pa.table(
            {
                "src": pa.array(g["src"].to_numpy(), pa.int64()),
                "dst": pa.array(g["dst"].to_numpy(), pa.int64()),
                "outdeg": pa.array(g["src"].map(deg).to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def edge_joinrow(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b["src"],
                "v": b["dst"],
                "w": b["outdeg"],
                "_side": pa.array(np.zeros(b.num_rows, dtype=np.int8), pa.int8()),
                "_b": _bucket(s),
            }
        )

    edges_deg = (
        edges_b.groupby("_b")
        .map_groups(attach_deg, batch_format="pandas")
        .map_batches(edge_joinrow, batch_format="pyarrow")
        .materialize()
    )

    # node set: distinct src ∪ dst (bucketed distinct)
    def node_rows(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        u = np.unique(np.concatenate([s, d]))
        return pa.table({"node": pa.array(u, pa.int64()), "_b": _bucket(u)})

    def distinct_nodes(g: pd.DataFrame) -> pa.Table:
        u = np.unique(g["node"].to_numpy())
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = (
        edges_b.map_batches(node_rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(distinct_nodes, batch_format="pandas")
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank_e9": pa.array([], pa.int64())})
        )
    r0 = SCALE // n
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN // n

    ranks = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "rank": pa.array(np.full(b.num_rows, r0, dtype=np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def rank_joinrow(b: pa.Table) -> pa.Table:
        k = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b["node"],
                "v": b["rank"],
                "w": pa.array(np.zeros(b.num_rows, dtype=np.int64), pa.int64()),
                "_side": pa.array(np.ones(b.num_rows, dtype=np.int8), pa.int8()),
                "_b": _bucket(k),
            }
        )

    def contrib(g: pd.DataFrame) -> pa.Table:
        ed = g[g["_side"] == 0]
        rk = g[g["_side"] == 1]
        m = ed[["k", "v", "w"]].merge(
            rk[["k", "v"]].rename(columns={"v": "_r"}), on="k", how="inner"
        )
        dst = m["v"].to_numpy().astype(np.int64)
        inc = m["_r"].to_numpy().astype(np.int64) // m["w"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(dst, pa.int64()),
                "inc": pa.array(inc, pa.int64()),
                "_own": pa.array(np.zeros(len(dst), dtype=np.int8), pa.int8()),
                "_b": _bucket(dst),
            }
        )

    def own_rows(b: pa.Table) -> pa.Table:
        k = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b["node"],
                "inc": pa.array(np.zeros(b.num_rows, dtype=np.int64), pa.int64()),
                "_own": pa.array(np.ones(b.num_rows, dtype=np.int8), pa.int8()),
                "_b": _bucket(k),
            }
        )

    def sum_combine(g: pd.DataFrame) -> pa.Table:
        own = g[g["_own"] == 1]
        inc = g[g["_own"] == 0].groupby("node")["inc"].sum()
        inc = inc.reindex(own["node"].to_numpy()).fillna(0).to_numpy().astype(np.int64)
        rank = base + (DAMP_NUM * inc) // DAMP_DEN
        return pa.table(
            {
                "node": pa.array(own["node"].to_numpy(), pa.int64()),
                "rank": pa.array(rank, pa.int64()),
            }
        )

    for _ in range(n_iters):
        msgs = (
            edges_deg.union(ranks.map_batches(rank_joinrow, batch_format="pyarrow"))
            .groupby("_b")
            .map_groups(contrib, batch_format="pandas")
        )
        ranks = (
            msgs.union(nodes.map_batches(own_rows, batch_format="pyarrow"))
            .groupby("_b")
            .map_groups(sum_combine, batch_format="pandas")
            .materialize()
        )

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "rank_e9": b["rank"]}),
        batch_format="pyarrow",
    )
