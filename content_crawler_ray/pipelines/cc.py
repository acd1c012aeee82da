"""Distributed connected components — near-dup pairs → duplicate clusters.

Every near-dup pipeline in this repo (minhash, simhash, phash, ngram,
embedding) emits PAIRS; deduplicating a corpus needs the transitive closure
of those pairs — the duplicate CLUSTER — so one canonical representative per
cluster survives (reference analog: the crawler's duplicate-ID
reconciliation collapses chains of equivalent records the same way).

Algorithm: iterative min-label propagation (the standard map-reduce CC;
cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — this is the plain hash-join variant, adequate because dup-cluster
diameters are tiny). Per round every node's label becomes min(own label,
labels of its neighbours):

  shuffle 1 (keyed on edge src): attach label[src] to each edge → messages
             (dst, label[src])        — one vectorized pandas merge/bucket
  shuffle 2 (keyed on node):    new label = min(own ∪ messages) per node,
             plus a changed flag      — one vectorized groupby-min/bucket

repeated until zero labels change — O(cluster diameter) rounds. The driver
holds only the per-round changed COUNT (one small aggregate); labels and
edges stay Datasets end to end, materialized per round as the iteration
barrier (one int64 pair per node — not the corpus). Edges materialize once
and are re-read each round.

Block-count discipline: Ray's sort-based groupby emits roughly as many
blocks as it ingests, so without a cap each round's union (edges + labels +
messages) compounds the label block count geometrically — measured 3× wall
time PER ROUND on a 5k-edge graph before the fix. Every materialized
iteration state is therefore repartitioned to n_buckets blocks first,
making round cost constant in the round number.

Partitioning assumption: all rows of one hash bucket fit a reduce task
(n_buckets from runtime.n_buckets_for, rises with cluster/input size).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

logger = logging.getLogger(__name__)

from ..functions.hashing import splitmix64
from ..runtime import n_buckets_for


def connected_components(
    pairs: rd.Dataset,
    col_a: str = "a",
    col_b: str = "b",
    max_rounds: int = 50,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Components of the undirected graph given by (col_a, col_b) edge rows.

    Returns one ``(node, component)`` row per node appearing in >=1 edge,
    where component = the smallest node id reachable from it. Deterministic;
    node ids must be int64-representable.

    Built under runtime.no_op_reservation for consistency with the other
    barrier-dominated engines (runtime.py rationale). Measured NEUTRAL here
    (53.6 s vs 53.5 s on q_dedup_clusters@sf0.1, 32 CPUs, min-of-2 A/B):
    each CC round's plan is small enough that reservation never starves its
    maps — unlike the minhash plan the wrap was introduced for.
    """
    from ..runtime import no_op_reservation

    with no_op_reservation():
        return _connected_components(pairs, col_a, col_b, max_rounds, n_buckets)


def _connected_components(
    pairs: rd.Dataset,
    col_a: str,
    col_b: str,
    max_rounds: int,
    n_buckets: int | None,
) -> rd.Dataset:
    n_buckets = n_buckets or n_buckets_for()

    def _bucket(k: np.ndarray) -> pa.Array:
        return pa.array(
            (splitmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
            pa.int64(),
        )

    def to_edges(b: pa.Table) -> pa.Table:
        a = b[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table(
            {
                "k": pa.array(src, pa.int64()),   # join key of shuffle 1
                "v": pa.array(dst, pa.int64()),
                "_b": _bucket(src),
            }
        )

    edges = (
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .repartition(n_buckets)
        .materialize()
    )

    # seed labels: label(x) = min(x, direct neighbours) — one free round
    def seed(b: pa.Table) -> pa.Table:
        src = b["k"].to_numpy(zero_copy_only=False)
        dst = b["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b["k"],
                "label": pa.array(np.minimum(src, dst), pa.int64()),
                "_b": b["_b"],  # hash(src) == hash(node): reuse
            }
        )

    def seed_combine(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("node", as_index=False)["label"].min()
        return pa.table(
            {
                "node": pa.array(out["node"].to_numpy(), pa.int64()),
                "label": pa.array(out["label"].to_numpy(), pa.int64()),
            }
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(seed_combine, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )

    def label_as_joinrow(b: pa.Table) -> pa.Table:
        k = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b["node"],
                "v": b["label"],
                "_b": _bucket(k),
                "_side": pa.array(np.ones(b.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def edge_as_joinrow(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_side", pa.array(np.zeros(b.num_rows, dtype=np.int8), pa.int8())
        )

    def join_msgs(g: pd.DataFrame) -> pa.Table:
        lab = g[g["_side"] == 1]
        ed = g[g["_side"] == 0]
        m = ed[["k", "v"]].merge(
            lab[["k", "v"]].rename(columns={"v": "_lab"}), on="k", how="inner"
        )
        node = m["v"].to_numpy().astype(np.int64)  # message target = edge dst
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "label": pa.array(m["_lab"].to_numpy(), pa.int64()),
                "_own": pa.array(np.zeros(len(node), dtype=np.int8), pa.int8()),
                "_b": _bucket(node),
            }
        )

    def min_combine(g: pd.DataFrame) -> pa.Table:
        new = g.groupby("node")["label"].min()
        own = g.loc[g["_own"] == 1].set_index("node")["label"]
        new = new.reindex(own.index)  # every node has exactly one own row
        return pa.table(
            {
                "node": pa.array(own.index.to_numpy(), pa.int64()),
                "label": pa.array(new.to_numpy(), pa.int64()),
                "changed": pa.array((new < own).to_numpy().astype(np.int64), pa.int64()),
            }
        )

    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        msgs = (
            edges.map_batches(edge_as_joinrow, batch_format="pyarrow")
            .union(labels.map_batches(label_as_joinrow, batch_format="pyarrow"))
            .groupby("_b")
            .map_groups(join_msgs, batch_format="pandas")
        )
        own_rows = labels.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "label": b["label"],
                    "_own": pa.array(np.ones(b.num_rows, dtype=np.int8), pa.int8()),
                    "_b": _bucket(b["node"].to_numpy(zero_copy_only=False)),
                }
            ),
            batch_format="pyarrow",
        )
        new = (
            msgs.union(own_rows)
            .groupby("_b")
            .map_groups(min_combine, batch_format="pandas")
            .repartition(n_buckets)
            .materialize()
        )
        n_changed = new.sum("changed")
        labels = new.map_batches(
            lambda b: b.select(["node", "label"]), batch_format="pyarrow"
        ).materialize()
        if not n_changed:
            break
    else:
        logger.warning(
            "connected_components hit max_rounds=%d before convergence "
            "(last round changed %d labels) — results may be partial",
            max_rounds,
            n_changed,
        )
    logger.info("connected_components converged in %d rounds", rounds)

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )
