"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_topk``: brute-force cosine top-k — the broadcast pattern: the query
  matrix is ray.put ONCE, every batch does one numpy matmul against it and
  emits its batch-local top-k; a tiny groupby(query_id) merge yields the
  global top-k. No full-dataset shuffle; scales linearly with corpus size.
- ``ivf_topk``: the scale path — vectors bucketed to their nearest coarse
  centroid in one map_batches pass (IVF assignment); the search probes only
  the query's ``n_probe`` nearest buckets. Approximate by design (no SQL
  oracle; rows-only check).
- ``embedding_neardup_pairs``: blocked near-duplicate detection — pairs
  within the same ``label`` block above a cosine threshold, one gram matrix
  per block inside groupby(label).map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _matrix(embeddings: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(embeddings, pa.ChunkedArray):
        embeddings = embeddings.combine_chunks()
    flat = embeddings.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(embeddings)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(
    embeddings_path: str, n_queries: int = 5, k: int = 10
) -> rd.Dataset:
    """(query_id, vec_id) of the k nearest rows by cosine per query vector
    (queries = rows with vec_id < n_queries). Ties broken by vec_id."""
    ds = rd.read_parquet(embeddings_path, columns=["vec_id", "embedding"])
    qtbl = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    qm = _normalize(np.stack(qtbl["embedding"].to_numpy()).astype(np.float64))
    qids = qtbl["vec_id"].to_numpy()
    q_ref = ray.put((qids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        vm = _normalize(_matrix(batch["embedding"]))
        sims = qm @ vm.T  # (n_q, n_batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(qids)):
            order = np.lexsort((vids, -sims[qi]))[:kk]
            out_q.extend([qids[qi]] * kk)
            out_v.extend(vids[order].tolist())
            out_s.extend(sims[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g[["query_id", "vec_id"]]

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def train_centroids(
    ds: rd.Dataset, n_centroids: int = 16, n_iters: int = 3, stride: int | None = None
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) coarse-centroid training.

    Init = ``n_centroids`` rows spread across the vec_id range (stride
    sampling — deterministic and better-separated than 'first k rows').
    Each iteration is ONE streaming pass: every batch assigns its vectors
    to the nearest centroid and emits k partial (count, sum-vector) rows;
    the driver combines k×dim floats and renormalizes — the dataset itself
    is never materialized. Spherical Lloyd is monotone in the summed cosine
    objective, so n_iters bounds work, not correctness."""
    if stride is None:
        n_rows = ds.count()
        stride = max(1, n_rows // n_centroids)

    def _stride_rows(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(v % stride == 0))

    seed = (
        ds.map_batches(_stride_rows, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    cm = _normalize(np.stack(seed["embedding"].to_numpy()[:n_centroids]).astype(np.float64))

    for _ in range(n_iters):
        cm_ref = ray.put(cm)
        kc, dim = cm.shape

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cm_ref)
            vm = _normalize(_matrix(batch["embedding"]))
            assign = np.argmax(vm @ c.T, axis=1)
            counts = np.bincount(assign, minlength=kc).astype(np.int64)
            sums = np.zeros((kc, dim))
            np.add.at(sums, assign, vm)
            return pa.table(
                {
                    "centroid": pa.array(np.arange(kc), pa.int64()),
                    "count": pa.array(counts, pa.int64()),
                    "sum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = p.groupby("centroid")["count"].sum().to_numpy()
        sums = np.zeros((kc, dim))
        for cid, grp in p.groupby("centroid"):
            sums[int(cid)] = np.sum(np.stack(grp["sum"].to_numpy()), axis=0)
        nonzero = counts > 0
        new_cm = cm.copy()
        new_cm[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
        cm = new_cm
    return cm


def ivf_topk(
    embeddings_path: str,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_iters: int = 2,
) -> rd.Dataset:
    """IVF-bucketed approximate top-k: coarse centroids trained by
    distributed spherical k-means (``train_centroids``); assignment is
    one vectorized argmax per batch; search scans only ``n_probe`` buckets."""
    ds = rd.read_parquet(embeddings_path, columns=["vec_id", "embedding"])
    cm = train_centroids(ds, n_centroids, n_iters=train_iters)
    head = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    head = head.sort_values("vec_id")
    qdf = head[head["vec_id"] < n_queries]
    qm = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qids = qdf["vec_id"].to_numpy()
    refs = ray.put((cm, qids, qm))

    def assign_and_score(batch: pa.Table) -> pa.Table:
        cm, qids, qm = ray.get(refs)
        vm = _normalize(_matrix(batch["embedding"]))
        bucket = np.argmax(vm @ cm.T, axis=1)
        probe = np.argsort(-(qm @ cm.T), axis=1)[:, :n_probe]  # buckets per query
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = qm @ vm.T
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(bucket, probe[qi])
            if not mask.any():
                continue
            bs = sims[qi][mask]
            bv = vids[mask]
            order = np.lexsort((bv, -bs))[: min(k, len(bv))]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(bv[order].tolist())
            out_s.extend(bs[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g[["query_id", "vec_id"]]

    return (
        ds.map_batches(assign_and_score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def embedding_neardup_pairs(
    embeddings_path: str,
    threshold: float = 0.35,
    hot_label_rows: int = 4096,
    n_salt: int = 4,
) -> rd.Dataset:
    """(vec_a, vec_b) same-label pairs with cosine ≥ threshold (blocked
    near-dup; the label is the blocking key).

    Hot-label salting: a cheap label-count pre-pass (label column only) finds
    labels above ``hot_label_rows``; each hot label's rows are split into
    ``n_salt`` shards by ``hash(vec_id)`` and replicated to the
    S·(S+1)/2 shard-PAIR groups, so a hot label's O(n²) scan is shared by
    many tasks instead of one (cross-salt pair coverage is exact: pair
    (a,b) lands in exactly the (shard_a, shard_b) group). Cold labels keep
    the single-group path with zero replication. Within every group the
    scan is the tiled gram kernel — memory ≤ tile² doubles regardless of
    skew."""
    from ..functions.hashing import splitmix64

    ds = rd.read_parquet(embeddings_path, columns=["vec_id", "embedding", "label"])

    # pre-pass over ONLY the label column: per-batch value_counts partials,
    # tiny driver combine (one row per label per batch)
    counts = (
        rd.read_parquet(embeddings_path, columns=["label"])
        .map_batches(
            lambda b: b["label"].value_counts().rename_axis("label").reset_index(name="n"),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("label")["n"]
        .sum()
    )
    hot = frozenset(counts[counts > hot_label_rows].index)

    tile = 2048  # gram memory stays ≤ tile² doubles per step

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        base = b[["vec_id", "embedding", "label"]]
        is_hot = base["label"].isin(hot).to_numpy()
        cold = base[~is_hot].copy()
        cold["_s"] = np.int64(0)
        cold["_pi"] = np.int64(-1)  # cold sentinel: one group per label
        parts = [cold]
        hd = base[is_hot]
        if len(hd):
            s = (
                splitmix64(hd["vec_id"].to_numpy().astype(np.int64).view(np.uint64))
                % np.uint64(n_salt)
            ).astype(np.int64)
            for t in range(n_salt):
                rep = hd.copy()
                rep["_s"] = s
                i = np.minimum(s, t)
                j = np.maximum(s, t)
                rep["_pi"] = i * n_salt + j
                parts.append(rep)
        return pd.concat(parts, ignore_index=True)

    def _tiled_pairs(m, vids, mi_rows=None, vi=None):
        """Upper-triangle scan (mi_rows None) or full cross scan of
        (vi, mi_rows) × (vids, m); returns (a_ids, b_ids) lists."""
        out_a, out_b = [], []
        if mi_rows is None:
            n = len(vids)
            for i0 in range(0, n, tile):
                mi = m[i0 : i0 + tile]
                for j0 in range(i0, n, tile):
                    gram = mi @ m[j0 : j0 + tile].T
                    if i0 == j0:
                        a, b = np.where(np.triu(gram >= threshold, k=1))
                    else:
                        a, b = np.where(gram >= threshold)
                    out_a.append(vids[i0 + a])
                    out_b.append(vids[j0 + b])
        else:
            for i0 in range(0, len(vi), tile):
                mi = mi_rows[i0 : i0 + tile]
                for j0 in range(0, len(vids), tile):
                    a, b = np.where(mi @ m[j0 : j0 + tile].T >= threshold)
                    out_a.append(vi[i0 + a])
                    out_b.append(vids[j0 + b])
        return out_a, out_b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        pi = int(g["_pi"].iloc[0])
        vids_all = g["vec_id"].to_numpy()
        si, sj = divmod(pi, n_salt) if pi >= 0 else (0, 0)
        if pi < 0 or si == sj:
            rows = g if pi < 0 else g[g["_s"].to_numpy() == si]
            m = _normalize(np.stack(rows["embedding"].to_numpy()).astype(np.float64))
            vids = rows["vec_id"].to_numpy()
            order = np.argsort(vids)
            out_a, out_b = _tiled_pairs(m[order], vids[order])
        else:
            sarr = g["_s"].to_numpy()
            lt = g[sarr == si]
            rt = g[sarr == sj]
            if not len(lt) or not len(rt):
                out_a, out_b = [], []
            else:
                ml = _normalize(np.stack(lt["embedding"].to_numpy()).astype(np.float64))
                mr = _normalize(np.stack(rt["embedding"].to_numpy()).astype(np.float64))
                ra, rb = _tiled_pairs(mr, rt["vec_id"].to_numpy(), ml, lt["vec_id"].to_numpy())
                # cross pairs: enforce vec_a < vec_b (triangle path does this
                # by construction)
                if ra:
                    av = np.concatenate(ra)
                    bv = np.concatenate(rb)
                    out_a = [np.minimum(av, bv)]
                    out_b = [np.maximum(av, bv)]
                else:
                    out_a, out_b = [], []
        if not out_a:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=vids_all.dtype),
                    "vec_b": pd.Series([], dtype=vids_all.dtype),
                }
            )
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)}
        )

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby(["label", "_pi"])
        .map_groups(pairs, batch_format="pandas")
    )
