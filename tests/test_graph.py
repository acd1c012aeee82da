"""Distributed PageRank (pipelines/graph.py): exactness vs a sequential
numpy reference and invariance to parallelism/bucketing."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from content_crawler_ray.pipelines.graph import DAMP_DEN, DAMP_NUM, SCALE, pagerank


def _numpy_pagerank(src, dst, n_iters):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for s in src:
        outdeg[idx[s]] += 1
    r = np.full(n, SCALE // n, dtype=np.int64)
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN // n
    for _ in range(n_iters):
        inc = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            inc[idx[d]] += r[idx[s]] // outdeg[idx[s]]
        r = base + (DAMP_NUM * inc) // DAMP_DEN
    return dict(zip(nodes, r))


def test_pagerank_matches_sequential_reference(ray_session):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, size=300).astype(np.int64)
    dst = rng.integers(0, 40, size=300).astype(np.int64)
    expect = _numpy_pagerank(src, dst, n_iters=3)

    for parallelism, n_buckets in [(1, 4), (7, 16)]:
        ds = rd.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ).repartition(parallelism)
        got = pagerank(ds, n_iters=3, n_buckets=n_buckets).to_pandas()
        got_map = dict(zip(got["node"], got["rank_e9"]))
        assert got_map == expect  # bit-exact, independent of partitioning

    # sanity: hub nodes (high in-degree) outrank leaves
    vals = np.array(list(expect.values()))
    assert vals.min() > 0 and vals.max() > vals.min()
