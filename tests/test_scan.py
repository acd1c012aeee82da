"""Distributed prefix-sum (pipelines/scan.py) vs numpy cumsum ground truth."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from content_crawler_ray.pipelines.scan import prefix_sum


def _run(keys: np.ndarray, vals: np.ndarray, n_ranges: int, parallelism: int):
    tbl = pa.table(
        {"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())}
    )
    ds = rd.from_arrow(tbl).repartition(parallelism)
    out = (
        prefix_sum(ds, "k", "v", out_col="run", n_ranges=n_ranges)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return out


@pytest.mark.parametrize("n_ranges,parallelism", [(4, 1), (16, 7), (64, 3)])
def test_prefix_sum_matches_numpy(ray_session, n_ranges, parallelism):
    rng = np.random.default_rng(7)
    keys = rng.permutation(np.arange(1, 2001, dtype=np.int64))
    vals = rng.integers(-50, 1000, size=keys.size, dtype=np.int64)
    out = _run(keys, vals, n_ranges, parallelism)
    order = np.argsort(keys)
    expect = vals[order].cumsum()
    assert np.array_equal(out["k"].to_numpy(), keys[order])
    assert np.array_equal(out["run"].to_numpy(), expect)
    assert np.array_equal(out["v"].to_numpy(), vals[order])


def test_prefix_sum_skewed_key_space(ray_session):
    # dense cluster + far outlier: most fixed-width ranges are EMPTY and the
    # offsets cumsum must still line up across the gap
    rng = np.random.default_rng(11)
    keys = np.concatenate(
        [np.arange(100, dtype=np.int64), np.array([10_000_000], dtype=np.int64)]
    )
    vals = rng.integers(0, 100, size=keys.size, dtype=np.int64)
    out = _run(keys, vals, n_ranges=32, parallelism=5)
    assert np.array_equal(out["run"].to_numpy(), vals[np.argsort(keys)].cumsum())


def test_pack_sequences_bins_monotone(ray_session, sf_dir):
    from content_crawler_ray.pipelines.queries import _PACK_BUDGET, q_pack_sequences

    df = q_pack_sequences(sf_dir).to_pandas().sort_values("doc_id")
    bins = df["bin"].to_numpy()
    assert (np.diff(bins) >= 0).all()  # bins nondecreasing in doc order
    # every bin break happens exactly when the running exclusive total
    # crosses a budget multiple
    excl = df["n_tokens"].to_numpy().cumsum() - df["n_tokens"].to_numpy()
    assert np.array_equal(bins, excl // _PACK_BUDGET)
    assert bins.max() >= 2  # the fixture actually spans several bins


def test_combine_partials_multi_key_nul_safe(ray_session):
    # regression: pandas' hash_pandas_object mis-hashes strings with embedded
    # NUL bytes (the multi-key join separator), splitting one key across
    # buckets; the FNV bucket hash must keep every (a,b) key in ONE bucket
    import pyarrow as pa
    import ray.data as rd

    from content_crawler_ray.pipelines.agg import combine_partials

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y", "y"] * 6, pa.string()),
            "b": pa.array(["p", "q", "p", "q"] * 6, pa.string()),
            "n": pa.array([1] * 24, pa.int64()),
        }
    )
    out = (
        combine_partials(rd.from_arrow(t).repartition(8), ["a", "b"], {"n": "sum"})
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == 4 and (out["n"] == 6).all()
