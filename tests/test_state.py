"""Stateful layer: cuckoo/bloom filters (pure) and seen/politeness actors."""

import numpy as np

from content_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter


def test_cuckoo_no_false_negatives():
    rng = np.random.Generator(np.random.PCG64(1))
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    keys = np.unique(keys)
    cf = CuckooFilter(capacity=40_000)
    cf.insert(keys)
    assert cf.contains(keys).all()
    other = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    other = np.setdiff1d(other, keys)
    fp = cf.contains(other).mean()
    assert fp < 0.01  # 16-bit fingerprints → ~2^-13 expected


def test_bloom_filter():
    rng = np.random.Generator(np.random.PCG64(2))
    keys = np.unique(rng.integers(0, 2**63, size=10_000, dtype=np.uint64))
    bf = BloomFilter(capacity=20_000, fp_rate=1e-4)
    bf.insert(keys)
    assert bf.contains(keys).all()
    other = np.setdiff1d(rng.integers(0, 2**63, size=10_000, dtype=np.uint64), keys)
    assert bf.contains(other).mean() < 0.01


def test_seen_set_sharded(ray_session):
    from content_crawler_ray.state.seen import SeenSet

    seen = SeenSet.create(3)
    rng = np.random.Generator(np.random.PCG64(3))
    keys = np.unique(rng.integers(0, 2**64, size=5_000, dtype=np.uint64))
    assert not seen.contains(keys).any()
    mask = seen.contains_and_insert(keys)
    assert not mask.any()
    assert seen.contains(keys).all()
    assert seen.size() == len(keys)
    # duplicates within a batch: first occurrence wins
    dup = np.concatenate([keys[:5], keys[:5]])
    assert seen.contains_and_insert(dup).all()
    # snapshot → restore round trip
    parts = seen.snapshot()
    seen2 = SeenSet.create(3)
    seen2.restore(parts)
    assert seen2.contains(keys).all()
    assert seen2.size() == len(keys)


def test_politeness_reserve(ray_session):
    from content_crawler_ray.state.politeness import Politeness

    pol = Politeness.create(2)
    assert pol.reserve("h0", 3) == 0
    assert pol.reserve("h0", 2) == 3
    bases = pol.reserve_many(["h0", "h1", "h2"], [1, 4, 2])
    assert bases == {"h0": 5, "h1": 0, "h2": 0}
    snap = pol.snapshot()
    pol2 = Politeness.create(2)
    pol2.restore(snap)
    assert pol2.reserve("h1", 1) == 4


def test_seen_shard_cuckoo_overflow_resizes(ray_session):
    """A shard past its cuckoo capacity_hint rebuilds the filter at 2x
    instead of aborting the crawl (ADVICE r1); membership stays exact."""
    import numpy as np

    from content_crawler_ray.state.seen import SeenSet

    seen = SeenSet.create(1, capacity_hint=256)  # tiny filter, force overflow
    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    first = seen.contains_and_insert(keys)
    uniq, first_idx = np.unique(keys, return_index=True)
    expect_false = np.zeros(len(keys), dtype=bool)
    expect_false[first_idx] = True
    assert (first == ~expect_false).all()
    again = seen.contains(keys)
    assert again.all()
    assert seen.size() == len(uniq)


def test_seen_shard_bloom_spill_bounds_memory(ray_session):
    """The documented spill tier, wired: past spill_rows the exact base
    freezes into a Bloom page; membership of every inserted key still
    answers True (Bloom has no false negatives), and size() counts the
    spilled keys. Snapshot refuses (spill and checkpointing are exclusive)."""
    import numpy as np
    import pytest

    from content_crawler_ray.state.seen import SeenSet

    seen = SeenSet.create(1, capacity_hint=256, spill_rows=2048)
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(1, 2**62, size=10_000, dtype=np.int64)).astype(np.uint64)
    for i in range(0, len(keys), 1000):
        seen.insert(keys[i : i + 1000])
    assert seen.contains(keys).all()  # no false negatives across tiers
    assert seen.size() == len(keys)
    fresh = np.unique(rng.integers(2**62, 2**63, size=5000, dtype=np.int64)).astype(np.uint64)
    fp = seen.contains(fresh).mean()
    assert fp < 0.01  # documented 1e-4 design rate; loose sandbox bound
    with pytest.raises(Exception):
        seen.snapshot()
