"""Image near-duplicate detection by perceptual hash — the image-payload
counterpart of the text MinHash pipeline, built on the shared hamming-LSH
engine (pipelines/hamming.py): 4 × 16-bit bands over the 64-bit phash
(functions/codecs.phash64), bucketed band shuffle, exact-hamming verify with
the hashes riding the band rows — no broadcast id→hash map (a 10^10-row dict
would be ~1 TB of driver heap counting Python object overhead)."""

from __future__ import annotations

import ray.data as rd

from .hamming import MAX_BUCKET, N_BANDS, bands_of, hamming_lsh_pairs

_bands_of = bands_of  # back-compat aliases (tests, callers)


def phash_neardup_pairs(
    corpus_path: str,
    max_hamming: int = 6,
    n_buckets: int | None = None,
    skip_counter=None,
) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs of images with phash distance ≤ threshold.
    ``n_buckets`` defaults to the cluster-derived count (runtime.n_buckets_for
    inside the engine); hot band buckets over MAX_BUCKET are logged/counted
    via ``skip_counter``, never dropped silently."""
    ds = rd.read_parquet(corpus_path, columns=["image_id", "phash"])
    return hamming_lsh_pairs(
        ds, id_col="image_id", hash_col="phash", max_hamming=max_hamming,
        n_buckets=n_buckets, skip_counter=skip_counter,
    )
