"""Deduplication operators over the ``documents`` table — first-class
training-data-pipeline components (exact, bag-of-words, MinHash+LSH, SimHash).

Scale shapes:
  - exact / bow dedup: add a 64-bit content hash in a vectorized map_batches,
    then ONE groupby shuffle on the (uniform) hash key — never on raw text.
  - MinHash+LSH: shingle→signature per batch (stateful params in an actor
    pool), explode to (band, band_hash, doc_id) rows, groupby the band key,
    emit candidate pairs per bucket, verify exact Jaccard. The verify stage
    broadcasts the doc shingle sets at sandbox scale (documents are small);
    at 100 TB the verify is a self-join by doc_id on the bucketed pairs —
    noted inline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as T
from ..functions.hashing import hash64_array

MAX_BUCKET = 64  # LSH buckets larger than this are skipped (logged); a bucket
# this hot at 128-perm/16-band parameters means near-identical boilerplate —
# the scale path salts it by doc_id range instead of emitting O(n²) pairs.


def exact_dedup_first(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Keep min-doc_id row per exact text (A1 analog, keyed on content hash)."""

    n_buckets = 16

    def add_hash(b: pa.Table) -> pa.Table:
        h = hash64_array(b[text_col])
        b = b.append_column("_h", pa.array(h, pa.uint64()))
        return b.append_column(
            "_b", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    # bucket the shuffle: one vectorized pandas dedup per bucket instead of a
    # Python map_groups call per distinct hash (pathological at many groups)
    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("doc_id").drop_duplicates("_h").drop(columns=["_h", "_b"])
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(first_per_hash, batch_format="pandas")
    )


class MinHashStage:
    """Actor-pool stage: documents → (doc_id, band, band_hash) LSH rows.
    Permutation params built once per actor (__init__), not per batch."""

    def __init__(self, n_perm: int = 128, n_bands: int = 16, shingle_k: int = 5):
        self.a, self.b = T.minhash_params(n_perm)
        self.n_bands = n_bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        doc_ids, bands, bhashes = [], [], []
        for i, txt in enumerate(texts):
            sig = T.minhash_signature(T.char_shingles(txt or "", self.k), self.a, self.b)
            bh = T.band_hashes(sig, self.n_bands)
            doc_ids.extend([ids[i]] * self.n_bands)
            bands.extend(range(self.n_bands))
            bhashes.extend(bh.tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(np.array(bhashes, dtype=np.uint64), pa.uint64()),
            }
        )


def _emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs from every (band, band_hash) group of one shuffle
    bucket — vectorized per group, ONE map_groups call per bucket (ray's
    per-group dispatch is Python-level and pathological at many tiny groups)."""
    out_a, out_b = [], []
    for _, grp in g.groupby(["band", "band_hash"], sort=False):
        ids = np.sort(grp["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > MAX_BUCKET:
            continue
        a, b = np.triu_indices(len(ids), k=1)
        out_a.append(ids[a])
        out_b.append(ids[b])
    if not out_a:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)}
        )
    return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})


def minhash_candidate_pairs(docs: rd.Dataset, concurrency: int = 4) -> rd.Dataset:
    """LSH candidate (doc_a, doc_b) pairs, deduped. Shuffles key on a hash
    BUCKET of the band key so each reduce handles a whole bucket of groups
    with one vectorized pandas pass."""
    n_buckets = 32
    # autoscaling pool (min 1): a fixed pool of `concurrency` actors could
    # reserve every CPU of a small session and starve the downstream
    # groupby shuffle (deadlock) — see ray_guide actor-pool sizing note
    lsh = docs.map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        bb = (
            b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return b.append_column("_b", pa.array(bb, pa.int64()))

    pairs = (
        lsh.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(_emit_pairs, batch_format="pandas")
    )

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            bb = (
                (
                    b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    * np.uint64(31)
                    + b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
                )
                % np.uint64(n_buckets)
            ).astype(np.int64)
        return b.append_column("_b", pa.array(bb, pa.int64()))

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["_b"]),
            batch_format="pandas",
        )
    )


def minhash_verified_pairs(
    docs_path: str, threshold: float = 0.8, shingle_k: int = 5, concurrency: int = 4
) -> rd.Dataset:
    """Near-dup pairs with exact Jaccard ≥ threshold, LSH-pruned.

    Verification broadcasts doc texts via ray.put (fits for sandbox scales;
    at 10^10 docs this becomes a double hash-join of pairs against the docs
    table on doc_a / doc_b — same downstream verify kernel)."""
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    texts = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        texts.update(dict(zip(b["doc_id"].to_pylist(), b["text"].to_pylist())))
    texts_ref = ray.put(texts)
    cands = minhash_candidate_pairs(docs, concurrency)

    def verify(batch: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        out_a, out_b, jac = [], [], []
        cache: dict[int, np.ndarray] = {}

        def sh(d):
            if d not in cache:
                cache[d] = T.char_shingles(tx.get(d) or "", shingle_k)
            return cache[d]

        for x, y in zip(da, db):
            j = T.jaccard(sh(x), sh(y))
            if j >= threshold:
                out_a.append(x)
                out_b.append(y)
                jac.append(int(np.floor(j * 1000)))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_e3": pa.array(jac, pa.int64()),
            }
        )

    return cands.map_batches(verify, batch_format="pyarrow")


def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash) — 64-bit SimHash per document."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split(" ").map(lambda ts: [t for t in ts if t])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": toks.map(T.simhash64).astype(np.int64),
            }
        )

    return docs.map_batches(sig, batch_format="pandas")
