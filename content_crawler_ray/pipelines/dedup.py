"""Deduplication operators over the ``documents`` table — first-class
training-data-pipeline components (exact, bag-of-words, MinHash+LSH, SimHash).

Scale shapes:
  - exact / bow dedup: add a 64-bit content hash in a vectorized map_batches,
    then ONE groupby shuffle on the (uniform) hash key — never on raw text.
  - MinHash+LSH: shingle→signature per batch (task-form stage, params
    cached per worker), explode to (band, band_hash, doc_id) rows, groupby
    the band key,
    emit candidate pairs per bucket, verify exact Jaccard. The verify stage
    shuffles pair endpoints + doc texts on the same doc-id bucket key (text
    ships once), then pivots pairs together on a tiny second shuffle — no
    driver-side or broadcast corpus materialization, so it holds at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import text as T
from ..functions.hashing import hash64_array
from ..runtime import n_buckets_for, report_skips

MAX_BUCKET = 64  # LSH buckets larger than this are skipped (logged + counted
# via runtime.report_skips — a silent cap would read as full coverage); a bucket
# this hot at 128-perm/16-band parameters means near-identical boilerplate —
# the scale path salts it by doc_id range instead of emitting O(n²) pairs.


def exact_dedup_first(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Keep min-doc_id row per exact text (A1 analog, keyed on content hash)."""

    n_buckets = n_buckets_for()

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
    """documents → (doc_id, band, band_hash) LSH rows. Permutation params
    built once per instance (__init__), not per batch; dispatched as a
    TASK stage via _minhash_rows' per-worker cache."""

    def __init__(self, n_perm: int = 128, n_bands: int = 16, shingle_k: int = 5):
        self.a, self.b = T.minhash_params(n_perm)
        self.n_bands = n_bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Per-doc composition kept DELIBERATELY (round-4 VERDICT stretch,
        # measured negative): four batch-vectorized variants (whole-batch
        # FNV window pass + chunked 128-perm matrix with segment-min;
        # distinct-shingle matrix + row/column gather; Mersenne division-free
        # mod) all measured 0.40–0.73× of this loop on the 20k-doc corpus.
        # The op count (n_perm × n_shingles) is layout-invariant and this
        # loop's per-doc matrices (~128×600) stay L2-resident, while every
        # batched layout streams ~13 GB of temporaries. Numbers in
        # BASELINE.md "MinHash kernel vectorization (negative result)".
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


_MINHASH_STAGE_CACHE: dict = {}


def _minhash_rows(
    batch: pa.Table, n_perm: int = 128, n_bands: int = 16, shingle_k: int = 5
) -> pa.Table:
    """Task-form signature stage: the (cheap) permutation params build once
    per worker process via a module-level cache — the same amortization an
    actor __init__ gives, without pool-sizing pathologies (see
    _candidate_pairs_raw)."""
    key = (n_perm, n_bands, shingle_k)
    st = _MINHASH_STAGE_CACHE.get(key)
    if st is None:
        st = _MINHASH_STAGE_CACHE[key] = MinHashStage(n_perm, n_bands, shingle_k)
    return st(batch)


def _emit_pairs(g: pd.DataFrame, skip_counter=None) -> pd.DataFrame:
    """Candidate pairs from every (band, band_hash) group of one shuffle
    bucket — NO per-group Python loop (a pandas groupby iteration over the
    ~1 group/doc/band population measured 64 cpu-s at 100k docs): one
    lexsort finds group boundaries, then groups are processed SIZE-bucketed
    (≤ MAX_BUCKET distinct sizes) so each size's pair expansion is a single
    gather + triu over a (n_groups_of_size, size) matrix."""
    slot = int(g["_b"].iloc[0]) if len(g) else 0
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)}
    )
    if not len(g):
        report_skips(skip_counter, 0, 0, "minhash_lsh", slot=slot)
        return empty
    band = g["band"].to_numpy()
    bh = g["band_hash"].to_numpy()
    ids = g["doc_id"].to_numpy()
    order = np.lexsort((ids, bh, band))
    band_s, bh_s, ids_s = band[order], bh[order], ids[order]
    new = np.concatenate([[True], (band_s[1:] != band_s[:-1]) | (bh_s[1:] != bh_s[:-1])])
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.concatenate([starts, [len(ids_s)]]))
    hot = sizes > MAX_BUCKET
    report_skips(
        skip_counter, int(hot.sum()), int(sizes[hot].sum()), "minhash_lsh", slot=slot
    )
    out_a, out_b = [], []
    emit = (sizes >= 2) & ~hot
    for s in np.unique(sizes[emit]):
        sel = starts[emit & (sizes == s)]
        m = ids_s[sel[:, None] + np.arange(s)[None, :]]  # ids sorted in-group
        a, b = np.triu_indices(int(s), k=1)
        out_a.append(m[:, a].ravel())
        out_b.append(m[:, b].ravel())
    if not out_a:
        return empty
    return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})


def _candidate_pairs_raw(
    docs: rd.Dataset, concurrency: int | None = None, skip_counter=None
) -> rd.Dataset:
    """LSH candidate (doc_a, doc_b) pairs, UNdeduped — a pair appears once per
    shared band. One groupby shuffle keyed on a hash BUCKET of the band key so
    each reduce handles a whole bucket of groups with one vectorized pass."""
    n_buckets = n_buckets_for(floor=32)
    # TASK-form signature stage, not an actor pool. The permutation params
    # are microseconds to build (a seeded PCG64 draw) and are cached once
    # per WORKER PROCESS below — the actor pool bought nothing here and
    # measured badly twice in the round-5 op-scaling pairs: a constant
    # concurrency=4 cap serialized the stage at 16+ CPUs, and the
    # autoscaling (1, cluster) pool NEVER scaled past one actor (61.5 cpu-s
    # of signatures ran in a 61.6 s span at 16 CPUs — ds.stats() evidence
    # in BASELINE.md round-5 per-op scaling). Tasks inherit the full
    # cluster's parallelism with zero pool-sizing risk. `concurrency`, when
    # given, still bounds the stage (tests use it to pin determinism).
    lsh = docs.map_batches(
        _minhash_rows,
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}),
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        bb = (
            b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return b.append_column("_b", pa.array(bb, pa.int64()))

    return (
        lsh.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: _emit_pairs(g, skip_counter), batch_format="pandas"
        )
    )


def minhash_candidate_pairs(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    """LSH candidate (doc_a, doc_b) pairs, deduped (one extra bucketed
    shuffle; the verify pipeline skips it by deduping inside its own
    pair-keyed shuffle instead)."""
    n_buckets = n_buckets_for(floor=32)
    pairs = _candidate_pairs_raw(docs, concurrency)

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


def _read_docs(docs_path: str, columns: list[str]) -> rd.Dataset:
    """Shared splittable docs read — see runtime.read_docs_split."""
    from ..runtime import read_docs_split

    return read_docs_split(docs_path, columns)


def minhash_verified_pairs(
    docs_path: str, threshold: float = 0.8, shingle_k: int = 5,
    concurrency: int | None = None,
    skip_counter=None,
) -> rd.Dataset:
    """Near-dup pairs with exact Jaccard ≥ threshold, LSH-pruned — built
    under runtime.no_op_reservation (three-barrier plan; the default
    per-operator reservation starves the signature map at 4.7× measured)."""
    from ..runtime import no_op_reservation

    with no_op_reservation():
        return _minhash_verified_pairs(
            docs_path, threshold, shingle_k, concurrency, skip_counter
        )


def _minhash_verified_pairs(
    docs_path: str, threshold: float, shingle_k: int, concurrency, skip_counter
) -> rd.Dataset:
    """Near-dup pairs with exact Jaccard ≥ threshold, LSH-pruned.

    Verification is fully distributed — no driver-side or broadcast corpus
    materialization. Shuffle shape: each candidate pair explodes into two
    endpoint rows keyed by doc id; the docs table rides the SAME bucketed
    shuffle keyed by doc_id, so every doc's text ships exactly once (vs twice
    for a naive double hash-join). A second, tiny shuffle (2 rows/pair) on
    the pair key pivots both texts together for the exact-Jaccard kernel,
    which caches shingle sets per batch (a doc in k pairs shingles once)."""
    docs = _read_docs(docs_path, ["doc_id", "text"])
    # UNdeduped candidates: duplicate (multi-band) pairs are collapsed inside
    # the verify shuffle below, which is keyed on the pair anyway — saves a
    # whole sort round vs deduping separately
    cands = _candidate_pairs_raw(docs, concurrency, skip_counter)

    # the candidate stage ends in pandas-block map_groups output; normalize
    # to uniform Arrow blocks with an exact schema
    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": pc.cast(b["doc_a"], pa.int64()),
                "doc_b": pc.cast(b["doc_b"], pa.int64()),
            }
        )

    cands = cands.map_batches(_canon, batch_format="pyarrow")

    from ..functions.hashing import splitmix64

    n_buckets = n_buckets_for(floor=32)
    _endpoint_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("slot", pa.int8()),
            ("text", pa.large_string()),
            ("_b", pa.int64()),
        ]
    )

    def _bucket_of_ids(ids: np.ndarray) -> np.ndarray:
        return (splitmix64(ids.astype(np.int64).view(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )

    # Stage 1 — attach each endpoint's text with ONE shuffle of the corpus:
    # every pair contributes two endpoint rows keyed by its doc ids; the docs
    # table rides the same shuffle keyed by doc_id (text ships exactly once).
    def endpoints(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        db = b["doc_b"].to_numpy(zero_copy_only=False)
        key = np.concatenate([da, db])
        n = len(da)
        return pa.Table.from_arrays(
            [
                pa.array(key, pa.int64()),
                pa.array(np.concatenate([da, da]), pa.int64()),
                pa.array(np.concatenate([db, db]), pa.int64()),
                pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]), pa.int8()
                ),
                pa.nulls(2 * n, pa.large_string()),
                pa.array(_bucket_of_ids(key), pa.int64()),
            ],
            schema=_endpoint_schema,
        )

    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int8()),
                pc.cast(b["text"], pa.large_string()),
                pa.array(_bucket_of_ids(ids), pa.int64()),
            ],
            schema=_endpoint_schema,
        )

    tagged = cands.map_batches(endpoints, batch_format="pyarrow").union(
        docs.map_batches(doc_rows, batch_format="pyarrow")
    )

    def attach_text(t: pa.Table) -> pa.Table:
        eps = t.filter(pc.is_valid(t["slot"]))
        dd = t.filter(pc.is_null(t["slot"]))
        keys = eps["key"].to_numpy(zero_copy_only=False)
        # vectorized text attach: searchsorted join on the doc keys + Arrow
        # take — the strings never materialize as Python objects
        dkeys = dd["key"].to_numpy(zero_copy_only=False)
        if len(dkeys) == 0:
            texts = pa.nulls(len(keys), pa.large_string())
        else:
            order = np.argsort(dkeys, kind="stable")
            dsorted = dkeys[order]
            pos = np.searchsorted(dsorted, keys)
            posc = np.minimum(pos, len(dsorted) - 1)
            found = dsorted[posc] == keys
            texts = pc.if_else(
                pa.array(found),
                pc.take(dd["text"].combine_chunks(), pa.array(order[posc], pa.int64())),
                pa.nulls(len(keys), pa.large_string()),
            )
        da = pc.cast(eps["doc_a"], pa.int64())
        db = pc.cast(eps["doc_b"], pa.int64())
        with np.errstate(over="ignore"):
            pb = (
                splitmix64(
                    da.to_numpy(zero_copy_only=False).view(np.uint64) * np.uint64(1_000_003)
                    + db.to_numpy(zero_copy_only=False).view(np.uint64)
                )
                % np.uint64(n_buckets)
            ).astype(np.int64)
        return pa.table(
            {
                "doc_a": da,
                "doc_b": db,
                "slot": pc.cast(eps["slot"], pa.int8()),
                "text": pa.array(texts, pa.large_string()),
                "_pb": pa.array(pb, pa.int64()),
            }
        )

    with_text = tagged.groupby("_b").map_groups(attach_text, batch_format="pyarrow")

    # Stage 2 — a second (tiny: 2 rows/pair) shuffle on the pair key brings
    # both endpoint texts together; pivot + exact-Jaccard verify per bucket.
    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_e3": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # vectorized pivot: ONE pandas dedup (collapses multi-band duplicate
        # pairs) + ONE merge brings both endpoint texts together — no Python
        # dict/set per row
        df = t.select(["doc_a", "doc_b", "slot", "text"]).to_pandas()
        df = df.drop_duplicates(["doc_a", "doc_b", "slot"])
        lt = df[df["slot"] == 0][["doc_a", "doc_b", "text"]]
        rt = df[df["slot"] == 1][["doc_a", "doc_b", "text"]]
        m = lt.merge(rt, on=["doc_a", "doc_b"], suffixes=("_a", "_b"))
        m = m[m["text_a"].notna() & m["text_b"].notna()]
        if not len(m):
            return empty
        # shingle each UNIQUE doc once (a doc in k pairs shingles once), then
        # per-pair exact Jaccard via sorted-array intersection (C kernels)
        uids_a = m["doc_a"].to_numpy()
        uids_b = m["doc_b"].to_numpy()
        cache: dict[int, np.ndarray] = {}
        for d, tx in zip(np.concatenate([uids_a, uids_b]),
                         pd.concat([m["text_a"], m["text_b"]])):
            if d not in cache:
                cache[d] = T.char_shingles(tx or "", shingle_k)
        inter = np.fromiter(
            (
                len(np.intersect1d(cache[a], cache[b], assume_unique=True))
                for a, b in zip(uids_a, uids_b)
            ),
            dtype=np.int64,
            count=len(m),
        )
        na = np.fromiter((len(cache[a]) for a in uids_a), dtype=np.int64, count=len(m))
        nb = np.fromiter((len(cache[b]) for b in uids_b), dtype=np.int64, count=len(m))
        union = na + nb - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(uids_a[keep], pa.int64()),
                "doc_b": pa.array(uids_b[keep], pa.int64()),
                "jaccard_e3": pa.array(
                    np.floor(j[keep] * 1000).astype(np.int64), pa.int64()
                ),
            }
        )

    return with_text.groupby("_pb").map_groups(verify, batch_format="pyarrow")


def simhash_neardup_pairs(
    docs_path: str, max_hamming: int = 3, skip_counter=None
) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit SimHash per doc (one vectorized batch
    kernel), then the shared hamming-LSH band engine (pipelines/hamming.py)
    — candidates from shared 16-bit bands, exact-hamming verify with the
    hashes riding the band rows. The text-side counterpart of
    phash_neardup_pairs; cheaper than MinHash (one int64 per doc through
    the shuffle instead of 16 band hashes) at lower recall for partial
    overlap — the standard simhash/minhash tradeoff."""
    from .hamming import hamming_lsh_pairs

    docs = _read_docs(docs_path, ["doc_id", "text"])
    sigs = simhash_signatures(docs)
    return hamming_lsh_pairs(
        sigs, id_col="doc_id", hash_col="simhash", max_hamming=max_hamming,
        skip_counter=skip_counter,
    )


def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash) — 64-bit SimHash per document."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split(" ").map(lambda ts: [t for t in ts if t])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                # one vectorized pass over the whole batch's tokens — not a
                # per-row 64xN Python bit loop
                "simhash": T.simhash64_batch(toks.tolist()),
            }
        )

    return docs.map_batches(sig, batch_format="pandas")
