"""Text-analysis kernels for the training-data pipeline operators
(language-ID, quality scoring, token counting, fingerprinting, shingling,
MinHash, SimHash). All batch-level functions are vectorized (pyarrow.compute /
numpy / pandas C paths); per-document loops exist only where the kernel is a
per-document set operation (shingle/minhash) and each iteration is numpy work.

Tokenization contract (shared with the DuckDB oracle SQL): split on single
spaces, drop empty tokens — i.e. ``[t for t in text.split(' ') if t]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "and", "of", "to")

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def token_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Tokens per row under the shared tokenization contract — fully
    vectorized: split, flatten, then per-row empty-token counts recovered by
    segment sums over the list offsets."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    split = pc.split_pattern(texts, " ")
    lengths = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    if not len(lengths):
        return pa.array([], pa.int64())
    empty = pc.equal(pc.list_flatten(split), "").to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lengths)
    cum = np.concatenate([[0], np.cumsum(empty)]) if len(empty) else np.zeros(1, dtype=np.int64)
    seg_empties = np.diff(np.concatenate([[0], cum[ends]]))
    return pa.array(lengths - seg_empties, pa.int64())


def _tokens_series(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.split(" ").map(lambda ts: [t for t in ts if t])


def quality_features(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality scores per document: stopword ratio and mean token length,
    scaled to integers (×1e6 / ×1e3) so oracle comparison is exact."""
    toks = _tokens_series(df[text_col])
    n_tok = toks.map(len)
    stop = frozenset(STOPWORDS)
    n_stop = toks.map(lambda ts: sum(1 for t in ts if t in stop))
    sum_len = toks.map(lambda ts: sum(len(t) for t in ts))
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["n_tokens"] = n_tok.astype(np.int64)
    # floor, not round: both sides compute the identical IEEE double
    # (1e6*stop)/n, and floor of the same double is deterministic, while
    # round() would differ at exact .5 (numpy bankers vs SQL half-away)
    out["stop_ratio_e6"] = np.where(
        n_tok > 0, np.floor(1e6 * n_stop / n_tok.clip(lower=1)), 0
    ).astype(np.int64)
    out["mean_tok_len_e3"] = np.where(
        n_tok > 0, np.floor(1e3 * sum_len / n_tok.clip(lower=1)), 0
    ).astype(np.int64)
    return out


# --- language ID (n-gram heuristic; deterministic, no model) ----------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "with", "for"},
    "de": {"der", "und", "das", "mit", "für"},
    "fr": {"le", "et", "les", "des", "pour"},
    "es": {"el", "y", "los", "con", "para"},
    "zh": set("的了是在我有和人这中"),
}


def langid(texts: pd.Series) -> pd.Series:
    """Marker-set language heuristic → ISO code or 'und'. Deterministic;
    ties broken by language-code order."""

    def pred(t: str) -> str:
        if not t:
            return "und"
        toks = set(x for x in t.split(" ") if x)
        chars = set(t)
        best, best_score = "und", 0
        for lang in sorted(_LANG_MARKERS):
            m = _LANG_MARKERS[lang]
            score = len(toks & m) if lang != "zh" else len(chars & m)
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.fillna("").map(pred)


# --- fingerprinting / shingles / sketches -----------------------------------


def token_hashes(tokens: list[str]) -> np.ndarray:
    """FNV-1a 64 of each token (numpy loop-free per batch would need padding;
    tokens are short so a list comp over C-level encode dominates)."""
    from .hashing import hash64_scalar

    return np.array([hash64_scalar(t) for t in tokens], dtype=np.uint64)


def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Order-sensitive rolling polynomial hash over tokens → int64 document
    fingerprint (the document-fingerprinting operator)."""
    from .hashing import hash64_scalar

    def fp(t: str) -> int:
        h = 0xCBF29CE484222325
        for tok in t.split(" "):
            if tok:
                h = ((h * 0x100000001B3) ^ hash64_scalar(tok)) & 0xFFFFFFFFFFFFFFFF
        return int(np.uint64(h).astype(np.int64))

    return texts.fillna("").map(fp)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashed char k-grams of a document (uint64)."""
    if len(text) < k:
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if not len(data):
            return np.array([], dtype=np.uint64)
        grams = data[None, :]
    else:
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(data) < k:
            grams = data[None, :]
        else:
            grams = np.lib.stride_tricks.sliding_window_view(data, k)
    h = np.full(len(grams), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(grams.shape[1]):
            h = (h ^ grams[:, j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


_MERS_P = np.uint64((1 << 61) - 1)


def minhash_params(n_perm: int = 128, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 MinHash signature via universal hashing mod 2^61-1."""
    if not len(shingles):
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (shingles & np.uint64((1 << 61) - 1)).astype(np.uint64)
    with np.errstate(over="ignore"):
        v = (x[None, :] * a[:, None] + b[:, None]) % _MERS_P
    return v.min(axis=1)


def band_hashes(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Collapse a signature into one 64-bit hash per LSH band."""
    rows = len(sig) // n_bands
    bands = sig[: n_bands * rows].reshape(n_bands, rows)
    h = np.full(n_bands, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows):
            h = (h ^ bands[:, j]) * _FNV_PRIME
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    if not len(a) and not len(b):
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return 0
    h = token_hashes(tokens)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash64_batch(token_lists: list[list[str]]) -> np.ndarray:
    """Vectorized 64-bit SimHash of a whole batch of documents (int64 out).

    One FNV pass over ALL tokens of the batch (hash64_array's padded-matrix
    kernel), then per-doc bit-sign sums via ``np.add.reduceat`` over the doc
    offsets — the per-doc 64×n Python bit loop of :func:`simhash64` never
    runs. Empty docs hash to 0, matching the scalar kernel."""
    import pyarrow as pa

    from .hashing import hash64_array

    n = len(token_lists)
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = [t for ts in token_lists for t in ts]
    h = hash64_array(pa.array(flat, pa.string()))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    # int32: int16 would overflow at >=32768 same-sign tokens on one bit
    # (a single repeated junk token is exactly the doc dedup sees)
    signs = (2 * bits.astype(np.int32) - 1)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nz = lens > 0
    sums = np.add.reduceat(signs, offsets[nz], axis=0)
    packed = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = packed.view(np.int64)
    return out
