"""Tag parsing — the reference's big extractor T4
(M/ElasticSearchIndexHandler.java:247-377): a single pass over a document's
tags dispatching on literal prefixes into typed fields. Re-expressed as
vectorized pyarrow.compute kernels over a string tag column.

Families handled (same dispatch order as the reference):
  ``gbifDOI:<doi>``         → doi key (feeds the J1 citation join)
  ``peer_review:<bool>``    → boolean
  ``open_access:<bool>``    → boolean
  ``gbifTaxon:<int>``       → int key; non-numeric tolerated → null
                              (NumberFormat-tolerant, reference :310-317)
  ``gbifOccurrence:<long>`` → long key
  ``citation_type:<t>``     → keyword
  ``<iso>_biodiversity``    → country-of-coverage ISO (reference :333-339)
  bare 2-letter ISO         → country-of-researcher (reference :341-343)
  controlled terms          → topic (reference :344-348, config-driven set)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

CONTROLLED_TOPICS = (
    "DATA_PAPER",
    "CITIZEN_SCIENCE",
    "BIODIVERSITY",
    "CONSERVATION",
    "INVASIVES",
)


def _strip_prefix(tags: pa.Array, prefix: str) -> pa.Array:
    """Value after ``prefix`` where the tag starts with it, else null."""
    has = pc.starts_with(tags, prefix)
    val = pc.utf8_replace_slice(tags, 0, len(prefix), "")
    return pc.if_else(has, val, pa.scalar(None, pa.string()))


def parse_tags(tags: pa.Array | pa.ChunkedArray) -> pa.Table:
    """One tag string per row → typed columns (null where family not matched).
    Callers explode list<tag> columns first; per-doc set-accumulation (A2)
    happens in the downstream groupby."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    doi = _strip_prefix(tags, "gbifDOI:")
    peer = _strip_prefix(tags, "peer_review:")
    open_access = _strip_prefix(tags, "open_access:")
    taxon_raw = _strip_prefix(tags, "gbifTaxon:")
    # NumberFormat-tolerant: non-numeric → null instead of error
    taxon_ok = pc.match_substring_regex(pc.fill_null(taxon_raw, ""), r"^[0-9]+$")
    taxon = pc.if_else(taxon_ok, taxon_raw, pa.scalar(None, pa.string()))
    occ_raw = _strip_prefix(tags, "gbifOccurrence:")
    occ_ok = pc.match_substring_regex(pc.fill_null(occ_raw, ""), r"^[0-9]+$")
    occ = pc.if_else(occ_ok, occ_raw, pa.scalar(None, pa.string()))
    cit = _strip_prefix(tags, "citation_type:")

    bio = pc.extract_regex(tags, r"^(?P<iso>[a-z]{2})_biodiversity$")
    coverage = pc.utf8_upper(pc.struct_field(bio, "iso"))

    is_iso = pc.match_substring_regex(tags, r"^[A-Z]{2}$")
    researcher = pc.if_else(is_iso, tags, pa.scalar(None, pa.string()))

    upper = pc.utf8_upper(pc.replace_substring(tags, " ", "_"))
    is_topic = pc.is_in(upper, value_set=pa.array(CONTROLLED_TOPICS))
    topic = pc.if_else(is_topic, upper, pa.scalar(None, pa.string()))

    return pa.table(
        {
            "doi": doi,
            "peer_review": pc.equal(pc.fill_null(peer, ""), "true"),
            "open_access": pc.equal(pc.fill_null(open_access, ""), "true"),
            "taxon_key": pc.cast(taxon, pa.int64()),
            "occurrence_key": pc.cast(occ, pa.int64()),
            "citation_type": cit,
            "country_coverage": coverage,
            "country_researcher": researcher,
            "topic": topic,
        }
    )


def dispatch_tags_list(doc_id: pa.Array | pa.ChunkedArray, tags: pa.Array | pa.ChunkedArray) -> pa.Table:
    """The reference's REAL tag shape: a ``list<string>`` tags column per doc,
    dispatched in one pass with per-doc SET accumulation into array fields
    (M/ElasticSearchIndexHandler.java:247-377; set-dedup :352-372).

    Fully vectorized: flatten the list column (zero-copy offsets), run the
    scalar ``parse_tags`` kernel over the flat tags, then rebuild per-doc
    sorted-distinct list columns from (parent, value) pairs via bincount /
    cumsum offsets — no Python loop over docs or tags.
    """
    import numpy as np

    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    n_docs = len(tags)
    lengths = pc.list_value_length(tags).fill_null(0).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    flat = pc.list_flatten(tags)
    parsed = parse_tags(flat)

    def accum_set(values: pa.Array, out_type: pa.DataType) -> pa.ListArray:
        """Sorted-distinct per-doc list column from a flat parsed column."""
        vals = values.to_numpy(zero_copy_only=False)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        p, v = parent[mask], vals[mask]
        if len(p):
            order = np.lexsort((v, p))
            p, v = p[order], v[order]
            keep = np.ones(len(p), bool)
            keep[1:] = (p[1:] != p[:-1]) | (v[1:] != v[:-1])
            p, v = p[keep], v[keep]
        counts = np.bincount(p, minlength=n_docs) if len(p) else np.zeros(n_docs, np.int64)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(v, out_type)
        )

    def any_true(flags: pa.Array) -> pa.Array:
        f = pc.fill_null(flags, False).to_numpy(zero_copy_only=False)
        out = np.zeros(n_docs, dtype=bool)
        np.logical_or.at(out, parent[f], True)
        return pa.array(out, pa.bool_())

    # distinct raw-tag count per doc (the reference's Set.size() metric)
    tag_vals = flat.to_numpy(zero_copy_only=False)
    if len(parent):
        order = np.lexsort((tag_vals, parent))
        ps, ts = parent[order], tag_vals[order]
        keep = np.ones(len(ps), bool)
        keep[1:] = (ps[1:] != ps[:-1]) | (ts[1:] != ts[:-1])
        n_distinct = np.bincount(ps[keep], minlength=n_docs).astype(np.int64)
    else:
        n_distinct = np.zeros(n_docs, dtype=np.int64)

    return pa.table(
        {
            "doc_id": doc_id,
            "dois": accum_set(parsed["doi"], pa.string()),
            "taxon_keys": accum_set(parsed["taxon_key"], pa.int64()),
            "occurrence_keys": accum_set(parsed["occurrence_key"], pa.int64()),
            "citation_types": accum_set(parsed["citation_type"], pa.string()),
            "countries_coverage": accum_set(parsed["country_coverage"], pa.string()),
            "countries_researcher": accum_set(parsed["country_researcher"], pa.string()),
            "topics": accum_set(parsed["topic"], pa.string()),
            "peer_review": any_true(
                pc.equal(pc.fill_null(flat, ""), "peer_review:true")
            ),
            "open_access": any_true(
                pc.equal(pc.fill_null(flat, ""), "open_access:true")
            ),
            "n_tags_distinct": pa.array(n_distinct, pa.int64()),
        }
    )
