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
