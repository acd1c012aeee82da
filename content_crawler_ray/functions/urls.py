"""URL canonicalization — the engine's generalization of the reference's string
normalizers (SURVEY.md §2 T12: E:228-247, B/ContentfulBackup.java:215-224).

Canonical form feeding the 64-bit seen-set key:
  - scheme and host lowercased
  - default ports stripped (``:80`` for http, ``:443`` for https)
  - fragment dropped
  - query parameters sorted bytewise (``a=1&b=2``); empty query dropped
  - empty path → ``/``

The bulk parse is one vectorized ``pc.extract_regex`` over the batch; only rows
that actually carry a query string fall back to a per-row split/sort (rare in
crawl traffic, bounded by the trap rate in fixtures).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<host>[^/:?#]*)(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<frag>.*))?$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_scalar(url: str) -> str:
    """Single-URL canonicalization (simulator / oracle path — same semantics)."""
    import re

    m = re.match(_URL_RE, url)
    if not m:
        return url
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    port = m.group("port")
    path = m.group("path") or "/"
    query = m.group("query")
    netloc = host
    if port and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    out = f"{scheme}://{netloc}{path}"
    if query:
        parts = sorted(p for p in query.split("&") if p)
        if parts:
            out += "?" + "&".join(parts)
    return out


def canonicalize_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonicalization of a string array."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parsed = pc.extract_regex(urls, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parsed, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parsed, "host"))
    port = pc.struct_field(parsed, "port")
    path = pc.struct_field(parsed, "path")
    query = pc.struct_field(parsed, "query")

    # unparseable rows (extract_regex → null struct): pass through untouched
    bad = pc.is_null(scheme)

    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    # port kept only when non-default for the scheme
    default_port = pc.if_else(
        pc.equal(scheme, "http"),
        pa.scalar("80"),
        pc.if_else(pc.equal(scheme, "https"), pa.scalar("443"), pa.scalar("")),
    )
    # extract_regex yields "" (not null) for unmatched optional groups
    port = pc.fill_null(port, "")
    keep_port = pc.and_(pc.not_equal(port, ""), pc.not_equal(port, default_port))
    portpart = pc.if_else(keep_port, pc.binary_join_element_wise(":", pc.fill_null(port, ""), ""), pa.scalar(""))

    base = pc.binary_join_element_wise(scheme, "://", host, portpart, path, "")

    # query sort: per-row only on the (typically rare) rows that have one
    has_q = pc.and_(pc.is_valid(query), pc.not_equal(pc.fill_null(query, ""), "")).to_numpy(
        zero_copy_only=False
    )
    base_np = base.to_numpy(zero_copy_only=False)
    if has_q.any():
        qs = query.to_numpy(zero_copy_only=False)
        idx = np.nonzero(has_q)[0]
        for i in idx:
            parts = sorted(p for p in qs[i].split("&") if p)
            if parts:
                base_np[i] = base_np[i] + "?" + "&".join(parts)
    out = pa.array(base_np, type=pa.string())
    return pc.if_else(bad, urls, out)


def host_of_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased host of each (canonical) URL."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parsed = pc.extract_regex(urls, _URL_RE)
    return pc.fill_null(pc.utf8_lower(pc.struct_field(parsed, "host")), "")


_IMAGE_ID_RE = r"/(?P<image_id>img-[0-9]{12})$"


def image_id_of_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Corpus key from the URL path tail (``.../img-000000000042``); null if none."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parsed = pc.extract_regex(urls, _IMAGE_ID_RE)
    return pc.struct_field(parsed, "image_id")


def image_id_of_scalar(url: str) -> str | None:
    import re

    m = re.search(_IMAGE_ID_RE, url)
    return m.group("image_id") if m else None
