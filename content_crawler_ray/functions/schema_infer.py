"""Schema inference — T11, the MappingGenerator analog
(C/MappingGenerator.java:305-371): a declarative field-spec table → a concrete
pyarrow.Schema, applying the reference's type map and naming rules. Runs
driver-side once per content type, never per row.

Reference type map (CONTENTFUL_ES_TYPE_MAP, C/MappingGenerator.java:82-91),
re-targeted at Arrow:
  Symbol → string (dictionary-encodable keyword), Text → large_string,
  Boolean → bool, Date → timestamp[us], Object → struct-as-JSON string,
  Location → struct<lat:double, lon:double>, Integer → int64,
  Number → float64, Link(vocabulary) → string (collapsed term,
  C/MappingGenerator.java:325-327), Link(other)/Array(entries) →
  list<struct> carried as JSON string in-sandbox.
Localized fields (C/MappingGenerator.java:329-333) become
map<string, string> (locale → value).
Field names normalize sentence-case → lowerCamel (E:244-247).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

_TYPE_MAP: dict[str, pa.DataType] = {
    "Symbol": pa.string(),
    "Text": pa.large_string(),
    "Boolean": pa.bool_(),
    "Date": pa.timestamp("us"),
    "Object": pa.string(),  # nested free-form → JSON string column
    "Location": pa.struct([("lat", pa.float64()), ("lon", pa.float64())]),
    "Integer": pa.int64(),
    "Number": pa.float64(),
}


@dataclass
class FieldSpec:
    name: str                      # source field name (may be sentence case)
    type: str                      # reference type vocabulary (keys above / Link / Array)
    localized: bool = False
    link_is_vocabulary: bool = False
    item_type: str | None = None   # for Array
    meta: dict = field(default_factory=dict)


def to_field_name(name: str) -> str:
    """Sentence/space-separated → lowerCamel (E:244-247 toFieldNameFormat)."""
    parts = [p for p in name.replace("_", " ").split(" ") if p]
    if not parts:
        return name
    head = parts[0][:1].lower() + parts[0][1:]
    return head + "".join(p[:1].upper() + p[1:] for p in parts[1:])


def infer_field(spec: FieldSpec) -> pa.Field:
    if spec.type == "Link":
        dtype = pa.string() if spec.link_is_vocabulary else pa.large_string()
    elif spec.type == "Array":
        inner = _TYPE_MAP.get(spec.item_type or "Symbol", pa.string())
        dtype = pa.list_(inner)
    else:
        dtype = _TYPE_MAP.get(spec.type)
        if dtype is None:
            raise NotImplementedError(f"unmapped reference type: {spec.type!r}")
    if spec.localized:
        dtype = pa.map_(pa.string(), pa.string())
    return pa.field(to_field_name(spec.name), dtype)


def infer_schema(specs: list[FieldSpec], id_field: str = "id") -> pa.Schema:
    fields = [pa.field(id_field, pa.string())] + [infer_field(s) for s in specs]
    return pa.schema(fields)
