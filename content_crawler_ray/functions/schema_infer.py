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


# ---------------------------------------------------------------------------
# Full MappingGenerator semantics (C/MappingGenerator.java:37-371): dynamic
# templates, collapsible-field logic, link-probe → vocabulary-vs-nested
# resolution, locale `field.*` path templates — over a declarative
# content-type spec. Mirrors the reference flow statement-for-statement
# (including its double `nested_title` template, C:313+317) so the emitted
# JSON shape is checkable against R/mendeley_mapping.json semantics.
# ---------------------------------------------------------------------------

import re

KEYWORD = "keyword"
TEXT = "text"
NESTED = "nested"
VOCABULARY = "vocabulary"
_TITLE_FIELD = "title"

ES_COMPLEX_TYPES = re.compile(r"nested|object")
IGNORED_FIELDS = re.compile(r"space|revision|type")
FULLTEXT_FIELDS = re.compile(r"title|body|description|summary")
COLLAPSIBLE_TYPES = {"Boolean"}          # C/MappingGenerator.java:57
COLLAPSIBLE_FIELDS = re.compile(r"meta")  # C/MappingGenerator.java:62

KNOWN_FIELDS = {  # C/MappingGenerator.java:67-77
    "search_text": TEXT,
    "locale": KEYWORD,
    "contentType": KEYWORD,
    "id": KEYWORD,
    "createdAt": "date",
    "updatedAt": "date",
    "revision": "float",
    "gbifRegion": KEYWORD,
    "gbifProgrammeAcronym": KEYWORD,
    "type": KEYWORD,
}

ES_TYPE_MAP = {  # CONTENTFUL_ES_TYPE_MAP, C/MappingGenerator.java:82-91
    "Symbol": KEYWORD,
    "Text": TEXT,
    "Boolean": "boolean",
    "Date": "date",
    "Object": NESTED,
    "Location": "geo_point",
    "Integer": "integer",
    "Number": "double",
}


@dataclass
class ContentField:
    """Declarative stand-in for CMAField: the attributes getEsMapping probes."""

    id: str
    name: str
    type: str                          # Symbol/Text/.../Link/Array
    localized: bool = False
    disabled: bool = False
    link_type: str | None = None       # Link fields: "Entry"/"Asset"
    validations: list = field(default_factory=list)   # [{"linkContentType": [..]}]
    array_items: dict = field(default_factory=dict)   # {"type": ..., "validations": [..]}


def _is_link(f: ContentField) -> bool:
    # C/MappingGenerator.java:251-255
    return f.type == "Link" or (
        f.type == "Array" and f.array_items.get("type") == "Link"
    )


def _is_simple_field(f: ContentField, es_type: str) -> bool:
    # C/MappingGenerator.java:260-264
    return (
        f.type in COLLAPSIBLE_TYPES
        or COLLAPSIBLE_FIELDS.fullmatch(f.id) is not None
        or (ES_COMPLEX_TYPES.fullmatch(es_type) is None and not f.localized)
    )


def _es_link_type(f: ContentField, vocabularies: set[str]) -> str:
    """Link-probe resolution (C/MappingGenerator.java:359-371): direct links
    scan validations for the FIRST one carrying linkContentType; array links
    probe only the FIRST array-item validation (the reference's findFirst is
    over the mapped Optionals, not the filtered stream)."""
    link_ct = None
    if f.link_type is not None:
        for v in f.validations:
            if "linkContentType" in v:
                link_ct = v["linkContentType"][0]
                break
    else:
        item_validations = f.array_items.get("validations", [])
        if item_validations:
            cts = item_validations[0].get("linkContentType")
            link_ct = cts[0] if cts else None
    if link_ct is None:
        return NESTED
    return VOCABULARY if link_ct in vocabularies else NESTED


def _es_type(f: ContentField, vocabularies: set[str]) -> str | None:
    # C/MappingGenerator.java:343-354
    if _is_link(f):
        return _es_link_type(f, vocabularies)
    if f.type == "Array":
        return ES_TYPE_MAP.get(f.array_items.get("type"))
    if f.name.lower() == _TITLE_FIELD:
        return TEXT
    return ES_TYPE_MAP.get(f.type)


def _tpl(name: str, match_kind: str, pattern: str, mapping: dict) -> dict:
    return {name: {match_kind: pattern, "mapping": mapping}}


def _nested_tpl(field_name: str, es_type: str) -> dict:
    # addNestedMapping, C/MappingGenerator.java:190-199
    mapping: dict = {"type": es_type}
    if es_type in (KEYWORD, TEXT):
        mapping["copy_to"] = "search_text"
    return _tpl(f"nested_{field_name}", "path_match", f"*.{field_name}.*", mapping)


def _match_tpl(field_name: str, es_type: str) -> dict:
    # addMatchMapping, C/MappingGenerator.java:212-218
    return _tpl(f"nested_{field_name}", "match", field_name, {"type": es_type})


def _template_field(match: str, field_name: str, pattern: str, es_type: str) -> dict:
    # addTemplateField, C/MappingGenerator.java:230-246
    mapping: dict = {"type": es_type}
    if es_type == NESTED:
        mapping["dynamic"] = True
    elif FULLTEXT_FIELDS.fullmatch(field_name):
        mapping["copy_to"] = "search_text"
    return _tpl(field_name, match, pattern, mapping)


def es_mapping(fields: list[ContentField], vocabularies: set[str]) -> dict:
    """getEsMapping (C/MappingGenerator.java:305-338) as a JSON-able dict."""
    templates: list[dict] = [
        _tpl(
            "ignored_fields",
            "match",
            IGNORED_FIELDS.pattern,
            {"enabled": False},
        )
    ]
    templates[0]["ignored_fields"]["match_pattern"] = "regex"
    templates.append(
        _tpl("asset_files", "path_match", "*.file.*", {"type": "object", "enabled": False})
    )
    generic = _tpl("generic_tags", "match", ".*Tag", {"type": KEYWORD, "copy_to": "search_text"})
    generic["generic_tags"]["match_pattern"] = "regex"
    templates.append(generic)
    for fname, ftype in (
        (_TITLE_FIELD, TEXT),
        ("description", TEXT),
        ("summary", TEXT),
        ("body", TEXT),
        ("title", TEXT),  # the reference emits nested_title twice (C:313,317)
    ):
        templates.append(_nested_tpl(fname, ftype))
    templates.append(_match_tpl("id", KEYWORD))
    templates.append(_match_tpl("isoCode", KEYWORD))
    templates.append(_nested_tpl("label", KEYWORD))
    templates.append(_nested_tpl("url", KEYWORD))

    collapsed: dict[str, str] = {}
    for f in fields:
        if f.disabled:
            continue
        es_type = _es_type(f, vocabularies)
        if es_type is None:
            continue
        if es_type == VOCABULARY:
            collapsed[f.id] = KEYWORD          # C:325-327
        elif _is_simple_field(f, es_type):
            collapsed[f.id] = es_type          # C:327-328
        elif es_type != NESTED and f.localized and f.name.lower() != "blocks":
            templates.append(                  # locale path template, C:329-330
                _template_field("path_match", f.id, f"{f.id}.*", es_type)
            )
        elif f.name.lower() != "blocks":       # C:331-332
            templates.append(_template_field("match", f.id, f.id, es_type))

    properties: dict[str, dict] = {}
    flat = dict(collapsed)
    flat.update(KNOWN_FIELDS)                  # KNOWN_FIELDS win, C:107-108
    for key, es_type in flat.items():
        node: dict = {"type": es_type}
        if es_type in (KEYWORD, TEXT):
            node["copy_to"] = "search_text"
        properties[key] = node
    return {"dynamic_templates": templates, "properties": properties}
