"""Pure-function kernels: hashing, URLs, codecs, dates, text, tags."""

import numpy as np
import pyarrow as pa
import pytest

from content_crawler_ray.functions import codecs
from content_crawler_ray.functions.dates import created_at
from content_crawler_ray.functions.hashing import bucket_of, hash64_array, hash64_scalar
from content_crawler_ray.functions.tags import parse_tags
from content_crawler_ray.functions.text import (
    char_shingles,
    jaccard,
    minhash_params,
    minhash_signature,
    quality_features,
    simhash64,
    token_counts,
)
from content_crawler_ray.functions.urls import (
    canonicalize_array,
    canonicalize_scalar,
    host_of_array,
    image_id_of_array,
    image_id_of_scalar,
)


def test_hash_scalar_vs_vector():
    strs = ["", "a", "hello world", "http://h.com/p/img-000000000001", "東京/💧", "x" * 300]
    assert list(hash64_array(pa.array(strs))) == [hash64_scalar(s) for s in strs]


def test_hash_buckets_stable():
    h = hash64_array(pa.array(["a", "b", "c"]))
    assert bucket_of(h, 8).tolist() == bucket_of(h, 8).tolist()
    assert (bucket_of(h, 8) < 8).all()


CANON_CASES = [
    ("http://HOST.Example.com:80/p/x#frag", "http://host.example.com/p/x"),
    ("https://h.com:443/x?b=2&a=1", "https://h.com/x?a=1&b=2"),
    ("https://h.com/x?a=1&b=2", "https://h.com/x?a=1&b=2"),
    ("http://h.com", "http://h.com/"),
    ("http://h.com:8080/y", "http://h.com:8080/y"),
    ("not a url", "not a url"),
]


def test_canonicalize_scalar_and_vector_agree():
    urls = [u for u, _ in CANON_CASES]
    vec = canonicalize_array(pa.array(urls)).to_pylist()
    for (u, want), got in zip(CANON_CASES, vec):
        assert canonicalize_scalar(u) == want
        assert got == want


def test_host_and_image_id_extraction():
    urls = pa.array(
        ["http://h0.com/p/img-000000000042", "http://H1.com:80/private/img-000000000001", "x"]
    )
    assert host_of_array(urls).to_pylist() == ["h0.com", "h1.com", ""]
    assert image_id_of_array(urls).to_pylist() == [
        "img-000000000042",
        "img-000000000001",
        None,
    ]
    assert image_id_of_scalar("http://h/p/img-000000000007") == "img-000000000007"


@pytest.mark.parametrize("fmt", ["raw", "dctq"])
@pytest.mark.parametrize("dims", [(16, 16), (37, 53), (128, 128)])
def test_codec_roundtrip_psnr(fmt, dims):
    w, h = dims
    px = codecs.gen_pixels("img-000000000007", w, h)
    dec = codecs.decode(codecs.encode(px, fmt), w, h, fmt)
    assert dec.shape == (h, w)
    p = codecs.psnr(dec, px)
    assert p >= 40.0  # per-row invariant (BASELINE.json)
    if fmt == "raw":
        assert np.array_equal(dec, px)


def test_codec_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        codecs.decode(b"", 4, 4, "jpeg")
    with pytest.raises(NotImplementedError):
        codecs.encode(np.zeros((4, 4), np.uint8), "png")


def test_phash_deterministic_and_sensitive():
    a = codecs.gen_pixels("img-000000000001", 64, 48)
    b = codecs.gen_pixels("img-000000000002", 64, 48)
    assert codecs.phash64(a) == codecs.phash64(a)
    assert codecs.hamming64(codecs.phash64(a), codecs.phash64(b)) > 4


def test_created_at_clamp_by_addition():
    # Feb 30 → Feb 1 + 29 days = Mar 2 (non-leap 2023), matching the
    # reference's withMonth().plusDays() tolerance (T3)
    out = created_at(np.array([2023]), np.array([2]), np.array([30]))
    assert out[0] == "2023-03-02T00:00:00.000Z"
    out = created_at(np.array([2024]), None, None)
    assert out[0] == "2024-01-01T00:00:00.000Z"
    out = created_at(np.array([2020]), np.array([2]), np.array([29]))
    assert out[0] == "2020-02-29T00:00:00.000Z"


def test_token_counts_matches_python():
    texts = ["", "a b c", " lead", "trail ", "a  b", "單 字"]
    got = token_counts(pa.array(texts)).to_pylist()
    want = [len([t for t in s.split(" ") if t]) for s in texts]
    assert got == want


def test_quality_features_floor_semantics():
    import pandas as pd

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["the a xyz", ""]})
    out = quality_features(df)
    assert out["n_tokens"].tolist() == [3, 0]
    assert out["stop_ratio_e6"].tolist() == [666666, 0]
    assert out["mean_tok_len_e3"].tolist() == [int(np.floor(1e3 * 7 / 3)), 0]


def test_minhash_estimates_jaccard():
    a, b = minhash_params(256)
    s1 = char_shingles("the quick brown fox jumps over the lazy dog", 5)
    s2 = char_shingles("the quick brown fox jumps over the lazy cat", 5)
    true_j = jaccard(s1, s2)
    est = (minhash_signature(s1, a, b) == minhash_signature(s2, a, b)).mean()
    assert abs(est - true_j) < 0.15
    assert (minhash_signature(s1, a, b) == minhash_signature(s1, a, b)).all()


def test_simhash_similarity():
    t1 = "alpha beta gamma delta epsilon zeta".split()
    t2 = "alpha beta gamma delta epsilon eta".split()
    t3 = "one two three four five six".split()
    d_near = bin((simhash64(t1) ^ simhash64(t2)) & (2**64 - 1)).count("1")
    d_far = bin((simhash64(t1) ^ simhash64(t3)) & (2**64 - 1)).count("1")
    assert d_near < d_far
    assert simhash64([]) == 0


def test_parse_tags_all_families():
    tags = pa.array(
        [
            "gbifDOI:10.5072/dl.7",
            "peer_review:true",
            "peer_review:false",
            "open_access:true",
            "gbifTaxon:212",
            "gbifTaxon:notanumber",  # NumberFormat-tolerant → null
            "gbifOccurrence:123456789",
            "citation_type:journal",
            "dk_biodiversity",
            "US",
            "citizen science",
            "complete junk ###",
        ]
    )
    t = parse_tags(tags)
    assert t["doi"].to_pylist()[0] == "10.5072/dl.7"
    assert t["peer_review"].to_pylist()[:3] == [False, True, False]
    assert t["open_access"].to_pylist()[3] is True
    assert t["taxon_key"].to_pylist()[4] == 212
    assert t["taxon_key"].to_pylist()[5] is None
    assert t["occurrence_key"].to_pylist()[6] == 123456789
    assert t["citation_type"].to_pylist()[7] == "journal"
    assert t["country_coverage"].to_pylist()[8] == "DK"
    assert t["country_researcher"].to_pylist()[9] == "US"
    assert t["topic"].to_pylist()[10] == "CITIZEN_SCIENCE"
    assert all(v is None for v in t["doi"].to_pylist()[1:])


def test_hll_estimate_accuracy():
    from content_crawler_ray.functions.sketch import HyperLogLog
    from content_crawler_ray.functions.hashing import hash64_scalar

    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    keys = np.array([hash64_scalar(f"k{i}") for i in range(20_000)], dtype=np.uint64)
    h1.add_hashes(keys[:12_000])
    h2.add_hashes(keys[8_000:])  # overlapping halves
    h1.merge(h2)
    est = h1.estimate()
    assert abs(est - 20_000) / 20_000 < 0.05  # ~1.04/sqrt(4096) ≈ 1.6% std err
    # serialization round trip preserves the estimate
    h3 = HyperLogLog.from_bytes(h1.to_bytes())
    assert h3.estimate() == est


def test_dispatch_tags_list_set_accumulation():
    """T4/A2 real shape: list<string> tags, one pass, per-doc SET semantics
    (duplicate tags collapse; tolerant numeric parse drops bad taxon keys)."""
    import pyarrow as pa

    from content_crawler_ray.functions.tags import dispatch_tags_list

    tags = pa.array(
        [
            ["gbifDOI:10.1/x", "gbifDOI:10.1/x", "US", "peer_review:true"],
            ["gbifTaxon:42", "gbifTaxon:7", "gbifTaxon:x9", "de_biodiversity"],
            [],
            ["citizen science", "open_access:true", "citation_type:journal", "US", "FR"],
        ],
        pa.list_(pa.string()),
    )
    out = dispatch_tags_list(pa.array([10, 11, 12, 13], pa.int64()), tags)
    rows = out.to_pylist()
    assert rows[0]["dois"] == ["10.1/x"]  # duplicate collapsed
    assert rows[0]["peer_review"] is True and rows[0]["n_tags_distinct"] == 3
    assert rows[1]["taxon_keys"] == [7, 42]  # numeric sort; 'x9' dropped
    assert rows[1]["countries_coverage"] == ["DE"]
    assert rows[2]["n_tags_distinct"] == 0 and rows[2]["dois"] == []
    assert rows[3]["topics"] == ["CITIZEN_SCIENCE"]
    assert rows[3]["countries_researcher"] == ["FR", "US"]
    assert rows[3]["open_access"] is True and rows[3]["peer_review"] is False


def test_language_normalization_matching_paths():
    """All four reference matching forms (2-letter, 3-letter, English name,
    native name; case-insensitive) + UNKNOWN fallback
    (M/ElasticSearchIndexHandler.java:470-485)."""
    import pyarrow as pa

    from content_crawler_ray.functions.langnorm import (
        normalize_language,
        normalize_language_array,
    )

    arr = pa.array(
        ["de", "deu", "GERMAN", "Deutsch", "français", "中文", "tlh", None, "PORTUGUÊS"]
    )
    got = normalize_language_array(arr).to_pylist()
    assert got == ["deu", "deu", "deu", "deu", "fra", "zho", "und", "und", "por"]
    assert normalize_language("Norwegian Bokmål") == "nob"
    assert normalize_language("") == "und"


def test_nested_kernels():
    """struct/list<struct>/map<locale,string> flattening (T7/T8/T9 real
    shapes, C/EsDocBuilder.java:80-237)."""
    import pyarrow as pa

    from content_crawler_ray.functions.nested import (
        collapse_locale_map,
        list_join,
        list_struct_project,
        list_sum_int,
        struct_project,
    )

    meta = pa.array(
        [{"title": "A", "year": 2001}, {"title": "B", "year": 2002}],
        pa.struct([("title", pa.string()), ("year", pa.int64())]),
    )
    assert struct_project(meta, "title").to_pylist() == ["A", "B"]

    contribs = pa.array(
        [[{"name": "x", "weight": 1}, {"name": "y", "weight": 2}], []],
        pa.list_(pa.struct([("name", pa.string()), ("weight", pa.int64())])),
    )
    names = list_struct_project(contribs, "name")
    assert names.to_pylist() == [["x", "y"], []]
    assert list_join(names).to_pylist() == ["x,y", ""]
    assert list_sum_int(list_struct_project(contribs, "weight")).to_pylist() == [3, 0]

    m = pa.array(
        [[("en", "hello"), ("de", "hallo")], [("en", "bye")], []],
        pa.map_(pa.string(), pa.string()),
    )
    assert collapse_locale_map(m, "de", "en").to_pylist() == ["hallo", "bye", None]


def test_simhash_batch_equals_scalar():
    import numpy as np

    from content_crawler_ray.functions import text as T

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(40)]
    docs = [list(rng.choice(words, size=int(rng.integers(0, 30)))) for _ in range(50)]
    docs[7] = []  # empty doc → 0
    got = T.simhash64_batch(docs)
    want = np.array([T.simhash64(d) for d in docs], dtype=np.int64)
    assert (got == want).all()


def test_hash64_array_equals_scalar_property():
    """Property: the vectorized padded-matrix FNV kernel equals the scalar
    byte-loop reference on arbitrary unicode strings (hypothesis)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from content_crawler_ray.functions.hashing import hash64_array, hash64_scalar

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
    def check(strings):
        got = hash64_array(pa.array(strings, pa.string()))
        want = [hash64_scalar(s) for s in strings]
        assert got.tolist() == want

    check()


def test_simhash_batch_equals_scalar_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from content_crawler_ray.functions import text as T

    token = st.text(alphabet="abcdefg", min_size=1, max_size=6)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.lists(token, min_size=0, max_size=12), min_size=1, max_size=8))
    def check(docs):
        got = T.simhash64_batch(docs)
        want = np.array([T.simhash64(d) for d in docs], dtype=np.int64)
        assert (got == want).all()

    check()


def test_codec_roundtrip_property():
    """Property: raw codec roundtrips exactly; dctq decodes within the PSNR
    invariant for arbitrary ids/dims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from content_crawler_ray.functions import codecs

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(min_value=0, max_value=10**6),
        st.sampled_from([8, 16, 24, 32]),
        st.sampled_from([8, 16, 24]),
    )
    def check(i, w, h):
        img = codecs.gen_pixels(f"img-{i:012d}", w, h)
        raw = codecs.encode(img, "raw")
        assert (codecs.decode(raw, w, h, "raw") == img).all()
        lossy = codecs.encode(img, "dctq")
        dec = codecs.decode(lossy, w, h, "dctq")
        assert codecs.psnr(dec, img) >= 40.0

    check()


def test_es_mapping_full_generator_shapes():
    """Full MappingGenerator semantics (C/MappingGenerator.java:305-371):
    vocabulary link collapse, nested link template, locale path template,
    collapsible boolean/meta, disabled skip, KNOWN_FIELDS override, and the
    fixed dynamic-template preamble (incl. the reference's double
    nested_title)."""
    from content_crawler_ray.functions.schema_infer import (
        ContentField,
        es_mapping,
    )

    fields = [
        # Link with a vocabulary linkContentType → collapsed keyword property
        ContentField(id="topic", name="Topic", type="Link", link_type="Entry",
                     validations=[{"linkContentType": ["vocabTopic"]}]),
        # Link to a non-vocabulary → match template, type nested, dynamic
        ContentField(id="primaryImage", name="Primary image", type="Link",
                     link_type="Asset", validations=[]),
        # Array of links probing only the FIRST item validation
        ContentField(id="countries", name="Countries", type="Array",
                     array_items={"type": "Link",
                                  "validations": [{"linkContentType": ["vocabCountry"]}]}),
        # localized Text (non-nested) → path_match `field.*` template with copy_to
        ContentField(id="body", name="Body", type="Text", localized=True),
        # collapsible Boolean even when localized
        ContentField(id="searchable", name="Searchable", type="Boolean", localized=True),
        # collapsible by field name `meta`
        ContentField(id="meta", name="Meta", type="Object"),
        # plain non-localized Symbol → collapsed keyword
        ContentField(id="slug", name="Slug", type="Symbol"),
        # field named title → text regardless of type
        ContentField(id="title", name="Title", type="Symbol"),
        # disabled → skipped entirely
        ContentField(id="legacy", name="Legacy", type="Symbol", disabled=True),
        # name `blocks` → dropped from templates (C:329-332)
        ContentField(id="blocks", name="Blocks", type="Object"),
    ]
    m = es_mapping(fields, vocabularies={"vocabTopic", "vocabCountry"})

    props = m["properties"]
    assert props["topic"] == {"type": "keyword", "copy_to": "search_text"}
    assert props["countries"] == {"type": "keyword", "copy_to": "search_text"}
    assert props["searchable"] == {"type": "boolean"}
    assert props["meta"] == {"type": "nested"}
    assert props["slug"] == {"type": "keyword", "copy_to": "search_text"}
    assert props["title"] == {"type": "text", "copy_to": "search_text"}
    assert "legacy" not in props and "blocks" not in props
    # KNOWN_FIELDS present and winning
    assert props["createdAt"] == {"type": "date"}
    assert props["search_text"] == {"type": "text", "copy_to": "search_text"}

    tpls = m["dynamic_templates"]
    names = [next(iter(t)) for t in tpls]
    # fixed preamble incl. the double nested_title (C:313,317)
    assert names[:3] == ["ignored_fields", "asset_files", "generic_tags"]
    assert names.count("nested_title") == 2
    assert tpls[0]["ignored_fields"]["match_pattern"] == "regex"
    assert tpls[0]["ignored_fields"]["mapping"] == {"enabled": False}
    # nested link template: match on the field id, dynamic mapping
    img = next(t["primaryImage"] for t in tpls if "primaryImage" in t)
    assert img == {"match": "primaryImage",
                   "mapping": {"type": "nested", "dynamic": True}}
    # locale path template for localized text field with fulltext copy_to
    body = next(t["body"] for t in tpls if "body" in t)
    assert body == {"path_match": "body.*",
                    "mapping": {"type": "text", "copy_to": "search_text"}}


def test_es_mapping_link_probe_array_first_validation_only():
    """The reference's array-link probe reads only the FIRST item validation
    (C/MappingGenerator.java:364-368) — a vocabulary in the second validation
    must NOT collapse the field."""
    from content_crawler_ray.functions.schema_infer import ContentField, es_mapping

    f = ContentField(id="tags", name="Tags", type="Array",
                     array_items={"type": "Link",
                                  "validations": [{"size": {"max": 5}},
                                                  {"linkContentType": ["vocabTag"]}]})
    m = es_mapping([f], vocabularies={"vocabTag"})
    assert "tags" not in m["properties"]  # resolved nested, not vocabulary
    tags = next(t["tags"] for t in m["dynamic_templates"] if "tags" in t)
    assert tags["mapping"]["type"] == "nested"
