"""Sources/sinks: paged readers (S2/S4), keyed upsert sink (K2/K3), schema
inference (T11), and the paged/props parity queries."""

import numpy as np
import pyarrow as pa
import pytest

from content_crawler_ray.functions.schema_infer import FieldSpec, infer_schema, to_field_name
from content_crawler_ray.sources.tableio import read_upsert_table, upsert_parquet


def test_upsert_last_write_wins(tmp_path):
    d = str(tmp_path / "tbl")
    t1 = pa.table({"image_id": ["a", "b", "c"], "v": [1, 2, 3]})
    upsert_parquet(t1, d, key="image_id", n_buckets=4)
    t2 = pa.table({"image_id": ["b", "d"], "v": [20, 4]})
    upsert_parquet(t2, d, key="image_id", n_buckets=4)
    out = read_upsert_table(d).to_pandas().sort_values("image_id")
    assert dict(zip(out.image_id, out.v)) == {"a": 1, "b": 20, "c": 3, "d": 4}
    # replay idempotence: same upsert again changes nothing
    upsert_parquet(t2, d, key="image_id", n_buckets=4)
    out2 = read_upsert_table(d).to_pandas().sort_values("image_id")
    assert dict(zip(out2.image_id, out2.v)) == {"a": 1, "b": 20, "c": 3, "d": 4}


def test_upsert_int_key(tmp_path):
    d = str(tmp_path / "tbl2")
    upsert_parquet(pa.table({"k": [1, 2], "v": ["x", "y"]}), d, key="k")
    upsert_parquet(pa.table({"k": [2, 3], "v": ["Y", "z"]}), d, key="k")
    out = read_upsert_table(d).to_pandas().sort_values("k")
    assert out.v.tolist() == ["x", "Y", "z"]


def test_key_paged_reader(ray_session, sf_dir):
    from content_crawler_ray.sources.paged import read_key_paged

    ds = read_key_paged(f"{sf_dir}/documents.parquet", "doc_id", 500, 100, ["doc_id"])
    df = ds.to_pandas().sort_values("doc_id")
    assert len(df) == 500
    assert (df.page.to_numpy() == df.doc_id.to_numpy() // 100).all()


def test_schema_inference_type_map():
    specs = [
        FieldSpec("Title of page", "Symbol"),
        FieldSpec("body", "Text"),
        FieldSpec("is published", "Boolean"),
        FieldSpec("created at", "Date"),
        FieldSpec("location", "Location"),
        FieldSpec("count", "Integer"),
        FieldSpec("score", "Number"),
        FieldSpec("topic", "Link", link_is_vocabulary=True),
        FieldSpec("tags", "Array", item_type="Symbol"),
        FieldSpec("summary", "Text", localized=True),
    ]
    schema = infer_schema(specs)
    assert schema.field("titleOfPage").type == pa.string()
    assert schema.field("body").type == pa.large_string()
    assert schema.field("isPublished").type == pa.bool_()
    assert schema.field("createdAt").type == pa.timestamp("us")
    assert schema.field("location").type == pa.struct(
        [("lat", pa.float64()), ("lon", pa.float64())]
    )
    assert schema.field("count").type == pa.int64()
    assert schema.field("score").type == pa.float64()
    assert schema.field("topic").type == pa.string()
    assert schema.field("tags").type == pa.list_(pa.string())
    assert schema.field("summary").type == pa.map_(pa.string(), pa.string())
    with pytest.raises(NotImplementedError):
        infer_schema([FieldSpec("x", "Blob")])
    assert to_field_name("Last modified date") == "lastModifiedDate"


@pytest.mark.parametrize("name", ["q_s2_key_paged", "q_t7_props_extract"])
def test_new_queries_match_oracle(ray_session, sf_dir, name):
    import duckdb

    from content_crawler_ray.pipelines.queries import QUERIES
    from tools.check_oracle import canon, to_pandas

    fn, sql = QUERIES[name]
    got = canon(to_pandas(fn(sf_dir)))
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    exp = canon(con.sql(sql).df())
    assert len(got) == len(exp) and list(got.columns) == list(exp.columns)
    assert got.astype(str).equals(exp.astype(str))


def test_yaml_config_loading(tmp_path):
    """YAML pipeline spec (R/configuration.yml analog): crawl keys bind to
    CrawlConfig (lowerCamel or snake_case), unknown keys raise (the
    reference's strict Jackson binding), extras pass through."""
    import pytest as _pytest

    from content_crawler_ray.config import load_config

    p = tmp_path / "crawl.yml"
    p.write_text(
        "crawl:\n  waveSize: 123\n  host_budget: 7\n  maxWaves: 5\n"
        "controlledTags:\n  topics: [Ecology, Taxonomy]\n"
    )
    cfg, extras = load_config(str(p))
    assert cfg.wave_size == 123 and cfg.host_budget == 7 and cfg.max_waves == 5
    assert cfg.fetch_batch_size == 1024  # defaults intact
    assert extras["controlledTags"]["topics"] == ["Ecology", "Taxonomy"]

    bad = tmp_path / "bad.yml"
    bad.write_text("crawl:\n  noSuchKnob: 1\n")
    with _pytest.raises(KeyError):
        load_config(str(bad))


def test_ensure_documents_rewrites_single_row_group_cache(tmp_path):
    """A cached fixture written with one giant row group (the pre-round-5
    layout) must be rewritten into read-splittable row groups on next use."""
    import os

    import pyarrow.parquet as pq

    from content_crawler_ray.sources.synth import ensure_documents, make_documents

    cache = str(tmp_path / "cache")
    os.makedirs(cache + "/docs_20000_42", exist_ok=True)
    legacy = cache + "/docs_20000_42/documents.parquet"
    pq.write_table(make_documents(20000), legacy)  # single row group
    assert pq.ParquetFile(legacy).metadata.num_row_groups == 1
    d = ensure_documents(20000, cache_dir=cache)
    md = pq.ParquetFile(os.path.join(d, "documents.parquet")).metadata
    assert md.num_rows == 20000 and md.num_row_groups >= 4


def test_read_docs_split_block_count(ray_session, tmp_path):
    """Small inputs get a row-derived block count (neither 1 giant block nor
    hundreds of tiny ones); the override must NOT fire for large inputs."""
    import os  # noqa: F401  (symmetry with sibling test)

    import pyarrow.parquet as pq

    from content_crawler_ray.runtime import read_docs_split
    from content_crawler_ray.sources.synth import make_documents

    p = str(tmp_path / "documents.parquet")
    pq.write_table(make_documents(30000), p, row_group_size=4096)
    ds = read_docs_split(p, ["doc_id", "text"]).materialize()
    nb = ds.num_blocks()
    assert 8 <= nb <= 64  # rows//2500 = 12, bounded by [8, 4*cpus]
    assert ds.count() == 30000
