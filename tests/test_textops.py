"""TF-IDF ranking and benchmark-decontamination shape/plant tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_tfidf_ranks_and_scores(ray_session, sf_dir):
    from content_crawler_ray.pipelines.queries import q_tfidf_topterms

    df = q_tfidf_topterms(sf_dir).to_pandas()
    g = df.sort_values(["doc_id", "rank"]).groupby("doc_id")
    assert (g["rank"].agg(list).map(lambda r: r == list(range(1, len(r) + 1)))).all()
    # scores nonincreasing within a doc, ties broken by term ascending
    for _, grp in g:
        s = grp["score_e6"].to_numpy()
        assert (np.diff(s) <= 0).all()
    assert df["rank"].max() <= 3


def test_decontaminate_planted_gram(ray_session, tmp_path):
    from content_crawler_ray.pipelines.queries import q_decontaminate

    shared = "alpha beta gamma delta"  # one 4-gram shared with the benchmark
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),  # 0 is benchmark (0%97==0)
            "text": pa.array(
                [
                    f"benchmark prefix {shared} benchmark suffix",
                    f"training doc with {shared} copied verbatim",
                    "a completely clean training document with fresh words",
                    "too short",  # < 4 tokens → no grams → clean
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["t"] * 4, pa.string()),
            "n_chars": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = q_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 0 not in out.index  # benchmark rows excluded from the product
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "contaminated"] == 0


def test_cms_heavy_hitters_guarantees(ray_session, sf_dir):
    from content_crawler_ray.pipelines.queries import q_cms_heavy_hitters, q_terms_topk

    df = q_cms_heavy_hitters(sf_dir).to_pandas()
    n_top = len(q_terms_topk(sf_dir).to_pandas())  # vocab may be < 50 at tiny sf
    assert len(df) == n_top
    # one-sided guarantee: the sketch never undercounts
    assert (df["n_cms"] >= df["n_exact"]).all()
    # CMS error bound: overshoot <= (e/w)·N w.h.p. (deterministic seeds, so
    # a pass here is a pass forever); N = total token count of the corpus
    import duckdb

    n_total = duckdb.sql(
        "SELECT count(*) FROM (SELECT unnest(list_filter(regexp_split_to_array("
        f"lower(text), '[^a-z0-9]+'), x -> x <> '')) FROM read_parquet('{sf_dir}/documents.parquet'))"
    ).fetchone()[0]
    bound = 2.7182818 / 4096 * n_total
    assert ((df["n_cms"] - df["n_exact"]) <= bound).all()


def test_cms_kernel_merge_equals_single_pass():
    import numpy as np

    from content_crawler_ray.functions.sketch import CountMinSketch

    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, size=1000).astype(np.uint64)
    c = rng.integers(1, 9, size=1000)
    whole = CountMinSketch().add_hashes(h, c)
    a = CountMinSketch().add_hashes(h[:400], c[:400])
    b = CountMinSketch().add_hashes(h[400:], c[400:])
    assert np.array_equal(a.merge(b).table, whole.table)
    # exact when there are no collisions in a tiny workload
    tiny = CountMinSketch().add_hashes(h[:3], np.array([5, 7, 9]))
    assert np.array_equal(tiny.estimate(h[:3]), np.array([5, 7, 9]))


def test_group_hll_within_five_pct_of_exact(ray_session, sf_dir):
    from content_crawler_ray.pipelines.queries import q_group_distinct, q_group_hll

    exact = q_group_distinct(sf_dir).to_pandas().set_index("event_type")["n_users"]
    hll = q_group_hll(sf_dir).to_pandas().set_index("event_type")["n_users_hll"]
    assert set(hll.index) == set(exact.index)
    rel = (hll - exact).abs() / exact
    assert (rel < 0.05).all(), rel.to_dict()


def test_dsir_weights_prefer_target_like_docs(ray_session, tmp_path):
    """Semantic contract on top of the exact oracle: docs written in the
    target source's distinctive vocabulary must out-score docs that share
    no vocabulary with it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from content_crawler_ray.pipelines.queries import q_dsir_weights

    tgt_vocab = "astronomy telescope nebula quasar orbit spectrum "
    web_vocab = "discount shipping checkout cart coupon promo "
    rows = []
    for j in range(40):
        rows.append((j, tgt_vocab * 5, "src0"))          # the target slice
    for j in range(40, 60):
        rows.append((j, tgt_vocab * 4 + "extra words ", "srcX"))  # target-like
    for j in range(60, 80):
        rows.append((j, web_vocab * 5, "srcX"))          # dissimilar
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    w = q_dsir_weights(str(tmp_path)).to_pandas().set_index("doc_id")["dsir_e6"]
    like = w.loc[40:59].mean()
    unlike = w.loc[60:79].mean()
    assert like > unlike, (like, unlike)
    # dissimilar docs are strongly negative (every token unseen in target);
    # target-like docs sit far above them even after the penalty their two
    # novel tokens pay
    assert unlike < 10 * like < 0 or like > 0


def test_quantile_sketch_within_five_pct_of_exact(ray_session, sf_dir):
    """Bottom-m sampled quantiles vs the exact order statistics: rank error
    is O(1/sqrt(m)) ~ 1.6% at m=4096; assert a 5% VALUE ceiling (the price
    distribution has no heavy point masses, so rank error ~ value error)."""
    from content_crawler_ray.pipelines.queries import (
        q_quantile_exact,
        q_quantile_sketch,
    )

    exact = q_quantile_exact(sf_dir)
    exact = (exact.to_pandas() if hasattr(exact, "to_pandas") else exact)
    if not hasattr(exact, "set_index"):
        exact = exact.to_pandas()
    est = q_quantile_sketch(sf_dir).to_pandas()
    e = dict(zip(exact.iloc[:, 0], exact.iloc[:, 1]))
    g = dict(zip(est["q_pct"], est["value_cents_est"]))
    for pct in (50, 95):
        rel = abs(g[pct] - e[pct]) / e[pct]
        assert rel < 0.05, (pct, g[pct], e[pct], rel)


def test_pii_scrub_planted(ray_session, tmp_path):
    """Planted PII: both engines must redact the same spans — the oracle on
    real testdata is trivially green (no PII there), so this is the test
    that actually exercises the patterns, cross-checked against DuckDB."""
    import duckdb

    from content_crawler_ray.pipelines.queries import SQL_PII_SCRUB, q_pii_scrub

    texts = [
        "contact bob.smith+spam@example.co.uk for details",
        "server at 192.168.1.254 answered then 10.0.0.1 timed out",
        "call 555-867-5309 or 555 123 4567 today",
        "clean text with no pii at all",
        "mixed: a@b.io on 8.8.8.8 phone 111-222-3333",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(1, 6)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    got = q_pii_scrub(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.sql(SQL_PII_SCRUB).df().sort_values("doc_id").reset_index(drop=True)
    assert got["text_clean"].tolist() == exp["text_clean"].tolist()
    assert got["n_redactions"].tolist() == exp["n_redactions"].tolist()
    assert got["n_redactions"].tolist() == [1, 2, 2, 0, 3]
    assert "<EMAIL>" in got.loc[0, "text_clean"]
    assert got.loc[1, "text_clean"].count("<IP>") == 2
    assert "<PHONE>" in got.loc[2, "text_clean"]
