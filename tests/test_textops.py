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
