"""End-to-end curation pipeline (pipelines/curate.py): product invariants,
per-stage resume, and determinism."""

import os
import shutil

import numpy as np
import pandas as pd
import ray.data as rd

from content_crawler_ray.pipelines.curate import curate_corpus, read_plan


def _run(tmp: str, sf_dir: str) -> dict:
    return curate_corpus(sf_dir, tmp)


def test_curate_invariants(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "c1")
    m = _run(out, sf_dir)
    plan = read_plan(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = rd.read_parquet(os.path.join(out, "docs")).to_pandas()

    # lineage counts agree with the persisted product
    assert m["final_kept"] == len(plan) == len(docs)
    assert m["input"] >= m["lang_kept"] >= m["quality_kept"] >= m["final_kept"]

    # benchmark docs never train
    assert (plan["doc_id"] % 97 != 0).all()

    # packing: bins are the exclusive-cumsum token windows in doc_id order
    excl = plan["n_tokens"].to_numpy().cumsum() - plan["n_tokens"].to_numpy()
    assert np.array_equal(plan["bin"].to_numpy(), excl // 512)
    assert m["n_bins"] == plan["bin"].nunique()

    # the plan references only persisted docs (loader contract)
    assert set(plan["doc_id"]) == set(docs["doc_id"])


def test_curate_resume_and_determinism(ray_session, sf_dir, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _run(a, sf_dir)
    _run(b, sf_dir)
    pa_, pb = (
        read_plan(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        for d in (a, b)
    )
    pd.testing.assert_frame_equal(pa_, pb)  # two fresh runs identical

    # interrupt after stage A: blow away downstream products, rerun → same plan
    shutil.rmtree(os.path.join(b, "docs"))
    shutil.rmtree(os.path.join(b, "plan"))
    os.remove(os.path.join(b, "docs") + "._DONE")
    os.remove(os.path.join(b, "plan") + "._DONE")
    _run(b, sf_dir)
    pb2 = read_plan(b).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb2)

    # fully-done run is a no-op resume (markers short-circuit every stage)
    m = _run(b, sf_dir)
    pb3 = read_plan(b).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb3)
    assert m.get("input", 0) == 0  # no batch work re-ran


def test_make_documents_deterministic_with_planted_dups():
    from content_crawler_ray.sources.synth import make_documents

    a = make_documents(2000).to_pandas()
    b = make_documents(2000).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # same seed → identical table
    texts = a["text"].tolist()
    exact = sum(texts[i] == texts[i - 1] for i in range(1, len(texts)))
    assert 10 <= exact <= 60  # ~1.5% planted exact dups
    assert a["lang"].value_counts(normalize=True)["en"] > 0.6
    # language steering drives the langid kernel, not just the lang column
    from content_crawler_ray.functions.text import langid

    pred = langid(a["text"].head(200))
    agree = (pred.to_numpy() == a["lang"].head(200).to_numpy()).mean()
    assert agree > 0.95


def test_curate_antijoin_branch_matches_broadcast(ray_session, tmp_path):
    """Planted high-density near-dup input: forcing drop_broadcast_max=0
    routes the drop set through the bucketed anti-join; the corpus must be
    identical to the broadcast branch's."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = (
        "the quick brown fox jumps over the lazy dog and then the small cat "
        "sits on the mat with some other common english words that keep the "
        "language classifier happy and the shingle set long enough for the "
        "minhash bands to agree across copies of this document body "
    ) * 3
    rows_text, rows_id = [], []
    # ids avoid doc_id % 97 == 0 — those are benchmark rows and every doc
    # shares the base text's 4-grams, so a single benchmark doc would
    # decontaminate the whole corpus away
    ids = [j for j in range(1, 400) if j % 97 != 0][:240]
    for i, j in enumerate(ids):
        # 40 clusters of 6 near-identical docs → dense drop set
        rows_id.append(j)
        rows_text.append(base + f"cluster {i // 6} variant {'x' * (i % 6)}")
    docs = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(["en"] * len(rows_id), pa.string()),
            "source": pa.array(["t"] * len(rows_id), pa.string()),
            "n_chars": pa.array([len(t) for t in rows_text], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    a, b = str(tmp_path / "bcast"), str(tmp_path / "anti")
    ma = curate_corpus(str(tmp_path), a)
    mb = curate_corpus(str(tmp_path), b, drop_broadcast_max=0)
    assert ma["minhash_dropped"] == mb["minhash_dropped"] > 50  # dense dups
    pa_, pb = (
        read_plan(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        for d in (a, b)
    )
    pd.testing.assert_frame_equal(pa_, pb)
    da, db = (
        rd.read_parquet(os.path.join(d, "docs"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for d in (a, b)
    )
    pd.testing.assert_frame_equal(da, db)


def test_curate_all_filtered_degrades_to_empty(ray_session, tmp_path):
    """An input the language filter fully rejects yields empty (not crashed)
    products: typed empty parquet at every stage boundary, zero bins."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["der und das text", "le et les texte", "el y los texto"],
                pa.string(),
            ),
            "lang": pa.array(["de", "fr", "es"], pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = str(tmp_path / "out")
    m = curate_corpus(str(tmp_path), out)
    assert m["lang_kept"] == 0 and m["n_clean"] == 0 and m["n_bins"] == 0
    assert read_plan(out).count() == 0


def test_curate_gram_semijoin_branch_matches_broadcast(ray_session, tmp_path):
    """Planted contamination: benchmark docs (id % 97 == 0) share a 4-gram
    run with half the corpus. Forcing gram_broadcast_max=0 routes the
    decontamination through the gram-key bucketed semi-join; the corpus and
    the contaminated_dropped lineage count must match the broadcast branch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    filler = (
        "plain ordinary text with enough common english words to pass the "
        "language and the quality filters without tripping anything else "
    )
    bench_phrase = "the secret held out benchmark evaluation phrase is in the text and "
    rows_id, rows_text = [], []
    for j in range(1, 320):
        rows_id.append(j)
        if j % 97 == 0:  # benchmark rows: ONLY the planted phrase (no
            # filler grams, so only docs containing the phrase are
            # contaminated), repeated enough to clear the 10th-percentile
            # quality filter
            rows_text.append(bench_phrase * 20)
        elif j % 2 == 0:  # half the corpus is contaminated by that phrase
            rows_text.append(filler * 2 + bench_phrase + f" tail {j} " + filler)
        else:
            rows_text.append(filler * 3 + f" unique marker {j} words here ")
    docs = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(["en"] * len(rows_id), pa.string()),
            "source": pa.array(["t"] * len(rows_id), pa.string()),
            "n_chars": pa.array([len(t) for t in rows_text], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    a, b = str(tmp_path / "bcast"), str(tmp_path / "semi")
    ma = curate_corpus(str(tmp_path), a)
    mb = curate_corpus(str(tmp_path), b, gram_broadcast_max=0)
    assert ma["contaminated_dropped"] == mb["contaminated_dropped"] > 50
    da, db = (
        rd.read_parquet(os.path.join(d, "docs"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for d in (a, b)
    )
    pd.testing.assert_frame_equal(da, db)
