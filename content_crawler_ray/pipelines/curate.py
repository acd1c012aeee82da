"""End-to-end training-corpus curation — the composition product the single
operators exist for: language filter → quality-percentile filter → exact
dedup → MinHash near-dup survivor dedup → benchmark decontamination →
token-budget sequence packing, over the documents table, emitting a packed
corpus (kept docs + packing plan) as partitioned parquet plus per-stage
lineage counts.

Execution shape (designed for 100 TB, tested at sandbox scale):

  stage A  ONE streaming pass: langid + quality threshold (threshold from a
           tiny value-count pre-pass) fused in a single map_batches, then
           the bucketed exact-dedup shuffle; the cleaned set persists to
           ``<out>/clean/`` parquet. A persisted stage boundary is
           deliberate — it is the resume point, and two downstream
           consumers (the MinHash pair sub-DAG and final assembly) read it
           without recomputing the pass.
  stage B  MinHash+LSH verified pairs over the cleaned set → distributed
           connected components → the non-representative drop set. While
           the drop set is small (≤ ``drop_broadcast_max`` ids) it is
           broadcast via ray.put and np.isin'd in stage C's fused filter;
           past the threshold the pipeline AUTO-SWITCHES to a bucketed
           anti-join (the q_j7 shape: clean rows and drop ids ride one
           doc_id-hash-bucketed exchange, each bucket keeps non-members)
           so no drop id ever reaches the driver. Both branches produce
           the identical corpus — tested by forcing the threshold to 0 on
           a planted high-density near-dup input.
  stage C  ONE streaming pass over ``clean/``: drop benchmark docs
           (doc_id % 97 == 0 — the held-out eval stand-in, matching
           q_decontaminate) and docs sharing a word-4-gram with them —
           broadcast gram-hash ``np.isin`` while the bench gram set is
           ≤ ``gram_broadcast_max`` hashes, AUTO-SWITCHING to a gram-key
           bucketed semi-join past it (``_gram_semi_join_ids``) so the
           gram set never gathers on the driver — drop MinHash
           non-survivors,
           persist the kept docs to ``<out>/docs/``; then the
           range-partitioned prefix sum assigns token-budget bins and the
           packing PLAN (doc_id, n_tokens, bin) lands in ``<out>/plan/``.
           The plan references docs by id instead of duplicating text —
           the trainer's loader streams text from ``docs/`` by id.

Every stage writes a ``_DONE`` marker; re-running skips completed stages
(per-stage resumability, the same contract as the crawl's wave manifests).
Lineage counts are streamed to a tiny counter actor from inside the batch
functions — no extra counting passes over the data.

Reference provenance: the reference has no curation pipeline (it crawls and
indexes); this is the Axes-B extension composing SURVEY §2's transform/
dedup machinery into the training-data product the north rule targets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import text as T
from ..functions.hashing import hash64_array


@ray.remote(num_cpus=0)
class _CurateCounter:
    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, stage: str, n: int) -> None:
        self.counts[stage] = self.counts.get(stage, 0) + int(n)

    def add_many(self, counts: dict) -> None:
        for stage, n in counts.items():
            self.counts[stage] = self.counts.get(stage, 0) + int(n)

    def get(self) -> dict:
        return dict(self.counts)


def _done(path: str) -> str:
    # sibling marker, NOT inside the directory — read_parquet(dir) must see
    # only parquet files
    return path.rstrip("/") + "._DONE"


def _fresh_stage_dir(path: str) -> None:
    """A stage dir WITHOUT its _DONE marker is a crashed partial write —
    Ray's write_parquet uses unique per-run filenames, so re-running the
    stage on top of leftovers would APPEND a second copy of every row.
    Resume semantics: finished stages (marker present) are skipped by the
    caller; unfinished ones start from a clean directory."""
    import shutil

    if os.path.isdir(path) and not os.path.exists(_done(path)):
        shutil.rmtree(path)


def _ensure_parquet_dir(path: str, schema: dict) -> None:
    """A zero-row write_parquet creates NOTHING; downstream readers need a
    typed empty file so the all-filtered funnel degrades to empty outputs
    instead of FileNotFoundError."""
    if not os.path.isdir(path):
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        empty = pa.table({c: pa.array([], t) for c, t in schema.items()})
        pq.write_table(empty, os.path.join(path, "empty.parquet"))


def _quality_threshold(ds: rd.Dataset, pct: int) -> int:
    """pct-th percentile of token counts — the shared order-statistic
    select (agg.value_count_threshold), so this and q_quality_filter can
    never drift from the quantile_disc SQL twin."""
    from .agg import value_count_threshold

    return value_count_threshold(
        ds, lambda b: T.token_counts(b["text"]).to_numpy(zero_copy_only=False), pct
    )


def _anti_join_drop(clean: rd.Dataset, drop_ds: rd.Dataset) -> rd.Dataset:
    """Bucketed anti-join: keep clean rows whose doc_id is NOT in drop_ds
    (column ``node``). One doc_id-hash exchange over both sides (the
    q_j7_anti_join shape, queries.py:2575); the drop set never gathers."""
    from ..functions.hashing import splitmix64
    from ..runtime import n_buckets_for

    n_buckets = n_buckets_for()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("_side", pa.int8()),
            ("_b", pa.int64()),
        ]
    )

    def tag(side: int, key: str):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [
                    pa.array(k, pa.int64()),
                    pc.cast(b["text"], pa.string()) if side == 0 else pa.nulls(n, pa.string()),
                    pa.array(np.full(n, side, np.int8), pa.int8()),
                    pa.array(
                        (splitmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
                        pa.int64(),
                    ),
                ],
                schema=schema,
            )

        return fn

    tagged = clean.map_batches(tag(0, "doc_id"), batch_format="pyarrow").union(
        drop_ds.map_batches(tag(1, "node"), batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        lt = g[g["_side"] == 0]
        have = g.loc[g["_side"] == 1, "doc_id"].to_numpy()
        out = lt[~lt["doc_id"].isin(have)]
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    return tagged.groupby("_b").map_groups(anti, batch_format="pandas")


def _gram_semi_join_ids(clean: rd.Dataset, bench_grams_ds: rd.Dataset) -> rd.Dataset:
    """DISTINCT non-benchmark doc_ids sharing a word-4-gram with the
    benchmark gram set (column ``h``) — gram-key bucketed semi-join, the
    at-scale twin of stage C's broadcast ``np.isin`` contamination check.
    Two exchanges: gram-hash buckets resolve membership, then a tiny
    doc_id-bucketed pass dedups docs contaminated via grams that landed in
    different buckets (so the lineage count matches the broadcast branch
    exactly)."""
    from ..functions.hashing import splitmix64
    from ..runtime import n_buckets_for
    from .queries import _gram_hashes

    n_buckets = n_buckets_for()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("h", pa.uint64()),
            ("_side", pa.int8()),
            ("_b", pa.int64()),
        ]
    )

    def doc_side(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 97 != 0))
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx, h = _gram_hashes(b)
        d = ids[doc_idx] if len(doc_idx) else np.array([], np.int64)
        h = h.astype(np.uint64)
        return pa.Table.from_arrays(
            [
                pa.array(d, pa.int64()),
                pa.array(h, pa.uint64()),
                pa.array(np.zeros(len(h), np.int8), pa.int8()),
                pa.array((splitmix64(h) % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
            ],
            schema=schema,
        )

    def bench_side(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n, -1, np.int64), pa.int64()),
                pa.array(h, pa.uint64()),
                pa.array(np.ones(n, np.int8), pa.int8()),
                pa.array((splitmix64(h) % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
            ],
            schema=schema,
        )

    tagged = clean.map_batches(doc_side, batch_format="pyarrow").union(
        bench_grams_ds.map_batches(bench_side, batch_format="pyarrow")
    )

    def semi(g: pd.DataFrame) -> pa.Table:
        bh = g.loc[g["_side"] == 1, "h"].to_numpy()
        lt = g[g["_side"] == 0]
        hit = lt.loc[lt["h"].isin(bh), "doc_id"].unique()
        return pa.table({"node": pa.array(hit.astype(np.int64), pa.int64())})

    hits = tagged.groupby("_b").map_groups(semi, batch_format="pandas")

    def rebucket(b: pa.Table) -> pa.Table:
        k = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(k, pa.int64()),
                "_b": pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def uniq(g: pd.DataFrame) -> pa.Table:
        return pa.table({"node": pa.array(np.unique(g["node"].to_numpy()), pa.int64())})

    return (
        hits.map_batches(rebucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(uniq, batch_format="pandas")
    )


def curate_corpus(
    sf_dir: str,
    out_dir: str,
    keep_lang: str = "en",
    quality_pct: int = 10,
    minhash_threshold: float = 0.8,
    pack_budget: int = 512,
    drop_broadcast_max: int = 2_000_000,
    gram_broadcast_max: int = 5_000_000,
) -> dict:
    """Run the curation pipeline; returns per-stage lineage counts
    (plus ``stage_secs`` wall-clock telemetry per stage).

    Built under runtime.no_op_reservation: every stage's plan is
    barrier-dominated (exact-dedup sort, LSH band sorts, CC rounds, the
    pack-plan range sort), so at most one map operator is runnable at a
    time and Ray 2.49's per-operator reservation would hand it ~1/n_ops
    of the cluster (measured 4.7x on the minhash stage, runtime.py)."""
    from ..runtime import no_op_reservation

    with no_op_reservation():
        return _curate_corpus(
            sf_dir, out_dir, keep_lang, quality_pct, minhash_threshold,
            pack_budget, drop_broadcast_max, gram_broadcast_max,
        )


def _curate_corpus(
    sf_dir: str,
    out_dir: str,
    keep_lang: str,
    quality_pct: int,
    minhash_threshold: float,
    pack_budget: int,
    drop_broadcast_max: int,
    gram_broadcast_max: int,
) -> dict:
    from .cc import connected_components
    from .dedup import exact_dedup_first, minhash_verified_pairs
    from .queries import _gram_hashes
    from .scan import pack_bins, prefix_sum

    import time as _time

    docs_path = os.path.join(sf_dir, "documents.parquet")
    clean_dir = os.path.join(out_dir, "clean")
    docs_dir = os.path.join(out_dir, "docs")
    plan_dir = os.path.join(out_dir, "plan")
    counter = _CurateCounter.remote()
    stage_secs: dict[str, float] = {}
    _t = _time.time()

    def _mark(stage: str) -> None:
        nonlocal _t
        now = _time.time()
        stage_secs[stage] = round(now - _t, 3)
        _t = now

    # ---- stage A: lang + quality filter (fused) → exact dedup → clean/ ----
    if not os.path.exists(_done(clean_dir)):
        _fresh_stage_dir(clean_dir)
        from ..runtime import read_docs_split

        ds = read_docs_split(docs_path, ["doc_id", "text", "lang"])
        threshold = _quality_threshold(ds, quality_pct)
        _mark("a_threshold")

        def lang_quality(b: pa.Table) -> pa.Table:
            n_in = b.num_rows
            lang = T.langid(pd.Series(b["text"].to_numpy(zero_copy_only=False)))
            keep = (lang == keep_lang).to_numpy()
            b = b.filter(pa.array(keep))
            n = T.token_counts(b["text"]).to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(n >= threshold))
            # ONE blocking actor call per batch (not three): exact counts
            # without serializing every map task through three round-trips
            ray.get(
                counter.add_many.remote(
                    {"input": n_in, "lang_kept": int(keep.sum()), "quality_kept": b.num_rows}
                )
            )
            return b

        deduped = exact_dedup_first(
            ds.map_batches(lang_quality, batch_format="pyarrow")
        ).select_columns(["doc_id", "text"])
        deduped.write_parquet(clean_dir)
        _ensure_parquet_dir(clean_dir, {"doc_id": pa.int64(), "text": pa.string()})
        open(_done(clean_dir), "w").write("ok")
    _mark("a_clean_write")

    clean_glob = clean_dir  # read_parquet accepts the directory
    clean = rd.read_parquet(clean_glob, columns=["doc_id", "text"])
    if not os.path.exists(_done(docs_dir)):
        _fresh_stage_dir(docs_dir)
        # ---- stage B: MinHash survivor drop set over clean/ (only needed
        # when stage C must still run) ----
        pairs = minhash_verified_pairs(clean_glob, threshold=minhash_threshold)
        comp = connected_components(
            pairs.map_batches(
                lambda b: pa.table(
                    {
                        "a": pc.cast(b["doc_a"], pa.int64()),
                        "b": pc.cast(b["doc_b"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        drop = np.array([], dtype=np.int64)
        base = clean
        if comp.count() == 0:  # no near-dup pairs at all
            n_drop = 0
        else:
            drop_ds = comp.map_batches(
                lambda b: pa.table(
                    {"node": b.filter(pc.invert(pc.equal(b["node"], b["component"])))["node"]}
                ),
                batch_format="pyarrow",
            ).materialize()
            n_drop = drop_ds.count()
            if n_drop <= drop_broadcast_max:
                # small drop set: pull ids to the driver, np.isin in the
                # fused stage-C filter (one pass, no extra shuffle)
                if n_drop:
                    drop = np.sort(
                        drop_ds.to_pandas()["node"].to_numpy().astype(np.int64)
                    )
            else:
                # large drop set: bucketed anti-join — ids stay distributed
                base = _anti_join_drop(clean, drop_ds)
        ray.get(counter.add.remote("minhash_dropped", n_drop))
        _mark("b_neardup")

        # ---- stage C: decontaminate + drop non-survivors → docs/ + plan/ ----

        def bench_grams(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0
            return pa.table(
                {"h": pa.array(_gram_hashes(b.filter(pa.array(m)))[1], pa.uint64())}
            )

        bg_ds = clean.map_batches(bench_grams, batch_format="pyarrow").materialize()
        bset = np.array([], dtype=np.uint64)
        check_grams = False
        if bg_ds.count() <= gram_broadcast_max:
            # small bench gram set: driver gather + broadcast np.isin inside
            # the fused final filter (one pass, no extra shuffle)
            bg = bg_ds.to_pandas()
            if "h" in bg.columns and len(bg):
                bset = np.unique(bg["h"].to_numpy().astype(np.uint64))
                check_grams = True
        else:
            # large bench gram set: gram-key bucketed semi-join — the gram
            # hashes stay distributed; contaminated ids join the drop path
            contaminated = _gram_semi_join_ids(clean, bg_ds).materialize()
            n_contam = contaminated.count()
            ray.get(counter.add.remote("contaminated_dropped", n_contam))
            if n_contam:
                base = _anti_join_drop(base, contaminated)
        refs = ray.put((bset, drop, check_grams))
        _mark("c_bench_grams")

        def final_filter(b: pa.Table) -> pa.Table:
            bset, drop, check_grams = ray.get(refs)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ids % 97 != 0  # benchmark rows never train
            counts = {}
            if check_grams:  # broadcast branch only; semi-join branch
                # already removed contaminated rows from `base` upstream
                doc_idx, h = _gram_hashes(b)
                contaminated = np.zeros(b.num_rows, dtype=bool)
                if len(h):
                    np.logical_or.at(contaminated, doc_idx, np.isin(h, bset))
                counts["contaminated_dropped"] = int((keep & contaminated).sum())
                keep &= ~contaminated
            keep &= ~np.isin(ids, drop)
            b = b.filter(pa.array(keep))
            counts["final_kept"] = b.num_rows
            ray.get(counter.add_many.remote(counts))
            return b.append_column("n_tokens", T.token_counts(b["text"]))

        # bench_grams always scans the FULL clean set (branch-invariant gram
        # set); the filter pass runs over `base`, which in the anti-join
        # branch already excludes the drop set
        base.map_batches(final_filter, batch_format="pyarrow").write_parquet(docs_dir)
        _ensure_parquet_dir(
            docs_dir,
            {"doc_id": pa.int64(), "text": pa.string(), "n_tokens": pa.int64()},
        )
        open(_done(docs_dir), "w").write("ok")
    _mark("c_final_write")

    if not os.path.exists(_done(plan_dir)):
        _fresh_stage_dir(plan_dir)
        kept = rd.read_parquet(docs_dir, columns=["doc_id", "n_tokens"])
        run = prefix_sum(kept, "doc_id", "n_tokens", out_col="_run")
        pack_bins(run, pack_budget).write_parquet(plan_dir)
        _ensure_parquet_dir(
            plan_dir,
            {"doc_id": pa.int64(), "n_tokens": pa.int64(), "bin": pa.int64()},
        )
        open(_done(plan_dir), "w").write("ok")
    _mark("d_plan")

    metrics = ray.get(counter.get.remote())
    # Retry caveat: the streamed counter values (input / lang_kept /
    # quality_kept / contaminated_dropped) are telemetry — a replayed Ray
    # task re-reports its batch, so they can over-count under failures.
    # The AUTHORITATIVE counts are re-derived from the persisted products
    # (parquet metadata row counts), which are retry-proof by construction.
    metrics["n_clean"] = rd.read_parquet(clean_glob).count()  # parquet metadata
    metrics["final_kept"] = rd.read_parquet(docs_dir, columns=["doc_id"]).count()
    plan = rd.read_parquet(plan_dir, columns=["bin"]).to_pandas()
    metrics["n_bins"] = int(plan["bin"].nunique()) if "bin" in plan.columns else 0
    metrics["stage_secs"] = stage_secs
    return metrics


def read_plan(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "plan"))
