"""CLI — the engine's analog of the reference's picocli entry point
(ContentCrawlerMain.java:14-37 with mendeley-crawl / contentful-crawl /
contentful-backup subcommands), dataclass-config driven.

Owns its Ray session (library code never calls ray.init):
  python -m content_crawler_ray.cli crawl  --corpus C.parquet --seeds S.parquet --out OUT
  python -m content_crawler_ray.cli synth  --n-corpus 5000 --n-seeds 10000 --out-dir DIR
  python -m content_crawler_ray.cli query  --name q_a7_topk_users --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_crawl(args) -> int:
    ray = _ray_session(args.num_cpus)
    import pyarrow.parquet as pq

    from .config import CrawlConfig, load_config
    from .pipelines.crawl import run_crawl

    seeds = pq.read_table(args.seeds)
    if args.conf:
        # YAML pipeline spec (R/configuration.yml analog); explicit CLI
        # flags override file values, like the reference's picocli overrides
        cfg, extras = load_config(args.conf)
        if extras:
            # unknown keys INSIDE crawl: raise (strict Jackson analog), but a
            # top-level typo (e.g. 'crawls:') would otherwise be silently
            # ignored with defaults applied — surface it (round-3 ADVICE)
            print(
                "warning: unrecognized top-level config keys ignored by "
                f"'crawl': {sorted(extras)}",
                file=sys.stderr,
            )
        for field in ("wave_size", "host_budget", "max_waves"):
            v = getattr(args, field)
            if v is not None:
                setattr(cfg, field, v)
        cfg.resume = bool(args.resume or cfg.resume)
    else:
        cfg = CrawlConfig(
            wave_size=args.wave_size if args.wave_size is not None else 10_000,
            host_budget=args.host_budget if args.host_budget is not None else 4,
            max_waves=args.max_waves if args.max_waves is not None else 32,
            resume=args.resume,
        )
    res = run_crawl(args.corpus, seeds, args.out, cfg)
    print(json.dumps({"n_waves": res["n_waves"], "seen": res["seen_size"], "out": args.out}))
    ray.shutdown()
    return 0


def cmd_registry(args) -> int:
    """Registry phase: re-read the published spool and merge reverse links
    into the registry table (M/MendeleyDocumentCrawler.java:140-150)."""
    ray = _ray_session(args.num_cpus)
    from .pipelines.linker import registry_update_from_spool

    n = registry_update_from_spool(args.crawl_out, args.registry_dir)
    print(json.dumps({"rows": n, "registry": args.registry_dir}))
    ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    import pyarrow.parquet as pq

    from .sources import synth

    os.makedirs(args.out_dir, exist_ok=True)
    pq.write_table(synth.make_corpus(args.n_corpus), os.path.join(args.out_dir, "corpus.parquet"))
    pq.write_table(
        synth.make_seeds(args.n_seeds, args.n_corpus), os.path.join(args.out_dir, "seeds.parquet")
    )
    print(json.dumps({"corpus": args.n_corpus, "seeds": args.n_seeds, "dir": args.out_dir}))
    return 0


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.queries import QUERIES

    fn, _sql = QUERIES[args.name]
    out = fn(args.sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    print(df.head(args.limit).to_string())
    print(f"... {len(df)} rows")
    ray.shutdown()
    return 0


def cmd_backup(args) -> int:
    """contentful-backup analog: stream the corpus into content-addressed
    blobs + metadata shards (B/ContentfulBackup.java:98-208)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.backup import backup_corpus

    stats = backup_corpus(rd.read_parquet(args.corpus), args.out)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_restore(args) -> int:
    """contentful-restore analog: backup dir → parquet, optional global
    ops/sec limit via the shared token-bucket actor (B/ContentfulRestore.java:46)."""
    ray = _ray_session(args.num_cpus)
    from .pipelines.backup import restore_corpus_ds

    # materialize once: count() after write_parquet would re-run the whole
    # restore (every blob read twice, rate-limit tokens paid twice)
    ds = restore_corpus_ds(args.backup_dir, rate=args.rate).materialize()
    ds.write_parquet(args.out)
    print(json.dumps({"rows": ds.count(), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Curation pipeline: documents → filtered/deduped/decontaminated docs +
    token-budget packing plan (pipelines/curate.py); resumable per stage."""
    ray = _ray_session(args.num_cpus)
    from .pipelines.curate import curate_corpus

    metrics = curate_corpus(
        args.sf_dir,
        args.out,
        keep_lang=args.keep_lang,
        quality_pct=args.quality_pct,
        pack_budget=args.pack_budget,
    )
    print(json.dumps({"out": args.out, **metrics}))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="content_crawler_ray")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the frontier crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--seeds", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--conf", help="YAML pipeline spec (configuration.yml analog)")
    c.add_argument("--wave-size", type=int, default=None)
    c.add_argument("--host-budget", type=int, default=None)
    c.add_argument("--max-waves", type=int, default=None)
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    g = sub.add_parser("registry", help="registry phase: spool re-read → link merge")
    g.add_argument("--crawl-out", required=True)
    g.add_argument("--registry-dir", required=True)
    g.set_defaults(fn=cmd_registry)

    s = sub.add_parser("synth", help="generate a deterministic corpus + seeds")
    s.add_argument("--n-corpus", type=int, default=500)
    s.add_argument("--n-seeds", type=int, default=1000)
    s.add_argument("--out-dir", required=True)
    s.set_defaults(fn=cmd_synth)

    b = sub.add_parser("backup", help="stream the corpus to a backup dir")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.set_defaults(fn=cmd_backup)

    r = sub.add_parser("restore", help="restore a backup dir to parquet")
    r.add_argument("--backup-dir", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--rate", type=float, default=None)
    r.set_defaults(fn=cmd_restore)

    q = sub.add_parser("query", help="run one registry query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    cu = sub.add_parser("curate", help="end-to-end training-corpus curation")
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--keep-lang", default="en")
    cu.add_argument("--quality-pct", type=int, default=10)
    cu.add_argument("--pack-budget", type=int, default=512)
    cu.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
