"""content_crawler_ray — a from-scratch Ray-Data-native crawl/data-processing engine.

Re-expresses the query and data-processing capabilities of gbif/content-crawler
(reference at /root/reference, Java) as idiomatic Ray Data pipelines:

- ``functions/``  pure, vectorized kernels (hashing, URL canonicalization,
  image codecs, text analysis, tag parsing) used inside ``map_batches``.
- ``sources/``    deterministic synthetic corpus/seed generators (the engine's
  "network"), plus the TableIO checkpoint/commit seam (Parquet in-sandbox,
  Lance documented as the production target).
- ``state/``      stateful actor-pool stages: sharded URL-seen set (cuckoo
  filter fast path + exact tier), per-host politeness token buckets.
- ``stages/``     map_batches stage callables (fetch/decode, link extraction,
  enrichment joins).
- ``pipelines/``  the wave-loop crawl driver, dedup/ANN/text pipelines, and
  the driver-facing parity queries with DuckDB oracle SQL.
- ``simulator``   the single-threaded sequential reference oracle replaying
  the reference's paging/ordering/seen semantics (SURVEY.md §5b).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by bench.py / CLI / the pytest fixture.
"""

__version__ = "0.1.0"
