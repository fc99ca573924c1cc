"""baram_ray — a Ray-Data-native inverted-index builder + BM25 query engine.

A from-scratch rebuild of the full-text search core of hephaex/Baram
(reference at /root/reference, a Rust crawler/indexer that delegates BM25 to
OpenSearch) as idiomatic Ray Data pipelines:

- ``baram_ray.tokenizer``   — the analyzer (reference: nori config,
  src/embedding/mod.rs:247-276, generalized to source code).
- ``baram_ray.stages``      — stateless ``map_batches`` stages (normalize,
  sha256 invariant, text analytics).
- ``baram_ray.index``       — posting-list construction, compression
  (delta varint + skip/block-max blocks), partition manifests, resume.
- ``baram_ray.query``       — brute-force BM25 oracle + block-max WAND
  top-k, query actor pool.
- ``baram_ray.dedup``       — exact + MinHash-LSH + SimHash + n-gram
  Jaccard + embedding-cosine near-dup.
- ``baram_ray.similarity``  — brute-force / LSH-bucketed ANN over
  embedding columns.
- ``baram_ray.pipelines``   — driver-contract pipelines over the testdata
  tables, each with a DuckDB SQL oracle.

No function here calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"
