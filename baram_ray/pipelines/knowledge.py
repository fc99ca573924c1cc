"""Knowledge-graph + clustering pipelines exposed through the driver
contract: relation extraction (M10), triple stats (G3), RDF export
(S10), event cluster formation (reference clustering engine) + the S9
cluster-JSON writer.
"""

from __future__ import annotations

import os

import pandas as pd

import ray.data

from baram_ray import clustering, ontology
from baram_ray.pipelines.util import read_table
from baram_ray.util import grouped_agg

CLUSTER_THRESHOLD = 0.55


def _relations_ds(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(ontology.relations_stage, batch_format="pyarrow")


REL_SCHEMA = {"doc_id": "int64", "subject": "object",
              "predicate": "object", "object": "object",
              "n": "int64", "confidence": "float64",
              "verified": "bool"}


def text_relations(sf_dir: str):
    """M10: regex relation extraction between NER entities —
    (doc_id, subject, predicate, object, n, confidence, verified).
    SQL oracle via the same regexes in DuckDB. Schema survives a
    relation-free corpus (fuzz find)."""
    from baram_ray.pipelines.util import ensure_cols
    return ensure_cols(_relations_ds(sf_dir), REL_SCHEMA)


def triple_stats(sf_dir: str):
    """G3: per-predicate triple-store statistics (reference TripleStats,
    extractor.rs:1389-1403): triple instances, distinct docs/subjects/
    objects."""
    from baram_ray.pipelines.util import ensure_cols
    rel = _relations_ds(sf_dir)
    out = grouped_agg(
        rel, ["predicate"],
        {"n_triples": ("n", "sum"),
         "n_docs": ("doc_id", "nunique"),
         "n_subjects": ("subject", "nunique"),
         "n_objects": ("object", "nunique")},
        num_buckets=4)
    return ensure_cols(out, {"predicate": "object",
                             "n_triples": "int64", "n_docs": "int64",
                             "n_subjects": "int64",
                             "n_objects": "int64"})


def rdf_export_nt(sf_dir: str):
    """S10: write N-Triples files (one per block, doc_id-range named,
    atomic rename) and return the write manifest."""
    out_dir = os.path.join("/tmp/baram_ray_rdf",
                           os.path.basename(os.path.normpath(sf_dir)))
    manifest = ontology.write_rdf(_relations_ds(sf_dir), out_dir,
                                  fmt="nt").to_pandas()
    return manifest.sort_values("path").reset_index(drop=True)


def doc_markdown_export(sf_dir: str):
    """S3: template-rendered markdown file per document (reference
    markdown sink); returns the write manifest as (file, n_bytes) —
    the basename rather than the absolute path, so the manifest is
    location-independent (and the rendered size per document is
    recomputable in SQL → hash-exact DuckDB oracle)."""
    from baram_ray.sinks import write_markdown
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = os.path.join("/tmp/baram_ray_markdown",
                           os.path.basename(os.path.normpath(sf_dir)))
    tpl = ("---\ndoc_id: {{doc_id}}\nlang: {{lang}}\n---\n\n"
           "# Document {{doc_id}}\n\n{{text}}\n")
    man = write_markdown(ds, out_dir, template=tpl).to_pandas()
    man["file"] = man["path"].map(os.path.basename)
    return (man[["file", "n_bytes"]]
            .sort_values("file").reset_index(drop=True))


def cluster_events(sf_dir: str):
    """Event cluster formation over the embeddings table (reference
    greedy threshold clustering, engine.rs:287-428): EventCluster rows.
    Rows-only driver check; single-block equivalence to the reference's
    sequential algorithm is pytest-verified."""
    from baram_ray.util import auto_num_blocks
    path = os.path.join(sf_dir, "embeddings.parquet")
    # size-based block count (NOT a fixed constant): per-block greedy
    # work and the tree-merge width must grow with the data, not stay
    # corpus/4 per task at 100× scale
    ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding", "label"],
        override_num_blocks=auto_num_blocks(path))
    out = clustering.cluster_events(ds, threshold=CLUSTER_THRESHOLD)
    # S9: persist each cluster as a JSON document
    clustering.write_cluster_json(
        out, os.path.join("/tmp/baram_ray_clusters",
                          os.path.basename(os.path.normpath(sf_dir))))
    return out


def text_said_relations(sf_dir: str):
    """LLM-assisted Said-relation extraction over documents (reference
    ``src/llm/mod.rs:268-287``): batched prompts through the actor pool,
    three-level fallback response parsing; deterministic fake generator
    (no LLM endpoint in this container — the HTTP backends are honestly
    stubbed). Rows-only driver check; prompt/parse semantics are
    pytest-checked against the reference's own unit cases."""
    from baram_ray.llm import SaidExtractStage
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SaidExtractStage, batch_format="pandas",
                          concurrency=2, batch_size=64)


def cluster_summaries(sf_dir: str):
    """Cluster summarization (reference ``ClusterSummarizer``,
    ``src/clustering/summary.rs``): form event clusters, list each
    cluster's top members, generate (title, summary) per cluster through
    the LLM actor pool — deterministic fake client (no LLM endpoint in
    this container; the HTTP path is honestly stubbed). Rows-only driver
    check; prompt/parse semantics are pytest-checked against the
    reference's own unit cases."""
    from baram_ray.summarize import summarize_clusters
    from baram_ray.util import auto_num_blocks
    path = os.path.join(sf_dir, "embeddings.parquet")
    # size-based block count (same as cluster_events above): per-block
    # greedy work must shrink as the corpus grows, not stay corpus/4
    ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding", "label"],
        override_num_blocks=auto_num_blocks(path))
    clusters, members = clustering.cluster_events(
        ds, threshold=CLUSTER_THRESHOLD, return_members=True)
    out = summarize_clusters(clusters, members).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def doc_markdown_roundtrip(sf_dir: str):
    """S1/S2 source parity: export the documents table through the
    markdown sink, read the directory back through the markdown SOURCE
    (``baram_ray/sources.py`` — the reference's index-input parser,
    index.rs:402-520) and recover (doc_id, text). Hash-exact oracle:
    the recovered text must equal the original column (the corpus text
    is single-line, so the parser's blank-line drop is a no-op)."""
    from baram_ray.sources import read_markdown_dir

    doc_markdown_export(sf_dir)          # ensure the .md tree exists
    out_dir = os.path.join("/tmp/baram_ray_markdown",
                           os.path.basename(os.path.normpath(sf_dir)))
    back = read_markdown_dir(out_dir)

    # front-matter in the export template is `doc_id:`/`lang:` — those
    # land in the parser's meta dict, which the batch schema does not
    # carry; recover doc_id from the filename column instead (the sink
    # names files {doc_id}.md) and text as content minus the heading
    def project(batch):
        import pyarrow as pa
        ids, texts = [], []
        for path, content in zip(batch["path"].to_pylist(),
                                 batch["content"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            # content = '# Document N\n{text}' (single-line corpus)
            body = content.split("\n", 1)
            texts.append(body[1] if len(body) > 1 else "")
            ids.append(int(stem))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return back.map_batches(project, batch_format="pyarrow")
