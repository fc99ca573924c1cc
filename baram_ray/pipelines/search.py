"""The flagship search pipelines over ``documents`` — index build + BM25
top-k (SURVEY.md §3.1/§3.2), exposed through the driver contract.

The index for an ``sf_dir`` is built once under /tmp and resumed on
re-entry (stage manifests fingerprint the input, so a changed input
rebuilds automatically).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

import ray.data

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.engine import QueryActor
from baram_ray.query.queryset import QUERY_SET

_INDEX_ROOT = "/tmp/baram_ray_indexes"


def ensure_index(sf_dir: str) -> str:
    """Build (or resume) the documents-table index for sf_dir; return its dir."""
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(_INDEX_ROOT, f"documents_{tag}")
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang", "source"))
    build_index(os.path.join(sf_dir, "documents.parquet"), out, cfg, resume=True)
    return out


# queries against the documents table's actual vocabulary (word-list corpus)
DOC_QUERIES = [
    {"query_id": 0, "text": "data processing query", "k": 10},
    {"query_id": 1, "text": "table scan filter", "k": 10},
    {"query_id": 2, "text": "hash join merge sort", "k": 10},
    {"query_id": 3, "text": "stream window agg", "k": 5},
    {"query_id": 4, "text": "vector batch", "k": 25},
    {"query_id": 5, "text": "qqqxplughz", "k": 10},     # zero hits
]


def bm25_topk(sf_dir: str, queries: list[dict] | None = None,
              concurrency: int = 2):
    """Batched BM25 top-k via the query actor pool; rows
    (query_id, rank, doc_id, score)."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or DOC_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         batch_format="pandas", concurrency=concurrency)

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        df["score"] = df["score"].round(6)
        return df

    return out.map_batches(_round, batch_format="pandas")


def index_stats(sf_dir: str):
    """S6-style count/maintenance surface (reference get_document_count,
    src/embedding/mod.rs:807-818)."""
    idx = ensure_index(sf_dir)
    import json
    with open(os.path.join(idx, "meta.json")) as f:
        meta = json.load(f)
    td = ray.data.read_parquet(os.path.join(idx, "termdict"))
    n_terms = td.count()
    return pd.DataFrame([{
        "n_docs": meta["n_docs"],
        "n_terms": n_terms,
        "avgdl_text": round(meta["avgdl"]["text"], 6),
        "num_shards": meta["num_shards"],
    }])
