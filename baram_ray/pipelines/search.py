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


def bm25_filtered(sf_dir: str, query_text: str = "data stream query",
                  lang: str = "en", k: int = 10,
                  min_score: float = 0.01):
    """BM25 top-k with a metadata term filter + min_score — the
    reference's filtered query shape (term filters
    src/embedding/mod.rs:509-532, min_score :623-625). Rows-only driver
    check; filter semantics tested vs the brute-force oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    hits = eng.search(query_text, k=k, filters={"lang": lang},
                      min_score=min_score)
    return pd.DataFrame({
        "rank": range(1, len(hits) + 1),
        "doc_id": [d for d, _ in hits],
        "score": [round(s, 6) for _, s in hits],
    })


HYBRID_W_BM25 = 0.3       # reference hybrid-pipeline weights
HYBRID_W_KNN = 0.7        # (CLAUDE.md:377-387, src/embedding/mod.rs:713-765)
HYBRID_QUERY_VEC = 0      # vec_id used as the kNN query vector


def _minmax(scores: dict[int, float]) -> dict[int, float]:
    """Min-max normalize a doc→score map (the reference's
    ``hybrid-pipeline`` normalization processor)."""
    if not scores:
        return {}
    lo, hi = min(scores.values()), max(scores.values())
    if hi == lo:
        return {d: 1.0 for d in scores}
    return {d: (s - lo) / (hi - lo) for d, s in scores.items()}


def hybrid_topk(sf_dir: str, query_text: str = "data stream query",
                k: int = 10, pool: int = 100):
    """K3: hybrid BM25 + kNN top-k — min-max normalize each sub-query's
    top-``pool`` scores, arithmetic-mean with weights [0.3, 0.7], re-rank
    (reference search_hybrid, src/embedding/mod.rs:537-602; docs carry no
    text-embedding model here, so the kNN query is a corpus vector —
    ``vec_id == doc_id`` in the testdata tables).

    Non-SQL-expressible (BM25 core) → rows-only driver check; rank math
    is unit-tested against a pure-python recomputation.
    """
    import numpy as np

    from baram_ray.query.engine import QueryEngine
    from baram_ray.similarity import _matrix, _norm_rows

    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    bm25 = dict(eng.search(query_text, k=pool))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    ids, mats = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids.append(b["vec_id"].to_numpy(zero_copy_only=False))
        mats.append(_matrix(b))
    ids = np.concatenate(ids)
    vecs = _norm_rows(np.concatenate(mats))
    q = vecs[list(ids).index(HYBRID_QUERY_VEC)]
    sims = vecs @ q
    mask = ids != HYBRID_QUERY_VEC
    top = np.argsort(-sims[mask], kind="stable")[:pool]
    knn = {int(d): float(s) for d, s in
           zip(ids[mask][top], sims[mask][top])}

    nb, nk = _minmax(bm25), _minmax(knn)
    merged = {d: HYBRID_W_BM25 * nb.get(d, 0.0) + HYBRID_W_KNN * nk.get(d, 0.0)
              for d in set(nb) | set(nk)}
    rows = sorted(merged.items(), key=lambda x: (-x[1], x[0]))[:k]
    return pd.DataFrame({
        "rank": range(1, len(rows) + 1),
        "doc_id": [d for d, _ in rows],
        "score": [round(s, 6) for _, s in rows],
    })


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
