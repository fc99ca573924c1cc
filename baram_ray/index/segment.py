"""Index reader: term dictionary + compressed posting blocks + doc metadata.

The query-time state the reference keeps resident inside OpenSearch
(SURVEY.md A7, ``src/embedding/mod.rs:178-219`` is client-only). Loaded once
per query actor (``__init__``), shared across every query batch the actor
serves.

Memory model: the docs table (doc_id → dl per field + filterable metadata)
and the per-term *block metadata* live in RAM; posting payload stays as
encoded bytes and is decoded block-by-block on demand. On a real cluster
each query actor would load only its assigned shards' segments (shards are
doc_id ranges); in this sandbox one actor holds all shards.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from baram_ray.index.codec import decode_block


class PostingList:
    """All blocks of one (field, term), sorted in global doc_id order.

    Blocks come sorted by (shard, block_id); shards are doc_id ranges, so
    that order IS doc_id order — concatenation needs no merge.
    """

    __slots__ = ("n_blocks", "counts", "min_docs", "max_docs", "max_tfs",
                 "docs_enc", "tfs_enc", "df", "_cache")

    def __init__(self, counts, min_docs, max_docs, max_tfs, docs_enc, tfs_enc):
        self.n_blocks = len(counts)
        self.counts = counts
        self.min_docs = min_docs
        self.max_docs = max_docs
        self.max_tfs = max_tfs
        self.docs_enc = docs_enc
        self.tfs_enc = tfs_enc
        self.df = int(sum(counts))
        self._cache: dict[int, tuple] = {}   # decoded blocks, reused across
        # queries served by the same resident engine/actor

    def decode(self, i: int):
        hit = self._cache.get(i)
        if hit is None:
            hit = self._cache[i] = decode_block({
                "n": self.counts[i], "docs_enc": self.docs_enc[i],
                "tfs_enc": self.tfs_enc[i]})
        return hit

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(-1)
        if hit is not None:
            return hit
        docs = np.empty(self.df, dtype=np.int64)
        tfs = np.empty(self.df, dtype=np.int64)
        pos = 0
        for i in range(self.n_blocks):
            d, t = self.decode(i)
            docs[pos: pos + len(d)] = d
            tfs[pos: pos + len(t)] = t
            pos += len(d)
        self._cache[-1] = (docs, tfs)
        return docs, tfs


class IndexReader:
    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.fields: list[str] = self.meta["fields"]
        self.n_docs: int = self.meta["n_docs"]
        self.avgdl: dict[str, float] = self.meta["avgdl"]
        self.k1: float = self.meta["k1"]
        self.b: float = self.meta["b"]

        # --- docs table: doc_id -> row index; dl arrays; metadata ---------
        docs = pq.read_table(os.path.join(index_dir, "docs"))
        order = np.argsort(docs["doc_id"].to_numpy(), kind="stable")
        self.doc_ids = docs["doc_id"].to_numpy()[order]
        self.doc_index = {int(d): i for i, d in enumerate(self.doc_ids)}
        self.dl = {f: docs[f"{f}__len"].to_numpy().astype(np.float64)[order]
                   for f in self.fields}
        self.doc_meta = {}
        for c in self.meta.get("keep", []):
            if c in docs.column_names:
                self.doc_meta[c] = np.asarray(docs[c].to_pylist(), dtype=object)[order]
        self.sha256 = np.asarray(docs["sha256"].to_pylist(), dtype=object)[order]

        # --- segments: (field, term) -> PostingList ------------------------
        seg = pq.read_table(os.path.join(index_dir, "segments"))
        if seg.num_rows:
            # global doc order = (shard asc, block_id asc); min_doc is
            # equivalent but (shard, block_id) is explicit about layout
            df_ = seg.to_pandas()
            df_ = df_.sort_values(["field", "term", "shard", "block_id"],
                                  kind="stable")
        else:
            df_ = seg.to_pandas()
        self.postings: dict[tuple[str, str], PostingList] = {}
        if len(df_):
            for (fld, term), g in df_.groupby(["field", "term"], sort=False):
                self.postings[(fld, term)] = PostingList(
                    g["n"].to_numpy(), g["min_doc"].to_numpy(),
                    g["max_doc"].to_numpy(), g["max_tf"].to_numpy(),
                    list(g["docs_enc"]), list(g["tfs_enc"]))

    def df(self, fld: str, term: str) -> int:
        p = self.postings.get((fld, term))
        return p.df if p else 0

    def filter_mask(self, filters: dict | None) -> np.ndarray | None:
        """Row-aligned boolean mask for metadata filters.

        Values: a scalar = equality (the reference's term filters,
        ``src/embedding/mod.rs:509-532``); a dict with ``gte``/``lte``/
        ``gt``/``lt`` = a range predicate (the reference's ``published_at``
        range filter, ``src/embedding/mod.rs:517-532``) — works on any
        kept numeric/date/string metadata column.
        """
        if not filters:
            return None
        mask = np.ones(len(self.doc_ids), dtype=bool)
        for col, val in filters.items():
            if col not in self.doc_meta:
                raise KeyError(f"unknown filter column {col!r}")
            data = self.doc_meta[col]
            if isinstance(val, dict):
                bad = set(val) - {"gte", "lte", "gt", "lt"}
                if bad:
                    raise KeyError(f"unknown range op(s) {sorted(bad)}")
                if "gte" in val:
                    mask &= data >= val["gte"]
                if "lte" in val:
                    mask &= data <= val["lte"]
                if "gt" in val:
                    mask &= data > val["gt"]
                if "lt" in val:
                    mask &= data < val["lt"]
            else:
                mask &= data == val
        return mask

    def doc_ids_for_term(self, fld: str, term: str) -> np.ndarray:
        """doc_ids containing (field, term) — retrieval without scoring
        (rank-space postings decoded and mapped back through doc_ids)."""
        pl = self.postings.get((fld, term))
        if pl is None:
            return np.empty(0, dtype=np.int64)
        rows, _ = pl.decode_all()
        return self.doc_ids[rows]
