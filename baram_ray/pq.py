"""Product quantization (PQ) ANN — the memory-compression scale path.

At 100 TB, float32 embeddings don't fit in cluster RAM (384-dim =
1536 B/vector → ~38 TB of raw vectors per 25B docs). PQ (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) stores
each vector as ``m`` uint8 codebook indices — m bytes, a 24-192×
compression — and searches with an asymmetric-distance (ADC) lookup
table scan: the QUERY stays full-precision, each corpus vector's inner
product is approximated by summing m table entries. The top
``k × refine`` ADC candidates are then exact-reranked against the
original vectors (a bounded, id-filtered read), so the final top-k is
exact whenever the true neighbors survive the candidate cut.

Reference parity: the reference delegates ANN to OpenSearch/faiss
(``src/embedding/mod.rs:309-321``); faiss's PQ/IVF-PQ family is its
standard beyond-RAM configuration. This module is the PQ half, built
Ray-Data-first:

- ``pq_train``: per-subspace L2 k-means on a bounded sample (the
  codebook is m × 2^nbits × dsub ≈ 128 KB — driver/broadcast safe by
  construction).
- ``pq_build``: one streaming ``map_batches`` encode pass over the
  corpus; codes written as parquet partitioned by coarse CELL
  (IVF-PQ layout; vec_id hash shard when ``n_coarse=0``) +
  ``codebooks.npz`` + ``meta.json`` — resumable, one directory per
  partition.
- ``pq_search``: codes-only ``read_parquet`` (m+2 bytes/vector leave
  storage instead of 4d; with ``nprobe`` only the probed cells' files
  are read at all — the double pruning of IVF-PQ), vectorized
  LUT-gather scan per batch, grouped candidate merge, optional exact
  refine via an id-broadcast filter of the ORIGINAL embeddings
  Dataset (the candidate set is ≤ |Q|·k·refine ids — small by
  construction).

Cosine metric throughout (corpus vectors are L2-normalized before
encoding, like the rest of ``similarity``); ADC then approximates the
cosine directly as a sum of partial inner products.

Scale notes (100 TB): training touches a sample; encode is one
streaming pass; the scan reads m bytes/vector; refine reads only the
candidate rows. Nothing corpus-sized is ever on the driver or in a
broadcast. Skewed shards don't arise (hash partition on vec_id).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from baram_ray.similarity import (_collect_query_vecs, _final_topk,
                                  _matrix, _norm_rows)

__all__ = ["pq_train", "pq_build", "pq_add", "pq_search",
           "pq_encode_batch"]


def _check_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return dim // m


def _sample_norm_vectors(ds, n: int) -> np.ndarray:
    """≤n L2-normalized vectors for codebook training — a DETERMINISTIC
    hash-sample at ~4n/corpus rate (not per-batch heads: heads
    under-sample when blocks are few and bias to leading clusters when
    the corpus is sorted). Tiny driver merge (never the corpus)."""
    total = ds.count()
    if total == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    rate = min(1.0, 4.0 * n / total)
    thresh = np.uint64(min(int(rate * 2**32), 2**32 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = (vid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return batch.filter(pa.array(
            (h & np.uint64(0xFFFFFFFF)) <= thresh))

    rows = ds.map_batches(pick, batch_format="pyarrow").take(n)
    v = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    return _norm_rows(v)


def _kmeans_l2(x: np.ndarray, k: int, iters: int,
               rng: np.random.RandomState) -> np.ndarray:
    """Deterministic L2 Lloyd on a driver-side sample (per-subspace
    codebook training — x is (n, dsub), tiny). Empty clusters are
    re-seeded from the point farthest from its centroid so the
    codebook keeps full resolution on skewed/clustered samples."""
    n = len(x)
    cen = x[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(cen) < k:                      # degenerate tiny sample: pad
        cen = np.vstack([cen, cen[rng.choice(len(cen), k - len(cen))]])
    x2 = (x * x).sum(axis=1)
    for _ in range(iters):
        d2 = x2[:, None] - 2.0 * (x @ cen.T) + (cen * cen).sum(axis=1)
        assign = np.argmin(d2, axis=1)
        dist = d2[np.arange(n), assign]
        for ci in range(k):
            msk = assign == ci
            if msk.any():
                cen[ci] = x[msk].mean(axis=0)
            else:                         # re-seed on the worst-fit row
                far = int(np.argmax(dist))
                cen[ci] = x[far]
                dist[far] = -1.0
    return cen


def _train_books(v: np.ndarray, m: int, nbits: int, iters: int,
                 rng: np.random.RandomState) -> np.ndarray:
    dsub = _check_dims(v.shape[1], m)
    ksub = 1 << nbits
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans_l2(v[:, j * dsub:(j + 1) * dsub], ksub,
                              iters, rng)
    return books


def pq_train(ds, *, m: int = 8, nbits: int = 8, train_sample: int = 4096,
             iters: int = 20, seed: int = 13) -> np.ndarray:
    """Train per-subspace codebooks on a bounded sample of normalized
    vectors. Returns (m, 2**nbits, dsub) float64."""
    v = _sample_norm_vectors(ds, train_sample)
    return _train_books(v, m, nbits, iters, np.random.RandomState(seed))


def _coarse_assign(v: np.ndarray, cen: np.ndarray) -> np.ndarray:
    """Nearest coarse centroid by L2 (centroids are cluster means of
    unit vectors, NOT unit themselves — the ||c||² term matters)."""
    d2 = (cen * cen).sum(axis=1) - 2.0 * (v @ cen.T)
    return np.argmin(d2, axis=1)


def pq_encode_batch(vecs_norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized → (n, m) uint8 codes; vectorized argmin per
    subspace (||x-c||² argmin ⇔ (||c||² − 2 x·c) argmin: the ||x||²
    term is constant per row)."""
    mm, ksub, dsub = books.shape
    n = len(vecs_norm)
    codes = np.empty((n, mm), dtype=np.uint8)
    for j in range(mm):
        cb = books[j]
        xs = vecs_norm[:, j * dsub:(j + 1) * dsub]
        d2 = (cb * cb).sum(axis=1) - 2.0 * (xs @ cb.T)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_build(ds, out_dir: str, *, m: int = 8, nbits: int = 8,
             n_coarse: int = 64, train_sample: int = 4096,
             train_iters: int = 20, num_shards: int = 8,
             seed: int = 13) -> dict:
    """Train (coarse + residual) codebooks, then ONE streaming encode
    pass writing cell-partitioned parquet codes — resumable (a failed
    run re-does only missing partition dirs) and scan-cheap (the
    search reads m+2 bytes/vector, never the embeddings; with
    ``nprobe`` only the probed cells' files).

    ``n_coarse > 0`` is IVF-PQ-style RESIDUAL encoding (Jégou et al.
    §IV): a coarse k-means removes the cluster mean and the product
    codebooks quantize the residual. On clustered corpora (the real
    embedding shape) plain PQ's quantization error swamps
    intra-cluster distances and ADC ranks degenerate; residual
    encoding keeps them informative. ``n_coarse=0`` = plain PQ."""
    if nbits != 8:
        raise ValueError("codes are uint8; nbits must be 8")
    rng = np.random.RandomState(seed)
    v = _sample_norm_vectors(ds, train_sample)
    dim = v.shape[1]
    _check_dims(dim, m)
    if n_coarse > 0:
        coarse = _kmeans_l2(v, n_coarse, train_iters, rng)
        books = _train_books(v - coarse[_coarse_assign(v, coarse)],
                             m, nbits, train_iters, rng)
    else:
        coarse = np.zeros((0, dim))
        books = _train_books(v, m, nbits, train_iters, rng)

    os.makedirs(out_dir, exist_ok=True)
    n = ds.count()
    _encode_pass(ds, books, coarse, num_shards, out_dir)
    np.savez(os.path.join(out_dir, "codebooks.npz"), books=books,
             coarse=coarse)
    meta = {"n": int(n), "dim": int(dim), "m": int(m),
            "nbits": int(nbits), "n_coarse": int(n_coarse),
            "partition": "cell" if n_coarse > 0 else "hash",
            "num_shards": int(num_shards), "metric": "cosine",
            "bytes_per_vec": int(m) + (2 if n_coarse > 0 else 0),
            "compression_x": round(dim * 4 /
                                   (m + (2 if n_coarse > 0 else 0)), 1)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _encode_pass(ds, books: np.ndarray, coarse: np.ndarray,
                 num_shards: int, out_dir: str) -> None:
    """ONE streaming encode pass → cell-partitioned codes parquet.
    Rows are clustered by the partition key before the hive write: an
    unsorted write fans out to blocks×cells tiny files (13k files at
    100k vecs / 256 cells — measured 9× slower scans from per-file
    overhead); sorted, file count is O(cells + blocks)."""
    m = books.shape[0]
    books_ref = ray.put(books)
    coarse_ref = ray.put(coarse)

    def encode(batch: pa.Table) -> pa.Table:
        bks, crs = ray.get(books_ref), ray.get(coarse_ref)
        vecs = _norm_rows(_matrix(batch))
        if len(crs):
            cid = _coarse_assign(vecs, crs)
            codes = pq_encode_batch(vecs - crs[cid], bks)
        else:
            cid = np.zeros(len(vecs), dtype=np.int64)
            codes = pq_encode_batch(vecs, bks)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        # partition key: the coarse CELL when residual-encoding (the
        # IVF-PQ pruned-read layout — a query then reads only its
        # nprobe cells' code files), else a vec_id hash shard
        if len(crs):
            part = cid.astype(np.int64)
        else:
            part = (vid.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    >> np.uint64(61)).astype(np.int64) % num_shards
        # fixed-size binary built straight from the code matrix's
        # bytes — no per-row Python objects
        code_arr = pa.Array.from_buffers(
            pa.binary(m), len(codes),
            [None, pa.py_buffer(codes.tobytes(order="C"))])
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "coarse": pa.array(cid.astype(np.uint16), pa.uint16()),
            "code": code_arr,
            "cellp": pa.array(part, pa.int64()),
        })

    ds.map_batches(encode, batch_format="pyarrow") \
      .sort("cellp") \
      .write_parquet(os.path.join(out_dir, "codes"),
                     partition_cols=["cellp"])


def pq_add(index_dir: str, ds) -> dict:
    """Append vectors to an existing ``pq_build`` index with the SAME
    trained codebooks (one encode pass; the hive write only ADDS files
    — existing codes are untouched, so the ingest story matches
    ``hnsw_add``). Codebooks are not retrained: residual quantization
    error on drifted data grows gracefully and a periodic rebuild is
    the compaction step, same as the reference's segment merges."""
    arch = np.load(os.path.join(index_dir, "codebooks.npz"))
    books = arch["books"]
    coarse = arch["coarse"] if "coarse" in arch.files else \
        np.zeros((0, books.shape[0] * books.shape[2]))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_new = ds.count()
    _encode_pass(ds, books, coarse, int(meta.get("num_shards", 8)),
                 index_dir)
    meta["n"] = int(meta["n"]) + int(n_new)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _code_files(index_dir: str,
                cells: set[int] | None = None) -> list[str]:
    """Code parquet files, optionally only the probed cells' partition
    dirs (the pruned read)."""
    root = os.path.join(index_dir, "codes")
    out = []
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d)
        if not os.path.isdir(p):
            continue
        if cells is not None:
            try:
                val = int(d.split("=", 1)[1])
            except (IndexError, ValueError):
                continue
            if val not in cells:
                continue
        out += [os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")]
    return out


def _adc_scan(index_dir: str, q: np.ndarray, q_ids: np.ndarray,
              n_cand: int, exclude_self: bool,
              nprobe: int | None = None):
    """LUT-gather scan of the codes parquet: per batch, score every
    code row against every query by summing the coarse term + m table
    entries (ADC decomposes exactly: q·(c + r̂) = q·c + Σⱼ LUT[j,
    codeⱼ]), keep the per-batch top-n_cand per query. Returns
    Dataset[(query_id, vec_id, adc)]."""
    arch = np.load(os.path.join(index_dir, "codebooks.npz"))
    books = arch["books"]
    coarse = arch["coarse"] if "coarse" in arch.files else \
        np.zeros((0, books.shape[0] * books.shape[2]))
    mm, ksub, dsub = books.shape
    # LUT[qi, j, c] = <q_sub, codeword c of subspace j>  — (Q, m, 256)
    lut = np.einsum("qjd,jkd->qjk",
                    q.reshape(len(q), mm, dsub), books)
    lut_ref = ray.put(np.ascontiguousarray(lut))
    # q·coarse-centroid table — (Q, n_coarse), tiny
    qc_ref = ray.put(q @ coarse.T if len(coarse) else None)

    def scan(batch: pa.Table) -> pa.Table:
        tbl = ray.get(lut_ref)
        qc = ray.get(qc_ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        col = batch["code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_fixed_size_binary(col.type):
            buf = col.buffers()[1]
            start = col.offset * mm
            codes = np.frombuffer(buf, dtype=np.uint8,
                                  count=len(vid) * mm,
                                  offset=start).reshape(len(vid), mm)
        else:                    # plain binary (older index): row join
            codes = np.frombuffer(b"".join(col.to_pylist()),
                                  dtype=np.uint8).reshape(len(vid), mm)
        if qc is not None:
            cid = batch["coarse"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            scores = qc[:, cid].copy()          # (Q, n) coarse term
        else:
            scores = np.zeros((len(q_ids), len(vid)))
        for j in range(mm):
            scores += tbl[:, j, codes[:, j]]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            col = scores[qi]
            idx = np.nonzero(vid != q_ids[qi])[0] if exclude_self \
                else np.arange(len(vid))
            if len(idx) == 0:
                continue
            kk = min(n_cand, len(idx))
            top = idx[np.argpartition(-col[idx], kk - 1)[:kk]]
            out_q.extend([int(q_ids[qi])] * kk)
            out_v.extend(int(x) for x in vid[top])
            out_s.extend(float(s) for s in col[top])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "adc": pa.array(out_s, pa.float64()),
        })

    cells = None
    if nprobe is not None and len(coarse):
        # rank cells per query by the ASSIGNMENT metric (L2 to the
        # coarse centroid: argmin ||c||² − 2 q·c) and read only the
        # union of each query's top-nprobe cells — the IVF-PQ pruned
        # read (~nprobe/n_coarse of the codes leave storage)
        d2 = (coarse * coarse).sum(axis=1) - 2.0 * (q @ coarse.T)
        npk = min(nprobe, len(coarse))
        top = np.argpartition(d2, npk - 1, axis=1)[:, :npk]
        cells = {int(c) for row in top for c in row}
    files = _code_files(index_dir, cells)
    if not files:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "adc": pa.array([], pa.float64())}))
    cols = ["vec_id", "code"] + (["coarse"] if len(coarse) else [])
    codes_ds = ray.data.read_parquet(files, columns=cols)
    return codes_ds.map_batches(scan, batch_format="pyarrow")


def pq_search(index_dir: str, query_vecs: np.ndarray,
              query_ids: list[int] | None = None, k: int = 5, *,
              refine: int = 4, ds=None, exclude_self: bool = True,
              nprobe: int | None = None):
    """Top-k over a ``pq_build`` index. ``refine > 0`` with ``ds``
    (the original embeddings Dataset) exact-reranks the top
    ``k × refine`` ADC candidates per query — the returned ``cosine``
    is then EXACT for the returned rows. Without ``ds`` the ADC
    approximation is returned as the score. ``nprobe`` (on a
    cell-partitioned residual index) reads ONLY the union of each
    query's top-nprobe coarse cells — the IVF-PQ pruned read; ``None``
    scans every code file. Result: Dataset[(query_id, rank, vec_id,
    cosine)] like ``ivf_search``."""
    q = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    q_ids = np.asarray(query_ids if query_ids is not None
                       else range(len(q)), dtype=np.int64)
    n_cand = max(k, k * max(1, refine))
    cand = _adc_scan(index_dir, q, q_ids, n_cand, exclude_self, nprobe)

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["adc", "vec_id"], ascending=[False, True],
                             kind="stable").head(n_cand)

    cand = cand.groupby("query_id").map_groups(cut, batch_format="pandas")
    if ds is None or refine <= 0:
        def approx(g: pd.DataFrame) -> pd.DataFrame:
            g = g.rename(columns={"adc": "cosine"})
            return _final_topk(g, k)
        return cand.groupby("query_id").map_groups(
            approx, batch_format="pandas")

    # exact refine: the candidate id set is ≤ |Q|·k·refine — broadcast
    # it, filter the ORIGINAL embeddings once, rerank full-precision
    cand_pd = cand.to_pandas()
    if len(cand_pd) == 0:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64())}))
    want_ref = ray.put(np.unique(cand_pd["vec_id"].to_numpy(np.int64)))

    def pick(batch: pa.Table) -> pa.Table:
        msk = np.isin(batch["vec_id"].to_numpy(zero_copy_only=False),
                      ray.get(want_ref))
        return batch.filter(pa.array(msk))

    got = ds.map_batches(pick, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in got], dtype=np.int64)
    vecs = _norm_rows(np.stack([np.asarray(r["embedding"], np.float64)
                                for r in got])) if len(got) else \
        np.zeros((0, q.shape[1]))
    pos = {int(v): i for i, v in enumerate(ids)}
    out = []
    for qi, g in cand_pd.groupby("query_id"):
        vv = np.array([int(v) for v in g["vec_id"] if int(v) in pos],
                      dtype=np.int64)
        if len(vv) == 0:
            continue
        rows = [pos[int(v)] for v in vv]
        qvec = q[np.nonzero(q_ids == qi)[0][0]]
        cos = vecs[rows] @ qvec
        g2 = pd.DataFrame({"query_id": np.int64(qi), "vec_id": vv,
                           "cosine": cos})
        out.append(_final_topk(g2, k))
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": pd.Series(dtype="int64"),
         "vec_id": pd.Series(dtype="int64"),
         "cosine": pd.Series(dtype="float64"),
         "rank": pd.Series(dtype="int64")})
    return ray.data.from_pandas(res)
