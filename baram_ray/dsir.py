"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus.

Distributed shape:
1. hashed-bigram histograms for target and raw — per-batch partial
   count vectors (``buckets`` ints, constant-size), reduced on the
   driver in sorted-key order (deterministic);
2. per-doc importance weight log p_target(grams) − log p_raw(grams)
   in ONE stateless pass with the two (small) log-probability vectors
   shipped in the task closure;
3. Gumbel top-k resampling: per-doc Gumbel noise derived from
   blake2b(doc_id, seed) — fully deterministic and reshard-stable —
   selection = top-k of (weight + gumbel), computed as per-batch
   partial top-k + a k-sized driver merge.

Nothing corpus-sized on the driver at any step; the histograms are
``buckets``-sized regardless of corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_BUCKETS = 8192


def _gram_ids(text: str, buckets: int) -> np.ndarray:
    """Hashed word-bigram ids of a document (unigrams for 1-word docs)."""
    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    grams = toks if len(toks) == 1 else \
        [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    import pandas as pd
    h = pd.util.hash_array(np.asarray(grams, dtype=object))  # stable key
    return (h % np.uint64(buckets)).astype(np.int64)


def hashed_histogram(ds, text_col: str = "text",
                     buckets: int = DEFAULT_BUCKETS) -> np.ndarray:
    """Corpus hashed-bigram count vector via per-batch partials."""
    def partial(batch: pa.Table) -> pa.Table:
        # one concatenated hash + bincount per batch, not per doc
        all_ids = [_gram_ids(t, buckets)
                   for t in batch[text_col].to_pylist()]
        flat = (np.concatenate(all_ids) if all_ids
                else np.empty(0, dtype=np.int64))
        counts = np.bincount(flat, minlength=buckets).astype(np.int64)
        return pa.table({
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    total = np.zeros(buckets, dtype=np.int64)
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    for c in parts["counts"]:
        total += np.asarray(c, dtype=np.int64)
    return total


def _log_probs(counts: np.ndarray) -> np.ndarray:
    # add-one smoothing so unseen buckets stay finite on both sides
    sm = counts.astype(np.float64) + 1.0
    return np.log(sm / sm.sum())


def dsir_weights(raw_ds, target_ds, *, text_col: str = "text",
                 id_col: str = "doc_id",
                 buckets: int = DEFAULT_BUCKETS):
    """(id, n_grams, weight) per raw doc — weight is the SUM of
    per-gram log importance ratios (the paper's unigram-product model:
    log w = Σ log p_target(g) − log p_raw(g)); empty docs weigh 0.
    Divide by n_grams for a length-normalized variant."""
    import ray as _ray

    lp_t = _log_probs(hashed_histogram(target_ds, text_col, buckets))
    lp_r = _log_probs(hashed_histogram(raw_ds, text_col, buckets))
    ratio_ref = _ray.put(lp_t - lp_r)

    def weigh(batch: pa.Table) -> pa.Table:
        ratio = _ray.get(ratio_ref)
        ws, ns = [], []
        for t in batch[text_col].to_pylist():
            ids = _gram_ids(t, buckets)
            ns.append(len(ids))
            ws.append(float(ratio[ids].sum()) if len(ids) else 0.0)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(ns, pa.int64()),
            "weight": pa.array(np.round(ws, 6), pa.float64()),
        })

    return raw_ds.map_batches(weigh, batch_format="pyarrow")


def _gumbel(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id Gumbel(0,1) noise from blake2b(id, seed) —
    identical under any partitioning."""
    out = np.empty(len(ids), dtype=np.float64)
    for i, d in enumerate(ids):
        h = hashlib.blake2b(f"{seed}:{int(d)}".encode(),
                            digest_size=8).digest()
        u = (int.from_bytes(h, "big") + 1) / float(2 ** 64 + 2)
        out[i] = -np.log(-np.log(u))
    return out


def dsir_sample(raw_ds, target_ds, k: int, *, text_col: str = "text",
                id_col: str = "doc_id", buckets: int = DEFAULT_BUCKETS,
                temperature: float = 1.0, seed: int = 17):
    """Gumbel top-k importance resampling: select the ``k`` raw docs
    maximizing weight/temperature + Gumbel(id, seed) — an exact sample
    from softmax(weight/temperature) without replacement, deterministic
    and reshard-stable. Per-batch partial top-k; the driver merges only
    k-sized candidate lists. Returns (id, weight, score) rows."""
    import pandas as pd

    weights = dsir_weights(raw_ds, target_ds, text_col=text_col,
                           id_col=id_col, buckets=buckets)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        score = w / temperature + _gumbel(ids, seed)
        kk = min(k, len(ids))
        if not kk:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64()),
                             "score": pa.array([], pa.float64())})
        sel = np.argpartition(-score, kk - 1)[:kk]
        return pa.table({
            id_col: pa.array(ids[sel], pa.int64()),
            "weight": pa.array(w[sel], pa.float64()),
            "score": pa.array(np.round(score[sel], 6), pa.float64()),
        })

    cand = weights.map_batches(partial_topk,
                               batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["score", id_col],
                            ascending=[False, True], kind="stable")
    return cand.head(k).reset_index(drop=True)
