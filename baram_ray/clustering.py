"""Event cluster FORMATION (reference ``src/clustering/engine.rs:287-428``)
— greedy threshold clustering over embeddings → EventCluster rows, plus
the S9 cluster-JSON writer (the reference persists ``EventCluster``
documents as JSON).

Reference algorithm (``cluster_articles``): scan articles in order; for
each, find the most-similar existing cluster centroid; join it when
cosine ≥ threshold (incremental centroid update ``(c·n + x)/(n+1)``),
else open a new cluster. Inherently sequential — the Ray shape is the
standard two-level variant:

1. per-block greedy clustering (map_batches, rows in block order) →
   local clusters (centroid sums + member lists);
2. a driver merge of LOCAL CLUSTER SUMMARIES only (clusters ≪ docs —
   this is the small side) with the same greedy rule over weighted
   centroids;
3. a distributed second pass assigns every member its global cluster and
   computes similarity-to-final-centroid → EventCluster stats
   (article_count, majority category, id range, avg_similarity —
   ``build_event_cluster``, engine.rs:338-427).

With a single block the result is EXACTLY the reference's sequential
algorithm (tested); with many blocks the partitioning changes which
seeds open clusters first — documented, the threshold semantics hold.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from baram_ray.similarity import _matrix, _norm_rows


def greedy_cluster(vecs: np.ndarray, threshold: float) -> np.ndarray:
    """Reference cluster_articles (engine.rs:287-336) on one matrix:
    returns local cluster label per row. Centroids kept UN-normalized
    with incremental mean update, cosine on the fly — same math.
    Centroid matrix is PREALLOCATED (an np.stack per row is O(n²·d)
    copying — seconds per block even at demo scale)."""
    n, dim = vecs.shape
    labels = np.full(n, -1, dtype=np.int64)
    C = np.empty((n, dim))                # centroid means, prefix used
    Cnorm = np.empty(n)
    counts = np.empty(n, dtype=np.int64)
    g = 0
    for i in range(n):
        v = vecs[i]
        vn = np.linalg.norm(v) or 1.0
        best, best_sim = -1, -np.inf
        if g:
            den = Cnorm[:g] * vn
            den[den == 0] = 1.0
            sims = (C[:g] @ v) / den
            best = int(np.argmax(sims))
            best_sim = float(sims[best])
        if best_sim >= threshold:
            k = counts[best]
            C[best] = (C[best] * k + v) / (k + 1)
            Cnorm[best] = np.linalg.norm(C[best])
            counts[best] += 1
            labels[i] = best
        else:
            C[g] = v
            Cnorm[g] = np.linalg.norm(v)
            counts[g] = 1
            labels[i] = g
            g += 1
    return labels


def cluster_events(ds, threshold: float = 0.55, *, id_col: str = "vec_id",
                   category_col: str = "label",
                   return_members: bool = False):
    """Dataset[(vec_id, embedding, label)] → EventCluster rows:
    (event_id, article_count, category, min_id, max_id, avg_similarity).

    With ``return_members=True`` also returns the member Dataset
    (cluster, member_id, category, sim) — the per-article assignment the
    summarizer consumes (reference ``EventCluster.articles``).
    """
    # ---- stage 1: per-block greedy → members + local summaries --------
    def local(batch: pa.Table) -> pa.Table:
        vecs = _matrix(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cats = batch[category_col].to_numpy(zero_copy_only=False)
        labels = greedy_cluster(vecs, threshold)
        block_key = int(ids.min())          # deterministic block identity
        sums: dict[int, np.ndarray] = {}
        cnts: dict[int, int] = {}
        for li in np.unique(labels):
            m = labels == li
            sums[int(li)] = vecs[m].sum(axis=0)
            cnts[int(li)] = int(m.sum())
        # the first member row of each local cluster carries the cluster's
        # summary (centroid sum + count); other rows carry null — one
        # table, two roles, no second output path
        cen_col: list = [None] * len(ids)
        cnt_col: list = [None] * len(ids)
        seen: set[int] = set()
        for i, li in enumerate(labels):
            li = int(li)
            if li not in seen:
                seen.add(li)
                cen_col[i] = sums[li].tolist()
                cnt_col[i] = cnts[li]
        return pa.table({
            "block": pa.array(np.full(len(ids), block_key), pa.int64()),
            "local_cid": pa.array(labels, pa.int64()),
            "member_id": pa.array(ids, pa.int64()),
            "category": pa.array(cats),
            "embedding": batch["embedding"],
            "summary_centroid": pa.array(cen_col, pa.list_(pa.float64())),
            "summary_count": pa.array(cnt_col, pa.int64()),
        })

    staged = ds.map_batches(local, batch_format="pyarrow").materialize()

    # ---- stage 2: merge local summaries on the driver (small side) ----
    summaries = []                          # (block, local_cid, sum, count)
    for b in staged.iter_batches(batch_format="pyarrow", batch_size=8192):
        for blk, cid, cen, cnt in zip(b["block"].to_pylist(),
                                      b["local_cid"].to_pylist(),
                                      b["summary_centroid"].to_pylist(),
                                      b["summary_count"].to_pylist()):
            if cen is not None:
                summaries.append((blk, cid, np.asarray(cen), cnt))
    summaries.sort(key=lambda s: (s[0], s[1]))   # deterministic order

    # merge rule: a summary may only join a global cluster with NO content
    # from its own block — within one block the sequential pass already
    # decided those clusters are distinct (so a single-block run
    # reproduces the reference algorithm exactly; tested)
    # vectorized greedy merge: centroid means kept as a matrix, one
    # masked argmax per summary (a per-centroid Python loop here is
    # O(clusters²·d) in pure Python — seconds even at demo scale)
    merged_sum: list[np.ndarray] = []
    merged_cnt: list[int] = []
    block_members: dict[int, set] = {}               # block -> {cluster idx}
    mapping: dict[tuple[int, int], int] = {}         # (block, local) -> global
    n_sum = len(summaries)
    dim = len(summaries[0][2]) if n_sum else 0
    M = np.empty((n_sum, dim))                       # centroid means (prefix)
    Mnorm = np.empty(n_sum)
    g = 0
    for blk, cid, vec_sum, cnt in summaries:
        mean = vec_sum / cnt
        mn = np.linalg.norm(mean) or 1.0
        best, best_sim = -1, -np.inf
        in_blk = block_members.setdefault(blk, set())
        if g:
            sims = (M[:g] @ mean) / (Mnorm[:g] * mn)
            if in_blk:                               # mask same-block
                sims[list(in_blk)] = -np.inf
            best = int(np.argmax(sims))
            best_sim = float(sims[best])
        if best_sim >= threshold:
            merged_sum[best] = merged_sum[best] + vec_sum
            merged_cnt[best] += cnt
            in_blk.add(best)
            mapping[(blk, cid)] = best
            M[best] = merged_sum[best] / merged_cnt[best]
            Mnorm[best] = np.linalg.norm(M[best]) or 1.0
        else:
            merged_sum.append(vec_sum)
            merged_cnt.append(cnt)
            in_blk.add(g)
            mapping[(blk, cid)] = g
            M[g] = mean
            Mnorm[g] = mn
            g += 1
    centroids = np.stack([s / c for s, c in zip(merged_sum, merged_cnt)]) \
        if merged_sum else np.empty((0, 1))
    map_ref = ray.put(mapping)              # small: one entry per LOCAL
    cen_ref = ray.put(centroids)            # cluster, not per member

    # ---- stage 3 (distributed): member → global cid + similarity -----
    def finalize(batch: pa.Table) -> pa.Table:
        mp = ray.get(map_ref)
        cen = ray.get(cen_ref)
        vecs = _matrix(batch, "embedding")
        blocks = batch["block"].to_numpy(zero_copy_only=False)
        lc = batch["local_cid"].to_numpy(zero_copy_only=False)
        cl = np.asarray([mp[(int(b), int(c))] for b, c in zip(blocks, lc)],
                        dtype=np.int64)
        c = cen[cl]
        den = np.linalg.norm(c, axis=1) * np.linalg.norm(vecs, axis=1)
        den[den == 0] = 1.0
        sims = np.sum(c * vecs, axis=1) / den
        return pa.table({
            "cluster": pa.array(cl, pa.int64()),
            "member_id": batch["member_id"],
            "category": batch["category"],
            "sim": pa.array(sims, pa.float64()),
        })

    fin = staged.map_batches(finalize, batch_format="pyarrow").materialize()

    # ---- EventCluster stats (engine.rs:338-427) -----------------------
    from ray.data.aggregate import Count, Max, Mean, Min
    stats = (fin.groupby("cluster")
                .aggregate(Count(alias_name="article_count"),
                           Min("member_id", alias_name="min_id"),
                           Max("member_id", alias_name="max_id"),
                           Mean("sim", alias_name="avg_similarity"))
                .to_pandas())
    # majority category: distributed (cluster, category) counts, then the
    # tiny count table resolves ties deterministically (max n, then
    # lexicographic — the reference's HashMap max_by_key is tie-arbitrary)
    cat_counts = (fin.groupby(["cluster", "category"])
                    .aggregate(Count(alias_name="n")).to_pandas())
    cat_counts = cat_counts.sort_values(
        ["cluster", "n", "category"], ascending=[True, False, True])
    majority = cat_counts.drop_duplicates("cluster")[["cluster", "category"]]
    out = stats.merge(majority, on="cluster", how="left")
    out = out.sort_values("cluster").reset_index(drop=True)
    out["event_id"] = [f"evt_{int(c):03d}" for c in out["cluster"]]
    out["avg_similarity"] = out["avg_similarity"].round(6)
    out = out[["event_id", "cluster", "article_count", "category",
               "min_id", "max_id", "avg_similarity"]]
    if return_members:
        return out, fin
    return out


def write_cluster_json(clusters: pd.DataFrame, out_dir: str) -> list[str]:
    """S9: persist each EventCluster as one JSON document (the reference
    writes ``EventCluster`` JSON; atomic tmp+rename per file)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for _, r in clusters.iterrows():
        path = os.path.join(out_dir, f"{r['event_id']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: (v.item() if hasattr(v, "item") else v)
                       for k, v in r.items()}, f, indent=2)
        os.replace(tmp, path)
        paths.append(path)
    return paths
