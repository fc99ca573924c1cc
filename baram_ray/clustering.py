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
2. a HIERARCHICAL merge of LOCAL CLUSTER SUMMARIES: summaries
   tree-reduce through Ray tasks (fan-in ``_MERGE_FANIN`` per level),
   every level applying the same greedy rule over weighted centroids
   with the no-same-source-block constraint carried as a BLOCK SET per
   merged cluster (two summaries that trace back to the same input
   block never share a cluster, no matter which level they meet at).
   The driver holds only object refs; the final mapping + centroid
   matrix are assembled and ``ray.put`` INSIDE the last task — nothing
   O(local clusters) ever lands on the driver;
3. a distributed second pass assigns every member its global cluster and
   computes similarity-to-final-centroid → EventCluster stats
   (article_count, majority category, id range, avg_similarity —
   ``build_event_cluster``, engine.rs:338-427).

With a single block the result is EXACTLY the reference's sequential
algorithm (tested — one level-0 task sees only same-block summaries, so
the constraint forbids every merge and local labels pass through); with
many blocks the partitioning changes which seeds open clusters first —
documented, the threshold semantics hold.
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


_MERGE_FANIN = 16    # tree-merge fan-in per level (levels = log_F(blocks))


def _greedy_merge(items: list[dict], threshold: float) -> list[dict]:
    """Greedy weighted-centroid merge over summary items, each
    ``{"key": (block, cid), "sum": vec, "count": n, "blocks": set,
    "members": [(block, cid), ...]}``. The no-same-source-block rule is
    enforced through the block SETS (composes across tree levels); items
    process in (block, cid) order of their representative — same
    vectorized masked-argmax as the reference's sequential pass."""
    items = sorted(items, key=lambda it: it["key"])
    n_sum = len(items)
    if not n_sum:
        return []
    dim = len(items[0]["sum"])
    out: list[dict] = []
    block_owner: dict[int, set] = {}      # source block -> {out idx}
    M = np.empty((n_sum, dim))            # centroid means (prefix used)
    Mnorm = np.empty(n_sum)
    g = 0
    for it in items:
        mean = it["sum"] / it["count"]
        mn = np.linalg.norm(mean) or 1.0
        best, best_sim = -1, -np.inf
        banned: set = set()
        for b in it["blocks"]:
            banned |= block_owner.get(b, set())
        if g:
            sims = (M[:g] @ mean) / (Mnorm[:g] * mn)
            if banned:                     # mask same-source-block
                sims[list(banned)] = -np.inf
            best = int(np.argmax(sims))
            best_sim = float(sims[best])
        if best_sim >= threshold:
            tgt = out[best]
            tgt["sum"] = tgt["sum"] + it["sum"]
            tgt["count"] += it["count"]
            tgt["blocks"] |= it["blocks"]
            tgt["members"].extend(it["members"])
            tgt["key"] = min(tgt["key"], it["key"])
            for b in it["blocks"]:
                block_owner.setdefault(b, set()).add(best)
            M[best] = tgt["sum"] / tgt["count"]
            Mnorm[best] = np.linalg.norm(M[best]) or 1.0
        else:
            out.append({"key": it["key"], "sum": it["sum"],
                        "count": it["count"],
                        "blocks": set(it["blocks"]),
                        "members": list(it["members"])})
            for b in it["blocks"]:
                block_owner.setdefault(b, set()).add(g)
            M[g] = mean
            Mnorm[g] = mn
            g += 1
    return out


@ray.remote
def _extract_merge(threshold: float, *blocks):
    """Level-0 merge task: pull the summary rows out of a group of
    stage-1 blocks (Arrow tables in plasma) and greedy-merge them."""
    import pyarrow.compute as pc
    items = []
    for t in blocks:
        sub = t.filter(pc.is_valid(t["summary_count"]))
        if not sub.num_rows:
            continue
        for blk, cid, cen, cnt in zip(sub["block"].to_pylist(),
                                      sub["local_cid"].to_pylist(),
                                      sub["summary_centroid"].to_pylist(),
                                      sub["summary_count"].to_pylist()):
            items.append({"key": (int(blk), int(cid)),
                          "sum": np.asarray(cen, dtype=np.float64),
                          "count": int(cnt), "blocks": {int(blk)},
                          "members": [(int(blk), int(cid))]})
    return _greedy_merge(items, threshold)


@ray.remote
def _merge_lists(threshold: float, *lists):
    """Level-k>0 merge task: fan-in previously merged summary lists."""
    items = [it for lst in lists for it in lst]
    return _greedy_merge(items, threshold)


@ray.remote
def _assemble_final(items: list[dict]):
    """Assign global ids in representative order and ``ray.put`` the
    (block, local_cid) → global mapping and the centroid matrix FROM
    THIS TASK — the driver receives two tiny refs, never the
    O(local clusters) mapping itself."""
    import ray as _ray
    items = sorted(items, key=lambda it: it["key"])
    mapping = {m: gi for gi, it in enumerate(items)
               for m in it["members"]}
    centroids = (np.stack([it["sum"] / it["count"] for it in items])
                 if items else np.empty((0, 1)))
    return _ray.put(mapping), _ray.put(centroids)


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

    # ---- stage 2: hierarchical tree merge of local summaries ----------
    # level 0: one task per group of staged blocks extracts that group's
    # summary rows and greedy-merges them; levels k>0 merge the merged
    # lists fan-in at a time with the SAME rule — the no-same-block
    # constraint rides along as a block SET per cluster, so wherever two
    # same-block summaries meet in the tree, the merge is forbidden.
    # The driver only ever holds object refs (O(tree width), not
    # O(local clusters)).
    sum_refs = [block_ref for bundle in staged.iter_internal_ref_bundles()
                for block_ref, meta in bundle.blocks if meta.num_rows]
    level = [_extract_merge.remote(threshold,
                                   *sum_refs[i:i + _MERGE_FANIN])
             for i in range(0, len(sum_refs), _MERGE_FANIN)]
    while len(level) > 1:
        level = [_merge_lists.remote(threshold,
                                     *level[i:i + _MERGE_FANIN])
                 for i in range(0, len(level), _MERGE_FANIN)]
    if level:
        map_ref, cen_ref = ray.get(_assemble_final.remote(level[0]))
    else:                                  # empty input
        map_ref = ray.put({})
        cen_ref = ray.put(np.empty((0, 1)))

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
