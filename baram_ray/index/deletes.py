"""Document deletion: delete-by-query tombstones + merge-time purge.

The reference deletes documents with an OpenSearch ``delete_by_query``
term query (``src/embedding/mod.rs:768-789``) and lets Lucene do the
rest: deleted docs go into a live-docs bitset and vanish from every
query immediately, while their postings (and the df / docCount term
statistics) stay physically present until a segment merge expunges
them. This module is that model on the Ray index:

- :func:`delete_by_query` — resolve the term query to doc_ids (postings
  lookup for indexed text fields, equality on kept metadata columns —
  exactly OpenSearch's term-query split between ``text`` and ``keyword``
  fields) and append a tombstone parquet under ``deletes/``. The reader
  folds the live mask into ``filter_mask``, so every query path (DAAT,
  WAND, bool, prefix, fuzzy, phrase, retrieval) excludes tombstoned
  docs at once; scoring stats are untouched, so surviving hits keep
  bit-identical scores (Lucene tombstone semantics, tested).
- :func:`purge_deletes` — the merge-time expunge: a ``map_batches``
  rewrite of every segment block that drops tombstoned postings
  (decode → filter → re-encode, per block, embarrassingly parallel —
  NO shuffle: block membership never changes, only block contents),
  termdict re-aggregated from the rewritten block metadata, and meta
  ``n_docs``/``avgdl`` recomputed over live docs. After purge the
  index scores IDENTICALLY to a from-scratch build over the surviving
  docs (tested). The docs table keeps tombstoned rows — postings are
  global ranks (positions in the sorted doc_id array), so dropping
  rows would shift every rank; the live mask stays active and costs
  one bit per doc. A segment rebuild from source clears tombstones
  (reindex-restores-deletions, OpenSearch semantics).

Scale notes: tombstone resolution is one postings/metadata lookup; the
purge broadcasts the sorted deleted-rank array once (``ray.put``) and
streams segment files through a stateless rewrite — at 10^12-doc scale
the deleted set would ship per shard range (segment files are bucketed,
each task only needs its blocks' rank range), same two-level split the
build already documents for the rank map.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def tombstoned_ids(index_dir: str) -> np.ndarray:
    """Sorted unique doc_ids of every tombstone file (empty if none)."""
    d = _deletes_dir(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = [pq.read_table(os.path.join(d, f), columns=["doc_id"])
             ["doc_id"].to_numpy()
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def clear_tombstones(index_dir: str) -> None:
    shutil.rmtree(_deletes_dir(index_dir), ignore_errors=True)


def _append_tombstones(index_dir: str, doc_ids: np.ndarray) -> int:
    """Append NEW (not-yet-tombstoned) doc_ids as one tombstone file;
    returns the number newly deleted."""
    doc_ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    already = tombstoned_ids(index_dir)
    new = doc_ids[~np.isin(doc_ids, already)] if len(already) else doc_ids
    if not len(new):
        return 0
    d = _deletes_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    n_existing = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
    path = os.path.join(d, f"del-{n_existing:06d}.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(new, pa.int64())}),
                   path + ".tmp")
    os.replace(path + ".tmp", path)          # atomic: never a torn file
    return int(len(new))


def delete_by_query(index_dir: str, field: str, value) -> int:
    """Tombstone every live doc matching a term query on ``field``.

    ``field`` ∈ index fields → exact term lookup in the postings (the
    value is an index term, NOT analyzed — OpenSearch term-query
    semantics on a text field); ``field`` ∈ kept metadata columns →
    equality (term query on a keyword field). Returns the number of
    docs newly deleted (idempotent: re-deleting returns 0), like the
    reference's ``deleted`` count (``src/embedding/mod.rs:786``).
    """
    from baram_ray.index.segment import IndexReader
    r = IndexReader(index_dir)
    if field in r.fields:
        pl = r.postings.get((field, str(value)))
        if pl is None:
            matched = np.empty(0, dtype=np.int64)
        else:
            rows, _ = pl.decode_all()
            matched = r.doc_ids[rows]
    elif field in r.doc_meta:
        matched = r.doc_ids[r.doc_meta[field] == value]
    else:
        raise KeyError(
            f"unknown field {field!r}: not an indexed field {r.fields} "
            f"or kept metadata column {sorted(r.doc_meta)}")
    return _append_tombstones(index_dir, matched)


# ------------------------------------------------------------------ #
# Purge (merge-time expunge)
# ------------------------------------------------------------------ #

def _member(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if not len(sorted_set):
        return np.zeros(len(ids), dtype=bool)
    pos = np.searchsorted(sorted_set, ids).clip(max=len(sorted_set) - 1)
    return sorted_set[pos] == ids


def _rewrite_blocks(t: pa.Table, del_ref, positions: bool) -> pa.Table:
    """Drop tombstoned postings from a batch of encoded block rows.

    Blocks whose [min_doc, max_doc] rank range contains no deleted rank
    pass through untouched (zero-copy); touched blocks decode, filter
    and re-encode in place. Block ids/shards never change — postings
    stay in the same (smaller) blocks, so the reader's (field, term,
    shard, gen, block_id) ordering is undisturbed.
    """
    import ray as _ray

    from baram_ray.index.build import _gather_segments
    from baram_ray.index.codec import (
        decode_varints, encode_varints_np,
    )
    dr = _ray.get(del_ref)                     # sorted deleted ranks
    if t.num_rows == 0 or not len(dr):
        return t
    nmin = t["min_doc"].to_numpy()
    nmax = t["max_doc"].to_numpy()
    lo = np.searchsorted(dr, nmin, side="left")
    hi = np.searchsorted(dr, nmax, side="right")
    touched = hi > lo
    if not touched.any():
        return t
    keep_rows = t.filter(pa.array(~touched))
    cols = {c: [] for c in t.column_names}
    tt = t.filter(pa.array(touched))
    n_arr = tt["n"].to_numpy()
    docs_enc = tt["docs_enc"].to_pylist()
    tfs_enc = tt["tfs_enc"].to_pylist()
    pos_enc = tt["pos_enc"].to_pylist() if positions else None
    for i in range(tt.num_rows):
        n = int(n_arr[i])
        deltas = decode_varints(docs_enc[i], n)
        ranks = np.cumsum(deltas)
        tfs = decode_varints(tfs_enc[i], n)
        keep = ~_member(ranks, dr)
        if keep.all():                        # coarse range test false hit
            pass
        elif not keep.any():
            continue                          # block fully deleted → drop
        d = ranks[keep]
        f = tfs[keep]
        nd = np.empty(len(d), dtype=np.int64)
        nd[0] = d[0]
        np.subtract(d[1:], d[:-1], out=nd[1:])
        for c in t.column_names:
            if c not in ("n", "min_doc", "max_doc", "max_tf", "sum_tf",
                         "docs_enc", "tfs_enc", "pos_enc"):
                cols[c].append(tt[c][i].as_py())
        cols["n"].append(len(d))
        cols["min_doc"].append(int(d[0]))
        cols["max_doc"].append(int(d[-1]))
        cols["max_tf"].append(int(f.max()))
        cols["sum_tf"].append(int(f.sum()))
        cols["docs_enc"].append(encode_varints_np(nd)[0])
        cols["tfs_enc"].append(encode_varints_np(f)[0])
        if positions:
            # flat varints: absolute at each posting's first position,
            # then gaps — decode to absolutes, gather kept postings'
            # runs, re-delta with a reset at each posting start
            tf64 = tfs.astype(np.int64)
            vals = decode_varints(pos_enc[i], int(tf64.sum()))
            starts = np.cumsum(tf64) - tf64
            cum = np.cumsum(vals)
            absolutes = cum - np.repeat(cum[starts] - vals[starts], tf64)
            kept = _gather_segments(absolutes, starts[keep], tf64[keep])
            k64 = f.astype(np.int64)
            kstart = np.cumsum(k64) - k64
            pd_ = np.empty(len(kept), dtype=np.int64)
            if len(kept):
                pd_[0] = kept[0]
                np.subtract(kept[1:], kept[:-1], out=pd_[1:])
                pd_[kstart] = kept[kstart]
            cols["pos_enc"].append(encode_varints_np(pd_)[0])
    if not cols["n"]:
        return keep_rows
    arrays = []
    for c in t.column_names:
        typ = t.schema.field(c).type
        arrays.append(pa.array(cols[c], typ))
    rebuilt = pa.table(dict(zip(t.column_names, arrays)),
                       schema=t.schema)
    return pa.concat_tables([keep_rows, rebuilt])


def purge_deletes(index_dir: str) -> dict:
    """Expunge tombstoned docs from the postings (Lucene's
    merge-applies-deletes): rewrite every segment block without their
    postings, re-aggregate the termdict, and restore ``n_docs`` /
    ``avgdl`` to live-only values so scores equal a from-scratch build
    over the surviving corpus (tested invariant). Tombstones stay (the
    docs table keeps its rows — ranks must remain stable); reclaimed
    bytes are the postings, which dominate.

    Returns {"n_purged", "n_live", "blocks_before", "blocks_after"}.
    """
    import functools

    import ray
    import ray.data

    from baram_ray.index.build import _parquet_files, build_rank_map
    from baram_ray.util import auto_num_blocks, grouped_agg, input_bytes

    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    del_ids = tombstoned_ids(index_dir)
    if not len(del_ids):
        return {"n_purged": 0, "n_live": meta["n_docs"],
                "blocks_before": 0, "blocks_after": 0}

    # deleted doc_ids → global ranks via the two-level rank map (the
    # corpus id array never lands on the driver; only the O(deletes)
    # tombstone list does, and tombstones are small by construction)
    docs_dir = os.path.join(index_dir, "docs")
    rmap, _ = build_rank_map([docs_dir])
    ranks, member = rmap.rank_and_member(np.asarray(del_ids, np.int64))
    del_ranks = np.sort(ranks[member])
    del_ref = ray.put(del_ranks)
    del_ids_ref = ray.put(np.sort(np.asarray(del_ids, np.int64)[member]))
    positions = bool(meta.get("positions", False))

    # ---- segments: per-block rewrite (no shuffle), atomic dir swap ----
    seg_dir = os.path.join(index_dir, "segments")
    files = _parquet_files([seg_dir])
    # base and delta files differ by the optional `gen` column — group
    # by schema so each read_parquet sees a uniform one
    by_schema: dict[tuple, list[str]] = {}
    for p in files:
        names = tuple(pq.ParquetFile(p).schema_arrow.names)
        by_schema.setdefault(names, []).append(p)
    new_dir = seg_dir + ".purge"
    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)
    os.makedirs(new_dir)
    blocks_before = blocks_after = 0
    for group in by_schema.values():
        ds = ray.data.read_parquet(
            group, override_num_blocks=auto_num_blocks(group))
        blocks_before += sum(
            pq.ParquetFile(p).metadata.num_rows for p in group)
        out = ds.map_batches(
            functools.partial(_rewrite_blocks, del_ref=del_ref,
                              positions=positions),
            batch_format="pyarrow")
        out.write_parquet(new_dir)
    blocks_after = sum(
        pq.ParquetFile(os.path.join(new_dir, p)).metadata.num_rows
        for p in os.listdir(new_dir) if p.endswith(".parquet"))
    old_dir = seg_dir + ".old"
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    os.rename(seg_dir, old_dir)
    os.rename(new_dir, seg_dir)
    shutil.rmtree(old_dir)

    # ---- termdict: re-aggregate df/cf from rewritten block metadata ---
    td_dir = os.path.join(index_dir, "termdict")
    td_new = td_dir + ".purge"
    if os.path.exists(td_new):
        shutil.rmtree(td_new)
    seg_meta = ray.data.read_parquet(
        seg_dir, columns=["field", "term", "n", "sum_tf"],
        override_num_blocks=auto_num_blocks(seg_dir))
    td = grouped_agg(seg_meta, ["field", "term"],
                     {"df": ("n", "sum"), "cf": ("sum_tf", "sum")},
                     num_buckets=max(16, input_bytes(seg_dir) // (8 << 20)))
    td.write_parquet(td_new)
    if os.path.exists(td_dir):
        os.rename(td_dir, td_dir + ".old")
    os.rename(td_new, td_dir)
    shutil.rmtree(td_dir + ".old", ignore_errors=True)

    # ---- meta: live-only n_docs / avgdl (scores == scratch build) -----
    from ray.data.aggregate import Count, Sum
    len_cols = [f"{f}__len" for f in meta["fields"]]

    def drop_deleted(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~_member(ids, ray.get(del_ids_ref))))

    live_ds = ray.data.read_parquet(
        docs_dir, columns=["doc_id"] + len_cols,
        override_num_blocks=auto_num_blocks(docs_dir)) \
        .map_batches(drop_deleted, batch_format="pyarrow")
    aggs = [Count(alias_name="n_docs")] + [
        Sum(c, alias_name=f"total_{c}") for c in len_cols]
    stats = live_ds.aggregate(*aggs)
    n_live = int(stats["n_docs"])
    meta["n_docs"] = n_live
    meta["avgdl"] = {f: (stats[f"total_{f}__len"] or 0) / max(1, n_live)
                     for f in meta["fields"]}
    meta["n_purged"] = int(meta.get("n_purged", 0)) + int(len(del_ranks))
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return {"n_purged": int(len(del_ranks)), "n_live": n_live,
            "blocks_before": int(blocks_before),
            "blocks_after": int(blocks_after)}
