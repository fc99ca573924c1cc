"""Distributed inverted-index build — the Ray-Data rebuild of ``baram index``.

Reference flow (``src/commands/index.rs:36-360``): checkpoint load →
prefilter → parallel parse → batched embed+bulk-index → checkpoint per
batch → finalize. Our Ray shape (SURVEY.md §3.1):

    read_parquet → map_batches(NormalizeTokenize)           [stage: forward]
      → docs table projection + global stats                 [stage: docs]
      → map_batches(PartialPostings)  (per-batch combiner)
      → groupby(field, term, shard) → map_groups(encode)     [stage: segments]
      → groupby(field, term) df/cf aggregate                 [stage: termdict]

Scale design decisions (these are the point — see SURVEY.md §7.3):

- **Tokenize exactly once.** The forward index (per-doc term/tf lists) is
  written to parquet and every later stage reads it; it doubles as the
  coarse checkpoint, so a resumed build skips the most expensive stage.
- **Pre-aggregate before the shuffle.** ``PartialPostings`` emits one row
  per (field, term, shard) per *batch* with doc/tf lists, not one row per
  occurrence — the groupby moves combiner output, shrinking the all-to-all
  exchange by ~the average within-batch df.
- **Head-term skew → range sharding.** The group key includes
  ``shard = doc_id >> (63 - bits)``. doc_ids are uniform hashes, so shards
  are balanced doc_id *ranges*; a head term ("the", "import") that occurs
  in every doc splits into ``num_shards`` bounded groups instead of one
  giant one, and because shards are ranges, per-shard posting blocks
  concatenate in global doc_id order with NO re-sort at merge (the explicit
  skew handling the reference stubbed at ``src/scheduler/assignment.rs:451``).
- **Resume** via per-stage manifests with input fingerprints
  (``baram_ray.state.checkpoint``), mirroring ``src/commands/index.rs:79-108``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from baram_ray.stages.normalize import NormalizeTokenize
from baram_ray.util import (
    auto_num_blocks, grouped_agg, grouped_map, input_bytes,
)
from baram_ray.state.checkpoint import (
    StageManifests, StageTimer, fingerprint_paths, fresh_dir,
)
from baram_ray.tokenizer import TOKENIZER_VERSION

DEFAULT_DOCS_PER_SHARD = 262_144


@dataclass
class IndexConfig:
    fields: tuple[str, ...] = ("content",)
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    keep: tuple[str, ...] = ("repo", "path", "lang")
    k1: float = 1.2            # Lucene/OpenSearch defaults — the reference index
    b: float = 0.75            # sets no similarity override (src/embedding/mod.rs:238-277)
    num_shards: int | None = None   # derived from doc count when None
    tokenize_batch_size: int = 256  # wide rows: content can be MBs (SURVEY §7.3)
    # duplicate doc_id policy: "error" fails loudly; "first" keeps one row
    # per id (min sha256 — deterministic and order-independent, the batch
    # analogue of the reference's id-upsert ingest where a re-crawled
    # (repo, path, commit) overwrites its previous version)
    on_duplicate: str = "error"
    # positional postings: store delta-varint word positions per posting
    # (tokenizer.term_positions semantics) — enables phrase queries at
    # ~1.5-2× index size; default off so term-only indexes pay nothing
    positions: bool = False


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    n_terms: int
    num_shards: int
    stage_seconds: dict = field(default_factory=dict)
    resumed_stages: list = field(default_factory=list)


def _partial_schema(positions: bool = False) -> pa.Schema:
    fields = [
        ("field", pa.string()), ("term", pa.string()), ("shard", pa.int32()),
        ("docs", pa.list_(pa.int64())), ("tfs", pa.list_(pa.int32())),
    ]
    if positions:
        # flat positions of this key's postings in doc order; per-doc
        # segment lengths are the aligned tf values
        fields.append(("pos", pa.list_(pa.int32())))
    fields.append(("__bucket", pa.int32()))
    return pa.schema(fields)


def _gather_segments(values: np.ndarray, starts: np.ndarray,
                     lengths: np.ndarray) -> np.ndarray:
    """Concatenate ``values[starts[i]:starts[i]+lengths[i]]`` for all i —
    the vectorized variable-length gather both positional stages use."""
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return values[:0]
    ends = np.cumsum(lengths)
    idx = np.repeat(starts.astype(np.int64), lengths) \
        + np.arange(total, dtype=np.int64) - np.repeat(ends - lengths, lengths)
    return values[idx]


class PartialPostings:
    """Per-block combiner: forward rows → (field, term, shard, docs[],
    tfs[], __bucket) — one row per key per block, posting lists as Arrow
    lists, exchange bucket precomputed from a stable term hash.

    Postings are emitted in **rank space**: doc_id → its position in the
    globally-sorted unique doc_id set, resolved through the two-level
    :class:`RankMap` (``base[id_shard] + local_rank``; per-shard id
    arrays are separate plasma objects fetched zero-copy on demand, no
    corpus-sized broadcast). Dense ranks make delta varints 1-2 bytes
    instead of the 7-8 a 63-bit hash id costs, and turn every
    query-time doc→row lookup into direct array indexing. Rank order ==
    doc_id order (monotone map), so tie-breaks and shard-range
    concatenation are unchanged at any id-shard granularity.

    Fully vectorized: term strings are dictionary-encoded (C), postings
    regrouped with one lexsort per field, list columns built from
    offsets — the per-(doc,term) Python loop this replaces cost ~10 µs ×
    postings (2 min of CPU per 300k docs). Runs inside the exchange's
    split task (``grouped_map pre_fn``) so the bucket hash is computed
    once, on the dictionary, not per row.
    """

    def __init__(self, fields: tuple[str, ...], shard_shift: int,
                 num_buckets: int, rank_map: "RankMap | None" = None,
                 num_shards: int = 1,
                 rank_offset: int = 0, positions: bool = False):
        self.fields = fields
        self.shard_shift = shard_shift  # shard = rank >> shard_shift
        self.num_buckets = num_buckets
        self.rank_map = rank_map        # two-level doc_id → rank map
        self.num_shards = num_shards
        self.rank_offset = rank_offset  # delta builds: ranks continue after
        # the previous build's dense rank space (append-only precondition)
        self.positions = positions      # carry {f}__pos through the exchange

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if self.rank_map is not None:
            doc_ids = self.rank_map.rank(doc_ids) + self.rank_offset
        num_shards = self.num_shards
        pieces = []
        for fi, f in enumerate(self.fields):
            tcol = batch[f"{f}__terms"].combine_chunks()
            fcol = batch[f"{f}__tfs"].combine_chunks()
            toff = tcol.offsets.to_numpy()
            lens = np.diff(toff)
            if lens.sum() == 0:
                continue
            tfs_flat = fcol.values.to_numpy()[toff[0]: toff[-1]]
            denc = tcol.values.slice(toff[0], toff[-1] - toff[0]) \
                       .dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = denc.dictionary
            docs_rep = np.repeat(doc_ids, lens)
            shard_rep = (docs_rep >> self.shard_shift).astype(np.int64)
            key = codes * num_shards + shard_rep
            order = np.lexsort((docs_rep, key))
            key_s = key[order]
            new = np.ones(len(key_s), dtype=bool)
            new[1:] = key_s[1:] != key_s[:-1]
            starts = np.nonzero(new)[0]
            offsets = np.append(starts, len(key_s)).astype(np.int32)
            g_codes = (key_s[starts] // num_shards).astype(np.int64)
            g_shards = (key_s[starts] % num_shards).astype(np.int32)
            # stable bucket per key: hash the (small) dictionary once
            vhash = pd.util.hash_array(
                np.asarray(vocab.to_pylist(), dtype=object))
            bucket = ((vhash[g_codes]
                       ^ (g_shards.astype(np.uint64) * np.uint64(0x9E3779B9))
                       ^ np.uint64(fi * 0x85EBCA6B))
                      % np.uint64(self.num_buckets)).astype(np.int32)
            docs_list = pa.ListArray.from_arrays(
                offsets, pa.array(docs_rep[order], pa.int64()))
            tfs_list = pa.ListArray.from_arrays(
                offsets, pa.array(tfs_flat[order], pa.int32()))
            cols = {
                "field": pa.array(np.full(len(starts), f, dtype=object),
                                  pa.string()),
                "term": vocab.take(pa.array(g_codes)),
                "shard": pa.array(g_shards, pa.int32()),
                "docs": docs_list,
                "tfs": tfs_list,
            }
            if self.positions:
                # per-(doc,term) entry j owns tf[j] positions starting at
                # entry_pstart[j] in the flat position values; regroup them
                # into key order with one vectorized segment gather
                pcol = batch[f"{f}__pos"].combine_chunks()
                poff = pcol.offsets.to_numpy()
                pos_all = pcol.values.to_numpy()[poff[0]: poff[-1]]
                tf64 = tfs_flat.astype(np.int64)
                entry_pstart = np.cumsum(tf64) - tf64
                pos_g = _gather_segments(pos_all, entry_pstart[order],
                                         tf64[order])
                # list offsets per key-row: positions per key = sum of tfs
                key_tf = np.add.reduceat(tf64[order], starts) \
                    if len(starts) else np.zeros(0, dtype=np.int64)
                poffsets = np.zeros(len(starts) + 1, dtype=np.int64)
                np.cumsum(key_tf, out=poffsets[1:])
                cols["pos"] = pa.ListArray.from_arrays(
                    poffsets.astype(np.int32),
                    pa.array(pos_g.astype(np.int32), pa.int32()))
            cols["__bucket"] = pa.array(bucket, pa.int32())
            pieces.append(pa.table(cols))
        if not pieces:
            return _partial_schema(self.positions).empty_table()
        return pa.concat_tables(pieces)


def _seg_schema(positions: bool = False) -> pa.Schema:
    fields = [
        ("field", pa.string()), ("term", pa.string()), ("shard", pa.int32()),
        ("block_id", pa.int64()), ("n", pa.int64()), ("min_doc", pa.int64()),
        ("max_doc", pa.int64()), ("max_tf", pa.int64()),
        ("docs_enc", pa.large_binary()), ("tfs_enc", pa.large_binary()),
        ("sum_tf", pa.int64()),
    ]
    if positions:
        # varint position deltas for the block's postings, concatenated in
        # posting order (absolute at each posting's first position, then
        # gaps); per-posting counts are the decoded tf values
        fields.append(("pos_enc", pa.large_binary()))
    return pa.schema(fields)


def _tiled_binary(buf: bytes, starts: np.ndarray,
                  total_len: int) -> pa.Array:
    """Zero-copy large_binary array over ``buf``: value i spans
    ``starts[i]``..``starts[i+1]`` (consecutive slices tile the buffer)."""
    offsets = np.empty(len(starts) + 1, dtype=np.int64)
    offsets[:-1] = starts
    offsets[-1] = total_len
    return pa.Array.from_buffers(
        pa.large_binary(), len(starts),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])


def _encode_bucket(bucket: pa.Table, shard_shift: int | None = None,
                   positions: bool = False) -> pa.Table:
    """Per-bucket body: every (field, term, shard) key wholly inside →
    merge partial lists → sorted postings → encoded blocks.

    Fully vectorized AND Arrow-native: list columns are read through
    ``values``/``offsets`` (zero-copy — a pandas conversion here would
    materialize millions of Python list objects), ONE sort orders all
    postings by (group, doc_id), one varint pass encodes every block, and
    the output binary columns are zero-copy views over the encode buffers.
    A per-(term,shard) loop costs minutes at real vocab sizes.

    When ``shard_shift`` is known, the (group, doc) order comes from a
    single composite-key argsort — ``gid << shift | local_rank`` (ranks
    within a group share one shard, so ``rank & (2^shift − 1)`` is
    unique and order-preserving) — which is ~10× cheaper in memory
    traffic than the two-key lexsort it replaces (round-1 verdict #10:
    the segments stage was memory-bandwidth-bound at 32 cores)."""
    from baram_ray.index.codec import BLOCK_SIZE, encode_varints_np

    n_rows = bucket.num_rows
    if n_rows == 0:
        return _seg_schema(positions).empty_table()
    f = bucket["field"].to_numpy(zero_copy_only=False)
    t = bucket["term"].to_numpy(zero_copy_only=False)
    s = bucket["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
    docs_col = bucket["docs"].combine_chunks()
    tfs_col = bucket["tfs"].combine_chunks()
    doc_off = docs_col.offsets.to_numpy()
    tf_off = tfs_col.offsets.to_numpy()
    # slice values by the offsets range: a sliced ListArray's .values spans
    # the whole child, not just this array's elements
    docs_all = docs_col.values.to_numpy()[doc_off[0]: doc_off[-1]]
    tfs_all = tfs_col.values.to_numpy()[tf_off[0]: tf_off[-1]].astype(np.int64)
    lens = np.diff(doc_off)

    # group rows by key without moving the list payloads: lexsort the keys,
    # detect group boundaries, then label each posting with its group id
    row_order = np.lexsort((s, t, f))
    fo, to, so = f[row_order], t[row_order], s[row_order]
    new_group = np.ones(n_rows, dtype=bool)
    new_group[1:] = (fo[1:] != fo[:-1]) | (to[1:] != to[:-1]) | (so[1:] != so[:-1])
    gid_sorted_rows = np.cumsum(new_group) - 1
    n_groups = int(gid_sorted_rows[-1]) + 1
    first_sorted_row = np.nonzero(new_group)[0]    # gid → index in row_order
    row_gid = np.empty(n_rows, dtype=np.int64)     # original row → gid
    row_gid[row_order] = gid_sorted_rows

    post_row = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    post_gid = row_gid[post_row]
    # tf values are aligned with doc values row-by-row; build flat arrays
    # in row order (they already are: values arrays follow list order)
    if (shard_shift is not None
            and n_groups.bit_length() + shard_shift < 63):
        mask = np.int64((1 << shard_shift) - 1)
        comp = (post_gid << np.int64(shard_shift)) | (docs_all & mask)
        order = np.argsort(comp, kind="stable")    # by group, then doc_id
    else:
        order = np.lexsort((docs_all, post_gid))   # fallback: huge shifts
    docs_s = docs_all[order]
    tfs_s = tfs_all[order]
    gid_s = post_gid[order]
    total = len(docs_s)

    g_starts = np.searchsorted(gid_s, np.arange(n_groups))
    pos_in_g = np.arange(total, dtype=np.int64) - g_starts[gid_s]
    is_blk_start = (pos_in_g % BLOCK_SIZE) == 0

    # block-local deltas: absolute at each block start (blocks never span
    # groups because pos_in_g resets at group starts)
    deltas = np.empty(total, dtype=np.int64)
    deltas[0] = docs_s[0]
    np.subtract(docs_s[1:], docs_s[:-1], out=deltas[1:])
    deltas[is_blk_start] = docs_s[is_blk_start]

    docs_buf, dlens = encode_varints_np(deltas)
    tfs_buf, tlens = encode_varints_np(tfs_s)
    d_starts = np.cumsum(dlens) - dlens
    t_starts = np.cumsum(tlens) - tlens

    blk_start = np.nonzero(is_blk_start)[0]
    blk_end = np.append(blk_start[1:], total) - 1
    keys_at = row_order[first_sorted_row[gid_s[blk_start]]]
    cols = {
        "field": pa.array(f[keys_at], pa.string()),
        "term": pa.array(t[keys_at], pa.string()),
        "shard": pa.array(s[keys_at], pa.int32()),
        "block_id": pa.array(pos_in_g[blk_start] // BLOCK_SIZE, pa.int64()),
        "n": pa.array(blk_end - blk_start + 1, pa.int64()),
        "min_doc": pa.array(docs_s[blk_start], pa.int64()),
        "max_doc": pa.array(docs_s[blk_end], pa.int64()),
        "max_tf": pa.array(np.maximum.reduceat(tfs_s, blk_start), pa.int64()),
        "docs_enc": _tiled_binary(docs_buf, d_starts[blk_start], len(docs_buf)),
        "tfs_enc": _tiled_binary(tfs_buf, t_starts[blk_start], len(tfs_buf)),
        "sum_tf": pa.array(np.add.reduceat(tfs_s, blk_start), pa.int64()),
    }
    if positions:
        # flat positions per partial row-entry → gather into posting order
        # with the SAME permutation that ordered the postings, then
        # delta-encode within each posting (absolute first, then gaps —
        # gaps can be 0: a compound's parts share a word position)
        pos_col = bucket["pos"].combine_chunks()
        p_off = pos_col.offsets.to_numpy()
        pos_all = pos_col.values.to_numpy()[p_off[0]: p_off[-1]] \
            .astype(np.int64)
        tf_flat = tfs_all          # pre-order per-posting counts
        entry_pstart = np.cumsum(tf_flat) - tf_flat
        pos_s = _gather_segments(pos_all, entry_pstart[order], tf_flat[order])
        tfs64 = tfs_s.astype(np.int64)
        pstart = np.cumsum(tfs64) - tfs64        # posting → 1st pos index
        total_p = len(pos_s)
        pdeltas = np.empty(total_p, dtype=np.int64)
        pdeltas[0] = pos_s[0]
        np.subtract(pos_s[1:], pos_s[:-1], out=pdeltas[1:])
        pdeltas[pstart] = pos_s[pstart]
        pos_buf, plens = encode_varints_np(pdeltas)
        p_byte_starts = np.cumsum(plens) - plens
        cols["pos_enc"] = _tiled_binary(
            pos_buf, p_byte_starts[pstart[blk_start]], len(pos_buf))
    return pa.table(cols)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


# ---- two-level doc_id → dense-rank map -------------------------------- #
# Rank space (position in the globally-sorted unique doc_id array) makes
# posting deltas 1-2 varint bytes and doc lookups direct array indexing —
# but a single sorted global id array broadcast via ray.put is 8 B/doc:
# fine at 10^8 docs, dead at the 10^10-10^11 a 100 TB corpus implies.
# The two-level map shards the ID DOMAIN into contiguous value ranges:
#     rank(id) = base[shard_of(id)] + searchsorted(shard_ids, id)
# where shard_of is a searchsorted against S-1 boundary values and
# shard_ids is that shard's sorted id slice, a separate plasma object of
# ≤ ids_per_shard × 8 B. Ranks are IDENTICAL to the global-sort ranks
# for any boundary choice (shards are value ranges, so concatenating
# per-shard sorted slices in shard order IS the global sort) — the
# boundaries only control object granularity, picked from a uniform
# sample so shards stay balanced. Driver state: S boundaries + S bases
# + S object refs. Duplicate detection is per-shard (equal ids share a
# shard by construction).

DEFAULT_IDS_PER_RANK_SHARD = 4 << 20      # 32 MiB objects at 8 B/id


def _block_sorted_ids(files: list[str]):
    """Stage 1 (one task per input file): the file's sorted doc_id array
    (stays in plasma) + tiny stats (count, uniform sample for boundary
    selection) back to the driver."""
    import pyarrow.parquet as _pq
    parts = [_pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
             for f in files]
    ids = (np.sort(np.concatenate(parts)) if parts
           else np.empty(0, dtype=np.int64))
    step = max(1, len(ids) // 128)
    return ids, {"n": int(len(ids)), "sample": ids[::step][:256].copy()}


def _shard_sorted_ids(lo, hi, *blocks):
    """Stage 2 (one task per id shard): slice every block's sorted ids
    to [lo, hi), merge-sort them → the shard's sorted id array AND its
    within-shard dup-id array (both stay in plasma as separate returns)
    + tiny stats (count, min/max, dup count). Dup ids are returned as
    an object, NOT inside stats — the driver must never concatenate
    the corpus-fraction-sized dup set."""
    parts = []
    for b in blocks:
        a = b[(np.searchsorted(b, lo, side="left") if lo is not None else 0):
              (np.searchsorted(b, hi, side="left") if hi is not None
               else len(b))]
        if len(a):
            parts.append(a)
    ids = (np.sort(np.concatenate(parts)) if parts
           else np.empty(0, dtype=np.int64))
    dups = (np.unique(ids[:-1][np.diff(ids) == 0]) if len(ids)
            else np.empty(0, dtype=np.int64))
    return ids, dups, {"n": int(len(ids)), "n_dups": int(len(dups)),
                       "min": int(ids[0]) if len(ids) else None,
                       "max": int(ids[-1]) if len(ids) else None}


class RankMap:
    """doc_id → dense global rank through the per-shard two-level map.

    Pickles into map tasks carrying only boundaries, bases and object
    refs; shard id arrays are ``ray.get`` (zero-copy plasma reads) on
    demand inside the task and memoized per instance."""

    def __init__(self, bounds: np.ndarray, bases: np.ndarray,
                 refs: list, n_ids: int):
        self.bounds = bounds      # (S-1,) shard s = ids in [bounds[s-1], bounds[s])
        self.bases = bases        # (S,) prefix counts
        self.refs = refs          # (S,) plasma refs of sorted shard id arrays
        self.n_ids = n_ids
        self._cache: dict = {}

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_cache"] = {}          # never ship fetched arrays
        return d

    def rank(self, doc_ids: np.ndarray) -> np.ndarray:
        import ray as _ray
        if not len(doc_ids):
            return np.empty(0, dtype=np.int64)
        if len(self.refs) == 1:
            ids0 = self._cache.get(0)
            if ids0 is None:
                ids0 = self._cache[0] = _ray.get(self.refs[0])
            return np.searchsorted(ids0, doc_ids)
        shard = np.searchsorted(self.bounds, doc_ids, side="right")
        out = np.empty(len(doc_ids), dtype=np.int64)
        for sh in np.unique(shard):
            ids_sh = self._cache.get(int(sh))
            if ids_sh is None:
                ids_sh = self._cache[int(sh)] = _ray.get(self.refs[sh])
            m = shard == sh
            out[m] = self.bases[sh] + np.searchsorted(ids_sh, doc_ids[m])
        return out

    def rank_and_member(self, doc_ids: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Like :meth:`rank`, plus a membership mask — for callers whose
        ids may not all exist in the corpus (e.g. tombstone purge).
        Ranks of absent ids are where they WOULD insert (clipped)."""
        import ray as _ray
        n = len(doc_ids)
        if not n:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=bool))
        shard = (np.searchsorted(self.bounds, doc_ids, side="right")
                 if len(self.refs) > 1 else np.zeros(n, dtype=np.int64))
        ranks = np.empty(n, dtype=np.int64)
        member = np.zeros(n, dtype=bool)
        for sh in np.unique(shard):
            ids_sh = self._cache.get(int(sh))
            if ids_sh is None:
                ids_sh = self._cache[int(sh)] = _ray.get(self.refs[sh])
            m = shard == sh
            if len(ids_sh) == 0:     # empty shard (e.g. purge on an
                ranks[m] = self.bases[sh]   # empty index): nothing is
                continue                    # a member; rank = shard base
            p = np.searchsorted(ids_sh, doc_ids[m])
            inside = p < len(ids_sh)
            pc = p.clip(max=len(ids_sh) - 1)
            member[m] = inside & (ids_sh[pc] == doc_ids[m])
            ranks[m] = self.bases[sh] + pc
        return ranks, member


class ShardedIdSet:
    """Sorted int64 id SET sharded by the rank-map id ranges — the
    semi-join side of the duplicate-id upsert. Pickles boundaries,
    per-shard counts and plasma refs only (same two-level design as
    :class:`RankMap`); a membership probe fetches just the shards its
    batch overlaps (zero-copy plasma reads, memoized per instance), so
    nothing set-sized is ever broadcast from or concatenated on the
    driver — the round-3 flagship build's last O(corpus-fraction)
    broadcast (``ray.put(dup_sorted)``) is gone."""

    def __init__(self, bounds: np.ndarray, refs: list,
                 counts: np.ndarray):
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.refs = list(refs)
        self.counts = np.asarray(counts, dtype=np.int64)
        self.total = int(self.counts.sum())
        self._cache: dict = {}

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_cache"] = {}          # never ship fetched arrays
        return d

    def __len__(self) -> int:
        return self.total

    def member(self, ids: np.ndarray) -> np.ndarray:
        import ray as _ray
        ids = np.asarray(ids, dtype=np.int64)
        out = np.zeros(len(ids), dtype=bool)
        if not len(ids) or self.total == 0:
            return out
        shard = (np.searchsorted(self.bounds, ids, side="right")
                 if len(self.refs) > 1
                 else np.zeros(len(ids), dtype=np.int64))
        for sh in np.unique(shard):
            if self.counts[sh] == 0:
                continue
            arr = self._cache.get(int(sh))
            if arr is None:
                arr = self._cache[int(sh)] = _ray.get(self.refs[sh])
            m = shard == sh
            p = np.searchsorted(arr, ids[m]).clip(max=len(arr) - 1)
            out[m] = arr[p] == ids[m]
        return out

    def head(self, k: int) -> np.ndarray:
        """First ``k`` ids (diagnostics/error messages only)."""
        import ray as _ray
        got, n = [], 0
        for sh in range(len(self.refs)):
            if n >= k:
                break
            if self.counts[sh]:
                a = _ray.get(self.refs[sh])[: k - n]
                got.append(a)
                n += len(a)
        return (np.concatenate(got) if got
                else np.empty(0, dtype=np.int64))

    def tolist(self) -> list:
        """Materialize the whole set (tests/diagnostics only — NOT for
        production paths; the set can be corpus-fraction-sized)."""
        import ray as _ray
        parts = [_ray.get(r) for r, c in zip(self.refs, self.counts)
                 if c]
        return np.concatenate(parts).tolist() if parts else []

    @staticmethod
    def from_array(arr: np.ndarray) -> "ShardedIdSet":
        """Single-shard set from a small driver-side array (the
        per-partition incremental path, where the partition is
        block-sized by construction)."""
        import ray as _ray
        arr = np.sort(np.asarray(arr, dtype=np.int64))
        return ShardedIdSet(np.empty(0, dtype=np.int64),
                            [_ray.put(arr)],
                            np.array([len(arr)], dtype=np.int64))


def build_rank_map(paths, *, ids_per_shard: int | None = None,
                   num_id_shards: int | None = None
                   ) -> tuple[RankMap, dict]:
    """Distributed construction of the two-level rank map over the
    doc_id column of ``paths`` (dirs or files). Returns (map, stats)
    where stats carries n / min / max / dups — the driver never holds
    more than S boundary values, S counts and the merged dup ids."""
    import ray as _ray
    if ids_per_shard is None:        # env override for tests / tuning
        ids_per_shard = int(os.environ.get("BARAM_IDS_PER_RANK_SHARD",
                                           DEFAULT_IDS_PER_RANK_SHARD))
    files = _parquet_files(paths if isinstance(paths, list) else [paths])
    if not files:
        ref = _ray.put(np.empty(0, dtype=np.int64))
        empty_set = ShardedIdSet(np.empty(0, np.int64), [ref],
                                 np.zeros(1, dtype=np.int64))
        return RankMap(np.empty(0, np.int64), np.zeros(1, np.int64),
                       [ref], 0), {"n": 0, "min": None, "max": None,
                                   "dups": empty_set}
    blk = _ray.remote(num_returns=2)(_block_sorted_ids)
    pairs = [blk.remote([f]) for f in files]
    id_refs = [p[0] for p in pairs]
    stats = _ray.get([p[1] for p in pairs])
    total = sum(s["n"] for s in stats)
    sample = np.sort(np.concatenate([s["sample"] for s in stats]))
    n_shards = num_id_shards or max(1, -(-total // ids_per_shard))
    n_shards = min(n_shards, max(1, len(sample)))
    if n_shards > 1:
        q = (np.arange(1, n_shards) * len(sample)) // n_shards
        bounds = np.unique(sample[q])
        n_shards = len(bounds) + 1
    else:
        bounds = np.empty(0, dtype=np.int64)
    shard = _ray.remote(num_returns=3)(_shard_sorted_ids)
    srefs, dup_refs, sstat_refs = [], [], []
    for s in range(n_shards):
        lo = None if s == 0 else int(bounds[s - 1])
        hi = None if s == n_shards - 1 else int(bounds[s])
        a, d, b = shard.remote(lo, hi, *id_refs)
        srefs.append(a)
        dup_refs.append(d)
        sstat_refs.append(b)
    sstats = _ray.get(sstat_refs)
    counts = np.array([s["n"] for s in sstats], dtype=np.int64)
    bases = np.zeros(n_shards, dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    # dup ids stay sharded in plasma (equal ids share a shard, so
    # per-shard dup detection is complete); the driver holds only
    # refs + counts, never the concatenated set
    dup_counts = np.array([s["n_dups"] for s in sstats], dtype=np.int64)
    dups = ShardedIdSet(bounds, dup_refs, dup_counts)
    mins = [s["min"] for s in sstats if s["min"] is not None]
    maxs = [s["max"] for s in sstats if s["max"] is not None]
    return (RankMap(bounds, bases, srefs, total),
            {"n": total, "min": min(mins) if mins else None,
             "max": max(maxs) if maxs else None, "dups": dups})


def _collect_sorted_ids(d: str) -> np.ndarray:
    """Sorted doc_id column of a stage directory (one pruned scan)."""
    tables = [pa.table({"doc_id": b["doc_id"]}) for b in
              ray.data.read_parquet(_parquet_files([d]), columns=["doc_id"])
                  .iter_batches(batch_format="pyarrow", batch_size=65536)]
    if not tables:
        return np.empty(0, dtype=np.int64)
    return np.sort(pa.concat_tables(tables)["doc_id"].to_numpy())


def _dups_in(ids_sorted: np.ndarray) -> np.ndarray:
    if not len(ids_sorted):
        return np.empty(0, dtype=np.int64)
    return np.unique(ids_sorted[:-1][np.diff(ids_sorted) == 0])


def _member(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_set, ids).clip(max=len(sorted_set) - 1)
    return sorted_set[pos] == ids


def _dedup_first_wins(fwd_dir: str,
                      dup_ids: "np.ndarray | ShardedIdSet") -> None:
    """Rewrite the forward index keeping ONE row per doc_id — the row
    with the lexicographically smallest sha256 (deterministic and
    partition-order-independent; the batch analogue of the reference's
    id-upsert where a re-crawled (repo, path, commit) replaces its
    previous version).

    Nothing O(conflicts) on the driver OR in a broadcast: the
    conflict-id membership test is a semi-join against the sharded
    dup-id set (:class:`ShardedIdSet` — map tasks fetch only the dup
    shards their batch overlaps, ≤ one rank-map shard each). Rows with
    a non-duplicated id stream straight to the rewrite; the CONFLICT
    rows — all columns — go through one bucketed exchange keyed on
    doc_id, where each group keeps its (sha256-min) first row. Twin
    rows (same id AND same sha, byte-identical re-crawls) need no
    special path: the per-group pick keeps exactly one row whatever
    the multiplicity.
    """
    import shutil as _sh

    import pyarrow.compute as pc

    dup_set = (dup_ids if isinstance(dup_ids, ShardedIdSet)
               else ShardedIdSet.from_array(dup_ids))
    files = _parquet_files([fwd_dir])
    nb = auto_num_blocks(fwd_dir)

    def non_conflict(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~dup_set.member(ids)))

    def conflict(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(dup_set.member(ids)))

    def pick_min_sha(t: pa.Table) -> pa.Table:
        # Arrow-native (rows carry term-list columns — a pandas round-
        # trip would materialize them as Python lists): order by
        # (doc_id, sha256), keep each id's first row
        order = pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("sha256", "ascending")])
        t = t.take(order)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        return t.filter(pa.array(first))

    clean = ray.data.read_parquet(files, override_num_blocks=nb) \
        .map_batches(non_conflict, batch_format="pyarrow")
    conflicts = ray.data.read_parquet(files, override_num_blocks=nb) \
        .map_batches(conflict, batch_format="pyarrow")
    one_each = grouped_map(conflicts, ["doc_id"], pick_min_sha,
                           num_buckets=int(max(2, len(dup_set) // 50_000)),
                           batch_format="pyarrow")
    out = clean.union(one_each)

    tmp = fwd_dir + ".dedup"
    fresh_dir(tmp)
    out.write_parquet(tmp)
    _sh.rmtree(fwd_dir)
    os.replace(tmp, fwd_dir)


def filter_since(input_paths: list[str] | str,
                 since: float | None) -> list[str]:
    """S1 ``--since`` prefilter (reference ``src/commands/index.rs:
    144-158``): keep only input parquet files modified at/after the
    ``since`` epoch — files are skipped WITHOUT reading any content,
    the coarse delta step before fingerprint-level resume."""
    files = _expand_inputs(input_paths)
    if since is None:
        return files
    return [p for p in files if os.stat(p).st_mtime >= since]


def build_index(
    input_paths: list[str] | str,
    out_dir: str,
    cfg: IndexConfig | None = None,
    *,
    resume: bool = True,
    read_columns: list[str] | None = None,
    since: float | None = None,
) -> BuildResult:
    """Build (or resume) the full index under ``out_dir``.

    Layout: ``forward/`` ``docs/`` ``segments/`` ``termdict/`` ``meta.json``
    ``_manifests/``. ``since``: mtime prefilter over input files
    (see :func:`filter_since`).
    """
    cfg = cfg or IndexConfig()
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    if since is not None:
        input_paths = filter_since(input_paths, since)
        if not input_paths:
            raise ValueError("since-filter removed every input file")
    os.makedirs(out_dir, exist_ok=True)
    man = StageManifests(out_dir)
    from baram_ray.tokenizer import TOKENIZER_VERSION
    cfg_fp = (f":cfg=f{','.join(cfg.fields)}|i{','.join(cfg.id_cols)}"
              f"|k{','.join(cfg.keep)}|{cfg.k1}|{cfg.b}"
              f"|tok{TOKENIZER_VERSION}|dup{cfg.on_duplicate}"
              f"|pos{int(cfg.positions)}")
    input_fp = fingerprint_paths(input_paths) + cfg_fp
    res = BuildResult(out_dir=out_dir, n_docs=0, n_terms=0, num_shards=1)

    fwd_dir = os.path.join(out_dir, "forward")
    docs_dir = os.path.join(out_dir, "docs")
    seg_dir = os.path.join(out_dir, "segments")
    td_dir = os.path.join(out_dir, "termdict")
    meta_path = os.path.join(out_dir, "meta.json")

    # ---- stage: forward (normalize + tokenize ONCE) ----------------------
    if resume and man.is_done("forward", input_fp):
        res.resumed_stages.append("forward")
    else:
        fresh_dir(fwd_dir)
        with StageTimer() as t:
            cols = read_columns
            if cols is None:
                # prune at the read: only key+field+meta columns leave storage
                cols = {*cfg.fields, *cfg.keep,
                        *(cfg.id_cols if cfg.id_cols else ())}
                import pyarrow.parquet as _pq
                first = input_paths[0]
                if os.path.isdir(first):
                    first = os.path.join(first, sorted(os.listdir(first))[0])
                schema_names = set(_pq.ParquetFile(first).schema_arrow.names)
                if "doc_id" in schema_names:
                    cols.add("doc_id")   # pre-assigned ids win over id_cols
                missing = cols - schema_names
                if missing:
                    raise ValueError(f"input lacks columns {sorted(missing)}")
                cols = sorted(cols)
            ds = ray.data.read_parquet(
                input_paths, columns=cols,
                override_num_blocks=auto_num_blocks(input_paths))
            norm = NormalizeTokenize(list(cfg.fields), list(cfg.id_cols),
                                     list(cfg.keep), positions=cfg.positions)
            fwd = ds.map_batches(norm, batch_format="pyarrow",
                                 batch_size=cfg.tokenize_batch_size)
            fwd.write_parquet(fwd_dir)
        man.mark_done("forward", input_fp, seconds=t.seconds)
        res.stage_seconds["forward"] = t.seconds

    # ---- duplicate-id policy (reference ingests by id-upsert) ------------
    # one distributed pruned id scan builds the two-level rank map AND
    # detects duplicate ids (per id-shard; equal ids share a shard) —
    # nothing corpus-sized ever lands on the driver. The "first" policy
    # pays one extra exchange ONLY when duplicates actually exist.
    rank_map, id_stats = build_rank_map([fwd_dir])
    dup_ids = id_stats["dups"]
    if len(dup_ids):
        if cfg.on_duplicate == "error":
            raise ValueError(
                "duplicate doc_id(s) in corpus; pass "
                "IndexConfig(on_duplicate='first') for id-upsert semantics "
                "or dedup upstream (doc_dedup_exact)")
        with StageTimer() as t:
            _dedup_first_wins(fwd_dir, dup_ids)
            rank_map, id_stats = build_rank_map([fwd_dir])  # post-dedup ids
        res.stage_seconds["dedup_ids"] = t.seconds

    fwd_fp = fingerprint_paths([fwd_dir])

    # ---- stage: docs table + global stats --------------------------------
    if resume and man.is_done("docs", fwd_fp) and os.path.exists(meta_path):
        res.resumed_stages.append("docs")
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        fresh_dir(docs_dir)
        with StageTimer() as t:
            len_cols = [f"{f}__len" for f in cfg.fields]
            doc_cols = ["doc_id", "sha256", *cfg.keep, *len_cols]
            fwd_ds = ray.data.read_parquet(fwd_dir, columns=doc_cols,
                override_num_blocks=auto_num_blocks(fwd_dir))
            # partition the docs table by the rank map's id shards
            # (hive dirs ids_shard=N): a shard-range reader then loads
            # ONLY its overlapping id shards instead of the whole docs
            # table — the serving-side counterpart of the two-level
            # rank map. Rank offsets per id shard go into meta.
            rm = rank_map

            def tag(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                if len(rm.refs) > 1:
                    sh = np.searchsorted(rm.bounds, ids, side="right")
                else:
                    sh = np.zeros(len(ids), dtype=np.int64)
                return batch.append_column(
                    "ids_shard", pa.array(sh.astype(np.int64)))

            fwd_ds.map_batches(tag, batch_format="pyarrow") \
                .write_parquet(docs_dir, partition_cols=["ids_shard"])
            stats_ds = ray.data.read_parquet(
                _parquet_files([docs_dir]), columns=len_cols)
            aggs = [Count(alias_name="n_docs")] + [
                Sum(c, alias_name=f"total_{c}") for c in len_cols]
            stats = stats_ds.aggregate(*aggs)
            n_docs = int(stats["n_docs"])
            avgdl = {f: (stats[f"total_{f}__len"] or 0) / max(1, n_docs)
                     for f in cfg.fields}
        id_shard_ranks = rank_map.bases.tolist() + [int(rank_map.n_ids)]
        meta = {
            "fields": list(cfg.fields), "n_docs": n_docs, "avgdl": avgdl,
            "k1": cfg.k1, "b": cfg.b,
            "tokenizer_version": TOKENIZER_VERSION,
            "keep": list(cfg.keep),
            "positions": bool(cfg.positions),
            # id-shard s holds ranks [ranks[s], ranks[s+1]) in dir
            # docs/ids_shard=s
            "id_shard_ranks": id_shard_ranks,
        }
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(meta_path + ".tmp", meta_path)
        man.mark_done("docs", fwd_fp, seconds=t.seconds, n_docs=n_docs)
        res.stage_seconds["docs"] = t.seconds

    res.n_docs = meta["n_docs"]

    # ---- stage: segments (the big shuffle) -------------------------------
    num_shards = cfg.num_shards or _next_pow2(
        max(1, res.n_docs // DEFAULT_DOCS_PER_SHARD))
    # postings live in RANK space (position in the sorted doc_id array):
    # shard = rank >> shift partitions ranks into contiguous ranges
    shard_shift = max(0, (max(1, res.n_docs - 1)).bit_length()
                      - (num_shards.bit_length() - 1))
    res.num_shards = num_shards
    seg_fp = fwd_fp + f":shards={num_shards}:rank"

    if resume and man.is_done("segments", seg_fp):
        res.resumed_stages.append("segments")
    else:
        fresh_dir(seg_dir)
        # rebuilding postings from source restores previously-deleted
        # docs → stale tombstones must go (OpenSearch reindex semantics;
        # a fully-resumed build keeps the index, and its deletions, intact)
        from baram_ray.index.deletes import clear_tombstones
        clear_tombstones(out_dir)
        with StageTimer() as t:
            # rank-space postings REQUIRE unique doc_ids (the rank lookup
            # would silently collapse duplicates onto one rank); the
            # policy block above guaranteed it — keep the assert cheap
            assert not len(id_stats["dups"])
            post_cols = ["doc_id"] + [
                c for f in cfg.fields
                for c in ((f"{f}__terms", f"{f}__tfs", f"{f}__pos")
                          if cfg.positions else (f"{f}__terms", f"{f}__tfs"))]
            fwd_ds = ray.data.read_parquet(fwd_dir, columns=post_cols,
                override_num_blocks=auto_num_blocks(fwd_dir))
            # encode buckets sized to the forward index (~1 bucket / 8 MiB,
            # floor 32): group count stays O(cluster), not O(vocab).
            # The partial-postings combiner runs fused inside the split
            # task (pre_fn) — its output goes straight into per-bucket
            # fragments, never unpartitioned through the object store.
            n_buckets = int(max(32, input_bytes(fwd_dir) // (8 << 20)))
            import functools as _ft
            seg = grouped_map(
                fwd_ds, ["field", "term", "shard"],
                _ft.partial(_encode_bucket, shard_shift=shard_shift,
                            positions=cfg.positions),
                num_buckets=n_buckets, batch_format="pyarrow",
                pre_fn=PartialPostings(cfg.fields, shard_shift, n_buckets,
                                       rank_map=rank_map,
                                       num_shards=num_shards,
                                       positions=cfg.positions))
            seg.write_parquet(seg_dir)
        man.mark_done("segments", seg_fp, seconds=t.seconds)
        res.stage_seconds["segments"] = t.seconds

    # ---- stage: termdict (df/cf over block metadata — small) -------------
    seg_out_fp = fingerprint_paths([seg_dir])
    if resume and man.is_done("termdict", seg_out_fp):
        res.resumed_stages.append("termdict")
    else:
        fresh_dir(td_dir)
        with StageTimer() as t:
            seg_meta = ray.data.read_parquet(
                seg_dir, columns=["field", "term", "n", "sum_tf"],
                override_num_blocks=auto_num_blocks(seg_dir))
            td = grouped_agg(seg_meta, ["field", "term"],
                             {"df": ("n", "sum"), "cf": ("sum_tf", "sum")},
                             num_buckets=max(16, input_bytes(seg_dir) // (8 << 20)))
            td.write_parquet(td_dir)
        man.mark_done("termdict", seg_out_fp, seconds=t.seconds)
        res.stage_seconds["termdict"] = t.seconds

    # update meta with shard info (idempotent)
    with open(meta_path) as f:
        meta = json.load(f)
    if (meta.get("num_shards") != num_shards
            or meta.get("id_space") != "rank"
            or meta.get("shard_shift") != shard_shift):
        meta["num_shards"] = num_shards
        meta["id_space"] = "rank"
        meta["shard_shift"] = shard_shift
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(meta_path + ".tmp", meta_path)

    # row count from parquet footers — no Ray job for a metadata lookup
    import glob as _glob
    import pyarrow.parquet as _pq
    res.n_terms = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(td_dir, "*.parquet")))
    return res


# --------------------------------------------------------------------- #
# Partition-granular incremental build (SURVEY §7.1 step 5; the
# reference's --since delta indexing, src/commands/index.rs:144-175 —
# its checkpoint-id prefilter "skip without reading content" becomes a
# per-input-file fingerprint skip here)
# --------------------------------------------------------------------- #

def _expand_inputs(input_paths) -> list[str]:
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    files: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            for root, _, fs in os.walk(p):
                files.extend(os.path.join(root, f) for f in sorted(fs)
                             if f.endswith(".parquet"))
        else:
            files.append(p)
    return sorted(files)


def _part_key(path: str) -> str:
    import hashlib as _hl
    return _hl.sha1(os.path.abspath(path).encode()).hexdigest()[:12]


def _parquet_files(dirs: list[str]) -> list[str]:
    """Flatten partition dirs to file lists (ray.data.read_parquet treats
    list entries as files, not directories). Recurses into nested
    partition layouts (hive ``col=value`` dirs); hidden dirs (staging)
    are skipped."""
    out: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            for root, subdirs, fs in os.walk(d):
                subdirs[:] = sorted(s for s in subdirs
                                    if not s.startswith("."))
                out.extend(os.path.join(root, f) for f in sorted(fs)
                           if f.endswith(".parquet"))
        else:
            out.append(d)
    return out


def _encode_segments(fwd_paths, seg_dir: str, cfg, rank_map: RankMap,
                     id_stats: dict, num_shards: int, shard_shift: int,
                     rank_offset: int, gen: int) -> None:
    """Shuffle-encode postings for the given forward partitions into
    ``seg_dir`` (append — caller clears the dir for full rebuilds)."""
    if len(id_stats["dups"]):
        raise ValueError(
            f"duplicate doc_id(s) (e.g. "
            f"{id_stats['dups'].head(5).tolist()})")
    post_cols = ["doc_id"] + [
        c for f in cfg.fields
        for c in ((f"{f}__terms", f"{f}__tfs", f"{f}__pos")
                  if cfg.positions else (f"{f}__terms", f"{f}__tfs"))]
    fwd_ds = ray.data.read_parquet(fwd_paths, columns=post_cols,
                                   override_num_blocks=auto_num_blocks(fwd_paths))
    n_buckets = int(max(32, input_bytes(fwd_paths) // (8 << 20)))
    import functools as _ft
    seg = grouped_map(
        fwd_ds, ["field", "term", "shard"],
        _ft.partial(_encode_bucket, shard_shift=shard_shift,
                    positions=cfg.positions),
        num_buckets=n_buckets, batch_format="pyarrow",
        pre_fn=PartialPostings(cfg.fields, shard_shift, n_buckets,
                               rank_map=rank_map, num_shards=num_shards,
                               rank_offset=rank_offset,
                               positions=cfg.positions))
    if gen:
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "gen", pa.array(np.full(t.num_rows, gen, dtype=np.int64)))
        seg = seg.map_batches(tag, batch_format="pyarrow")
        # crash-safe delta commit: encode into a staging dir, then move
        # files in under gen-prefixed names. A crash before the manifest
        # records this generation leaves either a stale staging dir or
        # gen-prefixed orphans — both removed by
        # _clean_uncommitted_generations at the next build. (The full
        # rebuild path is already safe: fresh_dir + write + mark.)
        staging = os.path.join(seg_dir, f".gen{gen}.staging")
        fresh_dir(staging)
        seg.write_parquet(staging)
        for i, fn in enumerate(sorted(os.listdir(staging))):
            if fn.endswith(".parquet"):
                os.replace(os.path.join(staging, fn),
                           os.path.join(seg_dir, f"gen{gen}_{i}.parquet"))
        import shutil as _sh
        _sh.rmtree(staging, ignore_errors=True)
        return
    seg.write_parquet(seg_dir)


def _clean_uncommitted_generations(seg_dir: str, committed_gen: int) -> None:
    """Remove delta artifacts of generations the manifest never
    committed (crash between the delta write and mark_done): stale
    ``.genN.staging`` dirs and ``genN_*.parquet`` files with
    N > committed_gen. Re-running the delta would otherwise DOUBLE
    those docs' postings."""
    import re
    import shutil as _sh
    if not os.path.isdir(seg_dir):
        return
    for fn in os.listdir(seg_dir):
        full = os.path.join(seg_dir, fn)
        m = re.match(r"\.gen(\d+)\.staging$", fn)
        if m:
            _sh.rmtree(full, ignore_errors=True)
            continue
        m = re.match(r"gen(\d+)_\d+\.parquet$", fn)
        if m and int(m.group(1)) > committed_gen:
            os.remove(full)


def build_index_incremental(
    input_paths: list[str] | str,
    out_dir: str,
    cfg: IndexConfig | None = None,
    *,
    resume: bool = True,
) -> BuildResult:
    """Incremental build: per-input-file forward/docs partitions skipped
    by fingerprint, and an APPEND-ONLY delta segment encode — when every
    new doc_id sorts after every indexed doc_id, only the new partitions
    are tokenized and shuffled (written as generation-g segment files
    that the reader orders after the base via the ``gen`` column); any
    in-place change or non-append id falls back to a full segment
    rebuild. The resulting index answers queries identically to a
    from-scratch build (tested) — segment file layout differs by design.
    """
    cfg = cfg or IndexConfig()
    files = _expand_inputs(input_paths)
    os.makedirs(out_dir, exist_ok=True)
    man = StageManifests(out_dir)
    from baram_ray.tokenizer import TOKENIZER_VERSION as _TV
    cfg_fp = (f":cfg=f{','.join(cfg.fields)}|i{','.join(cfg.id_cols)}"
              f"|k{','.join(cfg.keep)}|{cfg.k1}|{cfg.b}|tok{_TV}"
              f"|pos{int(cfg.positions)}")
    res = BuildResult(out_dir=out_dir, n_docs=0, n_terms=0, num_shards=1)

    fwd_root = os.path.join(out_dir, "forward")
    docs_root = os.path.join(out_dir, "docs")
    seg_dir = os.path.join(out_dir, "segments")
    td_dir = os.path.join(out_dir, "termdict")
    meta_path = os.path.join(out_dir, "meta.json")
    for d in (fwd_root, docs_root, seg_dir, td_dir):
        os.makedirs(d, exist_ok=True)

    parts = {_part_key(p): p for p in files}
    part_fp = {h: fingerprint_paths([p]) + cfg_fp for h, p in parts.items()}

    # drop partitions whose input file vanished
    import shutil as _sh
    for d in os.listdir(fwd_root):
        if d.startswith("p_") and d[2:] not in parts:
            _sh.rmtree(os.path.join(fwd_root, d), ignore_errors=True)
            _sh.rmtree(os.path.join(docs_root, d), ignore_errors=True)
            man.clear(f"forward:{d[2:]}")

    # ---- per-partition forward + docs (fingerprint anti-join) ----------
    len_cols = [f"{f}__len" for f in cfg.fields]
    doc_cols = ["doc_id", "sha256", *cfg.keep, *len_cols]
    import pyarrow.parquet as _pq
    with StageTimer() as t_fwd:
        for h, p in parts.items():
            if resume and man.is_done(f"forward:{h}", part_fp[h]):
                res.resumed_stages.append(f"forward:{h}")
                continue
            cols = {*cfg.fields, *cfg.keep,
                    *(cfg.id_cols if cfg.id_cols else ())}
            names = set(_pq.ParquetFile(p).schema_arrow.names)
            if "doc_id" in names:
                cols.add("doc_id")
            missing = cols - names
            if missing:
                raise ValueError(f"{p} lacks columns {sorted(missing)}")
            pdir = fresh_dir(os.path.join(fwd_root, f"p_{h}"))
            ddir = fresh_dir(os.path.join(docs_root, f"p_{h}"))
            norm = NormalizeTokenize(list(cfg.fields), list(cfg.id_cols),
                                     list(cfg.keep), positions=cfg.positions)
            fwd = ray.data.read_parquet([p], columns=sorted(cols)) \
                .map_batches(norm, batch_format="pyarrow",
                             batch_size=cfg.tokenize_batch_size)
            fwd.write_parquet(pdir)
            # within-partition id-upsert (cross-partition duplicates are
            # rejected by the encode-stage uniqueness check)
            part_dups = _dups_in(_collect_sorted_ids(pdir))
            if cfg.on_duplicate == "first" and len(part_dups):
                _dedup_first_wins(pdir, part_dups)
            ray.data.read_parquet(pdir, columns=doc_cols).write_parquet(ddir)
            man.mark_done(f"forward:{h}", part_fp[h])
    res.stage_seconds["forward"] = t_fwd.seconds

    # ---- global stats → meta ------------------------------------------
    with StageTimer() as t_docs:
        stats_ds = ray.data.read_parquet(docs_root, columns=len_cols)
        aggs = [Count(alias_name="n_docs")] + [
            Sum(c, alias_name=f"total_{c}") for c in len_cols]
        stats = stats_ds.aggregate(*aggs)
        n_docs = int(stats["n_docs"])
        avgdl = {f: (stats[f"total_{f}__len"] or 0) / max(1, n_docs)
                 for f in cfg.fields}
    res.n_docs = n_docs
    res.stage_seconds["docs"] = t_docs.seconds

    # ---- segments: delta or full rebuild ------------------------------
    state = man.get("segments_inc") or {}
    # drop any delta generation a previous crashed run wrote but never
    # committed to the manifest (idempotent restart; see
    # _clean_uncommitted_generations)
    _clean_uncommitted_generations(seg_dir, int(state.get("gen", 0)))
    covered: dict = dict(state.get("covered", {}))
    changed = [h for h in covered
               if h not in part_fp or covered[h] != part_fp[h]]
    new = [h for h in parts if h not in covered]

    def _rank_map_of(hs: list[str]) -> tuple[RankMap, dict]:
        # two-level map over the partitions' docs tables — the delta /
        # rebuild id sets never materialize on the driver (only per-
        # id-shard counts, min/max and dup ids come back)
        return build_rank_map([os.path.join(docs_root, f"p_{h}")
                               for h in hs])

    with StageTimer() as t_seg:
        if not changed and not new:
            res.resumed_stages.append("segments")
            num_shards = int(state.get("num_shards", 1))
        else:
            new_map, new_stats = (_rank_map_of(new) if new
                                  else (None, {"n": 0, "min": None,
                                               "max": None}))
            append_ok = (covered and not changed and new_stats["n"] > 0
                         and int(new_stats["min"]) > int(state["max_doc_id"]))
            if append_ok:
                shard_shift = int(state["shard_shift"])
                rank_offset = int(state["next_rank"])
                top_rank = rank_offset + new_stats["n"] - 1
                num_shards = (top_rank >> shard_shift) + 1
                _encode_segments(
                    _parquet_files([os.path.join(fwd_root, f"p_{h}")
                                    for h in new]),
                    seg_dir, cfg, new_map, new_stats, num_shards,
                    shard_shift, rank_offset, gen=int(state["gen"]) + 1)
                state = {
                    "covered": {**covered, **{h: part_fp[h] for h in new}},
                    "gen": int(state["gen"]) + 1,
                    "next_rank": rank_offset + new_stats["n"],
                    "max_doc_id": int(new_stats["max"]),
                    "shard_shift": shard_shift,
                    "num_shards": num_shards,
                }
                res.resumed_stages.append("segments:delta")
            else:
                all_map, all_stats = _rank_map_of(list(parts))
                fresh_dir(seg_dir)
                from baram_ray.index.deletes import clear_tombstones
                clear_tombstones(out_dir)       # reindex restores deletions
                num_shards = cfg.num_shards or _next_pow2(
                    max(1, n_docs // DEFAULT_DOCS_PER_SHARD))
                shard_shift = max(0, (max(1, n_docs - 1)).bit_length()
                                  - (num_shards.bit_length() - 1))
                _encode_segments(
                    _parquet_files([os.path.join(fwd_root, f"p_{h}")
                                    for h in parts]),
                    seg_dir, cfg, all_map, all_stats, num_shards,
                    shard_shift, rank_offset=0, gen=0)
                state = {
                    "covered": dict(part_fp), "gen": 0,
                    "next_rank": all_stats["n"],
                    "max_doc_id": (int(all_stats["max"])
                                   if all_stats["max"] is not None else -1),
                    "shard_shift": shard_shift, "num_shards": num_shards,
                }
            man.mark_done("segments_inc", "state", **state)
    res.num_shards = int(state.get("num_shards", 1))
    res.stage_seconds["segments"] = t_seg.seconds

    meta = {"fields": list(cfg.fields), "n_docs": n_docs, "avgdl": avgdl,
            "k1": cfg.k1, "b": cfg.b, "tokenizer_version": _TV,
            "keep": list(cfg.keep), "num_shards": res.num_shards,
            "shard_shift": int(state.get("shard_shift", 0)),
            "id_space": "rank", "incremental": True,
            "positions": bool(cfg.positions)}
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)

    # ---- termdict (cheap re-agg over block metadata) -------------------
    seg_out_fp = fingerprint_paths([seg_dir])
    if resume and man.is_done("termdict", seg_out_fp):
        res.resumed_stages.append("termdict")
    else:
        fresh_dir(td_dir)
        with StageTimer() as t_td:
            seg_meta = ray.data.read_parquet(
                seg_dir, columns=["field", "term", "n", "sum_tf"],
                override_num_blocks=auto_num_blocks(seg_dir))
            td = grouped_agg(seg_meta, ["field", "term"],
                             {"df": ("n", "sum"), "cf": ("sum_tf", "sum")},
                             num_buckets=max(16, input_bytes(seg_dir) // (8 << 20)))
            td.write_parquet(td_dir)
        man.mark_done("termdict", seg_out_fp, seconds=t_td.seconds)
        res.stage_seconds["termdict"] = t_td.seconds

    import glob as _glob
    res.n_terms = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(td_dir, "*.parquet")))
    return res
