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
import re

import numpy as np
import pyarrow.parquet as pq

from baram_ray.index.codec import decode_block


def _dl_distance(a: str, b: str, cap: int) -> int:
    """Damerau-Levenshtein (adjacent transposition counts as one edit —
    Lucene/OpenSearch fuzzy semantics) with a band cap: returns cap+1 as
    soon as the distance must exceed ``cap``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (prev2 is not None and i > 1 and j > 1
                    and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            if v < best:
                best = v
        if best > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


class _PayloadStore:
    """Lazy access to the posting payload columns (docs_enc/tfs_enc) of
    the segment files — the bytes stay ON DISK until a term is first
    queried, then load per row group through a small LRU.

    This is what keeps reader init time and resident memory sublinear in
    index size: at startup only the per-block METADATA columns (term,
    counts, min/max doc, max tf — no payload) are read; the payload (the
    dominant bytes) is fetched on demand. One actor per shard range would
    partition this further on a cluster.
    """

    MAX_CACHED_GROUPS = 64

    def __init__(self, files: list[str], positions: bool = False):
        self.files = files
        self.positions = positions
        self._pf: dict[int, object] = {}
        self._cache: "dict[tuple[int, int], tuple]" = {}
        self._lru: list[tuple[int, int]] = []

    def _group(self, file_idx: int, rg: int):
        import pyarrow.parquet as _pq
        key = (file_idx, rg)
        hit = self._cache.get(key)
        if hit is None:
            pf = self._pf.get(file_idx)
            if pf is None:
                pf = self._pf[file_idx] = _pq.ParquetFile(self.files[file_idx])
            cols = ["docs_enc", "tfs_enc"]
            if self.positions:
                cols.append("pos_enc")
            t = pf.read_row_group(rg, columns=cols)
            hit = (t["docs_enc"].to_pylist(), t["tfs_enc"].to_pylist(),
                   t["pos_enc"].to_pylist() if self.positions else None)
            if len(self._cache) >= self.MAX_CACHED_GROUPS:
                old = self._lru.pop(0)
                self._cache.pop(old, None)
            self._cache[key] = hit
            self._lru.append(key)
        return hit

    def get(self, file_idx: int, rg: int, row: int) -> tuple[bytes, bytes]:
        docs, tfs, _ = self._group(file_idx, rg)
        return docs[row], tfs[row]

    def get_pos(self, file_idx: int, rg: int, row: int) -> bytes:
        return self._group(file_idx, rg)[2][row]


class PostingList:
    """All blocks of one (field, term), sorted in global doc_id order.

    Blocks come sorted by (shard, block_id); shards are doc_id ranges, so
    that order IS doc_id order — concatenation needs no merge. Payload
    bytes are fetched lazily through the shared ``_PayloadStore`` (or
    held eagerly when constructed with raw byte lists — small indexes,
    tests).
    """

    __slots__ = ("n_blocks", "counts", "min_docs", "max_docs", "max_tfs",
                 "docs_enc", "tfs_enc", "pos_enc", "df", "_cache", "_store",
                 "_locs")

    def __init__(self, counts, min_docs, max_docs, max_tfs,
                 docs_enc=None, tfs_enc=None, pos_enc=None,
                 *, store=None, locs=None):
        self.n_blocks = len(counts)
        self.counts = counts
        self.min_docs = min_docs
        self.max_docs = max_docs
        self.max_tfs = max_tfs
        self.docs_enc = docs_enc
        self.tfs_enc = tfs_enc
        self.pos_enc = pos_enc
        self._store = store
        self._locs = locs                    # per block: (file, rg, row)
        self.df = int(sum(counts))
        self._cache: dict[int, tuple] = {}   # decoded blocks, reused across
        # queries served by the same resident engine/actor

    def decode(self, i: int):
        hit = self._cache.get(i)
        if hit is None:
            if self.docs_enc is not None:
                d_enc, t_enc = self.docs_enc[i], self.tfs_enc[i]
            else:
                d_enc, t_enc = self._store.get(*self._locs[i])
            hit = self._cache[i] = decode_block({
                "n": self.counts[i], "docs_enc": d_enc, "tfs_enc": t_enc})
        return hit

    def decode_pos(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """Positions of block ``i``'s postings: (flat absolute positions,
        per-posting offsets — posting p's positions are
        ``flat[offsets[p]:offsets[p+1]]``).

        The block's ``pos_enc`` holds one varint per position: absolute at
        each posting's first position, then gaps (gap 0 is legal — a
        compound identifier's parts share a word position)."""
        key = ("pos", i)
        hit = self._cache.get(key)
        if hit is None:
            from baram_ray.index.codec import decode_varints
            _, tfs = self.decode(i)
            if self.pos_enc is not None:
                enc = self.pos_enc[i]
            else:
                enc = self._store.get_pos(*self._locs[i])
            n_pos = int(tfs.sum())
            vals = decode_varints(enc, n_pos)
            offsets = np.empty(len(tfs) + 1, dtype=np.int64)
            offsets[0] = 0
            np.cumsum(tfs, out=offsets[1:])
            starts = offsets[:-1]
            # absolutes: cumsum with a per-posting reset (subtract the
            # running total just before each posting's first value)
            cum = np.cumsum(vals)
            base = np.repeat(cum[starts] - vals[starts], tfs)
            hit = self._cache[key] = (cum - base, offsets)
        return hit

    def decode_pos_all(self) -> np.ndarray:
        """Flat absolute positions of EVERY posting (concatenated in
        posting order; split points are the decoded tf values)."""
        hit = self._cache.get(("pos", -1))
        if hit is None:
            parts = [self.decode_pos(i)[0] for i in range(self.n_blocks)]
            hit = self._cache[("pos", -1)] = (
                np.concatenate(parts) if parts else
                np.empty(0, dtype=np.int64))
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
    """Resident query-side state for an index — optionally for only a
    SHARD RANGE of it.

    ``shard_range=(lo, hi)`` loads the docs rows and posting blocks of
    shards ``lo..hi-1`` only (shards are contiguous rank ranges, so this
    is an array slice + a block-metadata filter). That is the multi-node
    query architecture: one actor per shard group, each holding ~1/G of
    the index, global IDF via the termdict so per-shard scores are
    IDENTICAL to a single-reader run and top-k merges by (score,
    doc_id) with no rescoring (tested rank-identical).
    """

    def __init__(self, index_dir: str,
                 shard_range: tuple[int, int] | None = None):
        self.dir = index_dir
        # disk signature FIRST (before any state loads): a delta commit
        # racing this open then re-triggers refresh() instead of being
        # silently absorbed into a mixed view
        self._open_sig = self.disk_signature(index_dir)
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.fields: list[str] = self.meta["fields"]
        self.n_docs: int = self.meta["n_docs"]
        self.avgdl: dict[str, float] = self.meta["avgdl"]
        self.k1: float = self.meta["k1"]
        self.b: float = self.meta["b"]
        self.shard_range = shard_range
        self.rank_base = 0
        if shard_range is not None:
            shift = self.meta.get("shard_shift")
            if shift is None:           # pre-round-2 meta: same formula
                ns = int(self.meta.get("num_shards", 1))
                shift = max(0, (max(1, self.n_docs - 1)).bit_length()
                            - (ns.bit_length() - 1))
            self._shift = int(shift)
            self.rank_base = shard_range[0] << self._shift
            # slice bound over the docs-table order array (numpy clamps
            # past-the-end, and after a purge meta n_docs counts LIVE
            # docs which can be fewer than table rows)
            self._rank_hi = shard_range[1] << self._shift

        # --- docs table: doc_id -> row index; dl arrays; metadata ---------
        # (dataset API: the incremental build nests per-input partitions)
        import pyarrow.dataset as _pads
        docs_dir = os.path.join(index_dir, "docs")
        id_ranks = self.meta.get("id_shard_ranks")
        rank_off = 0
        if shard_range is not None and id_ranks and len(id_ranks) > 2:
            # id-shard-partitioned docs table (round 3): load ONLY the
            # id shards overlapping this reader's rank range — each
            # shard dir holds ranks [id_ranks[s], id_ranks[s+1]), so a
            # shard-group actor reads ~its fraction of the docs table
            # instead of all of it (the serving-side two-level map)
            r = np.asarray(id_ranks, dtype=np.int64)
            lo, hi = self.rank_base, min(self._rank_hi, int(r[-1]))
            need = [s for s in range(len(r) - 1)
                    if r[s + 1] > lo and r[s] < hi]
            dirs = [os.path.join(docs_dir, f"ids_shard={s}")
                    for s in need]
            dirs = [d for d in dirs if os.path.isdir(d)]
            files = [os.path.join(d, f) for d in dirs
                     for f in sorted(os.listdir(d))
                     if f.endswith(".parquet")]
            if files:
                docs = _pads.dataset(files, format="parquet").to_table()
                rank_off = int(r[need[0]])
            else:                      # degenerate range → legacy path
                docs = _pads.dataset(docs_dir,
                                     format="parquet").to_table()
                rank_off = 0
        else:
            docs = _pads.dataset(docs_dir, format="parquet").to_table()
        order = np.argsort(docs["doc_id"].to_numpy(), kind="stable")
        if shard_range is not None:        # rank order == sorted-id order:
            order = order[self.rank_base - rank_off:
                          self._rank_hi - rank_off]   # array slice
        self.doc_ids = docs["doc_id"].to_numpy()[order]
        self.doc_index = {int(d): i for i, d in enumerate(self.doc_ids)}
        self.dl = {f: docs[f"{f}__len"].to_numpy().astype(np.float64)[order]
                   for f in self.fields}
        self.doc_meta = {}
        for c in self.meta.get("keep", []):
            if c in docs.column_names:
                self.doc_meta[c] = np.asarray(docs[c].to_pylist(), dtype=object)[order]
        self.sha256 = np.asarray(docs["sha256"].to_pylist(), dtype=object)[order]

        # --- segments: (field, term) -> PostingList (LAZY payload) --------
        # Only the metadata columns are read at init; posting payload
        # (docs_enc/tfs_enc — the dominant bytes) loads on demand per row
        # group via _PayloadStore. Init time and RSS are sublinear in
        # index size (round-1 verdict item 5).
        seg_dir = os.path.join(index_dir, "segments")
        files = sorted(
            os.path.join(seg_dir, f) for f in os.listdir(seg_dir)
            if f.endswith(".parquet"))
        self.has_positions = bool(self.meta.get("positions", False))
        self._payload = _PayloadStore(files, positions=self.has_positions)
        meta_cols = ["field", "term", "shard", "block_id", "n",
                     "min_doc", "max_doc", "max_tf"]
        metas, loc_fi, loc_rg, loc_row = [], [], [], []
        for fi, path in enumerate(files):
            pf = pq.ParquetFile(path)
            # delta (incremental) segment files carry a build generation;
            # base files predate it → gen 0
            has_gen = "gen" in pf.schema_arrow.names
            cols = meta_cols + (["gen"] if has_gen else [])
            for rg in range(pf.num_row_groups):
                import pyarrow as pa
                t = pf.read_row_group(rg, columns=cols)
                rows_in_rg = np.arange(t.num_rows, dtype=np.int32)
                if shard_range is not None and t.num_rows:
                    sh = t["shard"].to_numpy(zero_copy_only=False)
                    keep = (sh >= shard_range[0]) & (sh < shard_range[1])
                    if not keep.all():
                        t = t.filter(pa.array(keep))
                        rows_in_rg = rows_in_rg[keep]   # ORIGINAL payload
                        # row offsets survive the metadata filter
                if t.num_rows == 0:
                    continue
                if not has_gen:
                    t = t.append_column(
                        "gen", pa.array(np.zeros(t.num_rows, dtype=np.int64)))
                metas.append(t.select(meta_cols + ["gen"]))
                loc_fi.append(np.full(t.num_rows, fi, dtype=np.int32))
                loc_rg.append(np.full(t.num_rows, rg, dtype=np.int32))
                loc_row.append(rows_in_rg)
        self.postings: dict[tuple[str, str], PostingList] = {}
        if metas:
            import pyarrow as pa
            df_ = pa.concat_tables(metas).to_pandas()
            df_["__fi"] = np.concatenate(loc_fi)
            df_["__rg"] = np.concatenate(loc_rg)
            df_["__row"] = np.concatenate(loc_row)
            # global doc order = (shard asc, gen asc, block_id asc): delta
            # builds append ranks after the previous dense rank space, so
            # within an equal shard every gen-g block precedes gen-g+1
            df_ = df_.sort_values(["field", "term", "shard", "gen",
                                   "block_id"], kind="stable")
            for (fld, term), g in df_.groupby(["field", "term"], sort=False):
                locs = list(zip(g["__fi"].astype(int),
                                g["__rg"].astype(int),
                                g["__row"].astype(int)))
                self.postings[(fld, term)] = PostingList(
                    g["n"].to_numpy(), g["min_doc"].to_numpy(),
                    g["max_doc"].to_numpy(), g["max_tf"].to_numpy(),
                    store=self._payload, locs=locs)

        # --- tombstones (delete_by_query): live-docs mask ---------------
        # Lucene model: deleted docs are masked out of every query path
        # (filter_mask folds this in) but df / n_docs / avgdl stay as-is
        # until purge_deletes rewrites the segments, so surviving hits
        # keep bit-identical scores (reference delete_by_query,
        # src/embedding/mod.rs:768-789, delegates exactly this to Lucene)
        self.n_deleted = 0
        self.live: np.ndarray | None = None
        ddir = os.path.join(index_dir, "deletes")
        if os.path.isdir(ddir):
            parts = [pq.read_table(os.path.join(ddir, fn),
                                   columns=["doc_id"])["doc_id"].to_numpy()
                     for fn in sorted(os.listdir(ddir))
                     if fn.endswith(".parquet")]
            del_ids = (np.unique(np.concatenate(parts)) if parts
                       else np.empty(0, dtype=np.int64))
            if len(del_ids) and len(self.doc_ids):
                pos = np.searchsorted(self.doc_ids, del_ids)
                ok = pos < len(self.doc_ids)
                pos = pos[ok]
                hit = self.doc_ids[pos] == del_ids[ok]   # ids in THIS
                pos = pos[hit]                           # (shard) slice
                if len(pos):
                    self.live = np.ones(len(self.doc_ids), dtype=bool)
                    self.live[pos] = False
                    self.n_deleted = int(len(pos))

        # global document frequencies for sharded readers: a shard-local
        # pl.df would skew idf vs a single-reader run — the termdict
        # (field, term → global df) restores identical scoring
        self._global_df: dict | None = None
        if shard_range is not None:
            td = pq.read_table(os.path.join(index_dir, "termdict"),
                               columns=["field", "term", "df"])
            self._global_df = {
                (f_, t_): int(d_) for f_, t_, d_ in zip(
                    td["field"].to_pylist(), td["term"].to_pylist(),
                    td["df"].to_numpy())}

    # ------------------------------------------------------------------ #
    # Delta visibility: the reference's backend refreshes the live index
    # every 5 s (src/embedding/mod.rs:240-245). Here a committed delta
    # generation / delete / purge changes the on-disk signature; a live
    # reader re-opens IN PLACE — no actor restart, no alias swap.

    @staticmethod
    def disk_signature(index_dir: str) -> str:
        """Cheap change-detection signature of everything a reader
        loads: meta.json, the committed build state, segment files and
        tombstones (names + sizes + mtimes — no data reads)."""
        from baram_ray.state.checkpoint import fingerprint_paths
        return fingerprint_paths([
            os.path.join(index_dir, "meta.json"),
            os.path.join(index_dir, "_manifests", "segments_inc.json"),
            os.path.join(index_dir, "segments"),
            os.path.join(index_dir, "deletes"),
        ])

    def refresh(self) -> bool:
        """Re-open the index dir when its committed on-disk state
        changed since this reader loaded (delta ingest, delete, purge,
        full reindex into the same dir). Returns True when new state
        was loaded, False on the (cheap) no-change fast path.

        Swaps the fully-constructed fresh state in atomically (one
        ``__dict__`` rebind — also resets every lazily-built structure,
        e.g. the per-field sorted term lists), so a single-threaded
        actor never serves a half-refreshed view."""
        if self.disk_signature(self.dir) == self._open_sig:
            return False
        fresh = IndexReader(self.dir, shard_range=self.shard_range)
        self.__dict__ = fresh.__dict__
        return True

    def df(self, fld: str, term: str) -> int:
        p = self.postings.get((fld, term))
        return p.df if p else 0

    def _term_list(self, fld: str) -> list[str]:
        """Lazily-built sorted term list per field (term-dict order)."""
        if not hasattr(self, "_sorted_terms") or self._sorted_terms is None:
            by_field: dict[str, list[str]] = {}
            for (f_, t_) in self.postings:
                by_field.setdefault(f_, []).append(t_)
            for f_ in by_field:
                by_field[f_].sort()
            self._sorted_terms = by_field
        return self._sorted_terms.get(fld, [])

    def terms_with_prefix(self, fld: str, prefix: str,
                          max_expansions: int = 50) -> list[str]:
        """First ``max_expansions`` terms of ``fld`` starting with
        ``prefix``, in term-dictionary (lexicographic) order — OpenSearch
        prefix-query expansion semantics. The sorted per-field term list
        is built lazily once per reader (termdict order; on a sharded
        cluster this lookup is the termdict's job)."""
        import bisect
        lst = self._term_list(fld)
        lo = bisect.bisect_left(lst, prefix)
        hi = len(lst)
        out = []
        for i in range(lo, hi):
            if not lst[i].startswith(prefix):
                break
            out.append(lst[i])
            if len(out) >= max_expansions:
                break
        return out

    def terms_wildcard(self, fld: str, pattern: str,
                       max_expansions: int = 50) -> list[str]:
        """Terms of ``fld`` matching the glob ``pattern`` (``*`` = any
        run incl. empty, ``?`` = exactly one char — Lucene/OpenSearch
        WildcardQuery syntax), in term-dictionary order, capped at
        ``max_expansions``. The literal prefix before the first wildcard
        narrows the scan to its prefix range of the sorted term list
        (the prefix acceleration Lucene's wildcard automaton performs)."""
        import bisect
        import fnmatch
        lit = re.split(r"[*?]", pattern, maxsplit=1)[0]
        rx = re.compile(fnmatch.translate(pattern))
        lst = self._term_list(fld)
        lo = bisect.bisect_left(lst, lit) if lit else 0
        out: list[str] = []
        for i in range(lo, len(lst)):
            t = lst[i]
            if lit and not t.startswith(lit):
                break
            if rx.match(t):
                out.append(t)
                if len(out) >= max_expansions:
                    break
        return out

    def terms_regexp(self, fld: str, pattern: str,
                     max_expansions: int = 50) -> list[str]:
        """Terms of ``fld`` FULLY matched by the regular expression
        ``pattern`` (Lucene/OpenSearch RegexpQuery semantics: the regexp
        is anchored — it must match the whole term), in term-dictionary
        order, capped at ``max_expansions``. A literal prefix of the
        pattern narrows the scan to its prefix range of the sorted term
        list (the prefix extraction Lucene's regexp automaton performs)."""
        import bisect
        rx = re.compile(pattern)
        # longest literal prefix: chars before the first regex
        # metacharacter (conservative — escapes stop the literal run)
        m = re.match(r"[^\\.?*+()\[\]{}|^$]*", pattern)
        lit = m.group(0) if m else ""
        lst = self._term_list(fld)
        lo = bisect.bisect_left(lst, lit) if lit else 0
        out: list[str] = []
        for i in range(lo, len(lst)):
            t = lst[i]
            if lit and not t.startswith(lit):
                break
            if rx.fullmatch(t):
                out.append(t)
                if len(out) >= max_expansions:
                    break
        return out

    def df_global(self, fld: str, term: str, pl) -> int:
        """Corpus-wide df for idf (== pl.df for a full reader)."""
        if self._global_df is None:
            return pl.df
        return self._global_df.get((fld, term), pl.df)

    def terms_fuzzy(self, fld: str, term: str, max_edits: int | None = None,
                    prefix_length: int = 0,
                    max_expansions: int = 50) -> list[str]:
        """Terms of ``fld`` within Damerau-Levenshtein distance
        ``max_edits`` of ``term`` (OpenSearch fuzzy expansion;
        ``max_edits=None`` = AUTO: 0 edits for length <3, 1 for 3-5,
        2 above). Candidates share the first ``prefix_length`` chars;
        ties resolve in (distance asc, term asc) order, capped at
        ``max_expansions``. Exact match always sorts first (distance 0)."""
        if max_edits is None:
            n = len(term)
            max_edits = 0 if n < 3 else (1 if n <= 5 else 2)
        pre = term[:prefix_length]
        cands = []
        for t in self._term_list(fld):
            if prefix_length and not t.startswith(pre):
                continue
            if abs(len(t) - len(term)) > max_edits:
                continue
            d = _dl_distance(term, t, max_edits)
            if d <= max_edits:
                cands.append((d, t))
        cands.sort()
        return [t for _, t in cands[:max_expansions]]

    def filter_mask(self, filters: dict | None) -> np.ndarray | None:
        """Row-aligned boolean mask for metadata filters.

        Values: a scalar = equality (the reference's term filters,
        ``src/embedding/mod.rs:509-532``); a dict with ``gte``/``lte``/
        ``gt``/``lt`` = a range predicate (the reference's ``published_at``
        range filter, ``src/embedding/mod.rs:517-532``) — works on any
        kept numeric/date/string metadata column.
        """
        if not filters:
            # no metadata filters — but tombstoned docs are still masked
            return self.live.copy() if self.live is not None else None
        mask = (self.live.copy() if self.live is not None
                else np.ones(len(self.doc_ids), dtype=bool))
        for col, val in filters.items():
            if col not in self.doc_meta:
                from baram_ray.errors import UnknownFilterColumn
                raise UnknownFilterColumn(col)
            data = self.doc_meta[col]
            if isinstance(val, dict) and set(val) == {"exists"}:
                # OpenSearch ``exists`` filter: non-null (NaN floats,
                # None objects); ints/strings are dense → all pass
                import pandas as pd
                nn = np.asarray(pd.notna(data))
                mask &= nn if val["exists"] else ~nn
                continue
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
            elif isinstance(val, (list, tuple, set, frozenset)):
                # OpenSearch ``terms`` filter: value IN list
                mask &= np.isin(data, list(val))
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
        if self.live is not None:
            rows = rows[self.live[rows]]
        return self.doc_ids[rows]

    def live_doc_ids(self) -> np.ndarray:
        """Sorted doc_ids excluding tombstoned docs (post-purge the
        tombstones remain — the docs table keeps its rows for rank
        stability — so this stays the match-all surface)."""
        if self.live is None:
            return self.doc_ids
        return self.doc_ids[self.live]
