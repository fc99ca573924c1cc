"""Deduplication suite — exact + near-dup, Ray-Data-first.

The reference only has exact dedup (3-tier bloom/hashset/Postgres,
``src/storage/dedup.rs:856-1065`` — replaced here by one shuffle, SURVEY.md
D1/D2); the near-dup family (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine) is the large-scale training-data extension.

Scale shapes (ray_guide "Aggregation at scale"):

- exact:   hash column in ``map_batches`` → ``groupby(hash).min(doc_id)``.
- minhash: per-batch shingle→minhash (uint64-vectorized) → explode to
  ``(band_id, band_hash, doc_id)`` rows → ``groupby(band)`` → candidate
  pairs per bucket → verify exact Jaccard by hash-joining pairs back to
  per-doc shingle-hash lists (``attach_by_key``, one cogroup per side —
  NO driver-side corpus map) → distributed min-label propagation for
  cluster assignment (``cluster_from_pairs_ds``).
  Bucket fan-out is bounded: a bucket of b docs emits b·(b−1)/2 pairs,
  so the CLIQUE is capped (``MAX_BUCKET``) and every doc beyond the cap
  is anchor-linked into the capped core (``_anchor_links`` — O(b) extra
  pairs, logged). At 100 TB an uncapped hot bucket is a job-killer, but
  plain truncation silently dropped dup STORMS (thousands of
  near-identical boilerplate docs — the same sorted prefix survives in
  every band, so docs past the cap got no pair at all); anchors keep
  the storm one connected component at linear cost.
- simhash: 64-bit fingerprint per doc; near-dups = equal 16-bit bands.
  Fingerprints ride the band rows, so hamming verification happens inside
  the pair-gen reduce (vectorized XOR+popcount) — no broadcast fp map.
- n-gram Jaccard: EXACT prefix filtering (PPJoin) — global (df, gram)
  order, each doc emits its |d|−ceil(t·|d|)+1 rarest grams, completeness
  guaranteed by the prefix-filter theorem; verify via the same
  attach-lists cogroup. SQL-checkable AND stop-gram-safe.
- embedding cosine: see baram_ray.similarity (shared matmul kernel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from baram_ray.util import attach_by_key, cogroup, grouped_agg, grouped_map

MAX_BUCKET = 256          # cap pair fan-out per LSH/band bucket
#: exact-jaccard verify strategy switch: take the per-gram co-count
#: path while Σ df·(df−1)/2 stays under this many pair emissions
#: (16 B/row ⇒ ~8 GB of exchange volume at the default)
COCOUNT_MAX_PAIRS = 5e8
_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a·b) mod 2^61−1 in pure uint64 — no Python-object bigints.

    32-bit limb split keeps every partial product < 2^64; reduction uses
    2^64 ≡ 8 (mod p) and v·2^32 ≡ ((v & (2^29−1)) << 32) + (v >> 29)
    (mod p). Byte-identical to object-dtype modular math (unit-tested).
    """
    mask32 = np.uint64(0xFFFFFFFF)
    a = a % _M61
    b = b % _M61
    a_hi, a_lo = a >> np.uint64(32), a & mask32
    b_hi, b_lo = b >> np.uint64(32), b & mask32
    hi = a_hi * b_hi                                  # < 2^58
    mid = (a_hi * b_lo + a_lo * b_hi) % _M61          # < 2^62 pre-mod
    mid = ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32)) \
        + (mid >> np.uint64(29))                      # ≡ mid·2^32 (mod p)
    r = hi * np.uint64(8) + mid + (a_lo * b_lo) % _M61   # < 2^63
    return r % _M61


_OVERFLOW_ANCHORS = 2     # anchor links per overflow doc in oversize buckets


def _anchor_links(core: np.ndarray, over: np.ndarray):
    """Bounded links for a bucket's overflow docs: each doc beyond the
    clique cap pairs with ``_OVERFLOW_ANCHORS`` in-cap docs, spread
    deterministically across the core. O(|over|) pairs instead of the
    O(|over|²) full clique — and, critically, NOT zero.

    Why: a dup storm (thousands of near-identical docs — boilerplate
    pages, mirrored files) lands in the SAME bucket in every band with
    the SAME sorted id order, so plain truncation kept the same first
    ``cap`` docs everywhere and every doc past the cap got NO candidate
    pair at all — at web scale that silently dropped ~all of exactly
    the clusters dedup exists for. Anchor links give every overflow doc
    a verified path into the storm's connected component while the pair
    volume stays linear. Anchors still pass the exact downstream
    verification, so precision is unchanged (the emitted pair set is a
    strict superset of the truncated one)."""
    m = len(over)
    idx = (np.arange(m, dtype=np.int64)[:, None] * _OVERFLOW_ANCHORS
           + np.arange(_OVERFLOW_ANCHORS, dtype=np.int64)) % len(core)
    # core ids sort below overflow ids (sorted-unique split), so a < b
    return core[idx].ravel(), np.repeat(over, _OVERFLOW_ANCHORS)


def _pairs_in_buckets(bucket: pd.DataFrame, keys: list[str],
                      extra_ones: str | None = None,
                      cap: int | None = MAX_BUCKET) -> pd.DataFrame:
    """All candidate pairs within each ``keys`` group of one hash bucket
    (vectorized pandas groupby; per-group CLIQUE fan-out capped at
    ``cap`` — pass ``cap=None`` only for exact operators whose oracle
    has no cap). Docs beyond the cap each get ``_OVERFLOW_ANCHORS``
    anchor pairs into the capped core (see :func:`_anchor_links`), so
    oversize buckets cost O(cap² + |bucket|) pairs but keep every doc
    reachable. Truncations are counted and logged so the clique→anchor
    degradation is observable at scale (the documented contract)."""
    out_a, out_b = [], []
    n_truncated = 0
    for _, g in bucket.groupby(keys, sort=False):
        docs = np.unique(g["doc_id"].to_numpy())
        over = None
        if cap is not None and len(docs) > cap:
            n_truncated += 1
            over = docs[cap:]
            docs = docs[:cap]
        if len(docs) >= 2:
            ai, bi = np.triu_indices(len(docs), k=1)
            out_a.append(docs[ai]); out_b.append(docs[bi])
        if over is not None:
            a, b = _anchor_links(docs, over)
            out_a.append(a); out_b.append(b)
    if n_truncated:
        import logging
        logging.getLogger("baram_ray.dedup").warning(
            "%d oversize bucket(s): clique capped at %d, overflow docs "
            "anchor-linked (%d links each) — pair volume bounded, some "
            "overflow-overflow near-dup pairs resolve only transitively",
            n_truncated, cap, _OVERFLOW_ANCHORS)
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    cols = {"a": pd.Series(a, dtype="int64"), "b": pd.Series(b, dtype="int64")}
    if extra_ones:
        cols[extra_ones] = pd.Series(np.ones(len(a), dtype=np.int64))
    return pd.DataFrame(cols)


def _hash64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of shingle strings (no PYTHONHASHSEED dependence)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
    return out


def word_shingles(text: str, n: int = 3) -> list[str]:
    words = (text or "").lower().split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]


# --------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------- #

class MinHasher:
    """Vectorized minhash: k permutations via (a·x + b) mod p over 64-bit
    shingle hashes. Deterministic (seeded) — same signature on every worker.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm,
                             dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm,
                             dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.int64)
        x = shingle_hashes.astype(np.uint64)[:, None]        # (s, 1)
        vals = (_mulmod61(x, self.a) + self.b) % _M61        # uint64-exact
        return vals.min(axis=0).astype(np.int64)


class MinHashBands:
    """map_batches UDF: doc → (band_id, band_hash, doc_id) rows."""

    def __init__(self, text_col: str, num_perm: int = 128, bands: int = 32,
                 shingle_n: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        # batch-vectorized signatures: shingles dedupe PER DOC first
        # (min over a multiset == min over its set), then the
        # permutation math runs once per UNIQUE shingle in the batch
        # (~10× fewer rows on a Zipfian corpus) and expands by gather;
        # per-doc mins via minimum.reduceat — value-identical to the
        # per-doc loop it replaces
        shingle_lists = [sorted(set(word_shingles(t, self.shingle_n)))
                         for t in texts]
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        sigs = np.full((len(texts), self.mh.num_perm), _MERSENNE,
                       dtype=np.int64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            all_sh = [s for sl in shingle_lists for s in sl]
            uniq, inv = np.unique(np.array(all_sh, dtype=object),
                                  return_inverse=True)
            vals_u = (_mulmod61(_hash64(list(uniq)).astype(np.uint64)
                                [:, None], self.mh.a)
                      + self.mh.b) % _M61
            starts = np.concatenate(
                [[0], np.cumsum(lens)[:-1]])[nonempty].astype(np.intp)
            sigs[nonempty] = np.minimum.reduceat(
                vals_u[inv], starts, axis=0).astype(np.int64)
        # band hash: vectorized xor-multiply avalanche over the band's
        # signature rows. The hash is an INTERNAL bucketing key only
        # (equal band signatures ⇒ equal hash is the LSH property; a
        # rare unequal collision just adds a candidate pair that exact
        # verification discards), so it does not need to be blake2b —
        # this replaces bands × docs Python-loop digests with three
        # numpy passes.
        n = len(doc_ids)
        seg = sigs.reshape(n, self.bands, self.rows_per_band) \
                  .astype(np.uint64)
        h = np.zeros((n, self.bands), dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for j in range(self.rows_per_band):
            h = (h ^ seg[:, :, j]) * mult
            h ^= h >> np.uint64(29)
        h >>= np.uint64(1)                      # non-negative in int64
        return pa.table({
            "band_id": pa.array(
                np.tile(np.arange(self.bands, dtype=np.int32), n),
                pa.int32()),
            "band_hash": pa.array(h.reshape(-1).view(np.int64),
                                  pa.int64()),
            "doc_id": pa.array(
                np.repeat(np.asarray(doc_ids, dtype=np.int64),
                          self.bands), pa.int64()),
        })


def minhash_candidates(ds, text_col: str, *, num_perm: int = 128,
                       bands: int = 32, shingle_n: int = 3,
                       num_buckets: int = 64):
    """Dataset[(doc_id, text)] → distinct candidate pairs (a < b)."""
    band_rows = ds.map_batches(
        MinHashBands(text_col, num_perm, bands, shingle_n),
        batch_format="pyarrow")
    pairs = grouped_map(
        band_rows, ["band_id", "band_hash"],
        lambda b: _pairs_in_buckets(b, ["band_id", "band_hash"]),
        num_buckets=num_buckets)
    # distinct pairs (a doc pair can collide in several bands)
    return grouped_agg(pairs, ["a", "b"], {"n_bands": (None, "count")},
                       num_buckets=num_buckets)


def doc_token_hashes(ds, text_col: str, shingle_n: int):
    """Dataset[(doc_id, sh: list<int64>, sz)] — distinct 64-bit shingle
    hashes per doc (int64 bit-view of blake2b-8). Docs with zero shingles
    are dropped (they can't pass any Jaccard threshold and the degenerate
    all-identical minhash signature must not verify them)."""
    def f(batch: pa.Table) -> pa.Table:
        # blake2b once per unique shingle in the batch (same
        # memoization as the band map), then per-doc gather
        docs = [(d, sorted(set(word_shingles(t, shingle_n))))
                for d, t in zip(batch["doc_id"].to_pylist(),
                                batch[text_col].to_pylist())]
        all_sh = [s for _, sl in docs for s in sl]
        if all_sh:
            uniq, inv = np.unique(np.array(all_sh, dtype=object),
                                  return_inverse=True)
            hs_all = _hash64(list(uniq))[inv]
        ids, lists, szs = [], [], []
        pos = 0
        for d, sl in docs:
            n = len(sl)
            if n == 0:
                continue
            hs = np.unique(hs_all[pos:pos + n])
            pos += n
            ids.append(d); lists.append(hs.view(np.int64)); szs.append(len(hs))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sh": pa.array([x.tolist() for x in lists],
                           pa.list_(pa.int64())),
            "sz": pa.array(szs, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _jaccard_of_attached(batch: pd.DataFrame, threshold: float,
                         a_col: str = "sh_a", b_col: str = "sh_b"
                         ) -> pd.DataFrame:
    """Exact Jaccard per candidate row from two attached sorted-distinct
    hash-list columns (np.intersect1d per pair; pair counts are LSH-small
    and the work is distributed across the verify tasks)."""
    out_a, out_b, out_j = [], [], []
    for a, b, sa, sb in zip(batch["a"], batch["b"],
                            batch[a_col], batch[b_col]):
        sa = np.asarray(sa, dtype=np.int64)
        sb = np.asarray(sb, dtype=np.int64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = len(sa) + len(sb) - inter
        if union == 0:
            continue
        j = inter / union
        if j >= threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(round(j, 6))
    return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                         "b": pd.Series(out_b, dtype="int64"),
                         "jaccard": pd.Series(out_j, dtype="float64")})


def minhash_dedup(ds, text_col: str, *, threshold: float = 0.8,
                  num_perm: int = 128, bands: int = 32, shingle_n: int = 3,
                  num_buckets: int = 64):
    """Full near-dup pipeline → verified pairs (a, b, jaccard).

    Verification is fully distributed: candidate pairs are hash-joined
    (``attach_by_key`` cogroup, once per pair side) against the per-doc
    shingle-hash lists — no whole-corpus map ever materializes on the
    driver. Cluster assignment from pairs is ``cluster_from_pairs_ds``.
    """
    cand = minhash_candidates(ds, text_col, num_perm=num_perm, bands=bands,
                              shingle_n=shingle_n, num_buckets=num_buckets)
    sh = doc_token_hashes(ds, text_col, shingle_n)
    j1 = attach_by_key(cand, sh, "a", {"sh": "sh_a", "sz": "sz_a"},
                       num_buckets=num_buckets)
    j2 = attach_by_key(j1, sh, "b", {"sh": "sh_b", "sz": "sz_b"},
                       num_buckets=num_buckets)
    return j2.map_batches(
        lambda b: _jaccard_of_attached(b, threshold), batch_format="pandas")


def cluster_from_pairs(pairs_df: pd.DataFrame, all_ids) -> pd.DataFrame:
    """Union-find over verified pairs → (doc_id, cluster) with cluster =
    min doc_id of the component (first-wins, reference D1 semantics).

    Driver-side: the verified-pair set is orders of magnitude smaller than
    the corpus; at cluster scale replace with a few rounds of min-label
    propagation (groupby-min over edge lists).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = [int(x) for x in all_ids]
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "cluster": pd.Series([find(i) for i in ids],
                                              dtype="int64")})


def cluster_from_pairs_ds(pairs, ids, *, num_buckets: int = 32,
                          max_iters: int = 30,
                          small_pairs_limit: int = 2_000_000):
    """Distributed connected components via min-label propagation —
    Dataset[(a, b)] pairs + Dataset[(doc_id)] universe →
    Dataset[(doc_id, cluster)] with cluster = component-min doc_id
    (same first-wins semantics as the driver ``cluster_from_pairs``).

    Each round: neighbor labels flow along symmetric edges (one cogroup
    hash-join), then groupby-min folds them into the label table. Labels
    are monotonically non-increasing, so an unchanged sum(label) is the
    fixpoint; rounds needed = component diameter (near-dup clusters are
    shallow). Nothing corpus-sized touches the driver.

    Adaptive small path: the verified-pair set is orders of magnitude
    smaller than the corpus; when it fits ``small_pairs_limit`` rows the
    label map is computed by one driver union-find over the PAIR-TOUCHED
    ids only (never the corpus) and broadcast as a dict into the final
    corpus-wide map — the broadcast-when-small analogue of a join-side
    strategy switch, replacing ~2·diameter exchange rounds with one
    streaming pass. Beyond the limit the fully-distributed propagation
    runs; both paths are output-identical (tested).
    """
    import ray.data

    def sym(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": pa.array(np.concatenate([a, bb]), pa.int64()),
            "y": pa.array(np.concatenate([bb, a]), pa.int64()),
        })

    # materialize the edge list ONCE: the loop below iterates it every
    # round, and a lazy Dataset would re-execute the whole upstream
    # candidate-gen + verification pipeline per iteration (edges are
    # pair-scale, far smaller than the corpus — safe to pin)
    edges = pairs.select_columns(["a", "b"]).map_batches(
        sym, batch_format="pyarrow").materialize()

    if edges.count() <= 2 * small_pairs_limit:      # sym doubles rows
        edf = edges.to_pandas()
        touched = pd.DataFrame({"a": edf.loc[edf["x"] < edf["y"], "x"],
                                "b": edf.loc[edf["x"] < edf["y"], "y"]})
        labels_small = cluster_from_pairs(
            touched, sorted(set(edf["x"].tolist())))
        label_map = dict(zip(labels_small["doc_id"],
                             labels_small["cluster"]))
        import ray as _ray
        ref = _ray.put(label_map)

        def assign(b: pa.Table) -> pa.Table:
            m = _ray.get(ref)
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            lab = np.array([m.get(int(x), int(x)) for x in d],
                           dtype=np.int64)
            return pa.table({"doc_id": pa.array(d, pa.int64()),
                             "cluster": pa.array(lab, pa.int64())})

        return ids.select_columns(["doc_id"]).map_batches(
            assign, batch_format="pyarrow")

    def init_labels(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array(d, pa.int64()),
                         "label": pa.array(d, pa.int64())})

    labels = ids.select_columns(["doc_id"]).map_batches(
        init_labels, batch_format="pyarrow")

    def prop_join(edges_df: pd.DataFrame, labels_df: pd.DataFrame
                  ) -> pd.DataFrame:
        m = edges_df.merge(labels_df, on="x", how="inner")
        return pd.DataFrame({"x": m["y"].astype("int64"),
                             "label": m["label"].astype("int64")})

    prev_sum = None
    for _ in range(max_iters):
        prop = cogroup(edges, labels, ["x"], prop_join,
                       num_buckets=num_buckets)
        labels = grouped_agg(labels.union(prop), ["x"],
                             {"label": ("label", "min")},
                             num_buckets=num_buckets)
        labels = labels.materialize()     # fixpoint check reuses blocks
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["x"], "cluster": b["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #

class SimHashStage:
    """map_batches UDF: 64-bit simhash over word features + 4×16-bit
    bands.

    Batch-vectorized: blake2b runs once per UNIQUE word in the batch
    (word-frequency is Zipfian, so uniques are a small fraction of
    tokens), the per-doc ±1 bit votes are one segment-sum
    (``np.add.reduceat``) over the whole batch's bit matrix, and the
    sign bits pack to uint64 with a single shift-sum — no per-doc
    Python loop. Byte-identical to the scalar ``simhash64`` (unit
    asserted)."""

    def __init__(self, text_col: str):
        self.text_col = text_col

    @staticmethod
    def simhash64(words: list[str]) -> int:
        """Scalar reference implementation (kept for tests)."""
        if not words:
            return 0
        hs = _hash64(words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        token_lists = [(t or "").lower().split()
                       for t in batch[self.text_col].to_pylist()]
        lens = np.array([len(ws) for ws in token_lists], dtype=np.int64)
        fps = np.zeros(len(token_lists), dtype=np.uint64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            all_words = [w for ws in token_lists for w in ws]
            uniq, inv = np.unique(np.array(all_words, dtype=object),
                                  return_inverse=True)
            hs = _hash64(list(uniq))[inv]
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int64)
            contrib = 2 * bits - 1
            starts = np.concatenate(
                [[0], np.cumsum(lens)[:-1]])[nonempty].astype(np.intp)
            v = np.add.reduceat(contrib, starts, axis=0)
            sign = (v > 0).astype(np.uint64)
            fps[nonempty] = (sign << np.arange(64, dtype=np.uint64)) \
                .sum(axis=1, dtype=np.uint64)
        cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(fps.view(np.int64), pa.int64()),
        }
        for bi in range(4):
            cols[f"band{bi}"] = pa.array(
                ((fps >> np.uint64(16 * bi))
                 & np.uint64(0xFFFF)).astype(np.int32), pa.int32())
        return pa.table(cols)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 64) \
             .sum(axis=1).astype(np.int64)


def _pairs_with_vals(bucket: pd.DataFrame, keys: list[str], val_col: str,
                     cap: int | None = MAX_BUCKET) -> pd.DataFrame:
    """Like ``_pairs_in_buckets`` but each emitted pair carries both
    docs' ``val_col`` values — lets per-doc state (e.g. a simhash
    fingerprint) ride the exchange instead of a driver broadcast."""
    frames = []
    n_truncated = 0
    for _, g in bucket.groupby(keys, sort=False):
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        over_g = None
        if cap is not None and len(g) > cap:
            n_truncated += 1
            over_g = g.iloc[cap:]
            g = g.head(cap)
        docs = g["doc_id"].to_numpy()
        vals = g[val_col].to_numpy()
        if len(g) >= 2:
            ai, bi = np.triu_indices(len(docs), k=1)
            frames.append(pd.DataFrame({
                "a": docs[ai], "b": docs[bi],
                f"{val_col}_a": vals[ai], f"{val_col}_b": vals[bi]}))
        if over_g is not None and len(docs):
            # anchor links for overflow docs (see _anchor_links) — the
            # values ride along so in-reduce verification still works
            m = len(over_g)
            idx = (np.arange(m, dtype=np.int64)[:, None]
                   * _OVERFLOW_ANCHORS
                   + np.arange(_OVERFLOW_ANCHORS, dtype=np.int64)) \
                % len(docs)
            frames.append(pd.DataFrame({
                "a": docs[idx.ravel()],
                "b": np.repeat(over_g["doc_id"].to_numpy(),
                               _OVERFLOW_ANCHORS),
                f"{val_col}_a": vals[idx.ravel()],
                f"{val_col}_b": np.repeat(over_g[val_col].to_numpy(),
                                          _OVERFLOW_ANCHORS)}))
    if n_truncated:
        import logging
        logging.getLogger("baram_ray.dedup").warning(
            "%d oversize bucket(s): clique capped at %d, overflow "
            "anchor-linked", n_truncated, cap)
    if not frames:
        return pd.DataFrame({
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            f"{val_col}_a": pd.Series([], dtype="int64"),
            f"{val_col}_b": pd.Series([], dtype="int64")})
    return pd.concat(frames, ignore_index=True)


def simhash_pairs(ds, text_col: str, max_hamming: int = 3,
                  num_buckets: int = 64):
    """Near-dup pairs: docs sharing any 16-bit band, verified hamming ≤ t.

    By pigeonhole, hamming ≤ 3 over 64 bits ⇒ at least one of 4 16-bit
    bands equal — band buckets are the complete candidate set.
    Fingerprints ride the band rows, so verification happens inside the
    pair-gen reduce task (vectorized XOR+popcount) and only verified
    pairs ever hit the second exchange — no driver-built fp map.
    """
    fps = ds.map_batches(SimHashStage(text_col), batch_format="pyarrow")

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        fp = batch["simhash"].to_numpy(zero_copy_only=False)
        out_d, out_bi, out_bv, out_fp = [], [], [], []
        for bi in range(4):
            out_d.append(doc)
            out_bi.append(np.full(n, bi, dtype=np.int32))
            out_bv.append(batch[f"band{bi}"].to_numpy(zero_copy_only=False))
            out_fp.append(fp)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "band_id": pa.array(np.concatenate(out_bi), pa.int32()),
            "band_val": pa.array(np.concatenate(out_bv), pa.int32()),
            "simhash": pa.array(np.concatenate(out_fp), pa.int64()),
        })

    def gen_and_verify(b: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_with_vals(b, ["band_id", "band_val"], "simhash")
        if not len(p):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        x = p["simhash_a"].to_numpy().astype(np.int64).view(np.uint64) \
            ^ p["simhash_b"].to_numpy().astype(np.int64).view(np.uint64)
        ham = _popcount64(x)
        keep = ham <= max_hamming
        return pd.DataFrame({
            "a": p["a"].to_numpy()[keep],
            "b": p["b"].to_numpy()[keep],
            "hamming": ham[keep]}).astype("int64")

    band_rows = fps.map_batches(explode_bands, batch_format="pyarrow")
    cand = grouped_map(band_rows, ["band_id", "band_val"], gen_and_verify,
                       num_buckets=num_buckets)
    # a pair can verify in several bands — groupby-min dedupes (identical h)
    return grouped_agg(cand, ["a", "b"], {"hamming": ("hamming", "min")},
                       num_buckets=num_buckets)


# --------------------------------------------------------------------- #
# n-gram Jaccard (SQL-checkable shape)
# --------------------------------------------------------------------- #

def ngram_jaccard_pairs(ds, text_col: str, *, n: int = 2,
                        threshold: float = 0.5, num_buckets: int = 64):
    """EXACT n-gram Jaccard pairs ≥ t via prefix filtering (PPJoin-style,
    Xiao et al., WWW'08) — scale-safe without losing exactness.

    Order grams globally by (df, gram); each doc emits only its
    ``|d| − ceil(t·|d|) + 1`` rarest grams as candidate keys (two docs
    with J ≥ t MUST share a prefix gram — completeness is a theorem, so
    the SQL oracle stays green), which removes the stop-gram N² blowup
    that an uncapped shared-gram join suffers. Verification hash-joins
    the candidate pairs back to per-doc gram-hash lists (``attach_by_key``
    cogroup per side) and computes exact |A∩B| — no driver-side size map.
    """
    def explode(batch: pa.Table) -> pa.Table:
        docs, grams = [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch[text_col].to_pylist()):
            hs = np.unique(_hash64(word_shingles(t, n))).view(np.int64)
            docs.append(np.full(len(hs), d, dtype=np.int64))
            grams.append(hs)
        return pa.table({
            "doc_id": pa.array(np.concatenate(docs) if docs
                               else np.empty(0, np.int64), pa.int64()),
            "gh": pa.array(np.concatenate(grams) if grams
                           else np.empty(0, np.int64), pa.int64())})

    gd = ds.map_batches(explode, batch_format="pyarrow")
    glists = doc_token_hashes(ds, text_col, n)          # (doc_id, sh, sz)

    # global gram rarity, joined back onto the (doc, gram) rows
    df = grouped_agg(gd, ["gh"], {"df": (None, "count")},
                     num_buckets=num_buckets)

    # ---- adaptive verify strategy ----------------------------------
    # Σ df·(df−1)/2 = the total pair-occurrence volume of a FULL
    # per-gram co-count. On small-gram-universe corpora (synthetic
    # word-list tables, short-code fields) nearly every doc pair is a
    # legitimate candidate, so the prefix-filter path's per-pair LIST
    # attachment spills candidates × gram-list bytes (the sf1 sweep
    # measured >70 GB); the co-count path computes the same exact
    # |A∩B| as a (a, b)-keyed COUNT over per-gram pair emissions —
    # 16 bytes a row, no lists. On zipf/real vocabularies a single
    # stop gram makes Σ df² explode and the prefix+positional path
    # wins. The df table is gram-bounded, so the decision is one tiny
    # distributed sum. Both paths are exact → oracle-identical.
    def pair_volume(b: pd.DataFrame) -> pd.DataFrame:
        d = b["df"].to_numpy(np.float64)
        return pd.DataFrame({"v": [float((d * (d - 1.0)).sum() / 2.0)]})

    vol = df.map_batches(pair_volume, batch_format="pandas").to_pandas()
    total_pair_occurrences = float(vol["v"].sum()) if "v" in vol else 0.0
    if total_pair_occurrences <= COCOUNT_MAX_PAIRS:
        sizes = glists.map_batches(
            lambda b: b.select(["doc_id", "sz"]), batch_format="pyarrow")
        occ = grouped_map(
            gd, ["gh"],
            lambda b: _pairs_in_buckets(b, ["gh"], cap=None),
            num_buckets=num_buckets)
        inter = grouped_agg(occ, ["a", "b"],
                            {"n_shared": (None, "count")},
                            num_buckets=num_buckets)
        j1 = attach_by_key(inter, sizes, "a", {"sz": "sz_a"},
                           num_buckets=num_buckets)
        j2 = attach_by_key(j1, sizes, "b", {"sz": "sz_b"},
                           num_buckets=num_buckets)

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            inter_n = b["n_shared"].to_numpy(np.int64)
            union = (b["sz_a"].to_numpy(np.int64)
                     + b["sz_b"].to_numpy(np.int64) - inter_n)
            ok = union > 0
            j = np.zeros(len(b))
            j[ok] = inter_n[ok] / union[ok]
            keep = ok & (j >= threshold)
            return pd.DataFrame({
                "a": b["a"].to_numpy(np.int64)[keep],
                "b": b["b"].to_numpy(np.int64)[keep],
                "jaccard": np.round(j[keep], 6)})

        return j2.map_batches(finish, batch_format="pandas")

    def df_join(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return l.merge(r, on="gh", how="inner")

    gdf = cogroup(gd, df, ["gh"], df_join, num_buckets=num_buckets)

    def prefix_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["doc_id", "df", "gh"], kind="stable")
        grp = b.groupby("doc_id", sort=False)
        sz = grp["gh"].transform("size").to_numpy()
        rank = grp.cumcount().to_numpy()
        plen = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        keep = rank < plen
        out = b.loc[keep, ["doc_id", "gh"]].copy()
        # rank within the GLOBAL (df, gh) gram order + doc gram count —
        # the positional-filter inputs (PPJoin, Xiao et al. §4.2)
        out["rank"] = rank[keep]
        out["sz"] = sz[keep]
        return out.reset_index(drop=True)

    prefix_rows = grouped_map(gdf, ["doc_id"], prefix_fn,
                              num_buckets=num_buckets)

    def ppjoin_pairs(b: pd.DataFrame) -> pd.DataFrame:
        """Per prefix-gram pair generation WITH the positional filter:
        for docs A, B sharing a prefix gram at ranks i, j (same global
        gram order both sides), |A∩B| ≤ min(i, j) + min(|A|−i, |B|−j)
        — before-parts share at most min(i, j) grams, after-parts at
        most the shorter remainder. J ≥ t needs |A∩B| ≥
        t(|A|+|B|)/(1+t), and the bound dominates the TRUE intersection
        at every occurrence, so every true pair survives (complete);
        the quadratic stop-prefix-gram pair volume does not (the sf1
        sweep found the unfiltered version spilling >70 GB)."""
        out_a, out_b = [], []
        for _, g in b.groupby("gh", sort=False):
            if len(g) < 2:
                continue
            o = np.argsort(g["doc_id"].to_numpy(), kind="stable")
            d = g["doc_id"].to_numpy(np.int64)[o]
            r = g["rank"].to_numpy(np.int64)[o]
            s = g["sz"].to_numpy(np.int64)[o]
            for i in range(len(d) - 1):
                bd, br, bs = d[i + 1:], r[i + 1:], s[i + 1:]
                ub = np.minimum(r[i], br) \
                    + np.minimum(s[i] - r[i], bs - br)
                # integer-safe: I(1+t) ≥ t(sa+sb), loosened by an eps
                # so float rounding can only keep extra candidates
                m = ub * (1.0 + threshold) \
                    >= threshold * (s[i] + bs) - 1e-9
                if m.any():
                    out_a.append(np.full(int(m.sum()), d[i],
                                         dtype=np.int64))
                    out_b.append(bd[m])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pair_rows = grouped_map(prefix_rows, ["gh"], ppjoin_pairs,
                            num_buckets=num_buckets)
    cand = grouped_agg(pair_rows, ["a", "b"], {"n_shared": (None, "count")},
                       num_buckets=num_buckets)

    j1 = attach_by_key(cand, glists, "a", {"sh": "sh_a", "sz": "sz_a"},
                       num_buckets=num_buckets)
    j2 = attach_by_key(j1, glists, "b", {"sh": "sh_b", "sz": "sz_b"},
                       num_buckets=num_buckets)
    return j2.map_batches(
        lambda b: _jaccard_of_attached(b, threshold), batch_format="pandas")


def fingerprint_candidates(ds, text_col: str, *, min_shared: int = 2,
                           k: int = 5, window: int = 4,
                           num_buckets: int = 32,
                           cap: int | None = 256):
    """MOSS-style near-dup candidates from winnowing fingerprints
    (Schleimer et al. 2003 — the plagiarism-detection recipe, the
    character-level complement to the word-shingle MinHash path): docs
    sharing ≥ ``min_shared`` selected fingerprints become a candidate
    pair. The winnowing guarantee carries over: any shared substring of
    ≥ window+k-1 chars shares at least one fingerprint.

    Scale shape: distinct (fingerprint, doc_id) rows through ONE
    bucketed exchange on the fingerprint — pair generation is
    in-bucket (same ``cap`` guard as the LSH band buckets: a
    fingerprint shared by half the corpus is a stop-gram, its bucket
    is truncated WITH a logged count); shared-count aggregation is the
    second exchange. Returns Dataset[(a, b, n_shared)].
    """
    import pandas as pd
    import pyarrow as pa

    from baram_ray.stages.text import FingerprintStage
    from baram_ray.util import grouped_agg, grouped_map

    stage = FingerprintStage(text_col, k=k, window=window)

    def fp_rows(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch[text_col].to_pylist()):
            for f in set(stage.fingerprints(t or "")):
                ids.append(d)
                fps.append(f)
        return pa.table({"fp": pa.array(fps, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow")

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_buckets(bucket, ["fp"], cap=cap)

    cand = grouped_map(rows, ["fp"], pairs, num_buckets=num_buckets)
    shared = grouped_agg(cand, ["a", "b"], {"n_shared": (None, "count")},
                         num_buckets=num_buckets)

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["n_shared"] >= min_shared].copy()
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    return shared.map_batches(threshold, batch_format="pandas")
