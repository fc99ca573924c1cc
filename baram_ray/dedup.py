"""Deduplication suite — exact + near-dup, Ray-Data-first.

The reference only has exact dedup (3-tier bloom/hashset/Postgres,
``src/storage/dedup.rs:856-1065`` — replaced here by one shuffle, SURVEY.md
D1/D2); the near-dup family (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine) is the large-scale training-data extension.

Scale shapes (ray_guide "Aggregation at scale"):

- exact:   hash column in ``map_batches`` → ``groupby(hash).min(doc_id)``.
- minhash: per-batch shingle→minhash (vectorized) → explode to
  ``(band_id, band_hash, doc_id)`` rows → ``groupby(band)`` → candidate
  pairs per bucket → verify Jaccard → min-label cluster assignment.
  Bucket fan-out is bounded: a bucket of b docs emits b·(b−1)/2 pairs, so
  buckets are capped (``MAX_BUCKET``) and oversize buckets are truncated
  to the cap with a logged count — at 100 TB an uncapped hot bucket is a
  job-killer.
- simhash: 64-bit fingerprint per doc; near-dups = equal 16-bit bands →
  candidate pairs → verify hamming ≤ t. Same bucket-groupby shape.
- n-gram Jaccard: explode (gram, doc) → inverted-index-style pair
  generation on shared grams with combiner counts → exact Jaccard from
  set sizes (SQL-checkable).
- embedding cosine: see baram_ray.similarity (shared matmul kernel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from baram_ray.util import grouped_agg, grouped_map

MAX_BUCKET = 256          # cap pair fan-out per LSH/band bucket
_MERSENNE = (1 << 61) - 1


def _pairs_in_buckets(bucket: pd.DataFrame, keys: list[str],
                      extra_ones: str | None = None,
                      cap: int | None = MAX_BUCKET) -> pd.DataFrame:
    """All candidate pairs within each ``keys`` group of one hash bucket
    (vectorized pandas groupby; per-group fan-out capped at ``cap`` —
    pass ``cap=None`` only for exact operators whose oracle has no cap).
    Truncated buckets are counted and logged so recall loss from the cap
    is observable at scale (the documented contract)."""
    out_a, out_b = [], []
    n_truncated = 0
    for _, g in bucket.groupby(keys, sort=False):
        docs = np.unique(g["doc_id"].to_numpy())
        if cap is not None and len(docs) > cap:
            n_truncated += 1
            docs = docs[:cap]
        if len(docs) < 2:
            continue
        ai, bi = np.triu_indices(len(docs), k=1)
        out_a.append(docs[ai]); out_b.append(docs[bi])
    if n_truncated:
        import logging
        logging.getLogger("baram_ray.dedup").warning(
            "%d oversize bucket(s) truncated to cap=%d — candidate pairs "
            "(and near-dup recall) lost in this reduce task", n_truncated, cap)
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
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.int64)
        x = shingle_hashes.astype(object)[:, None]           # (s, 1) python ints
        vals = (x * self.a + self.b) % _MERSENNE             # exact, no overflow
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
        b_ids, b_hashes, b_docs = [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.mh.signature(_hash64(word_shingles(t, self.shingle_n)))
            for bi in range(self.bands):
                seg = sig[bi * self.rows_per_band: (bi + 1) * self.rows_per_band]
                h = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(),
                    "big") >> 1
                b_ids.append(bi)
                b_hashes.append(h)
                b_docs.append(d)
        return pa.table({
            "band_id": pa.array(b_ids, pa.int32()),
            "band_hash": pa.array(b_hashes, pa.int64()),
            "doc_id": pa.array(b_docs, pa.int64()),
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


def _verify_jaccard(batch: pd.DataFrame, sets: dict,
                    threshold: float) -> pd.DataFrame:
    """Candidate verification vs the broadcast doc_id → shingle-set map
    (``ray.get`` of the map is cached per worker process; at cluster scale
    candidates would be verified per doc-id-range partition with only that
    range's shingles resident)."""
    out_a, out_b, out_j = [], [], []
    for a, b in zip(batch["a"], batch["b"]):
        sa, sb = sets.get(int(a)), sets.get(int(b))
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(round(j, 6))
    return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                         "b": pd.Series(out_b, dtype="int64"),
                         "jaccard": pd.Series(out_j, dtype="float64")})


def minhash_dedup(ds, text_col: str, *, threshold: float = 0.8,
                  num_perm: int = 128, bands: int = 32, shingle_n: int = 3):
    """Full near-dup pipeline → verified pairs (a, b, jaccard).

    Cluster assignment from pairs is ``cluster_from_pairs``.
    """
    import ray
    cand = minhash_candidates(ds, text_col, num_perm=num_perm, bands=bands,
                              shingle_n=shingle_n)
    shingles = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch[text_col].to_pylist()):
            shingles[int(d)] = set(word_shingles(t, shingle_n))
    ref = ray.put(shingles)
    return cand.map_batches(
        lambda b: _verify_jaccard(b, ray.get(ref), threshold),
        batch_format="pandas")


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


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #

class SimHashStage:
    """map_batches UDF: 64-bit simhash over word features + 4×16-bit bands."""

    def __init__(self, text_col: str):
        self.text_col = text_col

    @staticmethod
    def simhash64(words: list[str]) -> int:
        if not words:
            return 0
        hs = _hash64(words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        fps = [self.simhash64((t or "").lower().split())
               for t in batch[self.text_col].to_pylist()]
        cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array([f - (1 << 64 if f >= (1 << 63) else 0)
                                 for f in fps], pa.int64()),
        }
        for bi in range(4):
            cols[f"band{bi}"] = pa.array(
                [(f >> (16 * bi)) & 0xFFFF for f in fps], pa.int32())
        return pa.table(cols)


def simhash_pairs(ds, text_col: str, max_hamming: int = 3):
    """Near-dup pairs: docs sharing any 16-bit band, verified hamming ≤ t.

    By pigeonhole, hamming ≤ 3 over 64 bits ⇒ at least one of 4 16-bit
    bands equal — band buckets are the complete candidate set.
    """
    import ray
    fps = ds.map_batches(SimHashStage(text_col), batch_format="pyarrow")
    fp_map = {}
    for b in fps.iter_batches(batch_format="pyarrow", batch_size=8192):
        for d, f in zip(b["doc_id"].to_pylist(), b["simhash"].to_pylist()):
            fp_map[int(d)] = int(f) & ((1 << 64) - 1)
    ref = ray.put(fp_map)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out_a, out_b, out_h = [], [], []
        for a, b_ in zip(batch["a"], batch["b"]):
            h = bin(m[int(a)] ^ m[int(b_)]).count("1")
            if h <= max_hamming:
                out_a.append(int(a)); out_b.append(int(b_)); out_h.append(h)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "hamming": pd.Series(out_h, dtype="int64")})

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_d, out_bi, out_bv = [], [], []
        for bi in range(4):
            out_d.append(doc)
            out_bi.append(np.full(n, bi, dtype=np.int32))
            out_bv.append(batch[f"band{bi}"].to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "band_id": pa.array(np.concatenate(out_bi), pa.int32()),
            "band_val": pa.array(np.concatenate(out_bv), pa.int32()),
        })

    band_rows = fps.map_batches(explode_bands, batch_format="pyarrow")
    cand = grouped_map(
        band_rows, ["band_id", "band_val"],
        lambda b: _pairs_in_buckets(b, ["band_id", "band_val"]),
        num_buckets=64)
    cand = grouped_agg(cand, ["a", "b"], {"n_bands": (None, "count")},
                       num_buckets=64)
    return cand.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------- #
# n-gram Jaccard (SQL-checkable shape)
# --------------------------------------------------------------------- #

def ngram_jaccard_pairs(ds, text_col: str, *, n: int = 2,
                        threshold: float = 0.5):
    """Exact n-gram Jaccard via shared-gram pair generation.

    (gram, doc) explode → per-gram buckets → pair counts = |A∩B| →
    join sizes → J = inter / (|A| + |B| − inter). Deterministic integers →
    division identical in any engine (SQL oracle in pipelines.oracles).
    """
    def explode(batch: pa.Table) -> pa.Table:
        docs, grams = [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch[text_col].to_pylist()):
            for g in set(word_shingles(t, n)):
                docs.append(d); grams.append(g)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "gram": pa.array(grams, pa.string())})

    gd = ds.map_batches(explode, batch_format="pyarrow")
    sizes = grouped_agg(gd, ["doc_id"], {"sz": (None, "count")},
                        num_buckets=16).to_pandas()
    size_map = dict(zip(sizes["doc_id"], sizes["sz"]))

    import ray
    ref = ray.put(size_map)
    pair_rows = grouped_map(
        gd, ["gram"],
        lambda b: _pairs_in_buckets(b, ["gram"], extra_ones="inter_partial",
                                    cap=None),
        num_buckets=64)
    inter = grouped_agg(pair_rows, ["a", "b"],
                        {"inter": ("inter_partial", "sum")}, num_buckets=64)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        a = batch["a"].astype("int64")
        b = batch["b"].astype("int64")
        inter_ = batch["inter"].astype("int64")
        union = (a.map(sm) + b.map(sm) - inter_).astype("int64")
        j = inter_ / union
        keep = j >= threshold          # threshold on the RAW ratio (identical
        # int division in any engine), round only for output
        out = pd.DataFrame({"a": a[keep], "b": b[keep],
                            "jaccard": j[keep].round(6)})
        return out.reset_index(drop=True)

    return inter.map_batches(finish, batch_format="pandas")
