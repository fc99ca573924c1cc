"""Mergeable distinct-count sketches — KMV (k minimum values,
Bar-Yossef et al. 2002): keep the k smallest hash values of the key
set; ``est = (k-1) · 2^32 / h_(k)`` when ≥ k distinct hashes exist,
exact count otherwise.

Why KMV here instead of HyperLogLog: with a FIXED deterministic hash
(the same Knuth multiplicative hash the sampling module uses,
``sampling.knuth_hash32``) the sketch — and therefore the estimate —
is a pure function of the input SET. That makes an approximate
operator *hash-exact SQL-oracle-checkable* (the DuckDB oracle ranks
the same hashes and applies the same formula), which HLL's
register-bucketing also allows but with far more SQL; and KMV merges
by trivial union + re-truncation.

At-scale shape: each ``map_batches`` task emits at most ``k`` rows per
(group, batch) — the exchange carries O(groups × blocks × k) rows, not
the corpus; the per-group reduce unions partials, truncates to k, and
applies the estimator. Hash collisions merge identical keys on BOTH
sides (sketch and oracle), keeping the comparison exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from baram_ray.sampling import knuth_hash32

DEFAULT_K = 64
_FULL = 4294967296.0


def kmv_partial(keys: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """k smallest DISTINCT hash values of a key batch (sorted)."""
    h = np.unique(knuth_hash32(keys))
    return h[:k]


def kmv_estimate(hashes: np.ndarray, k: int = DEFAULT_K) -> float:
    """Estimate from a merged, sorted, distinct hash array."""
    h = np.unique(hashes)
    if len(h) < k:
        return float(len(h))
    return (k - 1) * _FULL / float(h[k - 1])


def distinct_kmv(ds, key_fn, group_col: str, *, k: int = DEFAULT_K,
                 num_buckets: int = 4):
    """Approximate distinct ``key_fn(batch)`` values per ``group_col``.

    ``key_fn(batch) -> np.ndarray[int64]`` derives the integer key per
    row. Returns Dataset[(group, est_distinct)].
    """
    from baram_ray.util import grouped_map

    def partial(batch: pa.Table) -> pa.Table:
        keys = key_fn(batch)
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        gs, hs = [], []
        for g in pd.unique(groups):
            hk = kmv_partial(keys[groups == g], k)
            gs.extend([g] * len(hk))
            hs.extend(hk.tolist())
        return pa.table({group_col: pa.array(gs),
                         "h": pa.array(np.asarray(hs, dtype=np.int64),
                                       pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(group_col)["h"]
               .apply(lambda s: kmv_estimate(
                   s.to_numpy().astype(np.uint64), k))
               .rename("est_distinct").reset_index())
        return g

    return grouped_map(parts, [group_col], reduce,
                       num_buckets=num_buckets)

# ------------------------------------------------------------------ #
# Misra–Gries heavy hitters (Misra & Gries 1982; mergeable-summaries
# form from Agarwal et al. 2012): at most k counters; every estimate
# UNDERCOUNTS by at most the accumulated decrement ``dec``, and any
# key with true frequency > n/(k+1) is guaranteed to survive. When the
# distinct-key count never exceeds k (the SQL-oracle regime — the
# synthetic corpus vocabulary is tiny vs k=4096) no trim ever fires,
# dec stays 0 and every count is EXACT; at web scale the same operator
# degrades gracefully to the bounded-error sketch. Merge = counter sum
# + one trim, so it composes through any reduce tree.
# ------------------------------------------------------------------ #

MG_K = 4096


def mg_trim(terms: np.ndarray, counts: np.ndarray, k: int):
    """Trim to ≤ k counters: subtract the (k+1)-th largest count from
    all, keep strictly positive. Returns (terms, counts, dec) — dec is
    0 when no trim was needed. Value-based criterion → deterministic
    under any sort order of ties."""
    if len(terms) <= k:
        return terms, counts, 0
    d = int(np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1])
    keep = counts > d
    return terms[keep], counts[keep] - d, d


def mg_partial(keys: np.ndarray, k: int = MG_K):
    """Sketch one batch of raw key occurrences."""
    t, c = np.unique(keys, return_counts=True)
    return mg_trim(t, c.astype(np.int64), k)


def mg_merge(terms: np.ndarray, counts: np.ndarray, decs_in: int,
             k: int = MG_K):
    """Merge concatenated counter rows from several sketches (terms may
    repeat across inputs): sum per key, trim once. ``decs_in`` is the
    sum of the input sketches' decrements; the returned dec includes
    it, so the error bound composes along the reduce tree."""
    s = pd.Series(counts).groupby(pd.Series(terms), sort=False).sum()
    t2 = s.index.to_numpy()
    c2 = s.to_numpy().astype(np.int64)
    t3, c3, d = mg_trim(t2, c2, k)
    return t3, c3, int(decs_in) + int(d)


def heavy_hitters(ds, key_fn, *, k: int = MG_K, topn: int = 20,
                  num_buckets: int = 8):
    """Top-``topn`` most frequent ``key_fn(batch)`` values with
    Misra–Gries estimates and a global undercount bound.

    At-scale shape: each map task emits ≤ k counter rows plus one
    decrement row (key NULL) tagged by a deterministic partial id; the
    exchange carries O(blocks × k) sketch rows, never the corpus; the
    per-tag reduce is one MG merge; the driver merges only the ≤
    ``num_buckets`` bucket sketches (sketch-sized, not corpus-sized).
    Returns a pandas DataFrame (key, est_count, err_bound) sorted by
    est desc / key asc — in the no-trim regime est_count is exact and
    err_bound is 0.
    """
    from baram_ray.util import grouped_map

    def partial(batch: pa.Table) -> pa.Table:
        keys = key_fn(batch)
        t, c, d = mg_partial(keys, k)
        # stable tag (Python str hash is per-process randomized): any
        # spread works — merge is order/partition-insensitive — but a
        # deterministic one keeps reruns byte-identical
        import zlib
        sig = f"{t[0]}|{t[-1]}|{len(t)}|{int(c.sum())}" if len(t) else ""
        tag = zlib.crc32(sig.encode()) % num_buckets
        terms = list(t.astype(str)) + [None]
        cnts = list(c.astype(np.int64)) + [int(d)]
        return pa.table({
            "tag": pa.array([tag] * len(terms), pa.int64()),
            "key": pa.array(terms, pa.string()),
            "cnt": pa.array(np.asarray(cnts, np.int64), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        decs = int(df.loc[df["key"].isna(), "cnt"].sum())
        live = df[df["key"].notna()]
        t, c, d = mg_merge(live["key"].to_numpy(),
                           live["cnt"].to_numpy(np.int64), decs, k)
        # pandas "string" dtype keeps the Arrow type `string` even when a
        # bucket's only row is the None decrement (object → type `null`)
        out = pd.DataFrame({
            "tag": np.zeros(len(t) + 1, np.int64),
            "key": pd.array(list(t.astype(str)) + [None], dtype="string"),
            "cnt": np.append(c.astype(np.int64), np.int64(d)),
        })
        out["cnt"] = out["cnt"].astype("int64")
        return out

    merged = grouped_map(parts, ["tag"], reduce,
                         num_buckets=num_buckets).to_pandas()
    decs = int(merged.loc[merged["key"].isna(), "cnt"].sum())
    live = merged[merged["key"].notna()]
    t, c, d = mg_merge(live["key"].to_numpy(),
                       live["cnt"].to_numpy(np.int64), decs, k)
    out = pd.DataFrame({"key": t, "est_count": c})
    out["err_bound"] = np.int64(d)
    out = out.sort_values(["est_count", "key"],
                          ascending=[False, True], kind="stable")
    return out.head(topn).reset_index(drop=True)


# ------------------------------------------------------------------ #
# KLL-style mergeable quantile sketch (Karnin-Lang-Liberty 2016, the
# deterministic even/odd-compaction variant): levels of sorted arrays,
# level i items weigh 2^i; a level over capacity k sorts, promotes
# every second PAIRED item and leaves an odd leftover in place. Total
# weight is preserved exactly, so the sketch's weighted rank of any
# value drifts from the true rank by at most one item per compaction
# per level — O((n/k)·log(n/k)) worst case, property-tested. When the
# total item count never exceeds k (the SQL-oracle regime) no
# compaction fires and every quantile is EXACT. Merge = level-wise
# concat + one compaction pass, so it composes through any reduce
# tree (same exact-regime-oracle pattern as the MG sketch).
# ------------------------------------------------------------------ #

QK = 4096


def _kll_compact(levels: dict, k: int) -> dict:
    lvl = 0
    top = max(levels.keys(), default=0)
    while lvl <= top:
        arr = levels.get(lvl)
        if arr is None or len(arr) <= k:
            lvl += 1
            continue
        arr = np.sort(arr)
        m = len(arr) - (len(arr) % 2)
        promote = arr[1:m:2]            # every second paired item
        leftover = arr[m:]              # odd straggler stays put
        if len(leftover):
            levels[lvl] = leftover
        else:
            levels.pop(lvl)
        levels[lvl + 1] = np.concatenate(
            [levels.get(lvl + 1, np.empty(0, np.float64)), promote])
        top = max(top, lvl + 1)
        lvl += 1
    return levels


def kll_partial(vals: np.ndarray, k: int = QK) -> dict:
    """Sketch one batch of raw float values: {level: sorted array}."""
    return _kll_compact(
        {0: np.sort(np.asarray(vals, np.float64))}, k)


def kll_merge(sketches: list[dict], k: int = QK) -> dict:
    """Merge sketches level-wise, then one compaction pass."""
    out: dict = {}
    for sk in sketches:
        for lvl, arr in sk.items():
            out[lvl] = np.concatenate(
                [out.get(lvl, np.empty(0, np.float64)), arr])
    return _kll_compact(out, k)


def kll_total_weight(levels: dict) -> int:
    """Exactly the item count fed in (compaction preserves weight)."""
    return int(sum(len(a) * (1 << lvl) for lvl, a in levels.items()))


def kll_quantile(levels: dict, q: float) -> float:
    """Discrete quantile, DuckDB ``quantile_disc`` convention: the
    smallest value whose cumulative weight ≥ ceil(q·W)."""
    vals = np.concatenate([a for a in levels.values()])
    ws = np.concatenate([np.full(len(a), 1 << lvl, np.int64)
                         for lvl, a in levels.items()])
    order = np.argsort(vals, kind="stable")
    cum = np.cumsum(ws[order])
    w = int(cum[-1])
    r = max(1, int(np.ceil(q * w)))
    i = int(np.searchsorted(cum, r))
    return float(vals[order[min(i, len(order) - 1)]])


# --------------------- CountMin frequency sketch --------------------- #
# Cormode & Muthukrishnan 2005: d hash rows × w counters; per-key
# estimate = min over rows of its counter (one-sided: est ≥ true,
# overestimate ≤ εN w.h.p. with ε = e/w). Deterministic multiply-shift
# hashing (Dietzfelbinger et al. 1997) with FIXED odd multipliers, so
# the counters — and the estimates — are a pure function of the input
# multiset: a DuckDB oracle rebuilds the identical table in HUGEINT
# arithmetic and the comparison is hash-exact (same trick as KMV).
# Partials are (row, bucket, count) cells, ≤ d·w per batch; merge is
# a grouped sum — the mergeable-sketch shape.

CMS_W = 1024        # counters per row (power of two)
CMS_SHIFT = 54      # 64 - log2(CMS_W)
CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)   # odd 64-bit


def cms_buckets(keys: np.ndarray) -> np.ndarray:
    """(d, n) bucket index per hash row — multiply-shift over uint64."""
    k = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    return np.stack([((k * np.uint64(a)) >> np.uint64(CMS_SHIFT))
                     .astype(np.int64) for a in CMS_SEEDS])


def cms_partial(keys: np.ndarray) -> np.ndarray:
    """(d, w) int64 counter matrix for one batch of keys."""
    bkt = cms_buckets(keys)
    return np.stack([np.bincount(bkt[i], minlength=CMS_W)
                     for i in range(len(CMS_SEEDS))]).astype(np.int64)


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros((len(CMS_SEEDS), CMS_W), dtype=np.int64)
    for p in parts:
        out += p
    return out


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Per-key estimated count: min over hash rows of the counter."""
    bkt = cms_buckets(keys)
    ests = np.stack([cms[i, bkt[i]] for i in range(len(CMS_SEEDS))])
    return ests.min(axis=0).astype(np.int64)


# ------------------------------------------------------------------ #
# HyperLogLog (Flajolet et al. 2007, with the HLL++ linear-counting
# small-range correction from Heule et al. 2013) — the register
# sketch behind OpenSearch's ``cardinality`` aggregation (the engine's
# default stays EXACT; HLL is the opt-in web-scale path via
# ``precision_threshold``). 2^p one-byte registers (p=12 → 4 KiB,
# ~1.04/√m ≈ 1.6% rel. error) make the per-group state constant-size:
# at 100 TB a cardinality-by-group carries groups × 4 KiB through the
# exchange instead of groups × distinct-values. Merge = elementwise
# register max, so the sketch composes through any reduce tree and a
# sharded merge is BIT-IDENTICAL to a single pass (same fixed blake2b
# hash — no seed, no PYTHONHASHSEED dependence).
# ------------------------------------------------------------------ #

HLL_P = 12
_HLL_M = 1 << HLL_P


def _hll_hash64(values: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash per DISTINCT value: blake2b over the UTF-8
    of ``str(v)`` (ints and strings canonicalize identically on every
    worker). Hashing unique values only keeps the Python loop off the
    row count."""
    import hashlib
    u = pd.unique(np.asarray(values))
    out = np.empty(len(u), dtype=np.uint64)
    for i, v in enumerate(u):
        out[i] = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
            "big")
    return out


def hll_partial(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """2^p uint8 registers for one batch of values. The low 64-p bits
    fit float64 exactly for p ≥ 12, so the frexp-based bit-length is
    deterministic."""
    if p < 12 or p > 16:
        raise ValueError("HLL p must be in [12, 16] (register math "
                         "relies on 64-p <= 52 float-exact bits)")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hll_hash64(values)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of the (64-p)-bit suffix + 1
    #     = (64 - p) - bit_length(w) + 1; bit_length via frexp exponent
    _, exp = np.frexp(w.astype(np.float64))
    rho = ((64 - p) - exp + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise register max — order-independent, idempotent."""
    out = np.zeros(_HLL_M if not parts else len(parts[0]),
                   dtype=np.uint8)
    for pr in parts:
        np.maximum(out, pr, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the linear-counting small-range
    correction (E ≤ 2.5m with empty registers); no large-range
    correction is needed with a 64-bit hash."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(
        np.float64))))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v > 0:
            e = m * np.log(m / v)
    return float(e)


def distinct_hll(ds, key_fn, group_col: str, *, p: int = HLL_P,
                 num_buckets: int = 4):
    """Approximate distinct ``key_fn(batch)`` values per ``group_col``
    via mergeable HLL registers: each map task emits ONE
    (group, 2^p-byte register blob) row per (group, batch); the
    per-group reduce maxes the registers and applies the estimator.
    Returns Dataset[(group, est_distinct)]."""
    from baram_ray.util import grouped_map

    def partial(batch: pa.Table) -> pa.Table:
        keys = key_fn(batch)
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        gs, blobs = [], []
        for g in pd.unique(groups):
            gs.append(g)
            blobs.append(hll_partial(keys[groups == g], p).tobytes())
        return pa.table({group_col: pa.array(gs),
                         "regs": pa.array(blobs, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        def est(s: pd.Series) -> float:
            merged = hll_merge([np.frombuffer(b, dtype=np.uint8)
                                for b in s])
            return hll_estimate(merged)
        return (df.groupby(group_col)["regs"].apply(est)
                  .rename("est_distinct").reset_index())

    return grouped_map(parts, [group_col], reduce,
                       num_buckets=num_buckets)
