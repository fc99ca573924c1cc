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
