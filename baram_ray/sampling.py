"""Deterministic sampling / splitting / sequence packing — the data-
mixing operators a large-scale training pipeline runs in front of the
engine's dedup + quality stages.

Everything is a pure function of the row KEY (no RNG state, no driver
coordination): the sampling hash is the Knuth multiplicative hash over
the key's low 32 bits, ``h(k) = ((k mod 2^32) · 2654435761) mod 2^32``
— exact in both numpy (uint64 intermediate, no overflow) and ANSI SQL
(HUGEINT intermediate), so every sampling/split decision is bit-
reproducible across engines and SQL-oracle-checkable, and any worker
can re-derive any row's assignment independently (the property that
matters at 10^12 rows: resharding or re-running never re-rolls the
sample).

``pack_sequences`` is the greedy context-window packer (first-fit over
a token budget) used to build LLM training batches: packing is local to
each input block — bins never span blocks, so the operator streams with
zero shuffle and bin ids stay stable under re-execution (bin id =
(first doc_id in bin, block-local index)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def knuth_hash32(keys: np.ndarray) -> np.ndarray:
    """((k mod 2^32) · 2654435761) mod 2^32, vectorized uint64 — the
    product of two 32-bit values never overflows 64 bits, so numpy and
    SQL HUGEINT agree bit-for-bit."""
    k = keys.astype(np.uint64) & _M32
    return (k * _KNUTH) & _M32


def knuth_hash32_sql(col: str) -> str:
    """The same hash as a DuckDB/ANSI expression (HUGEINT arithmetic)."""
    return (f"(( ({col} % 4294967296) * 2654435761::HUGEINT )"
            f" % 4294967296)")


def hash_sample(ds, rate: float, *, key_col: str = "doc_id"):
    """Deterministic ``rate`` sample: keep rows with
    ``h(key) < rate · 2^32``. Same row set on every run/shard layout."""
    threshold = np.uint64(int(rate * 4294967296))

    def keep(batch: pa.Table) -> pa.Table:
        h = knuth_hash32(batch[key_col].to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, fractions: dict[str, float], *,
               key_col: str = "doc_id"):
    """Deterministic train/val/test split: ``fractions`` maps split name
    → fraction (must sum to ~1). Row goes to the split whose cumulative
    hash range contains ``h(key)``; adds a ``split`` column."""
    names = list(fractions)
    cuts = np.cumsum([fractions[n] for n in names])
    assert abs(cuts[-1] - 1.0) < 1e-9, "fractions must sum to 1"
    bounds = (cuts * 4294967296).astype(np.uint64)

    def assign(batch: pa.Table) -> pa.Table:
        h = knuth_hash32(batch[key_col].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(bounds, h, side="right")
        idx = np.minimum(idx, len(names) - 1)
        split = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_mix(ds, weights: dict[str, float], *,
                 source_col: str = "source", key_col: str = "doc_id"):
    """Deterministic source re-weighting (training-mixture control):
    keep each source's rows with probability ``weights[source]``
    (unlisted sources drop; weight ≥ 1 keeps all rows of that source).
    Pure function of (source, key) — stable under resharding."""
    thresholds = {s: np.uint64(int(min(w, 1.0) * 4294967296))
                  for s, w in weights.items()}

    def keep(batch: pa.Table) -> pa.Table:
        src = batch[source_col].to_numpy(zero_copy_only=False)
        h = knuth_hash32(batch[key_col].to_numpy(zero_copy_only=False))
        thr = np.array([thresholds.get(s, np.uint64(0)) for s in src],
                       dtype=np.uint64)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_shuffle(ds, seed: int = 0, *, key_col: str = "doc_id"):
    """Deterministic global training-order shuffle: every row gets
    ``shuffle_key = h(key XOR seed)`` and the dataset is sorted by
    ``(shuffle_key, key)``. Reproducible across runs/shard layouts (the
    property ``ds.random_shuffle`` does NOT have), and changing ``seed``
    gives an uncorrelated order. The sort is Ray Data's native
    range-partitioned distributed sort — the one all-to-all exchange
    this operator fundamentally requires; at 100 TB prefer epoch-local
    shuffles (sort within partition ranges) if a full global order is
    not needed."""
    seed64 = np.uint64(seed)

    def add_key(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = knuth_hash32(np.bitwise_xor(k, seed64))
        return batch.append_column(
            "shuffle_key", pa.array(h.astype(np.int64), pa.int64()))

    return (ds.map_batches(add_key, batch_format="pyarrow")
              .sort(["shuffle_key", key_col]))


def pack_sequences(ds, max_tokens: int, *, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens"):
    """Greedy first-fit sequence packing per block: walk the block's
    rows in order, open a new bin when the current one would exceed
    ``max_tokens``. A document longer than ``max_tokens`` gets a bin of
    its own (truncation is the trainer's policy, not the packer's).

    Output rows: (doc_id, bin_id, n_tokens, bin_tokens) — ``bin_id`` is
    the first doc_id in the bin: every doc belongs to exactly one bin,
    so first-doc ids are unique bin identifiers across all blocks with
    no coordination.
    """

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        toks = df[tokens_col].to_numpy()
        bin_first = np.empty(len(df), dtype=np.int64)
        cur_sum, cur_first = None, 0
        for i, t in enumerate(toks):
            if cur_sum is None or cur_sum + t > max_tokens:
                cur_sum = 0
                cur_first = ids[i]
            cur_sum += t
            bin_first[i] = cur_first
        out = pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "bin_id": pd.Series(bin_first, dtype="int64"),
            "n_tokens": pd.Series(toks, dtype="int64"),
        })
        out["bin_tokens"] = out.groupby("bin_id")["n_tokens"] \
                               .transform("sum").astype("int64")
        return out

    return ds.map_batches(pack, batch_format="pandas")


def hash_sample_stratified(ds, rates: dict, default_rate: float, *,
                           stratum_col: str, key_col: str = "doc_id"):
    """Deterministic STRATIFIED sample: per-stratum keep rates (e.g.
    downsample a dominant language, keep all of a rare one), decided by
    the same Knuth key hash — resharding or re-running never re-rolls,
    and a stratum's sample nests inside any higher rate for it. The
    rate table is tiny and rides in the task closure."""
    thresholds = {s: np.uint64(int(r * 4294967296))
                  for s, r in rates.items()}
    default_t = np.uint64(int(default_rate * 4294967296))

    def keep(batch: pa.Table) -> pa.Table:
        h = knuth_hash32(batch[key_col].to_numpy(zero_copy_only=False))
        strata = batch[stratum_col].to_pylist()
        t = np.fromiter((thresholds.get(s, default_t) for s in strata),
                        dtype=np.uint64, count=len(strata))
        return batch.filter(pa.array(h < t))

    return ds.map_batches(keep, batch_format="pyarrow")
