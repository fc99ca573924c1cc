"""Rotating bloom filter — the reference's memory-bounded streaming
dedup prefilter (``src/storage/dedup.rs:190-420``) with vectorized batch
operations for Ray Data stages.

The reference double-buffers two bloom generations: ``active`` accepts
inserts, ``previous`` is read-only; when active reaches
``rotation_threshold × capacity`` (or ``max_age`` with ≥1 item) it
rotates — previous is dropped, active becomes previous, a fresh filter
becomes active. Memory stays bounded forever; membership slowly forgets
(an item is remembered for at least one full generation after insert).
``check`` may return false positives, never false negatives for items
inside the two live generations.

Scale shape (SURVEY T3): per-shard ingest actors hold one
RotatingBloomFilter each over the doc-id keys they have already
accepted; a batch's "definitely new" rows (check=False) skip the exact
content-hash dedup exchange entirely, "maybe seen" rows (true hits +
the ~1% false positives) go through it — the bloom is an optimization
gate, the exact sha-256 dedup (``pipelines/documents.py``) remains the
authority, so false positives cost a lookup, never correctness.

Bits use the standard optimum m = -n·ln p/(ln 2)², k = (m/n)·ln 2; the
k probe positions come from double hashing (h1 + i·h2 mod m) over a
splitmix64-mixed key — pure numpy, vectorized over whole batches.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import numpy as np

_U64 = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mixing, vectorized."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return x ^ (x >> _U64(31))


def _key_hashes(keys) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key. int64/uint64 arrays take
    the vectorized path; anything else hashes str(key) via blake2b."""
    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        h1 = _mix64(arr.astype(_U64))
        h2 = _mix64(h1 ^ _U64(0xD6E8FEB86659FD93))
        return h1, h2 | _U64(1)
    import hashlib
    h1 = np.empty(len(arr), dtype=_U64)
    h2 = np.empty(len(arr), dtype=_U64)
    for i, k in enumerate(arr):
        d = hashlib.blake2b(str(k).encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    return h1, h2


class _Bloom:
    """One bloom generation: bit array + k double-hash probes."""

    def __init__(self, capacity: int, fp_rate: float):
        n = max(1, capacity)
        m = max(64, int(math.ceil(-n * math.log(fp_rate)
                                  / (math.log(2) ** 2))))
        self.m = m
        self.k = max(1, int(round(m / n * math.log(2))))
        self.bits = np.zeros((m + 63) // 64, dtype=_U64)

    def _positions(self, h1, h2, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((h1 + _U64(i) * h2) % _U64(self.m)).astype(_U64)

    def set_many(self, h1, h2) -> None:
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            np.bitwise_or.at(self.bits, (pos >> _U64(6)).astype(np.int64),
                             _U64(1) << (pos & _U64(63)))

    def check_many(self, h1, h2) -> np.ndarray:
        hit = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            word = self.bits[(pos >> _U64(6)).astype(np.int64)]
            hit &= (word >> (pos & _U64(63))) & _U64(1) != 0
            if not hit.any():
                break
        return hit

    def nbytes(self) -> int:
        return int(self.bits.nbytes)


@dataclass
class RotatingBloomConfig:
    """dedup.rs:197-221 defaults."""
    capacity_per_generation: int = 50_000
    false_positive_rate: float = 0.01
    rotation_threshold: float = 0.8
    max_age_secs: float = 3600.0


@dataclass
class RotatingBloomStats:
    """dedup.rs:375-410."""
    active_count: int
    capacity_per_generation: int
    has_previous: bool
    active_age_secs: float
    rotation_count: int
    rotation_threshold: float

    def fill_ratio(self) -> float:
        if self.capacity_per_generation == 0:
            return 0.0
        return self.active_count / self.capacity_per_generation

    def rotation_imminent(self) -> bool:
        return self.fill_ratio() >= self.rotation_threshold * 0.9


class RotatingBloomFilter:
    """dedup.rs:234-373; clock injectable for deterministic age tests."""

    def __init__(self, config: RotatingBloomConfig | None = None, *,
                 clock=None):
        self.config = config or RotatingBloomConfig()
        self._clock = clock or time.time
        self.active = _Bloom(self.config.capacity_per_generation,
                             self.config.false_positive_rate)
        self.previous: _Bloom | None = None
        self.active_count = 0
        self.active_created_at = self._clock()
        self.rotation_count = 0

    @classmethod
    def with_capacity(cls, capacity: int) -> "RotatingBloomFilter":
        return cls(RotatingBloomConfig(capacity_per_generation=capacity))

    # -- batch API (the Ray-stage hot path) ---------------------------- #
    def check_many(self, keys) -> np.ndarray:
        """Boolean 'maybe seen' mask; False = definitely new."""
        h1, h2 = _key_hashes(keys)
        hit = self.active.check_many(h1, h2)
        if self.previous is not None and not hit.all():
            miss = ~hit
            hit[miss] = self.previous.check_many(h1[miss], h2[miss])
        return hit

    def insert_many(self, keys) -> None:
        h1, h2 = _key_hashes(keys)
        self.active.set_many(h1, h2)
        self.active_count += len(h1)
        self._maybe_rotate()

    # -- scalar API (reference signature) ------------------------------ #
    def check(self, item) -> bool:
        return bool(self.check_many([item])[0])

    def insert(self, item) -> None:
        self.insert_many([item])

    # -- rotation (dedup.rs:310-355) ----------------------------------- #
    def _maybe_rotate(self) -> None:
        threshold = int(self.config.capacity_per_generation
                        * self.config.rotation_threshold)
        age = self._clock() - self.active_created_at
        if self.active_count >= threshold or (
                age >= self.config.max_age_secs and self.active_count > 0):
            self._rotate()

    def _rotate(self) -> None:
        self.previous = self.active
        self.active = _Bloom(self.config.capacity_per_generation,
                             self.config.false_positive_rate)
        self.active_count = 0
        self.active_created_at = self._clock()
        self.rotation_count += 1

    def force_rotate(self) -> None:
        self._rotate()

    def clear(self) -> None:
        self.active = _Bloom(self.config.capacity_per_generation,
                             self.config.false_positive_rate)
        self.previous = None
        self.active_count = 0
        self.active_created_at = self._clock()

    # -- introspection (dedup.rs:360-373, 625-640) --------------------- #
    def stats(self) -> RotatingBloomStats:
        return RotatingBloomStats(
            active_count=self.active_count,
            capacity_per_generation=self.config.capacity_per_generation,
            has_previous=self.previous is not None,
            active_age_secs=self._clock() - self.active_created_at,
            rotation_count=self.rotation_count,
            rotation_threshold=self.config.rotation_threshold)

    def is_memory_bounded(self) -> bool:
        return True

    def estimated_memory_bytes(self) -> int:
        total = self.active.nbytes()
        if self.previous is not None:
            total += self.previous.nbytes()
        return total


def bloom_prefilter(bloom_ref, key_col: str):
    """map_batches task UDF factory: flags each row's key against a
    broadcast RotatingBloomFilter built from already-ingested ids
    (``ray.put`` once; ``ray.get`` is cached per worker — a plain task,
    not an actor pool, per this repo's broadcast-lookup pattern). Adds a
    ``maybe_seen`` column; ``False`` rows may skip the exact-dedup
    exchange."""

    def flag(batch):
        import ray
        bloom = ray.get(bloom_ref)
        out = batch.copy()
        out["maybe_seen"] = bloom.check_many(batch[key_col].to_numpy())
        return out

    return flag
