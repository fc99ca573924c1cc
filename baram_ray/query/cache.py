"""Query result cache (A5) — the reference's Redis-backed search cache
(``src/cache/mod.rs:30-58``: per-kind TTLs — search 300 s, embedding
24 h, metadata 1 h — prefixed keys, hit/miss stats, invalidation).

In a resident Ray query actor the cache is in-process: an LRU with TTL
per entry kind, one instance per QueryEngine/QueryActor. The index is
immutable per build, so invalidation only matters across rebuilds —
``invalidate()`` mirrors ``invalidate_search_cache``.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict


class TTLCache:
    """LRU + TTL cache with the reference's hit/miss stats surface."""

    def __init__(self, max_entries: int = 4096, ttl_s: float = 300.0,
                 clock=time.monotonic):
        self.max_entries = max_entries
        self.ttl_s = ttl_s
        self._d: "OrderedDict[str, tuple[float, object]]" = OrderedDict()
        self._clock = clock
        self.hits = 0
        self.misses = 0

    def get(self, key: str):
        now = self._clock()
        item = self._d.get(key)
        if item is None or item[0] < now:
            if item is not None:
                del self._d[key]
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return item[1]

    def put(self, key: str, value) -> None:
        if key in self._d:
            del self._d[key]
        elif len(self._d) >= self.max_entries:
            self._d.popitem(last=False)
        self._d[key] = (self._clock() + self.ttl_s, value)

    def invalidate(self) -> int:
        n = len(self._d)
        self._d.clear()
        return n

    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


def search_key(prefix: str, query: str, k: int, **kw) -> str:
    """'{prefix}:search:{hash}' (reference search_key + query hashing,
    cache/mod.rs:206-224)."""
    payload = repr((query, k, sorted(kw.items())))
    h = hashlib.blake2b(payload.encode(), digest_size=16).hexdigest()
    return f"{prefix}:search:{h}"


class CachingQueryEngine:
    """QueryEngine wrapper with the reference's search-cache semantics
    (TTL 300 s default). Drop-in: same ``search`` signature."""

    def __init__(self, engine, *, max_entries: int = 4096,
                 ttl_s: float = 300.0, key_prefix: str = "baram",
                 clock=time.monotonic):
        self.engine = engine
        self.cache = TTLCache(max_entries, ttl_s, clock)
        self.prefix = key_prefix

    def search(self, query: str, k: int = 10, **kw):
        key = search_key(self.prefix, query, k, **{
            kk: (tuple(sorted(v.items())) if isinstance(v, dict) else v)
            for kk, v in kw.items()})
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        res = self.engine.search(query, k=k, **kw)
        self.cache.put(key, res)
        return res

    def invalidate(self) -> int:
        return self.cache.invalidate()
