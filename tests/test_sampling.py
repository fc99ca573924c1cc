"""Deterministic sampling / splitting / packing (baram_ray/sampling.py):
hash determinism, split exclusivity, packing invariants."""

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray.sampling import (hash_sample, hash_split, knuth_hash32,
                                pack_sequences, weighted_mix)

SF = "/root/testdata/sf0.001"


def test_knuth_hash_reference_values():
    # exact values any engine must reproduce (HUGEINT-checkable)
    ids = np.array([0, 1, 2, 4294967296 + 1, 10**12], dtype=np.int64)
    h = knuth_hash32(ids)
    assert h[0] == 0
    assert h[1] == 2654435761
    assert h[2] == (2 * 2654435761) % 4294967296
    assert h[3] == h[1]                      # only low 32 bits matter
    assert (h < 4294967296).all()


def test_sample_deterministic_and_proportional(ray_session):
    ds = ray.data.range(20_000).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    a = hash_sample(ds, 0.25).to_pandas()
    b = hash_sample(ds, 0.25).to_pandas()
    # deterministic row SET (block arrival order is not guaranteed)
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0.22 < len(a) / 20_000 < 0.28                  # ~rate
    # nested property: a 10% sample is a subset of the 25% sample
    small = set(hash_sample(ds, 0.10).to_pandas()["doc_id"])
    assert small <= set(a["doc_id"])


def test_split_partition_and_exclusivity(ray_session):
    ds = ray.data.range(10_000).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    out = hash_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    assert len(out) == 10_000                  # every row exactly once
    frac = out["split"].value_counts(normalize=True)
    assert 0.77 < frac["train"] < 0.83
    assert 0.07 < frac["val"] < 0.13
    # re-run assigns identically
    out2 = hash_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    pd.testing.assert_series_equal(out.sort_values("doc_id")["split"]
                                   .reset_index(drop=True),
                                   out2.sort_values("doc_id")["split"]
                                   .reset_index(drop=True))


def test_weighted_mix_semantics(ray_session):
    import pyarrow as pa
    rows = pd.DataFrame({
        "doc_id": np.arange(6000, dtype=np.int64),
        "source": np.tile(["src0", "src1", "dropme"], 2000)})
    ds = ray.data.from_pandas(rows)
    out = weighted_mix(ds, {"src0": 1.0, "src1": 0.5}).to_pandas()
    by = out["source"].value_counts()
    assert by.get("src0", 0) == 2000           # weight 1.0 keeps all
    assert 800 < by.get("src1", 0) < 1200      # ~half
    assert "dropme" not in by.index            # unlisted drops


def test_pack_sequences_invariants(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(5000, dtype=np.int64),
        "n_tokens": rng.integers(1, 200, 5000).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = pack_sequences(ds, 512).to_pandas()
    # every doc exactly once, token counts preserved
    assert sorted(out["doc_id"]) == list(range(5000))
    merged = out.merge(df, on="doc_id", suffixes=("", "_src"))
    assert (merged["n_tokens"] == merged["n_tokens_src"]).all()
    bins = out.groupby("bin_id")["n_tokens"].agg(["sum", "size"])
    # no bin over budget unless it is a single long doc
    over = bins[bins["sum"] > 512]
    assert (over["size"] == 1).all()
    # bin_tokens column equals the true bin sum
    assert (out.groupby("bin_id")["bin_tokens"].first()
            == bins["sum"]).all()
    # greedy fill: average bin utilization is decent
    assert bins["sum"].mean() > 0.5 * 512


def test_pack_long_doc_gets_own_bin(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "n_tokens": [100, 9999, 100]})
    out = pack_sequences(ray.data.from_pandas(df), 512).to_pandas()
    big = out[out["doc_id"] == 2]
    assert (out.groupby("bin_id").size()[big["bin_id"].iloc[0]] == 1)


def test_driver_pack_query(ray_session):
    from baram_ray.pipelines.training import doc_pack_bins
    out = doc_pack_bins(SF).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "bin_id", "n_tokens",
                                "bin_tokens"}


def test_hash_shuffle_deterministic_and_seeded(ray_session):
    from baram_ray.sampling import hash_shuffle
    ds = ray.data.range(3000).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    a = hash_shuffle(ds, seed=1).to_pandas()
    b = hash_shuffle(ds, seed=1).to_pandas()
    # global order is identical run-to-run
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # same multiset, different order for a different seed
    c = hash_shuffle(ds, seed=2).to_pandas()
    assert sorted(c["doc_id"]) == sorted(a["doc_id"])
    assert c["doc_id"].tolist() != a["doc_id"].tolist()
    # the order is actually shuffled, not identity
    assert a["doc_id"].tolist() != sorted(a["doc_id"])
