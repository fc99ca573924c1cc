"""HyperLogLog cardinality sketch: estimator accuracy across regimes
(linear-counting small-n through 1M distinct), bit-identical shard
merge, reshard stability of the Dataset operator, and the DSL
precision_threshold routing."""

import shutil

import numpy as np
import pandas as pd
import pytest
import ray

from baram_ray.sketches import (HLL_P, distinct_hll, hll_estimate,
                                hll_merge, hll_partial)


@pytest.mark.parametrize("n", [0, 1, 10, 500, 3000, 50_000, 300_000])
def test_estimator_accuracy(n):
    vals = np.arange(n, dtype=np.int64) * 7 + 13
    est = hll_estimate(hll_partial(vals))
    if n == 0:
        assert est == 0.0
    elif n <= 3000:
        # linear-counting regime: near-exact
        assert abs(est - n) / max(n, 1) < 0.03
    else:
        # HLL regime at p=12: 1.04/sqrt(4096) ~ 1.6%; allow 3 sigma
        assert abs(est - n) / n < 0.05


def test_merge_bit_identical_and_order_free():
    vals = np.arange(80_000, dtype=np.int64)
    single = hll_partial(vals)
    parts = [hll_partial(vals[i::5]) for i in range(5)]
    merged = hll_merge(parts)
    assert np.array_equal(merged, single)
    assert np.array_equal(hll_merge(parts[::-1]), single)
    # idempotent: merging overlapping slices changes nothing
    assert np.array_equal(hll_merge(parts + parts[:2]), single)


def test_duplicates_do_not_inflate():
    vals = np.repeat(np.arange(1000, dtype=np.int64), 50)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 1000) / 1000 < 0.03


def test_string_and_int_keys_canonicalize():
    ints = np.arange(2000, dtype=np.int64)
    strs = np.array([str(i) for i in range(2000)], dtype=object)
    assert np.array_equal(hll_partial(ints), hll_partial(strs))


def test_p_bounds():
    with pytest.raises(ValueError):
        hll_partial(np.arange(5), p=8)
    # higher p → lower error
    vals = np.arange(200_000, dtype=np.int64)
    e12 = hll_estimate(hll_partial(vals, p=12))
    e16 = hll_estimate(hll_partial(vals, p=16))
    assert abs(e16 - 200_000) <= abs(e12 - 200_000) + 2000


def test_distinct_hll_dataset_op_reshard_stable(ray_session):
    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], n // 3 + 1)[:n],
        "k": rng.integers(0, 5000, size=n).astype(np.int64),
    })
    exact = df.groupby("g")["k"].nunique()

    def run(num_blocks):
        ds = ray.data.from_pandas(df).repartition(num_blocks)
        out = distinct_hll(ds, lambda b: b["k"].to_numpy(
            zero_copy_only=False), "g").to_pandas()
        return out.sort_values("g").reset_index(drop=True)

    r1, r8 = run(1), run(8)
    # same registers regardless of blocking → identical estimates
    pd.testing.assert_frame_equal(r1, r8)
    for _, row in r8.iterrows():
        e = exact[row["g"]]
        assert abs(row["est_distinct"] - e) / e < 0.05


def test_dsl_precision_threshold_routing(ray_session, tmp_path):
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine, ShardedEngine

    src = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "idx")
    rng = np.random.default_rng(5)
    pd.DataFrame({
        "doc_id": np.arange(400),
        "text": ["data " + " ".join(
            rng.choice(["x", "y", "z"], 3)) for _ in range(400)],
        "n_chars": rng.integers(0, 10_000, size=400).astype(np.int64),
    }).to_parquet(src, index=False)
    shutil.rmtree(out, ignore_errors=True)
    build_index(src, out, IndexConfig(fields=("text",), id_cols=(),
                                      num_shards=4,
                                      keep=("n_chars",)), resume=False)
    eng, sh = QueryEngine(out), ShardedEngine(out, n_groups=2)
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"c": {"cardinality": {
                "field": "n_chars", "precision_threshold": 3000}},
                "e": {"cardinality": {"field": "n_chars"}}}}
    one = execute_dsl(eng, body)["aggregations"]
    many = execute_dsl(sh, body)["aggregations"]
    assert one == many                      # registers merge exactly
    exact = one["e"]["value"]
    assert abs(one["c"]["value"] - exact) / max(exact, 1) < 0.05
