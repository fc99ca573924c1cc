"""Adversarial key-skew torture for the exchange layer (round-4 verdict
item 6): the corpus generators are zipfian, but the exchange had no
dedicated test where one key owns half the rows, a bucket receives
nothing, or every row shares one key. Contracts under test:

- results identical to pandas ground truth (and to the unskewed path)
  at any skew and any bucket count — skew may slow an exchange, never
  corrupt it;
- routing: every row of one key lands in exactly ONE bucket (the
  all-rows-of-a-key-co-located invariant each bucket_fn relies on),
  and fragments partition the input (no loss, no duplication);
- empty buckets flow through (schema-typed empties, no KeyError);
- the hot bucket is bounded by hot-key mass + its fair share — skew
  does not leak OTHER keys into the hot bucket.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray

from baram_ray.util import _split_by_bucket, cogroup, grouped_agg, grouped_map


def _skewed(n=6000, hot_frac=0.5, n_keys=40, seed=0, hot_key=7):
    """hot_frac of all rows share ``hot_key``; the rest spread evenly."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    keys = np.concatenate([
        np.full(n_hot, hot_key, dtype=np.int64),
        rng.integers(0, n_keys, n - n_hot),
    ])
    rng.shuffle(keys)
    return pd.DataFrame({"k": keys,
                         "v": rng.normal(size=n).round(3)})


def _canon(df):
    df = df.reset_index(drop=True)
    return df[sorted(df.columns)].sort_values(
        sorted(df.columns), kind="stable").reset_index(drop=True)


# --------------------------------------------------------------------------
# Routing invariants, tested directly on the split kernel.


@pytest.mark.parametrize("hot_frac", [0.5, 0.95, 1.0])
def test_split_routes_each_key_to_one_bucket(hot_frac):
    df = _skewed(n=4000, hot_frac=hot_frac)
    frags = _split_by_bucket(pa.Table.from_pandas(df), ["k"], 16)
    assert len(frags) == 16
    assert sum(f.num_rows for f in frags) == len(df)   # partition: no loss
    seen: dict[int, int] = {}
    for b, f in enumerate(frags):
        for key in np.unique(f["k"].to_numpy()):
            assert seen.setdefault(int(key), b) == b   # one bucket per key
    # hot-bucket bound: hot mass + the even share of the other keys
    hot_bucket = seen.get(7)
    if hot_bucket is not None:
        hot_rows = frags[hot_bucket].num_rows
        n_hot = int((df["k"] == 7).sum())
        others = len(df) - n_hot
        assert hot_rows <= n_hot + others // 4   # far below 2 keys' worth+slack


def test_split_with_planted_empty_buckets():
    # every row carries ONE key → exactly one non-empty fragment
    df = pd.DataFrame({"k": np.full(1000, 3, dtype=np.int64),
                       "v": np.arange(1000.0)})
    frags = _split_by_bucket(pa.Table.from_pandas(df), ["k"], 8)
    nonempty = [f for f in frags if f.num_rows]
    assert len(nonempty) == 1 and nonempty[0].num_rows == 1000
    for f in frags:                      # empties keep the typed schema
        assert f.schema.names == ["k", "v"]


# --------------------------------------------------------------------------
# End-to-end: skewed == pandas == unskewed path, across bucket counts.


@pytest.mark.parametrize("hot_frac,buckets", [(0.5, 1), (0.5, 4),
                                              (0.95, 16), (1.0, 8)])
def test_grouped_agg_extreme_skew(ray_session, hot_frac, buckets):
    df = _skewed(hot_frac=hot_frac)
    got = grouped_agg(ray.data.from_pandas(df), ["k"],
                      {"s": ("v", "sum"), "n": ("v", "size")},
                      num_buckets=buckets).to_pandas()
    exp = df.groupby("k", as_index=False).agg(s=("v", "sum"),
                                              n=("v", "size"))
    got["n"] = got["n"].astype(exp["n"].dtype)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_grouped_map_skew_group_integrity(ray_session):
    """bucket_fn must observe each key's rows COMPLETE, even when one
    key is half the table: per-key count and sum computed inside the
    bucket must equal the global ground truth."""
    df = _skewed(hot_frac=0.5)

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("k", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"))

    got = grouped_map(ray.data.from_pandas(df), ["k"], per_key,
                      num_buckets=8).to_pandas()
    exp = df.groupby("k", as_index=False).agg(n=("v", "size"),
                                              s=("v", "sum"))
    got["n"] = got["n"].astype(exp["n"].dtype)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    assert len(got) == df["k"].nunique()      # each key exactly once


def test_cogroup_skew_both_sides(ray_session):
    """Hot key on BOTH sides of a join (the quadratic corner the
    module docstring tells callers to salt): output must still be the
    exact pandas merge, with bounded bucket count keeping the blowup
    inside one reduce."""
    left = _skewed(n=800, hot_frac=0.5, seed=1)
    right = _skewed(n=600, hot_frac=0.5, seed=2).rename(
        columns={"v": "w"})
    from baram_ray.joins import hash_join
    got = hash_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right), "k",
                    num_buckets=8).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(hot_frac=st.floats(0.0, 1.0),
       n_keys=st.integers(1, 50),
       buckets=st.sampled_from([1, 2, 7, 16]),
       seed=st.integers(0, 10_000))
def test_split_partition_property(hot_frac, n_keys, buckets, seed):
    """Property: for ANY skew shape, fragments partition the input and
    co-locate keys (pure kernel — no Ray session needed per example)."""
    df = _skewed(n=500, hot_frac=hot_frac, n_keys=n_keys, seed=seed,
                 hot_key=0)
    frags = _split_by_bucket(pa.Table.from_pandas(df), ["k"], buckets)
    if buckets == 1:                 # num_returns=1 path: bare table
        frags = [frags]
    back = pa.concat_tables([f for f in frags if f.num_rows]) \
        if any(f.num_rows for f in frags) else frags[0]
    assert back.num_rows == len(df)
    got_sum = sum(f["v"].to_numpy().sum() for f in frags if f.num_rows)
    assert np.isclose(got_sum, df["v"].sum())
    owner: dict[int, int] = {}
    for b, f in enumerate(frags):
        for key in np.unique(f["k"].to_numpy()) if f.num_rows else []:
            assert owner.setdefault(int(key), b) == b
