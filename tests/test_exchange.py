"""Direct contract tests for the exchange layer (util.grouped_map /
grouped_agg / cogroup and joins.hash_join) against pandas ground truth
on seeded random frames — the primitives every pipeline rides on.
Covers duplicate keys, missing keys, single-bucket clamp (the
num_returns=1 path), empty inputs, and bucket-count invariance."""

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray.joins import hash_join
from baram_ray.util import cogroup, grouped_agg, grouped_map


def _rand_frame(rng, n, key_card, extra="v"):
    return pd.DataFrame({
        "k": rng.integers(0, key_card, n),
        extra: rng.normal(size=n).round(3),
    })


def _canon(df):
    df = df.reset_index(drop=True)
    return df[sorted(df.columns)].sort_values(
        sorted(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("seed,buckets", [(0, 1), (1, 2), (2, 7),
                                          (3, 32), (4, 1)])
def test_grouped_agg_matches_pandas(ray_session, seed, buckets):
    rng = np.random.default_rng(seed)
    df = _rand_frame(rng, 500, key_card=rng.integers(1, 40))
    got = grouped_agg(ray.data.from_pandas(df), ["k"],
                      {"s": ("v", "sum"), "n": (None, "count"),
                       "mx": ("v", "max")},
                      num_buckets=buckets).to_pandas()
    exp = df.groupby("k", as_index=False).agg(
        s=("v", "sum"), mx=("v", "max"), n=("v", "size"))
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False)


@pytest.mark.parametrize("buckets", [1, 3, 16])
def test_grouped_map_key_locality(ray_session, buckets):
    """Every row of one key lands in exactly one bucket_fn call."""
    rng = np.random.default_rng(7)
    df = _rand_frame(rng, 400, key_card=23)
    # bucket_fn tags each row with the size of ITS bucket's key group;
    # if a key were split across buckets, sizes would disagree with
    # the global group sizes
    def tag(bucket):
        b = bucket.copy()
        b["gsz"] = b.groupby("k")["v"].transform("size")
        return b
    got = grouped_map(ray.data.from_pandas(df), ["k"], tag,
                      num_buckets=buckets).to_pandas()
    exp = df.groupby("k")["v"].size()
    assert len(got) == len(df)
    for k, sz in exp.items():
        assert (got.loc[got["k"] == k, "gsz"] == sz).all()


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_matches_pandas(ray_session, how):
    rng = np.random.default_rng(11)
    left = _rand_frame(rng, 300, key_card=30)
    right = pd.DataFrame({"k": rng.integers(10, 40, 80),
                          "w": rng.integers(0, 9, 80)})
    got = hash_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right), "k",
                    how=how).to_pandas()
    if how in ("inner", "left"):
        exp = left.merge(right, on="k", how=how)
        if how == "left":
            # column naming: hash_join keeps NaN for misses like pandas
            pass
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
    elif how == "semi":
        exp = left[left["k"].isin(set(right["k"]))]
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
    else:
        exp = left[~left["k"].isin(set(right["k"]))]
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)


def test_cogroup_pairs_all_fragments(ray_session):
    """Both sides' rows for a key meet in ONE bucket_fn call."""
    rng = np.random.default_rng(13)
    left = _rand_frame(rng, 250, key_card=20)
    right = pd.DataFrame({"k": rng.integers(0, 20, 100),
                          "w": rng.normal(size=100).round(3)})
    def pair_counts(l, r):
        ks = sorted(set(l["k"]) | set(r["k"]))
        return pd.DataFrame({
            "k": ks,
            "nl": [int((l["k"] == k).sum()) for k in ks],
            "nr": [int((r["k"] == k).sum()) for k in ks],
        })
    got = cogroup(ray.data.from_pandas(left),
                  ray.data.from_pandas(right), ["k"], pair_counts,
                  num_buckets=5).to_pandas()
    exp_l = left.groupby("k").size()
    exp_r = right.groupby("k").size()
    for _, row in got.iterrows():
        assert row["nl"] == exp_l.get(row["k"], 0)
        assert row["nr"] == exp_r.get(row["k"], 0)
    assert set(got["k"]) == set(left["k"]) | set(right["k"])


def test_exchange_bucket_invariance(ray_session):
    """The same aggregate through different bucket counts is identical
    (partitioning must never change results)."""
    rng = np.random.default_rng(17)
    df = _rand_frame(rng, 600, key_card=50)
    outs = []
    for b in (1, 4, 64):
        outs.append(_canon(grouped_agg(
            ray.data.from_pandas(df), ["k"],
            {"n": (None, "count")}, num_buckets=b).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_empty_input_keeps_output_schema(ray_session):
    """Zero-block input still yields a DATASET with bucket_fn's output
    schema (Ray's to_pandas drops 0-row blocks, so pipelines restore
    columns via ensure_cols — the dataset-level schema is the
    exchange's contract)."""
    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="float64")})
    ds = grouped_agg(ray.data.from_pandas(empty), ["k"],
                     {"n": (None, "count")}, num_buckets=4)
    assert sorted(ds.schema().names) == ["k", "n"]
    assert ds.count() == 0


def test_hot_key_skew(ray_session):
    """90% of rows share one key: the exchange stays correct (the hot
    key's group lands whole in one bucket) and per-batch combiners are
    what keep the moved bytes bounded — the documented skew strategy.
    Asserts correctness of both the raw exchange and the combiner
    form on the same skewed input."""
    rng = np.random.default_rng(23)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n))
    df = pd.DataFrame({"k": keys, "v": rng.normal(size=n).round(3)})
    exp = df.groupby("k", as_index=False).agg(s=("v", "sum"),
                                              n=("v", "size"))
    # raw exchange
    got = grouped_agg(ray.data.from_pandas(df), ["k"],
                      {"s": ("v", "sum"), "n": (None, "count")},
                      num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False)
    # combiner form: per-batch partials first (what the pipelines do) —
    # the hot key then moves one row per block, not 18k rows
    ds = ray.data.from_pandas(df).repartition(8)
    parts = ds.map_batches(
        lambda b: b.groupby("k", as_index=False).agg(
            s=("v", "sum"), n=("v", "size")),
        batch_format="pandas")
    got2 = grouped_agg(parts, ["k"],
                       {"s": ("s", "sum"), "n": ("n", "sum")},
                       num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_canon(got2), _canon(exp),
                                  check_dtype=False)


def test_cogroup_empty_right_keeps_left_rows(ray_session):
    """Left-outer-shaped bucket_fns (dup-span rebuild, range-join
    counts) must see every LEFT row even when the right side has zero
    non-empty blocks — the reduce runs with an empty typed right
    fragment instead of short-circuiting to bucket_fn(empty, empty)."""
    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "v": np.arange(10, dtype=np.float64)})
    right = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="float64")})

    def left_outer_count(l, r):
        m = l.merge(r.groupby("k", as_index=False).agg(nr=("w", "size")),
                    on="k", how="left")
        m["nr"] = m["nr"].fillna(0).astype("int64")
        return m[["k", "v", "nr"]]

    got = cogroup(ray.data.from_pandas(left),
                  ray.data.from_pandas(right), ["k"], left_outer_count,
                  num_buckets=4).to_pandas()
    assert len(got) == 10
    assert (got["nr"] == 0).all()
    assert set(got["k"]) == set(range(10))
    # empty LEFT runs the reduces with an empty typed left fragment
    # (symmetric to the empty-right path): a LEFT-keyed bucket_fn
    # yields its 0 rows, a FULL-OUTER one keeps every right row
    right2 = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                           "w": np.arange(5, dtype=np.float64)})
    ds2 = cogroup(ray.data.from_pandas(right.rename(columns={"w": "v"})),
                  ray.data.from_pandas(right2), ["k"], left_outer_count,
                  num_buckets=4)
    # (Ray's to_pandas() on an empty dataset drops columns; schema() keeps them)
    assert sorted(ds2.schema().names) == ["k", "nr", "v"]
    assert ds2.count() == 0


def test_cogroup_empty_left_keeps_right_rows_for_outer(ray_session):
    """FULL OUTER through the exchange: right rows survive an empty
    left side (and vice versa — covered above)."""
    left = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")}))
    right = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                          "w": np.arange(5, dtype=np.float64)})
    got = hash_join(left, ray.data.from_pandas(right), "k",
                    how="outer", num_buckets=4).to_pandas()
    assert len(got) == 5
    assert set(got["k"]) == set(range(5))
    assert got["v"].isna().all()
    # both sides populated: unmatched keys of each side survive
    l2 = pd.DataFrame({"k": np.array([0, 1, 2], dtype=np.int64),
                       "v": np.array([.1, .2, .3])})
    r2 = pd.DataFrame({"k": np.array([2, 3], dtype=np.int64),
                       "w": np.array([9.0, 8.0])})
    both = hash_join(ray.data.from_pandas(l2), ray.data.from_pandas(r2),
                     "k", how="outer", num_buckets=4).to_pandas()
    assert set(both["k"]) == {0, 1, 2, 3}
    assert len(both) == 4
    assert both.loc[both["k"] == 3, "v"].isna().all()
    assert both.loc[both["k"] == 0, "w"].isna().all()


# ---------------------------------------------------------------------------
# semi_filter / lookup_join / dim_map: the size-adaptive dimension-side
# strategy (round-4 verdict item 2). Both arms — pandas broadcast and
# Ray-Dataset hash exchange — must be output-identical on the same input.


def _dim_frames(seed=7, n_fact=800, n_dim=60):
    rng = np.random.default_rng(seed)
    fact = pd.DataFrame({
        "fk": rng.integers(0, n_dim + 20, n_fact),   # some misses
        "val": rng.normal(size=n_fact).round(3),
    })
    dim = pd.DataFrame({
        "dk": np.arange(n_dim, dtype=np.int64),
        "attr": [f"a{i % 7}" for i in range(n_dim)],
        "w": rng.normal(size=n_dim).round(3),
    })
    return fact, dim


@pytest.mark.parametrize("negate", [False, True])
def test_semi_filter_arms_identical(ray_session, negate):
    from baram_ray.joins import semi_filter
    fact, dim = _dim_frames()
    keys = dim[dim["dk"] % 3 == 0][["dk"]]
    fds = ray.data.from_pandas(fact)

    broad = semi_filter(fds, keys, "fk", keys_on="dk",
                        negate=negate).to_pandas()
    exch = semi_filter(fds, ray.data.from_pandas(keys), "fk",
                       keys_on="dk", negate=negate).to_pandas()

    member = fact["fk"].isin(keys["dk"])
    exp = fact[~member if negate else member]
    pd.testing.assert_frame_equal(_canon(broad), _canon(exp))
    pd.testing.assert_frame_equal(_canon(exch), _canon(exp))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_lookup_join_arms_identical(ray_session, how):
    from baram_ray.joins import lookup_join
    fact, dim = _dim_frames(seed=11)
    fds = ray.data.from_pandas(fact)
    dim_r = dim.rename(columns={"dk": "fk"})

    broad = lookup_join(fds, dim_r, on="fk", how=how).to_pandas()
    exch = lookup_join(fds, ray.data.from_pandas(dim_r), on="fk",
                       how=how).to_pandas()

    exp = fact.merge(dim_r, on="fk", how=how)
    pd.testing.assert_frame_equal(_canon(broad), _canon(exp))
    pd.testing.assert_frame_equal(
        _canon(exch.astype(exp.dtypes.to_dict())), _canon(exp))


def test_lookup_join_suffix_on_clash(ray_session):
    from baram_ray.joins import lookup_join
    fact, _ = _dim_frames(seed=3)
    dim = pd.DataFrame({"fk": np.arange(40, dtype=np.int64),
                        "val": np.arange(40) * 0.5})  # clashes with fact.val
    got = lookup_join(ray.data.from_pandas(fact), dim, on="fk",
                      how="inner").to_pandas()
    assert "val" in got.columns and "val_r" in got.columns


def test_dim_map_both_arms(ray_session):
    from baram_ray.joins import dim_map
    _, dim = _dim_frames()
    fn = lambda df: df[df["dk"] < 10][["dk"]]  # noqa: E731
    pd_out = dim_map(dim, fn)
    ds_out = dim_map(ray.data.from_pandas(dim), fn).to_pandas()
    pd.testing.assert_frame_equal(_canon(pd_out), _canon(ds_out))


def test_read_dim_threshold_picks_arm(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from baram_ray.pipelines.util import read_dim
    t = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    pq.write_table(__import__("pyarrow").Table.from_pandas(t),
                   str(tmp_path / "dimtab.parquet"))
    small = read_dim(str(tmp_path), "dimtab", ["k"])
    assert isinstance(small, pd.DataFrame) and len(small) == 100
    big = read_dim(str(tmp_path), "dimtab", ["k"], broadcast_limit=10)
    assert hasattr(big, "map_batches")
    assert big.count() == 100


def test_tpch_q3_exchange_arm_matches_broadcast(ray_session, monkeypatch):
    """End-to-end two-arm identity on a real pipeline: force every
    dimension side through the hash-exchange arm (the sf100+ path) and
    compare against the default broadcast arm at sf0.001."""
    from baram_ray.pipelines import tpch
    sf = "/root/testdata/sf0.001"
    base = tpch.q3_shipping_priority(sf).to_pandas()
    monkeypatch.setenv("BARAM_DIM_BROADCAST_LIMIT", "0")
    forced = tpch.q3_shipping_priority(sf).to_pandas()
    pd.testing.assert_frame_equal(_canon(base), _canon(forced))
