"""Fault injection: a worker process dies HARD (os._exit) mid-exchange
and Ray's task retry must reproduce the exact result — the sandbox
stand-in for node loss on a real cluster (task-level lineage; the
build-level crash-resume suite covers the on-disk story)."""

import os

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray.joins import hash_join
from baram_ray.util import grouped_agg, grouped_map


def _make_crasher(marker: str):
    """Returns a SELF-CONTAINED callable (no test-module references —
    workers can't import the tests package): the first caller across
    all workers creates the marker and kills its worker process hard;
    every later (or retried) caller proceeds."""
    def crash_once():
        import os as _os
        try:
            fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL
                          | _os.O_WRONLY)
            _os.close(fd)
            _os._exit(1)
        except FileExistsError:
            pass
    return crash_once


def test_grouped_map_survives_worker_crash(ray_session, tmp_path):
    marker = str(tmp_path / "crash1")
    df = pd.DataFrame({"k": np.arange(20000, dtype=np.int64) % 97,
                       "v": np.arange(20000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)

    crash_once = _make_crasher(marker)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        crash_once()
        g = b.groupby("k", as_index=False)["v"].sum()
        g["v"] = g["v"].astype("int64")
        return g

    got = grouped_map(ds, ["k"], bucket, num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum() \
        .sort_values("k").reset_index(drop=True)
    assert os.path.exists(marker)          # the crash really happened
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_survives_worker_crash(ray_session, tmp_path):
    marker = str(tmp_path / "crash2")
    left = pd.DataFrame({"k": np.arange(5000, dtype=np.int64) % 211,
                         "a": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(211, dtype=np.int64),
                          "b": np.arange(211, dtype=np.int64) * 10})

    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)

    # crash inside the map stage feeding the exchange
    crash_once = _make_crasher(marker)

    def poison(df: pd.DataFrame) -> pd.DataFrame:
        crash_once()
        return df

    got = hash_join(lds.map_batches(poison, batch_format="pandas"),
                    rds, "k", how="inner", num_buckets=4).to_pandas() \
        .sort_values(["k", "a"]).reset_index(drop=True)
    want = left.merge(right, on="k").sort_values(["k", "a"]) \
        .reset_index(drop=True)
    assert os.path.exists(marker)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_agg_partials_exact_after_crash(ray_session, tmp_path):
    marker = str(tmp_path / "crash3")
    df = pd.DataFrame({"k": np.arange(30000, dtype=np.int64) % 13,
                       "v": np.ones(30000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(6)

    crash_once = _make_crasher(marker)

    def poison(b: pd.DataFrame) -> pd.DataFrame:
        crash_once()
        return b

    got = grouped_agg(ds.map_batches(poison, batch_format="pandas"),
                      ["k"], {"n": ("v", "sum")}, num_buckets=3) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert os.path.exists(marker)
    assert got["n"].sum() == 30000          # nothing lost or doubled
    assert (got["n"].to_numpy() == 30000 // 13
            ).sum() + ((got["n"].to_numpy() == 30000 // 13 + 1).sum()) \
        == 13
