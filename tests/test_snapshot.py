"""Snapshot / restore of the index directory (the OpenSearch
repository-snapshot surface): point-in-time query identity through a
later delta ingest, incremental snapshots hardlinking unchanged
immutable segments, corruption detection, and atomic/refusal
semantics."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from baram_ray.index.build import IndexConfig, build_index_incremental
from baram_ray.query.engine import QueryEngine
from baram_ray.state.snapshot import (restore_index, snapshot_index,
                                      verify_snapshot)

WORDS = ["data", "stream", "query", "join", "sort", "merge", "scan",
         "filter", "table", "hash"]
CFG = IndexConfig(fields=("text",), id_cols=(), keep=("lang",))


def _write_part(path: str, lo: int, hi: int, seed: int):
    rng = np.random.RandomState(seed)
    rows = {"doc_id": [], "text": [], "lang": []}
    for d in range(lo, hi):
        rows["doc_id"].append(d)
        rows["text"].append(" ".join(
            WORDS[rng.randint(len(WORDS))]
            for _ in range(15 + rng.randint(20))))
        rows["lang"].append("en" if d % 2 else "ko")
    pq.write_table(pa.table(rows), path)


def _hits(idx):
    return {q: QueryEngine(idx).search(q, k=1000)
            for q in ["data stream", "join sort", "hash table"]}


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("snap")
    p0, p1 = str(d / "p0.parquet"), str(d / "p1.parquet")
    _write_part(p0, 0, 100, seed=1)
    idx = str(d / "idx")
    build_index_incremental([p0], idx, CFG)
    before = _hits(idx)
    snap1 = str(d / "snap1")
    man1 = snapshot_index(idx, snap1)
    # delta ingest mutates the live index
    _write_part(p1, 100, 180, seed=2)
    build_index_incremental([p0, p1], idx, CFG)
    after = _hits(idx)
    snap2 = str(d / "snap2")
    man2 = snapshot_index(idx, snap2, base=snap1)
    return dict(dir=d, idx=idx, snap1=snap1, snap2=snap2,
                man1=man1, man2=man2, before=before, after=after)


def test_restore_is_point_in_time(setup):
    r1 = str(setup["dir"] / "restored1")
    restore_index(setup["snap1"], r1)
    assert _hits(r1) == setup["before"]
    r2 = str(setup["dir"] / "restored2")
    restore_index(setup["snap2"], r2)
    assert _hits(r2) == setup["after"]


def test_incremental_snapshot_hardlinks_unchanged(setup):
    man2 = setup["man2"]
    assert man2["n_reused"] > 0
    # every reused file shares an inode with snap1 (zero extra bytes)
    shared = 0
    for rel, info in man2["files"].items():
        if info["reused"]:
            s1 = os.stat(os.path.join(setup["snap1"], rel))
            s2 = os.stat(os.path.join(setup["snap2"], rel))
            assert s1.st_ino == s2.st_ino
            shared += 1
    assert shared == man2["n_reused"]
    # commit state must NOT be reused (it changed with the delta)
    assert not man2["files"]["meta.json"]["reused"] or \
        man2["files"]["meta.json"]["sha256"] == \
        setup["man1"]["files"]["meta.json"]["sha256"]


def test_later_ingest_does_not_corrupt_snapshot(setup):
    """The restored index was delta-ingested; both snapshots must
    still verify (mutable state was copied, not linked)."""
    r = str(setup["dir"] / "restored_ingest")
    restore_index(setup["snap1"], r)
    p2 = str(setup["dir"] / "p2.parquet")
    _write_part(p2, 200, 240, seed=3)
    p0 = str(setup["dir"] / "p0.parquet")
    build_index_incremental([p0, p2], r, CFG)
    verify_snapshot(setup["snap1"])
    verify_snapshot(setup["snap2"])


def test_verify_detects_corruption(setup, tmp_path):
    bad = str(tmp_path / "bad_snap")
    snapshot_index(setup["idx"], bad)
    verify_snapshot(bad)
    # corrupt one data file
    files = [os.path.join(dp, n)
             for dp, _, ns in os.walk(os.path.join(bad, "segments"))
             for n in ns]
    with open(files[0], "r+b") as f:
        f.seek(0)
        f.write(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        verify_snapshot(bad)
    with pytest.raises(ValueError):
        restore_index(bad, str(tmp_path / "nope"))
    assert not os.path.exists(str(tmp_path / "nope"))


def test_refusals(setup, tmp_path):
    with pytest.raises(FileExistsError):
        snapshot_index(setup["idx"], setup["snap1"])
    with pytest.raises(FileExistsError):
        restore_index(setup["snap1"], setup["idx"])
