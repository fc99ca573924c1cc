"""Partition-granular incremental build (SURVEY §7.1 step 5): append
new input partitions → only they are tokenized/encoded (delta segment
generation), and the index answers every query identically to a
from-scratch build."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from baram_ray.index.build import IndexConfig, build_index_incremental
from baram_ray.query.engine import QueryEngine

WORDS = ["data", "stream", "query", "join", "sort", "merge", "scan",
         "filter", "table", "hash", "vector", "batch", "row", "window"]


def _write_part(path: str, lo: int, hi: int, seed: int):
    rng = np.random.RandomState(seed)
    rows = {"doc_id": [], "text": [], "lang": [], "n_chars": []}
    for d in range(lo, hi):
        text = " ".join(WORDS[rng.randint(len(WORDS))]
                        for _ in range(20 + rng.randint(30)))
        rows["doc_id"].append(d)
        rows["text"].append(text)
        rows["lang"].append("en" if d % 3 else "ko")
        rows["n_chars"].append(len(text))
    pq.write_table(pa.table(rows), path)


CFG = IndexConfig(fields=("text",), id_cols=(), keep=("lang", "n_chars"))
QUERIES = ["data stream", "join sort merge", "vector batch window",
           "hash table scan filter", "row"]


def _all_hits(idx: str):
    eng = QueryEngine(idx)
    out = {}
    for q in QUERIES:
        out[q] = eng.search(q, k=10_000)
        assert eng.search(q, k=20, algorithm="wand") == out[q][:20]
    return out


def _termdict(idx: str) -> pd.DataFrame:
    t = pq.read_table(os.path.join(idx, "termdict")).to_pandas()
    return t.sort_values(["field", "term"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("inc_corpus")
    _write_part(str(d / "part0.parquet"), 0, 120, seed=1)
    _write_part(str(d / "part1.parquet"), 120, 260, seed=2)
    return str(d)


def test_incremental_append_equals_scratch(ray_session, corpus, tmp_path):
    inc_dir = str(tmp_path / "inc")
    scratch_dir = str(tmp_path / "scratch")

    # initial build over part0 only
    r1 = build_index_incremental(
        [os.path.join(corpus, "part0.parquet")], inc_dir, CFG)
    assert r1.n_docs == 120

    # append part1 → delta build: part0 forward is resumed, segments go
    # through the delta path (not a full rebuild)
    r2 = build_index_incremental(
        [os.path.join(corpus, "part0.parquet"),
         os.path.join(corpus, "part1.parquet")], inc_dir, CFG)
    assert r2.n_docs == 260
    assert any(s.startswith("forward:") for s in r2.resumed_stages)
    assert "segments:delta" in r2.resumed_stages

    # from-scratch over both parts
    build_index_incremental(
        [os.path.join(corpus, "part0.parquet"),
         os.path.join(corpus, "part1.parquet")], scratch_dir, CFG)

    # identical query answers (scores + ranking, DAAT and WAND) and
    # identical term statistics
    inc_hits, scr_hits = _all_hits(inc_dir), _all_hits(scratch_dir)
    for q in QUERIES:
        assert inc_hits[q] == scr_hits[q], q
    pd.testing.assert_frame_equal(_termdict(inc_dir), _termdict(scratch_dir))


def test_incremental_noop_resume(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    files = [os.path.join(corpus, "part0.parquet")]
    build_index_incremental(files, idx, CFG)
    r = build_index_incremental(files, idx, CFG)
    assert "segments" in r.resumed_stages           # nothing re-encoded
    assert all(s.startswith(("forward:", "segments", "termdict"))
               for s in r.resumed_stages)


def test_incremental_inplace_change_full_rebuild(ray_session, corpus,
                                                 tmp_path):
    """An edited (non-append) partition forces a correct full rebuild."""
    d = str(tmp_path / "data")
    os.makedirs(d)
    shutil.copy(os.path.join(corpus, "part0.parquet"), d)
    p1 = os.path.join(d, "part1.parquet")
    _write_part(p1, 120, 200, seed=3)
    idx = str(tmp_path / "idx")
    files = [os.path.join(d, "part0.parquet"), p1]
    build_index_incremental(files, idx, CFG)
    before = _all_hits(idx)

    # rewrite part1 with DIFFERENT content (ids overlap the old range →
    # not an append; fingerprint change forces the full path)
    _write_part(p1, 120, 240, seed=9)
    r = build_index_incremental(files, idx, CFG)
    assert "segments:delta" not in r.resumed_stages  # full rebuild path
    assert r.n_docs == 240

    scratch = str(tmp_path / "scratch")
    build_index_incremental(files, scratch, CFG)
    a, b = _all_hits(idx), _all_hits(scratch)
    for q in QUERIES:
        assert a[q] == b[q]


def test_on_duplicate_first_policy(ray_session, tmp_path):
    """id-upsert: duplicate doc_ids keep exactly the min-sha256 row
    (deterministic, partition-order-independent winner)."""
    import hashlib

    from baram_ray.index.build import build_index
    from baram_ray.index.segment import IndexReader

    rows = {"doc_id": [1, 1, 2, 3, 3, 3],
            "text": ["bravo words here", "alpha words here",
                     "charlie only", "delta x", "echo y", "foxtrot z"],
            "lang": ["en"] * 6, "n_chars": [16, 16, 12, 7, 6, 9]}
    p = str(tmp_path / "dup.parquet")
    pq.write_table(pa.table(rows), p)
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError):
        build_index(p, idx, CFG, resume=False)
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",),
                      on_duplicate="first")
    res = build_index(p, idx, cfg, resume=False)
    assert res.n_docs == 3
    r = IndexReader(idx)
    assert sorted(r.doc_ids) == [1, 2, 3]
    sha = {int(d): s for d, s in zip(r.doc_ids, r.sha256)}
    assert sha[1] == min(hashlib.sha256(t.encode()).hexdigest()
                         for t in ("bravo words here", "alpha words here"))
    assert sha[3] == min(hashlib.sha256(t.encode()).hexdigest()
                         for t in ("delta x", "echo y", "foxtrot z"))


def test_streaming_microbatch_ingest(ray_session, tmp_path):
    """T5-ish streaming ingest: three successive micro-batch appends
    (delta generations 1 and 2 stacked on the base) answer identically
    to one batch build — exercises multi-gen block ordering in the
    reader."""
    d = tmp_path / "stream"
    d.mkdir()
    parts = []
    for i, (lo, hi) in enumerate([(0, 80), (80, 170), (170, 240)]):
        p = str(d / f"batch{i}.parquet")
        _write_part(p, lo, hi, seed=20 + i)
        parts.append(p)

    idx = str(tmp_path / "idx")
    for i in range(len(parts)):
        r = build_index_incremental(parts[: i + 1], idx, CFG)
        if i > 0:
            assert "segments:delta" in r.resumed_stages
    assert r.n_docs == 240

    scratch = str(tmp_path / "scratch")
    build_index_incremental(parts, scratch, CFG)
    a, b = _all_hits(idx), _all_hits(scratch)
    for q in QUERIES:
        assert a[q] == b[q], q
    pd.testing.assert_frame_equal(_termdict(idx), _termdict(scratch))

    # compaction after stacked deltas stays query-invariant
    from baram_ray.index.compact import compact_segments
    stats = compact_segments(idx)
    assert stats["files_after"] <= stats["files_before"]
    c = _all_hits(idx)
    for q in QUERIES:
        assert c[q] == a[q], q


def test_since_prefilter(tmp_path, ray_session):
    """S1 --since: files older than the cutoff are skipped without being
    read (reference src/commands/index.rs:144-158)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from baram_ray.index.build import (
        IndexConfig, build_index, filter_since,
    )
    from baram_ray.query.engine import QueryEngine

    old_f = str(tmp_path / "old.parquet")
    new_f = str(tmp_path / "new.parquet")
    mk = lambda ids: pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"alpha beta doc{i}" for i in ids]),
    })
    pq.write_table(mk([1, 2, 3]), old_f)
    pq.write_table(mk([10, 11]), new_f)
    cutoff = os.stat(old_f).st_mtime + 0.5
    os.utime(new_f, (cutoff + 10, cutoff + 10))

    kept = filter_since([str(tmp_path)], cutoff)
    assert kept == [new_f]

    out = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=())
    res = build_index([str(tmp_path)], out, cfg, resume=False, since=cutoff)
    assert res.n_docs == 2
    eng = QueryEngine(out)
    assert set(eng.r.doc_ids.tolist()) == {10, 11}

    import pytest
    with pytest.raises(ValueError):
        build_index([str(tmp_path)], out, cfg, resume=False,
                    since=cutoff + 10_000)


def test_delta_crash_before_manifest_is_idempotent(ray_session, corpus,
                                                   tmp_path):
    """Crash AFTER the delta generation's segment files land but BEFORE
    the manifest commits them: re-running the build must discard the
    orphan generation (not double those docs' postings) and produce
    query-identical results to a clean two-step build."""
    import glob

    from baram_ray.index.build import (_encode_segments, _parquet_files,
                                       build_rank_map)

    inc_dir = str(tmp_path / "inc")
    clean_dir = str(tmp_path / "clean")
    p0 = os.path.join(corpus, "part0.parquet")
    p1 = os.path.join(corpus, "part1.parquet")

    build_index_incremental([p0], inc_dir, CFG)
    # simulate the crashed delta: encode part1's forward partition as
    # generation 1 directly (files land in segments/), skip mark_done
    from baram_ray.index.build import _part_key
    build_index_incremental([p0, p1], str(tmp_path / "throwaway"), CFG)
    fwd1 = os.path.join(str(tmp_path / "throwaway"), "forward",
                        f"p_{_part_key(p1)}")
    rmap, stats = build_rank_map([os.path.join(
        str(tmp_path / "throwaway"), "docs", f"p_{_part_key(p1)}")])
    seg_dir = os.path.join(inc_dir, "segments")
    _encode_segments(_parquet_files([fwd1]), seg_dir, CFG, rmap, stats,
                     num_shards=1, shard_shift=9, rank_offset=120, gen=1)
    orphans = glob.glob(os.path.join(seg_dir, "gen1_*.parquet"))
    assert orphans                      # the crash left committed-looking files
    # resume: the real append run must first remove the orphans
    r = build_index_incremental([p0, p1], inc_dir, CFG)
    assert "segments:delta" in r.resumed_stages
    build_index_incremental([p0, p1], clean_dir, CFG)
    inc_hits, clean_hits = _all_hits(inc_dir), _all_hits(clean_dir)
    for q in QUERIES:
        assert inc_hits[q] == clean_hits[q], q
    pd.testing.assert_frame_equal(_termdict(inc_dir),
                                  _termdict(clean_dir))


def test_continuous_ingest_compaction_cycles(ray_session, tmp_path):
    """Steady-state deployment shape: N cycles of micro-batch append
    interleaved with delete_by_query, periodic compaction and tombstone
    purge. Invariants per cycle: the match set equals a from-scratch
    build over the live rows; after a purge cycle ranks AND scores are
    scratch-identical; compaction keeps the segment file count bounded
    instead of growing with the number of delta generations."""
    from baram_ray.index.compact import compact_segments
    from baram_ray.index.deletes import delete_by_query, purge_deletes

    d = tmp_path / "ingest"
    d.mkdir()
    idx = str(tmp_path / "idx")
    parts: list[str] = []
    live = pd.DataFrame()
    files_after_first_compact = None

    def scratch_hits(live_df, exact):
        sdir = tmp_path / f"scratch_{len(parts)}"
        sdir.mkdir(exist_ok=True)
        p = str(sdir / "live.parquet")
        pq.write_table(pa.Table.from_pandas(live_df,
                                            preserve_index=False), p)
        sidx = str(sdir / "idx")
        shutil.rmtree(sidx, ignore_errors=True)
        build_index_incremental([p], sidx, CFG)
        eng, engS = QueryEngine(idx), QueryEngine(sidx)
        for q in QUERIES:
            hp, hs = eng.search(q, k=1000), engS.search(q, k=1000)
            if exact:             # post-purge: live-only stats
                assert [x for x, _ in hp] == [x for x, _ in hs], q
                np.testing.assert_allclose([s for _, s in hp],
                                           [s for _, s in hs],
                                           rtol=0, atol=1e-9)
            else:                 # tombstones masked, stats pre-purge
                assert {x for x, _ in hp} == {x for x, _ in hs}, q

    for cycle in range(5):
        lo = 1000 * cycle
        p = str(d / f"batch{cycle}.parquet")
        _write_part(p, lo, lo + 60, seed=50 + cycle)
        parts.append(p)
        batch = pq.read_table(p).to_pandas()
        live = pd.concat([live, batch], ignore_index=True)
        r = build_index_incremental(parts, idx, CFG)
        if cycle > 0:
            assert "segments:delta" in r.resumed_stages
        if cycle in (1, 3):       # interleaved deletes
            n = delete_by_query(idx, "lang", "ko")
            assert n == int((live["lang"] == "ko").sum())
            live = live[live["lang"] != "ko"].reset_index(drop=True)
            scratch_hits(live, exact=False)
        if cycle in (2, 4):       # periodic compaction + purge
            purge_deletes(idx)
            stats = compact_segments(idx)
            assert stats["files_after"] <= stats["files_before"]
            if files_after_first_compact is None:
                files_after_first_compact = stats["files_after"]
            else:                 # bounded, not growing per generation
                assert stats["files_after"] \
                    <= 2 * files_after_first_compact
            scratch_hits(live, exact=True)
    # post-purge: n_docs is live-only (scores use live stats) while
    # tombstones REMAIN by design — the docs table keeps its rows so
    # ranks stay stable (purge_deletes docstring); no live id may be
    # masked by a stale tombstone
    from baram_ray.index.deletes import tombstoned_ids
    eng = QueryEngine(idx)
    assert eng.r.n_docs == len(live)
    assert not (set(tombstoned_ids(idx).tolist())
                & set(live["doc_id"].tolist()))


def test_live_refresh_sees_delta(ray_session, corpus, tmp_path):
    """Serving-side delta visibility (round-4 verdict item 4): a LIVE
    QueryEngine / QueryActor pool opened on the base index must see a
    later delta commit after refresh() — no actor restart, no alias
    swap — and answer identically to a fresh engine."""
    idx = str(tmp_path / "live")
    build_index_incremental([os.path.join(corpus, "part0.parquet")],
                            idx, CFG)

    # live driver-side engine + live resident actor pool on the BASE
    from baram_ray.query.engine import QueryActor
    eng = QueryEngine(idx)
    Actor = ray.remote(QueryActor)
    pool = [Actor.remote(idx) for _ in range(2)]
    base_hits = eng.search("row", k=10_000)
    assert max(d for d, _ in base_hits) < 120
    assert not eng.refresh()                     # no change: fast no-op
    # force both actors to CONSTRUCT on the base index before the delta
    # lands (actor init is async; an actor whose __init__ ran after the
    # commit would correctly report refresh()==False)
    for g in ray.get([a.serve.remote("qs", "row", 5) for a in pool]):
        assert list(map(tuple, g)) == base_hits[:5]

    # delta commit while the pool is live
    build_index_incremental(
        [os.path.join(corpus, "part0.parquet"),
         os.path.join(corpus, "part1.parquet")], idx, CFG)

    assert eng.refresh()                         # re-opened
    fresh = QueryEngine(idx)
    for q in QUERIES:
        assert eng.search(q, k=10_000) == fresh.search(q, k=10_000)
    assert any(d >= 120 for d, _ in eng.search("row", k=10_000))

    refreshed = ray.get([a.refresh.remote() for a in pool])
    assert refreshed == [True, True]
    for q in QUERIES:
        want = fresh.search(q, k=50)
        got = ray.get([a.serve.remote("qs", q, 50) for a in pool])
        assert [list(map(tuple, g)) for g in got] == [want, want]
    for a in pool:
        ray.kill(a)


def test_refresh_sees_delete(ray_session, corpus, tmp_path):
    """refresh() must also surface tombstones written after open."""
    idx = str(tmp_path / "del")
    build_index_incremental([os.path.join(corpus, "part0.parquet")],
                            idx, CFG)
    eng = QueryEngine(idx)
    before = {d for d, _ in eng.search("row", k=10_000)}
    ko = {d for d in before if d % 3 == 0}       # lang == "ko" docs
    assert ko and before - ko

    from baram_ray.index.deletes import delete_by_query
    assert delete_by_query(idx, "lang", "ko") > 0
    assert eng.refresh()
    after = {d for d, _ in eng.search("row", k=10_000)}
    assert after == before - ko
