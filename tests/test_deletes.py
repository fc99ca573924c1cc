"""delete_by_query tombstones + merge-time purge (reference
``src/embedding/mod.rs:768-789`` delegates both to OpenSearch/Lucene:
immediate live-docs masking, physical expunge at merge).

Invariants checked:
- every query path (DAAT, WAND, bool, prefix, fuzzy, phrase, retrieval,
  sharded scatter-gather) excludes tombstoned docs immediately;
- tombstoning does NOT change surviving docs' scores (Lucene keeps df /
  docCount / avgdl until merge);
- after ``purge_deletes`` the index is rank- AND score-identical to a
  from-scratch build over the surviving corpus (stats become live-only);
- purge never changes the match set; compaction composes with purge;
- a segment rebuild from source clears tombstones (reindex semantics).
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.index.deletes import (
    delete_by_query, purge_deletes, tombstoned_ids,
)
from baram_ray.query.engine import QueryEngine, ShardedEngine

SRC = "/root/testdata/sf0.001/documents.parquet"
OUT = "/tmp/baram_test_delidx"
CFG = IndexConfig(fields=("text",), id_cols=(), keep=("lang", "source"),
                  positions=True, num_shards=4)
QUERIES = ["data processing", "table scan filter", "hash join merge sort",
           "stream window agg"]


@pytest.fixture(scope="module")
def deleted_index(ray_session):
    """Index over documents with lang='de' + text term 'vector'
    tombstoned; yields (index_dir, pre-delete hits, live id set)."""
    shutil.rmtree(OUT, ignore_errors=True)
    build_index(SRC, OUT, CFG, resume=False)
    eng0 = QueryEngine(OUT)
    pre = {q: eng0.search(q, k=30) for q in QUERIES}
    n_meta = delete_by_query(OUT, "lang", "de")
    n_term = delete_by_query(OUT, "text", "vector")
    assert n_meta > 0 and n_term > 0
    live = set(QueryEngine(OUT).live_doc_ids().tolist())
    return OUT, pre, live


def test_counts_and_idempotency(deleted_index):
    out, _, live = deleted_index
    t = pq.read_table(SRC, columns=["doc_id", "lang"])
    n_de = sum(1 for v in t["lang"].to_pylist() if v == "de")
    assert delete_by_query(out, "lang", "de") == 0        # idempotent
    assert QueryEngine(out).r.n_deleted == len(tombstoned_ids(out))
    assert len(live) + len(tombstoned_ids(out)) \
        == pq.ParquetFile(SRC).metadata.num_rows
    assert len(tombstoned_ids(out)) >= n_de
    with pytest.raises(KeyError):
        delete_by_query(out, "no_such_field", "x")


def test_tombstones_mask_every_path(deleted_index):
    out, pre, live = deleted_index
    eng = QueryEngine(out)
    for q in QUERIES:
        hits = eng.search(q, k=30)
        assert all(d in live for d, _ in hits), q
        # Lucene tombstone semantics: the head of the post-delete list is
        # EXACTLY the pre-delete list with deleted docs dropped (scores
        # unchanged); beyond that prefix, new docs surface from below k
        expect = [(d, s) for d, s in pre[q] if d in live]
        assert hits[:len(expect)] == expect[:len(hits)], q
        assert eng.search(q, k=30, algorithm="wand") == hits, q
    assert all(d in live for d, _ in eng.search_phrase("merge sort", k=20))
    assert all(d in live for d, _ in eng.search_prefix("st", k=20))
    assert all(d in live for d, _ in eng.search_fuzzy("tabel", k=20))
    assert all(d in live
               for d, _ in eng.search_bool(should=["data", "vector"], k=30))
    for arr in (eng.match_prefix_docs("st"), eng.match_fuzzy_docs("tabel"),
                eng.match_phrase_docs("merge sort"),
                eng.r.doc_ids_for_term("text", "data")):
        assert all(int(d) in live for d in arr)
    # the term-deleted docs are gone from their own postings view
    assert len(eng.r.doc_ids_for_term("text", "vector")) == 0


def test_sharded_reader_masks_deletes(deleted_index):
    out, _, live = deleted_index
    sh = ShardedEngine(out, n_groups=2)
    single = QueryEngine(out)
    assert len(sh.engines) > 1
    for q in QUERIES:
        assert sh.search(q, k=25) == single.search(q, k=25), q


def test_purge_equals_scratch_build(deleted_index, tmp_path):
    out, _, live = deleted_index
    pre_purge = {q: QueryEngine(out).search(q, k=1000) for q in QUERIES}
    res = purge_deletes(out)
    assert res["n_purged"] == len(tombstoned_ids(out))
    assert res["n_live"] == len(live)
    assert res["blocks_after"] <= res["blocks_before"]
    # purge is MATCH-invariant (scores shift to live-only idf/avgdl —
    # exactly what a Lucene merge does — but the match set is unchanged)
    engP = QueryEngine(out)
    assert set(engP.live_doc_ids().tolist()) == live
    for q in QUERIES:
        assert {d for d, _ in engP.search(q, k=1000)} \
            == {d for d, _ in pre_purge[q]}, q

    # scratch build over the survivors: identical ranks AND scores
    t = pq.read_table(SRC)
    keep = pa.array([int(d) in live for d in t["doc_id"].to_pylist()])
    src2 = str(tmp_path / "live.parquet")
    pq.write_table(t.filter(keep), src2)
    idx2 = str(tmp_path / "scratch_idx")
    build_index(src2, idx2, CFG, resume=False)
    engS = QueryEngine(idx2)
    assert engP.r.n_docs == engS.r.n_docs
    for q in QUERIES:
        hp, hs = engP.search(q, k=25), engS.search(q, k=25)
        assert [d for d, _ in hp] == [d for d, _ in hs], q
        np.testing.assert_allclose([s for _, s in hp], [s for _, s in hs],
                                   rtol=1e-12)
        assert engP.search(q, k=25, algorithm="wand") == hp, q
    pp = engP.search_phrase("merge sort", k=15)
    ps = engS.search_phrase("merge sort", k=15)
    assert [d for d, _ in pp] == [d for d, _ in ps]
    np.testing.assert_allclose([s for _, s in pp], [s for _, s in ps],
                               rtol=1e-12)
    # re-purging expunges nothing further (postings already clean)
    res2 = purge_deletes(out)
    assert res2["blocks_after"] == res["blocks_after"]
    assert res2["n_live"] == res["n_live"]


def test_compact_after_purge(deleted_index):
    out, _, _ = deleted_index
    from baram_ray.index.compact import compact_segments
    eng_before = {q: QueryEngine(out).search(q, k=20) for q in QUERIES}
    stats = compact_segments(out, target_mb=64)
    assert stats["files_after"] <= stats["files_before"]
    eng = QueryEngine(out)
    for q in QUERIES:
        assert eng.search(q, k=20) == eng_before[q], q


def test_rebuild_clears_tombstones(deleted_index):
    out, _, _ = deleted_index
    build_index(SRC, out, CFG, resume=False)   # reindex from source
    assert len(tombstoned_ids(out)) == 0
    eng = QueryEngine(out)
    assert eng.r.n_deleted == 0
    assert len(eng.live_doc_ids()) == pq.ParquetFile(SRC).metadata.num_rows
    # deleted docs are back
    assert len(eng.r.doc_ids_for_term("text", "vector")) > 0
