"""Compound boolean queries (typed clause specs): single-clause score
identity vs every dedicated op, rank+score identity vs the brute-force
compound oracle on mixed-kind queries, bool-occurrence semantics (msm,
must_not, filters), sharded == single for the shard-safe kinds, and the
honest sharded boundary for expansion kinds. Reference surface: the
OpenSearch bool query the reference composes around query_string /
multi_match (src/embedding/mod.rs:470-539)."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from baram_ray.corpus import corpus_parquet
from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.engine import (
    QueryEngine, ShardedEngine, clause_kind,
)
from baram_ray.query.oracle import OracleIndex

N_ROWS = 300
OUT = "/tmp/baram_test_compound_idx"


@pytest.fixture(scope="module")
def corpus_path():
    return corpus_parquet(N_ROWS, seed=42,
                          cache_dir="/tmp/baram_test_corpus")


@pytest.fixture(scope="module")
def built(corpus_path):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("content", "path"), num_shards=4,
                      positions=True)
    return build_index(corpus_path, OUT, cfg, resume=False)


@pytest.fixture(scope="module")
def docs(corpus_path):
    tbl = pq.read_table(corpus_path)
    out = tbl.to_pylist()
    from baram_ray.stages.normalize import derive_doc_id
    for d in out:
        d["doc_id"] = derive_doc_id(d["repo"], d["path"], d["commit"])
    return out


@pytest.fixture(scope="module")
def oracle(docs):
    return OracleIndex(docs, fields=["content", "path"],
                       meta_cols=["lang"])


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built.out_dir)


@pytest.fixture(scope="module")
def phrase_q(engine, docs):
    """A corpus bigram with a non-trivial phrase match set."""
    from collections import Counter
    from baram_ray.tokenizer import analyze_phrase
    pair_counts = Counter()
    for d in docs[:120]:
        units = analyze_phrase(d.get("content") or "")
        pair_counts.update(zip(units, units[1:]))
    for (a, b), _ in pair_counts.most_common(30):
        if a != b:
            q = f"{a} {b}"
            if len(engine.match_phrase_docs(q)) >= 5:
                return q
    pytest.skip("corpus produced no frequent bigram")


# ------------------------------------------------------------------ #
# clause_kind
# ------------------------------------------------------------------ #

def test_clause_kind():
    assert clause_kind("data stream") == "match"
    assert clause_kind({"phrase": "a b", "slop": 2}) == "phrase"
    assert clause_kind({"fuzzy": "tabel", "max_edits": 1}) == "fuzzy"
    with pytest.raises(ValueError):
        clause_kind({})
    with pytest.raises(ValueError):
        clause_kind({"match": "a", "phrase": "b"})


# ------------------------------------------------------------------ #
# single-clause compound == dedicated op (scores bit-identical: same
# arithmetic and accumulation order)
# ------------------------------------------------------------------ #

def test_single_clause_identity(engine):
    e = engine
    assert e.search_compound(should=["def main"], k=20) == \
        e.search_bool(should=["def main"], k=20)
    assert e.search_compound(should=[{"phrase": "def main"}], k=20) == \
        e.search_phrase("def main", k=20)
    assert e.search_compound(should=[{"phrase": "fn main", "slop": 2}],
                             k=20) == \
        e.search_phrase("fn main", k=20, slop=2)
    assert e.search_compound(should=[{"prefix": "im"}], k=20) == \
        e.search_prefix("im", k=20)
    assert e.search_compound(should=[{"wildcard": "m?in*"}], k=20) == \
        e.search_wildcard("m?in*", k=20)
    assert e.search_compound(should=[{"regexp": "ma.n.*"}], k=20) == \
        e.search_regexp("ma.n.*", k=20)
    assert e.search_compound(should=[{"fuzzy": "impart",
                                      "max_edits": 1}], k=20) == \
        e.search_fuzzy("impart", k=20, max_edits=1)
    # match-only compound == search_bool on the same clause lists
    assert e.search_compound(must=["def"], should=["main", "import"],
                             must_not=["usage"], k=20) == \
        e.search_bool(must=["def"], should=["main", "import"],
                      must_not=["usage"], k=20)


MIXED = [
    dict(must=[{"phrase": "def main"}], should=["import", "return"]),
    dict(must=["def"], should=[{"prefix": "im"},
                               {"phrase": "def main"}],
         minimum_should_match=1),
    dict(should=[{"wildcard": "ma?n"}, {"fuzzy": "impart",
                                        "max_edits": 1}, "return"],
         minimum_should_match=2),
    dict(must=[{"prefix": "re"}], must_not=[{"phrase": "def main"}]),
    dict(should=[{"phrase": "fn main", "slop": 1}, "let"],
         must_not=[{"wildcard": "*usage*"}]),
    dict(must=["def"], should=[{"regexp": "im.*"},
                               {"regexp": "(re|de)turn"}],
         minimum_should_match=1),
]


def test_mixed_rank_identity_vs_oracle(engine, oracle, phrase_q):
    extra = [
        dict(must=[{"phrase": phrase_q}], should=["import", "return"]),
        dict(should=[{"phrase": phrase_q}, {"prefix": "im"}, "let"],
             minimum_should_match=2),
        dict(must=["import"], must_not=[{"phrase": phrase_q}]),
        # per-clause boost (OpenSearch clause boost)
        dict(must=["def"], should=[{"phrase": phrase_q, "boost": 2.5},
                                   {"prefix": "im", "boost": 0.5}],
             minimum_should_match=1),
        dict(should=[{"match": "import", "boost": 3.0}, "return"]),
    ]
    for q in MIXED + extra:
        got = engine.search_compound(k=25, **q)
        exp = oracle.search_compound(k=25, **q)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_clause_boost_scales_scores(engine):
    base = engine.search_compound(should=["import"], k=50)
    boosted = engine.search_compound(
        should=[{"match": "import", "boost": 2.0}], k=50)
    assert [d for d, _ in boosted] == [d for d, _ in base]
    np.testing.assert_allclose([s for _, s in boosted],
                               [2.0 * s for _, s in base], rtol=1e-12)


def test_compound_semantics(engine, phrase_q):
    e = engine
    # must_not of a phrase removes exactly its match set
    base = {d for d, _ in e.search_compound(should=["import"], k=10_000)}
    cut = {d for d, _ in e.search_compound(
        should=["import"], must_not=[{"phrase": phrase_q}], k=10_000)}
    phr = set(e.match_phrase_docs(phrase_q).tolist())
    assert phr and cut == base - phr
    # msm=2 requires two distinct clause kinds to match
    two = e.search_compound(should=[{"phrase": phrase_q},
                                    {"prefix": "re"}],
                            minimum_should_match=2, k=10_000)
    pre = set(e.match_compound_docs(should=[{"prefix": "re"}]).tolist())
    assert {d for d, _ in two} == phr & pre
    # empty positive side
    assert e.search_compound(must_not=["def"], k=5) == []
    assert e.search_compound(k=5) == []


def test_compound_filters_and_min_score(engine, phrase_q):
    e = engine
    langs = {}
    q = dict(must=[{"phrase": phrase_q}], should=["import"])
    allhits = e.search_compound(k=10_000, **q)
    r = e.r
    for d, _ in allhits:
        langs[d] = r.doc_meta["lang"][r.doc_index[d]]
    some_lang = next(iter(langs.values()))
    filt = e.search_compound(k=10_000, filters={"lang": some_lang}, **q)
    assert [d for d, _ in filt] == [d for d, _ in allhits
                                    if langs[d] == some_lang]
    smin = allhits[len(allhits) // 2][1]
    capped = e.search_compound(k=10_000, min_score=smin, **q)
    assert all(s >= smin for _, s in capped)


def test_match_compound_docs_matches_search(engine, phrase_q):
    e = engine
    q = dict(must=["import"], should=[{"phrase": phrase_q},
                                      {"prefix": "im"}],
             minimum_should_match=1)
    ids = e.match_compound_docs(**q)
    hits = e.search_compound(k=10_000, **q)
    assert ids.tolist() == sorted(d for d, _ in hits)
    assert ids.dtype == np.int64


# ------------------------------------------------------------------ #
# sharded scatter-gather
# ------------------------------------------------------------------ #

def test_sharded_compound_matches_single(engine, built, phrase_q):
    sh = ShardedEngine(built.out_dir, n_groups=2)
    for q in (dict(must=[{"phrase": phrase_q}],
                   should=["import", "return"]),
              dict(should=[{"phrase": phrase_q, "slop": 1}, "let"],
                   must_not=[{"phrase": "import index"}]),
              dict(must=["def"], should=["main"],
                   minimum_should_match=1)):
        assert sh.search_compound(k=15, **q) == \
            engine.search_compound(k=15, **q)


def test_sharded_compound_refuses_expansion_kinds(built):
    from baram_ray.query.qparse import UnsupportedQuery
    sh = ShardedEngine(built.out_dir, n_groups=2)
    for spec in ({"prefix": "im"}, {"wildcard": "m?in"},
                 {"regexp": "im.*"}, {"fuzzy": "impart"}):
        with pytest.raises(UnsupportedQuery):
            sh.search_compound(should=[spec], k=5)


# ------------------------------------------------------------------ #
# multi_match type: best_fields (dis_max per field) vs most_fields
# ------------------------------------------------------------------ #

def test_multi_match_best_fields(engine):
    """best_fields == dis_max over single-field match clauses; boosts
    become clause boosts; tie_breaker blends the rest; most_fields
    stays the per-field sum (the engine's native accumulation)."""
    from baram_ray.query.dsl import execute_dsl
    q = "def main"
    body = {"query": {"multi_match": {
        "query": q, "fields": ["content^2", "path"],
        "type": "best_fields", "tie_breaker": 0.4}}, "size": 15}
    got = execute_dsl(engine, body)
    want = engine.search_dismax(
        [{"match": q, "fields": ["content"], "boost": 2.0},
         {"match": q, "fields": ["path"]}],
        tie_breaker=0.4, k=15)
    assert got == want
    # per-field clause == single-field search (scoring identity)
    one = dict(engine.search(q, k=10**9, fields=["path"]))
    s, m = engine._spec_arrays({"match": q, "fields": ["path"]}, None)
    ids = engine.r.doc_ids
    assert {int(d): float(x)
            for d, x, ok in zip(ids, s, m) if ok} == one
    # most_fields (default) == the field-subset sum path
    flat = execute_dsl(engine, {"query": {"multi_match": {
        "query": q, "fields": ["content^2", "path"]}}, "size": 15})
    assert flat == engine.search(q, k=15,
                                 fields=["content", "path"],
                                 boosts={"content": 2.0})
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"multi_match": {
            "query": q, "fields": ["content"],
            "type": "cross_fields"}}, "size": 5})
