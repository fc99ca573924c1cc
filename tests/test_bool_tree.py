"""Nested bool queries (bool-inside-bool, Lucene BooleanQuery
recursion): rank+score identity vs the recursive brute-force oracle,
flat-tree == search_compound, sharded == single with the honest
expansion boundary, and JSON-DSL routing."""

import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine
from baram_ray.query.oracle import OracleIndex

OUT = "/tmp/baram_test_btree_idx"
SRC = "/tmp/baram_test_btree_docs.parquet"
N = 280
VOCAB = ["data", "stream", "table", "scan", "merge", "sort", "vector",
         "batch", "index", "query", "shard", "cache"]


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N):
        words = list(rng.choice(VOCAB, size=int(rng.integers(3, 22))))
        text = " ".join(words)
        rows.append({"doc_id": i, "text": text,
                     "lang": ["en", "de", "fr"][i % 3],
                     "source": f"s{i % 5}", "n_chars": len(text)})
    pd.DataFrame(rows).to_parquet(SRC, index=False)
    return rows


@pytest.fixture(scope="module")
def engine(docs):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), num_shards=4,
                      keep=("lang", "source", "n_chars"),
                      positions=True)
    build_index(SRC, OUT, cfg, resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


@pytest.fixture(scope="module")
def oracle(docs):
    return OracleIndex(docs, fields=["text"],
                       meta_cols=["lang", "source", "n_chars"])


TREES = [
    # should-of-bools with msm inside the child
    {"bool": {
        "must": [{"match": "data"}],
        "should": [
            {"bool": {"must": [{"match_phrase": "table scan"}]}},
            {"bool": {"should": [{"match": "vector"},
                                 {"match": "batch"}],
                      "minimum_should_match": 2}}],
        "minimum_should_match": 1}},
    # must_not of a nested bool
    {"bool": {
        "must": [{"match": "stream"}],
        "must_not": [{"bool": {
            "must": [{"match": "vector"}],
            "filter": [{"term": {"lang": "de"}}]}}]}},
    # filter group holding a nested bool (pure mask, no score)
    {"bool": {
        "must": [{"match": "merge sort"}],
        "filter": [{"bool": {
            "should": [{"term": {"lang": "en"}},
                       {"term": {"lang": "fr"}}]}},
                   {"range": {"n_chars": {"gte": 30}}}]}},
    # three levels deep
    {"bool": {
        "should": [
            {"bool": {"must": [
                {"match": "data"},
                {"bool": {"should": [{"match": "cache"},
                                     {"match": "shard"}]}}]}},
            {"match_phrase": "index query"}]}},
    # match_all + must_not leaf
    {"bool": {"must": [{"match_all": {}}],
              "must_not": [{"match": "vector"}],
              "filter": [{"term": {"source": "s1"}}]}},
]


@pytest.mark.parametrize("i", range(len(TREES)))
def test_tree_matches_oracle(engine, oracle, i):
    got = engine.search_bool_tree(TREES[i], k=N)
    want = oracle.search_bool_tree(TREES[i], k=N)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=1e-9)


def test_flat_tree_equals_compound(engine):
    tree = {"bool": {"must": [{"match_phrase": "table scan"}],
                     "should": [{"match": "vector"},
                                {"match": "batch"}],
                     "must_not": [{"match": "cache"}]}}
    got = engine.search_bool_tree(tree, k=25)
    want = engine.search_compound(
        must=[{"phrase": "table scan"}],
        should=["vector", "batch"], must_not=["cache"], k=25)
    assert got == want


@pytest.mark.parametrize("i", range(len(TREES)))
def test_tree_sharded_identity(engine, sharded, i):
    assert engine.search_bool_tree(TREES[i], k=30) == \
        sharded.search_bool_tree(TREES[i], k=30)


def test_tree_sharded_expansion_refusal(sharded):
    from baram_ray.query.qparse import UnsupportedQuery
    with pytest.raises(UnsupportedQuery):
        sharded.search_bool_tree(
            {"bool": {"must": [{"bool": {
                "should": [{"prefix": "st"}]}}]}}, k=5)


def test_tree_dsl_routing(engine):
    body = {"query": TREES[0], "size": 12}
    assert execute_dsl(engine, body) == \
        engine.search_bool_tree(TREES[0], k=12)
    # flat bool bodies still take the flat-plan path (same results)
    flat = {"query": {"bool": {"must": [{"match": "data"}],
                               "should": [{"match": "vector"}]}},
            "size": 10}
    assert execute_dsl(engine, flat) == engine.search_bool(
        must=["data"], should=["vector"], k=10)
    # nested bool + aggs is an honest refusal
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": TREES[0], "size": 0,
                             "aggs": {"l": {"terms":
                                            {"field": "lang"}}}})


def test_tree_match_docs_and_edges(engine, oracle):
    ids = engine.match_bool_tree_docs(TREES[1])
    want = sorted(d for d, _ in oracle.search_bool_tree(TREES[1], k=N))
    assert list(ids) == want
    assert engine.search_bool_tree(TREES[0], k=0) == []
    # empty bool matches every live doc with score 0
    got = engine.search_bool_tree({"bool": {}}, k=N + 10)
    assert len(got) == N and all(s == 0.0 for _, s in got)
    # zero-hit must
    assert engine.search_bool_tree(
        {"bool": {"must": [{"match": "qqqzz"}]}}, k=5) == []


def test_terms_filter_isin(engine, oracle, docs):
    """OpenSearch ``terms`` (IN-list) filter: flat filter context,
    nested tree leaf, and the explicit filters API all agree with the
    row-level recompute."""
    tree = {"bool": {"must": [{"match": "data"}],
                     "filter": [{"terms": {"lang": ["en", "fr"]}}]}}
    got = engine.search_bool_tree(tree, k=N)
    want = oracle.search_bool_tree(tree, k=N)
    assert got == want
    want_ids = {d["doc_id"] for d in docs
                if d["lang"] in ("en", "fr")
                and "data" in d["text"].split()}
    assert {d for d, _ in got} == want_ids
    # flat DSL path (filters dict value = list -> np.isin)
    flat = execute_dsl(engine, {
        "query": {"bool": {"must": [{"match": "data"}],
                           "filter": [{"terms":
                                       {"lang": ["en", "fr"]}}]}},
        "size": N})
    assert {d for d, _ in flat} == want_ids
    assert engine.search("data", k=N,
                         filters={"lang": ["en", "fr"]}) == flat
    # sharded identity for the terms-filter tree
    assert ShardedEngine(OUT, n_groups=2).search_bool_tree(
        tree, k=20) == engine.search_bool_tree(tree, k=20)
    # empty list is an honest error
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"bool": {
            "filter": [{"terms": {"lang": []}}],
            "must": [{"match": "data"}]}}})


# ------------------------------------------------------------------ #
# rescore (QueryRescorer window semantics)
# ------------------------------------------------------------------ #

def test_rescore_recompute(engine):
    """score = qw × primary + rqw × secondary-where-matched over the
    primary top-window only."""
    rnode = {"bool": {"must": [{"match_phrase": "table scan"}]}}
    got = engine.search_rescore("data stream", rnode, k=10,
                                window_size=40, query_weight=0.7,
                                rescore_query_weight=1.3)
    hits = engine.search("data stream", k=40)
    s2, m2 = engine._eval_bool_tree(rnode)
    rows = {int(d): i for i, d in enumerate(engine.r.doc_ids)}
    want = sorted(
        ((d, 0.7 * s + 1.3 * (s2[rows[d]] if m2[rows[d]] else 0.0))
         for d, s in hits), key=lambda ds: (-ds[1], ds[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=1e-12)


def test_rescore_window_is_strict(engine):
    """A doc outside the primary top-window never enters the result,
    however well it matches the rescore clause."""
    rnode = {"bool": {"must": [{"match": "vector"}]}}
    small = engine.search_rescore("data", rnode, k=5, window_size=5)
    window = {d for d, _ in engine.search("data", k=5)}
    assert {d for d, _ in small} <= window


def test_rescore_sharded_identity(engine, sharded):
    rnode = {"bool": {"must": [{"match_phrase": "merge sort"}],
                      "filter": [{"term": {"lang": "en"}}]}}
    kw = dict(k=12, window_size=30, query_weight=0.5,
              rescore_query_weight=2.0)
    assert engine.search_rescore("data stream", rnode, **kw) == \
        sharded.search_rescore("data stream", rnode, **kw)
    # expansion leaf in the rescore clause refuses on the sharded path
    from baram_ray.query.qparse import UnsupportedQuery
    with pytest.raises(UnsupportedQuery):
        sharded.search_rescore("data", {"bool": {
            "must": [{"prefix": "st"}]}}, k=5)


def test_rescore_dsl_routing(engine):
    rnode = {"match_phrase": "table scan"}
    body = {"query": {"match": "data stream"}, "size": 8,
            "rescore": {"window_size": 25, "query": {
                "rescore_query": rnode, "query_weight": 0.7,
                "rescore_query_weight": 1.3}}}
    assert execute_dsl(engine, body) == engine.search_rescore(
        "data stream", rnode, k=8, window_size=25,
        query_weight=0.7, rescore_query_weight=1.3)
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"prefix": "st"},
                             "rescore": {"query": {
                                 "rescore_query": rnode}}})


def test_boosting_query(engine, sharded, docs):
    """boosting: negative match DEMOTES (× negative_boost), never
    excludes; positive-only docs keep their exact score."""
    from baram_ray.query.dsl import execute_dsl
    pos = {"match": "data stream"}
    neg = {"bool": {"must": [{"match": "vector"}]}}
    got = engine.search_boosting(pos, neg, negative_boost=0.25, k=N)
    base = dict(engine.search_bool_tree(pos, k=N))
    _, nm = engine._eval_bool_tree(neg)
    negset = {int(d) for d, m in zip(engine.r.doc_ids, nm) if m}
    want = sorted(
        ((d, s * 0.25 if d in negset else s) for d, s in base.items()),
        key=lambda ds: (-ds[1], ds[0]))
    assert got == want
    assert {d for d, _ in got} == set(base)        # demoted, not gone
    # sharded identity + DSL routing
    assert sharded.search_boosting(pos, neg, k=15,
                                   negative_boost=0.25) == got[:15]
    body = {"query": {"boosting": {"positive": pos, "negative": neg,
                                   "negative_boost": 0.25}},
            "size": 15}
    assert execute_dsl(engine, body) == got[:15]


def test_rescore_min_score_applies_to_combined(engine):
    from baram_ray.query.dsl import execute_dsl
    rnode = {"match_phrase": "table scan"}
    body = {"query": {"match": "data stream"}, "size": 30,
            "rescore": {"window_size": 30,
                        "query": {"rescore_query": rnode}}}
    full = execute_dsl(engine, body)
    cut = sorted(s for _, s in full)[len(full) // 2]
    body["min_score"] = cut
    got = execute_dsl(engine, body)
    assert got == [(d, s) for d, s in full if s >= cut]
