"""Span queries (Lucene SpanQuery family via OpenSearch —
span_near ordered/unordered, span_first, span_not): doc-set
correctness against a brute-force position recomputation on random
texts, sharded == single identity, DSL routing, and scoring
determinism."""

import itertools
import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_span_idx"
SRC = "/tmp/baram_test_span_docs.parquet"
N = 250
VOCAB = ["data", "stream", "table", "scan", "merge", "sort",
         "vector", "hash"]


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N):
        words = list(rng.choice(VOCAB, size=int(rng.integers(4, 25))))
        rows.append({"doc_id": i, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), num_shards=4,
                      positions=True, keep=())
    build_index(SRC, OUT, cfg, resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


def _brute_near(text, terms, slop, in_order):
    toks = text.split()
    pos = {t: [i for i, w in enumerate(toks) if w == t]
           for t in terms}
    if any(not p for p in pos.values()):
        return False
    for combo in itertools.product(*(pos[t] for t in terms)):
        if len(set(combo)) != len(combo):
            continue
        if in_order and list(combo) != sorted(combo):
            continue
        if (max(combo) - min(combo)) - (len(terms) - 1) <= slop:
            return True
    return False


@pytest.mark.parametrize("terms,slop,in_order", [
    (["data", "stream"], 0, True),
    (["data", "stream"], 2, True),
    (["merge", "sort"], 1, False),
    (["table", "scan", "merge"], 3, True),
    (["table", "scan", "vector"], 2, False),
])
def test_span_near_vs_brute(engine, docs_df, terms, slop, in_order):
    got = set(engine.match_span_near_docs(terms, slop=slop,
                                          in_order=in_order).tolist())
    exp = {int(r.doc_id) for r in docs_df.itertuples()
           if _brute_near(r.text, terms, slop, in_order)}
    assert got == exp


def test_span_first_vs_brute(engine, docs_df):
    for term, end in [("data", 1), ("stream", 4)]:
        got = set(engine.match_span_first_docs(term, end).tolist())
        exp = {int(r.doc_id) for r in docs_df.itertuples()
               if term in r.text.split()[:end]}
        assert got == exp


def test_span_not_vs_brute(engine, docs_df):
    got = set(engine.match_span_not_docs("data", "vector",
                                         dist=2).tolist())
    exp = set()
    for r in docs_df.itertuples():
        toks = r.text.split()
        dp = [i for i, w in enumerate(toks) if w == "data"]
        vp = [i for i, w in enumerate(toks) if w == "vector"]
        if any(all(abs(q - p) > 2 for q in vp) for p in dp):
            exp.add(int(r.doc_id))
    assert got == exp


def test_sharded_identity(engine, sharded):
    for terms, slop, in_order in [(["data", "stream"], 2, True),
                                  (["merge", "sort"], 3, False)]:
        one = engine.search_span_near(terms, k=20, slop=slop,
                                      in_order=in_order)
        many = sharded.search_span_near(terms, k=20, slop=slop,
                                        in_order=in_order)
        assert one == many
        assert np.array_equal(
            engine.match_span_near_docs(terms, slop=slop,
                                        in_order=in_order),
            sharded.match_span_near_docs(terms, slop=slop,
                                         in_order=in_order))
    assert np.array_equal(engine.match_span_first_docs("data", 3),
                          sharded.match_span_first_docs("data", 3))
    assert np.array_equal(
        engine.match_span_not_docs("data", "vector", dist=1),
        sharded.match_span_not_docs("data", "vector", dist=1))


def test_dsl_routing(engine):
    hits = execute_dsl(engine, {"query": {"span_near": {
        "clauses": [{"span_term": {"text": "data"}},
                    {"span_term": {"text": "stream"}}],
        "slop": 2, "in_order": True}}, "size": 5})
    assert hits == engine.search_span_near(["data", "stream"], k=5,
                                           slop=2, in_order=True)
    first = execute_dsl(engine, {"query": {"span_first": {
        "match": {"span_term": {"text": "data"}}, "end": 3}},
        "size": 1000})
    assert [d for d, _ in first] == \
        engine.match_span_first_docs("data", 3).tolist()
    assert all(s == 1.0 for _, s in first)
    nq = execute_dsl(engine, {"query": {"span_not": {
        "include": {"span_term": {"text": "data"}},
        "exclude": {"span_term": {"text": "vector"}},
        "dist": 2, "boost": 2.0}}, "size": 1000})
    assert all(s == 2.0 for _, s in nq)


def test_span_edge_cases(engine):
    # unknown term → empty
    assert len(engine.match_span_near_docs(["data", "zzzzz"],
                                           slop=5)) == 0
    # duplicate terms refused
    with pytest.raises(ValueError, match="distinct"):
        engine.match_span_near_docs(["data", "data"], slop=1)
    # ordered stricter than unordered
    o = set(engine.match_span_near_docs(["data", "stream"],
                                        slop=1, in_order=True).tolist())
    u = set(engine.match_span_near_docs(["data", "stream"], slop=1,
                                        in_order=False).tolist())
    assert o <= u


def test_span_scoring_shape(engine):
    hits = engine.search_span_near(["data", "stream"], k=10, slop=2)
    assert hits == sorted(hits, key=lambda ds: (-ds[1], ds[0]))
    assert all(s > 0 for _, s in hits)
