"""SynonymQuery (Lucene blended-term scoring): doc sets and BM25
scores against a brute-force recomputation (blended df = |union|,
tf = Σ member tfs, single BM25 term per group), sharded == single
identity through the df-sum override, and DSL routing."""

import math
import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_syn_idx"
SRC = "/tmp/baram_test_syn_docs.parquet"
N = 220
VOCAB = ["data", "stream", "table", "scan", "merge", "sort", "vector"]
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(31)
    rows = []
    for i in range(N):
        words = list(rng.choice(VOCAB, size=int(rng.integers(3, 20))))
        rows.append({"doc_id": i, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    build_index(SRC, OUT, IndexConfig(fields=("text",), id_cols=(),
                                      num_shards=4, keep=()),
                resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


def _brute(docs_df, groups, operator="or"):
    """Blended-BM25 recomputation on the raw texts."""
    toks = {int(r.doc_id): r.text.split()
            for r in docs_df.itertuples()}
    n = len(toks)
    dls = {d: len(t) for d, t in toks.items()}
    avg = sum(dls.values()) / n
    scores: dict[int, float] = {}
    hit_groups: dict[int, set] = {}
    for gi, g in enumerate(groups):
        tf = {d: sum(t.count(m) for m in g) for d, t in toks.items()}
        matched = {d for d, f in tf.items() if f > 0}
        df = len(matched)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d in matched:
            f = tf[d]
            s = idf * f / (f + K1 * (1 - B + B * dls[d] / avg))
            scores[d] = scores.get(d, 0.0) + s
            hit_groups.setdefault(d, set()).add(gi)
    need = len(groups) if operator == "and" else 1
    out = [(d, s) for d, s in scores.items()
           if len(hit_groups[d]) >= need]
    out.sort(key=lambda ds: (-ds[1], ds[0]))
    return out


@pytest.mark.parametrize("groups,operator", [
    ([["data", "stream"]], "or"),
    ([["data", "stream"], ["merge", "sort"]], "or"),
    ([["data", "stream"], ["merge", "sort"]], "and"),
    ([["table"], ["scan", "vector", "merge"]], "and"),
])
def test_scores_vs_brute(engine, docs_df, groups, operator):
    got = engine.search_synonym(groups, k=N, operator=operator)
    exp = _brute(docs_df, groups, operator)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got, exp):
        assert s1 == pytest.approx(s2, rel=1e-9)


def test_docs_vs_brute(engine, docs_df):
    groups = [["data", "stream"], ["merge", "sort"]]
    got = set(engine.match_synonym_docs(groups,
                                        operator="and").tolist())
    exp = {d for d, _ in _brute(docs_df, groups, "and")}
    assert got == exp


def test_sharded_identity(engine, sharded):
    groups = [["data", "stream"], ["merge", "sort"]]
    for op in ("or", "and"):
        one = engine.search_synonym(groups, k=50, operator=op)
        many = sharded.search_synonym(groups, k=50, operator=op)
        assert [d for d, _ in one] == [d for d, _ in many]
        for (_, s1), (_, s2) in zip(one, many):
            assert s1 == pytest.approx(s2, rel=1e-12)
    assert np.array_equal(
        engine.match_synonym_docs(groups, operator="and"),
        sharded.match_synonym_docs(groups, operator="and"))


def test_blended_df_differs_from_bool_should(engine):
    """The blend is NOT a should-of-terms: idf comes from the union
    df, so a rare synonym doesn't dominate like it would as its own
    clause."""
    blended = dict(engine.search_synonym([["data", "vector"]], k=N))
    should = dict(engine.search_compound(
        should=[{"match": "data"}, {"match": "vector"}], k=N))
    assert blended.keys() == should.keys()
    assert any(abs(blended[d] - should[d]) > 1e-9 for d in blended)


def test_dsl_routing(engine):
    hits = execute_dsl(engine, {"query": {"match": {
        "query": "data merge", "operator": "and",
        "synonyms": {"data": ["stream"], "merge": ["sort"]}}},
        "size": 10})
    assert hits == engine.search_synonym(
        [["data", "stream"], ["merge", "sort"]], k=10, operator="and")


def test_unknown_members_ignored(engine):
    a = engine.search_synonym([["data", "zzzz"]], k=10)
    b = engine.search_synonym([["data"]], k=10)
    assert a == b
    assert engine.search_synonym([["zzzz"]], k=10) == []
