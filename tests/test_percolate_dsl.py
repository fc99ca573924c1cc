"""DSL-body percolation: percolator-hit == engine-retrieval
equivalence (a doc percolates a body iff the SAME body, executed
against an index of the corpus, retrieves that doc), plus node
semantics units (sloppy phrase chain rule, bool msm default,
range/exists/terms predicates)."""

import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.percolate import DslPercolateStage, doc_matches
from baram_ray.query.engine import QueryEngine
from baram_ray.tokenizer import tokenize_with_positions

OUT = "/tmp/baram_test_percdsl_idx"
SRC = "/tmp/baram_test_percdsl_docs.parquet"
N = 200
VOCAB = ["data", "stream", "table", "scan", "merge", "sort",
         "vector", "hash"]

BODIES = {
    0: {"bool": {"must": [{"match": "data stream"}],
                 "must_not": [{"match": "vector"}]}},
    1: {"bool": {"filter": [{"term": {"lang": "en"}}],
                 "must": [{"match_phrase": {"query": "table scan",
                                            "slop": 1}}]}},
    2: {"bool": {"should": [{"match": "merge"}, {"match": "sort"}],
                 "minimum_should_match": 2}},
    3: {"bool": {"filter": [{"range": {"n_chars": {"gte": 60,
                                                   "lt": 120}}}],
                 "must": [{"match": "hash"}]}},
}


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(53)
    rows = []
    for i in range(N):
        words = list(rng.choice(VOCAB, size=int(rng.integers(4, 25))))
        text = " ".join(words)
        rows.append({"doc_id": i, "text": text,
                     "lang": ["en", "ko"][i % 2],
                     "n_chars": len(text)})
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


def _percolate(docs_df):
    import pyarrow as pa
    stage = DslPercolateStage(BODIES, meta_cols=("lang", "n_chars"))
    t = stage(pa.Table.from_pandas(docs_df))
    return set(zip(t["doc_id"].to_pylist(),
                   t["query_id"].to_pylist()))


def test_percolate_equals_engine_retrieval(ray_session, docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    build_index(SRC, OUT, IndexConfig(fields=("text",), id_cols=(),
                                      num_shards=4, positions=True,
                                      keep=("lang", "n_chars")),
                resume=False)
    eng = QueryEngine(OUT)
    got = _percolate(docs_df)
    exp = set()
    # the same bodies, executed as retrieval against the index
    # engine bool clauses are any-term; the DSL match is conjunctive,
    # so one match clause of two terms == two single-term must clauses
    for d in eng.search_bool(must=["data", "stream"],
                             must_not=["vector"], k=N + 1):
        exp.add((d[0], 0))
    for d in eng.match_phrase_docs("table scan", slop=1,
                                   filters={"lang": "en"}):
        exp.add((int(d), 1))
    for d in eng.search_bool(should=["merge", "sort"],
                             minimum_should_match=2, k=N + 1):
        exp.add((d[0], 2))
    for d, _ in eng.search("hash", k=N + 1,
                           filters={"n_chars": {"gte": 60,
                                                "lt": 120}}):
        exp.add((d, 3))
    assert got == exp


def _m(text, node, **meta):
    toks, poss = tokenize_with_positions(text)
    return doc_matches(set(toks), toks, poss, meta, node)


def test_node_semantics():
    assert _m("a data big stream", {"match": "data stream"})
    assert not _m("a data big", {"match": "data stream"})
    # phrase slop: ordered chain, slack bound
    assert _m("table scan", {"match_phrase": "table scan"})
    assert not _m("scan table", {"match_phrase": "table scan"})
    assert _m("table big scan",
              {"match_phrase": {"query": "table scan", "slop": 1}})
    assert not _m("table big big scan",
                  {"match_phrase": {"query": "table scan",
                                    "slop": 1}})
    assert _m("x", {"term": {"lang": "en"}}, lang="en")
    assert not _m("x", {"term": {"lang": "en"}}, lang="ko")
    assert _m("x", {"terms": {"lang": ["en", "fr"]}}, lang="fr")
    assert _m("x", {"range": {"v": {"gte": 3, "lt": 5}}}, v=3)
    assert not _m("x", {"range": {"v": {"gte": 3, "lt": 5}}}, v=5)
    assert _m("x", {"exists": {"field": "v"}}, v=1.0)
    assert not _m("x", {"exists": {"field": "v"}}, v=float("nan"))
    # bool msm default: 1 without must/filter, 0 with
    assert not _m("merge", {"bool": {"should": [{"match": "sort"}]}})
    assert _m("merge", {"bool": {"must": [{"match": "merge"}],
                                 "should": [{"match": "sort"}]}})
    with pytest.raises(ValueError, match="does not support"):
        _m("x", {"fuzzy": "daat"})
