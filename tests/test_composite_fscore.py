"""composite aggregation (paginated buckets, OpenSearch after-cursor)
and function_score/field_value_factor: recompute identity vs pandas,
page-chain completeness, sharded == single, and JSON-DSL routing.
Reference surface: OpenSearch composite agg + function_score query
classes behind the search API the reference delegates to."""

import math
import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_cfs_idx"
SRC = "/tmp/baram_test_cfs_docs.parquet"
N = 260
VOCAB = ["data", "stream", "table", "scan", "merge", "sort", "vector",
         "batch", "index", "query", "shard", "cache"]


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(N):
        words = list(rng.choice(VOCAB, size=int(rng.integers(3, 25))))
        text = " ".join(words)
        rows.append({
            "doc_id": i,
            "text": text,
            "lang": ["en", "de", "fr", "ko"][i % 4],
            "source": f"s{i % 7}",
            "n_chars": len(text),
        })
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), num_shards=4,
                      keep=("lang", "source", "n_chars"))
    build_index(SRC, OUT, cfg, resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


@pytest.fixture(scope="module")
def matched(docs_df):
    return docs_df[docs_df["text"].str.split().map(
        lambda ws: "data" in ws)]


def _paginate(eng, sources, size, query="data"):
    """Drive the after-cursor chain to exhaustion; return all buckets."""
    out, after = [], None
    while True:
        page = eng.facet_composite(query, sources, size=size,
                                   after=after)
        if not page:
            return out
        assert len(page) <= size
        out.extend(page)
        after = tuple(page[-1]["key"][f] for f in sources)


# ------------------------------------------------------------------ #
# composite
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("sources", [["lang"], ["lang", "source"],
                                     ["source", "n_chars"]])
@pytest.mark.parametrize("size", [3, 10])
def test_composite_page_chain_exact(engine, matched, sources, size):
    got = _paginate(engine, sources, size)
    want = (matched.groupby(sources).size().sort_index())
    keys = [tuple(b["key"][f] for f in sources) for b in got]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    want_keys = [k if isinstance(k, tuple) else (k,)
                 for k in want.index]
    assert keys == want_keys
    assert [b["doc_count"] for b in got] == list(want.values)


def test_composite_after_exclusive(engine):
    first = engine.facet_composite("data", ["lang"], size=2)
    cur = tuple(first[-1]["key"][f] for f in ["lang"])
    nxt = engine.facet_composite("data", ["lang"], size=2, after=cur)
    assert all(tuple(b["key"][f] for f in ["lang"]) > cur
               for b in nxt)


@pytest.mark.parametrize("size", [1, 4, 100])
def test_composite_sharded_identity(engine, sharded, size):
    after = None
    for _ in range(30):
        single = engine.facet_composite("data", ["lang", "source"],
                                        size=size, after=after)
        shd = sharded.facet_composite("data", ["lang", "source"],
                                      size=size, after=after)
        assert single == shd
        if not single:
            break
        after = tuple(single[-1]["key"][f]
                      for f in ["lang", "source"])


def test_composite_empty_and_size0(engine):
    assert engine.facet_composite("qqqzznohit", ["lang"]) == []
    assert engine.facet_composite("data", ["lang"], size=0) == []


def test_composite_dsl_roundtrip(engine, matched):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"pg": {"composite": {
                "sources": [{"l": {"terms": {"field": "lang"}}},
                            {"s": {"terms": {"field": "source"}}}],
                "size": 5}}}}
    seen = []
    after = None
    while True:
        if after is not None:
            body["aggs"]["pg"]["composite"]["after"] = after
        out = execute_dsl(engine, body)["aggregations"]["pg"]
        if not out["buckets"]:
            assert out["after_key"] is None
            break
        assert out["after_key"] == out["buckets"][-1]["key"]
        seen.extend(out["buckets"])
        after = out["after_key"]
    want = matched.groupby(["lang", "source"]).size().sort_index()
    assert [(b["key"]["l"], b["key"]["s"]) for b in seen] == \
        list(want.index)
    assert [b["doc_count"] for b in seen] == list(want.values)


# ------------------------------------------------------------------ #
# function_score
# ------------------------------------------------------------------ #

MODS = {"none": lambda x: x,
        "ln1p": lambda x: math.log(1.0 + x),
        "log1p": lambda x: math.log10(1.0 + x),
        "sqrt": math.sqrt,
        "square": lambda x: x * x,
        "reciprocal": lambda x: 1.0 / x}


@pytest.mark.parametrize("modifier", sorted(MODS))
def test_fscore_replace_recompute(engine, matched, modifier):
    got = engine.search_function_score(
        "data", k=15, field="n_chars", factor=2.0, modifier=modifier,
        boost_mode="replace")
    want = sorted(((int(d), MODS[modifier](2.0 * int(c)))
                   for d, c in zip(matched["doc_id"],
                                   matched["n_chars"])),
                  key=lambda r: (-r[1], r[0]))[:15]
    assert got == want


def test_fscore_multiply_recompute(engine):
    base = dict(engine.search("data stream", k=10**9))
    got = engine.search_function_score(
        "data stream", k=20, field="n_chars", factor=1.0,
        modifier="ln1p", boost_mode="multiply")
    meta = {int(d): s for d, s in zip(
        engine.r.doc_ids, engine.r.doc_meta["n_chars"])}
    want = sorted(((d, s * math.log(1.0 + float(meta[d])))
                   for d, s in base.items()),
                  key=lambda r: (-r[1], r[0]))[:20]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=1e-12)


@pytest.mark.parametrize("boost_mode", ["replace", "multiply"])
def test_fscore_sharded_identity(engine, sharded, boost_mode):
    kw = dict(k=25, field="n_chars", factor=1.5, modifier="ln1p",
              boost_mode=boost_mode)
    assert engine.search_function_score("data", **kw) == \
        sharded.search_function_score("data", **kw)


def test_fscore_filters_and_edges(engine, matched):
    got = engine.search_function_score(
        "data", k=10**9, field="n_chars", modifier="none",
        boost_mode="replace", filters={"lang": "en"})
    want = matched[matched["lang"] == "en"]
    assert {d for d, _ in got} == set(want["doc_id"])
    assert engine.search_function_score("qqqzznohit", k=5,
                                        field="n_chars") == []
    assert engine.search_function_score("data", k=0,
                                        field="n_chars") == []
    with pytest.raises(ValueError):
        engine.search_function_score("data", k=5, field="n_chars",
                                     modifier="cube")
    with pytest.raises(ValueError):
        engine.search_function_score("data", k=5, field="n_chars",
                                     boost_mode="sum")


def test_fscore_dsl_routing(engine):
    body = {"query": {"function_score": {
        "query": {"bool": {"filter": [{"term": {"lang": "en"}},
                                      {"match": "data"}]}},
        "field_value_factor": {"field": "n_chars", "factor": 2.0,
                               "modifier": "ln1p"},
        "boost_mode": "replace"}}, "size": 12}
    assert execute_dsl(engine, body) == engine.search_function_score(
        "data", k=12, field="n_chars", factor=2.0, modifier="ln1p",
        boost_mode="replace", filters={"lang": "en"})
    body_m = {"query": {"function_score": {
        "query": {"match": "data stream"},
        "field_value_factor": {"field": "n_chars",
                               "modifier": "sqrt"}}}, "size": 8}
    assert execute_dsl(engine, body_m) == engine.search_function_score(
        "data stream", k=8, field="n_chars", modifier="sqrt",
        boost_mode="multiply")


def test_composite_empty_sources_refused(engine):
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"match": "data"}, "size": 0,
                             "aggs": {"pg": {"composite":
                                             {"sources": []}}}})


# ------------------------------------------------------------------ #
# filters aggregation (named predicate buckets)
# ------------------------------------------------------------------ #

def test_filters_agg(engine, sharded, docs_df, matched):
    buckets = {
        "en_or_fr": {"bool": {"should": [{"term": {"lang": "en"}},
                                         {"term": {"lang": "fr"}}]}},
        "has_vector": {"match": "vector"},
        "long": {"range": {"n_chars": {"gte": 60}}},
    }
    got = dict(engine.facet_filters("data", buckets))
    ws = matched["text"].str.split()
    assert got["en_or_fr"] == int(
        matched["lang"].isin(["en", "fr"]).sum())
    assert got["has_vector"] == int(
        ws.map(lambda w: "vector" in w).sum())
    assert got["long"] == int((matched["n_chars"] >= 60).sum())
    # sharded sums exactly; DSL shape
    assert sharded.facet_filters("data", buckets) == \
        engine.facet_filters("data", buckets)
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"fb": {"filters": {"filters": buckets}}}})
    assert out["aggregations"]["fb"]["buckets"] == {
        n: {"doc_count": c} for n, c in got.items()}
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"match": "data"}, "size": 0,
                             "aggs": {"fb": {"filters":
                                             {"filters": {}}}}})
