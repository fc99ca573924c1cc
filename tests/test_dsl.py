"""JSON query DSL (query/dsl.py): routing identity vs the explicit
engine API for every leaf kind, bool composition (filters, msm, mixed
kinds → compound), sort/collapse/search_after routing, honest
ValueError boundaries, and the POST /api/search REST surface.
Reference body shape: src/embedding/mod.rs:470-539."""

import json
import threading
from http.client import HTTPConnection

import pytest

from baram_ray.query.dsl import execute_dsl, parse_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    return QueryEngine(ensure_index(SF, positions=True))


# ------------------------------------------------------------------ #
# leaf routing identity
# ------------------------------------------------------------------ #

def test_leaf_kinds_match_explicit_calls(engine):
    e = engine
    assert execute_dsl(e, {"query": {"match": "data stream"},
                           "size": 7}) == e.search("data stream", k=7)
    assert execute_dsl(e, {"query": {"match": {"query": "data"}},
                           "min_score": 0.2}) == \
        e.search("data", k=10, min_score=0.2)
    assert execute_dsl(e, {"query": {"match_phrase": "data stream"}}) \
        == e.search_phrase("data stream", k=10)
    assert execute_dsl(e, {"query": {"match_phrase":
                                     {"query": "data stream",
                                      "slop": 2}}}) == \
        e.search_phrase("data stream", k=10, slop=2)
    assert execute_dsl(e, {"query": {"prefix": "dat"}}) == \
        e.search_prefix("dat", k=10)
    assert execute_dsl(e, {"query": {"prefix": {"value": "dat",
                                                "max_expansions": 5}}}) \
        == e.search_prefix("dat", k=10, max_expansions=5)
    assert execute_dsl(e, {"query": {"wildcard": "d?ta"}}) == \
        e.search_wildcard("d?ta", k=10)
    assert execute_dsl(e, {"query": {"regexp": "st.*m"}}) == \
        e.search_regexp("st.*m", k=10)
    assert execute_dsl(e, {"query": {"regexp":
                                     {"value": "st.*m",
                                      "max_expansions": 5}}}) == \
        e.search_regexp("st.*m", k=10, max_expansions=5)
    assert execute_dsl(e, {"query": {"fuzzy": "tabel"}}) == \
        e.search_fuzzy("tabel", k=10)          # fuzziness AUTO default
    assert execute_dsl(e, {"query": {"fuzzy": {"value": "tabel",
                                               "fuzziness": 2}}}) == \
        e.search_fuzzy("tabel", k=10, max_edits=2)
    assert execute_dsl(e, {"query": {"query_string":
                                     {"query": "+data -window stream"}}}
                       ) == e.search_qs("+data -window stream", k=10)


# ------------------------------------------------------------------ #
# bool composition
# ------------------------------------------------------------------ #

def test_bool_match_only_and_filters(engine):
    e = engine
    body = {"query": {"bool": {
        "must": [{"match": "data"}],
        "should": [{"match": "stream"}, {"match": "window"}],
        "must_not": [{"match": "vector"}],
        "filter": [{"term": {"lang": "en"}},
                   {"range": {"n_chars": {"gte": 100, "lte": 500}}}],
    }}, "size": 15}
    assert execute_dsl(e, body) == e.search_bool(
        must=["data"], should=["stream", "window"], must_not=["vector"],
        k=15, filters={"lang": "en",
                       "n_chars": {"gte": 100, "lte": 500}})
    # msm passes through
    body = {"query": {"bool": {"should": [{"match": "data"},
                                          {"match": "stream"}],
                               "minimum_should_match": 2}}}
    assert execute_dsl(e, body) == e.search_bool(
        should=["data", "stream"], minimum_should_match=2, k=10)
    # term/range inside must behave as filters (the engine's
    # constant-score filter context)
    body = {"query": {"bool": {"must": [{"match": "data"},
                                        {"term": {"lang": "en"}}]}}}
    assert execute_dsl(e, body) == e.search_bool(
        must=["data"], k=10, filters={"lang": "en"})


def test_bool_mixed_kinds_route_to_compound(engine):
    e = engine
    body = {"query": {"bool": {
        "must": [{"match_phrase": "data stream"}],
        "should": [{"match": "window"}, {"prefix": "proc"}],
        "must_not": [{"wildcard": "s?a*"}],
    }}, "size": 12}
    assert execute_dsl(e, body) == e.search_compound(
        must=[{"phrase": "data stream", "slop": 0}],
        should=["window", {"prefix": "proc", "max_expansions": 50}],
        must_not=[{"wildcard": "s?a*", "max_expansions": 50}], k=12)


def test_clause_boost_routes_to_compound(engine):
    e = engine
    assert execute_dsl(e, {"query": {"match": {"query": "data",
                                               "boost": 2.0}}}) == \
        e.search_compound(should=[{"match": "data", "boost": 2.0}],
                          k=10)
    body = {"query": {"bool": {"should": [
        {"match": {"query": "data", "boost": 2.0}},
        {"match_phrase": {"query": "data stream", "boost": 0.5}}]}}}
    assert execute_dsl(e, body) == e.search_compound(
        should=[{"match": "data", "boost": 2.0},
                {"phrase": "data stream", "slop": 0, "boost": 0.5}],
        k=10)


def test_aggs(engine):
    e = engine
    body = {"query": {"match": "data stream"}, "size": 0,
            "aggs": {"by_lang": {"terms": {"field": "lang"}},
                     "chars": {"histogram": {"field": "n_chars",
                                             "interval": 100}}}}
    out = execute_dsl(e, body)
    assert out["hits"] == []
    assert out["aggregations"]["by_lang"] == [
        {"key": v, "doc_count": c}
        for _, v, c in e.facets("data stream", ["lang"])]
    assert out["aggregations"]["chars"] == [
        {"key": b, "doc_count": c}
        for b, c in e.facet_histogram("data stream", "n_chars", 100.0)]
    # match_all + filter-through-bool aggregates the whole corpus slice
    body = {"query": {"match_all": {}}, "size": 0,
            "aggs": {"src": {"terms": {"field": "source", "size": 3}}}}
    out = execute_dsl(e, body)
    full = [{"key": v, "doc_count": c}
            for _, v, c in e.facets("", ["source"])]
    assert out["aggregations"]["src"] == full[:3]
    # hits ride along when size > 0
    body = {"query": {"match": "data"}, "size": 4,
            "aggs": {"l": {"terms": {"field": "lang"}}}}
    out = execute_dsl(e, body)
    assert out["hits"] == e.search("data", k=4)
    # metric + range + cardinality agg kinds map to the facet ops
    body = {"query": {"match": "data"}, "size": 0, "aggs": {
        "st": {"stats": {"field": "n_chars"}},
        "rg": {"range": {"field": "n_chars",
                         "ranges": [{"to": 100},
                                    {"from": 100, "to": 300},
                                    {"from": 300}]}},
        "card": {"cardinality": {"field": "source"}},
        "mx": {"max": {"field": "n_chars"}},
        "vc": {"value_count": {"field": "n_chars"}}}}
    out = execute_dsl(e, body)["aggregations"]
    st = e.facet_stats("data", "n_chars")
    assert out["st"] == st
    assert out["mx"] == {"value": st["max"]}
    assert out["vc"] == {"value": st["count"]}
    assert out["card"] == {"value": e.facet_cardinality("data",
                                                        "source")}
    rows = e.facet_ranges("data", "n_chars",
                          body["aggs"]["rg"]["range"]["ranges"])
    c0, c1, c2 = (c for _, _, c in rows)
    assert out["rg"] == [
        {"key": "*-100.0", "to": 100.0, "doc_count": c0},
        {"key": "100.0-300.0", "from": 100.0, "to": 300.0,
         "doc_count": c1},
        {"key": "300.0-*", "from": 300.0, "doc_count": c2}]
    # nested metric sub-aggs under terms buckets
    body = {"query": {"match": "data"}, "size": 0, "aggs": {
        "by_lang": {"terms": {"field": "lang", "size": 3},
                    "aggs": {"chars": {"stats": {"field": "n_chars"}},
                             "mx": {"max": {"field": "n_chars"}}}}}}
    out = execute_dsl(e, body)["aggregations"]["by_lang"]
    gs = e.facet_group_stats("data", "lang", "n_chars")[:3]
    assert out == [
        {"key": v, "doc_count": c,
         "chars": {"count": c, "min": lo, "max": hi, "sum": tot,
                   "avg": avg},
         "mx": {"value": hi}}
        for v, c, lo, hi, tot, avg in gs]
    # non-metric sub-agg is an honest error
    with pytest.raises(ValueError):
        execute_dsl(e, {"query": {"match": "data"}, "aggs": {
            "b": {"terms": {"field": "lang"},
                  "aggs": {"t": {"terms": {"field": "source"}}}}}})
    # aggs need a match/match_all query
    with pytest.raises(ValueError):
        execute_dsl(e, {"query": {"bool": {"must": [{"match": "a"},
                                                    {"match": "b"}]}},
                        "aggs": {"l": {"terms": {"field": "lang"}}}})
    with pytest.raises(ValueError):
        execute_dsl(e, {"query": {"match": "a"},
                        "aggs": {"l": {"percentiles":
                                       {"field": "lang"}}}})
    # match_all without aggs has no ranking
    with pytest.raises(ValueError):
        execute_dsl(e, {"query": {"match_all": {}}})


# ------------------------------------------------------------------ #
# sort / collapse / search_after
# ------------------------------------------------------------------ #

def test_sort_collapse_after_routing(engine):
    e = engine
    assert execute_dsl(e, {"query": {"match": "data stream"},
                           "sort": [{"n_chars": {"order": "desc"}}],
                           "size": 5}) == \
        e.search_sorted("data stream", "n_chars", k=5, ascending=False)
    assert execute_dsl(e, {"query": {"match": "data stream"},
                           "sort": "n_chars", "size": 5}) == \
        e.search_sorted("data stream", "n_chars", k=5, ascending=True)
    assert execute_dsl(e, {"query": {"match": "data stream"},
                           "collapse": {"field": "source"},
                           "size": 5}) == \
        e.search_collapse("data stream", "source", k=5)
    assert execute_dsl(e, {"query": {"match": "data stream"},
                           "collapse": {"field": "source"},
                           "sort": [{"n_chars": "desc"}], "size": 5}) \
        == e.search_collapse_sorted("data stream", "source", "n_chars",
                                    k=5, ascending=False)
    page1 = e.search("data stream", k=5)
    body = {"query": {"match": "data stream"}, "size": 5,
            "search_after": [page1[-1][1], page1[-1][0]]}
    assert execute_dsl(e, body) == e.search(
        "data stream", k=5, after=(page1[-1][1], page1[-1][0]))


# ------------------------------------------------------------------ #
# honest boundaries
# ------------------------------------------------------------------ #

def test_dsl_error_shapes(engine):
    e = engine
    for body in (
        {"query": {"bool": {"filter": [{"term": {"lang": "en"}}]}}},
        {"query": {"term": {"lang": "en"}}},
        {"query": {"bool": {"should": [{"term": {"lang": "en"}}]}}},
        {"query": {"match": "x", "prefix": "y"}},
        {"query": {"match": "x"}, "sort": [{"a": "asc"}, {"b": "asc"}]},
        {"query": {"bool": {"must": [{"match": "a"},
                                     {"match": "b"}]}},
         "sort": "n_chars"},
        {"query": {"query_string": {"query": "a"}}, "sort": "n_chars"},
        {"size": 5},
        {"query": {"range": {"n_chars": {"between": 1}}}},
    ):
        with pytest.raises(ValueError):
            execute_dsl(e, body)
    # nested bool is no longer an error: it routes to the recursive
    # tree evaluator (empty child bool == match_all)
    got = execute_dsl(e, {"query": {"bool": {
        "must": [{"bool": {"must": []}}]}}, "size": 3})
    assert len(got) == 3 and all(s == 0.0 for _, s in got)


def test_parse_query_pure():
    plan = parse_query({"bool": {
        "must": [{"match": "a"}],
        "should": [{"fuzzy": {"value": "b", "fuzziness": "AUTO"}}],
        "filter": {"term": {"lang": "en"}},       # bare dict, not list
    }})
    assert plan.must == [{"match": "a"}]
    assert plan.should[0]["fuzzy"] == "b"
    assert plan.should[0]["max_edits"] is None
    assert plan.filters == {"lang": "en"}


# ------------------------------------------------------------------ #
# sharded + actor + REST surfaces
# ------------------------------------------------------------------ #

def test_sharded_dsl_matches_single(engine, ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import ShardedEngine
    from baram_ray.query.qparse import UnsupportedQuery
    sh = ShardedEngine(ensure_index(SF, positions=True), n_groups=2)
    body = {"query": {"bool": {"must": [{"match_phrase": "data stream"}],
                               "should": [{"match": "window"}]}},
            "size": 8}
    assert execute_dsl(sh, body) == execute_dsl(engine, body)
    with pytest.raises(UnsupportedQuery):
        execute_dsl(sh, {"query": {"prefix": "dat"}})


def test_actor_dsl_kind(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryActor
    a = QueryActor(ensure_index(SF, positions=True))
    body = {"query": {"bool": {"must": [{"match": "data"}],
                               "must_not": [{"match": "vector"}]}}}
    assert a.serve("dsl", json.dumps(body), k=5) == \
        a.engine.search_bool(must=["data"], must_not=["vector"], k=5)


def test_rest_post_search(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.serve import create_server
    srv = create_server(ensure_index(SF, positions=True), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]

        def post(obj):
            conn = HTTPConnection(host, port, timeout=10)
            conn.request("POST", "/api/search", body=json.dumps(obj),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            out = json.loads(r.read())
            conn.close()
            return r.status, out

        body = {"query": {"bool": {
            "must": [{"match_phrase": "data stream"}],
            "should": [{"match": "window"}],
            "filter": [{"term": {"lang": "en"}}]}}, "size": 5}
        status, out = post(body)
        assert status == 200
        exp = srv.engine.search_compound(
            must=[{"phrase": "data stream", "slop": 0}],
            should=["window"], k=5, filters={"lang": "en"})
        assert [(r["doc_id"], r["score"]) for r in out["results"]] == exp
        # size cap at MAX_K
        status, out = post({"query": {"match": "data"}, "size": 10_000})
        assert status == 200 and len(out["results"]) <= 100
        # sorted body returns sort_value rows
        status, out = post({"query": {"match": "data stream"},
                            "sort": [{"n_chars": "desc"}], "size": 3})
        assert status == 200
        assert all("sort_value" in r for r in out["results"])
        # bad body → 400 with message
        status, out = post({"query": {"term": {"lang": "en"}}})
        assert status == 400 and "error" in out
    finally:
        srv.shutdown()
