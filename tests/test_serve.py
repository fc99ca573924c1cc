"""REST API surface (baram_ray/serve.py): endpoint parity with the
reference's axum routes (src/commands/serve.rs:753-757) — health,
search modes, k cap, explain, events from the S9 cluster-JSON dir."""

import json
import threading
from http.client import HTTPConnection

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    from baram_ray.clustering import write_cluster_json
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.serve import create_server
    import pandas as pd
    clusters = pd.DataFrame([
        {"event_id": "evt_20240101_001", "title": "a", "article_count": 3,
         "category": "x", "avg_similarity": 0.9},
        {"event_id": "evt_20240101_002", "title": "b", "article_count": 7,
         "category": "y", "avg_similarity": 0.8},
    ])
    cdir = str(tmp_path_factory.mktemp("clusters"))
    write_cluster_json(clusters, cdir)
    srv = create_server(ensure_index(SF, positions=True), port=0,
                        clusters_dir=cdir,
                        corpus_path=f"{SF}/documents.parquet")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(server, path):
    host, port = server.server_address[:2]
    conn = HTTPConnection(host, port, timeout=10)
    conn.request("GET", path)
    r = conn.getresponse()
    body = json.loads(r.read())
    conn.close()
    return r.status, body


def test_health(server):
    status, body = _get(server, "/api/health")
    assert status == 200
    assert body["status"] == "ok" and body["n_docs"] == 500


def test_search_matches_engine(server):
    status, body = _get(server, "/api/search?q=data+processing&k=5")
    assert status == 200
    hits = server.engine.search("data processing", k=5)
    assert [(r["doc_id"], r["score"]) for r in body["results"]] == \
        [(d, s) for d, s in hits]
    assert [r["rank"] for r in body["results"]] == [1, 2, 3, 4, 5]


def test_search_modes_and_k_cap(server):
    for mode, q in [("phrase", "table+scan"), ("prefix", "dat"),
                    ("fuzzy", "dataa"), ("wildcard", "dat*")]:
        status, body = _get(server, f"/api/search?q={q}&mode={mode}&k=3")
        assert status == 200, mode
        assert len(body["results"]) <= 3
    # k caps at 100 (serve.rs:426)
    status, body = _get(server, "/api/search?q=data&k=5000")
    assert status == 200 and len(body["results"]) <= 100
    # sloppy phrase via query param
    status, body = _get(server,
                        "/api/search?q=table+scan&mode=phrase&slop=2")
    assert status == 200
    # unknown mode -> 400
    status, _ = _get(server, "/api/search?q=x&mode=nope")
    assert status == 400


def test_explain_endpoint(server):
    d, s = server.engine.search("data", k=1)[0]
    status, body = _get(server, f"/api/explain?q=data&doc_id={d}")
    assert status == 200 and body["matched"]
    assert body["score"] == pytest.approx(s)


def test_events(server):
    status, body = _get(server, "/api/events")
    assert status == 200 and body["total"] == 2
    # sorted by article_count desc (engine.rs:122)
    assert [e["event_id"] for e in body["events"]] == \
        ["evt_20240101_002", "evt_20240101_001"]
    status, one = _get(server, "/api/events/evt_20240101_001")
    assert status == 200 and one["article_count"] == 3
    status, _ = _get(server, "/api/events/evt_nope")
    assert status == 404


def test_not_found(server):
    status, _ = _get(server, "/api/zzz")
    assert status == 404


def _post(server, path, obj):
    host, port = server.server_address[:2]
    conn = HTTPConnection(host, port, timeout=10)
    body = json.dumps(obj)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_search_highlight(server):
    import duckdb
    from baram_ray.query.highlight import snippets_for_hit
    from baram_ray.tokenizer import tokenize
    status, body = _get(server,
                        "/api/search?q=data+stream&k=3&highlight=1")
    assert status == 200 and len(body["results"]) == 3
    con = duckdb.connect()
    terms = sorted(set(tokenize("data stream")))
    for r in body["results"]:
        text = con.execute(
            f"SELECT text FROM '{SF}/documents.parquet' "
            f"WHERE doc_id = {r['doc_id']}").fetchone()[0]
        snip = snippets_for_hit(text, terms)
        assert r["content"] == snip["content"]
        assert r["highlights"] == snip["highlights"]
        assert any("<mark>" in h for h in r["highlights"])
    # expansion modes refuse highlight honestly
    status, _ = _get(server,
                     "/api/search?q=dat&mode=prefix&highlight=1")
    assert status == 400
    # no corpus_path → honest 400 (fresh server without corpus)
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.serve import create_server
    import threading
    srv2 = create_server(ensure_index(SF, positions=True), port=0)
    t = threading.Thread(target=srv2.serve_forever, daemon=True)
    t.start()
    try:
        status, body = _get(srv2, "/api/search?q=data&highlight=1")
        assert status == 400 and "corpus_path" in body["error"]
    finally:
        srv2.shutdown()


def test_search_post_aggs(server):
    e = server.engine
    body = {"query": {"match": "data"}, "size": 3,
            "aggs": {"by_lang": {"terms": {"field": "lang"}}}}
    status, out = _post(server, "/api/search", body)
    assert status == 200
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == \
        [(d, s) for d, s in e.search("data", k=3)]
    assert out["aggregations"]["by_lang"] == [
        {"key": v, "doc_count": c} for _, v, c in e.facets("data", ["lang"])]
    # match_all + size 0: corpus-wide aggregation, no hits
    status, out = _post(server, "/api/search",
                        {"query": {"match_all": {}}, "size": 0,
                         "aggs": {"src": {"terms": {"field": "source"}}}})
    assert status == 200 and out["results"] == []
    assert out["aggregations"]["src"] == [
        {"key": v, "doc_count": c} for _, v, c in e.facets("", ["source"])]
    # aggs + sort is an honest 400, not silently-wrong
    status, _ = _post(server, "/api/search",
                      {"query": {"match": "data"}, "sort": "lang",
                       "aggs": {"l": {"terms": {"field": "lang"}}}})
    assert status == 400


def test_embed_endpoints(server):
    from baram_ray.stages.embed import EmbedStage
    status, one = _post(server, "/embed", {"text": "hello world"})
    assert status == 200
    # deterministic: equals the stub encoder directly
    assert one["embedding"] == EmbedStage()._encode_one("hello world").tolist()
    status, batch = _post(server, "/embed/batch",
                          {"texts": ["a", "b", "a"]})
    assert status == 200 and len(batch["embeddings"]) == 3
    assert batch["embeddings"][0] == batch["embeddings"][2]
    # batch cap at 100 (serve.rs:231-235)
    status, err = _post(server, "/embed/batch", {"texts": ["x"] * 101})
    assert status == 400
    # malformed
    status, _ = _post(server, "/embed", {"nope": 1})
    assert status == 400


def test_bm25_p95_under_10ms_at_sf01(ray_session):
    """Serving-latency regression gate (round-3 verdict #7): resident
    single-stream BM25 top-10 at sf0.1 keeps p95 under 10 ms — an
    order of magnitude of headroom over the steady-state 0.6-1 ms so
    the shared host's 3-5x noise windows can't flake it; best of two
    measurement windows guards the rest."""
    import time

    from baram_ray.pipelines.search import DOC_QUERIES, ensure_index
    from baram_ray.query.engine import QueryEngine

    eng = QueryEngine(ensure_index("/root/testdata/sf0.1"))
    texts = [q["text"] for q in DOC_QUERIES if "qqq" not in q["text"]]
    for t in texts:                      # warm postings/doc caches
        eng.search(t, k=10)
    best_p95 = float("inf")
    for _ in range(2):
        lat = []
        for t in texts * 8:
            t0 = time.perf_counter()
            eng.search(t, k=10)
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        best_p95 = min(best_p95, lat[int(0.95 * len(lat)) - 1])
    assert best_p95 < 10.0, f"p95 {best_p95:.2f} ms"


def test_search_post_extended_dsl(server):
    """The round-4 DSL surface over POST /api/search: dis_max,
    function_score, constant_score bodies and composite / percentiles
    / significant_text aggs all serve and match the engine."""
    e = server.engine
    # dis_max
    status, out = _post(server, "/api/search", {
        "query": {"dis_max": {"queries": [
            {"match": "data"}, {"match_phrase_prefix": "data pro"}],
            "tie_breaker": 0.3}}, "size": 5})
    assert status == 200
    want = e.search_dismax([{"match": "data"},
                            {"phrase_prefix": "data pro",
                             "max_expansions": 50}],
                           tie_breaker=0.3, k=5)
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == want
    # function_score (multiply over BM25)
    status, out = _post(server, "/api/search", {
        "query": {"function_score": {
            "query": {"match": "data stream"},
            "field_value_factor": {"field": "n_chars",
                                   "modifier": "ln1p"}}}, "size": 4})
    assert status == 200
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == \
        e.search_function_score("data stream", k=4, field="n_chars",
                                modifier="ln1p",
                                boost_mode="multiply")
    # constant_score
    status, out = _post(server, "/api/search", {
        "query": {"constant_score": {
            "filter": [{"term": {"lang": "en"}}], "boost": 2.0}},
        "size": 3})
    assert status == 200
    assert all(r["score"] == 2.0 for r in out["results"])
    # composite agg: page 1 then after-cursor page 2, JSON-clean
    body = {"query": {"match_all": {}}, "size": 0,
            "aggs": {"pg": {"composite": {
                "sources": [{"lang": {"terms": {"field": "lang"}}}],
                "size": 2}}}}
    status, out = _post(server, "/api/search", body)
    assert status == 200
    pg = out["aggregations"]["pg"]
    assert len(pg["buckets"]) == 2 and pg["after_key"] is not None
    body["aggs"]["pg"]["composite"]["after"] = pg["after_key"]
    status, out2 = _post(server, "/api/search", body)
    assert status == 200
    keys1 = [b["key"]["lang"] for b in pg["buckets"]]
    keys2 = [b["key"]["lang"]
             for b in out2["aggregations"]["pg"]["buckets"]]
    assert keys2 and min(keys2) > max(keys1)
    # percentiles + significant_text serve as JSON
    status, out = _post(server, "/api/search", {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"pc": {"percentiles": {"field": "n_chars"}},
                 "sig": {"significant_text": {"field": "text",
                                              "size": 3}}}})
    assert status == 200
    assert set(out["aggregations"]["pc"]["values"]) == \
        {"1", "5", "25", "50", "75", "95", "99"}
    for b in out["aggregations"]["sig"]:
        assert {"key", "doc_count", "bg_count", "score"} <= set(b)


def test_msearch_bulk(server):
    """POST /api/msearch: one round trip, per-slot responses, per-slot
    errors (a bad body never fails the batch) — OpenSearch _msearch
    contract."""
    e = server.engine
    bodies = [
        {"query": {"match": "data"}, "size": 3},
        {"query": {"bool": {"must": [{"match": "data"}],
                            "filter": [{"terms":
                                        {"lang": ["en", "de"]}}]}},
         "size": 2},
        {"query": {"nope": 1}},                      # bad slot
        {"query": {"match_all": {}}, "size": 0,
         "aggs": {"l": {"terms": {"field": "lang"}}}},
    ]
    status, out = _post(server, "/api/msearch", bodies)
    assert status == 200 and len(out["responses"]) == 4
    assert [(r["doc_id"], r["score"])
            for r in out["responses"][0]["results"]] == \
        e.search("data", k=3)
    assert [(r["doc_id"], r["score"])
            for r in out["responses"][1]["results"]] == \
        e.search("data", k=2, filters={"lang": ["en", "de"]})
    assert "error" in out["responses"][2]
    assert out["responses"][3]["aggregations"]["l"] == [
        {"key": v, "doc_count": c} for _, v, c in e.facets("", ["lang"])]
    # non-list payload is a 400
    status, _ = _post(server, "/api/msearch", {"query": {}})
    assert status == 400


def test_analyze_and_stats(server):
    from baram_ray.tokenizer import tokenize
    status, out = _get(server, "/api/analyze?text=Data+processing")
    assert status == 200
    assert [t["token"] for t in out["tokens"]] == \
        tokenize("Data processing")
    assert [t["position"] for t in out["tokens"]] == \
        list(range(len(out["tokens"])))
    status, st = _get(server, "/api/stats")
    assert status == 200 and st["n_docs"] == 500
    assert st["n_live"] <= st["n_docs"] and "text" in st["fields"]
    assert st["n_terms"]["text"] > 0


def test_scroll_pages_equal_one_shot(server):
    """Scroll pages concatenated == one big search; cursor state is
    server-held; exhausted/cleared/expired ids 404 or report empty."""
    st, big = _post(server, "/api/search",
                    {"query": {"match": "data stream"}, "size": 40})
    assert st == 200
    st, page = _post(server, "/api/search",
                     {"query": {"match": "data stream"}, "size": 7,
                      "scroll": "30s"})
    assert st == 200 and "scroll_id" in page
    sid = page["scroll_id"]
    got = list(page["results"])
    for _ in range(20):
        st, nxt = _post(server, "/api/scroll",
                        {"scroll_id": sid, "scroll": "30s"})
        assert st == 200
        if not nxt["results"]:
            break
        got.extend(nxt["results"])
        if len(got) >= 40:
            break
    assert [h["doc_id"] for h in got[:40]] == \
        [h["doc_id"] for h in big["results"]]
    assert [h["score"] for h in got[:40]] == \
        [h["score"] for h in big["results"]]


def test_scroll_sorted_and_lifecycle(server):
    # sorted scroll uses the composite (sort_value, doc_id) cursor
    st, big = _post(server, "/api/search",
                    {"query": {"match": "data"}, "size": 30,
                     "sort": [{"n_chars": {"order": "desc"}}]})
    assert st == 200
    st, p1 = _post(server, "/api/search",
                   {"query": {"match": "data"}, "size": 15,
                    "sort": [{"n_chars": {"order": "desc"}}],
                    "scroll": "30s"})
    assert st == 200
    st, p2 = _post(server, "/api/scroll", {"scroll_id":
                                           p1["scroll_id"]})
    assert st == 200
    both = p1["results"] + p2["results"]
    assert [h["doc_id"] for h in both] == \
        [h["doc_id"] for h in big["results"]]
    # clear → gone
    st, out = _post(server, "/api/scroll",
                    {"scroll_id": p1["scroll_id"], "clear": True})
    assert st == 200
    st, out = _post(server, "/api/scroll",
                    {"scroll_id": p1["scroll_id"]})
    assert st == 404
    # unknown id
    st, _ = _post(server, "/api/scroll", {"scroll_id": "nope"})
    assert st == 404
    # scroll refuses agg bodies
    st, out = _post(server, "/api/search",
                    {"query": {"match": "data"}, "scroll": "1m",
                     "aggs": {"l": {"terms": {"field": "lang"}}}})
    assert st == 400


def test_termvectors_endpoint(server):
    st, out = _get(server, "/api/termvectors?doc_id=3")
    assert st == 200 and out["found"] and out["doc_id"] == 3
    # term_freq sums to the analyzed doc length; df/cf >= tf
    assert sum(v["term_freq"] for v in out["terms"].values()) > 0
    for t, v in out["terms"].items():
        assert v["doc_freq"] >= 1
        assert v["total_freq"] >= v["term_freq"]
    st, out = _get(server, "/api/termvectors?doc_id=999999999")
    assert st == 200 and not out["found"] and out["terms"] == {}
    st, _ = _get(server, "/api/termvectors")
    assert st == 400


def test_analyze_with_filter_chain(server):
    st, out = _get(server,
                   "/api/analyze?text=the%20Queries&filter=stop,porter")
    assert st == 200
    assert [t["token"] for t in out["tokens"]] == ["queri"]
    st, out = _get(server, "/api/analyze?text=the%20Queries")
    assert [t["token"] for t in out["tokens"]] == ["the", "queries"]
    st, out = _get(server,
                   "/api/analyze?text=x&filter=bogus")
    assert st == 400


def test_search_post_pipeline_and_misc_aggs(server):
    st, out = _post(server, "/api/search", {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"langs": {"terms": {"field": "lang"}, "aggs": {
            "chars": {"sum": {"field": "n_chars"}},
            "avgc": {"bucket_script": {
                "buckets_path": {"s": "chars", "c": "_count"},
                "script": "params.s / params.c"}}}},
            "best": {"max_bucket": {"buckets_path": "langs>chars"}},
            "adj": {"adjacency_matrix": {"filters": {
                "en": {"term": {"lang": "en"}},
                "vec": {"match": "vector"}}}}}})
    assert st == 200
    a = out["aggregations"]
    assert a["best"]["value"] == max(
        b["chars"]["value"] for b in a["langs"])
    for b in a["langs"]:
        assert b["avgc"]["value"] == pytest.approx(
            b["chars"]["value"] / b["doc_count"])
    assert all(b["doc_count"] > 0 for b in a["adj"])
    # synonym + span bodies through the POST path
    st, out = _post(server, "/api/search", {
        "query": {"match": {"query": "data", "synonyms":
                            {"data": ["stream"]}}}, "size": 3})
    assert st == 200 and len(out["results"]) == 3
    st, out = _post(server, "/api/search", {
        "query": {"span_near": {"clauses": [
            {"span_term": {"text": "data"}},
            {"span_term": {"text": "stream"}}], "slop": 3,
            "in_order": False}}, "size": 3})
    assert st == 200


def test_percolator_endpoints(server):
    st, out = _post(server, "/api/percolator/register",
                    {"id": 1, "body": {"bool": {
                        "must": [{"match": "data stream"}],
                        "must_not": [{"match": "vector"}]}}})
    assert st == 200 and out["registered"] == 1
    st, out = _post(server, "/api/percolator/register",
                    {"id": 2, "body": {"range":
                                       {"n_chars": {"gte": 100}}}})
    assert st == 200 and out["total"] == 2
    st, out = _post(server, "/api/percolate",
                    {"text": "big data in a stream", "n_chars": 250})
    assert st == 200 and out["matched_queries"] == [1, 2]
    st, out = _post(server, "/api/percolate",
                    {"text": "data stream vector", "n_chars": 50})
    assert st == 200 and out["matched_queries"] == []
    # unsupported node kinds refuse at registration
    st, out = _post(server, "/api/percolator/register",
                    {"id": 3, "body": {"fuzzy": "daat"}})
    assert st == 400


def test_refresh_endpoint(server):
    # no on-disk change → refreshed False, n_docs reported
    status, out = _post(server, "/api/refresh", {})
    assert status == 200
    assert out == {"refreshed": False, "n_docs": 500}
