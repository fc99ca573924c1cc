"""REST serving surface — the reference's axum API
(``src/commands/serve.rs:753-757``: ``/api/health``, ``/api/search``,
``/api/events``, ``/api/events/:id``; plus ``/api/msearch``,
``/api/analyze``, ``/api/stats``, ``/api/explain`` — the OpenSearch
surfaces the reference gets from its backend) rebuilt on the stdlib
``ThreadingHTTPServer`` in front of one resident ``QueryEngine``.

Single-node by design: HTTP serving is the A7 resident-engine shape; the
distributed serving path is the sharded ``QueryActor`` pool
(``query/engine.py``) — this module is only the HTTP veneer the
reference exposes, kept dependency-free (no axum/flask in the
container). Parity points: ``k`` capped at 100
(``src/commands/serve.rs:426``), events sorted by article_count desc
(``src/clustering/engine.rs:122``), events served from the S9 cluster
JSON directory. Extra endpoint beyond the reference: ``/api/explain``
(the OpenSearch ``_explain`` surface the reference gets from its
backend).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MAX_K = 100                      # src/commands/serve.rs:426


def _jsonable(v):
    """numpy/pandas scalar → plain JSON value."""
    if hasattr(v, "item"):
        v = v.item()
    return v if isinstance(v, (int, float, str, bool,
                               type(None))) else str(v)


def _agg_jsonable(v):
    """One aggregation result → JSON: recurses through bucket lists
    (terms / histogram / range, possibly holding nested sub-agg
    dicts) and metric dicts, passing every scalar through
    ``_jsonable``."""
    if isinstance(v, list):
        return [_agg_jsonable(b) for b in v]
    if isinstance(v, dict):
        return {k: _agg_jsonable(x) for k, x in v.items()}
    return _jsonable(v)


def create_server(index_dir: str, host: str = "127.0.0.1", port: int = 0,
                  clusters_dir: str | None = None,
                  corpus_path: str | None = None) -> ThreadingHTTPServer:
    """Build (but do not start) the API server; ``port=0`` picks an
    ephemeral port (``srv.server_address``). Call ``serve_forever()`` /
    ``shutdown()`` to run.

    ``corpus_path``: the source documents parquet. When given,
    ``GET /api/search?...&highlight=1`` returns per-hit ``<mark>``
    fragments + truncated content (reference highlight response,
    src/embedding/mod.rs:612-676) — the index stores doc LENGTHS, not
    text, so snippets need the corpus. Per request this reads only the
    k hit rows (DuckDB predicate pushdown on doc_id row-group stats),
    never the corpus."""
    from baram_ray.query.engine import QueryEngine
    engine = QueryEngine(index_dir)

    def doc_texts(doc_ids: list[int]) -> dict[int, str]:
        import duckdb
        if not doc_ids:
            return {}
        con = duckdb.connect()
        ids = ",".join(str(int(d)) for d in doc_ids)
        rows = con.execute(
            f"SELECT doc_id, text FROM read_parquet(?) "
            f"WHERE doc_id IN ({ids})", [corpus_path]).fetchall()
        con.close()
        return {int(d): t for d, t in rows}

    # ---- scroll state (OpenSearch _search?scroll=TTL + /_search/scroll):
    # server-held cursors over the engine's exact search_after pagination.
    # State is one (body, cursor, expiry) triple per scroll — O(1) per
    # open scroll, never result pages — purged lazily on access.
    import threading
    import time as _time

    scrolls: dict[str, dict] = {}
    scroll_lock = threading.Lock()
    scroll_seq = iter(range(1, 1 << 62))

    # registered percolator bodies (id → OpenSearch query node)
    percolator_bodies: dict[int, dict] = {}

    def _parse_ttl(v) -> float:
        s = str(v or "1m").strip().lower()
        if s.endswith("ms"):
            return float(s[:-2]) / 1000.0
        if s.endswith("s"):
            return float(s[:-1])
        if s.endswith("m"):
            return float(s[:-1]) * 60.0
        if s.endswith("h"):
            return float(s[:-1]) * 3600.0
        return float(s)

    def _purge_scrolls(now: float) -> None:
        dead = [sid for sid, st in scrolls.items()
                if st["expiry"] < now]
        for sid in dead:
            del scrolls[sid]

    def _scroll_cursor(body: dict, hits: list):
        """The search_after cursor after a page: (sort_value, doc_id)
        with an explicit sort, else (score, doc_id)."""
        if not hits:
            return None
        last = hits[-1]
        return [_jsonable(last[1]), int(last[0])]

    def _run_dsl(payload: dict) -> tuple[dict, list]:
        """One OpenSearch-style body → (JSON response dict, raw hits)
        (shared by POST /api/search, each /api/msearch slot, and the
        scroll cursor)."""
        from baram_ray.query.dsl import execute_dsl
        hits = execute_dsl(engine, payload, max_k=MAX_K)
        aggs = None
        if isinstance(hits, dict):          # aggs body
            aggs = {name: _agg_jsonable(v)
                    for name, v in hits["aggregations"].items()}
            hits = hits["hits"]
        val_key = "sort_value" if "sort" in payload else "score"
        out = {"results": [
            {"rank": i + 1, "doc_id": int(t[0]),
             val_key: _jsonable(t[1]),
             **({"group": _jsonable(t[2])} if len(t) > 2 else {})}
            for i, t in enumerate(hits)]}
        if aggs is not None:
            out["aggregations"] = aggs
        return out, hits

    def _run_dsl_body(payload: dict) -> dict:
        return _run_dsl(payload)[0]

    def _open_scroll(payload: dict) -> dict:
        """POST /api/search with "scroll": TTL — first page plus a
        scroll_id whose server-held cursor resumes via the engine's
        exact search_after pagination (page-concat == one-shot,
        the property the search_after tests already pin)."""
        ttl = _parse_ttl(payload.pop("scroll"))
        bad = [key for key in ("aggs", "aggregations", "collapse",
                               "rescore", "search_after")
               if key in payload]
        if bad:
            raise ValueError(f"scroll composes with plain/sorted "
                             f"match bodies only, not {bad}")
        body = dict(payload)
        out, hits = _run_dsl(body)
        now = _time.monotonic()
        with scroll_lock:
            _purge_scrolls(now)
            sid = f"scroll-{next(scroll_seq)}"
            scrolls[sid] = {"body": body,
                            "cursor": _scroll_cursor(body, hits),
                            "expiry": now + ttl, "ttl": ttl}
        out["scroll_id"] = sid
        return out

    def _continue_scroll(payload: dict) -> tuple[int, dict]:
        sid = payload.get("scroll_id")
        now = _time.monotonic()
        with scroll_lock:
            _purge_scrolls(now)
            st = scrolls.get(sid)
            if payload.get("clear"):
                scrolls.pop(sid, None)
                return 200, {"cleared": sid is not None
                             and st is not None}
            if st is None:
                return 404, {"error": "scroll_id not found or expired"}
            if st["cursor"] is None:        # previous page was empty
                scrolls.pop(sid, None)
                return 200, {"results": [], "scroll_id": sid}
            body = dict(st["body"],
                        search_after=list(st["cursor"]))
            if "scroll" in payload:
                st["ttl"] = _parse_ttl(payload["scroll"])
        out, hits = _run_dsl(body)
        with scroll_lock:
            st = scrolls.get(sid)
            if st is not None:
                st["cursor"] = _scroll_cursor(body, hits)
                st["expiry"] = _time.monotonic() + st["ttl"]
                if not hits:
                    scrolls.pop(sid, None)
        out["scroll_id"] = sid
        return 200, out

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):      # quiet: no per-request stderr
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urllib.parse.urlparse(self.path)
            qs = {k: v[0]
                  for k, v in urllib.parse.parse_qs(u.query).items()}
            try:
                if u.path == "/api/health":
                    self._json(200, {"status": "ok",
                                     "n_docs": int(engine.r.n_docs)})
                elif u.path == "/api/search":
                    self._search(qs)
                elif u.path == "/api/explain":
                    self._json(200, engine.explain(qs["q"],
                                                   int(qs["doc_id"])))
                elif u.path == "/api/analyze":
                    # ?filter=stop,porter prepends an analyzer chain
                    # (analysis.py) before the core tokenizer — the
                    # OpenSearch _analyze "filter" parameter
                    from baram_ray.tokenizer import tokenize
                    text = qs["text"]
                    if qs.get("filter"):
                        from baram_ray.analysis import analyze_chain
                        text = analyze_chain(
                            text, tuple(qs["filter"].split(",")))
                    self._json(200, {"tokens": [
                        {"token": t, "position": i}
                        for i, t in enumerate(tokenize(text))]})
                elif u.path == "/api/termvectors":
                    # OpenSearch _termvectors: per-doc term stats
                    # from the forward store (row-group-pruned read)
                    from baram_ray.query.termvectors import \
                        term_vectors
                    if "doc_id" not in qs:
                        return self._json(400,
                                          {"error": "missing doc_id"})
                    tv = term_vectors(index_dir,
                                      [int(qs["doc_id"])])
                    self._json(200, {
                        "doc_id": int(qs["doc_id"]),
                        "found": len(tv) > 0,
                        "terms": {
                            r.term: {"term_freq": int(r.term_freq),
                                     "doc_freq": int(r.doc_freq),
                                     "total_freq": int(r.total_freq)}
                            for r in tv.itertuples()}})
                elif u.path == "/api/stats":
                    r = engine.r
                    self._json(200, {
                        "n_docs": int(r.n_docs),
                        "n_live": int(r.live.sum()) if r.live
                                  is not None else int(r.n_docs),
                        "fields": list(r.fields),
                        "n_terms": {f: len(r._term_list(f))
                                    for f in r.fields}})
                elif u.path == "/api/events":
                    self._events(None)
                elif u.path.startswith("/api/events/"):
                    self._events(u.path.rsplit("/", 1)[1])
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as e:
                self._json(400, {"error": f"missing/unknown: {e}"})
            except ValueError as e:
                self._json(400, {"error": str(e)})

        def _search(self, qs: dict) -> None:
            q = qs.get("q", "")
            k = min(int(qs.get("k", 10)), MAX_K)
            mode = qs.get("mode", "bm25")
            ms = float(qs["min_score"]) if "min_score" in qs else None
            if mode == "bm25":
                hits = engine.search(q, k=k, min_score=ms)
            elif mode == "phrase":
                hits = engine.search_phrase(q, k=k, min_score=ms,
                                            slop=int(qs.get("slop", 0)))
            elif mode == "prefix":
                hits = engine.search_prefix(q, k=k, min_score=ms)
            elif mode == "fuzzy":
                hits = engine.search_fuzzy(q, k=k, min_score=ms)
            elif mode == "wildcard":
                hits = engine.search_wildcard(q, k=k, min_score=ms)
            else:
                return self._json(400, {"error": f"unknown mode {mode}"})
            results = [{"rank": i + 1, "doc_id": int(d),
                        "score": float(s)}
                       for i, (d, s) in enumerate(hits)]
            if qs.get("highlight") in ("1", "true"):
                if corpus_path is None:
                    return self._json(400, {
                        "error": "highlight needs the server started "
                                 "with corpus_path (the index stores "
                                 "doc lengths, not text)"})
                if mode not in ("bm25", "phrase"):
                    return self._json(400, {
                        "error": "highlight supports bm25/phrase "
                                 "modes (expansion modes match terms "
                                 "the raw query does not contain)"})
                from baram_ray.query.highlight import snippets_for_hit
                from baram_ray.tokenizer import tokenize
                texts = doc_texts([r["doc_id"] for r in results])
                terms = sorted(set(tokenize(q)))
                for r in results:
                    snip = snippets_for_hit(
                        texts.get(r["doc_id"], ""), terms)
                    r["content"] = snip["content"]
                    r["highlights"] = snip["highlights"]
            self._json(200, {"query": q, "mode": mode,
                             "results": results})

        def do_POST(self):
            # POST /api/search: OpenSearch-style JSON query body (the
            # shape the reference's backend accepts,
            # src/embedding/mod.rs:470-539) routed through query/dsl.py;
            # plus embedding-server endpoints (src/commands/serve.rs:
            # 123-126; batch cap <=100 texts :231-235) over the
            # deterministic stub encoder (no model weights in container)
            u = urllib.parse.urlparse(self.path)
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json(400, {"error": "bad json"})
            if u.path == "/api/search":
                try:
                    if "scroll" in payload:
                        return self._json(200, _open_scroll(payload))
                    return self._json(200, _run_dsl_body(payload))
                except (ValueError, KeyError) as e:
                    return self._json(400, {"error": str(e)})
            if u.path == "/api/percolator/register":
                # register an OpenSearch body under an id (the
                # percolator index analogue); validation runs once here
                from baram_ray.percolate import doc_matches
                try:
                    qid = int(payload["id"])
                    doc_matches(set(), [], [], {}, payload["body"])
                except KeyError as e:
                    return self._json(400, {"error": f"missing {e}"})
                except ValueError as e:
                    return self._json(400, {"error": str(e)})
                percolator_bodies[qid] = payload["body"]
                return self._json(200, {"registered": qid,
                                        "total":
                                        len(percolator_bodies)})
            if u.path == "/api/percolate":
                # match ONE document against every registered body
                from baram_ray.percolate import doc_matches
                from baram_ray.tokenizer import \
                    tokenize_with_positions
                text = payload.get("text", "")
                toks, poss = tokenize_with_positions(text or "")
                tokset = set(toks)
                meta = {k: v for k, v in payload.items()
                        if k != "text"}
                try:
                    hits = sorted(
                        qid for qid, b in percolator_bodies.items()
                        if doc_matches(tokset, toks, poss, meta, b))
                except ValueError as e:
                    return self._json(400, {"error": str(e)})
                return self._json(200, {"matched_queries": hits})
            if u.path == "/api/scroll":
                try:
                    code, obj = _continue_scroll(payload)
                    return self._json(code, obj)
                except (ValueError, KeyError) as e:
                    return self._json(400, {"error": str(e)})
            if u.path == "/api/msearch":
                # OpenSearch _msearch: a list of bodies in one round
                # trip; per-body errors come back in-slot (the bulk
                # contract — one bad body never fails the batch)
                if not isinstance(payload, list):
                    return self._json(400, {
                        "error": "msearch takes a JSON list of "
                                 "search bodies"})
                responses = []
                for body in payload:
                    try:
                        responses.append(_run_dsl_body(body))
                    except (ValueError, KeyError) as e:
                        responses.append({"error": str(e)})
                return self._json(200, {"responses": responses})
            if u.path == "/api/refresh":
                # make a committed delta/delete visible to this live
                # server (the reference's 5 s auto-refresh,
                # src/embedding/mod.rs:240-245, as an explicit call —
                # OpenSearch _refresh analogue)
                changed = engine.refresh()
                return self._json(200, {
                    "refreshed": bool(changed),
                    "n_docs": int(engine.r.n_docs)})
            from baram_ray.stages.embed import EmbedStage
            enc = EmbedStage()
            if u.path == "/embed":
                text = payload.get("text")
                if not isinstance(text, str):
                    return self._json(400, {"error": "missing text"})
                self._json(200,
                           {"embedding": enc._encode_one(text).tolist()})
            elif u.path == "/embed/batch":
                texts = payload.get("texts")
                if not isinstance(texts, list):
                    return self._json(400, {"error": "missing texts"})
                if len(texts) > 100:           # serve.rs:231-235 cap
                    return self._json(400, {"error": "max 100 texts"})
                self._json(200, {"embeddings": [
                    enc._encode_one(str(t)).tolist() for t in texts]})
            else:
                self._json(404, {"error": "not found"})

        def _events(self, event_id: str | None) -> None:
            if not clusters_dir or not os.path.isdir(clusters_dir):
                return self._json(404, {"error": "no clusters dir"})
            if event_id:
                p = os.path.join(clusters_dir, f"{event_id}.json")
                if not os.path.isfile(p):
                    return self._json(404, {"error": "unknown event"})
                with open(p) as f:
                    return self._json(200, json.load(f))
            evs = []
            for fn in sorted(os.listdir(clusters_dir)):
                if fn.endswith(".json"):
                    with open(os.path.join(clusters_dir, fn)) as f:
                        evs.append(json.load(f))
            evs.sort(key=lambda e: (-int(e.get("article_count", 0)),
                                    str(e.get("event_id", ""))))
            self._json(200, {"events": evs, "total": len(evs)})

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.engine = engine          # exposed for tests / introspection
    return srv
