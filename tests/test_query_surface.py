"""Query-surface parity features: highlights/snippets (M14/M15), range
filters, search_after pagination (K5) — reference behaviors from
src/embedding/mod.rs:612-676,855-869,517-532 and
src/clustering/engine.rs:152-280."""

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray.query.highlight import (
    highlight_fragments, snippets_for_hit, truncate_words,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# truncate_string parity (M14)
# ------------------------------------------------------------------ #

def test_truncate_words():
    assert truncate_words("short text", 500) == "short text"
    s = "word " * 200                        # 1000 chars
    out = truncate_words(s, 500)
    assert out.endswith("...")
    assert len(out) <= 503
    # cut lands on a word boundary: strip '...' -> no partial word
    body = out[:-3]
    assert not body.endswith(" ")
    assert body.split(" ")[-1] == "word"
    # exactly max_len passes through untouched
    assert truncate_words("x" * 500, 500) == "x" * 500
    # no space before max_len: no boundary to snap to, hard cut
    assert truncate_words("y" * 600, 500) == "y" * 500 + "..."


# ------------------------------------------------------------------ #
# highlight fragments (M15)
# ------------------------------------------------------------------ #

def test_highlight_basic():
    text = "the data pipeline processes data streams with a data sink"
    frags = highlight_fragments(text, ["data"], n_fragments=3,
                                fragment_size=30)
    assert 1 <= len(frags) <= 3
    assert all("<mark>data</mark>" in f for f in frags)
    # no partial-word marking
    frags2 = highlight_fragments("database data", ["data"])
    assert frags2 and "<mark>data</mark>" in frags2[0]
    assert "<mark>data</mark>base" not in frags2[0]


def test_highlight_caps_and_empty():
    text = " ".join(["filler"] * 50 + ["hit"] + ["filler"] * 50 +
                    ["hit"] + ["filler"] * 50 + ["hit"] + ["filler"] * 50 +
                    ["hit"])
    frags = highlight_fragments(text, ["hit"], n_fragments=3,
                                fragment_size=40)
    assert len(frags) == 3                   # capped at number_of_fragments
    assert highlight_fragments(text, ["absent"]) == []
    assert highlight_fragments("", ["hit"]) == []
    assert highlight_fragments(text, []) == []


def test_snippets_payload():
    text = ("alpha beta " * 60) + "needle " + ("gamma delta " * 10)
    out = snippets_for_hit(text, ["needle", "beta"])
    assert out["content"].endswith("...")
    assert len(out["content"]) <= 503
    assert any("<mark>needle</mark>" in f for f in out["highlights"])


# ------------------------------------------------------------------ #
# range filters + pagination against the real index
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def engine(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    return QueryEngine(ensure_index(SF))


def test_range_filter_mask(engine):
    r = engine.r
    mask = r.filter_mask({"n_chars": {"gte": 100, "lte": 300}})
    nc = np.asarray([int(x) for x in r.doc_meta["n_chars"]])
    assert np.array_equal(mask, (nc >= 100) & (nc <= 300))
    m2 = r.filter_mask({"n_chars": {"gt": 100, "lt": 300}})
    assert np.array_equal(m2, (nc > 100) & (nc < 300))
    # combined equality + range
    m3 = r.filter_mask({"lang": "en", "n_chars": {"gte": 100}})
    lang = r.doc_meta["lang"]
    assert np.array_equal(m3, (lang == "en") & (nc >= 100))
    with pytest.raises(KeyError):
        r.filter_mask({"n_chars": {"between": (1, 2)}})


def test_range_filtered_search_vs_bruteforce(engine):
    """Range-filtered DAAT == WAND == unfiltered search post-filtered."""
    filters = {"n_chars": {"gte": 100, "lte": 400}}
    mask_ids = {int(d) for d, ok in zip(engine.r.doc_ids,
                                        engine.r.filter_mask(filters)) if ok}
    full = engine.search("data stream query", k=10_000)
    expected = [(d, s) for d, s in full if d in mask_ids][:10]
    daat = engine.search("data stream query", k=10, filters=filters,
                         algorithm="daat")
    wand = engine.search("data stream query", k=10, filters=filters,
                         algorithm="wand")
    assert daat == expected
    assert wand == expected


def test_search_after_pagination(engine):
    """Concatenated pages == one-shot ranking, for DAAT and WAND."""
    one_shot = engine.search("table scan filter", k=60, algorithm="daat")
    for algo in ("daat", "wand"):
        pages, after = [], None
        while len(pages) < 60:
            page = engine.search("table scan filter", k=7, after=after,
                                 algorithm=algo)
            if not page:
                break
            pages.extend(page)
            after = (page[-1][1], page[-1][0])
        assert pages[:60] == one_shot[:len(pages)][:60]
        assert len(pages) >= len(one_shot[:60])


def test_paginate_generator(engine):
    pages = list(engine.paginate("hash join merge sort", page_size=9))
    flat = [h for p in pages for h in p]
    one = engine.search("hash join merge sort", k=len(flat) + 10)
    assert flat == one
    assert all(len(p) <= 9 for p in pages)


def test_bm25_highlights_pipeline(ray_session):
    from baram_ray.pipelines.search import bm25_highlights
    out = bm25_highlights(SF, "data stream query", k=5)
    assert list(out.columns) == ["rank", "doc_id", "score", "content",
                                 "highlights", "n_fragments"]
    assert len(out) == 5
    # every hit matched at least one query term -> at least one fragment
    assert (out["n_fragments"] >= 1).all()
    assert out["highlights"].str.contains("<mark>").all()
    assert (out["content"].str.len() <= 503).all()


# ------------------------------------------------------------------ #
# sharded query actors: scatter-gather == single reader
# ------------------------------------------------------------------ #

def test_sharded_engine_rank_identity(ray_session, tmp_path):
    """Shard-range readers with global idf merge to the EXACT single-
    reader ranking (scores included), for DAAT and WAND, with filters."""
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    from tests.test_incremental_build import _write_part

    src = str(tmp_path / "docs.parquet")
    _write_part(src, 0, 400, seed=11)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",),
                      num_shards=4)                     # force 4 shards
    build_index(src, idx, cfg, resume=False)

    single = QueryEngine(idx)
    for n_groups in (2, 4):
        sharded = ShardedEngine(idx, n_groups=n_groups)
        assert len(sharded.engines) == n_groups
        for q in ("data stream", "join sort merge", "hash table scan",
                  "row window"):
            exp = single.search(q, k=25)
            assert sharded.search(q, k=25) == exp
            got_w = [h for e in sharded.engines
                     for h in e.search(q, k=25, algorithm="wand")]
            got_w.sort(key=lambda ds: (-ds[1], ds[0]))
            assert got_w[:25] == exp
        # filters work per shard group too
        exp_f = single.search("data stream", k=10, filters={"lang": "en"})
        assert sharded.search("data stream", k=10,
                              filters={"lang": "en"}) == exp_f


def test_sharded_pipeline_matches_plain(ray_session):
    from baram_ray.pipelines.search import bm25_topk, bm25_topk_sharded
    a = bm25_topk(SF).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = bm25_topk_sharded(SF).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["query_id", "rank", "doc_id", "score"]],
        b[["query_id", "rank", "doc_id", "score"]])


# ------------------------------------------------------------------ #
# explain (OpenSearch _explain surface)
# ------------------------------------------------------------------ #

def test_explain_matches_search_score(engine):
    for q in ["data processing", "table scan merge", "query"]:
        for doc_id, score in engine.search(q, k=8):
            ex = engine.explain(q, doc_id)
            assert ex["matched"]
            assert ex["score"] == score, (q, doc_id)   # bit-for-bit
            # details sum to the total in accumulation order
            assert ex["score"] == sum(d["score"] for d in ex["details"])
            for d in ex["details"]:
                assert d["tf"] >= 1 and d["df"] >= 1 and d["idf"] > 0


def test_explain_boosts_and_misses(engine):
    q = "data"
    hits = engine.search(q, k=3, boosts={"text": 2.0})
    for doc_id, score in hits:
        ex = engine.explain(q, doc_id, boosts={"text": 2.0})
        assert ex["score"] == score
        assert all(d["boost"] == 2.0 for d in ex["details"]
                   if d["field"] == "text")
    # a doc with none of the terms: matched False, score 0
    all_ids = set(engine.r.doc_ids.tolist())
    hit_ids = {d for d, _ in engine.search(q, k=10_000)}
    missing = sorted(all_ids - hit_ids)
    if missing:
        ex = engine.explain(q, missing[0])
        assert not ex["matched"] and ex["score"] == 0.0
    # unknown doc raises
    with pytest.raises(KeyError):
        engine.explain(q, -12345)


def test_sharded_phrase_and_bool_parity(ray_session, tmp_path):
    """Phrase (exact + sloppy) and bool scatter-gather: rank- AND
    score-identical to a single full reader."""
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    from tests.test_incremental_build import _write_part

    src = str(tmp_path / "docs.parquet")
    _write_part(src, 0, 400, seed=13)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",),
                      num_shards=4, positions=True)
    build_index(src, idx, cfg, resume=False)

    single = QueryEngine(idx)
    sharded = ShardedEngine(idx, n_groups=2)
    for q in ("data stream", "join sort", "hash table"):
        for slop in (0, 2):
            assert sharded.search_phrase(q, k=25, slop=slop) == \
                single.search_phrase(q, k=25, slop=slop), (q, slop)
    assert sharded.search_bool(k=25, must=["data"],
                               should=["join sort", "hash"],
                               must_not=["vector"],
                               minimum_should_match=1) == \
        single.search_bool(k=25, must=["data"],
                           should=["join sort", "hash"],
                           must_not=["vector"], minimum_should_match=1)


# ------------------------------------------------------------------ #
# facets: terms aggregation over the FULL match set
# ------------------------------------------------------------------ #

def _facet_oracle(query_terms, facet_fields):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    cond = " AND ".join(
        "list_contains(string_split_regex(lower(trim(text)), '\\s+'), "
        f"'{t}')" for t in query_terms) or "TRUE"
    out = set()
    for f in facet_fields:
        rows = con.execute(
            f"SELECT {f}, count(*) FROM documents WHERE {cond} "
            f"GROUP BY 1").fetchall()
        out |= {(f, str(v), int(c)) for v, c in rows}
    return out


def test_facets_match_bruteforce(engine, ray_session):
    got = {(f, str(v), c)
           for f, v, c in engine.facets("data stream", ["lang", "source"])}
    assert got == _facet_oracle(["data", "stream"], ["lang", "source"])


def test_facets_empty_query_is_corpus_counts(engine, ray_session):
    got = {(f, str(v), c) for f, v, c in engine.facets("", ["lang"])}
    assert got == _facet_oracle([], ["lang"])


def test_facets_with_filter_and_sharded(engine, ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import ShardedEngine
    # filters compose: facet over matching docs restricted by metadata
    got = engine.facets("data", ["source"], filters={"lang": "en"})
    assert all(f == "source" for f, _, _ in got)
    # sharded sums equal the single-reader counts exactly
    sh = ShardedEngine(ensure_index(SF), n_groups=2)
    single = {(f, str(v), c)
              for f, v, c in engine.facets("data stream", ["lang", "source"])}
    sharded = {(f, str(v), c)
               for f, v, c in sh.facets("data stream", ["lang", "source"])}
    assert sharded == single
    # unknown facet column raises like unknown filter columns do
    from baram_ray.errors import UnknownFilterColumn
    with pytest.raises(UnknownFilterColumn):
        engine.facets("data", ["nope"])


# ------------------------------------------------------------------ #
# RRF hybrid fusion: exact recomputation of the merge
# ------------------------------------------------------------------ #

def test_hybrid_rrf_recomputation(ray_session):
    from baram_ray.pipelines.search import (
        HYBRID_QUERY_VEC, _actor_search, ensure_index, hybrid_rrf_topk,
    )
    from baram_ray.similarity import brute_force_topk
    got = hybrid_rrf_topk(SF, "data stream query", k=10, pool=50)
    # recompute from the two sub-query rank lists
    idx = ensure_index(SF)
    bdf = _actor_search(idx, [{"query_id": 0, "text": "data stream query",
                               "k": 50}]).sort_values("rank")
    kdf = brute_force_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"]),
        [HYBRID_QUERY_VEC], k=50, round6=False).to_pandas() \
        .sort_values("rank")
    fused = {}
    for df, col in ((bdf, "doc_id"), (kdf, "vec_id")):
        for r, d in zip(df["rank"], df[col]):
            fused[int(d)] = fused.get(int(d), 0.0) + 1.0 / (60 + int(r))
    exp = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert got["doc_id"].tolist() == [d for d, _ in exp]
    assert got["score"].tolist() == [round(s, 6) for _, s in exp]
    # rank-only fusion: ties in score imply doc_id ascending
    assert got["rank"].tolist() == list(range(1, len(got) + 1))


# ------------------------------------------------------------------ #
# histogram facets + metadata-sorted retrieval
# ------------------------------------------------------------------ #

def test_facet_histogram_and_sorted(engine, ray_session):
    import duckdb
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import ShardedEngine
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    hist = engine.facet_histogram("data", "n_chars", 50.0)
    exp = con.execute(
        "SELECT floor(n_chars/50.0)*50.0, count(*) FROM documents "
        "WHERE list_contains(string_split_regex(lower(trim(text)), "
        "'\\s+'), 'data') GROUP BY 1 ORDER BY 1").fetchall()
    assert [(float(b), int(c)) for b, c in exp] == hist
    # sharded histogram sums to the single-reader one
    sh = ShardedEngine(ensure_index(SF), n_groups=2)
    assert sh.facet_histogram("data", "n_chars", 50.0) == hist
    # sorted retrieval: desc and asc agree with SQL incl tie-breaks
    for asc, order in ((True, "ASC"), (False, "DESC")):
        got = engine.search_sorted("data stream", "n_chars", k=12,
                                   ascending=asc)
        exp = con.execute(
            "SELECT doc_id, n_chars FROM documents "
            "WHERE list_contains(string_split_regex(lower(trim(text)), "
            "'\\s+'), 'data') AND list_contains(string_split_regex("
            "lower(trim(text)), '\\s+'), 'stream') "
            f"ORDER BY n_chars {order}, doc_id ASC LIMIT 12").fetchall()
        assert [(int(d), int(v)) for d, v in got] == \
               [(int(d), int(v)) for d, v in exp]
        assert sh.search_sorted("data stream", "n_chars", k=12,
                                ascending=asc) == got


def test_facet_stats_ranges_cardinality(engine, ray_session):
    import duckdb
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import ShardedEngine
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    match = ("list_contains(string_split_regex(lower(trim(text)), "
             "'\\s+'), 'data')")
    sh = ShardedEngine(ensure_index(SF), n_groups=2)
    # stats: count/min/max/sum exact, avg the single division sum/count
    s = engine.facet_stats("data", "n_chars")
    n, lo, hi, tot = con.execute(
        f"SELECT count(*), min(n_chars), max(n_chars), sum(n_chars) "
        f"FROM documents WHERE {match}").fetchone()
    assert s == {"count": int(n), "min": int(lo), "max": int(hi),
                 "sum": int(tot), "avg": int(tot) / int(n)}
    assert sh.facet_stats("data", "n_chars") == s
    # empty match set mirrors OpenSearch: count 0, sum 0, None metrics
    empty = {"count": 0, "min": None, "max": None, "sum": 0,
             "avg": None}
    assert engine.facet_stats("qqqxplughz", "n_chars") == empty
    assert sh.facet_stats("qqqxplughz", "n_chars") == empty
    # range buckets: half-open [from, to), open ends
    ranges = [{"to": 100}, {"from": 100, "to": 300}, {"from": 300}]
    got = engine.facet_ranges("data", "n_chars", ranges)
    exp = [con.execute(
        f"SELECT count(*) FROM documents WHERE {match}"
        + (f" AND n_chars >= {r.get('from')}" if "from" in r else "")
        + (f" AND n_chars < {r.get('to')}" if "to" in r else "")
    ).fetchone()[0] for r in ranges]
    assert [c for _, _, c in got] == [int(c) for c in exp]
    assert got == [(None, 100.0, exp[0]), (100.0, 300.0, exp[1]),
                   (300.0, None, exp[2])]
    assert sh.facet_ranges("data", "n_chars", ranges) == got
    assert sum(c for _, _, c in got) == s["count"]   # total partition
    # exact cardinality == SQL COUNT(DISTINCT)
    card = engine.facet_cardinality("data", "source")
    assert card == con.execute(
        f"SELECT count(DISTINCT source) FROM documents "
        f"WHERE {match}").fetchone()[0]
    assert sh.facet_cardinality("data", "source") == card
    # filters compose the same way as facets
    f = engine.facet_stats("data", "n_chars", filters={"lang": "en"})
    nf = con.execute(
        f"SELECT count(*) FROM documents WHERE {match} "
        f"AND lang = 'en'").fetchone()[0]
    assert f["count"] == int(nf)
    # unknown column is an honest error
    from baram_ray.errors import UnknownFilterColumn
    for fn in (engine.facet_stats, engine.facet_cardinality):
        with pytest.raises(UnknownFilterColumn):
            fn("data", "nope")


def test_sorted_search_after(engine, ray_session):
    """sort + search_after composite cursor: page-concat equals the
    one-shot sorted scan, single reader and sharded alike, and the
    DSL body routes it."""
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    sh = ShardedEngine(ensure_index(SF), n_groups=2)
    for asc in (True, False):
        full = engine.search_sorted("data", "n_chars", k=10**9,
                                    ascending=asc)
        for eng in (engine, sh):
            pages, cursor = [], None
            while True:
                page = eng.search_sorted("data", "n_chars", k=7,
                                         ascending=asc, after=cursor)
                if not page:
                    break
                pages.extend(page)
                cursor = (page[-1][1], page[-1][0])
            assert pages == full
    # DSL routing == explicit call; cursor resumes exactly
    p1 = execute_dsl(engine, {"query": {"match": "data"},
                              "sort": [{"n_chars": {"order": "desc"}}],
                              "size": 5})
    p2 = execute_dsl(engine, {"query": {"match": "data"},
                              "sort": [{"n_chars": {"order": "desc"}}],
                              "search_after": [p1[-1][1], p1[-1][0]],
                              "size": 5})
    one = engine.search_sorted("data", "n_chars", k=10,
                               ascending=False)
    assert p1 + p2 == one
    # collapse + search_after is an honest error
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"match": "data"},
                             "sort": "n_chars",
                             "collapse": {"field": "lang"},
                             "search_after": [0, 0]})


def test_facet_group_stats(engine, ray_session):
    import duckdb
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import ShardedEngine
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    got = engine.facet_group_stats("data", "lang", "n_chars")
    exp = con.execute(
        "SELECT lang, CAST(count(*) AS BIGINT), min(n_chars), "
        "max(n_chars), CAST(sum(n_chars) AS BIGINT) FROM documents "
        "WHERE list_contains(string_split_regex(lower(trim(text)), "
        "'\\s+'), 'data') GROUP BY lang "
        "ORDER BY 2 DESC, 1 ASC").fetchall()
    assert [(str(v), c, lo, hi, tot) for v, c, lo, hi, tot, _ in got] \
        == [(str(v), int(c), int(lo), int(hi), int(t))
            for v, c, lo, hi, t in exp]
    for v, c, lo, hi, tot, avg in got:
        assert avg == tot / c
    # bucket order and counts match the plain terms facet
    assert [(v, c) for v, c, *_ in got] == \
        [(v, c) for _, v, c in engine.facets("data", ["lang"])]
    # sharded merge is bit-identical on the int column
    sh = ShardedEngine(ensure_index(SF), n_groups=2)
    assert sh.facet_group_stats("data", "lang", "n_chars") == got
    # empty match set → no buckets
    assert engine.facet_group_stats("qqqxplughz", "lang",
                                    "n_chars") == []
    assert sh.facet_group_stats("qqqxplughz", "lang", "n_chars") == []


# ------------------------------------------------------------------ #
# more-like-this + suggest semantics
# ------------------------------------------------------------------ #

def test_mlt_seed_ranks_first(engine, ray_session):
    """The seed doc contains every one of its own MLT query terms, so
    including it in the bool-should search must rank it at/near the
    top — and the pipeline output must exclude it."""
    from baram_ray.pipelines.search import search_mlt
    out = search_mlt(SF, seed_doc_id=3, k=10)
    assert 3 not in set(out["doc_id"])
    assert len(out) == 10
    assert out["score"].is_monotonic_decreasing


def test_suggest_exact_neighbour(engine, ray_session):
    # a one-edit misspelling of a high-df corpus word comes back
    s = engine.suggest("dta")
    assert s is not None and s[0] == "data" and s[2] == 1
    # nothing within 2 edits sharing the first char -> None
    assert engine.suggest("zzzzzzzzzz") is None


# ------------------------------------------------------------------ #
# field collapsing (OpenSearch collapse)
# ------------------------------------------------------------------ #

def _brute_collapse(engine, query, field, k, filters=None):
    """Oracle: exhaustive ranking, first hit per group value."""
    all_hits = engine.search(query, k=10**9, filters=filters)
    out, seen = [], set()
    for d, s in all_hits:
        key = engine.r.doc_meta[field][engine.r.doc_index[d]]
        if key in seen:
            continue
        seen.add(key)
        out.append((d, s, key))
        if len(out) == k:
            break
    return out


def test_collapse_matches_brute(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    eng = QueryEngine(ensure_index(SF))
    for q in ("data stream", "hash join merge sort", "table"):
        for k in (3, 10, 500):
            got = eng.search_collapse(q, "source", k=k)
            assert got == _brute_collapse(eng, q, "source", k)
            # one hit per group, scores non-increasing
            keys = [key for _, _, key in got]
            assert len(keys) == len(set(keys))
            scores = [s for _, s, _ in got]
            assert scores == sorted(scores, reverse=True)


def test_collapse_with_filters_and_edges(ray_session):
    from baram_ray.errors import UnknownFilterColumn
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    eng = QueryEngine(ensure_index(SF))
    flt = {"lang": "en"}
    got = eng.search_collapse("data stream", "source", k=10, filters=flt)
    assert got == _brute_collapse(eng, "data stream", "source", 10,
                                  filters=flt)
    assert eng.search_collapse("data", "source", k=0) == []
    assert eng.search_collapse("qqqxplughz", "source", k=5) == []
    with pytest.raises(UnknownFilterColumn):
        eng.search_collapse("data", "no_such_col", k=5)


def test_collapse_sharded_identity(ray_session, tmp_path):
    """Sharded collapse == single-reader collapse on a forced
    multi-shard index (groups span shards)."""
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    from tests.test_incremental_build import _write_part

    src = str(tmp_path / "docs.parquet")
    _write_part(src, 0, 400, seed=23)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",),
                      num_shards=4)
    build_index(src, idx, cfg, resume=False)
    single = QueryEngine(idx)
    for n_groups in (2, 4):
        sharded = ShardedEngine(idx, n_groups=n_groups)
        for q in ("data stream", "join sort merge", "row window"):
            for k in (2, 5, 50):
                assert sharded.search_collapse(q, "lang", k=k) == \
                    single.search_collapse(q, "lang", k=k)


def test_collapse_pipeline_entry(ray_session):
    from baram_ray.pipelines.search import (DOC_QUERIES, ensure_index,
                                            search_collapse_docs)
    from baram_ray.query.engine import QueryEngine
    df = search_collapse_docs(SF)
    assert list(df.columns) == ["query_id", "rank", "doc_id", "score",
                                "group"]
    eng = QueryEngine(ensure_index(SF))
    for q in DOC_QUERIES:
        sub = df[df["query_id"] == q["query_id"]]
        exp = _brute_collapse(eng, q["text"], "source", int(q["k"]))
        assert list(sub["doc_id"]) == [d for d, _, _ in exp]
        assert list(sub["group"]) == [str(key) for _, _, key in exp]
        # per-group uniqueness inside each query's page
        assert sub["group"].is_unique


def test_collapse_sorted_matches_brute(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    eng = QueryEngine(ensure_index(SF))
    r = eng.r
    for q, asc in (("data stream", False), ("table", True)):
        got = eng.search_collapse_sorted(q, "source", "n_chars", k=8,
                                         ascending=asc)
        # brute: full sorted match set, first per group
        full = eng.search_sorted(q, "n_chars", k=10**9, ascending=asc)
        out, seen = [], set()
        for d, v in full:
            g = r.doc_meta["source"][r.doc_index[d]]
            if g in seen:
                continue
            seen.add(g)
            out.append((d, v, g))
            if len(out) == 8:
                break
        assert got == out
        assert len({g for _, _, g in got}) == len(got)


def test_collapse_sorted_sharded_identity(ray_session, tmp_path):
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    from tests.test_incremental_build import _write_part

    src = str(tmp_path / "docs.parquet")
    _write_part(src, 0, 400, seed=31)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("text",), id_cols=(),
                      keep=("lang", "n_chars"), num_shards=4)
    build_index(src, idx, cfg, resume=False)
    single = QueryEngine(idx)
    for n_groups in (2, 4):
        sh = ShardedEngine(idx, n_groups=n_groups)
        for q in ("data stream", "join sort"):
            for asc in (False, True):
                assert sh.search_collapse_sorted(
                    q, "lang", "n_chars", k=3, ascending=asc) == \
                    single.search_collapse_sorted(
                        q, "lang", "n_chars", k=3, ascending=asc)


def test_collapse_sorted_edges(ray_session):
    from baram_ray.errors import UnknownFilterColumn
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    eng = QueryEngine(ensure_index(SF))
    assert eng.search_collapse_sorted("qqqxplughz", "source",
                                      "n_chars") == []
    assert eng.search_collapse_sorted("data", "source", "n_chars",
                                      k=0) == []
    with pytest.raises(UnknownFilterColumn):
        eng.search_collapse_sorted("data", "nope", "n_chars")
    with pytest.raises(UnknownFilterColumn):
        eng.search_collapse_sorted("data", "source", "nope")
