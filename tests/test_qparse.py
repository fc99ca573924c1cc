"""Query-string parser: plan construction, routing identity vs the
explicit engine API (parsed == explicit, bit-for-bit), filter syntax,
and honest UnsupportedQuery boundaries. Reference `q=` surface:
src/commands/serve.rs:274-426 (raw string -> bool-should match)."""

import pytest

from baram_ray.query.qparse import Plan, UnsupportedQuery, execute, parse

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# pure parse
# ------------------------------------------------------------------ #

def test_parse_bare_terms_are_should():
    p = parse("data stream window")
    assert p.should == ["data", "stream", "window"]
    assert p.must == [] and p.must_not == [] and p.filters == {}


def test_parse_plus_minus_and_not():
    p = parse("+data -legacy stream NOT beta")
    assert p.must == ["data"]
    assert p.must_not == ["legacy", "beta"]
    assert p.should == ["stream"]


def test_parse_and_promotes_both_neighbors():
    p = parse("data AND stream window")
    assert p.must == ["data", "stream"]
    assert p.should == ["window"]


def test_parse_or_is_default():
    assert parse("a OR b").should == ["a", "b"]


def test_parse_phrase_and_slop():
    p = parse('"data stream"')
    assert p.phrase == "data stream" and p.slop == 0
    p = parse('"data stream"~2')
    assert p.phrase == "data stream" and p.slop == 2


def test_parse_prefix_wildcard_fuzzy():
    assert parse("dat*").prefix == "dat"
    assert parse("d?ta*").wildcard == "d?ta*"
    p = parse("tabel~")
    assert p.fuzzy == "tabel" and p.fuzzy_edits == 1
    p = parse("tabel~2")
    assert p.fuzzy == "tabel" and p.fuzzy_edits == 2


def test_parse_regexp():
    p = parse("/im.*/")
    assert p.specials == [("should", {"regexp": "im.*"})]
    p = parse("data -/st.*m/")
    assert p.should == ["data"]
    assert p.specials == [("must_not", {"regexp": "st.*m"})]


def test_parse_filters_scalar_and_range():
    p = parse("data lang:en n_chars:100..500 stream")
    assert p.should == ["data", "stream"]
    assert p.filters["lang"] == "en"
    assert p.filters["n_chars"] == {"gte": 100, "lte": 500}
    assert parse("n_chars:..500").filters["n_chars"] == {"lte": 500}
    assert parse("n_chars:100..").filters["n_chars"] == {"gte": 100}


def test_parse_mixed_shapes_become_specials():
    # round-3 raised UnsupportedQuery on these; they now parse into
    # typed specials and route to search_compound
    p = parse('"a b" "c d"')
    assert p.specials == [("should", {"phrase": "a b", "slop": 0}),
                          ("should", {"phrase": "c d", "slop": 0})]
    assert p.phrase is None          # legacy accessor: ambiguous → None
    p = parse('NOT "a b"')
    assert p.specials == [("must_not", {"phrase": "a b", "slop": 0})]
    p = parse('+"a b"~2 -xy* term')
    assert ("must", {"phrase": "a b", "slop": 2}) in p.specials
    assert ("must_not", {"prefix": "xy"}) in p.specials
    assert p.should == ["term"]
    p = parse("ab* cd*")
    assert p.specials == [("should", {"prefix": "ab"}),
                          ("should", {"prefix": "cd"})]
    p = parse("ab~ cd~2")
    assert p.specials == [("should", {"fuzzy": "ab", "max_edits": 1}),
                          ("should", {"fuzzy": "cd", "max_edits": 2})]
    # AND promotes a preceding special, like a preceding term
    p = parse('"a b" AND c')
    assert p.specials == [("must", {"phrase": "a b", "slop": 0})]
    assert p.must == ["c"]


def test_parse_empty():
    p = parse("")
    assert p == Plan()


# ------------------------------------------------------------------ #
# routing identity vs the explicit API
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def engine(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine
    return QueryEngine(ensure_index(SF, positions=True))


def test_execute_matches_explicit_calls(engine):
    e = engine
    assert e.search_qs("data stream", k=10) == e.search("data stream",
                                                        k=10)
    assert e.search_qs("+data -window stream", k=10) == e.search_bool(
        must=["data"], should=["stream"], must_not=["window"], k=10)
    assert e.search_qs('"data stream"~1', k=10) == e.search_phrase(
        "data stream", k=10, slop=1)
    assert e.search_qs("dat*", k=10) == e.search_prefix("dat", k=10)
    assert e.search_qs("d?ta", k=10) == e.search_wildcard("d?ta", k=10)
    assert e.search_qs("tabel~1", k=10) == e.search_fuzzy("tabel", k=10,
                                                          max_edits=1)
    assert e.search_qs("/st.*m/", k=10) == e.search_regexp("st.*m",
                                                           k=10)


def test_execute_filters_merge(engine):
    e = engine
    got = e.search_qs("data stream lang:en", k=10)
    assert got == e.search("data stream", k=10, filters={"lang": "en"})
    got = e.search_qs("data n_chars:200..", k=10)
    assert got == e.search("data", k=10,
                           filters={"n_chars": {"gte": 200}})
    # kw filters merge under string filters
    got = e.search_qs("data lang:en", k=10,
                      filters={"n_chars": {"gte": 100}})
    assert got == e.search("data", k=10,
                           filters={"lang": "en",
                                    "n_chars": {"gte": 100}})


def test_execute_mixed_routes_to_compound(engine):
    e = engine
    # phrase + loose term (round-3 raised; now compound)
    assert execute(e, '"data stream" window', k=5) == e.search_compound(
        should=[{"phrase": "data stream", "slop": 0}, "window"], k=5)
    # negated phrase with positive terms
    assert execute(e, 'data NOT "table scan"', k=5) == e.search_compound(
        should=["data"],
        must_not=[{"phrase": "table scan", "slop": 0}], k=5)
    # two expansions + a must term + a filter
    assert execute(e, "+data dat* s?an lang:en", k=5) == \
        e.search_compound(must=["data"],
                          should=[{"prefix": "dat"},
                                  {"wildcard": "s?an"}],
                          k=5, filters={"lang": "en"})
    # fuzzy mixed with a phrase
    assert execute(e, '"data stream" tabel~1', k=5) == e.search_compound(
        should=[{"phrase": "data stream", "slop": 0},
                {"fuzzy": "tabel", "max_edits": 1}], k=5)


def test_execute_boundaries(engine):
    with pytest.raises(UnsupportedQuery):
        execute(engine, "lang:en", k=5)        # filters-only
    assert engine.search_qs("", k=5) == []
    assert engine.search_qs("NOT data", k=5) == []   # no positive clause
    assert engine.search_qs('NOT "data stream"', k=5) == []


def test_serve_kind_qs(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryActor
    a = QueryActor(ensure_index(SF, positions=True))
    assert a.serve("qs", "+data stream", k=5) == \
        a.engine.search_bool(must=["data"], should=["stream"], k=5)


def test_sharded_qs_matches_single(ray_session):
    from baram_ray.pipelines.search import ensure_index
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    idx = ensure_index(SF, positions=True)
    single, sh = QueryEngine(idx), ShardedEngine(idx, n_groups=2)
    for q in ("data stream", "+data -window stream",
              '"data stream"~1', "data lang:en",
              '"data stream" window',          # mixed → compound
              '+data NOT "table scan" stream'):
        assert sh.search_qs(q, k=10) == single.search_qs(q, k=10)
    with pytest.raises(UnsupportedQuery):
        sh.search_qs("dat*", k=5)
    with pytest.raises(UnsupportedQuery):
        sh.search_qs("tabel~1", k=5)
    with pytest.raises(UnsupportedQuery):
        sh.search_qs('"data stream" dat*', k=5)   # mixed w/ expansion
