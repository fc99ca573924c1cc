"""dis_max / match_phrase_prefix / constant_score: rank+score identity
vs the brute-force oracle, semantic edge cases, sharded == single for
the shard-safe shapes, honest sharded boundary for expansions, and the
JSON-DSL routing identity. Reference surface: the OpenSearch query
types the reference's backend accepts (dis_max, match_phrase_prefix,
constant_score are core Lucene query classes behind the search API the
reference delegates to)."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from baram_ray.corpus import corpus_parquet
from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine
from baram_ray.query.oracle import OracleIndex

N_ROWS = 300
OUT = "/tmp/baram_test_dismax_idx"


@pytest.fixture(scope="module")
def corpus_path():
    return corpus_parquet(N_ROWS, seed=42,
                          cache_dir="/tmp/baram_test_corpus")


@pytest.fixture(scope="module")
def built(corpus_path):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("content", "path"), num_shards=4,
                      positions=True)
    return build_index(corpus_path, OUT, cfg, resume=False)


@pytest.fixture(scope="module")
def docs(corpus_path):
    tbl = pq.read_table(corpus_path)
    out = tbl.to_pylist()
    from baram_ray.stages.normalize import derive_doc_id
    for d in out:
        d["doc_id"] = derive_doc_id(d["repo"], d["path"], d["commit"])
    return out


@pytest.fixture(scope="module")
def oracle(docs):
    return OracleIndex(docs, fields=["content", "path"],
                       meta_cols=["lang"])


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built.out_dir)


@pytest.fixture(scope="module")
def sharded(built):
    return ShardedEngine(built.out_dir, n_groups=2)


@pytest.fixture(scope="module")
def phrase_q(engine, docs):
    """A corpus bigram with a non-trivial phrase match set."""
    from collections import Counter

    from baram_ray.tokenizer import analyze_phrase
    pair_counts = Counter()
    for d in docs[:120]:
        units = analyze_phrase(d.get("content") or "")
        pair_counts.update(zip(units, units[1:]))
    for (a, b), _ in pair_counts.most_common(30):
        if a != b:
            q = f"{a} {b}"
            if len(engine.match_phrase_docs(q)) >= 5:
                return q
    pytest.skip("corpus produced no frequent bigram")


@pytest.fixture(scope="module")
def common_term(oracle):
    """A frequent content term for match clauses."""
    return max(oracle.df["content"].items(), key=lambda kv: kv[1])[0]


def _assert_hits_equal(got, want, tol=1e-9):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=tol)


# ------------------------------------------------------------------ #
# dis_max
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dismax_vs_oracle(engine, oracle, phrase_q, common_term, tb):
    specs = [{"match": f"{common_term} merge"},
             {"phrase": phrase_q},
             {"prefix": "st", "max_expansions": 100},
             {"fuzzy": "tabel", "max_edits": 1}]
    got = engine.search_dismax(specs, tie_breaker=tb, k=25)
    want = oracle.search_dismax(specs, tie_breaker=tb, k=25)
    _assert_hits_equal(got, want)
    assert got, "dis_max should match something on this corpus"


def test_dismax_single_clause_is_standalone(engine, common_term):
    """One clause → pure max → identical to the dedicated op."""
    got = engine.search_dismax([{"match": common_term}], k=15)
    want = engine.search(common_term, k=15)
    assert got == want


def test_dismax_tiebreaker_one_is_sum(engine, common_term, phrase_q):
    """tie_breaker=1.0 degenerates to the compound sum (same doc set;
    scores equal up to fp reassociation)."""
    specs = [{"match": common_term}, {"phrase": phrase_q}]
    dm = dict(engine.search_dismax(specs, tie_breaker=1.0, k=10_000))
    cp = dict(engine.search_compound(should=specs,
                                     minimum_should_match=1,
                                     k=10_000))
    assert set(dm) == set(cp)
    for d in dm:
        assert dm[d] == pytest.approx(cp[d], rel=1e-12)


def test_dismax_score_dominates(engine, common_term, phrase_q):
    """tie_breaker=0: every score equals the best single-clause score."""
    specs = [{"match": common_term}, {"phrase": phrase_q}]
    per_clause = [dict(engine.search_compound(should=[s], k=10_000))
                  for s in specs]
    for d, s in engine.search_dismax(specs, tie_breaker=0.0, k=50):
        best = max(m.get(d, 0.0) for m in per_clause)
        assert s == pytest.approx(best, rel=1e-12)


def test_dismax_sharded_identity(built, engine, sharded, common_term,
                                 phrase_q):
    specs = [{"match": common_term}, {"phrase": phrase_q}]
    got = sharded.search_dismax(specs, tie_breaker=0.4, k=20)
    want = engine.search_dismax(specs, tie_breaker=0.4, k=20)
    _assert_hits_equal(got, want, tol=1e-12)


def test_dismax_sharded_expansion_refused(sharded):
    from baram_ray.query.qparse import UnsupportedQuery
    with pytest.raises(UnsupportedQuery):
        sharded.search_dismax([{"prefix": "st"}], k=5)


def test_dismax_match_docs_is_union(engine, common_term, phrase_q):
    specs = [{"match": common_term}, {"phrase": phrase_q}]
    union = set(engine.match_compound_docs(
        should=[specs[0]], minimum_should_match=1).tolist())
    union |= set(engine.match_compound_docs(
        should=[specs[1]], minimum_should_match=1).tolist())
    got = engine.match_dismax_docs(specs)
    assert set(got.tolist()) == union
    assert list(got) == sorted(got)


# ------------------------------------------------------------------ #
# match_phrase_prefix
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def pp_query(engine, docs, phrase_q):
    """phrase_q with the last token truncated to a 2-char prefix —
    guaranteed ≥ the phrase's own match set."""
    a, b = phrase_q.split()
    return f"{a} {b[:2]}"


def test_phrase_prefix_vs_oracle(engine, oracle, docs, pp_query):
    got = engine.search_phrase_prefix(pp_query, k=25,
                                      max_expansions=100)
    want = oracle.search_phrase_prefix(docs, pp_query, k=25,
                                       max_expansions=100)
    _assert_hits_equal(got, want)
    assert got


def test_phrase_prefix_superset_of_phrase(engine, phrase_q, pp_query):
    """Truncating the last term can only widen the match set."""
    full = set(engine.match_phrase_docs(phrase_q).tolist())
    wide = set(engine.match_phrase_prefix_docs(
        pp_query, max_expansions=100_000).tolist())
    assert full <= wide


def test_phrase_prefix_single_token(engine, oracle, docs):
    """A 1-token phrase prefix = 'any expansion anywhere' retrieval."""
    got = engine.search_phrase_prefix("st", k=25, max_expansions=100)
    want = oracle.search_phrase_prefix(docs, "st", k=25,
                                       max_expansions=100)
    _assert_hits_equal(got, want)


def test_phrase_prefix_no_expansion_empty(engine):
    assert engine.search_phrase_prefix("zzqqxneverprefix", k=5) == []


def test_phrase_prefix_in_compound(engine, oracle, pp_query,
                                   common_term):
    """phrase_prefix composes as a typed clause in bool must/should."""
    got = engine.search_compound(
        must=[{"phrase_prefix": pp_query, "max_expansions": 100}],
        should=[common_term], minimum_should_match=0, k=20)
    want = oracle.search_compound(
        must=[{"phrase_prefix": pp_query, "max_expansions": 100}],
        should=[common_term], minimum_should_match=0, k=20)
    _assert_hits_equal(got, want)


def test_phrase_prefix_sharded_refused(sharded, pp_query):
    from baram_ray.query.qparse import UnsupportedQuery
    with pytest.raises(UnsupportedQuery):
        sharded.search_phrase_prefix(pp_query, k=5)


# ------------------------------------------------------------------ #
# constant_score
# ------------------------------------------------------------------ #

def test_constant_score_semantics(engine, common_term):
    hits = engine.search_constant_score(boost=2.5, k=10,
                                        query=common_term)
    assert hits
    assert all(s == 2.5 for _, s in hits)
    ids = [d for d, _ in hits]
    assert ids == sorted(ids)
    want = set(engine.match_bool_docs(must=[common_term]).tolist())
    assert set(ids) <= want
    assert ids == sorted(want)[:10]


def test_constant_score_filters_only(engine, docs):
    lang = docs[0]["lang"]
    hits = engine.search_constant_score(k=5, filters={"lang": lang})
    assert hits
    assert all(s == 1.0 for _, s in hits)


def test_constant_score_sharded_identity(engine, sharded, common_term):
    got = sharded.search_constant_score(boost=1.5, k=12,
                                        query=common_term)
    want = engine.search_constant_score(boost=1.5, k=12,
                                        query=common_term)
    assert got == want


# ------------------------------------------------------------------ #
# DSL routing identity
# ------------------------------------------------------------------ #

def test_dsl_dismax_routes(engine, common_term, phrase_q):
    body = {"query": {"dis_max": {
        "tie_breaker": 0.3,
        "queries": [{"match": common_term},
                    {"match_phrase": phrase_q}]}},
        "size": 15}
    got = execute_dsl(engine, body)
    want = engine.search_dismax(
        [{"match": common_term}, {"phrase": phrase_q, "slop": 0}],
        tie_breaker=0.3, k=15)
    assert got == want


def test_dsl_match_phrase_prefix_routes(engine, pp_query):
    body = {"query": {"match_phrase_prefix": {
        "query": pp_query, "max_expansions": 100}}, "size": 10}
    got = execute_dsl(engine, body)
    want = engine.search_phrase_prefix(pp_query, k=10,
                                       max_expansions=100)
    assert got == want


def test_dsl_constant_score_routes(engine, docs, common_term):
    lang = docs[0]["lang"]
    body = {"query": {"constant_score": {
        "filter": [{"match": common_term}, {"term": {"lang": lang}}],
        "boost": 1.2}}, "size": 8}
    got = execute_dsl(engine, body)
    want = engine.search_constant_score(
        boost=1.2, k=8, query=common_term, filters={"lang": lang})
    assert got == want


def test_dsl_dismax_rejects_compositions(engine, common_term):
    with pytest.raises(ValueError):
        execute_dsl(engine, {
            "query": {"dis_max": {"queries": [{"match": common_term}]}},
            "sort": "n_chars"})
    with pytest.raises(ValueError):
        execute_dsl(engine, {"query": {"dis_max": {}}})
