"""Positional postings + phrase queries: tokenizer position invariants,
engine rank identity vs the brute-force phrase oracle, and retrieval
parity (FIXTURES-style check on the synthetic code corpus — compounds,
CJK bigrams and multi-field all exercised)."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from baram_ray.corpus import corpus_parquet
from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.engine import QueryEngine
from baram_ray.query.oracle import OracleIndex
from baram_ray.tokenizer import (
    analyze_phrase, term_counts, term_positions, tokenize,
    tokenize_with_positions,
)

N_ROWS = 300
OUT = "/tmp/baram_test_posindex"


@pytest.fixture(scope="module")
def corpus_path():
    return corpus_parquet(N_ROWS, seed=42, cache_dir="/tmp/baram_test_corpus")


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
    return OracleIndex(docs, fields=["content", "path"])


@pytest.fixture(scope="module")
def engine(built):
    eng = QueryEngine(built.out_dir)
    assert eng.r.has_positions
    return eng


SAMPLES = [
    "def main(): return fooBar_baz(x1)",
    "snake_case camelCase HTTPServer plain",
    "한국어 주석 테스트 x",            # hangul bigrams
    "a_a aa a",                        # duplicate part positions
    "",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_positions_token_stream_consistent(text):
    toks, poss = tokenize_with_positions(text)
    # same multiset (and order) of tokens as the scoring tokenizer → dl,
    # tf and the non-positional index are unchanged by positions=True
    assert toks == tokenize(text)
    assert len(toks) == len(poss)
    # positions are non-decreasing along the stream, start at 0
    if poss:
        assert poss[0] == 0
        assert all(b >= a for a, b in zip(poss, poss[1:]))
    # one position unit per analyze_phrase token
    assert len(analyze_phrase(text)) == (max(poss) + 1 if poss else 0)


@pytest.mark.parametrize("text", SAMPLES)
def test_term_positions_grouping(text):
    terms, tfs, flat = term_positions(text)
    tc = term_counts(text)
    assert terms == list(tc.keys())
    assert tfs == list(tc.values())
    assert len(flat) == sum(tfs)
    # per-term position runs are sorted (duplicates legal: compound parts)
    i = 0
    for t, n in zip(terms, tfs):
        run = flat[i: i + n]
        assert run == sorted(run), (t, run)
        i += n


PHRASES = [
    "def main",
    "import index",
    "fn let mut",
    "the usage",
    "한국어 주석",            # CJK bigram adjacency
    "qqqzz notthere",        # zero hits
]


def _dynamic_phrases(docs):
    """Phrases guaranteed present: first two adjacent whole-word units of
    a few real docs (exercises compounds when the corpus emits them)."""
    out = []
    for d in docs[:40]:
        units = analyze_phrase(d.get("content") or "")
        if len(units) >= 3:
            out.append(" ".join(units[:2]))
            out.append(" ".join(units[1:4]))
        if len(out) >= 6:
            break
    return out


def test_phrase_rank_identity(engine, oracle, docs):
    for q in PHRASES + _dynamic_phrases(docs):
        got = engine.search_phrase(q, k=20)
        exp = oracle.search_phrase(docs, q, k=20)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_phrase_requires_adjacency(engine, oracle, docs):
    """Phrase ≠ AND-of-terms: find a corpus bigram whose AND-set is
    strictly larger than its adjacency-set and assert the engine returns
    exactly the adjacency-set."""
    from collections import Counter
    pair_counts = Counter()
    for d in docs[:120]:
        units = analyze_phrase(d.get("content") or "")
        pair_counts.update(zip(units, units[1:]))
    chosen = None
    for (a, b), _ in pair_counts.most_common(30):
        if a == b:
            continue
        both, adj = set(), set()
        for d in docs:
            text = d.get("content") or ""
            toks = set(tokenize(text))
            if {a, b} <= toks:
                both.add(d["doc_id"])
            if oracle._phrase_freq(text, [a, b]):
                adj.add(d["doc_id"])
        if adj and len(adj) < len(both):
            chosen = (a, b, both, adj)
            break
    assert chosen is not None, "corpus produced no discriminating bigram"
    a, b, both, adj = chosen
    # content-field-only retrieval matches the brute-force adjacency set
    hits = set(engine.match_phrase_docs(f"{a} {b}", fields=["content"]))
    assert hits == adj
    assert hits < both


def test_match_phrase_docs_vs_bruteforce(engine, oracle, docs):
    for q in PHRASES:
        got = engine.match_phrase_docs(q).tolist()
        exp = sorted(
            d["doc_id"] for d in docs
            if any(oracle._phrase_freq(d.get(f) or "", analyze_phrase(q))
                   for f in ("content", "path")))
        assert got == exp, q


def test_phrase_boosts_and_filters(engine, oracle, docs):
    q = "def main"
    got = engine.search_phrase(q, k=10, boosts={"path": 2.0})
    exp = oracle.search_phrase(docs, q, k=10, boosts={"path": 2.0})
    assert [d for d, _ in got] == [d for d, _ in exp]
    # filters reuse the scored path's metadata mask
    all_hits = engine.search_phrase(q, k=100)
    py_hits = engine.search_phrase(q, k=100, filters={"lang": "python"})
    assert set(d for d, _ in py_hits) <= set(d for d, _ in all_hits)


def test_single_term_phrase_matches_term_postings(engine):
    """m=1 phrase degenerates to the term's postings (freq == tf)."""
    ids_phrase = set(engine.match_phrase_docs("import"))
    ids_term = set()
    for f in engine.r.fields:
        ids_term.update(engine.r.doc_ids_for_term(f, "import").tolist())
    assert ids_phrase == ids_term


def test_repeated_term_phrase(engine, oracle, docs):
    """Duplicate query term ("the the") needs two distinct alignments."""
    q = "the the"
    got = engine.search_phrase(q, k=15)
    exp = oracle.search_phrase(docs, q, k=15)
    assert [d for d, _ in got] == [d for d, _ in exp]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in exp],
                               rtol=1e-9)


def test_positional_build_same_scoring_index(corpus_path, built, oracle):
    """positions=True must not perturb BM25: rank identity vs the oracle
    still holds on the positional index."""
    eng = QueryEngine(built.out_dir)
    for q in ["def main return", "import index query", "parse token"]:
        got = eng.search(q, k=10, algorithm="daat")
        exp = oracle.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in exp]


def test_vectorized_phrase_path_identical(engine, oracle, docs, monkeypatch):
    """Force the vectorized whole-postings evaluator and assert it gives
    the same results as the skip loop (auto policy switches on df)."""
    from baram_ray.query import engine as eng_mod
    loop = {q: engine.search_phrase(q, k=25)
            for q in PHRASES + _dynamic_phrases(docs)}
    monkeypatch.setattr(eng_mod, "PHRASE_VEC_MIN_DF", -1)
    for q, exp in loop.items():
        got = engine.search_phrase(q, k=25)
        assert got == exp, q


# ------------------------------------------------------------------ #
# Sloppy phrases (ordered span-near + Lucene sloppy weighting)
# ------------------------------------------------------------------ #

def test_sloppy_freq_known_windows(engine):
    """Crafted position lists with hand-computed minimal windows."""
    f = engine._sloppy_freq
    # "a b": a at 0, b at 1 -> one window slack 0
    assert f([np.array([0]), np.array([1])], 2) == 1.0
    # a at 0, b at 3 -> slack 2: weight 1/3 at slop>=2, nothing at slop 1
    assert f([np.array([0]), np.array([3])], 2) == pytest.approx(1 / 3)
    assert f([np.array([0]), np.array([3])], 1) == 0.0
    # a at [0, 5], b at [2, 6]: minimal windows (0,2) slack 1, (5,6) slack 0
    got = f([np.array([0, 5]), np.array([2, 6])], 1)
    assert got == pytest.approx(0.5 + 1.0)
    # window (0,6) is NOT minimal (contains (5,6)) and must not count
    assert f([np.array([0, 5]), np.array([2, 6])], 0) == 1.0
    # three terms: a@0, b@2, c@3 -> span (0,3), slack 1
    assert f([np.array([0]), np.array([2]), np.array([3])], 1) \
        == pytest.approx(0.5)
    # order matters: b before a never matches
    assert f([np.array([5]), np.array([1])], 9) == 0.0


def test_sloppy_slop0_equals_exact(engine, oracle, docs):
    """slop=0 must reproduce the exact-phrase ranking bit-for-bit."""
    for q in PHRASES + _dynamic_phrases(docs):
        exact = engine.search_phrase(q, k=20)
        slop0 = engine.search_phrase(q, k=20, slop=0)
        assert exact == slop0, q


def _gapped_phrases(docs):
    """token_i + token_{i+2} of real docs: guaranteed slop-1 hits that
    are usually NOT exact-phrase hits."""
    out = []
    for d in docs[:40]:
        units = analyze_phrase(d.get("content") or "")
        if len(units) >= 4 and units[0] != units[2]:
            out.append(f"{units[0]} {units[2]}")
        if len(out) >= 5:
            break
    return out


def test_sloppy_rank_identity(engine, oracle, docs):
    """Engine plane-sweep vs oracle chain-enumeration: identical docs
    and scores for slop 1..3 over present and gapped phrases."""
    for slop in (1, 2, 3):
        for q in PHRASES + _dynamic_phrases(docs) + _gapped_phrases(docs):
            got = engine.search_phrase(q, k=20, slop=slop)
            exp = oracle.search_phrase(docs, q, k=20, slop=slop)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, slop)
            np.testing.assert_allclose([s for _, s in got],
                                       [s for _, s in exp], rtol=1e-9)


def test_sloppy_match_docs_superset(engine, docs):
    """Growing slop only grows the match set; slop hits include exact."""
    for q in _gapped_phrases(docs)[:3]:
        exact = set(engine.match_phrase_docs(q).tolist())
        s1 = set(engine.match_phrase_docs(q, slop=1).tolist())
        s3 = set(engine.match_phrase_docs(q, slop=3).tolist())
        assert exact <= s1 <= s3
    # and a gapped phrase finds its doc at slop>=1
    gp = _gapped_phrases(docs)
    if gp:
        assert len(engine.match_phrase_docs(gp[0], slop=1)) > 0
