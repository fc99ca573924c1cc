"""End-to-end: build the index with Ray Data, assert rank identity vs the
brute-force oracle (FIXTURES.md §5 checks 1-4)."""

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from baram_ray.corpus import corpus_parquet
from baram_ray.index.build import BuildResult, IndexConfig, build_index
from baram_ray.query.engine import QueryEngine
from baram_ray.query.oracle import OracleIndex
from baram_ray.query.queryset import QUERY_SET

N_ROWS = 400
OUT = "/tmp/baram_test_index"


@pytest.fixture(scope="module")
def corpus_path():
    return corpus_parquet(N_ROWS, seed=42, cache_dir="/tmp/baram_test_corpus")


@pytest.fixture(scope="module")
def built(corpus_path) -> BuildResult:
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("content", "path"), num_shards=4)
    return build_index(corpus_path, OUT, cfg, resume=False)


@pytest.fixture(scope="module")
def oracle(corpus_path):
    tbl = pq.read_table(corpus_path)
    docs = tbl.to_pylist()
    from baram_ray.stages.normalize import derive_doc_id
    for d in docs:
        d["doc_id"] = derive_doc_id(d["repo"], d["path"], d["commit"])
    return OracleIndex(docs, fields=["content", "path"],
                       meta_cols=["lang", "repo"])


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built.out_dir)


BOOSTS = {"path": 2.0, "content": 1.0}  # reference title^2.0 shape


def test_build_counts(built, corpus_path):
    n_input = pq.ParquetFile(corpus_path).metadata.num_rows
    assert built.n_docs == n_input
    assert built.n_terms > 100
    assert built.num_shards == 4


def test_sha256_invariant(built, corpus_path):
    """Per-row content sha256 equality end-to-end (reference src/models.rs:32-36)."""
    src = pq.read_table(corpus_path, columns=["repo", "path", "commit", "content"])
    from baram_ray.stages.normalize import derive_doc_id
    expected = {}
    for r, p, c, ct in zip(*(src[c].to_pylist() for c in
                             ("repo", "path", "commit", "content"))):
        expected[derive_doc_id(r, p, c)] = hashlib.sha256(
            (ct or "").encode("utf-8", "surrogatepass")).hexdigest()
    docs = pq.read_table(os.path.join(built.out_dir, "docs"),
                         columns=["doc_id", "sha256"])
    got = dict(zip(docs["doc_id"].to_pylist(), docs["sha256"].to_pylist()))
    assert got == expected
    assert all(len(h) == 64 and h == h.lower() for h in got.values())


@pytest.mark.parametrize("algorithm", ["daat", "wand"])
def test_rank_identity_vs_oracle(engine, oracle, algorithm):
    for q in QUERY_SET:
        exp = oracle.search(q["text"], k=q["k"], boosts=BOOSTS)
        got = engine.search(q["text"], k=q["k"], boosts=BOOSTS,
                            algorithm=algorithm)
        assert [d for d, _ in got] == [d for d, _ in exp], \
            f"docIDs differ for {q['text']!r} ({algorithm})"
        for (d1, s1), (d2, s2) in zip(got, exp):
            assert abs(s1 - s2) <= 1e-6, f"score {q['text']!r}: {s1} vs {s2}"


def test_wand_equals_daat_large_k(engine):
    for text in ["import", "the parse index", "한국어"]:
        a = engine.search(text, k=200, algorithm="daat")
        b = engine.search(text, k=200, algorithm="wand")
        assert a == b


def test_filters_and_min_score(engine, oracle):
    exp = oracle.search("import batch", k=20, boosts=BOOSTS,
                        filters={"lang": "python"})
    got = engine.search("import batch", k=20, boosts=BOOSTS,
                        filters={"lang": "python"})
    assert [d for d, _ in got] == [d for d, _ in exp]
    if exp:
        cut = exp[len(exp) // 2][1]
        exp_m = oracle.search("import batch", k=20, boosts=BOOSTS, min_score=cut)
        got_m = engine.search("import batch", k=20, boosts=BOOSTS, min_score=cut)
        assert [d for d, _ in got_m] == [d for d, _ in exp_m]


def test_multi_match_field_subset(engine, oracle):
    """OpenSearch multi_match: matching AND scoring restricted to a
    field subset — rank- and score-identical to the brute oracle, and
    docs whose only hits are in excluded fields drop out."""
    from baram_ray.query.dsl import execute_dsl
    for fields, boosts in ([["path"], None], [["content"], None],
                           [["content", "path"], {"path": 2.0}]):
        for q in ("import batch", "the parse index", "util"):
            exp = oracle.search(q, k=25, fields=fields, boosts=boosts)
            got = engine.search(q, k=25, fields=fields, boosts=boosts)
            assert [d for d, _ in got] == [d for d, _ in exp], \
                (q, fields)
            for (_, s1), (_, s2) in zip(got, exp):
                assert abs(s1 - s2) <= 1e-9
    # full field list == no restriction (reader field order fixed)
    q = "import parse"
    assert engine.search(q, k=50, fields=["path", "content"]) == \
        engine.search(q, k=50)
    # a doc matching ONLY in content disappears under fields=["path"]
    full = {d for d, _ in engine.search("import", k=10**6)}
    path_only = {d for d, _ in engine.search("import", k=10**6,
                                             fields=["path"])}
    assert path_only <= full
    # DSL routing: multi_match with ^boost suffixes == explicit call
    body = {"query": {"multi_match": {"query": "import batch",
                                      "fields": ["path^2", "content"]}},
            "size": 25}
    assert execute_dsl(engine, body) == engine.search(
        "import batch", k=25, fields=["path", "content"],
        boosts={"path": 2.0})
    # unknown field is an honest error
    from baram_ray.errors import UnknownFilterColumn
    with pytest.raises(UnknownFilterColumn):
        engine.search("import", fields=["nope"])


def test_tie_break_doc_id_asc(engine, oracle):
    """Duplicate-content docs score identically; order must be doc_id asc."""
    got = engine.search("import the def", k=100)
    scores = {}
    for d, s in got:
        scores.setdefault(round(s, 9), []).append(d)
    for ds in scores.values():
        assert ds == sorted(ds)


def test_zero_hit_query(engine):
    assert engine.search("qqqxplughz zyzzyvaq", k=10) == []


def test_resume_equivalence(built, corpus_path):
    """Kill-after-partial → resume → identical index (FIXTURES.md §4)."""
    out2 = "/tmp/baram_test_resume"
    shutil.rmtree(out2, ignore_errors=True)
    cfg = IndexConfig(fields=("content", "path"), num_shards=4)
    r1 = build_index(corpus_path, out2, cfg, resume=False)
    # simulate a crash after the forward stage: drop later stages + manifests
    for stage in ("docs", "segments", "termdict"):
        shutil.rmtree(os.path.join(out2, stage), ignore_errors=True)
        os.remove(os.path.join(out2, "_manifests", f"{stage}.json"))
    r2 = build_index(corpus_path, out2, cfg, resume=True)
    assert "forward" in r2.resumed_stages
    e1, e2 = QueryEngine(built.out_dir), QueryEngine(out2)
    for q in QUERY_SET[:8]:
        assert e1.search(q["text"], k=q["k"]) == e2.search(q["text"], k=q["k"])
    with open(os.path.join(out2, "meta.json")) as f:
        assert json.load(f)["n_docs"] == r1.n_docs
    shutil.rmtree(out2, ignore_errors=True)


# ------------------------------------------------------------------ #
# Boolean queries (must/should/must_not + minimum_should_match)
# ------------------------------------------------------------------ #

BOOL_CASES = [
    dict(must=["import def"], should=[], must_not=[]),
    dict(must=["import"], should=["batch query", "token index"],
         must_not=[], minimum_should_match=1),
    dict(must=[], should=["import batch", "def class"],
         must_not=["lambda"], minimum_should_match=1),
    dict(must=["the"], should=["usage example", "install"],
         must_not=["fn"], minimum_should_match=2),
    dict(must=["qqqxplughz"], should=[], must_not=[]),        # zero hits
]


def test_bool_rank_identity(engine, oracle):
    for case in BOOL_CASES:
        got = engine.search_bool(k=25, boosts=BOOSTS, **case)
        exp = oracle.search_bool(k=25, boosts=BOOSTS, **case)
        assert [d for d, _ in got] == [d for d, _ in exp], case
        import numpy as np
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_bool_must_not_excludes(engine):
    base = {d for d, _ in engine.search_bool(must=["import"], k=10_000)}
    neg = {d for d, _ in engine.search_bool(must=["import"],
                                            must_not=["class"], k=10_000)}
    cls = set()
    for f in engine.r.fields:
        cls.update(engine.r.doc_ids_for_term(f, "class").tolist())
    assert neg == base - cls


def test_bool_msm_monotone(engine):
    """Raising minimum_should_match can only shrink the hit set."""
    kw = dict(should=["import batch", "def class", "token index"], k=10_000)
    prev = None
    for msm in (1, 2, 3):
        hits = {d for d, _ in engine.search_bool(minimum_should_match=msm, **kw)}
        if prev is not None:
            assert hits <= prev
        prev = hits


# ------------------------------------------------------------------ #
# Prefix queries (term-dict expansion, OpenSearch max_expansions)
# ------------------------------------------------------------------ #

def test_prefix_rank_identity(engine, oracle):
    import numpy as np
    for pre in ["im", "de", "par", "token", "qqq"]:
        got = engine.search_prefix(pre, k=20, boosts=BOOSTS)
        exp = oracle.search_prefix(pre, k=20, boosts=BOOSTS)
        assert [d for d, _ in got] == [d for d, _ in exp], pre
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_prefix_expansion_cap(engine, oracle):
    """max_expansions truncates in term-dict order identically."""
    got = engine.search_prefix("p", k=30, max_expansions=3)
    exp = oracle.search_prefix("p", k=30, max_expansions=3)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_match_prefix_docs_vs_tokens(engine, oracle):
    from baram_ray.tokenizer import tokenize
    got = set(engine.match_prefix_docs("im").tolist())
    exp = set()
    for f, terms in ((f, engine.r.terms_with_prefix(f, "im", 10_000))
                     for f in engine.r.fields):
        for t in terms:
            exp.update(engine.r.doc_ids_for_term(f, t).tolist())
    assert got == exp


# ------------------------------------------------------------------ #
# Wildcard queries (glob expansion against the term dict)
# ------------------------------------------------------------------ #

def test_wildcard_rank_identity(engine, oracle):
    import numpy as np
    for pat in ["im*", "?mport", "p*se", "*oken", "de?", "zz*q"]:
        got = engine.search_wildcard(pat, k=20, boosts=BOOSTS)
        exp = oracle.search_wildcard(pat, k=20, boosts=BOOSTS)
        assert [d for d, _ in got] == [d for d, _ in exp], pat
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_wildcard_expansion_cap(engine, oracle):
    got = engine.search_wildcard("p*", k=30, max_expansions=3)
    exp = oracle.search_wildcard("p*", k=30, max_expansions=3)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_wildcard_pure_prefix_equals_prefix_query(engine):
    """A trailing-* pattern with no other wildcards must equal the
    prefix query over the same expansion budget."""
    got = engine.search_wildcard("im*", k=20)
    exp = engine.search_prefix("im", k=20)
    assert got == exp


def test_terms_wildcard_semantics(engine):
    r = engine.r
    for f in r.fields:
        vocab = r._term_list(f)
        import fnmatch
        for pat in ["im*", "*ort", "p?rse", "*"]:
            exp = [t for t in vocab if fnmatch.fnmatchcase(t, pat)][:50]
            assert r.terms_wildcard(f, pat, 50) == exp, (f, pat)


# ------------------------------------------------------------------ #
# Regexp queries (anchored regex expansion against the term dict)
# ------------------------------------------------------------------ #

def test_regexp_rank_identity(engine, oracle):
    import numpy as np
    for pat in ["im.*", "[im]mport", "p.+se", ".*oken", "de.",
                "zz.*q", "(im|ex)port.*"]:
        got = engine.search_regexp(pat, k=20, boosts=BOOSTS)
        exp = oracle.search_regexp(pat, k=20, boosts=BOOSTS)
        assert [d for d, _ in got] == [d for d, _ in exp], pat
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)
    # expansion cap parity
    got = engine.search_regexp("p.*", k=30, max_expansions=3)
    exp = oracle.search_regexp("p.*", k=30, max_expansions=3)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_terms_regexp_semantics(engine):
    """Anchored full-match in term-dict order, prefix-accelerated scan
    included (literal-prefix patterns must not miss terms)."""
    import re
    r = engine.r
    for f in r.fields:
        vocab = r._term_list(f)
        for pat in ["im.*", ".*ort", "p.rse", "imp(o|u)rt",
                    r"x\d+", "import"]:
            exp = [t for t in vocab if re.fullmatch(pat, t)][:50]
            assert r.terms_regexp(f, pat, 50) == exp, (f, pat)


# ------------------------------------------------------------------ #
# Fuzzy queries (Damerau-Levenshtein expansion, AUTO edits)
# ------------------------------------------------------------------ #

def test_fuzzy_rank_identity(engine, oracle):
    import numpy as np
    for q, kw in [("impert", {}),                    # 1 edit from import
                  ("retrun", {}),                    # transposition
                  ("clss btach", {}),                # multi-term typos
                  ("import", {"max_edits": 0}),      # exact only
                  ("zzqqzz", {})]:                   # no expansion
        got = engine.search_fuzzy(q, k=20, boosts=BOOSTS, **kw)
        exp = oracle.search_fuzzy(q, k=20, boosts=BOOSTS, **kw)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-9)


def test_fuzzy_zero_edits_equals_term_query(engine):
    got = engine.search_fuzzy("import", k=15, max_edits=0)
    exp = engine.search("import", k=15, algorithm="daat")
    assert got == exp


def test_fuzzy_expansion_order_cap(engine, oracle):
    """Cap keeps (distance asc, term asc) order identically."""
    got = engine.search_fuzzy("parse", k=25, max_edits=2, max_expansions=4)
    exp = oracle.search_fuzzy("parse", k=25, max_edits=2, max_expansions=4)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_dl_distance_metric():
    from baram_ray.index.segment import _dl_distance
    assert _dl_distance("abc", "abc", 2) == 0
    assert _dl_distance("abc", "acb", 2) == 1      # transposition
    assert _dl_distance("table", "tabel", 2) == 1
    assert _dl_distance("abc", "axc", 2) == 1
    assert _dl_distance("abc", "ab", 2) == 1
    assert _dl_distance("abcdef", "fedcba", 2) == 3  # capped: cap+1


# ------------------------------------------------------------------ #
# two-level rank map (round-3: no corpus-sized broadcast in the build)

def test_rank_map_matches_global_sort(ray_session, tmp_path):
    """rank(id) through the per-shard two-level map == position in the
    globally-sorted unique id array, for ANY shard count; dup ids are
    detected per shard."""
    import pyarrow as pa

    from baram_ray.index.build import build_rank_map

    rng = np.random.default_rng(7)
    ids = rng.choice(np.int64(1) << 40, size=5000, replace=False)
    for i, chunk in enumerate(np.array_split(ids, 4)):
        pq.write_table(pa.table({"doc_id": pa.array(chunk, pa.int64())}),
                       tmp_path / f"part{i}.parquet")
    expected_sorted = np.sort(ids)
    for shards in (1, 7):
        rmap, stats = build_rank_map([str(tmp_path)], num_id_shards=shards)
        assert stats["n"] == 5000
        assert stats["min"] == int(ids.min())
        assert stats["max"] == int(ids.max())
        assert len(stats["dups"]) == 0
        probe = rng.permutation(ids)
        got = rmap.rank(probe)
        exp = np.searchsorted(expected_sorted, probe)
        assert (got == exp).all()
    assert rmap.rank(np.empty(0, dtype=np.int64)).shape == (0,)
    # membership-aware variant: absent ids flagged, present ranks exact
    absent = np.array([ids.max() + 5, ids.min() - 5, int(ids[42])],
                      dtype=np.int64)
    ranks, member = rmap.rank_and_member(absent)
    assert member.tolist() == [False, False, True]
    assert ranks[2] == np.searchsorted(expected_sorted, ids[42])
    # the broadcastable-object bound the design promises: every shard's
    # id array is ≤ ~(n/num_shards)·8 B (balanced by sampled bounds;
    # allow 3× sampling skew), NEVER the corpus
    import ray as _ray
    rmap7, _ = build_rank_map([str(tmp_path)], num_id_shards=7)
    sizes = [len(_ray.get(ref)) for ref in rmap7.refs]
    assert sum(sizes) == 5000
    assert max(sizes) <= 3 * (5000 // len(sizes) + 1)
    # duplicate detection is per id-shard (equal values share a shard)
    dup_dir = tmp_path / "dups"
    dup_dir.mkdir()
    dup_ids = ids.copy()
    dup_ids[100] = dup_ids[200]
    for i, chunk in enumerate(np.array_split(dup_ids, 4)):
        pq.write_table(pa.table({"doc_id": pa.array(chunk, pa.int64())}),
                       dup_dir / f"part{i}.parquet")
    _, dstats = build_rank_map([str(dup_dir)], num_id_shards=7)
    assert dstats["dups"].tolist() == [int(dup_ids[100])]


def test_build_identical_across_id_shard_counts(ray_session, corpus_path,
                                                tmp_path, monkeypatch):
    """The index content (segments + termdict) must be byte-identical
    whatever the id-shard granularity — shards are value ranges, so
    per-shard local ranks + prefix bases reproduce the global sort."""
    import glob

    import pyarrow as pa

    def canon(idx_dir, sub, keys):
        t = pa.concat_tables([pq.read_table(f) for f in sorted(
            glob.glob(os.path.join(idx_dir, sub, "*.parquet")))])
        import pyarrow.compute as pc
        return t.take(pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in keys])) \
            .combine_chunks()

    outs = {}
    for tag, ids_per in (("one", str(1 << 30)), ("many", "97")):
        monkeypatch.setenv("BARAM_IDS_PER_RANK_SHARD", ids_per)
        out = str(tmp_path / f"idx_{tag}")
        build_index(corpus_path, out,
                    IndexConfig(fields=("content",), num_shards=4,
                                on_duplicate="first"), resume=False)
        outs[tag] = out
    seg_keys = ["field", "term", "shard", "block_id"]
    assert canon(outs["one"], "segments", seg_keys).equals(
        canon(outs["many"], "segments", seg_keys))
    assert canon(outs["one"], "termdict", ["field", "term"]).equals(
        canon(outs["many"], "termdict", ["field", "term"]))


def test_resume_after_mid_segment_crash(ray_session, corpus_path, tmp_path):
    """Crash MID-segments (partial files on disk, stage manifest never
    written) → resume must discard the partial output and rebuild to a
    content-identical index — the per-partition-checkpoint claim under
    the worst interruption point."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    def canon(idx_dir):
        t = pa.concat_tables([pq_.read_table(f) for f in sorted(
            glob.glob(os.path.join(idx_dir, "segments", "*.parquet")))])
        keys = [("field", "ascending"), ("term", "ascending"),
                ("shard", "ascending"), ("block_id", "ascending")]
        return t.take(pc.sort_indices(t, sort_keys=keys)).combine_chunks()

    cfg = IndexConfig(fields=("content",), num_shards=4)
    clean_dir = str(tmp_path / "clean")
    build_index(corpus_path, clean_dir, cfg, resume=False)

    crash_dir = str(tmp_path / "crashed")
    build_index(corpus_path, crash_dir, cfg, resume=False)
    # simulate the crash: segments half-written (drop some files, plant
    # a garbage partial), manifest for the stage missing
    seg_files = sorted(glob.glob(os.path.join(crash_dir, "segments",
                                              "*.parquet")))
    for f in seg_files[::2]:
        os.remove(f)
    with open(os.path.join(crash_dir, "segments",
                           "partial_garbage.parquet"), "wb") as f:
        f.write(b"\x00not a parquet file")
    os.remove(os.path.join(crash_dir, "_manifests", "segments.json"))
    os.remove(os.path.join(crash_dir, "_manifests", "termdict.json"))
    shutil.rmtree(os.path.join(crash_dir, "termdict"))

    r = build_index(corpus_path, crash_dir, cfg, resume=True)
    assert "forward" in r.resumed_stages          # early stages kept
    assert "segments" not in r.resumed_stages     # stage re-ran
    assert canon(clean_dir).equals(canon(crash_dir))
    e1, e2 = QueryEngine(clean_dir), QueryEngine(crash_dir)
    for q in QUERY_SET[:6]:
        assert e1.search(q["text"], k=q["k"]) == e2.search(q["text"],
                                                           k=q["k"])


def test_sharded_reader_prunes_docs_partitions(ray_session, corpus_path,
                                               tmp_path, monkeypatch):
    """Round-3 serving-side scale path: with the docs table partitioned
    by id shard, a shard-range reader loads ONLY its overlapping id
    shards — and stays rank- AND score-identical to the full reader."""
    import glob
    import json as _json

    from baram_ray.index.segment import IndexReader

    monkeypatch.setenv("BARAM_IDS_PER_RANK_SHARD", "64")  # many id shards
    out = str(tmp_path / "idx")
    cfg = IndexConfig(fields=("content",), num_shards=4,
                      on_duplicate="first")
    build_index(corpus_path, out, cfg, resume=False)
    with open(os.path.join(out, "meta.json")) as f:
        meta = _json.load(f)
    ranks = meta["id_shard_ranks"]
    assert len(ranks) > 3                       # really multi-shard
    shard_dirs = glob.glob(os.path.join(out, "docs", "ids_shard=*"))
    assert len(shard_dirs) == len(ranks) - 1
    full = IndexReader(out)
    total = len(full.doc_ids)
    halves = []
    for rng_ in ((0, 2), (2, 4)):
        r = IndexReader(out, shard_range=rng_)
        halves.append(r)
        # pruned: strictly fewer docs rows resident than the corpus
        assert 0 < len(r.doc_ids) < total
    assert len(halves[0].doc_ids) + len(halves[1].doc_ids) == total
    # rank+score identity: full == merge of the two shard groups
    from baram_ray.query.engine import QueryEngine, ShardedEngine
    e1 = QueryEngine(out)
    e2 = ShardedEngine(out, n_groups=2)
    for q in QUERY_SET[:8]:
        assert e1.search(q["text"], k=q["k"]) == e2.search(q["text"],
                                                           k=q["k"])

def test_rank_map_empty_index_membership(ray_session, tmp_path):
    """rank_and_member on an EMPTY index (purge on an empty docs table)
    must return member=False for every probe instead of IndexError on
    the empty shard id array (round-4 ADVICE fix)."""
    import pyarrow as pa

    from baram_ray.index.build import build_rank_map

    empty_dir = tmp_path / "empty_docs"
    empty_dir.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64())}),
                   empty_dir / "part0.parquet")
    rmap, stats = build_rank_map([str(empty_dir)])
    assert stats["n"] == 0
    probe = np.array([1, 99, 12345], dtype=np.int64)
    ranks, member = rmap.rank_and_member(probe)
    assert member.tolist() == [False, False, False]
    assert (ranks == 0).all()


def test_sharded_id_set_matches_numpy(ray_session):
    """ShardedIdSet.member == numpy isin across shard boundaries, for
    sets built both from build_rank_map's sharded dup detection and
    from a driver array (the incremental per-partition path)."""
    from baram_ray.index.build import ShardedIdSet, build_rank_map
    import ray as _ray

    rng = np.random.RandomState(7)
    dups = np.unique(rng.randint(0, 10_000, size=500).astype(np.int64))
    probe = rng.randint(-100, 11_000, size=3_000).astype(np.int64)

    s1 = ShardedIdSet.from_array(dups)
    assert len(s1) == len(dups)
    np.testing.assert_array_equal(s1.member(probe), np.isin(probe, dups))
    assert s1.head(5).tolist() == sorted(dups.tolist())[:5]

    # multi-shard set with an empty shard in the middle
    bounds = np.array([2_000, 6_000, 6_001], dtype=np.int64)
    shards = [dups[dups < 2_000], dups[(dups >= 2_000) & (dups < 6_000)],
              np.empty(0, dtype=np.int64), dups[dups >= 6_001]]
    s2 = ShardedIdSet(bounds, [_ray.put(a) for a in shards],
                      np.array([len(a) for a in shards], dtype=np.int64))
    keep = dups[dups != 6_000]      # 6_000 falls in the empty shard
    np.testing.assert_array_equal(s2.member(probe), np.isin(probe, keep))

    # round-trip through pickle (what map tasks receive) keeps working
    import pickle
    s3 = pickle.loads(pickle.dumps(s2))
    np.testing.assert_array_equal(s3.member(probe), np.isin(probe, keep))
