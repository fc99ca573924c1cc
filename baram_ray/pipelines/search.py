"""The flagship search pipelines over ``documents`` — index build + BM25
top-k (SURVEY.md §3.1/§3.2), exposed through the driver contract.

The index for an ``sf_dir`` is built once under /tmp and resumed on
re-entry (stage manifests fingerprint the input, so a changed input
rebuilds automatically).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

import ray.data

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.engine import QueryActor
from baram_ray.query.queryset import QUERY_SET

_INDEX_ROOT = "/tmp/baram_ray_indexes"


def query_pool_size(default: int = 2) -> int:
    """Actor-pool size for the resident-index query stages (round-2
    verdict #8 — was hardcoded 2): ``BARAM_QUERY_POOL`` env wins, else
    scale with the cluster (~1/4 of cluster CPUs, capped at 16 so the
    pool never starves co-running build/aggregate stages). At the
    4-cpu test scale this resolves to the old default of 2."""
    v = os.environ.get("BARAM_QUERY_POOL")
    if v:
        return max(1, int(v))
    try:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(default, min(16, cpus // 4))


def ensure_index(sf_dir: str, positions: bool = False) -> str:
    """Build (or resume) the documents-table index for sf_dir; return its dir.

    ``positions=True`` builds the positional variant (separate dir — the
    term-only index stays position-free so its size/latency are unchanged).
    """
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    suffix = "_pos" if positions else ""
    out = os.path.join(_INDEX_ROOT, f"documents_{tag}{suffix}")
    # n_chars kept as a numeric metadata column → range-filter queries
    # (the reference's published_at range, src/embedding/mod.rs:517-532)
    cfg = IndexConfig(fields=("text",), id_cols=(),
                      keep=("lang", "source", "n_chars"),
                      positions=positions)
    build_index(os.path.join(sf_dir, "documents.parquet"), out, cfg, resume=True)
    return out


# queries against the documents table's actual vocabulary (word-list corpus)
DOC_QUERIES = [
    {"query_id": 0, "text": "data processing query", "k": 10},
    {"query_id": 1, "text": "table scan filter", "k": 10},
    {"query_id": 2, "text": "hash join merge sort", "k": 10},
    {"query_id": 3, "text": "stream window agg", "k": 5},
    {"query_id": 4, "text": "vector batch", "k": 25},
    {"query_id": 5, "text": "qqqxplughz", "k": 10},     # zero hits
]


def bm25_topk(sf_dir: str, queries: list[dict] | None = None,
              concurrency: int | None = None):
    """Batched BM25 top-k via the query actor pool; rows
    (query_id, rank, doc_id, score)."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or DOC_QUERIES)
    # round6 in the actor: a trailing _round stage turns Ray Data's
    # skipped-empty-block placeholder into a SCHEMALESS empty block
    # (all-miss query batches lose the output schema) and costs a task
    # launch per block
    return _typed_topk(
        qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                       fn_constructor_kwargs={"round6": True},
                       batch_format="pandas",
                       concurrency=(1, concurrency or query_pool_size())))


def _actor_search(idx: str, queries: list[dict], **actor_kw) -> pd.DataFrame:
    """Run queries through the QueryActor pool (the operator's real shape:
    resident index per actor, never a driver-side engine)."""
    qs = ray.data.from_items(queries)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs=actor_kw,
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    # _typed_topk, not bare to_pandas: an all-miss query set otherwise
    # yields a NO-COLUMN frame (Ray Data's skipped-empty-block schema
    # loss) and downstream column access KeyErrors
    extra = (("group", "object"),) if actor_kw.get("mode") == "collapse" \
        else ()
    return _typed_topk(out, extra=extra)


def bm25_topk_sharded(sf_dir: str, queries: list[dict] | None = None,
                      n_groups: int = 2):
    """Scatter-gather BM25: one QueryActor pool per shard GROUP (each
    actor holds only its shard range's postings/doc rows, global idf via
    the termdict), merged per query by (score desc, doc_id asc) — the
    multi-node serving shape. Rank-identical to the single-reader path
    (pytest on a forced-multi-shard index); at driver scale the index
    has one shard, so this degenerates gracefully to one group."""
    import json as _json

    idx = ensure_index(sf_dir)
    qs = queries or DOC_QUERIES
    with open(os.path.join(idx, "meta.json")) as f:
        ns = max(1, int(_json.load(f).get("num_shards", 1)))
    n_groups = min(n_groups, ns)
    bounds = [round(i * ns / n_groups) for i in range(n_groups + 1)]
    parts = None
    for lo, hi in zip(bounds, bounds[1:]):
        if hi <= lo:
            continue
        out = ray.data.from_items(qs).map_batches(
            QueryActor, fn_constructor_args=(idx,),
            fn_constructor_kwargs={"shard_range": (lo, hi)},
            batch_format="pandas", concurrency=1)
        parts = out if parts is None else parts.union(out)
    kmap = {q["query_id"]: int(q.get("k", 10)) for q in qs}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        k = kmap.get(int(g["query_id"].iloc[0]), 10)
        g = g.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="stable").head(k).copy()
        g["rank"] = range(1, len(g) + 1)
        g["score"] = g["score"].round(6)
        return g

    return _typed_topk(parts.groupby("query_id").map_groups(
        merge, batch_format="pandas"))


def bm25_filtered(sf_dir: str, query_text: str = "data stream query",
                  lang: str = "en", k: int = 10,
                  min_score: float = 0.01):
    """BM25 top-k with a metadata term filter + min_score — the
    reference's filtered query shape (term filters
    src/embedding/mod.rs:509-532, min_score :623-625). Runs through the
    actor pool. Rows-only driver check; filter semantics tested vs the
    brute-force oracle."""
    idx = ensure_index(sf_dir)
    df = _actor_search(idx, [{"query_id": 0, "text": query_text, "k": k}],
                       filters={"lang": lang}, min_score=min_score)
    return pd.DataFrame({
        "rank": df["rank"].astype("int64"),
        "doc_id": df["doc_id"].astype("int64"),
        "score": df["score"].round(6),
    })


def bm25_daterange(sf_dir: str, query_text: str = "data stream query",
                   lo: int = 100, hi: int = 400, k: int = 10):
    """BM25 top-k restricted to a metadata RANGE (the reference's
    published_at gte/lte filter, src/embedding/mod.rs:517-532 — the
    testdata documents carry no date, so the range is over n_chars;
    the predicate machinery is identical). Rows-only driver check;
    range-mask correctness has a SQL oracle via ``term_range``."""
    idx = ensure_index(sf_dir)
    df = _actor_search(idx, [{"query_id": 0, "text": query_text, "k": k}],
                       filters={"n_chars": {"gte": lo, "lte": hi}})
    return pd.DataFrame({
        "rank": df["rank"].astype("int64"),
        "doc_id": df["doc_id"].astype("int64"),
        "score": df["score"].round(6),
    })


def term_range(sf_dir: str, term: str = "data", lo: int = 100,
               hi: int = 400):
    """Index retrieval + range filter, no scoring: doc_ids whose text
    contains ``term`` (index postings) with n_chars in [lo, hi] (range
    mask) — SQL-expressible, so this is the oracle-checked proof that
    postings and the range predicate are correct."""
    import numpy as np

    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ids = eng.r.doc_ids_for_term("text", term)
    mask = eng.r.filter_mask({"n_chars": {"gte": lo, "lte": hi}})
    rows = np.asarray([eng.r.doc_index[int(d)] for d in ids], dtype=np.int64)
    keep = ids[mask[rows]] if len(rows) else ids
    n_chars = np.asarray(
        [eng.r.doc_meta["n_chars"][eng.r.doc_index[int(d)]] for d in keep],
        dtype=np.int64)
    return pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64"),
                         "n_chars": pd.Series(n_chars, dtype="int64")})


def bm25_highlights(sf_dir: str, query_text: str = "data stream query",
                    k: int = 10):
    """Top-k with per-hit snippets: 1..3 <mark>-tagged ~150-char fragments
    + 500-char word-boundary-truncated content (reference highlight
    config src/embedding/mod.rs:612-621, parse :629-676, truncate
    :855-869). Hit texts come from a DISTRIBUTED filtered scan over the
    documents table (k rows reach the driver, never the corpus)."""
    import numpy as np
    import pyarrow as pa

    from baram_ray.query.highlight import snippets_for_hit
    from baram_ray.tokenizer import tokenize

    idx = ensure_index(sf_dir)
    df = _actor_search(idx, [{"query_id": 0, "text": query_text, "k": k}])
    want = np.asarray(sorted(int(d) for d in df["doc_id"]), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        m = np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), want)
        return batch.filter(pa.array(m))

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).map_batches(
            pick, batch_format="pyarrow").take_all()
    texts = {int(r["doc_id"]): r["text"] for r in docs}
    terms = sorted(set(tokenize(query_text)))

    out = []
    for _, row in df.iterrows():
        snip = snippets_for_hit(texts.get(int(row["doc_id"]), ""), terms)
        out.append({
            "rank": int(row["rank"]),
            "doc_id": int(row["doc_id"]),
            "score": round(float(row["score"]), 6),
            "content": snip["content"],
            "highlights": " … ".join(snip["highlights"]),
            "n_fragments": len(snip["highlights"]),
        })
    return pd.DataFrame(out, columns=["rank", "doc_id", "score", "content",
                                      "highlights", "n_fragments"])


def bm25_paged(sf_dir: str, query_text: str = "table scan filter",
               page_size: int = 7, max_pages: int = 3):
    """search_after pagination (reference scroll loop,
    src/clustering/engine.rs:152-280): emit the first ``max_pages`` pages
    with their page numbers; pytest asserts the concatenation equals the
    single-shot top-k."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    for pi, page in enumerate(eng.paginate(query_text, page_size=page_size)):
        for rank, (d, s) in enumerate(page, 1):
            rows.append({"page": pi, "rank": rank, "doc_id": int(d),
                         "score": round(float(s), 6)})
        if pi + 1 >= max_pages:
            break
    return pd.DataFrame(rows, columns=["page", "rank", "doc_id", "score"])


# exact phrases over the word-list corpus — common enough to have hits,
# specific enough that adjacency actually filters
PHRASE_QUERIES = [
    {"query_id": 0, "text": "table scan", "k": 10},
    {"query_id": 1, "text": "merge sort", "k": 10},
    {"query_id": 2, "text": "hash join merge", "k": 10},
    {"query_id": 3, "text": "qqqxplughz scan", "k": 10},    # zero hits
]


def phrase_topk(sf_dir: str, queries: list[dict] | None = None):
    """Exact-phrase BM25 top-k through the actor pool (positional index;
    Lucene PhraseQuery scoring: idf = Σ term idfs, tf = phrase freq).
    Rows (query_id, rank, doc_id, score); rank identity vs the
    brute-force phrase oracle is pytest-checked, doc-set correctness has
    the ``phrase_match_docs`` SQL oracle."""
    idx = ensure_index(sf_dir, positions=True)
    qs = ray.data.from_items(queries or PHRASE_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "phrase",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def _typed_topk(ds, extra: tuple = ()) -> pd.DataFrame:
    """k-row top-k tail → driver-side frame. Ray Data drops the block
    schema when EVERY query has zero hits (all-empty pandas blocks),
    so the all-miss path needs an explicit typed empty (the
    differential fuzz corpus hits it). ``extra`` appends
    (name, dtype) pairs for modes whose rows carry more than the base
    (query_id, rank, doc_id, score) — e.g. collapse adds "group"."""
    df = ds.to_pandas()
    if df.empty and "query_id" not in df.columns:
        cols = {"query_id": "int64", "rank": "int64",
                "doc_id": "int64", "score": "float64", **dict(extra)}
        df = pd.DataFrame({c: pd.Series(dtype=t)
                           for c, t in cols.items()})
    return df


def phrase_match_docs(sf_dir: str):
    """Exact-phrase RETRIEVAL (no scoring): all doc_ids containing each
    phrase, via positional postings + conjunctive next_geq traversal.
    SQL-expressible (regex word-adjacency on the raw text) → hash-exact
    DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    rows = []
    for pid, phrase in enumerate(["table scan", "merge sort"]):
        for d in eng.match_phrase_docs(phrase):
            rows.append({"phrase_id": pid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["phrase_id", "doc_id"])
    return df.astype({"phrase_id": "int64", "doc_id": "int64"})


SLOP_QUERIES = [
    {"query_id": 0, "text": "table scan", "k": 10, "slop": 1},
    {"query_id": 1, "text": "merge sort", "k": 10, "slop": 2},
    {"query_id": 2, "text": "hash join merge", "k": 10, "slop": 2},
]


def phrase_slop_topk(sf_dir: str, queries: list[dict] | None = None):
    """Sloppy-phrase BM25 top-k through the actor pool (ordered
    span-near minimal windows, tf = Σ 1/(1+slack) — Lucene
    SpanNear/SloppyPhrase semantics; per-row ``slop`` column).
    Rows-only driver check; engine-vs-chain-enumeration-oracle rank
    identity is pytest-checked, doc-set correctness has the
    ``phrase_slop_match_docs`` SQL oracle."""
    idx = ensure_index(sf_dir, positions=True)
    qs = ray.data.from_items(queries or SLOP_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "phrase",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def phrase_slop_match_docs(sf_dir: str):
    """Sloppy-phrase RETRIEVAL: all doc_ids with an ordered window of
    slack ≤ slop for each (phrase, slop) probe. For two-token phrases
    this is SQL-expressible — t1 then t2 with at most ``slop``
    intervening word tokens → hash-exact DuckDB regex oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    rows = []
    for pid, (phrase, slop) in enumerate(
            [("table scan", 1), ("merge sort", 2)]):
        for d in eng.match_phrase_docs(phrase, slop=slop):
            rows.append({"phrase_id": pid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["phrase_id", "doc_id"])
    return df.astype({"phrase_id": "int64", "doc_id": "int64"})


# boolean query surface (reference bool DSL: should + minimum_should_match
# + must_not complement, src/embedding/mod.rs:475-535)
BOOL_QUERIES = [
    {"query_id": 0, "text": "", "must": "data", "should": "table scan;merge sort",
     "must_not": "", "msm": 1, "k": 10},
    {"query_id": 1, "text": "", "must": "query", "should": "",
     "must_not": "vector", "msm": 0, "k": 10},
    {"query_id": 2, "text": "", "must": "", "should": "hash join;group agg",
     "must_not": "", "msm": 2, "k": 15},
]


def bool_topk(sf_dir: str, queries: list[dict] | None = None):
    """Boolean BM25 top-k through the actor pool (mode="bool": clause
    columns must/should/must_not, ';'-separated). Rows-only driver
    check; rank identity vs the brute-force bool oracle is pytest-
    checked, doc-set correctness has the ``bool_match_docs`` oracle."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or BOOL_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "bool",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def bool_match_docs(sf_dir: str):
    """Boolean RETRIEVAL (no scoring): doc_ids where ALL of — 'data'
    present (must), ≥2 of the should clauses {'table scan', 'merge
    sort'} match (a match clause matches when ANY of its terms does),
    and 'vector' absent (must_not). SQL-expressible → hash-exact
    DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ids = eng.match_bool_docs(must=["data"],
                              should=["table scan", "merge sort"],
                              must_not=["vector"],
                              minimum_should_match=2)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def search_collapse_latest(sf_dir: str, query_text: str = "data stream",
                           k: int = 10):
    """Collapse + metadata sort (OpenSearch ``collapse`` with
    ``sort``): the LONGEST matching document per source (n_chars desc,
    doc_id-asc ties), top-k sources by that key — "the best document
    per source" without _score, which makes the whole result
    SQL-expressible → hash-exact DuckDB oracle. Sharded scatter-gather
    re-collapse is identity-tested."""
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    rows = eng.search_collapse_sorted(query_text, "source", "n_chars",
                                      k=k, ascending=False)
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _, _ in rows], dtype="int64"),
        "n_chars": pd.array([int(v) for _, v, _ in rows],
                            dtype="int64"),
        "source": pd.array([str(g) for _, _, g in rows],
                           dtype=object),
    })


def search_compound_docs(sf_dir: str):
    """Compound-bool retrieval over MIXED clause kinds (the OpenSearch
    bool the reference's backend accepts): must = phrase "table scan",
    should (msm=1) = prefix "st" OR term "vector", must_not = wildcard
    "w?nd*". Every clause's match predicate is SQL-expressible on the
    single-space word-list corpus → hash-exact DuckDB oracle. Scoring
    identity per clause vs the dedicated ops is pytest-checked
    (tests/test_compound.py)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    ids = eng.match_compound_docs(
        must=[{"phrase": "table scan"}],
        should=[{"prefix": "st", "max_expansions": 100_000}, "vector"],
        minimum_should_match=1,
        must_not=[{"wildcard": "w?nd*", "max_expansions": 100_000}])
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def regexp_match_docs(sf_dir: str):
    """Regexp retrieval (Lucene/OpenSearch RegexpQuery): all doc_ids
    containing a term FULLY matched by each anchored pattern, via
    term-dict expansion. DuckDB ``regexp_full_match`` per whitespace
    word is the exact equivalent on the single-space word-list corpus
    → hash-exact oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    for pid, pat in enumerate(["st(ream|orage)", "ve.tor"]):
        for d in eng.match_regexp_docs(pat):
            rows.append({"pattern_id": pid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["pattern_id", "doc_id"])
    return df.astype({"pattern_id": "int64", "doc_id": "int64"})


def search_dsl_sorted(sf_dir: str):
    """JSON-DSL request (the POST /api/search body shape,
    src/embedding/mod.rs:470-539): bool should-match + term filter +
    metadata sort routes to the engine's sorted-retrieval path — the
    longest lang='en' docs matching data∧stream, n_chars desc. Fully
    deterministic (no _score) → hash-exact DuckDB oracle; DSL→op
    routing identity is pytest-checked (tests/test_dsl.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = execute_dsl(eng, {
        "query": {"bool": {"should": [{"match": "data stream"}],
                           "filter": [{"term": {"lang": "en"}}]}},
        "sort": [{"n_chars": {"order": "desc"}}], "size": 15})
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "n_chars": pd.array([int(v) for _, v in rows], dtype="int64"),
    })


def search_agg_stats(sf_dir: str, query_text: str = "data"):
    """Metric aggregations through the JSON DSL (OpenSearch ``stats``
    + ``cardinality`` + ``value_count`` bodies) over the full
    conjunctive match set, served by the ShardedEngine scatter-gather
    (int partial sums merge bit-identically; exact distinct-value sets
    union). count/min/max/sum are exact ints; avg is the single IEEE
    division sum/count — both reproducible in SQL → hash-exact DuckDB
    oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"st": {"stats": {"field": "n_chars"}},
                 "card": {"cardinality": {"field": "source"}},
                 "vc": {"value_count": {"field": "n_chars"}}}})
    st = out["aggregations"]["st"]
    rows = [] if st["count"] == 0 else [0]   # typed-empty on no match
    if not rows:
        return pd.DataFrame({
            "n_docs": pd.array([], dtype="int64"),
            "min_chars": pd.array([], dtype="int64"),
            "max_chars": pd.array([], dtype="int64"),
            "sum_chars": pd.array([], dtype="int64"),
            "avg_chars": pd.array([], dtype="float64"),
            "n_sources": pd.array([], dtype="int64"),
            "n_vals": pd.array([], dtype="int64"),
        })
    return pd.DataFrame({
        "n_docs": pd.array([st["count"]], dtype="int64"),
        "min_chars": pd.array([st["min"]], dtype="int64"),
        "max_chars": pd.array([st["max"]], dtype="int64"),
        "sum_chars": pd.array([st["sum"]], dtype="int64"),
        "avg_chars": pd.array([st["avg"]], dtype="float64"),
        "n_sources": pd.array([out["aggregations"]["card"]["value"]],
                              dtype="int64"),
        "n_vals": pd.array([out["aggregations"]["vc"]["value"]],
                           dtype="int64"),
    })


def search_agg_range(sf_dir: str, query_text: str = "data"):
    """Range aggregation through the JSON DSL (OpenSearch ``range``
    agg, half-open [from, to) buckets with open ends) over the full
    match set, ShardedEngine scatter-gather (per-shard bucket counts
    sum exactly). Bucket edges are literals → hash-exact DuckDB
    oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"rg": {"range": {"field": "n_chars", "ranges": [
            {"to": 100}, {"from": 100, "to": 250},
            {"from": 250, "to": 400}, {"from": 400}]}}}})
    buckets = out["aggregations"]["rg"]
    return pd.DataFrame({
        "bucket": pd.array([b["key"] for b in buckets], dtype=object),
        "n": pd.array([b["doc_count"] for b in buckets],
                      dtype="int64"),
    })


def search_agg_terms_stats(sf_dir: str, query_text: str = "data"):
    """Nested sub-aggregation through the JSON DSL (OpenSearch terms
    bucket agg with metric sub-aggs): per-lang stats of n_chars over
    the full match set, one vectorized grouped-stats pass on the
    ShardedEngine (per-bucket counts + int sums merge bit-identically,
    min/max extremum, avg = the single division). Bucket order =
    count desc / key asc → hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"by_lang": {
            "terms": {"field": "lang"},
            "aggs": {"chars": {"stats": {"field": "n_chars"}}}}}})
    buckets = out["aggregations"]["by_lang"]
    return pd.DataFrame({
        "lang": pd.array([str(b["key"]) for b in buckets],
                         dtype=object),
        "n": pd.array([b["doc_count"] for b in buckets],
                      dtype="int64"),
        "min_chars": pd.array([b["chars"]["min"] for b in buckets],
                              dtype="int64"),
        "max_chars": pd.array([b["chars"]["max"] for b in buckets],
                              dtype="int64"),
        "sum_chars": pd.array([b["chars"]["sum"] for b in buckets],
                              dtype="int64"),
        "avg_chars": pd.array([b["chars"]["avg"] for b in buckets],
                              dtype="float64"),
    })


def search_sorted_paged(sf_dir: str, query_text: str = "data",
                        sort_by: str = "n_chars", page: int = 8):
    """sort + search_after pagination through the JSON DSL (OpenSearch
    composite (sort_value, doc_id) cursor): two pages over the
    ShardedEngine concatenated — must equal the one-shot sorted scan
    (LIMIT 2·page in SQL) because the cursor key is unique per doc.
    Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    body = {"query": {"match": query_text},
            "sort": [{sort_by: {"order": "desc"}}], "size": page}
    p1 = execute_dsl(eng, body)
    hits = list(p1)
    if p1:
        p2 = execute_dsl(eng, {**body,
                               "search_after": [p1[-1][1], p1[-1][0]]})
        hits += p2
    return pd.DataFrame({
        "page": pd.array([0] * len(p1) + [1] * (len(hits) - len(p1)),
                         dtype="int64"),
        "doc_id": pd.array([d for d, _ in hits], dtype="int64"),
        sort_by: pd.array([int(v) for _, v in hits], dtype="int64"),
    })


def ensure_index_mf(sf_dir: str) -> str:
    """Two-field variant of :func:`ensure_index` (fields = text, lang)
    for the multi_match field-subset surface; separate cached dir so
    the single-field index's size/latency are unchanged."""
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(_INDEX_ROOT, f"documents_{tag}_mf")
    cfg = IndexConfig(fields=("text", "lang"), id_cols=(),
                      keep=("lang", "source", "n_chars"))
    build_index(os.path.join(sf_dir, "documents.parquet"), out, cfg,
                resume=True)
    return out


def search_multi_match_docs(sf_dir: str):
    """multi_match RETRIEVAL through the JSON DSL over a two-field
    (text, lang) index: the match SET of query 'data en' per field
    subset — ["text"] hits text-token matches only; ["text", "lang^2"]
    adds every doc whose lang field is 'en' (a doc matches iff ANY
    requested (field, term) pair hits). Sets are SQL-expressible on
    the plain-word corpus → hash-exact DuckDB oracle; multi_match
    SCORING is rank/score-identity-tested vs the brute oracle on the
    two-field code corpus (tests/test_index_e2e.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index_mf(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    for case_id, fields in enumerate([["text"], ["text", "lang^2"]]):
        hits = execute_dsl(eng, {
            "query": {"multi_match": {"query": "data en",
                                      "fields": fields}},
            "size": 10**9})
        for d in sorted(int(d) for d, _ in hits):
            rows.append({"case_id": case_id, "doc_id": d})
    df = pd.DataFrame(rows, columns=["case_id", "doc_id"])
    return df.astype({"case_id": "int64", "doc_id": "int64"})


def search_qs_docs(sf_dir: str):
    """Query-STRING retrieval through the parser (the reference REST
    ``q=`` surface): ``'+data -vector stream lang:en'`` routes to the
    boolean engine with a metadata filter; the full match set (must +
    must_not + filter — ``stream`` is a should clause and only scores)
    is SQL-expressible → hash-exact DuckDB oracle. Parse→route
    identity vs the explicit API is pytest-checked per shape."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    hits = eng.search_qs("+data -vector stream lang:en", k=10**9)
    ids = sorted(int(d) for d, _ in hits)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


PREFIX_QUERIES = [
    {"query_id": 0, "text": "s", "k": 10},     # scan/slow/small/sort/...
    {"query_id": 1, "text": "qu", "k": 10},
    {"query_id": 2, "text": "zzz", "k": 10},   # zero hits
]


def prefix_topk(sf_dir: str, queries: list[dict] | None = None):
    """Prefix-query BM25 top-k through the actor pool (term-dict
    expansion capped at 50 per field, bool-should scoring). Rows-only
    driver check; rank identity vs the brute-force prefix oracle is
    pytest-checked; doc-set correctness has the ``prefix_match_docs``
    oracle."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or PREFIX_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "prefix",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def prefix_match_docs(sf_dir: str, prefix: str = "st"):
    """Prefix RETRIEVAL: doc_ids containing any word starting with
    ``prefix`` — SQL-expressible (LIKE over split words) → hash-exact
    DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ids = eng.match_prefix_docs(prefix)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


WILDCARD_QUERIES = [
    {"query_id": 0, "text": "s?a*", "k": 10},   # scan/spark/small/...
    {"query_id": 1, "text": "*ow", "k": 10},    # slow/window/row
    {"query_id": 2, "text": "zz*q", "k": 10},   # zero hits
]


def wildcard_topk(sf_dir: str, queries: list[dict] | None = None):
    """Wildcard-query BM25 top-k through the actor pool (glob pattern
    expanded against the term dict, capped at 50 per field, bool-should
    scoring — reference query_string wildcard surface,
    ``src/embedding/mod.rs:470-539``). Rows-only driver check; rank
    identity vs the brute-force wildcard oracle is pytest-checked;
    doc-set correctness has the ``wildcard_match_docs`` oracle."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or WILDCARD_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "wildcard",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def wildcard_match_docs(sf_dir: str, pattern: str = "s?a*"):
    """Wildcard RETRIEVAL: doc_ids containing any word matching the
    glob ``pattern`` — SQL-expressible (LIKE over split words, ``*``→
    ``%``, ``?``→``_``) → hash-exact DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ids = eng.match_wildcard_docs(pattern)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


FUZZY_QUERIES = [
    {"query_id": 0, "text": "tabel scann", "k": 10},   # 1-edit typos
    {"query_id": 1, "text": "merje", "k": 10},
    {"query_id": 2, "text": "qqjjqq", "k": 10},        # nothing within 2
]


def fuzzy_topk(sf_dir: str, queries: list[dict] | None = None):
    """Fuzzy-match BM25 top-k through the actor pool (Damerau-Levenshtein
    AUTO expansion, Lucene 1−d/len fuzzy boost). Rows-only driver check;
    rank identity vs the brute-force fuzzy oracle is pytest-checked;
    doc-set correctness has the ``fuzzy_match_docs`` oracle."""
    idx = ensure_index(sf_dir)
    qs = ray.data.from_items(queries or FUZZY_QUERIES)
    out = qs.map_batches(QueryActor, fn_constructor_args=(idx,),
                         fn_constructor_kwargs={"mode": "fuzzy",
                                                "round6": True},
                         batch_format="pandas", concurrency=(1, query_pool_size()))
    return _typed_topk(out)


def fuzzy_match_docs(sf_dir: str, term: str = "tabel", max_edits: int = 1):
    """Fuzzy RETRIEVAL: doc_ids containing any word within ``max_edits``
    Damerau-Levenshtein edits of ``term`` — SQL-expressible (DuckDB
    damerau_levenshtein over split words) → hash-exact DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ids = eng.match_fuzzy_docs(term, max_edits=max_edits)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def delete_by_query_docs(sf_dir: str, lang: str = "de",
                         term: str = "vector"):
    """S-surface ``delete_by_query`` (reference
    ``src/embedding/mod.rs:768-789``): on a private copy of the index,
    tombstone docs by metadata term (``lang``, the keyword-field path)
    and by indexed text term (the text-field path), purge, and return
    the LIVE doc_ids. Survivors are SQL-expressible → hash-exact DuckDB
    oracle; the scoring invariants (tombstoned hits keep exact scores,
    purge == scratch rebuild) are pytest-checked."""
    import shutil

    import numpy as np

    from baram_ray.index.deletes import delete_by_query, purge_deletes
    from baram_ray.query.engine import QueryEngine

    idx = ensure_index(sf_dir)
    work = idx + "_deltest"
    if os.path.exists(work):
        shutil.rmtree(work)
    shutil.copytree(idx, work)
    delete_by_query(work, "lang", lang)
    delete_by_query(work, "text", term)
    live_before = QueryEngine(work).live_doc_ids()
    purge_deletes(work)
    live = QueryEngine(work).live_doc_ids()
    assert np.array_equal(live_before, live)   # purge is match-invariant
    return pd.DataFrame({"doc_id": pd.Series(live, dtype="int64")})


HYBRID_W_BM25 = 0.3       # reference hybrid-pipeline weights
HYBRID_W_KNN = 0.7        # (CLAUDE.md:377-387, src/embedding/mod.rs:713-765)
HYBRID_QUERY_VEC = 0      # vec_id used as the kNN query vector


def _minmax(scores: dict[int, float]) -> dict[int, float]:
    """Min-max normalize a doc→score map (the reference's
    ``hybrid-pipeline`` normalization processor)."""
    if not scores:
        return {}
    lo, hi = min(scores.values()), max(scores.values())
    if hi == lo:
        return {d: 1.0 for d in scores}
    return {d: (s - lo) / (hi - lo) for d, s in scores.items()}


def hybrid_topk(sf_dir: str, query_text: str = "data stream query",
                k: int = 10, pool: int = 100):
    """K3: hybrid BM25 + kNN top-k — min-max normalize each sub-query's
    top-``pool`` scores, arithmetic-mean with weights [0.3, 0.7], re-rank
    (reference search_hybrid, src/embedding/mod.rs:537-602; docs carry no
    text-embedding model here, so the kNN query is a corpus vector —
    ``vec_id == doc_id`` in the testdata tables).

    Non-SQL-expressible (BM25 core) → rows-only driver check; rank math
    is unit-tested against a pure-python recomputation. Both sub-queries
    run distributed (actor-pool BM25, map_batches kNN); only the two
    ``pool``-sized score lists meet on the driver for the merge.
    """
    from baram_ray.similarity import brute_force_topk

    idx = ensure_index(sf_dir)
    bdf = _actor_search(idx, [{"query_id": 0, "text": query_text,
                               "k": pool}])
    bm25 = {int(d): float(s) for d, s in zip(bdf["doc_id"], bdf["score"])}

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    kdf = brute_force_topk(ds, [HYBRID_QUERY_VEC], k=pool,
                           round6=False).to_pandas()
    knn = {int(d): float(s) for d, s in zip(kdf["vec_id"], kdf["cosine"])}

    nb, nk = _minmax(bm25), _minmax(knn)
    merged = {d: HYBRID_W_BM25 * nb.get(d, 0.0) + HYBRID_W_KNN * nk.get(d, 0.0)
              for d in set(nb) | set(nk)}
    rows = sorted(merged.items(), key=lambda x: (-x[1], x[0]))[:k]
    return pd.DataFrame({
        "rank": range(1, len(rows) + 1),
        "doc_id": [d for d, _ in rows],
        "score": [round(s, 6) for _, s in rows],
    })


def hybrid_rrf_topk(sf_dir: str, query_text: str = "data stream query",
                    k: int = 10, pool: int = 100, rrf_k: int = 60):
    """Hybrid BM25 + kNN fused by Reciprocal Rank Fusion — the OTHER
    standard hybrid combiner (OpenSearch ``score-ranker-processor``
    rrf, Cormack et al. 2009): score(d) = Σ_subquery 1/(rrf_k + rank),
    rank-only so no score normalization is needed. Same distributed
    sub-queries as ``hybrid_topk``; only the two pool-sized rank lists
    meet on the driver. Rows-only driver check; fusion math is
    unit-recomputed in tests."""
    from baram_ray.similarity import brute_force_topk

    idx = ensure_index(sf_dir)
    bdf = _actor_search(idx, [{"query_id": 0, "text": query_text,
                               "k": pool}])
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    kdf = brute_force_topk(ds, [HYBRID_QUERY_VEC], k=pool,
                           round6=False).to_pandas()
    fused: dict[int, float] = {}
    for df, doc_col in ((bdf, "doc_id"), (kdf, "vec_id")):
        df = df.sort_values("rank", kind="stable")
        for rank, d in zip(df["rank"].tolist(), df[doc_col].tolist()):
            fused[int(d)] = fused.get(int(d), 0.0) + 1.0 / (rrf_k + int(rank))
    rows = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:k]
    return pd.DataFrame({
        "rank": range(1, len(rows) + 1),
        "doc_id": [d for d, _ in rows],
        "score": [round(s, 6) for _, s in rows],
    })


def search_facets(sf_dir: str, query_text: str = "data stream",
                  facet_fields: tuple[str, ...] = ("lang", "source")):
    """Faceted search: terms aggregation over the FULL conjunctive
    match set (every doc containing all query tokens), per kept
    metadata column — OpenSearch ``aggs`` alongside a bool query.
    Runs through the ShardedEngine scatter-gather (per-shard counts
    sum exactly). The match predicate is SQL-expressible on the
    plain-word corpus → hash-exact DuckDB oracle."""
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    rows = eng.facets(query_text, list(facet_fields))
    return pd.DataFrame({
        # explicit object dtype: empty python lists decay to float64
        # (differential-fuzz find on a zero-hit query)
        "facet": pd.array([f for f, _, _ in rows], dtype=object),
        "value": pd.array([str(v) for _, v, _ in rows], dtype=object),
        "n": pd.array([c for _, _, c in rows], dtype="int64"),
    })


def search_facet_hist(sf_dir: str, query_text: str = "data",
                      field: str = "n_chars", interval: float = 50.0):
    """Histogram aggregation (OpenSearch ``histogram`` agg) over the
    full match set: counts per fixed-width bucket of a kept numeric
    metadata column, bucket key = floor(v/interval)*interval. Sharded
    scatter-gather (per-shard histograms sum exactly); hash-exact
    DuckDB oracle."""
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    rows = eng.facet_histogram(query_text, field, interval)
    return pd.DataFrame({
        "bucket": pd.array([b for b, _ in rows], dtype="float64"),
        "n": pd.array([c for _, c in rows], dtype="int64"),
    })


def search_sorted_docs(sf_dir: str, query_text: str = "data stream",
                       sort_by: str = "n_chars", k: int = 15):
    """Metadata-sorted retrieval (OpenSearch ``sort`` clause): the
    conjunctive match set ordered by a kept metadata column DESC
    (doc_id-asc ties), top-k. Sharded scatter-gather merge is
    identical to a single reader; hash-exact DuckDB oracle."""
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    hits = eng.search_sorted(query_text, sort_by, k=k, ascending=False)
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in hits], dtype="int64"),
        sort_by: pd.array([int(v) for _, v in hits], dtype="int64"),
    })


def search_collapse_docs(sf_dir: str, k: int = 10):
    """Field-collapsed BM25 top-k (OpenSearch ``collapse``): at most
    one hit per ``source`` value, each group represented by its best
    (score desc, doc_id asc) hit — the diversity knob for result pages
    dominated by one source. Runs through the QueryActor pool in
    collapse mode (resident index per actor). Rows-only driver check
    (scores are BM25); exactness vs a brute grouped rerank and
    sharded==single identity are asserted in tests."""
    idx = ensure_index(sf_dir)
    qs = [q for q in DOC_QUERIES]
    # _actor_search's all-miss typed empty carries "group" for
    # collapse mode (_typed_topk extra spec), so no local guard
    df = _actor_search(idx, qs, mode="collapse", collapse_field="source")
    df["score"] = df["score"].round(6)
    return df[["query_id", "rank", "doc_id", "score", "group"]]


PERCOLATE_QUERIES = [
    # stored conjunctive term queries (the percolator registry): the
    # reference's keyword-alert conditions in their scalable streaming
    # form — docs flow, queries are resident
    {"query_id": 0, "terms": ["data", "stream"]},
    {"query_id": 1, "terms": ["hash", "join"]},
    {"query_id": 2, "terms": ["sort", "merge", "window"]},
    {"query_id": 3, "terms": ["qqqxplughz"]},          # never matches
    {"query_id": 4, "terms": ["table"]},
]


class PercolateStage:
    """map_batches UDF: match each incoming doc against the resident
    stored-query set (OpenSearch percolator semantics, conjunctive
    terms per query) — the inverse of search, and the scalable shape
    of the reference's keyword alerting (``src/notifications/``: the
    watch list is tiny and ships in the task closure; docs stream).
    Tokenizes each doc ONCE, then each query is a set-containment
    check."""

    def __init__(self, queries: list[dict], text_col: str = "text"):
        from baram_ray.tokenizer import tokenize
        self._tokenize = tokenize
        self.text_col = text_col
        self.queries = [(int(q["query_id"]), frozenset(q["terms"]))
                        for q in queries]

    def __call__(self, batch):
        import pyarrow as pa
        ids, qids = [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch[self.text_col].to_pylist()):
            toks = set(self._tokenize(t or ""))
            for qid, terms in self.queries:
                if terms <= toks:
                    ids.append(d)
                    qids.append(qid)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "query_id": pa.array(qids, pa.int64())})


def search_percolate(sf_dir: str):
    """Percolation over the documents table: (doc_id, query_id) pairs
    for every stored query whose terms ALL appear in the doc. Pure
    streaming map — no shuffle, queries broadcast in the closure.
    Hash-exact DuckDB oracle."""
    from baram_ray.pipelines.util import ensure_cols, read_table
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(PercolateStage(PERCOLATE_QUERIES),
                         batch_format="pyarrow")
    # schema survives a corpus where no stored query matches
    return ensure_cols(out, {"doc_id": "int64", "query_id": "int64"})


PERCOLATE_DSL_BODIES = {
    0: {"bool": {"must": [{"match": "data stream"}],
                 "must_not": [{"match": "vector"}]}},
    1: {"bool": {"filter": [{"term": {"lang": "en"}},
                            {"range": {"n_chars": {"gte": 200}}}],
                 "must": [{"match_phrase": {"query": "table scan",
                                            "slop": 1}}]}},
    2: {"bool": {"should": [{"match": "merge"}, {"match": "sort"}],
                 "minimum_should_match": 2}},
}


def percolate_dsl_docs(sf_dir: str):
    """DSL-body percolation (OpenSearch percolator over full query
    bodies — bool trees with match / sloppy phrase / term / range):
    (doc_id, query_id) for every registered body each doc matches,
    one streaming map (queries ride the actor closure, no shuffle).
    Hash-exact DuckDB oracle; percolator-hit == engine-retrieval
    equivalence is pytest-pinned (tests/test_percolate_dsl.py)."""
    from baram_ray.percolate import DslPercolateStage
    from baram_ray.pipelines.util import ensure_cols, read_table
    ds = read_table(sf_dir, "documents",
                    ["doc_id", "text", "lang", "n_chars"])
    out = ds.map_batches(
        DslPercolateStage(PERCOLATE_DSL_BODIES,
                          meta_cols=("lang", "n_chars")),
        batch_format="pyarrow")
    return ensure_cols(out, {"doc_id": "int64", "query_id": "int64"})


SUGGEST_INPUTS = ["dta", "streem", "winow", "qury", "tabel", "jion"]


def search_suggest(sf_dir: str):
    """'Did you mean' term suggestions (OpenSearch term suggester):
    for each misspelled input, the vocabulary term within DL distance
    ≤ 2 sharing the first char, ranked (distance asc, df desc, term
    asc). Hash-exact DuckDB oracle (damerau_levenshtein + window
    rank over the token vocabulary)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    for q in SUGGEST_INPUTS:
        s = eng.suggest(q, max_edits=2, prefix_length=1)
        if s is not None:
            rows.append((q, s[0], s[1], s[2]))
    return pd.DataFrame({
        "input_term": [r[0] for r in rows],
        "suggestion": [r[1] for r in rows],
        "df": pd.array([r[2] for r in rows], dtype="int64"),
        "distance": pd.array([r[3] for r in rows], dtype="int64"),
    })


def search_mlt(sf_dir: str, seed_doc_id: int = 0, k: int = 10,
               max_terms: int = 5):
    """More-like-this (OpenSearch MLT): the seed doc's top tf·idf terms
    become a bool-should query; results exclude the seed. The seed text
    is one pushdown-filtered row read; term selection uses the
    resident reader's dfs. Rows-only driver check; pytest asserts the
    seed itself would rank first."""
    from collections import Counter

    from baram_ray.query.engine import QueryEngine
    from baram_ray.tokenizer import tokenize
    import math as _math

    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    seed = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"],
                           filters=[("doc_id", "==", seed_doc_id)])
    tf = Counter(tokenize(seed["text"].iloc[0] or ""))
    n = eng.r.n_docs
    scored = []
    for t, f in tf.items():
        df = eng.r.df(eng.r.fields[0], t)
        if df == 0:
            continue
        idf = _math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        scored.append((-f * idf, t))
    terms = [t for _, t in sorted(scored)[:max_terms]]
    hits = eng.search_bool(should=terms, minimum_should_match=1,
                           k=k + 1)
    hits = [(d, s) for d, s in hits if d != seed_doc_id][:k]
    return pd.DataFrame({
        "rank": range(1, len(hits) + 1),
        "doc_id": pd.array([d for d, _ in hits], dtype="int64"),
        "score": [round(s, 6) for _, s in hits],
    })


def build_metrics(sf_dir: str):
    """G11: per-stage pipeline counters from the build manifests (the
    reference's per-batch metrics / checkpoint records,
    src/commands/index.rs:311-323)."""
    import glob
    import json as _json
    idx = ensure_index(sf_dir)
    rows = []
    for p in sorted(glob.glob(os.path.join(idx, "_manifests", "*.json"))):
        with open(p) as f:
            m = _json.load(f)
        rows.append({
            "stage": m.get("stage", os.path.basename(p)[:-5]),
            "seconds": float(m.get("seconds", 0.0)),
            "n_docs": int(m.get("n_docs", 0)),
        })
    return pd.DataFrame(rows, columns=["stage", "seconds", "n_docs"])


def index_term_stats(sf_dir: str):
    """G12: tokenizer/vocabulary statistics — term count, hapax (df=1)
    count and rate (the UNK-rate analogue for a corpus-defined
    vocabulary), total collection frequency, max df."""
    idx = ensure_index(sf_dir)
    td = ray.data.read_parquet(os.path.join(idx, "termdict"))
    from ray.data.aggregate import Count, Max, Sum
    agg = td.aggregate(Count(alias_name="n_terms"),
                       Sum("cf", alias_name="cf_total"),
                       Max("df", alias_name="max_df"))
    import pyarrow.compute as pc
    hapax = td.map_batches(
        lambda b: b.filter(pc.equal(b["df"], 1)),
        batch_format="pyarrow").count()
    n_terms = int(agg["n_terms"])
    return pd.DataFrame([{
        "n_terms": n_terms,
        "hapax_terms": int(hapax),
        "hapax_rate": round(hapax / max(1, n_terms), 6),
        "cf_total": int(agg["cf_total"]),
        "max_df": int(agg["max_df"]),
    }])


def index_stats(sf_dir: str):
    """S6-style count/maintenance surface (reference get_document_count,
    src/embedding/mod.rs:807-818)."""
    idx = ensure_index(sf_dir)
    import json
    with open(os.path.join(idx, "meta.json")) as f:
        meta = json.load(f)
    td = ray.data.read_parquet(os.path.join(idx, "termdict"))
    n_terms = td.count()
    return pd.DataFrame([{
        "n_docs": meta["n_docs"],
        "n_terms": n_terms,
        "avgdl_text": round(meta["avgdl"]["text"], 6),
        "num_shards": meta["num_shards"],
    }])


def search_count(sf_dir: str, query_text: str = "data stream"):
    """The OpenSearch ``_count`` surface: total hits of a conjunctive
    query without scoring or fetching — per-shard match-count sum via
    the facets machinery (counts over a constant facet would do; the
    engines expose the mask size directly through facet totals).
    Hash-exact DuckDB oracle."""
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    # lang is a total partition of the corpus → facet counts sum to
    # the match-set size
    n = sum(c for _, _, c in eng.facets(query_text, ["lang"]))
    return pd.DataFrame({"n_hits": pd.array([n], dtype="int64")})


def hybrid_topk_hnsw(sf_dir: str, query_text: str = "data stream query",
                     k: int = 10, pool: int = 100):
    """``hybrid_topk`` with the kNN side served from the sharded HNSW
    INDEX instead of a brute-force scan — the production hybrid shape
    (both sub-queries hit resident/persisted indexes; only two
    pool-sized score lists meet on the driver). ef_search ≥ pool keeps
    the graph side's top-``pool`` effectively exact, so the fused
    ranking is expected to match ``hybrid_topk``'s (asserted in
    tests). Rows-only driver check (BM25 core has no SQL form)."""
    import hashlib as _hl

    from baram_ray import hnsw as _hnsw
    from baram_ray.similarity import _collect_query_vecs

    idx = ensure_index(sf_dir)
    bdf = _actor_search(idx, [{"query_id": 0, "text": query_text,
                               "k": pool}])
    bm25 = {int(d): float(s) for d, s in zip(bdf["doc_id"], bdf["score"])}

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    tag = _hl.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    gidx = f"/tmp/baram_ray_hnsw/emb_{tag}"
    if not os.path.exists(os.path.join(gidx, "meta.json")):
        _hnsw.hnsw_build(ds, gidx, num_shards=4)
    _, qv = _collect_query_vecs(ds, [HYBRID_QUERY_VEC])
    kdf = _hnsw.hnsw_search(gidx, qv, [HYBRID_QUERY_VEC], k=pool,
                            ef_search=max(pool, 128), round6=False)
    knn = {int(d): float(s) for d, s in zip(kdf["vec_id"], kdf["cosine"])}

    nb, nk = _minmax(bm25), _minmax(knn)
    merged = {d: HYBRID_W_BM25 * nb.get(d, 0.0)
              + HYBRID_W_KNN * nk.get(d, 0.0)
              for d in set(nb) | set(nk)}
    rows = sorted(merged.items(), key=lambda x: (-x[1], x[0]))[:k]
    return pd.DataFrame({
        "rank": range(1, len(rows) + 1),
        "doc_id": [d for d, _ in rows],
        "score": [round(s, 6) for _, s in rows],
    })


def ensure_index_dated(sf_dir: str) -> str:
    """Variant of :func:`ensure_index` whose kept metadata includes a
    derived ``pub_day`` epoch-day column (18262 + doc_id % 1096 — three
    calendar years from 2020-01-01), the date_histogram surface the
    reference serves from OpenSearch's @timestamp mapping
    (src/embedding/mod.rs:517-532). The derivation streams through
    ``map_batches`` into a /tmp parquet (atomic rename) so the oracle
    can reproduce it as a SQL expression over the raw table."""
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = os.path.join(_INDEX_ROOT, f"documents_{tag}_dated_src")
    out = os.path.join(_INDEX_ROOT, f"documents_{tag}_dated")
    if not os.path.isdir(src):
        def add_day(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["pub_day"] = (18262 + (b["doc_id"] % 1096)).astype("int64")
            return b
        tmp = src + ".tmp"
        import shutil as _sh
        _sh.rmtree(tmp, ignore_errors=True)
        (ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
         .map_batches(add_day, batch_format="pandas")
         .write_parquet(tmp))
        os.rename(tmp, src)
    cfg = IndexConfig(fields=("text",), id_cols=(),
                      keep=("lang", "source", "n_chars", "pub_day"))
    build_index(src, out, cfg, resume=True)
    return out


def search_date_histogram(sf_dir: str, query_text: str = "data",
                          interval: str = "month"):
    """date_histogram aggregation through the JSON DSL (OpenSearch
    ``calendar_interval`` body) over the full conjunctive match set,
    served by the ShardedEngine scatter-gather (per-shard bucket
    counts sum exactly; calendar truncation is numpy datetime64 math
    == DuckDB date_trunc). Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"by_month": {"date_histogram": {
            "field": "pub_day", "calendar_interval": interval}}}})
    rows = out["aggregations"]["by_month"]
    return pd.DataFrame({
        "key_as_string": pd.array([r["key_as_string"] for r in rows],
                                  dtype=object),
        "key": pd.array([r["key"] for r in rows], dtype="int64"),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_percentiles(sf_dir: str, query_text: str = "data"):
    """Exact percentiles aggregation through the JSON DSL (OpenSearch
    ``percentiles`` body; the engine serves the exact nearest-rank
    number where OpenSearch serves a TDigest approximation —
    documented stronger semantics, same API). ShardedEngine merges
    per-shard (value, count) pairs exactly; DuckDB ``quantile_disc``
    is the verified-identical convention → hash-exact oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    pcts = [1, 5, 25, 50, 75, 95, 99]
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"pc": {"percentiles": {"field": "n_chars",
                                        "percents": pcts}}}})
    vals = out["aggregations"]["pc"]["values"]
    if vals[str(pcts[0])] is None:
        return pd.DataFrame({f"p{p}": pd.array([], dtype="float64")
                             for p in pcts})
    return pd.DataFrame({f"p{p}": pd.array([vals[str(p)]],
                                           dtype="float64")
                         for p in pcts})


def search_top_hits(sf_dir: str, query_text: str = "data stream",
                    size: int = 2):
    """terms + top_hits sub-aggregation through the JSON DSL (the
    OpenSearch "representative docs per bucket" shape): per source,
    the top ``size`` matching docs by (n_chars desc, doc_id asc),
    flattened to one row per hit. Deterministic (no _score) →
    hash-exact DuckDB oracle (row_number window); sharded re-sort +
    re-cut identity is pytest-checked."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"by_source": {
            "terms": {"field": "source"},
            "aggs": {"top": {"top_hits": {
                "size": size,
                "sort": [{"n_chars": {"order": "desc"}}]}}}}}})
    rows = []
    for b in out["aggregations"]["by_source"]:
        for i, h in enumerate(b["top"]):
            rows.append({"source": b["key"],
                         "doc_count": b["doc_count"],
                         "hit_rank": i + 1,
                         "doc_id": h["doc_id"],
                         "n_chars": h["n_chars"]})
    df = pd.DataFrame(rows, columns=["source", "doc_count", "hit_rank",
                                     "doc_id", "n_chars"])
    return df.astype({"doc_count": "int64", "hit_rank": "int64",
                      "doc_id": "int64", "n_chars": "int64"})


def search_sigtext(sf_dir: str, query_text: str = "data",
                   size: int = 10, min_doc_count: int = 5):
    """significant_text aggregation through the JSON DSL (OpenSearch
    JLH): vocabulary terms over-represented in the match set vs the
    whole corpus. fg/bg doc counts are postings-exact ints; the JLH
    float chain only ORDERS the output (rank column), so the compared
    frame is pure ints/strings → hash-exact DuckDB oracle with the
    identical IEEE expression order in the ORDER BY."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"sig": {"significant_text": {
            "field": "text", "size": size,
            "min_doc_count": min_doc_count}}}})
    rows = out["aggregations"]["sig"]
    return pd.DataFrame({
        "rnk": pd.array(range(1, len(rows) + 1), dtype="int64"),
        "term": pd.array([r["key"] for r in rows], dtype=object),
        "fg_df": pd.array([r["doc_count"] for r in rows],
                          dtype="int64"),
        "bg_df": pd.array([r["bg_count"] for r in rows],
                          dtype="int64"),
    })


def dismax_match_docs(sf_dir: str):
    """dis_max retrieval (Lucene DisjunctionMaxQuery match set): docs
    matching ANY clause — phrase "table scan" OR term 'vector' OR
    prefix 'st'. Scoring identity (max + tie_breaker × rest) is
    pytest-checked vs the brute-force oracle; the match-set union is
    SQL-expressible → hash-exact DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    ids = eng.match_dismax_docs([
        {"phrase": "table scan"},
        {"match": "vector"},
        {"prefix": "st", "max_expansions": 100_000},
    ])
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def phrase_prefix_docs(sf_dir: str, query_text: str = "merge so"):
    """match_phrase_prefix retrieval (OpenSearch search-as-you-type):
    docs where 'merge' is immediately followed by a word starting
    'so', via positional adjacency over the expanded prefix terms.
    max_expansions above vocabulary size == the unbounded regexp →
    hash-exact DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    ids = eng.match_phrase_prefix_docs(query_text,
                                       max_expansions=100_000)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def search_constant_score(sf_dir: str, boost: float = 1.5, k: int = 25):
    """constant_score retrieval through the JSON DSL: every doc in the
    filter-context match set (term lang='en' ∩ match 'data') scores
    exactly ``boost``; equal scores tie-break doc_id asc so top-k is
    the first k matching ids. Fully deterministic → hash-exact DuckDB
    oracle (score is a literal)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = execute_dsl(eng, {
        "query": {"constant_score": {
            "filter": [{"term": {"lang": "en"}}, {"match": "data"}],
            "boost": boost}},
        "size": k})
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "score": pd.array([s for _, s in rows], dtype="float64"),
    })


def search_composite_pages(sf_dir: str, query_text: str = "data",
                           page_size: int = 4):
    """composite aggregation through the JSON DSL (the OpenSearch
    paginated-buckets shape — THE scale-safe aggregation: each request
    ships one page, never the full bucket set): drive the after-cursor
    chain to exhaustion over (lang, source) buckets of the match set,
    one row per bucket tagged with its page number. ShardedEngine
    scatter-gather (per-shard pages merge exactly — proof in
    QueryEngine.facet_composite). Hash-exact DuckDB oracle
    (row_number window)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    body = {"query": {"match": query_text}, "size": 0,
            "aggs": {"pg": {"composite": {
                "sources": [{"lang": {"terms": {"field": "lang"}}},
                            {"source": {"terms":
                                        {"field": "source"}}}],
                "size": page_size}}}}
    rows, page = [], 0
    while True:
        out = execute_dsl(eng, body)["aggregations"]["pg"]
        if not out["buckets"]:
            break
        for b in out["buckets"]:
            rows.append({"page": page, "lang": b["key"]["lang"],
                         "source": b["key"]["source"],
                         "doc_count": b["doc_count"]})
        body["aggs"]["pg"]["composite"]["after"] = out["after_key"]
        page += 1
    df = pd.DataFrame(rows, columns=["page", "lang", "source",
                                     "doc_count"])
    return df.astype({"page": "int64", "doc_count": "int64"})


def search_function_score(sf_dir: str, query_text: str = "data",
                          k: int = 15):
    """function_score + field_value_factor through the JSON DSL
    (boost_mode=replace — the deterministic form): lang='en' docs
    matching 'data' scored by ln(1 + 2·n_chars). The engine computes
    the log through libm over unique values, bit-identical to DuckDB's
    ``ln`` → hash-exact oracle (score round6 both sides; ordering is
    full-precision and monotone in n_chars, so it is ULP-robust)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    rows = execute_dsl(eng, {
        "query": {"function_score": {
            "query": {"bool": {"filter": [
                {"term": {"lang": "en"}},
                {"match": query_text}]}},
            "field_value_factor": {"field": "n_chars", "factor": 2.0,
                                   "modifier": "ln1p"},
            "boost_mode": "replace"}},
        "size": k})
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "score": pd.array([round(s, 6) for _, s in rows],
                          dtype="float64"),
    })


def nested_bool_docs(sf_dir: str):
    """Nested-bool retrieval (bool-inside-bool, the general OpenSearch
    body the reference's backend compiles recursively): docs matching
    data AND (phrase "table scan" OR (vector AND NOT stream)) AND NOT
    (lang='de' AND cache), via the recursive tree evaluator. Scoring
    identity vs the brute-force recursive oracle is pytest-checked
    (tests/test_bool_tree.py); the match SET is SQL-expressible →
    hash-exact DuckDB oracle."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    ids = eng.match_bool_tree_docs({"bool": {
        "must": [{"match": "data"}],
        "should": [
            {"bool": {"must": [{"match_phrase": "table scan"}]}},
            {"bool": {"must": [{"match": "vector"}],
                      "must_not": [{"match": "stream"}]}}],
        "minimum_should_match": 1,
        "must_not": [{"bool": {"filter": [{"term": {"lang": "de"}}],
                               "must": [{"match": "cache"}]}}]}})
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def terms_filter_docs(sf_dir: str):
    """``terms`` (IN-list) filter through the JSON DSL: docs matching
    'data' with lang ∈ {en, fr} — the multi-value metadata filter
    OpenSearch serves as a terms query in filter context (np.isin over
    the kept column). Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = execute_dsl(eng, {
        "query": {"bool": {
            "must": [{"match": "data"}],
            "filter": [{"terms": {"lang": ["en", "fr"]}}]}},
        "size": 10**9})
    ids = sorted(d for d, _ in rows)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


def search_rescore_topk(sf_dir: str, k: int = 10):
    """Rescore (OpenSearch QueryRescorer) through the JSON DSL: BM25
    top-50 window for 'data stream', phrase "table scan" secondary at
    0.7/1.3 weights. Rows-only driver check (BM25 core has no SQL
    form); window semantics and sharded identity are pytest-checked
    (tests/test_bool_tree.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    rows = execute_dsl(eng, {
        "query": {"match": "data stream"}, "size": k,
        "rescore": {"window_size": 50, "query": {
            "rescore_query": {"match_phrase": "table scan"},
            "query_weight": 0.7, "rescore_query_weight": 1.3}}})
    return pd.DataFrame({
        "rank": pd.array(range(1, len(rows) + 1), dtype="int64"),
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "score": pd.array([round(s, 6) for _, s in rows],
                          dtype="float64"),
    })


def search_boosting_topk(sf_dir: str, k: int = 10):
    """boosting query through the JSON DSL: 'data stream' demoted ×0.25
    where 'vector' also matches (Lucene BoostingQuery — the soft
    must_not). Rows-only driver check (BM25 core); demote-vs-exclude
    and sharded identity are pytest-checked (tests/test_bool_tree.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = execute_dsl(eng, {
        "query": {"boosting": {
            "positive": {"match": "data stream"},
            "negative": {"match": "vector"},
            "negative_boost": 0.25}},
        "size": k})
    return pd.DataFrame({
        "rank": pd.array(range(1, len(rows) + 1), dtype="int64"),
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "score": pd.array([round(s, 6) for _, s in rows],
                          dtype="float64"),
    })


def search_filters_agg(sf_dir: str, query_text: str = "data"):
    """``filters`` aggregation through the JSON DSL (named predicate
    buckets — arbitrary leaf/bool trees counted against the outer
    match set), ShardedEngine scatter-gather (counts sum exactly).
    Every bucket predicate is SQL-expressible → hash-exact DuckDB
    oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"fb": {"filters": {"filters": {
            "en_or_fr": {"bool": {"should": [
                {"term": {"lang": "en"}},
                {"term": {"lang": "fr"}}]}},
            "has_vector": {"match": "vector"},
            "long": {"range": {"n_chars": {"gte": 250}}},
        }}}}})
    b = out["aggregations"]["fb"]["buckets"]
    return pd.DataFrame({
        "bucket": pd.array(sorted(b), dtype=object),
        "doc_count": pd.array([b[n]["doc_count"] for n in sorted(b)],
                              dtype="int64"),
    })


def ensure_index_analyzed(sf_dir: str,
                          filters: tuple[str, ...] = ("stop",
                                                      "porter")):
    """Index over an ANALYZER-CHAIN-transformed corpus (stopword
    removal + Porter stemming — the OpenSearch english-analyzer
    config the reference sets per index). The chain is a pure
    text→text ``map_batches`` stage upstream of the core tokenizer,
    so all rank-identity machinery applies to the transformed corpus
    unchanged; the query path applies the SAME chain to query text
    (analysis.analyze_chain)."""
    from baram_ray.analysis import analyze_chain
    tag = hashlib.sha1((os.path.abspath(sf_dir) + str(filters))
                       .encode()).hexdigest()[:12]
    src = os.path.join(_INDEX_ROOT, f"documents_{tag}_an_src")
    out = os.path.join(_INDEX_ROOT, f"documents_{tag}_an")
    if not os.path.isdir(src):
        def transform(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["text"] = [analyze_chain(t or "", filters)
                         for t in b["text"]]
            return b
        tmp = src + ".tmp"
        import shutil as _sh
        _sh.rmtree(tmp, ignore_errors=True)
        (ray.data.read_parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
         .map_batches(transform, batch_format="pandas")
         .write_parquet(tmp))
        os.rename(tmp, src)
    cfg = IndexConfig(fields=("text",), id_cols=(),
                      keep=("lang", "source", "n_chars"))
    build_index(src, out, cfg, resume=True)
    return out


def stemmed_match_docs(sf_dir: str):
    """Stemmed-analyzer RETRIEVAL: the query forms are INFLECTIONS
    that never occur in the corpus ("queries", "tables", "merged") —
    they match only because query and corpus meet at the Porter stem
    ("queri"/"tabl"/"merg"); the stopword filter makes "the" match
    nothing. Hash-exact DuckDB oracle over the UNSTEMMED corpus
    words (the stem conflation is hand-resolved in SQL)."""
    from baram_ray.analysis import analyze_chain
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index_analyzed(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    cases = ["queries", "tables", "merged", "the"]
    for qid, q in enumerate(cases):
        stemmed = analyze_chain(q, ("stop", "porter"))
        if stemmed:
            for d, _ in eng.search(stemmed, k=1_000_000):
                rows.append({"query_id": qid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["query_id", "doc_id"])
    return (df.sort_values(["query_id", "doc_id"])
              .reset_index(drop=True)
              .astype({"query_id": "int64", "doc_id": "int64"}))


def doc_termvectors(sf_dir: str):
    """The OpenSearch ``_termvectors`` surface: per-doc term_freq plus
    corpus-wide doc_freq / total_freq for a fixed id set, served from
    the forward store (doc_id row-group-pruned read) + termdict join
    (query/termvectors.py). Hash-exact DuckDB oracle (unnest + group
    by against the raw corpus)."""
    from baram_ray.query.termvectors import term_vectors
    idx = ensure_index(sf_dir)
    tv = term_vectors(idx, [0, 1, 2, 3, 4, 7, 11])
    return pd.DataFrame({
        "doc_id": pd.array(tv["doc_id"], dtype="int64"),
        "term": pd.array(tv["term"], dtype=object),
        "term_freq": pd.array(tv["term_freq"], dtype="int64"),
        "doc_freq": pd.array(tv["doc_freq"], dtype="int64"),
        "total_freq": pd.array(tv["total_freq"], dtype="int64"),
    })


def search_script_score(sf_dir: str, query_text: str = "data",
                        k: int = 20):
    """``script_score`` top-k through the JSON DSL (ShardedEngine):
    the match set of 'data' re-scored by a metadata-only arithmetic
    script (ONE exact division per doc — vectorized over the kept
    columns, no per-doc loop). Hash-exact DuckDB oracle (same
    expression, same (score DESC, doc_id ASC) tie-break). The
    _score-blended variant is pytest-verified against a brute
    recomputation (tests/test_misc_dsl.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    hits = execute_dsl(eng, {
        "query": {"script_score": {
            "query": {"match": query_text},
            "script": {"source":
                       "params.n_chars * 1.0 / (1 + params.pub_day"
                       " % 7)"}}},
        "size": k})
    return pd.DataFrame({
        "rank": pd.array(range(1, len(hits) + 1), dtype="int64"),
        "doc_id": pd.array([d for d, _ in hits], dtype="int64"),
        "score": pd.array([s for _, s in hits], dtype="float64"),
    })


def ids_filter_docs(sf_dir: str):
    """OpenSearch ``ids`` query through the JSON DSL: the present,
    live subset of a fixed id list as constant-score hits. Hash-exact
    DuckDB oracle (doc_id IN list)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    vals = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 999999999]
    hits = execute_dsl(eng, {"query": {"ids": {"values": vals}},
                             "size": 100})
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in hits], dtype="int64")})


def search_date_range_agg(sf_dir: str, query_text: str = "data"):
    """``date_range`` aggregation (ISO endpoints over the epoch-day
    column, [from, to) buckets) through the JSON DSL on the
    ShardedEngine (per-shard counts sum exactly). Hash-exact DuckDB
    oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"dr": {"date_range": {"field": "pub_day", "ranges": [
            {"to": "2020-07-01"},
            {"from": "2020-07-01", "to": "2022-01-01"},
            {"from": "2022-01-01"}]}}}})
    rows = out["aggregations"]["dr"]
    return pd.DataFrame({
        "key": pd.array([r["key"] for r in rows], dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_adjacency_matrix(sf_dir: str, query_text: str = "data"):
    """``adjacency_matrix`` aggregation (named predicates + all
    pairwise intersections, empty cells dropped) through the JSON DSL
    — a pure composition over the filters-agg scatter-gather.
    Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"adj": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "long": {"range": {"n_chars": {"gte": 250}}},
            "vec": {"match": "vector"},
        }}}}})
    rows = out["aggregations"]["adj"]
    return pd.DataFrame({
        "key": pd.array([r["key"] for r in rows], dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def synonym_match_docs(sf_dir: str):
    """SynonymQuery RETRIEVAL (Lucene blended-term groups — what the
    reference's OpenSearch synonym analyzer produces): docs matching
    every group (operator=and, any member counts) and docs matching a
    single group (operator=or). Hash-exact DuckDB oracle; blended
    BM25 scoring and sharded df-sum identity are pytest-checked
    (tests/test_synonym.py)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    rows = []
    for d in eng.match_synonym_docs(
            [["data", "stream"], ["merge", "sort"]], operator="and"):
        rows.append({"query_id": 0, "doc_id": int(d)})
    for d in eng.match_synonym_docs([["table", "scan"]],
                                    operator="or"):
        rows.append({"query_id": 1, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["query_id", "doc_id"])
    return df.astype({"query_id": "int64", "doc_id": "int64"})


def search_extended_stats(sf_dir: str, query_text: str = "data"):
    """``extended_stats`` aggregation: exact int partials (count /
    min / max / sum / sum-of-squares in unbounded Python ints) merge
    across shards bit-identically; variance/std derive once at the
    end with one fixed float expression the SQL oracle spells
    identically. Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"es": {"extended_stats": {"field": "n_chars"}}}})
    s = out["aggregations"]["es"]
    empty = s.get("count", 0) == 0
    ints = {"cnt": "count", "vmin": "min", "vmax": "max",
            "vsum": "sum", "ssq": "sum_of_squares"}
    flts = {"avg": "avg", "variance": "variance",
            "std_dev": "std_deviation"}
    return pd.DataFrame({
        **{k: pd.array([] if empty else [s[v]], dtype="int64")
           for k, v in ints.items()},
        **{k: pd.array([] if empty else [s[v]], dtype="float64")
           for k, v in flts.items()},
    })


def search_weighted_avg(sf_dir: str, query_text: str = "data"):
    """``weighted_avg`` aggregation: Σ(value·weight) / Σweight with
    exact int partials and ONE final division. Hash-exact DuckDB
    oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"wa": {"weighted_avg": {
            "value": {"field": "n_chars"},
            "weight": {"field": "pub_day"}}}}})
    v = out["aggregations"]["wa"]["value"]
    return pd.DataFrame({"wavg": pd.array(
        [] if v is None else [v], dtype="float64")})


def search_multi_terms(sf_dir: str, query_text: str = "data",
                       size: int = 10):
    """``multi_terms`` aggregation: buckets keyed by the (lang,
    source) TUPLE, ordered (count desc, key asc) — vectorized
    composite-code bincount per shard, counts sum exactly.
    Hash-exact DuckDB oracle (same tie-break at the size cut)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"mt": {"multi_terms": {
            "terms": [{"field": "lang"}, {"field": "source"}],
            "size": size}}}})
    rows = out["aggregations"]["mt"]
    return pd.DataFrame({
        "lang": pd.array([r["key"][0] for r in rows], dtype=object),
        "source": pd.array([r["key"][1] for r in rows],
                           dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_rare_terms(sf_dir: str, query_text: str = "data",
                      max_doc_count: int = 30):
    """``rare_terms`` aggregation: buckets with doc_count ≤ the
    threshold, ordered (count asc, key asc) — served EXACTLY here
    where OpenSearch approximates with a cuckoo filter (documented
    stronger semantics). Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"rt": {"rare_terms": {
            "field": "source", "max_doc_count": max_doc_count}}}})
    rows = out["aggregations"]["rt"]
    return pd.DataFrame({
        "source": pd.array([r["key"] for r in rows], dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_dh_empty_buckets(sf_dir: str):
    """date_histogram ``min_doc_count: 0`` + ``extended_bounds``:
    zero-count buckets fill every month across the bounded range (the
    dense series dashboards and pipeline aggs need). The match set is
    sparsified by a high n_chars cut so real gaps exist. Hash-exact
    DuckDB oracle (generate_series months LEFT JOIN counts)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"bool": {"must": [{"match": "data"}],
                           "filter": [{"range": {"n_chars":
                                                 {"gte": 460}}}]}},
        "size": 0,
        "aggs": {"mo": {"date_histogram": {
            "field": "pub_day", "calendar_interval": "month",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2020-01-01",
                                "max": "2022-12-01"}}}}})
    rows = out["aggregations"]["mo"]
    return pd.DataFrame({
        "key_as_string": pd.array([r["key_as_string"] for r in rows],
                                  dtype=object),
        "key": pd.array([r["key"] for r in rows], dtype="int64"),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_sampler(sf_dir: str, query_text: str = "data"):
    """``sampler`` aggregation: terms sub-agg over the per-shard
    top-100 BM25 matches (the OpenSearch sampler contract — a
    bounded, score-biased sample). Rows-only driver check (the sample
    is rank-defined); sampler == sub-aggs-over-top-N equivalence is
    pytest-pinned (tests/test_misc_dsl.py)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"smp": {"sampler": {"shard_size": 100}, "aggs": {
            "langs": {"terms": {"field": "lang"}}}}}})
    rows = out["aggregations"]["smp"]["langs"]
    return pd.DataFrame({
        "lang": pd.array([r["key"] for r in rows], dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
    })


def search_boxplot(sf_dir: str, query_text: str = "data"):
    """``boxplot`` aggregation: exact five-number summary (min, Q1,
    median, Q3, max — nearest-rank quartiles == DuckDB quantile_disc,
    where OpenSearch serves TDigest). Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"bp": {"boxplot": {"field": "n_chars"}}}})
    b = out["aggregations"]["bp"]
    empty = b["min"] is None
    return pd.DataFrame({
        k: pd.array([] if empty else [b[k]], dtype="float64")
        for k in ("min", "q1", "q2", "q3", "max")})


def search_percentile_ranks(sf_dir: str, query_text: str = "data"):
    """``percentile_ranks`` aggregation: exact 100·(count ≤ v)/n per
    probe value (int partials sum across shards, ONE division each).
    Hash-exact DuckDB oracle."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    probes = [100, 250, 400, 550]
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"pr": {"percentile_ranks": {
            "field": "n_chars", "values": probes}}}})
    vals = out["aggregations"]["pr"]["values"]
    if vals[str(probes[0])] is None:
        return pd.DataFrame({f"r{p}": pd.array([], dtype="float64")
                             for p in probes})
    return pd.DataFrame({f"r{p}": pd.array([vals[str(p)]],
                                           dtype="float64")
                         for p in probes})


def search_cardinality_hll(sf_dir: str, query_text: str = "data"):
    """Approximate cardinality agg (OpenSearch precision_threshold →
    HLL registers) next to the exact count, via the JSON DSL on the
    ShardedEngine (per-shard registers merge bit-identically — tested
    in tests/test_hll.py). Rows-only driver check (blake2b isn't
    SQL-expressible); the ≤5%-error and shard-identity contracts are
    pytest-enforced."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"exact": {"cardinality": {"field": "n_chars"}},
                 "approx": {"cardinality": {
                     "field": "n_chars",
                     "precision_threshold": 3000}}}})
    a = out["aggregations"]
    return pd.DataFrame({
        "exact": pd.array([a["exact"]["value"]], dtype="int64"),
        "approx": pd.array([a["approx"]["value"]], dtype="int64"),
    })


def span_near_docs(sf_dir: str):
    """span_near RETRIEVAL (Lucene SpanNearQuery via the JSON DSL):
    ordered and unordered proximity windows with slop over positional
    postings. Satisfiability is exact (ordered: any chain within
    slack; unordered: the k-list minimal-window sweep) → hash-exact
    DuckDB oracle on token positions (zipped unnest ordinality)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    cases = [
        (["data", "stream"], 2, True),
        (["merge", "sort"], 3, False),
        (["table", "scan", "merge"], 2, True),
    ]
    rows = []
    for qid, (terms, slop, in_order) in enumerate(cases):
        for d in eng.match_span_near_docs(terms, slop=slop,
                                          in_order=in_order):
            rows.append({"query_id": qid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["query_id", "doc_id"])
    return df.astype({"query_id": "int64", "doc_id": "int64"})


def span_first_docs(sf_dir: str):
    """span_first RETRIEVAL: docs whose first occurrence of the term
    lies within the first ``end`` token positions (SpanFirstQuery).
    Hash-exact DuckDB oracle (1-based list_position ≤ end)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    rows = []
    for qid, (term, end) in enumerate([("data", 3), ("stream", 5)]):
        for d in eng.match_span_first_docs(term, end):
            rows.append({"query_id": qid, "doc_id": int(d)})
    df = pd.DataFrame(rows, columns=["query_id", "doc_id"])
    return df.astype({"query_id": "int64", "doc_id": "int64"})


def span_not_docs(sf_dir: str):
    """span_not RETRIEVAL: docs with an occurrence of the include term
    having NO exclude-term occurrence within ``dist`` positions
    (SpanNotQuery, pre = post = dist). Hash-exact DuckDB oracle
    (EXISTS include position with NOT EXISTS nearby exclude)."""
    from baram_ray.query.engine import QueryEngine
    idx = ensure_index(sf_dir, positions=True)
    eng = QueryEngine(idx)
    rows = [{"doc_id": int(d)}
            for d in eng.match_span_not_docs("data", "vector", dist=2)]
    df = pd.DataFrame(rows, columns=["doc_id"])
    return df.astype({"doc_id": "int64"})


def search_dh_pipeline(sf_dir: str, query_text: str = "data"):
    """Parent pipeline aggregations under a monthly date_histogram
    (OpenSearch derivative / cumulative_sum / moving_fn — the
    dashboard shapes the reference serves from OpenSearch): sum metric
    sub-agg, its derivative, a cumulative doc count, and a trailing
    3-bucket moving average (window ends BEFORE the current bucket,
    the moving_fn shift=0 convention). Bucket math is exact int
    sums/diffs plus ONE float division per moving-average cell →
    hash-exact DuckDB window-function oracle. Missing first-bucket
    values surface as NaN (SQL NULL)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"mo": {
            "date_histogram": {"field": "pub_day",
                               "calendar_interval": "month"},
            "aggs": {
                "sum_chars": {"sum": {"field": "n_chars"}},
                "deriv": {"derivative": {"buckets_path": "sum_chars"}},
                "cum_docs": {"cumulative_sum": {
                    "buckets_path": "_count"}},
                "ma3": {"moving_fn": {
                    "buckets_path": "_count", "window": 3,
                    "script":
                        "MovingFunctions.unweightedAvg(values)"}},
            }}}})
    rows = out["aggregations"]["mo"]

    def _opt(r, name):
        v = r.get(name)
        return float(v["value"]) if v is not None else np.nan

    return pd.DataFrame({
        "key_as_string": pd.array([r["key_as_string"] for r in rows],
                                  dtype=object),
        "key": pd.array([r["key"] for r in rows], dtype="int64"),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
        "sum_chars": pd.array([r["sum_chars"]["value"] for r in rows],
                              dtype="int64"),
        "deriv": pd.array([_opt(r, "deriv") for r in rows],
                          dtype="float64"),
        "cum_docs": pd.array([r["cum_docs"]["value"] for r in rows],
                             dtype="int64"),
        "ma3": pd.array([_opt(r, "ma3") for r in rows],
                        dtype="float64"),
    })


def search_bucket_script(sf_dir: str, query_text: str = "data"):
    """bucket_script + bucket_selector + bucket_sort pipeline chain
    under a terms agg: per-language sum of n_chars, a scripted
    avg-chars ratio (ONE exact int/int division), buckets with ≤1 doc
    dropped, top 3 by the scripted value. The AST-whitelisted script
    evaluator is pytest-covered (tests/test_pipeline_aggs.py);
    hash-exact DuckDB oracle (HAVING + ORDER + LIMIT with the same
    tie-break)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"langs": {"terms": {"field": "lang"}, "aggs": {
            "sum_chars": {"sum": {"field": "n_chars"}},
            "avg_chars": {"bucket_script": {
                "buckets_path": {"s": "sum_chars", "c": "_count"},
                "script": "params.s / params.c"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"c": "_count"},
                "script": "params.c > 1"}},
            "cut": {"bucket_sort": {
                "sort": [{"avg_chars": {"order": "desc"}}],
                "size": 3}}}}}})
    rows = out["aggregations"]["langs"]
    return pd.DataFrame({
        "lang": pd.array([r["key"] for r in rows], dtype=object),
        "doc_count": pd.array([r["doc_count"] for r in rows],
                              dtype="int64"),
        "sum_chars": pd.array([r["sum_chars"]["value"] for r in rows],
                              dtype="int64"),
        "avg_chars": pd.array([r["avg_chars"]["value"] for r in rows],
                              dtype="float64"),
    })


def search_sibling_stats(sf_dir: str, query_text: str = "data"):
    """Sibling pipeline aggregation (stats_bucket) reducing a monthly
    date_histogram's per-bucket doc counts to one row: bucket count,
    min/max/sum (exact ints) and avg (ONE sum/count division).
    Hash-exact DuckDB oracle (GROUP BY month, then one aggregate
    row)."""
    from baram_ray.query.dsl import execute_dsl
    from baram_ray.query.engine import ShardedEngine
    idx = ensure_index_dated(sf_dir)
    eng = ShardedEngine(idx, n_groups=2)
    out = execute_dsl(eng, {
        "query": {"match": query_text}, "size": 0,
        "aggs": {"mo": {"date_histogram": {
            "field": "pub_day", "calendar_interval": "month"}},
            "tot": {"stats_bucket": {"buckets_path": "mo>_count"}}}})
    s = out["aggregations"]["tot"]
    empty = "count" not in s          # zero buckets (no matching docs)
    return pd.DataFrame({
        "n_buckets": pd.array([] if empty else [s["count"]],
                              dtype="int64"),
        "min_docs": pd.array([] if empty else [s["min"]],
                             dtype="int64"),
        "max_docs": pd.array([] if empty else [s["max"]],
                             dtype="int64"),
        "sum_docs": pd.array([] if empty else [s["sum"]],
                             dtype="int64"),
        "avg_docs": pd.array([] if empty else [s["avg"]],
                             dtype="float64"),
    })
