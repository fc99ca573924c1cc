"""exists/ids queries and the missing / global / date_range /
adjacency_matrix aggregations — including the nullable-column paths no
oracle table exercises (NaN floats, None objects)."""

import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_misc_idx"
SRC = "/tmp/baram_test_misc_docs.parquet"
N = 180


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(41)
    score = rng.uniform(0, 1, N)
    score[::4] = np.nan                      # every 4th doc: null score
    rows = []
    for i in range(N):
        words = ["data"] * (i % 2 or 1) + list(
            rng.choice(["stream", "table", "scan"],
                       size=int(rng.integers(2, 9))))
        rows.append({
            "doc_id": i,
            "text": " ".join(words),
            "lang": ["en", "de"][i % 2],
            "score": score[i],
            "pub_day": 18262 + (i * 13) % 900,
        })
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    build_index(SRC, OUT, IndexConfig(
        fields=("text",), id_cols=(), num_shards=4,
        keep=("lang", "score", "pub_day")), resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


def test_exists_filter(engine, docs_df):
    hits = execute_dsl(engine, {"query": {"bool": {
        "must": [{"match": "data"}],
        "filter": [{"exists": {"field": "score"}}]}}, "size": N})
    got = {d for d, _ in hits}
    exp = {int(r.doc_id) for r in docs_df.itertuples()
           if not np.isnan(r.score)}
    assert got == exp                      # every doc matches 'data'


def test_missing_agg(engine, sharded, docs_df):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"m": {"missing": {"field": "score"}}}}
    one = execute_dsl(engine, body)["aggregations"]["m"]
    many = execute_dsl(sharded, body)["aggregations"]["m"]
    exp = int(docs_df["score"].isna().sum())
    assert one == many == {"doc_count": exp}


def test_ids_query(engine):
    hits = execute_dsl(engine, {"query": {"ids": {
        "values": [5, 3, 99999, 7, 3]}}, "size": 10})
    assert [d for d, _ in hits] == [3, 5, 7]
    assert all(s == 1.0 for _, s in hits)


def test_global_agg_ignores_query(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "stream"}, "size": 0,
        "aggs": {"g": {"global": {}, "aggs": {
            "langs": {"terms": {"field": "lang"}}}},
            "langs_q": {"terms": {"field": "lang"}}}})
    g = {b["key"]: b["doc_count"]
         for b in out["aggregations"]["g"]["langs"]}
    exp = docs_df["lang"].value_counts().to_dict()
    assert g == exp
    q = sum(b["doc_count"] for b in out["aggregations"]["langs_q"])
    assert q < len(docs_df)               # the scoped agg is narrower


def test_date_range_agg(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"dr": {"date_range": {"field": "pub_day", "ranges": [
            {"to": "2020-07-01"},
            {"from": "2020-07-01", "to": "2021-06-01"},
            {"from": "2021-06-01"}]}}}})
    rows = out["aggregations"]["dr"]
    d1 = int(np.datetime64("2020-07-01", "D").astype("int64"))
    d2 = int(np.datetime64("2021-06-01", "D").astype("int64"))
    pv = docs_df["pub_day"].to_numpy()
    assert rows[0]["doc_count"] == int((pv < d1).sum())
    assert rows[1]["doc_count"] == int(((pv >= d1) & (pv < d2)).sum())
    assert rows[2]["doc_count"] == int((pv >= d2).sum())
    assert rows[1]["from"] == d1 and rows[1]["to"] == d2
    assert rows[1]["from_as_string"] == "2020-07-01"


def test_adjacency_matrix(engine, sharded, docs_df):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"adj": {"adjacency_matrix": {"filters": {
                "en": {"term": {"lang": "en"}},
                "scored": {"exists": {"field": "score"}}}}}}}
    one = execute_dsl(engine, body)["aggregations"]["adj"]
    many = execute_dsl(sharded, body)["aggregations"]["adj"]
    assert one == many
    got = {b["key"]: b["doc_count"] for b in one}
    en = docs_df["lang"] == "en"
    sc = docs_df["score"].notna()
    assert got["en"] == int(en.sum())
    assert got["scored"] == int(sc.sum())
    assert got["en&scored"] == int((en & sc).sum())


def test_script_score_vs_brute(engine, sharded, docs_df):
    from baram_ray.query.dsl import execute_dsl
    body = {"query": {"script_score": {
        "query": {"match": "data"},
        "script": "params._score * 2.0 + params.pub_day % 5"}},
        "size": 50}
    got = execute_dsl(engine, body)
    assert got == execute_dsl(sharded, body)   # shard identity
    # brute: BM25 over the same match set, rescored per doc
    base = dict(engine.search("data", k=len(docs_df)))
    days = dict(zip(docs_df["doc_id"], docs_df["pub_day"]))
    exp = sorted(((d, s * 2.0 + days[d] % 5)
                  for d, s in base.items()),
                 key=lambda t: (-t[1], t[0]))[:50]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b, rel=1e-12)


def test_script_score_refuses_non_arith(engine):
    from baram_ray.query.dsl import execute_dsl
    with pytest.raises(ValueError, match="arithmetic-only"):
        execute_dsl(engine, {"query": {"script_score": {
            "query": {"match": "data"},
            "script": "params._score > 1"}}, "size": 5})


def test_extended_stats_and_weighted_avg(engine, sharded, docs_df):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"es": {"extended_stats": {"field": "pub_day"}},
                     "wa": {"weighted_avg": {
                         "value": {"field": "pub_day"},
                         "weight": {"field": "pub_day"}}}}}
    one = execute_dsl(engine, body)["aggregations"]
    many = execute_dsl(sharded, body)["aggregations"]
    assert one == many                     # exact partial merge
    pv = docs_df["pub_day"].to_numpy()
    es = one["es"]
    assert es["count"] == len(pv)
    assert es["sum"] == int(pv.sum())
    assert es["sum_of_squares"] == int((pv.astype(object)
                                        * pv.astype(object)).sum())
    assert es["variance"] == pytest.approx(pv.var(), rel=1e-12)
    assert one["wa"]["value"] == pytest.approx(
        float((pv * pv).sum()) / pv.sum(), rel=1e-12)


def test_multi_terms_and_rare_terms(engine, sharded, docs_df):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"mt": {"multi_terms": {
                "terms": [{"field": "lang"}, {"field": "pub_day"}],
                "size": 5}},
                "rt": {"rare_terms": {"field": "pub_day",
                                      "max_doc_count": 1}}}}
    one = execute_dsl(engine, body)["aggregations"]
    many = execute_dsl(sharded, body)["aggregations"]
    assert one == many
    g = docs_df.groupby(["lang", "pub_day"]).size()
    exp = sorted((((-n), (l, d)) for (l, d), n in g.items()))[:5]
    got = [((-b["doc_count"]), tuple(b["key"])) for b in one["mt"]]
    assert got == exp
    rare = {d for d, n in docs_df["pub_day"].value_counts().items()
            if n <= 1}
    assert {b["key"] for b in one["rt"]} == rare
    assert all(b["doc_count"] <= 1 for b in one["rt"])


def test_dh_min_doc_count_zero(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"bool": {"must": [{"match": "data"}],
                           "filter": [{"range": {"pub_day":
                                                 {"lt": 18300}}}]}},
        "size": 0,
        "aggs": {"mo": {"date_histogram": {
            "field": "pub_day", "calendar_interval": "month",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2020-01-01",
                                "max": "2020-12-01"}}}}})
    rows = out["aggregations"]["mo"]
    assert len(rows) == 12                 # dense Jan..Dec 2020
    assert [r["key_as_string"][:7] for r in rows] == \
        [f"2020-{m:02d}" for m in range(1, 13)]
    assert any(r["doc_count"] == 0 for r in rows)
    assert sum(r["doc_count"] for r in rows) == \
        int((docs_df["pub_day"] < 18300).sum())


def test_boxplot(engine, sharded, docs_df):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"bp": {"boxplot": {"field": "pub_day"}}}}
    one = execute_dsl(engine, body)["aggregations"]["bp"]
    many = execute_dsl(sharded, body)["aggregations"]["bp"]
    assert one == many
    pv = np.sort(docs_df["pub_day"].to_numpy())
    assert one["min"] == float(pv[0]) and one["max"] == float(pv[-1])
    assert pv[0] <= one["q1"] <= one["q2"] <= one["q3"] <= pv[-1]
    # zero-hit → all-None summary
    empty = execute_dsl(engine, {
        "query": {"match": "zzzznope"}, "size": 0,
        "aggs": {"bp": {"boxplot": {"field": "pub_day"}}}})
    assert empty["aggregations"]["bp"]["min"] is None


def test_sampler_agg(engine, sharded):
    body = {"query": {"match": "data"}, "size": 0,
            "aggs": {"smp": {"sampler": {"shard_size": 20}, "aggs": {
                "langs": {"terms": {"field": "lang"}},
                "st": {"stats": {"field": "pub_day"}}}}}}
    one = execute_dsl(engine, body)["aggregations"]["smp"]
    assert one["doc_count"] == 20          # sample is exactly top-N
    # equivalence: sub-aggs over the engine's own top-20 meta rows
    sample = engine.top_docs_meta("data", ["lang", "pub_day"],
                                  shard_size=20)
    vc = sample["lang"].value_counts()
    exp = sorted(((v, int(c)) for v, c in vc.items()),
                 key=lambda t: (-t[1], t[0]))
    assert [(b["key"], b["doc_count"]) for b in one["langs"]] == exp
    assert one["st"]["avg"] == pytest.approx(
        sample["pub_day"].sum() / 20)
    # sharded: per-shard top shard_size concatenate (sample grows)
    many = execute_dsl(sharded, body)["aggregations"]["smp"]
    assert many["doc_count"] == 2 * 20     # 2 shard groups
    with pytest.raises(ValueError, match="nested aggs"):
        execute_dsl(engine, {"query": {"match": "data"}, "size": 0,
                             "aggs": {"s": {"sampler": {}}}})
