"""Pipeline aggregations (OpenSearch parent/sibling pipeline aggs):
derivative / cumulative_sum / moving_fn / serial_diff / bucket_script /
bucket_selector / bucket_sort under a bucket agg, avg/sum/min/max/
stats_bucket siblings, and date_histogram metric sub-aggs. Every value
is verified against an independent pandas recomputation; sharded ==
single-reader identity; the script evaluator's safety boundary is
tested explicitly (reference serves these from OpenSearch dashboards,
src/embedding/mod.rs:470-539)."""

import shutil

import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import _eval_script, execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_pipeaggs_idx"
SRC = "/tmp/baram_test_pipeaggs_docs.parquet"
N = 300


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(N):
        words = ["data"] * (i % 2) + list(
            rng.choice(["stream", "table", "scan", "merge"],
                       size=int(rng.integers(3, 12))))
        text = " ".join(words) if words else "empty"
        rows.append({
            "doc_id": i,
            "text": text,
            "lang": ["en", "de", "fr", "ko"][i % 4],
            "n_chars": len(text),
            "pub_day": 18000 + (i * 11) % 400,
        })
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), num_shards=4,
                      keep=("lang", "n_chars", "pub_day"))
    build_index(SRC, OUT, cfg, resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


def _match_df(docs_df):
    ws = docs_df["text"].str.lower().str.strip().str.split()
    return docs_df[ws.apply(lambda t: "data" in t)]


def _month_counts(docs_df):
    m = _match_df(docs_df).copy()
    d = pd.to_datetime(m["pub_day"], unit="D")
    m["mo"] = d.values.astype("datetime64[M]").astype("datetime64[D]")
    return m.groupby("mo", sort=True)


DH = {"field": "pub_day", "calendar_interval": "month"}


def test_date_histogram_metric_subaggs(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"mo": {"date_histogram": DH, "aggs": {
            "chars": {"sum": {"field": "n_chars"}},
            "worst": {"max": {"field": "n_chars"}},
            "st": {"stats": {"field": "n_chars"}}}}}})
    buckets = out["aggregations"]["mo"]
    g = _month_counts(docs_df)
    exp = g["n_chars"].agg(["count", "sum", "max", "min", "mean"])
    assert len(buckets) == len(exp)
    for b, (mo, row) in zip(buckets, exp.iterrows()):
        assert b["key"] == mo.to_datetime64().astype(
            "datetime64[D]").astype(np.int64)
        assert b["doc_count"] == row["count"]
        assert b["chars"]["value"] == row["sum"]
        assert b["worst"]["value"] == row["max"]
        assert b["st"]["avg"] == pytest.approx(row["mean"])


def test_derivative_cumsum_serialdiff(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"mo": {"date_histogram": DH, "aggs": {
            "d": {"derivative": {"buckets_path": "_count"}},
            "c": {"cumulative_sum": {"buckets_path": "_count"}},
            "s2": {"serial_diff": {"buckets_path": "_count",
                                   "lag": 2}}}}}})
    buckets = out["aggregations"]["mo"]
    cnts = [b["doc_count"] for b in buckets]
    assert "d" not in buckets[0]          # first bucket: no derivative
    for i in range(1, len(buckets)):
        assert buckets[i]["d"]["value"] == cnts[i] - cnts[i - 1]
    run = 0
    for b in buckets:
        run += b["doc_count"]
        assert b["c"]["value"] == run
    assert "s2" not in buckets[0] and "s2" not in buckets[1]
    for i in range(2, len(buckets)):
        assert buckets[i]["s2"]["value"] == cnts[i] - cnts[i - 2]


def test_moving_fn_window_semantics(engine):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"mo": {"date_histogram": DH, "aggs": {
            "ma": {"moving_fn": {
                "buckets_path": "_count", "window": 3,
                "script": "MovingFunctions.unweightedAvg(values)"}},
            "mi": {"moving_fn": {
                "buckets_path": "_count", "window": 2, "shift": 1,
                "script": "MovingFunctions.min(values)"}}}}}})
    buckets = out["aggregations"]["mo"]
    cnts = [b["doc_count"] for b in buckets]
    # shift=0: window is the 3 buckets BEFORE i — bucket 0 has none
    assert "ma" not in buckets[0]
    for i in range(1, len(buckets)):
        win = cnts[max(0, i - 3):i]
        assert buckets[i]["ma"]["value"] == pytest.approx(
            sum(win) / len(win))
    # shift=1 includes the current bucket
    for i, b in enumerate(buckets):
        win = cnts[max(0, i - 1):i + 1]
        assert b["mi"]["value"] == min(win)


def test_bucket_script_selector_sort(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"langs": {"terms": {"field": "lang"}, "aggs": {
            "chars": {"sum": {"field": "n_chars"}},
            "avgc": {"bucket_script": {
                "buckets_path": {"s": "chars", "c": "_count"},
                "script": "params.s / params.c"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"c": "_count"},
                "script": "params.c > 1"}},
            "cut": {"bucket_sort": {
                "sort": [{"avgc": {"order": "desc"}}],
                "size": 3}}}}}})
    buckets = out["aggregations"]["langs"]
    m = _match_df(docs_df)
    g = m.groupby("lang")["n_chars"].agg(["sum", "count"])
    g = g[g["count"] > 1]
    g["avgc"] = g["sum"] / g["count"]
    exp = g.sort_values("avgc", ascending=False).head(3)
    assert [b["key"] for b in buckets] == list(exp.index)
    for b in buckets:
        assert b["avgc"]["value"] == pytest.approx(
            exp.loc[b["key"], "avgc"])


def test_sibling_aggs(engine, docs_df):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"mo": {"date_histogram": DH},
                 "best": {"max_bucket": {"buckets_path":
                                         "mo>_count"}},
                 "tot": {"stats_bucket": {"buckets_path":
                                          "mo>_count"}}}})
    a = out["aggregations"]
    cnts = [b["doc_count"] for b in a["mo"]]
    assert a["best"]["value"] == max(cnts)
    assert a["tot"] == {"count": len(cnts), "min": min(cnts),
                        "max": max(cnts), "sum": sum(cnts),
                        "avg": sum(cnts) / len(cnts)}


def test_sharded_identity(engine, sharded):
    body = {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"mo": {"date_histogram": DH, "aggs": {
            "chars": {"sum": {"field": "n_chars"}},
            "d": {"derivative": {"buckets_path": "chars"}},
            "ma": {"moving_fn": {
                "buckets_path": "_count", "window": 4,
                "script": "MovingFunctions.sum(values)"}}}},
            "best": {"max_bucket": {"buckets_path": "mo>chars"}}}}
    one = execute_dsl(engine, body)
    many = execute_dsl(sharded, body)
    assert one["aggregations"] == many["aggregations"]


def test_derivative_on_terms_refused(engine):
    with pytest.raises(ValueError, match="histogram-family"):
        execute_dsl(engine, {
            "query": {"match": "data"}, "size": 0,
            "aggs": {"langs": {"terms": {"field": "lang"}, "aggs": {
                "d": {"derivative": {"buckets_path": "_count"}}}}}})


def test_script_evaluator_safety():
    assert _eval_script("params.a / params.b", {"a": 6, "b": 4}) == 1.5
    assert _eval_script("params.c > 1 and params.c < 10", {"c": 5})
    assert _eval_script("-params.x ** 2", {"x": 3}) == -9
    for bad in ("__import__('os')", "params.a.__class__",
                "open('/etc/passwd')", "[1][0]", "x", "'s'",
                "params.a if 1 else 2", "(lambda: 1)()"):
        with pytest.raises(ValueError):
            _eval_script(bad, {"a": 1})
