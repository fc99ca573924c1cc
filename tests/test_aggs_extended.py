"""Extended OpenSearch aggregation surface: date_histogram (calendar +
fixed intervals), exact percentiles (DuckDB quantile_disc convention),
terms + top_hits sub-aggregation, and significant_text (JLH). Each op
is verified against an independent recomputation (pandas / DuckDB) and
sharded == single-reader identity; DSL routing identity on top."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.dsl import execute_dsl
from baram_ray.query.engine import QueryEngine, ShardedEngine

OUT = "/tmp/baram_test_aggsx_idx"
SRC = "/tmp/baram_test_aggsx_docs.parquet"
N = 240
VOCAB = ["data", "stream", "table", "scan", "merge", "sort", "vector",
         "batch", "index", "query", "shard", "cache"]


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N):
        # docs matching "data" get a skewed vocabulary tail so
        # significant_text has real signal
        has_data = i % 3 == 0
        pool = VOCAB[:6] + (["plasma", "quasar"] if has_data else
                            VOCAB[6:])
        words = (["data"] if has_data else []) + list(
            rng.choice(pool, size=int(rng.integers(5, 30))))
        text = " ".join(words)
        rows.append({
            "doc_id": i,
            "text": text,
            "lang": ["en", "de", "fr"][i % 3],
            "source": f"s{i % 5}",
            "n_chars": len(text),
            # epoch-day date column spanning ~3 years
            "pub_day": 18000 + (i * 7) % 1100,
        })
    df = pd.DataFrame(rows)
    df.to_parquet(SRC, index=False)
    return df


@pytest.fixture(scope="module")
def engine(docs_df):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), num_shards=4,
                      keep=("lang", "source", "n_chars", "pub_day"))
    build_index(SRC, OUT, cfg, resume=False)
    return QueryEngine(OUT)


@pytest.fixture(scope="module")
def sharded(engine):
    return ShardedEngine(OUT, n_groups=2)


@pytest.fixture(scope="module")
def matched(docs_df):
    """The conjunctive match set of query 'data' (plain split == the
    analyzer on this single-space corpus)."""
    return docs_df[docs_df["text"].str.split().map(
        lambda ws: "data" in ws)]


# ------------------------------------------------------------------ #
# date_histogram
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("interval", ["day", "week", "month",
                                      "quarter", "year"])
def test_date_histogram_calendar(engine, matched, interval):
    got = engine.facet_date_histogram("data", "pub_day",
                                      calendar_interval=interval)
    dates = pd.to_datetime(matched["pub_day"], unit="D", origin="unix")
    freq = {"day": "D", "week": "W-MON", "month": "MS",
            "quarter": "QS", "year": "YS"}[interval]
    if interval == "week":
        # pandas W-MON labels the period END; truncate manually
        trunc = dates - pd.to_timedelta(dates.dt.dayofweek, unit="D")
    else:
        trunc = dates.dt.to_period(
            {"day": "D", "month": "M", "quarter": "Q",
             "year": "Y"}[interval]).dt.start_time
    want = trunc.dt.strftime("%Y-%m-%d").value_counts().sort_index()
    assert [(s, c) for s, _, c in got] == list(want.items())
    # key == epoch day of key_as_string
    for s, u, _ in got:
        assert np.datetime64(s, "D").astype(np.int64) == u


def test_date_histogram_fixed(engine, matched):
    got = engine.facet_date_histogram("data", "pub_day",
                                      fixed_interval=30)
    keys = (matched["pub_day"] // 30) * 30
    want = keys.value_counts().sort_index()
    assert [(u, c) for _, u, c in got] == list(want.items())


def test_date_histogram_sharded(engine, sharded):
    for kw in ({"calendar_interval": "month"}, {"fixed_interval": 45}):
        assert sharded.facet_date_histogram("data", "pub_day", **kw) \
            == engine.facet_date_histogram("data", "pub_day", **kw)


def test_date_histogram_validation(engine):
    with pytest.raises(ValueError):
        engine.facet_date_histogram("data", "pub_day")
    with pytest.raises(ValueError):
        engine.facet_date_histogram("data", "pub_day",
                                    calendar_interval="month",
                                    fixed_interval=7)
    with pytest.raises(ValueError):
        engine.facet_date_histogram("data", "pub_day",
                                    calendar_interval="fortnight")


# ------------------------------------------------------------------ #
# percentiles
# ------------------------------------------------------------------ #

def test_percentiles_match_duckdb(engine, matched):
    percents = [1, 5, 25, 50, 75, 95, 99]
    got = engine.facet_percentiles("data", "n_chars",
                                   percents=percents)
    con = duckdb.connect()
    vals = matched["n_chars"].tolist()
    for p in percents:
        want = con.execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
            [p / 100.0, vals]).fetchone()[0]
        assert got[str(p)] == float(want)


def test_percentiles_sharded_identity(engine, sharded):
    assert sharded.facet_percentiles("data", "n_chars") \
        == engine.facet_percentiles("data", "n_chars")


def test_percentiles_empty_match(engine):
    out = engine.facet_percentiles("zzqqneverterm", "n_chars",
                                   percents=[50])
    assert out == {"50": None}


# ------------------------------------------------------------------ #
# top_hits
# ------------------------------------------------------------------ #

def test_top_hits_vs_pandas(engine, matched):
    got = engine.facet_top_hits("data", "lang", "n_chars", size=2)
    for b in got:
        grp = matched[matched["lang"] == b["key"]]
        assert b["doc_count"] == len(grp)
        want = grp.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).head(2)
        assert [h["doc_id"] for h in b["hits"]] == \
            want["doc_id"].tolist()
        assert [h["n_chars"] for h in b["hits"]] == \
            want["n_chars"].tolist()
    # bucket order: count desc, key asc
    counts = [b["doc_count"] for b in got]
    assert counts == sorted(counts, reverse=True)


def test_top_hits_ascending(engine, matched):
    got = engine.facet_top_hits("data", "lang", "n_chars", size=1,
                                ascending=True)
    for b in got:
        grp = matched[matched["lang"] == b["key"]]
        assert b["hits"][0]["n_chars"] == grp["n_chars"].min()


def test_top_hits_sharded_identity(engine, sharded):
    assert sharded.facet_top_hits("data", "lang", "n_chars", size=3) \
        == engine.facet_top_hits("data", "lang", "n_chars", size=3)


# ------------------------------------------------------------------ #
# significant_text
# ------------------------------------------------------------------ #

def _sig_oracle(docs_df, matched, size, min_doc_count):
    """Independent JLH recomputation from raw text."""
    def dfs(frame):
        c: dict[str, int] = {}
        for ws in frame["text"].str.split():
            for t in set(ws):
                c[t] = c.get(t, 0) + 1
        return c
    bg = dfs(docs_df)
    fg = dfs(matched)
    fgN, bgN = len(matched), len(docs_df)
    rows = []
    for t, f in fg.items():
        if f < min_doc_count or bg[t] < min_doc_count:
            continue
        fgp, bgp = f / fgN, bg[t] / bgN
        if fgp <= bgp:
            continue
        rows.append((t, f, bg[t], (fgp - bgp) * (fgp / bgp)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:size]


def test_significant_text_vs_oracle(engine, docs_df, matched):
    got = engine.facet_significant_text("data", size=8,
                                        min_doc_count=3)
    want = _sig_oracle(docs_df, matched, 8, 3)
    assert [(t, fg, bg) for t, fg, bg, _ in got] == \
        [(t, fg, bg) for t, fg, bg, _ in want]
    for (_, _, _, a), (_, _, _, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-12)
    # the planted fg-only terms dominate
    top_terms = {t for t, *_ in got[:3]}
    assert {"plasma", "quasar"} & top_terms


def test_significant_text_sharded_identity(engine, sharded):
    assert sharded.facet_significant_text("data", size=8,
                                          min_doc_count=3) \
        == engine.facet_significant_text("data", size=8,
                                         min_doc_count=3)


def test_significant_text_match_all_is_flat(engine):
    """fg == bg on a match_all query → every score is 0 → empty."""
    assert engine.facet_significant_text("", size=10,
                                         min_doc_count=1) == []


# ------------------------------------------------------------------ #
# DSL routing
# ------------------------------------------------------------------ #

def test_dsl_new_aggs_route(engine):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {
            "by_month": {"date_histogram": {
                "field": "pub_day", "calendar_interval": "month"}},
            "chars_pct": {"percentiles": {
                "field": "n_chars", "percents": [50, 95]}},
            "sig": {"significant_text": {"field": "text", "size": 5,
                                         "min_doc_count": 3}},
        }})
    aggs = out["aggregations"]
    want_dh = engine.facet_date_histogram("data", "pub_day",
                                          calendar_interval="month")
    assert aggs["by_month"] == [
        {"key_as_string": s, "key": u, "doc_count": c}
        for s, u, c in want_dh]
    assert aggs["chars_pct"]["values"] == engine.facet_percentiles(
        "data", "n_chars", percents=[50, 95])
    assert [b["key"] for b in aggs["sig"]] == [
        t for t, *_ in engine.facet_significant_text(
            "data", size=5, min_doc_count=3)]


def test_dsl_terms_top_hits_routes(engine):
    out = execute_dsl(engine, {
        "query": {"match": "data"}, "size": 0,
        "aggs": {"by_lang": {
            "terms": {"field": "lang"},
            "aggs": {"longest": {"top_hits": {
                "size": 2,
                "sort": [{"n_chars": {"order": "desc"}}]}}}}}})
    buckets = out["aggregations"]["by_lang"]
    want = engine.facet_top_hits("data", "lang", "n_chars", size=2)
    assert [b["key"] for b in buckets] == [b["key"] for b in want]
    assert [b["longest"] for b in buckets] == [b["hits"] for b in want]
