"""Differential fuzzing: run engine queries against DuckDB on RANDOM
synthetic tables (not the fixed testdata) — catches assumptions baked
into the driver corpus (value ranges, id density, group counts,
tie patterns). Each trial writes a fresh events/documents parquet dir
and compares dtype-strict, order-insensitive frames, exactly like the
driver's gate."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as contract

QUERIES = contract.queries()
SQL = contract.oracle_sql()

EVENT_QUERIES = ["events_running_value", "events_value_ntile",
                 "events_user_seq", "events_value_hour_corr",
                 "events_daily_pivot", "events_daily_click_purchase",
                 "events_user_freq_cms"]
DOC_QUERIES = ["doc_top_bigrams", "doc_mix_adaptive",
               "dedup_jaccard_clusters"]


def _rand_events(rng: np.random.RandomState, n: int) -> pd.DataFrame:
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 3 + 7)
    ts = (pd.Timestamp("2000-01-01").value // 1000
          + rng.randint(0, 90 * 86400 * 10**6, size=n))
    types = rng.choice(["click", "purchase", "error"], size=n)
    return pd.DataFrame({
        "event_id": ids,
        "ts": pd.to_datetime(np.sort(ts) if rng.rand() < 0.5 else ts,
                             unit="us"),
        "user_id": rng.randint(0, max(2, n // 10), size=n)
                     .astype(np.int64),
        "event_type": types,
        "value": np.round(rng.randn(n) * 500 + 100, 2),
        "props": ["{}"] * n,
    })


def _rand_docs(rng: np.random.RandomState, n: int) -> pd.DataFrame:
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.randint(0, 12)))
             for _ in range(n)]
    # plant near-duplicates so the jaccard component graph is non-empty
    for i in range(0, n - 1, 7):
        texts[i + 1] = texts[i]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) * 5 + 3,
        "text": texts,
        "lang": rng.choice(["en", "ko"], size=n),
        "source": rng.choice(["s0", "s1", "s2"], size=n),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def _compare(name, sf_dir, con):
    res = QUERIES[name](sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    exp = con.execute(SQL[name]).fetchdf()
    assert len(res) == len(exp), f"{name}: {len(res)} vs {len(exp)}"
    assert sorted(res.columns) == sorted(exp.columns), name

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(list(df.columns), kind="stable") \
                 .reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(res), canon(exp),
                                  check_dtype=True, check_exact=True)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_differential_events(seed, ray_session, tmp_path):
    rng = np.random.RandomState(seed)
    d = tmp_path / f"sf_ev_{seed}"
    os.makedirs(d)
    ev = _rand_events(rng, int(rng.randint(50, 400)))
    ev.to_parquet(d / "events.parquet", index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{d}/events.parquet'")
    for name in EVENT_QUERIES:
        _compare(name, str(d), con)


@pytest.mark.parametrize("seed", [5, 19])
def test_differential_documents(seed, ray_session, tmp_path):
    rng = np.random.RandomState(seed)
    d = tmp_path / f"sf_doc_{seed}"
    os.makedirs(d)
    docs = _rand_docs(rng, int(rng.randint(40, 200)))
    docs.to_parquet(d / "documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{d}/documents.parquet'")
    for name in DOC_QUERIES:
        _compare(name, str(d), con)
