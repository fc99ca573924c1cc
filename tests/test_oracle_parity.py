"""Driver-contract pre-validation: run every queries() entry and compare to
its DuckDB oracle the way the driver does (row count + schema + order-
insensitive values). Uses sf0.001 locally (driver uses sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as contract

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


QUERIES = contract.queries()
SQL = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(SQL.keys()))
def test_parity(name, con, ray_session):
    res = QUERIES[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    elif not isinstance(res, pd.DataFrame):
        res = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    exp = con.execute(SQL[name]).fetchdf()
    assert len(res) == len(exp), f"{name}: rows {len(res)} vs {len(exp)}"
    assert sorted(res.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(res.columns)} vs {sorted(exp.columns)}"
    # exact: the driver value-hashes, so bit-equality INCLUDING dtype is the
    # real bar (round-1 lesson: DuckDB sum(BIGINT)->HUGEINT->float64 flipped
    # 10 hash checks red on values that were bit-equal)
    pd.testing.assert_frame_equal(canon(res), canon(exp),
                                  check_dtype=True, check_exact=True)


def test_rows_only_entries(ray_session):
    """Entries without SQL must still run and return sane rows."""
    for name in set(QUERIES) - set(SQL):
        res = QUERIES[name](SF)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        assert len(res) >= 0 and len(res.columns) > 0, name


def test_entry_smoke(ray_session):
    out = contract.entry()
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
