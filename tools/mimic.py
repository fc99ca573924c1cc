"""Driver-mimic: run every queries() entry against its oracle_sql()
exactly the way the driver's correctness gate does (row count + schema
+ dtype-strict order-insensitive value equality). Run from the REPO
ROOT (Ray workers import baram_ray via cwd):

    python tools/mimic.py [sf_dir]        # default /root/testdata/sf0.01

Run it at BOTH sf0.01 and sf0.1 — the 10x pass has caught dtype leaks
that only appear on non-empty results and sketch parameters falling
out of their exact regime. This script OWNS its Ray session (allowed:
bench.py, CLI entry points, the test fixture, and this tool)."""

import json
import sys
import time

import duckdb
import pandas as pd

import os

import ray

# default to the detected core count (the driver's real environment);
# a hardcoded 32 oversubscribes smaller hosts AND changes bucket-clamp /
# min_blocks behavior relative to what the driver exercises
_CPUS = int(os.environ.get("MIMIC_CPUS", os.cpu_count() or 8))
ray.init(address="local", num_cpus=_CPUS, include_dashboard=False,
         ignore_reinit_error=True)
sys.path.insert(0, ".")
import __ray_entry__ as contract  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns),
                          kind="stable").reset_index(drop=True)


Q = contract.queries()
SQL = contract.oracle_sql()
# optional filter: `python tools/mimic.py [sf_dir] [substr ...]` runs
# only queries whose name contains any given substring;
# MIMIC_EXCLUDE=s1,s2 skips matching names (big-sf sweeps split the
# spill-heavy pair joins into their own fresh session — accumulated
# object-store spill from 180 earlier queries otherwise eats the disk
# headroom the pair join needs)
ONLY = sys.argv[2:]
EXCLUDE = [s for s in os.environ.get("MIMIC_EXCLUDE", "").split(",") if s]
fails, ok, rows_only = [], 0, 0
for name in sorted(Q):
    if any(s in name for s in EXCLUDE):
        continue
    if ONLY and not any(s in name for s in ONLY):
        continue
    t0 = time.time()
    try:
        res = Q[name](SF)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        if name in SQL:
            exp = con.execute(SQL[name]).fetchdf()
            assert len(res) == len(exp), f"rows {len(res)} vs {len(exp)}"
            assert sorted(res.columns) == sorted(exp.columns), \
                f"cols {sorted(res.columns)} vs {sorted(exp.columns)}"
            pd.testing.assert_frame_equal(canon(res), canon(exp),
                                          check_dtype=True,
                                          check_exact=True)
            ok += 1
            status = "HASH-GREEN"
        else:
            assert len(res.columns) > 0
            rows_only += 1
            status = "rows-only"
        print(f"{name}: {status} ({len(res)} rows, "
              f"{time.time() - t0:.1f}s)", flush=True)
        del res
        if name in SQL:
            del exp
        import gc
        gc.collect()    # drop dataset refs now so plasma can reclaim
        # the query's spilled objects before the next one runs
    except Exception as e:  # noqa: BLE001 — report and continue
        fails.append(name)
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
print(json.dumps({"oracle_green": ok, "rows_only": rows_only,
                  "fails": fails}))
ray.shutdown()
