"""Shared helpers for the driver-contract pipelines."""

from __future__ import annotations

import os

import ray
import ray.data

from baram_ray.util import auto_num_blocks


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               min_blocks: int | None = None):
    """Column-pruned, block-size-aware parquet read of one testdata table.

    ``min_blocks``: floor on the block count — pass ~CPU count when the
    consumer is CPU-heavy per row (minhash signatures, model scoring):
    the size-based heuristic targets scan efficiency and can emit too
    few blocks to keep every core busy on a small table. At scale the
    size heuristic already yields plenty of blocks and the floor is a
    no-op."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    blocks = auto_num_blocks(path)
    if min_blocks is not None:
        blocks = max(blocks or 0, min_blocks) or None
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def read_small(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side pyarrow read of a SMALL (dimension) table — spinning a
    distributed Ray job to read 25 nation rows costs ~1s of job startup;
    the broadcast-join small side should be read in-process and ray.put."""
    import os
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"),
                      columns=columns)
    return t.to_pandas()


def read_dim(sf_dir: str, name: str, columns: list[str] | None = None,
             broadcast_limit: int = 2_000_000):
    """Strategy-deciding dimension read (J4 → J2 switch, round-4 verdict
    item 2): the parquet METADATA row count (a driver-side footer read —
    no data moves) picks the arm. Below ``broadcast_limit`` rows the
    table is read driver-side (pandas) and callers take the
    ``joins.semi_filter`` / ``joins.lookup_join`` broadcast arm; above
    it the table is a column-pruned Dataset and those helpers route
    through the hash exchange instead — a sf-100 customer table (15M
    rows, GBs as a Python set) never materializes on the driver."""
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, f"{name}.parquet")
    n = pq.ParquetFile(path).metadata.num_rows
    # test hook: BARAM_DIM_BROADCAST_LIMIT=0 forces every dimension side
    # through the exchange arm so the big-SF code path runs at small SF
    env = os.environ.get("BARAM_DIM_BROADCAST_LIMIT")
    if env is not None:
        broadcast_limit = int(env)
    if n <= broadcast_limit:
        return read_small(sf_dir, name, columns)
    return read_table(sf_dir, name, columns)


def broadcast(obj):
    """``ray.put`` once; tasks/actors read the ref (small-side join pattern,
    SURVEY.md J4 — reference broadcast dictionary join,
    src/ontology/linker.rs:581-674)."""
    return ray.put(obj)


def ensure_cols(res, cols: dict[str, str]):
    """Materialize a pipeline result to pandas, restoring the declared
    schema when the result is empty — Ray Data drops 0-row blocks, so an
    empty Dataset loses its column names, which would fail the driver's
    schema comparison against the SQL oracle."""
    import pandas as pd
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if len(df.columns) == 0:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in cols.items()})
    return df
