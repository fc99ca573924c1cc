"""Distributed joins on the bucketed hash exchange (SURVEY.md §2.4).

The reference's joins are either broadcast-dictionary lookups
(``src/ontology/linker.rs:581-674`` — small side shipped to every worker)
or anti-joins against a processed-set (``src/commands/index.rs:161-175``).
Ray Data has no native join; these build on the explicit two-stage hash
exchange (``baram_ray.util.cogroup``):

- ``broadcast lookup``: when one side fits in memory — see
  ``pipelines.tpch.revenue_by_nation`` (ray.put once, map_batches tasks
  read it zero-copy). ALWAYS prefer this for dimension tables.
- ``hash_join``: both sides large — co-partition both datasets on the
  key hash and merge per bucket with a vectorized ``pandas.merge``. One
  exchange, no sort. Supports inner / left / semi / anti.

Skew note: a hot key lands wholly in one bucket — the cap is bucket
granularity, so ``num_buckets`` should scale with input size; a single
pathological key (cross-join explosion) must be salted by the caller.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from baram_ray.util import cogroup


def hash_join(left, right, on: list[str] | str, *, how: str = "inner",
              num_buckets: int = 32, suffix: str = "_r"):
    """Join two Datasets on ``on`` via one hash exchange.

    ``how``: "inner" | "left" | "outer" | "semi" | "anti" (anti = left
    rows with no match — the checkpoint-prefilter shape, reference
    ``src/commands/index.rs:161-175``; outer = FULL OUTER, unmatched
    rows of either side survive with NULLs). Non-key right columns that
    clash with left names get ``suffix``.
    """
    on = [on] if isinstance(on, str) else list(on)

    def merge(lhs: pd.DataFrame, rhs: pd.DataFrame) -> pd.DataFrame:
        clash = {c: c + suffix for c in rhs.columns
                 if c in lhs.columns and c not in on}
        rhs = rhs.rename(columns=clash)
        if how == "semi":
            return lhs.merge(rhs[on].drop_duplicates(), on=on, how="inner")
        if how == "anti":
            m = lhs.merge(rhs[on].drop_duplicates(), on=on, how="left",
                          indicator=True)
            return m[m["_merge"] == "left_only"].drop(columns=["_merge"])
        return lhs.merge(rhs, on=on, how=how)

    return cogroup(left, right, on, merge, num_buckets=num_buckets)


def asof_join(left, right, *, on: str, by: list[str] | str,
              direction: str = "backward", num_buckets: int = 32,
              suffix: str = "_r",
              left_empty: dict[str, str] | None = None,
              right_empty: dict[str, str] | None = None):
    """As-of join — each left row gets the nearest right row along
    ``on`` (backward: greatest ``right.on <= left.on``) within its
    ``by`` group; unmatched left rows keep NULLs (left-join semantics,
    DuckDB ``ASOF LEFT JOIN`` parity).

    Ray Data has no native as-of join; this is the cogroup exchange on
    the ``by`` key with a per-bucket vectorized ``pandas.merge_asof``.
    Partitioning assumption (document per use): one ``by`` group's rows
    fit a bucket — time-ordering is resolved inside the bucket, so no
    global sort is needed. Tie note: if several right rows share the
    winning ``on`` value, which ROW wins is engine-specific — attach
    VALUE columns (e.g. the timestamp itself), not row identities, when
    ties are possible."""
    by = [by] if isinstance(by, str) else list(by)

    def merge(lhs: pd.DataFrame, rhs: pd.DataFrame) -> pd.DataFrame:
        clash = {c: c + suffix for c in rhs.columns
                 if c in lhs.columns and c != on and c not in by}
        rhs = rhs.rename(columns=clash)
        lhs = lhs.sort_values(on, kind="stable").reset_index(drop=True)
        rhs = rhs.sort_values(on, kind="stable").reset_index(drop=True)
        if not len(lhs):
            out = lhs.copy()
            for c in rhs.columns:
                if c not in out.columns:
                    out[c] = pd.Series(dtype=rhs[c].dtype)
            return out
        return pd.merge_asof(lhs, rhs, on=on, by=by,
                             direction=direction,
                             allow_exact_matches=True)

    return cogroup(left, right, by, merge, num_buckets=num_buckets,
                   left_empty=left_empty, right_empty=right_empty)


# ---------------------------------------------------------------------------
# Size-adaptive dimension-side strategy (round-4 verdict item 2): the J4
# broadcast lookup is only correct-at-scale while the dimension fits a
# worker heap. These helpers make the broadcast-vs-exchange decision
# explicit and testable: a driver-resident pandas side (small by
# construction — see ``pipelines.util.read_dim``) takes the broadcast arm;
# a Ray Dataset side takes the hash-exchange arm. Both arms are
# output-identical (tests/test_joins.py::test_semi_filter_arms_identical).

_BROADCAST_LIMIT = 2_000_000  # rows; ~tens of MB of key columns


def dim_map(dim, fn):
    """Apply a pandas-DataFrame→DataFrame transform to a dimension side
    regardless of which :func:`~baram_ray.pipelines.util.read_dim` arm
    produced it: directly when driver-resident (pandas), as a
    ``map_batches`` stage when it is a Ray Dataset (per-batch transforms
    must be row-local — filters / renames / column derivations, not
    cross-row aggregates)."""
    if hasattr(dim, "map_batches"):
        return dim.map_batches(fn, batch_format="pandas")
    return fn(dim)


def semi_filter(ds, keys, on: str, *, keys_on: str | None = None,
                negate: bool = False, num_buckets: int = 32):
    """Keep ``ds`` rows whose ``on`` value appears (``negate``: does NOT
    appear) in ``keys`` — the semi/anti-join membership filter
    (reference checkpoint prefilter shape, ``src/commands/index.rs:161-175``).

    ``keys``: a pandas DataFrame / Series / numpy array (already
    driver-resident → ``ray.put`` once, vectorized ``np.isin`` inside
    ``map_batches``; one streaming pass, no exchange) or a Ray Dataset
    (→ one ``hash_join(how="semi"/"anti")`` exchange; nothing
    corpus-sized ever touches the driver). Callers decide which side to
    build from parquet METADATA row counts (``pipelines.util.read_dim``)
    so the decision itself costs no data read."""
    keys_on = keys_on or on
    if hasattr(keys, "map_batches"):  # Ray Dataset: exchange arm
        # select+rename inside one fused map stage (Dataset.rename_columns
        # breaks on pandas-backed blocks in ray 2.49)
        kd = keys.map_batches(
            lambda df, c=keys_on: df[[c]].rename(columns={c: on}),
            batch_format="pandas")
        return hash_join(ds, kd, on, how="anti" if negate else "semi",
                         num_buckets=num_buckets)
    if isinstance(keys, pd.DataFrame):
        keys = keys[keys_on]
    arr = np.unique(np.asarray(keys))
    ref = ray.put(arr)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df[on].to_numpy(), ray.get(ref))
        return df[~m if negate else m]

    return ds.map_batches(filt, batch_format="pandas")


def lookup_join(ds, dim, on: str, *, dim_on: str | None = None,
                how: str = "inner", num_buckets: int = 32,
                suffix: str = "_r"):
    """Attach dimension columns to ``ds`` by key (J4 broadcast
    dictionary join, reference ``src/ontology/linker.rs:581-674``) with
    the same two-arm strategy as :func:`semi_filter`:

    - ``dim`` a pandas DataFrame → ``ray.put`` the (deduplicated) frame
      once; each batch does a vectorized ``pandas.merge`` against it.
      ``how="inner"`` doubles as filter+attach (unmatched fact rows drop).
    - ``dim`` a Ray Dataset → one ``hash_join`` exchange.
    """
    dim_on = dim_on or on
    if hasattr(dim, "map_batches"):  # Ray Dataset: exchange arm
        if dim_on != on:
            dim = dim.map_batches(
                lambda df, c=dim_on: df.rename(columns={c: on}),
                batch_format="pandas")
        return hash_join(ds, dim, on, how=how, num_buckets=num_buckets,
                         suffix=suffix)
    dim = dim.rename(columns={dim_on: on}) if dim_on != on else dim
    dim = dim.drop_duplicates(subset=[on])
    ref = ray.put(dim)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(ref)
        clash = {c: c + suffix for c in d.columns
                 if c in df.columns and c != on}
        return df.merge(d.rename(columns=clash), on=on, how=how)

    return ds.map_batches(attach, batch_format="pandas")
