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

import pandas as pd

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
