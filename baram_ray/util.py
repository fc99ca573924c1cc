"""Core helpers shared by build + pipelines."""

from __future__ import annotations

import math
import os


def add_bucket_column(batch, keys: list[str], num_buckets: int,
                      col: str = "__bucket"):
    """Append a deterministic hash-bucket column over ``keys`` (pyarrow in/out).

    ``pd.util.hash_pandas_object`` is seed-stable across processes (unlike
    ``hash()``), so the same key always lands in the same bucket on every
    worker.
    """
    import pandas as pd
    import pyarrow as pa
    df = batch.select(keys).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return batch.append_column(
        col, pa.array((h % num_buckets).astype("int32"), pa.int32()))


def grouped_map(ds, keys: list[str], bucket_fn, *, num_buckets: int):
    """``groupby(keys).map_groups`` without the per-group task overhead.

    Ray Data's ``map_groups`` costs ~10 ms of framework overhead per group —
    ruinous for the 10k+ tiny groups a (term, shard) or (gram) groupby
    produces. Instead: hash ``keys`` into ``num_buckets`` buckets (all rows
    of one key share a bucket), run ONE map_groups call per bucket, and let
    ``bucket_fn`` (pandas DataFrame of the whole bucket → DataFrame) do the
    per-key work with a vectorized ``df.groupby`` inside. ``num_buckets``
    scales with data size, so buckets stay block-sized at any scale.
    """
    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, keys, num_buckets),
        batch_format="pyarrow")

    def run(bucket_df):
        out = bucket_fn(bucket_df.drop(columns=["__bucket"]))
        return out

    return bucketed.groupby("__bucket").map_groups(run, batch_format="pandas")


def grouped_agg(ds, keys: list[str], specs: dict[str, tuple[str | None, str]],
                *, num_buckets: int):
    """``groupby(keys).aggregate(...)`` for HIGH-cardinality keys.

    Ray Data's built-in aggregate walks group boundaries in Python —
    ~100k groups cost minutes. Same bucketing trick as ``grouped_map``,
    with a fully-vectorized ``pandas.groupby.agg`` per bucket.

    ``specs``: output-column → (input-column, fn) where fn is any pandas
    agg name ("sum", "min", "max", "mean", "count"); input-column None +
    fn "count" = group size. Safe for any fn because every key is wholly
    contained in one bucket.
    """
    size_aliases = [a for a, (c, f) in specs.items() if c is None]
    named = {a: (c, f) for a, (c, f) in specs.items() if c is not None}

    def agg_bucket(bucket):
        g = bucket.drop(columns=["__bucket"]).groupby(
            keys, sort=False, as_index=False)
        if named:
            out = g.agg(**{a: pd_namedagg(c, f) for a, (c, f) in named.items()})
        else:
            out = g.size().rename(columns={"size": size_aliases[0]})
            return out
        if size_aliases:
            sz = g.size()["size"].to_numpy()
            for a in size_aliases:
                out[a] = sz
        return out

    import pandas as pd

    def pd_namedagg(col, fn):
        return pd.NamedAgg(column=col, aggfunc=fn)

    bucketed = ds.map_batches(
        lambda b: add_bucket_column(b, keys, num_buckets),
        batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        agg_bucket, batch_format="pandas")


def input_bytes(paths: list[str] | str) -> int:
    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def auto_num_blocks(paths: list[str] | str, cpus: int | None = None) -> int | None:
    """Size-aware ``override_num_blocks`` for ``read_parquet``.

    Ray's default read splitting targets ~2×CPU blocks regardless of input
    size, which turns a 1 MB table into 64 micro-blocks whose per-task
    overhead dominates every downstream shuffle. For small inputs, cap
    blocks at ~1 block / 256 KiB (compressed); for large inputs return
    ``None`` so Ray's own 128 MiB-target splitting governs — the right
    behavior at 100 TB where block count must grow with data, not CPUs.
    """
    if cpus is None:
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
    total = input_bytes(paths)
    by_size = math.ceil(total / (16 << 20)) if total else 1
    if by_size >= 2 * cpus:
        return None                       # big data: Ray's default is right
    return max(1, min(2 * cpus, math.ceil(total / (256 << 10))))
