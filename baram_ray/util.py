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


def _split_by_bucket(block, keys: list[str], num_buckets: int,
                     pre_fn=None):
    """One shuffle-map task: hash ``keys`` → bucket id, return ``num_buckets``
    COMPACTED per-bucket tables. ``take`` copies the selected rows into
    fresh contiguous buffers — essential: a sliced Arrow list/binary column
    serializes its ENTIRE child buffer, which turns a sort-based shuffle of
    B slices per block into O(B × block) bytes moved.

    ``pre_fn`` (block → table) runs first, fused into the split task —
    e.g. the posting combiner, so its output never lands in the object
    store unpartitioned. If the (pre_fn-produced) table already carries a
    precomputed ``__bucket`` column it is used directly (and stripped);
    otherwise buckets come from a pandas hash of the key columns.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if pre_fn is not None:
        block = pre_fn(block)
    if "__bucket" in block.column_names:
        buckets = block["__bucket"].to_numpy(zero_copy_only=False) \
                       .astype(np.int64)
        block = block.drop_columns(["__bucket"])
    else:
        h = pd.util.hash_pandas_object(
            block.select(keys).to_pandas(), index=False).to_numpy()
        buckets = (h % num_buckets).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    starts = np.searchsorted(buckets[order], np.arange(num_buckets))
    bounds = np.append(starts, len(order))
    out = []
    for b in range(num_buckets):
        idx = order[bounds[b]: bounds[b + 1]]
        out.append(block.take(pa.array(idx)) if len(idx)
                   else block.schema.empty_table())
    # with num_returns=1 Ray hands the caller ONE ref to the return
    # value itself — a 1-tuple would arrive as a tuple, not a table
    return out[0] if num_buckets == 1 else tuple(out)


def _first_typed_block(ds):
    """First block of ``ds`` that still carries columns, as an Arrow
    table with null-typed columns mapped to string (a 0-row pandas
    block's object column converts to Arrow ``null``, which would
    poison later concat/union with string-typed fragments) — or None
    when every block is schema-less. NOTE: iterating an unexecuted
    dataset's bundles (re-)executes its plan; callers sit on rare
    empty-result paths where the result blocks are trivial."""
    import pyarrow as pa

    import ray as _ray
    from ray.data.block import BlockAccessor
    for bundle in ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            tbl = BlockAccessor.for_block(_ray.get(ref)).to_arrow()
            if tbl.num_columns:
                fields = [pa.field(f.name, pa.string()
                                   if pa.types.is_null(f.type)
                                   else f.type)
                          for f in tbl.schema]
                return pa.schema(fields).empty_table()
    return None


def _empty_typed_table(ds):
    """Empty Arrow table with ``ds``'s schema (for the zero-block case).

    Pandas-format upstream blocks report a PandasBlockSchema whose
    ``types`` are PYTHON classes / numpy dtypes, not Arrow DataTypes —
    map those through pandas to get real Arrow fields."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    schema = ds.schema()
    if schema is None:
        # ds.schema() is None for ANY zero-row dataset — even when its
        # blocks are fully typed (e.g. an exchange reduce's typed-empty
        # output): recover the schema from the first block that still
        # carries columns before giving up
        tbl = _first_typed_block(ds)
        if tbl is not None:
            return tbl
        # truly schema-less (every upstream block 0-row AND column-less:
        # the 0-row INPUT TABLE case) — degrade to a zero-column empty;
        # callers' ensure_cols restores the declared output columns
        return pa.schema([]).empty_table()
    fields = []
    for n, t in zip(schema.names, schema.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
            continue
        if t is str or t is object:
            fields.append(pa.field(n, pa.string()))
        elif t is bool:
            fields.append(pa.field(n, pa.bool_()))
        else:
            try:
                fields.append(pa.field(
                    n, pa.from_numpy_dtype(np.dtype(t))))
            except Exception:
                fields.append(pa.field(n, pa.string()))
    return pa.schema(fields).empty_table()


def to_typed_pandas(ds):
    """Dataset → pandas with the schema preserved on ZERO-ROW results.

    ``ray.data.Dataset.to_pandas()`` returns a COLUMN-LESS frame for
    any 0-row dataset even when every block is fully typed (verified on
    ``from_arrow`` of a typed empty table) — and ``ds.schema()`` is
    None for the same datasets, so the all-miss / everything-filtered
    case loses the result schema at the driver boundary. Recover it
    BLOCK-level: the first block that still carries columns (a typed
    empty emitted by an exchange reduce or passed through Ray's
    empty-block bypass) supplies the frame. A dataset whose every
    block is schema-less falls through unchanged for the caller's
    declared-schema restoration (EMPTY_SCHEMAS)."""
    ds = ds.materialize()   # execute ONCE: both to_pandas and the
    # schema-recovery scan below read the same cached blocks instead
    # of re-running the plan (queries() results are driver-sized)
    df = ds.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        tbl = _first_typed_block(ds)
        if tbl is not None:
            return tbl.to_pandas()
    return df


def _empty_exchange_result(ds, bucket_fn, batch_format: str, pre_fn=None):
    """Run the bucket function once over an empty-but-typed input so a
    zero-block exchange still yields the correct OUTPUT schema."""
    import pyarrow as pa
    tbl = _empty_typed_table(ds)
    if tbl.num_columns == 0:
        # schema-less empty input (see _empty_typed_table): bucket_fn
        # can't run without its key columns — pass the zero-column
        # empty through; ensure_cols downstream restores declared cols
        return tbl
    if pre_fn is not None:
        tbl = pre_fn(tbl)
    if batch_format == "pandas":
        out = bucket_fn(tbl.to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)
    return bucket_fn(tbl)


def _reduce_bucket(bucket_fn, batch_format: str, frag_refs: list):
    """Fragment refs arrive as a LIST (not unpacked args) so the task is
    scheduled immediately and fetches them itself in one batched
    ``ray.get`` — unpacked args serialize scheduling on arg resolution."""
    import pandas as pd
    import pyarrow as pa
    import ray
    frags = ray.get(frag_refs)
    tables = [f for f in frags if f.num_rows] or [frags[0]]
    tbl = pa.concat_tables(tables).combine_chunks()
    if batch_format == "pandas":
        out = bucket_fn(tbl.to_pandas())
        out = pa.Table.from_pandas(out, preserve_index=False)
    else:
        out = bucket_fn(tbl)
    return out, out.num_rows


def _clamp_buckets(num_buckets: int, n_blocks: int) -> int:
    """Small-input bucket clamp: cut reduce-task count when blocks are
    scarce, but never below the session CPU count — per-bucket work can
    be CPU-heavy (pair verification, encode), and fewer buckets than
    cores trades task overhead for idle cores. ``num_buckets`` remains
    the ceiling; at scale (blocks >> cpus) the clamp never bites."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    floor = min(num_buckets, cpus)
    return max(1, max(floor, min(num_buckets, 2 * n_blocks)))


def grouped_map(ds, keys: list[str], bucket_fn, *, num_buckets: int,
                batch_format: str = "pandas", pre_fn=None):
    """``groupby(keys).map_groups`` as an explicit two-stage hash exchange.

    Why not ``ds.groupby(keys).map_groups``: (a) Ray Data's map_groups
    costs ~10 ms framework overhead per group — ruinous for the 10k+ tiny
    groups a (term, shard) or (gram) groupby produces; (b) its sort-based
    shuffle re-serializes sliced list columns with their whole child
    buffer, making the exchange O(partitions × block bytes).

    Shape: each input block is split into ``num_buckets`` compacted
    fragments (hash of ``keys`` → bucket, so all rows of one key share a
    bucket); one reduce task per bucket concats its fragments and calls
    ``bucket_fn`` (whole bucket in → table out) which does the per-key
    work with a vectorized groupby inside. ``num_buckets`` scales with
    data size, so buckets stay block-sized at any scale; this is the same
    partitioned exchange a multi-node run needs — fragments move through
    the object store and reduces run wherever their inputs are.

    Use ``batch_format="pyarrow"`` when buckets carry list/binary columns
    (pandas conversion materializes millions of Python objects).

    Multi-node / driver-memory behavior (round-2 verdict #5): the
    driver holds only REFS (a few hundred bytes each), never fragment
    bytes — fragments live in the object store of whichever node ran
    the split and are pulled by the reduce that needs them. With a
    ``pre_fn`` (the flagship combiner path, where inputs are biggest)
    split tasks are submitted AS upstream blocks materialize — the
    map stage of the exchange overlaps the producing stage instead of
    waiting behind a full materialization. Fragment refs are released
    per COMPLETED reduce (a ray.wait loop), so plasma can evict each
    bucket's fragments while later reduces still run, bounding peak
    object-store footprint to ~input + the in-flight buckets instead
    of input + all fragments. Driver ref bookkeeping is
    O(blocks × buckets); at 10⁶ blocks × 10³ buckets that is GBs of
    refs — beyond that, nest two exchanges (bucket-of-buckets) rather
    than widening this one.
    """
    import ray
    import ray.data

    import time as _time
    dbg = os.environ.get("BARAM_TIMING") == "1"
    t0 = _time.perf_counter()
    split = ray.remote(num_returns=num_buckets)(_split_by_bucket)
    frag_refs: list = []
    if pre_fn is not None:
        # combiner path: bucket ids are precomputed by pre_fn, so the
        # bucket count is fixed and splits can launch as blocks land
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                # Ray skips UDFs on 0-row blocks and emits SCHEMA-LESS
                # empties; they carry nothing and would KeyError — drop
                if meta.num_rows == 0:
                    continue
                r = split.remote(block_ref, keys, num_buckets, pre_fn)
                frag_refs.append([r] if num_buckets == 1 else list(r))
    else:
        block_refs = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows == 0:
                    continue
                block_refs.append(block_ref)
        # clamp buckets to input size: with B buckets and K blocks the
        # exchange creates K·B fragments + B reduce tasks; a small input
        # through a 64-bucket exchange is pure task overhead.
        # ``num_buckets`` stays the ceiling for large inputs (where
        # buckets must be block-sized), the clamp only bites when blocks
        # are scarce. NOT applied with a pre_fn: combiners like
        # PartialPostings precompute ``__bucket = hash % caller_buckets``
        # — clamping after the fact would drop rows.
        if block_refs:
            num_buckets = _clamp_buckets(num_buckets, len(block_refs))
        split = ray.remote(num_returns=num_buckets)(_split_by_bucket)
        for block_ref in block_refs:
            r = split.remote(block_ref, keys, num_buckets, None)
            frag_refs.append([r] if num_buckets == 1 else list(r))
    if not frag_refs:
        # zero input blocks: still produce bucket_fn's OUTPUT schema (an
        # empty input table run through pre_fn + bucket_fn), not the
        # pre-exchange schema — downstream stages read typed columns
        return ray.data.from_arrow(
            _empty_exchange_result(ds, bucket_fn, batch_format, pre_fn))
    t1 = _time.perf_counter()
    reduce = ray.remote(num_returns=2)(_reduce_bucket)
    fn_ref = ray.put(bucket_fn)         # ship the closure once, not per task
    frags_by_bucket = {b: [fr[b] for fr in frag_refs]
                       for b in range(num_buckets)}
    del frag_refs
    out_refs, size_refs, bucket_of = [], [], {}
    for b in range(num_buckets):
        t_ref, n_ref = reduce.remote(fn_ref, batch_format,
                                     frags_by_bucket[b])
        out_refs.append(t_ref)
        size_refs.append(n_ref)
        bucket_of[n_ref] = b
    # tiny ints; tables stay in plasma. Collect via ray.wait so each
    # completed bucket's fragment refs release immediately.
    sizes_map: dict = {}
    pending = list(size_refs)
    while pending:
        done, pending = ray.wait(pending,
                                 num_returns=min(len(pending), 16))
        for n_ref in done:
            sizes_map[n_ref] = ray.get(n_ref)
            frags_by_bucket.pop(bucket_of[n_ref], None)
    sizes = [sizes_map[r] for r in size_refs]
    t2 = _time.perf_counter()
    if dbg:
        print(f"[grouped_map] submit={t1-t0:.1f}s reduce={t2-t1:.1f}s "
              f"buckets={num_buckets}", flush=True)
    keep = [r for r, n in zip(out_refs, sizes) if n > 0]
    if not keep:                        # empty result, output schema intact
        keep = out_refs[:1]
    return ray.data.from_arrow_refs(keep)


def _reduce_cogroup(bucket_fn, l_refs: list, r_refs: list):
    import pyarrow as pa
    import ray
    lfr = ray.get(l_refs)
    rfr = ray.get(r_refs)
    lf = [f for f in lfr if f.num_rows] or [lfr[0]]
    rf = [f for f in rfr if f.num_rows] or [rfr[0]]
    left = pa.concat_tables(lf).combine_chunks().to_pandas()
    right = pa.concat_tables(rf).combine_chunks().to_pandas()
    out = bucket_fn(left, right)
    out = pa.Table.from_pandas(out, preserve_index=False)
    return out, out.num_rows


def cogroup(left, right, keys: list[str], bucket_fn, *,
            num_buckets: int = 32,
            left_empty: dict[str, str] | None = None,
            right_empty: dict[str, str] | None = None):
    """Co-partition two Datasets by hash of ``keys`` and apply
    ``bucket_fn(left_df, right_df)`` per bucket — the join/cogroup
    exchange (same two-stage shuffle as ``grouped_map``; both sides'
    fragments for a bucket land in one reduce task).

    ``left_empty`` / ``right_empty``: optional column→pandas-dtype
    declarations used to build the typed-empty stand-in when a side is
    SCHEMA-LESS (every upstream block 0-row → Ray skipped the UDFs).
    Without them the stand-in carries only the key columns, which
    breaks bucket_fns that read a side's VALUE columns (merge_asof on
    ``on``, window counts on a ts column) when that side is empty."""
    import ray
    import ray.data

    def blocks_of(ds):
        out = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                if meta.num_rows == 0:   # schema-less empty (see grouped_map)
                    continue
                out.append(block_ref)
        return out

    def with_keys(tbl, declared: dict[str, str] | None):
        # a fully-empty side can be SCHEMA-LESS (every block 0-row →
        # Ray skipped the UDFs); bucket_fns merge on ``keys``, so the
        # typed-empty stand-in must at least carry the key columns —
        # and, when the caller declared the side's schema, ALL of it
        import pandas as pd
        import pyarrow as pa
        if declared is not None and tbl.num_columns == 0:
            df = pd.DataFrame({c: pd.Series(dtype=d)
                               for c, d in declared.items()})
            return pa.Table.from_pandas(df, preserve_index=False)
        for k in keys:
            if k not in tbl.column_names:
                tbl = tbl.append_column(k, pa.array([], pa.null()))
        return tbl

    lblocks, rblocks = blocks_of(left), blocks_of(right)
    # same small-input bucket clamp as grouped_map (sized by the larger side)
    n_in = max(len(lblocks), len(rblocks))
    if n_in:
        num_buckets = _clamp_buckets(num_buckets, n_in)
    split = ray.remote(num_returns=num_buckets)(_split_by_bucket)
    reduce = ray.remote(num_returns=2)(_reduce_cogroup)

    def frags_of(blocks):
        out = []
        for block_ref in blocks:
            r = split.remote(block_ref, keys, num_buckets)
            out.append([r] if num_buckets == 1 else r)
        return out

    lfrags, rfrags = frags_of(lblocks), frags_of(rblocks)
    if not lfrags and not rfrags:
        # BOTH sides empty: one bucket_fn call on empty-but-typed frames
        # fixes the OUTPUT schema
        import pyarrow as pa
        out = bucket_fn(
            with_keys(_empty_typed_table(left), left_empty).to_pandas(),
            with_keys(_empty_typed_table(right), right_empty).to_pandas())
        return ray.data.from_arrow(
            pa.Table.from_pandas(out, preserve_index=False))
    if not lfrags:
        # symmetric to the empty-RIGHT path below: full-outer-shaped
        # bucket_fns must still see every right row, so run the normal
        # per-bucket reduce with an empty typed LEFT fragment (left-
        # keyed bucket_fns produce their 0 rows either way)
        empty_l = ray.put(with_keys(_empty_typed_table(left), left_empty))
        lfrags = [[empty_l] * num_buckets]
    if not rfrags:
        # only the RIGHT side is empty: left-outer-shaped bucket_fns
        # (dup-span rebuild, range-join counts) must still see every left
        # row — run the normal per-bucket reduce with an empty typed
        # right fragment instead of short-circuiting to (empty, empty)
        empty_r = ray.put(with_keys(_empty_typed_table(right), right_empty))
        rfrags = [[empty_r] * num_buckets]
    fn_ref = ray.put(bucket_fn)
    frags_by_bucket = {b: ([fr[b] for fr in lfrags],
                           [fr[b] for fr in rfrags])
                       for b in range(num_buckets)}
    del lfrags, rfrags
    out_refs, size_refs, bucket_of = [], [], {}
    for b in range(num_buckets):
        lf, rf = frags_by_bucket[b]
        t_ref, n_ref = reduce.remote(fn_ref, lf, rf)
        out_refs.append(t_ref)
        size_refs.append(n_ref)
        bucket_of[n_ref] = b
    # release each bucket's fragment refs as its reduce completes (same
    # plasma-footprint bound as grouped_map)
    sizes_map: dict = {}
    pending = list(size_refs)
    while pending:
        done, pending = ray.wait(pending,
                                 num_returns=min(len(pending), 16))
        for n_ref in done:
            sizes_map[n_ref] = ray.get(n_ref)
            frags_by_bucket.pop(bucket_of[n_ref], None)
    sizes = [sizes_map[r] for r in size_refs]
    keep = [r for r, n in zip(out_refs, sizes) if n > 0] or out_refs[:1]
    return ray.data.from_arrow_refs(keep)


def attach_by_key(pairs, table, side: str, renames: dict[str, str], *,
                  key: str = "doc_id", num_buckets: int = 32):
    """Hash-join ``table``'s columns onto ``pairs`` through the cogroup
    exchange, matching ``table[key]`` against ``pairs[side]``.

    The de-driver primitive for candidate-pair verification: instead of
    broadcasting a whole-corpus lookup map (driver-materialized, dies at
    scale), the pair table and the attribute table are co-partitioned by
    hash of the side column and merged per bucket — only each bucket's
    slice of the corpus is ever resident in one task. ``renames`` maps
    table column → output column (e.g. ``{"sh": "sh_a"}``); rows of
    ``pairs`` with no match in ``table`` are dropped (inner join).
    """
    import pyarrow as pa

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [side if c == key else c for c in b.column_names])

    right = table.map_batches(rn, batch_format="pyarrow")

    def join(left_df, right_df):
        return left_df.merge(right_df.rename(columns=renames),
                             on=side, how="inner")

    return cogroup(pairs, right, [side], join, num_buckets=num_buckets)


def grouped_agg(ds, keys: list[str], specs: dict[str, tuple[str | None, str]],
                *, num_buckets: int, finalize=None):
    """``groupby(keys).aggregate(...)`` for HIGH-cardinality keys.

    Ray Data's built-in aggregate walks group boundaries in Python —
    ~100k groups cost minutes. Same bucketing trick as ``grouped_map``,
    with a fully-vectorized ``pandas.groupby.agg`` per bucket.

    ``specs``: output-column → (input-column, fn) where fn is any pandas
    agg name ("sum", "min", "max", "mean", "count"); input-column None +
    fn "count" = group size. Safe for any fn because every key is wholly
    contained in one bucket.
    """
    import pandas as pd

    size_aliases = [a for a, (c, f) in specs.items() if c is None]
    named = {a: (c, f) for a, (c, f) in specs.items() if c is not None}

    def agg_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(keys, sort=False, as_index=False)
        if not named:
            out = g.size().rename(columns={"size": size_aliases[0]})
        else:
            out = g.agg(**{a: pd.NamedAgg(column=c, aggfunc=f)
                           for a, (c, f) in named.items()})
            if size_aliases:
                sz = g.size()["size"].to_numpy()
                for a in size_aliases:
                    out[a] = sz
        # finalize INSIDE the reduce (dtype casts etc.): a trailing
        # map_batches stage after the exchange would destroy the typed
        # schema of a 0-row result — Ray re-emits empty blocks through
        # later stages column-less (deep-seed fuzz find)
        return finalize(out) if finalize is not None else out

    return grouped_map(ds, keys, agg_bucket, num_buckets=num_buckets,
                       batch_format="pandas")


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
