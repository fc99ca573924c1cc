"""Segment compaction — the merge step the reference delegates to
Lucene/OpenSearch segment merging (refresh/merge policy,
``src/embedding/mod.rs:240-245`` sets refresh 5s and lets the engine
merge). Here a segment is a parquet file of encoded posting blocks; the
exchange emits one file per reduce bucket and every incremental delta
adds a generation of new files, so file counts grow until compacted.

Compaction is QUERY-INVARIANT by construction: the reader orders
posting blocks by (field, term, shard, gen, block_id) — never by file
layout — so coalescing files changes only open/metadata overhead.
Safety: the compacted copy is built in a sibling directory and swapped
in with two renames (old → .old, new → live); a crash leaves either the
old or the new complete directory, never a mix.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def compact_segments(index_dir: str, target_mb: int = 64) -> dict:
    """Coalesce segment parquet files into ~``target_mb`` files.

    Returns {"files_before", "files_after", "rows"}.
    """
    seg_dir = os.path.join(index_dir, "segments")
    files = sorted(
        os.path.join(seg_dir, f) for f in os.listdir(seg_dir)
        if f.endswith(".parquet"))
    if len(files) <= 1:
        return {"files_before": len(files), "files_after": len(files),
                "rows": 0}
    target = target_mb << 20

    # greedy size-tiered grouping in name order
    groups: list[list[str]] = [[]]
    acc = 0
    for f in files:
        sz = os.path.getsize(f)
        if groups[-1] and acc + sz > target:
            groups.append([])
            acc = 0
        groups[-1].append(f)
        acc += sz

    new_dir = seg_dir + ".compact"
    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)
    os.makedirs(new_dir)
    total_rows = 0
    for gi, group in enumerate(groups):
        tables = []
        for f in group:
            t = pq.read_table(f)
            if "gen" not in t.column_names:     # normalize delta schema
                t = t.append_column(
                    "gen", pa.array(np.zeros(t.num_rows, dtype=np.int64)))
            tables.append(t)
        merged = pa.concat_tables(tables, promote_options="default")
        total_rows += merged.num_rows
        pq.write_table(merged,
                       os.path.join(new_dir, f"compact-{gi:05d}.parquet"))

    old_dir = seg_dir + ".old"
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    os.rename(seg_dir, old_dir)
    os.rename(new_dir, seg_dir)
    shutil.rmtree(old_dir)
    return {"files_before": len(files), "files_after": len(groups),
            "rows": total_rows}
