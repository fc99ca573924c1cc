"""Tile an sf directory K× into an sf1-equivalent corpus (round-4
verdict #9: one more decade of scale for the full oracle sweep).

Every copy offsets its key/id columns by copy × (max_key + 1) so keys
stay globally unique and foreign keys stay consistent within a copy
(l_orderkey ↔ o_orderkey, o_custkey ↔ c_custkey, ...). Dimension
tables (nation, region) are NOT tiled.

Document TEXT in copy k ≥ 1 remaps every word w → "w" + "x<letter k>"
(a pure-LETTER tag: a digit tag would decompound in the engine's
identifier tokenizer — "data1" → ["data", "1"] — while the SQL
oracles split on whitespace, breaking parity for every fixed-term
match query; a letter-suffixed word stays one token on both sides): verbatim tiling gives every doc 9 exact twins AND keeps the
corpus vocabulary fixed while docs grow 10×, so per-gram document
frequency grows 10× and candidate-pair joins grow ~100× — a spill
storm that no real 10× corpus exhibits (real corpora grow vocabulary
with size). The bijection preserves word equality, order and counts
WITHIN a copy, so each copy replicates sf0.1's exact-dup and planted
near-dup structure verbatim while copies share no vocabulary —
sf0.1-like per-key density at exactly 10× the rows, which is the point
of the sweep.

Usage: python tools/tile_sf.py [src_sf_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table → key columns to offset, grouped by shared stride family
OFFSETS: dict[str, list[str]] = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
# the FK family a column belongs to (stride must match across tables)
FAMILY = {"doc_id": "doc", "event_id": "event", "user_id": "user",
          "vec_id": "vec", "c_custkey": "cust", "o_custkey": "cust",
          "o_orderkey": "order", "l_orderkey": "order",
          "l_partkey": "part", "p_partkey": "part",
          "l_suppkey": "supp", "s_suppkey": "supp"}
DIMS = ["nation", "region"]


def tile(src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    # stride per family = max over every column in the family + 1
    strides: dict[str, int] = {}
    for name, cols in OFFSETS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"),
                          columns=cols)
        for c in cols:
            fam = FAMILY[c]
            mx = pc.max(t[c]).as_py() or 0
            strides[fam] = max(strides.get(fam, 0), int(mx) + 1)
    for name in DIMS:
        pq.read_table(os.path.join(src, f"{name}.parquet"))
        os.link(os.path.join(src, f"{name}.parquet"),
                os.path.join(dst, f"{name}.parquet")) \
            if not os.path.exists(os.path.join(dst, f"{name}.parquet")) \
            else None
    for name, cols in OFFSETS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for k in range(copies):
            u = t
            for c in cols:
                off = k * strides[FAMILY[c]]
                if off:
                    u = u.set_column(
                        u.column_names.index(c), c,
                        pc.add(t[c], pa.scalar(off, t[c].type)))
            if name == "documents" and k > 0:
                tag = "x" + "abcdefghij"[k]
                new = [" ".join(w + tag for w in str(txt).split())
                       for txt in u["text"].to_pylist()]
                u = u.set_column(u.column_names.index("text"), "text",
                                 pa.array(new, pa.string()))
                u = u.set_column(
                    u.column_names.index("n_chars"), "n_chars",
                    pa.array([len(s) for s in new], pa.int64()))
            parts.append(u)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/baram_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tile(src, dst, copies)
