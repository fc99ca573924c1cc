"""Posting-list codec: delta-encoded varints in fixed-size blocks with
per-block max metadata (skip blocks + block-max, SURVEY.md §7.1 step 5).

A posting list for one term is stored as consecutive *blocks* of up to
``BLOCK_SIZE`` postings. Each block row carries ``(n, min_doc, max_doc,
max_tf, docs_enc, tfs_enc)``:

- ``docs_enc``  — LEB128 varints of doc_id deltas (first value absolute,
  then gaps; doc_ids strictly increasing within a block);
- ``tfs_enc``   — LEB128 varints of term frequencies;
- ``min_doc``/``max_doc`` — skip metadata (a reader can skip a whole block
  when seeking past ``max_doc``);
- ``max_tf``    — block-max ingredient: the block's max BM25 contribution is
  bounded by the score of ``max_tf`` at the minimum doc length, enabling
  block-max WAND (we store max_tf + the block's min_dl-derived bound at
  query-engine load time).

The reference keeps this entire layer inside OpenSearch/Lucene
(config only, ``src/embedding/mod.rs:237-330``); this is the native rebuild.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varint_lengths(v: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (1..10)."""
    lengths = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        lengths += v >= np.uint64(1 << (7 * k))
    return lengths


def encode_varints_np(values) -> tuple[bytes, np.ndarray]:
    """Vectorized LEB128 encode of an int array → (buffer, per-value byte
    lengths). One numpy pass per byte position (≤ 10 regardless of n) —
    the encode mirror of ``decode_varints``. Per-value lengths let callers
    slice the buffer at any value boundary (block splitting)."""
    v = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    lengths = varint_lengths(v)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    buf = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(lengths.max())):
        mask = lengths > k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((lengths[mask] - 1 > k).astype(np.uint8)) << 7
        buf[starts[mask] + k] = byte | cont
    return buf.tobytes(), lengths


def encode_varints(values) -> bytes:
    """LEB128-encode a sequence of non-negative ints."""
    return encode_varints_np(np.asarray(list(values), dtype=np.int64))[0]


def decode_varints(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` LEB128 varints into an int64 array.

    Vectorized: one numpy pass per byte-position (varints are ≤ 9 bytes, so
    the Python loop runs ≤ 9 times regardless of n) — ~50× faster than a
    per-byte Python loop on query-time block decode.
    """
    if n == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[: n - 1] + 1
    lengths = ends[:n] - starts + 1
    vals = np.zeros(n, dtype=np.int64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        vals[mask] |= (b[starts[mask] + k] & 0x7F) << (7 * k)
    return vals


def encode_deltas(sorted_ids: np.ndarray) -> bytes:
    """Delta-encode a strictly-increasing int array (first absolute)."""
    deltas = np.empty(len(sorted_ids), dtype=np.int64)
    if len(sorted_ids):
        deltas[0] = sorted_ids[0]
        np.subtract(sorted_ids[1:], sorted_ids[:-1], out=deltas[1:])
    return encode_varints_np(deltas)[0]


def decode_deltas(buf: bytes, n: int) -> np.ndarray:
    vals = decode_varints(buf, n)
    np.cumsum(vals, out=vals)
    return vals


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray) -> list[dict]:
    """Split one (sorted-by-doc_id) posting list into encoded block rows."""
    blocks = []
    for start in range(0, len(doc_ids), BLOCK_SIZE):
        d = doc_ids[start : start + BLOCK_SIZE]
        t = tfs[start : start + BLOCK_SIZE]
        blocks.append({
            "n": len(d),
            "min_doc": int(d[0]),
            "max_doc": int(d[-1]),
            "max_tf": int(t.max()),
            "docs_enc": encode_deltas(d),
            "tfs_enc": encode_varints_np(np.asarray(t, dtype=np.int64))[0],
        })
    return blocks


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    n = int(block["n"])
    return decode_deltas(block["docs_enc"], n), decode_varints(block["tfs_enc"], n)
