"""Posting codec round-trips incl. skip-block boundaries (FIXTURES.md §4)."""

import numpy as np

from baram_ray.index.codec import (
    BLOCK_SIZE, decode_block, decode_deltas, decode_varints,
    encode_blocks, encode_deltas, encode_varints,
)


def test_varint_roundtrip():
    vals = [0, 1, 127, 128, 300, 2**20, 2**35, 2**62]
    assert list(decode_varints(encode_varints(vals), len(vals))) == vals


def test_delta_roundtrip():
    ids = np.array([5, 6, 100, 10_000, 2**40], dtype=np.int64)
    assert list(decode_deltas(encode_deltas(ids), len(ids))) == list(ids)


def test_empty():
    assert encode_varints([]) == b""
    assert len(decode_varints(b"", 0)) == 0


def test_single_posting_block():
    blocks = encode_blocks(np.array([42]), np.array([7]))
    assert len(blocks) == 1
    b = blocks[0]
    assert (b["n"], b["min_doc"], b["max_doc"], b["max_tf"]) == (1, 42, 42, 7)
    d, t = decode_block(b)
    assert list(d) == [42] and list(t) == [7]


def _roundtrip(n):
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    blocks = encode_blocks(ids, tfs)
    out_d, out_t = [], []
    for b in blocks:
        d, t = decode_block(b)
        assert b["min_doc"] == d[0] and b["max_doc"] == d[-1]
        assert b["max_tf"] == t.max()
        out_d.extend(d); out_t.extend(t)
    assert list(out_d) == list(ids) and list(out_t) == list(tfs)
    return blocks


def test_block_boundaries():
    assert len(_roundtrip(BLOCK_SIZE)) == 1
    assert len(_roundtrip(BLOCK_SIZE + 1)) == 2
    assert len(_roundtrip(10_000)) == (10_000 + BLOCK_SIZE - 1) // BLOCK_SIZE


def test_large_gaps():
    ids = np.array([0, 2**50, 2**51], dtype=np.int64)
    tfs = np.array([1, 1, 1], dtype=np.int64)
    d, t = decode_block(encode_blocks(ids, tfs)[0])
    assert list(d) == list(ids)
