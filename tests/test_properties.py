"""Property-based tests (hypothesis) over the pure kernels — no Ray
session needed: varint/delta codec roundtrips, sampling-hash algebra,
sloppy-phrase plane-sweep vs independent chain enumeration, tokenizer
determinism."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from baram_ray.index.codec import (
    decode_block, decode_deltas, decode_varints, encode_blocks,
    encode_deltas, encode_varints,
)
from baram_ray.sampling import knuth_hash32


# ------------------------------------------------------------------ #
# codec roundtrips
# ------------------------------------------------------------------ #

@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    buf = encode_varints(np.asarray(vals, dtype=np.int64))
    out = decode_varints(buf, len(vals))
    assert out.tolist() == vals


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.asarray(sorted(ids), dtype=np.int64))
    out = decode_deltas(encode_deltas(arr), len(arr))
    assert out.tolist() == arr.tolist()


@given(st.sets(st.integers(min_value=0, max_value=2**40),
               min_size=1, max_size=400),
       st.lists(st.integers(min_value=1, max_value=255), min_size=400,
                max_size=400))
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(ids, tfs):
    docs = np.sort(np.asarray(sorted(ids), dtype=np.int64))
    tf = np.asarray(tfs[:len(docs)], dtype=np.int64)
    blocks = encode_blocks(docs, tf)
    got_d, got_t = [], []
    for b in blocks:
        d, t = decode_block(b)
        got_d.extend(d.tolist())
        got_t.extend(t.tolist())
        # block-max metadata is truthful
        assert b["max_doc"] == d.max()
        assert b["max_tf"] == t.max()
    assert got_d == docs.tolist()
    assert got_t == tf.tolist()


# ------------------------------------------------------------------ #
# sampling-hash algebra
# ------------------------------------------------------------------ #

@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=500),
       st.floats(min_value=0.0, max_value=1.0),
       st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=100, deadline=None)
def test_sample_nesting(keys, r1, r2):
    """A smaller-rate sample is always a subset of a larger-rate one."""
    lo, hi = min(r1, r2), max(r1, r2)
    h = knuth_hash32(np.asarray(keys, dtype=np.int64))
    in_lo = set(np.asarray(keys)[h < np.uint64(int(lo * 2**32))].tolist())
    in_hi = set(np.asarray(keys)[h < np.uint64(int(hi * 2**32))].tolist())
    assert in_lo <= in_hi


# ------------------------------------------------------------------ #
# sloppy phrase: plane-sweep == chain enumeration
# ------------------------------------------------------------------ #

def _chain_freq(lists, slop):
    """Independent reference: all ordered chains -> containment-minimal
    spans -> Σ 1/(1+slack) in increasing-start order."""
    chains = [(p,) for p in lists[0]]
    for lst in lists[1:]:
        chains = [c + (p,) for c in chains for p in lst if p > c[-1]]
        if not chains:
            return 0.0
    spans = {(c[0], c[-1]) for c in chains}
    minimal = sorted((s, e) for (s, e) in spans
                     if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e)
                                for (s2, e2) in spans))
    m = len(lists)
    fr = 0.0
    for s, e in minimal:
        if (e - s) - (m - 1) <= slop:
            fr += 1.0 / (1.0 + ((e - s) - (m - 1)))
    return fr


@given(st.integers(min_value=2, max_value=4).flatmap(
           lambda m: st.lists(
               st.lists(st.integers(min_value=0, max_value=60),
                        min_size=1, max_size=8),
               min_size=m, max_size=m)),
       st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_sloppy_planesweep_equals_chains(lists, slop):
    from baram_ray.query.engine import QueryEngine
    arrs = [np.unique(np.asarray(sorted(set(lst)), dtype=np.int64))
            for lst in lists]
    got = QueryEngine._sloppy_freq(arrs, slop)
    exp = _chain_freq([a.tolist() for a in arrs], slop)
    assert got == exp, (lists, slop)


# ------------------------------------------------------------------ #
# tokenizer determinism
# ------------------------------------------------------------------ #

@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenizer_deterministic_and_position_consistent(text):
    from baram_ray.tokenizer import tokenize, tokenize_with_positions
    t1, t2 = tokenize(text), tokenize(text)
    assert t1 == t2
    toks, poss = tokenize_with_positions(text)
    assert toks == t1                    # positions never change tokens
    assert len(toks) == len(poss)
    if poss:
        assert poss[0] == 0
        assert all(b >= a for a, b in zip(poss, poss[1:]))
    assert all(tok == tok.lower() for tok in toks)


# ------------------------------------------------------------------ #
# KMV sketch: merge invariance + exactness branch + accuracy
# ------------------------------------------------------------------ #

@given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=1,
                max_size=2000),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=100, deadline=None)
def test_kmv_merge_invariance(keys, n_chunks):
    """Sketching chunk-wise and merging equals sketching everything at
    once — the mergeability contract that makes it a partial agg."""
    from baram_ray.sketches import kmv_estimate, kmv_partial
    arr = np.asarray(keys, dtype=np.int64)
    whole = kmv_estimate(kmv_partial(arr).astype(np.uint64))
    chunks = np.array_split(arr, n_chunks)
    merged = np.concatenate([kmv_partial(c) for c in chunks if len(c)])
    assert kmv_estimate(merged.astype(np.uint64)) == whole


def test_kmv_exact_below_k_and_accuracy():
    from baram_ray.sketches import kmv_estimate, kmv_partial
    # < k distinct: exact
    small = np.arange(50, dtype=np.int64)
    assert kmv_estimate(kmv_partial(small, k=64).astype(np.uint64),
                        k=64) == 50.0
    # >= k: within the KMV relative-error envelope (~1/sqrt(k-2))
    rng = np.random.default_rng(3)
    big = rng.integers(0, 2**62, 20_000).astype(np.int64)
    true = len(np.unique(big))
    est = kmv_estimate(kmv_partial(big, k=256).astype(np.uint64), k=256)
    assert abs(est - true) / true < 0.25


# ------------------------------------------------------------------ #
# Misra–Gries heavy hitters: exactness / undercount bound / survival
# ------------------------------------------------------------------ #

def _mg_run_chunks(arr, k, n_chunks):
    """Sketch chunk-wise, merge the partials — the distributed shape."""
    from baram_ray.sketches import mg_merge, mg_partial
    parts = [mg_partial(c, k) for c in np.array_split(arr, n_chunks)
             if len(c)]
    terms = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    decs = sum(p[2] for p in parts)
    return mg_merge(terms, counts, decs, k)


@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=3000),
       st.integers(min_value=4, max_value=32),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_mg_bounds(keys, k, n_chunks):
    """est ≤ true ≤ est + dec for every surviving key, and any key with
    true frequency > n/(k+1) survives — through an arbitrary merge tree."""
    from collections import Counter
    arr = np.asarray([str(x) for x in keys], dtype=object)
    t, c, dec = _mg_run_chunks(arr, k, n_chunks)
    est = dict(zip(t.tolist(), c.tolist()))
    true = Counter(arr.tolist())
    n = len(arr)
    for key, tc in true.items():
        e = est.get(key, 0)
        assert e <= tc <= e + dec, (key, e, tc, dec)
        if tc > n / (k + 1):
            assert key in est, (key, tc, n, k)


@given(st.lists(st.integers(min_value=0, max_value=25), min_size=1,
                max_size=500),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=100, deadline=None)
def test_mg_exact_when_under_budget(keys, n_chunks):
    """k ≥ distinct keys ⇒ no trim ever fires: dec == 0, counts exact
    (the SQL-oracle regime of doc_heavy_terms)."""
    from collections import Counter
    arr = np.asarray([str(x) for x in keys], dtype=object)
    t, c, dec = _mg_run_chunks(arr, 26, n_chunks)
    assert dec == 0
    assert dict(zip(t.tolist(), c.tolist())) == dict(Counter(arr.tolist()))


# ------------------------------------------------------------------ #
# KLL quantile sketch: exactness / weight conservation / rank error
# ------------------------------------------------------------------ #

def _kll_chunks(arr, k, n_chunks):
    from baram_ray.sketches import kll_merge, kll_partial
    parts = [kll_partial(c, k) for c in np.array_split(arr, n_chunks)
             if len(c)]
    return kll_merge(parts, k)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=400),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=100, deadline=None)
def test_kll_exact_when_under_capacity(vals, n_chunks):
    """n ≤ k ⇒ no compaction: every quantile equals the exact
    quantile_disc pick (the SQL-oracle regime)."""
    from baram_ray.sketches import kll_quantile, kll_total_weight
    arr = np.asarray(vals, np.float64)
    sk = _kll_chunks(arr, 512, n_chunks)
    assert kll_total_weight(sk) == len(arr)
    s = np.sort(arr)
    n = len(s)
    for q in (0.1, 0.5, 0.95, 0.99):
        exact = s[min(n - 1, int(np.ceil(q * n)) - 1)]
        assert kll_quantile(sk, q) == exact


@given(st.integers(min_value=0, max_value=2**31), 
       st.integers(min_value=1, max_value=8))
@settings(max_examples=30, deadline=None)
def test_kll_rank_error_bound_under_compaction(seed, n_chunks):
    """Deep-compaction regime (n = 64k, k = 256): weight is conserved
    exactly and the observed rank error of every estimated quantile
    stays within the O((n/k)·log(n/k)) envelope."""
    from baram_ray.sketches import kll_quantile, kll_total_weight
    rng = np.random.default_rng(seed)
    n, k = 65536, 256
    arr = rng.normal(size=n) * 1e3
    sk = _kll_chunks(arr, k, n_chunks)
    assert kll_total_weight(sk) == n
    s = np.sort(arr)
    budget = 4.0 * (n / k) * max(1.0, np.log2(n / k))
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = kll_quantile(sk, q)
        true_rank = np.searchsorted(s, est, side="right")
        assert abs(true_rank - q * n) <= budget, (q, true_rank, q * n)


# ------------------------------------------------------------------ #
# Holt linear-trend forecast (round-2 verdict #10: the one no_oracle
# driver row gets fuzzed coverage beyond the bit-exact recomputation)

@given(
    n=st.integers(min_value=2, max_value=200),
    a=st.floats(min_value=-50, max_value=50),
    b=st.floats(min_value=-5, max_value=5),
    alpha=st.floats(min_value=0.05, max_value=0.95),
    beta=st.floats(min_value=0.05, max_value=0.95),
    horizon=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=60, deadline=None)
def test_holt_exact_on_affine_series(n, a, b, alpha, beta, horizon):
    """On a perfectly affine series y_t = a + b·t the recursion locks
    level/trend exactly, so every h-step forecast is the affine
    continuation — for ANY alpha/beta."""
    from baram_ray.pipelines.events import holt_linear
    t = np.arange(n, dtype=np.float64)
    series = a + b * t
    got = holt_linear(series, alpha, beta, horizon)
    exp = a + b * (n - 1 + np.arange(1, horizon + 1, dtype=np.float64))
    scale = max(1.0, abs(a) + abs(b) * (n + horizon))
    assert np.allclose(got, exp, rtol=0, atol=1e-7 * scale)


@given(
    ys=st.lists(st.floats(min_value=-100, max_value=100), min_size=2,
                max_size=120),
    c=st.floats(min_value=-100, max_value=100),
    s=st.floats(min_value=0.1, max_value=10),
    alpha=st.floats(min_value=0.05, max_value=0.95),
    beta=st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=60, deadline=None)
def test_holt_shift_and_scale_equivariance(ys, c, s, alpha, beta):
    """The recursion is affine in the data: forecasts of c + s·y are
    c + s·forecast(y) — catches any init/update asymmetry a refactor
    could introduce."""
    from baram_ray.pipelines.events import holt_linear
    y = np.asarray(ys, dtype=np.float64)
    base = holt_linear(y, alpha, beta, 7)
    shifted = holt_linear(c + s * y, alpha, beta, 7)
    scale = max(1.0, np.abs(base).max()) * max(1.0, abs(c), s)
    assert np.allclose(shifted, c + s * base, rtol=0, atol=1e-6 * scale)


# ------------------------------------------------------------------ #
# round-3 primitives: vectorized dict lookup + two-level rank map

@given(
    keys=st.lists(st.integers(min_value=-1000, max_value=1000),
                  min_size=1, max_size=50, unique=True),
    probe=st.lists(st.integers(min_value=-1100, max_value=1100),
                   min_size=0, max_size=80),
    use_default=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_vmap_matches_series_map(keys, probe, use_default):
    """_vmap == Series.map(dict) for hits; misses yield the default."""
    import pandas as pd

    from baram_ray.pipelines.tpch import _vmap
    mapping = {k: f"v{k}" for k in keys}
    got = _vmap(np.asarray(probe, dtype=np.int64), mapping,
                default="MISS" if use_default else None)
    exp = pd.Series(probe, dtype="int64").map(mapping)
    for g, e in zip(got, exp):
        if pd.isna(e):
            assert g == ("MISS" if use_default else None)
        else:
            assert g == e


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10 ** 12),
                 min_size=1, max_size=300, unique=True),
    n_shards=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10 ** 6),
)
@settings(max_examples=25, deadline=None)
def test_rank_map_fuzz(ray_session, tmp_path_factory, ids, n_shards, seed):
    """build_rank_map reproduces global-sort ranks for arbitrary id
    sets at any shard count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from baram_ray.index.build import build_rank_map
    d = tmp_path_factory.mktemp("rmfuzz")
    arr = np.asarray(ids, dtype=np.int64)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(arr)
    for i, chunk in enumerate(np.array_split(perm, min(3, len(perm)))):
        if len(chunk):
            pq.write_table(pa.table({"doc_id": pa.array(chunk)}),
                           d / f"p{i}.parquet")
    rmap, stats = build_rank_map([str(d)], num_id_shards=n_shards)
    assert stats["n"] == len(arr) and len(stats["dups"]) == 0
    got = rmap.rank(perm)
    assert (got == np.searchsorted(np.sort(arr), perm)).all()
