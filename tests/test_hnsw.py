"""Sharded HNSW graph index: recall vs brute force, build determinism,
graph-structure sanity, and search edge cases (reference ANN class:
OpenSearch HNSW m=16 ef_construction=128, src/embedding/mod.rs:309-321)."""

import numpy as np
import pytest

import ray

from baram_ray import hnsw, similarity

SF = "/root/testdata/sf0.001"
QIDS = list(range(10))


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hnsw") / "idx")
    meta = hnsw.hnsw_build(_emb(), out, num_shards=3)
    return out, meta


def _recall(res, exact, qids, k):
    hits = total = 0
    for q in qids:
        a = set(res[res["query_id"] == q]["vec_id"])
        b = set(exact[exact["query_id"] == q]["vec_id"])
        hits += len(a & b)
        total += len(b)
    return hits / total


def test_meta_covers_corpus(index):
    _, meta = index
    assert meta["n"] == 500 and meta["num_shards"] == 3
    assert meta["m"] == 16 and meta["ef_construction"] == 128
    assert sorted(meta["shards"]) == meta["shards"]


def test_recall_vs_bruteforce(index, ray_session):
    out, _ = index
    _, qv = similarity._collect_query_vecs(_emb(), QIDS)
    res = hnsw.hnsw_search(out, qv, QIDS, k=10, ef_search=64)
    exact = similarity.brute_force_topk(_emb(), QIDS, k=10).to_pandas()
    assert _recall(res, exact, QIDS, 10) >= 0.95
    # ranks are 1..k per query, cosine non-increasing within a query
    for q in QIDS:
        g = res[res["query_id"] == q]
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["cosine"].to_numpy()) <= 1e-12).all()


def test_build_deterministic(index, ray_session, tmp_path):
    out, _ = index
    out2 = str(tmp_path / "idx2")
    hnsw.hnsw_build(_emb(), out2, num_shards=3)
    _, qv = similarity._collect_query_vecs(_emb(), QIDS)
    a = hnsw.hnsw_search(out, qv, QIDS, k=10, ef_search=32)
    b = hnsw.hnsw_search(out2, qv, QIDS, k=10, ef_search=32)
    assert a.equals(b)


def test_level_hierarchy_decays(index):
    out, meta = index
    z = np.load(hnsw._graph_path(out, meta["shards"][0]))
    levels = z["levels"]
    # geometric level draw: strictly fewer nodes at each higher level
    counts = [int((levels >= lev).sum())
              for lev in range(int(levels.max()) + 1)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] == len(z["ids"])
    # adjacency stays within shard bounds and respects -1 padding
    a0 = z["adj_0"]
    assert a0.shape[1] == 2 * meta["m"]
    assert a0.max() < len(z["ids"]) and a0.min() >= -1


def test_exclude_self(index, ray_session):
    out, _ = index
    _, qv = similarity._collect_query_vecs(_emb(), [0])
    with_self = hnsw.hnsw_search(out, qv, [0], k=3, ef_search=64,
                                 exclude_self=False)
    assert int(with_self.iloc[0]["vec_id"]) == 0
    assert with_self.iloc[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    without = hnsw.hnsw_search(out, qv, [0], k=3, ef_search=64)
    assert 0 not in set(without["vec_id"])


def test_higher_ef_no_worse(index, ray_session):
    out, _ = index
    _, qv = similarity._collect_query_vecs(_emb(), QIDS)
    exact = similarity.brute_force_topk(_emb(), QIDS, k=10).to_pandas()
    r_small = _recall(hnsw.hnsw_search(out, qv, QIDS, k=10, ef_search=10),
                      exact, QIDS, 10)
    r_big = _recall(hnsw.hnsw_search(out, qv, QIDS, k=10, ef_search=128),
                    exact, QIDS, 10)
    assert r_big >= r_small
    assert r_big >= 0.99


def test_empty_corpus(ray_session, tmp_path):
    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = str(tmp_path / "empty")
    meta = hnsw.hnsw_build(empty, out, num_shards=2)
    assert meta["n"] == 0 and meta["shards"] == []
    res = hnsw.hnsw_search(out, np.zeros((1, 4)), [0], k=5)
    assert len(res) == 0 and list(res.columns) == [
        "query_id", "rank", "vec_id", "cosine"]


def test_random_corpora_properties(ray_session, tmp_path):
    """Fuzz: on random corpora the search returns ≤k unique ids per
    query, scores are the TRUE cosines of the returned pairs, and
    ef ≥ n gives recall 1.0 on a connected graph."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.RandomState(0)
    for trial, (n, d) in enumerate([(60, 8), (200, 16), (37, 4)]):
        vecs = rng.randn(n, d).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(t).repartition(3)
        out = str(tmp_path / f"fz{trial}")
        hnsw.hnsw_build(ds, out, num_shards=2, seed=trial)
        qv = vecs[:3].astype(np.float64)
        res = hnsw.hnsw_search(out, qv, [0, 1, 2], k=5, ef_search=n,
                               round6=False)
        # replicate the engine's precision path exactly: normalize in
        # f64, store f32, score in f64
        from baram_ray.similarity import _norm_rows
        norm = _norm_rows(vecs.astype(np.float64)) \
            .astype(np.float32).astype(np.float64)
        qn = _norm_rows(qv)
        for qi, q in enumerate([0, 1, 2]):
            g = res[res["query_id"] == q]
            assert len(g) <= 5 and g["vec_id"].is_unique
            assert q not in set(g["vec_id"])
            for _, row in g.iterrows():
                true_cos = float(norm[int(row["vec_id"])] @ qn[qi])
                assert row["cosine"] == pytest.approx(true_cos,
                                                      abs=1e-12)
            # exhaustive ef: top-1 must be the true nearest neighbor
            sims = norm @ qn[qi]
            sims[q] = -2.0
            assert int(g.iloc[0]["vec_id"]) == int(np.argmax(sims))


def _clustered(n, d=64, per_cluster=250, seed=3):
    """Clustered corpus (the realistic embedding regime): plain
    nearest-M linking splits level 0 into per-cluster components."""
    from baram_ray.similarity import _norm_rows
    rng = np.random.RandomState(seed)
    cents = rng.randn(max(n // per_cluster, 8), d)
    vecs = _norm_rows(cents[rng.randint(0, len(cents), n)]
                      + 0.3 * rng.randn(n, d))
    qv = _norm_rows(vecs[rng.randint(0, n, 30)]
                    + 0.01 * rng.randn(30, d))
    return vecs, qv


def _forward_components(adj0):
    """Component count of the level-0 graph under forward links (the
    edges the search can actually follow)."""
    n = len(adj0)
    seen = np.zeros(n, dtype=bool)
    comps = 0
    for s in range(n):
        if seen[s]:
            continue
        comps += 1
        stack = [s]
        seen[s] = True
        while stack:
            for v in adj0[stack.pop()]:
                if v >= 0 and not seen[v]:
                    seen[v] = True
                    stack.append(v)
    return comps


def _graph_recall(vecs, qv, adj, entry, k=10, ef=64):
    sims_all = vecs @ qv.T
    hits = 0
    for qi in range(len(qv)):
        exact = set(np.argsort(-sims_all[:, qi])[:k].tolist())
        found = hnsw._search_graph(vecs, adj, entry, qv[qi], k, ef)
        hits += len(exact & set(i for _, i in found))
    return hits / (len(qv) * k)


def test_clustered_corpus_stays_navigable():
    """Regression: without the Alg.-4 diversity heuristic, a single
    4096-vector shard over a 250-per-cluster corpus split into ~17
    components and recall@10 fell to 0.50; with it the graph must be
    one forward-connected component at recall ≥ 0.9."""
    vecs, qv = _clustered(4096)
    levels, adj, entry = hnsw._build_graph(vecs, M=16, efc=128, seed=7)
    assert _forward_components(adj[0]) == 1
    assert _graph_recall(vecs, qv, adj, entry) >= 0.9


def test_clustered_corpus_fallback_path_navigable():
    """Same regression for the giant-shard fallback inserter
    (_extend_graph_search — the path past _BRUTE_MAX), driven directly
    on a small clustered corpus."""
    vecs, qv = _clustered(2048)
    n = len(vecs)
    levels = hnsw._draw_levels(n, 16, 7)
    adj = [np.full((n, 32), -1, np.int32)]
    deg = [np.zeros(n, np.int32)]
    adj, entry = hnsw._extend_graph_search(vecs, levels, adj, deg,
                                           -1, 16, 128, 0)
    assert _forward_components(adj[0]) == 1
    assert _graph_recall(vecs, qv, adj, entry) >= 0.9


def test_incremental_add(ray_session, tmp_path):
    """build(A) + add(B) serves A∪B with high recall; repeated
    identical adds are deterministic; add into a fresh shard builds
    a new graph."""
    import pyarrow as pa

    full = _emb().to_pandas()
    a, b = full.iloc[:300], full.iloc[300:]

    def as_ds(df):
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy(np.int64)),
            "embedding": pa.array(
                [list(map(float, v)) for v in df["embedding"]],
                pa.list_(pa.float32()))})).repartition(3)

    for out, tag in [(str(tmp_path / "i1"), 1),
                     (str(tmp_path / "i2"), 2)]:
        hnsw.hnsw_build(as_ds(a), out, num_shards=3)
        meta = hnsw.hnsw_add(out, as_ds(b))
        assert meta["n"] == len(full)
    _, qv = similarity._collect_query_vecs(_emb(), QIDS)
    r1 = hnsw.hnsw_search(str(tmp_path / "i1"), qv, QIDS, k=10,
                          ef_search=64)
    r2 = hnsw.hnsw_search(str(tmp_path / "i2"), qv, QIDS, k=10,
                          ef_search=64)
    assert r1.equals(r2)                        # deterministic add
    exact = similarity.brute_force_topk(_emb(), QIDS, k=10).to_pandas()
    assert _recall(r1, exact, QIDS, 10) >= 0.9
    # results include ids from BOTH halves somewhere in the top-10s
    got_ids = set(r1["vec_id"])
    assert got_ids & set(a["vec_id"]) and got_ids & set(b["vec_id"])
    # add into an index whose shards had no prior graph
    out3 = str(tmp_path / "i3")
    hnsw.hnsw_build(as_ds(a.iloc[:0]), out3, num_shards=2)
    meta3 = hnsw.hnsw_add(out3, as_ds(b))
    assert meta3["n"] == len(b) and len(meta3["shards"]) >= 1
    r3 = hnsw.hnsw_search(out3, qv, QIDS, k=5, ef_search=64)
    assert set(r3["vec_id"]) <= set(b["vec_id"])


def test_service_matches_task_path(index, ray_session):
    """Resident actor-pool service returns byte-identical results to
    the task-based scatter-gather."""
    out, _ = index
    _, qv = similarity._collect_query_vecs(_emb(), QIDS)
    svc = hnsw.HnswService(out)
    try:
        a = svc.search(qv, QIDS, k=10, ef_search=48)
        b = hnsw.hnsw_search(out, qv, QIDS, k=10, ef_search=48)
        assert a.equals(b)
        # repeated calls (warm actors) stay identical
        assert svc.search(qv, QIDS, k=10, ef_search=48).equals(a)
    finally:
        svc.shutdown()
    assert svc.actors == []


def test_service_failover_after_actor_death(index, ray_session):
    """Killing a serving actor mid-flight: the next search respawns it
    from its graph paths and returns identical results."""
    out, _ = index
    _, qv = similarity._collect_query_vecs(_emb(), QIDS[:3])
    svc = hnsw.HnswService(out)
    try:
        before = svc.search(qv, QIDS[:3], k=5, ef_search=48)
        ray.kill(svc.actors[0])           # simulate node loss
        after = svc.search(qv, QIDS[:3], k=5, ef_search=48)
        assert after.equals(before)
        # respawned actor keeps serving
        again = svc.search(qv, QIDS[:3], k=5, ef_search=48)
        assert again.equals(before)
    finally:
        svc.shutdown()
