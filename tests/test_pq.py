"""Product-quantization ANN: recall vs brute force (uniform AND
clustered corpora), build determinism, code layout, and edge cases.
Reference ANN family: faiss PQ/IVF-PQ behind OpenSearch
(src/embedding/mod.rs:309-321) — the beyond-RAM compression path."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

import ray

from baram_ray import pq, similarity

SF = "/root/testdata/sf0.001"
QIDS = list(range(10))


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _clustered_ds(n=3000, d=64, n_clusters=12, seed=7):
    """Tight clusters + noise — the corpus shape that broke HNSW/LSH
    before (uniform test data hides link/bucket pathologies)."""
    rng = np.random.RandomState(seed)
    cen = rng.randn(n_clusters, d)
    cen /= np.linalg.norm(cen, axis=1, keepdims=True)
    lab = rng.randint(0, n_clusters, size=n)
    v = cen[lab] + 0.08 * rng.randn(n, d)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in v],
                              pa.list_(pa.float32()))}))


def _recall(res: pd.DataFrame, exact: pd.DataFrame, qids, k=5):
    hits = total = 0
    for q in qids:
        a = set(res[res["query_id"] == q]["vec_id"])
        b = set(exact[exact["query_id"] == q]["vec_id"])
        hits += len(a & b)
        total += len(b)
    return hits / total


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pq") / "idx")
    meta = pq.pq_build(_emb(), out, m=16, train_sample=500)
    return out, meta


def test_meta_and_compression(index):
    _, meta = index
    assert meta["n"] == 500 and meta["m"] == 16
    assert meta["bytes_per_vec"] == 18        # 16 PQ + 2 coarse
    assert meta["compression_x"] == round(64 * 4 / 18, 1)


def test_codes_are_fixed_size_binary(index):
    out, _ = index
    root = os.path.join(out, "codes")
    shard = sorted(os.listdir(root))[0]
    f = [x for x in os.listdir(os.path.join(root, shard))
         if x.endswith(".parquet")][0]
    t = papq.read_table(os.path.join(root, shard, f))
    assert pa.types.is_fixed_size_binary(t.schema.field("code").type)
    assert t.schema.field("code").type.byte_width == 16


def test_refined_recall_vs_bruteforce(ray_session, index):
    out, _ = index
    ds = _emb()
    _, qv = similarity._collect_query_vecs(ds, QIDS)
    res = pq.pq_search(out, qv, QIDS, k=5, refine=8, ds=ds).to_pandas()
    exact = similarity.brute_force_topk(ds, QIDS, k=5).to_pandas()
    assert len(res) == len(QIDS) * 5
    assert _recall(res, exact, QIDS) >= 0.9


def test_refined_scores_are_exact(ray_session, index):
    """Refined rows carry EXACT cosines: every (query, vec) score must
    equal the brute-force score for that pair."""
    out, _ = index
    ds = _emb()
    _, qv = similarity._collect_query_vecs(ds, QIDS)
    res = pq.pq_search(out, qv, QIDS, k=5, refine=8, ds=ds).to_pandas()
    exact = similarity.brute_force_topk(ds, QIDS, k=50).to_pandas()
    merged = res.merge(exact, on=["query_id", "vec_id"],
                       suffixes=("", "_exact"))
    assert len(merged) > 0
    assert np.allclose(merged["cosine"], merged["cosine_exact"],
                       atol=1e-6)


def test_adc_only_path(ray_session, index):
    out, _ = index
    ds = _emb()
    _, qv = similarity._collect_query_vecs(ds, QIDS)
    res = pq.pq_search(out, qv, QIDS, k=5, refine=4, ds=None).to_pandas()
    assert sorted(res.columns) == ["cosine", "query_id", "rank", "vec_id"]
    assert len(res) == len(QIDS) * 5
    exact = similarity.brute_force_topk(ds, QIDS, k=5).to_pandas()
    # ADC alone is approximate but must beat random by a wide margin
    assert _recall(res, exact, QIDS) >= 0.5


def test_clustered_corpus_recall(ray_session, tmp_path):
    ds = _clustered_ds()
    out = str(tmp_path / "pqc")
    pq.pq_build(ds, out, m=16, train_sample=1024)
    qids = list(range(0, 50, 5))
    _, qv = similarity._collect_query_vecs(ds, qids)
    res = pq.pq_search(out, qv, qids, k=5, refine=8, ds=ds).to_pandas()
    exact = similarity.brute_force_topk(ds, qids, k=5).to_pandas()
    assert _recall(res, exact, qids) >= 0.9


def test_pruned_read_recall_and_fraction(ray_session, tmp_path):
    """nprobe reads a strict subset of the cell-partitioned code files
    and still recalls the true neighbors (residual cells are tight on
    clustered data)."""
    from baram_ray.pq import _code_files

    ds = _clustered_ds(n=4000, n_clusters=16)
    out = str(tmp_path / "pqp")
    pq.pq_build(ds, out, m=16, n_coarse=64, train_sample=2048)
    all_files = _code_files(out)
    qids = list(range(0, 40, 4))
    _, qv = similarity._collect_query_vecs(ds, qids)
    res = pq.pq_search(out, qv, qids, k=5, refine=8, ds=ds,
                       nprobe=8).to_pandas()
    exact = similarity.brute_force_topk(ds, qids, k=5).to_pandas()
    assert _recall(res, exact, qids) >= 0.9
    # the probe set must actually prune: ≤ ~(|Q|·nprobe)/n_coarse of
    # the cells, strictly fewer files than a full scan
    q = np.stack([similarity._norm_rows(qv)[i] for i in range(len(qids))])
    import numpy as _np
    arch = _np.load(f"{out}/codebooks.npz")
    coarse = arch["coarse"]
    d2 = (coarse * coarse).sum(axis=1) - 2.0 * (q @ coarse.T)
    cells = {int(c) for row in _np.argpartition(d2, 7, axis=1)[:, :8]
             for c in row}
    probed = _code_files(out, cells)
    assert len(probed) < len(all_files)
    assert set(probed) <= set(all_files)


def test_nprobe_all_cells_equals_full_scan(ray_session, tmp_path):
    ds = _clustered_ds(n=1000)
    out = str(tmp_path / "pqf")
    pq.pq_build(ds, out, m=8, n_coarse=16, train_sample=1024)
    qids = [5, 100, 777]
    _, qv = similarity._collect_query_vecs(ds, qids)
    a = pq.pq_search(out, qv, qids, k=5, refine=4, ds=ds,
                     nprobe=16).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = pq.pq_search(out, qv, qids, k=5, refine=4, ds=ds,
                     nprobe=None).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_build_determinism(ray_session, tmp_path):
    ds = _clustered_ds(n=800)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = pq.pq_build(ds, a, m=8, train_sample=512)
    mb = pq.pq_build(ds, b, m=8, train_sample=512)
    assert ma == mb
    ba = np.load(os.path.join(a, "codebooks.npz"))["books"]
    bb = np.load(os.path.join(b, "codebooks.npz"))["books"]
    assert np.array_equal(ba, bb)
    qids = [3, 77, 401]
    _, qv = similarity._collect_query_vecs(ds, qids)
    ra = pq.pq_search(a, qv, qids, k=5, refine=4, ds=ds).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    rb = pq.pq_search(b, qv, qids, k=5, refine=4, ds=ds).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ra, rb)


def test_pq_add_appends_with_same_codebooks(ray_session, tmp_path):
    """pq_add encodes new vectors with the EXISTING codebooks, only
    adds files, and the union is searchable at full recall."""
    rng = np.random.RandomState(7)
    cen = rng.randn(12, 64)
    cen /= np.linalg.norm(cen, axis=1, keepdims=True)

    def make(n, id0, seed):
        r = np.random.RandomState(seed)
        lab = r.randint(0, 12, size=n)
        v = cen[lab] + 0.08 * r.randn(n, 64)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(id0, id0 + n, dtype=np.int64)),
            "embedding": pa.array([row.astype(np.float32).tolist()
                                   for row in v],
                                  pa.list_(pa.float32()))}))

    base, extra = make(1500, 0, 1), make(400, 10_000, 2)
    out = str(tmp_path / "pqa")
    pq.pq_build(base, out, m=16, n_coarse=32, train_sample=1024)
    books_before = np.load(os.path.join(out, "codebooks.npz"))["books"]
    meta = pq.pq_add(out, extra)
    assert meta["n"] == 1900
    books_after = np.load(os.path.join(out, "codebooks.npz"))["books"]
    assert np.array_equal(books_before, books_after)
    union = base.union(extra)
    qids = [3, 500, 10_005, 10_399]          # old AND new vectors
    _, qv = similarity._collect_query_vecs(union, qids)
    res = pq.pq_search(out, qv, qids, k=5, refine=8, ds=union).to_pandas()
    exact = similarity.brute_force_topk(union, qids, k=5).to_pandas()
    assert _recall(res, exact, qids) >= 0.9
    # appended ids are actually retrievable as results
    assert (res["vec_id"] >= 10_000).any()


def test_k_exceeds_corpus(ray_session, tmp_path):
    ds = _clustered_ds(n=12)
    out = str(tmp_path / "tiny")
    pq.pq_build(ds, out, m=8, train_sample=64)
    _, qv = similarity._collect_query_vecs(ds, [0])
    res = pq.pq_search(out, qv, [0], k=50, refine=2, ds=ds).to_pandas()
    assert len(res) == 11          # everything except the query itself
    assert list(res["rank"]) == list(range(1, 12))


def test_indivisible_dim_raises(ray_session):
    with pytest.raises(ValueError):
        pq.pq_train(_emb(), m=7, train_sample=64)


def test_pipeline_entry_shape(ray_session):
    from baram_ray.pipelines import training as trainp
    res = trainp.sim_knn_pq(SF)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == len(trainp.KNN_QUERY_IDS) * 5
    assert set(df["query_id"]) == set(trainp.KNN_QUERY_IDS)


def test_meta_json_readable(index):
    out, meta = index
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f) == meta
