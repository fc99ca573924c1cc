"""Distributed full-batch logistic regression (baram_ray.linear) —
partial-gradient reduce vs the in-memory numpy reference, reshard
stability, and end-to-end accuracy on a separable label."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from baram_ray.linear import (
    FEATURE_NAMES, logistic_fit, logistic_fit_numpy, logistic_score,
    text_features,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text", "n_chars"])


def _label_fn():
    # defined inside a factory so cloudpickle serializes it BY VALUE —
    # a module-level function in tests/ pickles by reference and the
    # Ray workers cannot import test modules
    def _label(b):
        return (b["n_chars"].to_numpy() > 300).astype("float64")
    return _label


def test_distributed_fit_matches_numpy(ray_session):
    """The streaming partial-gradient fit reproduces the whole-matrix
    numpy recursion to float round-off."""
    m = logistic_fit(_docs(), label_fn=_label_fn(), iters=25, lr=1.0)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["text", "n_chars"])
    x = text_features(t["text"].to_pylist())
    y = (t["n_chars"].to_numpy() > 300).astype("float64")
    mn = logistic_fit_numpy(x, y, iters=25, lr=1.0)
    scale = max(1.0, np.abs(mn.w).max())
    assert np.abs(m.w - mn.w).max() < 1e-8 * scale
    assert np.allclose(m.mean, mn.mean) and np.allclose(m.std, mn.std)


def test_fit_reshard_stable(ray_session):
    """Different block layouts only perturb float round-off (the
    per-epoch reduce is order-pinned by batch min-id)."""
    w2 = logistic_fit(_docs().repartition(2), label_fn=_label_fn(),
                      iters=20, lr=1.0)
    w8 = logistic_fit(_docs().repartition(8), label_fn=_label_fn(),
                      iters=20, lr=1.0)
    assert np.allclose(w2.w, w8.w, rtol=0, atol=1e-9)
    # and bit-identical when re-run on the SAME layout
    w2b = logistic_fit(_docs().repartition(2), label_fn=_label_fn(),
                       iters=20, lr=1.0)
    assert np.array_equal(w2.w, w2b.w)


def test_quality_model_learns_separable_label(ray_session):
    """End-to-end (the doc_quality_model queries() entry): ≥0.9 train
    accuracy on the long-doc label, which is linearly separable in the
    log_len feature."""
    from baram_ray.pipelines.training import doc_quality_model

    got = doc_quality_model(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "n_chars"]).to_pandas()
    y = dict(zip(t["doc_id"], t["n_chars"] > 300))
    acc = np.mean([bool(p) == bool(y[d])
                   for d, p in zip(got["doc_id"], got["pred"])])
    assert len(got) == len(t)
    assert acc >= 0.9, f"accuracy {acc}"


def test_custom_feature_fn_learns_code_lang(ray_session):
    """feature_fn injection: language keywords separate the code
    corpus's lang label (the synthetic documents table's lang is
    deliberately uncorrelated with text — the code corpus's is not)."""
    from baram_ray.corpus import corpus_parquet

    path = corpus_parquet(2000, seed=11,
                          cache_dir="/tmp/baram_linear_corpus")
    kw = {"python": ["def", "import", "self", "lambda"],
          "rust": ["fn", "impl", "let", "match"]}

    def feats(texts):
        out = np.zeros((len(texts), 8), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            j = 0
            for lang in ("python", "rust"):
                for w in kw[lang]:
                    out[i, j] = toks.count(w) / len(toks)
                    j += 1
        return out

    ds = ray.data.read_parquet(path, columns=["path", "lang", "content"])

    def label(b):
        return (np.asarray(b["lang"].to_pylist(), dtype=object)
                == "python").astype("float64")

    # id_col is the reduce-order key and must be numeric — attach one
    import pyarrow as pa

    ds2 = ds.map_batches(
        lambda b: b.append_column(
            "rid", pa.array(np.arange(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    w = logistic_fit(ds2, label_fn=label, feature_fn=feats,
                     text_col="content", id_col="rid",
                     iters=80, lr=5.0)
    sc = logistic_score(ds2, w, text_col="content", id_col="rid",
                        feature_fn=feats).to_pandas()
    t = pq.read_table(path, columns=["lang"]).to_pandas()
    y = (t["lang"] == "python").to_numpy()
    base = max(y.mean(), 1 - y.mean())
    # row order of score output == input order within this small table
    acc = (sc["pred"].to_numpy() == y).mean() \
        if len(sc) == len(y) else 0.0
    assert acc > base + 0.1, f"acc {acc} vs base {base}"


def test_irls_matches_numpy_and_converges_faster(ray_session):
    """Newton/IRLS: the distributed fit matches the in-memory reference
    per pass, and 8 Newton passes reach at least the quality of 25 GD
    epochs on the same data."""
    m = logistic_fit(_docs(), label_fn=_label_fn(), iters=8,
                     method="irls")
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["text", "n_chars"])
    x = text_features(t["text"].to_pylist())
    y = (t["n_chars"].to_numpy() > 300).astype("float64")
    mn = logistic_fit_numpy(x, y, iters=8, method="irls")
    assert np.allclose(m.w, mn.w, rtol=0,
                       atol=1e-6 * max(1.0, np.abs(mn.w).max()))
    gd = logistic_fit_numpy(x, y, iters=25, lr=2.0)

    def acc(model):
        return ((model.predict_proba(x) >= 0.5) == (y > 0.5)).mean()

    assert acc(mn) >= acc(gd) - 1e-9
    assert acc(mn) >= 0.9
