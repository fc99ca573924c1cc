"""The worked real-model example (examples/real_model_embedding.py):
the EmbedStage ``encode_fn`` injection point driven by ACTUAL weights
loaded from disk — a trained-and-saved npz lookup model in CI, a
user-supplied model dir (sentence-transformers or npz) when
``BARAM_MODEL_DIR`` is set."""

import os
import sys

import numpy as np
import pytest

import ray

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.real_model_embedding import (NpzMeanPoolEncoder,
                                           embed_documents)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def npz_model_dir(tmp_path_factory):
    """Save a small REAL word-vector model (deterministic weights) —
    the load path is byte-for-byte what a downloaded model would use."""
    d = tmp_path_factory.mktemp("model")
    rng = np.random.RandomState(42)
    import pyarrow.parquet as pq
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    vocab = sorted({w for t in texts[:200] for w in str(t).lower().split()})
    vecs = rng.standard_normal((len(vocab), 32)).astype(np.float32)
    np.savez(d / "vocab.npz", words=np.asarray(vocab), vecs=vecs)
    return str(d)


def test_npz_encoder_loads_real_weights(npz_model_dir):
    enc = NpzMeanPoolEncoder(npz_model_dir)
    assert enc.dim == 32
    out = enc(["data processing", "data processing", ""])
    assert out.shape == (3, 32)
    np.testing.assert_array_equal(out[0], out[1])   # deterministic
    assert np.allclose(np.linalg.norm(out[0]), 1.0, atol=1e-5)
    assert (out[2] == 0).all()                      # OOV-only → zeros


def test_embed_pipeline_with_real_model(ray_session, npz_model_dir):
    """Full actor-pool run with the real loaded weights: one model load
    per actor (lazy first-call load), batched forward per batch."""
    enc = NpzMeanPoolEncoder(npz_model_dir)
    res = embed_documents(SF, enc).to_pandas().sort_values("doc_id")
    assert len(res) == 500 and (res["dim"] == 32).all()
    # pipeline output equals a local forward pass over the same prep text
    from baram_ray.pipelines.util import read_table
    from baram_ray.stages.embed import EmbedPrepStage
    prep = read_table(SF, "documents", ["doc_id", "text"]) \
        .map_batches(EmbedPrepStage(), batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id")
    want = enc(prep["embed_text"].tolist())
    got = np.stack(res["embedding"].to_numpy())
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.skipif(not os.environ.get("BARAM_MODEL_DIR"),
                    reason="BARAM_MODEL_DIR not set (no model shipped "
                           "in this container)")
def test_user_supplied_model_dir(ray_session):
    """Opt-in: run the example end-to-end against a user-provided model
    directory (sentence-transformers or vocab.npz)."""
    model_dir = os.environ["BARAM_MODEL_DIR"]
    if os.path.exists(os.path.join(model_dir, "vocab.npz")):
        enc = NpzMeanPoolEncoder(model_dir)
    else:
        st = pytest.importorskip("sentence_transformers")  # noqa: F841
        from examples.real_model_embedding import \
            sentence_transformer_encoder
        enc = sentence_transformer_encoder(model_dir)
    out = embed_documents(SF, enc).take(5)
    assert len(out) == 5 and all(len(r["embedding"]) == r["dim"]
                                 for r in out)
