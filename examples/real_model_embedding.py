"""Worked example: wiring REAL models into the two injection points.

The engine ships honest stubs where this container lacks the external
dependency (no model weights, no network): ``EmbedStage(encode_fn=...)``
(``stages/embed.py``, reference BERT-via-candle
``src/embedding/vectorize.rs:101-393``) and
``LlmClient(generate_fn=...)`` (``llm.py``, reference Ollama/vLLM client
``src/llm/mod.rs:226-260``). This example proves the injection points
with actual loaded weights, three ways:

1. ``NpzMeanPoolEncoder`` — a REAL lookup-table embedding model
   (word vectors loaded from ``<model_dir>/vocab.npz``, whitespace
   tokenize, mean-pool, L2-normalize). Runs in this container;
   ``tests/test_real_model_example.py`` trains/saves a tiny one and
   drives it through the actor pool.
2. ``sentence_transformers`` wiring — used automatically when the
   package AND a model directory are present (CI-skipped otherwise).
3. ``http_generate_fn`` — an OpenAI-compatible ``/v1/completions``
   endpoint for ``LlmClient`` (enabled by ``BARAM_LLM_URL``; no
   network in this sandbox, so it stays a documented recipe here).

Run standalone (owns its Ray session by the repo contract):

    BARAM_MODEL_DIR=/path/with/vocab.npz python examples/real_model_embedding.py
"""

from __future__ import annotations

import os

import numpy as np


class NpzMeanPoolEncoder:
    """Batched ``encode_fn`` backed by REAL weights on disk.

    Pickles only the model path; the weight matrix loads lazily on
    first call — i.e. ONCE PER ACTOR when passed to
    ``map_batches(EmbedStage, fn_constructor_kwargs={"encode_fn": ...})``,
    which is exactly the per-actor model-load shape a transformer
    encoder needs (A1).

    Model format: ``vocab.npz`` with ``words`` (unicode array) and
    ``vecs`` (float32, (V, dim)); unknown words hit a zero vector.
    """

    def __init__(self, model_dir: str):
        self.path = os.path.join(model_dir, "vocab.npz")
        self._table = None          # loaded lazily, once per actor

    def _load(self):
        if self._table is None:
            with np.load(self.path, allow_pickle=False) as z:
                words = [str(w) for w in z["words"]]
                vecs = z["vecs"].astype(np.float32)
            self._table = (dict(zip(words, range(len(words)))), vecs)
        return self._table

    @property
    def dim(self) -> int:
        return self._load()[1].shape[1]

    def __call__(self, texts: list[str]) -> np.ndarray:
        index, vecs = self._load()
        out = np.zeros((len(texts), vecs.shape[1]), dtype=np.float32)
        for i, t in enumerate(texts):
            rows = [index[w] for w in t.lower().split() if w in index]
            if rows:
                v = vecs[rows].mean(axis=0)
                n = np.linalg.norm(v)
                out[i] = v / n if n else v
        return out


def sentence_transformer_encoder(model_dir: str):
    """Injection recipe for a transformer encoder (CI-skipped when the
    package is absent): returns a batched ``encode_fn``. The instance
    pickles the path; the model loads on first call inside the actor."""
    from sentence_transformers import SentenceTransformer  # noqa: F401

    class _Enc:
        def __init__(self, path: str):
            self.path, self._m = path, None

        def __call__(self, texts: list[str]) -> np.ndarray:
            if self._m is None:
                from sentence_transformers import SentenceTransformer
                self._m = SentenceTransformer(self.path)
            return np.asarray(self._m.encode(texts, batch_size=len(texts),
                                             normalize_embeddings=True),
                              dtype=np.float32)

    return _Enc(model_dir)


def http_generate_fn(base_url: str, model: str = "default"):
    """``LlmClient(generate_fn=...)`` against an OpenAI-compatible
    ``/v1/completions`` endpoint (vLLM, Ollama's compat mode). No
    network in this sandbox — documented recipe, exercised only when
    ``BARAM_LLM_URL`` points at a live server."""
    import json
    import urllib.request

    def generate(prompt: str) -> str:
        req = urllib.request.Request(
            f"{base_url.rstrip('/')}/v1/completions",
            data=json.dumps({"model": model, "prompt": prompt,
                             "max_tokens": 512}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.load(r)["choices"][0]["text"]

    return generate


def embed_documents(sf_dir: str, encoder) -> "object":
    """documents → prep → EmbedStage actor pool with the REAL encoder
    (one model load per actor); returns Dataset[(doc_id, embedding,
    dim)]."""
    import ray

    from baram_ray.pipelines.util import read_table
    from baram_ray.stages.embed import EmbedPrepStage, EmbedStage

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    prep = ds.map_batches(EmbedPrepStage(), batch_format="pyarrow")
    return prep.map_batches(
        EmbedStage, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"encode_fn": encoder,
                               "dim": encoder.dim})


if __name__ == "__main__":
    import ray

    model_dir = os.environ.get("BARAM_MODEL_DIR")
    if not model_dir:
        raise SystemExit("set BARAM_MODEL_DIR to a dir with vocab.npz "
                         "(or a sentence-transformers model)")
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    if os.path.exists(os.path.join(model_dir, "vocab.npz")):
        enc = NpzMeanPoolEncoder(model_dir)
    else:
        enc = sentence_transformer_encoder(model_dir)
    out = embed_documents("/root/testdata/sf0.001", enc).take(3)
    for r in out:
        print(r["doc_id"], r["dim"], np.round(r["embedding"][:4], 4))
    ray.shutdown()
