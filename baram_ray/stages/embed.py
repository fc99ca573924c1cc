"""Embedding pipeline stages (M16 + A1 shape) — the reference's
embed path: ``format!("{} {} ", title, content)`` input concat
(``src/commands/index.rs:274``), tokenize + truncate to
``max_seq_length`` 512 (``src/embedding/vectorize.rs:28-51, 287``),
batched inference of 50 docs/request (``src/main.rs:73-75``,
``ARCHITECTURE.md:343``), 384-dim MiniLM vectors.

The MiniLM model itself is NOT in this container, so ``EmbedStage``
ships a deterministic fake encoder behind ``real_model=True →
NotImplementedError`` (same honesty contract as baram_ray.multimodal);
the Ray-side plumbing — prep projection, actor pool, batch size,
output schema — is real and tested.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

MAX_SEQ_LENGTH = 512          # reference vectorize.rs:45
EMBED_DIM = 384               # MiniLM-L12-v2 (vectorize.rs:40-51)
EMBED_BATCH = 50              # docs per embed call (main.rs:73-75)

_WS = re.compile(r"\s+")


def prep_text(title: str | None, content: str | None,
              max_tokens: int = MAX_SEQ_LENGTH) -> tuple[str, int]:
    """'{title} {content}' → whitespace tokens → first ``max_tokens``
    joined (the reference truncates at the tokenizer; whitespace tokens
    stand in for wordpieces here so the op is SQL-checkable)."""
    joined = f"{title or ''} {content or ''}".strip()
    if not joined:
        return "", 0
    toks = _WS.split(joined)[:max_tokens]
    return " ".join(toks), len(toks)


class EmbedPrepStage:
    """map_batches UDF: (doc_id, title?, content) → (doc_id, embed_text,
    n_tokens)."""

    def __init__(self, content_col: str = "text",
                 title_col: str | None = None,
                 max_tokens: int = MAX_SEQ_LENGTH):
        self.content_col = content_col
        self.title_col = title_col
        self.max_tokens = max_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = (batch[self.title_col].to_pylist() if self.title_col
                  else [None] * batch.num_rows)
        texts, ns = [], []
        for ti, ct in zip(titles, batch[self.content_col].to_pylist()):
            s, n = prep_text(ti, ct, self.max_tokens)
            texts.append(s)
            ns.append(n)
        return pa.table({
            "doc_id": batch["doc_id"],
            "embed_text": pa.array(texts, pa.string()),
            "n_tokens": pa.array(ns, pa.int64()),
        })


class EmbedStage:
    """Actor-pool UDF (A1 shape): model 'loaded' once in __init__, one
    batched forward pass per __call__ batch.

    Usage::

        prep.map_batches(EmbedStage, concurrency=4,
                         batch_size=EMBED_BATCH, batch_format="pyarrow")
    """

    def __init__(self, real_model: bool = False, dim: int = EMBED_DIM,
                 encode_fn=None):
        # encode_fn: user-supplied batched encoder, list[str] → (B, dim)
        # array-like — the injection point for a real model (construct /
        # load it inside a zero-arg factory passed via
        # fn_constructor_kwargs so the load happens once per actor)
        self._encode_fn = encode_fn
        if real_model and encode_fn is None:
            # auto-detect an installed real backend (backends.py): a
            # sentence-transformers wheel routes the real model (lazy
            # per-actor load); absent, the honest error stands
            from baram_ray import backends
            self._encode_fn = backends.st_encode_fn(dim)
            if self._encode_fn is None:
                raise NotImplementedError(
                    "no embedding model in this container; pass "
                    "encode_fn=<your batched encoder> to EmbedStage or "
                    "install sentence-transformers (the deterministic "
                    "fake below otherwise exercises the full Ray "
                    "plumbing)")
        self.dim = dim
        # deterministic projection matrix = the 'loaded model' (per-actor
        # one-time init; seeded so every actor computes identical vectors)
        rng = np.random.RandomState(1234)
        self._proj = rng.standard_normal((256, dim)).astype(np.float32)

    def _encode_one(self, text: str) -> np.ndarray:
        # byte-histogram features × fixed projection → L2-normalized vec;
        # deterministic stand-in with the same (batch → matrix) shape a
        # real encoder forward pass has
        h = np.zeros(256, dtype=np.float32)
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(data):
            np.add.at(h, data, 1.0)
            h /= len(data)
        seed = int.from_bytes(
            hashlib.blake2b(text.encode(), digest_size=4).digest(), "big")
        h[seed % 256] += 0.5                  # content-sensitive spike
        v = h @ self._proj
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["embed_text"].to_pylist()]
        if self._encode_fn is not None:
            vecs = np.asarray(self._encode_fn(texts), dtype=np.float32)
            if vecs.shape != (batch.num_rows, self.dim):
                raise ValueError(
                    f"encode_fn returned {vecs.shape}, expected "
                    f"({batch.num_rows}, {self.dim})")
        else:
            vecs = [self._encode_one(t) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "dim": pa.array([self.dim] * batch.num_rows, pa.int64()),
        })
