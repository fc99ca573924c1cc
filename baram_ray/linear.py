"""Distributed linear-model training over a Dataset — the TRAINABLE
counterpart of the heuristic quality/langid stages (``stages/text.py``).

Shape (same as ``similarity.kmeans_fit``): full-batch gradient descent
where every epoch is ONE streaming pass — ``map_batches`` computes a
per-batch partial gradient (a (d+1)-vector plus scalar loss/count,
constant-size regardless of corpus), the driver reduces the partials
and takes the step. Zero shuffle; per-epoch driver state is O(d).

Determinism: float partial sums depend on reduce order, so every
partial row carries the batch's min doc_id and the driver sums in
that sorted order — the fit is bit-identical run-to-run for a given
input layout regardless of task scheduling; changing the block layout
only perturbs float round-off (tested ≤1e-9 against the single-pass
numpy reference). Full-batch (not SGD) for the same reason: sample
order never enters the math.

A 100-TB corpus trains in epochs × one-pass scans with nothing
corpus-sized anywhere; scoring is one more stateless pass with the
weight vector shipped in the task closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---- feature extraction ------------------------------------------------ #

FEATURE_NAMES = ("log_len", "space_ratio", "digit_ratio", "upper_ratio",
                 "mean_word_len", "ascii_ratio", "en_stop_ratio")

# tiny English function-word set — the classic langid signal (high
# coverage in English text, near-zero elsewhere)
_EN_STOPS = frozenset(
    "the of and to a in is it that for on with as are was be at by this "
    "an or from not have has had but they you we he she will can all "
    "their there which one if would about".split())


def text_features(texts: list[str]) -> np.ndarray:
    """(B, 7) deterministic per-doc features (cheap byte/char stats +
    English function-word coverage — the classic langid/quality
    feature family)."""
    out = np.zeros((len(texts), len(FEATURE_NAMES)), dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        n = len(t)
        if not n:
            continue
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"),
                          dtype=np.uint8)
        nb = len(b)
        words = t.split()
        out[i, 0] = np.log1p(n)
        out[i, 1] = t.count(" ") / n
        out[i, 2] = sum(c.isdigit() for c in t) / n
        out[i, 3] = sum(c.isupper() for c in t) / n
        out[i, 4] = (sum(len(w) for w in words) / len(words)
                     if words else 0.0)
        out[i, 5] = float((b < 128).sum()) / nb
        if words:
            low = [w.strip(".,;:!?\"'()[]").lower() for w in words]
            out[i, 6] = sum(w in _EN_STOPS for w in low) / len(words)
    return out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable two-sided form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logistic_fit(ds, label_col: str | None = None, label_value=None, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 feature_fn=None, label_fn=None,
                 iters: int = 30, lr: float = 0.5, l2: float = 1e-4,
                 method: str = "gd") -> "LinearModel":
    """Fit P(label_col == label_value | text) → :class:`LinearModel`.

    ``feature_fn(list[str]) -> (B, d)`` swaps the feature family
    (default :func:`text_features`); ``label_fn(batch) -> (B,) float``
    swaps the target (default: equality on ``label_col``).

    Pass 0 computes feature mean/std from per-batch partial sums
    (features are standardized — plain GD on raw scales barely moves);
    then each epoch is one streaming pass emitting per-batch partial
    gradient rows (grad vector, loss, count, batch min-id); driver
    sorts partials by min-id (deterministic reduce order), sums, and
    steps with plain GD on the mean-loss + L2 objective.
    ``method="irls"`` takes Newton steps instead (each pass also ships
    the (d+1)² weighted Gram partial — still constant-size): ~6-8
    passes to convergence vs tens of GD epochs, i.e. far fewer corpus
    scans for the same model.
    """
    fx = feature_fn or text_features
    dim = fx([""]).shape[1]

    # ---- pass 0: standardization moments --------------------------------
    def moments(batch: pa.Table) -> pa.Table:
        x = fx(batch[text_col].to_pylist())
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array([int(ids.min()) if len(ids) else 0],
                            pa.int64()),
            "s1": pa.array([x.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "s2": pa.array([(x * x).sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "n": pa.array([len(x)], pa.int64()),
        })

    mp = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    mp = mp.sort_values("key", kind="stable")
    s1 = np.zeros(dim)
    s2 = np.zeros(dim)
    n_total = 0
    for a, b, nn in zip(mp["s1"], mp["s2"], mp["n"]):
        s1 += np.asarray(a, dtype=np.float64)
        s2 += np.asarray(b, dtype=np.float64)
        n_total += int(nn)
    if not n_total:
        return LinearModel(np.zeros(dim + 1), np.zeros(dim),
                           np.ones(dim))
    mu = s1 / n_total
    var = np.maximum(s2 / n_total - mu * mu, 0.0)
    sd = np.sqrt(var)
    sd[sd == 0] = 1.0

    newton = method == "irls"
    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        def partial(batch: pa.Table, w=w) -> pa.Table:
            texts = batch[text_col].to_pylist()
            x = (fx(texts) - mu) / sd
            xb = np.hstack([x, np.ones((len(x), 1))])
            if label_fn is not None:
                y = np.asarray(label_fn(batch), dtype=np.float64)
            else:
                y = (np.asarray(batch[label_col].to_pylist(),
                                dtype=object)
                     == label_value).astype(np.float64)
            p = _sigmoid(xb @ w)
            g = xb.T @ (p - y)                        # (d+1,)
            cols = {"grad": pa.array([g.tolist()], pa.list_(pa.float64()))}
            if newton:
                # Newton/IRLS partial: the (d+1)² weighted Gram matrix,
                # still constant-size regardless of corpus
                h = (xb * (p * (1.0 - p))[:, None]).T @ xb
                cols["hess"] = pa.array([h.ravel().tolist()],
                                        pa.list_(pa.float64()))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return pa.table({
                "key": pa.array([int(ids.min()) if len(ids) else 0],
                                pa.int64()),
                **cols,
                "n": pa.array([len(y)], pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values("key", kind="stable")
        g = np.zeros_like(w)
        h = np.zeros((dim + 1, dim + 1)) if newton else None
        n = 0
        for _, row in parts.iterrows():
            g += np.asarray(row["grad"], dtype=np.float64)
            if newton:
                h += np.asarray(row["hess"],
                                dtype=np.float64).reshape(dim + 1, -1)
            n += int(row["n"])
        if newton:
            # (H/n + l2 I) Δ = g/n + l2 w  — one small solve per pass
            a = h / n + l2 * np.eye(dim + 1)
            w = w - np.linalg.solve(a, g / n + l2 * w)
        else:
            w = w - lr * (g / n + l2 * w)
    return LinearModel(w, mu, sd)


class LinearModel:
    """Fitted weights + the standardization moments they expect."""

    def __init__(self, w: np.ndarray, mean: np.ndarray, std: np.ndarray):
        self.w = w
        self.mean = mean
        self.std = std

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        xs = (x - self.mean) / self.std
        xb = np.hstack([xs, np.ones((len(xs), 1))])
        return _sigmoid(xb @ self.w)


def logistic_score(ds, model: "LinearModel", *, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.5,
                   feature_fn=None):
    """(id, prob round-6, pred) for every row — one stateless pass with
    the model (weights + moments) in the task closure."""
    fx = feature_fn or text_features

    def score(batch: pa.Table) -> pa.Table:
        p = model.predict_proba(fx(batch[text_col].to_pylist()))
        return pa.table({
            id_col: batch[id_col],
            "prob": pa.array(np.round(p, 6), pa.float64()),
            "pred": pa.array(p >= threshold, pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def logistic_fit_numpy(x: np.ndarray, y: np.ndarray, *, iters: int = 30,
                       lr: float = 0.5, l2: float = 1e-4,
                       method: str = "gd") -> "LinearModel":
    """Single-process reference implementation (whole matrix in memory)
    — the pytest oracle for the distributed fit (same standardize +
    full-batch GD / IRLS recursion)."""
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    xs = (x - mu) / sd
    xb = np.hstack([xs, np.ones((len(xs), 1))])
    w = np.zeros(xb.shape[1], dtype=np.float64)
    for _ in range(iters):
        p = _sigmoid(xb @ w)
        g = xb.T @ (p - y) / len(y) + l2 * w
        if method == "irls":
            h = (xb * (p * (1.0 - p))[:, None]).T @ xb / len(y) \
                + l2 * np.eye(xb.shape[1])
            w = w - np.linalg.solve(h, g)
        else:
            w = w - lr * g
    return LinearModel(w, mu, sd)
