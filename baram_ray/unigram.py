"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization" — the SentencePiece unigram algorithm), the second
tokenizer-training family next to BPE (``bpe.py``; reference trains
its tokenizers offline and ships them with the model config).

Algorithm (as published): seed a large candidate vocabulary from
frequent substrings, then alternate (a) EM — the E-step computes each
piece's expected count over all segmentations of every word via
forward-backward on the segmentation lattice, the M-step re-normalizes
piece probabilities — and (b) pruning the lowest-probability pieces
(single characters are always kept so every word stays segmentable)
until the target vocabulary size is reached. Encoding is per-word
Viterbi (max total log-prob; ties → fewer pieces, then lexicographic —
a total order, so encodings are reproducible).

Distribution (Ray-Data-first): the corpus pass is ``bpe.word_counts``
(per-batch combiner → one word-keyed exchange); seeding and every
E-step are ``map_batches`` over the DISTINCT-WORD table (work scales
with vocabulary, not corpus size) with the current piece table
broadcast via ``ray.put``; per-piece expected-count partials reduce
through ``grouped_agg``. Only vocab-sized state (the piece table)
ever sits on the driver. Float partials sum in exchange order, so
sharded runs match a single process to ~1e-12 relative — the final
VOCAB SET and Viterbi encodings are exact-matched in tests, log-probs
to tolerance (``tests/test_unigram.py``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from baram_ray.bpe import word_counts
from baram_ray.util import grouped_agg

_NEG_INF = float("-inf")


# ------------------------------------------------------------------ #
# lattice primitives (pure; shared by the distributed and local paths)

def _expected_counts(word: str, logp: dict[str, float],
                     max_len: int) -> tuple[dict[str, float], float]:
    """E-step for one word: posterior expected count per piece over
    all segmentations (forward-backward on the position lattice in
    log space) and the word log-likelihood."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    arcs: list[tuple[int, int, str, float]] = []
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            lp = logp.get(word[start:end])
            if lp is None:
                continue
            arcs.append((start, end, word[start:end], lp))
            a = alpha[start] + lp
            alpha[end] = (a if alpha[end] == _NEG_INF
                          else np.logaddexp(alpha[end], a))
    z = alpha[n]
    if z == _NEG_INF:
        return {}, _NEG_INF
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for start, end, piece, lp in sorted(
            arcs, key=lambda t: -t[1]):
        b = lp + beta[end]
        beta[start] = (b if beta[start] == _NEG_INF
                       else np.logaddexp(beta[start], b))
    out: dict[str, float] = {}
    for start, end, piece, lp in arcs:
        post = math.exp(alpha[start] + lp + beta[end] - z)
        out[piece] = out.get(piece, 0.0) + post
    return out, z


def viterbi_encode(word: str, logp: dict[str, float],
                   max_len: int = 8) -> list[str]:
    """Best segmentation: max Σ logp, ties → fewer pieces, then the
    lexicographically smallest piece sequence (total order →
    deterministic)."""
    n = len(word)
    # best[i] = (score, -n_pieces, pieces tuple) reaching position i
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    def better(a, b):
        if a is None:
            return b
        if (b[0], b[1]) != (a[0], a[1]):
            return b if (b[0], b[1]) > (a[0], a[1]) else a
        return b if b[2] < a[2] else a      # lexicographic tie-break

    for end in range(1, n + 1):
        cand = None
        for start in range(max(0, end - max_len), end):
            lp = logp.get(word[start:end])
            if lp is None or best[start] is None:
                continue
            s, k, seq = best[start]
            cand = better(cand,
                          (s + lp, k - 1, seq + (word[start:end],)))
        best[end] = cand
    if best[n] is None:
        return list(word)        # unsegmentable → characters
    return list(best[n][2])


def _seed_candidates(words: pd.DataFrame, max_len: int,
                     seed_size: int) -> pd.DataFrame:
    """Frequent-substring seeding over a word-count frame: every
    substring of length ≤ max_len scored by occurrence count; the
    top ``seed_size`` by (count desc, piece asc) plus ALL single
    characters."""
    agg: dict[str, int] = {}
    for w, n in zip(words["word"], words["n"]):
        w = str(w)
        n = int(n)
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                agg[p] = agg.get(p, 0) + n
    items = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    chars = {p for p in agg if len(p) == 1}
    keep = [p for p, _ in items if len(p) > 1][:seed_size]
    pieces = sorted(chars) + keep
    return pd.DataFrame({"piece": pieces,
                         "count": [agg[p] for p in pieces]})


def unigram_train_local(word_freq: dict[str, int],
                        vocab_size: int = 120, max_len: int = 8,
                        seed_size: int = 2000,
                        em_iters: int = 2,
                        shrink: float = 0.75) -> dict[str, float]:
    """Single-process reference implementation (the test oracle for
    the distributed path): identical seeding, EM and pruning over an
    in-memory word-frequency dict."""
    wf = pd.DataFrame({"word": list(word_freq),
                       "n": list(word_freq.values())})
    seed = _seed_candidates(wf, max_len, seed_size)
    total = float(seed["count"].sum())
    logp = {p: math.log(c / total)
            for p, c in zip(seed["piece"], seed["count"])}
    while True:
        for _ in range(em_iters):
            exp: dict[str, float] = {}
            for w, n in word_freq.items():
                ec, _ = _expected_counts(str(w), logp, max_len)
                for p, e in ec.items():
                    exp[p] = exp.get(p, 0.0) + e * int(n)
            tot = sum(exp.values())
            ltot = math.log(tot)
            logp = {p: math.log(e) - ltot for p, e in exp.items()
                    if e > 0.0}
            for c in {ch for w in word_freq for ch in str(w)}:
                logp.setdefault(c, math.log(1e-12))
        multi = sorted((p for p in logp if len(p) > 1),
                       key=lambda p: (logp[p], p))
        n_multi = len(multi)
        n_chars = len(logp) - n_multi
        if n_chars + n_multi <= vocab_size:
            break
        keep_multi = max(vocab_size - n_chars,
                         int(n_multi * shrink))
        if keep_multi >= n_multi:
            keep_multi = max(vocab_size - n_chars, n_multi - 1)
        drop = set(multi[: n_multi - keep_multi])
        if not drop:
            break
        logp = {p: lp for p, lp in logp.items() if p not in drop}
    return logp


def unigram_train(ds, col: str = "text", vocab_size: int = 120,
                  max_len: int = 8, seed_size: int = 2000,
                  em_iters: int = 2, shrink: float = 0.75,
                  num_buckets: int = 8) -> dict[str, float]:
    """Distributed unigram-LM training over Dataset[col]. One corpus
    pass (word counts); seeding and every E-step map over the
    distinct-word table with the piece table broadcast; per-piece
    float partials reduce through the exchange. Driver state is
    vocab-sized only."""
    import pyarrow as pa
    import ray

    wc = word_counts(ds, col=col, num_buckets=num_buckets)

    # seeding: substring partials per word block → one exchange
    def seed_part(df: pd.DataFrame) -> pd.DataFrame:
        agg: dict[str, int] = {}
        for w, n in zip(df["word"], df["n"]):
            w, n = str(w), int(n)
            for i in range(len(w)):
                for j in range(i + 1,
                               min(len(w), i + max_len) + 1):
                    agg[w[i:j]] = agg.get(w[i:j], 0) + n
        return pd.DataFrame({"piece": list(agg),
                             "count": np.fromiter(
                                 agg.values(), dtype=np.int64,
                                 count=len(agg))})

    wc_mat = wc.materialize()     # reused every EM round
    subs = grouped_agg(
        wc_mat.map_batches(seed_part, batch_format="pandas"),
        ["piece"], {"count": ("count", "sum")},
        num_buckets=num_buckets).to_pandas()
    # top seed_size multi-char by (count desc, piece asc) + all chars
    subs = subs.sort_values(["count", "piece"],
                            ascending=[False, True])
    chars = subs[subs["piece"].str.len() == 1]
    multi = subs[subs["piece"].str.len() > 1].head(seed_size)
    seed = pd.concat([chars, multi])
    total = float(seed["count"].sum())
    logp = {p: math.log(c / total)
            for p, c in zip(seed["piece"], seed["count"])}

    def em_pass(cur: dict[str, float]) -> dict[str, float]:
        ref = ray.put(cur)

        def estep(df: pd.DataFrame) -> pd.DataFrame:
            lp = ray.get(ref)
            agg: dict[str, float] = {}
            for w, n in zip(df["word"], df["n"]):
                ec, _ = _expected_counts(str(w), lp, max_len)
                for p, e in ec.items():
                    agg[p] = agg.get(p, 0.0) + e * int(n)
            return pd.DataFrame({"piece": list(agg),
                                 "e": np.fromiter(
                                     agg.values(), dtype=np.float64,
                                     count=len(agg))})

        exp = grouped_agg(
            wc_mat.map_batches(estep, batch_format="pandas"),
            ["piece"], {"e": ("e", "sum")},
            num_buckets=num_buckets).to_pandas()
        tot = float(exp["e"].sum())
        ltot = math.log(tot)
        out = {p: math.log(e) - ltot
               for p, e in zip(exp["piece"], exp["e"]) if e > 0.0}
        for c in (p for p in cur if len(p) == 1):
            out.setdefault(c, math.log(1e-12))
        return out

    while True:
        for _ in range(em_iters):
            logp = em_pass(logp)
        multi_p = sorted((p for p in logp if len(p) > 1),
                         key=lambda p: (logp[p], p))
        n_multi = len(multi_p)
        n_chars = len(logp) - n_multi
        if n_chars + n_multi <= vocab_size:
            break
        keep_multi = max(vocab_size - n_chars,
                         int(n_multi * shrink))
        if keep_multi >= n_multi:
            keep_multi = max(vocab_size - n_chars, n_multi - 1)
        drop = set(multi_p[: n_multi - keep_multi])
        if not drop:
            break
        logp = {p: lp for p, lp in logp.items() if p not in drop}
    return logp
