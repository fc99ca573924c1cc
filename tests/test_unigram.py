"""Distributed unigram-LM tokenizer training (Kudo 2018): the
distributed path against the single-process reference (vocab set
exact, log-probs to float-sum tolerance, Viterbi encodings exact),
reshard stability, lattice invariants, and encoding determinism."""

import math

import numpy as np
import pandas as pd
import pytest
import ray

from baram_ray.unigram import (_expected_counts, unigram_train,
                               unigram_train_local, viterbi_encode)

WORDS = ["streaming", "streams", "stream", "dream", "dreams",
         "steam", "team", "teams", "the", "them", "theme",
         "query", "queries", "querying"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    texts = [" ".join(rng.choice(WORDS,
                                 size=int(rng.integers(3, 12))))
             for _ in range(300)]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return texts, wf


@pytest.fixture(scope="module")
def local_vocab(corpus):
    return unigram_train_local(corpus[1], vocab_size=30,
                               seed_size=200)


def test_distributed_matches_local(ray_session, corpus, local_vocab):
    texts, _ = corpus
    ds = ray.data.from_pandas(
        pd.DataFrame({"text": texts})).repartition(6)
    dist = unigram_train(ds, vocab_size=30, seed_size=200)
    assert set(dist) == set(local_vocab)
    assert max(abs(dist[p] - local_vocab[p]) for p in dist) < 1e-9
    for w in WORDS:
        assert viterbi_encode(w, dist) == \
            viterbi_encode(w, local_vocab)


def test_reshard_stable(ray_session, corpus):
    texts, _ = corpus
    vocabs = []
    for blocks in (2, 8):
        ds = ray.data.from_pandas(
            pd.DataFrame({"text": texts})).repartition(blocks)
        vocabs.append(unigram_train(ds, vocab_size=30,
                                    seed_size=200))
    a, b = vocabs
    assert set(a) == set(b)
    assert max(abs(a[p] - b[p]) for p in a) < 1e-9


def test_learns_morphology(local_vocab):
    # the suffix 'ing' and the stem 'stream' must survive pruning
    assert "stream" in local_vocab and "ing" in local_vocab
    assert viterbi_encode("streaming", local_vocab) == \
        ["stream", "ing"]


def test_single_chars_always_kept(local_vocab, corpus):
    _, wf = corpus
    chars = {c for w in wf for c in w}
    assert chars <= set(local_vocab)
    # any word over the corpus alphabet stays segmentable
    assert viterbi_encode("mermaid"[:5], local_vocab)  # 'merma'


def test_lattice_invariants(local_vocab):
    ec, z = _expected_counts("streaming", local_vocab, 8)
    assert z > float("-inf")
    # expected piece usage is at least 1 (some segmentation exists)
    # and at most the word length (single chars)
    assert 1.0 - 1e-9 <= sum(ec.values()) <= len("streaming") + 1e-9
    # unknown-alphabet word → character fallback in encode
    assert viterbi_encode("zzz", {"z": math.log(0.5)}) == \
        ["z", "z", "z"]
    assert viterbi_encode("qxq", {}) == ["q", "x", "q"]


def test_tie_break_deterministic():
    logp = {"ab": math.log(0.25), "a": math.log(0.5),
            "b": math.log(0.5)}
    # 'ab' (1 piece, p=.25) vs 'a'+'b' (2 pieces, p=.25): same score,
    # fewer pieces wins
    assert viterbi_encode("ab", logp) == ["ab"]


def test_vocab_size_respected(corpus):
    _, wf = corpus
    for vs in (25, 40):
        v = unigram_train_local(wf, vocab_size=vs, seed_size=300)
        n_chars = sum(1 for p in v if len(p) == 1)
        assert len(v) <= max(vs, n_chars)
