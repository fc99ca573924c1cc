"""Decontamination + repetition signals (baram_ray/decontam.py,
stages/text.py::RepetitionStage): exact token-sequence semantics."""

import pandas as pd
import pytest

import ray

from baram_ray.decontam import benchmark_grams, decontaminate, ngrams_of
from baram_ray.stages.text import RepetitionStage


def test_ngrams_and_probe_derivation():
    toks = "a b c d e f g h i j k l".split()
    g = ngrams_of(toks, 8)
    assert g[0] == "a b c d e f g h"
    assert len(g) == 5
    # probe slice: start=3, count=1 -> tokens[3:11]
    grams = benchmark_grams(["a b c d e f g h i j k l"], n=8,
                            start=3, count=1)
    assert grams == {"d e f g h i j k"}
    # too short for the slice -> nothing
    assert benchmark_grams(["a b c"], n=8) == set()


def test_decontaminate_flags_and_cleans(ray_session):
    probe = "x1 x2 x3 x4"
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"lead {probe} tail tokens here",   # contains the gram
                 "x1 x2 x3 other x4 words pad pad",  # broken sequence
                 "benign text with no probe at all"]})
    ds = ray.data.from_pandas(rows)
    grams = {probe}
    hit = decontaminate(ds, grams, n=4).to_pandas()
    assert hit["doc_id"].tolist() == [1]
    clean = decontaminate(ds, grams, n=4, keep="clean").to_pandas()
    assert sorted(clean["doc_id"]) == [2, 3]
    assert set(clean.columns) == {"doc_id", "text"}


def test_repetition_known_fractions(ray_session):
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a b",      # pairs: ab,ba,ab,ba,ab -> top2=3/5
                 "u v w x y z",      # all 2/3-grams unique
                 "q r"]})            # <3 tokens: excluded
    out = (ray.data.from_pandas(rows)
           .map_batches(RepetitionStage(), batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    assert out.loc[0, "top2_frac"] == pytest.approx(3 / 5)
    # 3-grams of doc 1: aba,bab,aba,bab -> 2 distinct of 4 -> dup=0.5
    assert out.loc[0, "dup3_frac"] == pytest.approx(0.5)
    assert out.loc[1, "top2_frac"] == pytest.approx(1 / 5)
    assert out.loc[1, "dup3_frac"] == 0.0
