"""clean_corpus composition invariants (baram_ray/pipelines/clean.py):
the end-to-end training-data prep chain."""

import hashlib

import pandas as pd
import pytest

import ray

from baram_ray.pipelines.clean import clean_corpus, clean_corpus_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def survivors(ray_session):
    return clean_corpus(SF).to_pandas()


def test_survivors_subset_and_schema(survivors):
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert 0 < len(survivors) < len(src)
    assert set(survivors.columns) == {"doc_id", "lang", "source",
                                      "quality", "split", "shuffle_key"} \
        or set(survivors.columns) == {"doc_id", "lang", "source",
                                      "quality", "split"}
    assert set(survivors["doc_id"]) <= set(src["doc_id"])
    assert survivors["doc_id"].is_unique


def test_no_duplicate_content_among_survivors(survivors, ray_session):
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    from baram_ray.stages.text import sanitize_text, strip_html_tags
    text_of = dict(zip(src["doc_id"], src["text"]))
    shas = [hashlib.sha256(
                sanitize_text(strip_html_tags(text_of[d] or "")).encode()
            ).hexdigest() for d in survivors["doc_id"]]
    assert len(shas) == len(set(shas))


def test_no_contaminated_survivors(survivors, ray_session):
    from baram_ray.pipelines.training import doc_decontam
    contaminated = set(doc_decontam(SF)["doc_id"])  # pandas result
    # contaminated docs whose sanitized text differs may legitimately
    # survive; on this clean corpus sanitize is identity, so none may
    assert not (set(survivors["doc_id"]) & contaminated)


def test_quality_and_split(survivors):
    assert (survivors["quality"] >= 0.25).all()
    assert set(survivors["split"]) <= {"train", "val", "test"}
    frac = survivors["split"].value_counts(normalize=True)
    assert frac.get("train", 0) > 0.6


def test_deterministic(ray_session, survivors):
    again = clean_corpus(SF).to_pandas()
    a = survivors.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_stats_query(ray_session):
    g = clean_corpus_stats(SF)
    assert list(g.columns) == ["split", "n", "mean_quality"]
    assert g["n"].sum() > 0


def test_lm_filter_composes(ray_session):
    """lm_max_ppl: a huge threshold keeps the survivor set identical; a
    tight one yields a strict subset (the CCNet-style LM filter slots
    into the chain as one more semi-join)."""
    from baram_ray.pipelines.clean import clean_corpus
    sf = "/root/testdata/sf0.001"
    base = set(clean_corpus(sf).to_pandas()["doc_id"])
    loose = set(clean_corpus(sf, lm_max_ppl=1e9).to_pandas()["doc_id"])
    assert loose == base
    tight = set(clean_corpus(sf, lm_max_ppl=29.9).to_pandas()["doc_id"])
    assert tight < base
