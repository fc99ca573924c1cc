"""Analyzer chains (analysis.py): the Porter stemmer against the
published rule-set examples (Porter 1980), stopword filtering, chain
composition purity, and the stemmed-index retrieval semantics
(inflection conflation, BM25 over transformed doc lengths)."""

import numpy as np
import pandas as pd
import pytest

from baram_ray.analysis import (STOPWORDS, analyze_chain, porter_stem,
                                remove_stopwords_text, stem_text)

# examples straight from the published algorithm description
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_published_vectors():
    bad = {w: (porter_stem(w), e) for w, e in PORTER_VECTORS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_idempotent_on_short_words():
    for w in ("a", "is", "be", "ox"):
        assert porter_stem(w) == w


def test_stem_text_preserves_structure():
    assert stem_text("Queries over tables, merged daily!") == \
        "queri over tabl, merg daili!"
    assert stem_text("") == ""
    assert stem_text("123 456") == "123 456"   # digits pass through


def test_stopword_filter():
    assert remove_stopwords_text("the fast query on a table is big") \
        == "fast query table big"
    assert "the" in STOPWORDS and "query" not in STOPWORDS


def test_chain_composition_and_unknown_filter():
    assert analyze_chain("The Queries", ("stop", "porter")) == "queri"
    assert analyze_chain("the", ("stop",)) == ""
    with pytest.raises(ValueError, match="unknown analysis filter"):
        analyze_chain("x", ("bogus",))


def test_stemmed_index_retrieval(ray_session, tmp_path):
    """Inflected queries hit base-form docs through the stemmed
    index; stopwords never match; unstemed index does neither."""
    import shutil

    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine

    docs = pd.DataFrame({
        "doc_id": np.arange(6),
        "text": ["the query runs fast", "many queries run",
                 "a table of values", "tables and rows",
                 "merge sort", "merged results"],
    })
    src = str(tmp_path / "docs.parquet")
    docs.to_parquet(src, index=False)

    def build(filters):
        from baram_ray.analysis import analyze_chain as ch
        d2 = docs.copy()
        d2["text"] = [ch(t, filters) for t in d2["text"]]
        p = str(tmp_path / ("src_" + "_".join(filters) + ".parquet"))
        d2.to_parquet(p, index=False)
        out = str(tmp_path / ("idx_" + "_".join(filters)))
        shutil.rmtree(out, ignore_errors=True)
        build_index(p, out, IndexConfig(fields=("text",), id_cols=(),
                                        keep=()), resume=False)
        return QueryEngine(out)

    plain = build(())
    stemmed = build(("stop", "porter"))

    q = analyze_chain("queries", ("stop", "porter"))
    assert {d for d, _ in stemmed.search(q, k=10)} == {0, 1}
    assert {d for d, _ in plain.search("queries", k=10)} == {1}
    q = analyze_chain("merged", ("stop", "porter"))
    assert {d for d, _ in stemmed.search(q, k=10)} == {4, 5}
    # stop-filtered query text analyzes to nothing
    assert analyze_chain("the", ("stop", "porter")) == ""
