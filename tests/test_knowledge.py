"""Ontology (M10/M17/S10/G3) + event clustering (S9) tests — the slug /
turtle / ntriples expectations mirror the reference's own unit tests
(src/ontology/extractor.rs:2452-2553)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray import clustering, ontology

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# slug / escaping (M17) — reference test_slug_generation
# ------------------------------------------------------------------ #

def test_slug():
    assert ontology.slug("Hello World") == "hello_world"
    assert ontology.slug("test-value_123") == "test-value_123"
    assert ontology.slug("a.b/c") == "a_b_c"


def test_turtle_escape():
    assert ontology.turtle_escape("https://x.y/z") == "<https://x.y/z>"
    assert ontology.turtle_escape("baram:entity/1/x") == "<baram:entity/1/x>"
    assert ontology.turtle_escape('plain "quoted" \\ text') \
        == '"plain \\"quoted\\" \\\\ text"'


def test_triple_formats():
    s, p, o = "baram:entity/7/spark", "baram:rel/applies", "baram:entity/7/join"
    assert ontology.triple_to_ntriples(s, p, o) == f"<{s}> <{p}> <{o}> ."
    assert ontology.triple_to_turtle(s, p, o) == f"<{s}> <{p}> <{o}> ."
    df = pd.DataFrame({"doc_id": [7], "subject": ["spark"],
                       "predicate": ["applies"], "object": ["join"]})
    t = ontology.triples_from_relations(df)
    assert t["subject_id"][0] == "baram:entity/7/spark"
    ttl = ontology.to_turtle(t)
    assert ttl.startswith("@prefix schema:")
    assert "<baram:entity/7/spark> <baram:rel/applies>" in ttl
    nt = ontology.to_ntriples(t)
    assert nt == "<baram:entity/7/spark> <baram:rel/applies> " \
                 "<baram:entity/7/join> ."


# ------------------------------------------------------------------ #
# relation extraction (M10)
# ------------------------------------------------------------------ #

def test_extract_relations_semantics():
    rels = ontology.extract_relations("the spark join runs fast")
    assert [(r["subject"], r["predicate"], r["object"]) for r in rels] \
        == [("spark", "applies", "join")]
    assert rels[0]["verified"] is True
    assert rels[0]["confidence"] == 0.8
    # reverse direction = feeds
    rels = ontology.extract_relations("filter stream output")
    assert [(r["subject"], r["predicate"], r["object"]) for r in rels] \
        == [("filter", "feeds", "stream")]
    # sentence boundary blocks a cross-sentence pair
    assert ontology.extract_relations("spark. join") == []
    # non-overlapping scan, both patterns scan independently
    rels = ontology.extract_relations("spark join spark")
    keys = {(r["subject"], r["predicate"], r["object"]) for r in rels}
    assert keys == {("spark", "applies", "join"),
                    ("join", "feeds", "spark")}


def test_rdf_writer_roundtrip(ray_session, tmp_path):
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "spark join and vector sort here"},
        {"doc_id": 2, "text": "merge stream pipeline"},
    ])
    rel = docs.map_batches(ontology.relations_stage, batch_format="pyarrow")
    man = ontology.write_rdf(rel, str(tmp_path), fmt="nt").to_pandas()
    assert man["n_triples"].sum() == 3
    lines = []
    for p in man["path"]:
        with open(p) as f:
            lines.extend(l for l in f.read().splitlines() if l)
    assert "<baram:entity/1/spark> <baram:rel/applies> " \
           "<baram:entity/1/join> ." in lines
    assert "<baram:entity/2/merge> <baram:rel/feeds> " \
           "<baram:entity/2/stream> ." in lines


# ------------------------------------------------------------------ #
# event clustering (S9 + reference greedy algorithm)
# ------------------------------------------------------------------ #

def _reference_greedy(vecs, threshold):
    """Pure-python transcription of cluster_articles (engine.rs:287-336)."""
    clusters = []                     # (centroid, [indices])
    for i, v in enumerate(vecs):
        best, best_sim = None, -np.inf
        for ci, (c, _) in enumerate(clusters):
            den = (np.linalg.norm(c) * np.linalg.norm(v)) or 1.0
            s = float(c @ v / den)
            if s > best_sim:
                best, best_sim = ci, s
        if best is not None and best_sim >= threshold:
            c, idxs = clusters[best]
            n = len(idxs)
            clusters[best] = ((c * n + v) / (n + 1), idxs + [i])
        else:
            clusters.append((v.copy(), [i]))
    return clusters


def test_greedy_cluster_matches_reference():
    rng = np.random.RandomState(5)
    base = rng.randn(4, 16)
    vecs = np.concatenate([base[i % 4] + 0.05 * rng.randn(16)
                           for i in range(40)]).reshape(40, 16)
    labels = clustering.greedy_cluster(vecs, 0.8)
    ref = _reference_greedy(vecs, 0.8)
    ref_labels = np.empty(40, dtype=np.int64)
    for ci, (_, idxs) in enumerate(ref):
        for i in idxs:
            ref_labels[i] = ci
    assert np.array_equal(labels, ref_labels)


def test_cluster_events_single_block(ray_session):
    """One block ⇒ the pipeline IS the reference sequential algorithm."""
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"],
                               override_num_blocks=1)
    out = clustering.cluster_events(ds, threshold=0.55)
    t = ds.take_all()
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in t])
    ref = _reference_greedy(vecs, 0.55)
    assert len(out) == len(ref)
    assert out["article_count"].sum() == len(vecs)
    # per-cluster sizes match (single block: local==global clusters,
    # merge is a no-op because every local centroid is its own cluster
    # only when below threshold; sizes are the invariant to check)
    assert sorted(out["article_count"]) == sorted(len(ix) for _, ix in ref)
    assert out["event_id"].iloc[0] == "evt_000"
    assert ((out["avg_similarity"] >= -1) & (out["avg_similarity"] <= 1)).all()


def test_cluster_json_writer(tmp_path):
    df = pd.DataFrame({
        "event_id": ["evt_000", "evt_001"], "cluster": [0, 1],
        "article_count": [3, 2], "category": ["a", "b"],
        "min_id": [1, 9], "max_id": [5, 11],
        "avg_similarity": [0.9, 0.8]})
    paths = clustering.write_cluster_json(df, str(tmp_path))
    assert [os.path.basename(p) for p in paths] \
        == ["evt_000.json", "evt_001.json"]
    with open(paths[0]) as f:
        d = json.load(f)
    assert d["article_count"] == 3 and d["category"] == "a"


# ------------------------------------------------------------------ #
# M3: format-dispatch parsing with fallback
# ------------------------------------------------------------------ #

def test_format_detect_and_parse():
    from baram_ray.stages.text import detect_format, parse_with_fallback
    assert detect_format("plain old words here") == "plain"
    assert detect_format("<div>hi</div>") == "html"
    assert detect_format("# Title\nbody") == "markdown"
    assert detect_format('{"a": "b"}') == "json"

    t, f, ok = parse_with_fallback("<div>hello <b>world</b></div>")
    assert (t, f, ok) == ("hello world", "html", True)
    t, f, ok = parse_with_fallback("# Head\nsome *bold* text")
    assert f == "markdown" and ok and "Head" in t and "bold" in t \
        and "*" not in t and "#" not in t
    t, f, ok = parse_with_fallback('{"k": {"x": "alpha"}, "l": ["beta"]}')
    assert (t, f, ok) == ("alpha beta", "json", True)
    t, f, ok = parse_with_fallback("just words")
    assert (f, ok) == ("plain", True) and t == "just words"


def test_format_fallback_chain_and_deleted():
    from baram_ray.stages.text import parse_with_fallback
    # looks like json (starts with '{') but is invalid → falls back to
    # plain via the chain
    t, f, ok = parse_with_fallback("{not valid json but words")
    assert ok and f == "plain" and "words" in t
    # deleted marker fails fast (reference is_deleted_article)
    t, f, ok = parse_with_fallback("page says: article not found")
    assert (t, f, ok) == ("", "deleted", False)
    # nothing parseable
    t, f, ok = parse_with_fallback("   ")
    assert ok is False and f == "unknown"


# ------------------------------------------------------------------ #
# S3: markdown article sink (reference markdown.rs + article.hbs)
# ------------------------------------------------------------------ #

def test_markdown_sink(ray_session, tmp_path):
    from baram_ray.sinks import render_template, write_markdown
    # template semantics: substitution, no escaping, unknown -> empty
    out = render_template("# {{title}}\n{{content}} {{missing}}!",
                          {"title": "T&<b>", "content": "body"})
    assert out == "# T&<b>\nbody !"

    docs = ray.data.from_items([
        {"doc_id": 1, "lang": "en", "sha256": "aa", "text": "hello *md*"},
        {"doc_id": 2, "lang": "ko", "sha256": "bb", "text": "second"},
    ])
    man = write_markdown(docs, str(tmp_path)).to_pandas()
    assert sorted(os.path.basename(p) for p in man["path"]) \
        == ["1.md", "2.md"]
    body = open(tmp_path / "1.md").read()
    assert body.startswith("---\ndoc_id: 1\n")     # YAML front-matter
    assert "hello *md*" in body and "sha256: aa" in body
    # custom template override (reference with_template)
    man2 = write_markdown(docs, str(tmp_path / "t2"),
                          template="{{doc_id}}: {{text}}").to_pandas()
    assert open(tmp_path / "t2" / "2.md").read() == "2: second"
    assert int(man2["n_bytes"].sum()) > 0


# ------------------------------------------------------------------ #
# Cluster summarization (reference src/clustering/summary.rs)
# ------------------------------------------------------------------ #

def test_extract_json_from_code_block():
    # reference test summary.rs:240-252
    from baram_ray.summarize import extract_json
    import json as _json
    text = ('Here is the result:\n```json\n'
            '{"title": "테스트 이벤트", "summary": "테스트 요약입니다."}\n'
            '```\n')
    js = extract_json(text)
    assert "테스트 이벤트" in js
    assert _json.loads(js)["title"] == "테스트 이벤트"


def test_extract_json_raw_and_fallback():
    # reference tests summary.rs:254-258, :275-281
    from baram_ray.summarize import extract_json, parse_summary_response
    raw = '{"title": "이벤트", "summary": "요약"}'
    assert extract_json(raw) == raw
    # plain ``` fence (no json tag)
    fenced = '```\n{"title": "a", "summary": "b"}\n```'
    assert extract_json(fenced) == '{"title": "a", "summary": "b"}'
    # non-JSON → fallback: empty title, trimmed raw text as summary
    t, s = parse_summary_response("  이것은 JSON이 아닌 텍스트입니다. ")
    assert t == "" and s == "이것은 JSON이 아닌 텍스트입니다."
    # missing keys → empty strings
    t, s = parse_summary_response('{"other": 1}')
    assert t == "" and s == ""


def test_build_summary_prompt_caps_and_overflow():
    from baram_ray.summarize import NO_DATE, build_summary_prompt
    arts = [{"category": "정치", "title": f"doc {i}",
             "published_at": None} for i in range(14)]
    p = build_summary_prompt(arts)
    assert "1. [정치] doc 0 (" + NO_DATE + ")" in p
    assert "10. [정치] doc 9" in p
    assert "11." not in p                        # capped at 10 listed
    assert "... 외 4개 기사" in p                 # overflow line
    assert '```json' in p and "20자" in p        # instruction block
    # no overflow line at exactly 10
    assert "외" not in build_summary_prompt(arts[:10]).split("## 규칙")[0][-30:]


def test_fake_client_roundtrip_deterministic():
    from baram_ray.summarize import (FakeLlmClient, build_summary_prompt,
                                     parse_summary_response)
    arts = [{"category": "경제", "title": "doc 1", "published_at": None}] * 3
    p = build_summary_prompt(arts)
    c = FakeLlmClient()
    r1, r2 = c.generate(p), c.generate(p)
    assert r1 == r2                              # pure function of prompt
    t, s = parse_summary_response(r1)
    assert t == "경제 이벤트" and len(t) <= 20
    assert "3건" in s


def test_real_llm_honestly_stubbed():
    import pytest as _pytest
    from baram_ray.summarize import RealLlmClient, SummarizeStage
    with _pytest.raises(NotImplementedError):
        RealLlmClient()
    with _pytest.raises(NotImplementedError):
        SummarizeStage(real_llm=True)


def test_summarize_stage_error_keeps_default_title():
    # reference summarize_all keep-default-on-failure (summary.rs:73-80)
    import pandas as pd
    from baram_ray.summarize import SummarizeStage

    class Boom:
        def generate(self, prompt):
            raise RuntimeError("llm down")

    st = SummarizeStage(client=Boom())
    out = st(pd.DataFrame({"event_id": ["evt_000"],
                           "articles_json": ['[{"category": "a"}]']}))
    assert out.loc[0, "title"] == "evt_000"      # default kept
    assert out.loc[0, "summary"] == "" and not out.loc[0, "ok"]


def test_cluster_summaries_pipeline(ray_session):
    from baram_ray.pipelines.knowledge import cluster_events, cluster_summaries
    sf = "/root/testdata/sf0.001"
    out = cluster_summaries(sf)
    clusters = cluster_events(sf)
    assert len(out) == len(clusters)             # one summary per cluster
    assert set(out.columns) == {"event_id", "title", "summary", "ok"}
    assert out["ok"].all()
    assert (out["title"].str.len() > 0).all()
    assert (out["title"].str.len() <= 20).all()  # rule 1 honored end-to-end
    # deterministic across runs
    out2 = cluster_summaries(sf)
    pd.testing.assert_frame_equal(out, out2)


def test_cluster_events_tree_merge_invariants(ray_session, monkeypatch):
    """Multi-level hierarchical merge (fan-in forced to 2 so ≥3 tree
    levels run): every vector assigned exactly once, deterministic,
    and the no-same-source-block rule holds at EVERY level — two
    members that sat in different local clusters of the same input
    block never share a final cluster."""
    monkeypatch.setattr(clustering, "_MERGE_FANIN", 2)
    rng = np.random.RandomState(11)
    base = rng.randn(6, 16)
    n = 160
    vecs = np.stack([base[i % 6] + 0.05 * rng.randn(16)
                     for i in range(n)])
    frames = [pd.DataFrame({
        "vec_id": np.arange(b * 20, b * 20 + 20, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs[b * 20:b * 20 + 20]],
        "label": [f"c{i % 3}" for i in range(20)],
    }) for b in range(8)]
    ds = ray.data.from_pandas(frames)
    out, members = clustering.cluster_events(ds, threshold=0.8,
                                             return_members=True)
    mem = members.to_pandas()
    assert len(mem) == n and mem["member_id"].is_unique
    assert out["article_count"].sum() == n
    # recompute each member's LOCAL cluster per input block; the rule:
    # same block + different local cluster => different final cluster
    final = dict(zip(mem["member_id"], mem["cluster"]))
    for b in range(8):
        block_vecs = vecs[b * 20:(b + 1) * 20]
        local = clustering.greedy_cluster(block_vecs, 0.8)
        ids = np.arange(b * 20, b * 20 + 20)
        for i in range(20):
            for j in range(i + 1, 20):
                if local[i] != local[j]:
                    assert final[ids[i]] != final[ids[j]], \
                        f"block {b}: locals {local[i]}/{local[j]} merged"
    # determinism
    out2, members2 = clustering.cluster_events(ds, threshold=0.8,
                                               return_members=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))
