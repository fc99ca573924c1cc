"""LLM Said-relation extraction (reference src/llm/mod.rs): config/env
surface, prompt construction, JSON extraction + repair, the three-level
batch fallback parse, and the actor-pool pipeline."""

import json

import pandas as pd
import pytest

from baram_ray.llm import (ArticleInfo, FakeSaidLlm, LlmBackend, LlmClient,
                           LlmConfig, SaidExtractStage, SaidRelation)


def test_config_default():
    # mod.rs:740-746
    c = LlmConfig()
    assert c.endpoint == "http://localhost:8002"
    assert c.model == "qwen2.5"
    assert c.backend == LlmBackend.VLLM
    assert (c.timeout_secs, c.max_tokens, c.temperature,
            c.max_retries, c.retry_delay_ms) == (120, 1024, 0.1, 3, 1000)


def test_backend_from_str():
    # mod.rs:748-752
    assert LlmBackend.from_str("ollama") == LlmBackend.OLLAMA
    assert LlmBackend.from_str("vllm") == LlmBackend.VLLM
    assert LlmBackend.from_str("openai") == LlmBackend.VLLM


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("LLM_BACKEND", "ollama")
    monkeypatch.setenv("LLM_MAX_TOKENS", "256")
    monkeypatch.setenv("LLM_TEMPERATURE", "bad")     # falls back
    c = LlmConfig.from_env()
    assert c.backend == LlmBackend.OLLAMA
    assert c.endpoint == "http://localhost:11434"    # ollama default
    assert c.model == "qwen2.5:7b"
    assert c.max_tokens == 256 and c.temperature == 0.1


def test_generate_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        LlmClient().generate("hi")


def test_extract_json_from_code_block():
    # mod.rs:755-766
    client = LlmClient()
    text = ('Here is the result:\n```json\n{"relations": [{"speaker": '
            '"홍길동", "content": "테스트", "confidence": 0.9, "evidence": '
            '"홍길동 의원은 테스트라고 말했다."}]}\n```\n')
    assert "홍길동" in client.extract_json(text)


def test_parse_said_response():
    # mod.rs:768-776
    client = LlmClient()
    js = ('{"relations": [{"speaker": "김철수", "content": "경제가 회복되고 '
          '있다", "confidence": 0.9, "evidence": "김철수 장관은 경제가 '
          '회복되고 있다고 밝혔다."}]}')
    rels = client.parse_said_response(js)
    assert len(rels) == 1 and rels[0].speaker == "김철수"
    # bare-array fallback
    rels = client.parse_said_response(
        '[{"speaker": "a", "content": "b", "confidence": 0.7}]')
    assert rels == [SaidRelation("a", "b", 0.7, "")]
    # garbage → []
    assert client.parse_said_response("no json here at all") == []


def test_manual_relation_extraction_repair():
    """Malformed JSON (trailing comma) falls through fix_json to the
    regex block parser (mod.rs:676-727): defaults confidence to 0.8,
    drops blocks missing speaker/content, unescapes quotes."""
    client = LlmClient()
    bad = ('{"relations": [{"speaker": "박민수", "content": "회의가 '
           '연기되었다", "evidence": "원문",}, {"content": "버려질 '
           '블록"}]}')
    rels = client.parse_said_response(bad)
    assert len(rels) == 1
    assert rels[0].speaker == "박민수"
    assert rels[0].content == "회의가 연기되었다"
    assert rels[0].confidence == 0.8 and rels[0].evidence == "원문"


def test_batch_prompt_truncation_and_format():
    client = LlmClient()
    arts = [ArticleInfo("a1", "제목1", "x" * 1500),
            ArticleInfo("a2", "제목2", "short")]
    p = client.build_batch_prompt(arts)
    assert "### [기사 1] ID: a1" in p and "### [기사 2] ID: a2" in p
    assert "x" * 1000 + "..." in p and "x" * 1001 not in p
    assert "article_id를 반드시 포함하세요" in p


def test_parse_batch_three_levels():
    client = LlmClient()
    arts = [ArticleInfo("a1", "t", "c"), ArticleInfo("a2", "t", "c")]
    # level 1: typed array — unnamed articles keep their empty default
    r = client.parse_batch_response(
        '[{"article_id": "a1", "relations": [{"speaker": "s", '
        '"content": "c"}]}]', arts)
    assert r["a1"][0].speaker == "s" and r["a2"] == []
    # level 2: alternate envelope key
    r = client.parse_batch_response(
        '{"results": [{"article_id": "a2", "relations": '
        '[{"speaker": "s2", "content": "c2", "confidence": 0.95}]}]}',
        arts)
    assert r["a2"][0].confidence == 0.95 and r["a1"] == []
    # level 3: manual per-block parse of malformed output
    r = client.parse_batch_response(
        'broken "article_id": "a1" stuff {"speaker": "s3", '
        '"content": "c3"} trailing', arts)
    assert r["a1"][0].speaker == "s3"


def test_fake_llm_roundtrip_deterministic():
    client = LlmClient(generate_fn=FakeSaidLlm())
    arts = [ArticleInfo("7", "doc 7", "alpha beta gamma delta epsilon zeta"),
            ArticleInfo("8", "doc 8", "")]
    r1 = client.extract_said_batch(arts)
    r2 = client.extract_said_batch(arts)
    assert r1 == r2
    assert r1["7"][0].speaker == "기자_7"
    assert r1["7"][0].content == "alpha beta gamma delta epsilon"
    assert r1["8"] == []
    single = client.extract_said_relations("one two three four five six")
    assert single[0].content == "one two three four five"


def test_said_pipeline(ray_session):
    from baram_ray.pipelines.knowledge import text_said_relations
    out = text_said_relations("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"doc_id", "speaker", "content",
                                "confidence", "evidence"}
    assert len(out) > 0 and out["confidence"].between(0, 1).all()
    assert out["doc_id"].dtype == "int64"
