"""Tokenizer unit tests — analyzer semantics generalized from the reference
nori config (src/embedding/mod.rs:247-276) + sanitize (src/parser/sanitize.rs)."""

from baram_ray.tokenizer import term_counts, tokenize


def test_empty_and_whitespace():
    assert tokenize("") == []
    assert tokenize("   \n\t ") == []


def test_lowercase_and_punct_discard():
    assert tokenize("Hello, World!") == ["hello", "world"]


def test_snake_case_mixed_decompound():
    # compound + parts (nori decompound_mode: mixed)
    assert tokenize("snake_case_name") == ["snake_case_name", "snake", "case", "name"]


def test_camel_case():
    assert tokenize("camelCaseName") == ["camelcasename", "camel", "case", "name"]


def test_acronym_boundary():
    assert tokenize("HTTPServer") == ["httpserver", "http", "server"]


def test_letter_digit_boundary():
    assert tokenize("utf8Decode") == ["utf8decode", "utf", "8", "decode"]
    assert tokenize("base64") == ["base64", "base", "64"]


def test_dotted_name_splits_on_punct():
    assert tokenize("pkg.mod.Class") == ["pkg", "mod", "class"]


def test_plain_word_no_decompound():
    assert tokenize("import") == ["import"]


def test_cjk_bigrams():
    assert tokenize("한국어") == ["한국", "국어"]
    assert tokenize("주") == ["주"]
    assert tokenize("한국어 주석") == ["한국", "국어", "주석"]


def test_cjk_mixed_with_ascii():
    assert tokenize("test 검색엔진 code") == ["test", "검색", "색엔", "엔진", "code"]


def test_zero_width_stripped():
    assert tokenize("a​b") == ["ab"]
    assert tokenize("﻿hello") == ["hello"]


def test_determinism():
    s = "def parse_batch(x): return HTTPClient(x).fetch_all() # 주석 テスト"
    assert tokenize(s) == tokenize(s)


def test_term_counts():
    tc = term_counts("a b a c a")
    assert tc["a"] == 3 and tc["b"] == 1 and tc["c"] == 1


def test_max_token_len_truncated():
    long = "x" * 500
    assert tokenize(long) == ["x" * 64]
