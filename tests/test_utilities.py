"""utils parity (reference src/utils/mod.rs + retry.rs own tests)."""

import pytest

from baram_ray.utilities import (RetryConfig, decode_euc_kr, extract_domain,
                                 format_bytes, normalize_whitespace,
                                 sanitize_filename, truncate_text,
                                 with_retry)


def test_normalize_whitespace():
    # mod.rs test_normalize_whitespace
    assert normalize_whitespace("  hello   world  ") == "hello world"
    assert normalize_whitespace("hello\n\nworld") == "hello world"


def test_sanitize_filename_and_truncate():
    assert sanitize_filename('a<b>c:d"e/f\\g|h?i*j') == "a_b_c_d_e_f_g_h_i_j"
    assert truncate_text("hello", 10) == "hello"
    assert truncate_text("hello world", 8) == "hello..."


def test_format_bytes():
    assert format_bytes(0) == "0 B"
    assert format_bytes(512) == "512.00 B"
    assert format_bytes(1024) == "1.00 KB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(5 * 1024 ** 3) == "5.00 GB"


def test_decode_euc_kr_and_domain():
    assert decode_euc_kr("한국어".encode("euc-kr")) == "한국어"
    with pytest.raises(ValueError):
        decode_euc_kr(b"\xff\xff\xff")
    assert extract_domain("https://news.naver.com/article/1") == \
        "news.naver.com"
    with pytest.raises(ValueError):
        extract_domain("not a url")


def test_calculate_delay():
    # retry.rs test_calculate_delay + test_max_delay_cap
    c = RetryConfig(base_delay_ms=1000, backoff_multiplier=2.0,
                    max_delay_ms=30_000)
    assert c.calculate_delay_ms(0) == 0
    assert c.calculate_delay_ms(1) == 1000
    assert c.calculate_delay_ms(2) == 2000
    assert c.calculate_delay_ms(3) == 4000
    assert c.calculate_delay_ms(10) == 30_000        # capped


def test_retry_success_after_failures():
    # retry.rs test_retry_success_after_failures
    calls, sleeps = [], []
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "data"
    out = with_retry(RetryConfig(max_retries=3), flaky,
                     sleep=sleeps.append)
    assert out == "data" and len(calls) == 3
    assert sleeps == [1.0, 2.0]                      # backoff applied


def test_retry_exhausted_and_predicate():
    # retry.rs test_retry_exhausted + test_retry_if_predicate
    def always_fail():
        raise RuntimeError("permanent")
    with pytest.raises(RuntimeError, match="permanent"):
        with_retry(RetryConfig(max_retries=2), always_fail,
                   sleep=lambda s: None)

    calls = []
    def fatal():
        calls.append(1)
        raise ValueError("do not retry me")
    with pytest.raises(ValueError):
        with_retry(RetryConfig(max_retries=5), fatal,
                   should_retry=lambda e: not isinstance(e, ValueError),
                   sleep=lambda s: None)
    assert len(calls) == 1                           # no retry on fatal


def test_error_taxonomy():
    """reference error.rs surface: is_recoverable + localized_desc,
    builtin-subclass compatibility."""
    from baram_ray import i18n
    from baram_ray.errors import (DecodeFailed, IndexNotFound,
                                  LlmParseFailed, UnknownFilterColumn)
    e = IndexNotFound("/no/such/index")
    assert isinstance(e, FileNotFoundError) and not e.is_recoverable()
    assert e.localized_desc() == "Index not found: /no/such/index"
    i18n.set_locale("ko")
    try:
        assert e.localized_desc() == "인덱스를 찾을 수 없습니다: /no/such/index"
        assert UnknownFilterColumn("published").localized_desc() == \
            "알 수 없는 필터 컬럼: published"
    finally:
        i18n.set_locale("en")
    assert isinstance(UnknownFilterColumn("c"), KeyError)
    assert isinstance(DecodeFailed("x"), ValueError)
    assert LlmParseFailed("bad json").is_recoverable()
    with pytest.raises(ValueError):
        decode_euc_kr(b"\xff\xff\xff")          # DecodeFailed IS ValueError


def test_unknown_filter_column_raised(ray_session, tmp_path):
    import shutil
    from baram_ray.errors import UnknownFilterColumn
    from baram_ray.index.build import IndexConfig, build_index
    from baram_ray.query.engine import QueryEngine
    out = str(tmp_path / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index("/root/testdata/sf0.001/documents.parquet", out,
                IndexConfig(fields=("text",), id_cols=(), keep=("lang",)),
                resume=False)
    eng = QueryEngine(out)
    with pytest.raises(UnknownFilterColumn):
        eng.search("data", k=5, filters={"nope": "x"})
    with pytest.raises(KeyError):               # old contract still holds
        eng.search("data", k=5, filters={"nope": "x"})
