"""URL extractor/validators — the reference's own unit cases ported
(src/crawler/url.rs:442-545) + the batch stage."""

import pyarrow as pa

from baram_ray.urls import (UrlStage, extract_ids, extract_urls,
                            is_safe_url, is_valid_article_url,
                            normalize_url, to_absolute, validate_url)


def test_extract_ids_new_format():
    assert extract_ids(
        "https://n.news.naver.com/mnews/article/001/0014123456") \
        == ("001", "0014123456")


def test_extract_ids_old_format():
    assert extract_ids(
        "https://news.naver.com/main/read.naver?oid=001&aid=0014123456") \
        == ("001", "0014123456")


def test_extract_ids_no_mnews_prefix():
    assert extract_ids("https://n.news.naver.com/article/001/0014123456") \
        == ("001", "0014123456")


def test_extract_ids_invalid():
    assert extract_ids("https://google.com/search") is None


def test_normalize_url():
    n = normalize_url("https://m.news.naver.com/article/001/0014123456")
    assert n.startswith("https://n.news.naver.com")
    assert "/mnews/article/001/0014123456" in n
    assert normalize_url(
        "https://news.naver.com/main/read.naver?oid=001&aid=0014123456") \
        == "https://n.news.naver.com/mnews/article/001/0014123456"
    assert normalize_url("https://google.com/search") is None


def test_is_valid_article_url():
    assert is_valid_article_url(
        "https://n.news.naver.com/mnews/article/001/0014123456")
    assert not is_valid_article_url("https://google.com/search")
    assert is_valid_article_url(
        "https://news.naver.com/main/read.naver?oid=001&aid=0014123456")
    assert is_valid_article_url(
        "https://sports.naver.com/article/001/0014123456")


def test_ssrf_prevention():
    assert not is_safe_url("http://127.0.0.1/admin")
    assert not is_safe_url("http://localhost/secret")
    assert not is_safe_url("http://192.168.1.1/")
    assert not is_safe_url("http://10.0.0.1/")
    assert not is_safe_url("file:///etc/passwd")
    assert not is_safe_url("http://169.254.1.1/")
    assert not is_safe_url("http://172.16.0.1/")
    assert is_safe_url("https://n.news.naver.com/article/001/123")


def test_validate_url():
    assert validate_url(
        "https://n.news.naver.com/mnews/article/001/0014123456") is None
    assert "SSRF" in validate_url("http://localhost/admin")


def test_to_absolute():
    assert to_absolute("/mnews/article/001/0014123456",
                       "https://n.news.naver.com") \
        == "https://n.news.naver.com/mnews/article/001/0014123456"
    assert to_absolute("https://x.com/a", "https://y.com") == "https://x.com/a"


def test_extract_urls_dedup_sorted():
    html = ('<a href="https://m.news.naver.com/article/001/0014123456">m</a>'
            '<a href="/mnews/article/001/0014123456">rel dup</a>'
            '<a href="https://n.news.naver.com/mnews/article/002/0014999999">b</a>'
            '<a href="https://google.com/x">no</a>')
    urls = extract_urls(html)
    assert urls == [
        "https://n.news.naver.com/mnews/article/001/0014123456",
        "https://n.news.naver.com/mnews/article/002/0014999999"]


def test_url_stage_batch():
    batch = pa.table({
        "page_id": pa.array([1], pa.int64()),
        "html": pa.array(['<a href="https://n.news.naver.com/mnews/'
                          'article/001/0014123456">x</a>'], pa.string())})
    out = UrlStage()(batch).to_pydict()
    assert out["oid"] == ["001"] and out["aid"] == ["0014123456"]


def test_list_url_builders():
    from baram_ray.urls import (comment_api_url, main_list_url,
                                ranking_list_url, section_latest_url)
    u = main_list_url("politics", "20241215", 1)
    assert "sid1=100" in u and "date=20241215" in u and "page=1" in u
    assert "sid1=105" in ranking_list_url("it", 1)
    assert "popularDay" in ranking_list_url("it", 1)
    assert section_latest_url("society") == \
        "https://news.naver.com/section/102"
    cu = comment_api_url("001", "0014123456", 2)
    assert "objectId=news001,0014123456" in cu
    assert "page=2" in cu and "_callback=_callback" in cu


def test_category_mapping():
    from baram_ray.urls import NEWS_CATEGORIES, category_from_section_id
    assert NEWS_CATEGORIES["politics"] == 100
    assert category_from_section_id(105) == "it"
    assert category_from_section_id(999) is None
