"""URL extraction / normalization / safety validation (S7-adjacent) —
the reference's ``src/crawler/url.rs`` minus the fetcher: the part of
the crawler that is pure computation and therefore portable (URL
canonicalization is also a standard web-corpus dedup key at training
scale). Patterns and rules bit-for-bit:

- article id patterns ``/(?:mnews/)?article/(\\d{3})/(\\d{10,})`` and
  old-format ``oid=(\\d{3})&aid=(\\d{10,})`` (url.rs:36-39);
- ``normalize_url`` → ``https://n.news.naver.com/mnews/article/{oid}/{aid}``;
- ``extract_urls``: all href attributes → normalize → validate →
  dedupe → SORTED (url.rs:67-91);
- domain allow-list + SSRF checks (scheme, localhost, private/link-
  local IPv4 ranges, url.rs:264-420).

Ray shape: ``UrlStage`` is a stateless compiled-once ``map_batches``
UDF (html column in → normalized article-URL rows out, 1→N flat map).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

import pyarrow as pa

ARTICLE_RE = re.compile(r"/(?:mnews/)?article/(\d{3})/(\d{10,})")
OLD_FORMAT_RE = re.compile(r"oid=(\d{3})&aid=(\d{10,})")
HREF_RE = re.compile(r"""href=["']([^"']+)["']""")

ALLOWED_DOMAINS = frozenset([
    "n.news.naver.com",
    "news.naver.com",
    "m.news.naver.com",
    "entertain.naver.com",
    "sports.naver.com",
    "sports.news.naver.com",
])


def extract_ids(url: str) -> tuple[str, str] | None:
    """(oid, aid) from modern or old URL format; None if neither."""
    m = ARTICLE_RE.search(url)
    if m:
        return m.group(1), m.group(2)
    m = OLD_FORMAT_RE.search(url)
    if m:
        return m.group(1), m.group(2)
    return None


def normalize_url(url: str) -> str | None:
    """Any recognized article URL → the canonical desktop form."""
    ids = extract_ids(url)
    if ids is None:
        return None
    return f"https://n.news.naver.com/mnews/article/{ids[0]}/{ids[1]}"


def is_private_ip(host: str) -> bool:
    parts = host.split(".")
    if len(parts) != 4:
        return False
    try:
        octets = [int(p) for p in parts]
    except ValueError:
        return False
    if any(not 0 <= o <= 255 for o in octets):
        return False
    a, b = octets[0], octets[1]
    return (a == 10 or (a == 172 and 16 <= b <= 31)
            or (a == 192 and b == 168) or (a == 169 and b == 254))


def is_safe_url(url: str) -> bool:
    """SSRF prevention (url.rs:330-400): http(s) only, no localhost,
    no private/link-local IPv4."""
    try:
        parsed = urlparse(url)
    except ValueError:
        return False
    if parsed.scheme not in ("http", "https"):
        return False
    host = parsed.hostname
    if not host:
        return False
    if host in ("localhost", "127.0.0.1", "::1"):
        return False
    return not is_private_ip(host)


def is_allowed_domain(url: str) -> bool:
    try:
        host = urlparse(url).hostname
    except ValueError:
        return False
    return host in ALLOWED_DOMAINS


def is_valid_article_url(url: str) -> bool:
    return (extract_ids(url) is not None
            and is_allowed_domain(url) and is_safe_url(url))


def validate_url(url: str) -> str | None:
    """None if valid, else the error message (reference Result shape)."""
    try:
        parsed = urlparse(url)
        if not parsed.scheme:
            return f"Invalid URL format: {url}"
    except ValueError:
        return f"Invalid URL format: {url}"
    if not is_safe_url(url):
        return f"Unsafe URL (SSRF risk): {url}"
    if not is_allowed_domain(url):
        return f"Domain not allowed: {url}"
    return None


def to_absolute(url: str, base: str) -> str:
    if url.startswith(("http://", "https://")):
        return url
    try:
        return urljoin(base, url)
    except ValueError:
        return url


def extract_urls(html: str) -> list[str]:
    """All valid article URLs in an HTML page — normalized, deduped,
    sorted (deterministic, reference extract_urls)."""
    out = set()
    for m in HREF_RE.finditer(html or ""):
        normalized = normalize_url(m.group(1))
        if normalized and is_valid_article_url(normalized):
            out.add(normalized)
    return sorted(out)


class UrlStage:
    """map_batches UDF: (page_id, html) → (page_id, url, oid, aid)
    flat-mapped article-URL rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids: list[int] = []
        urls: list[str] = []
        oids: list[str] = []
        aids: list[str] = []
        for pid, html in zip(batch["page_id"].to_pylist(),
                             batch["html"].to_pylist()):
            for u in extract_urls(html):
                oid, aid = extract_ids(u)
                pids.append(pid)
                urls.append(u)
                oids.append(oid)
                aids.append(aid)
        return pa.table({"page_id": pa.array(pids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "oid": pa.array(oids, pa.string()),
                         "aid": pa.array(aids, pa.string())})


# ------------------------------------------------------------------ #
# NewsCategory + list/comment URL builders (src/models.rs:49-100,
# src/crawler/list.rs:315-390, src/crawler/comment.rs:636-660) — the
# pure string half of the fetch surface; the HTTP client itself stays
# out of this engine.
# ------------------------------------------------------------------ #

NEWS_CATEGORIES: dict[str, int] = {
    "politics": 100, "economy": 101, "society": 102,
    "culture": 103, "world": 104, "it": 105,
}
KOREAN_NAMES: dict[str, str] = {
    "politics": "정치", "economy": "경제", "society": "사회",
    "culture": "문화", "world": "세계", "it": "IT",
}


def category_from_section_id(sid: int) -> str | None:
    for name, v in NEWS_CATEGORIES.items():
        if v == sid:
            return name
    return None


def main_list_url(category: str, date: str, page: int) -> str:
    sid = NEWS_CATEGORIES[category]
    return (f"https://news.naver.com/main/list.naver?mode=LSD&mid=shm"
            f"&sid1={sid}&date={date}&page={page}")


def ranking_list_url(category: str, page: int) -> str:
    sid = NEWS_CATEGORIES[category]
    return (f"https://news.naver.com/main/ranking/popularDay.naver"
            f"?mid=etc&sid1={sid}&page={page}")


def section_latest_url(category: str) -> str:
    return f"https://news.naver.com/section/{NEWS_CATEGORIES[category]}"


def comment_api_url(oid: str, aid: str, page: int,
                    page_size: int = 100, sort: str = "new") -> str:
    """The comment-API URL the reference's CommentClient builds
    (comment.rs:636-660): objectId = news{oid},{aid}."""
    object_id = f"news{oid},{aid}"
    return ("https://apis.naver.com/commentBox/cbox/"
            "web_naver_list_jsonp.json"
            f"?ticket=news&templateId=default_it&pool=cbox5&lang=ko"
            f"&country=KR&objectId={object_id}&pageSize={page_size}"
            f"&page={page}&sort={sort}&_callback=_callback")
