"""Article HTML parser (M2/M13 proper) — the reference's
``src/parser/mod.rs`` extraction chain + multi-format date coercion,
without a CSS engine: the selector sets it actually uses
(``src/parser/selectors.rs`` GENERAL_*) are id/class lookups, matched
here by a small compiled-regex element finder (first match wins, same
fallback order).

- title:  ``#title_area span`` → ``.media_end_head_title`` →
  ``h2.media_end_head_headline`` (text, trimmed)
- body:   ``#dic_area`` → ``#articleBodyContents`` (text, trimmed)
- author: ``.byline`` → ``.journalist_name`` → ``span.byline_s``
- date:   ``.media_end_head_info_datestamp_time`` (the ``datetime``
  ATTRIBUTE first, text fallback — mod.rs:185-199)
- ``parse_date_string``: RFC3339, Korean 오전/오후 12-hour, then the
  reference's strptime format list; naive formats assume KST (UTC+9)
  and convert to UTC (mod.rs:203-296)
- ``content_hash`` = sha256(title || body) hex (mod.rs:299-305)
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime, timedelta, timezone

import pyarrow as pa

_KST = timezone(timedelta(hours=9))

_TAG_RE = re.compile(r"<[^>]+>")


def _elem_re(tag: str, attr: str, value: str) -> re.Pattern:
    """Regex matching ``<tag ... attr="...value..." ...>inner</tag>``
    (non-greedy inner; good enough for the flat article markup these
    selectors target)."""
    t = tag or r"[a-zA-Z0-9]+"
    return re.compile(
        rf"<({t})\b[^>]*\b{attr}=[\"'][^\"']*\b{re.escape(value)}\b"
        rf"[^\"']*[\"'][^>]*>(.*?)</\1>",
        re.DOTALL | re.IGNORECASE)


def _inner_text(html_fragment: str) -> str:
    import html as _html
    return _html.unescape(_TAG_RE.sub("", html_fragment)).strip()


# selector chains, in the reference's fallback order
_TITLE_CHAIN = [_elem_re("", "id", "title_area"),
                _elem_re("", "class", "media_end_head_title"),
                _elem_re("h2", "class", "media_end_head_headline")]
_BODY_CHAIN = [_elem_re("", "id", "dic_area"),
               _elem_re("", "id", "articleBodyContents")]
_AUTHOR_CHAIN = [_elem_re("", "class", "byline"),
                 _elem_re("", "class", "journalist_name"),
                 _elem_re("span", "class", "byline_s")]
_DATE_CHAIN = [_elem_re("", "class",
                        "media_end_head_info_datestamp_time"),
               _elem_re("", "class", "_ARTICLE_DATE_TIME")]

_DATETIME_ATTR_RE = re.compile(r"datetime=[\"']([^\"']+)[\"']",
                               re.IGNORECASE)
_KOREAN_DT_RE = re.compile(
    r"(\d{4})[.-](\d{1,2})[.-](\d{1,2})[.]?\s*(오전|오후)\s*"
    r"(\d{1,2}):(\d{2})")

_FORMATS = ["%Y-%m-%d %H:%M:%S", "%Y.%m.%d %H:%M", "%Y.%m.%d. %H:%M",
            "%Y-%m-%d %H:%M", "%Y/%m/%d %H:%M:%S", "%Y/%m/%d %H:%M",
            "%Y년 %m월 %d일 %H:%M"]


def parse_date_string(date_str: str) -> datetime | None:
    """The reference's date coercion chain → aware UTC datetime."""
    s = (date_str or "").strip()
    if not s:
        return None
    # RFC3339 / ISO-8601 with offset
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is not None:
            return dt.astimezone(timezone.utc)
    except ValueError:
        pass
    m = _KOREAN_DT_RE.search(s)
    if m:
        year, month, day = int(m.group(1)), int(m.group(2)), int(m.group(3))
        ampm, hour, minute = m.group(4), int(m.group(5)), int(m.group(6))
        if ampm == "오전":
            hour = 0 if hour == 12 else hour
        else:
            hour = 12 if hour == 12 else hour + 12
        try:
            return datetime(year, month, day, hour, minute,
                            tzinfo=_KST).astimezone(timezone.utc)
        except ValueError:
            return None
    for fmt in _FORMATS:
        try:
            return datetime.strptime(s, fmt).replace(
                tzinfo=_KST).astimezone(timezone.utc)
        except ValueError:
            continue
    return None


def _first(chains: list[re.Pattern], html: str) -> re.Match | None:
    for pat in chains:
        m = pat.search(html)
        if m:
            return m
    return None


def content_hash(title: str, body: str) -> str:
    h = hashlib.sha256()
    h.update(title.encode())
    h.update(body.encode())
    return h.hexdigest()


def parse_article(url: str, html: str) -> dict | None:
    """HTML → article dict (None when title or body is missing — the
    reference's hard errors)."""
    tm = _first(_TITLE_CHAIN, html)
    bm = _first(_BODY_CHAIN, html)
    if tm is None or bm is None:
        return None
    title = _inner_text(tm.group(2))
    body = _inner_text(bm.group(2))
    am = _first(_AUTHOR_CHAIN, html)
    author = _inner_text(am.group(2)) if am else None
    published_at = None
    dm = _first(_DATE_CHAIN, html)
    if dm:
        attr = _DATETIME_ATTR_RE.search(dm.group(0))
        if attr:
            published_at = parse_date_string(attr.group(1))
        if published_at is None:
            published_at = parse_date_string(_inner_text(dm.group(2)))
    return {"url": url, "title": title, "body": body, "author": author,
            "published_at": published_at,
            "content_hash": content_hash(title, body)}


class ArticleParseStage:
    """map_batches UDF: (url, html) → parsed article rows (rows whose
    title/body are missing are dropped, like the reference's Err)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"url": [], "title": [], "body": [],
                                "author": [], "published_at": [],
                                "content_hash": []}
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            doc = parse_article(url, html or "")
            if doc is None:
                continue
            for k in out:
                v = doc[k]
                if k == "published_at" and v is not None:
                    v = v.replace(tzinfo=None)    # store naive UTC
                out[k].append(v)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "body": pa.array(out["body"], pa.string()),
            "author": pa.array(out["author"], pa.string()),
            "published_at": pa.array(out["published_at"],
                                     pa.timestamp("us")),
            "content_hash": pa.array(out["content_hash"], pa.string()),
        })
