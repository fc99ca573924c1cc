"""Comment JSONP reader (S8) — the reference's comment-API parse chain
(``src/crawler/comment.rs``) minus the HTTP fetcher (no network in this
engine; payloads arrive as a column):

- ``parse_jsonp``  — callback-wrapper extraction (comment.rs:20-55:
  ``^[A-Za-z_$][A-Za-z0-9_$]*\\s*\\(\\s*(.*)\\s*\\);?\\s*$``, bare-JSON
  passthrough, error otherwise);
- ``clean_comment_content`` — strip tags → decode HTML entities →
  collapse whitespace → trim (comment.rs:365-383);
- ``convert_comment``  — RawComment→Comment field mapping: ms-epoch
  timestamps, ``parent_comment_no > 0`` → parent id, ``deleted or not
  visible`` → is_deleted (comment.rs:312-347); ``convert_comments``
  drops invisible/deleted rows (comment.rs:349-356);
- ``build_comment_tree`` — replies attached to parents recursively,
  replies sorted by created_at, top level sorted best-first then
  likes-desc (comment.rs:397-448);
- ``comment_stats``  — the CommentStats block (comment.rs:585-610).

Ray shape: payload parsing + conversion is a stateless ``map_batches``
stage (compiled regexes at module load); per-article tree building and
statistics go through the bucketed exchange on article_id — one
article's comments land in one task, the same partitioning the page
fetches already have.
"""

from __future__ import annotations

import html
import json
import re

import pandas as pd
import pyarrow as pa

_JSONP_RE = re.compile(r"^[a-zA-Z_$][a-zA-Z0-9_$]*\s*\(\s*(.*)\s*\);?\s*$",
                       re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def parse_jsonp(jsonp: str) -> str:
    """JSONP → inner JSON string (reference parse_jsonp, comment.rs:39-55)."""
    trimmed = jsonp.strip()
    m = _JSONP_RE.match(trimmed)
    if m:
        return m.group(1)
    if trimmed.startswith("{") or trimmed.startswith("["):
        return trimmed
    raise ValueError("Invalid JSONP format: unable to extract JSON content")


def clean_comment_content(content: str) -> str:
    """Strip tags, decode entities, normalize whitespace, trim."""
    no_tags = _TAG_RE.sub("", content or "")
    decoded = html.unescape(no_tags)
    return _WS_RE.sub(" ", decoded).strip()


def convert_comment(raw: dict) -> dict:
    """RawComment dict → Comment dict (reference field mapping)."""
    reg = int(raw.get("reg_time", 0))
    mod = int(raw.get("mod_time", 0))
    parent_no = int(raw.get("parent_comment_no", 0))
    return {
        "id": str(raw.get("comment_no", "")),
        "parent_id": str(parent_no) if parent_no > 0 else None,
        "content": clean_comment_content(raw.get("contents", "")),
        "author": raw.get("user_name", ""),
        "author_id": raw.get("masked_user_id", ""),
        "created_at_ms": reg,
        "modified_at_ms": mod if mod > 0 and mod != reg else None,
        "likes": int(raw.get("sympathy_count", 0)),
        "dislikes": int(raw.get("antipathy_count", 0)),
        "reply_count": int(raw.get("reply_count", 0)),
        "is_best": bool(raw.get("best", False)),
        "is_deleted": bool(raw.get("deleted", False))
        or not bool(raw.get("visible", True)),
    }


def convert_comments(raw_comments: list[dict]) -> list[dict]:
    """Visible, non-deleted comments only (reference convert_comments)."""
    return [convert_comment(r) for r in raw_comments
            if r.get("visible", True) and not r.get("deleted", False)]


def build_comment_tree(comments: list[dict]) -> list[dict]:
    """Flat list → nested top-level list (reference build_comment_tree):
    replies under ``replies``, sorted by created_at; top level sorted
    best-first then likes-desc (both stable on input order for ties,
    like Rust's sort_by)."""
    top: list[dict] = []
    replies_map: dict[str, list[dict]] = {}
    seen_ids: set = set()
    for c in comments:
        # paged feeds overlap: the same comment_no can arrive twice —
        # first occurrence wins (fuzz-found; duplicates would appear
        # as repeated tree nodes)
        if c["id"] in seen_ids:
            continue
        seen_ids.add(c["id"])
        c = dict(c)
        c.setdefault("replies", [])
        if c.get("parent_id"):
            replies_map.setdefault(c["parent_id"], []).append(c)
        else:
            top.append(c)

    def attach(c: dict) -> None:
        kids = replies_map.pop(c["id"], None)
        if kids:
            for k in kids:
                attach(k)
            kids.sort(key=lambda x: x["created_at_ms"])
            c["replies"] = kids

    for c in top:
        attach(c)
    top.sort(key=lambda c: (not c["is_best"], -c["likes"]))
    return top


def comment_stats(comments: list[dict]) -> dict:
    """The CommentStats aggregate (comment.rs:585-610) over converted
    comments (post-filter)."""
    return {
        "after_filter": len(comments),
        "top_level": sum(1 for c in comments if not c.get("parent_id")),
        "replies": sum(1 for c in comments if c.get("parent_id")),
        "best": sum(1 for c in comments if c["is_best"]),
    }


class JsonpParseStage:
    """map_batches UDF: (article_id, payload) JSONP pages → flat visible
    comment rows (article_id, comment id/parent, cleaned content,
    author, likes, flags)."""

    COLS = {"article_id": pa.int64(), "comment_id": pa.string(),
            "parent_id": pa.string(), "content": pa.string(),
            "author": pa.string(), "created_at_ms": pa.int64(),
            "likes": pa.int64(), "dislikes": pa.int64(),
            "is_best": pa.bool_()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in self.COLS}
        for aid, payload in zip(batch["article_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            try:
                doc = json.loads(parse_jsonp(payload))
            except (ValueError, TypeError):
                # the reference treats a malformed page as a per-page Err
                # and skips it (never aborts the ingest) — mirror that:
                # one corrupt JSONP payload drops that page only
                continue
            if not doc.get("success", False):
                continue
            raw = doc.get("result", {}).get("commentList", [])
            for c in convert_comments(raw):
                out["article_id"].append(aid)
                out["comment_id"].append(c["id"])
                out["parent_id"].append(c["parent_id"] or "")
                out["content"].append(c["content"])
                out["author"].append(c["author"])
                out["created_at_ms"].append(c["created_at_ms"])
                out["likes"].append(c["likes"])
                out["dislikes"].append(c["dislikes"])
                out["is_best"].append(c["is_best"])
        return pa.table({k: pa.array(v, t)
                         for (k, t), v in zip(self.COLS.items(),
                                              out.values())})


def parse_comment_pages(ds):
    """Dataset[(article_id, payload)] → flat visible comment rows."""
    return ds.map_batches(JsonpParseStage(), batch_format="pyarrow")


def article_comment_stats(flat, *, num_buckets: int = 8):
    """Per-article comment statistics through the bucketed exchange:
    (article_id, n_comments, n_replies, n_best, sum_likes,
    content_chars)."""
    from baram_ray.util import grouped_agg

    def pre(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "article_id": b["article_id"],
            "one": pa.array([1] * b.num_rows, pa.int64()),
            "is_reply": pc.cast(pc.not_equal(b["parent_id"], ""),
                                pa.int64()),
            "is_best": pc.cast(b["is_best"], pa.int64()),
            "likes": b["likes"],
            "content_chars": pc.cast(pc.utf8_length(b["content"]),
                                     pa.int64()),
        })

    return grouped_agg(flat.map_batches(pre, batch_format="pyarrow"),
                       ["article_id"],
                       {"n_comments": ("one", "sum"),
                        "n_replies": ("is_reply", "sum"),
                        "n_best": ("is_best", "sum"),
                        "sum_likes": ("likes", "sum"),
                        "content_chars": ("content_chars", "sum")},
                       num_buckets=num_buckets)
