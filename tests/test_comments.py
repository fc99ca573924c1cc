"""S8 comment JSONP reader — the reference's own unit cases ported
(src/crawler/comment.rs:1095-1270) plus pipeline-level checks."""

import pytest

from baram_ray.comments import (build_comment_tree, clean_comment_content,
                                comment_stats, convert_comment,
                                convert_comments, parse_jsonp)


def test_parse_jsonp_callback():
    assert parse_jsonp('_callback({"success": true, "code": "200"})') \
        == '{"success": true, "code": "200"}'


def test_parse_jsonp_jquery():
    assert parse_jsonp('jQuery123456({"data": "test"})') == '{"data": "test"}'


def test_parse_jsonp_with_semicolon():
    assert parse_jsonp('callback({"value": 1});') == '{"value": 1}'


def test_parse_jsonp_plain_json():
    assert parse_jsonp('{"already": "json"}') == '{"already": "json"}'


def test_parse_jsonp_invalid():
    with pytest.raises(ValueError):
        parse_jsonp("not valid jsonp or json")


def test_convert_comment_basic():
    c = convert_comment({
        "comment_no": 12345, "parent_comment_no": 0,
        "contents": "테스트 댓글입니다.", "user_name": "테스터",
        "masked_user_id": "test****", "reg_time": 1702684800000,
        "sympathy_count": 10, "antipathy_count": 2, "reply_count": 3,
        "visible": True,
    })
    assert c["id"] == "12345"
    assert c["parent_id"] is None
    assert c["content"] == "테스트 댓글입니다."
    assert c["author"] == "테스터"
    assert (c["likes"], c["dislikes"], c["reply_count"]) == (10, 2, 3)
    assert not c["is_deleted"]


def test_convert_comment_reply_and_deleted():
    r = convert_comment({"comment_no": 12346, "parent_comment_no": 12345,
                         "contents": "답글입니다.", "visible": True})
    assert r["parent_id"] == "12345"
    d = convert_comment({"comment_no": 12347, "deleted": True,
                         "visible": False})
    assert d["is_deleted"]
    # invisible-but-not-deleted is also deleted (reference OR rule)
    assert convert_comment({"comment_no": 1, "visible": False})["is_deleted"]


def test_convert_comments_filters():
    raws = [{"comment_no": 1, "visible": True},
            {"comment_no": 2, "visible": False},
            {"comment_no": 3, "visible": True, "deleted": True}]
    assert [c["id"] for c in convert_comments(raws)] == ["1"]


def test_clean_comment_content():
    assert clean_comment_content(
        "<b>굵은</b> 텍스트와 <a href='#'>링크</a>") == "굵은 텍스트와 링크"
    assert clean_comment_content(
        "안녕&amp;하세요 &lt;테스트&gt;") == "안녕&하세요 <테스트>"
    assert clean_comment_content(
        "여러   공백이    있는   텍스트") == "여러 공백이 있는 텍스트"


def _c(id, parent=None, likes=0, best=False, ts=0):
    return {"id": id, "parent_id": parent, "content": "", "author": "",
            "author_id": "", "created_at_ms": ts, "modified_at_ms": None,
            "likes": likes, "dislikes": 0, "reply_count": 0,
            "is_best": best, "is_deleted": False, "replies": []}


def test_build_comment_tree():
    tree = build_comment_tree([
        _c("1", likes=10), _c("2", parent="1", likes=5),
        _c("3", likes=20, best=True)])
    assert len(tree) == 2
    assert tree[0]["is_best"] and tree[0]["id"] == "3"
    assert tree[1]["id"] == "1"
    assert [r["id"] for r in tree[1]["replies"]] == ["2"]


def test_build_comment_tree_nested_and_sorted():
    tree = build_comment_tree([
        _c("1"), _c("2", parent="1", ts=20), _c("3", parent="1", ts=10),
        _c("4", parent="2", ts=5)])
    assert [r["id"] for r in tree[0]["replies"]] == ["3", "2"]  # by time
    assert tree[0]["replies"][1]["replies"][0]["id"] == "4"     # nested


def test_comment_stats():
    cs = convert_comments([
        {"comment_no": 1, "visible": True, "best": True},
        {"comment_no": 2, "parent_comment_no": 1, "visible": True},
        {"comment_no": 3, "visible": False}])
    s = comment_stats(cs)
    assert s == {"after_filter": 2, "top_level": 1, "replies": 1, "best": 1}


# ------------------------------------------------------------------ #
# property tests
# ------------------------------------------------------------------ #

from hypothesis import given, settings
from hypothesis import strategies as st

_raw = st.fixed_dictionaries({
    "comment_no": st.integers(1, 10**9),
    "parent_comment_no": st.integers(0, 10**6),
    "contents": st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=80),
    "user_name": st.text(max_size=10),
    "reg_time": st.integers(0, 2**41),
    "mod_time": st.just(0),
    "sympathy_count": st.integers(0, 10**6),
    "antipathy_count": st.integers(0, 10**6),
    "best": st.booleans(),
    "visible": st.booleans(),
    "deleted": st.booleans(),
})


@settings(max_examples=40, deadline=None)
@given(st.lists(_raw, max_size=12))
def test_jsonp_roundtrip_property(raws):
    """parse_jsonp(wrap(x)) then convert == convert(x) directly, for
    arbitrary unicode contents — the JSONP wrapper is lossless."""
    import json as _json
    payload = "_callback(" + _json.dumps(
        {"success": True, "result": {"commentList": raws}}) + ");"
    doc = _json.loads(parse_jsonp(payload))
    assert convert_comments(doc["result"]["commentList"]) \
        == convert_comments(raws)


@settings(max_examples=40, deadline=None)
@given(st.lists(_raw, max_size=16))
def test_tree_partition_property(raws):
    """Every converted comment lands in the tree exactly once (as top
    level or in some replies list), except replies whose parent id is
    absent — those are dropped by attach, like the reference's
    replies_map leftovers."""
    cs = convert_comments(raws)
    ids = {c["id"] for c in cs}
    tree = build_comment_tree(cs)

    seen = []

    def walk(nodes):
        for n in nodes:
            seen.append(n["id"])
            walk(n.get("replies", []))

    walk(tree)
    expected = [c["id"] for c in cs
                if not c["parent_id"] or _reachable(c, cs, ids)]
    assert set(seen) <= ids
    assert len(seen) == len(set(seen))          # no duplicates
    # all top-level comments always present
    top_ids = {c["id"] for c in cs if not c["parent_id"]}
    assert top_ids <= set(seen)


def _reachable(c, cs, ids):
    by_id = {x["id"]: x for x in cs}
    cur = c
    hops = 0
    while cur["parent_id"] is not None:
        if cur["parent_id"] not in by_id:
            return False
        cur = by_id[cur["parent_id"]]
        hops += 1
        if hops > len(cs):
            return False                         # cycle
    return True


def test_jsonp_stage_skips_malformed_pages():
    """ADVICE r2: a corrupt JSONP page is a per-page skip (reference
    treats it as a per-page Err), never an abort of the whole batch."""
    import pyarrow as pa

    from baram_ray.comments import JsonpParseStage

    good = ('_cb({"success": true, "result": {"commentList": ['
            '{"commentNo": "c1", "parentCommentNo": null, '
            '"contents": "hello", "userName": "u", "regTime": 1000, '
            '"sympathyCount": 1, "antipathyCount": 0, "best": false, '
            '"visible": true, "deleted": false}]}});')
    batch = pa.table({
        "article_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([good, "_cb({not json", ""], pa.string()),
    })
    out = JsonpParseStage()(batch)
    assert out.num_rows == 1
    assert out["article_id"].to_pylist() == [1]
